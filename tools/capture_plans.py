"""Capture .explain('formatted') for named contract queries into
plans/r06/<query>_<tag>.txt (judge-checkable plan evidence).

Usage: python tools/capture_plans.py <tag> [query ...]
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bcdc2bcdc_spark.driver_queries import QUERIES
from bcdc2bcdc_spark.session import get_spark

DEFAULT = [
    "cdc_lww_dedup",
    "cdc_state",
    "cdc_delta",
    "cdc_update_digest",
    "dedup_minhash",
    "ann_ivf",
    "dedup_clusters",
    "decontaminate_keep",
    "text_stats",
    "sample_mixture",
    "fk_remap",
    "agg_pricing",
    "topk_customers",
]


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:] or DEFAULT
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r06")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("plan-capture", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        df = QUERIES[name](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        with open(os.path.join(out_dir, f"{name}_{tag}.txt"), "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {name}_{tag}.txt")


if __name__ == "__main__":
    main()
