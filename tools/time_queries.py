"""Time individual contract queries (best-of-N .count()), isolating the
computation exactly like the frozen bench does. Usage:

    python tools/time_queries.py [sf_dir] [repeats] query [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bcdc2bcdc_spark.driver_queries import QUERIES
from bcdc2bcdc_spark.session import get_spark


def main() -> None:
    args = sys.argv[1:]
    sf_dir = args.pop(0) if args and os.path.isdir(args[0]) else "/root/testdata/sf0.1"
    repeats = int(args.pop(0)) if args and args[0].isdigit() else 2
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("time-queries", master=f"local[{cpus}]", shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()  # warmup
    for name in args:
        samples = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            QUERIES[name](spark, sf_dir).count()
            samples.append(round(time.perf_counter() - t0, 3))
        print(f"{name:26s} best={min(samples):7.3f}  samples={samples}")


if __name__ == "__main__":
    main()
