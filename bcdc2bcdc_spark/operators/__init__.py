from bcdc2bcdc_spark.operators.lww import lww_dedup
from bcdc2bcdc_spark.operators.diff import snapshot_diff, datasets_equal
from bcdc2bcdc_spark.operators.apply import apply_changes
from bcdc2bcdc_spark.operators.components import (
    connected_components,
    dedup_keep_representative,
)

__all__ = [
    "lww_dedup",
    "snapshot_diff",
    "datasets_equal",
    "apply_changes",
    "connected_components",
    "dedup_keep_representative",
    "SCD2History",
    "IncrementalJoinView",
]

_LAZY = {
    # lazy (PEP 562): these operators import sources.lake, which itself
    # imports operators.apply — an eager re-export here would make
    # `import bcdc2bcdc_spark.sources.lake` hit this package mid-init
    # and die on the cycle
    "SCD2History": "bcdc2bcdc_spark.operators.scd2",
    "IncrementalJoinView": "bcdc2bcdc_spark.operators.joinview",
}


def __getattr__(name):
    if name in _LAZY:
        import importlib

        return getattr(importlib.import_module(_LAZY[name]), name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
