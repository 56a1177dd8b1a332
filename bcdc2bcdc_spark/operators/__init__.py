from bcdc2bcdc_spark.operators.lww import lww_dedup
from bcdc2bcdc_spark.operators.diff import snapshot_diff, datasets_equal
from bcdc2bcdc_spark.operators.apply import apply_changes
from bcdc2bcdc_spark.operators.components import (
    connected_components,
    dedup_keep_representative,
)
from bcdc2bcdc_spark.operators.scd2 import SCD2History
from bcdc2bcdc_spark.operators.joinview import IncrementalJoinView

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
