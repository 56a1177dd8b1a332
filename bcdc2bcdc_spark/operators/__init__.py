from bcdc2bcdc_spark.operators.lww import lww_dedup
from bcdc2bcdc_spark.operators.diff import snapshot_diff, datasets_equal
from bcdc2bcdc_spark.operators.apply import apply_changes

__all__ = ["lww_dedup", "snapshot_diff", "datasets_equal", "apply_changes"]
