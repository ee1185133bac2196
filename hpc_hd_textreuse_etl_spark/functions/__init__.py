"""Reusable column/DataFrame building blocks."""

from hpc_hd_textreuse_etl_spark.functions.ids import (  # noqa: F401
    dense_ids,
    with_int_id,
    zip_with_index,
)
from hpc_hd_textreuse_etl_spark.functions.intervals import (  # noqa: F401
    mark_islands,
    merge_intervals,
)
