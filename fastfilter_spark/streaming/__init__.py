from .incremental import (
    filter_rebuild_sink, incremental_sketch_sink, read_incremental_estimate,
    windowed_distinct_hll,
)

__all__ = ["filter_rebuild_sink", "incremental_sketch_sink",
           "read_incremental_estimate", "windowed_distinct_hll"]
