from .incremental import (
    incremental_sketch_sink, read_incremental_estimate, windowed_distinct_hll,
)

__all__ = ["incremental_sketch_sink", "read_incremental_estimate",
           "windowed_distinct_hll"]
