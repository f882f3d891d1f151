from .incremental import (
    cuckoo_mutation_sink, dedup_stream, filter_rebuild_sink, incremental_sketch_sink,
    read_incremental_estimate, windowed_distinct_hll,
)

__all__ = ["cuckoo_mutation_sink", "dedup_stream", "filter_rebuild_sink", "incremental_sketch_sink",
           "read_incremental_estimate", "windowed_distinct_hll"]
