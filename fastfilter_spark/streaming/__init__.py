from .incremental import (
    cuckoo_mutation_sink, dedup_stream, filter_rebuild_sink,
    incremental_any_sketch_sink, incremental_sketch_sink,
    ivfpq_ingest_sink, read_ingest_drift,
    read_incremental_estimate, read_incremental_sketch, windowed_distinct_hll,
)

__all__ = ["cuckoo_mutation_sink", "dedup_stream", "filter_rebuild_sink",
           "incremental_any_sketch_sink", "incremental_sketch_sink",
           "ivfpq_ingest_sink", "read_ingest_drift",
           "read_incremental_sketch",
           "read_incremental_estimate", "windowed_distinct_hll"]
