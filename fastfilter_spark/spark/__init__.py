from .build import (PartitionedFilter, add_keys, build_partitioned_filter,
                    cuckoo_update)
from .grouped import GroupedFilters, build_grouped_filters
from .io import (build_filter_sidecar, contains_via_sidecar, read_corpus,
                 read_filter_sidecar, register_sql_sidecar, write_bucketed,
                 write_filter_sidecar)
from .keys import content_key, keys_from_content, partition_id, pd_to_u64
from .asof import asof_join
from .rangejoin import interval_join
from .session import get_spark
from .skew import salted_join
from .sampling import (deterministic_sample, epoch_shuffle, hash_sample,
                       hash_sample_pred, hash_split, mixture_sample,
                       pack_into_shards,
                       sample_priority, stratified_sample, upsample)
from .sketch_agg import (cms_agg, cms_query, hll_agg, hll_sliding, kll_agg,
                         mg_agg, mg_sliding, tdigest_agg, theta_agg)
from .sketch_sidecar import (build_sketch_sidecar, read_sketch_sidecar,
                             sketch_sidecar_lineage)
from .partitioning import (auto_salted_join, detect_hot_keys,
                           kll_partition_bounds, kll_range_repartition,
                           range_bucket, sorted_write,
                           string_prefix_key, zorder_bounds, zorder_key,
                           zorder_write)
from .skipindex import (build_file_skipping_index, prune_files,
                        pruned_lookup, read_skipping_manifest, skip_stats,
                        update_file_skipping_index)

__all__ = [
    "get_spark", "content_key", "keys_from_content", "partition_id",
    "pd_to_u64", "build_partitioned_filter", "PartitionedFilter", "add_keys",
    "GroupedFilters", "build_grouped_filters",
    "hll_agg", "hll_sliding", "cms_agg", "cms_query", "kll_agg",
    "mg_sliding", "tdigest_agg", "theta_agg",
    "read_corpus", "write_filter_sidecar", "read_filter_sidecar", "contains_via_sidecar",
    "write_bucketed", "salted_join", "asof_join", "interval_join",
    "build_filter_sidecar", "cuckoo_update", "register_sql_sidecar",
    "mg_agg", "hash_sample", "hash_sample_pred", "hash_split",
    "deterministic_sample", "sample_priority", "stratified_sample",
    "pack_into_shards", "mixture_sample", "epoch_shuffle", "upsample",
    "build_sketch_sidecar", "read_sketch_sidecar", "sketch_sidecar_lineage",
    "kll_partition_bounds", "kll_range_repartition", "range_bucket",
    "sorted_write", "string_prefix_key",
    "zorder_bounds", "zorder_key", "zorder_write",
    "detect_hot_keys", "auto_salted_join",
    "build_file_skipping_index", "prune_files", "pruned_lookup",
    "read_skipping_manifest", "skip_stats", "update_file_skipping_index",
]
