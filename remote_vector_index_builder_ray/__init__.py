"""remote_vector_index_builder_ray — a Ray-Data-native inverted-index build +
Okapi BM25 top-k query engine over Parquet transcript tables.

Built from scratch in the spirit of opensearch-project/remote-vector-index-builder's
remote index-build workflow (partition-parallel build workers producing mergeable
index segments, reference: ``core/tasks.py:80-211``), re-expressed Ray-Data-first:

- ``ray.data.read_parquet`` -> ``map_batches`` over zero-copy Arrow batches
- SPIMI-style per-batch posting-list partials (pre-aggregated combiner)
- one ``groupby(term, shard)`` shuffle merging partials into compressed global
  postings (delta + varint blocks with block-max metadata)
- actor-pool searcher running block-max WAND / exhaustive BM25 top-k
- per-partition checkpoints + manifest lineage for resume

Public surface (the analog of the reference's ``core.tasks`` library path,
``/root/reference/remote_vector_index_builder/core/tasks.py:20-33``)::

    from remote_vector_index_builder_ray import BuildConfig, build_index, search

    manifest = build_index(BuildConfig(input_paths=[...], index_dir=...))
    results  = search(index_dir, queries_ds, k=10)
"""

from remote_vector_index_builder_ray.config import BM25Config, BuildConfig
from remote_vector_index_builder_ray.pipelines.build import build_index
from remote_vector_index_builder_ray.pipelines.delete import (
    delete_by_query,
    delete_docs,
    load_tombstones,
)
from remote_vector_index_builder_ray.pipelines.incremental import (
    append_index,
    compact_index,
    global_stats,
    index_stats,
    restore_index,
    snapshot_index,
    update_docs,
)
from remote_vector_index_builder_ray.pipelines.aggs import (
    cardinality_agg,
    composite_agg,
    adjacency_matrix_agg,
    auto_date_histogram,
    date_histogram,
    date_range_agg,
    filters_agg,
    global_terms_agg,
    extended_stats_agg,
    histogram_agg,
    missing_agg,
    bucket_sort_date_histogram,
    moving_avg_date_histogram,
    serial_diff_date_histogram,
    pipeline_date_histogram,
    percentiles_agg,
    range_agg,
    rare_terms_agg,
    significant_terms_agg,
    stats_agg,
    string_stats_agg,
    terms_agg,
    top_hits_agg,
    multi_terms_agg,
    percentile_ranks_agg,
    stats_bucket_date_histogram,
    top_metrics_agg,
    weighted_avg_agg,
    matrix_stats_agg,
    bucket_script_date_histogram,
    moving_fn_date_histogram,
    match_count,
    diversified_sampler_agg,
    percentiles_bucket_date_histogram,
    cumulative_cardinality_agg,
    scripted_metric_agg,
)
from remote_vector_index_builder_ray.functions.metrics import rank_eval
from remote_vector_index_builder_ray.pipelines.expand import (
    expand_fuzzy,
    expand_prefix,
    expand_regexp,
    expand_wildcard,
    suggest_terms,
    search_fuzzy,
    search_match_bool_prefix,
    search_phrase_prefix,
    search_prefix,
    search_synonyms,
    search_terms,
    search_regexp,
    suggest_phrase,
    search_wildcard,
)
from remote_vector_index_builder_ray.pipelines.mlt import more_like_this, term_vectors
from remote_vector_index_builder_ray.pipelines.percolate import percolate
from remote_vector_index_builder_ray.pipelines.reindex import reindex
from remote_vector_index_builder_ray.pipelines.query import (
    explain,
    function_score,
    distance_feature,
    mget,
    highlight,
    hydrate,
    parse_simple_query_string,
    rescore_phrase,
    rrf_fuse,
    search_hybrid,
    search_query_string,
    search_sorted_multi,
    search,
    search_bool,
    search_cross_fields,
    search_multi_match,
    search_sorted,
)

__all__ = [
    "BM25Config",
    "BuildConfig",
    "append_index",
    "build_index",
    "compact_index",
    "adjacency_matrix_agg",
    "auto_date_histogram",
    "date_histogram",
    "date_range_agg",
    "filters_agg",
    "global_terms_agg",
    "extended_stats_agg",
    "histogram_agg",
    "missing_agg",
    "bucket_sort_date_histogram",
    "moving_avg_date_histogram",
    "serial_diff_date_histogram",
    "pipeline_date_histogram",
    "delete_docs",
    "expand_fuzzy",
    "expand_prefix",
    "expand_regexp",
    "expand_wildcard",
    "explain",
    "global_stats",
    "index_stats",
    "restore_index",
    "snapshot_index",
    "highlight",
    "hydrate",
    "parse_simple_query_string",
    "rescore_phrase",
    "rrf_fuse",
    "search_hybrid",
    "search_query_string",
    "search_sorted_multi",
    "load_tombstones",
    "more_like_this",
    "term_vectors",
    "percolate",
    "range_agg",
    "rank_eval",
    "reindex",
    "search",
    "search_fuzzy",
    "search_prefix",
    "search_sorted",
    "search_synonyms",
    "search_terms",
    "search_regexp",
    "suggest_phrase",
    "search_wildcard",
    "search_cross_fields",
    "search_multi_match",
    "search_match_bool_prefix",
    "search_phrase_prefix",
    "search_bool",
    "function_score",
    "stats_agg",
    "string_stats_agg",
    "suggest_terms",
    "terms_agg",
    "cardinality_agg",
    "composite_agg",
    "multi_terms_agg",
    "percentile_ranks_agg",
    "stats_bucket_date_histogram",
    "matrix_stats_agg",
    "bucket_script_date_histogram",
    "moving_fn_date_histogram",
    "match_count",
    "percentiles_bucket_date_histogram",
    "cumulative_cardinality_agg",
    "scripted_metric_agg",
    "mget",
    "diversified_sampler_agg",
    "distance_feature",
    "top_metrics_agg",
    "weighted_avg_agg",
    "delete_by_query",
    "update_docs",
    "percentiles_agg",
    "rare_terms_agg",
    "significant_terms_agg",
    "top_hits_agg",
]
