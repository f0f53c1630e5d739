"""Named query registry — the driver-facing surface.

Each registered query pairs a Spark callable ``(spark, sf_dir) ->
DataFrame`` with an equivalent DuckDB oracle SQL string (or ``None``
for non-SQL-expressible operators → rows-only check). This mirrors
the reference's golden-file qfile tests
(``ql/src/test/queries/clientpositive/*.q`` + ``*.q.out``,
SURVEY.md §5) with DuckDB as the golden-output generator.
"""

from __future__ import annotations

import importlib

from .registry import Query, all_queries, oracle_map, query_map, register

# Registration (= driver sampling) order: the driver's correctness
# run checks a prefix of the registry (~50 queries), so each round
# rotates a different family block to the front until every query has
# a driver-green CORRECTNESS row. Rotation ledger:
#   round 2 window: core(22) joins(10) aggregates(11) windows(first 7)
#     -> 48/50 green (CORRECTNESS_r02.json)
#   round 3 window (this order): scalars(9) setops(6) lateral(9)
#     subqueries(7) extensions(6) streaming_batch(7) formats(6) = 50,
#     all oracle-backed — proves the §2.1 physical-operator rows
#     (ReduceSink/Union/UDTF/LateralView/Script/FileSink/SMB/merge),
#     §2.2 formats, §2.10 streaming twins, §2.11 subqueries, §2.12.
#   round 4 window (SAMPLE_FRONT below): the 9 events-loader ERR rows
#     of r3 (json ×2, streaming_batch ×7 — loader fixed this round),
#     the 2 fixed-but-unproven rows (q12, agg_approx_distinct),
#     ddl_persistent_catalog (cut from r3's 50 at position 51), ACID
#     DML (2), and the never-sampled LLM-pipeline family (pipeline 20
#     + pipeline2 16) = 50.
#   round 5 window (SAMPLE_FRONT below): the full never-sampled tail —
#     text_hash_features/dedup_hash_cosine (2), scalars2 (28),
#     win_topk_per_group + win_agg_over (stale r1 ERRs), fmt_csv/
#     fmt_text round-trips (34 total) — then the new round-5 surface:
#     hiveql text suite part 1 (9), fmt_sequencefile_round_trip,
#     pipeline3 (4), and at ~49-51 the flagship new operators
#     (dedup_components_star, dedup_jaccard_prefix) plus q18 (plan
#     rewritten this round). After the 34 land, every PRE-round-5
#     query has >=1 CORRECTNESS row.
#   round 6 should front: whatever of positions ~52+ the r5 window
#     cut — the round-5 part-2 surface (corpus_span_dedup/_mask,
#     corpus_mix_temperature, corpus_shuffle_seeded,
#     decontaminate_fuzzy_minhash, multimodal_phash_dedup,
#     ddl_export_import, ddl_analyze_stats, vocab_bpe_merges,
#     emb_pca_project, emb_kmeans_clusters — all already green in the
#     end-of-r5 full-registry driver_sim), then hiveql part 2 (6),
#     text_compression_ratio, and re-greens (q1/q5/q7/
#     join_inner_basic/agg_distinct_multi).
_MODULES = (
    "scalars",
    "setops",
    "lateral",
    "subqueries",
    "extensions",
    "streaming_batch",
    "formats",
    "acid",
    "analytics",
    "hiveql",
    "pipeline",
    "pipeline2",
    "pipeline3",
    "pipeline4",
    "scalars2",
    "core",
    "joins",
    "aggregates",
    "windows",
)

# Explicit sample-window order: ``all_queries()`` yields these names
# first (in this order), then every other registered query in module
# registration order. The driver checks a ~50-query prefix, so this
# list IS the round's correctness window — update it per the rotation
# ledger above each round.
SAMPLE_FRONT: tuple[str, ...] = (
    # pipeline2 tail cut from r4's window at positions 51-52
    "text_hash_features",
    "dedup_hash_cosine",
    # never sampled: the scalars2 tail (28)
    "fn_string_suite2",
    "fn_initcap_elt_field",
    "fn_xpath_suite",
    "fn_interval_arith",
    "fn_uniontype_encoding",
    "fn_mask_suite",
    "agg_ngrams",
    "agg_context_ngrams",
    "agg_histogram_numeric",
    "virtual_input_file_name",
    "fn_misc_math",
    "fn_datetime_parts",
    "sample_percent",
    "fn_crypto_roundtrip",
    "fn_hash_extra",
    "fn_date_tail",
    "fn_sentences_soundex",
    "fn_char_varchar",
    "fn_decimal_division",
    "sample_rows",
    "fn_decimal_round",
    "fn_java_hashcode",
    "fn_reflect_suite",
    "fn_format_number",
    "agg_hll_sketch",
    "fn_next_day_tz_suite",
    "fn_in_file",
    "virtual_row_offset",
    # stale r1 ERRs — env cause fixed in r2, never re-sampled
    "win_topk_per_group",
    "win_agg_over",
    # never sampled: format round-trips cut from earlier windows
    "fmt_csv_round_trip",
    "fmt_text_serde_round_trip",
    # new this round: HiveQL-text qfile suite (textual interface)
    "hiveql_lateral_view",
    "hiveql_distribute_sort",
    "hiveql_cluster_by",
    "hiveql_multi_insert",
    "hiveql_transform",
    "hiveql_grouping_sets",
    "hiveql_semi_join",
    "hiveql_mapjoin_hint",
    "hiveql_window_topk",
    # new this round: SequenceFile read path
    "fmt_sequencefile_round_trip",
    # new this round: pipeline3 (LM quality, bloom decon, int8
    # quantization, stratified sampling)
    "quality_unigram_bits",
    "decontaminate_bloom_prefilter",
    "emb_int8_quantize",
    "sample_stratified",
    # new this round: O(log n) star-algorithm components + exact
    # prefix-filtered Jaccard join (the round's flagship operators —
    # keep inside the ~50 window) and q18, whose plan changed this
    # round (single-pass rewrite — re-prove it driver-side)
    "dedup_components_star",
    "dedup_jaccard_prefix",
    "q18_large_orders",
    # ---- position ~52+: round-6 ledger starts here ----
    # round-5 part-2 surface (added after the r5 window was frozen):
    # span dedup, domain mixing, seeded shuffle, fuzzy decon, image
    # pHash (rows-only), EXPORT/IMPORT — front these in round 6
    "corpus_span_dedup",
    "corpus_span_mask",
    "corpus_mix_temperature",
    "corpus_shuffle_seeded",
    "decontaminate_fuzzy_minhash",
    "multimodal_phash_dedup",
    "ddl_export_import",
    "ddl_analyze_stats",
    "vocab_bpe_merges",
    "emb_pca_project",
    "emb_kmeans_clusters",
    "corpus_clean_v3",
    "pack_ffd_bins",
    "dedup_incremental_batch",
    # HiveQL-text suite part 2 + compression signal, then re-greens
    "hiveql_cte_chain",
    "hiveql_correlated_exists",
    "hiveql_union_mixed",
    "hiveql_tablesample_bucket",
    "hiveql_null_ordering",
    "hiveql_case_cast_expr",
    "text_compression_ratio",
    "events_funnel",
    "events_retention",
    "events_top_transitions",
    "q1_pricing_summary",
    "q5_local_supplier",
    "q7_volume_shipping",
    "join_inner_basic",
    "agg_distinct_multi",
)


def load_all() -> None:
    """Import every query module so registration side-effects run."""
    for mod in _MODULES:
        importlib.import_module(f"{__name__}.{mod}")


__all__ = [
    "Query",
    "register",
    "all_queries",
    "query_map",
    "oracle_map",
    "load_all",
]
