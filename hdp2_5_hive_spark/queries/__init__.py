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
#   round 5 result: 47/50 green; the 3 red rows (fn_decimal_round
#     oracle half-up-on-double bug; fn_xpath_suite +
#     fn_sentences_soundex array columns the driver canonicalizer
#     cannot sort) are all FIXED in round 6 and re-fronted.
#   round 6 window (SAMPLE_FRONT below): the 24 never-sampled
#     round-5-part-2 queries (span dedup/mask, domain mixing, seeded
#     shuffle, fuzzy decon, pHash, EXPORT/IMPORT + ANALYZE, BPE, PCA,
#     k-means, clean_v3, FFD, incremental dedup, hiveql part 2,
#     compression ratio, event analytics), then the 3 fixed red rows
#     (positions 25-27), then 23 new round-6 queries filling the
#     window to exactly 50. Closes the full registry ledger: after
#     this window every query registered BEFORE round 6 has >=1
#     driver CORRECTNESS row. Positions 51+ hold the late round-6
#     additions (ann_ivf_recall, interleave, attribution, min_by,
#     semantic dedup, view/directory text forms, printf, arrays) —
#     all green in the end-of-round 245/245 full-registry sim; they
#     are round 7's window candidates.
#   round 6 result: 47/50 green; the 3 red rows (fn_decimal_round
#     DECIMAL-vs-DOUBLE oracle type drift, ddl_analyze_stats HUGEINT,
#     emb_pca_project array column in the driver canonicalizer) are
#     all fixed in round 7 and re-fronted.
#   round 7 window (SAMPLE_FRONT below): the 44 never-sampled
#     late-round-6 queries (positions 1-44 — closes the driver ledger
#     at 280/280 sampled), the 3 fixed red rows (45-47), then new
#     round-7 queries as they land. Positions 48+ (the ~55 round-7
#     additions: compressed codecs, parity corners, pipeline5 parts
#     1-2, HS2 wire, macros, IVF-PQ, boilerplate/URL/snapshot/RRF/
#     backoff/PageRank/video/audio/card/v6/varsub/rerank, then the
#     continued-session tail: protobuf SerDe ×2, CCNet terciles,
#     edit-distance joins ×2, char entropy, two-phase attributes,
#     SCD2, ACID minor compaction, epoch planner, HTML extract,
#     parquet bloom, clean_v7, cross-modal dedup, Misra-Gries heavy
#     hitters, WebDataset tar shards, unigram-LM tokenizer ×2,
#     pround quotient-parity migration, TF-IDF top-k, Zipf fit,
#     LazyBinary SerDe, Kneser-Ney LM, flagship v8, TypedBytes
#     TRANSFORM, interval-overlap join, schema-evolution reads ×2,
#     MAD anomaly, incremental stats merge, streaming MG state,
#     exact-proportion split, weighted median, data contract,
#     RM3 expansion, weekday seasonality, TRANSFORM delimited +
#     REDUCE keyword forms, Arrow IPC, 3-step path mining,
#     parquet codec matrix, Gopher rule battery, centroid drift,
#     Heaps fit) are beyond the
#     ~50-query driver prefix — they are round 8's window candidates;
#     all are green in this round's TWO full-registry check_oracle
#     batteries (317/317 at the first snapshot; 339 pass / 0 fail /
#     16 rows-only = 355 at the second battery covering the pround
#     parity migration) — the 8 queries registered after the second
#     battery (hiveql TRANSFORM-delimited/REDUCE, Arrow IPC, 3-step
#     paths, parquet codecs, Gopher rules, centroid drift, Heaps
#     fit) were each verified individually at sf0.001 AND sf0.01.
#     End-of-round registry: 363 queries, 347 oracle-backed, 16
#     rows-only; registry-wide nested-loop sweep green at 363.
#   round 7 continued-session-3 (restarted context, same round): 30
#     further additions — C4 rule battery + flagship v9 (C4 gate →
#     provable containment dedup → source audit), WordPiece
#     tokenizer ×2 (exact sequential-reference pin), triangle census
#     (degree-oriented) + k-core peel, provably-complete asymmetric
#     containment join, Fellegi-Sunter scoring + EM training,
#     Jaro-Winkler (vs DuckDB's native), retrieval-eval metrics
#     (recall/MRR/nDCG), EWMA + rolling-median + streak +
#     cumulative-uniques + top-N-other + Benford + key-skew + FK
#     audits, feature prep (pivot, winsorize, OOF target encode,
#     discretize, quantile-normalize), ACID time travel, Ranger-style
#     policy data plane, z-order clustering key, ORC bloom, LSH
#     S-curve, haversine. Plus plan gates: DPP, join-strategy hints,
#     bucket pruning, z-order row-group skipping;
#     dropDuplicatesWithinWatermark streaming semantics. Every
#     oracle-backed addition passed check_oracle at BOTH sf0.001 and
#     sf0.01 when it landed; interim full battery 361 pass / 0 fail /
#     19 rows-only at 380 registered; second interim battery 379
#     pass / 0 fail / 21 rows-only at 400. Part 2 of the session
#     added: BM25 end-to-end eval capstone, CUPED + SRM
#     experimentation tier, market-basket rules + item-item
#     neighbors (relative min-support), mutual information,
#     hierarchy shares, column-level lineage (Catalyst plan walk),
#     churn labels, linear gap interpolation, rolling WAU,
#     MATCH_RECOGNIZE row patterns, SCD2 incremental upsert
#     (merge==rebuild oracle), grid-bucketed geo radius join +
#     nearest hub + haversine, warehouse health card, column
#     profile, classifier calibration (plus the single-class-holdout
#     fix it surfaced in the learned-classifier eval), SQL-standard
#     GRANT/REVOKE authorization with SHOW GRANT (closes the last
#     authorization oos row), ACID Initiator auto-compaction and
#     ROW__ID exposure, dropDuplicatesWithinWatermark / outer
#     stream-join / maxFilesPerTrigger / observe() pins. Every
#     addition check_oracle-green at BOTH SFs and driver_sim-green
#     at sf0.01 individually; the closing battery covers the final
#     registry. End-of-session registry: 413 (392 oracle-backed,
#     21 rows-only).
#   round 7 result: 50/50 green (48 hash-match + 2 rows-only executed)
#     — first perfect driver window. Cumulative ledger 283/418.
#   round 8 window (SAMPLE_FRONT below): ROTATED per verdict r7 #1.
#     The tuple is now EXACTLY the 135 queries with no cumulative
#     CORRECTNESS_r01..r07 row (verified against the artifacts at
#     rotation time); all 283 previously-sampled green names dropped
#     behind into registration order. First 50 = round-8 window,
#     riskiest first (codec tail, HS2 wire, rows-only/iterative,
#     fresh oracle shapes); positions 50-134 stage round 9. Done
#     criterion: CORRECTNESS_r08 holds 50 previously-unsampled
#     names, ledger 283 -> 333/418.
#   round 8 result: 48 green + 2 hash-FAIL (fmt_parquet_codecs,
#     fmt_lazybinary_sequencefile_round_trip — the only two sampled
#     queries with raw DECIMAL output columns; the driver comparator
#     renders Spark DecimalType vs DuckDB DECIMAL differently).
#     Ledger 333/419 (win_cumulative_distinct slipped past the
#     50-row window when fmt_rcfile_snappy was inserted mid-list).
#   round 9 window: the 2 fixed red rows first (final decimals cast
#     to DOUBLE on both sides, plus the new reject_decimal_schema
#     static guard making the hazard unwritable), then the 86
#     never-sampled names in staged order. Verification that round:
#     the full 50-name window driver_sim green at sf0.01 AND sf0.1;
#     the staged r10 tail (positions 50-87) driver_sim green at
#     sf0.01; the ENTIRE 419-query registry driver_sim green at
#     sf0.01 (419 pass / 0 fail / 24 rows-only) and pytest-oracle
#     green at sf0.001.
#   round 9 result: 50/50 green (CORRECTNESS_r09: 2 formerly-red
#     CONVERTED + 48 first-time greens, zero rows-only in window).
#     Cumulative ledger 381/419 (359 hash-green, 22 rows-only
#     executed green, 0 red). 38 never-sampled remain.
#   round 10 window (SAMPLE_FRONT below): ROTATED per verdict r9 #1.
#     Positions 0-37 = the LAST 38 never-sampled names (verified
#     against the cumulative r1-r9 artifacts at rotation time; same
#     staged order they held at positions 50-87) — this window
#     closes the driver ledger at 419/419. Positions 38-42 = the
#     FIVE rows-only -> synthesized-oracle upgrades of this round
#     (verdict r9 #3: graph_pagerank_hosts unrolled power iteration,
#     graph_kcore_membership recursive-CTE peel, er_em_parameters
#     unrolled EM, pack_ffd_bins recursive first-fit fold,
#     topic_model_mixture unrolled decimal-exact hard-EM) so the
#     upgrades land as driver HASH evidence. Positions 43-49 = 7
#     deliberate RE-PROVES of the oldest-evidence green rows (r2-era:
#     the verdict-named q1/q3/q5, win_range_frame,
#     agg_cube_grouping_id, plus the two bench-watch queries
#     q7_volume_shipping and join_inner_basic from verdict #4) —
#     re-proving 8-round-old evidence is the only other useful thing
#     a spare slot can do. test_sample_front_window_is_rotated
#     amended per verdict order #1: green names allowed only at
#     positions >= the window's needs-sampling count. Done
#     criterion: CORRECTNESS_r10 = 38 first-timers green + 5 oracle
#     upgrades hash-green + 7 re-proves green; ledger 381 -> 419/419.
#   round 10 result: 49 hash-green + 1 rows-only executed green
#     (quality_classifier_calibration — the window's by-design
#     rows-only row). Ledger CLOSED at 419/419 sampled (401
#     hash-green, 18 rows-only evidence). Session 2 staged 8 more
#     rows-only -> exact-oracle upgrades (simhash, sign-LSH, the six
#     tokenizer trainers) for the r11 window.
#   round 11 window (SAMPLE_FRONT below): positions 0-7 = the 8
#     staged oracle upgrades (verdict r10 #1) so they flip
#     `no_oracle` -> driver hash evidence; positions 8-49 = the
#     evidence-freshness ratchet (verdict r10 #5): all 41 r2-latest
#     rows + orderby_limit (oldest r3 + bench watch, verdict #6).
#     Done criterion: rows-only set becomes exactly the 10
#     justified; max evidence age drops r2 -> r3.
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
    "pipeline5",
    "pipeline6",
    "scalars2",
    "scalars3",
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
    # ---- round-14 window: ROTATED (starting-gun clause (b); the
    # r13 ledger predicted exactly this window).
    # Round-13 result: 50/50 hash-green (the 38 r4-era stalest rows
    # + 12 oldest r5 rows re-proved). Cumulative ledger 419/419
    # sampled, 409 hash-green, 10 rows-only by design, 0 red.
    # This window continues the evidence-freshness ratchet: nothing
    # in the registry needs sampling, so the 50 slots RE-PROVE the
    # stalest cumulative evidence, oldest first — ALL 35 remaining
    # queries whose latest driver row is r5-era (fn_* scalar suites,
    # hiveql_*, sampling, window/text-feature names), then the 15
    # alphabetically-first r6-era rows (agg_bitmap_index,
    # ann_lsh_recall, corpus_clean_v3 + corpus ops, ddl ×4,
    # decontaminate_fuzzy_minhash, dedup_cluster_keep_best,
    # dedup_incremental ×2) to fill 50. Zero repeats of the r13
    # window; every name has a registry oracle. After this window
    # the max cumulative evidence age advances from r5 to r6.
    # Done criterion: CORRECTNESS_r14 = 50 stalest re-proves
    # hash-green; max cumulative evidence age r5 -> r6.
    "fn_char_varchar",
    "fn_crypto_roundtrip",
    "fn_date_tail",
    "fn_datetime_parts",
    "fn_decimal_division",
    "fn_format_number",
    "fn_hash_extra",
    "fn_in_file",
    "fn_initcap_elt_field",
    "fn_interval_arith",
    "fn_java_hashcode",
    "fn_mask_suite",
    "fn_misc_math",
    "fn_next_day_tz_suite",
    "fn_reflect_suite",
    "fn_string_suite2",
    "fn_uniontype_encoding",
    "hiveql_cluster_by",
    "hiveql_distribute_sort",
    "hiveql_grouping_sets",
    "hiveql_lateral_view",
    "hiveql_mapjoin_hint",
    "hiveql_multi_insert",
    "hiveql_semi_join",
    "hiveql_transform",
    "hiveql_window_topk",
    "quality_unigram_bits",
    "sample_percent",
    "sample_rows",
    "sample_stratified",
    "text_hash_features",
    "virtual_input_file_name",
    "virtual_row_offset",
    "win_agg_over",
    "win_topk_per_group",
    # ---- the 15 alphabetically-first r6-era rows fill the window.
    "agg_bitmap_index",
    "ann_lsh_recall",
    "corpus_clean_v3",
    "corpus_mix_temperature",
    "corpus_shuffle_seeded",
    "corpus_span_dedup",
    "corpus_span_mask",
    "ddl_drop_partition",
    "ddl_export_import",
    "ddl_insert_overwrite_partition",
    "ddl_show_functions",
    "decontaminate_fuzzy_minhash",
    "dedup_cluster_keep_best",
    "dedup_incremental_batch",
    "dedup_incremental_unordered_ids",
)

# ---- round-13 window (retired; kept for the rotation ledger).
_ROUND13_WINDOW: tuple[str, ...] = (
    # ---- round-13 window: ROTATED (verdict r12 next-round #1).
    # Round-12 result: 50/50 hash-green (the full r3-era bucket +
    # 10 oldest r4 rows re-proved). Cumulative ledger 419/419
    # sampled, 409 hash-green, 10 rows-only by design, 0 red.
    # This window continues the evidence-freshness ratchet (verdict
    # r12 #1/#5): nothing in the registry needs sampling, so the 50
    # slots RE-PROVE the stalest cumulative evidence, oldest first —
    # ALL 38 queries whose latest driver row is r4-era (dedup /
    # multimodal / streaming-batch / text-analysis / events /
    # pack-split names), then the 12 alphabetically-first r5-era
    # rows (agg sketch/ngram ×4, decontaminate_bloom_prefilter,
    # dedup ×3, emb_int8_quantize, fmt round-trips ×3) to fill 50.
    # Zero repeats of the r12 window (starting-gun test (b) clause);
    # every name has a registry oracle, so the window is pure hash
    # evidence. After this window the max cumulative evidence age
    # advances from r4 to r5; the remaining 35 r5 rows + the 15
    # oldest r6 rows are round 14's window (verdict r12 #5: nothing
    # older than r6 survives round 14).
    # Done criterion: CORRECTNESS_r13 = 50 stalest re-proves
    # hash-green; max cumulative evidence age r4 -> r5.
    "dedup_components",
    "dedup_embedding_cosine",
    "dedup_exact",
    "dedup_keep_list",
    "dedup_near_minhash",
    "dedup_ngram_jaccard",
    "events_asof_join",
    "events_rollup_daily",
    "events_sessionize",
    "json_extract",
    "json_tuple_fields",
    "multimodal_audio_spectrogram",
    "multimodal_audio_stats",
    "multimodal_decode_stats",
    "multimodal_features",
    "multimodal_frame_sample",
    "multimodal_jpeg_stats",
    "multimodal_meta",
    "multimodal_png_stats",
    "multimodal_resize",
    "multimodal_video_frames",
    "pack_bin_stats",
    "pack_sequences_ctx512",
    "q12_priority_case_agg",
    "retrieval_bm25",
    "split_train_holdout",
    "stream_dedup_first",
    "stream_interval_join",
    "stream_session_window",
    "stream_sliding_counts",
    "stream_tumbling_counts",
    "text_langid",
    "text_profile",
    "text_redact_pii",
    "text_repetition_stats",
    "text_rolling_fingerprint",
    "text_token_counts",
    "vocab_top_ngrams",
    # ---- the 12 alphabetically-first r5-era rows fill the window.
    "agg_context_ngrams",
    "agg_histogram_numeric",
    "agg_hll_sketch",
    "agg_ngrams",
    "decontaminate_bloom_prefilter",
    "dedup_components_star",
    "dedup_hash_cosine",
    "dedup_jaccard_prefix",
    "emb_int8_quantize",
    "fmt_csv_round_trip",
    "fmt_sequencefile_round_trip",
    "fmt_text_serde_round_trip",
)

# ---- round-12 window (retired; kept for the rotation ledger).
_ROUND12_WINDOW: tuple[str, ...] = (
    # ---- round-12 window: ROTATED (verdict r11 next-round #1).
    # Round-11 result: 50/50 hash-green — the 8 staged oracle
    # upgrades landed as driver HASH evidence and the 42 stalest
    # (r2-era) rows all re-proved. Cumulative ledger 419/419
    # sampled, 409 hash-green, 10 rows-only by design, 0 red.
    # This window is pure evidence-freshness ratchet (verdict r11
    # #1/#5): nothing in the registry needs sampling, so the 50
    # slots RE-PROVE the stalest cumulative evidence, oldest first —
    # ALL 40 queries whose latest driver row is r3-era (formats /
    # functions / subqueries / lateral / set-ops / extensions era
    # names), then the 10 alphabetically-first r4-era rows (acid ×2,
    # agg_approx_distinct, ann ×2, corpus ×3, ddl_persistent_catalog,
    # decontaminate_eval_overlap) to fill 50. Zero repeats of the
    # r11 window (starting-gun test (b) clause). After this window
    # the max evidence age advances from r3 to r4; the remaining 38
    # r4 rows + oldest r5 rows are round 13's window (verdict r11
    # #5: nothing older than r5 survives two more rounds).
    # Round-12 result: 50/50 hash-green; max age advanced r3 -> r4.
    "cte_chain",
    "distinct_projection",
    "distribute_sort_by",
    "explode_outer_empty",
    "explode_words",
    "fmt_avro_round_trip",
    "fmt_concatenate_compact",
    "fmt_dynamic_partition_sink",
    "fmt_multi_insert",
    "fmt_orc_round_trip",
    "fmt_smb_bucketed_join",
    "fn_bitwise",
    "fn_cast_null_semantics",
    "fn_complex_types",
    "fn_conditional",
    "fn_date_suite",
    "fn_hash_encode",
    "fn_math_suite",
    "fn_regex_suite",
    "fn_string_suite",
    "inline_structs",
    "parse_url_parts",
    "posexplode_array",
    "ptf_zscore_groups",
    "sample_bucket",
    "stack_rows",
    "str_to_map_access",
    "subq_exists_correlated",
    "subq_in",
    "subq_not_exists_correlated",
    "subq_not_in",
    "subq_scalar",
    "transform_script",
    "udaf_pandas_weighted_avg",
    "udf_pandas_charge",
    "udf_python_scalar",
    "udtf_word_stream",
    "union_all",
    "union_distinct",
    "view_over_view",
    "acid_merge_upsert",
    "acid_update_delete",
    "agg_approx_distinct",
    "ann_cosine_topk",
    "ann_ivf_topk",
    "corpus_clean",
    "corpus_clean_v2",
    "corpus_line_dedup",
    "ddl_persistent_catalog",
    "decontaminate_eval_overlap",
)

# ---- round-11 window (retired; kept for the rotation ledger).
_ROUND11_WINDOW: tuple[str, ...] = (
    # ---- round-11 window: ROTATED (verdict r10 next-round #1).
    # Positions 0-7: the EIGHT rows-only -> synthesized-oracle
    # upgrades staged in round 10 session 2 (dedup_simhash +
    # ann_lsh_bucketed via the XXH64-in-SQL generator, BPE/WordPiece/
    # unigram-LM merges+apply via unrolled-round trainer replays) —
    # sampled now so the upgrades land as driver HASH evidence; their
    # latest driver rows are r4/r6/r8 `no_oracle`, so under the
    # amended rotation test (verdict r10 #2a: oracle-in-registry +
    # no_oracle-latest-row counts as needs-sampling) they ARE the
    # window's needs-sampling set. All eight were pre-verified in
    # r10: compare_query green at sf0.001 AND sf0.01, driver_sim
    # green at sf0.01.
    # Positions 8-49: the evidence-freshness ratchet (verdict r10
    # #5) — the stalest cumulative driver evidence, oldest first:
    # ALL 41 queries whose latest row is r2-era (TPC-H q2/q4/q6/
    # q8-q11/q13-q22, the join suite, the aggregate suite, the
    # window suite — 8 rounds old, and the code under them has been
    # touched since), then `orderby_limit` (oldest r3 row + r10
    # bench watch item, verdict #6 — fresh driver evidence alongside
    # the bench re-measure). After this window the max evidence age
    # drops from r2 to r3 (40 r3-era rows remain — round 12's
    # spares).
    # Done criterion: CORRECTNESS_r11 = 8 upgrades flipping
    # `no_oracle` -> hash_match true (rows-only set becomes exactly
    # the 10 justified) + 42 stalest re-proves green.
    "dedup_simhash",
    "ann_lsh_bucketed",
    "vocab_bpe_merges",
    "vocab_bpe_apply",
    "vocab_wordpiece_merges",
    "vocab_wordpiece_apply",
    "vocab_unigram_lm",
    "vocab_unigram_apply",
    # ---- freshness ratchet: the 41 r2-latest rows (TPC-H, joins,
    # aggregates, windows), then the oldest r3 row.
    "q2_min_cost_supplier",
    "q4_priority_exists",
    "q6_forecast_revenue",
    "q8_market_share",
    "q9_profit_by_nation_year",
    "q10_returned_items",
    "q11_important_stock",
    "q13_customer_distribution",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q16_supplier_cnt",
    "q17_small_quantity_revenue",
    "q18_large_orders",
    "q19_disjunctive_pred",
    "q20_potential_promotion",
    "q21_waiting_supplier",
    "q22_global_sales_opportunity",
    "join_cross",
    "join_full_outer",
    "join_left_anti",
    "join_left_outer",
    "join_left_semi",
    "join_null_safe",
    "join_right_outer",
    "join_theta_residual",
    "join_unique_preserve",
    "agg_collect",
    "agg_distinct_multi",
    "agg_grouping_sets",
    "agg_having",
    "agg_minmax_suite",
    "agg_percentile",
    "agg_rollup",
    "agg_salted_skew",
    "agg_stats_suite",
    "win_first_last",
    "win_lead_lag",
    "win_moving_avg",
    "win_ntile_cumedist",
    "win_ranking",
    "win_running_sum",
    "orderby_limit",
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
