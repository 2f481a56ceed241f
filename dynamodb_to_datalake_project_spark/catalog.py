"""Query catalog: named operators → (Spark builder, DuckDB oracle SQL).

Every operator from SURVEY.md §2 (and the LLM north-star set) registers
here; `__spark_entry__.py::queries()/oracle_sql()` is a thin view over
this registry. Builders take `(spark, sf_dir)` and return a DataFrame;
oracle SQL is ANSI SQL DuckDB runs over the same parquet fixtures
(views: region nation customer supplier part orders lineitem events
documents embeddings).

Contract discipline (driver compares by sorted-column value hash):
- alias every computed column IDENTICALLY on both sides;
- round double aggregates on both sides (same ndigits) so accumulation
  order can't flip a bit;
- cast integer-ish computed outputs to BIGINT on both sides (DuckDB
  sum(int) is HUGEINT, len() is BIGINT; Spark size() is INT);
- every LIMIT/top-k query carries a full deterministic ORDER BY.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    """Register a query builder, optionally with its DuckDB oracle SQL.

    Builders registered without oracle SQL get the driver's weaker
    rows-only check (reserved for genuinely non-SQL-expressible ops:
    minhash/simhash banding, LSH bucketing, streaming state).
    """

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


# Catalog iteration order. External harnesses that sample a bounded
# prefix of the catalog (~50 entries/round) should see the queries
# with the LEAST independent-correctness coverage first. Round-7
# order: the 18 round-7 additions lead (no driver row possible yet —
# the weakest coverage class), then multimodal_mpegts_stats (its r6
# row predates the round-7 PSI section_length fix, so it no longer
# reproduces under current code — re-sampling re-pins the changed
# encoder), then the 44 queries whose newest row is r3 (~33 of which
# fit the ~50-entry window; the rest refresh in r8). The rows-only
# fast paths and the r4/r5/r6-green groups trail, freshest last. The
# set is identical either way — only iteration order changes.
_PRIORITY: list[str] = [
    # --- new in round 7 (no driver row possible yet): never-sampled
    # queries are the weakest coverage, so ALL 18 lead; the ~50-entry
    # window then reaches ~33 of the 44 r3-stale rotation entries —
    # the rest refresh in r8 (a known r3-green is a smaller
    # blind spot than a query with no independent row at all) ---
    "web_url_canonicalize",
    "web_domain_stats",
    "web_domain_quality_join",
    "multimodal_ogg_codec_stats",
    "multimodal_mp4_pts_stats",
    "graph_triangles",
    "graph_clustering_coeff",
    "web_url_dedup",
    "multimodal_ogg_tags",
    "multimodal_mp3_tags",
    "ts_gapfill_locf",
    "multimodal_jpeg_exif",
    "multimodal_mp3_sideinfo",
    "multimodal_flac_tags",
    "multimodal_png_text",
    "multimodal_wav_tags",
    "multimodal_mp4_tags",
    "multimodal_gif_meta",
    # --- r6-green but the round-7 PSI section_length fix changed the
    # emitted container bytes: the r6 row no longer reproduces under
    # current code, so re-pin ahead of the r3-stale greens ---
    "multimodal_mpegts_stats",
    # --- newest driver row r3: the freshness-rotation tail ---
    "q11_value_concentration",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q16_supplier_variety",
    "q17_small_qty_revenue",
    "q18_large_orders",
    "q19_disjunctive_pushdown",
    "q21_sole_late_supplier",
    "q22_dormant_customers",
    "a4_per_file_counts",
    "dedup_clusters_cc",
    "dedup_cluster_best",
    "dedup_containment",
    "dedup_minhash_md5",
    "dedup_simhash_md5",
    "dedup_semantic_cells",
    "dedup_segments",
    "fuzzy_name_pairs",
    "sim_ann_lsh_fullprobe",
    "sim_ann_ivf_fullprobe",
    "sim_ann_ivfpq_fullprobe",
    "corpus_ingest_novel",
    "corpus_curate_full",
    "dataset_mix",
    "dataset_split",
    "dataset_split_no_leakage",
    "dataset_epoch_shuffle",
    "dataset_token_budget_sample",
    "cluster_balanced_sample",
    "decontaminate_bloom",
    "decontaminate_exact_substring",
    "doc_chunking",
    "doc_packing",
    "doc_repetition_stats",
    "doc_rare_bigram_filter",
    "text_collapse_repeats",
    "lm_perplexity_score",
    "quality_nb_score",
    "source_overlap_matrix",
    "bpe_encode_stats",
    "bpe_fertility_by_lang",
    "multimodal_frame_sample",
    "multimodal_wav_stats",
    "skew_salted_event_stats",
    # --- rows-only fast paths (fresh r6 rows-only rows; each has an
    # oracle-green lossless twin) ---
    "dedup_minhash_lsh",
    "dedup_simhash",
    "sim_ann_lsh",
    "sim_ann_ivf",
    "sim_ann_ivfpq",
    "embed_pca_project",
    "bpe_train_merges",
    # --- driver-green in r04 ---
    "sim_hard_negatives",
    "source_unigram_kl",
    "multimodal_image_stats",
    "embed_pca_invariants",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q10_returned_items",
    "j1_full_diff",
    "j2_star_join_revenue",
    "j3_semi_anti_join",
    "j4_outer_join",
    "s1_scan_pushdown",
    "s8_upsert_merge",
    "p1_ddb_decode_roundtrip",
    "p2_surrogate_key",
    "p3_partition_derive",
    "f1_cdc_event_filter",
    "f3_time_range_prune",
    "w1_latest_wins",
    "w2_topk_per_key",
    "w3_window_family",
    "w4_ranking_family",
    "o1_topn_orders",
    "o3_reverse_listing",
    "a1_count_preview",
    "a2_distinct",
    "a5_agg_stats",
    "a5_fixed_chunking",
    "a6_rollup",
    "a7_cube",
    "a8_percentiles",
    "a10_grouping_sets",
    "a11_variance_stats",
    "c_scalar_funcs",
    "c3_datetime_funcs",
    "c7_json_extract",
    "t2_tumbling_window",
    "sql_late_orders",
    "asof_join_views",
    "events_anomaly_flags",
    "grouped_pct_rank",
    "pivot_event_counts",
    "unpivot_metrics",
    # --- driver-green in r05 (freshest rows, trailing) ---
    "cluster_kmeans_train",
    "cluster_kmeans_maximin",
    "cluster_silhouette",
    "sim_ann_ivf_trained",
    "dedup_semantic_trained",
    "graph_pagerank",
    "graph_pagerank_weighted",
    "sample_weighted_aes",
    "p1_variant_decode",
    "sketch_hll_daily_users",
    "sketch_hll_exact_twin",
    "multimodal_jpeg_stats",
    "multimodal_webp_stats",
    "multimodal_flac_stats",
    "multimodal_video_frames",
    "rollup_timeseries",
    "sessionize_events",
    "set_intersect_except",
    "lang_id_heuristic",
    "text_fingerprint",
    "text_quality_filter",
    "text_stats",
    "text_tfidf_top_terms",
    "a9_approx_aggs",
    "agg_argmax_family",
    "agg_array_funcs",
    "asof_last_click",
    "bigram_top20",
    "column_profile",
    "corpus_clean",
    "corpus_vocab_stats",
    "decontaminate_ngrams",
    "dedup_embedding_cosine",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_per_source_best",
    "doc_curriculum_buckets",
    "doc_embedding_coverage",
    "doc_length_histogram",
    "embed_centroid_assign",
    "embed_dim_stats",
    "embed_pq_codes",
    "embed_quality_gate",
    "embed_quantize_int8",
    "heavy_hitter_tokens",
    "multimodal_features",
    "pii_scrub",
    "pmi_top_bigrams",
    "q6_forecast_revenue",
    "q8_market_share",
]


def load_all() -> None:
    """Import every module that registers queries (idempotent) and
    apply the `_PRIORITY` iteration order."""
    import dynamodb_to_datalake_project_spark.queries  # noqa: F401
    import dynamodb_to_datalake_project_spark.transform  # noqa: F401
    import dynamodb_to_datalake_project_spark.dedup  # noqa: F401
    import dynamodb_to_datalake_project_spark.merge  # noqa: F401
    import dynamodb_to_datalake_project_spark.diff  # noqa: F401
    import dynamodb_to_datalake_project_spark.timeseries  # noqa: F401
    import dynamodb_to_datalake_project_spark.sampling  # noqa: F401
    import dynamodb_to_datalake_project_spark.audit  # noqa: F401
    import dynamodb_to_datalake_project_spark.graph  # noqa: F401
    import dynamodb_to_datalake_project_spark.skew  # noqa: F401
    import dynamodb_to_datalake_project_spark.llm.text  # noqa: F401
    import dynamodb_to_datalake_project_spark.llm.dedup  # noqa: F401
    import dynamodb_to_datalake_project_spark.llm.similarity  # noqa: F401
    import dynamodb_to_datalake_project_spark.llm.multimodal  # noqa: F401
    import dynamodb_to_datalake_project_spark.llm.decontam  # noqa: F401
    import dynamodb_to_datalake_project_spark.llm.curate  # noqa: F401
    import dynamodb_to_datalake_project_spark.llm.sketch  # noqa: F401
    import dynamodb_to_datalake_project_spark.llm.bpe  # noqa: F401
    import dynamodb_to_datalake_project_spark.llm.lm  # noqa: F401
    import dynamodb_to_datalake_project_spark.llm.cluster  # noqa: F401
    import dynamodb_to_datalake_project_spark.llm.ebml  # noqa: F401
    import dynamodb_to_datalake_project_spark.llm.h264  # noqa: F401
    import dynamodb_to_datalake_project_spark.llm.mpegts  # noqa: F401
    import dynamodb_to_datalake_project_spark.llm.web  # noqa: F401

    lead = [n for n in _PRIORITY if n in QUERIES]
    rest = [n for n in QUERIES if n not in set(lead)]
    for store in (QUERIES, ORACLE):
        ordered = {n: store[n] for n in (*lead, *rest) if n in store}
        store.clear()
        store.update(ordered)
