"""Benchmark harness (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": <sf>,
     "extraction_docs_per_sec": N, ...}

Each query is forced with a noop sink (full computation, no driver
collect) so the measured time is the distributed plan, not toPandas().
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Headline set: the flagship extraction pipeline + one representative per
# operator family (relational agg/join, window, analytics, text stats,
# dedup, similarity). Chosen to exercise every physical pattern we rely on
# (pandas-UDF stage, shuffle agg, broadcast join, sort-merge join, window,
# date densification join, LSH self-join) at sf0.1 volume.
HEADLINE = [
    "extract_pipeline",
    "extract_pipeline_digest",
    "tpch_q1",
    "tpch_q3",
    "tpch_q4",
    "tpch_q5",
    "tpch_q6",
    "tpch_q2",
    "tpch_q7",
    "tpch_q8",
    "tpch_q9",
    "tpch_q10",
    "tpch_q11",
    "tpch_q12",
    "tpch_q13",
    "tpch_q14",
    "tpch_q15",
    "tpch_q16",
    "tpch_q17",
    "tpch_q18",
    "tpch_q19",
    "tpch_q20",
    "tpch_q21",
    "tpch_q22",
    "top_revenue_orders",
    "customers_per_region",
    "user_top_event",
    "densified_daily_counts",
    "count_by_type",
    "filtered_range",
    "token_count",
    "bpe_token_count",
    "quality_score",
    "lang_id",
    "fingerprint",
    "repetition_stats",
    "tfidf_top_terms",
    "bm25_topk",
    "phrase_search",
    "chunk_documents",
    "winnow_fingerprints",
    "winnow_pairs",
    "nfc_normalize",
    "media_captions",
    "multimodal_pack",
    "dup_ngram_stats",
    "ngram_novelty",
    "containment_pairs",
    "intra_doc_dedup",
    "host_boilerplate",
    "tokenizer_fertility",
    "source_similarity",
    "source_similarity_kmv",
    "lang_alpha_weights",
    "corpus_digest",
    "readability",
    "token_entropy",
    "bpe_pair_counts",
    "bpe_merges",
    "bpe_encode",
    "wordpiece_encode",
    "lattice_vocab",
    "lattice_encode",
    "bpe_vocab",
    "pmi_cooccurrence",
    "decontaminate",
    "decontaminate_near",
    "line_dedup",
    "substring_dedup",
    "stratified_sample",
    "corpus_rollup",
    "pii_scrub",
    "url_normalize",
    "url_dedup",
    "url_blocklist",
    "host_stats",
    "mix_weights",
    "epoch_plan",
    "global_shuffle",
    "lm_perplexity",
    "gopher_filter",
    "c4_filter",
    "hash_lr",
    "train_hash_lr",
    "hash_lr_trained",
    "roc_auc",
    "curriculum_order",
    "calibration_bins",
    "entity_mentions",
    "k_anonymity",
    "curation_funnel",
    "pack_sequences",
    "packing_efficiency",
    "html_main_content",
    "html_links",
    "anchor_text_index",
    "host_quota_sample",
    "ngram_lm",
    "kn_bigram_lm",
    "kn_perplexity",
    "stupid_backoff_score",
    "quality_tiers",
    "quality_percentile",
    "media_dedup",
    "media_mime_sniff",
    "media_phash",
    "media_phash_neardup",
    "vocab_coverage",
    "pagerank_hosts",
    "crawl_frontier",
    "triangle_hosts",
    "crawl_schedule",
    "layout_text",
    "dehyphenate",
    "header_footer_strip",
    "section_split",
    "keyword_rake",
    "reverse_search",
    "sentence_segment",
    "badword_filter",
    "assoc_rules",
    "quote_extract",
    "sample_alloc",
    "luhn_scan",
    "span_interleave_stats",
    "media_ref_integrity",
    "toc_extract",
    "footnote_link",
    "acronym_extract",
    "unit_normalize",
    "list_detect",
    "column_conformance",
    "zone_map_prune",
    "lang_confusion",
    "stylometry_delta",
    "source_diversity",
    "autocomplete_prefix",
    "table_column_types",
    "vocab_prune",
    "sessionize",
    "asof_last_purchase",
    "resample_locf",
    "events_rollup",
    "funnel_conversion",
    "retention_cohorts",
    "key_skew_stats",
    "salted_join",
    "range_join_windows",
    "zorder_key",
    "hilbert_key",
    "compaction_plan",
    "snapshot_diff",
    "dsir_weights",
    "rendezvous_shards",
    "cms_user_counts",
    "heavy_hitters",
    "event_dedup",
    "props_variant_stats",
    "daily_anomaly",
    "ab_test",
    "dow_seasonality",
    "event_transitions",
    "attribution_credit",
    "decayed_activity",
    "time_to_convert",
    "cusum_changepoint",
    "event_paths",
    "rfm_segments",
    "bot_detect",
    "anomaly_mad",
    "value_histogram",
    "link_reciprocity",
    "centroid_drift",
    "label_propagation",
    "cc_hosts",
    "cc_incremental",
    "expire_snapshots",
    "text_tiling",
    "event_rle",
    "levenshtein_names",
    "phonetic_groups",
    "cdc_chunk_dedup",
    "rouge_overlap",
    "dau_wau_stickiness",
    "gini_value",
    "user_entropy",
    "ewma_daily",
    "hits_hosts",
    "degree_ccdf",
    "shot_boundaries",
    "events_cube",
    "concordance",
    "branching_entropy",
    "kmv_setops",
    "seasonal_decompose",
    "order_deciles",
    "part_affinity",
    "collocations_llr",
    "embedding_quantile_norm",
    "churn_detect",
    "robust_value_stats",
    "pca_top_component",
    "filter_kappa",
    "lang_source_mi",
    "kcore_hosts",
    "user_tier_enrich",
    "wow_growth",
    "shipping_delay_stats",
    "discount_revenue_curve",
    "image_tiles",
    "token_length_hist",
    "utf8_stats",
    "interarrival_hist",
    "host_outlink_jaccard",
    "cluster_purity",
    "regional_top_parts",
    "null_profile",
    "benford_deviation",
    "dedup_audit_pairs",
    "bootstrap_ci",
    "dp_counts",
    "join_size_estimate",
    "morph_split",
    "numeric_profile",
    "linkage_scores",
    "ndcg_topk",
    "rank_biased_overlap",
    "pps_sample",
    "weighted_sample",
    "markov_stationary",
    "kaplan_meier",
    "ks_test",
    "psi_drift",
    "dup_rate_by_source",
    "corr_matrix",
    "filter_committee",
    "embedding_isotropy",
    "dow_hour_heatmap",
    "abtt_transform",
    "hashed_doc_embedding",
    "ppr_hosts",
    "autocorrelation",
    "rrf_fusion",
    "event_trigrams",
    "encoding_advisor",
    "doc_similar_topk",
    "cluster_size_hist",
    "dedup_threshold_curve",
    "source_trend",
    "dispersion_index",
    "capture_recapture",
    "query_likelihood",
    "markov_entropy_rate",
    "filter_pr",
    "span_kind_transitions",
    "dataset_split",
    "pareto_frontier",
    "zipf_fit",
    "heaps_law",
    "word_burstiness",
    "embedding_quantize",
    "embedding_outliers",
    "bloom_decontaminate",
    "scd2_user_status",
    "hll_mergeable_users",
    "sample_quantile_sketch",
    "exact_dedup",
    "incremental_dedup",
    "incremental_lsh_dedup",
    "ngram_jaccard",
    "minhash_lsh",
    "neardup_clusters",
    "dedup_survivors",
    "simhash_neardup",
    "embedding_neardup",
    "semdedup",
    "fuzzy_name_match",
    "cosine_topk",
    "hard_negatives",
    "bitext_mine",
    "ocr_garble_score",
    "script_mix",
    "lsh_ann_topk",
    "ivf_ann_topk",
    "mutual_knn",
    "ann_recall_eval",
    "adamic_adar",
    "degree_assortativity",
    "graph_modularity",
    "gt_unseen_mass",
    "lsh_candidate_eval",
    "clustering_coefficient",
    "yule_k",
    "lsh_bands_sweep",
    "simhash_hamming_curve",
    "community_conductance",
    "pq_encode",
    "pq_adc_topk",
    "pq_rerank_topk",
    "ivfpq_ann_topk",
    "kmeans_clusters",
    "cluster_balanced_sample",
    "robots_rules",
    "classify_rules",
    "auto_repair",
    "table_match",
    "span_validations",
    "page_filter",
    "span_regression",
    "text_tables",
    "media_features",
    "frame_sample",
    "audio_segments",
]


def _force(df) -> int:
    """Fully evaluate a DataFrame without materializing on the driver."""
    df.write.format("noop").mode("overwrite").save()
    return 0


# Host-contention canary (round-4 verdict #2): a fixed cheap reference
# query (tpch_q6: one scan + one agg, untouched since round 1) is timed
# best-of-2 at bench start, middle, and end. Its quiet-host floor at
# sf0.1 / local[32] is committed here (measured best-of-3 warm, see
# BENCH.md "Contention canary"); if any sample drifts past
# floor x CANARY_DRIFT the emitted JSON is marked "contended": true —
# a polluted driver round then reads as contention, not as a code
# regression (round 4's 216.8s headline was exactly this artifact).
CANARY_QUERY = "tpch_q6"
CANARY_FLOOR_SEC = 0.30
CANARY_DRIFT = 1.3


def canary_contended(samples, floor=CANARY_FLOOR_SEC, drift=CANARY_DRIFT):
    """True when any canary sample exceeds the quiet-host floor by more
    than the drift factor. Pure so the contract test can pin it."""
    return any(s > floor * drift for s in samples)


def _time_best_of_2(fn, spark, sf_dir) -> float:
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        _force(fn(spark, sf_dir))
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = -1.0

    import __spark_entry__ as entry
    from pdf_extractor_spark.session import build_session

    spark = build_session(
        "bench", master=f"local[{cpus}]", shuffle_partitions=cpus
    )

    qmap = entry.queries()
    timings: dict[str, float] = {}
    n_docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).count()

    # untimed warmup: spawn the Python UDF workers on every core and let the
    # JVM JIT the scan/agg paths, so timings below are steady-state (what a
    # long-running cluster job sees), not process-start cost
    from pyspark.sql import types as T
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(T.LongType())
    def _noop_udf(s):
        return s

    warm = spark.range(0, cpus * 4, 1, cpus).select(_noop_udf("id").alias("x"))
    _force(warm)
    _force(qmap["extract_pipeline"](spark, sf_dir))
    print("[bench] warmup done", file=sys.stderr, flush=True)

    # the committed canary floor is only meaningful at the configuration
    # it was measured at; at other sf/cpus the canary still reports its
    # samples but draws no contended verdict
    canary_applicable = abs(sf - 0.1) < 1e-9 and cpus == 32
    canary_samples: list[float] = []

    loadavg_samples: list[float] = []

    def _canary_sample() -> None:
        canary_samples.append(
            _time_best_of_2(qmap[CANARY_QUERY], spark, sf_dir)
        )
        # 1-min loadavg alongside each canary sample: a contended verdict
        # with loadavg ~0 is the hypervisor-budget phase (BENCH.md), one
        # with high loadavg is visible co-tenancy — different remedies
        loadavg_samples.append(round(os.getloadavg()[0], 2))
        print(
            f"[bench] canary {CANARY_QUERY}: {canary_samples[-1]}s "
            f"(load {loadavg_samples[-1]})",
            file=sys.stderr, flush=True,
        )

    # untimed canary warmup: the start sample must measure the HOST, not
    # this query's first-ever codegen (measured 0.337s cold vs 0.14-0.15s
    # for the mid/end samples on the same uncontended run — 0.05s from a
    # false trip at floor x drift = 0.39s)
    _force(qmap[CANARY_QUERY](spark, sf_dir))
    _canary_sample()

    # best-of-2: the first run pays codegen/JIT compilation for the query's
    # generated code paths; the second measures steady state (what the
    # 100 TB job sees, where compile cost amortizes over hours)
    for i, name in enumerate(HEADLINE):
        if i == len(HEADLINE) // 2:
            _canary_sample()
        timings[name] = _time_best_of_2(qmap[name], spark, sf_dir)
        print(f"[bench] {name}: {timings[name]}s", file=sys.stderr, flush=True)

    _canary_sample()
    contended = (
        canary_contended(canary_samples) if canary_applicable else None
    )

    total = round(sum(timings.values()), 3)
    extraction_dps = (
        round(n_docs / timings["extract_pipeline"], 2)
        if timings.get("extract_pipeline")
        else None
    )

    print(
        json.dumps(
            {
                "metric": "headline query wall time at sf (sum of best-of-2 per query)",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "n_headline": len(HEADLINE),
                "extraction_docs": n_docs,
                "extraction_docs_per_sec": extraction_dps,
                "canary": {
                    "query": CANARY_QUERY,
                    "floor_sec": CANARY_FLOOR_SEC,
                    "drift_threshold": CANARY_DRIFT,
                    "samples": canary_samples,
                    "loadavg_1m": loadavg_samples,
                    "applicable": canary_applicable,
                },
                "contended": contended,
                "cpus": cpus,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
