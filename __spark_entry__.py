"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All real logic lives in ``open_data_lakehouse_demo_spark``; this module is
a thin adapter over the named query inventory (plans/inventory.py).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def _inventory():
    from open_data_lakehouse_demo_spark.plans.inventory import QUERIES

    return QUERIES


# The driver's correctness artifact records at most ~50 queries in
# registration order.  With more queries than slots, len(inventory) - 50
# rotate out each round (keep _TAIL at exactly that size, disjoint from
# _PRIORITY); order so that (a) anything just fixed or newly added gets a
# fresh row, (b) anything absent from the PREVIOUS artifact re-appears,
# keeping every query green in the union of the two most recent artifacts.
_PRIORITY = [
    # the 16 queries rotated out in r03 (r03's _TAIL) — re-surface so the
    # r03∪r04 union again covers the full inventory (VERDICT r3 item 2)
    "buyer_cohort_setops",
    "revenue_rollup_region_nation",
    "asof_demand_join",
    "events_in_service_windows",
    "error_time_to_resolution",
    "customer_spend_momentum",
    "customer_value_deciles",
    "monthly_type_pivot",
    "corpus_quality_by_source",
    "line_service_windows",
    "nation_order_window",
    "demand_avg_recent",
    "customer_order_status",
    "first_event_per_user",
    "value_quantiles_sketch",
    "distinct_users_hll",
    # touched in round 4 — fresh rows required:
    # new Gopher-repetition + unigram-LM-rarity text-pipeline queries
    "repetition_profile",
    "token_rarity_profile",
    # new cluster-canonicalization + mixture-resampling pipeline queries
    "dup_cluster_canonical",
    "source_mixture_sample",
    # new exact shared-substring-span dedup signal
    "shared_substring_spans",
    # new concat-and-chunk sequence-packing assignment
    "packed_example_assignment",
    # new single-pass recall-vs-nprobe tuning sweep
    "ann_recall_sweep",
    # new incremental batch-vs-index near-dup detection
    "incremental_near_dups",
    # new round-4 additions (PII scrub, funnel, split, CMS, SemDeDup, PQ,
    # containment, OHLC) — fresh rows required
    "pii_scrub_profile",
    "funnel_conversion",
    "hash_split_assignment",
    "cms_heavy_hitters",
    "semantic_dedup",
    "pq_adc_topk",
    "containment_dups",
    "daily_ohlc",
    "skewed_join_salted",
    "ivf_pq_topk",
    # second-wave round-4 additions (SQ8 ANN, Bloom decontamination,
    # SCD2 intervals, multi-touch attribution, BPE merge learning)
    "sq_int8_topk",
    "bloom_decontaminate",
    "scd2_priority_history",
    "touch_attribution",
    "bpe_merges",
    # minhash path refactored this round (_minhash_bands) — fresh row
    "minhash_lsh_dups",
    # new oracle-checked 1-Lloyd-round trained-IVF variant
    "cosine_topk_ivf_kmeans1",
    # k-means training redesign (driver-side codebook, fused rounds)
    "cosine_topk_ivf_kmeans",
    # shared norm base + dot_batch signed-zero normalization
    "ann_recall_eval",
    "cosine_topk_ivf",
    "cosine_topk_bruteforce",
    "embedding_near_dup_lsh",
    # single-scan fused unigram+bigram generator (materialize dropped)
    "bigram_stats",
    # auto-AR common-sample AIC fix
    "ar_forecast_daily",
    "auto_ar_xreg_forecast_daily",
    "token_shard_assignment",
]
_TAIL = [
    # hash-green in CORRECTNESS_r03 (the freshest artifact) and untouched
    # this round — safe to rotate out for one round
    "simhash_dups",
    "distinct_users_hll_portable",
    "value_quantiles_histogram",
    # rows-only in r03, operator modules untouched this round
    "bus_ride_simulation",
    "video_frame_sample",
    "pricing_summary",
    "order_features",
    "minute_fanout",
    # rows-only media stubs, recorded in r03 and untouched this round
    # (video_frame_sample stays in-window — it was the r3 perf flag)
    "image_feature_extract",
    "audio_feature_extract",
    "ngram_jaccard_dups",
    "dup_clusters",
    "doc_fingerprints",
    "generated_rides",
    "user_sessions",
    "user_time_bounds",
    "collected_values",
    "top_orders",
    "demand_by_month",
    "demand_by_dayofweek",
    "english_docs_sample",
    "value_quantiles",
    "last_lineitem_per_order",
    "forecast_vs_actual",
    "actual_vs_two_forecasts",
    "hourly_conservation_check",
    "summarized_demand_gapfill",
    "linear_trend_forecast_daily",
    "scalar_gauntlet",
    "exact_dedup_docs",
    "text_quality_profile",
    "vocab_stats",
    "forecast_eval_metrics",
    "seasonal_forecast_daily",
    "language_id",
    "curated_corpus",
    "stratified_sample_docs",
    "benchmark_decontaminate",
    "latest_bus_state_batch",
    "capacity_alerts_batch",
]


def _ordered():
    inv = _inventory()
    names = [n for n in _PRIORITY if n in inv]
    names += [n for n in inv if n not in _PRIORITY and n not in _TAIL]
    names += [n for n in _TAIL if n in inv]
    return {n: inv[n] for n in names}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    queries = _inventory()
    return queries["pricing_summary"].spark(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.spark for name, q in _ordered().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (omitted ⇒ rows-only check)."""
    return {name: q.oracle for name, q in _ordered().items() if q.oracle is not None}
