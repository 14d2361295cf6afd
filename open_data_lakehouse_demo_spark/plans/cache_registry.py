"""Registry of CACHE-BACKED inventory queries — rows whose warm bench
numbers depend on a session-scoped cached structure (a trained ANN
index, the ExactSubstr positioned-hash index / merged-interval relation,
eval-hash literal sets). One list, two consumers:

- tools/bench_vs_duck.py prints the cold-build appendix from it;
- bench.py records a per-row ``cold_s`` in BENCH_QUERIES.json from it,
  so the driver artifact is self-describing (r9 VERDICT item #6): a
  reader of BENCH_QUERIES.json sees both the steady-state warm median
  AND what one session pays before it applies, without cross-referencing
  BENCH_VS_DUCK.md.

Each entry: (query_name, clear_cache_fn, cached_structure_description).
``clear_cache_fn`` drops exactly the session cache(s) the query's warm
run reuses; the scan cache stays warm so a cold run prices the
index/arm/eval build itself, not parquet footer resolution.
"""

from __future__ import annotations

from typing import Callable


def cold_specs() -> list[tuple[str, Callable[[], object], str]]:
    from open_data_lakehouse_demo_spark.plans import inventory_corpus as ic
    from open_data_lakehouse_demo_spark.plans import inventory_vectors as iv

    def _clear_scrub():
        ic.clear_substr_index_cache()
        ic.clear_scrub_result_cache()

    return [
        ("cosine_topk_ivf_kmeans", iv.clear_ivf_index_cache, "trained-IVF index"),
        ("cosine_topk_ivf_kmeans1", iv.clear_ivf_index_cache, "trained-IVF index"),
        ("ivf_pq_topk", iv.clear_ivf_index_cache, "IVF+PQ codebooks+codes"),
        ("ivf_sq8_topk", iv.clear_ivf_index_cache, "IVF+SQ8 encoded lists"),
        ("ann_recall_eval", iv.clear_ann_ranked_cache, "ground-truth arm"),
        ("ann_recall_sweep", iv.clear_ann_ranked_cache, "ground-truth arm"),
        ("shared_substring_spans", ic.clear_substr_index_cache,
         "positioned-hash index"),
        # the scrub family's cold runs must clear BOTH caches — the
        # positioned-hash index AND the shared merged-interval relation
        ("scrub_duplicated_spans", _clear_scrub,
         "positioned-hash index + merged intervals"),
        ("scrub_spans_meta", _clear_scrub,
         "positioned-hash index + merged intervals"),
        ("scrub_text_digest", _clear_scrub,
         "positioned-hash index + merged intervals"),
        ("incremental_scrub_batch", ic.clear_substr_index_cache,
         "positioned-hash index"),
        ("benchmark_decontaminate", ic.clear_decon_eval_cache,
         "eval hash literals"),
        ("bloom_decontaminate", ic.clear_bloom_eval_cache,
         "bloom+audit eval literals"),
    ]
