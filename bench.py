"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line with per-query wall seconds.

Each query is forced end-to-end with the noop sink (full execution, no
driver-side collect cost). A warmup action amortizes JVM startup out of
the first measurement, and each query reports best-of-2 runs: this VM
shows nondeterministic multi-second stalls (host scheduling noise - the
same plan has measured 19s and 429s minutes apart with identical code),
and steady-state throughput is the number that predicts cluster
behavior.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO_DIR = os.path.dirname(os.path.abspath(__file__))
if REPO_DIR not in sys.path:
    sys.path.insert(0, REPO_DIR)

from nyc_government_hiring_audit_data_platform_spark import driver_queries as DQ
from nyc_government_hiring_audit_data_platform_spark.session import get_spark

BENCH_QUERIES = [
    "scan_project",
    "equi_join_agg",
    "groupby_max",
    "outer_join_agg",
    "topn_per_group",
    "window_running_sum",
    "cube_agg",
    "similarity_join_blocked",
    "similarity_topn_per_key",
    "events_hourly",
    "sessionize",
    "normalize_text",
    "date_impute_duration",
    # extended relational
    "multiway_join_regional",
    "salted_skew_join",
    "rank_dense_ntile",
    "asof_join",
    # flagship domain chain (reference fuzzy flow: 12m47s single-node,
    # BASELINE.md; here the full prep+match+band+gold chain)
    "fuzzy_salary_matches",
    "fuzzy_lightcast_durations",
    "gold_salary_matches_unique",
    # training-data-pipeline suite
    "exact_dedup",
    "minhash_lsh_neardup",
    "simhash_signatures",
    # ANN: only the scale-safe paths are headline. ann_cosine_topk (the
    # exact brute-force baseline, operators/ann.py) is deliberately
    # quadratic and stays OUT of this suite; its correctness claim is
    # carried by ann_ivf_recall_bound (IVF recall@10 vs the exact
    # result, bounded in-query) with a bucketed/probed plan.
    "ann_lsh_topk",
    "ann_ivf_topk",
    "ann_ivf_recall_bound",
    "kmeans_iteration",
    "token_counts",
    "quality_scores",
    "corpus_quality_by_source",
    "tfidf_top_terms",
    "pii_redaction",
    "repetition_ratio",
    "pack_sequences",
    "benchmark_contamination",
    "embedding_l2_normalize",
    "winsorize_clip",
    # corpus-curation suite (round 4)
    "boilerplate_ngram_flags",
    "chunk_dedup",
    "unigram_surprisal_quality",
    "hard_negative_mining",
    "snapshot_diff",
    "pagerank_iteration",
    "key_skew_profile",
    "heavy_hitters_bound",
    "curation_keep_decisions",
    "epoch_shuffle",
    "dedup_funnel",
    "vocab_coverage",
    "pmi_cooccurrence",
    "triangle_count",
    "record_linkage_scores",
    # sequence/session suite (round-4 continuation)
    "forward_fill",
    "time_weighted_avg",
    "bpe_pair_counts",
    "quantile_bucketize",
    "asof_join_nearest",
    "interval_coalesce",
    # published curation rule sets (round-4 continuation)
    "gopher_quality_flags",
    "c4_quality_rules",
    "dsir_importance_weights",
    "ccnet_perplexity_buckets",
    "bpe_apply_merge",
    "hybrid_rrf_retrieval",
    # round-5 additions: one slot per previously-unbenched plan FAMILY
    # so regressions in each family are visible (round-4 ask #7) -
    # iterative component closure, unrolled frontier expansion,
    # window-chained interval versioning, shard-prefix weighted rank,
    # batch-vs-index probe, and the full training loop.
    "neardup_keep_list",
    "bfs_distance",
    "scd2_intervals",
    "weighted_median",
    "incremental_neardup_batch",
    "bpe_train_merges",
    # round-5 published-method additions
    "semdedup_prune",
    "winnowing_fingerprints",
    "mixture_temperature_weights",
    "cms_frequency_bound",
    "duplicate_span_detect",
    "distinct_ngram_diversity",
    "stupid_backoff_score",
    "tokenizer_fertility",
    "source_vocab_overlap",
    "duplicate_span_removal",
    # round-6 additions
    "bloom_membership_gate",
    "corpus_mix_plan",
    "ann_pq_adc_topk",
    "ann_pq_recall_bound",
    "content_defined_chunks",
    "containment_neardup",
    "ann_ivfadc_topk",
    "kmv_source_similarity",
    "kmv_source_novelty",
    "quality_classifier_scores",
    "domain_reputation_gate",
    # minhash_lsh_recall earned a slot once its exact lane was
    # panel-bounded (r6): both lanes now linear-in-corpus, so the slot
    # times the production gate shape rather than a quadratic harness.
    "minhash_lsh_recall",
    # round-7 additions
    "corpus_mix_plan_staged",
    "ann_ivfadc_residual_topk",
    "ann_ivfadc_residual_recall",
    # round-8 additions
    "ann_ivfadc_rerank_topk",
    # bpe_encode_corpus stays OUT: encode re-runs the train loop
    # bpe_train_merges already times before its map-only encode.
    # round-9 additions: the occupancy-capped blocking join (new plan
    # family: per-token row_number windows ahead of the candidate join),
    # the lossless salted lane (hot-set broadcast + explode replication
    # ahead of the same join), and the grid-split LSH self-join
    # (occupancy-gated G x G matrix partitioning of hot buckets).
    "fuzzy_block_capped",
    "fuzzy_block_salted",
    "minhash_lsh_split",
    # round-10 addition: incremental view maintenance - a new plan
    # family (partial-state union + group-sized re-merge across delta
    # batches; the GOLD-refresh alternative to full recompute). The
    # retraction and rollup rows share the family (BENCH.md registry).
    "incremental_agg_refresh",
    # round-11 addition: incremental fuzzy matching - a new plan family
    # (persisted blocking-index probe for the delta batch + one-shot
    # prior, unioned; the weekly-cadence alternative to the reference's
    # full re-match).
    "fuzzy_incremental_union",
    # round-12 addition: capped index append maintenance + compaction
    # probed end-to-end (the hot-key occupancy lever's exactness story;
    # same plan family as fuzzy_incremental_union plus the cap window).
    "fuzzy_index_compaction",
    # round-13 addition: matches-corpus fold (per-batch ingest outputs
    # -> versioned base + manifest, read through base+unfolded; the
    # small-files retirement on the matches side of the lifecycle).
    "matches_corpus_compaction",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    spark = get_spark(app_name="bench")

    # Warm lap: run every query once untimed so JVM classloading,
    # parquet footers, and JIT compilation of the interpreted-eval
    # classes are out of the measurement (steady-state throughput is
    # what predicts cluster behavior; first-execution compile cost is
    # a per-JVM constant, not per-data).
    DQ.table(spark, sf_dir, "lineitem").count()
    for name in BENCH_QUERIES:
        DQ.QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        # Several queries persist() multi-consumer subtrees and cannot
        # unpersist them (the caller owns the returned DataFrame's
        # lifetime). Left in place across a 58-query session those
        # blocks accumulate into storage-memory pressure that evicts /
        # GC-thrashes the LATE queries (measured: heavy_hitters_bound
        # 11.3s inside the leaky session vs 0.9s isolated). Dropping
        # the cache between queries keeps each measurement the
        # steady-state of ITS OWN plan, which is what predicts cluster
        # behavior; within a query's timed laps the cache still reuses.
        spark.catalog.clearCache()

    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        fn = DQ.QUERIES[name]
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)
        spark.catalog.clearCache()

    total = round(sum(timings.values()), 3)
    payload = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }
    # Artifact-contract hardening (r14): the driver stores only the LAST
    # 2000 chars of stdout, and with 100+ slots the full JSON line is
    # ~4 KB - BENCH_r12's stored artifact lost the line's head and
    # PERF_r13 could not compute a single prev/now pair. Mitigations,
    # without touching the driver contract (stdout stays EXACTLY one
    # JSON line, byte-identical format): the full per-query map is also
    # written to BENCH_LAST.json in the repo (committed each close, so
    # the next round's PERF always has a parseable prev even if the
    # stdout artifact truncates again), and a short headline goes to
    # stderr for humans tailing the run.
    try:
        with open(os.path.join(REPO_DIR, "BENCH_LAST.json"), "w") as f:
            json.dump(payload, f, indent=1)
            f.write("\n")
    except OSError:
        pass  # read-only checkout: stdout still carries everything
    print(
        json.dumps(
            {"metric": "headline_queries_total", "value": total, "unit": "sec", "sf": sf}
        ),
        file=sys.stderr,
    )
    print(json.dumps(payload))
    spark.stop()


if __name__ == "__main__":
    main()
