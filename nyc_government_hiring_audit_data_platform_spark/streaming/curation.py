"""Streaming curation: train-batch / apply-stream for the filter stack.

The corpus-global statistics the keep/drop rules need (boilerplate gram
set, unigram surprisal weights, the [P05, P95] surprisal band) cannot be
computed ON a stream - they are properties of a whole corpus. The
production shape is therefore:

1. ``build_curation_model`` - one batch pass over a reference corpus
   produces a VOCABULARY-SIZED model (gram set + term weights + band
   edges). Vocabulary scales with language, not corpus: at 100 TB the
   model still fits comfortably in a broadcast.
2. ``streaming_keep_decisions`` - the model is inlined as literal
   map columns, so per-document scoring is a stateless expression
   chain: NO stream-side shuffle, NO stateful aggregation, NO
   watermark needed - documents flow through in append mode and each
   row leaves with its keep/drop flags. This is the same
   batch-train/stream-serve split as any model scorer. Literal maps
   carry comfortably to ~10^4-10^5 entries; for a full web-scale
   vocabulary, swap the map literals for a broadcast variable consumed
   inside a mapInPandas scorer - same stateless append-mode contract,
   model shipped once per executor instead of once per plan.

Flag semantics match ``driver_queries_curation.q_curation_keep_decisions``
exactly (asserted by test against the batch query on the same corpus).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nyc_government_hiring_audit_data_platform_spark.driver_queries_curation import (
    _BP_DF,
    _BP_DROP,
    _BP_N,
    _LEN_MAX,
    _LEN_MIN,
    _SURP_SCALE,
    _word_grams,
)


def build_curation_model(spark: SparkSession, docs: DataFrame) -> dict:
    """Batch-train the filter-stack model from a reference corpus.

    Returns {"boiler_grams": [str], "surp": {term: micro_nats},
    "band": (lo, hi)} - all vocabulary-sized; the three collects pull
    back the gram set, the term-weight table and two doubles, never
    document rows."""
    # token array hoisted to a column first: Catalyst has no CSE inside
    # HOF lambdas, so _word_grams over an inline tokenize expression
    # re-splits the text per gram - O(len^2) per doc
    tk = docs.select(
        "doc_id",
        F.filter(F.split("text", " "), lambda t: t != "").alias("_tk"),
    )
    ex = tk.select("doc_id", F.explode(_word_grams(F.col("_tk"), _BP_N)).alias("g"))
    boiler = [
        r["g"]
        for r in ex.groupBy("g")
        .agg(F.countDistinct("doc_id").alias("df"))
        .filter(F.col("df") >= _BP_DF)
        .collect()
    ]
    lterms = docs.select(
        "doc_id",
        F.explode(F.filter(F.split(F.lower("text"), " "), lambda t: t != "")).alias(
            "term"
        ),
    )
    tf = lterms.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    cnt = tf.groupBy("term").agg(F.sum("tf").alias("c"))
    tot = cnt.agg(F.sum("c").alias("total"))
    surp_rows = (
        cnt.crossJoin(F.broadcast(tot))
        .select(
            "term",
            F.round(F.log(F.col("total") * 1.0 / F.col("c")) * _SURP_SCALE)
            .cast("long")
            .alias("s"),
        )
        .collect()
    )
    surp = {r["term"]: r["s"] for r in surp_rows}
    if not surp_rows:
        # degenerate corpus (empty, or all-empty texts): empty model -
        # the stream scorer then drops everything via the n_tok==0 rule
        return {"boiler_grams": boiler, "surp": {}, "band": (0.0, 0.0)}
    surp_df = spark.createDataFrame(surp_rows)
    per = (
        tf.join(surp_df, "term")
        .groupBy("doc_id")
        .agg(
            (
                F.sum(F.col("tf") * F.col("s")) * 1.0 / F.sum("tf") / _SURP_SCALE
            ).alias("avg_s")
        )
    )
    band = per.agg(
        F.expr("percentile_disc(0.05) WITHIN GROUP (ORDER BY avg_s)").alias("lo"),
        F.expr("percentile_disc(0.95) WITHIN GROUP (ORDER BY avg_s)").alias("hi"),
    ).collect()[0]
    return {"boiler_grams": boiler, "surp": surp, "band": (band["lo"], band["hi"])}


def streaming_keep_decisions(docs: DataFrame, model: dict) -> DataFrame:
    """Apply the batch-trained model to a (streaming or batch) document
    relation as pure expressions: per row, grams via transform, the
    boilerplate ratio via array_intersect-style membership against the
    literal gram set, surprisal via a literal term->weight map fold.
    Stateless map -> valid in append mode with no watermark."""
    # hoist both token arrays into columns before any lambda touches
    # them (no CSE inside HOF lambdas - O(len^2) otherwise); the scratch
    # columns never leave this function (the final select drops them)
    docs = docs.withColumns(
        {
            "_tk": F.filter(F.split("text", " "), lambda t: t != ""),
            "_ltk": F.filter(F.split(F.lower("text"), " "), lambda t: t != ""),
        }
    )
    ltoks = F.col("_ltk")
    grams = _word_grams(F.col("_tk"), _BP_N)

    # gram membership as an O(1) map lookup per gram, not an O(|set|)
    # array scan
    if model["boiler_grams"]:
        boiler_map = F.map_from_arrays(
            F.array(*[F.lit(g) for g in model["boiler_grams"]]),
            F.array(*[F.lit(1) for _ in model["boiler_grams"]]),
        )
    else:
        boiler_map = F.map_from_arrays(
            F.array().cast("array<string>"), F.array().cast("array<int>")
        )
    n_grams = F.size(grams)
    n_boiler = F.size(F.filter(grams, lambda g: boiler_map[g].isNotNull()))
    br = n_boiler * 1.0 / F.greatest(n_grams, F.lit(1))

    if model["surp"]:
        terms, weights = zip(*sorted(model["surp"].items()))
        surp_map = F.map_from_arrays(
            F.array(*[F.lit(t) for t in terms]),
            F.array(*[F.lit(int(w)) for w in weights]),
        )
    else:
        surp_map = F.map_from_arrays(
            F.array().cast("array<string>"), F.array().cast("array<bigint>")
        )
    known = F.filter(ltoks, lambda t: surp_map[t].isNotNull())
    n_tok = F.size(known)
    ssum = F.aggregate(
        known, F.lit(0).cast("bigint"), lambda acc, t: acc + surp_map[t]
    )
    avg_s = ssum * 1.0 / F.greatest(n_tok, F.lit(1)) / _SURP_SCALE
    lo, hi = model["band"]

    flag_bp = F.when(br >= _BP_DROP, 1).otherwise(0)
    flag_sp = F.when(
        (n_tok == 0) | (avg_s < F.lit(lo)) | (avg_s > F.lit(hi)), 1
    ).otherwise(0)
    # length is a DOCUMENT property: count every token, not just
    # model-vocabulary tokens (OOV-heavy streamed docs would otherwise
    # look artificially short); surprisal stays averaged over known
    # tokens, the only ones the model can score
    n_all = F.size(ltoks)
    flag_len = F.when((n_all < _LEN_MIN) | (n_all > _LEN_MAX), 1).otherwise(0)
    return docs.select(
        "doc_id",
        flag_bp.alias("flag_boilerplate"),
        flag_sp.alias("flag_surprisal"),
        flag_len.alias("flag_length"),
        F.when(flag_bp + flag_sp + flag_len == 0, 1).otherwise(0).alias("keep"),
    )


def run_dedup_ingest(
    stream_docs: DataFrame,
    corpus_dir: str,
    index_dir: str,
    checkpoint_dir: str,
    jaccard_threshold: float = 0.5,
) -> None:
    """Streaming ingest with near-dup rejection - the production loop
    that keeps a growing corpus duplicate-free at ingest time:

    per micro-batch (foreachBatch):
      1. probe the persisted MinHash band index with ONLY the batch
         (``operators.dedup.incremental_neardup`` - cost proportional
         to the batch, the corpus is touched via index lookups);
      2. drop batch docs matching the corpus, then near-dups WITHIN the
         batch (min-id survivor via ``minhash_lsh_pairs``);
      3. append survivors to the corpus and their band rows to the
         index, so the NEXT batch dedups against them too.

    Writes are REPLAY-IDEMPOTENT by construction: each batch lands in
    its own ``b{batch_id}`` subdirectory of corpus and index with
    mode=overwrite, and the probe EXCLUDES the current batch's own
    index rows (an ``ingest_batch`` column). A replayed batch therefore
    recomputes the same survivor set against the same prior-state index
    and overwrites its own subdirs with identical content - no
    duplicates, no loss, regardless of where the previous attempt
    crashed. Presence probing goes through the Spark reader (glob), so
    any Hadoop-compatible filesystem works - never driver-local
    os.path. availableNow + awaitTermination. Read the corpus back
    with ``read_ingested_corpus``."""
    from pyspark.errors import AnalysisException

    from nyc_government_hiring_audit_data_platform_spark.operators import dedup as D

    def apply(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        # input-edge fan-out (dedup.py contract), gated on the batch's
        # observed width (r14): a micro-batch may arrive in however few
        # partitions the source produced - spread it only then; a batch
        # already >= defaultParallelism partitions keeps its layout
        # (repartition(n) is AQE-coalescing-exempt and would force a
        # full text shuffle per batch). The dedup operators themselves
        # never shuffle text.
        from nyc_government_hiring_audit_data_platform_spark.driver_queries import (
            fan_out,
        )

        batch = fan_out(batch_df.select("doc_id", "text")).persist()
        try:
            try:
                index = spark.read.parquet(f"{index_dir}/b*").filter(
                    F.col("ingest_batch") != batch_id
                )
                have_index = bool(index.take(1))
            except AnalysisException:
                have_index = False
            if have_index:
                hits = D.incremental_neardup(
                    batch, index, "text", "doc_id", jaccard_threshold
                )
                batch_kept = batch.join(
                    hits.select(F.col("new_id").alias("doc_id")).distinct(),
                    "doc_id",
                    "left_anti",
                )
            else:
                batch_kept = batch
            # batch-internal near-dups: min doc_id survives
            pairs = D.minhash_lsh_pairs(
                batch_kept, "text", "doc_id", jaccard_threshold
            )
            losers = pairs.select(
                F.greatest("id_a", "id_b").alias("doc_id")
            ).distinct()
            survivors = batch_kept.join(losers, "doc_id", "left_anti").persist()
            survivors.write.mode("overwrite").parquet(f"{corpus_dir}/b{batch_id}")
            D.build_band_index(survivors, "text", "doc_id").withColumn(
                "ingest_batch", F.lit(batch_id)
            ).write.mode("overwrite").parquet(f"{index_dir}/b{batch_id}")
            survivors.unpersist()
        finally:
            batch.unpersist()

    q = (
        stream_docs.writeStream.foreachBatch(apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def read_ingested_corpus(spark: SparkSession, corpus_dir: str) -> DataFrame:
    """All documents accepted by ``run_dedup_ingest`` (union of the
    per-batch subdirectories)."""
    return spark.read.parquet(f"{corpus_dir}/b*")

def streaming_classifier_scores(docs: DataFrame) -> DataFrame:
    """Apply the frozen linear quality classifier
    (``driver_queries_quality.q_quality_classifier_scores``) to a
    (streaming or batch) document relation as ONE stateless expression
    chain - the stream-serve twin of the batch apply pass.

    The batch query scores via an explode -> doc x bucket agg ->
    broadcast-model join; on a stream that shape would need a stateful
    aggregation. Because the model is hashed-bucket-keyed, the
    equivalent per-row fold needs no shuffle at all: map tokens to
    buckets with ``transform``, then fold the weight formula inside an
    ``aggregate`` lambda whose variable is literally named ``b`` - so
    the shared ``_LQC_W`` text applies VERBATIM (no string surgery,
    the pass-4 lesson), and integer adds commute so fold order vs the
    batch SUM is irrelevant. Append mode, no watermark, no state. For
    a REAL trained model the formula becomes a literal bucket->weight
    map (1024 entries, far under the literal-map sizes the rule scorer
    above already carries) or a broadcast inside mapInPandas; the
    stateless contract is unchanged.

    Row-for-row equal to the batch query on the same corpus
    (asserted by test_streaming_classifier_matches_batch)."""
    from nyc_government_hiring_audit_data_platform_spark.functions.classifier import (
        _LQC_BUCKET,
        _LQC_W,
        _lqc_tokens,
    )

    # hoist the token then bucket arrays into columns (no CSE inside
    # HOF lambdas); per-token lambda work is O(1) - the variable is the
    # token itself, never a re-slice of the text. Tokenizer and bucket
    # hash are the SHARED definitions (_lqc_tokens / _LQC_BUCKET), so
    # they cannot drift from the batch scorer's.
    folded = docs.withColumns(
        {
            "_tk": _lqc_tokens(),
        }
    ).withColumns(
        {
            "_bk": F.expr(f"transform(_tk, t -> {_LQC_BUCKET.format(t='t')})"),
        }
    ).withColumns(
        {
            "_n_tok": F.expr("cast(size(_tk) as bigint)"),
            "_ssum": F.expr(
                f"aggregate(_bk, cast(0 as bigint), "
                f"(acc, b) -> acc + ({_LQC_W}))"
            ),
        }
    )
    logit = "_ssum DIV GREATEST(_n_tok, 1)"
    return folded.select(
        "doc_id",
        F.col("_n_tok").alias("n_tok"),
        F.expr(logit).alias("logit_micro"),
        F.expr(
            f"CAST(CASE WHEN {logit} >= 0 AND _n_tok >= 1 "
            f"THEN 1 ELSE 0 END AS INT)"
        ).alias("keep"),
    )
