"""Training-data-pipeline query suite: dedup, similarity search, text
analysis over the ``documents`` and ``embeddings`` tables.

Registered into the same QUERIES/ORACLE registry as the relational
suite (imported from ``driver_queries`` at the bottom of that module).
Every query here has an exact DuckDB oracle - the algorithms are
deliberately built from engine-portable primitives (md5, list ops,
double math, ROUND) so the driver's value-hash check stays strong.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from nyc_government_hiring_audit_data_platform_spark.driver_queries import query, table
from nyc_government_hiring_audit_data_platform_spark.functions import textstats as TS
from nyc_government_hiring_audit_data_platform_spark.operators import ann as ANN
from nyc_government_hiring_audit_data_platform_spark.operators import dedup as DD

# ---------------------------------------------------------------------------
# deduplication
# ---------------------------------------------------------------------------


@query("exact_dedup", DD.exact_dedup_groups_sql("documents", "text", "doc_id"))
def q_exact_dedup(spark, sf_dir):
    """Exact dedup via hash-groupBy: one shuffle on the md5 key;
    map-side combine does almost all the work at scale."""
    return DD.exact_dedup_groups(table(spark, sf_dir, "documents"), "text", "doc_id")


@query(
    "minhash_lsh_neardup",
    DD.minhash_lsh_pairs_sql(
        "(SELECT * FROM documents WHERE doc_id % 5 = 0)", "text", "doc_id", 0.25
    ),
)
def q_minhash_lsh(spark, sf_dir):
    """MinHash+LSH near-dup pairs (shingle -> 12 minhashes -> 4 bands ->
    bucket equi-join -> exact jaccard verify >= 0.25) on a 1/5 document
    sample (the synthetic corpus shares vocabulary so heavily that LSH
    buckets collide broadly; the sample keeps the oracle tractable)."""
    docs = table(spark, sf_dir, "documents").filter(F.col("doc_id") % 5 == 0)
    return DD.minhash_lsh_pairs(docs, "text", "doc_id", 0.25)


@query(
    "ngram_jaccard_neardup",
    DD.ngram_jaccard_pairs_sql(
        "(SELECT * FROM documents WHERE doc_id % 10 = 0)", "text", "doc_id", 0.25
    ),
)
def q_ngram_jaccard(spark, sf_dir):
    """Exact shingle-blocked n-gram Jaccard join on a 1/10th document
    sample (the exact quadratic variant; MinHash LSH is the scale path)."""
    docs = table(spark, sf_dir, "documents").filter(F.col("doc_id") % 10 == 0)
    return DD.ngram_jaccard_pairs(docs, "text", "doc_id", 0.25)


@query(
    "simhash_signatures",
    f"SELECT doc_id, {DD.simhash_sql('text')} AS simhash FROM documents",
)
def q_simhash(spark, sf_dir):
    """Per-document 16-bit SimHash signature (array fold, map-side,
    pre-repartitioned so the fold parallelizes off a single file)."""
    return DD.simhash_signatures_df(table(spark, sf_dir, "documents"), "text", "doc_id")


@query(
    "simhash_collisions",
    f"""
    WITH sigs AS (SELECT doc_id, {DD.simhash_sql('text')} AS simhash FROM documents)
    SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.simhash
    FROM sigs a JOIN sigs b ON a.simhash = b.simhash AND a.doc_id < b.doc_id
    """,
)
def q_simhash_collisions(spark, sf_dir):
    """SimHash near-dup candidates: pairs with identical signatures
    (self equi-join on the persisted signature projection - the naive
    plan evaluates the signature fold once per join side)."""
    return DD.simhash_collision_pairs(
        table(spark, sf_dir, "documents"), "text", "doc_id"
    )


@query(
    "embedding_neardup",
    ANN.embedding_neardup_pairs_sql("embeddings", "vec_id", "embedding", 0.3),
)
def q_embedding_neardup(spark, sf_dir):
    """Embedding-cosine near-dup pairs, LSH-bucket-blocked. Threshold
    0.3 because the synthetic embeddings have no true duplicates (max
    same-bucket cosine ~0.45); production near-dup would use ~0.95."""
    return ANN.embedding_neardup_pairs(
        table(spark, sf_dir, "embeddings"), "vec_id", "embedding", 0.3
    )


# ---------------------------------------------------------------------------
# similarity search
# ---------------------------------------------------------------------------


@query(
    "ann_cosine_topk",
    ANN.cosine_topk_sql("embeddings", "vec_id", "embedding", "vec_id < 5", 10),
)
def q_ann_cosine_topk(spark, sf_dir):
    """Brute-force cosine top-10 for 5 query vectors (exact baseline;
    broadcast queries, corpus never moves)."""
    emb = table(spark, sf_dir, "embeddings")
    return ANN.cosine_topk(
        emb.filter(F.col("vec_id") < 5), emb, "vec_id", "embedding",
        "vec_id", "embedding", 10,
    )


@query(
    "ann_lsh_topk",
    ANN.lsh_topk_sql("embeddings", "vec_id", "embedding", "vec_id < 20", 5),
)
def q_ann_lsh_topk(spark, sf_dir):
    """Approximate top-5 via random-hyperplane LSH buckets (scale path:
    equi-join on bucket id replaces the full scan)."""
    emb = table(spark, sf_dir, "embeddings")
    return ANN.lsh_topk(
        emb.filter(F.col("vec_id") < 20), emb, "vec_id", "embedding",
        "vec_id", "embedding", 5,
    )


@query(
    "ann_ivf_topk",
    ANN.ivf_topk_sql("embeddings", "vec_id", "embedding", "vec_id < 20", 5, nprobe=4),
)
def q_ann_ivf_topk(spark, sf_dir):
    """Approximate top-5 via an IVF coarse quantizer: corpus assigned to
    its nearest of 16 centroids map-side, each query probes its 4
    nearest clusters (equi-join on cluster id). The second scale path
    besides LSH - candidate volume ~nprobe/16 of the corpus."""
    emb = table(spark, sf_dir, "embeddings")
    return ANN.ivf_topk(
        emb.filter(F.col("vec_id") < 20), emb, "vec_id", "embedding",
        "vec_id", "embedding", 5, nprobe=4,
    )


# ---------------------------------------------------------------------------
# text analysis
# ---------------------------------------------------------------------------


def _docs_par(spark, sf_dir, *cols):
    """documents slice, repartitioned so per-row expression work spreads
    across cores instead of running in the single-file scan's one task."""
    par = spark.sparkContext.defaultParallelism
    return table(spark, sf_dir, "documents").select(*cols).repartition(par)


@query(
    "token_counts",
    f"""
    SELECT doc_id,
           {TS.whitespace_token_count_sql('text')} AS ws_tokens,
           {TS.bpe_ish_token_count_sql('text')} AS bpe_tokens
    FROM documents
    """,
)
def q_token_counts(spark, sf_dir):
    """Whitespace + BPE-ish token counting (expression-only)."""
    docs = _docs_par(spark, sf_dir, "doc_id", "text")
    return docs.select(
        "doc_id",
        TS.whitespace_token_count("text").alias("ws_tokens"),
        TS.bpe_ish_token_count("text").alias("bpe_tokens"),
    )


@query(
    "lang_id",
    f"""
    SELECT {TS.lang_id_sql('text')} AS lang_pred, COUNT(*) AS n_docs
    FROM documents GROUP BY 1
    """,
)
def q_lang_id(spark, sf_dir):
    """Stopword-heuristic language ID, aggregated to predicted-language
    counts."""
    docs = _docs_par(spark, sf_dir, "text")
    return (
        docs.select(TS.lang_id("text").alias("lang_pred"))
        .groupBy("lang_pred")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


@query(
    "quality_scores",
    f"""
    SELECT doc_id,
           {TS.quality_score_sql('text')} AS quality,
           ROUND({TS.punct_ratio_sql('text')}, 6) AS punct_ratio,
           ROUND({TS.stopword_ratio_sql('text')}, 6) AS stop_ratio
    FROM documents
    """,
)
def q_quality_scores(spark, sf_dir):
    """Per-document quality features + composite score (C4-style
    length/punct/stopword heuristics)."""
    docs = _docs_par(spark, sf_dir, "doc_id", "text")
    return docs.select(
        "doc_id",
        TS.quality_score("text").alias("quality"),
        F.round(TS.punct_ratio("text"), 6).alias("punct_ratio"),
        F.round(TS.stopword_ratio("text"), 6).alias("stop_ratio"),
    )


@query(
    "doc_fingerprints",
    f"""
    SELECT doc_id, {TS.doc_fingerprint_sql('text')} AS fingerprint
    FROM documents
    """,
)
def q_doc_fingerprints(spark, sf_dir):
    """Shingle-min-hash document fingerprint (append-robust identity)."""
    docs = _docs_par(spark, sf_dir, "doc_id", "text")
    return docs.select("doc_id", TS.doc_fingerprint("text").alias("fingerprint"))


@query(
    "corpus_quality_by_source",
    f"""
    SELECT source,
           COUNT(*) AS n_docs,
           ROUND(AVG({TS.quality_score_sql('text')}), 4) AS avg_quality,
           CAST(SUM({TS.bpe_ish_token_count_sql('text')}) AS BIGINT) AS total_tokens
    FROM documents GROUP BY source
    """,
)
def q_corpus_quality_by_source(spark, sf_dir):
    """Corpus curation rollup: per-source document counts, mean quality,
    token budget - the summary a training-data pipeline reports."""
    docs = _docs_par(spark, sf_dir, "source", "text")
    return docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg(TS.quality_score("text")), 4).alias("avg_quality"),
        F.sum(TS.bpe_ish_token_count("text")).cast("long").alias("total_tokens"),
    )
