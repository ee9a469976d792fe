"""Training-data-pipeline suite, part 2: PII redaction, repetition
scoring, sequence packing, domain-mix planning, embedding normalization,
benchmark-contamination detection - plus two relational gap-fills
(percent_rank/cume_dist window, FULL OUTER coalesce merge).

All exact-oracle-checked. Scale notes are per-query; the common theme is
that every operator here is either a stateless map-side expression chain
or a single partial-agg shuffle - nothing quadratic, nothing driver-side.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from nyc_government_hiring_audit_data_platform_spark.functions.numeric import (
    norm_round,
)

from nyc_government_hiring_audit_data_platform_spark.driver_queries import (
    fan_out,
    query,
    scan_width,
    table,
)
from nyc_government_hiring_audit_data_platform_spark.functions.textstats import (
    char_shingles,
    char_shingles_sql,
    whitespace_token_count,
    whitespace_token_count_sql,
)

# ---------------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------------

# RE2/Java-compatible subset: no lookaround, no backrefs - the patterns
# must behave identically in Spark (java.util.regex) and DuckDB (RE2).
_EMAIL_RE = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
_PHONE_RE = "[0-9]{3}-[0-9]{4}"

_PII_RAW_SQL = (
    "concat(substr(text, 1, 40), ' contact user', CAST(doc_id AS VARCHAR), "
    "'@example.com or 555-', lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0'), ' now')"
)


@query(
    "pii_redaction",
    f"""
    WITH src AS (SELECT doc_id, {_PII_RAW_SQL} AS raw FROM documents)
    SELECT doc_id,
           regexp_replace(regexp_replace(raw, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                          '{_PHONE_RE}', '<PHONE>', 'g') AS redacted,
           CAST(len(regexp_extract_all(raw, '{_EMAIL_RE}'))
                + len(regexp_extract_all(raw, '{_PHONE_RE}')) AS BIGINT) AS n_pii
    FROM src
    """,
)
def q_pii_redaction(spark, sf_dir):
    """PII scrubbing for training corpora: regex-redact emails and
    phone-shaped tokens, count hits. Synthetic PII is stamped onto each
    document first (the corpus generator emits none). Pure map-side
    expression chain - composes with scan pruning at any scale; the
    patterns stay in the RE2-compatible subset so the same rules run on
    Spark, DuckDB, and RE2-based PII scanners unchanged."""
    docs = fan_out(
        table(spark, sf_dir, "documents"),
        scan_width(spark, sf_dir, "documents"),
    )
    raw = F.concat(
        F.substring("text", 1, 40),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or 555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        F.lit(" now"),
    )
    src = docs.select("doc_id", raw.alias("raw"))
    return src.select(
        "doc_id",
        F.regexp_replace(
            F.regexp_replace("raw", _EMAIL_RE, "<EMAIL>"), _PHONE_RE, "<PHONE>"
        ).alias("redacted"),
        (
            F.size(F.regexp_extract_all("raw", F.lit(_EMAIL_RE), F.lit(0)))
            + F.size(F.regexp_extract_all("raw", F.lit(_PHONE_RE), F.lit(0)))
        )
        .cast("long")
        .alias("n_pii"),
    )


# ---------------------------------------------------------------------------
# repetition scoring (data-quality signal for filtering)
# ---------------------------------------------------------------------------


@query(
    "repetition_ratio",
    """
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split(text, ' '), t -> t <> '') AS t
      FROM documents
    ),
    grams AS (
      SELECT doc_id,
             CASE WHEN len(t) < 2 THEN []
                  ELSE list_transform(generate_series(1, len(t) - 1),
                                      i -> t[i] || ' ' || t[i + 1])
             END AS bg
      FROM toks
    )
    SELECT doc_id,
           CAST(len(bg) AS BIGINT) AS n_bigrams,
           ROUND(CASE WHEN len(bg) = 0 THEN 0.0
                      ELSE 1.0 - CAST(len(list_distinct(bg)) AS DOUBLE) / len(bg)
                 END, 3) AS rep_ratio
    FROM grams
    """,
)
def q_repetition_ratio(spark, sf_dir):
    """Word-bigram repetition ratio (1 - distinct/total): the standard
    boilerplate/spam signal for corpus filtering. Expression-only map
    stage; the bigram arrays never leave the row. Both engines build
    bigrams with 1-based element_at over the same token list, so the
    ratio is exact (int/int division on identical counts)."""
    docs = fan_out(
        table(spark, sf_dir, "documents"),
        scan_width(spark, sf_dir, "documents"),
    )
    toks = docs.select(
        "doc_id",
        F.filter(F.split("text", " "), lambda t: t != "").alias("t"),
    )
    # guard: Spark's sequence(1, 0) counts DOWN (DuckDB's is empty)
    bigrams = F.when(F.size("t") < 2, F.array().cast("array<string>")).otherwise(
        F.expr(
            "transform(sequence(1, size(t) - 1), "
            "i -> concat(element_at(t, i), ' ', element_at(t, i + 1)))"
        )
    )
    grams = toks.select("doc_id", bigrams.alias("bg"))
    return grams.select(
        "doc_id",
        F.size("bg").cast("long").alias("n_bigrams"),
        F.round(
            F.when(F.size("bg") == 0, F.lit(0.0)).otherwise(
                1.0 - F.size(F.array_distinct("bg")).cast("double") / F.size("bg")
            ),
            3,
        ).alias("rep_ratio"),
    )


# ---------------------------------------------------------------------------
# sequence packing (token-budget binning for pretraining batches)
# ---------------------------------------------------------------------------

_PACK_BUDGET = 2048


@query(
    "pack_sequences",
    f"""
    WITH sized AS (
      SELECT doc_id, source,
             {whitespace_token_count_sql('text')} AS n_tokens
      FROM documents
    )
    SELECT doc_id, source, n_tokens,
           CAST(floor(COALESCE(SUM(n_tokens) OVER (
                  PARTITION BY source ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                / {_PACK_BUDGET}) AS BIGINT) AS pack_id
    FROM sized
    """,
)
def q_pack_sequences(spark, sf_dir):
    """Sequence packing: assign documents to fixed token-budget packs
    (concat-and-chunk pretraining batches) via an exclusive running sum
    over doc order. Partitioned per source so the window parallelizes -
    at 100 TB you pack within shards, never through one global window;
    a single shuffle on (source) and the running sum is streaming."""
    docs = table(spark, sf_dir, "documents")
    sized = docs.select(
        "doc_id", "source", whitespace_token_count("text").alias("n_tokens")
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return sized.select(
        "doc_id",
        "source",
        "n_tokens",
        F.floor(F.coalesce(F.sum("n_tokens").over(w), F.lit(0)) / _PACK_BUDGET)
        .cast("long")
        .alias("pack_id"),
    )


# ---------------------------------------------------------------------------
# domain-mix planning (source weighting for corpus assembly)
# ---------------------------------------------------------------------------


@query(
    "domain_mix_plan",
    f"""
    WITH per_source AS (
      SELECT source, COUNT(*) AS n_docs,
             CAST(SUM({whitespace_token_count_sql('text')}) AS BIGINT) AS n_tokens
      FROM documents GROUP BY source
    )
    SELECT source, n_docs, n_tokens,
           ROUND(CAST(MIN(n_tokens) OVER () AS DOUBLE) / n_tokens, 4)
             AS resample_rate
    FROM per_source
    """,
)
def q_domain_mix_plan(spark, sf_dir):
    """Domain mixing: per-source token inventory plus the subsample rate
    that equalizes every source to the smallest one (uniform target
    mix). One partial-agg shuffle on source; the global MIN rides the
    broadcast-one-row-totals pattern (an agg reduced to one row, then a
    broadcast join back) - no single-partition Window anywhere, even
    over the per-source relation (the test_plans global-window gate
    flags empty-partition windows regardless of input size)."""
    docs = table(spark, sf_dir, "documents")
    per_source = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(whitespace_token_count("text")).cast("long").alias("n_tokens"),
    )
    mn = per_source.agg(F.min("n_tokens").alias("_min_tokens"))
    return per_source.crossJoin(F.broadcast(mn)).select(
        "source",
        "n_docs",
        "n_tokens",
        F.round(
            F.col("_min_tokens").cast("double") / F.col("n_tokens"), 4
        ).alias("resample_rate"),
    )


# ---------------------------------------------------------------------------
# temperature-scaled mixture weights (multilingual-corpus sampling)
# ---------------------------------------------------------------------------


@query(
    "mixture_temperature_weights",
    f"""
    WITH per_source AS (
      SELECT source,
             CAST(SUM({whitespace_token_count_sql('text')}) AS BIGINT) AS n_tokens
      FROM documents GROUP BY source
    ),
    scaled AS (
      SELECT source, n_tokens,
             CAST(FLOOR(sqrt(CAST(n_tokens AS DOUBLE)) * 1000000) AS BIGINT)
               AS sqrt_micro
      FROM per_source
    ),
    tot AS (SELECT CAST(SUM(sqrt_micro) AS BIGINT) AS total FROM scaled)
    SELECT source, n_tokens, sqrt_micro,
           sqrt_micro * 1000000 // total AS weight_micro
    FROM scaled CROSS JOIN tot
    """,
)
def q_mixture_temperature_weights(spark, sf_dir):
    """Temperature-scaled domain mixture weights, the published
    multilingual/multi-domain sampling rule (mT5, XLM-R, GPT-3 data
    mixing): p_i proportional to n_i^alpha with alpha < 1, boosting
    low-resource sources relative to proportional sampling. alpha is
    fixed at 1/2 here because IEEE sqrt is CORRECTLY ROUNDED on both
    engines (bit-identical doubles), unlike libm pow whose last-ulp
    drift would break the oracle hash; the weight itself is exact
    integer micro-units (FLOOR-integerized sqrt, BIGINT total, one
    integer division - the module's floor-integer convention, no
    cross-partition float sum ever crosses the hasher). Plan: one
    partial-agg shuffle on source, then broadcast-one-row total - the
    per-source relation is domain-bounded at any corpus size."""
    docs = table(spark, sf_dir, "documents")
    scaled = (
        docs.groupBy("source")
        .agg(F.sum(whitespace_token_count("text")).cast("long").alias("n_tokens"))
        .select(
            "source",
            "n_tokens",
            F.floor(F.sqrt(F.col("n_tokens").cast("double")) * 1000000)
            .cast("long")
            .alias("sqrt_micro"),
        )
    )
    tot = scaled.agg(F.sum("sqrt_micro").alias("total"))
    return scaled.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_tokens",
        "sqrt_micro",
        F.expr("sqrt_micro * 1000000L DIV total").alias("weight_micro"),
    )


# ---------------------------------------------------------------------------
# embedding L2 normalization (ANN preprocessing)
# ---------------------------------------------------------------------------


@query(
    "embedding_l2_normalize",
    """
    WITH sq AS (
      SELECT vec_id,
             sqrt(list_aggregate(
               list_transform(embedding,
                              x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
               'sum')) AS nrm,
             CAST(embedding[1] AS DOUBLE) AS e1,
             CAST(embedding[2] AS DOUBLE) AS e2
      FROM embeddings
    )
    SELECT vec_id, ROUND(nrm, 4) AS l2_norm,
           ROUND(e1 / nrm, 4) + 0 AS u1, ROUND(e2 / nrm, 4) + 0 AS u2
    FROM sq
    """,
)
def q_embedding_l2_normalize(spark, sf_dir):
    """L2 norm + first two unit-vector components per embedding - the
    normalize-before-cosine preprocessing for the ANN family. Per-row
    array fold (left-to-right in both engines, so bit-identical);
    map-side only, no shuffle at any scale."""
    emb = fan_out(
        table(spark, sf_dir, "embeddings"),
        scan_width(spark, sf_dir, "embeddings"),
    )
    sq = emb.select(
        "vec_id",
        F.expr(
            "sqrt(aggregate(embedding, 0D, "
            "(a, x) -> a + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))"
        ).alias("nrm"),
        F.element_at("embedding", 1).cast("double").alias("e1"),
        F.element_at("embedding", 2).cast("double").alias("e2"),
    )
    return sq.select(
        "vec_id",
        F.round("nrm", 4).alias("l2_norm"),
        norm_round(F.col("e1") / F.col("nrm"), 4).alias("u1"),
        norm_round(F.col("e2") / F.col("nrm"), 4).alias("u2"),
    )


# ---------------------------------------------------------------------------
# benchmark contamination (n-gram overlap against a held-out set)
# ---------------------------------------------------------------------------

_CONTAM_MIN_OVERLAP = 10


@query(
    "benchmark_contamination",
    f"""
    WITH bench_grams AS (
      SELECT DISTINCT unnest({char_shingles_sql('text', 8)}) AS g
      FROM documents WHERE doc_id % 50 = 0
    ),
    corpus AS (
      SELECT doc_id, unnest({char_shingles_sql('text', 8)}) AS g
      FROM documents WHERE doc_id % 50 <> 0
    )
    SELECT c.doc_id, COUNT(*) AS overlap_grams
    FROM corpus c JOIN bench_grams b ON c.g = b.g
    GROUP BY c.doc_id
    HAVING COUNT(*) >= {_CONTAM_MIN_OVERLAP}
    """,
)
def q_benchmark_contamination(spark, sf_dir):
    """Benchmark-contamination check: flag corpus documents sharing >=
    10 distinct 8-grams with a held-out benchmark slice (doc_id %
    50 = 0 stands in for the eval set). The benchmark gram set is tiny
    and broadcasts; the corpus side is one explode + equi-join + count
    - linear, never doc x doc. Corpus grams are per-doc DISTINCT
    (char_shingles dedups), so COUNT(*) counts distinct shared grams."""
    # Fan-out KEPT (r14 A/B: removing it read 1.60 -> 2.33 s, +46%):
    # the per-gram md5 shingle kernel is the heavy-per-row class where
    # the spread pays - unlike the tokenize->agg and kmeans-fold shapes
    # whose fan-outs were removed this round.
    docs = fan_out(
        table(spark, sf_dir, "documents"),
        scan_width(spark, sf_dir, "documents"),
    )
    bench = (
        docs.filter(F.col("doc_id") % 50 == 0)
        .select(F.explode(char_shingles("text", 8)).alias("g"))
        .distinct()
    )
    corpus = docs.filter(F.col("doc_id") % 50 != 0).select(
        "doc_id", F.explode(char_shingles("text", 8)).alias("g")
    )
    return (
        corpus.join(F.broadcast(bench), "g")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("overlap_grams"))
        .filter(F.col("overlap_grams") >= _CONTAM_MIN_OVERLAP)
    )


# ---------------------------------------------------------------------------
# feature engineering: outlier clipping + class balancing
# ---------------------------------------------------------------------------


@query(
    "winsorize_clip",
    """
    WITH bounds AS (
      SELECT event_type,
             quantile_cont(value, 0.05) AS lo,
             quantile_cont(value, 0.95) AS hi
      FROM events GROUP BY event_type
    )
    SELECT e.event_id, e.event_type,
           ROUND(CASE WHEN e.value < b.lo THEN b.lo
                      WHEN e.value > b.hi THEN b.hi
                      ELSE e.value END, 3) AS v_clipped,
           CASE WHEN e.value < b.lo OR e.value > b.hi THEN 1 ELSE 0 END
             AS was_clipped
    FROM events e JOIN bounds b USING (event_type)
    """,
)
def q_winsorize_clip(spark, sf_dir):
    """Winsorization (outlier clipping to the per-group 5th/95th
    percentile) - the robust-scaling prep step before standardization.
    Same broadcast stats join-back shape as zscore/impute: one
    partial-agg shuffle for the tiny bounds relation, the fact side
    never shuffles. Spark's exact ``percentile`` interpolates like
    DuckDB's quantile_cont on the identical sorted doubles, so the
    bounds - and the clipped values, which COPY input values or bounds
    rather than deriving new floats - hash exact."""
    ev = table(spark, sf_dir, "events").select("event_id", "event_type", "value")
    bounds = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.05)").alias("lo"),
        F.expr("percentile(value, 0.95)").alias("hi"),
    )
    out = ev.join(F.broadcast(bounds), "event_type")
    clipped = (
        F.when(F.col("value") < F.col("lo"), F.col("lo"))
        .when(F.col("value") > F.col("hi"), F.col("hi"))
        .otherwise(F.col("value"))
    )
    return out.select(
        "event_id",
        "event_type",
        F.round(clipped, 3).alias("v_clipped"),
        F.when(
            (F.col("value") < F.col("lo")) | (F.col("value") > F.col("hi")), 1
        )
        .otherwise(0)
        .alias("was_clipped"),
    )


@query(
    "class_weights",
    """
    WITH counts AS (
      SELECT label, COUNT(*) AS n FROM embeddings GROUP BY label
    )
    SELECT label, n,
           ROUND(CAST((SELECT SUM(n) FROM counts) AS DOUBLE)
                 / ((SELECT COUNT(*) FROM counts) * n), 4) AS class_weight
    FROM counts
    """,
)
def q_class_weights(spark, sf_dir):
    """Inverse-frequency class weights (sklearn's 'balanced' formula:
    total / (n_classes * count_c)) over the embedding labels - the
    class-balancing step for a labeled training set. One partial-agg
    shuffle to the per-class counts; the totals come from a broadcast
    1-row aggregate of that tiny relation, never a second corpus pass."""
    emb = table(spark, sf_dir, "embeddings").select("label")
    counts = emb.groupBy("label").agg(F.count(F.lit(1)).alias("n"))
    totals = counts.agg(
        F.sum("n").alias("total"), F.count(F.lit(1)).alias("n_classes")
    )
    return counts.crossJoin(F.broadcast(totals)).select(
        "label",
        "n",
        F.round(
            F.col("total").cast("double") / (F.col("n_classes") * F.col("n")), 4
        ).alias("class_weight"),
    )


# ---------------------------------------------------------------------------
# relational gap-fills
# ---------------------------------------------------------------------------


@query(
    "percent_rank_cume_dist",
    """
    SELECT o_orderkey, o_orderpriority,
           ROUND(percent_rank() OVER (PARTITION BY o_orderpriority
                                      ORDER BY o_totalprice, o_orderkey), 6) AS pr,
           ROUND(cume_dist() OVER (PARTITION BY o_orderpriority
                                   ORDER BY o_totalprice, o_orderkey), 6) AS cd
    FROM orders WHERE o_custkey < 200
    """,
)
def q_percent_rank_cume_dist(spark, sf_dir):
    """Relative-rank window functions: percent_rank ((rank-1)/(n-1)) and
    cume_dist (n_le/n) - both exact rationals on identical counts, so
    cross-engine doubles agree bit-for-bit."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 200)
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        F.round(F.percent_rank().over(w), 6).alias("pr"),
        F.round(F.cume_dist().over(w), 6).alias("cd"),
    )


@query(
    "full_outer_coalesce",
    """
    WITH c AS (SELECT c_nationkey AS k, COUNT(*) AS n_cust
               FROM customer WHERE c_acctbal > 9000 GROUP BY 1),
    s AS (SELECT s_nationkey AS k, COUNT(*) AS n_supp
          FROM supplier WHERE s_acctbal > 9000 GROUP BY 1)
    SELECT COALESCE(c.k, s.k) AS nationkey,
           COALESCE(n_cust, 0) AS n_cust,
           COALESCE(n_supp, 0) AS n_supp
    FROM c FULL OUTER JOIN s ON c.k = s.k
    """,
)
def q_full_outer_coalesce(spark, sf_dir):
    """FULL OUTER join with key coalescing and zero-fill - the merge
    shape for combining two pre-aggregated relations whose key sets
    only partially overlap (the acctbal filters guarantee both
    unmatched sides exist)."""
    c = (
        table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9000)
        .groupBy(F.col("c_nationkey").alias("k"))
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    s = (
        table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") > 9000)
        .groupBy(F.col("s_nationkey").alias("k"))
        .agg(F.count(F.lit(1)).alias("n_supp"))
    )
    return c.join(s, c.k == s.k, "full_outer").select(
        F.coalesce(c.k, s.k).alias("nationkey"),
        F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
        F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
    )


@query(
    "embedding_int8_quantize",
    """
    WITH sc AS (
      SELECT vec_id, embedding,
             list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS s
      FROM embeddings
    )
    SELECT vec_id, ROUND(s, 6) AS scale,
           CASE WHEN s = 0 THEN ''
                ELSE array_to_string(
                  list_transform(embedding,
                    x -> CAST(CAST(ROUND(CAST(x AS DOUBLE) / s * 127) AS INT) AS VARCHAR)),
                  ',') END AS q8
    FROM sc
    """,
)
def q_embedding_int8_quantize(spark, sf_dir):
    """Int8 embedding quantization (symmetric max-abs scaling): the
    storage/serving compression step of a training-data pipeline - 4x
    smaller vectors for the ANN index. Map-side only, no shuffle; the
    quantized codes are exact integers so the output hashes identically
    across engines (codes emitted as a ','-joined string - driver
    hasher can't take raw arrays)."""
    emb = fan_out(
        table(spark, sf_dir, "embeddings"),
        scan_width(spark, sf_dir, "embeddings"),
    )
    sc = emb.select(
        "vec_id",
        "embedding",
        F.array_max(
            F.transform("embedding", lambda x: F.abs(x.cast("double")))
        ).alias("s"),
    )
    q8 = F.when(F.col("s") == 0, F.lit("")).otherwise(
        F.array_join(
            F.transform(
                "embedding",
                lambda x: F.round(x.cast("double") / F.col("s") * 127)
                .cast("int")
                .cast("string"),
            ),
            ",",
        )
    )
    return sc.select("vec_id", F.round("s", 6).alias("scale"), q8.alias("q8"))
