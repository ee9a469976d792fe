"""Frozen linear quality classifier primitives (fastText-style apply
pass) and the domain-reputation stage built on them.

Lives in a registration-free module so BOTH driver_queries_quality
(the doc-level scores + the domain gate) and driver_queries_curation
(the corpus_mix_plan capstone) can share the single definitions
without import-order coupling to the @query registry, and
streaming/curation.py can build the stateless stream-serve twin from
the same fragments."""

from __future__ import annotations

from pyspark.sql import functions as F


_LQC_B = 1024  # hashed-feature buckets (model size, corpus-independent)
# Frozen "pretrained" per-bucket weights in integer micro-units: the
# Knuth multiplicative constant spreads bucket ids over [-1000, 1000].
# b < 1024 keeps b * 2654435761 < 2^42 - BIGINT-exact on both engines.
_LQC_W = "(b * 2654435761) % 2001 - 1000"

# Bucket-hash SQL fragment (Spark dialect), parameterized on the token
# expression name - ONE definition shared by the batch scorer and the
# streaming twin so a hash tweak cannot desynchronize them (same
# discipline as _LQC_W's verbatim-`b` convention).
_LQC_BUCKET = (
    "cast(conv(substr(md5({t}), 1, 6), 16, 10) as bigint) % " + str(_LQC_B)
)


def _lqc_tokens():
    """Classifier token-array Column (lowercased, NULL-safe, empties
    dropped) - the single Spark-side tokenizer definition for the
    batch scorer and the streaming twin."""
    return F.filter(
        F.split(F.lower(F.coalesce(F.col("text"), F.lit(""))), " "),
        lambda t: t != "",
    )


def _lqc_per_sql(docs: str = "documents", prefix: str = "") -> str:
    """DuckDB CTE chain ``{p}toks, {p}feat, {p}tf, {p}w, {p}per``:
    per-doc classifier evidence ``(doc_id, n_tok, ssum)`` over the
    relation ``docs``. ONE definition (with :func:`_lqc_per`) shared by
    the doc-level scores, the domain-reputation gate and the
    corpus_mix_plan capstone so a bucket/weight/tokenization tweak
    cannot desynchronize them; ``prefix`` namespaces the CTEs when the
    chain is embedded in a larger WITH (the capstone already binds
    ``per``)."""
    p = prefix
    return f"""{p}toks AS (
      SELECT doc_id,
             unnest(list_filter(string_split(lower(COALESCE(text, '')), ' '),
                    t -> t <> '')) AS term
      FROM {docs}
    ),
    {p}feat AS (
      SELECT doc_id,
             CAST(CAST('0x' || substr(md5(term), 1, 6) AS UBIGINT)
                  % {_LQC_B} AS BIGINT) AS b
      FROM {p}toks
    ),
    {p}tf AS (SELECT doc_id, b, CAST(COUNT(*) AS BIGINT) AS tf
           FROM {p}feat GROUP BY doc_id, b),
    {p}w AS (SELECT CAST(r.b AS BIGINT) AS b,
                 CAST({_LQC_W} AS BIGINT) AS w
          FROM range({_LQC_B}) r(b)),
    {p}per AS (
      SELECT {p}tf.doc_id,
             CAST(SUM({p}tf.tf) AS BIGINT) AS n_tok,
             CAST(SUM({p}tf.tf * {p}w.w) AS BIGINT) AS ssum
      FROM {p}tf JOIN {p}w USING (b) GROUP BY {p}tf.doc_id
    )"""


def _domain_rep_sql(docs: str, prefix: str = "") -> str:
    """DuckDB CTEs ``{p}d2, {p}bysrc, {p}rep, {p}med`` (on top of the
    ``{p}``-prefixed classifier chain): per-source token-weighted mean
    logit + the corpus-median threshold. The single definition of the
    domain-reputation STAGE, shared by ``domain_reputation_gate`` and
    the capstone."""
    p = prefix
    return f"""{_lqc_per_sql(docs, p)},
    {p}d2 AS (SELECT doc_id, COALESCE(source, '') AS source FROM {docs}),
    {p}bysrc AS (
      SELECT d.source,
             CAST(SUM(COALESCE(p.ssum, 0)) AS BIGINT) AS ssum,
             CAST(SUM(COALESCE(p.n_tok, 0)) AS BIGINT) AS n_tok
      FROM {p}d2 d LEFT JOIN {p}per p ON d.doc_id = p.doc_id
      GROUP BY d.source
    ),
    {p}rep AS (
      SELECT source, n_tok,
             ssum // GREATEST(n_tok, 1) AS src_logit_micro
      FROM {p}bysrc
    ),
    {p}med AS (SELECT quantile_disc(src_logit_micro, 0.5) AS m FROM {p}rep)"""


def _lqc_per(spark, docs):
    """Spark twin of :func:`_lqc_per_sql`: per-doc ``(doc_id, n_tok,
    ssum)``. Tokenize + bucket-hash map-side, ONE doc x bucket
    partial-agg shuffle, 1024-row weight relation broadcast."""
    toks = docs.select("doc_id", F.explode(_lqc_tokens()).alias("term"))
    feat = toks.select(
        "doc_id", F.expr(_LQC_BUCKET.format(t="term")).alias("b")
    )
    tf = feat.groupBy("doc_id", "b").agg(F.count(F.lit(1)).alias("tf"))
    # rename id -> b FIRST so _LQC_W applies verbatim on both engines
    # (string-surgery on the formula would silently corrupt any future
    # edit that introduces another 'b')
    w = (
        spark.range(_LQC_B)
        .select(F.col("id").alias("b"))
        .select("b", F.expr(_LQC_W).alias("w"))
    )
    return (
        tf.join(F.broadcast(w), "b")
        .groupBy("doc_id")
        .agg(
            F.sum("tf").alias("n_tok"),
            F.sum(F.col("tf") * F.col("w")).alias("ssum"),
        )
    )



def _domain_rep(spark, docs):
    """Spark twin of :func:`_domain_rep_sql`: returns ``(rep, med)`` -
    the per-source ``(source, n_tok, src_logit_micro)`` reputation
    relation and the one-row discrete-median threshold. ``docs`` must
    already carry a NULL-coalesced ``source`` (callers coalesce to ''
    so the stage is total over NULL sources)."""
    per = _lqc_per(spark, docs)
    zero = F.lit(0).cast("long")
    bysrc = (
        docs.select("doc_id", "source")
        .join(per, "doc_id", "left")
        .groupBy("source")
        .agg(
            F.sum(F.coalesce("ssum", zero)).alias("ssum"),
            F.sum(F.coalesce("n_tok", zero)).alias("n_tok"),
        )
    )
    rep = bysrc.select(
        "source",
        "n_tok",
        F.expr("ssum DIV GREATEST(n_tok, 1)").alias("src_logit_micro"),
    )
    med = rep.agg(
        F.expr(
            "percentile_disc(0.5) WITHIN GROUP (ORDER BY src_logit_micro)"
        ).alias("m")
    )
    return rep, med


