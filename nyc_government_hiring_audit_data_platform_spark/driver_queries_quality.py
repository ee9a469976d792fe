"""Training-data-pipeline suite, part 4: published curation methods.

The most widely cited corpus-curation methods in the LLM literature,
re-expressed as pure Column-expression chains:

- ``gopher_quality_flags`` - the word-statistics rules of Gopher
  (Rae et al. 2021, "Scaling Language Models", Appendix A): word count
  in range, mean word length in range, fraction of alphabetic words,
  symbol-to-word ratio. Map-only, all-integer.
- ``c4_quality_rules`` - the format rules of C4 (Raffel et al. 2020,
  "Exploring the Limits of Transfer Learning", section 2.2): terminal
  punctuation, minimum sentence count, no code braces, no lorem ipsum,
  minimum words per line. Map-only, all-integer.
- ``dsir_importance_weights`` - DSIR (Xie et al. 2023): hashed-unigram
  importance resampling against a target slice; the model is a FIXED
  4096-bucket relation at any corpus size.
- ``ccnet_perplexity_buckets`` - CCNet (Wenzek et al. 2020): per-
  language head/middle/tail slices at discrete perplexity tertiles.
- ``hybrid_rrf_retrieval`` - reciprocal rank fusion (Cormack et al.
  2009) of the BM25 and cosine lanes in exact integer micro-units.
- ``stupid_backoff_score`` - Stupid Backoff (Brants et al. 2007), the
  count-based LM designed for distributed backends: bigram score with
  0.4-weighted unigram backoff, trained on a half-corpus slice so the
  held-out half exercises the backoff path; per-position FLOOR
  micro-nats, exact integer aggregation.
- ``quality_classifier_scores`` - the fastText-style (Joulin et al.
  2017) PRETRAINED linear-classifier filter lane: a frozen 1024-bucket
  hashed-bag-of-words weight relation broadcast onto doc x bucket term
  frequencies, mean per-token logit in integer micro-units, keep =
  logit >= 0. The apply-side topology of model-based filtering, as
  distinct from DSIR's corpus-derived ratios.
- ``domain_reputation_gate`` - the RefinedWeb (Penedo et al. 2023)
  URL/source-level lane: classifier evidence pooled per source
  (token-weighted mean logit), median-thresholded over the tiny
  source relation, broadcast back as a per-document gate.

The rule filters extend the heuristic scoring already in
``quality_scores`` (length/punct/stopword blend) with the exact
published RULE shape: one keep/drop flag per rule plus the composite
decision, so a corpus run can attribute every drop to the rule that
caused it (the same attribution shape as ``curation_keep_decisions``).

Determinism conventions (see driver_queries module docstring): outputs
are integers (milli-unit integer division, micro-nat FLOOR of a single
division) or strings; no ROUND-ed float column crosses the hasher -
this module is where the ROUND-on-identical-doubles hazard was
discovered and the floor-integer convention set.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from nyc_government_hiring_audit_data_platform_spark.driver_queries import query, table

# ---------------------------------------------------------------------------
# Gopher word-statistics rules (public thresholds from the paper)
# ---------------------------------------------------------------------------

_G_MIN_WORDS = 50
_G_MAX_WORDS = 100_000
_G_MIN_MWL_MILLI = 3_000  # mean word length >= 3 chars
_G_MAX_MWL_MILLI = 10_000  # mean word length <= 10 chars
_G_MIN_ALPHA_MILLI = 800  # >= 80% of words contain an alphabetic char
_G_MAX_SYM_MILLI = 100  # symbol-to-word ratio <= 0.1 ('#' / '...' occurrences)


@query(
    "gopher_quality_flags",
    f"""
    WITH t AS (
      SELECT doc_id, COALESCE(text, '') AS txt,
             list_filter(string_split(COALESCE(text, ''), ' '), x -> x <> '')
               AS toks
      FROM documents
    ),
    s AS (
      SELECT doc_id,
             len(toks) AS nw,
             CAST(COALESCE(list_sum(list_transform(toks, x -> len(x))), 0)
                  AS BIGINT) AS tc,
             len(list_filter(toks, x -> regexp_matches(x, '[A-Za-z]'))) AS aw,
             (length(txt) - length(replace(txt, '#', '')))
               + (length(txt) - length(replace(txt, '...', ''))) // 3 AS sw
      FROM t
    )
    SELECT doc_id,
           CAST(nw AS INT) AS n_words,
           CAST(tc * 1000 // GREATEST(nw, 1) AS BIGINT) AS mwl_milli,
           CAST(aw * 1000 // GREATEST(nw, 1) AS BIGINT) AS alpha_milli,
           CAST(sw * 1000 // GREATEST(nw, 1) AS BIGINT) AS sym_milli,
           CAST(CASE WHEN nw BETWEEN {_G_MIN_WORDS} AND {_G_MAX_WORDS}
                     THEN 1 ELSE 0 END AS INT) AS flag_words,
           CAST(CASE WHEN tc * 1000 // GREATEST(nw, 1)
                          BETWEEN {_G_MIN_MWL_MILLI} AND {_G_MAX_MWL_MILLI}
                     THEN 1 ELSE 0 END AS INT) AS flag_mwl,
           CAST(CASE WHEN aw * 1000 // GREATEST(nw, 1) >= {_G_MIN_ALPHA_MILLI}
                     THEN 1 ELSE 0 END AS INT) AS flag_alpha,
           CAST(CASE WHEN sw * 1000 // GREATEST(nw, 1) <= {_G_MAX_SYM_MILLI}
                     THEN 1 ELSE 0 END AS INT) AS flag_sym,
           CAST(CASE WHEN nw BETWEEN {_G_MIN_WORDS} AND {_G_MAX_WORDS}
                      AND tc * 1000 // GREATEST(nw, 1)
                          BETWEEN {_G_MIN_MWL_MILLI} AND {_G_MAX_MWL_MILLI}
                      AND aw * 1000 // GREATEST(nw, 1) >= {_G_MIN_ALPHA_MILLI}
                      AND sw * 1000 // GREATEST(nw, 1) <= {_G_MAX_SYM_MILLI}
                     THEN 1 ELSE 0 END AS INT) AS keep
    FROM s
    """,
)
def q_gopher_quality_flags(spark, sf_dir):
    """Gopher rule filter (Rae et al. 2021 App. A): per-document word
    count, mean word length, alphabetic-word fraction, and the
    symbol-to-word RATIO - the published rule counts '#' and '...'
    OCCURRENCES over the word count (a word with many symbols counts
    each), computed here as replace-length arithmetic over the whole
    text (tokens are space-split, so whole-text occurrence counts equal
    the per-token sum). Each rule gets its own keep flag plus the
    composite decision.

    Ratios are milli-units via 64-bit integer division (`1000L ... DIV`)
    so every output column is an exact integer on both engines; the
    widening to long also makes the char-sum arithmetic overflow-safe
    for multi-megabyte documents. Map-only: one projection over the
    scan, no shuffle, no UDF - the 100 TB plan is the sf0.01 plan."""
    docs = table(spark, sf_dir, "documents")
    # COALESCE guard: Spark's legacy size(NULL) = -1 vs DuckDB's NULL
    toks = F.filter(
        F.split(F.coalesce(F.col("text"), F.lit("")), " "), lambda t: t != ""
    )
    stats = docs.select(
        "doc_id",
        F.size(toks).alias("nw"),
        F.aggregate(
            F.transform(toks, F.length), F.lit(0).cast("bigint"), lambda a, x: a + x
        ).alias("tc"),
        F.size(F.filter(toks, lambda t: t.rlike("[A-Za-z]"))).alias("aw"),
        F.expr(
            "length(coalesce(text, '')) "
            "- length(replace(coalesce(text, ''), '#', '')) "
            "+ (length(coalesce(text, '')) "
            "- length(replace(coalesce(text, ''), '...', ''))) DIV 3"
        ).alias("sw"),
    )
    flag_words = f"nw BETWEEN {_G_MIN_WORDS} AND {_G_MAX_WORDS}"
    flag_mwl = (
        f"tc * 1000L DIV GREATEST(nw, 1) "
        f"BETWEEN {_G_MIN_MWL_MILLI} AND {_G_MAX_MWL_MILLI}"
    )
    flag_alpha = f"aw * 1000L DIV GREATEST(nw, 1) >= {_G_MIN_ALPHA_MILLI}"
    flag_sym = f"sw * 1000L DIV GREATEST(nw, 1) <= {_G_MAX_SYM_MILLI}"
    return stats.select(
        "doc_id",
        F.col("nw").alias("n_words"),
        F.expr("tc * 1000L DIV GREATEST(nw, 1)").alias("mwl_milli"),
        F.expr("aw * 1000L DIV GREATEST(nw, 1)").alias("alpha_milli"),
        F.expr("sw * 1000L DIV GREATEST(nw, 1)").alias("sym_milli"),
        F.expr(f"CAST(CASE WHEN {flag_words} THEN 1 ELSE 0 END AS INT)").alias(
            "flag_words"
        ),
        F.expr(f"CAST(CASE WHEN {flag_mwl} THEN 1 ELSE 0 END AS INT)").alias(
            "flag_mwl"
        ),
        F.expr(f"CAST(CASE WHEN {flag_alpha} THEN 1 ELSE 0 END AS INT)").alias(
            "flag_alpha"
        ),
        F.expr(f"CAST(CASE WHEN {flag_sym} THEN 1 ELSE 0 END AS INT)").alias(
            "flag_sym"
        ),
        F.expr(
            f"CAST(CASE WHEN {flag_words} AND {flag_mwl} AND {flag_alpha} "
            f"AND {flag_sym} THEN 1 ELSE 0 END AS INT)"
        ).alias("keep"),
    )


# ---------------------------------------------------------------------------
# C4 format rules (public thresholds from the paper)
# ---------------------------------------------------------------------------

_C4_MIN_SENTENCES = 3
_C4_MIN_LINE_WORDS = 5
# Terminal punctuation set from the paper: period, exclamation,
# question mark, closing quote.
_C4_TERMINAL_RE = '[.!?"]\\s*$'
_C4_SENT_SPLIT_RE = "[.!?]+"


@query(
    "c4_quality_rules",
    f"""
    WITH t AS (
      SELECT doc_id, COALESCE(text, '') AS text,
             list_filter(string_split(COALESCE(text, ''), chr(10)),
                         l -> trim(l) <> '') AS lines,
             list_filter(string_split_regex(COALESCE(text, ''),
                                            '{_C4_SENT_SPLIT_RE}'),
                         s -> trim(s) <> '') AS sents
      FROM documents
    )
    SELECT doc_id,
           CAST(CASE WHEN regexp_matches(text, '{_C4_TERMINAL_RE}')
                     THEN 1 ELSE 0 END AS INT) AS has_terminal,
           CAST(len(sents) AS INT) AS n_sentences,
           CAST(CASE WHEN contains(text, '{{') THEN 1 ELSE 0 END AS INT)
             AS has_brace,
           CAST(CASE WHEN contains(lower(text), 'lorem ipsum')
                     THEN 1 ELSE 0 END AS INT) AS has_lorem,
           CAST(COALESCE(list_min(list_transform(lines,
                l -> len(list_filter(string_split(l, ' '), w -> w <> '')))), 0)
                AS INT) AS min_line_words,
           CAST(CASE WHEN regexp_matches(text, '{_C4_TERMINAL_RE}')
                      AND len(sents) >= {_C4_MIN_SENTENCES}
                      AND NOT contains(text, '{{')
                      AND NOT contains(lower(text), 'lorem ipsum')
                      AND COALESCE(list_min(list_transform(lines,
                          l -> len(list_filter(string_split(l, ' '),
                                               w -> w <> '')))), 0)
                          >= {_C4_MIN_LINE_WORDS}
                     THEN 1 ELSE 0 END AS INT) AS keep
    FROM t
    """,
)
def q_c4_quality_rules(spark, sf_dir):
    """C4 format filter (Raffel et al. 2020 section 2.2): terminal
    punctuation, >= 3 sentences, no '{' (code page signal), no 'lorem
    ipsum', and every non-blank line >= 5 words - one flag per rule
    plus the composite keep decision.

    Sentence and line tokenization are the SAME regex splits on both
    engines (the udtf_ngram_explode lesson: mirror the empty-token
    filter, or single-vs-double spacing diverges the engines). Map-only
    projection, no shuffle, no UDF."""
    docs = table(spark, sf_dir, "documents").withColumn(
        "text", F.coalesce(F.col("text"), F.lit(""))
    )
    lines = F.filter(F.split("text", "\n"), lambda line: F.trim(line) != "")
    sents = F.filter(
        F.split("text", _C4_SENT_SPLIT_RE), lambda s: F.trim(s) != ""
    )
    line_words = F.transform(
        lines, lambda line: F.size(F.filter(F.split(line, " "), lambda w: w != ""))
    )
    has_terminal = F.when(F.col("text").rlike(_C4_TERMINAL_RE), 1).otherwise(0)
    has_brace = F.when(F.col("text").contains("{"), 1).otherwise(0)
    has_lorem = F.when(F.lower("text").contains("lorem ipsum"), 1).otherwise(0)
    min_line_words = F.coalesce(F.array_min(line_words), F.lit(0))
    n_sentences = F.size(sents)
    return docs.select(
        "doc_id",
        has_terminal.cast("int").alias("has_terminal"),
        n_sentences.alias("n_sentences"),
        has_brace.cast("int").alias("has_brace"),
        has_lorem.cast("int").alias("has_lorem"),
        min_line_words.alias("min_line_words"),
        (
            (has_terminal == 1)
            & (n_sentences >= _C4_MIN_SENTENCES)
            & (has_brace == 0)
            & (has_lorem == 0)
            & (min_line_words >= _C4_MIN_LINE_WORDS)
        )
        .cast("int")
        .alias("keep"),
    )


# ---------------------------------------------------------------------------
# DSIR: data selection with importance resampling (Xie et al. 2023)
# ---------------------------------------------------------------------------

_DSIR_B = 4096  # hashed-feature buckets
_DSIR_SCALE = 1_000_000  # micro-nats: integerize per-bucket log-ratios
_DSIR_TARGET_LANG = "en"


@query(
    "dsir_importance_weights",
    f"""
    WITH toks AS (
      SELECT doc_id, lang,
             unnest(list_filter(string_split(lower(text), ' '), t -> t <> ''))
               AS term
      FROM documents
    ),
    feat AS (
      SELECT doc_id, lang,
             CAST(CAST('0x' || substr(md5(term), 1, 6) AS UBIGINT)
                  % {_DSIR_B} AS BIGINT) AS b
      FROM toks
    ),
    tf AS (SELECT doc_id, b, COUNT(*) AS tf FROM feat GROUP BY doc_id, b),
    tgt AS (SELECT b, COUNT(*) AS ct FROM feat
            WHERE lang = '{_DSIR_TARGET_LANG}' GROUP BY b),
    rawc AS (SELECT b, COUNT(*) AS cr FROM feat GROUP BY b),
    tot AS (SELECT (SELECT COALESCE(SUM(ct), 0) FROM tgt) AS tt,
                   (SELECT COALESCE(SUM(cr), 0) FROM rawc) AS tr),
    lr AS (
      SELECT r.b,
             CAST(ROUND(ln(
               ((COALESCE(t.ct, 0) + 1) * (tot.tr + {_DSIR_B})) * 1.0
               / ((r.cr + 1) * (tot.tt + {_DSIR_B}))
             ) * {_DSIR_SCALE}) AS BIGINT) AS s
      FROM rawc r LEFT JOIN tgt t USING (b) CROSS JOIN tot
    ),
    per AS (
      SELECT tf.doc_id, SUM(tf.tf) AS n_tok, SUM(tf.tf * lr.s) AS ssum
      FROM tf JOIN lr USING (b) GROUP BY tf.doc_id
    ),
    scored AS (
      SELECT doc_id, n_tok, ssum,
             ssum * 1.0 / n_tok AS avg_micro
      FROM per
    ),
    band AS (SELECT quantile_disc(avg_micro, 0.5) AS m FROM scored)
    SELECT d.doc_id,
           CAST(COALESCE(s.n_tok, 0) AS BIGINT) AS n_tok,
           CAST(FLOOR(s.avg_micro) AS BIGINT) AS avg_lr_micro,
           CAST(CASE WHEN s.avg_micro >= b.m THEN 1 ELSE 0 END AS INT) AS keep
    FROM documents d
    LEFT JOIN scored s ON d.doc_id = s.doc_id
    CROSS JOIN band b
    """,
)
def q_dsir_importance_weights(spark, sf_dir):
    """DSIR data selection (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): score every document
    by the mean hashed-unigram log importance ratio
    ln(p_target / p_raw) - here target = the 'en' language slice -
    and keep the top half (>= discrete-median weight), the
    deterministic stand-in for resampling proportional to the weight.

    Determinism: the Laplace-smoothed ratio is assembled as ONE
    integer-product fraction per bucket and passed through a single
    ``ln``, then integerized to micro-nats BEFORE the per-doc sum
    (the unigram_surprisal_quality technique), so cross-partition
    aggregation is exact integer arithmetic; the keep threshold is a
    DISCRETE median (an actual data value) and the reported score is
    FLOOR of the single-division micro-nat average - floor has no .5
    boundary, so identical doubles can never round apart (ROUND(x, 4)
    did exactly that here: Spark rounds the double's exact decimal,
    DuckDB rounds via float multiply, and one sf0.1 row straddled the
    boundary).

    Plan at 100 TB: the hashed-feature relation is persisted once and
    feeds three grouped counts (doc x bucket, target-bucket,
    raw-bucket); the model is a FIXED 4096-row relation however big
    the corpus is (that is the point of hashed features) and
    broadcasts back onto doc x bucket term frequencies; one
    doc-grouped rollup and a 1-row median broadcast finish. Nothing
    scales with corpus size except the linear scans and the doc-keyed
    shuffles."""
    from pyspark import StorageLevel

    B, S = _DSIR_B, _DSIR_SCALE
    docs = table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        "lang",
        F.explode(
            F.filter(F.split(F.lower("text"), " "), lambda t: t != "")
        ).alias("term"),
    )
    feat = toks.select(
        "doc_id",
        "lang",
        F.expr(
            f"cast(conv(substr(md5(term), 1, 6), 16, 10) as bigint) % {B}"
        ).alias("b"),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    tf = feat.groupBy("doc_id", "b").agg(F.count(F.lit(1)).alias("tf"))
    tgt = (
        feat.filter(F.col("lang") == _DSIR_TARGET_LANG)
        .groupBy("b")
        .agg(F.count(F.lit(1)).alias("ct"))
    )
    rawc = feat.groupBy("b").agg(F.count(F.lit(1)).alias("cr"))
    tot = rawc.agg(F.sum("cr").alias("tr")).crossJoin(
        tgt.agg(F.coalesce(F.sum("ct"), F.lit(0)).alias("tt"))
    )
    lr = (
        rawc.join(tgt, "b", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "b",
            F.round(
                F.log(
                    ((F.coalesce(F.col("ct"), F.lit(0)) + 1) * (F.col("tr") + B))
                    * 1.0
                    / ((F.col("cr") + 1) * (F.col("tt") + B))
                )
                * S
            )
            .cast("long")
            .alias("s"),
        )
    )
    per = (
        tf.join(lr, "b")
        .groupBy("doc_id")
        .agg(
            F.sum("tf").alias("n_tok"),
            F.sum(F.col("tf") * F.col("s")).alias("ssum"),
        )
    )
    scored = per.select(
        "doc_id",
        "n_tok",
        (F.col("ssum") * 1.0 / F.col("n_tok")).alias("avg_micro"),
    )
    band = scored.agg(
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY avg_micro)").alias("m")
    )
    return (
        docs.select("doc_id")
        .join(scored, "doc_id", "left")
        .crossJoin(F.broadcast(band))
        .select(
            "doc_id",
            F.coalesce(F.col("n_tok"), F.lit(0)).alias("n_tok"),
            F.floor("avg_micro").cast("long").alias("avg_lr_micro"),
            F.when(F.col("avg_micro") >= F.col("m"), 1).otherwise(0)
            .cast("int")
            .alias("keep"),
        )
    )


# ---------------------------------------------------------------------------
# CCNet-style perplexity bucketing (Wenzek et al. 2020)
# ---------------------------------------------------------------------------

_CC_SCALE = 1_000_000  # micro-nats


@query(
    "ccnet_perplexity_buckets",
    f"""
    WITH toks AS (
      SELECT doc_id,
             unnest(list_filter(string_split(lower(text), ' '), t -> t <> ''))
               AS term
      FROM documents
    ),
    tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term),
    cnt AS (SELECT term, SUM(tf) AS c FROM tf GROUP BY term),
    tot AS (SELECT SUM(c) AS total FROM cnt),
    surp AS (
      SELECT term,
             CAST(ROUND(ln(total * 1.0 / c) * {_CC_SCALE}) AS BIGINT) AS s
      FROM cnt CROSS JOIN tot
    ),
    per AS (
      SELECT tf.doc_id, SUM(tf.tf) AS n_tok, SUM(tf.tf * surp.s) AS ssum
      FROM tf JOIN surp USING (term) GROUP BY tf.doc_id
    ),
    scored AS (
      SELECT d.doc_id, d.lang, p.ssum * 1.0 / p.n_tok AS avg_micro
      FROM documents d JOIN per p ON d.doc_id = p.doc_id
    ),
    edges AS (
      SELECT lang,
             quantile_disc(avg_micro, 0.333) AS e33,
             quantile_disc(avg_micro, 0.667) AS e67
      FROM scored GROUP BY lang
    )
    SELECT s.doc_id, s.lang,
           CAST(FLOOR(s.avg_micro) AS BIGINT) AS surprisal_micro,
           CASE WHEN s.avg_micro <= e.e33 THEN 'head'
                WHEN s.avg_micro <= e.e67 THEN 'middle'
                ELSE 'tail' END AS bucket
    FROM scored s JOIN edges e ON s.lang = e.lang
    """,
)
def q_ccnet_perplexity_buckets(spark, sf_dir):
    """CCNet-style quality bucketing (Wenzek et al. 2020, "CCNet:
    Extracting High Quality Monolingual Datasets from Web Crawl
    Data"): score each document with a language model (here the
    corpus-unigram surprisal stand-in, same integerized micro-nat
    technique as unigram_surprisal_quality) and split each language's
    documents into head / middle / tail at the per-language surprisal
    tertiles - CCNet's released corpora ship exactly these three
    slices per language.

    Determinism: per-term surprisal integerized BEFORE summation;
    per-doc score is ONE division (bit-identical across engines);
    tertile edges are DISCRETE per-language quantiles (actual data
    values); the reported score is FLOOR (no .5 boundary - see the
    module conventions). Plan at 100 TB: word-count shuffle, the
    vocabulary-sized model broadcast back, a doc rollup, and a
    languages x 2 edge relation broadcast - the bucket assignment
    itself is map-side."""
    docs = table(spark, sf_dir, "documents")
    S = _CC_SCALE
    toks = docs.select(
        "doc_id",
        F.explode(
            F.filter(F.split(F.lower("text"), " "), lambda t: t != "")
        ).alias("term"),
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    cnt = tf.groupBy("term").agg(F.sum("tf").alias("c"))
    tot = cnt.agg(F.sum("c").alias("total"))
    surp = cnt.crossJoin(F.broadcast(tot)).select(
        "term",
        F.round(F.log(F.col("total") * 1.0 / F.col("c")) * S)
        .cast("long")
        .alias("s"),
    )
    per = (
        tf.join(surp, "term")
        .groupBy("doc_id")
        .agg(
            F.sum("tf").alias("n_tok"),
            F.sum(F.col("tf") * F.col("s")).alias("ssum"),
        )
    )
    scored = (
        docs.select("doc_id", "lang")
        .join(per, "doc_id")
        .select(
            "doc_id", "lang", (F.col("ssum") * 1.0 / F.col("n_tok")).alias("avg_micro")
        )
    )
    edges = scored.groupBy("lang").agg(
        F.expr("percentile_disc(0.333) WITHIN GROUP (ORDER BY avg_micro)").alias(
            "e33"
        ),
        F.expr("percentile_disc(0.667) WITHIN GROUP (ORDER BY avg_micro)").alias(
            "e67"
        ),
    )
    return scored.join(F.broadcast(edges), "lang").select(
        "doc_id",
        "lang",
        F.floor("avg_micro").cast("long").alias("surprisal_micro"),
        F.when(F.col("avg_micro") <= F.col("e33"), "head")
        .when(F.col("avg_micro") <= F.col("e67"), "middle")
        .otherwise("tail")
        .alias("bucket"),
    )


# ---------------------------------------------------------------------------
# Hybrid retrieval: reciprocal rank fusion (Cormack et al. 2009)
# ---------------------------------------------------------------------------

_RRF_K = 60  # the standard RRF damping constant
_RRF_SCALE = 1_000_000
_RRF_TOPK = 10


def _rrf_oracle() -> str:
    from nyc_government_hiring_audit_data_platform_spark.driver_queries import ORACLE

    lex = ORACLE["bm25_retrieval"]
    from nyc_government_hiring_audit_data_platform_spark.operators.ann import (
        cosine_topk_sql,
    )

    vec = cosine_topk_sql("embeddings", "vec_id", "embedding", "vec_id = 0", _RRF_TOPK)
    return f"""
    WITH lex AS (
      SELECT doc_id,
             CAST(ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id) AS INT)
               AS rank_lex
      FROM ({lex})
    ),
    vec AS (
      SELECT neighbor_id AS doc_id, CAST(rank AS INT) AS rank_vec
      FROM ({vec})
    ),
    fused AS (
      SELECT COALESCE(l.doc_id, v.doc_id) AS doc_id,
             l.rank_lex, v.rank_vec,
             CAST(COALESCE({_RRF_SCALE} // ({_RRF_K} + l.rank_lex), 0)
                + COALESCE({_RRF_SCALE} // ({_RRF_K} + v.rank_vec), 0)
                AS BIGINT) AS rrf_micro
      FROM lex l FULL OUTER JOIN vec v ON l.doc_id = v.doc_id
    )
    SELECT doc_id, rank_lex, rank_vec, rrf_micro
    FROM fused ORDER BY rrf_micro DESC, doc_id LIMIT {_RRF_TOPK}
    """


@query("hybrid_rrf_retrieval", _rrf_oracle())
def q_hybrid_rrf_retrieval(spark, sf_dir):
    """Hybrid search: fuse the lexical lane (Okapi BM25 top-10 for the
    fixed query terms - the hash-verified bm25_retrieval plan) with the
    vector lane (exact cosine top-10 around the vec_id-0 query
    embedding) by reciprocal rank fusion (Cormack et al. 2009):
    score(d) = sum over lanes of 1/(60 + rank_lane(d)), here in exact
    integer micro-units (1e6 DIV (60+rank) - pure integer arithmetic,
    nothing for the hasher to disagree on). Fusing top-k LISTS (not
    full rankings) is the standard production shape: each lane's
    contribution below its own top-k is bounded by 1/(60+k).

    Plan at 100 TB: each lane keeps its already-audited shape (inverted
    index + TakeOrderedAndProject; broadcast query vector over the
    corpus - swap in the IVF lane for true scale); the fusion itself
    joins two <= k-row relations - negligible at any corpus size."""
    from nyc_government_hiring_audit_data_platform_spark.driver_queries_sequence import (
        q_bm25_retrieval,
    )
    from nyc_government_hiring_audit_data_platform_spark.operators.ann import (
        cosine_topk,
    )

    # lane rank WITHOUT a window: the lane is <= k rows by construction,
    # so collect it into one sorted struct array ((-bm25, doc_id) asc ==
    # (bm25 desc, doc_id asc)) and posexplode - one tiny global agg, no
    # unpartitioned WindowExec pass
    lex = (
        q_bm25_retrieval(spark, sf_dir)
        .agg(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        (-F.col("bm25")).alias("negs"),
                        F.col("doc_id").alias("doc_id"),
                    )
                )
            ).alias("arr")
        )
        .select(F.posexplode("arr").alias("pos", "e"))
        .select(
            F.col("e.doc_id").alias("doc_id"),
            (F.col("pos") + 1).cast("int").alias("rank_lex"),
        )
    )
    from nyc_government_hiring_audit_data_platform_spark.driver_queries_datapipe import (
        _emb_par,
    )

    emb = table(spark, sf_dir, "embeddings")
    # corpus fan-out at the input edge (operator moves no vectors)
    vec = cosine_topk(
        emb.filter(F.col("vec_id") == 0), _emb_par(spark, sf_dir),
        "vec_id", "embedding", "vec_id", "embedding", _RRF_TOPK,
    ).select(
        F.col("neighbor_id").alias("doc_id"),
        F.col("rank").cast("int").alias("rank_vec"),
    )
    fused = (
        lex.join(vec, "doc_id", "full_outer")
        .select(
            "doc_id",
            "rank_lex",
            "rank_vec",
            (
                F.coalesce(
                    F.expr(f"{_RRF_SCALE} DIV ({_RRF_K} + rank_lex)"), F.lit(0)
                )
                + F.coalesce(
                    F.expr(f"{_RRF_SCALE} DIV ({_RRF_K} + rank_vec)"), F.lit(0)
                )
            )
            .cast("bigint")
            .alias("rrf_micro"),
        )
    )
    return fused.orderBy(F.desc("rrf_micro"), F.asc("doc_id")).limit(_RRF_TOPK)


# ---------------------------------------------------------------------------
# Stupid Backoff LM scoring (Brants et al. 2007)
# ---------------------------------------------------------------------------

_SB_SCALE = 1_000_000  # micro-nats
_SB_ALPHA = "0.4"      # the paper's backoff constant, as shared literal text


@query(
    "stupid_backoff_score",
    f"""
    WITH src AS (
      SELECT doc_id,
             list_filter(string_split(lower(text), ' '), t -> t <> '') AS tk
      FROM documents
    ),
    lm_src AS (SELECT tk FROM src WHERE doc_id % 2 = 0),
    uni AS (
      SELECT w, COUNT(*) AS c FROM (SELECT unnest(tk) AS w FROM lm_src)
      GROUP BY w
    ),
    big AS (
      SELECT w1, w2, COUNT(*) AS c12 FROM (
        SELECT p.w1 AS w1, p.w2 AS w2 FROM (
          SELECT unnest(list_transform(range(1, len(tk)),
                 i -> struct_pack(w1 := tk[i], w2 := tk[i+1]))) AS p
          FROM lm_src)
      ) GROUP BY 1, 2
    ),
    tot AS (SELECT CAST(SUM(c) AS BIGINT) AS t FROM uni),
    pos AS (
      SELECT doc_id, p.w1 AS w1, p.w2 AS w2 FROM (
        SELECT doc_id,
               unnest(list_transform(range(1, len(tk)),
               i -> struct_pack(w1 := tk[i], w2 := tk[i+1]))) AS p
        FROM src)
    ),
    scored AS (
      SELECT pos.doc_id,
             CASE WHEN b.c12 IS NOT NULL THEN
               CAST(FLOOR(ln(CAST(b.c12 AS DOUBLE) / u1.c)
                          * {_SB_SCALE}) AS BIGINT)
             ELSE
               CAST(FLOOR(ln(CAST({_SB_ALPHA} AS DOUBLE)
                             * GREATEST(COALESCE(u2.c, 0), 1)
                             / tot.t) * {_SB_SCALE}) AS BIGINT)
             END AS lp_micro,
             CASE WHEN b.c12 IS NULL THEN 1 ELSE 0 END AS backoff
      FROM pos
      LEFT JOIN big b ON pos.w1 = b.w1 AND pos.w2 = b.w2
      LEFT JOIN uni u1 ON pos.w1 = u1.w
      LEFT JOIN uni u2 ON pos.w2 = u2.w
      CROSS JOIN tot
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           CAST(SUM(backoff) AS BIGINT) AS n_backoff,
           CAST(SUM(lp_micro) AS BIGINT) // COUNT(*) AS avg_logp_micro
    FROM scored GROUP BY doc_id
    """,
)
def q_stupid_backoff_score(spark, sf_dir):
    """Stupid Backoff LM scoring (Brants et al. 2007, "Large Language
    Models in Machine Translation" - the count-based LM built FOR
    distributed backends): train bigram/unigram tables on the even-id
    half of the corpus, score EVERY document's bigrams with
    S(w2|w1) = c(w1 w2)/c(w1), backing off to alpha * c(w2)/T (alpha =
    0.4 per the paper; unseen words floor at count 1) - held-out
    odd-id docs genuinely exercise the backoff path (n_backoff > 0).

    Determinism: each position's log-prob is FLOOR-integerized to
    micro-nats BEFORE any aggregation (the module's floor-integer
    convention), making the per-doc SUM exact BIGINT arithmetic in any
    partition order. Both branches are explicitly CAST to pure-double
    arithmetic on BOTH engines - without the casts, bare literals like
    0.4 parse as DECIMAL in Spark, whose scale-rounded decimal division
    differs from DuckDB's single IEEE double division by an ulp, enough
    to flip FLOOR at a micro-nat boundary. With identical-double ln
    arguments the cross-engine match is empirical (libm ln is not
    correctly rounded), verified by the parity suite at both SFs.

    Plan at 100 TB: LM tables are word/bigram-count shuffles with
    map-side combine (vocabulary-bounded); scoring is three equi-joins
    keyed by the position's words plus a broadcast scalar total - the
    published system's distributed-serving shape, where the LM shards
    by key and each scoring batch probes it."""
    docs = table(spark, sf_dir, "documents")
    tk = F.filter(F.split(F.lower("text"), " "), lambda t: t != "")
    src = docs.select("doc_id", tk.alias("tk"))
    lm_src = src.filter(F.col("doc_id") % 2 == 0)
    pairs_expr = F.expr(
        "CASE WHEN size(tk) >= 2 THEN transform(sequence(1, size(tk) - 1), "
        "i -> struct(tk[i - 1] AS w1, tk[i] AS w2)) "
        "ELSE CAST(array() AS ARRAY<STRUCT<w1: STRING, w2: STRING>>) END"
    )
    uni = (
        lm_src.select(F.explode("tk").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    big = (
        lm_src.select(F.explode(pairs_expr).alias("p"))
        .select("p.w1", "p.w2")
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c12"))
    )
    tot = uni.agg(F.sum("c").alias("t"))
    pos = src.select("doc_id", F.explode(pairs_expr).alias("p")).select(
        "doc_id", "p.w1", "p.w2"
    )
    u1 = uni.select(F.col("w").alias("w1"), F.col("c").alias("c1"))
    u2 = uni.select(F.col("w").alias("w2"), F.col("c").alias("c2"))
    scored = (
        pos.join(big, ["w1", "w2"], "left")
        .join(u1, "w1", "left")
        .join(u2, "w2", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "doc_id",
            F.expr(
                f"CASE WHEN c12 IS NOT NULL THEN "
                f"CAST(FLOOR(ln(CAST(c12 AS DOUBLE) / c1) * {_SB_SCALE}) "
                f"AS BIGINT) "
                f"ELSE CAST(FLOOR(ln(CAST({_SB_ALPHA} AS DOUBLE) * "
                f"GREATEST(COALESCE(c2, 0), 1) / t) * {_SB_SCALE}) AS BIGINT) "
                f"END"
            ).alias("lp_micro"),
            F.when(F.col("c12").isNull(), 1).otherwise(0).alias("backoff"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.sum("backoff").alias("n_backoff"),
        F.expr("SUM(lp_micro) DIV COUNT(*)").alias("avg_logp_micro"),
    )


# ---------------------------------------------------------------------------
# Frozen linear quality classifier (fastText-style apply pass)
# ---------------------------------------------------------------------------

from nyc_government_hiring_audit_data_platform_spark.functions.classifier import (  # noqa: E402,F401 - shared single definitions (capstone + streaming twin import from functions.classifier too)
    _LQC_B,
    _LQC_BUCKET,
    _LQC_W,
    _domain_rep,
    _domain_rep_sql,
    _lqc_per,
    _lqc_per_sql,
    _lqc_tokens,
)


@query(
    "quality_classifier_scores",
    f"""
    WITH {_lqc_per_sql().strip()}
    SELECT d.doc_id,
           COALESCE(p.n_tok, 0) AS n_tok,
           COALESCE(p.ssum, 0) // GREATEST(COALESCE(p.n_tok, 0), 1)
             AS logit_micro,
           CAST(CASE WHEN COALESCE(p.ssum, 0)
                          // GREATEST(COALESCE(p.n_tok, 0), 1) >= 0
                          AND COALESCE(p.n_tok, 0) >= 1
                     THEN 1 ELSE 0 END AS INT) AS keep
    FROM documents d LEFT JOIN per p ON d.doc_id = p.doc_id
    """,
)
def q_quality_classifier_scores(spark, sf_dir):
    """Frozen LINEAR quality classifier, apply pass - the fastText-
    style (Joulin et al. 2017) model-based filter lane of CCNet/LLaMA/
    FineWeb-Edu curation stacks, as distinct from the corpus-derived
    statistics the suite already has: DSIR learns its log-ratios FROM
    the corpus being scored; a production classifier filter applies a
    PRETRAINED model unchanged. The model here is a fixed
    1024-bucket hashed-bag-of-words weight relation (weights frozen by
    a multiplicative-hash formula standing in for trained parameters -
    the topology, sizes and dtypes are exactly those of a real
    exported linear model), scored as mean per-token weight in integer
    micro-units; keep = logit >= 0.

    Plan at 100 TB: tokenize -> bucket-hash map-side; one doc x bucket
    partial-aggregated shuffle (the only corpus-sized exchange);
    the model is a BROADCAST 1024-row relation however big the corpus
    is (the point of hashed features); per-doc rollup is doc-keyed.
    Swapping in real trained weights = replacing the range()-derived
    relation with a read of the exported model table - the plan is
    unchanged, which is why the frozen stand-in exercises the real
    deployment shape.

    Determinism: bucket = md5-prefix mod B (the dsir convention), all
    weights/aggregates BIGINT, the mean is one integer division whose
    truncation-toward-zero agrees on both engines for negative
    numerators (verified; the stupid_backoff avg uses the same).
    Empty/whitespace-only/NULL docs report n_tok = 0 / logit 0 via
    COALESCE on the outer join and are DROPPED (keep requires
    n_tok >= 1) - a zero logit is "no evidence", and a quality filter
    must not wave through exactly the junk it exists to catch."""
    docs = table(spark, sf_dir, "documents")
    per = _lqc_per(spark, docs)
    logit = "COALESCE(ssum, 0) DIV GREATEST(COALESCE(n_tok, 0), 1)"
    return (
        docs.select("doc_id")
        .join(per, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_tok", F.lit(0).cast("long")).alias("n_tok"),
            F.expr(logit).alias("logit_micro"),
            F.expr(
                f"CAST(CASE WHEN {logit} >= 0 "
                f"AND COALESCE(n_tok, 0) >= 1 THEN 1 ELSE 0 END AS INT)"
            ).alias("keep"),
        )
    )


# ---------------------------------------------------------------------------
# Domain-level reputation gate (URL/source-level filtering lane)
# ---------------------------------------------------------------------------


@query(
    "domain_reputation_gate",
    f"""
    WITH {_domain_rep_sql("documents").strip()}
    SELECT d.doc_id, d.source, r.src_logit_micro,
           CAST(CASE WHEN r.src_logit_micro >= med.m AND r.n_tok >= 1
                     THEN 1 ELSE 0 END AS INT) AS keep
    FROM d2 d
    JOIN rep r ON d.source = r.source
    CROSS JOIN med
    """,
)
def q_domain_reputation_gate(spark, sf_dir):
    """DOMAIN-level reputation filtering - the URL/source-level lane of
    RefinedWeb (Penedo et al. 2023) and FineWeb curation: instead of
    judging each document alone, pool the classifier's evidence per
    SOURCE (token-weighted mean logit = SUM(ssum)/SUM(n_tok), one
    integer division so low-evidence docs can't swamp the mean), keep
    sources at or above the corpus median reputation, and gate every
    document by its source's verdict. Catches the case doc-level
    filtering misses: a borderline page from a consistently-junk
    domain (and vice versa) - the two gates compose, they don't
    substitute.

    Plan at 100 TB: per-doc evidence reuses the classifier chain (ONE
    doc x bucket shuffle, broadcast model - `_lqc_per`, the single
    shared definition); the source rollup is a source-keyed agg over
    doc-level rows; the median is over the SOURCE relation (domains,
    not docs - tiny) and broadcasts back as one row; the final gate is
    a broadcast-able source-keyed join onto the scan. No stage is
    quadratic and nothing but the two keyed aggs touches corpus-sized
    data.

    Determinism: all-BIGINT sums (CAST both engines; DuckDB bare SUM
    widens to HUGEINT), integer truncating division, and a DISCRETE
    median (an actual value of the integer source-logit relation, the
    dsir convention) compared in integer space. Sources whose docs are
    all unsketchable (n_tok = 0) carry logit 0 into the median and are
    themselves dropped (keep requires n_tok >= 1). NULL source
    coalesces to '' BEFORE grouping/joining, so the gate is TOTAL: a
    NULL-source doc gets an explicit verdict under the '' reputation
    group instead of vanishing from the accounting (NULL never equals
    NULL in the join) while still shifting the median."""
    docs = table(spark, sf_dir, "documents").select(
        "doc_id", F.coalesce("source", F.lit("")).alias("source"), "text"
    )
    rep, med = _domain_rep(spark, docs)
    return (
        docs.select("doc_id", "source")
        .join(rep, "source")
        .crossJoin(F.broadcast(med))
        .select(
            "doc_id",
            "source",
            "src_logit_micro",
            F.expr(
                "CAST(CASE WHEN src_logit_micro >= m AND n_tok >= 1 "
                "THEN 1 ELSE 0 END AS INT)"
            ).alias("keep"),
        )
    )
