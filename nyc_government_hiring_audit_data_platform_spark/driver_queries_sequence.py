"""Sequence / session analytics and tokenizer-training queries.

Round-4 continuation suite: the ordered-event operators a behavioral or
time-series user would expect (forward-fill imputation, gap-and-island
runs, ordered path signatures, time-weighted averages, deterministic
per-key mode) plus two training-data ops (a BPE merge-candidate scan -
the inner loop of tokenizer training - and iterative BFS reachability
over a derived graph), and broadcast-assigned equal-frequency binning.

Scale posture (the 100 TB question, per query):

- the window queries partition by ``user_id`` (high-cardinality key, no
  global window anywhere), so state per task is one user's events;
- ``bpe_pair_counts`` is explode -> groupBy(pair): one shuffle keyed by
  a tiny alphabet-squared domain with map-side partial aggregation;
- ``bfs_distance`` is the pregel gather: per iteration ONE equi-join
  frontier-to-edges plus ONE groupBy(node) min - never materializes
  paths (the oracle's recursive CTE does, which is exactly why the
  oracle is the oracle and the iterative plan is the engine);
- ``quantile_bucketize`` never sorts globally: a 9-value discrete-
  quantile aggregate is broadcast back over the fact table, the
  MLlib-Bucketizer shape (agg + broadcast map-side assignment), NOT an
  ntile over a single-partition window.

Determinism conventions follow the driver_queries module docstring:
copied values over computed floats, integer-cents sums before a single
division, discrete percentiles, identical alias names, UTC timestamps
formatted to strings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nyc_government_hiring_audit_data_platform_spark.driver_queries import (
    fan_out,
    query,
    scan_width,
    table,
)
from nyc_government_hiring_audit_data_platform_spark.functions.dates import (
    epoch_seconds_sql,
)
from nyc_government_hiring_audit_data_platform_spark.operators import sequence as SEQ

# RAW whitespace tokens with empties dropped - deliberately NOT
# textstats.tokens (which normalizes/lowercases): the chunker and the
# BPE scan must preserve original casing. One definition per engine so
# the two call sites cannot drift.
# COALESCE guards NULL text: Spark's legacy size(NULL) is -1 (ANSI off)
# while DuckDB's len(NULL) is NULL, so a NULL document diverges every
# downstream count unless both engines see '' (caught by the NULL-text
# parity probe in tests/test_quality_rules.py).
_RAW_TOKS = "filter(split(coalesce(text, ''), ' '), t -> t <> '')"
_RAW_TOKS_SQL = "list_filter(string_split(coalesce(text, ''), ' '), t -> t <> '')"


# ---------------------------------------------------------------------------
# forward-fill: last-observation-carried-forward imputation
# ---------------------------------------------------------------------------


@query(
    "forward_fill",
    """
    SELECT event_id, user_id,
           strftime(ts, '%Y-%m-%dT%H:%M:%S') AS ts_s,
           LAST_VALUE(CASE WHEN event_type <> 'error' THEN value END IGNORE NULLS)
             OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_value
    FROM events
    """,
)
def q_forward_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-observation-carried-forward: treat ``error`` events as sensor
    dropouts (NULL readings) and fill each from the user's most recent
    good reading. ``F.last(ignorenulls=True)`` over a rows-unbounded-
    preceding frame is the canonical Spark LOCF; the filled value is a
    COPY of an input double (never arithmetic), so cross-engine parity
    is exact. Partitioned by user_id - per-task state is one user's
    history, embarrassingly parallel at any scale."""
    ev = table(spark, sf_dir, "events")
    filled = SEQ.forward_fill(
        ev,
        keys=["user_id"],
        order=["ts", "event_id"],
        value="value",
        good=F.col("event_type") != "error",
    )
    return filled.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss").alias("ts_s"),
        "filled_value",
    )


# ---------------------------------------------------------------------------
# gaps-and-islands: contiguous active-hour runs per user
# ---------------------------------------------------------------------------


@query(
    "activity_islands",
    f"""
    WITH hrs AS (
      SELECT DISTINCT user_id, {epoch_seconds_sql()} // 3600 AS h
      FROM events
    ),
    g AS (
      SELECT user_id, h,
             h - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY h) AS grp
      FROM hrs
    )
    SELECT user_id,
           strftime(make_timestamp(MIN(h) * 3600 * 1000000),
                    '%Y-%m-%d %H:%M') AS island_start,
           CAST(COUNT(*) AS BIGINT) AS n_hours
    FROM g GROUP BY user_id, grp
    """,
)
def q_activity_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands via the classic value-minus-row_number trick:
    distinct active hours per user, then ``h - row_number()`` is
    constant exactly across a consecutive run. One distinct + one
    user-partitioned window + one groupBy - integer arithmetic
    throughout, so the island keys hash identically across engines."""
    ev = table(spark, sf_dir, "events")
    hrs = ev.select(
        "user_id", F.expr("unix_seconds(ts) div 3600").alias("h")
    ).distinct()
    g = hrs.withColumn(
        "grp",
        F.col("h") - F.row_number().over(Window.partitionBy("user_id").orderBy("h")),
    )
    return (
        g.groupBy("user_id", "grp")
        .agg(
            F.date_format(
                F.timestamp_seconds(F.min("h") * 3600), "yyyy-MM-dd HH:mm"
            ).alias("island_start"),
            F.count(F.lit(1)).alias("n_hours"),
        )
        .select("user_id", "island_start", "n_hours")
    )


# ---------------------------------------------------------------------------
# deterministic per-key mode
# ---------------------------------------------------------------------------


@query(
    "mode_per_group",
    """
    WITH c AS (
      SELECT user_id, event_type, COUNT(*) AS cnt
      FROM events GROUP BY user_id, event_type
    ),
    r AS (
      SELECT user_id, event_type, cnt,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY cnt DESC, event_type) AS rn
      FROM c
    )
    SELECT user_id, event_type AS modal_event, cnt AS modal_cnt
    FROM r WHERE rn = 1
    """,
)
def q_mode_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user modal event type with a TOTAL tie order (count desc,
    then lexicographic) - engines' built-in ``mode()`` aggregates break
    ties arbitrarily, so the portable form is count + row_number over
    the tiny aggregated table. The window runs over at most
    |event_type| rows per user, never the raw events."""
    ev = table(spark, sf_dir, "events")
    c = ev.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy("user_id").orderBy(F.desc("cnt"), F.asc("event_type"))
    return (
        c.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .select(
            "user_id",
            F.col("event_type").alias("modal_event"),
            F.col("cnt").alias("modal_cnt"),
        )
    )


# ---------------------------------------------------------------------------
# ordered path signature (behavioral funnel fingerprint)
# ---------------------------------------------------------------------------


@query(
    "path_signature",
    """
    WITH r AS (
      SELECT user_id, event_type,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM events
    )
    SELECT user_id,
           string_agg(event_type, '>' ORDER BY rn) AS path,
           CAST(COUNT(*) AS BIGINT) AS path_len
    FROM r WHERE rn <= 15 GROUP BY user_id
    """,
)
def q_path_signature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each user's first-15-events path as an ORDERED '>'-joined string
    (the clickstream fingerprint that feeds funnel clustering).
    ``collect_list`` has no ordering contract, so order is made
    explicit: collect (rn, event_type) structs, array_sort (structs
    sort by leading field), project, join. The window limit prunes to
    15 rows per user before any aggregation state builds up."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    r = ev.select(
        "user_id", "event_type", F.row_number().over(w).alias("rn")
    ).filter("rn <= 15")
    return r.groupBy("user_id").agg(
        F.expr(
            "array_join(transform(array_sort(collect_list(struct(rn, event_type))),"
            " x -> x.event_type), '>')"
        ).alias("path"),
        F.count(F.lit(1)).alias("path_len"),
    )


# ---------------------------------------------------------------------------
# time-weighted average (TWAP)
# ---------------------------------------------------------------------------


@query(
    "time_weighted_avg",
    f"""
    WITH s AS (
      SELECT user_id, ts, event_id,
             CAST(ROUND(value * 100) AS BIGINT) AS cents,
             {epoch_seconds_sql()} AS sec
      FROM events
    ),
    g AS (
      SELECT user_id, cents,
             LEAD(sec) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               - sec AS gap
      FROM s
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_intervals,
           CAST(SUM(gap) AS BIGINT) AS total_sec,
           ROUND(SUM(cents * gap) / (SUM(gap) * 100.0), 4) AS twap
    FROM g WHERE gap IS NOT NULL AND gap > 0
    GROUP BY user_id
    """,
)
def q_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average value per user: each reading is weighted by
    the seconds it was 'current' (until the next event; the open-ended
    last reading is excluded). The weighted sum is exact BIGINT
    arithmetic - integer cents x integer seconds - so the one float
    division at the end is bit-identical across engines (the corpus's
    integerize-then-divide convention). One user-partitioned lead + one
    groupBy."""
    ev = table(spark, sf_dir, "events")
    s = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.expr("CAST(ROUND(value * 100) AS BIGINT)").alias("cents"),
        F.expr("unix_seconds(ts)").alias("sec"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    g = s.withColumn("gap", F.lead("sec").over(w) - F.col("sec")).filter(
        "gap IS NOT NULL AND gap > 0"
    )
    return g.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_intervals"),
        F.sum("gap").alias("total_sec"),
        F.round(
            F.sum(F.col("cents") * F.col("gap")) / (F.sum("gap") * F.lit(100.0)), 4
        ).alias("twap"),
    )


# ---------------------------------------------------------------------------
# BPE merge-candidate scan (tokenizer training inner loop)
# ---------------------------------------------------------------------------


@query(
    "bpe_pair_counts",
    f"""
    WITH toks AS (
      SELECT unnest({_RAW_TOKS_SQL}) AS tok
      FROM documents
    ),
    pairs AS (
      SELECT unnest(list_transform(range(1, length(tok)),
                                   i -> substring(tok, i, 2))) AS pair
      FROM toks
    )
    SELECT pair, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM pairs GROUP BY pair
    ORDER BY cnt DESC, pair LIMIT 40
    """,
)
def q_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One BPE merge-candidate scan: count adjacent symbol pairs inside
    every corpus token and rank merge candidates - the inner loop of
    byte-pair-encoding tokenizer training at corpus scale. Pure
    explode -> groupBy(pair): the pair domain is alphabet-squared
    (tiny), so map-side partial aggregation collapses the shuffle to
    almost nothing regardless of corpus size. LIMIT is deterministic:
    (cnt DESC, pair) is a total order because pair is the group key."""
    docs = table(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(F.expr(_RAW_TOKS)).alias("tok")
    )
    pairs = toks.select(
        F.explode(
            F.expr(
                "CASE WHEN length(tok) >= 2 THEN "
                "transform(sequence(1, length(tok) - 1), i -> substring(tok, i, 2)) "
                "ELSE CAST(array() AS ARRAY<STRING>) END"
            )
        ).alias("pair")
    )
    return (
        pairs.groupBy("pair")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("pair"))
        .limit(40)
    )


# ---------------------------------------------------------------------------
# BPE merge application (the other half of the tokenizer-training loop)
# ---------------------------------------------------------------------------

# Each symbol is wrapped OPEN||sym||CLOSE (chr(30)/chr(31), ASCII record
# and unit separators - by contract absent from corpus tokens; a
# production run over arbitrary bytes would pre-escape them). Wrapping
# with DISTINCT boundary markers means adjacent pair matches share no
# characters, so built-in left-to-right non-overlapping ``replace``
# reproduces greedy BPE exactly: 'aaaa' -> [aa, aa], 'aaa' -> [aa, a].
# (A single shared separator gets this wrong - the first replacement
# consumes the boundary the next match needs: 'aaaa' -> [aa, a, a] -
# caught by test_bpe_apply_merge_greedy_chain.)

_BPE_PAIRS_SQL = f"""
    WITH toks AS (
      SELECT unnest({_RAW_TOKS_SQL}) AS tok
      FROM documents
    ),
    pairs AS (
      SELECT unnest(list_transform(range(1, length(tok)),
                                   i -> substring(tok, i, 2))) AS pair
      FROM toks
    ),
    top AS (
      SELECT pair FROM pairs GROUP BY pair
      ORDER BY COUNT(*) DESC, pair LIMIT 1
    )
"""

# merged token string: wrap every char, then one replace of the wrapped
# winning pair. Each merge shrinks the wrapped string by exactly 2
# marker chars (6-char pattern -> 4-char replacement), so
# n_merges = (3*len(t) - len(merged)) / 2, integer by construction.
# (?s) = DOTALL in both Java regex (Spark) and RE2 (DuckDB): without it
# '.' skips \n/\r, leaving newline chars inside tokens unwrapped and
# inflating the per-merge length arithmetic by 1 per such char (both
# engines replicated the flaw identically, so only a true-count test -
# test_bpe_apply_merge_newline_chars - can catch it, not parity).
_BPE_MERGED_SQL = (
    "replace(regexp_replace(t, '(?s)(.)', chr(30) || '\\1' || chr(31), 'g'), "
    "chr(30) || substring(p.pair, 1, 1) || chr(31) || "
    "chr(30) || substring(p.pair, 2, 1) || chr(31), "
    "chr(30) || p.pair || chr(31))"
)


@query(
    "bpe_apply_merge",
    _BPE_PAIRS_SQL
    + f"""
    SELECT d.doc_id, p.pair,
           CAST(COALESCE(list_sum(list_transform(d.toks,
                t -> length(t))), 0) AS BIGINT) AS n_sym_before,
           CAST(COALESCE(list_sum(list_transform(d.toks, t ->
                length(t) - (3 * length(t) - length({_BPE_MERGED_SQL})) // 2
                )), 0) AS BIGINT) AS n_sym_after
    FROM (SELECT doc_id, {_RAW_TOKS_SQL} AS toks FROM documents) d
    CROSS JOIN top p
    """,
)
def q_bpe_apply_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The second half of the BPE training iteration: take the winning
    pair from the merge-candidate scan (bpe_pair_counts' (cnt DESC,
    pair) total order, LIMIT 1) and APPLY it - rewrite every token's
    symbol sequence merging adjacent (a, b) -> ab left-to-right
    non-overlapping, the greedy order real BPE training uses ('aaaa'
    -> [aa, aa], 'aaa' -> [aa, a]; pinned by unit test).

    The rewrite runs identically on both engines: wrap every char as
    OPEN||c||CLOSE (distinct markers, so adjacent matches share no
    characters), one built-in ``replace`` of the wrapped pair, and the
    new symbol count falls out of pure length arithmetic - each merge
    removes exactly two marker chars. All-integer outputs; the winning
    pair is ONE broadcast row.

    Plan at 100 TB: the candidate scan is the alphabet-squared
    map-side-combined shuffle bpe_pair_counts already proved; the
    apply pass is map-only over the corpus with the winner broadcast -
    iterating train steps re-runs this stage pair, never anything
    super-linear."""
    docs = table(spark, sf_dir, "documents")
    toks = docs.select(F.explode(F.expr(_RAW_TOKS)).alias("tok"))
    pairs = toks.select(
        F.explode(
            F.expr(
                "CASE WHEN length(tok) >= 2 THEN "
                "transform(sequence(1, length(tok) - 1), i -> substring(tok, i, 2)) "
                "ELSE CAST(array() AS ARRAY<STRING>) END"
            )
        ).alias("pair")
    )
    top = (
        pairs.groupBy("pair")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("pair"))
        .limit(1)
        .select("pair")
    )
    merged = (
        "replace(regexp_replace(t, '(?s)(.)', concat(chr(30), '$1', chr(31))), "
        "concat(chr(30), substring(pair, 1, 1), chr(31), "
        "chr(30), substring(pair, 2, 1), chr(31)), "
        "concat(chr(30), pair, chr(31)))"
    )
    return (
        docs.select("doc_id", F.expr(_RAW_TOKS).alias("toks"))
        .crossJoin(F.broadcast(top))
        .select(
            "doc_id",
            "pair",
            F.expr(
                "aggregate(transform(toks, t -> cast(length(t) as bigint)), 0L, "
                "(acc, x) -> acc + x)"
            ).alias("n_sym_before"),
            F.expr(
                f"aggregate(transform(toks, t -> cast(length(t) - "
                f"(3 * length(t) - length({merged})) div 2 as bigint)), 0L, "
                f"(acc, x) -> acc + x)"
            ).alias("n_sym_after"),
        )
    )


# ---------------------------------------------------------------------------
# full BPE training loop (N unrolled rounds, driver-visible)
# ---------------------------------------------------------------------------

_BPE_TRAIN_N = 3


def _bpe_train_oracle(n_rounds: int) -> str:
    """Unrolled n-round BPE training in DuckDB SQL: per-round pair
    count -> winner (cnt DESC, a, b - the trainer's exact tie-break,
    only if cnt >= 2) -> wrapped-string replace, state carried between
    rounds; emits the ordered merge table."""
    parts = [
        f"""WITH s0 AS MATERIALIZED (
      SELECT regexp_replace(tok, '(?s)(.)', chr(30) || '\\1' || chr(31), 'g')
        AS w
      FROM (SELECT unnest({_RAW_TOKS_SQL}) AS tok FROM documents)
    )"""
    ]
    for r in range(1, n_rounds + 1):
        parts.append(f"""p{r} AS (
      SELECT pr.a AS a, pr.b AS b, COUNT(*) AS cnt
      FROM (
        SELECT unnest(list_transform(range(1, len(l)),
               i -> struct_pack(a := l[i], b := l[i + 1]))) AS pr
        FROM (SELECT string_split(substring(w, 2, length(w) - 2),
                     chr(31) || chr(30)) AS l FROM s{r - 1})
      ) GROUP BY 1, 2 HAVING COUNT(*) >= 2
    ),
    w{r} AS (SELECT a, b FROM p{r} ORDER BY cnt DESC, a, b LIMIT 1),
    s{r} AS MATERIALIZED (
      SELECT CASE WHEN w.a IS NULL THEN s.w
             ELSE replace(s.w,
                          chr(30) || w.a || chr(31) || chr(30) || w.b || chr(31),
                          chr(30) || w.a || w.b || chr(31)) END AS w
      FROM s{r - 1} s LEFT JOIN w{r} w ON TRUE
    )""")
        # the last round's post-merge state is never read; harmless
    union = "\n      UNION ALL ".join(
        f"SELECT {r} AS merge_rank, a, b FROM w{r}" for r in range(1, n_rounds + 1)
    )
    return ",\n    ".join(parts) + f"\n    SELECT * FROM ({union})"


@query("bpe_train_merges", _bpe_train_oracle(_BPE_TRAIN_N))
def q_bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FULL iterative BPE training loop (operators/bpe.py:train_bpe),
    driver-visible: N={n} merge rounds over the corpus's whitespace
    tokens, emitting the ordered merge table (merge_rank, a, b). Each
    round is one alphabet-squared pair-count shuffle (map-side
    combined), a ONE-ROW winner collect (the sanctioned scalar-
    convergence pattern), and a map-only wrapped-string rewrite with
    the winner inlined - the per-round cost is independent of N_rounds
    except for the linear corpus passes, exactly the published BPE
    training loop's shape. The oracle unrolls the same three rounds in
    DuckDB CTEs (same greedy left-to-right replace via distinct
    boundary markers, same (cnt DESC, a, b) tie-break). The 3-row
    output relation itself is built driver-side from the collected
    winners - the loop's heavy lifting all ran distributed.
    Previously pytest-only (tests/test_bpe_trainer.py)."""
    from nyc_government_hiring_audit_data_platform_spark.operators.bpe import (
        train_bpe,
    )

    # Input-edge fan-out (r13, gated r14): the single-row-group local
    # fixture makes the scan ONE task, and the training loop's
    # persisted symbol state inherits that layout - every per-round
    # tokenize/rewrite/pair-explode pass then runs serial (profiled:
    # every map stage `(0+1)/1`). A production corpus scan is already
    # thousands of splits, so fan_out's width gate skips the spread
    # there. Merge counts/winners are partitioning-independent (total
    # order (cnt DESC, a, b)), so results are unchanged.
    docs = fan_out(
        table(spark, sf_dir, "documents"),
        scan_width(spark, sf_dir, "documents"),
    )
    merges, syms = train_bpe(docs, "text", _BPE_TRAIN_N, materialize_final=False)
    del syms  # lazy, never executed (r13: one corpus pass saved)
    return spark.createDataFrame(
        [(i + 1, a, b) for i, (a, b) in enumerate(merges)],
        "merge_rank int, a string, b string",
    )


def _bpe_encode_oracle(n_rounds: int) -> str:
    """Doc-keyed twin of _bpe_train_oracle: carries doc_id and the
    original symbol count through the merge rounds, then aggregates the
    per-doc compression the trained tokenizer achieves."""
    parts = [
        f"""WITH s0 AS MATERIALIZED (
      SELECT doc_id, length(tok) AS n0,
             regexp_replace(tok, '(?s)(.)', chr(30) || '\\1' || chr(31), 'g')
               AS w
      FROM (SELECT doc_id, unnest({_RAW_TOKS_SQL}) AS tok FROM documents)
    )"""
    ]
    for r in range(1, n_rounds + 1):
        parts.append(f"""p{r} AS (
      SELECT pr.a AS a, pr.b AS b, COUNT(*) AS cnt
      FROM (
        SELECT unnest(list_transform(range(1, len(l)),
               i -> struct_pack(a := l[i], b := l[i + 1]))) AS pr
        FROM (SELECT string_split(substring(w, 2, length(w) - 2),
                     chr(31) || chr(30)) AS l FROM s{r - 1})
      ) GROUP BY 1, 2 HAVING COUNT(*) >= 2
    ),
    w{r} AS (SELECT a, b FROM p{r} ORDER BY cnt DESC, a, b LIMIT 1),
    s{r} AS MATERIALIZED (
      SELECT doc_id, n0,
             CASE WHEN w.a IS NULL THEN s.w
             ELSE replace(s.w,
                          chr(30) || w.a || chr(31) || chr(30) || w.b || chr(31),
                          chr(30) || w.a || w.b || chr(31)) END AS w
      FROM s{r - 1} s LEFT JOIN w{r} w ON TRUE
    )""")
    last = f"s{n_rounds}"
    return ",\n    ".join(parts) + f"""
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(n0) AS BIGINT) AS n_sym_before,
           CAST(SUM(length(w) - length(replace(w, chr(31), ''))) AS BIGINT)
             AS n_sym_after,
           CAST(SUM(length(w) - length(replace(w, chr(31), ''))) * 1000
                // SUM(n0) AS BIGINT) AS compression_milli
    FROM {last} GROUP BY doc_id
    """


@query("bpe_encode_corpus", _bpe_encode_oracle(_BPE_TRAIN_N))
def q_bpe_encode_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DEPLOY half of tokenizer training: train the N={n}-merge BPE
    vocabulary (operators/bpe.py:train_bpe - the loop bpe_train_merges
    hash-verifies), then ENCODE the whole corpus with it in one
    map-only pass - the trained merges are collected driver-side (N
    tiny rows, the sanctioned scalar pattern) and inlined as N nested
    ``replace`` calls over the wrapped symbol string, so corpus
    encoding is stateless per row: no shuffle beyond the final per-doc
    aggregation, exactly how a trained tokenizer is applied at 100 TB
    (broadcast vocab, map-side encode). Output is the per-doc
    compression the vocabulary achieves (symbols before/after, exact
    integer milli-ratio). The oracle re-derives the SAME merges inside
    DuckDB (doc-keyed unrolled rounds) - so the check covers training
    AND application end to end."""
    from nyc_government_hiring_audit_data_platform_spark.operators.bpe import (
        train_bpe,
    )

    # Gated input-edge fan-out + lazy final state (r13/r14): see
    # q_bpe_train_merges - same serial-scan-partition profile, same
    # partitioning-independent results.
    docs = fan_out(
        table(spark, sf_dir, "documents"),
        scan_width(spark, sf_dir, "documents"),
    )
    merges, syms = train_bpe(docs, "text", _BPE_TRAIN_N, materialize_final=False)
    del syms  # lazy, never executed (r13: one corpus pass saved)

    def _q(s: str) -> str:  # Spark SQL literal escape (backslash first)
        return s.replace("\\", "\\\\").replace("'", "''")

    w = "regexp_replace(tok, '(?s)(.)', concat(chr(30), '$1', chr(31)))"
    for a, b in merges:
        qa, qb = _q(a), _q(b)
        w = (
            f"replace({w}, concat(chr(30), '{qa}', chr(31), "
            f"chr(30), '{qb}', chr(31)), "
            f"concat(chr(30), '{qa}', '{qb}', chr(31)))"
        )
    tok = docs.select(
        "doc_id", F.explode(F.expr(_RAW_TOKS)).alias("tok")
    ).select(
        "doc_id",
        F.length("tok").alias("n0"),
        F.expr(f"length({w}) - length(replace({w}, chr(31), ''))").alias("ns"),
    )
    return tok.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum("n0").alias("n_sym_before"),
        F.sum("ns").alias("n_sym_after"),
        F.expr("CAST(SUM(ns) * 1000 DIV SUM(n0) AS BIGINT)").alias(
            "compression_milli"
        ),
    )


# ---------------------------------------------------------------------------
# BFS reachability (iterative frontier expansion)
# ---------------------------------------------------------------------------

_BFS_MOD = 499
_BFS_HOPS = 3


@query(
    "bfs_distance",
    f"""
    WITH RECURSIVE e AS (
      SELECT DISTINCT l_orderkey % {_BFS_MOD} AS x, l_partkey % {_BFS_MOD} AS y
      FROM lineitem
      WHERE l_quantity = 1 AND l_orderkey % {_BFS_MOD} <> l_partkey % {_BFS_MOD}
    ),
    und AS (SELECT x, y FROM e UNION SELECT y, x FROM e),
    walk(node, d) AS (
      SELECT CAST(0 AS BIGINT), 0
      UNION ALL
      SELECT u.y, w.d + 1 FROM walk w JOIN und u ON u.x = w.node
      WHERE w.d < {_BFS_HOPS}
    )
    SELECT node, CAST(MIN(d) AS INT) AS dist FROM walk GROUP BY node
    """,
)
def q_bfs_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Min-hop BFS distance from node 0 within 3 hops, over the sparse
    undirected graph of (l_orderkey mod 499, l_partkey mod 499) pairs
    restricted to quantity-1 lineitems (avg degree ~5, so distances
    actually vary). The engine side is the pregel iteration: per hop,
    ONE frontier-to-edges equi-join plus ONE groupBy(node) MIN - the
    distance table never exceeds |V| rows and no path set is ever
    materialized. The DuckDB oracle's recursive CTE DOES enumerate
    paths, which is fine for an oracle and exactly what you cannot do
    at 100 TB; see also connected_components (operators/graph.py) for
    the converging variant with a driver-side scalar stop test."""
    li = table(spark, sf_dir, "lineitem")
    m = _BFS_MOD
    base = (
        li.filter(F.col("l_quantity") == 1)
        .select(
            (F.col("l_orderkey") % m).alias("x"), (F.col("l_partkey") % m).alias("y")
        )
        .filter("x <> y")
    )
    und = base.union(base.select(F.col("y").alias("x"), F.col("x").alias("y"))).distinct()
    dist = spark.range(1).select(
        F.lit(0).cast("bigint").alias("node"), F.lit(0).cast("int").alias("dist")
    )
    for k in range(1, _BFS_HOPS + 1):
        # Re-alias per iteration: `dist` already contains `und`'s lineage
        # after hop 1, so unaliased column refs turn ambiguous.
        d, u = dist.alias(f"d{k}"), und.alias(f"u{k}")
        nxt = d.join(u, F.col(f"d{k}.node") == F.col(f"u{k}.x")).select(
            F.col(f"u{k}.y").alias("node"), F.lit(k).cast("int").alias("dist")
        )
        dist = dist.unionByName(nxt).groupBy("node").agg(F.min("dist").alias("dist"))
    return dist


# ---------------------------------------------------------------------------
# running distinct count (online cardinality per key)
# ---------------------------------------------------------------------------


@query(
    "running_distinct_count",
    """
    WITH f AS (
      SELECT event_id, user_id, event_type, ts,
             ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts, event_id) AS occ
      FROM events
    )
    SELECT event_id, user_id,
           CAST(SUM(CASE WHEN occ = 1 THEN 1 ELSE 0 END)
                  OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS n_distinct_types
    FROM f
    """,
)
def q_running_distinct_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Online cardinality: after each event, how many DISTINCT event
    types has this user produced so far? Exact running COUNT(DISTINCT)
    is not a window aggregate in either engine; the portable exact form
    marks each (user, type)'s FIRST occurrence with one window and
    cumulatively sums the marks with a second - two key-partitioned
    window passes, state bounded by the user's history. (The sketch
    twin for unbounded domains is hll_union_bound.)"""
    ev = table(spark, sf_dir, "events")
    w_first = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    f = ev.select(
        "event_id",
        "user_id",
        "ts",
        F.row_number().over(w_first).alias("occ"),
    )
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return f.select(
        "event_id",
        "user_id",
        F.sum(F.when(F.col("occ") == 1, 1).otherwise(0))
        .over(w_run)
        .cast("bigint")
        .alias("n_distinct_types"),
    )


# ---------------------------------------------------------------------------
# per-key robust outlier flags (median/MAD anomaly screen)
# ---------------------------------------------------------------------------

_OUT_K = 3  # flag |v - median| > K * MAD


@query(
    "user_outlier_flags",
    f"""
    WITH v AS (
      SELECT event_id, user_id,
             CAST(ROUND(value * 100) AS BIGINT) AS cents
      FROM events
    ),
    med AS (
      SELECT user_id, quantile_disc(cents, 0.5) AS med_cents
      FROM v GROUP BY user_id
    ),
    dev AS (
      SELECT v.event_id, v.user_id, v.cents,
             ABS(v.cents - m.med_cents) AS dev_cents
      FROM v JOIN med m ON v.user_id = m.user_id
    ),
    mad AS (
      SELECT user_id, quantile_disc(dev_cents, 0.5) AS mad_cents
      FROM dev GROUP BY user_id
    )
    SELECT d.event_id, d.user_id,
           CAST(d.dev_cents AS BIGINT) AS dev_cents,
           d.dev_cents > {_OUT_K} * a.mad_cents AS is_outlier
    FROM dev d JOIN mad a ON d.user_id = a.user_id
    """,
)
def q_user_outlier_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user robust anomaly screen: flag readings more than 3 MADs
    (median absolute deviations) from the user's own median - the
    outlier test that survives skew and contamination where mean/stddev
    z-scores break. Two groupBy-aggregate passes over INTEGER cents
    (discrete medians are actual data values - exact in both engines)
    with join-backs keyed by user_id; median/MAD state is per-user and
    the joins are plain equi-joins, so the screen runs at any corpus
    size. Global twin: robust_stats_mad."""
    ev = table(spark, sf_dir, "events")
    v = ev.select(
        "event_id",
        "user_id",
        F.expr("CAST(ROUND(value * 100) AS BIGINT)").alias("cents"),
    )
    med = v.groupBy("user_id").agg(
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY cents)").alias(
            "med_cents"
        )
    )
    dev = v.join(med, "user_id").select(
        "event_id",
        "user_id",
        F.abs(F.col("cents") - F.col("med_cents")).alias("dev_cents"),
    )
    mad = dev.groupBy("user_id").agg(
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY dev_cents)").alias(
            "mad_cents"
        )
    )
    return dev.join(mad, "user_id").select(
        "event_id",
        "user_id",
        F.col("dev_cents").cast("bigint").alias("dev_cents"),
        (F.col("dev_cents") > _OUT_K * F.col("mad_cents")).alias("is_outlier"),
    )


# ---------------------------------------------------------------------------
# overlapping-window document chunking (RAG / long-context splitting)
# ---------------------------------------------------------------------------

_CHUNK = 32  # tokens per chunk
_STRIDE = 24  # window stride (8-token overlap)


@query(
    "chunk_overlap_split",
    f"""
    WITH src AS (
      SELECT doc_id, {_RAW_TOKS_SQL} AS toks
      FROM documents
    ),
    ch AS (
      SELECT doc_id,
             unnest(list_transform(
               range(1, len(toks) + 1, {_STRIDE}),
               s -> struct_pack(
                 start := s,
                 chunk := array_to_string(toks[s:s + {_CHUNK} - 1], ' '),
                 n_tok := len(toks[s:s + {_CHUNK} - 1])))) AS c
      FROM src WHERE len(toks) > 0
    )
    SELECT doc_id,
           CAST(c.start AS BIGINT) AS start_tok,
           CAST(c.n_tok AS INT) AS n_tok,
           c.chunk AS chunk_text
    FROM ch
    """,
)
def q_chunk_overlap_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window document chunking - the RAG / long-context
    splitter: 32-token windows every 24 tokens (8-token overlap so no
    boundary sentence is ever lost), tail windows kept short rather
    than dropped. Pure map-side transform+explode: the chunk set for a
    doc is computed where the doc lives, zero shuffles at any corpus
    size. Chunk identity is the start-token offset (stable under
    re-chunking; pairs with chunk_dedup, which dedups CONTENT)."""
    docs = table(spark, sf_dir, "documents")
    src = docs.select(
        "doc_id", F.expr(_RAW_TOKS).alias("toks")
    )
    return SEQ.chunk_overlap(src, "toks", size=_CHUNK, stride=_STRIDE).select(
        "doc_id", "start_tok", "n_tok", "chunk_text"
    )


# ---------------------------------------------------------------------------
# tf-idf full-text retrieval (search top-k)
# ---------------------------------------------------------------------------

_RETRIEVAL_TERMS = ("hash", "join", "vector", "stream")
_IDF_SCALE = 1_000_000  # integer micro-nat idf (surprisal-suite convention)
_TERMS_IN = ", ".join(f"'{t}'" for t in _RETRIEVAL_TERMS)


@query(
    "tfidf_retrieval",
    f"""
    WITH toks AS (
      SELECT doc_id,
             unnest(list_filter(string_split(lower(text), ' '), t -> t <> ''))
               AS term
      FROM documents
    ),
    tf AS (
      SELECT doc_id, term, COUNT(*) AS tf FROM toks
      WHERE term IN ({_TERMS_IN}) GROUP BY doc_id, term
    ),
    df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    idf AS (
      SELECT term,
             CAST(ROUND(ln(n_docs * 1.0 / df) * {_IDF_SCALE}) AS BIGINT)
               AS idf_micro
      FROM df CROSS JOIN n
    ),
    scored AS (
      SELECT tf.doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_match_terms,
             SUM(tf.tf * idf.idf_micro) AS score_micro
      FROM tf JOIN idf USING (term) GROUP BY tf.doc_id
    )
    SELECT doc_id, n_match_terms,
           ROUND(score_micro / {_IDF_SCALE}.0, 4) AS score
    FROM scored
    ORDER BY score_micro DESC, doc_id LIMIT 10
    """,
)
def q_tfidf_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-text retrieval: score every document against a fixed query
    ("hash join vector stream") by tf-idf and return the top 10 - the
    search capability a corpus platform serves. The plan is the
    inverted-index shape: tokenize -> filter to the QUERY terms first
    (so document frequency, scoring, and the final heap all run over
    the tiny matched subset, not the corpus vocabulary) -> broadcast
    the per-term idf -> one groupBy(doc) -> TakeOrderedAndProject.
    idf is integer micro-nats (the surprisal-suite convention: ln
    rounded at 1e-6, then all downstream arithmetic is exact BIGINT),
    and the ORDER BY ties break on integer score then doc_id, so the
    LIMIT is deterministic across engines. BM25 is the same plan with
    a per-doc length normalizer in the tf term."""
    docs = table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.expr(_RAW_TOKS.replace("text", "lower(text)"))).alias("term")
    )
    tf = (
        toks.filter(F.col("term").isin(*_RETRIEVAL_TERMS))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    idf = dfreq.crossJoin(F.broadcast(n)).select(
        "term",
        F.expr(
            f"CAST(ROUND(ln(n_docs * 1.0 / df) * {_IDF_SCALE}) AS BIGINT)"
        ).alias("idf_micro"),
    )
    scored = (
        tf.join(F.broadcast(idf), "term")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_match_terms"),
            F.sum(F.col("tf") * F.col("idf_micro")).alias("score_micro"),
        )
    )
    return (
        scored.orderBy(F.desc("score_micro"), F.asc("doc_id"))
        .limit(10)
        .select(
            "doc_id",
            "n_match_terms",
            F.round(F.col("score_micro") / float(_IDF_SCALE), 4).alias("score"),
        )
    )


# ---------------------------------------------------------------------------
# PCA power-iteration step (spectral structure of the embedding matrix)
# ---------------------------------------------------------------------------

_PCA_SCALE = 1000  # milli-unit integer quantization of embedding values
_PCA_DIM = 64  # operators/ann.py EMBED_DIM


@query(
    "pca_power_iteration",
    f"""
    WITH e AS (
      SELECT vec_id, i - 1 AS dim,
             CAST(ROUND((embedding::DOUBLE[])[i] * {_PCA_SCALE}) AS BIGINT) AS q
      FROM embeddings CROSS JOIN range(1, {_PCA_DIM + 1}) t(i)
    ),
    s AS (SELECT vec_id, SUM(q) AS s FROM e GROUP BY vec_id)
    SELECT e.dim, CAST(SUM(e.q * s.s) AS BIGINT) AS w
    FROM e JOIN s USING (vec_id) GROUP BY e.dim
    """,
)
def q_pca_power_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One power-iteration step toward the embedding matrix's top
    principal direction: w = X^T (X v) with the all-ones seed v - the
    distributed building block of PCA / spectral methods, computed
    WITHOUT ever materializing the Gram matrix (X^T X is dim x dim but
    costs a full outer-product pass; the two matrix-vector products are
    each one explode + one keyed groupBy). Embeddings are quantized to
    integer milli-units first so every product and sum is exact BIGINT
    arithmetic - the cross-partition float-summation-order problem that
    plagues naive distributed PCA simply never arises. Normalization
    (and the next iterate) happens on the 64-row result, driver-side or
    broadcast - scalar work at any corpus size."""
    emb = table(spark, sf_dir, "embeddings")
    e = emb.select(
        "vec_id", F.posexplode("embedding").alias("dim", "val")
    ).select(
        "vec_id",
        "dim",
        # widen float32 -> double BEFORE the multiply: the oracle's
        # embedding::DOUBLE[] does the same, and a float32 product can
        # land exactly on .5 (0.3195f * 1000 = 319.5f) where the double
        # product is 319.4999... - a one-unit rounding flip per engine
        F.expr(f"CAST(ROUND(CAST(val AS DOUBLE) * {_PCA_SCALE}) AS BIGINT)").alias(
            "q"
        ),
    )
    s = e.groupBy("vec_id").agg(F.sum("q").alias("s"))
    return (
        e.join(s, "vec_id")
        .groupBy("dim")
        .agg(F.sum(F.col("q") * F.col("s")).cast("bigint").alias("w"))
    )


# ---------------------------------------------------------------------------
# BM25 retrieval (length-normalized search scoring)
# ---------------------------------------------------------------------------

# Okapi BM25 with k1 = 1.2, b = 0.75. The per-(doc, term) score is ONE
# arithmetic expression over exact inputs (integer tf/dl, micro-nat
# integer idf, the single-division avgdl double), written as the SAME
# literal text on both engines so the IEEE op sequence is identical;
# the per-doc total is a FIXED-ORDER sum of the four per-term values
# (one SUM(CASE) per query term over at most one row each - never an
# order-dependent float aggregation).
_BM25_EXPR = (
    "(idf_micro / {scale}.0) * tf * 2.2"
    " / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))"
).format(scale=_IDF_SCALE)


def _bm25_term_sql(t: str) -> str:
    return f"SUM(CASE WHEN term = '{t}' THEN {_BM25_EXPR} END)"


@query(
    "bm25_retrieval",
    f"""
    WITH toks AS (
      SELECT doc_id,
             unnest(list_filter(string_split(lower(text), ' '), t -> t <> ''))
               AS term
      FROM documents
    ),
    dl AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY doc_id),
    stats AS (SELECT SUM(dl) * 1.0 / COUNT(*) AS avgdl,
                     CAST(COUNT(*) AS BIGINT) AS n_docs FROM dl),
    tf AS (
      SELECT doc_id, term, COUNT(*) AS tf FROM toks
      WHERE term IN ({_TERMS_IN}) GROUP BY doc_id, term
    ),
    df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
    idf AS (
      SELECT term,
             CAST(ROUND(ln((s.n_docs - df + 0.5) / (df + 0.5) + 1.0)
                        * {_IDF_SCALE}) AS BIGINT) AS idf_micro
      FROM df CROSS JOIN stats s
    ),
    j AS (
      SELECT tf.doc_id, tf.term, tf.tf, idf.idf_micro, dl.dl, s.avgdl
      FROM tf JOIN idf USING (term) JOIN dl USING (doc_id)
      CROSS JOIN stats s
    ),
    scored AS (
      SELECT doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_match_terms,
             COALESCE({_bm25_term_sql(_RETRIEVAL_TERMS[0])}, 0)
               + COALESCE({_bm25_term_sql(_RETRIEVAL_TERMS[1])}, 0)
               + COALESCE({_bm25_term_sql(_RETRIEVAL_TERMS[2])}, 0)
               + COALESCE({_bm25_term_sql(_RETRIEVAL_TERMS[3])}, 0) AS score
      FROM j GROUP BY doc_id
    )
    SELECT doc_id, n_match_terms, ROUND(score, 4) AS bm25
    FROM scored
    ORDER BY score DESC, doc_id LIMIT 10
    """,
)
def q_bm25_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 top-10 for the fixed query - the standard
    length-normalized retrieval scorer (tfidf_retrieval without the
    saturation/normalization terms is the naive baseline). Same
    inverted-index plan: query-term filter first, broadcast idf and the
    one-row corpus stats, doc-length join, one groupBy(doc),
    TakeOrderedAndProject. Float determinism: every per-term value is
    one arithmetic expression over exact integers evaluated from
    IDENTICAL literal text on both engines, and the doc total adds the
    four per-term values in a FIXED textual order - no float ever flows
    through an order-free SUM across rows."""
    docs = table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(F.expr(_RAW_TOKS.replace("text", "lower(text)"))).alias("term"),
    )
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    stats = dl.agg(
        (F.sum("dl") * F.lit(1.0) / F.count(F.lit(1))).alias("avgdl"),
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
    )
    tf = (
        toks.filter(F.col("term").isin(*_RETRIEVAL_TERMS))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = dfreq.crossJoin(F.broadcast(stats.select("n_docs"))).select(
        "term",
        F.expr(
            f"CAST(ROUND(ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)"
            f" * {_IDF_SCALE}) AS BIGINT)"
        ).alias("idf_micro"),
    )
    j = (
        tf.join(F.broadcast(idf), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats.select("avgdl")))
    )
    term_sums = [
        F.coalesce(F.expr(_bm25_term_sql(t)), F.lit(0.0))
        for t in _RETRIEVAL_TERMS
    ]
    scored = j.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_match_terms"),
        (term_sums[0] + term_sums[1] + term_sums[2] + term_sums[3]).alias("score"),
    )
    return (
        scored.orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(10)
        .select("doc_id", "n_match_terms", F.round("score", 4).alias("bm25"))
    )


# ---------------------------------------------------------------------------
# time-decayed engagement (exact binary half-life recency weighting)
# ---------------------------------------------------------------------------

_DECAY_WEEK = 604_800  # half-life = one week
_DECAY_CAP = 20  # floor division by 2^20 beyond ~5 months


@query(
    "time_decayed_engagement",
    f"""
    WITH s AS (
      SELECT user_id,
             CAST(ROUND(value * 100) AS BIGINT) AS cents,
             {epoch_seconds_sql()} AS sec
      FROM events
    ),
    mx AS (SELECT MAX(sec) AS max_sec FROM s),
    d AS (
      SELECT user_id, cents,
             CAST(LEAST((mx.max_sec - sec) // {_DECAY_WEEK}, {_DECAY_CAP})
                  AS INT) AS age_weeks
      FROM s CROSS JOIN mx
    )
    SELECT user_id,
           CAST(SUM(cents // (CAST(1 AS BIGINT) << age_weeks)) AS BIGINT)
             AS decayed_cents,
           CAST(SUM(cents) AS BIGINT) AS raw_cents
    FROM d GROUP BY user_id
    """,
)
def q_time_decayed_engagement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recency-weighted engagement with a one-week BINARY half-life:
    each reading contributes cents >> age_weeks (integer floor halving
    per elapsed week, capped at 2^20). Exponential decay via exp() is
    the textbook form but libm rounding differs across engines; integer
    halving defines the same shape with EXACT portable arithmetic - the
    floor loss is part of the declared semantics, not numerical noise.
    One broadcast max-timestamp row, then a map-side weight and one
    groupBy(user)."""
    ev = table(spark, sf_dir, "events")
    s = ev.select(
        "user_id",
        F.expr("CAST(ROUND(value * 100) AS BIGINT)").alias("cents"),
        F.expr("unix_seconds(ts)").alias("sec"),
    )
    mx = s.agg(F.max("sec").alias("max_sec"))
    d = s.crossJoin(F.broadcast(mx)).select(
        "user_id",
        "cents",
        F.expr(
            f"CAST(LEAST((max_sec - sec) div {_DECAY_WEEK}, {_DECAY_CAP}) AS INT)"
        ).alias("age_weeks"),
    )
    return d.groupBy("user_id").agg(
        F.sum(
            F.expr("cents div shiftleft(CAST(1 AS BIGINT), age_weeks)")
        )
        .cast("bigint")
        .alias("decayed_cents"),
        F.sum("cents").cast("bigint").alias("raw_cents"),
    )


# ---------------------------------------------------------------------------
# nearest as-of join (tolerance-bounded, both directions)
# ---------------------------------------------------------------------------

_NEAREST_TOL = 3600  # seconds


@query(
    "asof_join_nearest",
    f"""
    WITH s AS (
      SELECT event_id, user_id, event_type, ts, {epoch_seconds_sql()} AS sec
      FROM events WHERE event_type IN ('click', 'purchase')
    ),
    t AS (
      SELECT event_id, user_id, event_type, sec,
             LAST_VALUE(CASE WHEN event_type = 'purchase' THEN sec END
                        IGNORE NULLS) OVER wb AS b_sec,
             LAST_VALUE(CASE WHEN event_type = 'purchase' THEN event_id END
                        IGNORE NULLS) OVER wb AS b_eid,
             FIRST_VALUE(CASE WHEN event_type = 'purchase' THEN sec END
                         IGNORE NULLS) OVER wf AS f_sec,
             FIRST_VALUE(CASE WHEN event_type = 'purchase' THEN event_id END
                         IGNORE NULLS) OVER wf AS f_eid
      FROM s
      WINDOW wb AS (PARTITION BY user_id ORDER BY sec, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
             wf AS (PARTITION BY user_id ORDER BY sec, event_id
                    ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
    ),
    p AS (
      SELECT event_id, user_id,
             CASE WHEN b_sec IS NOT NULL AND sec - b_sec <= {_NEAREST_TOL}
                       AND (f_sec IS NULL OR f_sec - sec > {_NEAREST_TOL}
                            OR sec - b_sec <= f_sec - sec)
                  THEN b_eid
                  WHEN f_sec IS NOT NULL AND f_sec - sec <= {_NEAREST_TOL}
                  THEN f_eid END AS purchase_event_id,
             CASE WHEN b_sec IS NOT NULL AND sec - b_sec <= {_NEAREST_TOL}
                       AND (f_sec IS NULL OR f_sec - sec > {_NEAREST_TOL}
                            OR sec - b_sec <= f_sec - sec)
                  THEN b_sec - sec
                  WHEN f_sec IS NOT NULL AND f_sec - sec <= {_NEAREST_TOL}
                  THEN f_sec - sec END AS gap_sec
      FROM t WHERE event_type = 'click'
    )
    SELECT event_id, user_id, purchase_event_id,
           CAST(gap_sec AS BIGINT) AS gap_sec
    FROM p WHERE purchase_event_id IS NOT NULL
    """,
)
def q_asof_join_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest as-of join, the two-sided variant of ``asof_join``: each
    click pairs with its closest purchase in EITHER direction within a
    1-hour tolerance (ties go backward, the as-of convention). Same
    union-merge shape as the backward as-of: interleave both event
    types in ONE user-partitioned ordered pass and read the nearest
    neighbors off two ignore-nulls window frames (preceding/following,
    both excluding the current row) - never a theta self-join, which
    would be quadratic per user. The paired (sec, event_id) columns
    come from identical NULL-conditions over identical frames, so each
    pair reads the same row."""
    ev = table(spark, sf_dir, "events")
    s = ev.filter(F.col("event_type").isin("click", "purchase")).select(
        "event_id",
        "user_id",
        "event_type",
        F.expr("unix_seconds(ts)").alias("sec"),
    )
    paired = SEQ.nearest_asof(
        s,
        keys=["user_id"],
        sec="sec",
        order_tiebreak=["event_id"],
        is_left=F.col("event_type") == "click",
        is_right=F.col("event_type") == "purchase",
        right_payload="event_id",
        tolerance=_NEAREST_TOL,
    )
    return paired.select(
        "event_id",
        "user_id",
        F.col("matched_event_id").alias("purchase_event_id"),
        "gap_sec",
    ).filter("purchase_event_id IS NOT NULL")


# ---------------------------------------------------------------------------
# interval coalescing (merge overlapping activity spans)
# ---------------------------------------------------------------------------

_SPAN = 900  # each event opens a 15-minute activity interval


@query(
    "interval_coalesce",
    f"""
    WITH iv AS (
      SELECT user_id, event_id, {epoch_seconds_sql()} AS s,
             {epoch_seconds_sql()} + {_SPAN} AS e
      FROM events
    ),
    m AS (
      SELECT user_id, event_id, s, e,
             MAX(e) OVER (PARTITION BY user_id ORDER BY s, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS prev_max_e
      FROM iv
    ),
    g AS (
      SELECT user_id, s, e,
             SUM(CASE WHEN prev_max_e IS NULL OR s > prev_max_e
                      THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY s, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS island
      FROM m
    )
    SELECT user_id,
           CAST(MIN(s) AS BIGINT) AS span_start,
           CAST(MAX(e) AS BIGINT) AS span_end,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM g GROUP BY user_id, island
    """,
)
def q_interval_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge overlapping intervals (each event opens a 15-minute
    activity span; touching/overlapping spans per user coalesce into
    one): running MAX of interval end over the preceding frame, a new
    island exactly when the next start clears it, then a cumulative
    island counter and one groupBy - the sweep-line algorithm as three
    window expressions over ONE user-partitioned sort, no self-join.
    All integer-seconds arithmetic, so the island keys and span bounds
    hash identically across engines."""
    ev = table(spark, sf_dir, "events")
    iv = ev.select(
        "user_id",
        "event_id",
        F.expr("unix_seconds(ts)").alias("s"),
        (F.expr("unix_seconds(ts)") + _SPAN).alias("e"),
    )
    out = SEQ.coalesce_intervals(
        iv, keys=["user_id"], start="s", end="e", order_tiebreak=["event_id"]
    )
    return out.select(
        "user_id",
        F.col("span_start").cast("bigint").alias("span_start"),
        F.col("span_end").cast("bigint").alias("span_end"),
        F.col("n_intervals").alias("n_events"),
    )


# ---------------------------------------------------------------------------
# equal-frequency binning via broadcast quantile assignment
# ---------------------------------------------------------------------------

_QB_EDGES = [i / 10 for i in range(1, 10)]


def _qb_edge_cols_sql() -> str:
    return ",\n             ".join(
        f"quantile_disc(o_totalprice, {q}) AS e{i}"
        for i, q in enumerate(_QB_EDGES, 1)
    )


def _qb_bucket_sql() -> str:
    return " + ".join(
        f"CASE WHEN o.o_totalprice > e.e{i} THEN 1 ELSE 0 END"
        for i in range(1, len(_QB_EDGES) + 1)
    )


@query(
    "quantile_bucketize",
    f"""
    WITH e AS (
      SELECT {_qb_edge_cols_sql()}
      FROM orders
    ),
    b AS (
      SELECT o.o_totalprice,
             ({_qb_bucket_sql()}) AS bucket
      FROM orders o CROSS JOIN e
    )
    SELECT bucket,
           CAST(COUNT(*) AS BIGINT) AS n,
           MIN(o_totalprice) AS lo,
           MAX(o_totalprice) AS hi,
           ROUND(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                 / (COUNT(*) * 100.0), 2) AS avg_price
    FROM b GROUP BY bucket
    """,
)
def q_quantile_bucketize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-frequency decile binning the way it survives scale: extract
    the 9 DISCRETE decile edges with the shard-prefix distributed rank
    (rank within value-range shards in parallel windows + tiny
    per-shard prefix-sum offsets - the epoch_shuffle machinery; the
    ANSI percentile_disc element is the value at global sorted position
    ceil(q*n)), then broadcast the 9-value edge array back over the
    fact table for map-side bucket assignment - the MLlib-Bucketizer
    shape. NEVER ntile over a global window (single-partition sort of
    the whole table), and never a percentile aggregate that buffers
    every value on one reducer. Discrete edges are actual data values
    (bit-identical across engines, corpus convention); ties land below
    their edge deterministically; the per-bucket mean is an exact
    integer-cents sum with one final division."""
    o = table(spark, sf_dir, "orders").select("o_totalprice")
    # shard = integer prefix of the value order: floor(v / 10000) is
    # monotone in v, so (shard, v) order == global v order and the
    # shard-offset decomposition reproduces the single global rank
    # (operators/sequence.py:sharded_rank).
    ranked = SEQ.sharded_rank(
        o, value="o_totalprice", shard_expr="CAST(o_totalprice AS BIGINT) div 10000"
    ).select("o_totalprice", "pos")
    # target ranks r = ceil(q*n) for q = 1/10..9/10, in exact integers
    targets = (
        o.agg(F.count(F.lit(1)).alias("n"))
        .select(F.explode(F.sequence(F.lit(1), F.lit(9))).alias("qn"), "n")
        .select(F.expr("(qn * n + 9) div 10").alias("r"))
    )
    edges = ranked.join(F.broadcast(targets), ranked["pos"] == targets["r"]).agg(
        F.sort_array(F.collect_list("o_totalprice")).alias("edges")
    )
    b = o.crossJoin(F.broadcast(edges)).select(
        "o_totalprice",
        F.size(F.filter("edges", lambda e: F.col("o_totalprice") > e)).alias(
            "bucket"
        ),
    )
    return b.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("o_totalprice").alias("lo"),
        F.max("o_totalprice").alias("hi"),
        F.round(
            F.sum(F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)"))
            / (F.count(F.lit(1)) * F.lit(100.0)),
            2,
        ).alias("avg_price"),
    )
