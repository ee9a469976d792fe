"""Reusable sequence / temporal / distribution operators.

The engine-API form of the ordered-event analytics the driver queries
exercise (driver_queries_sequence / driver_queries_audit are the
oracle-checked call sites): last-observation-carried-forward fill,
sweep-line interval coalescing, nearest as-of pairing, distributed
discrete quantiles, weighted medians, and overlap chunking. Every
function returns a lazy DataFrame built from pure Column expressions -
no UDFs, no collects - and keeps the documented shuffle budget:

- window ops partition by the caller's key columns (state per task is
  one key's history);
- quantile/median edges use the shard-prefix distributed rank (rank
  within value-range shards in parallel windows + tiny prefix-sum
  offsets), never a single-partition sort or a percentile aggregate
  that buffers every value on one reducer.

Reference surface: these extend the reference's windowed/statistical
analytics (SURVEY.md §2.5/§2.6) with the temporal operators a payroll/
behavioral auditor needs; none have a direct counterpart file in the
reference repo (its engine is a single-node dataframe library).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _cols(names: Sequence[str]) -> list[Column]:
    return [F.col(n) for n in names]


def _guard_output_cols(df: DataFrame, taken: Sequence[str], op: str) -> None:
    """Fail loudly instead of silently clobbering caller columns: these
    operators ADD named output/scratch columns, and ``withColumn`` on an
    existing name replaces it without warning (wrong results, no
    error)."""
    clash = [c for c in taken if c in df.columns]
    if clash:
        raise ValueError(
            f"{op}: input already has column(s) {clash}; rename them first "
            f"(the operator writes these names)"
        )


def forward_fill(
    df: DataFrame,
    keys: Sequence[str],
    order: Sequence[str],
    value: str,
    good: Column | None = None,
    out: str = "filled_value",
) -> DataFrame:
    """Last-observation-carried-forward: per key, each row gets the most
    recent ``value`` (optionally only rows where ``good`` holds count
    as observations). One window exchange on ``keys``; rows before the
    first observation stay NULL."""
    _guard_output_cols(df, [out], "forward_fill")
    w = (
        Window.partitionBy(*_cols(keys))
        .orderBy(*_cols(order))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    obs = F.col(value) if good is None else F.when(good, F.col(value))
    return df.withColumn(out, F.last(obs, ignorenulls=True).over(w))


def coalesce_intervals(
    df: DataFrame,
    keys: Sequence[str],
    start: str,
    end: str,
    order_tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Sweep-line merge of overlapping/touching [start, end] intervals
    per key: running MAX of end over the preceding frame, a new island
    exactly when the next start clears it, a cumulative island counter,
    one groupBy. Output: keys + span_start / span_end / n_intervals.
    All three window expressions and the final aggregate ride ONE
    hash(keys) exchange (subset partitioning satisfies the clustered
    distribution)."""
    _guard_output_cols(
        df,
        ["_prev_max_e", "_island", "span_start", "span_end", "n_intervals"],
        "coalesce_intervals",
    )
    order = [F.col(start), *_cols(order_tiebreak)]
    wp = (
        Window.partitionBy(*_cols(keys))
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wc = (
        Window.partitionBy(*_cols(keys))
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    m = df.withColumn("_prev_max_e", F.max(end).over(wp))
    g = m.withColumn(
        "_island",
        F.sum(
            F.when(
                F.col("_prev_max_e").isNull()
                | (F.col(start) > F.col("_prev_max_e")),
                1,
            ).otherwise(0)
        ).over(wc),
    )
    return (
        g.groupBy(*_cols(keys), F.col("_island"))
        .agg(
            F.min(start).alias("span_start"),
            F.max(end).alias("span_end"),
            F.count(F.lit(1)).alias("n_intervals"),
        )
        .drop("_island")
    )


def nearest_asof(
    df: DataFrame,
    keys: Sequence[str],
    sec: str,
    order_tiebreak: Sequence[str],
    is_left: Column,
    is_right: Column,
    right_payload: str,
    tolerance: int,
) -> DataFrame:
    """Two-sided nearest as-of pairing over an INTERLEAVED stream: rows
    where ``is_left`` pair with the nearest row where ``is_right``
    (by ``sec``) within ``tolerance``, ties going backward (the as-of
    convention). Returns the left rows with ``matched_<payload>`` and
    ``gap_sec`` (NULL when nothing qualifies). One key-partitioned
    sort, two ignore-nulls frames - never a theta self-join. The
    payload and sec columns are read from identical NULL-conditions
    over identical frames, so they always come from the same row."""
    _guard_output_cols(
        df,
        ["_b_sec", "_b_pay", "_f_sec", "_f_pay", f"matched_{right_payload}", "gap_sec"],
        "nearest_asof",
    )
    order = [F.col(sec), *_cols(order_tiebreak)]
    wb = (
        Window.partitionBy(*_cols(keys))
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wf = (
        Window.partitionBy(*_cols(keys))
        .orderBy(*order)
        .rowsBetween(1, Window.unboundedFollowing)
    )
    r_sec = F.when(is_right, F.col(sec))
    r_pay = F.when(is_right, F.col(right_payload))
    t = (
        df.withColumn("_b_sec", F.last(r_sec, ignorenulls=True).over(wb))
        .withColumn("_b_pay", F.last(r_pay, ignorenulls=True).over(wb))
        .withColumn("_f_sec", F.first(r_sec, ignorenulls=True).over(wf))
        .withColumn("_f_pay", F.first(r_pay, ignorenulls=True).over(wf))
        .filter(is_left)
    )
    back_ok = F.col("_b_sec").isNotNull() & (
        F.col(sec) - F.col("_b_sec") <= tolerance
    )
    fwd_ok = F.col("_f_sec").isNotNull() & (
        F.col("_f_sec") - F.col(sec) <= tolerance
    )
    prefer_back = back_ok & (
        F.col("_f_sec").isNull()
        | (F.col("_f_sec") - F.col(sec) > tolerance)
        | (F.col(sec) - F.col("_b_sec") <= F.col("_f_sec") - F.col(sec))
    )
    return (
        t.withColumn(
            f"matched_{right_payload}",
            F.when(prefer_back, F.col("_b_pay")).when(fwd_ok, F.col("_f_pay")),
        )
        .withColumn(
            "gap_sec",
            F.when(prefer_back, F.col("_b_sec") - F.col(sec))
            .when(fwd_ok, F.col("_f_sec") - F.col(sec))
            .cast("bigint"),
        )
        .drop("_b_sec", "_b_pay", "_f_sec", "_f_pay")
    )


def sharded_rank(
    df: DataFrame,
    value: str,
    shard_expr: str,
    keys: Sequence[str] = (),
    weight: str | None = None,
    with_total: bool = False,
    order_extra: Sequence[str] = (),
    with_rank: bool = False,
) -> DataFrame:
    """Global (per ``keys``) rank / cumulative weight of ``value``
    without a single-partition sort: rank within value-range shards in
    parallel windows, then add tiny per-shard prefix-sum offsets.
    ``shard_expr`` must be a SQL expression MONOTONE in ``value`` (a
    prefix of the sort order) so (shard, value) order equals global
    value order; to subdivide large tie groups of ``value`` the shard
    may additionally depend on a prefix of the next sort key, but ONLY
    at exact-``value`` granularity (e.g. ``struct(v, substring(tb,1,1))``
    - clamping/bucketing ``v`` while keeping the tiebreak component
    breaks monotonicity). ``order_extra`` names tiebreak columns
    appended to the within-shard sort so ranks over tied values are
    deterministic. Returns the input plus ``pos`` (1-based rank, or
    cumulative weight when ``weight`` is given); with ``with_rank``
    (requires ``weight``) also a ``rank`` column carrying the plain
    1-based row rank from the same window pass; and - only when
    ``with_total`` - a ``total`` column (it costs a second window pass
    over the tiny shard-totals table, so rank-only callers skip it)."""
    if with_rank and weight is None:
        raise ValueError(
            "sharded_rank: with_rank only adds information when a weight "
            "is given (pos IS the rank otherwise)"
        )
    taken = (
        ["_shard", "_wcum", "_off", "pos"]
        + (["total"] if with_total else [])
        + (["_rcum", "_roff", "rank"] if with_rank else [])
    )
    _guard_output_cols(df, taken, "sharded_rank")
    sharded = df.withColumn("_shard", F.expr(shard_expr))
    w_val = F.col(weight) if weight is not None else F.lit(1)
    w_in = (
        Window.partitionBy(*_cols(keys), F.col("_shard"))
        .orderBy(value, *order_extra)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    within = sharded.withColumn("_wcum", F.sum(w_val).over(w_in))
    if with_rank:
        # same window spec -> Spark evaluates both sums in ONE Window node
        within = within.withColumn("_rcum", F.sum(F.lit(1)).over(w_in))
    agg_cols = [F.sum(w_val).alias("_sw")]
    if with_rank:
        agg_cols.append(F.count(F.lit(1)).alias("_sn"))
    # The offset windows run over the SHARD-TOTALS relation - one row per
    # (keys, shard), tiny by construction. With empty keys they are
    # deliberately single-partition; partition on a constant AGGREGATE
    # ATTRIBUTE (min(0) - an attribute survives optimization where a
    # foldable lit(0) is constant-folded back to an empty spec) so the
    # pass is explicit rather than tripping WindowExec's "No Partition
    # Defined" warning meant for accidental whole-table windows (the
    # plan-gate test in tests/test_plans.py still audits unpartitioned
    # windows for the _shard-totals shape).
    if not keys:
        agg_cols.append(F.min(F.lit(0)).alias("_one"))
    shard_tot = sharded.groupBy(*_cols(keys), F.col("_shard")).agg(*agg_cols)
    part = _cols(keys) if keys else [F.col("_one")]
    w_off = (
        Window.partitionBy(*part)
        .orderBy("_shard")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    off_cols = [
        *_cols(keys),
        F.col("_shard"),
        (F.sum("_sw").over(w_off) - F.col("_sw")).alias("_off"),
    ]
    if with_rank:
        off_cols.append((F.sum("_sn").over(w_off) - F.col("_sn")).alias("_roff"))
    if with_total:
        w_tot = Window.partitionBy(*part).rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
        off_cols.append(F.sum("_sw").over(w_tot).alias("total"))
    offsets = shard_tot.select(*off_cols)
    out = (
        within.join(offsets, [*keys, "_shard"])
        .withColumn("pos", F.col("_wcum") + F.col("_off"))
    )
    if with_rank:
        out = out.withColumn("rank", F.col("_rcum") + F.col("_roff")).drop(
            "_rcum", "_roff"
        )
    return out.drop("_shard", "_wcum", "_off")


def chunk_overlap(
    df: DataFrame,
    tokens: str,
    size: int,
    stride: int,
) -> DataFrame:
    """Sliding-window chunking of a token-array column: windows of
    ``size`` every ``stride`` tokens, tail windows kept short. Map-side
    transform+explode - zero shuffles. Adds start_tok / n_tok /
    chunk_text; rows with empty token arrays are dropped."""
    _guard_output_cols(
        df, ["_c", "start_tok", "n_tok", "chunk_text"], "chunk_overlap"
    )
    # backtick-quote: the name is interpolated into SQL text, and an
    # unquoted "a.b" would resolve as a struct field, a spaced name
    # would not parse at all
    t = f"`{tokens}`"
    ch = df.filter(F.size(tokens) > 0).withColumn(
        "_c",
        F.explode(
            F.expr(
                f"transform(sequence(1, size({t}), {stride}), s -> "
                f"struct(s AS start, "
                f"array_join(slice({t}, s, {size}), ' ') AS chunk, "
                f"size(slice({t}, s, {size})) AS n_tok))"
            )
        ),
    )
    return (
        ch.withColumn("start_tok", F.col("_c.start").cast("bigint"))
        .withColumn("n_tok", F.col("_c.n_tok").cast("int"))
        .withColumn("chunk_text", F.col("_c.chunk"))
        .drop("_c")
    )
