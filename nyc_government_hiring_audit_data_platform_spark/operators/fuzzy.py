"""Fuzzy similarity join operators (reference parity: J1-J6, U1-U2).

The reference implements its fuzzy joins as chunked dense cdist matrices
over rapidfuzz's C++ scorers (reference: src/fuzzy_match_salary.py:112-166,
src/fuzzy_match_jobs_durations.py:58-99). Here the same two-stage
semantics - cheap token_set_ratio prefilter gating an expensive WRatio
refinement - are re-expressed Spark-first:

1. candidate generation is a TOKEN-BLOCKING equi-join (explode normalized
   tokens, join on token, distinct pairs). token_set_ratio > 0 requires at
   least one shared token after normalization, so for any cutoff > 0 the
   blocked candidate set is a SUPERSET of the qualifying pairs - the
   blocking is lossless and the plan is a uniform shuffle instead of a
   dense N x M matrix (SURVEY.md §7.3);
2. scoring runs in Arrow-batched pandas UDFs over the (small) candidate
   pair set, with pure-Python implementations of the published
   fuzzywuzzy/rapidfuzz scorer algorithms (rapidfuzz is not available in
   this environment; the algorithms are public - MIT fuzzywuzzy spec).

At 100 TB: distinct-title dedup runs first (a few-hundred-thousand
distinct titles at most, vs billions of rows), the blocked join shuffles
on tokens, scoring touches only candidates, and results join back to
full rows by the normalized title. Hot-token skew ("analyst" in 30% of
titles) is NOT something AQE fixes - skew-join splitting keys off
shuffle-partition INPUT bytes while a hot title token is a few MB in,
quadratic out (measured: tools/skew_probe.py, SCALING.md r9) - so the
tokensort path carries a lossless length prefilter in the join
condition plus an optional per-token occupancy cap (``max_block``)
with documented subset-recall semantics.
On a cluster with rapidfuzz installed, swap the list comprehensions in
token_set_ratio_udf / wratio_udf for ``rapidfuzz.process.cpdist`` over
the same candidate pairs (identical published algorithm, C++ kernel,
~100x per-pair) - the plan shape and everything upstream is unchanged.
"""

from __future__ import annotations

import re

import pandas as pd

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, IntegerType

from nyc_government_hiring_audit_data_platform_spark.functions.text import (
    normalize_text,
    tokens,
)
from nyc_government_hiring_audit_data_platform_spark.functions.textstats import (
    char_shingles,
)

# ---------------------------------------------------------------------------
# pure-Python scorers (published fuzzywuzzy/rapidfuzz algorithm definitions)
# ---------------------------------------------------------------------------


def _lcs_len(a: str, b: str) -> int:
    """Longest-common-subsequence length, O(len(a)*len(b)) two-row DP."""
    if not a or not b:
        return 0
    if len(b) < len(a):
        a, b = b, a
    prev = [0] * (len(a) + 1)
    for ch_b in b:
        cur = [0] * (len(a) + 1)
        for i, ch_a in enumerate(a, 1):
            cur[i] = prev[i - 1] + 1 if ch_a == ch_b else max(prev[i], cur[i - 1])
        prev = cur
    return prev[-1]


def simple_ratio(a: str, b: str) -> float:
    """Indel similarity 0-100: 200*LCS/(|a|+|b|) (rapidfuzz fuzz.ratio)."""
    if not a and not b:
        return 100.0
    denom = len(a) + len(b)
    if denom == 0:
        return 100.0
    return 200.0 * _lcs_len(a, b) / denom


def partial_ratio(a: str, b: str) -> float:
    """Best indel similarity of the shorter string against every
    equal-length window of the longer (published partial_ratio shape)."""
    if not a and not b:
        return 100.0
    short, long_ = (a, b) if len(a) <= len(b) else (b, a)
    if not short:
        return 0.0
    if len(short) == len(long_):
        return simple_ratio(short, long_)
    best = 0.0
    for start in range(len(long_) - len(short) + 1):
        window = long_[start : start + len(short)]
        score = simple_ratio(short, window)
        if score > best:
            best = score
            if best == 100.0:
                break
    return best


def _token_lists(s: str) -> list[str]:
    return [t for t in s.split(" ") if t]


def token_sort_ratio(a: str, b: str, ratio_fn=simple_ratio) -> float:
    """ratio over the token-sorted strings."""
    return ratio_fn(" ".join(sorted(_token_lists(a))), " ".join(sorted(_token_lists(b))))


def token_set_ratio(a: str, b: str, ratio_fn=simple_ratio) -> float:
    """Published token_set_ratio: compare sorted-intersection against each
    side's intersection+difference, take the max of the three ratios.
    Score > 0 on disjoint token sets is impossible, which is what makes
    token blocking lossless."""
    ta, tb = set(_token_lists(a)), set(_token_lists(b))
    if not ta and not tb:
        return 100.0
    inter = " ".join(sorted(ta & tb))
    diff_a = " ".join(sorted(ta - tb))
    diff_b = " ".join(sorted(tb - ta))
    combined_a = (inter + " " + diff_a).strip()
    combined_b = (inter + " " + diff_b).strip()
    if not inter:
        return ratio_fn(combined_a, combined_b)
    return max(
        ratio_fn(inter, combined_a),
        ratio_fn(inter, combined_b),
        ratio_fn(combined_a, combined_b),
    )


def wratio(a: str, b: str) -> float:
    """Published WRatio algorithm (fuzzywuzzy): base ratio, optionally
    blended with token and partial variants depending on the length
    ratio. Inputs are assumed already normalized."""
    if not a and not b:
        return 100.0
    if not a or not b:
        return 0.0
    unbase_scale = 0.95
    base = simple_ratio(a, b)
    len_ratio = max(len(a), len(b)) / min(len(a), len(b))
    if len_ratio < 1.5:
        return max(
            base,
            token_sort_ratio(a, b) * unbase_scale,
            token_set_ratio(a, b) * unbase_scale,
        )
    partial_scale = 0.9 if len_ratio < 8 else 0.6
    return max(
        base,
        partial_ratio(a, b) * partial_scale,
        token_sort_ratio(a, b, ratio_fn=partial_ratio) * unbase_scale * partial_scale,
        token_set_ratio(a, b, ratio_fn=partial_ratio) * unbase_scale * partial_scale,
    )


# ---------------------------------------------------------------------------
# pandas UDFs (Arrow-batched; the only Python in the plan)
# ---------------------------------------------------------------------------


@F.pandas_udf(IntegerType())
def token_set_ratio_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    return pd.Series(
        [int(round(token_set_ratio(x or "", y or ""))) for x, y in zip(a, b)],
        dtype="int32",
    )


@F.pandas_udf(DoubleType())
def wratio_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    """Unrounded WRatio: the reference compares rapidfuzz's float WRatio
    against the cutoff BEFORE any integer cast (src/fuzzy_match_salary.py
    :136-140), so rounding here would admit boundary scores in
    [cutoff-0.5, cutoff) that the reference rejects. Round at output."""
    return pd.Series(
        [wratio(x or "", y or "") for x, y in zip(a, b)], dtype="float64"
    )


# ---------------------------------------------------------------------------
# the two-stage fuzzy join
# ---------------------------------------------------------------------------


def _cap_block_occupancy(
    exploded: DataFrame, key_col: str, order_cols: list[str], max_block: int
) -> DataFrame:
    """Deterministically truncate each blocking-key group to its
    ``max_block`` lowest-ranked members (rank = ``order_cols`` asc).

    Same enforcement shape as dedup.minhash_lsh_pairs(max_bucket=...):
    one row_number window partitioned on the candidate join's key.
    Plan cost (plan-gated in tests/test_plans.py): Spark compiles the
    rank<=k filter to WindowGroupLimit with a PARTIAL map-side stage
    BELOW the window's exchange, so every mapper truncates each key to
    max_block before shuffling - a hot key can never flood one reducer
    with its raw occupancy. The window's exchange hash-partitions the
    (bounded, exploded) key rows; when the join side is large enough to
    shuffle (the 100 TB case) the join reuses that partitioning, and
    when the side broadcasts (driver-scale inputs) the exchange is
    additive but carries only capped rows. Recall semantics are the
    caller's to document."""
    w = Window.partitionBy(key_col).orderBy(*order_cols)
    return (
        exploded.withColumn("_occ", F.row_number().over(w))
        .filter(F.col("_occ") <= max_block)
        .drop("_occ")
    )


def _salt_hot_blocks(
    le: DataFrame,
    re_: DataFrame,
    l_tok: str,
    r_tok: str,
    l_hash_cols: list[str],
    salt_buckets: int,
    hot_occupancy: int,
) -> tuple[DataFrame, DataFrame]:
    """Lossless hot-key parallelization shared by both blocking paths
    (SCALING.md r9 finding 4): blocking keys whose occupancy exceeds
    ``hot_occupancy`` on EITHER side (two map-side-combined counts,
    union, broadcast back) get the LEFT rows hash-salted into
    ``salt_buckets`` buckets and the RIGHT rows replicated once per
    bucket; all other keys keep salt 0 with no replication. Each
    original (left, right) meeting happens in exactly ONE bucket, so
    joining on (key, salt) instead of (key) is output-identical - but
    a hot key's enumeration, which serializes into one task under a
    shuffle join, runs in salt_buckets tasks (measured 7.9x at x10).
    Either-side detection matters: a key hot on the LEFT with a cold
    right side is still a single-task straggler (|L_key| * |R_key|
    rows in one partition), and salting-left/replicating-right fixes
    it at the cost of replicating only the COLD side. Returns the two
    sides each carrying a ``salt`` column; the caller adds salt
    equality to its join."""
    hot = (
        re_.groupBy(r_tok)
        .agg(F.count(F.lit(1)).alias("_occ"))
        .filter(F.col("_occ") > hot_occupancy)
        .select(F.col(r_tok).alias("_hot_tok"))
        .union(
            le.groupBy(l_tok)
            .agg(F.count(F.lit(1)).alias("_occ"))
            .filter(F.col("_occ") > hot_occupancy)
            .select(F.col(l_tok).alias("_hot_tok"))
        )
        .distinct()
    )
    le2 = le.join(
        F.broadcast(hot), F.col(l_tok) == F.col("_hot_tok"), "left"
    ).select(
        *le.columns,
        F.when(
            F.col("_hot_tok").isNotNull(),
            F.pmod(F.hash(*l_hash_cols), F.lit(salt_buckets)),
        )
        .otherwise(F.lit(0))
        .alias("salt"),
    )
    re2 = re_.join(
        F.broadcast(hot), F.col(r_tok) == F.col("_hot_tok"), "left"
    ).select(
        *re_.columns,
        F.explode(
            F.when(
                F.col("_hot_tok").isNotNull(),
                F.sequence(F.lit(0), F.lit(salt_buckets - 1)),
            ).otherwise(F.array(F.lit(0)))
        ).alias("salt"),
    )
    return le2, re2


def _blocking_keys(norm: Column) -> Column:
    """The WRatio lane's blocking-key set for one normalized title:
    whole tokens ∪ character 4-grams (see fuzzy_title_pairs for why
    both classes are needed). Shared by the one-shot join and the
    persisted-index incremental path so the two candidate sets are the
    same by construction."""
    toks = tokens(norm)
    grams = char_shingles(norm, 4)
    return F.array_distinct(F.concat(toks, grams))


def fuzzy_title_pairs(
    left: DataFrame,
    right: DataFrame,
    left_col: str,
    right_col: str,
    prefilter_cutoff: int,
    score_cutoff: int,
    max_block: int | None = None,
    salt_buckets: int | None = None,
    hot_occupancy: int = 1024,
) -> DataFrame:
    """Distinct-title two-stage fuzzy match.

    Returns (left_title, right_title, left_norm, right_norm, score) for
    every distinct title pair with token_set_ratio >= prefilter_cutoff
    (stage 1, reference: src/fuzzy_match_salary.py:119-126) and
    WRatio >= score_cutoff (stage 2, reference: :132-140). ``score`` is
    the WRatio, as in the reference (:140).

    Candidates come from the UNION of two equi-join blockings over the
    normalized titles: shared whole token, and shared character 4-gram.
    Token blocking alone is NOT complete for token_set_ratio: on
    disjoint token sets the published algorithm falls back to a
    char-level ratio, so e.g. 'analyst'/'analysts' scores 93 with zero
    shared tokens; the 4-gram block catches those.

    Completeness bound (tests/test_fuzzy_properties.py): a pair sharing
    NO blocking key has all aligned runs <= 3 chars, which caps
    token_set_ratio at 92.3 - so blocking is provably lossless for
    cutoffs >= 93 and approximate below, where a miss requires
    adversarial short single-token strings ('abcd'/'abxcd' = 88.9), not
    realistic titles (brute-force equality on the domain fixtures is
    asserted at the reference's 85/75 cutoffs). (At extreme scale swap
    the 4-gram block for MinHash-LSH over title shingles -
    operators.dedup.minhash_lsh_pairs - to bound candidates.)

    ``max_block`` - HOT-KEY occupancy cap (see fuzzy_title_pairs_tokensort
    for the measured motivation): each blocking key (token or 4-gram)
    keeps only its max_block lowest-(norm, title) members per side
    before the equi-join, bounding per-key candidates at max_block^2.
    Capped output is a strict SUBSET of the uncapped output; a pair is
    lost only if EVERY key the two titles share is over-capped past one
    of them. None (default) = lossless.

    ``salt_buckets``/``hot_occupancy`` - the LOSSLESS lane
    (:func:`_salt_hot_blocks`): over-occupancy blocking keys (tokens
    AND 4-grams - grams are the hotter class) parallelize across salt
    buckets with bit-identical output; same trade table as the
    tokensort path (SCALING.md r9: planner broadcast / salt / cap).
    """
    lt = (
        left.select(F.col(left_col).alias("left_title"))
        .where(F.col(left_col).isNotNull())
        .distinct()
        .withColumn("left_norm", normalize_text(F.col("left_title")))
    )
    rt = (
        right.select(F.col(right_col).alias("right_title"))
        .where(F.col(right_col).isNotNull())
        .distinct()
        .withColumn("right_norm", normalize_text(F.col("right_title")))
    )

    le = lt.select(
        "left_title", "left_norm",
        F.explode(_blocking_keys(F.col("left_norm"))).alias("blk"),
    )
    re_ = rt.select(
        "right_title", "right_norm",
        F.explode(_blocking_keys(F.col("right_norm"))).alias("blk"),
    )
    if max_block is not None:
        le = _cap_block_occupancy(le, "blk", ["left_norm", "left_title"], max_block)
        re_ = _cap_block_occupancy(re_, "blk", ["right_norm", "right_title"], max_block)
    join_keys = ["blk"]
    if salt_buckets is not None and salt_buckets > 1:
        le, re_ = _salt_hot_blocks(
            le, re_, "blk", "blk", ["left_norm", "left_title"],
            salt_buckets, hot_occupancy,
        )
        join_keys = ["blk", "salt"]
    cand = (
        le.join(re_, join_keys)
        .select("left_title", "left_norm", "right_title", "right_norm")
        .distinct()
    )
    return _score_candidate_pairs(cand, prefilter_cutoff, score_cutoff)


def _score_candidate_pairs(
    cand: DataFrame, prefilter_cutoff: int, score_cutoff: int
) -> DataFrame:
    """The WRatio lane's two scoring stages over a candidate pair set
    (shared by the one-shot join and the incremental index probe, so
    the scored output is the same function of the candidates)."""
    stage1 = cand.withColumn(
        "ts_ratio", token_set_ratio_udf(F.col("left_norm"), F.col("right_norm"))
    ).filter(F.col("ts_ratio") >= prefilter_cutoff)
    # stage-1 int rounding above matches the reference's uint8 cdist;
    # stage 2 compares the UNROUNDED float WRatio (reference :136-140)
    # and rounds only the emitted score (stored as uint8 there).
    stage2 = stage1.withColumn(
        "score_f", wratio_udf(F.col("left_norm"), F.col("right_norm"))
    ).filter(F.col("score_f") >= score_cutoff)
    return stage2.select(
        "left_title",
        "right_title",
        "left_norm",
        "right_norm",
        F.round("score_f").cast("int").alias("score"),
    )


def token_sort_key(col: Column | str) -> Column:
    """Normalized, token-sorted form of a title: the string both sides of
    the token-sort scorer compare (fuzzywuzzy token_sort_ratio's
    "sorted join"). DuckDB twin: array_to_string(list_sort(list_filter(
    string_split(norm, ' '), t -> t <> '')), ' ')."""
    return F.concat_ws(" ", F.array_sort(tokens(col)))


def fuzzy_title_pairs_tokensort(
    left: DataFrame,
    right: DataFrame,
    left_col: str,
    right_col: str,
    min_shared_tokens: int = 2,
    score_cutoff: int = 85,
    max_block: int | None = None,
    salt_buckets: int | None = None,
    hot_occupancy: int = 1024,
) -> DataFrame:
    """Oracle-expressible two-stage fuzzy match: token-count prefilter +
    token-sort levenshtein ratio. Same two-stage plan shape as
    ``fuzzy_title_pairs`` (the reference's token_set_ratio-gated WRatio,
    src/fuzzy_match_salary.py:119-140) but built ENTIRELY from engine
    built-ins, so the identical computation runs in DuckDB SQL - this is
    the scorer the driver hash-verifies; rapidfuzz-parity for the
    published WRatio algorithm stays pinned in tests/test_fuzzy.py.

    Stage 1 (prefilter): candidate pairs must share >= min_shared_tokens
    distinct normalized tokens - an explode + equi-join + count, i.e. a
    uniform shuffle on tokens, never a dense N x M matrix. The shared-
    token requirement is part of this operator's CONTRACT (pairs with
    zero shared tokens are non-candidates even if their char-level edit
    distance is small, e.g. 'analyst'/'analysts'); the WRatio path's
    token ∪ char-4-gram blocking in ``fuzzy_title_pairs`` covers that
    class when needed. Stage 2 (refine): levenshtein similarity over the
    token-SORTED normalized titles (word-order-insensitive, like the
    reference's token scorers) must reach score_cutoff. JVM levenshtein
    + whole-stage codegen: no Python in the plan at all, ~10x the
    pandas-UDF path per pair.

    LOSSLESS LENGTH PREFILTER (always on): lev(a,b) >= |len(a)-len(b)|,
    so sim >= score_cutoff forces |len(lkey)-len(rkey)| <=
    (1 - score_cutoff/100) * max(len) - the bound rides IN the join
    condition as a residual filter, so incompatible-length pairs are
    dropped at the token equi-join's probe instead of surviving into
    the pair-dedup shuffle. Final output is bit-identical (the dropped
    pairs cannot pass stage 2); on the skewed-title probe
    (tools/skew_probe.py) this cuts the hot token's emitted candidates
    by the length-compatibility factor before any shuffle.

    HOT-TOKEN SKEW (``max_block``, measured in SCALING.md): a token
    appearing in p% of titles on both sides emits (pN)*(pM) candidate
    pairs from ONE join key. AQE's skew-join split does NOT intervene:
    OptimizeSkewedJoin triggers on shuffle-partition INPUT bytes
    (default 256 MB / 5x median), and a hot title token's input is a
    few MB of short strings while its OUTPUT is quadratic - the
    explosion happens inside one join task, invisible to input-size
    skew detection. When ``max_block`` is set, each token keeps only
    its max_block lowest-(key, title) members per side (row_number
    window on the join key - the dedup.minhash_lsh_pairs(max_bucket)
    pattern; map-side partial WindowGroupLimit, see
    _cap_block_occupancy), bounding per-token
    candidates at max_block^2. Recall semantics: capped output is a
    strict SUBSET; a pair is lost only if EVERY token it shares is
    over-capped past one of its sides - healthy (sub-cap) tokens are
    untouched, and a hot STOP-WORD-like token's loss is exactly the
    pairs that share nothing rarer than it. None (default) = lossless.

    ``salt_buckets`` - the LOSSLESS skew answer, for when the hot
    token's pairs are genuinely wanted and only their single-task
    serialization is the problem: tokens whose occupancy on EITHER
    side exceeds ``hot_occupancy`` (two cheap map-side-combined
    counts, unioned and broadcast back - a key hot on the LEFT with a
    cold right side is still a single-task straggler, see
    :func:`_salt_hot_blocks`) have their LEFT rows salted into
    ``salt_buckets`` deterministic buckets (hash of key+title) and
    their RIGHT rows replicated once per bucket, so the hot key's
    quadratic enumeration runs in salt_buckets parallel tasks instead
    of one; every other token keeps salt 0 with no replication. Output
    is BIT-IDENTICAL to the unsalted plan (each original (left, right)
    meeting lands in exactly one salt bucket; hash-verified cross-
    engine by the ``fuzzy_block_salted`` driver row whose oracle is
    the plain unsalted SQL). Cost: the occupancy count + hot-side
    replication x salt_buckets (bounded: only over-threshold tokens
    replicate). Compose with ``max_block`` only in the degenerate
    sense (after capping nothing exceeds a sane threshold, so the salt
    lane no-ops); pick ONE - cap to bound work, salt to parallelize
    it. Measured on the skew probe (SCALING.md r9): the x10 hot task
    19.6 s -> seconds, x100 from NOT-RUNNABLE to a measured point.

    Returns (left_title, right_title, score int).
    """
    lt = (
        left.select(F.col(left_col).alias("left_title"))
        .where(F.col(left_col).isNotNull())
        .distinct()
        .withColumn("left_key", token_sort_key(F.col("left_title")))
    )
    rt = (
        right.select(F.col(right_col).alias("right_title"))
        .where(F.col(right_col).isNotNull())
        .distinct()
        .withColumn("right_key", token_sort_key(F.col("right_title")))
    )
    le = lt.select(
        "left_title",
        "left_key",
        F.explode(F.array_distinct(F.split("left_key", " "))).alias("tok"),
    )
    re_ = rt.select(
        "right_title",
        "right_key",
        F.explode(F.array_distinct(F.split("right_key", " "))).alias("rtok"),
    )
    if max_block is not None:
        le = _cap_block_occupancy(le, "tok", ["left_key", "left_title"], max_block)
        re_ = _cap_block_occupancy(re_, "rtok", ["right_key", "right_title"], max_block)
    # lossless length bound: lev >= |dlen|, so sim >= cutoff caps |dlen|
    len_ok = (
        F.abs(F.length("left_key") - F.length("right_key"))
        <= (F.lit(100 - score_cutoff) / F.lit(100.0))
        * F.greatest(F.length("left_key"), F.length("right_key"))
    )
    if salt_buckets is not None and salt_buckets > 1:
        # lossless hot-key parallelization: salt left, replicate right
        le, re_ = _salt_hot_blocks(
            le, re_, "tok", "rtok", ["left_key", "left_title"],
            salt_buckets, hot_occupancy,
        )
        join_cond = (
            (F.col("tok") == F.col("rtok"))
            & (le["salt"] == re_["salt"])
            & len_ok
        )
        joined = le.join(re_, join_cond).drop("salt")
    else:
        joined = le.join(re_, (F.col("tok") == F.col("rtok")) & len_ok)
    return _score_tokensort_candidates(joined, min_shared_tokens, score_cutoff)


def _score_tokensort_candidates(
    joined: DataFrame, min_shared_tokens: int, score_cutoff: int
) -> DataFrame:
    """The tokensort lane's candidate dedup + stage-2 refinement over
    the exploded token equi-join output (shared by the one-shot join
    and the incremental index probe)."""
    cand = (
        joined.groupBy("left_title", "left_key", "right_title", "right_key")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared_tokens)
    )
    from nyc_government_hiring_audit_data_platform_spark.functions.similarity import (
        levenshtein_similarity,
    )

    sim = levenshtein_similarity(F.col("left_key"), F.col("right_key"))
    return (
        cand.filter(sim >= score_cutoff)
        .select(
            "left_title",
            "right_title",
            F.round(sim).cast("int").alias("score"),
        )
    )


def fuzzy_join_tokensort(
    left: DataFrame,
    right: DataFrame,
    left_col: str,
    right_col: str,
    min_shared_tokens: int = 2,
    score_cutoff: int = 85,
    max_block: int | None = None,
    salt_buckets: int | None = None,
    hot_occupancy: int = 1024,
) -> DataFrame:
    """Row-level fuzzy join over the oracle-expressible token-sort
    levenshtein scorer (same re-attach shape as ``fuzzy_join``: score
    once per distinct title pair, join full rows back by title; AQE
    picks broadcast vs shuffle for the data-dependent pair table).

    The three skew levers forward verbatim to
    :func:`fuzzy_title_pairs_tokensort` (where their contracts -
    ``max_block`` subset-recall cap, ``salt_buckets``/``hot_occupancy``
    lossless hot-key parallelization - are documented and measured);
    defaults leave the plan byte-identical to the lever-free join."""
    pairs = fuzzy_title_pairs_tokensort(
        left, right, left_col, right_col, min_shared_tokens, score_cutoff,
        max_block, salt_buckets, hot_occupancy,
    )
    out = (
        left.join(pairs, left[left_col] == pairs["left_title"])
        .join(right, pairs["right_title"] == right[right_col])
    )
    return out.drop("left_title", "right_title")


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_col: str,
    right_col: str,
    prefilter_cutoff: int = 85,
    score_cutoff: int = 85,
    max_block: int | None = None,
    salt_buckets: int | None = None,
    hot_occupancy: int = 1024,
) -> DataFrame:
    """Row-level fuzzy join: every (left row, right row) pair whose titles
    fuzzy-match. Output: all left columns, all right columns, ``score``
    int (reference J4 row-merge, src/fuzzy_match_salary.py:156).

    The expensive scoring runs once per distinct title pair; full rows
    re-attach via two equi-joins on the title. The pair table carries NO
    broadcast hint: its size is data-dependent (the reference's v2.0 run
    produced 8.7M match pairs - BASELINE.md - which at 100x would OOM a
    forced broadcast), so AQE picks the strategy from the observed
    runtime size - broadcast when the pairs are small (the common case:
    distinct titles x cutoff), shuffled hash/sort-merge when not.

    The three skew levers forward verbatim to
    :func:`fuzzy_title_pairs` (``max_block`` subset-recall occupancy
    cap; ``salt_buckets``/``hot_occupancy`` lossless hot-key salting
    over the token AND 4-gram blocking keys); defaults leave the plan
    byte-identical to the lever-free join. This matters at reference
    scale: its own log shows a 612,076-record comparison group for one
    hot title (logs/application.log.1) - exactly the shape where one
    blocking key serializes into a single task without these levers."""
    pairs = fuzzy_title_pairs(
        left, right, left_col, right_col, prefilter_cutoff, score_cutoff,
        max_block, salt_buckets, hot_occupancy,
    )
    pairs_small = pairs.select("left_title", "right_title", "score")
    out = (
        left.join(pairs_small, left[left_col] == pairs_small["left_title"])
        .join(right, pairs_small["right_title"] == right[right_col])
    )
    return out.drop("left_title", "right_title")


# ---------------------------------------------------------------------------
# incremental fuzzy matching: persisted blocking index + delta probe
# ---------------------------------------------------------------------------
#
# The reference re-matches ALL payroll x postings on every weekly run
# (src/fuzzy_flows.py:16-23 schedules the full fuzzy_match_salary_flow
# weekly; src/fuzzy_match_salary.py:27-189 always scans both sides in
# full). At 100 TB that weekly cadence re-pays the whole blocking join
# for a delta that is typically <1% of the corpus. The incremental lane
# mirrors dedup's build_band_index/incremental_neardup: the STABLE side
# (payroll titles - new payroll lands yearly, postings weekly) persists
# ONCE as its exploded blocking index, and each postings batch probes
# the index with cost O(|delta keys| + matched blocks) instead of
# O(|payroll| + |postings|). Because a scored pair is a pure function of
# the two titles and the candidate/scoring stages are the SAME code as
# the one-shot join, (prior matches) UNION (delta probe) is row-identical
# to the full re-match when the batches partition the postings - the
# hash-verified claim of the fuzzy_incremental_union driver row.
#
# Index layout: one row per (blocking key, title). Persist it
# partitioned/bucketed on the key column in production so a delta probe
# shuffles only its own exploded keys (the dedup band index's contract).


def build_fuzzy_title_index(
    right: DataFrame, right_col: str, max_block: int | None = None
) -> DataFrame:
    """Persisted index side of incremental WRatio matching: the stable
    side's distinct normalized titles exploded into their blocking keys
    (token ∪ char-4-gram - exactly :func:`fuzzy_title_pairs`'s lanes
    via the shared :func:`_blocking_keys`). Columns (blk, right_title,
    right_norm); size = O(sum of per-title key counts), linear.

    ``max_block`` - the probe path's hot-key lever, applied at BUILD
    time (the probe joins a delta against whatever the index stores,
    so the index is where occupancy must be bounded): each blocking
    key keeps only its ``max_block`` lowest-(norm, title) members, the
    same deterministic truncation and subset-recall semantics as the
    one-shot joins' ``max_block`` (:func:`_cap_block_occupancy`). A
    delta title probing a hot key then meets at most ``max_block``
    index rows instead of the key's raw occupancy. None = lossless."""
    rt = (
        right.select(F.col(right_col).alias("right_title"))
        .where(F.col(right_col).isNotNull())
        .distinct()
        .withColumn("right_norm", normalize_text(F.col("right_title")))
    )
    idx = rt.select(
        F.explode(_blocking_keys(F.col("right_norm"))).alias("blk"),
        "right_title",
        "right_norm",
    )
    if max_block is not None:
        idx = _cap_block_occupancy(
            idx, "blk", ["right_norm", "right_title"], max_block
        )
    return idx


def incremental_fuzzy_pairs(
    index: DataFrame,
    delta_left: DataFrame,
    left_col: str,
    prefilter_cutoff: int,
    score_cutoff: int,
) -> DataFrame:
    """Probe a :func:`build_fuzzy_title_index` with a delta batch of
    left titles: same candidate generation (key equi-join, pair
    distinct) and the same two scoring stages as
    :func:`fuzzy_title_pairs` - output-identical to
    ``fuzzy_title_pairs(delta_left, right, ...)`` (property-tested)
    without touching the stable side's rows. Same 5-column output."""
    lt = (
        delta_left.select(F.col(left_col).alias("left_title"))
        .where(F.col(left_col).isNotNull())
        .distinct()
        .withColumn("left_norm", normalize_text(F.col("left_title")))
    )
    le = lt.select(
        "left_title", "left_norm",
        F.explode(_blocking_keys(F.col("left_norm"))).alias("blk"),
    )
    cand = (
        le.join(index, "blk")
        .select("left_title", "left_norm", "right_title", "right_norm")
        .distinct()
    )
    return _score_candidate_pairs(cand, prefilter_cutoff, score_cutoff)


def build_tokensort_title_index(
    right: DataFrame, right_col: str, max_block: int | None = None
) -> DataFrame:
    """Persisted index side of incremental tokensort matching: the
    stable side's distinct titles exploded into their token-sort-key
    tokens (exactly :func:`fuzzy_title_pairs_tokensort`'s blocking).
    Columns (tok, right_title, right_key). ``max_block`` bounds each
    token's stored occupancy at build time - the probe path's hot-key
    lever, same truncation and subset-recall semantics as
    :func:`build_fuzzy_title_index`."""
    rt = (
        right.select(F.col(right_col).alias("right_title"))
        .where(F.col(right_col).isNotNull())
        .distinct()
        .withColumn("right_key", token_sort_key(F.col("right_title")))
    )
    idx = rt.select(
        F.explode(F.array_distinct(F.split("right_key", " "))).alias("tok"),
        "right_title",
        "right_key",
    )
    if max_block is not None:
        idx = _cap_block_occupancy(
            idx, "tok", ["right_key", "right_title"], max_block
        )
    return idx


def incremental_fuzzy_pairs_tokensort(
    index: DataFrame,
    delta_left: DataFrame,
    left_col: str,
    min_shared_tokens: int = 2,
    score_cutoff: int = 85,
) -> DataFrame:
    """Probe a :func:`build_tokensort_title_index` with a delta batch:
    token equi-join with the SAME lossless length prefilter riding in
    the join condition, then the shared candidate dedup + levenshtein
    stage - output-identical to ``fuzzy_title_pairs_tokensort(
    delta_left, right, ...)`` (property-tested, and hash-verified
    end-to-end by the fuzzy_incremental_union driver row)."""
    lt = (
        delta_left.select(F.col(left_col).alias("left_title"))
        .where(F.col(left_col).isNotNull())
        .distinct()
        .withColumn("left_key", token_sort_key(F.col("left_title")))
    )
    le = lt.select(
        "left_title",
        "left_key",
        F.explode(F.array_distinct(F.split("left_key", " "))).alias("ltok"),
    )
    len_ok = (
        F.abs(F.length("left_key") - F.length("right_key"))
        <= (F.lit(100 - score_cutoff) / F.lit(100.0))
        * F.greatest(F.length("left_key"), F.length("right_key"))
    )
    joined = le.join(index, (F.col("ltok") == F.col("tok")) & len_ok)
    return _score_tokensort_candidates(joined, min_shared_tokens, score_cutoff)


def extend_title_index(
    index: DataFrame,
    new_right: DataFrame,
    right_col: str,
    index_fn=None,
    max_block: int | None = None,
) -> DataFrame:
    """Maintain the INDEX side incrementally: the append-delta of index
    rows for titles in ``new_right`` that the persisted index does not
    already carry (the index stores one row per key x title, so title
    presence is the dedup unit). Append the returned rows to the
    persisted index (a file append, no rewrite):
    ``index(old) ∪ extend_title_index(index(old), new)`` ==
    ``index(old ∪ new)`` for UNCAPPED indexes (property-tested for
    both lanes). Works for either index layout: when ``index_fn`` is
    not supplied it is INFERRED from the index's own columns (``blk``
    = the WRatio lane, ``tok`` = the tokensort lane) - a guessed
    default would build the wrong layout and crash the select for one
    of the two lanes.

    ``max_block`` - REQUIRED to match the build cap when the index was
    built with one: the delta is capped per key among the new titles,
    so an appended generation's per-key contribution stays bounded -
    but truncation is GENERATION-LOCAL: the unioned occupancy is
    bounded by generations x max_block, not max_block, and the exact
    capped-rebuild parity (lowest members of old ∪ new) does NOT hold
    under append maintenance. :func:`compact_title_index` restores the
    exact bound (proven == a fresh capped rebuild; trigger on
    :func:`title_index_occupancy`'s ``keys_over_cap``), and
    :func:`compact_persisted_title_index` is its production form;
    leaving ``max_block`` unset on a capped index silently regrows hot
    keys uncapped.

    PLAN SHAPE (the reason for the two-step membership probe below):
    a plain ``fresh ANTI-JOIN index-titles`` cannot broadcast - Spark's
    LeftAnti BroadcastHashJoin only builds the RIGHT side, and the
    index's title set is the big side - so the big index would shuffle
    on every weekly maintenance run. Instead the (small) new-title set
    broadcasts into a semi-join against the index (no index shuffle,
    one streaming scan), yielding the <= |new titles| already-present
    subset, and the anti-join then runs against THAT tiny relation."""
    if index_fn is None:
        if "blk" in index.columns:
            index_fn = build_fuzzy_title_index
        elif "tok" in index.columns:
            index_fn = build_tokensort_title_index
        else:
            raise ValueError(
                f"unrecognized index layout {index.columns}; pass index_fn"
            )
    fresh = (
        index_fn(new_right, right_col)
        if max_block is None
        else index_fn(new_right, right_col, max_block=max_block)
    )
    new_titles = fresh.select("right_title").distinct()
    present = (
        index.select("right_title")
        .join(F.broadcast(new_titles), "right_title", "left_semi")
        .distinct()
    )
    return fresh.join(F.broadcast(present), "right_title", "left_anti").select(
        *index.columns
    )


# ---------------------------------------------------------------------------
# index persistence: the production on-disk shapes of a title index
# ---------------------------------------------------------------------------
#
# Layouts read_title_index understands, newest first:
#   - managed: ``{index_dir}/_index_meta.json`` + ``{index_dir}/base``
#     (plain parquet, or an external BUCKETED table on the blocking key)
#     + zero or more ``{index_dir}/g{batch_id}`` append generations
#     written by the streaming maintenance sink;
#   - legacy: plain parquet files at ``{index_dir}`` itself (what every
#     pre-round-12 caller wrote with ``df.write.parquet(index_dir)``).
#
# The bucketed shape is the 100 TB probe shape: the weekly delta
# probe's blocking-key equi-join then moves only the delta's exploded
# keys - the index side is a bucketed table scan with NO Exchange
# (plan-gated in tests/test_fuzzy.py) - while a plain-parquet index
# re-shuffles its full key domain on every weekly run. Append
# generations ride as plain parquet and DO shuffle (a union hides the
# bucketing from the planner); compact_title_index folds them back
# into the base to restore the shuffle-free shape - the compaction
# cadence bounds how long the probe pays the generation tax.

_INDEX_META = "_index_meta.json"

# (applicationId, table name) -> the bucket count this application
# last verified/registered for the table. Keeps _resolve_index_table's
# stale-declaration DESCRIBE off the per-micro-batch hot path: it
# re-runs only when the on-disk meta's count moves away from what was
# verified (the only way the registration can go stale). applicationId
# is the right granularity: table registrations live in the app-level
# SharedState catalog, and unlike id(session) it can never alias a
# GC'd session's verification onto a new one. Bounded by the number of
# distinct index tables an app touches.
_VERIFIED_BUCKET_SPECS: dict = {}


def _index_table_name(index_dir: str) -> str:
    """Deterministic catalog identifier for a bucketed title index,
    derived from the absolute path alone so any session can re-register
    (or defensively DROP) the entry. Same collision-hardening as the
    IVM state tables (streaming/jobs.py:_state_table_name): the munged
    readable form alone collides across distinct dirs, so an md5 of
    the exact path rides in the name."""
    import hashlib
    import os

    path = os.path.abspath(index_dir)
    munged = re.sub(r"[^A-Za-z0-9_]+", "_", path).strip("_").lower()
    digest = hashlib.md5(path.encode()).hexdigest()[:10]
    return f"fuzzy_title_index_{munged[-48:].strip('_')}_{digest}".lower()


def _index_key_column(index: DataFrame) -> str:
    """The blocking-key column of either index layout (``blk`` = the
    WRatio lane, ``tok`` = the tokensort lane)."""
    if "blk" in index.columns:
        return "blk"
    if "tok" in index.columns:
        return "tok"
    raise ValueError(
        f"unrecognized title-index layout {index.columns}; expected a "
        "blk (WRatio) or tok (tokensort) blocking-key column"
    )


def write_title_index(
    index: DataFrame,
    index_dir: str,
    index_format: str = "parquet",
    n_buckets: int | None = None,
    folded_generations: list[int] | None = None,
) -> None:
    """Persist a ``build_*_title_index`` output as the production index
    at ``index_dir``, replacing whatever was there (a REBUILD - also
    what compaction calls to fold append generations back in; existing
    ``g*`` generation dirs are removed because the fresh base subsumes
    them only when the caller built it over the union, so the writer
    refuses to guess and clears them).

    ``index_format="parquet"``: plain parquet under ``{index_dir}/base``.
    ``index_format="bucketed"``: an EXTERNAL bucketed table on the
    blocking key (``n_buckets`` defaulting to the session's shuffle
    partitions), the shape under which a delta probe never shuffles
    the index side. ``_index_meta.json`` records the layout for
    :func:`read_title_index`; it lands LAST (write-then-rename), so a
    crash mid-write leaves a directory the reader refuses (no meta,
    base/ present -> error) rather than a silently partial index.

    ``folded_generations`` - the generation ids whose rows live in this
    base (set by :func:`compact_persisted_title_index`; the ingest
    sink's frozen-payroll guard and payroll-delta selection read it).
    None (the default) PRESERVES the existing meta's record - a rebuild
    of a previously-maintained dir must not launder it back into
    looking never-maintained while the ``d{j}`` payroll archives still
    hold rows the base's titles need to re-attach. Pass ``[]``
    explicitly only when the payroll corpus was folded into its base at
    the same time."""
    import json
    import os
    import shutil

    if index_format not in ("parquet", "bucketed"):
        raise ValueError(
            f"index_format must be 'parquet' or 'bucketed', got {index_format!r}"
        )
    key = _index_key_column(index)
    meta: dict = {"format": index_format, "key": key}
    if folded_generations is None:
        folded_generations = title_index_folded_generations(index_dir)
    if folded_generations:
        meta["folded_generations"] = sorted(folded_generations)
    # a rebuild subsumes prior append generations: clear them so the
    # reader cannot union stale pre-rebuild rows onto the fresh base.
    # The old meta is replaced by a TOMBSTONE (not removed): readers
    # refuse it like a crashed write, but a crash mid-rebuild keeps the
    # folded_generations record durable for the recovery rebuild to
    # preserve - losing it would silently shrink the ingest's
    # re-attach corpus (review r12 pass 3).
    if os.path.isdir(index_dir):
        for d in os.listdir(index_dir):
            if re.fullmatch(r"g\d+", d) and os.path.isdir(
                os.path.join(index_dir, d)
            ):
                shutil.rmtree(os.path.join(index_dir, d))
        meta_path = os.path.join(index_dir, _INDEX_META)
        if os.path.exists(meta_path):
            tomb = {"rebuilding": True}
            if folded_generations:
                tomb["folded_generations"] = sorted(folded_generations)
            tmp = meta_path + ".tmp"
            with open(tmp, "w") as f:
                json.dump(tomb, f)
            os.replace(tmp, meta_path)
    base = os.path.join(index_dir, "base")
    spark = index.sparkSession
    tname = _index_table_name(index_dir)
    # BOTH formats drop any stale catalog entry under the deterministic
    # name: rewriting a previously-bucketed dir as plain parquet would
    # otherwise leave a table declaring CLUSTERED BY over unbucketed
    # files - a later catalog-table join would trust false bucketing,
    # skip its exchange, and return wrong rows
    spark.sql(f"DROP TABLE IF EXISTS {tname}")
    if index_format == "parquet":
        index.write.mode("overwrite").parquet(base)
    else:
        if n_buckets is None:
            n_buckets = int(spark.conf.get("spark.sql.shuffle.partitions"))
        (
            index.write.mode("overwrite")
            .bucketBy(n_buckets, key)
            .option("path", base)
            .saveAsTable(tname)
        )
        meta.update({"table": tname, "n_buckets": n_buckets})
    tmp = os.path.join(index_dir, _INDEX_META + ".tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, os.path.join(index_dir, _INDEX_META))


def _resolve_index_table(spark, index_dir: str, meta: dict) -> DataFrame:
    """The bucketed base as a catalog table, re-registering it when
    this session's catalog has never seen it (the default catalog is
    in-memory and session-scoped - session.py - and the weekly probe's
    normal cadence is repeated short-lived runs, so after a restart the
    files are all that survives). Mirrors
    streaming/jobs.py:_resolve_state_table."""
    import os

    tname = meta["table"]
    cache_key = (spark.sparkContext.applicationId, tname)
    if spark.catalog.tableExists(tname) and _VERIFIED_BUCKET_SPECS.get(
        cache_key
    ) != meta["n_buckets"]:
        # a long-lived session's catalog entry can predate a re-bucketed
        # compaction (n_buckets="auto" evolves the count; the compactor
        # is another process, so THIS session's in-memory catalog never
        # saw the DROP). A stale CLUSTERED BY declaration over
        # differently-bucketed files would let a bucketed join elide its
        # exchange on a false premise and silently drop matches - verify
        # the registered bucket count against the meta and re-register
        # on mismatch. The session cache keeps the DESCRIBE off the
        # per-micro-batch hot path: it re-runs only when the META's
        # count moves (the only way the registration can go stale).
        desc = {
            r["col_name"]: r["data_type"]
            for r in spark.sql(f"DESCRIBE TABLE EXTENDED {tname}").collect()
        }
        if int(desc.get("Num Buckets", -1)) != meta["n_buckets"]:
            spark.sql(f"DROP TABLE IF EXISTS {tname}")
    if not spark.catalog.tableExists(tname):
        path = os.path.join(index_dir, "base")
        schema = spark.read.parquet(path).schema
        cols = ", ".join(
            f"`{f.name}` {f.dataType.simpleString()}" for f in schema.fields
        )
        loc = path.replace("'", "''")
        spark.sql(
            f"CREATE TABLE {tname} ({cols}) USING PARQUET "
            f"CLUSTERED BY (`{meta['key']}`) INTO {meta['n_buckets']} BUCKETS "
            f"LOCATION '{loc}'"
        )
    _VERIFIED_BUCKET_SPECS[cache_key] = meta["n_buckets"]
    return spark.table(tname)


def list_index_generations(index_dir: str) -> list[int]:
    """Sorted batch ids of the ``g{batch_id}`` append generations the
    maintenance sink has landed at ``index_dir``. The ingest sinks
    snapshot this BEFORE reading, record it in their per-batch meta,
    and re-read the SAME set on replay - the exactly-once bookkeeping
    that keeps a replayed postings batch from re-probing against
    generations that landed after its original run (which the payroll
    maintenance probe already covered)."""
    import os

    if not os.path.isdir(index_dir):
        return []
    out = []
    for d in os.listdir(index_dir):
        m = re.fullmatch(r"g(\d+)", d)
        if m and os.path.isdir(os.path.join(index_dir, d)):
            out.append(int(m.group(1)))
    return sorted(out)


def title_index_folded_generations(index_dir: str) -> list[int]:
    """Generation ids a past compaction folded into ``index_dir``'s
    base (empty for never-compacted or legacy indexes). The ingest
    sink's frozen-payroll guard needs this: after a compaction the
    live ``g*`` dirs are gone, but the base still carries maintained
    titles whose payroll rows live only in the ``d{j}`` archives - a
    frozen payroll DataFrame would silently drop their matches."""
    import json
    import os

    meta_path = os.path.join(index_dir, _INDEX_META)
    if not os.path.exists(meta_path):
        return []
    with open(meta_path) as f:
        return sorted(json.load(f).get("folded_generations", []))


def read_title_index(
    spark, index_dir: str, generations: list[int] | None = None
) -> DataFrame:
    """The production index at ``index_dir``: the base (plain parquet,
    or the bucketed catalog table - re-registered on demand) unioned
    with ``g{batch_id}`` append generations. Directories with no
    ``_index_meta.json`` read as the legacy layout (plain parquet at
    the root; no generations possible).

    ``generations`` - None reads every generation on disk; an explicit
    list reads exactly those (the sinks' replay hook: a replayed batch
    re-reads the generation set its ORIGINAL run recorded, and the
    maintenance sink reads "everything except my own id" so a replay
    reproduces its original delta instead of seeing its prior output
    and emitting an empty one, which the overwrite would persist as a
    LOST generation)."""
    import json
    import os

    meta_path = os.path.join(index_dir, _INDEX_META)
    if not os.path.exists(meta_path):
        if os.path.isdir(os.path.join(index_dir, "base")):
            raise ValueError(
                f"{index_dir} has a base/ directory but no {_INDEX_META}: "
                "a write_title_index crashed before publishing its meta - "
                "rebuild the index"
            )
        if generations:
            raise ValueError(
                "a legacy (meta-less) index has no append generations"
            )
        return spark.read.parquet(index_dir)
    with open(meta_path) as f:
        meta = json.load(f)
    if meta.get("rebuilding"):
        raise ValueError(
            f"{index_dir} holds a rebuild tombstone: a write_title_index "
            "crashed between clearing the old layout and publishing the "
            "new meta - rebuild the index (the tombstone preserves its "
            "folded_generations record for the rebuild to keep)"
        )
    if meta["format"] == "bucketed":
        out = _resolve_index_table(spark, index_dir, meta)
    else:
        out = spark.read.parquet(os.path.join(index_dir, "base"))
    if generations is None:
        generations = list_index_generations(index_dir)
    for gid in sorted(generations):
        out = out.unionByName(
            spark.read.parquet(os.path.join(index_dir, f"g{gid}"))
        )
    return out


# ---------------------------------------------------------------------------
# index compaction: restore the exact capped bound after append maintenance
# ---------------------------------------------------------------------------
#
# extend_title_index's per-key cap is GENERATION-LOCAL (its docstring):
# N appended generations bound a hot key at N x max_block, not
# max_block, so a year of weekly appends on a hot-key index silently
# regrows toward uncapped occupancy. Compaction closes the loop: cap
# the UNIONED rows once, restoring exactly the fresh-capped-rebuild
# bound. The equality is not approximate - for any key, an element of
# the union's max_block lowest members has fewer than max_block smaller
# members WITHIN its own generation too, so a generation-local cap at
# >= max_block (or an uncapped append) can never have dropped it; the
# union therefore still CONTAINS every row the fresh rebuild would
# keep, and one more cap selects exactly those (property-tested both
# lanes against index_fn(union_of_titles, max_block)).


def _index_order_cols(index: DataFrame) -> tuple[str, list[str]]:
    """(key column, deterministic member-rank columns) for either index
    layout - exactly the builders' _cap_block_occupancy arguments."""
    key = _index_key_column(index)
    return key, (
        ["right_norm", "right_title"] if key == "blk"
        else ["right_key", "right_title"]
    )


def compact_title_index(index: DataFrame, max_block: int) -> DataFrame:
    """Re-cap an appended index at ``max_block``: each blocking key
    keeps its ``max_block`` lowest-ranked members across ALL
    generations - row-identical to ``index_fn(union_of_titles,
    max_block=max_block)``, the fresh capped rebuild, PROVIDED every
    append was uncapped or capped at >= ``max_block`` (a tighter past
    cap may have dropped rows the rebuild would keep; compaction
    cannot resurrect them - it can only narrow). Works on either lane
    (layout inferred from the columns)."""
    key, order_cols = _index_order_cols(index)
    return _cap_block_occupancy(index, key, order_cols, max_block)


def title_index_occupancy(index: DataFrame, max_block: int | None = None) -> dict:
    """One-pass occupancy stats the compaction cadence triggers on:
    ``{"n_rows", "n_keys", "max_per_key", "keys_over_cap"}`` (the last
    None without ``max_block``). One map-side-combined aggregation over
    the index - O(|index|) with group-sized state, cheap enough to run
    after every append. Trigger recipe: compact when ``keys_over_cap``
    > 0 (exactness of the capped bound lost) or when ``max_per_key``
    crosses the probe-latency budget the cap was sized for."""
    key = _index_key_column(index)
    per_key = index.groupBy(key).agg(F.count(F.lit(1)).alias("occ"))
    aggs = [
        F.sum("occ").alias("n_rows"),
        F.count(F.lit(1)).alias("n_keys"),
        F.max("occ").alias("max_per_key"),
    ]
    if max_block is not None:
        aggs.append(
            F.sum((F.col("occ") > max_block).cast("long")).alias("keys_over_cap")
        )
    row = per_key.agg(*aggs).first()
    out = {
        "n_rows": row["n_rows"] or 0,
        "n_keys": row["n_keys"],
        "max_per_key": row["max_per_key"] or 0,
        # `or 0` matters on an EMPTY index: sum() over no rows is NULL,
        # and the documented `keys_over_cap > 0` trigger would TypeError
        # on None instead of reading 0
        "keys_over_cap": (
            (row["keys_over_cap"] or 0) if max_block is not None else None
        ),
    }
    return out


# Default sizing target for suggest_index_buckets. Index rows are
# narrow (blocking key + normalized title + raw title, ~100-200 B on
# disk after encoding), so 2M rows/bucket lands each bucket's file in
# the 128-512 MB scan-task sweet spot - big enough to amortize footer
# and open costs, small enough that one bucket is one comfortable task.
_ROWS_PER_BUCKET_TARGET = 2_000_000


def title_index_bucket_stats(index_dir: str) -> dict:
    """Per-bucket row/byte occupancy of a persisted BUCKETED index -
    the sizing signal :func:`write_title_index` freezes away at first
    write (``n_buckets`` is fixed then; at 100x index growth every
    bucket's file grows 100x and, before this, nothing surfaced it).
    Driver-side metadata only: directory listing for bytes, parquet
    FOOTERS for rows (no Spark job, no data pages read) - cheap enough
    for every compaction-cadence tick, same cost class as
    :func:`title_index_occupancy`.

    Returns ``{"n_buckets", "rows", "bytes", "per_bucket": {bucket_id:
    {"rows", "bytes", "files"}}, "max_bucket_rows", "max_bucket_bytes",
    "generation_rows"}`` - ``generation_rows`` counts the pending
    ``g{j}`` append generations a compaction would fold in, so the
    re-bucket decision sees the POST-fold size, not the stale base.
    Raises on a plain-parquet or legacy layout (no bucket files to
    measure; ``n_buckets`` is not a knob there)."""
    import json
    import os

    import pyarrow.parquet as pq

    meta_path = os.path.join(index_dir, _INDEX_META)
    if not os.path.exists(meta_path):
        raise ValueError(
            f"{index_dir} has no {_INDEX_META} - legacy plain-parquet "
            "indexes have no bucket layout to measure"
        )
    with open(meta_path) as f:
        meta = json.load(f)
    if meta.get("format") != "bucketed":
        raise ValueError(
            f"{index_dir} is format={meta.get('format')!r}; bucket stats "
            "apply only to index_format='bucketed'"
        )
    base = os.path.join(index_dir, "base")
    per_bucket: dict[int, dict] = {}
    for fn in os.listdir(base):
        m = re.fullmatch(r"part-\d+-.+_(\d+)\.c\d+.*\.parquet", fn)
        if not m:
            continue
        path = os.path.join(base, fn)
        b = per_bucket.setdefault(
            int(m.group(1)), {"rows": 0, "bytes": 0, "files": 0}
        )
        b["rows"] += pq.ParquetFile(path).metadata.num_rows
        b["bytes"] += os.path.getsize(path)
        b["files"] += 1
    gen_rows = 0
    for g in list_index_generations(index_dir):
        gdir = os.path.join(index_dir, f"g{g}")
        for fn in os.listdir(gdir):
            if fn.endswith(".parquet") and not fn.startswith("."):
                gen_rows += pq.ParquetFile(
                    os.path.join(gdir, fn)
                ).metadata.num_rows
    return {
        "n_buckets": meta["n_buckets"],
        "rows": sum(b["rows"] for b in per_bucket.values()),
        "bytes": sum(b["bytes"] for b in per_bucket.values()),
        "per_bucket": per_bucket,
        "max_bucket_rows": max(
            (b["rows"] for b in per_bucket.values()), default=0
        ),
        "max_bucket_bytes": max(
            (b["bytes"] for b in per_bucket.values()), default=0
        ),
        "generation_rows": gen_rows,
    }


def suggest_index_buckets(
    index_dir: str,
    target_rows_per_bucket: int = _ROWS_PER_BUCKET_TARGET,
    stats: dict | None = None,
) -> int:
    """The re-bucket recipe: the bucket count that holds the POST-fold
    index (base + pending generations) at or under
    ``target_rows_per_bucket`` rows per bucket, rounded UP to a power
    of two. Power-of-two rounding is the hysteresis: the suggestion
    only moves when the index roughly doubles or halves, so the weekly
    cadence is not re-bucketing (= rewriting every index byte) over
    noise. Callers pass the result as
    ``compact_persisted_title_index(..., n_buckets=...)`` - or just
    ``n_buckets="auto"`` there, which calls this. The cap-aware caveat:
    generation rows count pre-cap, so a ``max_block`` fold may come out
    smaller than sized for - an overshoot in bucket count, never an
    overfull bucket."""
    import math

    s = stats if stats is not None else title_index_bucket_stats(index_dir)
    total = s["rows"] + s["generation_rows"]
    need = max(1, math.ceil(total / max(1, target_rows_per_bucket)))
    return 2 ** math.ceil(math.log2(need))


def compact_persisted_title_index(
    spark,
    index_dir: str,
    max_block: int | None = None,
    n_buckets: int | str | None = None,
    payroll_dir: str | None = None,
    lease_stale_after: float = 3600.0,
) -> None:
    """The production compaction step: fold ``index_dir``'s append
    generations back into its base - re-capped at ``max_block`` when
    given - preserving the persisted format the meta records. For a
    BUCKETED index this also restores the shuffle-free probe shape
    (append generations ride as plain parquet whose union hides the
    bucketing from the planner; after compaction the probe is a single
    bucketed scan again - the generation tax the compaction cadence
    bounds). Single-writer: run from the job that owns the index, not
    concurrently with a maintenance batch - mechanically enforced by
    the shared lifecycle lease at ``index_dir``
    (``lease.lifecycle_lease``: live holder refuses, stale holder
    taken over after ``lease_stale_after``).

    ``n_buckets`` - None keeps the persisted bucket count; an int
    re-buckets the fold (the ONLY place the count can evolve - the
    base is being rewritten anyway, so re-bucketing is free here and
    a full-index rewrite anywhere else); the string ``"auto"`` applies
    :func:`suggest_index_buckets`'s rows-per-bucket recipe to the
    post-fold size. The cadence: check
    :func:`title_index_bucket_stats` alongside
    :func:`title_index_occupancy` each tick, compact with
    ``n_buckets="auto"`` when the suggestion differs from the meta's
    count.

    The fold materializes through a STAGING parquet dir before
    ``write_title_index`` clears the old layout: the compacted plan
    reads the very files the rebuild overwrites, and Spark's lazy scan
    would otherwise read back its own half-overwritten inputs.

    ``payroll_dir`` - pass the maintenance flow's payroll archive dir
    so only COMMITTED generations fold (a ``g{j}`` whose ``d{j}``
    never landed is a torn maintenance batch: folding it would bake
    titles with no payroll rows into the base - and, under a re-cap,
    let torn rows displace committed ones. Torn generations stay on
    disk as live ``g`` dirs, still invisible to the ingest, for the
    maintenance replay to overwrite). Without ``payroll_dir`` every
    live generation folds - only safe when no maintenance run is
    mid-crash, which a standalone (non-maintained) index trivially
    satisfies."""
    import json
    import os
    import shutil

    from nyc_government_hiring_audit_data_platform_spark import lease as LS

    with LS.lifecycle_lease(
        index_dir, "compact_persisted_title_index", lease_stale_after
    ) as _lease:
        # entry-time GC (round-12 VERDICT ask #5): a hard kill between the
        # torn-generation stash renames below and the finally-restore skips
        # the finally, stranding _torn_g{j}.staging dirs (and possibly a
        # _compact_staging) that no reader ever sees and no replay ever
        # reclaims - permanent disk leakage on exactly the crash path
        # compaction exists to survive. Mirror compact_payroll_corpus'
        # entry GC: restore a stash whose g{j} is ABSENT (the rename-away
        # happened, the restore did not - status quo ante, the torn batch
        # stays live for the maintenance replay), remove one whose g{j}
        # the replay already rewrote (a dead duplicate). A stranded
        # _compact_staging is always dead: its content either committed
        # through write_title_index or this run recomputes the fold.
        # Single-writer makes the sweep safe on entry.
        if os.path.isdir(index_dir):
            for d in os.listdir(index_dir):
                m = re.fullmatch(r"_torn_g(\d+)\.staging", d)
                if not m or not os.path.isdir(os.path.join(index_dir, d)):
                    continue
                live = os.path.join(index_dir, f"g{m.group(1)}")
                if os.path.isdir(live):
                    shutil.rmtree(os.path.join(index_dir, d))
                else:
                    os.rename(os.path.join(index_dir, d), live)
            shutil.rmtree(
                os.path.join(index_dir, "_compact_staging"), ignore_errors=True
            )

        meta_path = os.path.join(index_dir, _INDEX_META)
        if not os.path.exists(meta_path):
            raise ValueError(
                f"{index_dir} is a legacy plain-parquet index (no "
                f"{_INDEX_META}); rewrite it with write_title_index first"
            )
        with open(meta_path) as f:
            meta = json.load(f)
        if meta.get("rebuilding"):
            raise ValueError(
                f"{index_dir} holds a rebuild tombstone - rebuild the index "
                "before compacting"
            )
        if n_buckets == "auto":
            # resolved BEFORE any mutation below: a plain-parquet layout
            # has no bucket knob, and its refusal (raised by the stats
            # read) must land with the dir untouched
            n_buckets = suggest_index_buckets(index_dir)
        live = list_index_generations(index_dir)
        if payroll_dir is not None:
            committed = {
                int(m.group(1))
                for d in (
                    os.listdir(payroll_dir) if os.path.isdir(payroll_dir) else []
                )
                if (m := re.fullmatch(r"d(\d+)", d))
                and os.path.isdir(os.path.join(payroll_dir, d))
            }
            fold_gens = [g for g in live if g in committed]
        else:
            fold_gens = live
        torn = sorted(set(live) - set(fold_gens))
        folded = read_title_index(spark, index_dir, generations=fold_gens)
        if max_block is not None:
            folded = compact_title_index(folded, max_block)
        staging = os.path.join(index_dir, "_compact_staging")
        folded.write.mode("overwrite").parquet(staging)
        # the fold materialization is the long action and compactions
        # have no micro-batch cadence to heartbeat on: refresh the
        # staleness clock (and learn of any takeover) BEFORE the
        # destructive rebuild below starts renaming generations away
        _lease.heartbeat()
        # torn generations must SURVIVE the rebuild's g*-clearing for the
        # maintenance replay to overwrite - stash them through the staging
        # area with the fold
        torn_stash = []
        for g in torn:
            src = os.path.join(index_dir, f"g{g}")
            dst = os.path.join(index_dir, f"_torn_g{g}.staging")
            shutil.rmtree(dst, ignore_errors=True)
            os.rename(src, dst)
            torn_stash.append((g, dst))
        # the folded ids stay on record (cumulatively): the base now holds
        # maintained titles whose payroll rows live only in the d{j}
        # archives, and the ingest's frozen-payroll guard must keep firing
        # after the live g* dirs are gone
        all_folded = sorted(set(meta.get("folded_generations", [])) | set(fold_gens))
        try:
            write_title_index(
                spark.read.parquet(staging),
                index_dir,
                index_format=meta["format"],
                n_buckets=n_buckets or meta.get("n_buckets"),
                folded_generations=all_folded,
            )
        finally:
            shutil.rmtree(staging, ignore_errors=True)
            for g, dst in torn_stash:
                os.rename(dst, os.path.join(index_dir, f"g{g}"))
