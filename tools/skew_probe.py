"""Hot-token skew probe for the fuzzy blocking join (VERDICT r8 ask #6).

The claim under test: operators/fuzzy.py used to say hot-token skew in
the token-blocking equi-join ("analyst" in a large share of titles) is
handled by AQE's skew-join split. The reference's own production log
shows exactly this shape - a 612,076-record comparison group for one
blocking key (/root/reference/logs/application.log.1).

Why AQE does NOT intervene here (verified by this probe's timings and
by the plan): OptimizeSkewedJoin triggers on shuffle-partition INPUT
bytes (spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes,
default 256 MB, and 5x the median partition). A hot title token's input
is a few MB of short strings; the quadratic blowup is the join's
OUTPUT, produced inside one task while probing one hash bucket -
invisible to input-size skew detection. The probe prints the hot
token's actual input bytes next to the threshold.

Corpus: synthetic distinct job titles, deterministic from the row id
(no RNG), 2-5 tokens from a 2,000-word vocabulary, with the token
'analyst' prepended to ~30% of titles on BOTH sides; the right side is
every 4th left title perturbed (token reorse / char drop) so the chain
produces real matches. Scales: x1 = 10k left / 2.5k right titles, x10,
x100. The uncapped x100 point is ~22.5e9 hot-pair enumerations in one
task (hours locally) and is deliberately NOT run - the x1 -> x10
uncapped alpha ~2/decade IS the finding; capped runs cover all scales.

Measured per point (warm lap + timed lap, noop count sink):
- uncapped chain (lossless length prefilter on, as shipped)
- uncapped chain with the length prefilter DISABLED (join on token
  only) at x1/x10, to price the prefilter's candidate reduction
- SALTED chain (salt_buckets=32, lossless): hot-token left rows
  hash-salted across 32 buckets, right rows replicated - the
  quadratic enumeration parallelized instead of bounded; output
  identical to uncapped (the x100 uncapped point that is NOT RUN
  serially becomes a measured salted point)
- capped chain (max_block=200): bounded per-token candidates
- capped-subset + healthy-key-equality verification at x1

Usage: python tools/skew_probe.py [--skip-x100] [--cap 200]
       python tools/skew_probe.py --forced-shuffle [--scale 10]
Prints a markdown table to append to SCALING.md (curated by hand).

``--forced-shuffle`` reproduces the SCALING.md r9 one-task-case table:
autoBroadcastJoinThreshold=-1 (the both-sides-big 100 TB shape), x10
corpus, salted x32 lap (warm+timed) then ONE cold uncapped lap - the
uncapped lap ran 419 s on the r9 box (vs 52.9 s salted), so expect
minutes.
"""

from __future__ import annotations

import argparse
import math
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from nyc_government_hiring_audit_data_platform_spark.session import get_spark  # noqa: E402
from nyc_government_hiring_audit_data_platform_spark.operators import fuzzy as FZ  # noqa: E402

HOT = "analyst"
HOT_SHARE = 0.3  # fraction of titles carrying the hot token
VOCAB = 2000
BASE_LEFT = 10_000


def build_titles(spark, n_left: int):
    """Deterministic skewed title corpora (left, right) as DataFrames
    with one column ``title``. ~30% of ids get the hot token; the rest
    of each title is 1-4 vocab words hash-derived from the id. The
    vocabulary scales with the corpus (n/5) so ORDINARY tokens keep a
    flat ~O(10) occupancy at every scale - the one hot token is the
    only skewed key, isolating its cost in the alpha."""
    vocab = max(VOCAB, n_left // 5)
    ids = spark.range(n_left).withColumnRenamed("id", "i")
    w = [F.pmod(F.hash(F.col("i") + F.lit(s)), F.lit(vocab)) for s in
         (11, 222, 3333, 44444)]
    ntok = (F.col("i") % 4) + 1  # 1-4 vocab words
    words = F.slice(
        F.array(*[F.concat(F.lit("w"), c.cast("string")) for c in w]), 1, ntok
    )
    body = F.concat_ws(" ", words)
    title = F.when(
        (F.col("i") % 10) < int(HOT_SHARE * 10), F.concat(F.lit(HOT + " "), body)
    ).otherwise(body)
    left = ids.select(title.alias("title")).distinct()
    # right: every 4th id, perturbed - reverse tokens or drop last char
    r2 = ids.filter(F.col("i") % 4 == 0).select(title.alias("t0"))
    rtitle = F.when(
        F.length("t0") % 2 == 0,
        F.concat_ws(" ", F.reverse(F.split(F.col("t0"), " "))),
    ).otherwise(F.expr("substring(t0, 1, length(t0) - 1)"))
    right = r2.select(rtitle.alias("title")).distinct()
    return left, right


def timed(fn):
    fn()  # warm lap
    t0 = time.time()
    n = fn()
    return time.time() - t0, n


def chain(left, right, cap=None, length_filter=True, salt=None):
    if length_filter:
        pairs = FZ.fuzzy_title_pairs_tokensort(
            left, right, "title", "title", 1, 85, cap,
            # 256: the hot token (right occupancy 481 at x1) salts at
            # EVERY scale; ordinary tokens (~O(10)) never do
            salt_buckets=salt, hot_occupancy=256,
        )
    else:
        # re-derive the pre-r9 shape: token equi-join with NO length
        # residual, same downstream stages (for pricing the prefilter)
        from nyc_government_hiring_audit_data_platform_spark.functions.similarity import (
            levenshtein_similarity,
        )
        lt = (left.select(F.col("title").alias("left_title")).where(F.col("title").isNotNull())
              .distinct().withColumn("left_key", FZ.token_sort_key(F.col("left_title"))))
        rt = (right.select(F.col("title").alias("right_title")).where(F.col("title").isNotNull())
              .distinct().withColumn("right_key", FZ.token_sort_key(F.col("right_title"))))
        le = lt.select("left_title", "left_key",
                       F.explode(F.array_distinct(F.split("left_key", " "))).alias("tok"))
        re_ = rt.select("right_title", "right_key",
                        F.explode(F.array_distinct(F.split("right_key", " "))).alias("tok"))
        sim = levenshtein_similarity(F.col("left_key"), F.col("right_key"))
        pairs = (le.join(re_, "tok")
                 .groupBy("left_title", "left_key", "right_title", "right_key")
                 .agg(F.count(F.lit(1)).alias("n_shared"))
                 .filter(F.col("n_shared") >= 1)
                 .filter(sim >= 85)
                 .select("left_title", "right_title", F.round(sim).cast("int").alias("score")))
    return pairs.count()


def forced_shuffle_lap(spark, scale: int) -> None:
    """The shuffle-join one-task case (SCALING.md r9 finding 4)."""
    left, right = build_titles(spark, BASE_LEFT * scale)
    left = left.persist(); right = right.persist()
    left.count(); right.count()
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    t, n = timed(lambda: chain(left, right, None, salt=32))
    print(f"forced-shuffle salted x32 (x{scale}): {t:.2f}s pairs={n}", flush=True)
    t0 = time.time()
    n = chain(left, right, None)
    print(f"forced-shuffle uncapped single cold lap (x{scale}): "
          f"{time.time() - t0:.2f}s pairs={n}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-x100", action="store_true")
    ap.add_argument("--cap", type=int, default=200)
    ap.add_argument("--forced-shuffle", action="store_true")
    ap.add_argument("--scale", type=int, default=10)
    args = ap.parse_args()

    spark = get_spark("skew-probe")
    if args.forced_shuffle:
        forced_shuffle_lap(spark, args.scale)
        spark.stop()
        return
    scales = [("x1", BASE_LEFT), ("x10", BASE_LEFT * 10)]
    if not args.skip_x100:
        scales.append(("x100", BASE_LEFT * 100))

    print("\n### r9 skew probe: hot-token blocking join "
          f"(hot token '{HOT}' in ~{int(HOT_SHARE*100)}% of titles both sides, "
          f"cap={args.cap})\n")
    thr = spark.conf.get("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes")
    print(f"AQE skewJoin threshold: {thr} input bytes per shuffle partition; "
          "skew detection is INPUT-based.\n")
    print("| scale | left/right titles | hot block L x R | hot input (MB) | "
          "uncapped no-lenfilter (s) | uncapped (s) | salted x32 lossless (s) "
          "| capped (s) | pairs out |")
    print("|---|---|---|---|---|---|---|---|---|")

    rows = {}
    for name, n_left in scales:
        left, right = build_titles(spark, n_left)
        left = left.persist(); right = right.persist()
        nl, nr = left.count(), right.count()
        hot_l = left.filter(F.col("title").startswith(HOT)).count()
        hot_r = right.filter(F.col("title").contains(HOT)).count()
        hot_bytes = (left.filter(F.col("title").startswith(HOT))
                     .agg(F.sum(F.length("title"))).collect()[0][0] or 0)
        infeasible = name == "x100"
        t_nolen = n_nolen = None
        t_unc = n_unc = None
        if not infeasible:
            t_nolen, n_nolen = timed(lambda: chain(left, right, None, length_filter=False))
            t_unc, n_unc = timed(lambda: chain(left, right, None))
        t_salt, n_salt = timed(lambda: chain(left, right, None, salt=32))
        t_cap, n_cap = timed(lambda: chain(left, right, args.cap))
        rows[name] = (t_unc, t_cap, t_salt)
        print(f"| {name} | {nl}/{nr} | {hot_l} x {hot_r} "
              f"| {hot_bytes/1e6:.2f} "
              f"| {'-' if t_nolen is None else f'{t_nolen:.2f}'} "
              f"| {'NOT RUN (est. hours: one ~%.1fe9-pair task)' % (hot_l*hot_r/1e9) if infeasible else f'{t_unc:.2f}'} "
              f"| {t_salt:.2f} "
              f"| {t_cap:.2f} | {n_cap} (capped)"
              f"{'' if n_unc is None else f' / {n_unc} (uncapped)'}"
              f" / {n_salt} (salted) |")
        left.unpersist(); right.unpersist()

    if "x1" in rows and "x10" in rows and rows["x1"][0]:
        a_unc = math.log(rows["x10"][0] / rows["x1"][0]) / math.log(10)
        a_cap = math.log(rows["x10"][1] / rows["x1"][1]) / math.log(10)
        a_salt = math.log(rows["x10"][2] / rows["x1"][2]) / math.log(10)
        extra = ""
        if "x100" in rows:
            a_cap2 = math.log(rows["x100"][1] / rows["x10"][1]) / math.log(10)
            a_salt2 = math.log(rows["x100"][2] / rows["x10"][2]) / math.log(10)
            extra = (f", capped x10->x100 alpha {a_cap2:.2f}"
                     f", salted x10->x100 alpha {a_salt2:.2f}")
        print(f"\nalpha/decade x1->x10: uncapped {a_unc:.2f}, "
              f"capped {a_cap:.2f}, salted {a_salt:.2f}{extra}")

    # ---- correctness of the cap's contract, at x1 ----
    left, right = build_titles(spark, BASE_LEFT)
    unc = FZ.fuzzy_title_pairs_tokensort(left, right, "title", "title", 1, 85, None)
    cap = FZ.fuzzy_title_pairs_tokensort(left, right, "title", "title", 1, 85, args.cap)
    n_unc, n_cap, n_extra = unc.count(), cap.count(), cap.exceptAll(unc).count()
    print(f"\ncap contract at x1: capped {n_cap} <= uncapped {n_unc}, "
          f"capped-minus-uncapped rows = {n_extra} (must be 0)")
    spark.stop()


if __name__ == "__main__":
    main()
