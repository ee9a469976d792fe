"""Bloom-filter membership gate: "seen in ANY previous crawl?" at fixed
memory.

The one dedup question the band index (operators/dedup.py) answers at
linear index size that a 100 TB recrawl pipeline wants answered at
CONSTANT size first: most recrawled pages are exact re-fetches, so a
fixed-size filter over the previous crawls' content fingerprints
rejects the bulk of a new batch before the (larger, disk-backed) band
index is ever probed. Bloom semantics give the safe direction for
dedup: NO false negatives - a miss proves the key was never seen, so
dropping non-members from the probe set can never change the survivor
set - and false positives only cost a redundant index probe, bounded by
the standard rate (1 - e^(-K*n/M))^K (Bloom 1970).

Determinism contract (matches the repo's CMS/minhash convention): K bit
positions per key come from the shared md5 base hash permuted by the
first K minhash coefficient pairs - no impl-specific hashing (Spark's
built-in ``bloom_filter_agg`` hashes with xxhash64 internals that
DuckDB cannot replay), so a DuckDB oracle recomputes the IDENTICAL
filter and the driver can hash-check exact per-key outcomes, not just
the bound.

Representation: M bits packed into M/32 BIGINT words (32-bit words keep
every mask positive and well inside BIGINT on both engines; 1<<63 is a
signed-overflow hazard in DuckDB). The filter is ONE row holding an
array<long> - build is a map-side-partial ``distinct`` on bit positions
(per-partition state <= M entries by construction, shuffle <= M rows per
partition), the word fold is <= M rows into M/32, and the probe side
cross-joins the broadcast single row and tests K bits per key with pure
array arithmetic: zero shuffles added to the probe plan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from nyc_government_hiring_audit_data_platform_spark.operators.dedup import (
    MH_COEF,
    MH_P,
    base_hash,
    base_hash_sql,
)

BLOOM_M = 65536         # filter bits (8 KB packed: n=2500 keys at K=4
                        # gives FP ~4e-4 by (1 - e^(-K*n/M))^K; resize M
                        # with the corpus - the plan shape is M-invariant)
BLOOM_WORD = 32         # bits per packed word (positive-mask safe)
BLOOM_WORDS = BLOOM_M // BLOOM_WORD
BLOOM_K = 4             # hash functions (first K minhash pairs)


def bloom_bit_exprs(h_expr: str = "h") -> list[str]:
    """The K bit-position expressions over a 31-bit base hash - shared
    TEXT between the Spark plan and the DuckDB oracle so the two engines
    can never disagree on a bit."""
    return [
        f"(({a} * {h_expr} + {b}) % {MH_P}) % {BLOOM_M}"
        for a, b in MH_COEF[:BLOOM_K]
    ]


def bloom_bits(h: Column) -> Column:
    """array<long> of the K bit positions for one key's base hash."""
    return F.array(
        *[(F.lit(a) * h + F.lit(b)) % MH_P % BLOOM_M for a, b in MH_COEF[:BLOOM_K]]
    )


def bloom_build(keys: DataFrame, key_col: str) -> DataFrame:
    """ONE-row DataFrame ``(fb: array<long>)`` - the packed filter over
    every distinct key in ``keys[key_col]`` (string).

    Plan shape: md5-hash each key map-side, explode to K bit rows,
    ``distinct`` (hash-aggregate partials are bounded by the M possible
    values, so per-partition state and shuffle volume are both
    fixed-size regardless of input rows), OR into M/32 words, then fold
    the <=M/32-row word relation into one dense array via a map lookup
    over ``sequence(0, M/32 - 1)`` - absent words become 0."""
    bits = (
        keys.select(base_hash(F.col(key_col).cast("string")).alias("h"))
        # NULL keys hash to NULL and insert nothing — the SQL twin's
        # word-range LEFT JOIN drops the NULL bit group implicitly; the
        # Spark fold must drop it EXPLICITLY or map_from_entries raises
        # on the NULL map key
        .filter(F.col("h").isNotNull())
        .select(F.explode(bloom_bits(F.col("h"))).alias("bit"))
        .distinct()
    )
    words = bits.groupBy(
        (F.col("bit") / BLOOM_WORD).cast("int").alias("w")
    ).agg(
        F.expr(
            f"bit_or(shiftleft(CAST(1 AS BIGINT), "
            f"CAST(bit % {BLOOM_WORD} AS INT)))"
        ).alias("m")
    )
    return words.agg(
        F.map_from_entries(F.collect_list(F.struct("w", "m"))).alias("wm")
    ).select(
        F.expr(
            f"transform(sequence(0, {BLOOM_WORDS - 1}), "
            f"w -> coalesce(element_at(wm, w), CAST(0 AS BIGINT)))"
        ).alias("fb")
    )


def bloom_hit_expr(bits_col: str = "bits", fb_col: str = "fb") -> str:
    """SQL boolean: every one of the key's K bits is set in the packed
    filter. Pure array arithmetic over the broadcast row - map-only."""
    return (
        f"forall({bits_col}, b -> "
        f"(element_at({fb_col}, CAST(b DIV {BLOOM_WORD} AS INT) + 1) & "
        f"shiftleft(CAST(1 AS BIGINT), CAST(b % {BLOOM_WORD} AS INT))) <> 0)"
    )


def bloom_probe(df: DataFrame, key_col: str, filt: DataFrame) -> DataFrame:
    """``df`` + boolean ``bloom_hit``: False PROVES the key was never
    inserted (zero false negatives); True means inserted-or-collision.

    A NULL key hashes to NULL bits; without care ``bloom_hit`` would be
    NULL, not False, and a consumer filtering ``~bloom_hit`` would
    silently DROP NULL-key rows instead of keeping them as provable
    non-members (ADVICE r6). NULL keys never set bits at build time
    (their exploded bit rows vanish), so coalescing the hit to False is
    exactly the zero-false-negative contract, for every key."""
    hashed = df.withColumn(
        "__bits", bloom_bits(base_hash(F.col(key_col).cast("string")))
    )
    return (
        hashed.crossJoin(F.broadcast(filt))
        .withColumn(
            "bloom_hit",
            F.coalesce(F.expr(bloom_hit_expr("__bits", "fb")), F.lit(False)),
        )
        .drop("__bits", "fb")
    )


# -- DuckDB oracle twins ----------------------------------------------------


def bloom_build_sql(keys_sql: str, key_expr: str) -> str:
    """DuckDB CTE body producing the identical one-row packed filter
    (``fb``) from ``SELECT {key_expr} FROM ({keys_sql})``."""
    bit_union = " UNION ALL ".join(
        f"SELECT {e} AS bit FROM hashed_keys" for e in bloom_bit_exprs("h")
    )
    return f"""
      hashed_keys AS (
        SELECT {base_hash_sql(key_expr)} AS h FROM ({keys_sql})
      ),
      bloom_bits_ AS (SELECT DISTINCT bit FROM ({bit_union})),
      bloom_words AS (
        SELECT CAST(bit // {BLOOM_WORD} AS INT) AS w,
               bit_or(CAST(1 AS BIGINT) << CAST(bit % {BLOOM_WORD} AS INT)) AS m
        FROM bloom_bits_ GROUP BY 1
      ),
      bloom_filt AS (
        SELECT list(COALESCE(m, CAST(0 AS BIGINT)) ORDER BY gw.w) AS fb
        FROM (SELECT unnest(range(0, {BLOOM_WORDS})) AS w) gw
        LEFT JOIN bloom_words USING (w)
      )
    """


def bloom_hit_sql(h_expr: str, fb_expr: str = "fb") -> str:
    """DuckDB boolean twin of :func:`bloom_hit_expr` over a base hash;
    NULL-coalesced to FALSE like :func:`bloom_probe` (NULL keys are
    provable non-members - they never set bits at build time)."""
    checks = " AND ".join(
        f"(({fb_expr}[CAST(({e}) // {BLOOM_WORD} AS INT) + 1] & "
        f"(CAST(1 AS BIGINT) << CAST(({e}) % {BLOOM_WORD} AS INT))) <> 0)"
        for e in bloom_bit_exprs(h_expr)
    )
    return f"COALESCE({checks}, FALSE)"
