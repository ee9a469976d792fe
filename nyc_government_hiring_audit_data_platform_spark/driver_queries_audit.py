"""Audit / data-forensics queries.

Round-4 continuation suite, part 2: the semantics an auditor of the
reference's payroll-style data would reach for - null-safe linkage
(SQL's only sane NULL-key join), semi-structured extraction through
Spark 4's VARIANT type, marketing-style last-touch attribution of
conversion events, and a Benford first-digit screen (the classic
forensic-accounting test for fabricated monetary values).

Scale posture: null_safe_join is a hash equi-join (EqualNullSafe is a
valid hash key - no nested loop); variant_json_extract is map-only;
attribution is one user-partitioned window pass; the Benford screen is
a groupBy over a 9-value digit domain with map-side combine plus a
broadcast one-row total.

Determinism: digit extraction goes through exact integer-cents
string-prefix (never float log10, whose libm rounding can differ across
engines at powers of ten); Benford expectations are Python-computed
literals injected identically into BOTH engines; the one negative-
capable rounded output uses the norm_round negative-zero convention.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nyc_government_hiring_audit_data_platform_spark.driver_queries import query, table
from nyc_government_hiring_audit_data_platform_spark.functions.dates import (
    epoch_seconds_sql,
)
from nyc_government_hiring_audit_data_platform_spark.functions.numeric import (
    norm_round,
    norm_round_sql,
)
from nyc_government_hiring_audit_data_platform_spark.operators import sequence as SEQ

# ---------------------------------------------------------------------------
# null-safe join (NULL keys match each other exactly once per pair)
# ---------------------------------------------------------------------------


@query(
    "null_safe_join",
    """
    WITH a AS (
      SELECT c_custkey, NULLIF(c_nationkey % 5, 3) AS grp FROM customer
    ),
    b AS (
      SELECT s_suppkey, NULLIF(s_nationkey % 5, 3) AS grp FROM supplier
    )
    SELECT a.grp,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(COUNT(DISTINCT a.c_custkey) AS BIGINT) AS n_customers,
           CAST(COUNT(DISTINCT b.s_suppkey) AS BIGINT) AS n_suppliers
    FROM a JOIN b ON a.grp IS NOT DISTINCT FROM b.grp
    GROUP BY a.grp
    """,
)
def q_null_safe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join: plain ``=`` silently drops NULL keys,
    while ``<=>`` (IS NOT DISTINCT FROM) matches NULL to NULL - the
    semantics record-linkage needs when a blocking key is legitimately
    absent on both sides. EqualNullSafe is a valid HASH join key in
    Spark (it compiles to the same shuffled/broadcast hash join as
    ``=``, no nested loop), which the plan gate pins."""
    cust = table(spark, sf_dir, "customer").select(
        "c_custkey", F.expr("NULLIF(c_nationkey % 5, 3)").alias("grp")
    )
    supp = table(spark, sf_dir, "supplier").select(
        "s_suppkey", F.expr("NULLIF(s_nationkey % 5, 3)").alias("grp")
    )
    joined = cust.alias("a").join(
        supp.alias("b"), F.col("a.grp").eqNullSafe(F.col("b.grp"))
    )
    return joined.groupBy(F.col("a.grp").alias("grp")).agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.countDistinct("a.c_custkey").alias("n_customers"),
        F.countDistinct("b.s_suppkey").alias("n_suppliers"),
    )


# ---------------------------------------------------------------------------
# VARIANT semi-structured extraction (Spark 4 open-format type)
# ---------------------------------------------------------------------------


@query(
    "variant_json_extract",
    """
    WITH j AS (
      SELECT event_id,
             json_object('t', event_type,
                         'm', json_object(
                           'k', CAST(json_extract_string(props, '$.k') AS INT),
                           'u', user_id)) AS doc
      FROM events
    )
    SELECT event_id,
           json_extract_string(doc, '$.t') AS t,
           CAST(json_extract(doc, '$.m.k') AS INT) AS k,
           CAST(json_extract(doc, '$.m.u') AS BIGINT) AS u
    FROM j
    WHERE CAST(json_extract(doc, '$.m.k') AS INT) > 80
    """,
)
def q_variant_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed path extraction through Spark 4's VARIANT: build a nested
    JSON document per event, ``parse_json`` it into a VARIANT, and pull
    typed leaves back out with ``variant_get`` path expressions - the
    open-format semi-structured flow (VARIANT is the binary JSON type
    Spark/Delta/Iceberg standardized; DuckDB's JSON type is the oracle
    twin). Values are strings/integers end-to-end, so the text
    round-trip is exact; the predicate on the extracted leaf stays a
    map-side filter (no shuffle anywhere in the plan)."""
    ev = table(spark, sf_dir, "events")
    doc = F.to_json(
        F.struct(
            F.col("event_type").alias("t"),
            F.struct(
                F.get_json_object("props", "$.k").cast("int").alias("k"),
                F.col("user_id").alias("u"),
            ).alias("m"),
        )
    )
    v = ev.select("event_id", F.parse_json(doc).alias("v"))
    return v.select(
        "event_id",
        F.expr("variant_get(v, '$.t', 'string')").alias("t"),
        F.expr("variant_get(v, '$.m.k', 'int')").alias("k"),
        F.expr("variant_get(v, '$.m.u', 'bigint')").alias("u"),
    ).filter("k > 80")


# ---------------------------------------------------------------------------
# last-touch conversion attribution
# ---------------------------------------------------------------------------

_TOUCHES = ("click", "view", "signup")
_TOUCH_IN = ", ".join(f"'{t}'" for t in _TOUCHES)
_SEC = epoch_seconds_sql()


@query(
    "attribution_last_touch",
    f"""
    WITH s AS (
      SELECT event_id, user_id, event_type, ts, {_SEC} AS sec FROM events
    ),
    t AS (
      SELECT event_id, user_id, event_type, sec,
             LAST_VALUE(CASE WHEN event_type IN ({_TOUCH_IN})
                             THEN event_type END IGNORE NULLS) OVER w
               AS touch_type,
             LAST_VALUE(CASE WHEN event_type IN ({_TOUCH_IN})
                             THEN sec END IGNORE NULLS) OVER w AS touch_sec
      FROM s
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    )
    SELECT event_id, user_id, touch_type,
           CAST(sec - touch_sec AS BIGINT) AS sec_since_touch
    FROM t WHERE event_type = 'purchase'
    """,
)
def q_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: for every purchase, the most recent
    STRICTLY-preceding touch event (click/view/signup) in the same
    user's history, plus the conversion lag in seconds. Two
    ignore-nulls ``last`` windows over the same frame and the same
    NULL-condition necessarily read the same row, so (touch_type,
    touch_sec) stay consistent without a struct payload. Purchases with
    no prior touch surface as NULLs (organic conversions) rather than
    dropping. One user-partitioned window pass - the 1-PRECEDING frame
    bound makes 'strictly before' explicit instead of relying on a
    self-exclusion filter."""
    ev = table(spark, sf_dir, "events")
    s = ev.select(
        "event_id",
        "user_id",
        "event_type",
        "ts",
        F.expr("unix_seconds(ts)").alias("sec"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    is_touch = F.col("event_type").isin(*_TOUCHES)
    t = s.select(
        "event_id",
        "user_id",
        "event_type",
        "sec",
        F.last(F.when(is_touch, F.col("event_type")), ignorenulls=True)
        .over(w)
        .alias("touch_type"),
        F.last(F.when(is_touch, F.col("sec")), ignorenulls=True)
        .over(w)
        .alias("touch_sec"),
    )
    return t.filter("event_type = 'purchase'").select(
        "event_id",
        "user_id",
        "touch_type",
        (F.col("sec") - F.col("touch_sec")).alias("sec_since_touch"),
    )


# ---------------------------------------------------------------------------
# referential-integrity audit (FK orphan screen)
# ---------------------------------------------------------------------------

_FK_CHECKS = (
    ("lineitem->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem->part", "lineitem", "l_partkey", "part", "p_partkey"),
    ("orders->customer", "orders", "o_custkey", "customer", "c_custkey"),
)


def _fk_check_sql(label, child, ck, parent, pk) -> str:
    return f"""
    SELECT '{label}' AS fk,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN p.{pk} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_orphans,
           SUM(CASE WHEN p.{pk} IS NULL THEN 1 ELSE 0 END) = 0 AS ok
    FROM {child} c LEFT JOIN (SELECT DISTINCT {pk} FROM {parent}) p
      ON c.{ck} = p.{pk}"""


@query(
    "referential_integrity_audit",
    "\nUNION ALL\n".join(_fk_check_sql(*chk) for chk in _FK_CHECKS),
)
def q_referential_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity screen over the star schema's three FK
    edges: per relationship, total child rows, orphan count (child keys
    with no parent), and a pass flag - the structural check an audit
    platform runs before trusting any join-based metric downstream.
    Each check is one left join against the DISTINCT parent keys
    (broadcast when small, shuffled-hash otherwise; AQE decides)
    reduced to a single row - never a row-level orphan dump, so the
    audit costs one aggregate per edge at any scale."""
    parts = []
    for label, child, ck, parent, pk in _FK_CHECKS:
        c = table(spark, sf_dir, child).select(F.col(ck).alias("ck"))
        p = table(spark, sf_dir, parent).select(F.col(pk).alias("pk")).distinct()
        j = c.join(p, c["ck"] == p["pk"], "left")
        parts.append(
            j.agg(
                F.lit(label).alias("fk"),
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(F.when(F.col("pk").isNull(), 1).otherwise(0))
                .cast("bigint")
                .alias("n_orphans"),
                (
                    F.sum(F.when(F.col("pk").isNull(), 1).otherwise(0)) == 0
                ).alias("ok"),
            )
        )
    out = parts[0]
    for p_ in parts[1:]:
        out = out.unionByName(p_)
    return out


# ---------------------------------------------------------------------------
# k-anonymity suppression (privacy screen over quasi-identifiers)
# ---------------------------------------------------------------------------

_K_ANON = 5


@query(
    "k_anonymity_suppress",
    f"""
    WITH q AS (
      SELECT c_custkey, c_nationkey AS nat,
             CAST(FLOOR(c_acctbal / 1000.0) AS BIGINT) AS bal_band
      FROM customer
    ),
    g AS (
      SELECT c_custkey, nat, bal_band,
             COUNT(*) OVER (PARTITION BY nat, bal_band) AS grp_n
      FROM q
    )
    SELECT c_custkey,
           CASE WHEN grp_n >= {_K_ANON} THEN nat END AS nat,
           CASE WHEN grp_n >= {_K_ANON} THEN bal_band END AS bal_band,
           CAST(grp_n AS BIGINT) AS grp_n,
           grp_n < {_K_ANON} AS suppressed
    FROM g
    """,
)
def q_k_anonymity_suppress(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity screen: customers whose quasi-identifier combination
    (nation, account-balance band) occurs in a group of fewer than k=5
    records TOTAL (i.e. the record is indistinguishable from fewer than
    k-1 others - the standard definition) get those fields SUPPRESSED
    (nulled) before the table leaves the boundary - the
    release-readiness check a privacy reviewer runs on an audit
    extract. One count-over-partition window keyed by the
    quasi-identifier (equivalently a groupBy+join-back; the window form
    is one shuffle); the band uses FLOOR of a single double division so
    negative balances band identically on both engines."""
    cust = table(spark, sf_dir, "customer")
    q = cust.select(
        "c_custkey",
        F.col("c_nationkey").alias("nat"),
        F.expr("CAST(FLOOR(c_acctbal / 1000.0) AS BIGINT)").alias("bal_band"),
    )
    w = Window.partitionBy("nat", "bal_band")
    g = q.withColumn("grp_n", F.count(F.lit(1)).over(w))
    keep = F.col("grp_n") >= _K_ANON
    return g.select(
        "c_custkey",
        F.when(keep, F.col("nat")).alias("nat"),
        F.when(keep, F.col("bal_band")).alias("bal_band"),
        F.col("grp_n").cast("bigint").alias("grp_n"),
        (F.col("grp_n") < _K_ANON).alias("suppressed"),
    )


# ---------------------------------------------------------------------------
# weighted median (quantity-weighted discrete median price)
# ---------------------------------------------------------------------------


@query(
    "weighted_median",
    """
    WITH h AS (
      SELECT l_returnflag AS flag,
             CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS cents,
             SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS w
      FROM lineitem GROUP BY flag, cents
    ),
    c AS (
      SELECT flag, cents,
             SUM(w) OVER (PARTITION BY flag ORDER BY cents
                          ROWS UNBOUNDED PRECEDING) AS cum,
             SUM(w) OVER (PARTITION BY flag) AS tot
      FROM h
    )
    SELECT flag,
           ROUND(MIN(CASE WHEN 2 * cum >= tot THEN cents END) / 100.0, 2)
             AS weighted_median,
           CAST(MAX(tot) AS BIGINT) AS total_weight
    FROM c GROUP BY flag
    """,
)
def q_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted DISCRETE median price per return flag: the
    smallest price whose cumulative weight reaches half the total
    (integer comparison ``2*cum >= tot`` - no float quantile). The
    engine never sorts raw rows: prices collapse to an integer-cents
    histogram first (domain-bounded at any corpus size), and the
    cumulative weights use the shard-prefix decomposition (windows
    partitioned by (flag, cents-range shard) + tiny per-shard offsets)
    rather than one window per flag over the whole histogram - the
    same distributed-rank machinery as quantile_bucketize. The oracle
    states the naive single-window form, which is exactly what the
    engine plan must NOT be."""
    li = table(spark, sf_dir, "lineitem")
    h = li.groupBy(
        F.col("l_returnflag").alias("flag"),
        F.expr("CAST(ROUND(l_extendedprice * 100) AS BIGINT)").alias("cents"),
    ).agg(F.sum(F.expr("CAST(ROUND(l_quantity) AS BIGINT)")).alias("w"))
    c = SEQ.sharded_rank(
        h,
        value="cents",
        shard_expr="cents div 1000000",
        keys=["flag"],
        weight="w",
        with_total=True,
    )
    return c.groupBy("flag").agg(
        F.round(
            F.min(F.when(2 * F.col("pos") >= F.col("total"), F.col("cents")))
            / 100.0,
            2,
        ).alias("weighted_median"),
        F.max("total").cast("bigint").alias("total_weight"),
    )


# ---------------------------------------------------------------------------
# Benford first-digit forensic screen
# ---------------------------------------------------------------------------

# Python-computed literals injected identically into BOTH engines (never
# per-engine log10 - libm rounding differs). repr() round-trips exactly.
_BENFORD = {d: math.log10(1 + 1 / d) * 100 for d in range(1, 10)}
_BENFORD_CASE = " ".join(
    f"WHEN {d} THEN {_BENFORD[d]!r}" for d in range(1, 10)
)


@query(
    "benford_digit_audit",
    f"""
    WITH d AS (
      SELECT CAST(substr(CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT)
                              AS VARCHAR), 1, 1) AS INT) AS digit
      FROM orders
    ),
    c AS (
      SELECT digit, COUNT(*) AS n FROM d GROUP BY digit
    ),
    tot AS (SELECT SUM(n) AS total FROM c)
    SELECT digit,
           CAST(n AS BIGINT) AS n,
           ROUND(n * 100.0 / total, 4) AS pct,
           CAST(CASE digit {_BENFORD_CASE} END AS DOUBLE) AS expected_pct,
           {norm_round_sql(f"n * 100.0 / total - (CASE digit {_BENFORD_CASE} END)", 4)}
             AS deviation
    FROM c CROSS JOIN tot
    """,
)
def q_benford_digit_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit screen over order totals - the
    forensic-accounting test an audit platform runs for fabricated
    monetary values. The leading digit comes from the exact
    integer-cents STRING prefix (integer-to-text is locale-free and
    identical across engines), never float log10/pow, whose libm
    rounding at powers of ten can flip a digit per engine. Counts
    groupBy a 9-value domain (map-side combine collapses the shuffle);
    the expected distribution is a shared literal table; deviation is
    negative-capable so it carries the norm_round -0.0 convention."""
    o = table(spark, sf_dir, "orders")
    d = o.select(
        F.expr(
            "CAST(substr(CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT) "
            "AS STRING), 1, 1) AS INT)"
        ).alias("digit")
    )
    c = d.groupBy("digit").agg(F.count(F.lit(1)).alias("n"))
    tot = c.agg(F.sum("n").alias("total"))
    # CAST to DOUBLE on BOTH engines: bare numeric literals in projected
    # output parse as DECIMAL with engine-specific precision/scale (DuckDB
    # DECIMAL(17,15) vs Spark's CASE-unified decimal), hashing apart even
    # when every value is identical (CORRECTNESS_r04 red).
    expected = F.expr(f"CAST(CASE digit {_BENFORD_CASE} END AS DOUBLE)")
    return c.crossJoin(F.broadcast(tot)).select(
        "digit",
        F.col("n").cast("bigint").alias("n"),
        F.round(F.col("n") * 100.0 / F.col("total"), 4).alias("pct"),
        expected.alias("expected_pct"),
        norm_round(F.col("n") * 100.0 / F.col("total") - expected, 4).alias(
            "deviation"
        ),
    )
