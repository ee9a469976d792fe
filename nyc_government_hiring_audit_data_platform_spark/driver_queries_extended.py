"""Extended relational coverage: multi-way joins, grouping sets,
filtered/conditional aggregation, percentiles, string/array/map function
suites, skew-salted joins, approximate aggregates.

These go beyond the reference's own operator set (SURVEY.md §2 notes)
to the surface a 100 TB engine is expected to have; all but the
approximate aggregates are exact-oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from nyc_government_hiring_audit_data_platform_spark.functions.numeric import (
    norm_round,
)

from nyc_government_hiring_audit_data_platform_spark.driver_queries import query, table
from nyc_government_hiring_audit_data_platform_spark.operators import relational as R

# ---------------------------------------------------------------------------
# joins
# ---------------------------------------------------------------------------


@query(
    "multiway_join_regional",
    """
    SELECT r_name AS region, n_name AS nation,
           COUNT(DISTINCT c_custkey) AS n_customers,
           COUNT(o_orderkey) AS n_orders,
           ROUND(COALESCE(SUM(o_totalprice), 0), 2) AS total_sales
    FROM region
    JOIN nation ON n_regionkey = r_regionkey
    JOIN customer ON c_nationkey = n_nationkey
    LEFT JOIN orders ON o_custkey = c_custkey
    GROUP BY r_name, n_name
    """,
)
def q_multiway_join(spark, sf_dir):
    """4-way star join (TPC-H Q5 shape): tiny dims broadcast, the fact
    side shuffles once for the aggregation."""
    r = table(spark, sf_dir, "region")
    n = table(spark, sf_dir, "nation")
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .join(o, o.o_custkey == c.c_custkey, "left")
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(
            F.countDistinct("c_custkey").alias("n_customers"),
            F.count("o_orderkey").alias("n_orders"),
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 2).alias("total_sales"),
        )
    )


@query(
    "salted_skew_join",
    """
    SELECT o_orderpriority, COUNT(*) AS n, ROUND(SUM(l_quantity), 2) AS qty
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    """,
)
def q_salted_skew_join(spark, sf_dir):
    """Salting pattern for skewed join keys: the big side adds a random
    salt in [0,8), the small side explodes across all salts, the join key
    becomes (key, salt) - hot keys spread over n_salt reducers. Results are
    identical to the plain join (the oracle is the unsalted join); AQE
    skew-join does this adaptively, salting is the explicit form."""
    n_salt = 4
    li = table(spark, sf_dir, "lineitem").withColumn(
        "_salt", (F.rand(seed=7) * n_salt).cast("int")
    )
    o = table(spark, sf_dir, "orders").withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
    )
    return (
        li.join(o, (li.l_orderkey == o.o_orderkey) & (li._salt == o._salt))
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("l_quantity"), 2).alias("qty"))
    )


# ---------------------------------------------------------------------------
# aggregation
# ---------------------------------------------------------------------------


@query(
    "filtered_agg",
    """
    SELECT l_returnflag,
           COUNT(*) FILTER (WHERE l_discount > 0.05) AS n_discounted,
           ROUND(SUM(CASE WHEN l_tax > 0.04 THEN l_extendedprice ELSE 0 END), 2)
             AS taxed_price,
           ROUND(AVG(CASE WHEN l_quantity >= 25 THEN l_extendedprice END), 2)
             AS avg_bulk_price
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_filtered_agg(spark, sf_dir):
    """FILTER / conditional aggregation."""
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count(F.when(F.col("l_discount") > 0.05, 1)).alias("n_discounted"),
        F.round(
            F.sum(F.when(F.col("l_tax") > 0.04, F.col("l_extendedprice")).otherwise(0.0)), 2
        ).alias("taxed_price"),
        F.round(
            F.avg(F.when(F.col("l_quantity") >= 25, F.col("l_extendedprice"))), 2
        ).alias("avg_bulk_price"),
    )


@query(
    "grouping_sets",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
    """,
)
def q_grouping_sets(spark, sf_dir):
    """Explicit GROUPING SETS with grouping_id (bit patterns match
    DuckDB's GROUPING())."""
    li = table(spark, sf_dir, "lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               grouping_id(l_returnflag, l_linestatus) AS gid, COUNT(*) AS n
        FROM {li}
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        """,
        li=li,
    )


@query(
    "percentiles",
    """
    SELECT l_returnflag,
           ROUND(quantile_cont(l_extendedprice, 0.5), 2) AS p50,
           ROUND(quantile_cont(l_extendedprice, 0.9), 2) AS p90,
           ROUND(quantile_disc(l_extendedprice, 0.5), 2) AS p50_disc
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_percentiles(spark, sf_dir):
    """Exact percentiles: Spark ``percentile`` interpolates like DuckDB
    quantile_cont; percentile_disc matches quantile_disc."""
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_extendedprice, 0.5)"), 2).alias("p50"),
        F.round(F.expr("percentile(l_extendedprice, 0.9)"), 2).alias("p90"),
        F.round(F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY l_extendedprice)"), 2).alias(
            "p50_disc"
        ),
    )


@query(
    "argmax_agg",
    """
    SELECT c_nationkey,
           arg_max(c_name, CAST(ROUND(c_acctbal * 100) AS BIGINT) * 10000000
                           + c_custkey) AS richest_customer,
           ROUND(MAX(c_acctbal), 2) AS max_acctbal,
           arg_min(c_name, CAST(ROUND(c_acctbal * 100) AS BIGINT) * 10000000
                           + c_custkey) AS poorest_customer
    FROM customer GROUP BY c_nationkey
    """,
)
def q_argmax_agg(spark, sf_dir):
    """Arg-max/arg-min aggregation (the row attribute AT the extreme,
    not the extreme itself) - single-pass, partial-aggregatable, unlike
    the self-join people write instead. The ordering key packs
    (acctbal, custkey) into one BIGINT (acctbal has exactly 2 decimals,
    so *100 is integral; custkey < 10^7 fills the low digits) - ties
    break deterministically and identically in both engines without
    struct-typed arg_max, which DuckDB lacks."""
    c = table(spark, sf_dir, "customer")
    key = (
        F.round(F.col("c_acctbal") * 100).cast("bigint") * 10000000
        + F.col("c_custkey")
    )
    return c.groupBy("c_nationkey").agg(
        F.max_by("c_name", key).alias("richest_customer"),
        F.round(F.max("c_acctbal"), 2).alias("max_acctbal"),
        F.min_by("c_name", key).alias("poorest_customer"),
    )


@query(
    "histogram_bins",
    """
    SELECT CAST(least(floor(o_totalprice / 50000.0), 9) AS INT) AS bin,
           COUNT(*) AS n_orders,
           ROUND(MIN(o_totalprice), 2) AS bin_min,
           ROUND(MAX(o_totalprice), 2) AS bin_max
    FROM orders GROUP BY 1
    """,
)
def q_histogram_bins(spark, sf_dir):
    """Fixed-width histogram (data-profiling primitive): bin id is pure
    arithmetic (floor of an IEEE division - bit-identical across
    engines), top bin clamps the tail. One partial-agg shuffle; the
    profile of 100 TB is 10 rows."""
    o = table(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.least(F.floor(F.col("o_totalprice") / 50000.0), F.lit(9))
            .cast("int")
            .alias("bin")
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.min("o_totalprice"), 2).alias("bin_min"),
            F.round(F.max("o_totalprice"), 2).alias("bin_max"),
        )
    )


@query(
    "profile_columns",
    """
    SELECT 'o_custkey' AS col, COUNT(*) AS n_rows,
           COUNT(*) - COUNT(o_custkey) AS n_null,
           COUNT(DISTINCT o_custkey) AS n_distinct,
           CAST(MIN(o_custkey) AS VARCHAR) AS min_val,
           CAST(MAX(o_custkey) AS VARCHAR) AS max_val
    FROM orders
    UNION ALL
    SELECT 'o_orderpriority', COUNT(*), COUNT(*) - COUNT(o_orderpriority),
           COUNT(DISTINCT o_orderpriority),
           MIN(o_orderpriority), MAX(o_orderpriority)
    FROM orders
    UNION ALL
    SELECT 'o_orderstatus', COUNT(*), COUNT(*) - COUNT(o_orderstatus),
           COUNT(DISTINCT o_orderstatus),
           MIN(o_orderstatus), MAX(o_orderstatus)
    FROM orders
    """,
)
def q_profile_columns(spark, sf_dir):
    """Table profiling (ANALYZE-style): per-column row/null/distinct
    counts and min/max, stringified into one uniform relation. Spark
    computes the multi-distinct aggregate via Expand in a single pass
    over the scan; at 100 TB swap COUNT(DISTINCT) for
    approx_count_distinct per column."""
    o = table(spark, sf_dir, "orders")

    def prof(col):
        return o.agg(
            F.lit(col).alias("col"),
            F.count(F.lit(1)).alias("n_rows"),
            (F.count(F.lit(1)) - F.count(col)).alias("n_null"),
            F.countDistinct(col).alias("n_distinct"),
            F.min(col).cast("string").alias("min_val"),
            F.max(col).cast("string").alias("max_val"),
        )

    out = prof("o_custkey")
    for c in ("o_orderpriority", "o_orderstatus"):
        out = out.unionByName(prof(c))
    return out


@query(
    "approx_distinct",
    """
    SELECT o_orderpriority, TRUE AS within_5pct
    FROM orders GROUP BY o_orderpriority
    """,
)
def q_approx_distinct(spark, sf_dir):
    """approx_count_distinct (HLL++). The raw estimate is engine-specific
    (DuckDB uses a different sketch), so the oracle-checkable contract is
    the ERROR BOUND, not the estimate: emit a per-group boolean asserting
    the HLL++ estimate (rsd=0.02) lands within 5% of the exact count; the
    oracle emits the same flag from exact counts (trivially true)."""
    o = table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.approx_count_distinct("o_custkey", 0.02).alias("approx"),
            F.countDistinct("o_custkey").alias("exact"),
        )
        .select(
            "o_orderpriority",
            (F.abs(F.col("approx") - F.col("exact")) / F.col("exact") <= 0.05).alias(
                "within_5pct"
            ),
        )
    )


@query(
    "collect_sorted_list",
    """
    SELECT n_nationkey,
           array_to_string(list_sort(list(DISTINCT c_mktsegment)), '|') AS segments
    FROM nation JOIN customer ON c_nationkey = n_nationkey
    GROUP BY n_nationkey
    """,
)
def q_collect_sorted_list(spark, sf_dir):
    """collect_set -> sorted array (deterministic list aggregation).

    Emitted as a '|'-joined string on BOTH engines: the driver's
    value-hasher cannot hash raw array cells (round-2 lesson)."""
    n = table(spark, sf_dir, "nation")
    c = table(spark, sf_dir, "customer")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_nationkey")
        .agg(
            F.array_join(F.array_sort(F.collect_set("c_mktsegment")), "|").alias(
                "segments"
            )
        )
    )


# ---------------------------------------------------------------------------
# scalar function suites
# ---------------------------------------------------------------------------


@query(
    "string_functions",
    """
    SELECT p_partkey,
           upper(substring(p_name, 1, 5)) AS head5,
           translate(p_name, 'aeiou', '-----') AS devoweled,
           lpad(CAST(p_partkey AS VARCHAR), 8, '0') AS padded_id,
           reverse(p_name) AS reversed,
           length(p_name) - length(replace(p_name, ' ', '')) + 1 AS n_words,
           concat_ws('|', p_type, p_brand) AS type_brand,
           CAST(instr(p_name, 'ring') AS INT) AS ring_pos
    FROM part
    """,
)
def q_string_functions(spark, sf_dir):
    """String scalar suite: substring/translate/lpad/reverse/replace/
    concat_ws/instr - all JVM built-ins, byte-identical to DuckDB."""
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper(F.substring("p_name", 1, 5)).alias("head5"),
        F.translate("p_name", "aeiou", "-----").alias("devoweled"),
        F.lpad(F.col("p_partkey").cast("string"), 8, "0").alias("padded_id"),
        F.reverse("p_name").alias("reversed"),
        (
            F.length("p_name") - F.length(F.replace(F.col("p_name"), F.lit(" "), F.lit(""))) + 1
        ).alias("n_words"),
        F.concat_ws("|", "p_type", "p_brand").alias("type_brand"),
        F.instr("p_name", "ring").cast("int").alias("ring_pos"),
    )


@query(
    "array_functions",
    """
    SELECT p_partkey,
           array_to_string(string_split(p_name, ' '), '|') AS toks,
           CAST(len(string_split(p_name, ' ')) AS INT) AS n_toks,
           array_to_string(list_sort(string_split(p_name, ' ')), '|') AS sorted_toks,
           array_contains(string_split(p_name, ' '), 'ring') AS has_ring,
           array_to_string(
             list_transform(string_split(p_name, ' '), t -> CAST(length(t) AS VARCHAR)),
             '|') AS tok_lens,
           CAST(list_sum(list_transform(string_split(p_name, ' '), t -> length(t))) AS INT) AS total_len
    FROM part
    """,
)
def q_array_functions(spark, sf_dir):
    """Array function suite: split/size/sort/contains/transform/
    aggregate (the primitives the dedup/ANN operators compose).

    Array outputs are '|'-joined strings on BOTH engines: the driver's
    value-hasher cannot hash raw array cells (round-2 lesson)."""
    p = table(spark, sf_dir, "part")
    toks = F.split("p_name", " ")
    return p.select(
        "p_partkey",
        F.array_join(toks, "|").alias("toks"),
        F.size(toks).alias("n_toks"),
        F.array_join(F.array_sort(toks), "|").alias("sorted_toks"),
        F.array_contains(toks, "ring").alias("has_ring"),
        F.array_join(
            F.transform(toks, lambda t: F.length(t).cast("string")), "|"
        ).alias("tok_lens"),
        F.aggregate(
            F.transform(toks, lambda t: F.length(t)), F.lit(0), lambda a, b: a + b
        ).alias("total_len"),
    )


@query(
    "explode_posexplode",
    """
    SELECT p_partkey, t.tok, CAST(t.pos AS INT) AS pos
    FROM part, LATERAL (
      SELECT unnest(string_split(p_name, ' ')) AS tok,
             generate_subscripts(string_split(p_name, ' '), 1) - 1 AS pos
    ) t
    """,
)
def q_explode_posexplode(spark, sf_dir):
    """posexplode (ordinal-preserving array explode)."""
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey", F.posexplode(F.split("p_name", " ")).alias("pos", "tok")
    ).select("p_partkey", "tok", F.col("pos").cast("int").alias("pos"))


@query(
    "map_functions",
    """
    SELECT o_orderkey,
           array_to_string(list_sort(map_keys(m)), '|') AS ks,
           (m['priority'])[1] AS priority,
           CAST(cardinality(m) AS INT) AS n_entries
    FROM (
      SELECT o_orderkey,
             MAP {'status': o_orderstatus, 'priority': o_orderpriority} AS m
      FROM orders
    )
    """,
)
def q_map_functions(spark, sf_dir):
    """Map construction + keys/lookup/cardinality. Key list emitted as a
    '|'-joined string on BOTH engines (driver hasher can't hash arrays)."""
    o = table(spark, sf_dir, "orders")
    m = F.create_map(
        F.lit("status"), F.col("o_orderstatus"), F.lit("priority"), F.col("o_orderpriority")
    )
    return o.select(
        "o_orderkey",
        F.array_join(F.array_sort(F.map_keys(m)), "|").alias("ks"),
        F.element_at(m, "priority").alias("priority"),
        F.size(m).cast("int").alias("n_entries"),
    )


# ---------------------------------------------------------------------------
# window extensions
# ---------------------------------------------------------------------------


@query(
    "rank_dense_ntile",
    """
    SELECT o_custkey, o_orderkey,
           CAST(RANK() OVER w AS BIGINT) AS rnk,
           CAST(DENSE_RANK() OVER w AS BIGINT) AS drnk,
           CAST(NTILE(4) OVER w AS BIGINT) AS quartile,
           ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
    """,
)
def q_rank_dense_ntile(spark, sf_dir):
    """Ranking window family: rank/dense_rank/ntile/percent_rank."""
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
    )


@query(
    "first_last_nth_window",
    """
    SELECT o_orderkey, o_custkey,
           ROUND(FIRST_VALUE(o_totalprice) OVER w, 2) AS first_price,
           ROUND(LAST_VALUE(o_totalprice) OVER w, 2) AS last_price,
           ROUND(NTH_VALUE(o_totalprice, 2) OVER w, 2) AS second_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def q_first_last_nth(spark, sf_dir):
    """first_value/last_value/nth_value over an explicit full frame (the
    default frame for last_value stops at CURRENT ROW in both engines -
    pinned explicitly so the semantics are unambiguous)."""
    o = table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.round(F.first("o_totalprice").over(w), 2).alias("first_price"),
        F.round(F.last("o_totalprice").over(w), 2).alias("last_price"),
        F.round(F.nth_value("o_totalprice", 2).over(w), 2).alias("second_price"),
    )


@query(
    "range_frame_window",
    """
    SELECT o_orderkey, o_custkey, o_totalprice,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
             PARTITION BY o_custkey ORDER BY o_totalprice
             RANGE BETWEEN 10000 PRECEDING AND 10000 FOLLOWING) AS DOUBLE)
             AS local_sum,
           CAST(COUNT(*) OVER (
             PARTITION BY o_custkey ORDER BY o_totalprice
             RANGE BETWEEN 10000 PRECEDING AND 10000 FOLLOWING) AS BIGINT)
             AS local_n
    FROM orders
    """,
)
def q_range_frame_window(spark, sf_dir):
    """RANGE frame (value-based window). The windowed aggregate runs in
    DECIMAL - exact and order-independent in both engines (double AVG
    inside sliding frames drifts in the last ulp between engines)."""
    o = table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_totalprice")
        .rangeBetween(-10000, 10000)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).over(w)
        .cast("double")
        .alias("local_sum"),
        F.count(F.lit(1)).over(w).cast("long").alias("local_n"),
    )


# ---------------------------------------------------------------------------
# temporal joins & windows
# ---------------------------------------------------------------------------


@query(
    "asof_join",
    """
    WITH c AS (
      SELECT user_id, date_trunc('second', ts) AS sts,
             MAX(value) AS click_value
      FROM events WHERE event_type = 'click' GROUP BY 1, 2
    ), p AS (
      SELECT user_id, event_id, date_trunc('second', ts) AS sts, value
      FROM events WHERE event_type = 'purchase'
    )
    SELECT p.event_id, p.user_id,
           strftime(p.sts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
           ROUND(p.value, 2) AS purchase_value,
           ROUND(c.click_value, 2) AS click_value
    FROM p ASOF JOIN c ON p.user_id = c.user_id AND p.sts >= c.sts
    """,
)
def q_asof_join(spark, sf_dir):
    """As-of join (each purchase joined to the latest click at-or-before
    it, per user) - the canonical time-series point-in-time join, which
    Spark lacks natively. Implemented as the union-merge pattern: tag
    both sides, sort by (ts, side) within user, carry the last non-null
    right-side value forward with ``last(ignorenulls)`` over an
    unbounded-preceding row frame, keep left rows. One shuffle on
    user_id; no range explosion - scales linearly, unlike a naive
    theta-join (ts <= ts) which is quadratic per user. Timestamps are
    second-truncated on both engines (sub-second parity between Spark's
    micros and the oracle's nanos is not defined); the right side is
    pre-aggregated to one row per (user, second) so ties are
    deterministic. Ref: reference has no temporal joins; engine
    extension per SURVEY.md §2.3 note."""
    ev = table(spark, sf_dir, "events")
    sts = F.date_trunc("second", F.col("ts"))
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", sts.alias("sts"))
        .agg(F.max("value").alias("click_value"))
        .select("user_id", "sts", F.lit(None).cast("long").alias("event_id"),
                F.lit(None).cast("double").alias("value"), "click_value",
                F.lit(0).alias("side"))
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", sts.alias("sts"), "event_id", "value",
        F.lit(None).cast("double").alias("click_value"), F.lit(1).alias("side")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("sts", "side", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = clicks.unionByName(purchases).withColumn(
        "last_click", F.last("click_value", ignorenulls=True).over(w)
    )
    return (
        merged.filter((F.col("side") == 1) & F.col("last_click").isNotNull())
        .select(
            "event_id",
            "user_id",
            F.date_format("sts", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
            F.round("value", 2).alias("purchase_value"),
            F.round("last_click", 2).alias("click_value"),
        )
    )


@query(
    "banded_range_join",
    """
    SELECT CAST(50 * i AS INT) AS lo, CAST(50 * (i + 1) AS INT) AS hi,
           COUNT(*) AS n, ROUND(SUM(value), 2) AS total_value
    FROM generate_series(0, 9) t(i)
    JOIN events e ON e.value >= 50 * i AND e.value < 50 * (i + 1)
    GROUP BY 1, 2
    """,
)
def q_banded_range_join(spark, sf_dir):
    """Range (interval-containment) join: events against a 10-band value
    table on lo <= value < hi. Planned as BroadcastNestedLoopJoin - the
    band side is tiny, so each event row tests 10 intervals with no
    shuffle of the big side. At 100 TB with a large interval table the
    rewrite is band = floor(value/width) equi-join (O(1) per row); the
    theta form is kept here because it is the general operator
    (arbitrary, non-uniform intervals)."""
    ev = table(spark, sf_dir, "events")
    bands = spark.range(10).select(
        (F.col("id") * 50).cast("int").alias("lo"),
        ((F.col("id") + 1) * 50).cast("int").alias("hi"),
    )
    return (
        ev.join(
            F.broadcast(bands),
            (ev.value >= bands.lo) & (ev.value < bands.hi),
        )
        .groupBy("lo", "hi")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
    )


@query(
    "tumbling_window_15min",
    """
    SELECT strftime(to_timestamp(CAST(floor(epoch(ts) / 900) * 900 AS BIGINT)),
                    '%Y-%m-%d %H:%M:%S') AS w_start,
           event_type, COUNT(*) AS n, ROUND(SUM(value), 2) AS total_value
    FROM events GROUP BY 1, 2
    """,
)
def q_tumbling_window_15min(spark, sf_dir):
    """15-minute tumbling window via ``F.window`` - the same operator the
    streaming jobs use (epoch-aligned, so the batch result is bit-equal
    to the watermarked streaming aggregation replayed over the table)."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "15 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("w_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


# ---------------------------------------------------------------------------
# reshaping & scalar suites
# ---------------------------------------------------------------------------


@query(
    "unpivot_metrics",
    """
    SELECT l_orderkey, l_linenumber, metric, val
    FROM (
      UNPIVOT (SELECT l_orderkey, l_linenumber,
                      l_quantity, l_extendedprice, l_discount, l_tax
               FROM lineitem)
      ON l_quantity, l_extendedprice, l_discount, l_tax
      INTO NAME metric VALUE val
    )
    """,
)
def q_unpivot_metrics(spark, sf_dir):
    """unpivot/melt: wide numeric columns -> long (metric, value) rows -
    narrow-to-long is a scan-local operation (no shuffle)."""
    li = table(spark, sf_dir, "lineitem")
    return li.unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        "metric",
        "val",
    )


@query(
    "regexp_functions",
    """
    SELECT p_partkey,
           regexp_extract(p_name, '([a-z]+)$', 1) AS last_word,
           regexp_matches(p_name, 'r.ng') AS has_ring_like,
           regexp_replace(p_name, '[aeiou]', '*', 'g') AS starred,
           CAST(len(regexp_extract_all(p_name, '[a-z]+')) AS INT) AS n_words,
           split_part(p_type, ' ', 2) AS type_mid
    FROM part
    """,
)
def q_regexp_functions(spark, sf_dir):
    """Regex scalar suite: extract/like/replace-all/extract-all-count/
    split_part (JVM codegen'd, no UDFs)."""
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.regexp_extract("p_name", "([a-z]+)$", 1).alias("last_word"),
        F.col("p_name").rlike("r.ng").alias("has_ring_like"),
        F.regexp_replace("p_name", "[aeiou]", "*").alias("starred"),
        F.size(F.regexp_extract_all(F.col("p_name"), F.lit("[a-z]+"), 0))
        .cast("int")
        .alias("n_words"),
        F.split_part(F.col("p_type"), F.lit(" "), F.lit(2)).alias("type_mid"),
    )


@query(
    "stats_agg",
    """
    SELECT l_returnflag,
           ROUND(stddev_samp(l_quantity), 4) AS sd_qty,
           ROUND(var_samp(l_quantity), 4) AS var_qty,
           ROUND(corr(l_quantity, l_extendedprice), 4) + 0 AS corr_qty_price,
           ROUND(covar_samp(l_quantity, l_extendedprice), 2) + 0 AS covar_qty_price
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_stats_agg(spark, sf_dir):
    """Statistical aggregate suite: stddev/variance/correlation/
    covariance (single-pass partial-aggregation forms; Spark computes
    these with map-side partials, one shuffle)."""
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_quantity"), 4).alias("sd_qty"),
        F.round(F.var_samp("l_quantity"), 4).alias("var_qty"),
        norm_round(F.corr("l_quantity", "l_extendedprice"), 4).alias("corr_qty_price"),
        norm_round(F.covar_samp("l_quantity", "l_extendedprice"), 2).alias("covar_qty_price"),
    )


@query(
    "conditional_expressions",
    """
    SELECT c_custkey,
           CASE WHEN c_acctbal < 0 THEN 'debt'
                WHEN c_acctbal < 5000 THEN 'mid'
                ELSE 'high' END AS bal_band,
           ROUND(GREATEST(c_acctbal, 0.0), 2) AS bal_floor,
           ROUND(LEAST(c_acctbal, 1000.0), 2) AS bal_cap,
           COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'OTHER') AS seg_masked
    FROM customer
    """,
)
def q_conditional_expressions(spark, sf_dir):
    """CASE/GREATEST/LEAST/NULLIF/COALESCE conditional-expression suite."""
    c = table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.when(F.col("c_acctbal") < 0, "debt")
        .when(F.col("c_acctbal") < 5000, "mid")
        .otherwise("high")
        .alias("bal_band"),
        F.round(F.greatest("c_acctbal", F.lit(0.0)), 2).alias("bal_floor"),
        F.round(F.least("c_acctbal", F.lit(1000.0)), 2).alias("bal_cap"),
        F.coalesce(F.nullif("c_mktsegment", F.lit("BUILDING")), F.lit("OTHER")).alias(
            "seg_masked"
        ),
    )


# ---------------------------------------------------------------------------
# SQL subquery surface (Catalyst subquery planning: HAVING, scalar,
# correlated, IN/EXISTS - all rewritten to joins by the optimizer)
# ---------------------------------------------------------------------------


@query(
    "having_filter",
    """
    SELECT o_custkey, COUNT(*) AS n_orders, ROUND(SUM(o_totalprice), 2) AS total
    FROM orders GROUP BY o_custkey
    HAVING COUNT(*) >= 15
    """,
)
def q_having_filter(spark, sf_dir):
    """GROUP BY + HAVING (post-aggregation predicate)."""
    o = table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
        .filter(F.col("n_orders") >= 15)
    )


@query(
    "scalar_subquery",
    """
    SELECT o_orderkey, ROUND(o_totalprice, 2) AS price
    FROM orders WHERE o_totalprice > 1.5 * (SELECT AVG(o_totalprice) FROM orders)
    """,
)
def q_scalar_subquery(spark, sf_dir):
    """Uncorrelated scalar subquery (global-average threshold). Catalyst
    plans the 1-row aggregate as a broadcast subquery, so the outer scan
    streams once; the 1.5x factor keeps the float comparison away from
    any exact-boundary value."""
    o = table(spark, sf_dir, "orders")
    return spark.sql(
        """
        SELECT o_orderkey, ROUND(o_totalprice, 2) AS price
        FROM {o} WHERE o_totalprice > 1.5 * (SELECT AVG(o_totalprice) FROM {o})
        """,
        o=o,
    )


@query(
    "correlated_scalar_subquery",
    """
    SELECT c_custkey, c_name FROM customer c
    WHERE (SELECT COUNT(*) FROM orders o WHERE o.o_custkey = c.c_custkey) >= 15
    """,
)
def q_correlated_scalar_subquery(spark, sf_dir):
    """Correlated scalar subquery (per-customer order count) - Catalyst
    de-correlates it into an aggregate + join; the integer comparison
    has no cross-engine float risk."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return spark.sql(
        """
        SELECT c_custkey, c_name FROM {c} c
        WHERE (SELECT COUNT(*) FROM {o} o WHERE o.o_custkey = c.c_custkey) >= 15
        """,
        c=c,
        o=o,
    )


@query(
    "exists_in_subquery",
    """
    SELECT p_partkey, p_name FROM part p
    WHERE p_partkey IN (SELECT l_partkey FROM lineitem WHERE l_quantity >= 49)
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_partkey = p.p_partkey AND l.l_discount > 0.09)
    """,
)
def q_exists_in_subquery(spark, sf_dir):
    """IN + correlated EXISTS subqueries (both become left-semi joins)."""
    p = table(spark, sf_dir, "part")
    li = table(spark, sf_dir, "lineitem")
    return spark.sql(
        """
        SELECT p_partkey, p_name FROM {p} p
        WHERE p_partkey IN (SELECT l_partkey FROM {li} WHERE l_quantity >= 49)
          AND EXISTS (SELECT 1 FROM {li} l
                      WHERE l.l_partkey = p.p_partkey AND l.l_discount > 0.09)
        """,
        p=p,
        li=li,
    )


# ---------------------------------------------------------------------------
# merge / iterative operators
# ---------------------------------------------------------------------------


@query(
    "merge_upsert",
    """
    WITH base AS (
      SELECT o_orderkey, o_custkey, ROUND(o_totalprice, 2) AS price FROM orders
    ), u AS (
      SELECT o_orderkey, o_custkey, ROUND(o_totalprice + 1000.0, 2) AS price
      FROM orders WHERE o_orderkey % 7 = 0
      UNION ALL
      SELECT o_orderkey + 10000000, o_custkey, ROUND(o_totalprice, 2)
      FROM orders WHERE o_orderkey % 97 = 0
    )
    SELECT b.* FROM base b
    WHERE NOT EXISTS (SELECT 1 FROM u WHERE u.o_orderkey = b.o_orderkey)
    UNION ALL
    SELECT * FROM u
    """,
)
def q_merge_upsert(spark, sf_dir):
    """SCD-1 merge: 1-in-7 orders get a price update (+1000.0: an
    exactly-representable bump keeps ROUND away from cross-engine
    half-way boundaries, unlike a multiplicative update), 1-in-97 become new
    keys (inserts); unmatched base rows pass through. One anti-join +
    union - the batch MERGE INTO shape."""
    from nyc_government_hiring_audit_data_platform_spark.operators import relational as R

    o = table(spark, sf_dir, "orders")
    base = o.select(
        "o_orderkey", "o_custkey", F.round("o_totalprice", 2).alias("price")
    )
    upd = o.filter(F.col("o_orderkey") % 7 == 0).select(
        "o_orderkey", "o_custkey", F.round(F.col("o_totalprice") + 1000.0, 2).alias("price")
    )
    ins = o.filter(F.col("o_orderkey") % 97 == 0).select(
        (F.col("o_orderkey") + 10000000).alias("o_orderkey"),
        "o_custkey",
        F.round("o_totalprice", 2).alias("price"),
    )
    return R.merge_upsert(base, upd.unionByName(ins), ["o_orderkey"])


@query(
    "scd2_intervals",
    """
    WITH o AS (
      SELECT o_custkey, o_orderpriority, o_orderdate, o_orderkey
      FROM orders WHERE o_custkey % 100 = 0
    ),
    chg AS (
      SELECT *, LAG(o_orderpriority) OVER (
        PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev
      FROM o
    ),
    starts AS (
      SELECT o_custkey, o_orderpriority, o_orderdate AS valid_from, o_orderkey
      FROM chg WHERE prev IS NULL OR prev <> o_orderpriority
    )
    SELECT o_custkey, o_orderpriority, valid_from,
           LEAD(valid_from) OVER (
             PARTITION BY o_custkey ORDER BY valid_from, o_orderkey) AS valid_to,
           CASE WHEN LEAD(valid_from) OVER (
             PARTITION BY o_custkey ORDER BY valid_from, o_orderkey) IS NULL
             THEN 1 ELSE 0 END AS is_current
    FROM starts
    """,
)
def q_scd2_intervals(spark, sf_dir):
    """SCD-2 dimension history: collapse each customer's order-priority
    timeline into validity intervals - a change-start row opens a
    version (lag detects the change), lead closes it, the open interval
    is current. Both windows partition on the same key so ONE shuffle
    services the whole query; this is the streaming-free way to build
    slowly-changing dimensions from an event log at any scale."""
    o = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_custkey") % 100 == 0)
        .select("o_custkey", "o_orderpriority", "o_orderdate", "o_orderkey")
    )
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    starts = (
        o.withColumn("prev", F.lag("o_orderpriority").over(w))
        .filter(F.col("prev").isNull() | (F.col("prev") != F.col("o_orderpriority")))
        .select(
            "o_custkey",
            "o_orderpriority",
            F.col("o_orderdate").alias("valid_from"),
            "o_orderkey",
        )
    )
    w2 = Window.partitionBy("o_custkey").orderBy("valid_from", "o_orderkey")
    return starts.select(
        "o_custkey",
        "o_orderpriority",
        "valid_from",
        F.lead("valid_from").over(w2).alias("valid_to"),
        F.when(F.lead("valid_from").over(w2).isNull(), F.lit(1))
        .otherwise(F.lit(0))
        .alias("is_current"),
    )


@query(
    "neardup_components",
    None,  # oracle attached below (needs the ANN edge SQL)
)
def q_neardup_components(spark, sf_dir):
    """Duplicate-cluster resolution: embedding near-dup PAIRS -> duplicate
    CLUSTERS via iterative min-label connected components (each round is
    a distributed join+agg; converges in <= diameter rounds). The oracle
    is a DuckDB recursive CTE over the identical edge set - an
    algorithm-independent definition of the same result."""
    from nyc_government_hiring_audit_data_platform_spark.operators import ann as ANN
    from nyc_government_hiring_audit_data_platform_spark.operators import graph as G
    from nyc_government_hiring_audit_data_platform_spark.driver_queries_datapipe import (
        _emb_par,
    )

    # fixture fan-out at the input edge; the operator moves no vectors
    edges = ANN.embedding_neardup_pairs(
        _emb_par(spark, sf_dir), "vec_id", "embedding", 0.3
    )
    return G.connected_components(edges, "id_a", "id_b")


def _attach_neardup_components_oracle():
    from nyc_government_hiring_audit_data_platform_spark.driver_queries import ORACLE
    from nyc_government_hiring_audit_data_platform_spark.operators import ann as ANN
    from nyc_government_hiring_audit_data_platform_spark.operators import graph as G

    ORACLE["neardup_components"] = G.connected_components_sql(
        ANN.embedding_neardup_pairs_sql("embeddings", "vec_id", "embedding", 0.3),
        "id_a",
        "id_b",
    )


_attach_neardup_components_oracle()


# ---------------------------------------------------------------------------
# UDAF / UDTF surface (driver-verified; SURVEY.md §2.10 engine extensions)
# ---------------------------------------------------------------------------


@query(
    "udaf_weighted_mean",
    """
    SELECT l_returnflag,
           ROUND(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                     * CAST(l_quantity AS BIGINT)) * 1.0
                 / SUM(CAST(l_quantity AS BIGINT)) / 100, 4) AS wavg_price
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_udaf_weighted_mean(spark, sf_dir):
    """Arrow grouped-agg pandas UDAF (functions.udx.weighted_mean):
    quantity-weighted mean price per returnflag. Inputs are integerized
    (cents, whole quantities) BEFORE the UDAF so the in-group pandas sum
    is exact int64 arithmetic - order-independent, hence hash-stable
    against the oracle regardless of shuffle row order."""
    from nyc_government_hiring_audit_data_platform_spark.functions.udx import (
        weighted_mean,
    )

    li = table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("price_c"),
        F.col("l_quantity").cast("long").alias("qty"),
    )
    agg = weighted_mean(li, ["l_returnflag"], "price_c", "qty")
    return agg.select(
        "l_returnflag", F.round(F.col("weighted_mean") / 100, 4).alias("wavg_price")
    )


@query(
    "udtf_ngram_explode",
    """
    WITH src AS (SELECT p_partkey,
                        list_filter(string_split(p_name, ' '), t -> t <> '') AS toks
                 FROM part),
    ex AS (SELECT p_partkey,
                  unnest(list_transform(range(1, len(toks)),
                         i -> struct_pack(pos := i - 1,
                                          ng := toks[i] || ' ' || toks[i+1]))) AS u
           FROM src)
    SELECT p_partkey, CAST(u.pos AS INT) AS pos, u.ng AS ngram FROM ex
    """,
)
def q_udtf_ngram_explode(spark, sf_dir):
    """Spark 4 Python UDTF (functions.udx.ngram_explode) in SQL LATERAL
    position: one title row -> N word-bigram rows with ordinals. The
    oracle is a correlated unnest over the same bigram construction."""
    from nyc_government_hiring_audit_data_platform_spark.functions.udx import (
        register_udtfs,
    )

    register_udtfs(spark)
    table(spark, sf_dir, "part").select("p_partkey", "p_name").createOrReplaceTempView(
        "udtf_part_src"
    )
    return spark.sql(
        "SELECT p_partkey, pos, ngram "
        "FROM udtf_part_src, LATERAL ngrams(p_name, 2)"
    )


# ---------------------------------------------------------------------------
# mergeable sketches (DataSketches HLL / KLL) - the 100 TB shape for
# distinct counts and quantiles: per-partition sketches, tiny merge,
# no exact-distinct shuffle. Oracle contract is the ERROR BOUND (like
# approx_distinct): estimates are sketch-impl-specific, the bound is not.
# ---------------------------------------------------------------------------


@query(
    "hll_union_bound",
    """
    SELECT c_mktsegment, TRUE AS within_5pct
    FROM customer GROUP BY c_mktsegment
    """,
)
def q_hll_union_bound(spark, sf_dir):
    """HLL sketch build + UNION (hll_sketch_agg per (segment, nation),
    hll_union_agg across nations): the distributed-distinct pattern
    where only fixed-size sketches move. Emits a per-segment flag that
    the merged estimate lands within 5% of the exact distinct count."""
    c = table(spark, sf_dir, "customer")
    per = c.groupBy("c_mktsegment", "c_nationkey").agg(
        F.hll_sketch_agg("c_custkey").alias("sk")
    )
    est = per.groupBy("c_mktsegment").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est")
    )
    exact = c.groupBy("c_mktsegment").agg(F.countDistinct("c_custkey").alias("ex"))
    return est.join(exact, "c_mktsegment").select(
        "c_mktsegment",
        (F.abs(F.col("est") - F.col("ex")) / F.col("ex") <= 0.05).alias("within_5pct"),
    )


@query(
    "kll_quantile_bound",
    """
    SELECT o_orderpriority, TRUE AS median_rank_in_40_60
    FROM orders GROUP BY o_orderpriority
    """,
)
def q_kll_quantile_bound(spark, sf_dir):
    """KLL quantile sketch (kll_sketch_agg_double + get_quantile 0.5):
    mergeable streaming quantiles. The sketch value is impl/merge-order
    specific, so the oracle-checkable contract is the RANK bound: the
    fraction of rows <= the sketch median must sit in [0.40, 0.60]
    (default k=200 has ~1.3% rank error - orders of magnitude inside
    the bound)."""
    o = table(spark, sf_dir, "orders").select("o_orderpriority", "o_totalprice")
    med = o.groupBy("o_orderpriority").agg(
        F.kll_sketch_get_quantile_double(
            F.kll_sketch_agg_double("o_totalprice"), F.lit(0.5)
        ).alias("m")
    )
    ranked = (
        o.join(F.broadcast(med), "o_orderpriority")
        .groupBy("o_orderpriority")
        .agg(
            (
                F.count(F.when(F.col("o_totalprice") <= F.col("m"), 1))
                / F.count(F.lit(1))
            ).alias("frac_le")
        )
    )
    return ranked.select(
        "o_orderpriority",
        F.col("frac_le").between(0.40, 0.60).alias("median_rank_in_40_60"),
    )


# --- Count-Min sketch (deterministic hashes -> EXACT oracle) ---------------

_CMS_W = 256  # buckets per hash row
_CMS_D = 3  # hash rows (reuses the first 3 minhash permutation pairs)


def _cms_bucket_exprs() -> list[tuple[int, str]]:
    """(j, SQL-expression) per hash row - identical text on both engines
    modulo the base-hash call, which each side renders itself."""
    from nyc_government_hiring_audit_data_platform_spark.operators.dedup import (
        MH_COEF,
        MH_P,
    )

    return [
        (j, f"(({a} * h + {b}) % {MH_P}) % {_CMS_W}")
        for j, (a, b) in enumerate(MH_COEF[:_CMS_D])
    ]


def _cms_oracle() -> str:
    from nyc_government_hiring_audit_data_platform_spark.operators.dedup import (
        base_hash_sql,
    )

    rows = " UNION ALL ".join(
        f"SELECT {j} AS j, {e} AS bucket, c FROM hashed"
        for j, e in _cms_bucket_exprs()
    )
    pj = " UNION ALL ".join(
        f"SELECT term, c, {j} AS j, {e} AS bucket FROM probes"
        for j, e in _cms_bucket_exprs()
    )
    return f"""
    WITH cnt AS MATERIALIZED (
      SELECT term, COUNT(*) AS c
      FROM (SELECT unnest(list_filter(string_split(lower(text), ' '),
                          t -> t <> '')) AS term
            FROM documents)
      GROUP BY term
    ),
    hashed AS MATERIALIZED (
      SELECT term, c, {base_hash_sql('term')} AS h FROM cnt
    ),
    rows_ AS ({rows}),
    sketch AS (
      SELECT j, bucket, CAST(SUM(c) AS BIGINT) AS bc FROM rows_ GROUP BY 1, 2
    ),
    probes AS (SELECT term, c, h FROM hashed ORDER BY c DESC, term LIMIT 8),
    pj AS ({pj})
    SELECT pj.term,
           CAST(MAX(pj.c) AS BIGINT) AS exact_cnt,
           MIN(s.bc) AS est_cnt,
           MIN(s.bc) - CAST(MAX(pj.c) AS BIGINT) AS over_count
    FROM pj JOIN sketch s ON pj.j = s.j AND pj.bucket = s.bucket
    GROUP BY pj.term
    """


@query("cms_frequency_bound", _cms_oracle())
def q_cms_frequency_bound(spark, sf_dir):
    """Count-Min sketch (Cormode & Muthukrishnan 2005) over the corpus
    term frequencies, probed at the 8 most frequent terms: D={d} hash
    rows x W={w} buckets, est = min over rows of the bucket sum, with
    the one-sided guarantee est >= exact (over_count is the collision
    bias, never negative). The hash rows reuse the minhash permutation
    pairs over the shared md5 base hash, so the sketch is DETERMINISTIC
    and the oracle checks exact VALUES, not just the bound - stronger
    than the HLL/KLL rows, whose estimates are impl-specific.

    Scale shape: the sketch is built from the TERM-COUNT relation (sum
    of counts per bucket == count of tokens per bucket, but distinct
    terms << tokens), so after the word-count shuffle everything
    downstream is fixed-size: D*W sketch cells, 8*D probe rows, all
    broadcast-joined. This is the mergeable-summaries frequency sketch
    that complements heavy_hitters_bound's Misra-Gries (MG: which keys
    are heavy; CMS: point estimates for ANY key)."""
    from nyc_government_hiring_audit_data_platform_spark.operators.dedup import (
        base_hash,
    )

    docs = table(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(
            F.filter(F.split(F.lower("text"), " "), lambda t: t != "")
        ).alias("term")
    )
    cnt = toks.groupBy("term").agg(F.count(F.lit(1)).alias("c"))
    hashed = cnt.select("term", "c", base_hash(F.col("term")).alias("h")).persist()
    buckets = F.array(
        *[
            F.struct(F.lit(j).alias("j"), F.expr(e).alias("bucket"))
            for j, e in _cms_bucket_exprs()
        ]
    )
    rows = hashed.select(F.explode(buckets).alias("e"), "c").select(
        F.col("e.j").alias("j"), F.col("e.bucket").alias("bucket"), "c"
    )
    sketch = rows.groupBy("j", "bucket").agg(F.sum("c").alias("bc"))
    probes = hashed.orderBy(F.desc("c"), F.asc("term")).limit(8)
    pj = probes.select("term", "c", F.explode(buckets).alias("e")).select(
        "term", "c", F.col("e.j").alias("j"), F.col("e.bucket").alias("bucket")
    )
    est = (
        pj.join(F.broadcast(sketch), ["j", "bucket"])
        .groupBy("term")
        .agg(F.max("c").alias("exact_cnt"), F.min("bc").alias("est_cnt"))
    )
    return est.select(
        "term",
        "exact_cnt",
        "est_cnt",
        (F.col("est_cnt") - F.col("exact_cnt")).alias("over_count"),
    )


# ---------------------------------------------------------------------------
# behavioral analytics: ordered funnels and cohort retention - standard
# large-scale event-log operators the reference's events table invites
# ---------------------------------------------------------------------------


@query(
    "funnel_conversion",
    """
    WITH v AS (
      SELECT user_id, MIN(ts) AS t1 FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, MIN(e.ts) AS t2
      FROM events e JOIN v USING (user_id)
      WHERE e.event_type = 'click' AND e.ts > v.t1 GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, MIN(e.ts) AS t3
      FROM events e JOIN c USING (user_id)
      WHERE e.event_type = 'purchase' AND e.ts > c.t2 GROUP BY e.user_id
    )
    SELECT 1 AS stage, 'view' AS event, (SELECT COUNT(*) FROM v) AS n_users
    UNION ALL
    SELECT 2, 'click', (SELECT COUNT(*) FROM c)
    UNION ALL
    SELECT 3, 'purchase', (SELECT COUNT(*) FROM p)
    """,
)
def q_funnel_conversion(spark, sf_dir):
    """Ordered funnel (view -> click -> purchase): a user advances a
    stage only with a LATER event of the next type - the strictly-
    ordered semantics marketing funnels mean, not mere type presence.
    Each stage is a groupBy-min plus an equi-join time filter - three
    narrow per-user aggregates, no window over the whole log. No
    broadcast hint: the per-user stage tables scale with the user
    dimension, so AQE picks broadcast only when they are actually
    small."""
    ev = table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )

    def stage(n, name, df):
        return df.agg(F.count(F.lit(1)).alias("n_users")).select(
            F.lit(n).alias("stage"), F.lit(name).alias("event"), "n_users"
        )

    return stage(1, "view", v).unionByName(stage(2, "click", c)).unionByName(
        stage(3, "purchase", p)
    )


@query(
    "cohort_retention",
    """
    WITH first_seen AS (
      SELECT user_id, date_trunc('week', MIN(ts)) AS cohort
      FROM events GROUP BY user_id
    ),
    active AS (
      SELECT DISTINCT user_id, date_trunc('week', ts) AS wk FROM events
    )
    SELECT strftime(f.cohort, '%Y-%m-%d') AS cohort_week,
           CAST(date_diff('day', f.cohort, a.wk) / 7 AS INT) AS week_offset,
           COUNT(*) AS n_active
    FROM active a JOIN first_seen f USING (user_id)
    GROUP BY 1, 2
    """,
)
def q_cohort_retention(spark, sf_dir):
    """Weekly cohort retention: users bucketed by first-seen week,
    counted in each later active week. Week offsets are computed from
    week-TRUNCATED dates (day-diff / 7 is exact - no engine-specific
    'week difference' semantics); the active set dedups (user, week)
    first so each user counts once per week."""
    ev = table(spark, sf_dir, "events").select("user_id", "ts")
    first_seen = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort")
    )
    active = ev.select(
        "user_id", F.date_trunc("week", "ts").alias("wk")
    ).distinct()
    return (
        active.join(first_seen, "user_id")
        .groupBy(
            F.date_format("cohort", "yyyy-MM-dd").alias("cohort_week"),
            (F.datediff(F.to_date("wk"), F.to_date("cohort")) / 7)
            .cast("int")
            .alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_active"))
    )


@query(
    "event_transitions",
    """
    WITH seq AS (
      SELECT user_id, event_type,
             LEAD(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS next_type
      FROM events
    )
    SELECT event_type AS from_type, next_type AS to_type, COUNT(*) AS n
    FROM seq WHERE next_type IS NOT NULL
    GROUP BY event_type, next_type
    """,
)
def q_event_transitions(spark, sf_dir):
    """Per-user event-transition matrix (path analysis): LEAD over the
    user's time-ordered stream, then a count per (from, to) pair.
    (ts, event_id) ordering makes ties deterministic in both engines;
    one shuffle for the window (keyed by user - parallel at any scale,
    never a global sort) and a partial-aggregated count."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    )
    return (
        seq.filter(F.col("next_type").isNotNull())
        .groupBy(
            F.col("event_type").alias("from_type"),
            F.col("next_type").alias("to_type"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "dq_expectations",
    """
    SELECT 'o_totalprice_nonneg' AS rule,
           COUNT(*) FILTER (WHERE o_totalprice < 0) AS n_violations,
           COUNT(*) AS n_rows
    FROM orders
    UNION ALL
    SELECT 'o_orderstatus_domain',
           COUNT(*) FILTER (WHERE o_orderstatus NOT IN ('O','F','P')),
           COUNT(*)
    FROM orders
    UNION ALL
    SELECT 'o_orderdate_range',
           COUNT(*) FILTER (WHERE o_orderdate < DATE '1992-01-01'
                               OR o_orderdate > DATE '1998-12-31'),
           COUNT(*)
    FROM orders
    UNION ALL
    SELECT 'o_custkey_notnull',
           COUNT(*) FILTER (WHERE o_custkey IS NULL),
           COUNT(*)
    FROM orders
    """,
)
def q_dq_expectations(spark, sf_dir):
    """Data-quality expectations report: each rule is a conditional
    aggregate over ONE scan pass per rule-set (violations + totals),
    the table-stakes validation layer of an ingestion pipeline. All
    rules are single-pass conditional counts - no per-rule jobs."""
    o = table(spark, sf_dir, "orders")

    def rule(name, cond):
        return o.agg(
            F.count(F.when(cond, 1)).alias("n_violations"),
            F.count(F.lit(1)).alias("n_rows"),
        ).select(F.lit(name).alias("rule"), "n_violations", "n_rows")

    return (
        rule("o_totalprice_nonneg", F.col("o_totalprice") < 0)
        .unionByName(
            rule(
                "o_orderstatus_domain",
                ~F.col("o_orderstatus").isin("O", "F", "P"),
            )
        )
        .unionByName(
            rule(
                "o_orderdate_range",
                (F.col("o_orderdate") < F.lit("1992-01-01").cast("date"))
                | (F.col("o_orderdate") > F.lit("1998-12-31").cast("date")),
            )
        )
        .unionByName(rule("o_custkey_notnull", F.col("o_custkey").isNull()))
    )


@query(
    "interval_overlap_join",
    """
    WITH l AS (
      SELECT user_id, MIN(ts) AS l_start,
             MIN(ts) + INTERVAL 2 HOUR AS l_end
      FROM events GROUP BY user_id
    ),
    r AS (
      SELECT event_type, MIN(ts) + INTERVAL 30 MINUTE AS r_start,
             MIN(ts) + INTERVAL 3 HOUR AS r_end
      FROM events GROUP BY event_type
    )
    SELECT user_id, event_type,
           strftime(l_start, '%Y-%m-%d %H:%M:%S') AS l_start,
           strftime(r_start, '%Y-%m-%d %H:%M:%S') AS r_start
    FROM l JOIN r ON l.l_start < r.r_end AND r.r_start < l.l_end
    """,
)
def q_interval_overlap_join(spark, sf_dir):
    """Temporal interval-overlap join (half-open [start,end)): user
    activity windows x event-type windows. The operator explodes each
    interval into hour-grid cells and equi-joins on cell before the
    exact overlap verify (operators.relational.interval_overlap_join) -
    block-then-verify instead of the oracle's quadratic theta join."""
    ev = table(spark, sf_dir, "events")
    sec = F.unix_timestamp

    left = ev.groupBy("user_id").agg(F.min("ts").alias("_m")).select(
        "user_id",
        F.col("_m").alias("l_start"),
        F.timestamp_seconds(sec("_m") + 7200).alias("l_end"),
    )
    right = ev.groupBy("event_type").agg(F.min("ts").alias("_m")).select(
        "event_type",
        F.timestamp_seconds(sec("_m") + 1800).alias("r_start"),
        F.timestamp_seconds(sec("_m") + 10800).alias("r_end"),
    )
    joined = R.interval_overlap_join(
        left, right, ["user_id"], ["event_type"], bucket_seconds=3600
    )
    return joined.select(
        "user_id",
        "event_type",
        F.date_format("l_start", "yyyy-MM-dd HH:mm:ss").alias("l_start"),
        F.date_format("r_start", "yyyy-MM-dd HH:mm:ss").alias("r_start"),
    )


@query(
    "sliding_window_1h_15m",
    """
    WITH w AS (
      SELECT event_type, value,
             to_timestamp((CAST(floor(epoch(ts) / 900) AS BIGINT) - j.j) * 900)
               AS win_start
      FROM events, (SELECT unnest([0, 1, 2, 3]) AS j) j
    )
    SELECT strftime(win_start, '%Y-%m-%d %H:%M:%S') AS win_start,
           event_type, COUNT(*) AS n, ROUND(SUM(value), 2) AS total_value
    FROM w GROUP BY 1, 2
    """,
)
def q_sliding_window_1h_15m(spark, sf_dir):
    """Batch sliding-window aggregation (1h window, 15m slide): each
    event lands in exactly 4 epoch-aligned windows. Spark's window()
    generator explodes map-side then partial-aggregates; the oracle
    derives the same 4 window starts arithmetically (floor(ts/slide) -
    j). Twin of streaming.jobs.sliding_value_rates."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window("ts", "1 hour", "15 minutes").alias("win"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.date_format("win.start", "yyyy-MM-dd HH:mm:ss").alias("win_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


@query(
    "cdc_apply",
    """
    WITH ops AS (
      SELECT o_custkey AS key,
             CASE CAST(o_orderkey % 11 AS INT) WHEN 0 THEN 'D'
                  WHEN 1 THEN 'I' ELSE 'U' END AS op,
             ROUND(o_totalprice + CAST(o_orderkey % 7 AS INT) * 1000, 2) AS payload,
             o_orderkey AS seq
      FROM orders
    ),
    latest AS (
      SELECT key, op, payload,
             ROW_NUMBER() OVER (PARTITION BY key ORDER BY seq DESC) AS rn
      FROM ops
    )
    SELECT key, op AS last_op, payload
    FROM latest WHERE rn = 1 AND op <> 'D'
    """,
)
def q_cdc_apply(spark, sf_dir):
    """CDC log application: an insert/update/delete ops log collapses to
    final table state - the highest-seq op per key wins (seq is unique,
    so the ordering is total), keys whose last op is a delete drop out.
    Keys collide (customers have many orders), so the per-key window
    genuinely collapses multi-op histories. One window
    shuffle keyed by the CDC key; the merge side of a streaming CDC
    sink, batch-verified. Ops log derived deterministically from
    orders."""
    o = table(spark, sf_dir, "orders")
    ops = o.select(
        F.col("o_custkey").alias("key"),
        F.when(F.col("o_orderkey") % 11 == 0, "D")
        .when(F.col("o_orderkey") % 11 == 1, "I")
        .otherwise("U")
        .alias("op"),
        F.round(
            F.col("o_totalprice") + (F.col("o_orderkey") % 7).cast("int") * 1000, 2
        ).alias("payload"),
        F.col("o_orderkey").alias("seq"),
    )
    w = Window.partitionBy("key").orderBy(F.desc("seq"))
    return (
        ops.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("op") != "D"))
        .select("key", F.col("op").alias("last_op"), "payload")
    )


@query(
    "robust_stats_mad",
    """
    WITH med AS (
      SELECT l_returnflag, quantile_disc(l_extendedprice, 0.5) AS m
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l.l_returnflag,
           ROUND(MAX(m), 2) AS median_price,
           ROUND(quantile_disc(abs(l_extendedprice - m), 0.5), 2) AS mad_price
    FROM lineitem l JOIN med USING (l_returnflag)
    GROUP BY l.l_returnflag
    """,
)
def q_robust_stats_mad(spark, sf_dir):
    """Robust dispersion (median absolute deviation): per-group median,
    broadcast back, median of absolute deviations - the outlier-immune
    alternative to stddev for data-quality monitoring. Two aggregate
    passes, the group-median table broadcast (group cardinality, not
    data cardinality). DISCRETE medians (percentile_disc /
    quantile_disc) on both sides: interpolated medians agree only to
    the last ulp across engines, which can straddle a rounding
    boundary; the discrete variant returns an actual data value,
    bit-identical by construction."""
    li = table(spark, sf_dir, "lineitem").select("l_returnflag", "l_extendedprice")
    med = li.groupBy("l_returnflag").agg(
        F.expr(
            "percentile_disc(0.5) WITHIN GROUP (ORDER BY l_extendedprice)"
        ).alias("m")
    )
    return (
        li.join(F.broadcast(med), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(
            F.round(F.max("m"), 2).alias("median_price"),
            F.round(
                F.expr(
                    "percentile_disc(0.5) WITHIN GROUP "
                    "(ORDER BY abs(l_extendedprice - m))"
                ),
                2,
            ).alias("mad_price"),
        )
    )


@query(
    "heavy_hitters_bound",
    """
    WITH s AS (
      SELECT CAST(100 // (1 + CAST('0x' ||
               substr(md5(CAST(l_orderkey * 10 + l_linenumber AS VARCHAR)), 1, 6)
             AS UBIGINT) % 100) AS VARCHAR) AS term
      FROM lineitem
    ),
    e AS (SELECT term, COUNT(*) AS exact_n FROM s GROUP BY term),
    tot AS (SELECT SUM(exact_n) AS n FROM e)
    SELECT term, TRUE AS captured, TRUE AS err_ok
    FROM e, tot WHERE exact_n > n / 9
    """,
)
def q_heavy_hitters_bound(spark, sf_dir):
    """Misra-Gries heavy hitters (operators.sketches, k=8) over a
    deterministic power-law term stream (md5-uniform u -> 100 div u:
    ~19 distinct values, the top two above the n/(k+1) threshold). The
    sketch's per-term estimates depend on partition order, so - like
    the HLL/KLL rows - the oracle checks the DETERMINISTIC bound the
    algorithm guarantees: every term with exact count > n/(k+1) is
    captured, with exact - n/(k+1) <= est <= exact. The plan is the
    100 TB frequent-items shape: one pass, O(k) state per partition,
    and a merge shuffle of at most k rows per partition."""
    from nyc_government_hiring_audit_data_platform_spark.operators.sketches import (
        misra_gries_summary,
    )

    K = 8
    li = table(spark, sf_dir, "lineitem")
    stream = li.select(
        F.expr(
            "cast(100 div (1 + cast(conv(substr(md5(cast(l_orderkey * 10 + "
            "l_linenumber as string)), 1, 6), 16, 10) as bigint) % 100) as string)"
        ).alias("term")
    )
    summary = misra_gries_summary(stream, "term", K)
    exact = stream.groupBy("term").agg(F.count(F.lit(1)).alias("exact_n"))
    total = exact.agg(F.sum("exact_n").alias("n"))
    heavy = exact.crossJoin(F.broadcast(total)).filter(
        F.col("exact_n") > F.col("n") / (K + 1)
    )
    return heavy.join(summary, "term", "left").select(
        "term",
        F.col("est").isNotNull().alias("captured"),
        F.when(F.col("est").isNull(), F.lit(False))
        .otherwise(
            (F.col("est") <= F.col("exact_n"))
            & (F.col("est") >= F.col("exact_n") - F.col("n") / (K + 1))
        )
        .alias("err_ok"),
    )
