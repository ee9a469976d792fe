"""Domain-pipeline driver queries - HASH-VERIFIED against DuckDB.

The reference's flagship capability is the two fuzzy-match flows
(src/fuzzy_match_salary.py:27-189, src/fuzzy_match_jobs_durations.py:
58-99) plus the GOLD dedup tables (sql/cleaned.sql:28-42). Round 2
proved the driver has no rows-only mode - queries without oracles are
permanently red - so these queries run the REAL pipeline code
(pipelines.hiring_audit: prep -> two-stage fuzzy join -> band filter ->
per-posting top-N -> GOLD group-by-MAX) with the ORACLE-EXPRESSIBLE
scorer ``fuzzy_join_tokensort`` (token-count prefilter + token-sort
levenshtein ratio, engine built-ins only), and every stage is replicated
in DuckDB SQL below. The published-WRatio scorer path (``fuzzy_join``)
keeps its pinned rapidfuzz-parity unit tests in tests/test_fuzzy.py and
tests/test_fuzzy_properties.py - same plan shape, different per-pair
kernel - and since round 4 the kernels ALSO earn direct hash rows:
``token_set_kernel`` / ``wratio_kernel`` below score a deterministic
pair set with the real pandas-UDF scorers against a DuckDB oracle that
re-derives the published algorithm in pure list SQL (LCS via a
recursive-CTE DP).

Inputs derive deterministically from the driver's ``part`` table (both
engines compute the same derivation), replacing the Socrata / XLSX
sources that are unreachable here:

- payroll   := every part row (title = p_name, salaries from
               p_retailprice, fiscal_year cycles 2022-2026);
- postings  := every 4th part, title perturbed per p_partkey % 3
               (token reorder / 1-char truncation / unrelated-suffix),
               with the reference's dirty-date edge cases (unparseable
               posting_date every 29th, null post_until every 23rd);
- lightcast := every 6th part, occupation = p_name || 's' with the
               reference's verbatim exotic column names.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from nyc_government_hiring_audit_data_platform_spark.driver_queries import query, table
from nyc_government_hiring_audit_data_platform_spark.functions.text import (
    normalize_text,
    normalize_text_sql,
)
from nyc_government_hiring_audit_data_platform_spark.operators.fuzzy import (
    fuzzy_join_tokensort,
)
from nyc_government_hiring_audit_data_platform_spark.pipelines import hiring_audit as HA

# ---------------------------------------------------------------------------
# Spark-side derivations (each expression has an exact DuckDB twin below)
# ---------------------------------------------------------------------------


def payroll_from_part(spark, sf_dir):
    p = table(spark, sf_dir, "part")
    return p.select(
        (F.lit(2022) + F.col("p_partkey") % 5).cast("string").alias("fiscal_year"),
        F.col("p_name").alias("title_description"),
        F.round(F.col("p_retailprice") * 75, 2).alias("base_salary"),
        F.col("p_brand").alias("pay_basis"),
        F.round(F.col("p_retailprice") * 80, 2).alias("regular_gross_paid"),
        F.round(F.col("p_retailprice") * 5, 2).alias("total_ot_paid"),
        F.round(F.col("p_retailprice") * 2, 2).alias("total_other_pay"),
    )


def postings_from_part(spark, sf_dir):
    p = table(spark, sf_dir, "part").filter(F.col("p_partkey") % 4 == 0)
    toks = F.split("p_name", " ")
    title = (
        F.when(F.col("p_partkey") % 3 == 0, F.concat_ws(" ", F.reverse(toks)))
        .when(
            F.col("p_partkey") % 3 == 1,
            F.expr("substring(p_name, 1, length(p_name) - 1)"),
        )
        .otherwise(F.concat(F.element_at(toks, 1), F.lit(" trainee distinct role")))
    )
    base_date = F.to_date(F.lit("2024-01-01"))
    day_off = (F.col("p_partkey") % 300).cast("int")
    posting_date = F.when(
        F.col("p_partkey") % 29 == 0, F.lit("not-a-date")
    ).otherwise(
        F.concat(
            F.date_format(F.date_add(base_date, day_off), "yyyy-MM-dd"),
            F.lit("T00:00:00.000"),
        )
    )
    post_until = F.when(
        F.col("p_partkey") % 23 == 0, F.lit(None).cast("string")
    ).otherwise(
        F.upper(F.date_format(F.date_add(base_date, day_off + F.lit(45)), "dd-MMM-yyyy"))
    )
    return p.select(
        F.col("p_partkey").alias("post_id"),
        title.alias("business_title"),
        F.round(F.col("p_retailprice") * 50, 2).alias("salary_range_from"),
        F.round(F.col("p_retailprice") * 100, 2).alias("salary_range_to"),
        posting_date.alias("posting_date"),
        post_until.alias("post_until"),
    )


def lightcast_from_part(spark, sf_dir):
    p = table(spark, sf_dir, "part").filter(F.col("p_partkey") % 6 == 0)
    return p.select(
        F.concat(F.col("p_name"), F.lit("s")).alias("Occupation (SOC)"),
        F.col("p_partkey").alias("Total Postings (Jan 2024 - Jun 2025)"),
        F.when(F.col("p_partkey") % 17 == 0, F.lit(None).cast("double"))
        .otherwise(F.round(F.col("p_retailprice") / 40, 1))
        .alias("Median Posting Duration"),
    )


def _matches(spark, sf_dir, limit=None):
    """The full EP2a chain over the part-derived inputs, scored with the
    oracle-expressible token-sort levenshtein join (min 1 shared token,
    cutoff 85 - the reference's 85/85 shape, src/fuzzy_match_salary.py
    :128-129)."""
    return HA.fuzzy_match_salary(
        payroll_from_part(spark, sf_dir),
        postings_from_part(spark, sf_dir),
        prefilter_cutoff=1,
        score_cutoff=85,
        limit=limit,
        join_fn=fuzzy_join_tokensort,
        row_key="post_id",
    )


# ---------------------------------------------------------------------------
# DuckDB oracle: the identical chain as SQL CTEs
# ---------------------------------------------------------------------------

_LEV_SIM = (
    "CASE WHEN greatest(length({a}), length({b})) = 0 THEN 100.0 "
    "ELSE 100.0 * (1.0 - levenshtein({a}, {b}) / greatest(length({a}), length({b}))) END"
)


def _key_sql(expr: str) -> str:
    """Normalized token-sort key (twin of operators.fuzzy.token_sort_key)."""
    norm = normalize_text_sql(expr)
    return (
        "array_to_string(list_sort(list_filter(string_split("
        + norm
        + ", ' '), t -> t <> '')), ' ')"
    )


_BASE_CTES = f"""
payroll AS (
  SELECT p_name AS title_description,
         ROUND(p_retailprice * 75, 2) AS base_salary,
         p_brand AS pay_basis,
         ROUND(p_retailprice * 80, 2) AS regular_gross_paid,
         ROUND(p_retailprice * 5, 2) AS total_ot_paid,
         ROUND(p_retailprice * 2, 2) AS total_other_pay
  FROM part
  WHERE 2022 + p_partkey % 5 BETWEEN 2024 AND 2025
),
postings_raw AS (
  SELECT p_partkey AS post_id,
         CASE CAST(p_partkey % 3 AS INT)
           WHEN 0 THEN array_to_string(list_reverse(string_split(p_name, ' ')), ' ')
           WHEN 1 THEN substring(p_name, 1, CAST(length(p_name) AS INT) - 1)
           ELSE concat(string_split(p_name, ' ')[1], ' trainee distinct role')
         END AS business_title,
         ROUND(p_retailprice * 50, 2) AS salary_range_from,
         ROUND(p_retailprice * 100, 2) AS salary_range_to,
         CASE WHEN p_partkey % 29 = 0 THEN 'not-a-date'
              ELSE strftime(DATE '2024-01-01' + CAST(p_partkey % 300 AS INT), '%Y-%m-%d')
                   || 'T00:00:00.000' END AS posting_date,
         CASE WHEN p_partkey % 23 = 0 THEN NULL
              ELSE upper(strftime(DATE '2024-01-01' + CAST(p_partkey % 300 AS INT) + 45,
                                  '%d-%b-%Y')) END AS post_until
  FROM part WHERE p_partkey % 4 = 0
),
postings AS (
  SELECT post_id, business_title, salary_range_from, salary_range_to,
         strftime(strptime(posting_date, '%Y-%m-%dT%H:%M:%S.%g'),
                  '%Y-%m-%dT%H:%M:%S') AS posting_date,
         coalesce(post_until,
                  upper(strftime(CAST(strptime(posting_date, '%Y-%m-%dT%H:%M:%S.%g')
                                      AS DATE) + 30, '%d-%b-%Y'))) AS post_until
  FROM postings_raw
  WHERE posting_date <> 'not-a-date'
),
lk AS (
  SELECT business_title, {_key_sql('business_title')} AS lkey
  FROM (SELECT DISTINCT business_title FROM postings WHERE business_title IS NOT NULL)
),
rk AS (
  SELECT title_description, {_key_sql('title_description')} AS rkey
  FROM (SELECT DISTINCT title_description FROM payroll WHERE title_description IS NOT NULL)
),
ltok AS (SELECT business_title, lkey,
                unnest(list_distinct(string_split(lkey, ' '))) AS tok FROM lk),
rtok AS (SELECT title_description, rkey,
                unnest(list_distinct(string_split(rkey, ' '))) AS tok FROM rk),
cand AS (
  SELECT business_title, lkey, title_description, rkey
  FROM ltok JOIN rtok USING (tok)
  GROUP BY business_title, lkey, title_description, rkey
  HAVING COUNT(*) >= 1
),
pairs AS (
  SELECT business_title, title_description,
         CAST(ROUND({_LEV_SIM.format(a='lkey', b='rkey')}) AS INT) AS score
  FROM cand
  WHERE {_LEV_SIM.format(a='lkey', b='rkey')} >= 85
),
matches AS (
  SELECT po.post_id, po.business_title, po.salary_range_from, po.salary_range_to,
         po.posting_date, po.post_until,
         pa.title_description, pa.base_salary, pa.pay_basis,
         pa.regular_gross_paid, pa.total_ot_paid, pa.total_other_pay, pr.score
  FROM postings po
  JOIN pairs pr USING (business_title)
  JOIN payroll pa USING (title_description)
  WHERE pa.base_salary >= po.salary_range_from
    AND pa.base_salary <= po.salary_range_to
)
"""

_MATCH_COLS = (
    "business_title, salary_range_from, salary_range_to, posting_date, "
    "post_until, title_description, base_salary, pay_basis, "
    "regular_gross_paid, total_ot_paid, total_other_pay, score, post_id"
)


@query("fuzzy_salary_matches", f"WITH {_BASE_CTES} SELECT {_MATCH_COLS} FROM matches")
def q_fuzzy_salary_matches(spark, sf_dir):
    """EP2a: prep (cast+BETWEEN, lenient parse, drop, reformat, +30d
    impute) -> two-stage fuzzy join -> band filter, 12-column schema +
    post_id (reference: src/fuzzy_match_salary.py:27-189)."""
    return _matches(spark, sf_dir)


@query(
    "fuzzy_incremental_union",
    f"WITH {_BASE_CTES} SELECT {_MATCH_COLS} FROM matches",
)
def q_fuzzy_incremental_union(spark, sf_dir):
    """Incremental weekly-cadence matching (the reference re-matches ALL
    payroll x postings weekly, src/fuzzy_flows.py:16-23): postings split
    into a PRIOR batch (one-shot fuzzy_match_salary) and a DELTA batch
    scored by probing the persisted payroll-title blocking index
    (pipelines.hiring_audit.build_payroll_title_index /
    incremental_fuzzy_match_salary). The index itself is built in TWO
    GENERATIONS (base over the even-title-hash half of payroll +
    operators.fuzzy.extend_title_index's append-delta for the rest), so
    the row also proves index-side append maintenance lossless. The
    oracle is the one-shot full re-match SQL - hash equality IS the
    delta-fold ∪ prior == full claim. post_id = p_partkey with
    p_partkey % 4 = 0, so % 8 splits the postings into two non-trivial
    batches (0 mod 8 vs 4 mod 8)."""
    from nyc_government_hiring_audit_data_platform_spark.operators import (
        fuzzy as FZ,
    )

    payroll = payroll_from_part(spark, sf_dir)
    postings = postings_from_part(spark, sf_dir)
    prior_batch = postings.filter(F.col("post_id") % 8 == 0)
    delta_batch = postings.filter(F.col("post_id") % 8 == 4)
    prior = HA.fuzzy_match_salary(
        payroll, prior_batch, prefilter_cutoff=1, score_cutoff=85,
        join_fn=fuzzy_join_tokensort, row_key="post_id",
    )
    # generation split on the TITLE hash: base = even-hash titles,
    # extension batch = hash%4 != 0 (covers every odd-hash title so the
    # union is the full domain, AND overlaps the base on hash%4 == 2 so
    # the no-duplicate-rows half of the append claim is exercised too).
    # Years are passed explicitly to BOTH generations - the domains
    # must match by construction, not by coincident defaults. The base
    # index feeds two branches (the union and extend's membership
    # probe): persist it (harness clearCache()s between queries).
    h = F.xxhash64("title_description")
    base_index = HA.build_payroll_title_index(
        payroll.filter(h % 2 == 0), year_start=2024, year_end=2025
    ).persist()
    new_titles = HA._prep_payroll(payroll.filter(h % 4 != 0), 2024, 2025)
    index = base_index.unionByName(
        FZ.extend_title_index(base_index, new_titles, "title_description")
    )
    delta = HA.incremental_fuzzy_match_salary(
        payroll, index, delta_batch, prefilter_cutoff=1, score_cutoff=85,
        row_key="post_id",
    )
    return prior.unionByName(delta)


@query(
    "fuzzy_salary_matches_topn",
    f"""
    WITH {_BASE_CTES}
    SELECT {_MATCH_COLS} FROM (
      SELECT m.*, ROW_NUMBER() OVER (
        PARTITION BY post_id
        ORDER BY score DESC, title_description, base_salary,
                 pay_basis, regular_gross_paid, total_ot_paid, total_other_pay) AS rn
      FROM matches m
    ) WHERE rn <= 3
    """,
)
def q_fuzzy_salary_matches_topn(spark, sf_dir):
    """EP2a limit path: per-posting-row top-3 by score after the band
    filter (reference: src/utils.py:141-157)."""
    return _matches(spark, sf_dir, limit=3)


# the EP2b match CTEs (lightcast derivation + 75/75 tokensort pairs),
# shared by the row-level durations oracle and the incremental DISTINCT
# GOLD oracle so both verify the same match chain
_LIGHTCAST_MATCH_CTES = f"""
    lightcast AS (
      SELECT p_name || 's' AS occ,
             p_partkey AS total_postings,
             CASE WHEN p_partkey % 17 = 0 THEN NULL
                  ELSE ROUND(p_retailprice / 40, 1) END AS median_duration
      FROM part WHERE p_partkey % 6 = 0
    ),
    mt AS (
      SELECT business_title, {_key_sql('business_title')} AS lkey2
      FROM (SELECT DISTINCT business_title FROM matches)
    ),
    oc AS (
      SELECT occ, {_key_sql('occ')} AS rkey2
      FROM (SELECT DISTINCT occ FROM lightcast WHERE occ IS NOT NULL)
    ),
    mtok AS (SELECT business_title, lkey2,
                    unnest(list_distinct(string_split(lkey2, ' '))) AS tok FROM mt),
    otok AS (SELECT occ, rkey2,
                    unnest(list_distinct(string_split(rkey2, ' '))) AS tok FROM oc),
    cand2 AS (
      SELECT business_title, lkey2, occ, rkey2
      FROM mtok JOIN otok USING (tok)
      GROUP BY business_title, lkey2, occ, rkey2
      HAVING COUNT(*) >= 1
    ),
    pairs2 AS (
      SELECT business_title, occ,
             CAST(ROUND({_LEV_SIM.format(a='lkey2', b='rkey2')}) AS INT) AS score2
      FROM cand2
      WHERE {_LEV_SIM.format(a='lkey2', b='rkey2')} >= 75
    )"""


@query(
    "fuzzy_lightcast_durations",
    f"""
    WITH {_BASE_CTES},
    {_LIGHTCAST_MATCH_CTES}
    SELECT p.business_title,
           l.occ AS "lightcast_matched_occupation",
           p.score2 AS "lightcast_match_score",
           l.total_postings AS "Total Postings (Jan 2024 - Jun 2025)",
           l.median_duration AS "Median Posting Duration"
    FROM pairs2 p JOIN lightcast l ON p.occ = l.occ
    """,
)
def q_fuzzy_lightcast_durations(spark, sf_dir):
    """EP2b: distinct match titles vs Lightcast occupations, 75/75 shape,
    verbatim exotic column names (reference:
    src/fuzzy_match_jobs_durations.py:58-99)."""
    matches = _matches(spark, sf_dir)
    lightcast = lightcast_from_part(spark, sf_dir)
    return HA.fuzzy_match_durations(
        matches, lightcast, prefilter_cutoff=1, score_cutoff=75,
        join_fn=fuzzy_join_tokensort,
    )


# 4 BINDS on the part-derived titles (drops 131 -> 52 pairs at sf0.01,
# 140 -> 56 at sf0.1), so the hash row exercises the truncation itself,
# not just the uncapped fallthrough - both engines must rank and cut
# the SAME members in every over-occupied block.
_CAP = 4

@query(
    "fuzzy_block_capped",
    f"""
    WITH lk AS (
      SELECT business_title, {_key_sql('business_title')} AS lkey
      FROM (
        SELECT DISTINCT
          CASE CAST(p_partkey % 3 AS INT)
            WHEN 0 THEN array_to_string(list_reverse(string_split(p_name, ' ')), ' ')
            WHEN 1 THEN substring(p_name, 1, CAST(length(p_name) AS INT) - 1)
            ELSE concat(string_split(p_name, ' ')[1], ' trainee distinct role')
          END AS business_title
        FROM part WHERE p_partkey % 4 = 0
      ) WHERE business_title IS NOT NULL
    ),
    rk AS (
      SELECT title_description, {_key_sql('title_description')} AS rkey
      FROM (SELECT DISTINCT p_name AS title_description FROM part)
      WHERE title_description IS NOT NULL
    ),
    ltok AS (
      SELECT * FROM (
        SELECT business_title, lkey,
               unnest(list_distinct(string_split(lkey, ' '))) AS tok
        FROM lk)
      QUALIFY ROW_NUMBER() OVER (PARTITION BY tok ORDER BY lkey, business_title)
              <= {_CAP}
    ),
    rtok AS (
      SELECT * FROM (
        SELECT title_description, rkey,
               unnest(list_distinct(string_split(rkey, ' '))) AS tok
        FROM rk)
      QUALIFY ROW_NUMBER() OVER (PARTITION BY tok ORDER BY rkey, title_description)
              <= {_CAP}
    ),
    cand AS (
      SELECT business_title, lkey, title_description, rkey
      FROM ltok JOIN rtok USING (tok)
      GROUP BY business_title, lkey, title_description, rkey
      HAVING COUNT(*) >= 1
    )
    SELECT business_title, title_description,
           CAST(ROUND({_LEV_SIM.format(a='lkey', b='rkey')}) AS INT) AS score
    FROM cand
    WHERE {_LEV_SIM.format(a='lkey', b='rkey')} >= 85
    """,
)
def q_fuzzy_block_capped(spark, sf_dir):
    """Hot-token occupancy cap on the blocking join (SCALING.md r9 skew
    probe: AQE's input-byte skew split cannot see a quadratic-OUTPUT
    token - 7 MB in, 13e9 pairs out at x100 - so the cap bounds
    per-token candidates at max_block^2 with documented subset-recall).
    The DuckDB twin applies the identical deterministic
    (key, title)-ordered truncation via QUALIFY, proving both engines
    cap the same members. The tokensort path's lossless length
    prefilter needs no twin clause: sim >= cutoff implies the length
    bound, so it never changes output."""
    postings = postings_from_part(spark, sf_dir).select("business_title")
    payroll = payroll_from_part(spark, sf_dir).select("title_description")
    from nyc_government_hiring_audit_data_platform_spark.operators.fuzzy import (
        fuzzy_title_pairs_tokensort,
    )

    return fuzzy_title_pairs_tokensort(
        postings, payroll, "business_title", "title_description",
        min_shared_tokens=1, score_cutoff=85, max_block=_CAP,
    ).select(
        F.col("left_title").alias("business_title"),
        F.col("right_title").alias("title_description"),
        "score",
    )


@query(
    "fuzzy_block_salted",
    f"""
    WITH lk AS (
      SELECT business_title, {_key_sql('business_title')} AS lkey
      FROM (
        SELECT DISTINCT
          CASE CAST(p_partkey % 3 AS INT)
            WHEN 0 THEN array_to_string(list_reverse(string_split(p_name, ' ')), ' ')
            WHEN 1 THEN substring(p_name, 1, CAST(length(p_name) AS INT) - 1)
            ELSE concat(string_split(p_name, ' ')[1], ' trainee distinct role')
          END AS business_title
        FROM part WHERE p_partkey % 4 = 0
      ) WHERE business_title IS NOT NULL
    ),
    rk AS (
      SELECT title_description, {_key_sql('title_description')} AS rkey
      FROM (SELECT DISTINCT p_name AS title_description FROM part)
      WHERE title_description IS NOT NULL
    ),
    ltok AS (SELECT business_title, lkey,
                    unnest(list_distinct(string_split(lkey, ' '))) AS tok FROM lk),
    rtok AS (SELECT title_description, rkey,
                    unnest(list_distinct(string_split(rkey, ' '))) AS tok FROM rk),
    cand AS (
      SELECT business_title, lkey, title_description, rkey
      FROM ltok JOIN rtok USING (tok)
      GROUP BY business_title, lkey, title_description, rkey
      HAVING COUNT(*) >= 1
    )
    SELECT business_title, title_description,
           CAST(ROUND({_LEV_SIM.format(a='lkey', b='rkey')}) AS INT) AS score
    FROM cand
    WHERE {_LEV_SIM.format(a='lkey', b='rkey')} >= 85
    """,
)
def q_fuzzy_block_salted(spark, sf_dir):
    """LOSSLESS hot-key parallelization (SCALING.md r9): tokens over the
    occupancy threshold get their left rows hash-salted across buckets
    and their right rows replicated once per bucket, so a hot token's
    quadratic enumeration runs in salt_buckets tasks instead of one.
    The oracle is the plain UNSALTED pair SQL - hash equality IS the
    cross-engine proof that salting never changes output (threshold 8
    makes most color tokens hot here, so the salted lane really runs)."""
    postings = postings_from_part(spark, sf_dir).select("business_title")
    payroll = payroll_from_part(spark, sf_dir).select("title_description")
    from nyc_government_hiring_audit_data_platform_spark.operators.fuzzy import (
        fuzzy_title_pairs_tokensort,
    )

    return fuzzy_title_pairs_tokensort(
        postings, payroll, "business_title", "title_description",
        min_shared_tokens=1, score_cutoff=85,
        salt_buckets=4, hot_occupancy=8,
    ).select(
        F.col("left_title").alias("business_title"),
        F.col("right_title").alias("title_description"),
        "score",
    )


_GOLD_UNIQUE_SQL = f"""
    WITH {_BASE_CTES}
    SELECT business_title AS posted_job_title,
           MAX(title_description) AS payroll_job_title,
           MAX(score) AS match_score,
           MAX(salary_range_from) AS posted_salary_range_from,
           MAX(salary_range_to) AS posted_salary_range_to,
           MAX(base_salary) AS base_salary,
           MAX(CAST(date_diff('day',
                 CAST(strptime(posting_date, '%Y-%m-%dT%H:%M:%S') AS DATE),
                 CAST(strptime(post_until, '%d-%b-%Y') AS DATE)) AS INT))
             AS posting_duration_days,
           MAX(regular_gross_paid) AS regular_gross_paid,
           MAX(total_ot_paid) AS total_ot_paid,
           MAX(total_other_pay) AS total_other_pay
    FROM matches
    GROUP BY business_title
    """


@query("gold_salary_matches_unique", _GOLD_UNIQUE_SQL)
def q_gold_salary_matches_unique(spark, sf_dir):
    """EP3: GOLD group-by-MAX dedup table (reference: sql/cleaned.sql:
    28-42) on the real fuzzy-match output."""
    return HA.gold_salary_matches_unique(_matches(spark, sf_dir))


@query("gold_unique_incremental", _GOLD_UNIQUE_SQL)
def q_gold_unique_incremental(spark, sf_dir):
    """EP3 maintained INCREMENTALLY: the same GOLD unique table built
    by splitting the match stream into two batches (even/odd post_id),
    folding each into the persisted-style partial-MAX state
    (HA.gold_matches_state / gold_matches_state_refresh over
    operators/incremental.py), and finalizing from the state alone.
    The oracle is IDENTICAL to gold_salary_matches_unique's one-shot
    SQL - hash equality proves the reference's weekly full CTAS can be
    replaced by per-batch state folds with bit-identical output."""
    # persist: both parity batches filter the SAME fuzzy-match chain -
    # uncached, the union of the two folds would run the blocked-join
    # scoring pipeline twice (module caching contract: the harness
    # clearCache()s between queries)
    matches = _matches(spark, sf_dir).persist()
    b1 = matches.filter(F.col("post_id") % 2 == 0)
    b2 = matches.filter(F.col("post_id") % 2 == 1)
    state = HA.gold_matches_state(b1)
    state = HA.gold_matches_state_refresh(state, b2)
    return HA.gold_salary_matches_unique_from_state(state)


@query(
    "gold_lightcast_unique_incremental",
    f"""
    WITH {_BASE_CTES},
    {_LIGHTCAST_MATCH_CTES}
    SELECT DISTINCT p.business_title AS title,
           l.occ AS lightcast_matched_occupation,
           l.total_postings,
           l.median_duration AS median_posting_duration
    FROM pairs2 p JOIN lightcast l ON p.occ = l.occ
    """,
)
def q_gold_lightcast_unique_incremental(spark, sf_dir):
    """EP3's DISTINCT GOLD table (sql/cleaned.sql:44-51) maintained
    INCREMENTALLY: DISTINCT over batches is exactly a COUNT state keyed
    by the full 4-column projection - a key is in the set iff its
    retained count is > 0 (exact under retractions too: a key counting
    to zero drops at finalize). Two batch folds (score parity splits
    the durations rows) through HA.gold_durations_state /
    gold_durations_state_refresh; the oracle is the one-shot
    SELECT DISTINCT - hash equality proves the weekly full CTAS is
    replaceable by per-batch folds."""
    durations = HA.fuzzy_match_durations(
        _matches(spark, sf_dir),
        lightcast_from_part(spark, sf_dir),
        prefilter_cutoff=1,
        score_cutoff=75,
        join_fn=fuzzy_join_tokensort,
    ).persist()
    b1 = durations.filter(F.col("lightcast_match_score") % 2 == 0)
    b2 = durations.filter(F.col("lightcast_match_score") % 2 == 1)
    state = HA.gold_durations_state(b1)
    state = HA.gold_durations_state_refresh(state, b2)
    return HA.gold_durations_unique_from_state(state)


# ---------------------------------------------------------------------------
# direct driver rows for the published scorer kernels (U1/U2 in SURVEY.md
# §2.10; reference kernel: src/fuzzy_match_salary.py:119-140)
#
# The hash-green fuzzy chain above runs the oracle-expressible token-sort
# levenshtein twin; these two queries verify the REAL pandas-UDF kernels
# (operators.fuzzy.token_set_ratio_udf / wratio_udf) against a DuckDB
# oracle that re-derives the published algorithm in pure list SQL:
# simple_ratio = 200*LCS/(|a|+|b|) with the LCS computed by a
# recursive-CTE row-DP (cur[j] = max(prev[j], max over matching k<=j of
# prev[k-1]+1); valid because DP rows of LCS are nondecreasing, so the
# prefix-max collapses to prev[j]). The pair set derives
# deterministically from `part` on both engines: every 50th part paired
# with (a) its postings-style perturbed title and (b) the part 101 keys
# later - reorder / truncation / suffix / unrelated pairs cover the
# inter=''/inter<>'' branches and the full score range.
# ---------------------------------------------------------------------------

_PERTURB_SQL = """CASE CAST(p_partkey % 3 AS INT)
           WHEN 0 THEN array_to_string(list_reverse(string_split(p_name, ' ')), ' ')
           WHEN 1 THEN substring(p_name, 1, CAST(length(p_name) AS INT) - 1)
           ELSE concat(string_split(p_name, ' ')[1], ' trainee distinct role')
         END"""

_KERNEL_PAIRS_SQL = f"""
base AS (SELECT p_partkey, p_name FROM part WHERE p_partkey % 50 = 0),
kpairs AS (
  SELECT p_partkey * 2 AS pair_id,
         {normalize_text_sql('p_name')} AS a,
         {normalize_text_sql(_PERTURB_SQL)} AS b
  FROM base
  UNION ALL
  SELECT b1.p_partkey * 2 + 1,
         {normalize_text_sql('b1.p_name')},
         {normalize_text_sql('p2.p_name')}
  FROM base b1 JOIN part p2 ON p2.p_partkey = b1.p_partkey + 101
)"""

# Sorted-token derivations (DuckDB). array_to_string of an EMPTY list is
# NULL in DuckDB, hence the coalesce on every join-back.
_TS = "coalesce(array_to_string(list_sort({x}), ' '), '')"


def _toksets_sql(src: str) -> str:
    """tok/parts3 CTE pair (token-set decomposition) over ``src`` - one
    definition for BOTH kernel oracles so a fix to the derivation (e.g.
    the empty-list coalesce) cannot silently diverge between them."""
    return f"""
tok AS (
  SELECT pair_id, a, b,
         list_distinct(list_filter(string_split(a, ' '), t -> t <> '')) AS ta,
         list_distinct(list_filter(string_split(b, ' '), t -> t <> '')) AS tb
  FROM {src}
),
parts3 AS (
  SELECT pair_id, a, b,
         {_TS.format(x='list_intersect(ta, tb)')} AS inter,
         trim({_TS.format(x='list_intersect(ta, tb)')} || ' ' ||
              {_TS.format(x='list_filter(ta, t -> NOT list_contains(tb, t))')}) AS ca,
         trim({_TS.format(x='list_intersect(ta, tb)')} || ' ' ||
              {_TS.format(x='list_filter(tb, t -> NOT list_contains(ta, t))')}) AS cb,
         (len(ta) = 0 AND len(tb) = 0) AS both_empty
  FROM tok
)"""


_TOKSETS_SQL = _toksets_sql("kpairs")

# LCS DP over (pair_id, s1, s2, scale) variant rows -> per-pair max of
# scale * simple_ratio(s1, s2).
_LCS_SCORE_SQL = """
dp AS (
  SELECT pair_id, s1, s2, scale, 0 AS i,
         list_transform(range(0, length(s2) + 2), x -> 0) AS prev
  FROM variants
  UNION ALL
  SELECT pair_id, s1, s2, scale, i + 1,
         list_prepend(0, [ greatest(prev[j+1], coalesce(list_max(
             [prev[k] + 1 FOR k IN range(1, j + 1) IF s2[k] = s1[i + 1]]), 0))
           FOR j IN range(1, length(s2) + 1) ])
  FROM dp WHERE i < length(s1)
),
ratios AS (
  SELECT pair_id,
         scale * CASE WHEN length(s1) + length(s2) = 0 THEN 100.0
                 ELSE 200.0 * prev[length(s2) + 1] / (length(s1) + length(s2)) END AS r
  FROM dp WHERE i = length(s1)
),
scores AS (SELECT pair_id, max(r) AS score FROM ratios GROUP BY pair_id)"""

# Python's round() is banker's (half-to-even); DuckDB's is half-away.
# Scores are exact doubles on both engines, so the tie branch is exact.
_BANKERS_INT = (
    "CAST(CASE WHEN {x} - floor({x}) = 0.5 "
    "THEN floor({x}) + CAST(CAST(floor({x}) AS BIGINT) % 2 AS DOUBLE) "
    "ELSE round({x}) END AS INT)"
)


def _kernel_pairs(spark, sf_dir):
    """Spark twin of _KERNEL_PAIRS_SQL (same derivation, same ids)."""
    p = table(spark, sf_dir, "part")
    base = p.filter(F.col("p_partkey") % 50 == 0)
    toks = F.split("p_name", " ")
    perturbed_title = (
        F.when(F.col("p_partkey") % 3 == 0, F.concat_ws(" ", F.reverse(toks)))
        .when(
            F.col("p_partkey") % 3 == 1,
            F.expr("substring(p_name, 1, length(p_name) - 1)"),
        )
        .otherwise(F.concat(F.element_at(toks, 1), F.lit(" trainee distinct role")))
    )
    pert = base.select(
        (F.col("p_partkey") * 2).alias("pair_id"),
        normalize_text("p_name").alias("a"),
        normalize_text(perturbed_title).alias("b"),
    )
    p2 = p.select(F.col("p_partkey").alias("k2"), F.col("p_name").alias("n2"))
    neigh = base.join(p2, F.col("k2") == F.col("p_partkey") + 101).select(
        (F.col("p_partkey") * 2 + 1).alias("pair_id"),
        normalize_text("p_name").alias("a"),
        normalize_text("n2").alias("b"),
    )
    return pert.unionByName(neigh)


@query(
    "token_set_kernel",
    f"""
    WITH RECURSIVE
    {_KERNEL_PAIRS_SQL},
    {_TOKSETS_SQL},
    variants AS (
      SELECT pair_id, s1, s2, 1.0 AS scale FROM (
        SELECT pair_id, ca AS s1, cb AS s2 FROM parts3
        WHERE inter = '' AND NOT both_empty
        UNION ALL SELECT pair_id, inter, ca FROM parts3 WHERE inter <> ''
        UNION ALL SELECT pair_id, inter, cb FROM parts3 WHERE inter <> ''
        UNION ALL SELECT pair_id, ca, cb FROM parts3 WHERE inter <> ''
      )
    ),
    {_LCS_SCORE_SQL}
    SELECT p.pair_id, p.a, p.b,
           CASE WHEN p.both_empty THEN 100
                ELSE {_BANKERS_INT.format(x='s.score')} END AS tset
    FROM parts3 p LEFT JOIN scores s USING (pair_id)
    """,
)
def q_token_set_kernel(spark, sf_dir):
    """U1 kernel, hash-verified directly: the real Arrow pandas-UDF
    token_set_ratio (published fuzzywuzzy algorithm, operators/fuzzy.py)
    scored over a deterministic part-derived pair set; the oracle
    recomputes the identical algorithm in DuckDB list SQL with the LCS
    as a recursive-CTE DP (reference kernel:
    src/fuzzy_match_salary.py:119-126)."""
    from nyc_government_hiring_audit_data_platform_spark.operators.fuzzy import (
        token_set_ratio_udf,
    )

    return _kernel_pairs(spark, sf_dir).select(
        "pair_id", "a", "b",
        token_set_ratio_udf(F.col("a"), F.col("b")).alias("tset"),
    )


# WRatio's short-length branch (len_ratio < 1.5): max(base ratio,
# 0.95*token_sort, 0.95*token_set). The pair filter below keeps exactly
# the rows that take this branch, COMPUTED IDENTICALLY on both engines
# (double division then <, never a multiplied rearrangement).
_WRATIO_FILTER = (
    "length({a}) > 0 AND length({b}) > 0 AND "
    "CAST(greatest(length({a}), length({b})) AS DOUBLE) / "
    "least(length({a}), length({b})) < 1.5"
)


@query(
    "wratio_kernel",
    f"""
    WITH RECURSIVE
    {_KERNEL_PAIRS_SQL},
    kpairs_f AS (
      SELECT * FROM kpairs WHERE {_WRATIO_FILTER.format(a='a', b='b')}
    ),
    {_toksets_sql('kpairs_f')},
    variants AS (
      SELECT pair_id, a AS s1, b AS s2, 1.0 AS scale FROM parts3
      UNION ALL
      SELECT pair_id,
             {_TS.format(x="list_filter(string_split(a, ' '), t -> t <> '')")},
             {_TS.format(x="list_filter(string_split(b, ' '), t -> t <> '')")},
             0.95
      FROM parts3
      UNION ALL
      SELECT pair_id, s1, s2, 0.95 FROM (
        SELECT pair_id, ca AS s1, cb AS s2 FROM parts3
        WHERE inter = '' AND NOT both_empty
        UNION ALL SELECT pair_id, inter, ca FROM parts3 WHERE inter <> ''
        UNION ALL SELECT pair_id, inter, cb FROM parts3 WHERE inter <> ''
        UNION ALL SELECT pair_id, ca, cb FROM parts3 WHERE inter <> ''
      )
    ),
    {_LCS_SCORE_SQL}
    SELECT p.pair_id, p.a, p.b, s.score AS wr
    FROM parts3 p JOIN scores s USING (pair_id)
    """,
)
def q_wratio_kernel(spark, sf_dir):
    """U2 kernel, hash-verified directly: the real Arrow pandas-UDF
    WRatio (published fuzzywuzzy blend, operators/fuzzy.py) on the pairs
    taking its len_ratio<1.5 branch; the oracle rebuilds
    max(ratio, 0.95*token_sort, 0.95*token_set) from the same LCS DP.
    Unrounded doubles: both engines run the identical IEEE operation
    sequence, so the bits match (reference kernel:
    src/fuzzy_match_salary.py:132-140)."""
    from nyc_government_hiring_audit_data_platform_spark.operators.fuzzy import (
        wratio_udf,
    )

    pr = _kernel_pairs(spark, sf_dir).filter(
        F.expr(_WRATIO_FILTER.format(a="a", b="b"))
    )
    return pr.select(
        "pair_id", "a", "b", wratio_udf(F.col("a"), F.col("b")).alias("wr")
    )


_INDEX_CAP = 4

_CAPPED_CTES = f"""
rtok_capped AS (
  SELECT title_description, rkey, tok FROM (
    SELECT title_description, rkey, tok,
           ROW_NUMBER() OVER (
             PARTITION BY tok ORDER BY rkey, title_description
           ) AS occ
    FROM rtok
  ) WHERE occ <= {_INDEX_CAP}
),
cand_capped AS (
  SELECT business_title, lkey, title_description, rkey
  FROM ltok JOIN rtok_capped USING (tok)
  GROUP BY business_title, lkey, title_description, rkey
),
pairs_capped AS (
  SELECT business_title, title_description,
         CAST(ROUND({_LEV_SIM.format(a='lkey', b='rkey')}) AS INT) AS score
  FROM cand_capped
  WHERE {_LEV_SIM.format(a='lkey', b='rkey')} >= 85
),
matches_capped AS (
  SELECT po.post_id, po.business_title, po.salary_range_from, po.salary_range_to,
         po.posting_date, po.post_until,
         pa.title_description, pa.base_salary, pa.pay_basis,
         pa.regular_gross_paid, pa.total_ot_paid, pa.total_other_pay, pr.score
  FROM postings po
  JOIN pairs_capped pr USING (business_title)
  JOIN payroll pa USING (title_description)
  WHERE pa.base_salary >= po.salary_range_from
    AND pa.base_salary <= po.salary_range_to
    AND po.post_id % 8 = 4
)
"""


@query(
    "fuzzy_index_compaction",
    f"WITH {_BASE_CTES}, {_CAPPED_CTES} "
    f"SELECT {_MATCH_COLS} FROM matches_capped",
)
def q_fuzzy_index_compaction(spark, sf_dir):
    """Index compaction exactness on real data (round-11 VERDICT ask
    #2): the payroll-title index is built CAPPED at R={cap} in two
    generations (base over even-hash titles + a capped append delta for
    the rest - generation-local truncation, so unioned occupancy can
    exceed the cap), then operators.fuzzy.compact_title_index re-caps
    the union, and a delta postings batch probes the result. The oracle
    is an INDEPENDENT SQL rendering of the fresh capped rebuild
    (ROW_NUMBER per token over (rkey, title), kept <= cap - exactly
    _cap_block_occupancy's deterministic lowest-members rule): hash
    equality IS the append+compact == capped-rebuild claim, end to end
    through candidate generation, scoring, band filter and row
    re-attach. Subset-recall semantics are SHARED by construction -
    both sides drop the same above-cap candidates. Deliberately NOT
    reusing the uncapped oracle: at cap 4 the hot name-word tokens
    really truncate, so this row's matches are a strict subset of
    fuzzy_incremental_union's."""
    from nyc_government_hiring_audit_data_platform_spark.operators import (
        fuzzy as FZ,
    )

    payroll = payroll_from_part(spark, sf_dir)
    postings = postings_from_part(spark, sf_dir)
    delta_batch = postings.filter(F.col("post_id") % 8 == 4)
    h = F.xxhash64("title_description")
    base_index = HA.build_payroll_title_index(
        payroll.filter(h % 2 == 0), year_start=2024, year_end=2025,
        max_block=_INDEX_CAP,
    ).persist()
    new_titles = HA._prep_payroll(payroll.filter(h % 4 != 0), 2024, 2025)
    appended = base_index.unionByName(
        FZ.extend_title_index(
            base_index, new_titles, "title_description",
            max_block=_INDEX_CAP,
        )
    )
    index = FZ.compact_title_index(appended, _INDEX_CAP)
    return HA.incremental_fuzzy_match_salary(
        payroll, index, delta_batch, prefilter_cutoff=1, score_cutoff=85,
        row_key="post_id",
    )


q_fuzzy_index_compaction.__doc__ = q_fuzzy_index_compaction.__doc__.replace(
    "{cap}", str(_INDEX_CAP)
)


@query(
    "matches_corpus_compaction",
    f"WITH {_BASE_CTES} SELECT {_MATCH_COLS} FROM matches",
)
def q_matches_corpus_compaction(spark, sf_dir):
    """Matches-corpus compaction exactness on real data (round-12
    VERDICT ask #1): the weekly ingest's per-batch match outputs are
    laid out exactly as run_fuzzy_match_ingest writes them (b{id}
    parquet + meta-lands-last _meta.json), then
    pipelines.hiring_audit.compact_matches_corpus folds them into the
    versioned base through BOTH lanes - b0 folds into mbase_v1, b1
    lands afterwards and folds incrementally into mbase_v2 (base ⊎ new
    batch, the production cadence) - and read_ingested_matches reads
    the result back through the manifest. The oracle is the one-shot
    full re-match SQL (fuzzy_incremental_union's oracle, unchanged):
    hash equality IS the fold-preserves-the-multiset claim, end to end
    through the manifest swap, the meta-only folded dirs and the
    base+unfolded read. Batches split on post_id % 8 (postings ids are
    % 4 == 0, so {0,4} mod 8 partitions them in two). Corpus dirs land
    under a per-sf temp dir, WIPED at entry - the lifecycle
    bookkeeping (completed-batch metas, the manifest) must start
    fresh each run."""
    import hashlib
    import os
    import shutil
    import tempfile

    matches_dir = os.path.join(
        tempfile.gettempdir(),
        "spark_graft_matches_fold",
        hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:12],
    )
    shutil.rmtree(matches_dir, ignore_errors=True)

    payroll = payroll_from_part(spark, sf_dir)
    postings = postings_from_part(spark, sf_dir)
    # One match pass, split at the write edge (r13, guide §8: decide
    # once on the full relation, attach the batch split cheaply).
    # Matching is per-posting-row independent - prep is row-local, the
    # blocking join and the per-row top-N window never look across
    # posting rows - so filter∘match == match∘filter and each b{id}
    # holds byte-identical rows to a per-batch match, while the
    # payroll-side prep + blocking index build runs ONCE instead of
    # once per batch (measured: 1.7 s per per-batch match lap, fixed
    # cost dominated by the payroll side). The fold lanes (meta,
    # per-batch dirs, incremental base ⊎ batch) are untouched - the
    # exactness claim this query hashes is about the FOLD, and the
    # folded multiset is identical either way.
    matched = HA.fuzzy_match_salary(
        payroll, postings, prefilter_cutoff=1, score_cutoff=85,
        join_fn=fuzzy_join_tokensort, row_key="post_id",
    ).persist()
    for bid, k in enumerate((0, 4)):
        matched.filter(F.col("post_id") % 8 == k).write.mode(
            "overwrite"
        ).parquet(os.path.join(matches_dir, f"b{bid}"))
        HA._write_batch_meta(
            matches_dir, f"b{bid}",
            {"batch_id": bid, "generations": [], "payroll_deltas": [],
             "exchanges": None, "limit": None},
        )
        # standalone corpus (no live lifecycle writers): explicit opt-out
        folded = HA.compact_matches_corpus(spark, matches_dir, lease_dir=None)
        assert folded == [f"b{bid}"], folded
    matched.unpersist()
    return HA.read_ingested_matches(spark, matches_dir)
