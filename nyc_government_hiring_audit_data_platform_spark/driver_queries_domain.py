"""Domain-pipeline driver queries (rows-only checks).

The fuzzy scorers (token_set_ratio / WRatio) are not SQL-expressible in
DuckDB, so these queries intentionally have NO oracle entry - the driver
records the weaker rows-only check (per the driver contract). Their
oracle-checkable analogues are the levenshtein-based similarity_join*
queries in ``driver_queries``. Unit + invariant coverage lives in
``tests/test_fuzzy.py`` (pinned scorer values, blocked-join-vs-bruteforce
equality, pipeline invariants).

The pipeline runs on the deterministic FIXTURES.md tables (the Socrata /
XLSX inputs are not reachable here), so ``sf_dir`` is ignored.
"""

from __future__ import annotations

from nyc_government_hiring_audit_data_platform_spark.driver_queries import query
from nyc_government_hiring_audit_data_platform_spark.pipelines import hiring_audit as HA


@query("fuzzy_salary_matches")
def q_fuzzy_salary_matches(spark, sf_dir):
    """EP2a: payroll<->postings two-stage fuzzy join (85/85) + band
    filter, 12-column schema (reference: src/fuzzy_match_salary.py)."""
    payroll = HA.make_payroll_fixture(spark)
    postings = HA.make_postings_fixture(spark)
    return HA.fuzzy_match_salary(payroll, postings)


@query("fuzzy_salary_matches_topn")
def q_fuzzy_salary_matches_topn(spark, sf_dir):
    """EP2a limit path: per-job top-3 by score, then band filter
    (reference: src/utils.py:141-157)."""
    payroll = HA.make_payroll_fixture(spark)
    postings = HA.make_postings_fixture(spark)
    return HA.fuzzy_match_salary(payroll, postings, limit=3)


@query("fuzzy_lightcast_durations")
def q_fuzzy_lightcast_durations(spark, sf_dir):
    """EP2b: matches<->Lightcast fuzzy join (75/75) with verbatim exotic
    column names (reference: src/fuzzy_match_jobs_durations.py)."""
    payroll = HA.make_payroll_fixture(spark)
    postings = HA.make_postings_fixture(spark)
    lightcast = HA.make_lightcast_fixture(spark)
    matches = HA.fuzzy_match_salary(payroll, postings)
    return HA.fuzzy_match_durations(matches, lightcast)


@query("gold_salary_matches_unique")
def q_gold_salary_matches_unique(spark, sf_dir):
    """EP3: GOLD group-by-MAX dedup table (reference: sql/cleaned.sql:
    28-42) on the real fuzzy-match output."""
    payroll = HA.make_payroll_fixture(spark)
    postings = HA.make_postings_fixture(spark)
    matches = HA.fuzzy_match_salary(payroll, postings)
    return HA.gold_salary_matches_unique(matches)
