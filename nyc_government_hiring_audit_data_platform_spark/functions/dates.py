"""Date/timestamp expression chain equivalents of the reference's
Python date handling (SURVEY.md F2-F6)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Socrata posting_date format, e.g. 2024-06-03T00:00:00.000
# (reference: src/fuzzy_match_salary.py:76). Parsing uses the try_
# variants so the null-on-failure contract (the reference's
# strict=False) holds in ANY session - Spark 4 defaults ANSI ON, where
# plain to_timestamp/to_date THROW on unparseable input.
POSTING_TS_FMT = "yyyy-MM-dd'T'HH:mm:ss[.SSS]"
POSTING_TS_OUT_FMT = "yyyy-MM-dd'T'HH:mm:ss"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def parse_posting_ts(col: Column | str) -> Column:
    """Lenient ISO timestamp parse; null on failure (F2), even under
    ANSI mode."""
    return F.try_to_timestamp(_c(col), F.lit(POSTING_TS_FMT))


def format_posting_ts(col: Column | str) -> Column:
    """Back to the reference's canonical string form (F3)."""
    return F.date_format(_c(col), POSTING_TS_OUT_FMT)


def parse_post_until(col: Column | str) -> Column:
    """Parse ``17-SEP-2025`` (uppercased %d-%b-%Y, F4).

    Java's MMM parser is case-sensitive ("Sep", not "SEP"), so fold the
    month token to title case with expressions first. Handles any casing.
    """
    c = _c(col)
    parts = F.split(c, "-")
    # F.get (not getItem): null-tolerant on short arrays - ANSI mode
    # throws INVALID_ARRAY_INDEX for getItem on e.g. a 2-part string
    month = F.get(parts, 1)
    month_tc = F.concat(
        F.upper(F.substring(month, 1, 1)), F.lower(F.substring(month, 2, 2))
    )
    fixed = F.concat_ws("-", F.get(parts, 0), month_tc, F.get(parts, 2))
    return F.try_to_date(fixed, "dd-MMM-yyyy")


def format_post_until(col: Column | str) -> Column:
    """Format a date back to uppercased ``%d-%b-%Y`` (reference:
    src/utils.py:135 uppercases the strftime output)."""
    return F.upper(F.date_format(_c(col), "dd-MMM-yyyy"))


def impute_post_until(post_until: Column | str, posting_date: Column | str) -> Column:
    """Null-date imputation (+30 days, F6; reference: src/utils.py:118-138).

    If ``post_until`` is null and ``posting_date`` parses, substitute
    posting_date + 30 days formatted as uppercased %d-%b-%Y.
    """
    return F.coalesce(
        _c(post_until),
        format_post_until(F.date_add(F.to_date(parse_posting_ts(posting_date)), 30)),
    )


def posting_duration_days(post_until: Column | str, posting_date: Column | str) -> Column:
    """`CAST(post_until::DATE - posting_date::DATE AS INTEGER)`` (F5;
    reference: sql/cleaned.sql:10,36)."""
    return F.datediff(
        parse_post_until(post_until), F.to_date(parse_posting_ts(posting_date))
    ).cast("int")


def epoch_seconds_sql(ts_expr: str = "ts") -> str:
    """DuckDB whole-seconds-since-epoch, truncated exactly like Spark's
    ``unix_seconds`` (floor for the positive epochs this data has).
    The ONE definition both engines' sequence/audit queries share - a
    second copy that drifts (e.g. a negative-epoch fix applied to one
    site) would silently diverge the engines."""
    return (
        f"date_diff('second', TIMESTAMP '1970-01-01 00:00:00', "
        f"date_trunc('second', {ts_expr}))"
    )
