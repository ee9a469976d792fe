"""Explicit StructType schemas.

The reference infers schemas from JSON (Socrata returns all-string rows,
reference: src/data_ingestion.py:35) and declares the fuzzy-match output
schema explicitly (reference: src/fuzzy_match_salary.py:94-107). Schema
inference is a correctness hazard at scale, so every boundary here is
pinned.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Domain input schemas (FIXTURES.md §1-3). Socrata delivers JSON strings;
# numeric casts happen in the engine exactly as the reference does
# downstream (reference: src/fuzzy_match_salary.py:68-70).
# ---------------------------------------------------------------------------

PAYROLL_RAW = T.StructType(
    [
        T.StructField("fiscal_year", T.StringType()),
        T.StructField("title_description", T.StringType()),
        T.StructField("base_salary", T.StringType()),
        T.StructField("pay_basis", T.StringType()),
        T.StructField("regular_gross_paid", T.StringType()),
        T.StructField("total_ot_paid", T.StringType()),
        T.StructField("total_other_pay", T.StringType()),
    ]
)

PAYROLL = T.StructType(
    [
        T.StructField("fiscal_year", T.IntegerType()),
        T.StructField("title_description", T.StringType()),
        T.StructField("base_salary", T.DoubleType()),
        T.StructField("pay_basis", T.StringType()),
        T.StructField("regular_gross_paid", T.DoubleType()),
        T.StructField("total_ot_paid", T.DoubleType()),
        T.StructField("total_other_pay", T.DoubleType()),
    ]
)

JOB_POSTINGS = T.StructType(
    [
        T.StructField("business_title", T.StringType()),
        T.StructField("salary_range_from", T.DoubleType()),
        T.StructField("salary_range_to", T.DoubleType()),
        T.StructField("posting_date", T.StringType()),  # %Y-%m-%dT%H:%M:%S%.f
        T.StructField("post_until", T.StringType()),  # %d-%b-%Y uppercased
    ]
)

# Column names kept verbatim from the XLSX sheet - spaces/parens are a
# quoting test (reference: src/fuzzy_match_jobs_durations.py:44,
# sql/cleaned.sql:21-22).
LIGHTCAST = T.StructType(
    [
        T.StructField("Occupation (SOC)", T.StringType()),
        T.StructField("Total Postings (Jan 2024 - Jun 2025)", T.LongType()),
        T.StructField("Median Posting Duration", T.DoubleType()),
    ]
)

# 12-column fuzzy-match output (reference: src/fuzzy_match_salary.py:94-107).
# Reference uses UInt8 for score; Spark has no unsigned -> IntegerType,
# matching what GOLD calls it anyway (reference: project_report.md:40).
SALARY_MATCHES = T.StructType(
    [
        T.StructField("business_title", T.StringType()),
        T.StructField("salary_range_from", T.DoubleType()),
        T.StructField("salary_range_to", T.DoubleType()),
        T.StructField("posting_date", T.StringType()),
        T.StructField("post_until", T.StringType()),
        T.StructField("title_description", T.StringType()),
        T.StructField("base_salary", T.DoubleType()),
        T.StructField("pay_basis", T.StringType()),
        T.StructField("regular_gross_paid", T.DoubleType()),
        T.StructField("total_ot_paid", T.DoubleType()),
        T.StructField("total_other_pay", T.DoubleType()),
        T.StructField("score", T.IntegerType()),
    ]
)

# BRONZE lineage columns stamped at registration
# (reference: src/utils.py:179-184).
LINEAGE_COLUMNS = T.StructType(
    [
        T.StructField("_source_file", T.StringType()),
        T.StructField("_ingestion_timestamp", T.TimestampType()),
        T.StructField("_record_id", T.LongType()),
    ]
)

# ---------------------------------------------------------------------------
# Driver testdata tables (/root/testdata/sf*, TESTDATA.md). Parquet carries
# its own schema; these exist for streaming reads (readStream needs an
# explicit schema) and for assertions.
# ---------------------------------------------------------------------------

EVENTS = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)

DOCUMENTS = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)

EMBEDDINGS = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
        T.StructField("label", T.IntegerType()),
    ]
)

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
