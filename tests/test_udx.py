"""UDAF / UDTF surface tests (SURVEY §2.10 engine extensions)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nyc_government_hiring_audit_data_platform_spark.functions import udx


def test_weighted_mean_udaf_matches_builtin(spark, sf_dir):
    """The grouped-agg pandas UDAF must agree with the built-in
    sum(v*w)/sum(w) formulation on every group."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderpriority",
        F.col("o_totalprice").alias("v"),
        (F.col("o_orderkey") % 7 + 1).cast("double").alias("w"),
    )
    got = {
        r["o_orderpriority"]: r["weighted_mean"]
        for r in udx.weighted_mean(o, ["o_orderpriority"], "v", "w").collect()
    }
    want = {
        r["o_orderpriority"]: r["wm"]
        for r in o.groupBy("o_orderpriority")
        .agg((F.sum(F.col("v") * F.col("w")) / F.sum("w")).alias("wm"))
        .collect()
    }
    assert set(got) == set(want) and len(got) == 5
    for k in want:
        assert got[k] == pytest.approx(want[k], rel=1e-9)


def test_weighted_mean_udaf_null_semantics(spark):
    df = spark.createDataFrame(
        [("a", 10.0, 1.0), ("a", None, 5.0), ("a", 30.0, None), ("a", 20.0, 3.0)],
        "g string, v double, w double",
    )
    rows = udx.weighted_mean(df, ["g"], "v", "w").collect()
    # only (10,1) and (20,3) survive -> (10+60)/4
    assert rows[0]["weighted_mean"] == pytest.approx(17.5)


def test_ngram_udtf_direct_call(spark):
    out = udx.ngram_explode()(F.lit("a b c d"), F.lit(2)).collect()
    assert [(r["pos"], r["ngram"]) for r in out] == [
        (0, "a b"),
        (1, "b c"),
        (2, "c d"),
    ]
    assert udx.ngram_explode()(F.lit(""), F.lit(2)).collect() == []
    assert udx.ngram_explode()(F.lit("one"), F.lit(2)).collect() == []


def test_ngram_udtf_lateral_sql(spark, sf_dir):
    """Registered UDTF in SQL LATERAL position over real documents:
    per-doc bigram count equals the expression-path count."""
    udx.register_udtfs(spark)
    spark.read.parquet(f"{sf_dir}/documents.parquet").filter(
        F.col("doc_id") < 20
    ).createOrReplaceTempView("docs_head")
    got = {
        r["doc_id"]: r["n"]
        for r in spark.sql(
            """
            SELECT d.doc_id, COUNT(*) AS n
            FROM docs_head d, LATERAL ngrams(d.text, 2) g
            GROUP BY d.doc_id
            """
        ).collect()
    }
    toks = F.filter(F.split("text", " "), lambda t: t != "")
    want = {
        r["doc_id"]: r["n"]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter(F.col("doc_id") < 20)
        .select("doc_id", F.greatest(F.size(toks) - 1, F.lit(0)).alias("n"))
        .collect()
    }
    assert got == {k: v for k, v in want.items() if v > 0}


def test_observed_ingestion_metrics(spark, sf_dir):
    """A6 analogue: observe() yields the ingestion counters from the
    SAME action that writes/collects - no second count() pass."""
    from nyc_government_hiring_audit_data_platform_spark.operators import relational as R

    src = spark.read.parquet(f"{sf_dir}/orders.parquet")
    df, obs = R.with_observed_metrics(src, "bronze_ingest", "o_totalprice")
    n = df.count()  # the one materializing action
    got = obs.get
    assert got["n_rows"] == n
    assert got["n_nonnull"] == n  # o_totalprice has no nulls
    expected_total = src.agg(F.round(F.sum("o_totalprice"), 2)).collect()[0][0]
    assert got["total"] == expected_total


def test_ngram_udtf_whitespace_parity_with_oracle(spark):
    """ADVICE r3: the UDTF filters empty tokens from split(' '); the
    DuckDB oracle must tokenize identically (list_filter on
    string_split), or any input with consecutive/leading spaces
    diverges. Pin both tokenizations on a dirty string."""
    import duckdb

    dirty = "  alpha  beta gamma "
    got = [
        (r["pos"], r["ngram"])
        for r in udx.ngram_explode()(F.lit(dirty), F.lit(2)).collect()
    ]
    oracle = duckdb.sql(
        """
        WITH src AS (SELECT list_filter(string_split($d, ' '),
                                        t -> t <> '') AS toks)
        SELECT CAST(i - 1 AS INT) AS pos, toks[i] || ' ' || toks[i+1] AS ng
        FROM src, LATERAL unnest(range(1, len(toks))) AS u(i)
        """,
        params={"d": dirty},
    ).fetchall()
    assert got == [(int(p), n) for p, n in oracle] == [
        (0, "alpha beta"),
        (1, "beta gamma"),
    ]
