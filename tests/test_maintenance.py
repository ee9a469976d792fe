"""Table-maintenance tests: manifest data-skipping and compaction."""

from __future__ import annotations

import glob

import pytest
from pyspark.sql import functions as F

from nyc_government_hiring_audit_data_platform_spark.sources import files as FS
from nyc_government_hiring_audit_data_platform_spark.sources import maintenance as MT


@pytest.fixture(scope="module")
def sorted_orders_dir(spark, tmp_path_factory):
    """orders range-sorted by o_totalprice into 8 near-disjoint files."""
    d = str(tmp_path_factory.mktemp("orders_sorted"))
    df = spark.read.parquet("/root/testdata/sf0.01/orders.parquet")
    FS.write_sorted(df, d, ["o_totalprice"], n_files=8)
    return d


def test_manifest_covers_every_file_and_column(spark, sorted_orders_dir):
    man = MT.build_manifest(
        spark, sorted_orders_dir, ["o_totalprice", "o_orderkey"]
    ).cache()
    n_files = len(glob.glob(f"{sorted_orders_dir}/*.parquet"))
    assert man.select("file").distinct().count() == n_files
    assert man.groupBy("col").count().count() == 2
    # row counts in the manifest sum to the table's rows (once per col)
    total = spark.read.parquet(sorted_orders_dir).count()
    per_col = man.filter(F.col("col") == "o_totalprice").agg(
        F.sum("n_rows")
    ).collect()[0][0]
    assert per_col == total
    man.unpersist()


def test_pruned_read_is_exact_and_skips_files(spark, sorted_orders_dir):
    """The pruned scan must return exactly the full-scan answer while
    opening strictly fewer files (the write_sorted layout makes a
    narrow price band live in 1-2 files)."""
    man = MT.build_manifest(spark, sorted_orders_dir, ["o_totalprice"])
    lo, hi = 100000.0, 110000.0
    files = MT.prune_files(man, "o_totalprice", lo, hi)
    n_files = len(glob.glob(f"{sorted_orders_dir}/*.parquet"))
    assert 0 < len(files) < n_files
    got = MT.read_pruned(spark, man, "o_totalprice", lo, hi)
    want = (
        spark.read.parquet(sorted_orders_dir)
        .filter((F.col("o_totalprice") >= lo) & (F.col("o_totalprice") <= hi))
    )
    assert got.count() == want.count()
    assert got.agg(F.sum("o_orderkey")).collect() == want.agg(
        F.sum("o_orderkey")
    ).collect()


def test_pruned_read_empty_band(spark, sorted_orders_dir):
    man = MT.build_manifest(spark, sorted_orders_dir, ["o_totalprice"])
    got = MT.read_pruned(spark, man, "o_totalprice", -2.0, -1.0)
    assert got.count() == 0
    # schema preserved even when nothing overlaps
    assert "o_orderkey" in got.columns


def test_compaction_preserves_rows_and_reduces_files(spark, tmp_path):
    src = str(tmp_path / "fragmented")
    df = spark.read.parquet("/root/testdata/sf0.01/orders.parquet")
    df.repartition(64).write.parquet(src)  # simulate small-file explosion
    assert len(glob.glob(f"{src}/*.parquet")) == 64
    out = str(tmp_path / "compacted")
    n_out = MT.compact_small_files(spark, src, out, target_bytes=1 << 30)
    assert n_out == 1
    a = sorted(map(tuple, spark.read.parquet(src).collect()))
    b = sorted(map(tuple, spark.read.parquet(out).collect()))
    assert a == b


def test_compaction_respects_target_size(spark, tmp_path):
    src = str(tmp_path / "frag2")
    spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet").repartition(
        32
    ).write.parquet(src)
    import os

    total = sum(
        os.path.getsize(f) for f in glob.glob(f"{src}/*.parquet")
    )
    out = str(tmp_path / "comp2")
    n_out = MT.compact_small_files(spark, src, out, target_bytes=total // 3)
    assert 2 <= n_out <= 5


def test_schema_evolution_read(spark, tmp_path):
    """Files written before a column existed read back with nulls for
    that column under read_evolved; plain reads would pick ONE footer
    and could drop it."""
    d = str(tmp_path / "evolving")
    spark.createDataFrame([(1, "a")], "id long, name string").write.parquet(d)
    spark.createDataFrame(
        [(2, "b", 9.5)], "id long, name string, score double"
    ).write.mode("append").parquet(d)
    got = FS.read_evolved(spark, d)
    assert set(got.columns) == {"id", "name", "score"}
    rows = {r["id"]: r for r in got.collect()}
    assert rows[1]["score"] is None and rows[2]["score"] == 9.5
    import pytest as _pytest

    with _pytest.raises(ValueError, match="columnar"):
        FS.read_evolved(spark, d, fmt="json")


def test_prune_keeps_files_when_stats_uncastable(spark, tmp_path):
    """String-column stats that fail the numeric cast must keep every
    file (conservative), never silently prune them all."""
    d = str(tmp_path / "strs")
    spark.createDataFrame([("x", 1), ("y", 2)], "s string, v int").write.parquet(d)
    man = MT.build_manifest(spark, d, ["s"])
    files = MT.prune_files(man, "s", 0.0, 1.0, cast="double")
    assert len(files) == len(glob.glob(f"{d}/*.parquet"))


def test_manifest_tolerates_schema_evolution(spark, tmp_path):
    """Files predating a column get null stats (kept on every prune),
    not a crashed manifest build."""
    d = str(tmp_path / "evolved")
    spark.createDataFrame([(1,)], "id long").coalesce(1).write.parquet(d)
    spark.createDataFrame([(2, 5.0)], "id long, score double").coalesce(
        1
    ).write.mode("append").parquet(d)
    man = MT.build_manifest(spark, d, ["score"]).cache()
    rows = {r["file"]: r for r in man.collect()}
    assert len(rows) == 2
    assert sum(1 for r in rows.values() if r["min_val"] is None) == 1
    files = MT.prune_files(man, "score", 100.0, 200.0)
    # the stats-less old file survives every prune; the new one doesn't
    assert len(files) == 1
    man.unpersist()


def test_hadoop_fs_listing_layer(spark, tmp_path):
    """The maintenance paths list/size through the Hadoop FS API, so a
    scheme-qualified URI (file: here; s3a://hdfs:// in production) works
    end-to-end: recursive listing of a nested sink layout, side-file
    skipping, sizes from FileStatus.getLen, and a manifest built over
    the URI path whose footer mappers open the returned URIs."""
    d = tmp_path / "nested"
    (d / "part=a").mkdir(parents=True)
    df = spark.createDataFrame([(1, 2.0), (2, 3.0)], "id long, score double")
    df.coalesce(1).write.parquet(str(d / "part=a" / "inner"))
    uri = "file:" + str(d)
    files = FS.list_store_data_files(spark, uri)
    assert len(files) == 1  # _SUCCESS / .crc side files skipped
    path, n_bytes = files[0]
    assert path.startswith("file:") and path.endswith(".parquet")
    import os

    assert n_bytes == os.path.getsize(path[len("file:"):])
    # manifest over the scheme-qualified dir: listing, footer open via
    # URI, and sizes all flow through the FS layer
    man = MT.build_manifest(spark, "file:" + str(d / "part=a" / "inner"), ["score"])
    rows = man.collect()
    assert {r["col"] for r in rows} == {"score"}
    assert all(r["n_bytes"] > 0 and r["n_rows"] == 2 for r in rows)
    assert MT.prune_files(man, "score", 2.5, 9.0) == [r["file"] for r in rows]
    # compaction accepts the URI form too and counts via the FS layer
    out = str(tmp_path / "compacted_uri")
    n_out = MT.compact_small_files(
        spark, "file:" + str(d / "part=a" / "inner"), out, target_bytes=1 << 30
    )
    assert n_out == 1
    assert spark.read.parquet(out).count() == 2


def test_compaction_with_sort_cols_preserves_skipping(spark, tmp_path):
    """Compacting a clustered table with sort_cols keeps per-file ranges
    narrow enough that the manifest still prunes."""
    src = str(tmp_path / "clustered")
    FS.write_sorted(
        spark.read.parquet("/root/testdata/sf0.01/orders.parquet"),
        src,
        ["o_totalprice"],
        n_files=16,
    )
    out = str(tmp_path / "compacted_sorted")
    import os

    total = sum(os.path.getsize(f) for f in glob.glob(f"{src}/*.parquet"))
    MT.compact_small_files(
        spark, src, out, target_bytes=total // 4, sort_cols=["o_totalprice"]
    )
    man = MT.build_manifest(spark, out, ["o_totalprice"])
    files = MT.prune_files(man, "o_totalprice", 100000.0, 110000.0)
    assert 0 < len(files) < len(glob.glob(f"{out}/*.parquet"))
