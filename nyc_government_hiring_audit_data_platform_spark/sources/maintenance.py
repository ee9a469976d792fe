"""Table-maintenance operators: manifest-based file pruning and
small-file compaction.

These are the lakehouse jobs a 100 TB parquet table needs between
writes (what Delta/Iceberg ship as OPTIMIZE / data-skipping manifests,
re-expressed over plain parquet directories):

- ``build_manifest``: one pass over the parquet FOOTERS (statistics
  only, no data pages) collecting per-file min/max/row-count per
  column - the data-skipping index. Runs distributed (file list ->
  mapInPandas over pyarrow footer reads), so a million-file table
  builds its manifest without a driver loop.
- ``read_pruned``: resolve a range predicate against the manifest and
  scan ONLY the overlapping files. With ``write_sorted``'s
  near-disjoint layout this turns point/range queries into O(files
  that matter); orthogonal to (and composable with) Spark's own
  row-group pushdown once the file is open.
- ``compact_small_files``: bin-pack a directory's small files into
  ~target-size outputs (repartition by total-bytes/target) and rewrite
  atomically into a fresh directory. Small-file explosion is the #1
  operational failure of streaming sinks at scale; compaction restores
  scan efficiency (fewer tasks, bigger sequential reads).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nyc_government_hiring_audit_data_platform_spark.sources.files import (
    list_store_data_files,
)

MANIFEST_SCHEMA = (
    "file string, n_rows long, n_bytes long, col string, min_val string, "
    "max_val string"
)


def _open_footer(path: str):
    """Open a parquet footer from a path or URI. The Hadoop-FS listing
    layer hands back URIs (``file:/...``, ``s3a://...``); pyarrow wants
    a local path or an opened input file. file:-scheme (and bare) paths
    open locally; other schemes route through pyarrow's own filesystem
    layer (``s3a://`` normalized to the ``s3://`` scheme pyarrow
    implements natively), so footer reads stay executor-side against
    object storage too."""
    from urllib.parse import urlparse

    import pyarrow.parquet as pq

    parsed = urlparse(path)
    if parsed.scheme in ("", "file"):
        return pq.ParquetFile(parsed.path or path)
    from pyarrow import fs as pafs

    uri = "s3://" + path.split("://", 1)[1] if parsed.scheme == "s3a" else path
    fsys, rel = pafs.FileSystem.from_uri(uri)
    return pq.ParquetFile(fsys.open_input_file(rel))


def _footer_stats(files: Iterator[pd.DataFrame], columns: list[str]):
    for pdf in files:
        out = {k: [] for k in ("file", "n_rows", "n_bytes", "col", "min_val", "max_val")}
        for path, n_bytes in zip(pdf["file"], pdf["n_bytes"]):
            pf = _open_footer(path)
            md = pf.metadata
            names = md.schema.names
            for col in columns:
                lo = hi = None
                # schema-evolved tables legitimately have files missing
                # later-added columns: null stats -> conservative keep
                if col in names:
                    idx = names.index(col)
                    for rg in range(md.num_row_groups):
                        st = md.row_group(rg).column(idx).statistics
                        if st is None or not st.has_min_max:
                            lo = hi = None
                            break
                        lo = st.min if lo is None else min(lo, st.min)
                        hi = st.max if hi is None else max(hi, st.max)
                out["file"].append(path)
                out["n_rows"].append(md.num_rows)
                out["n_bytes"].append(int(n_bytes))
                out["col"].append(col)
                out["min_val"].append(None if lo is None else str(lo))
                out["max_val"].append(None if hi is None else str(hi))
        yield pd.DataFrame(out)


def build_manifest(spark: SparkSession, table_dir: str, columns: list[str]) -> DataFrame:
    """Distributed footer scan -> (file, n_rows, n_bytes, col, min, max)
    rows. Values are stringified (a manifest is an INDEX: pruning
    re-casts to the query type at use time). Listing and sizing go
    through the Hadoop FileSystem API (``list_store_data_files``), so a
    manifest builds against ``s3a://``/``hdfs://`` tables, not just the
    local fs; sizes ride the file relation into the footer mappers so
    executors never stat the store a second time."""
    files = list_store_data_files(spark, table_dir)
    if not files:
        raise ValueError(f"no parquet files under {table_dir}")
    fdf = spark.createDataFrame(files, "file string, n_bytes long").repartition(
        min(len(files), spark.sparkContext.defaultParallelism)
    )
    return fdf.mapInPandas(
        lambda it: _footer_stats(it, columns), schema=MANIFEST_SCHEMA
    )


def prune_files(
    manifest: DataFrame, col: str, lo, hi, cast: str = "double"
) -> list[str]:
    """Files whose [min, max] range for ``col`` overlaps [lo, hi].
    Files with missing stats are conservatively KEPT (pruning must
    never drop a row)."""
    m = manifest.filter(F.col("col") == col)
    lo_c, hi_c = F.col("min_val").cast(cast), F.col("max_val").cast(cast)
    # Conservative in BOTH null modes: stats absent (min_val null) OR
    # stats present but not castable to the query type (cast -> null) -
    # either way the file must be kept; a null comparison would
    # otherwise silently drop it (pruning must never lose a row).
    keep = m.filter(
        F.col("min_val").isNull()
        | F.col("max_val").isNull()
        | lo_c.isNull()
        | hi_c.isNull()
        | ((lo_c <= F.lit(hi)) & (hi_c >= F.lit(lo)))
    )
    return [r["file"] for r in keep.select("file").collect()]


def read_pruned(
    spark: SparkSession,
    manifest: DataFrame,
    col: str,
    lo,
    hi,
    cast: str = "double",
) -> DataFrame:
    """Scan only the manifest-overlapping files, then apply the exact
    predicate (file pruning is a superset filter, never the final
    answer). Returns an empty relation of the right schema when no
    file overlaps."""
    files = prune_files(manifest, col, lo, hi, cast)
    if not files:
        # only now pay for a schema probe (one file) - doing this
        # unconditionally would re-run the lazy footer-scan plan as an
        # extra job on every pruned read
        any_file = [r["file"] for r in manifest.select("file").limit(1).collect()]
        empty = spark.read.parquet(*any_file).limit(0)
        return empty.filter(F.lit(False))
    return spark.read.parquet(*files).filter(
        (F.col(col).cast(cast) >= F.lit(lo)) & (F.col(col).cast(cast) <= F.lit(hi))
    )


def compact_small_files(
    spark: SparkSession,
    table_dir: str,
    out_dir: str,
    target_bytes: int = 128 * 1024 * 1024,
    sort_cols: list[str] | None = None,
) -> int:
    """Rewrite a directory of (possibly many tiny) parquet files as
    ceil(total_bytes / target_bytes) files in ``out_dir``; returns the
    output file count. Row-count-preserving by construction (one read,
    one repartition, one write - verified by the round-trip test).
    The rewrite lands in a fresh directory so readers of the old one
    are never disturbed; swapping a table pointer (see
    streaming.run_upsert_sink) publishes it.

    Pass ``sort_cols`` when the table has a clustered layout
    (``write_sorted``) or a manifest depends on per-file min/max
    ranges: the default round-robin repartition spreads every value
    range across every output file, which silently defeats
    ``read_pruned``; range repartition + in-partition sort preserves
    the skipping layout through compaction."""
    files = list_store_data_files(spark, table_dir)
    if not files:
        raise ValueError(f"no parquet files under {table_dir}")
    total = sum(n for _, n in files)
    n_out = max(1, -(-total // target_bytes))
    df = spark.read.parquet(table_dir)
    if sort_cols:
        df = df.repartitionByRange(n_out, *sort_cols).sortWithinPartitions(*sort_cols)
    else:
        df = df.repartition(n_out)
    df.write.mode("error").parquet(out_dir)
    return len(list_store_data_files(spark, out_dir))
