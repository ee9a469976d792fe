"""File sources/sinks beyond plain parquet (reference parity: S2-S4,
S7, S10-S13).

The reference's buffer-to-MinIO plumbing (convert to parquet bytes, put
object, batch writers, merge-and-cleanup - reference:
src/data_ingestion.py:38-70, src/utils.py:50-116) collapses into
``df.write.parquet`` (S2/S3/S4/S11/S12): Spark tasks write part-files
directly to the object store via the s3a committer, so there is no
local temp, no manual batching, and no merge step. What remains worth
implementing is below.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import DataFrame, SparkSession


def write_object_store(
    df: DataFrame, path: str, mode: str = "overwrite", coalesce_single: bool = False
) -> None:
    """S2+S3+S4: parquet sink, local path or s3a:// URI (credentials come
    from Hadoop conf). ``coalesce_single`` only when a single file is
    demanded - it serializes the write (reference's merge step, S12)."""
    out = df.coalesce(1) if coalesce_single else df
    out.write.mode(mode).parquet(path)


_FORMATS = ("parquet", "orc", "json", "csv")


def write_table(
    df: DataFrame, path: str, fmt: str = "parquet", mode: str = "overwrite", **options
) -> None:
    """Format-parameterized sink over Spark's built-in writers (parquet /
    ORC / JSON-lines / CSV). Parquet stays the default interchange
    format; ORC is the drop-in columnar alternative (same pushdown and
    pruning machinery), JSON/CSV are for row-oriented export. CSV gets
    a header by default so a round-trip preserves column names."""
    if fmt not in _FORMATS:
        raise ValueError(f"fmt={fmt!r}: expected one of {_FORMATS}")
    w = df.write.mode(mode)
    if fmt == "csv" and "header" not in options:
        options["header"] = "true"
    w.options(**options).format(fmt).save(path)


def read_table(
    spark: SparkSession, path: str, fmt: str = "parquet", schema=None, **options
) -> DataFrame:
    """Format-parameterized source matching :func:`write_table`. Pass
    ``schema`` for JSON/CSV to skip the inference scan (mandatory at
    scale: inference reads the data twice and guesses types)."""
    if fmt not in _FORMATS:
        raise ValueError(f"fmt={fmt!r}: expected one of {_FORMATS}")
    r = spark.read
    if schema is not None:
        r = r.schema(schema)
    if fmt == "csv":
        options.setdefault("header", "true")
        if schema is None:
            options.setdefault("inferSchema", "true")
    return r.options(**options).format(fmt).load(path)


def read_evolved(spark: SparkSession, path: str, fmt: str = "parquet") -> DataFrame:
    """Schema-evolution read: union the schemas of every file under
    ``path`` (``mergeSchema``) so older files missing later-added
    columns surface them as nulls instead of failing or silently
    dropping the column. The schema-merge pass reads footers only; at
    a large file count, pin the merged schema explicitly (one
    ``read_evolved`` then ``.schema`` reuse) instead of re-merging per
    job."""
    if fmt not in ("parquet", "orc"):
        raise ValueError(f"schema merge supported for columnar formats, got {fmt!r}")
    return spark.read.option("mergeSchema", "true").format(fmt).load(path)


def _hidden_below(root: str, uri: str) -> bool:
    """True when any path component of ``uri`` BELOW ``root`` starts
    with ``_`` or ``.`` - the hidden-file convention Spark's own file
    index applies to every ancestor directory, not just the basename.
    Matters for in-flight writes: a committer staging file like
    ``<root>/_temporary/0/.../part-0000.parquet`` has a clean basename
    but must never win a listing (it may be incomplete or vanish).
    The root itself is exempt so a user may point AT an
    underscore-named directory deliberately. The prefix strip is
    separator-guarded: root ``/data/x`` must not match sibling
    ``/data/xy/...`` (a bare startswith would slice mid-component and
    misjudge hidden ancestors), and a uri equal to the root itself
    strips to empty (not hidden)."""
    base = root.rstrip("/")
    if uri == base:
        rel = ""
    elif uri.startswith(base + "/"):
        rel = uri[len(base) + 1:]
    else:
        rel = uri
    return any(seg.startswith(("_", ".")) for seg in rel.split("/") if seg)


def most_recent_file(
    path: str, extension: str, spark: SparkSession | None = None
) -> str | None:
    """S7: latest-file resolution (reference: src/utils.py:32-42 picks
    max ctime over a glob). Local paths keep the original glob fast
    path; URI paths (``file://``, ``s3a://``, ``hdfs://``) route
    through the Hadoop FileSystem listing layer (the same API as
    :func:`list_store_data_files`) and pick the max
    ``FileStatus.getModificationTime``. BOTH branches rank by mtime
    with a path tiebreak: the reference's ctime is inode-change time
    on Linux, so a ``chmod``/``rsync -a`` could invert "newest"
    between a local dir and the same dir behind a ``file:`` URI
    (where Hadoop reports mtime) - one clock, same winner either way.
    Ties break by path/URI for determinism (store listings carry
    second-granularity mtimes). ``spark`` is required for URI paths:
    the session's Hadoop configuration carries the store credentials.

    Semantics note vs the reference: ranking by mtime means ARRIVAL
    time is not preserved for mtime-preserving copies - a drop copied
    in with ``cp -p`` / ``rsync -a`` ranks by its ORIGINAL mtime, so a
    just-arrived file can lose to an older-mtimed one (the reference's
    ctime would rank it newest). Drop directories feeding this resolver
    should land files with fresh mtimes (plain ``cp``/stream writes, or
    ``rsync`` without ``-t/-a``); the trade buys local/URI agreement,
    which the reference's ctime cannot provide (object stores have no
    ctime)."""
    ext = extension.lstrip(".")
    if "://" in path or path.startswith("file:"):
        if spark is None:
            raise ValueError(
                "most_recent_file needs a SparkSession to list store URIs"
            )
        jvm = spark.sparkContext._jvm
        conf = spark.sparkContext._jsc.hadoopConfiguration()
        p = jvm.org.apache.hadoop.fs.Path(path)
        fs = p.getFileSystem(conf)
        if not fs.exists(p):
            return None
        st = fs.getFileStatus(p)
        if st.isFile():
            return st.getPath().toString()
        root = st.getPath().toString()
        best: tuple[int, str] | None = None
        it = fs.listFiles(p, True)
        while it.hasNext():
            f = it.next()
            uri = f.getPath().toString()
            if not uri.endswith(f".{ext}") or _hidden_below(root, uri):
                continue
            key = (f.getModificationTime(), uri)
            if best is None or key > best:
                best = key
        return best[1] if best else None
    if os.path.isfile(path):
        return path
    patterns = [os.path.join(path, f"*.{ext}"), os.path.join(path, "**", f"*.{ext}")]
    candidates: list[str] = []
    for p in patterns:
        # same hidden-component rule as the store branch: glob skips
        # dotfiles but matches underscore-prefixed components, so a
        # committer staging file (_temporary/.../part-0000.parquet)
        # would win the ctime race without this filter
        candidates.extend(
            c for c in glob.glob(p, recursive=True) if not _hidden_below(path, c)
        )
    if not candidates:
        return None
    # mtime (not ctime) so this branch agrees with the Hadoop listing
    # branch on the same directory; path tiebreak mirrors the URI one
    return max(candidates, key=lambda c: (os.path.getmtime(c), c))


def glob_any_store(pattern: str) -> list[str]:
    """Listing glob for the custom Python DataSources (WARC, MP4):
    scheme-less patterns use the local glob; URI patterns route through
    pyarrow's filesystem layer (``s3a://`` normalized to the ``s3://``
    scheme pyarrow implements natively) - NOT the JVM Hadoop FS,
    because Spark 4 runs a Python DataSource's ``partitions()`` and
    stream-offset planning in a separate Python worker process where
    no SparkSession or Py4J gateway exists. The pattern is a
    single-directory file glob (``dir/*.warc.gz`` - the crawl-dump
    layout these sources document); returns sorted URIs so the
    streaming sources' lexicographic offset contract holds for stores
    too."""
    if "://" not in pattern:
        return sorted(glob.glob(pattern))
    import fnmatch
    import posixpath

    from pyarrow import fs as pafs

    scheme, rest = pattern.split("://", 1)
    uri = "s3://" + rest if scheme == "s3a" else pattern
    fsys, rel = pafs.FileSystem.from_uri(uri)
    d, pat = posixpath.split(rel)
    infos = fsys.get_file_info(pafs.FileSelector(d, allow_not_found=True))
    return sorted(
        f"{scheme}://{i.path}"
        for i in infos
        if i.type == pafs.FileType.File
        and fnmatch.fnmatch(posixpath.basename(i.path), pat)
    )


def open_any_store(path: str):
    """Executor-safe seekable binary open for the custom DataSources'
    ``read()`` (which runs in Python workers, where no Py4J gateway
    exists - the JVM Hadoop FS is NOT reachable): bare and ``file:``
    paths open locally; other schemes route through pyarrow's
    filesystem layer (``s3a://`` normalized to the ``s3://`` scheme
    pyarrow implements natively), same normalization as the manifest
    footer reader (sources/maintenance.py:_open_footer). pyarrow's
    NativeFile is seekable, which the MP4 moov-only scan requires."""
    if "://" not in path and not path.startswith("file:"):
        # scheme-less local filename: open directly - urlparse would
        # truncate a literal '#' or '?' in the name at the fragment /
        # query separator (they are valid filename characters locally)
        return open(path, "rb")
    from urllib.parse import urlparse

    parsed = urlparse(path)
    if parsed.scheme in ("", "file"):
        return open(parsed.path or path, "rb")
    from pyarrow import fs as pafs

    uri = "s3://" + path.split("://", 1)[1] if parsed.scheme == "s3a" else path
    fsys, rel = pafs.FileSystem.from_uri(uri)
    return fsys.open_input_file(rel)


def list_store_files(spark: SparkSession, pattern: str) -> list[str]:
    """S8: object-store listing via the Hadoop FileSystem API (the
    reference globs the bucket with SQL, src/utils.py:161-167). Works
    for file://, s3a://, hdfs:// alike."""
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(pattern)
    fs = p.getFileSystem(conf)
    statuses = fs.globStatus(p)
    if statuses is None:
        return []
    return [s.getPath().toString() for s in statuses]


def list_store_data_files(
    spark: SparkSession, path: str, suffix: str = ".parquet"
) -> list[tuple[str, int]]:
    """Recursive data-file listing with byte sizes, via the same Hadoop
    FileSystem API as :func:`list_store_files` - the listing layer the
    maintenance jobs (manifest build, small-file compaction, ANN-index
    compaction) stand on, so they run against ``s3a://``/``hdfs://``
    exactly like ``file://``. ``path`` may be a directory, a single
    file, or a glob; directories are walked recursively
    (``FileSystem.listFiles(recursive=True)``) so partitioned or nested
    sink layouts size correctly, and side files Spark's reader skips
    (``_SUCCESS``, ``.crc``, dotfiles) are skipped here too. Returns
    sorted (uri, n_bytes) pairs - sorted so downstream file relations
    are deterministic regardless of store listing order."""
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(conf)
    statuses = fs.globStatus(p)
    out: list[tuple[str, int]] = []
    if statuses is None:
        return out
    for s in statuses:
        root = s.getPath().toString()
        if s.isDirectory():
            it = fs.listFiles(s.getPath(), True)
            while it.hasNext():
                f = it.next()
                uri = f.getPath().toString()
                if uri.endswith(suffix) and not _hidden_below(root, uri):
                    out.append((uri, f.getLen()))
        else:
            if root.endswith(suffix) and not _hidden_below(
                root.rsplit("/", 1)[0], root
            ):
                out.append((root, s.getLen()))
    return sorted(out)


def _xml_local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _xlsx_shared_strings(zf) -> list[str]:
    import xml.etree.ElementTree as ET

    try:
        data = zf.read("xl/sharedStrings.xml")
    except KeyError:
        return []
    out: list[str] = []
    for si in ET.fromstring(data):
        if _xml_local(si.tag) != "si":
            continue
        # plain <t> or rich-text runs <r><t>; concatenate all t nodes
        out.append("".join(t.text or "" for t in si.iter() if _xml_local(t.tag) == "t"))
    return out


def _xlsx_sheet_path(zf, sheet_name: str | int) -> str:
    """Resolve a sheet (by workbook order index or by name) to its zip
    member via workbook.xml + its relationships part."""
    import xml.etree.ElementTree as ET

    wb = ET.fromstring(zf.read("xl/workbook.xml"))
    rels = ET.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
    rid_to_target = {
        rel.get("Id"): rel.get("Target") for rel in rels if rel.get("Id")
    }
    sheets = []
    for el in wb.iter():
        if _xml_local(el.tag) == "sheet":
            rid = next(
                (v for k, v in el.attrib.items() if _xml_local(k) == "id"), None
            )
            sheets.append((el.get("name"), rid_to_target.get(rid)))
    if isinstance(sheet_name, int):
        name, target = sheets[sheet_name]
    else:
        matches = [s for s in sheets if s[0] == sheet_name]
        if not matches:
            raise KeyError(f"no sheet named {sheet_name!r}; have {[s[0] for s in sheets]}")
        name, target = matches[0]
    if target is None:
        raise ValueError(f"sheet {name!r} has no relationship target")
    return target if target.startswith("xl/") else f"xl/{target}"


def _col_index(cell_ref: str) -> int:
    """'C7' -> 2 (0-based column)."""
    idx = 0
    for ch in cell_ref:
        if ch.isalpha():
            idx = idx * 26 + (ord(ch.upper()) - ord("A") + 1)
        else:
            break
    return idx - 1


def read_xlsx(
    spark: SparkSession, path: str, sheet_name: str | int = 0
) -> DataFrame:
    """S10: XLSX source (the reference's Lightcast sheet; exotic column
    names like "Occupation (SOC)" survive verbatim - README.md:36,
    src/fuzzy_match_jobs_durations.py:44). Pure-stdlib reader (zipfile +
    ElementTree over SpreadsheetML): shared/inline strings, numeric and
    boolean cells, first row as header, sheet selection by index or
    name - no openpyxl/pandas dependency. Column typing: DOUBLE when
    every non-null cell is numeric, else STRING."""
    import zipfile

    import xml.etree.ElementTree as ET

    with zipfile.ZipFile(path) as zf:
        strings = _xlsx_shared_strings(zf)
        sheet = ET.fromstring(zf.read(_xlsx_sheet_path(zf, sheet_name)))
        raw_rows: list[dict[int, object]] = []
        for row in sheet.iter():
            if _xml_local(row.tag) != "row":
                continue
            vals: dict[int, object] = {}
            # SpreadsheetML allows cells without an 'r' attribute (the
            # column is implied by position), so keep a running cursor
            # instead of feeding '' to _col_index (which returns -1 and
            # silently corrupts the column map).
            cursor = 0
            for c in row:
                if _xml_local(c.tag) != "c":
                    continue
                ref = c.get("r")
                ci = _col_index(ref) if ref else cursor
                cursor = ci + 1
                ctype = c.get("t") or "n"
                text = None
                for child in c:
                    loc = _xml_local(child.tag)
                    if loc == "v":
                        text = child.text
                    elif loc == "is":
                        text = "".join(
                            t.text or ""
                            for t in child.iter()
                            if _xml_local(t.tag) == "t"
                        )
                if text is None:
                    continue
                if ctype == "s":
                    val: object = strings[int(text)]
                elif ctype == "b":
                    val = text == "1"
                elif ctype in ("str", "inlineStr"):
                    val = text
                elif ctype == "e":
                    # formula-error cell ('#DIV/0!', '#N/A', ...): null,
                    # never the numeric branch (float('#DIV/0!') crashes)
                    val = None
                else:
                    val = float(text)
                vals[ci] = val
            if vals:
                raw_rows.append(vals)
    if not raw_rows:
        raise ValueError(f"{path}: sheet has no rows")
    header_cells, data = raw_rows[0], raw_rows[1:]
    n_cols = max(header_cells) + 1
    names = [str(header_cells.get(i, f"_c{i}")) for i in range(n_cols)]
    from pyspark.sql.types import (
        BooleanType,
        DoubleType,
        StringType,
        StructField,
        StructType,
    )

    def col_type(i):
        seen = [r[i] for r in data if r.get(i) is not None]
        if seen and all(isinstance(v, float) for v in seen):
            return DoubleType()
        if seen and all(isinstance(v, bool) for v in seen):
            return BooleanType()
        return StringType()

    types = [col_type(i) for i in range(n_cols)]
    rows = [
        tuple(
            (
                r.get(i)
                if isinstance(t, (DoubleType, BooleanType)) or r.get(i) is None
                else str(r.get(i))
            )
            for i, t in enumerate(types)
        )
        for r in data
    ]
    schema = StructType([StructField(n, t) for n, t in zip(names, types)])
    return spark.createDataFrame(rows, schema)


def table_name_for_file(file_name: str) -> str:
    """S9/F10 driver-side name munging (reference: src/utils.py:172-173):
    lowercase, dashes and spaces to underscores, extension dropped."""
    base = os.path.basename(file_name)
    stem = base.rsplit(".", 1)[0]
    return stem.lower().replace("-", "_").replace(" ", "_")


def read_csv_lenient(
    spark: SparkSession,
    path: str,
    schema: str,
    mode: str = "PERMISSIVE",
    corrupt_col: str = "_corrupt_record",
    header: bool = True,
):
    """CSV scan with the reference's lenient ingestion posture (its
    Socrata payloads are all-string and dirty; parse failure must not
    kill the batch - src/fuzzy_match_salary.py uses strict=False
    parsing throughout):

    - ``PERMISSIVE`` (default): malformed rows null-fill their typed
      columns and keep the raw line in ``corrupt_col`` for quarantine;
    - ``DROPMALFORMED``: malformed rows are dropped at the scan;
    - ``FAILFAST``: strict - first malformed row raises.

    ``schema`` is the DDL of the DATA columns; the corrupt-record
    column is appended automatically in PERMISSIVE mode. Spark caveat
    encoded here: referencing ONLY the corrupt column is disallowed on
    a raw CSV relation, so quarantine splits should select data
    columns alongside it (as the test does)."""
    from pyspark.sql.types import StringType, StructType

    struct = StructType.fromDDL(schema)
    opts = {"header": str(header).lower(), "mode": mode}
    if mode.upper() == "PERMISSIVE":
        struct = struct.add(corrupt_col, StringType())
        opts["columnNameOfCorruptRecord"] = corrupt_col
    return spark.read.options(**opts).schema(struct).csv(path)


def write_sorted(
    df: DataFrame,
    path: str,
    sort_cols: list[str],
    n_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Layout-optimized parquet sink: global range partitioning on
    ``sort_cols`` + in-partition sort before writing. Every file (and
    row group) then covers a narrow, near-disjoint slice of the sort
    key, so parquet min/max stats let later scans with sort-key
    predicates skip most of the data - the write-side half of predicate
    pushdown, and the single highest-leverage layout choice for a
    100 TB time-partitioned table."""
    n = n_files or df.sparkSession.sparkContext.defaultParallelism
    (
        df.repartitionByRange(n, *sort_cols)
        .sortWithinPartitions(*sort_cols)
        .write.mode(mode)
        .parquet(path)
    )


def _interleave_bits16(a, b):
    """Bit-interleave two 16-bit bucket ids into one 32-bit Morton (Z)
    code, as a pure Column expression (JVM-side, codegen-friendly)."""
    from pyspark.sql import functions as F

    out = F.lit(0).cast("long")
    for i in range(16):
        out = out.bitwiseOR(
            F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        ).bitwiseOR(
            F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i)
        )
    return out


def write_zordered(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    n_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Z-order (Morton-curve) clustered parquet sink over TWO numeric
    columns: each column min-max scales to a 16-bit bucket id, the ids
    bit-interleave into a Z code, and the write range-partitions +
    sorts by that code. Every file then covers a compact rectangle in
    (col_a, col_b) space, so min/max stats prune scans filtered on
    EITHER column - the multi-dimensional generalization of
    ``write_sorted`` (single-column sort gives perfect skipping on one
    key and none on the other; Z-order splits the benefit).

    One extra aggregate computes the per-column bounds (a 1-row
    broadcast); everything else is map-side expression work.
    """
    from pyspark.sql import functions as F

    n = n_files or df.sparkSession.sparkContext.defaultParallelism
    bounds = df.agg(
        F.min(col_a).alias("a_lo"),
        F.max(col_a).alias("a_hi"),
        F.min(col_b).alias("b_lo"),
        F.max(col_b).alias("b_hi"),
    ).collect()[0]

    def bucket(col, lo, hi):
        span = (hi - lo) or 1
        return F.least(
            F.lit(65535),
            ((F.col(col) - F.lit(lo)) / F.lit(span) * 65535).cast("long"),
        )

    z = _interleave_bits16(
        bucket(col_a, bounds["a_lo"], bounds["a_hi"]),
        bucket(col_b, bounds["b_lo"], bounds["b_hi"]),
    )
    (
        df.withColumn("_z", z)
        .repartitionByRange(n, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode(mode)
        .parquet(path)
    )
