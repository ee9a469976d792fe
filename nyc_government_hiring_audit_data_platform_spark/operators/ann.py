"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the exact baseline; random-hyperplane LSH
bucketing is the scale path (candidates only within a bucket). Both are
pure DataFrame plans - the dot product is a JVM-side ``zip_with`` +
``aggregate`` fold, no UDF - with DuckDB-SQL twins for the oracle.

Scale notes:
- brute-force: queries (small) are broadcast; the corpus never moves.
  Per-query top-k is a windowed rank - Spark turns rank<=k into
  WindowGroupLimit (partial top-k map-side before the shuffle).
- LSH: bucket signature is computed map-side from HYPERPLANES
  (deterministic literals, shared with the oracle); the join is an
  equi-join on the bucket id, so the shuffle is uniform unless the
  embedding distribution collapses into few buckets - at which point
  more planes (finer buckets) is the knob.

Float parity note: embeddings are float32; both engines cast to double
before multiplying. float32*float32 in double is EXACT (24-bit mantissas
fit in 53), so only the summation order could differ - both sides use a
sequential left fold, and outputs are rounded to 6 decimals.
"""

from __future__ import annotations

import random

from pyspark import StorageLevel
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from nyc_government_hiring_audit_data_platform_spark.functions.numeric import (
    norm_round,
)

from nyc_government_hiring_audit_data_platform_spark.functions.similarity import (
    cosine_similarity,
)

# Deterministic random hyperplanes (seed fixed, shared with the oracle
# SQL as literals). 8 planes -> 256 buckets over 64-dim embeddings.
EMBED_DIM = 64
NUM_PLANES = 8
_rng = random.Random(42)
HYPERPLANES: list[list[float]] = [
    [round(_rng.gauss(0.0, 1.0), 6) for _ in range(EMBED_DIM)]
    for _ in range(NUM_PLANES)
]


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def _dot_spark_sql(vec_expr: str, plane: list[float]) -> str:
    """Spark-SQL dot product of an array expression with a literal plane
    (sequential left fold — the exact op order of the DuckDB oracle).

    Rendered as ONE SQL string instead of per-literal Column calls: a
    64-float plane built via ``F.lit``/``zip_with`` lambdas costs ~130
    Py4J round-trips PER PLANE on the driver (measured ~1.8s of pure
    Python DataFrame-construction time for the 16-centroid IVF query);
    the string parses JVM-side in microseconds and yields the identical
    expression tree."""
    lits = ", ".join(f"{x!r}D" for x in plane)
    return (
        f"aggregate(zip_with({vec_expr}, array({lits}), (a, b) -> a * b), "
        f"0.0D, (acc, v) -> acc + v)"
    )


def _vec_sql(name: str) -> str:
    return f"CAST(`{name}` AS ARRAY<DOUBLE>)"


def lsh_bucket(col_name: str) -> Column:
    """Random-hyperplane LSH bucket id (0..2^NUM_PLANES-1): bit i is the
    sign of the dot product with plane i. Takes a column NAME (the
    planes inline into one Spark-SQL expression, see _dot_spark_sql)."""
    v = _vec_sql(col_name)
    terms = " + ".join(
        f"IF({_dot_spark_sql(v, plane)} >= 0, {2**i}, 0)"
        for i, plane in enumerate(HYPERPLANES)
    )
    return F.expr(f"({terms})")


def _plane_sql(plane: list[float]) -> str:
    return "[" + ", ".join(f"{x}::DOUBLE" for x in plane) + "]"


def _dot_sql(vec_expr: str, plane_expr: str) -> str:
    return (
        f"list_reduce(list_prepend(0.0::DOUBLE, "
        f"list_transform(list_zip({vec_expr}, {plane_expr}), x -> x[1] * x[2])), "
        f"(acc, v) -> acc + v)"
    )


def lsh_bucket_sql(vec_expr: str) -> str:
    v = f"({vec_expr}::DOUBLE[])"
    terms = [
        f"CASE WHEN {_dot_sql(v, _plane_sql(p))} >= 0 THEN {2**i} ELSE 0 END"
        for i, p in enumerate(HYPERPLANES)
    ]
    return "(" + " + ".join(terms) + ")"


def cosine_sql(a_expr: str, b_expr: str) -> str:
    """DuckDB twin of functions.similarity.cosine_similarity (sequential
    left-fold sums, double math)."""
    a = f"({a_expr}::DOUBLE[])"
    b = f"({b_expr}::DOUBLE[])"
    dot = (
        f"list_reduce(list_prepend(0.0::DOUBLE, "
        f"list_transform(list_zip({a}, {b}), x -> x[1] * x[2])), (acc, v) -> acc + v)"
    )
    na = (
        f"sqrt(list_reduce(list_prepend(0.0::DOUBLE, "
        f"list_transform({a}, x -> x * x)), (acc, v) -> acc + v))"
    )
    nb = (
        f"sqrt(list_reduce(list_prepend(0.0::DOUBLE, "
        f"list_transform({b}, x -> x * x)), (acc, v) -> acc + v))"
    )
    return f"({dot} / ({na} * {nb}))"


# --------------------------------------------------------------------------
# top-k search
# --------------------------------------------------------------------------


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    query_id: str,
    query_vec: str,
    corpus_id: str,
    corpus_vec: str,
    k: int,
) -> DataFrame:
    """Exact brute-force cosine top-k: broadcast the (small) query set
    against the corpus, score every pair, keep the k best per query with
    a deterministic tiebreaker. Scoring runs in the corpus's scan
    partitions - the operator moves no vectors (module input-edge
    contract: single-file fixtures fan out at the caller)."""
    q = queries.select(
        _c(query_id).alias("query_id"), _c(query_vec).alias("qv")
    )
    c = corpus.select(
        _c(corpus_id).alias("neighbor_id"), _c(corpus_vec).alias("cv")
    )
    scored = c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id")).select(
        "query_id",
        "neighbor_id",
        cosine_similarity(F.col("qv"), F.col("cv")).alias("sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", norm_round("sim", 6).alias("sim"), "rank")
    )


def cosine_topk_sql(
    table: str,
    id_col: str,
    vec_col: str,
    query_pred: str,
    k: int,
) -> str:
    """Oracle: same brute-force top-k where the query set is
    ``SELECT .. FROM table WHERE query_pred``."""
    sim = cosine_sql("q.qv", "c.cv")
    return f"""
    WITH q AS (SELECT {id_col} AS query_id, {vec_col} AS qv FROM {table} WHERE {query_pred}),
    c AS (SELECT {id_col} AS neighbor_id, {vec_col} AS cv FROM {table}),
    scored AS (
      SELECT q.query_id, c.neighbor_id, {sim} AS sim
      FROM q JOIN c ON q.query_id <> c.neighbor_id
    ),
    ranked AS (
      SELECT query_id, neighbor_id, sim,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY sim DESC, neighbor_id) AS rank
      FROM scored
    )
    SELECT query_id, neighbor_id, ROUND(sim, 6) + 0 AS sim, rank
    FROM ranked WHERE rank <= {k}
    """


def lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    query_id: str,
    query_vec: str,
    corpus_id: str,
    corpus_vec: str,
    k: int,
) -> DataFrame:
    """Approximate top-k: score only corpus vectors in the query's LSH
    bucket (equi-join on bucket id), then rank within the candidates.
    Recall < 1 by design; the bucket join replaces the full scan."""
    q = queries.select(
        _c(query_id).alias("query_id"), _c(query_vec).alias("qv")
    ).select("query_id", "qv", lsh_bucket("qv").alias("bucket"))
    c = (
        corpus.select(_c(corpus_id).alias("neighbor_id"), _c(corpus_vec).alias("cv"))
        # bucket fold runs in the scan partitions; no vector shuffle here
        .select("neighbor_id", "cv", lsh_bucket("cv").alias("bucket"))
    )
    scored = c.join(
        F.broadcast(q),
        (q["bucket"] == c["bucket"]) & (F.col("query_id") != F.col("neighbor_id")),
    ).select(
        "query_id",
        "neighbor_id",
        cosine_similarity(F.col("qv"), F.col("cv")).alias("sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", norm_round("sim", 6).alias("sim"), "rank")
    )


def lsh_topk_sql(
    table: str, id_col: str, vec_col: str, query_pred: str, k: int
) -> str:
    sim = cosine_sql("q.qv", "c.cv")
    bucket = lsh_bucket_sql(vec_col)
    return f"""
    WITH q AS (SELECT {id_col} AS query_id, {vec_col} AS qv, {bucket} AS bucket
               FROM {table} WHERE {query_pred}),
    c AS (SELECT {id_col} AS neighbor_id, {vec_col} AS cv, {bucket} AS bucket
          FROM {table}),
    scored AS (
      SELECT q.query_id, c.neighbor_id, {sim} AS sim
      FROM q JOIN c ON q.bucket = c.bucket AND q.query_id <> c.neighbor_id
    ),
    ranked AS (
      SELECT query_id, neighbor_id, sim,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY sim DESC, neighbor_id) AS rank
      FROM scored
    )
    SELECT query_id, neighbor_id, ROUND(sim, 6) + 0 AS sim, rank
    FROM ranked WHERE rank <= {k}
    """


# --------------------------------------------------------------------------
# IVF (inverted-file) index: coarse quantizer + probed cluster search
# --------------------------------------------------------------------------

# Deterministic random centroids (seed 43, shared with the oracle as
# literals). Real IVF learns centroids with sampled k-means (MLlib
# KMeans at scale); fixed random centroids keep the coarse-quantizer
# STRUCTURE identical while making the oracle exactly reproducible.
NUM_CENTROIDS = 16
_crng = random.Random(43)
CENTROIDS: list[list[float]] = [
    [round(_crng.gauss(0.0, 1.0), 6) for _ in range(EMBED_DIM)]
    for _ in range(NUM_CENTROIDS)
]


def _centroid_dots(col_name: str) -> Column:
    """Array of dot products with every centroid (each element is one
    sequential fold - evaluated once; no repeated sub-expressions, which
    matters in interpreted mode where Spark does no CSE). Takes a column
    NAME — the 16x64 centroid literals inline into one Spark-SQL string
    (see _dot_spark_sql for why)."""
    v = _vec_sql(col_name)
    return F.expr(
        "array(" + ", ".join(_dot_spark_sql(v, c) for c in CENTROIDS) + ")"
    )


def _probe_list(dots: Column, nprobe: int) -> Column:
    """Ids of the ``nprobe`` nearest centroids, nearest first. Natural
    ascending struct sort on (-dot, id) - identical lexicographic struct
    ordering in Spark and DuckDB, no comparator lambda needed. The
    ``dots`` column is referenced exactly once."""
    idx = F.sequence(F.lit(0), F.lit(NUM_CENTROIDS - 1))
    pairs = F.zip_with(
        dots, idx, lambda d, i: F.struct((-d).alias("negd"), i.alias("i"))
    )
    return F.transform(F.slice(F.array_sort(pairs), 1, nprobe), lambda x: x["i"])


def _centroid_dots_sql(vec_expr: str) -> str:
    v = f"({vec_expr}::DOUBLE[])"
    return (
        "list_value(" + ", ".join(_dot_sql(v, _plane_sql(c)) for c in CENTROIDS) + ")"
    )


def _probe_list_sql(dots_expr: str, nprobe: int) -> str:
    """DuckDB twin of _probe_list (1-based list indexing; struct sort is
    field-order lexicographic, same as Spark)."""
    return (
        f"list_transform(list_sort(list_transform(range(1, {NUM_CENTROIDS + 1}), "
        f"i -> {{'negd': -({dots_expr})[i], 'i': i - 1}})), x -> x.i)[1:{nprobe}]"
    )


def _cent_rel(spark) -> DataFrame:
    """ONE-row relation: the pinned CENTROIDS seed packed into the same
    cluster-sorted ``arr`` column :func:`_cent_arr` produces for trained
    centroids (r13). Broadcast and referenced as a column the 16 x 64
    literal block stays OUT of the expression tree - the same flat
    driver-analysis saving as :func:`_pq_cb_rel`; values round-trip
    createDataFrame exactly (Python floats ARE doubles). Built as one
    LOCAL row (not an agg over a 16-row relation): the seed is already
    cluster-ordered, and an agg would add an Exchange to every
    consumer's plan."""
    return spark.createDataFrame(
        [([(i, CENTROIDS[i]) for i in range(NUM_CENTROIDS)],)],
        "arr array<struct<cluster:int,cv:array<double>>>",
    )


def _arr_dotprods(v: str, arr: str) -> Column:
    """Array of dot products of column ``v`` with every centroid in the
    packed ``arr`` column - the broadcast-relation twin of
    :func:`_centroid_dots` (identical sequential fold per element:
    zip_with product then left-fold add, each evaluated once)."""
    dot = f"aggregate(zip_with({v}, s.cv, (a, b) -> a * b), 0.0D, (acc, x) -> acc + x)"
    return F.expr(f"transform({arr}, s -> {dot})")


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    query_id: str,
    query_vec: str,
    corpus_id: str,
    corpus_vec: str,
    k: int,
    nprobe: int = 4,
) -> DataFrame:
    """Approximate top-k via an IVF index: every corpus vector is
    assigned to its nearest centroid (cluster id computed map-side, one
    pass, no shuffle); each query probes its ``nprobe`` nearest clusters
    and scores only vectors inside them. The probe is an equi-join on
    cluster id, so at 100 TB the corpus never moves - only the
    (queries x nprobe) probe rows broadcast - and candidate volume is
    ~nprobe/NUM_CENTROIDS of the corpus. Recall < 1 by design; raise
    nprobe toward NUM_CENTROIDS to trade speed for recall (nprobe =
    NUM_CENTROIDS is exact brute force).

    The 16 x 64 centroid literals stay INLINE here (unlike the PQ
    codebook relation in ivfadc_topk): an r13 A/B of the broadcast-
    relation form measured a flat ~0.3-0.4 s REGRESSION on this
    family's slots - the literal block is only ~13 KB of plan (vs
    ~200 KB for the codebooks), so the analysis saving is negligible
    while the one-row attach adds a real broadcast build + bind."""
    c = corpus.select(
        _c(corpus_id).alias("neighbor_id"), _c(corpus_vec).alias("cv")
    ).select(  # 16-centroid fold runs in the scan partitions
        "neighbor_id",
        "cv",
        _centroid_dots("cv").alias("dots"),
    ).select(
        "neighbor_id",
        "cv",
        _probe_list(F.col("dots"), 1)[0].alias("cluster"),
    )
    q = queries.select(
        _c(query_id).alias("query_id"), _c(query_vec).alias("qv")
    ).select(
        "query_id",
        "qv",
        _centroid_dots("qv").alias("dots"),
    ).select(
        "query_id",
        "qv",
        F.explode(_probe_list(F.col("dots"), nprobe)).alias("cluster"),
    )
    scored = c.join(
        F.broadcast(q),
        (q["cluster"] == c["cluster"]) & (F.col("query_id") != F.col("neighbor_id")),
    ).select(
        "query_id",
        "neighbor_id",
        cosine_similarity(F.col("qv"), F.col("cv")).alias("sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", norm_round("sim", 6).alias("sim"), "rank")
    )


def ivf_topk_sql(
    table: str,
    id_col: str,
    vec_col: str,
    query_pred: str,
    k: int,
    nprobe: int = 4,
    corpus_pred: str = "TRUE",
) -> str:
    """``corpus_pred`` restricts the CORPUS side only - the oracle for
    FILTERED vector search (metadata predicate + ANN), where the Spark
    side passes a filtered corpus relation and the predicate pushes
    into the parquet scan."""
    sim = cosine_sql("q.qv", "c.cv")
    dots = _centroid_dots_sql(vec_col)
    return f"""
    WITH cb AS (SELECT {id_col} AS neighbor_id, {vec_col} AS cv, {dots} AS ds
                FROM {table} WHERE {corpus_pred}),
    c AS (SELECT neighbor_id, cv, {_probe_list_sql('ds', 1)}[1] AS cluster FROM cb),
    qb AS (SELECT {id_col} AS query_id, {vec_col} AS qv, {dots} AS ds
           FROM {table} WHERE {query_pred}),
    q AS (SELECT query_id, qv, unnest({_probe_list_sql('ds', nprobe)}) AS cluster FROM qb),
    scored AS (
      SELECT q.query_id, c.neighbor_id, {sim} AS sim
      FROM q JOIN c ON q.cluster = c.cluster AND q.query_id <> c.neighbor_id
    ),
    ranked AS (
      SELECT query_id, neighbor_id, sim,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY sim DESC, neighbor_id) AS rank
      FROM scored
    )
    SELECT query_id, neighbor_id, ROUND(sim, 6) + 0 AS sim, rank
    FROM ranked WHERE rank <= {k}
    """


def kmeans_update(
    corpus: DataFrame, id_col: str, vec_col: str
) -> DataFrame:
    """One Lloyd's k-means update over the CENTROIDS quantizer: assign
    every vector to its nearest centroid (map-side fold, no shuffle),
    then recompute each centroid as the element-wise mean of its members
    - emitted as (cluster, dim, n_members, value) rows via posexplode so
    the output is flat scalars.

    This is the distributed k-means shape (what MLlib's KMeans does per
    iteration): the only shuffle is the partial-aggregated
    groupBy(cluster, dim), so 100 TB of vectors reduce to
    NUM_CENTROIDS x EMBED_DIM rows per pass. Float parity note: the
    components are float32 widened to double, and doubles with 24-bit
    mantissas in [-2^8, 2^8] sum EXACTLY in double for any realistic
    group size, so the mean is order-independent and oracle-exact."""
    assigned = (
        corpus.select(_c(vec_col).cast("array<double>").alias("cv"))
        # assignment fold runs in the scan partitions (input-edge contract)
        .select("cv", _centroid_dots("cv").alias("dots"))
        .select("cv", _probe_list(F.col("dots"), 1)[0].alias("cluster"))
    )
    return (
        assigned.select("cluster", F.posexplode("cv").alias("dim", "val"))
        .groupBy("cluster", "dim")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            norm_round(F.avg("val"), 6).alias("value"),
        )
    )


def kmeans_update_sql(table: str, id_col: str, vec_col: str) -> str:
    dots = _centroid_dots_sql(vec_col)
    return f"""
    WITH base AS (
      SELECT ({vec_col}::DOUBLE[]) AS cv, {dots} AS ds FROM {table}
    ),
    assigned AS (
      SELECT cv, {_probe_list_sql('ds', 1)}[1] AS cluster FROM base
    )
    SELECT cluster, i - 1 AS dim, COUNT(*) AS n_members,
           ROUND(AVG(cv[i]), 6) + 0 AS value
    FROM assigned CROSS JOIN range(1, {EMBED_DIM + 1}) t(i)
    GROUP BY cluster, i - 1
    """


def embedding_neardup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float,
    split_buckets: int | None = None,
    split_threshold: int = 1024,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: LSH-bucket-blocked
    self-join (only same-bucket pairs are scored), cosine >= threshold.
    Near-identical vectors land in the same bucket with high
    probability; at 100 TB this is the only shape that avoids N^2.

    ``split_buckets``/``split_threshold`` - the lossless grid lane for
    a HOT bucket (relational.grid_split_self_join_sides; SCALING.md
    r9): over-occupancy buckets spread their in-bucket pair
    enumeration - which here carries full vectors and a cosine per
    pair, the heaviest self-join in the repo - over G x G cells with
    bit-identical output. Cold buckets unchanged."""
    base = (
        df.select(_c(id_col).alias("id"), _c(vec_col).alias("v"))
        .select("id", "v", lsh_bucket("v").alias("bucket"))
        # the self-join otherwise evaluates the 8-plane bucket fold once
        # per side, single-threaded off a one-file source (measured 5x)
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    if split_buckets is not None and split_buckets > 1:
        from nyc_government_hiring_audit_data_platform_spark.operators.relational import (
            grid_split_self_join_sides,
        )

        a, b = grid_split_self_join_sides(
            base, ["bucket"], "id", split_buckets, split_threshold
        )
        cond = (
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.p") == F.col("b.p"))
            & (F.col("a.q") == F.col("b.q"))
            & (F.col("a.id") < F.col("b.id"))
        )
    else:
        a, b = base.alias("a"), base.alias("b")
        cond = (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.id") < F.col("b.id"))
    return (
        a.join(b, cond)
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            norm_round(cosine_similarity(F.col("a.v"), F.col("b.v")), 6).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def embedding_neardup_pairs_sql(
    table: str, id_col: str, vec_col: str, threshold: float
) -> str:
    bucket = lsh_bucket_sql(vec_col)
    sim = cosine_sql("a.v", "b.v")
    return f"""
    WITH base AS (SELECT {id_col} AS id, {vec_col} AS v, {bucket} AS bucket FROM {table})
    SELECT a.id AS id_a, b.id AS id_b, ROUND({sim}, 6) + 0 AS cos_sim
    FROM base a JOIN base b ON a.bucket = b.bucket AND a.id < b.id
    WHERE ROUND({sim}, 6) >= {threshold}
    """


# --------------------------------------------------------------------------
# product quantization (Jegou, Douze & Schmid 2011, "Product Quantization
# for Nearest Neighbor Search") — the billion-scale compressed-domain
# search technique: vectors are stored as PQ_M small codes (here 16 x
# 4-bit = 8 bytes instead of 256 bytes of float32), and queries score
# candidates with an asymmetric-distance lookup table (ADC) instead of
# touching the raw vectors. At 100 TB the corpus scan reads ONLY the
# code columns (a 32x I/O reduction with parquet column pruning) and
# per-candidate cost is PQ_M array lookups instead of EMBED_DIM
# multiplies.
# --------------------------------------------------------------------------

PQ_M = 16  # subspaces (16 x 4-bit codes = 8-byte vectors)
PQ_SUBDIM = EMBED_DIM // PQ_M
PQ_K = 16  # codes per subspace (4-bit codes)
# Codeword scale MUST match the data distribution: the corpus
# embeddings have per-component sigma ~0.125 (bounded ~[-0.53, 0.46]);
# unit-sigma codewords would all sit far outside the data ball, making
# nearest-codeword assignment arbitrary and ADC recall ~random
# (measured 0.01-0.05 recall@10 at sigma 1.0 vs ~0.5 after matching).
PQ_SIGMA = 0.125
_pqrng = random.Random(47)
# Deterministic codebooks (literals shared with the oracle SQL), one
# K x SUBDIM table per subspace. A production build would train these
# with k-means per subspace (kmeans_update is the building block); the
# encode/ADC plan shape is identical either way.
PQ_CODEBOOKS: list[list[list[float]]] = [
    [
        [round(_pqrng.gauss(0.0, PQ_SIGMA), 6) for _ in range(PQ_SUBDIM)]
        for _ in range(PQ_K)
    ]
    for _ in range(PQ_M)
]


def _sqdist_spark_sql(vec_expr: str, entry: list[float]) -> str:
    """Spark-SQL squared L2 distance of an array expression to a literal
    codebook entry (sequential left fold; (a-b), (a-b)^2 and each +=
    are single IEEE ops, so the result is bit-identical to the DuckDB
    twin)."""
    lits = ", ".join(f"{x!r}D" for x in entry)
    return (
        f"aggregate(zip_with({vec_expr}, array({lits}), (a, b) -> (a - b) * (a - b)), "
        f"0.0D, (acc, v) -> acc + v)"
    )


def _sqdist_sql(vec_expr: str, entry: list[float]) -> str:
    """DuckDB twin of :func:`_sqdist_spark_sql`."""
    lits = "[" + ", ".join(f"{x}::DOUBLE" for x in entry) + "]"
    return (
        f"list_reduce(list_prepend(0.0::DOUBLE, "
        f"list_transform(list_zip({vec_expr}, {lits}), "
        f"x -> (x[1] - x[2]) * (x[1] - x[2]))), (acc, v) -> acc + v)"
    )


def _pq_dists_sqlstr(sub_col: str, m: int) -> str:
    """Spark-SQL string: squared distances of a (hoisted) subvector
    COLUMN to every entry of subspace ``m``'s codebook (the K x SUBDIM
    literals inline - see _dot_spark_sql for the Py4J-round-trip
    rationale)."""
    return (
        "array("
        + ", ".join(_sqdist_spark_sql(f"`{sub_col}`", e) for e in PQ_CODEBOOKS[m])
        + ")"
    )


def _argmin(dists: Column, n: int) -> Column:
    """Index of the smallest element (ties -> lowest index): natural
    ascending struct sort on (d, i) - identical lexicographic struct
    ordering in Spark and DuckDB."""
    idx = F.sequence(F.lit(0), F.lit(n - 1))
    pairs = F.zip_with(dists, idx, lambda d, i: F.struct(d.alias("d"), i.alias("i")))
    return F.array_sort(pairs)[0]["i"]


def _pq_subvectors(vec: Column) -> list[Column]:
    v = vec.cast("array<double>")
    return [
        F.slice(v, m * PQ_SUBDIM + 1, PQ_SUBDIM).alias(f"_s{m}") for m in range(PQ_M)
    ]


# ONE definition each of the encode / LUT / ADC / rank conventions,
# shared by pq_topk and ivfadc_topk AND (below) their SQL twins — a
# tie-break or indexing tweak applied to one composed search cannot
# silently desynchronize the other (the hand-edited-copy failure mode
# the capstone oracle's shared CTE fragments exist to prevent).


def _pq_codes() -> Column:
    """PQ encode over hoisted ``_s{m}`` subvector columns: per-subspace
    argmin codeword index, as one array<int> column. Rendered as ONE
    parsed SQL string (identical tree to the Column-API form it
    replaced; `_argmin_sqlstr` is the same (d, i) struct sort)."""
    return F.expr(
        "array("
        + ", ".join(
            _argmin_sqlstr(_pq_dists_sqlstr(f"_s{m}", m), PQ_K)
            for m in range(PQ_M)
        )
        + ")"
    )


def _pq_lut() -> Column:
    """Query-side ADC lookup table over hoisted ``_s{m}`` columns:
    PQ_M x PQ_K squared distances (the same distance definition the
    encode argmin minimizes). One parsed SQL string."""
    return F.expr(
        "array("
        + ", ".join(_pq_dists_sqlstr(f"_s{m}", m) for m in range(PQ_M))
        + ")"
    )


def _pq_adist() -> Column:
    """Asymmetric distance: sum of PQ_M lut[m][codes[m]] lookups, in
    fixed subspace order (a sequential IEEE fold, matching the SQL
    twin's left-to-right + chain). One parsed SQL string - the Column
    form cost ~100 Py4J round-trips per use (see _pq_codes_rel)."""
    return F.expr(
        " + ".join(
            f"element_at(element_at(lut, {m + 1}), "
            f"element_at(codes, {m + 1}) + 1)"
            for m in range(PQ_M)
        )
    )


def _pq_rank_topk(scored: DataFrame, k: int) -> DataFrame:
    """The shared tail: per-query rank by (adist, neighbor_id), keep k."""
    w = Window.partitionBy("query_id").orderBy(F.asc("adist"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "neighbor_id", norm_round("adist", 6).alias("adist"), "rank"
        )
    )


def _pq_dcols_sql(vec: str = "v") -> str:
    """DuckDB: per-subspace distance lists ``d0..d{M-1}`` over ``vec``
    (the corpus argmin input AND the query LUT — one distance
    definition for both roles; the residual variant passes its
    residual list instead of the raw vector)."""
    return ", ".join(
        "list_value("
        + ", ".join(
            _sqdist_sql(f"{vec}[{m * PQ_SUBDIM + 1}:{(m + 1) * PQ_SUBDIM}]", e)
            for e in PQ_CODEBOOKS[m]
        )
        + f") AS d{m}"
        for m in range(PQ_M)
    )


def _pq_argmins_sql() -> str:
    """DuckDB: argmin codeword per subspace, (d, i) struct-sort
    tie-break identical to :func:`_argmin`."""
    return ", ".join(
        f"list_sort(list_transform(range(1, {PQ_K + 1}), "
        f"i -> {{'d': d{m}[i], 'i': i - 1}}))[1].i"
        for m in range(PQ_M)
    )


def _pq_luts_sql() -> str:
    return ", ".join(f"d{m}" for m in range(PQ_M))


def _pq_adist_sql() -> str:
    return " + ".join(
        f"q.lut[{m + 1}][c.codes[{m + 1}] + 1]" for m in range(PQ_M)
    )


def _pq_ranked_tail_sql(k: int) -> str:
    """DuckDB: the shared ranked/top-k tail over a ``scored`` CTE."""
    return f"""
    ranked AS (
      SELECT query_id, neighbor_id, adist,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY adist, neighbor_id) AS rank
      FROM scored
    )
    SELECT query_id, neighbor_id, ROUND(adist, 6) + 0 AS adist, rank
    FROM ranked WHERE rank <= {k}
    """


def pq_topk(
    queries: DataFrame,
    corpus: DataFrame,
    query_id: str,
    query_vec: str,
    corpus_id: str,
    corpus_vec: str,
    k: int,
) -> DataFrame:
    """Approximate top-k by PQ asymmetric distance (ADC): the corpus is
    encoded map-side to PQ_M argmin codes and the raw vectors are
    DROPPED before the join - only (id, codes) moves; each query
    broadcasts its PQ_M x PQ_K lookup table (the squared distances of
    its subvectors to every codebook entry), and the per-candidate
    score is the sum of PQ_M table lookups. Smaller distance = nearer;
    approximation error is the quantization error of the codebooks.

    Encoding runs IN the corpus's scan partitions - deliberately no
    repartition here: a fan-out before encode would shuffle the raw
    vectors (measured: a 17-column Exchange of every subvector slice,
    the exact full-corpus vector movement this operator exists to
    avoid; at 100 TB the scan is already thousands of splits and the
    shuffle is pure loss). A caller feeding a single-file local
    fixture can pre-repartition the corpus input if encode needs the
    cores; tests/test_plans.py gates that no Exchange in this
    operator's plan carries a vector column.

    The codebook arrives as the ONE-row broadcast ``cb`` relation
    (r13, like the residual family - see :func:`_pq_cb_rel`): the
    inline-literal form carried 256 four-literal distance folds per
    side (~200 KB of formatted plan) and paid flat driver
    analysis/planning per action; codes and LUT values are
    bit-identical (same distance definition, evaluation order and
    tie-break - :func:`_pq_codes_rel` notes)."""
    model = _pq_cb_rel(corpus.sparkSession)
    c = (
        corpus.select(
            _c(corpus_id).alias("neighbor_id"),
            _c(corpus_vec).cast("array<double>").alias("cv"),
        )
        .crossJoin(F.broadcast(model))
        .select("neighbor_id", _pq_codes_rel("cv").alias("codes"))
    )
    q = (
        queries.select(
            _c(query_id).alias("query_id"),
            _c(query_vec).cast("array<double>").alias("qv"),
        )
        .crossJoin(F.broadcast(model))
        .select("query_id", _pq_lut_rel("qv").alias("lut"))
    )
    scored = c.join(
        F.broadcast(q), F.col("query_id") != F.col("neighbor_id")
    ).select("query_id", "neighbor_id", _pq_adist().alias("adist"))
    return _pq_rank_topk(scored, k)


def pq_topk_sql(
    table: str, id_col: str, vec_col: str, query_pred: str, k: int
) -> str:
    """DuckDB twin: the per-vector distance lists double as the corpus
    argmin input AND the query LUT, so encode and ADC provably share
    one distance definition."""
    return f"""
    WITH cb AS (SELECT {id_col}, ({vec_col}::DOUBLE[]) AS v FROM {table}),
    d AS (SELECT {id_col}, {_pq_dcols_sql()} FROM cb),
    c AS (SELECT {id_col} AS neighbor_id, [{_pq_argmins_sql()}] AS codes FROM d),
    q AS (SELECT {id_col} AS query_id, [{_pq_luts_sql()}] AS lut
          FROM d WHERE {query_pred}),
    scored AS (
      SELECT q.query_id, c.neighbor_id, {_pq_adist_sql()} AS adist
      FROM q, c WHERE q.query_id <> c.neighbor_id
    ),
    {_pq_ranked_tail_sql(k)}
    """


def ivfadc_topk(
    queries: DataFrame,
    corpus: DataFrame,
    query_id: str,
    query_vec: str,
    corpus_id: str,
    corpus_vec: str,
    k: int,
    nprobe: int = 4,
) -> DataFrame:
    """IVFADC (Jegou, Douze & Schmid 2011 §V) - the composed index the
    paper actually deploys: the IVF coarse quantizer restricts WHICH
    candidates are scored (each query probes only its ``nprobe``
    nearest of NUM_CENTROIDS clusters), and PQ asymmetric distance
    scores them in the compressed domain (PQ_M 4-bit codes per vector,
    raw vectors dropped map-side). At 100 TB the two savings multiply:
    candidate volume is ~nprobe/NUM_CENTROIDS of the corpus AND each
    candidate ships 8 bytes of codes instead of 256 bytes of floats -
    the cluster-id equi-join moves (id, codes) only, the query side
    broadcasts (probe rows x LUT).

    Deviation from the paper, documented: codes are computed on RAW
    vectors, not residuals (v - centroid). The paper's residual
    encoding assumes the coarse quantizer is TRAINED so residuals are
    small and centered; the pinned deterministic CENTROIDS here are
    sigma-1.0 while the corpus is sigma ~0.125 (see PQ_SIGMA), so
    residuals would be sigma ~1.0 - an 8x scale mismatch with the
    PQ codebooks, the measured-recall ~0.05 failure mode. Raw-vector
    encoding keeps quantization error matched; with trained centroids
    the residual variant is one extra zip_with before _pq_subvectors.

    With nprobe = NUM_CENTROIDS this is exactly ``pq_topk`` (probing
    every cluster = no coarse filter) - the composition property the
    test suite asserts.

    Like :func:`pq_topk`, cluster assignment + encoding run IN the
    corpus's scan partitions (no repartition): anything else would
    shuffle raw vectors, defeating the 8-byte-code design.

    Both model halves - the pinned CENTROIDS and PQ_CODEBOOKS - arrive
    as ONE broadcast one-row relation (r13, the residual family's
    shape): the inline-literal form carried ~240 KB of formatted plan
    and paid flat driver analysis/planning per action; dots, codes and
    LUT values are bit-identical (:func:`_cent_rel`,
    :func:`_pq_codes_rel` notes)."""
    spark = corpus.sparkSession
    model = _cent_rel(spark).crossJoin(F.broadcast(_pq_cb_rel(spark)))
    c = (
        corpus.select(
            _c(corpus_id).alias("neighbor_id"),
            _c(corpus_vec).cast("array<double>").alias("cv"),
        )
        .crossJoin(F.broadcast(model))
        .select(
            "neighbor_id", "cv", "cb",
            _arr_dotprods("cv", "arr").alias("dots"),
        )
        .select(
            "neighbor_id",
            _probe_list(F.col("dots"), 1)[0].alias("cluster"),
            _pq_codes_rel("cv").alias("codes"),
        )
    )
    q = (
        queries.select(
            _c(query_id).alias("query_id"),
            _c(query_vec).cast("array<double>").alias("qv"),
        )
        .crossJoin(F.broadcast(model))
        .select(
            "query_id", "qv", "cb",
            _arr_dotprods("qv", "arr").alias("dots"),
        )
        .select(
            "query_id",
            F.explode(_probe_list(F.col("dots"), nprobe)).alias("cluster"),
            _pq_lut_rel("qv").alias("lut"),
        )
    )
    scored = c.join(
        F.broadcast(q),
        (q["cluster"] == c["cluster"]) & (F.col("query_id") != F.col("neighbor_id")),
    ).select("query_id", "neighbor_id", _pq_adist().alias("adist"))
    return _pq_rank_topk(scored, k)


def ivfadc_topk_sql(
    table: str, id_col: str, vec_col: str, query_pred: str, k: int, nprobe: int = 4
) -> str:
    """DuckDB twin of :func:`ivfadc_topk`: the per-vector distance
    lists double as the corpus argmin input AND the query LUT (one
    distance definition, like pq_topk_sql), and the cluster columns
    reuse the ivf_topk_sql coarse-quantizer fragments."""
    dots = _centroid_dots_sql(vec_col)
    return f"""
    WITH cb AS (SELECT {id_col}, ({vec_col}::DOUBLE[]) AS v, {dots} AS ds
                FROM {table}),
    d AS (SELECT {id_col}, {_probe_list_sql('ds', 1)}[1] AS cluster,
                 {_pq_dcols_sql()}, ds FROM cb),
    c AS (SELECT {id_col} AS neighbor_id, cluster,
                 [{_pq_argmins_sql()}] AS codes FROM d),
    q AS (SELECT {id_col} AS query_id, unnest({_probe_list_sql('ds', nprobe)})
             AS cluster, [{_pq_luts_sql()}] AS lut
          FROM d WHERE {query_pred}),
    scored AS (
      SELECT q.query_id, c.neighbor_id, {_pq_adist_sql()} AS adist
      FROM q JOIN c ON q.cluster = c.cluster AND q.query_id <> c.neighbor_id
    ),
    {_pq_ranked_tail_sql(k)}
    """


# --------------------------------------------------------------------------
# Trained coarse quantizer + residual IVFADC (Jegou et al. 2011 §V, the
# paper's deployed form: PQ codes quantize the RESIDUAL v - centroid)
# --------------------------------------------------------------------------

KM_ITERS = 2  # Lloyd iterations for the coarse quantizer (unrolled in
# both engines; 2 is enough to center residuals on this corpus - the
# within-cluster residual energy drop is asserted in tests)

# The residual family's big expressions are rendered as ONE Spark-SQL
# string each (F.expr) instead of Column-API calls: the Column form of
# this query cost ~10k Py4J round-trips of pure driver time per
# construction (profiled ~3-5 s at ANY scale); the string parses
# JVM-side to the identical expression tree. Same rationale as
# _dot_spark_sql.

_SQDIST_LAMBDA = (
    "aggregate(zip_with({a}, {b}, (a, b) -> (a - b) * (a - b)), "
    "0.0D, (acc, x) -> acc + x)"
)


def _argmin_sqlstr(ds: str, n: int) -> str:
    """Spark-SQL twin of :func:`_argmin` (same (d, i) struct sort,
    0-based [] subscript)."""
    return (
        f"array_sort(zip_with({ds}, sequence(0, {n - 1}), "
        f"(d, i) -> named_struct('d', d, 'i', i)))[0].i"
    )


def _sqdist_cols_sql(v: str, cv: str) -> str:
    """DuckDB twin of ``_SQDIST_LAMBDA`` (squared L2 between two array
    expressions): (a-b), square, sequential left-fold add - all single
    IEEE ops, so values are bit-identical cross-engine."""
    return (
        f"list_reduce(list_prepend(0.0::DOUBLE, "
        f"list_transform(list_zip({v}, {cv}), "
        f"x -> (x[1] - x[2]) * (x[1] - x[2]))), (acc, x) -> acc + x)"
    )


def _cent_arr(cents: DataFrame) -> DataFrame:
    """ONE-row relation: the (cluster, cv) centroid rows packed into a
    cluster-sorted array<struct> - broadcast to make cluster assignment
    a map-side fold (arr[cluster + 1] is exact because every cluster id
    0..NUM_CENTROIDS-1 is always present: empty clusters keep their
    previous centroid in the Lloyd update)."""
    return cents.agg(
        F.array_sort(F.collect_list(F.struct("cluster", "cv"))).alias("arr")
    )


def _arr_dists(v: str, arr: str) -> Column:
    """Array of squared distances of column ``v`` to every centroid in
    the packed ``arr`` column (fold per element, each evaluated once).
    Rendered as one SQL string - same tree, one Py4J round-trip (see
    _pq_codes_rel)."""
    sq = _SQDIST_LAMBDA.format(a=v, b="s.cv")
    return F.expr(f"transform({arr}, s -> {sq})")


def _probe_list_l2(dists: Column, nprobe: int) -> Column:
    """Ids of the nprobe SMALLEST-distance centroids, nearest first
    ((d, i) struct sort - ascending lexicographic, ties by id, same as
    the DuckDB twin's ORDER BY d, cluster)."""
    idx = F.sequence(F.lit(0), F.lit(NUM_CENTROIDS - 1))
    pairs = F.zip_with(dists, idx, lambda d, i: F.struct(d.alias("d"), i.alias("i")))
    return F.transform(F.slice(F.array_sort(pairs), 1, nprobe), lambda x: x["i"])


def _probe_list_l2_sqlstr(ds: str, nprobe: int) -> str:
    """SQL-string twin of :func:`_probe_list_l2` (identical tree; one
    Py4J round-trip - see _pq_codes_rel)."""
    return (
        f"transform(slice(array_sort(zip_with({ds}, "
        f"sequence(0, {NUM_CENTROIDS - 1}), "
        f"(d, i) -> named_struct('d', d, 'i', i))), 1, {nprobe}), x -> x.i)"
    )


def _pq_cb_rel(spark) -> DataFrame:
    """ONE-row relation holding PQ_CODEBOOKS as DATA
    (``cb``: 16 x 16 x 4 doubles). Broadcast and referenced as a column,
    the codebook stays OUT of the expression tree: the literal form
    inlines 256 four-literal distance folds per side, and because
    Dataset construction re-analyzes its whole logical tree EAGERLY on
    every transformation, that tree size is a flat driver-side cost
    paid per action at every scale (the measured ~6 s constant on the
    residual driver slots - profiled as Py4J/analyzer time, not
    execution). Values round-trip createDataFrame exactly (Python
    floats ARE doubles), so distances are bit-identical to the literal
    form - and a TRAINED codebook would arrive as a relation anyway;
    this is the production shape, the pinned literals are the test
    determinism device."""
    return spark.createDataFrame(
        [(PQ_CODEBOOKS,)], "cb array<array<array<double>>>"
    )


def _pq_subs_sqlstr(rv: str) -> str:
    """The 16 subvectors of ``rv`` as one array<array<double>>, so each
    slice is evaluated ONCE per row (an inner-lambda slice would
    re-evaluate per codebook entry - 256 instead of 16 per row, a
    measured sf0.1 regression in the interpreted HOF path)."""
    return (
        f"transform(sequence(0, {PQ_M - 1}), "
        f"m -> slice({rv}, m * {PQ_SUBDIM} + 1, {PQ_SUBDIM}))"
    )


def _pq_codes_rel(rv: str = "rv") -> Column:
    """PQ encode against the broadcast ``cb`` codebook column:
    codes[m] = argmin_k sqdist(rv[m*SUBDIM+1 .. +SUBDIM], cb[m][k]),
    as one zip_with over (subvectors, codebooks) - sub and book bind
    once per subspace. Same distance definition, evaluation order and
    (d, i) struct-sort tie-break as the literal :func:`_pq_codes` -
    bit-identical codes."""
    ds = "transform(book, e -> " + _SQDIST_LAMBDA.format(a="sub", b="e") + ")"
    return F.expr(
        f"zip_with({_pq_subs_sqlstr(rv)}, cb, "
        f"(sub, book) -> {_argmin_sqlstr(ds, PQ_K)})"
    )


def _pq_lut_rel(rv: str = "rv") -> Column:
    """Query-side ADC lookup table against the broadcast ``cb`` column:
    lut[m][k] = the same sqdist the encode argmin minimizes (one
    distance definition for both roles, like :func:`_pq_lut`)."""
    ds = "transform(book, e -> " + _SQDIST_LAMBDA.format(a="sub", b="e") + ")"
    return F.expr(
        f"zip_with({_pq_subs_sqlstr(rv)}, cb, (sub, book) -> {ds})"
    )


def kmeans_train(corpus: DataFrame, vec_col: str, iters: int = KM_ITERS) -> DataFrame:
    """Train the coarse quantizer: ``iters`` unrolled Lloyd updates from
    the pinned CENTROIDS seed, entirely relational (no driver sync) -
    assignment is a map-side argmin fold against the ONE-row broadcast
    centroid array, the update is one (cluster, dim)-keyed partial agg
    per iteration: at 100 TB each pass reduces the corpus to
    NUM_CENTROIDS x EMBED_DIM rows, the distributed k-means shape.

    Cross-engine exactness: members are float32 components widened to
    double, which sum EXACTLY in double at any realistic cluster size
    (24-bit mantissas in a bounded exponent range), so AVG is
    order-independent; assignment comparisons are folds of single IEEE
    ops; empty clusters keep their previous centroid (COALESCE on both
    engines). Returns the (cluster, cv) relation."""
    spark = corpus.sparkSession
    cent = spark.createDataFrame(
        [(i, CENTROIDS[i]) for i in range(NUM_CENTROIDS)],
        "cluster int, cv array<double>",
    )
    v = corpus.select(_c(vec_col).cast("array<double>").alias("v"))
    for it in range(iters):
        # every pass assigns against the BROADCAST centroid relation
        # (iteration 1 once inlined the seed as a literal SQL string for
        # whole-stage codegen; identical op sequence and identical
        # doubles either way - the seed relation round-trips the same
        # repr literals - but the 16x64 literal block made the analyzed
        # tree so large that EAGER re-analysis on every downstream
        # Dataset creation cost more flat driver time than interpreted
        # HOF assignment costs at execution; see _pq_cb_rel)
        assigned = (
            v.crossJoin(F.broadcast(_cent_arr(cent)))
            .select("v", _arr_dists("v", "arr").alias("ds"))
            .select(
                "v",
                F.expr(_argmin_sqlstr("ds", NUM_CENTROIDS)).alias("cluster"),
            )
        )
        # ONE exchange per pass: 64 per-dim AVG aggregates in a single
        # groupBy(cluster) (partial agg map-side), packed back into the
        # centroid array - equivalent to the posexplode +
        # groupBy(cluster, dim) + collect_list form but one shuffle and
        # two fewer stages per iteration (the flat stage-scheduling cost
        # dominated the sf0.01 wall), and the same doubles: AVG over
        # float32-widened components is order-independent (exact sums)
        upd = (
            assigned.groupBy("cluster")
            .agg(*[F.expr(f"avg(v[{d}]) AS _d{d}") for d in range(EMBED_DIM)])
            .select(
                "cluster",
                F.expr(
                    "array(" + ", ".join(f"_d{d}" for d in range(EMBED_DIM)) + ")"
                ).alias("ncv"),
            )
        )
        cent = cent.join(upd, "cluster", "left").select(
            "cluster", F.coalesce("ncv", "cv").alias("cv")
        )
    # 16 rows, but its lineage is `iters` full corpus passes and BOTH
    # sides of a residual search broadcast it. localCheckpoint, not
    # persist (r13, guide §3.3): persist ran the training once but
    # left the Lloyd-pass lineage (64 avg-agg expressions x iters) in
    # the analyzed tree, re-embedded at EVERY consumer reference - the
    # residual family's plans ran 77-332 KB formatted with seconds of
    # flat driver analysis/planning per action. As a 16-row leaf the
    # training still executes exactly once and the same centroid rows
    # feed every consumer (oracle hash-verified).
    return cent.localCheckpoint(eager=True)


def kmeans_train_ctes_sql(
    table: str, vec_col: str, iters: int = KM_ITERS, p: str = "km"
) -> str:
    """DuckDB twin of :func:`kmeans_train` as a CTE chain (no WITH):
    binds ``{p}v`` (id, v) and ``{p}cent{iters}`` (cluster, cv).
    Assignment = MIN over the (d, cluster) struct per id (exact float
    comparisons, ties by cluster - same as the Spark argmin's (d, i)
    struct sort); update = AVG per (cluster, dim) with COALESCE
    carry-forward for empty clusters."""
    cent0 = ", ".join(
        f"({i}, [{', '.join(repr(x) + '::DOUBLE' for x in CENTROIDS[i])}])"
        for i in range(NUM_CENTROIDS)
    )
    ctes = [
        f"{p}cent0(cluster, cv) AS (VALUES {cent0})",
        f"{p}v AS (SELECT ROW_NUMBER() OVER (ORDER BY ALL) AS _kid,"
        f" ({vec_col}::DOUBLE[]) AS v FROM {table})",
    ]
    for it in range(1, iters + 1):
        prev = f"{p}cent{it - 1}"
        d = _sqdist_cols_sql("b.v", "c.cv")
        ctes += [
            f"""{p}asg{it} AS (
      SELECT b._kid, ANY_VALUE(b.v) AS v,
             MIN(struct_pack(d := {d}, c := c.cluster)).c AS cluster
      FROM {p}v b CROSS JOIN {prev} c GROUP BY b._kid
    )""",
            f"""{p}upd{it} AS (
      SELECT cluster, i AS dim, AVG(v[i]) AS val
      FROM {p}asg{it} CROSS JOIN range(1, {EMBED_DIM + 1}) t(i)
      GROUP BY cluster, i
    )""",
            f"""{p}ncv{it} AS (
      SELECT cluster, list(val ORDER BY dim) AS ncv
      FROM {p}upd{it} GROUP BY cluster
    )""",
            f"""{p}cent{it} AS (
      SELECT c.cluster, COALESCE(n.ncv, c.cv) AS cv
      FROM {prev} c LEFT JOIN {p}ncv{it} n USING (cluster)
    )""",
        ]
    return ",\n    ".join(ctes)


def ivfadc_residual_topk(
    queries: DataFrame,
    corpus: DataFrame,
    query_id: str,
    query_vec: str,
    corpus_id: str,
    corpus_vec: str,
    k: int,
    nprobe: int = 4,
    iters: int = KM_ITERS,
) -> DataFrame:
    """Residual-encoded IVFADC on a TRAINED coarse quantizer - exactly
    the index Jegou et al. 2011 §V deploys: Lloyd-trained centroids
    (see :func:`kmeans_train`), PQ codes over the residual
    ``v - centroid[cluster]``, query LUT per probed cluster over
    ``q - centroid[probe]`` (the asymmetric distance then approximates
    TRUE L2, coarse offset removed - the reason the paper's recall
    beats raw-vector encoding once the quantizer is trained; the
    raw-vector deviation in :func:`ivfadc_topk` existed only because
    its pinned sigma-1.0 centroids made residuals an 8x scale mismatch
    with the codebooks).

    Plan shape at 100 TB: training = iters x (map-side assign fold +
    (cluster, dim)-keyed partial agg); index = map-side cluster + codes
    in the corpus scan partitions (no vector shuffle - the plan gate);
    search = broadcast (query x probe) LUT rows against the (id,
    cluster, 8-byte codes) relation on a cluster equi-join. The coarse
    quantizer here is min-L2 on both sides (train/search consistency),
    vs the max-dot probe of the untrained variants.

    Both model halves - trained centroids AND PQ codebooks - arrive as
    ONE broadcast one-row relation (``arr``, ``cb``) instead of inline
    literals: see :func:`_pq_cb_rel` for why the literal form's
    expression-tree size was a flat ~6 s/action driver cost."""
    cents = kmeans_train(corpus.select(_c(corpus_vec).alias("v")), "v", iters)
    model = _cent_arr(cents).crossJoin(_pq_cb_rel(corpus.sparkSession))

    def encode(side: DataFrame, id_col: str, vec_col: str, out_id: str) -> DataFrame:
        return (
            side.select(
                _c(id_col).alias(out_id),
                _c(vec_col).cast("array<double>").alias("v"),
            )
            .crossJoin(F.broadcast(model))
            .select(out_id, "v", "arr", "cb", _arr_dists("v", "arr").alias("ds"))
        )

    def residual(keep: str) -> list[Column]:
        rv = F.zip_with(
            "v",
            F.element_at(F.col("arr"), F.col("cluster") + 1)["cv"],
            lambda a, b: a - b,
        )
        return [F.col(keep), F.col("cluster"), F.col("cb"), rv.alias("rv")]

    c = (
        encode(corpus, corpus_id, corpus_vec, "neighbor_id")
        .select(
            "neighbor_id", "v", "arr", "cb",
            F.expr(_argmin_sqlstr("ds", NUM_CENTROIDS)).alias("cluster"),
        )
        .select(*residual("neighbor_id"))
        .select("neighbor_id", "cluster", _pq_codes_rel("rv").alias("codes"))
    )
    q = (
        encode(queries, query_id, query_vec, "query_id")
        .select(
            "query_id", "v", "arr", "cb",
            F.expr(
                f"explode({_probe_list_l2_sqlstr('ds', nprobe)})"
            ).alias("cluster"),
        )
        .select(*residual("query_id"))
        .select("query_id", "cluster", _pq_lut_rel("rv").alias("lut"))
    )
    scored = c.join(
        F.broadcast(q),
        (q["cluster"] == c["cluster"]) & (F.col("query_id") != F.col("neighbor_id")),
    ).select("query_id", "neighbor_id", _pq_adist().alias("adist"))
    return _pq_rank_topk(scored, k)


MMR_LAMBDA = 0.5  # relevance-vs-redundancy weight (the paper's default
# trade point; 0.5 * x is exact in IEEE doubles, so the score chain
# stays bit-identical cross-engine)


def mmr_diverse_topk(
    query: DataFrame,
    corpus: DataFrame,
    query_id: str,
    query_vec: str,
    corpus_id: str,
    corpus_vec: str,
    k: int,
    pool: int = 50,
    lam: float = MMR_LAMBDA,
) -> DataFrame:
    """Maximal Marginal Relevance diversification (Carbonell &
    Goldstein 1998) - the result-diversification stage a retrieval
    pipeline runs AFTER candidate generation: from a bounded relevance
    pool (exact cosine top-``pool`` for the ONE-row query relation -
    production takes its ANN shortlist instead), greedily pick k items
    maximizing ``sim_to_query - lam * max_sim_to_already_selected``.

    Plan shape: the pool is a top-``pool`` global sort (bounded,
    persisted); each greedy step is one bounded relational job over
    pool x selected (<= pool * k cosine folds total) with a 1-ROW
    winner collect - the BPE-trainer driver-sync pattern, used here
    because re-embedding the growing selected set relationally doubles
    the plan per step (2^k tree blowup, the round-6 capstone lesson).
    At 100 TB nothing scales with the corpus except the pool-building
    top-k, which is the already-audited cosine/ANN machinery.

    Exactness: cosine folds are the proven bit-identical machinery;
    lam = 0.5 multiplies exactly; subtraction and the (score desc, id)
    argmax are single IEEE comparisons - the DuckDB twin's recursive
    CTE selects the identical ids. Empty-selected first step scores
    plain sim_to_query. Ids keep their SOURCE type (string/decimal ids
    work like every sibling ANN operator): the selected-set relation
    and the output schema are built from the corpus id column's
    DataType, and collected id values round-trip uncast."""
    from pyspark.sql import types as T

    spark = corpus.sparkSession
    q = query.select(
        _c(query_id).alias("qid"), _c(query_vec).cast("array<double>").alias("qv")
    )
    c = corpus.select(
        _c(corpus_id).alias("id"), _c(corpus_vec).cast("array<double>").alias("v")
    )
    id_type = c.schema["id"].dataType
    pool_df = (
        c.join(F.broadcast(q), F.col("qid") != F.col("id"))
        .select("id", "v", cosine_similarity(F.col("qv"), F.col("v")).alias("simq"))
        .orderBy(F.desc("simq"), F.asc("id"))
        .limit(pool)
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    picked: list = []  # (rank, id, mmr, vec)
    for step in range(k):
        if not picked:
            cand = pool_df.select("id", "v", F.col("simq").alias("mmr"))
        else:
            sel_rel = spark.createDataFrame(
                [(i, list(v)) for _, i, _, v in picked],
                T.StructType(
                    [
                        T.StructField("sid", id_type),
                        T.StructField("sv", T.ArrayType(T.DoubleType())),
                    ]
                ),
            )
            remaining = pool_df.filter(
                ~F.col("id").isin([i for _, i, _, _ in picked])
            )
            red = (
                remaining.crossJoin(F.broadcast(sel_rel))
                .select(
                    "id",
                    cosine_similarity(F.col("v"), F.col("sv")).alias("cs"),
                )
                .groupBy("id")
                .agg(F.max("cs").alias("mcs"))
            )
            cand = remaining.join(red, "id").select(
                "id", "v", (F.col("simq") - F.lit(lam) * F.col("mcs")).alias("mmr")
            )
        winner = cand.orderBy(F.desc("mmr"), F.asc("id")).limit(1).collect()
        if not winner:  # pool exhausted (k > pool, or tiny corpus)
            break
        w = winner[0]
        picked.append((step + 1, w["id"], w["mmr"], w["v"]))
    pool_df.unpersist()
    out = spark.createDataFrame(
        [(r, i, float(m)) for r, i, m, _ in picked],
        T.StructType(
            [
                T.StructField("rank", T.IntegerType()),
                T.StructField("neighbor_id", id_type),
                T.StructField("mmr", T.DoubleType()),
            ]
        ),
    )
    return out.select("rank", "neighbor_id", norm_round("mmr", 6).alias("mmr"))


def mmr_diverse_topk_sql(
    table: str,
    id_col: str,
    vec_col: str,
    query_pred: str,
    k: int,
    pool: int = 50,
    lam: float = MMR_LAMBDA,
) -> str:
    """DuckDB twin of :func:`mmr_diverse_topk`: the greedy loop as a
    recursive CTE carrying the selected-id list forward; per-step
    argmax via MIN over a (-score, id) struct (exact doubles, same
    tie-break as the Spark ORDER BY score DESC, id).

    Pool-exhaustion parity: when the pool has fewer than k rows the
    Spark greedy loop breaks and emits only |pool| ranks, so the twin
    must truncate identically - the base case is guarded with
    HAVING COUNT(*) > 0 (an empty pool otherwise yields one all-NULL
    aggregate row) and the recursive arm filters ``w.ws IS NOT NULL``
    (a MIN over an empty remaining set otherwise keeps emitting
    NULL-id ranks up to k)."""
    cosq = cosine_sql("q.qv", f"(c.{vec_col}::DOUBLE[])")
    cospp = cosine_sql("p2.v", "ps.v")
    return f"""
    WITH RECURSIVE q AS (
      SELECT {id_col} AS qid, ({vec_col}::DOUBLE[]) AS qv
      FROM {table} WHERE {query_pred}
    ),
    pool AS (
      SELECT c.{id_col} AS id, (c.{vec_col}::DOUBLE[]) AS v, {cosq} AS simq
      FROM {table} c, q WHERE c.{id_col} <> q.qid
      ORDER BY simq DESC, id LIMIT {pool}
    ),
    sel AS (
      SELECT 1 AS rank,
             (MIN(struct_pack(negm := -simq, i := id))).i AS id,
             -(MIN(struct_pack(negm := -simq, i := id))).negm AS mmr,
             [(MIN(struct_pack(negm := -simq, i := id))).i] AS ids
      FROM pool
      HAVING COUNT(*) > 0
      UNION ALL
      SELECT s.rank + 1 AS rank,
             w.ws.i AS id,
             -w.ws.negm AS mmr,
             list_append(s.ids, w.ws.i) AS ids
      FROM sel s CROSS JOIN LATERAL (
        SELECT MIN(struct_pack(negm := -(p.simq - {lam} * p.mcs), i := p.id))
                 AS ws
        FROM (
          SELECT p2.id, p2.simq, MAX({cospp}) AS mcs
          FROM pool p2 JOIN pool ps ON list_contains(s.ids, ps.id)
          WHERE NOT list_contains(s.ids, p2.id)
          GROUP BY p2.id, p2.simq
        ) p
      ) w
      WHERE s.rank < {k} AND w.ws IS NOT NULL
    )
    SELECT rank, id AS neighbor_id, ROUND(mmr, 6) + 0 AS mmr FROM sel
    """


def mmr_panel_topk(
    queries: DataFrame,
    corpus: DataFrame,
    query_id: str,
    query_vec: str,
    corpus_id: str,
    corpus_vec: str,
    k: int,
    pool: int = 50,
    lam: float = MMR_LAMBDA,
) -> DataFrame:
    """Panel MMR: diversify EVERY query of a bounded panel in the same
    k greedy steps :func:`mmr_diverse_topk` spends on one query - the
    production reranker shape, where a request batch (or an offline
    eval panel) is diversified together instead of per-query loops.

    Same greedy, one structural change: the per-step winner is a
    per-``query_id`` window argmax (row_number rank-1 over
    (mmr DESC, id ASC)) collected once per step - so the driver syncs
    k times TOTAL regardless of panel size, each collect bounded by
    |panel| rows and the selected-set relation by |panel| * k rows.
    Pools are per-query exact cosine top-``pool`` (the quarantined
    brute-force lane; production feeds each query's ANN shortlist),
    built in ONE windowed pass (WindowGroupLimit: partial top-pool
    map-side). Redundancy joins stay keyed on query_id, so candidates
    only ever compare against their own query's selected set.

    Per panel member the picks are IDENTICAL to the single-query
    operator (property-tested): the greedy is independent across
    queries and the per-qid argmax applies the same (mmr DESC, id)
    order the single-query 1-row winner uses. Ids keep their source
    types (panel id and corpus id independently). Output
    (query_id, rank, neighbor_id, mmr)."""
    from pyspark.sql import types as T

    spark = corpus.sparkSession
    q = queries.select(
        _c(query_id).alias("qid"), _c(query_vec).cast("array<double>").alias("qv")
    )
    c = corpus.select(
        _c(corpus_id).alias("id"), _c(corpus_vec).cast("array<double>").alias("v")
    )
    qid_type = q.schema["qid"].dataType
    id_type = c.schema["id"].dataType
    w_pool = Window.partitionBy("qid").orderBy(F.desc("simq"), F.asc("id"))
    pool_df = (
        c.join(F.broadcast(q), F.col("qid") != F.col("id"))
        .select(
            "qid", "id", "v",
            cosine_similarity(F.col("qv"), F.col("v")).alias("simq"),
        )
        .withColumn("rn", F.row_number().over(w_pool))
        .filter(F.col("rn") <= pool)
        .drop("rn")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    sel_schema = T.StructType(
        [
            T.StructField("qid", qid_type),
            T.StructField("sid", id_type),
            T.StructField("sv", T.ArrayType(T.DoubleType())),
        ]
    )
    w_step = Window.partitionBy("qid").orderBy(F.desc("mmr"), F.asc("id"))
    picked: list = []  # (qid, rank, id, mmr, vec)
    for step in range(k):
        if not picked:
            cand = pool_df.select("qid", "id", "v", F.col("simq").alias("mmr"))
        else:
            sel_rel = spark.createDataFrame(
                [(qi, i, list(v)) for qi, _, i, _, v in picked], sel_schema
            )
            remaining = pool_df.join(
                F.broadcast(sel_rel.select("qid", F.col("sid").alias("id"))),
                ["qid", "id"],
                "left_anti",
            )
            red = (
                remaining.join(F.broadcast(sel_rel), "qid")
                .select(
                    "qid", "id",
                    cosine_similarity(F.col("v"), F.col("sv")).alias("cs"),
                )
                .groupBy("qid", "id")
                .agg(F.max("cs").alias("mcs"))
            )
            cand = remaining.join(red, ["qid", "id"]).select(
                "qid", "id", "v",
                (F.col("simq") - F.lit(lam) * F.col("mcs")).alias("mmr"),
            )
        winners = (
            cand.withColumn("rn", F.row_number().over(w_step))
            .filter(F.col("rn") == 1)
            .select("qid", "id", "mmr", "v")
            .collect()
        )
        if not winners:  # every pool exhausted (k > pool everywhere)
            break
        for w in winners:
            picked.append((w["qid"], step + 1, w["id"], w["mmr"], w["v"]))
    pool_df.unpersist()
    out = spark.createDataFrame(
        [(qi, r, i, float(m)) for qi, r, i, m, _ in picked],
        T.StructType(
            [
                T.StructField("query_id", qid_type),
                T.StructField("rank", T.IntegerType()),
                T.StructField("neighbor_id", id_type),
                T.StructField("mmr", T.DoubleType()),
            ]
        ),
    )
    return out.select(
        "query_id", "rank", "neighbor_id", norm_round("mmr", 6).alias("mmr")
    )


def mmr_panel_topk_sql(
    table: str,
    id_col: str,
    vec_col: str,
    panel_pred: str,
    k: int,
    pool: int = 50,
    lam: float = MMR_LAMBDA,
) -> str:
    """DuckDB twin of :func:`mmr_panel_topk`: the single-query
    recursive CTE gains a query_id dimension - the base case GROUPs BY
    qid (one rank-1 row per panel member), the recursive arm advances
    every member's row independently with its lateral argmax keyed on
    ``s.qid``, and both pool-exhaustion guards carry over (HAVING on
    the grouped base case is per-group and so already exact; the
    ws IS NOT NULL filter stops a member whose pool ran dry while the
    others continue)."""
    cosq = cosine_sql("q.qv", f"(c.{vec_col}::DOUBLE[])")
    cospp = cosine_sql("p2.v", "ps.v")
    return f"""
    WITH RECURSIVE q AS (
      SELECT {id_col} AS qid, ({vec_col}::DOUBLE[]) AS qv
      FROM {table} WHERE {panel_pred}
    ),
    pool AS (
      SELECT qid, id, v, simq FROM (
        SELECT qid, id, v, simq,
               ROW_NUMBER() OVER (PARTITION BY qid ORDER BY simq DESC, id) AS rn
        FROM (
          SELECT q.qid, c.{id_col} AS id, (c.{vec_col}::DOUBLE[]) AS v,
                 {cosq} AS simq
          FROM {table} c, q WHERE c.{id_col} <> q.qid
        )
      ) WHERE rn <= {pool}
    ),
    sel AS (
      SELECT qid, 1 AS rank,
             (MIN(struct_pack(negm := -simq, i := id))).i AS id,
             -(MIN(struct_pack(negm := -simq, i := id))).negm AS mmr,
             [(MIN(struct_pack(negm := -simq, i := id))).i] AS ids
      FROM pool
      GROUP BY qid
      UNION ALL
      SELECT s.qid, s.rank + 1 AS rank,
             w.ws.i AS id,
             -w.ws.negm AS mmr,
             list_append(s.ids, w.ws.i) AS ids
      FROM sel s CROSS JOIN LATERAL (
        SELECT MIN(struct_pack(negm := -(p.simq - {lam} * p.mcs), i := p.id))
                 AS ws
        FROM (
          SELECT p2.id, p2.simq, MAX({cospp}) AS mcs
          FROM pool p2
          JOIN pool ps ON ps.qid = s.qid AND list_contains(s.ids, ps.id)
          WHERE p2.qid = s.qid AND NOT list_contains(s.ids, p2.id)
          GROUP BY p2.id, p2.simq
        ) p
      ) w
      WHERE s.rank < {k} AND w.ws IS NOT NULL
    )
    SELECT qid AS query_id, rank, id AS neighbor_id,
           ROUND(mmr, 6) + 0 AS mmr
    FROM sel
    """


def ivfadc_rerank_topk(
    queries: DataFrame,
    corpus: DataFrame,
    query_id: str,
    query_vec: str,
    corpus_id: str,
    corpus_vec: str,
    k: int,
    nprobe: int = 4,
    shortlist_factor: int = 4,
    iters: int = KM_ITERS,
) -> DataFrame:
    """Exact-rerank tail of the deployed IVFADC stack (Jegou et al.
    2011 §V-C): :func:`ivfadc_residual_topk` produces a
    ``k * shortlist_factor`` shortlist in the compressed domain, then
    ONLY the shortlist's raw vectors are fetched back by an id
    equi-join and re-scored with the EXACT squared L2. ADC quantization
    error is thereby confined to shortlist MEMBERSHIP - the final
    ordering is exact, so every true neighbor the shortlist contains
    surfaces in the top-k (recall@k equals the shortlist's recall, and
    can only improve on the ADC ordering's).

    100 TB shape: the shortlist is bounded (|queries| x shortlist) and
    BROADCASTS against the corpus scan - the id-keyed vector fetch is a
    map-side broadcast hash join, zero corpus movement; the query
    vectors broadcast likewise. The only rows that ever carry a raw
    vector past the scan are the shortlist's own k*factor per query."""
    short = ivfadc_residual_topk(
        queries, corpus, query_id, query_vec, corpus_id, corpus_vec,
        k * shortlist_factor, nprobe, iters,
    ).select("query_id", "neighbor_id")
    raw = corpus.select(
        _c(corpus_id).alias("neighbor_id"),
        _c(corpus_vec).cast("array<double>").alias("cv"),
    )
    qv = queries.select(
        _c(query_id).alias("query_id"),
        _c(query_vec).cast("array<double>").alias("qv"),
    )
    d2 = F.expr(_SQDIST_LAMBDA.format(a="qv", b="cv"))
    scored = (
        raw.join(F.broadcast(short), "neighbor_id")
        .join(F.broadcast(qv), "query_id")
        .select("query_id", "neighbor_id", d2.alias("d2"))
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("d2"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", norm_round("d2", 6).alias("d2"), "rank")
    )


def ivfadc_rerank_topk_sql(
    table: str,
    id_col: str,
    vec_col: str,
    query_pred: str,
    k: int,
    nprobe: int = 4,
    shortlist_factor: int = 4,
    iters: int = KM_ITERS,
) -> str:
    """DuckDB twin of :func:`ivfadc_rerank_topk`: the full residual
    shortlist query as a subquery, raw vectors re-fetched by id join,
    exact squared-L2 rerank (the same sequential fold both engines run
    in single IEEE ops)."""
    inner = ivfadc_residual_topk_sql(
        table, id_col, vec_col, query_pred, k * shortlist_factor, nprobe, iters
    )
    d2 = _sqdist_cols_sql(f"(q.{vec_col}::DOUBLE[])", f"(c.{vec_col}::DOUBLE[])")
    return f"""
    WITH sl AS ({inner}),
    rr_scored AS (
      SELECT sl.query_id, sl.neighbor_id, {d2} AS d2
      FROM sl
      JOIN {table} c ON sl.neighbor_id = c.{id_col}
      JOIN {table} q ON sl.query_id = q.{id_col}
    ),
    rr_ranked AS (
      SELECT query_id, neighbor_id, d2,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY d2, neighbor_id) AS rank
      FROM rr_scored
    )
    SELECT query_id, neighbor_id, ROUND(d2, 6) + 0 AS d2, rank
    FROM rr_ranked WHERE rank <= {k}
    """


def ivfadc_residual_topk_sql(
    table: str,
    id_col: str,
    vec_col: str,
    query_pred: str,
    k: int,
    nprobe: int = 4,
    iters: int = KM_ITERS,
) -> str:
    """DuckDB twin of :func:`ivfadc_residual_topk`: the trained-centroid
    CTE chain from :func:`kmeans_train_ctes_sql`, cluster/probe via
    (d, cluster)-ordered window ranks over the corpus x centroid cross
    join (exact float comparisons, same tie-break as the Spark struct
    sorts), residual d-columns via ``_pq_dcols_sql(vec="rv")`` - the
    same single definition of encode and LUT distances."""
    d = _sqdist_cols_sql("b.v", "c.cv")
    return f"""
    WITH {kmeans_train_ctes_sql(table, vec_col, iters)},
    cb AS (SELECT {id_col} AS _id, ({vec_col}::DOUBLE[]) AS v FROM {table}),
    ranked_cent AS (
      SELECT b._id, b.v, c.cluster, c.cv,
             ROW_NUMBER() OVER (PARTITION BY b._id ORDER BY {d}, c.cluster)
               AS _crk
      FROM cb b CROSS JOIN kmcent{iters} c
    ),
    cres AS (
      SELECT _id AS neighbor_id,
             cluster,
             list_transform(list_zip(v, cv), x -> x[1] - x[2]) AS rv
      FROM ranked_cent WHERE _crk = 1
    ),
    cd AS (SELECT neighbor_id, cluster, {_pq_dcols_sql(vec="rv")} FROM cres),
    c AS (SELECT neighbor_id, cluster, [{_pq_argmins_sql()}] AS codes FROM cd),
    qres AS (
      SELECT r._id AS query_id,
             r.cluster,
             list_transform(list_zip(r.v, r.cv), x -> x[1] - x[2]) AS rv
      FROM ranked_cent r
      JOIN cb b ON r._id = b._id
      WHERE r._crk <= {nprobe} AND b._id IN (SELECT {id_col} FROM {table}
                                             WHERE {query_pred})
    ),
    qd AS (SELECT query_id, cluster, {_pq_dcols_sql(vec="rv")} FROM qres),
    q AS (SELECT query_id, cluster, [{_pq_luts_sql()}] AS lut FROM qd),
    scored AS (
      SELECT q.query_id, c.neighbor_id, {_pq_adist_sql()} AS adist
      FROM q JOIN c ON q.cluster = c.cluster AND q.query_id <> c.neighbor_id
    ),
    {_pq_ranked_tail_sql(k)}
    """
