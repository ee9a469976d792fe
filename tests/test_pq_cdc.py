"""Semantic tests for the round-6 additions the parity harness can't
see (parity only proves Spark==DuckDB, not that both compute the
intended thing):

- content_defined_chunks: boundary SHIFT-ROBUSTNESS - the whole reason
  CDC exists over fixed-stride chunking - plus an independent pure-
  Python re-derivation of the boundary rule on a known doc.
- ann_pq_adc_topk / operators.ann.pq_topk: encode correctness (a
  vector assembled from codebook entries must encode to exactly those
  codes and score ADC distance 0 to an identical corpus vector).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from nyc_government_hiring_audit_data_platform_spark import driver_queries as DQ
from nyc_government_hiring_audit_data_platform_spark.driver_queries_curation import (
    _CDC_D,
    _CDC_W,
)
from nyc_government_hiring_audit_data_platform_spark.operators import ann


def _write_docs(spark, tmp_path, texts):
    docs = spark.createDataFrame(
        [(i, t, "en", "src0", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    d = str(tmp_path / "cdc_sf")
    docs.write.mode("overwrite").parquet(f"{d}/documents.parquet")
    return d


def _py_cuts(tokens: list[str]) -> list[int]:
    """Independent pure-Python re-derivation of the CDC boundary rule
    (1-based positions, matching the query's convention)."""
    n = len(tokens)
    cuts = []
    for i in range(1, max(n - _CDC_W + 1, 1) + 1):
        gram = " ".join(tokens[i - 1 : i - 1 + _CDC_W])
        h = int(hashlib.md5(gram.encode()).hexdigest()[:15], 16)
        if i == 1 or h % _CDC_D == 0:
            cuts.append(i)
    return cuts


def test_cdc_matches_pure_python_boundaries(spark, tmp_path):
    tokens = [f"t{i}" for i in range(80)]
    d = _write_docs(spark, tmp_path, [" ".join(tokens)])
    out = DQ.QUERIES["content_defined_chunks"](spark, d).collect()
    assert len(out) == 1
    assert out[0]["n_chunks"] == len(_py_cuts(tokens))


def test_cdc_boundaries_survive_an_insertion(spark, tmp_path):
    """The CDC contract: inserting a token at the FRONT of a document
    shifts every fixed-stride chunk (chunk_dedup finds zero shared
    chunks on distinct-token docs) but leaves all content-defined
    chunks outside the edited window intact, so the two versions still
    dedup against each other."""
    tokens = [f"w{i}" for i in range(200)]
    doc_a = " ".join(tokens)
    doc_b = " ".join(["INSERTED"] + tokens)
    d = _write_docs(spark, tmp_path, [doc_a, doc_b])

    cdc = {
        r["doc_id"]: r.asDict()
        for r in DQ.QUERIES["content_defined_chunks"](spark, d).collect()
    }
    # every chunk except the (edited) first one is shared between A and B
    for did in (0, 1):
        assert cdc[did]["n_chunks"] >= 5  # enough chunks for the claim to bite
        assert cdc[did]["n_dup_chunks"] >= cdc[did]["n_chunks"] - 1

    fixed = {
        r["doc_id"]: r.asDict()
        for r in DQ.QUERIES["chunk_dedup"](spark, d).collect()
    }
    # the fixed-stride baseline finds NOTHING on the same pair
    assert fixed[0]["n_dup_chunks"] == 0 and fixed[1]["n_dup_chunks"] == 0


def test_cdc_empty_and_short_docs(spark, tmp_path):
    d = _write_docs(spark, tmp_path, ["", "a b"])
    rows = {
        r["doc_id"]: r.asDict()
        for r in DQ.QUERIES["content_defined_chunks"](spark, d).collect()
    }
    assert 0 not in rows  # empty doc emits no chunks (chunk_dedup convention)
    assert rows[1]["n_chunks"] == 1  # shorter than the window -> one chunk


def test_containment_detects_subsumption_jaccard_misses(spark, tmp_path):
    """A short doc fully quoted inside a much longer one: containment
    A-in-B ~1 (detected, directional), while B-in-A is far below
    threshold (absent) - the case symmetric Jaccard scores low."""
    quote = [f"q{i}" for i in range(20)]
    host = [f"h{i}" for i in range(200)] + quote  # quote embedded at the end
    other = [f"z{i}" for i in range(50)]
    d = _write_docs(
        spark, tmp_path, [" ".join(quote), " ".join(host), " ".join(other)]
    )
    rows = DQ.QUERIES["containment_neardup"](spark, d).collect()
    pairs = {(r["id_a"], r["id_b"]): r for r in rows}
    assert (0, 1) in pairs and pairs[(0, 1)]["containment"] == 1.0
    assert (1, 0) not in pairs  # directional: host is NOT inside the quote
    assert all(2 not in p for p in pairs)  # unrelated doc never matches


def test_pq_encode_and_adc_zero_on_codebook_vector(spark):
    """A vector assembled from one entry per subspace must encode to
    exactly those code indices, and an identical corpus vector must
    score ADC distance 0.0 and rank first."""
    picks = [(3 * m + 1) % ann.PQ_K for m in range(ann.PQ_M)]
    vec = [x for m, k in enumerate(picks) for x in ann.PQ_CODEBOOKS[m][k]]
    other = [x for m, _ in enumerate(picks) for x in ann.PQ_CODEBOOKS[m][(picks[m] + 8) % ann.PQ_K]]
    df = spark.createDataFrame(
        [(0, vec), (1, other), (100, vec)], "vec_id long, embedding array<double>"
    )
    out = ann.pq_topk(
        df.filter(F.col("vec_id") == 100), df.filter(F.col("vec_id") < 100),
        "vec_id", "embedding", "vec_id", "embedding", 2,
    ).collect()
    by_rank = {r["rank"]: r for r in out if r["query_id"] == 100}
    assert by_rank[1]["neighbor_id"] == 0 and by_rank[1]["adist"] == 0.0
    assert by_rank[2]["neighbor_id"] == 1 and by_rank[2]["adist"] > 0.0


def test_ivfadc_equals_pq_when_probing_every_cluster(spark, sf_smoke):
    """With nprobe = NUM_CENTROIDS the coarse quantizer filters nothing,
    so IVFADC must return exactly pq_topk's rows - the composition
    property that proves the cluster join only RESTRICTS candidates and
    never alters ADC scoring. At nprobe=4 every returned pair must also
    appear in the candidate's probed clusters by construction."""
    emb = spark.read.parquet(f"{sf_smoke}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 10)
    full = {
        (r["query_id"], r["rank"]): (r["neighbor_id"], r["adist"])
        for r in ann.ivfadc_topk(
            q, emb, "vec_id", "embedding", "vec_id", "embedding", 5,
            nprobe=ann.NUM_CENTROIDS,
        ).collect()
    }
    pq = {
        (r["query_id"], r["rank"]): (r["neighbor_id"], r["adist"])
        for r in ann.pq_topk(
            q, emb, "vec_id", "embedding", "vec_id", "embedding", 5
        ).collect()
    }
    assert full == pq and len(full) == 50

    probed = ann.ivfadc_topk(
        q, emb, "vec_id", "embedding", "vec_id", "embedding", 5, nprobe=4
    ).collect()
    assert 0 < len(probed) <= 50
    # IVFADC results are a subset-ranking of the PQ candidate space:
    # every (query, neighbor, adist) it emits scores identically in PQ's
    # full ranking (same codes, same LUT - no score drift from the join)
    pq_scores = {
        (r["query_id"], r["neighbor_id"]): r["adist"]
        for r in ann.pq_topk(
            q, emb, "vec_id", "embedding", "vec_id", "embedding", 10**6
        ).collect()
    }
    for r in probed:
        assert pq_scores[(r["query_id"], r["neighbor_id"])] == r["adist"]


def test_kmeans_train_reduces_residual_energy(spark, sf_dir):
    """The point of TRAINING the coarse quantizer: mean within-cluster
    residual energy (squared L2 to the assigned centroid) must drop
    strictly below the pinned-random-centroid assignment's - otherwise
    residual encoding is the measured-recall-~0.05 scale-mismatch
    failure the raw-vector variant existed to avoid."""
    from nyc_government_hiring_audit_data_platform_spark.driver_queries import table
    from nyc_government_hiring_audit_data_platform_spark.operators import ann as ANN

    emb = table(spark, sf_dir, "embeddings").select(
        F.col("embedding").cast("array<double>").alias("v")
    )

    def mean_energy(cents):
        arr = ANN._cent_arr(cents)
        d = (
            emb.crossJoin(F.broadcast(arr))
            .select(ANN._arr_dists("v", "arr").alias("ds"))
            .select(F.array_min("ds").alias("d2"))
        )
        return d.agg(F.avg("d2")).collect()[0][0]

    pinned = spark.createDataFrame(
        [(i, ANN.CENTROIDS[i]) for i in range(ANN.NUM_CENTROIDS)],
        "cluster int, cv array<double>",
    )
    trained = ANN.kmeans_train(emb, "v", ANN.KM_ITERS)
    e_pinned, e_trained = mean_energy(pinned), mean_energy(trained)
    # pinned centroids are sigma-1.0 vs the sigma-~0.125 corpus: nearly
    # all their energy is the centroid itself; training must collapse it
    assert e_trained < 0.5 * e_pinned, (e_pinned, e_trained)


def test_ivfadc_residual_matches_exact_when_unquantized_neighbors_exist(
    spark, sf_dir
):
    """Structural sanity: every (query, rank) row is unique, ranks are
    1..k dense per query, and a query never returns itself."""
    from nyc_government_hiring_audit_data_platform_spark.driver_queries import QUERIES

    rows = QUERIES["ann_ivfadc_residual_topk"](spark, sf_dir).collect()
    seen = {}
    for r in rows:
        assert r["query_id"] != r["neighbor_id"]
        seen.setdefault(r["query_id"], []).append(r["rank"])
    for q, ranks in seen.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1)), q
