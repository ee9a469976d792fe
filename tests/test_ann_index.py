"""Incremental ANN indexing (streaming/ann_index.py): the streaming
encoder must be bit-identical to the batch/composed operator, append
exactly-once across a restart, and index search must reproduce the
composed residual-IVFADC search."""

from __future__ import annotations

from pyspark.sql import functions as F

from nyc_government_hiring_audit_data_platform_spark.operators import ann as ANN
from nyc_government_hiring_audit_data_platform_spark.streaming import ann_index as AI


def _emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )


def _model(spark, sf_dir):
    return AI.frozen_quantizer(
        ANN.kmeans_train(_emb(spark, sf_dir).select("embedding"), "embedding")
    )


def test_stream_encode_exactly_once_across_restart(spark, sf_dir, tmp_path):
    emb = _emb(spark, sf_dir)
    model = _model(spark, sf_dir)
    src = str(tmp_path / "arrivals")
    idx = str(tmp_path / "index")
    ckpt = str(tmp_path / "ckpt")
    b1 = emb.filter(F.col("vec_id") % 3 == 0)
    b2 = emb.filter(F.col("vec_id") % 3 == 1)
    b3 = emb.filter(F.col("vec_id") % 3 == 2)
    b1.write.mode("append").parquet(src)
    b2.write.mode("append").parquet(src)
    AI.run_ann_index_stream(spark, src, idx, ckpt, model).awaitTermination()
    # a later arrival + RESTART from the same checkpoint: only the new
    # file is processed (exactly-once), nothing re-encoded
    b3.write.mode("append").parquet(src)
    AI.run_ann_index_stream(spark, src, idx, ckpt, model).awaitTermination()

    got = sorted(
        (r["id"], r["cluster"], tuple(r["codes"]))
        for r in spark.read.parquet(idx).collect()
    )
    want = sorted(
        (r["id"], r["cluster"], tuple(r["codes"]))
        for r in AI.encode_batch(emb, "vec_id", "embedding", model).collect()
    )
    assert got == want  # row-for-row, no dups, no gaps
    spark.catalog.clearCache()


def test_index_search_equals_composed_operator(spark, sf_dir, tmp_path):
    """Searching the persisted codes index with the frozen quantizer
    must reproduce the composed ivfadc_residual_topk EXACTLY: the
    collected-literal model and the relational centroid array are the
    same doubles (repr round-trips), and the literal distance folds
    share the op sequence of the relational HOF folds."""
    emb = _emb(spark, sf_dir)
    model = _model(spark, sf_dir)
    index = AI.encode_batch(emb, "vec_id", "embedding", model)
    queries = emb.filter(F.col("vec_id") < 20)
    via_index = AI.search_codes_index(
        index, queries, "vec_id", "embedding", model, k=5, nprobe=4
    )
    composed = ANN.ivfadc_residual_topk(
        queries, emb, "vec_id", "embedding", "vec_id", "embedding", 5, nprobe=4
    )
    a = sorted(tuple(r) for r in via_index.collect())
    b = sorted(tuple(r) for r in composed.collect())
    assert a == b
    spark.catalog.clearCache()


def test_compaction_equivalence_and_deletes(spark, sf_dir, tmp_path):
    """Compaction must be content-preserving modulo tombstones: after
    three small appended files + a delete list, the compacted index
    holds exactly the fresh-encode rows minus deleted ids, in fewer
    files, and searching it gives the original search minus the
    deleted neighbors."""
    emb = _emb(spark, sf_dir)
    model = _model(spark, sf_dir)
    idx = str(tmp_path / "idx")
    for m in (0, 1, 2):  # three small files, the streaming-sink shape
        AI.encode_batch(
            emb.filter(F.col("vec_id") % 3 == m), "vec_id", "embedding", model
        ).coalesce(1).write.mode("append").parquet(idx)
    import glob as g

    n_in = len(g.glob(f"{idx}/*.parquet"))
    assert n_in >= 3
    deleted = spark.createDataFrame([(7,), (21,), (100,)], "id long")
    out = str(tmp_path / "idx_compact")
    n_out = AI.compact_index(spark, idx, out, deleted_ids=deleted)
    assert n_out < n_in
    got = sorted(
        (r["id"], r["cluster"], tuple(r["codes"]))
        for r in spark.read.parquet(out).collect()
    )
    want = sorted(
        (r["id"], r["cluster"], tuple(r["codes"]))
        for r in AI.encode_batch(emb, "vec_id", "embedding", model)
        .filter(~F.col("id").isin(7, 21, 100))
        .collect()
    )
    assert got == want
    # probing the compacted index == probing the original minus deletes
    queries = emb.filter(F.col("vec_id") < 10)
    a = sorted(
        tuple(r)
        for r in AI.search_codes_index(
            spark.read.parquet(out), queries, "vec_id", "embedding", model,
            k=5, nprobe=4,
        ).collect()
    )
    b = sorted(
        tuple(r)
        for r in AI.search_codes_index(
            spark.read.parquet(idx).filter(~F.col("id").isin(7, 21, 100)),
            queries, "vec_id", "embedding", model, k=5, nprobe=4,
        ).collect()
    )
    assert a == b
    spark.catalog.clearCache()


def test_quantizer_rotation_round_trip(spark, sf_dir, tmp_path):
    """Model rotation: an index encoded under an OLD quantizer (trained
    on a subset) is re-encoded under the retrained one; the rotated
    index must equal a fresh encode under the new model, and searching
    it must reproduce the composed ivfadc_residual_topk (whose internal
    training on the full corpus IS the new model)."""
    emb = _emb(spark, sf_dir)
    old_model = AI.frozen_quantizer(
        ANN.kmeans_train(
            emb.filter(F.col("vec_id") % 2 == 0).select("embedding"), "embedding"
        )
    )
    new_model = _model(spark, sf_dir)  # trained on the full corpus
    assert old_model != new_model
    idx_old = str(tmp_path / "idx_old")
    AI.encode_batch(emb, "vec_id", "embedding", old_model).write.parquet(idx_old)
    idx_new = str(tmp_path / "idx_new")
    AI.rotate_quantizer(emb, "vec_id", "embedding", new_model, idx_new)
    got = sorted(
        (r["id"], r["cluster"], tuple(r["codes"]))
        for r in spark.read.parquet(idx_new).collect()
    )
    want = sorted(
        (r["id"], r["cluster"], tuple(r["codes"]))
        for r in AI.encode_batch(emb, "vec_id", "embedding", new_model).collect()
    )
    assert got == want
    # old-model codes are NOT valid under the new model (rotation is
    # mandatory, not cosmetic): the two indexes genuinely differ
    old_rows = sorted(
        (r["id"], r["cluster"], tuple(r["codes"]))
        for r in spark.read.parquet(idx_old).collect()
    )
    assert old_rows != got
    queries = emb.filter(F.col("vec_id") < 20)
    via_index = sorted(
        tuple(r)
        for r in AI.search_codes_index(
            spark.read.parquet(idx_new), queries, "vec_id", "embedding",
            new_model, k=5, nprobe=4,
        ).collect()
    )
    composed = sorted(
        tuple(r)
        for r in ANN.ivfadc_residual_topk(
            queries, emb, "vec_id", "embedding", "vec_id", "embedding", 5, nprobe=4
        ).collect()
    )
    assert via_index == composed
    spark.catalog.clearCache()


def test_index_rerank_equals_composed_rerank(spark, sf_dir):
    """The production query path - ADC shortlist from the persisted
    codes index + exact rerank over shortlist-fetched raw vectors -
    must reproduce the composed ivfadc_rerank_topk bit-exactly (same
    frozen model, same shortlist, same exact scoring)."""
    emb = _emb(spark, sf_dir)
    model = _model(spark, sf_dir)
    index = AI.encode_batch(emb, "vec_id", "embedding", model)
    queries = emb.filter(F.col("vec_id") < 20)
    via_index = AI.search_codes_index_rerank(
        index, emb, queries, "vec_id", "embedding", model, k=5, nprobe=4
    )
    composed = ANN.ivfadc_rerank_topk(
        queries, emb, "vec_id", "embedding", "vec_id", "embedding", 5, nprobe=4
    )
    a = sorted(tuple(r) for r in via_index.collect())
    b = sorted(tuple(r) for r in composed.collect())
    assert a == b and len(a) > 0
    spark.catalog.clearCache()


def test_mmr_properties(spark, sf_dir):
    """MMR structural properties beyond the driver hash: rank 1 is the
    plain cosine top-1 (empty selected set), every pick comes from the
    relevance pool, picks are distinct, and the diversified set is
    genuinely different from the undiversified top-k (the synthetic
    corpus has redundant near-neighbors to displace)."""
    emb = _emb(spark, sf_dir)
    q = emb.filter(F.col("vec_id") == 0)
    res = ANN.mmr_diverse_topk(
        q, emb, "vec_id", "embedding", "vec_id", "embedding", 10, pool=50
    ).collect()
    ids = [r["neighbor_id"] for r in sorted(res, key=lambda r: r["rank"])]
    assert len(ids) == len(set(ids)) == 10
    top = ANN.cosine_topk(
        q, emb, "vec_id", "embedding", "vec_id", "embedding", 50
    ).collect()
    by_rank = [r["neighbor_id"] for r in sorted(top, key=lambda r: r["rank"])]
    assert ids[0] == by_rank[0]          # first pick = most relevant
    assert set(ids) <= set(by_rank)      # every pick from the pool
    assert ids != by_rank[:10]           # diversification reordered
    spark.catalog.clearCache()


def test_pruned_index_search_identical_and_pushes_filter(spark, sf_dir):
    """prune_scan collects the bounded probe-cluster set and applies it
    as a static IN filter: results identical to the plain cluster join
    (which discards the same rows post-scan), and the filter reaches
    the parquet scan (PushedFilters) - on the compacted
    cluster-clustered layout that is row-group skipping on the probe
    key."""
    from nyc_government_hiring_audit_data_platform_spark.plans import inspect as PI

    emb = _emb(spark, sf_dir)
    model = _model(spark, sf_dir)
    import tempfile, os

    d = tempfile.mkdtemp(prefix="annidx_")
    AI.encode_batch(emb, "vec_id", "embedding", model).write.mode(
        "overwrite"
    ).parquet(os.path.join(d, "idx"))
    index = spark.read.parquet(os.path.join(d, "idx"))
    queries = emb.filter(F.col("vec_id") < 20)
    plain = AI.search_codes_index(
        index, queries, "vec_id", "embedding", model, k=5, nprobe=4
    )
    pruned = AI.search_codes_index(
        index, queries, "vec_id", "embedding", model, k=5, nprobe=4,
        prune_scan=True,
    )
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, pruned.collect())
    )
    PI.assert_filter_pushdown(pruned, "cluster")
    spark.catalog.clearCache()


def test_encode_is_map_only(spark, sf_dir):
    """The index entry projection must add NO exchange: encoding runs
    in the arriving batch's own partitions (the property that makes it
    legal as a stateless streaming projection)."""
    from nyc_government_hiring_audit_data_platform_spark.plans import inspect as PI

    emb = _emb(spark, sf_dir)
    model = _model(spark, sf_dir)
    df = AI.encode_batch(emb, "vec_id", "embedding", model)
    assert PI.shuffle_count(df) == 0
    spark.catalog.clearCache()


def test_mmr_pool_exhaustion_parity(spark, tmp_path):
    """When the pool has fewer than k rows, both engines must truncate
    identically - |pool| ranks, no NULL-id tail (the Spark greedy loop
    breaks; the recursive-CTE twin is guarded with HAVING COUNT(*) > 0
    on the base case and ws IS NOT NULL on the recursive arm). An empty
    pool (corpus == the query row) yields zero rows on both sides."""
    import duckdb

    rows = [(i, [float(i + 1), float(2 * i + 1), 1.0]) for i in range(5)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    d = str(tmp_path / "mmr_small.parquet")
    df.write.parquet(d)
    got = sorted(
        tuple(r)
        for r in ANN.mmr_diverse_topk(
            df.filter(F.col("vec_id") == 0), df,
            "vec_id", "embedding", "vec_id", "embedding", 10, pool=50,
        ).collect()
    )
    assert len(got) == 4  # pool = corpus minus the query row
    con = duckdb.connect()
    con.execute(f"CREATE VIEW emb AS SELECT * FROM read_parquet('{d}/*.parquet')")
    want = sorted(
        tuple(r)
        for r in con.execute(
            ANN.mmr_diverse_topk_sql("emb", "vec_id", "embedding", "vec_id = 0", 10)
        ).fetchall()
    )
    assert got == want
    one = df.filter(F.col("vec_id") == 0)
    empty = ANN.mmr_diverse_topk(
        one, one, "vec_id", "embedding", "vec_id", "embedding", 3
    ).collect()
    assert empty == []
    d1 = str(tmp_path / "mmr_one.parquet")
    one.write.parquet(d1)
    con.execute(f"CREATE VIEW emb1 AS SELECT * FROM read_parquet('{d1}/*.parquet')")
    assert (
        con.execute(
            ANN.mmr_diverse_topk_sql("emb1", "vec_id", "embedding", "vec_id = 0", 3)
        ).fetchall()
        == []
    )


def test_mmr_id_type_generic(spark):
    """Ids keep their source type like every sibling ANN operator:
    string-keyed corpora diversify without a bigint cast crash, and the
    output id column carries the source type through."""
    rows = [(f"d{i}", [float(i + 1), 1.0]) for i in range(6)]
    df = spark.createDataFrame(rows, "vec_id string, embedding array<float>")
    res = ANN.mmr_diverse_topk(
        df.filter(F.col("vec_id") == "d0"), df,
        "vec_id", "embedding", "vec_id", "embedding", 3,
    ).collect()
    assert len(res) == 3
    assert all(isinstance(r["neighbor_id"], str) for r in res)
    assert len({r["neighbor_id"] for r in res}) == 3


def test_index_rerank_explicit_vector_columns(spark, sf_dir):
    """The raw-vector table binds by NAME (vec_id_col/vec_col), not
    position: a wider, column-reordered vectors relation produces the
    identical rerank as the canonical layout."""
    emb = _emb(spark, sf_dir)
    model = _model(spark, sf_dir)
    index = AI.encode_batch(emb, "vec_id", "embedding", model)
    queries = emb.filter(F.col("vec_id") < 10)
    canonical = AI.search_codes_index_rerank(
        index, emb, queries, "vec_id", "embedding", model, k=5, nprobe=4
    )
    shuffled_cols = emb.select(
        F.lit("pad").alias("extra"), "embedding", F.col("vec_id").alias("the_id")
    )
    renamed = AI.search_codes_index_rerank(
        index, shuffled_cols, queries, "vec_id", "embedding", model,
        k=5, nprobe=4, vec_id_col="the_id", vec_col="embedding",
    )
    a = sorted(tuple(r) for r in canonical.collect())
    b = sorted(tuple(r) for r in renamed.collect())
    assert a == b and len(a) > 0
    spark.catalog.clearCache()


def test_mmr_panel_matches_single_query(spark, sf_dir):
    """Each panel member's picks must equal the single-query operator's
    exactly (the greedy is independent across queries; the per-qid
    window argmax applies the same (mmr DESC, id) order), and a member
    whose pool runs dry truncates while the others continue."""
    emb = _emb(spark, sf_dir)
    panel = emb.filter(F.col("vec_id") < 3)
    got = ANN.mmr_panel_topk(
        panel, emb, "vec_id", "embedding", "vec_id", "embedding", 5
    ).collect()
    by_qid = {}
    for r in got:
        by_qid.setdefault(r["query_id"], []).append(
            (r["rank"], r["neighbor_id"], r["mmr"])
        )
    assert set(by_qid) == {0, 1, 2}
    for qid in (0, 1, 2):
        single = ANN.mmr_diverse_topk(
            emb.filter(F.col("vec_id") == qid), emb,
            "vec_id", "embedding", "vec_id", "embedding", 5,
        ).collect()
        want = sorted((r["rank"], r["neighbor_id"], r["mmr"]) for r in single)
        assert sorted(by_qid[qid]) == want
    spark.catalog.clearCache()


def test_mmr_panel_pool_exhaustion_parity(spark, tmp_path):
    """k > |pool|: both engines emit exactly |pool| ranks per member,
    and the cross-engine rows match (the per-member ws IS NOT NULL
    guard in the recursive twin)."""
    import duckdb

    rows = [(i, [float(i + 1), float(3 * i + 2), 1.0]) for i in range(5)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    d = str(tmp_path / "panel_small.parquet")
    df.write.parquet(d)
    got = sorted(
        tuple(r)
        for r in ANN.mmr_panel_topk(
            df.filter(F.col("vec_id") < 2), df,
            "vec_id", "embedding", "vec_id", "embedding", 10,
        ).collect()
    )
    # each member's pool is the other 4 vectors -> 4 ranks apiece
    assert len(got) == 8
    con = duckdb.connect()
    con.execute(f"CREATE VIEW emb AS SELECT * FROM read_parquet('{d}/*.parquet')")
    want = sorted(
        tuple(r)
        for r in con.execute(
            ANN.mmr_panel_topk_sql("emb", "vec_id", "embedding", "vec_id < 2", 10)
        ).fetchall()
    )
    assert got == want


def test_delete_log_lifecycle(spark, sf_dir, tmp_path):
    """delete -> search excludes IMMEDIATELY (anti-join gate, no
    compaction needed) -> compaction consumes the log and physically
    drops the rows -> post-compaction plain search equals the gated
    pre-compaction search -> clearing removes only the CONSUMED
    tombstone files, so a delete logged mid-compaction survives."""
    emb = _emb(spark, sf_dir)
    model = _model(spark, sf_dir)
    idx = str(tmp_path / "idx")
    AI.encode_batch(emb, "vec_id", "embedding", model).write.parquet(idx)
    index = spark.read.parquet(idx)
    queries = emb.filter(F.col("vec_id") < 10)
    base = AI.search_codes_index(
        index, queries, "vec_id", "embedding", model, k=5, nprobe=4
    )
    victims = sorted({r["neighbor_id"] for r in base.collect()})[:3]
    assert len(victims) == 3
    log_dir = str(tmp_path / "dlog")
    AI.log_deletes(
        spark.createDataFrame([(int(i),) for i in victims], "id long"),
        log_dir, "batch-001",
    )
    dele = AI.read_delete_log(spark, log_dir)
    gated = sorted(
        tuple(r)
        for r in AI.search_codes_index(
            index, queries, "vec_id", "embedding", model, k=5, nprobe=4,
            deletes=dele,
        ).collect()
    )
    assert not ({t[1] for t in gated} & set(victims))
    assert len(gated) > 0
    # compaction pass: snapshot -> drop -> publish -> clear consumed
    ids_rel, consumed = AI.consume_delete_log(spark, log_dir)
    assert ids_rel is not None and consumed
    # a delete logged WHILE compaction runs is not in the snapshot
    AI.log_deletes(
        spark.createDataFrame([(999999,)], "id long"), log_dir, "batch-002"
    )
    out = str(tmp_path / "idx2")
    AI.compact_index(spark, idx, out, deleted_ids=ids_rel)
    AI.clear_delete_log(spark, consumed)
    late = AI.read_delete_log(spark, log_dir)
    assert late is not None
    assert [r["id"] for r in late.collect()] == [999999]
    compacted = spark.read.parquet(out)
    assert compacted.filter(F.col("id").isin(victims)).count() == 0
    after = sorted(
        tuple(r)
        for r in AI.search_codes_index(
            compacted, queries, "vec_id", "embedding", model, k=5, nprobe=4
        ).collect()
    )
    assert after == gated
    spark.catalog.clearCache()
