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
