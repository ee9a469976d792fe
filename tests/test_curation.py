"""Semantic tests for the curation suite (driver_queries_curation) -
invariants the parity harness can't see (it only proves Spark==DuckDB,
not that both compute the intended thing)."""

from __future__ import annotations

from pyspark.sql import functions as F

from nyc_government_hiring_audit_data_platform_spark import driver_queries as DQ
from nyc_government_hiring_audit_data_platform_spark.driver_queries_curation import (
    _BP_N,
    _CHUNK,
    _word_grams,
)


def _grams_of(spark, text: str) -> list[str]:
    df = spark.createDataFrame([(text,)], "text string")
    toks = F.filter(F.split("text", " "), lambda t: t != "")
    return df.select(_word_grams(toks, _BP_N).alias("g")).collect()[0]["g"]


def test_word_grams_shorter_than_n_is_empty(spark):
    assert _grams_of(spark, "a b c") == []


def test_word_grams_exact_n_single_gram(spark):
    assert _grams_of(spark, "a b c d") == ["a b c d"]


def test_word_grams_count_and_overlap(spark):
    g = _grams_of(spark, "a b c d e f")
    assert g == ["a b c d", "b c d e", "c d e f"]


def test_word_grams_collapses_double_spaces(spark):
    # tokenizer drops empty tokens, so runs of spaces can't shift grams
    assert _grams_of(spark, "a  b c  d") == ["a b c d"]


def test_boilerplate_fully_duplicated_doc_dropped(spark, sf_dir):
    """A doc whose every gram is boilerplate must be flagged keep=0 (the
    sf0.01 corpus contains at least one boiler_ratio=1.0 doc)."""
    out = DQ.QUERIES["boilerplate_ngram_flags"](spark, sf_dir)
    full = out.filter(F.col("boiler_ratio") == 1.0)
    assert full.count() >= 1
    assert full.filter(F.col("keep") == 1).count() == 0


def test_boilerplate_clean_docs_kept(spark, sf_dir):
    out = DQ.QUERIES["boilerplate_ngram_flags"](spark, sf_dir)
    assert out.filter((F.col("n_boiler") == 0) & (F.col("keep") == 0)).count() == 0


def test_chunk_dedup_chunk_count_matches_token_count(spark, sf_dir):
    """n_chunks must equal ceil(n_tokens / CHUNK) for every doc."""
    docs = DQ.table(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(F.filter(F.split("text", " "), lambda t: t != "")).alias("nt"),
    )
    out = DQ.QUERIES["chunk_dedup"](spark, sf_dir)
    joined = out.join(docs, "doc_id")
    bad = joined.filter(
        F.col("n_chunks") != F.ceil(F.col("nt") / F.lit(_CHUNK))
    ).count()
    assert bad == 0


def test_chunk_dedup_ratio_bounds(spark, sf_dir):
    out = DQ.QUERIES["chunk_dedup"](spark, sf_dir)
    assert out.filter((F.col("dup_ratio") < 0) | (F.col("dup_ratio") > 1)).count() == 0
    # the sf0.01 corpus has real duplicated chunks - the op must find some
    assert out.filter(F.col("n_dup_chunks") > 0).count() > 0


def test_keep_list_one_keeper_per_cluster(spark, sf_dir):
    out = DQ.QUERIES["neardup_keep_list"](spark, sf_dir).cache()
    per = out.groupBy("cluster").agg(
        F.sum("keep").alias("keepers"), F.min("vec_id").alias("lo")
    )
    assert per.filter(F.col("keepers") != 1).count() == 0
    # the keeper is the min id of its cluster: cluster label == min member
    assert per.filter(F.col("cluster") != F.col("lo")).count() == 0
    # every vector gets a verdict
    n_vec = DQ.table(spark, sf_dir, "embeddings").count()
    assert out.count() == n_vec
    out.unpersist()


def test_pagerank_rank_floor_and_edge_conservation(spark, sf_dir):
    out = DQ.QUERIES["pagerank_iteration"](spark, sf_dir).cache()
    # damping floor: every rank >= 0.15 (a node with in-edges gets more)
    assert out.filter(F.col("rank") < 0.15).count() == 0
    # sum of in-degrees == number of distinct edges
    n_edges = (
        DQ.table(spark, sf_dir, "lineitem")
        .select("l_suppkey", "l_partkey")
        .distinct()
        .count()
    )
    assert out.agg(F.sum("in_deg")).collect()[0][0] == n_edges
    out.unpersist()


def test_skew_profile_shape(spark, sf_dir):
    rows = DQ.QUERIES["key_skew_profile"](spark, sf_dir).collect()
    assert len(rows) == 20
    counts = [r["n_rows"] for r in rows]
    assert counts == sorted(counts, reverse=True)
    assert all(0 < r["share_pct"] <= 100.0 for r in rows)
    # top keys are at least as heavy as the mean key
    assert all(r["skew_x"] >= 1.0 for r in rows)


def test_surprisal_band_trims_both_tails(spark, sf_dir):
    """The [P05, P95] band must drop roughly 10% of docs - and the
    dropped set must be exactly the docs outside the kept score range."""
    out = DQ.QUERIES["unigram_surprisal_quality"](spark, sf_dir).cache()
    n = out.count()
    dropped = out.filter(F.col("keep") == 0)
    frac = dropped.count() / n
    assert 0.02 <= frac <= 0.2, frac
    kept = out.filter(F.col("keep") == 1).agg(
        F.min("avg_surprisal").alias("lo"), F.max("avg_surprisal").alias("hi")
    ).collect()[0]
    # every dropped doc scores outside the kept band (ties at the rounded
    # 4th decimal can only sit ON the edge, never inside)
    inside = dropped.filter(
        (F.col("avg_surprisal") > kept["lo"]) & (F.col("avg_surprisal") < kept["hi"])
    ).count()
    assert inside == 0
    out.unpersist()


def test_hard_negatives_cross_label_and_complete(spark, sf_dir):
    """Every mined negative must carry a different label than its
    anchor, and every anchor gets exactly k ranked negatives."""
    from nyc_government_hiring_audit_data_platform_spark.driver_queries_curation import (
        _HN_K,
        _HN_PANEL,
    )

    out = DQ.QUERIES["hard_negative_mining"](spark, sf_dir).cache()
    emb = DQ.table(spark, sf_dir, "embeddings").select("vec_id", "label")
    lab = dict((r["vec_id"], r["label"]) for r in emb.collect())
    rows = out.collect()
    assert all(lab[r["anchor_id"]] != lab[r["neg_id"]] for r in rows)
    n_anchors = emb.filter(F.expr(_HN_PANEL)).count()
    per = out.groupBy("anchor_id").agg(
        F.count(F.lit(1)).alias("n"), F.max("rank").alias("mr")
    )
    assert per.count() == n_anchors
    assert per.filter((F.col("n") != _HN_K) | (F.col("mr") != _HN_K)).count() == 0
    out.unpersist()


def test_vocab_coverage_invariants(spark, sf_dir):
    rows = sorted(
        DQ.QUERIES["vocab_coverage"](spark, sf_dir).collect(),
        key=lambda r: r["vocab_rank"],
    )
    # exactly one rank crosses the 95% line; cumulative share is
    # monotone and ends at 100%
    assert sum(r["covers_95"] for r in rows) == 1
    pcts = [r["cum_pct"] for r in rows]
    assert pcts == sorted(pcts)
    assert abs(pcts[-1] - 100.0) < 1e-9
    counts = [r["c"] for r in rows]
    assert counts == sorted(counts, reverse=True)


def test_pmi_topk_sorted_and_floored(spark, sf_dir):
    from nyc_government_hiring_audit_data_platform_spark.driver_queries_curation import (
        _PMI_TOPK,
    )

    rows = DQ.QUERIES["pmi_cooccurrence"](spark, sf_dir).collect()
    assert len(rows) == _PMI_TOPK
    assert all(r["c12"] >= 5 for r in rows)
    pmis = [r["pmi"] for r in rows]
    assert pmis == sorted(pmis, reverse=True)


def test_triangle_count_closed_form_on_complete_subgraph(spark, sf_dir):
    """The mod-97 projection is dense; verify the count against an
    independent per-wedge closure check and the edge count bound."""
    row = DQ.QUERIES["triangle_count"](spark, sf_dir).collect()[0]
    assert 0 < row["n_edges"] <= 97 * 96 // 2
    assert row["n_triangles"] > 0
    # complete graph closed form when every edge exists
    if row["n_edges"] == 97 * 96 // 2:
        assert row["n_triangles"] == 97 * 96 * 95 // 6


def test_record_linkage_blocked_and_thresholded(spark, sf_dir):
    from nyc_government_hiring_audit_data_platform_spark.driver_queries_curation import (
        _RL_THRESHOLD,
    )

    out = DQ.QUERIES["record_linkage_scores"](spark, sf_dir).cache()
    rows = out.collect()
    assert len(rows) > 0
    assert all(r["link_score"] >= _RL_THRESHOLD for r in rows)
    assert all(r["id_a"] < r["id_b"] for r in rows)
    # every emitted pair respects the blocking key (nation, bal bucket)
    c = DQ.table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_nationkey",
        F.floor(F.col("c_acctbal") / 500).alias("bb"),
    )
    joined = (
        out.join(
            c.withColumnRenamed("c_custkey", "id_a")
            .withColumnRenamed("c_nationkey", "na")
            .withColumnRenamed("bb", "ba"),
            "id_a",
        )
        .join(
            c.withColumnRenamed("c_custkey", "id_b")
            .withColumnRenamed("c_nationkey", "nb")
            .withColumnRenamed("bb", "bbk"),
            "id_b",
        )
    )
    assert joined.filter(
        (F.col("na") != F.col("nb")) | (F.col("ba") != F.col("bbk"))
    ).count() == 0
    out.unpersist()


def test_keep_decisions_consistent_with_component_filters(spark, sf_dir):
    """The composite stack must agree rule-for-rule with the standalone
    queries it composes: a doc flagged boilerplate here is exactly a
    doc the boilerplate query drops, same for surprisal."""
    stack = DQ.QUERIES["curation_keep_decisions"](spark, sf_dir).cache()
    bp = DQ.QUERIES["boilerplate_ngram_flags"](spark, sf_dir).select(
        "doc_id", (1 - F.col("keep")).alias("bp_drop")
    )
    sp = DQ.QUERIES["unigram_surprisal_quality"](spark, sf_dir).select(
        "doc_id", (1 - F.col("keep")).alias("sp_drop")
    )
    j = stack.join(bp, "doc_id").join(sp, "doc_id")
    assert j.filter(F.col("flag_boilerplate") != F.col("bp_drop")).count() == 0
    assert j.filter(F.col("flag_surprisal") != F.col("sp_drop")).count() == 0
    # keep is the conjunction of all three rules
    bad = stack.filter(
        (F.col("keep") == 1)
        & (
            F.col("flag_boilerplate")
            + F.col("flag_surprisal")
            + F.col("flag_length")
            > 0
        )
    ).count()
    assert bad == 0
    stack.unpersist()


def test_epoch_shuffle_is_permutation_and_decorrelated(spark, sf_dir):
    from nyc_government_hiring_audit_data_platform_spark.driver_queries_curation import (
        _EPOCHS,
    )

    out = DQ.QUERIES["epoch_shuffle"](spark, sf_dir).cache()
    n = DQ.table(spark, sf_dir, "documents").count()
    for e in range(_EPOCHS):
        pos = sorted(
            r["position"] for r in out.filter(F.col("epoch") == e).collect()
        )
        assert pos == list(range(n))  # exact permutation per epoch
    # epochs produce different orders (decorrelation)
    p0 = {r["doc_id"]: r["position"] for r in out.filter("epoch = 0").collect()}
    p1 = {r["doc_id"]: r["position"] for r in out.filter("epoch = 1").collect()}
    moved = sum(1 for d in p0 if p0[d] != p1[d])
    assert moved > n * 0.9
    # retry-stability: a second evaluation gives identical positions
    again = {
        (r["doc_id"], r["epoch"]): r["position"]
        for r in DQ.QUERIES["epoch_shuffle"](spark, sf_dir).collect()
    }
    for r in out.collect():
        assert again[(r["doc_id"], r["epoch"])] == r["position"]
    out.unpersist()


def test_epoch_shuffle_position_is_global_key_rank(spark, sf_dir):
    """The shard+offset decomposition must equal ONE global ORDER BY of
    the md5 key (shard is the first key nibble, a true prefix)."""
    from pyspark.sql import Window

    out = DQ.QUERIES["epoch_shuffle"](spark, sf_dir)
    docs = DQ.table(spark, sf_dir, "documents").select("doc_id")
    e0 = out.filter(F.col("epoch") == 0)
    keyed = docs.select(
        "doc_id",
        F.md5(F.concat_ws(":", F.lit("0"), F.col("doc_id").cast("string"))).alias(
            "k"
        ),
    )
    ref = keyed.select(
        "doc_id",
        (F.row_number().over(Window.orderBy("k")) - 1).alias("ref_pos"),
    )
    assert e0.join(ref, "doc_id").filter(
        F.col("position") != F.col("ref_pos")
    ).count() == 0


def test_dedup_funnel_monotone(spark, sf_dir):
    """Stage survivor counts can only shrink down the funnel (each
    stage's criterion is at least as strict in doc-count terms), and
    raw is 100%."""
    rows = sorted(
        DQ.QUERIES["dedup_funnel"](spark, sf_dir).collect(),
        key=lambda r: r["stage"],
    )
    assert [r["name"] for r in rows] == [
        "raw", "exact_text", "normalized_text", "chunk_clean",
    ]
    assert rows[0]["pct_of_raw"] == 100.0
    counts = [r["n_docs"] for r in rows]
    assert counts[1] <= counts[0] and counts[2] <= counts[1]
    assert counts[3] <= counts[0]


def test_corpus_mix_plan_accounts_null_source_totally(spark, tmp_path):
    """Total accounting contract (ADVICE r6): a NULL-source document
    group must keep real post-ingest funnel counts, on BOTH engines.
    Pre-fix, stage-1 kept raw NULL sources and every downstream
    source-keyed equi-join silently zeroed the group (NULL never
    equals NULL), dropping its quota tokens from the weight
    normalization - and both engines agreed, so oracle parity could
    never catch it. Source is now coalesced to '' ONCE in stage 1."""
    import duckdb

    rows = [
        (0, "unique text zero alpha beta", "en", "src0", 27),
        (1, "unique text one gamma delta", "en", "src0", 27),
        (2, "orphan text two epsilon zeta", "en", None, 28),
        (3, "orphan text three eta theta", "en", None, 27),
        (3000, "orphan text two epsilon zeta", "en", None, 28),  # exact dup
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    d = str(tmp_path / "nullsrc_sf")
    docs.write.mode("overwrite").parquet(f"{d}/documents.parquet")

    got = {
        r["source"]: r.asDict()
        for r in DQ.QUERIES["corpus_mix_plan"](spark, d).collect()
    }
    spark.catalog.clearCache()
    assert set(got) == {"src0", ""}
    null_grp = got[""]
    assert null_grp["n_ingested"] == 3
    assert null_grp["n_after_dedup"] == 2  # the exact dup collapses
    # weight accounting is total: micro-weights of ALL emitted rows sum
    # to ~1e6 only if no group's tokens silently left the denominator
    tot_w = sum(r["weight_micro"] for r in got.values())
    if any(r["tokens_final"] > 0 for r in got.values()):
        assert 1_000_000 - len(got) <= tot_w <= 1_000_000

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{d}/documents.parquet/*.parquet')"
    )
    oracle = {
        r[0]: r
        for r in con.execute(DQ.ORACLE["corpus_mix_plan"]).fetchall()
    }
    assert set(oracle) == {"src0", ""}
    assert oracle[""][1] == 3 and oracle[""][2] == 2
