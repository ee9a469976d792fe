"""Incremental near-dup: new batch vs a persisted band index."""

from __future__ import annotations

from pyspark.sql import functions as F

from nyc_government_hiring_audit_data_platform_spark.operators import dedup as D


def _corpus(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    return docs.select("doc_id", "text")


def test_incremental_matches_full_rededup(spark, tmp_path):
    """The incremental probe must find exactly the cross (batch,
    corpus) pairs a full re-dedup of corpus+batch finds - same
    threshold, same jaccard values - without re-hashing the corpus."""
    corpus = _corpus(spark)
    # batch: 3 near-copies of corpus docs (light perturbation) + 2
    # genuinely new docs
    dup_src = corpus.orderBy("doc_id").limit(3).collect()
    rows = [
        (10_000 + i, r["text"] + " extra tail token")
        for i, r in enumerate(dup_src)
    ] + [
        (20_000, "completely unrelated fresh document one two three"),
        (20_001, "another brand new never seen text four five six"),
    ]
    batch = spark.createDataFrame(rows, "doc_id long, text string")

    index_dir = str(tmp_path / "band_index")
    D.build_band_index(corpus, "text", "doc_id").write.parquet(index_dir)
    index = spark.read.parquet(index_dir)

    got = {
        (r["new_id"], r["corpus_id"]): r["jaccard"]
        for r in D.incremental_neardup(batch, index, "text", "doc_id", 0.5).collect()
    }

    # ground truth: full re-dedup over corpus+batch, keep cross pairs
    union = corpus.unionByName(batch)
    full = D.minhash_lsh_pairs(union, "text", "doc_id", 0.5)
    want = {}
    for r in full.collect():
        lo, hi = r["id_a"], r["id_b"]
        if lo < 10_000 <= hi:
            want[(hi, lo)] = r["jaccard"]
    assert got == want
    assert len(got) >= 3  # the three perturbed near-copies are found
    assert not any(nid >= 20_000 for nid, _ in got)  # fresh docs are clean


def test_band_index_shape_and_growth(spark):
    corpus = _corpus(spark)
    idx = D.build_band_index(corpus, "text", "doc_id")
    n_docs = corpus.count()
    assert idx.count() == n_docs * D.BANDS
    assert idx.select("id").distinct().count() == n_docs
    # per-doc shingle sets ride along for in-bucket exact verification
    assert dict(idx.dtypes)["hs"] == "array<bigint>"


def test_incremental_exact_copy_scores_one(spark):
    corpus = _corpus(spark)
    index = D.build_band_index(corpus, "text", "doc_id")
    one = corpus.orderBy("doc_id").limit(1).collect()[0]
    batch = spark.createDataFrame(
        [(99_999, one["text"])], "doc_id long, text string"
    )
    got = D.incremental_neardup(batch, index, "text", "doc_id", 0.5).collect()
    exact = [r for r in got if r["corpus_id"] == one["doc_id"]]
    assert len(exact) == 1 and exact[0]["jaccard"] == 1.0


def test_streaming_dedup_ingest_loop(spark, tmp_path):
    """End-to-end ingest-dedup: two micro-batches stream in; the second
    contains an exact copy and a near-copy of batch-1 docs plus one
    fresh doc - only the fresh doc (and batch-1 survivors) land in the
    corpus, and the index grows to cover every accepted doc."""
    from nyc_government_hiring_audit_data_platform_spark.streaming import (
        curation as SC,
    )

    src = tmp_path / "incoming"
    src.mkdir()
    corpus_dir = str(tmp_path / "corpus")
    index_dir = str(tmp_path / "index")
    ckpt = str(tmp_path / "ck")
    schema = "doc_id long, text string"

    b1 = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
            (2, "one two three four five six seven eight nine ten"),
        ],
        schema,
    )
    b1.coalesce(1).write.parquet(str(src / "batch1"))
    for p in (src / "batch1").glob("*.parquet"):
        p.rename(src / "b1.parquet")

    stream = spark.readStream.schema(schema).parquet(str(src))
    SC.run_dedup_ingest(stream, corpus_dir, index_dir, ckpt)
    assert sorted(
        r["doc_id"] for r in SC.read_ingested_corpus(spark, corpus_dir).collect()
    ) == [1, 2]

    b2 = spark.createDataFrame(
        [
            (11, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
            (12, "one two three four five six seven eight nine ten eleven"),
            (13, "completely different fresh content with novel words here"),
        ],
        schema,
    )
    b2.coalesce(1).write.parquet(str(src / "batch2"))
    for p in (src / "batch2").glob("*.parquet"):
        p.rename(src / "b2.parquet")

    stream2 = spark.readStream.schema(schema).parquet(str(src))
    SC.run_dedup_ingest(stream2, corpus_dir, index_dir, ckpt)
    kept = sorted(
        r["doc_id"] for r in SC.read_ingested_corpus(spark, corpus_dir).collect()
    )
    assert kept == [1, 2, 13]  # 11 exact-dup of 1, 12 near-dup of 2
    # index covers every accepted doc
    idx_ids = {
        r["id"]
        for r in spark.read.parquet(f"{index_dir}/b*").select("id").collect()
    }
    assert idx_ids == {1, 2, 13}

    # crash-replay idempotency: re-running batch 1 against the state it
    # already wrote (fresh checkpoint forces redelivery of every file)
    # must converge to the same corpus - per-batch overwrite + own-batch
    # index exclusion, not blind appends
    stream3 = spark.readStream.schema(schema).parquet(str(src))
    SC.run_dedup_ingest(stream3, corpus_dir, index_dir, str(tmp_path / "ck2"))
    again = sorted(
        r["doc_id"] for r in SC.read_ingested_corpus(spark, corpus_dir).collect()
    )
    assert again == [1, 2, 13]


def test_ngram_jaccard_probe_equivalence_and_restriction(spark):
    """The probed exact lane must (a) equal the unprobed join when the
    probe covers every id, and (b) emit exactly the unprobed pairs that
    TOUCH the probe set otherwise - the lossless-panel property the
    minhash_lsh_recall gate's ground truth relies on at scale."""
    base = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [
        (0, base + " one"),
        (1, base + " two"),
        (20_000, base + " three"),
        (20_001, base + " four"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    full = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in D.ngram_jaccard_pairs(docs, "text", "doc_id", 0.25).collect()
    }
    assert len(full) == 6  # all pairs share the long common prefix

    all_probe = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in D.ngram_jaccard_pairs(
            docs, "text", "doc_id", 0.25, probe=F.lit(True)
        ).collect()
    }
    assert all_probe == full

    paneled = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in D.ngram_jaccard_pairs(
            docs, "text", "doc_id", 0.25, probe=F.col("id") < 10_000
        ).collect()
    }
    want = {p: j for p, j in full.items() if p[0] < 10_000}
    assert paneled == want
    assert (20_000, 20_001) not in paneled  # pair not touching the panel


def test_lsh_recall_gate_panel_bounds_both_lanes(spark, tmp_path):
    """Query-level panel semantics: a true near-dup pair living entirely
    ABOVE the panel threshold is excluded from n_exact, n_lsh and hits,
    while an in-panel pair is counted - and the gate still reports zero
    false positives."""
    from nyc_government_hiring_audit_data_platform_spark import driver_queries as DQ

    a = "the quick brown fox jumps over the lazy dog again and again"
    b = "entirely different material about spark shuffles and parquet footers"
    rows = [
        (0, a), (10, a),              # in-panel identical pair
        (20_000, b), (20_010, b),     # above-panel identical pair
    ]
    docs = spark.createDataFrame(
        [(i, t, "en", "src0", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    d = str(tmp_path / "panel_sf")
    docs.write.mode("overwrite").parquet(f"{d}/documents.parquet")
    row = DQ.QUERIES["minhash_lsh_recall"](spark, d).collect()[0]
    spark.catalog.clearCache()
    assert row["n_exact"] == 1      # (0,10) only; (20000,20010) excluded
    assert row["n_hits"] == 1       # identical docs always share buckets
    assert row["n_false_pos"] == 0
    assert row["recall_milli"] == 1000


def _template_corpus(spark, family: int, noise: int):
    """`family` byte-identical template docs + `noise` distinct docs."""
    tmpl = "breaking news template header " * 6
    rows = [(i, tmpl) for i in range(family)] + [
        (100_000 + j, f"unique document number {j} with tokens {j * 7} {j * 13}")
        for j in range(noise)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _lsh_candidate_count(spark, docs) -> int:
    """Candidate pairs the band join generates BEFORE verification -
    the quantity that explodes in a hot bucket."""
    d = docs.select(
        "doc_id", D.hashed_shingles(F.col("text"), 8).alias("hs")
    )
    sigs = d.select(
        F.col("doc_id").alias("id"),
        D.minhash_signature_from_hashes(F.col("hs")).alias("sig"),
    )
    bands = D.band_rows(sigs).select("id", "band", "bh")
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
        .count()
    )


def test_hot_bucket_without_exact_dedup_is_quadratic(spark):
    """The hazard the contract exists for: a byte-identical template
    family fed RAW into LSH puts all f docs in one bucket per band ->
    f*(f-1)/2 distinct candidate pairs (uniform band-hash keys bound
    nothing about occupancy). Kept small (f=120) because the point is
    the growth law, not a stress test."""
    f, noise = 120, 50
    docs = _template_corpus(spark, f, noise)
    cand = _lsh_candidate_count(spark, docs)
    assert cand >= f * (f - 1) // 2, cand  # the template clique is all there


def test_hot_bucket_exact_dedup_first_bounds_candidates(spark):
    """The contract: exact dedup first collapses the family to ONE
    representative, so the same corpus yields a candidate count bounded
    by the DISTINCT-doc near-dup structure (here: zero template pairs
    survive; only genuinely-near docs could pair). The full pipeline's
    survivor set is also unchanged by the ordering (near-dup of
    representatives == near-dup of family)."""
    f, noise = 120, 50
    docs = _template_corpus(spark, f, noise)
    groups = D.exact_dedup_groups(docs, "text", "doc_id")
    survivors = docs.join(
        groups.select(F.col("rep_id").alias("doc_id")), "doc_id"
    )
    assert survivors.count() == 1 + noise
    cand = _lsh_candidate_count(spark, survivors)
    # the bound is pairs among DISTINCT texts only (here <= C(51, 2) =
    # 1275; measured 45 - noise docs sharing template chars can still
    # band-collide, verification rejects them) - never the f^2/2 clique
    # of the template family the raw corpus produced
    assert cand <= (1 + noise) * noise // 2, cand
    f_clique = f * (f - 1) // 2
    assert cand < f_clique // 50, (cand, f_clique)


# --- bucket-occupancy cap (VERDICT r7 ask #5) -------------------------------


def _counter_corpus(spark, family: int, noise: int):
    """NEAR-identical family exact dedup can NOT collapse: one shared
    template plus a per-doc counter (jaccard ~0.9+ pairwise, all texts
    byte-distinct), the adversarial residue the max_bucket cap exists
    for."""
    tmpl = "breaking news template header shared body text " * 4
    rows = [(i, f"{tmpl} item {i}") for i in range(family)] + [
        (100_000 + j, f"unique document number {j} with tokens {j * 7} {j * 13}")
        for j in range(noise)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _capped_candidate_count(spark, docs, max_bucket) -> int:
    """Candidate pairs after the operator's bucket truncation (the
    same min-id row_number the operator applies)."""
    from pyspark.sql import Window

    d = docs.select("doc_id", D.hashed_shingles(F.col("text"), 8).alias("hs"))
    sigs = d.select(
        F.col("doc_id").alias("id"),
        D.minhash_signature_from_hashes(F.col("hs")).alias("sig"),
    )
    bands = D.band_rows(sigs).select("id", "band", "bh")
    w = Window.partitionBy("band", "bh").orderBy("id")
    bands = (
        bands.withColumn("_occ", F.row_number().over(w))
        .filter(F.col("_occ") <= max_bucket)
        .drop("_occ")
    )
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
        .count()
    )


def test_bucket_cap_bounds_near_identical_family(spark):
    """The case the ordering contract cannot cover: a template+counter
    family survives exact dedup byte-distinct, still shares most
    shingles, and floods its buckets - the RAW candidate count grows
    ~f^2 while the capped one is bounded by BANDS * C(max_bucket, 2)
    regardless of f."""
    f, noise, cap = 150, 30, 8
    docs = _counter_corpus(spark, f, noise)
    # exact dedup collapses nothing: every text is distinct
    assert D.exact_dedup_groups(docs, "text", "doc_id").count() == f + noise
    raw = _lsh_candidate_count(spark, docs)
    assert raw >= f * (f - 1) // 4, raw  # the family really floods
    capped = _capped_candidate_count(spark, docs, cap)
    bound = D.BANDS * cap * (cap - 1) // 2 + noise * (noise + 1)
    assert capped <= bound, (capped, bound)
    assert capped < raw // 10, (capped, raw)


def test_bucket_cap_output_subset_and_healthy_buckets_unchanged(spark):
    """Recall semantics as documented: the capped operator output is a
    SUBSET of the uncapped output; on a corpus whose every bucket sits
    under the cap the two are identical."""
    f, noise, cap = 40, 25, 8
    docs = _counter_corpus(spark, f, noise)
    uncapped = {
        (r.id_a, r.id_b)
        for r in D.minhash_lsh_pairs(docs, "text", "doc_id", 0.25).collect()
    }
    capped = {
        (r.id_a, r.id_b)
        for r in D.minhash_lsh_pairs(
            docs, "text", "doc_id", 0.25, max_bucket=cap
        ).collect()
    }
    assert capped <= uncapped
    assert len(capped) < len(uncapped)  # the family exceeded the cap
    # min-id members stay paired: the clique minimum is in every bucket
    assert any(a == 0 for a, _ in capped)
    # healthy corpus (all buckets < cap): identical output (noise kept
    # below the cap too - the noise docs share their own prefix and
    # would otherwise co-bucket past it)
    healthy = _counter_corpus(spark, 5, 6)
    un2 = {
        (r.id_a, r.id_b)
        for r in D.minhash_lsh_pairs(healthy, "text", "doc_id", 0.25).collect()
    }
    cap2 = {
        (r.id_a, r.id_b)
        for r in D.minhash_lsh_pairs(
            healthy, "text", "doc_id", 0.25, max_bucket=cap
        ).collect()
    }
    assert cap2 == un2


def test_bucket_cap_sql_twin_matches(spark, tmp_path):
    """Both-engine fixture check: the capped Spark operator and the
    capped DuckDB twin emit the identical pair set (same deterministic
    min-id truncation on both sides)."""
    import duckdb

    docs = _counter_corpus(spark, 30, 10)
    d = str(tmp_path / "capdocs.parquet")
    docs.write.mode("overwrite").parquet(d)
    got = sorted(
        (r.id_a, r.id_b, r.jaccard)
        for r in D.minhash_lsh_pairs(
            spark.read.parquet(d), "text", "doc_id", 0.25, max_bucket=4
        ).collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW capdocs AS SELECT * FROM read_parquet('{d}/*.parquet')"
    )
    want = sorted(
        (a, b, j)
        for a, b, j in con.execute(
            D.minhash_lsh_pairs_sql("capdocs", "text", "doc_id", 0.25, max_bucket=4)
        ).fetchall()
    )
    assert got == want and len(got) > 0


def test_grid_split_lossless_on_hot_clique(spark):
    """split_buckets (Okcan-Riedewald grid for the in-bucket self-join)
    must be BIT-IDENTICAL to the plain join: every unordered pair of a
    hot bucket matches in exactly one (p, q) cell, the id< condition
    keeps one orientation, cold buckets ride the single (0,0) cell.
    Verified over a near-identical clique (every pair a true near-dup)
    plus unrelated docs, under both join strategies."""
    rows = [
        (i, f"the quick brown fox jumps over the lazy dog variant {i % 3}")
        for i in range(40)
    ] + [(100 + i, f"totally unrelated corpus text number {i} about ships")
         for i in range(6)]
    docs = spark.createDataFrame(rows, ["doc_id", "text"]).repartition(8)
    base = {
        tuple(r) for r in D.minhash_lsh_pairs(docs, "text", "doc_id", 0.5).collect()
    }
    grid = {
        tuple(r)
        for r in D.minhash_lsh_pairs(
            docs, "text", "doc_id", 0.5, split_buckets=8, split_threshold=4
        ).collect()
    }
    assert grid == base and len(base) >= 40 * 39 // 2

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        shuffled = {
            tuple(r)
            for r in D.minhash_lsh_pairs(
                docs, "text", "doc_id", 0.5, split_buckets=8, split_threshold=4
            ).collect()
        }
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert shuffled == base

    # an uncrossed threshold leaves every bucket on the cold path
    cold = {
        tuple(r)
        for r in D.minhash_lsh_pairs(
            docs, "text", "doc_id", 0.5, split_buckets=8, split_threshold=10_000
        ).collect()
    }
    assert cold == base


def test_embedding_grid_split_lossless(spark):
    """The embedding near-dup self-join's grid lane must be
    bit-identical to the plain join over a hot vector clique (many
    near-identical vectors collapse into one LSH bucket)."""
    import random

    from nyc_government_hiring_audit_data_platform_spark.operators import ann as ANN

    rnd = random.Random(7)
    base_vec = [rnd.uniform(-1, 1) for _ in range(16)]
    rows = [
        (i, [x + rnd.uniform(-1e-3, 1e-3) for x in base_vec]) for i in range(50)
    ] + [(100 + i, [rnd.uniform(-1, 1) for _ in range(16)]) for i in range(10)]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"]).repartition(8)
    plain = {
        tuple(r)
        for r in ANN.embedding_neardup_pairs(emb, "vec_id", "embedding", 0.9).collect()
    }
    grid = {
        tuple(r)
        for r in ANN.embedding_neardup_pairs(
            emb, "vec_id", "embedding", 0.9, split_buckets=8, split_threshold=4
        ).collect()
    }
    assert grid == plain and len(plain) >= 50 * 49 // 2


def test_simhash_grid_split_lossless(spark):
    """simhash_collision_pairs' grid lane: a hot identical-signature
    family spreads over the grid with bit-identical output."""
    rows = [(i, "identical doc body shared by the whole family") for i in range(30)]
    rows += [(200 + i, f"distinct text {i} about something else entirely") for i in range(5)]
    docs = spark.createDataFrame(rows, ["doc_id", "text"]).repartition(8)
    plain = {tuple(r) for r in D.simhash_collision_pairs(docs, "text", "doc_id").collect()}
    grid = {
        tuple(r)
        for r in D.simhash_collision_pairs(
            docs, "text", "doc_id", split_buckets=8, split_threshold=4
        ).collect()
    }
    assert grid == plain and len(plain) >= 30 * 29 // 2


def test_grid_split_rejects_reserved_columns(spark):
    """The grid helper must fail loudly (not silently mis-key) when the
    input relation already carries its reserved p/q/_hot/_occ names."""
    import pytest as _pytest

    from nyc_government_hiring_audit_data_platform_spark.operators.relational import (
        grid_split_self_join_sides,
    )

    rel = spark.createDataFrame([(1, 10, 0)], ["id", "bucket", "p"])
    with _pytest.raises(ValueError, match="reserves columns"):
        grid_split_self_join_sides(rel, ["bucket"], "id", 4, 2)
