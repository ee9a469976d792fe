"""Unit + plan gates for the published curation rule filters
(driver_queries_quality: Gopher word-stats rules, C4 format rules).

Cross-engine exactness is covered by tests/test_oracle_parity.py (the
module registers both queries with full DuckDB oracles); here we pin
the rule SEMANTICS on hand-built documents and gate the plan shape
(map-only: these filters must never shuffle).
"""

from __future__ import annotations

import pytest

from nyc_government_hiring_audit_data_platform_spark import driver_queries as DQ
from nyc_government_hiring_audit_data_platform_spark.plans.inspect import (
    physical_plan,
)


def _run_on_docs(spark, tmp_path, name, texts):
    docs = spark.createDataFrame(
        [(i, t, "en", "src0", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    d = str(tmp_path / f"{name}_sf")
    docs.write.mode("overwrite").parquet(f"{d}/documents.parquet")
    out = DQ.QUERIES[name](spark, d)
    return {r["doc_id"]: r.asDict() for r in out.collect()}, out


def test_gopher_rules_semantics(spark, tmp_path):
    texts = [
        # 0: 60 normal words -> passes every rule
        " ".join(["word"] * 60),
        # 1: too short (10 words)
        " ".join(["word"] * 10),
        # 2: mean word length too high (60 x 12-char words)
        " ".join(["w" * 12] * 60),
        # 3: mostly numeric tokens -> alpha fraction below 80%
        " ".join(["123"] * 40 + ["word"] * 20),
        # 4: symbol-heavy ('#' markdown soup above 10%)
        " ".join(["word"] * 50 + ["#"] * 10),
        # 5: ONE token of 12 '#'s - the published rule counts symbol
        # OCCURRENCES over words (12/51 > 0.1 -> drop); the per-word
        # containment flag would count it once (1/51 -> keep)
        " ".join(["word"] * 50 + ["#" * 12]),
        # 6: '......' = two non-overlapping '...' occurrences (2/51 -> keep)
        " ".join(["word"] * 50 + ["......"]),
    ]
    rows, out = _run_on_docs(spark, tmp_path, "gopher_quality_flags", texts)
    assert rows[0]["keep"] == 1 and rows[0]["n_words"] == 60
    assert rows[1]["flag_words"] == 0 and rows[1]["keep"] == 0
    assert rows[2]["flag_mwl"] == 0 and rows[2]["mwl_milli"] == 12000
    assert rows[3]["flag_alpha"] == 0 and rows[3]["alpha_milli"] == 333
    assert rows[4]["flag_sym"] == 0 and rows[4]["sym_milli"] == 166
    assert rows[5]["flag_sym"] == 0 and rows[5]["sym_milli"] == 235
    assert rows[6]["flag_sym"] == 1 and rows[6]["sym_milli"] == 39
    # map-only contract: no exchange anywhere in the plan
    assert "Exchange" not in physical_plan(out)


def test_c4_rules_semantics(spark, tmp_path):
    good = ("this line has plenty of words in it. " * 3).strip()
    texts = [
        good,  # 0: 3 sentences, terminal '.', >=5 words/line -> keep
        good[:-1],  # 1: no terminal punctuation
        "one sentence only with enough words here.",  # 2: < 3 sentences
        good + " {",  # 3: brace -> drop (and kills terminal punct too)
        good.replace("plenty", "lorem ipsum"),  # 4: placeholder text
        "short line.\n" + good,  # 5: a 2-word line -> min_line_words < 5
    ]
    rows, out = _run_on_docs(spark, tmp_path, "c4_quality_rules", texts)
    assert rows[0] == {
        "doc_id": 0,
        "has_terminal": 1,
        "n_sentences": 3,
        "has_brace": 0,
        "has_lorem": 0,
        "min_line_words": 24,
        "keep": 1,
    }
    assert rows[1]["has_terminal"] == 0 and rows[1]["keep"] == 0
    assert rows[2]["n_sentences"] == 1 and rows[2]["keep"] == 0
    assert rows[3]["has_brace"] == 1 and rows[3]["keep"] == 0
    assert rows[4]["has_lorem"] == 1 and rows[4]["keep"] == 0
    assert rows[5]["min_line_words"] == 2 and rows[5]["keep"] == 0
    assert "Exchange" not in physical_plan(out)


@pytest.mark.parametrize("name", ["gopher_quality_flags", "c4_quality_rules"])
def test_rule_filters_all_integer_schema(spark, sf_smoke, name):
    """Driver-hasher safety: every output column is integral (the
    module's determinism convention - no float crosses the hasher)."""
    out = DQ.QUERIES[name](spark, sf_smoke)
    for f in out.schema.fields:
        assert f.dataType.simpleString() in ("int", "bigint"), (
            f"{name}.{f.name}: {f.dataType.simpleString()}"
        )


def test_dsir_selects_target_language(spark, sf_dir):
    """DSIR's whole claim: documents distributed like the target slice
    (lang='en') get higher importance weights. Check the keep rate of
    en documents strictly exceeds every other language's at sf0.01,
    and the score column is exact integer micro-nats."""
    from pyspark.sql import functions as F

    out = DQ.QUERIES["dsir_importance_weights"](spark, sf_dir)
    assert dict(out.dtypes)["avg_lr_micro"] == "bigint"
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "lang")
    rates = {
        r["lang"]: r["rate"]
        for r in out.join(docs, "doc_id")
        .groupBy("lang")
        .agg(F.avg("keep").alias("rate"))
        .collect()
    }
    assert all(rates["en"] > v for k, v in rates.items() if k != "en"), rates


def test_ccnet_buckets_tertile_shape(spark, sf_dir):
    """Each language splits ~1/3-1/3-1/3 across head/middle/tail
    (discrete tertile edges make it approximate), and every bucket is
    one of the three labels."""
    from pyspark.sql import functions as F

    out = DQ.QUERIES["ccnet_perplexity_buckets"](spark, sf_dir)
    rows = (
        out.groupBy("lang")
        .pivot("bucket", ["head", "middle", "tail"])
        .agg(F.count(F.lit(1)))
        .collect()
    )
    assert rows, "no languages"
    for r in rows:
        total = (r["head"] or 0) + (r["middle"] or 0) + (r["tail"] or 0)
        assert total > 0
        for b in ("head", "middle", "tail"):
            share = (r[b] or 0) / total
            assert 0.15 <= share <= 0.55, (r["lang"], b, share)


def test_rule_filters_cross_engine_on_adversarial_docs(spark, tmp_path):
    """Cross-engine parity on inputs nastier than the testdata: empty
    text, runs of spaces, tabs, newlines, unicode case folding,
    punctuation-only, and a pathological long token. The udtf lesson
    (engines tokenizing differently on dirty whitespace) applied to
    every rule-set query."""
    import duckdb

    from test_oracle_parity import _rowset

    texts = [
        "",
        "   ",
        "word",
        "a  b \n\n c.",
        "héllo wörld! ça va? bien. HELLO World.",
        "x" * 5000,
        "123 456 789 #tag ... more words here now.",
        "a\tb stays one-token.",
        'ends with a quote"',
        "{code} blocks and lorem ipsum placeholders.",
        "one. two! three? four.",
        None,  # NULL text: Spark legacy size(NULL)=-1 vs DuckDB NULL
        # long docs with shared + internal 16-token spans so the span/
        # chunk/winnowing dedup queries produce non-vacuous output
        " ".join(f"tok{i}" for i in range(40)),
        "prefix " + " ".join(f"tok{i}" for i in range(40)) + " suffix",
        " ".join(f"rep{i % 8}" for i in range(48)),  # internal repeats
        # 5k-token doc: the O(len^2) HOF-lambda canary - pre-hoist this
        # single doc cost minutes through the span/shingle queries
        " ".join(f"w{i % 211}" for i in range(5000)),
    ]
    docs = spark.createDataFrame(
        [
            # TWO content sources (split so each gets long docs with
            # shared spans): a single-source fixture made the KMV
            # queries vacuously green - similarity has no pairs,
            # novelty one constant row - so no cross-engine sketch
            # divergence could ever surface here
            (
                i,
                t,
                "en" if i % 2 else "fr",
                "srcX" if i % 2 == 0 else "srcY",
                len(t) if t else 0,
            )
            for i, t in enumerate(texts)
        ]
        + [
            # a THIRD all-junk source (NULL + whitespace-only text):
            # with only two sources the lower-of-two median made the
            # reputation gate's drop branches unreachable (the KMV
            # vacuity class again); srcJunk has n_tok = 0, so the
            # n_tok >= 1 drop fires, a 3-source median makes the
            # below-median drop observable, and the novelty query's
            # unsketchable-source row (n_eff = 0 -> 1000) is exercised
            (100, None, "en", "srcJunk", 0),
            (101, "   ", "fr", "srcJunk", 3),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    d = str(tmp_path / "adv")
    docs.coalesce(1).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{d}/documents.parquet/*.parquet')"
    )
    for name in (
        "gopher_quality_flags",
        "c4_quality_rules",
        "dsir_importance_weights",
        "ccnet_perplexity_buckets",
        "bpe_apply_merge",
        # round-5 text-shaped queries through the same dirty inputs
        "winnowing_fingerprints",
        "duplicate_span_detect",
        "duplicate_span_removal",
        "chunk_dedup",
        "cms_frequency_bound",
        "vocab_coverage",
        "mixture_temperature_weights",
        "bpe_train_merges",
        "bpe_encode_corpus",
        # the recall gate's degenerate-doc exclusion (empty/tiny texts
        # would otherwise be LSH-lane-only "false positives")
        "minhash_lsh_recall",
        # round-6 text-shaped queries
        "quality_classifier_scores",
        "domain_reputation_gate",
        "containment_neardup",
        "kmv_source_similarity",
        "kmv_source_novelty",
    ):
        sdf = DQ.QUERIES[name](spark, d)
        srows = [tuple(r) for r in sdf.collect()]
        res = con.execute(DQ.ORACLE[name])
        ocols = [c[0] for c in res.description]
        orows = res.fetchall()
        assert _rowset(sdf.columns, srows) == _rowset(ocols, orows), name


def test_duplicate_span_semantics(spark, tmp_path):
    """Island arithmetic on hand-built docs: two docs sharing a 40-token
    passage -> every one of doc 0's 25 stride-1 spans is duplicated, so
    the longest duplicated run is 25 spans = 40 tokens; the unique doc
    has zero duplicated spans."""
    shared = " ".join(f"tok{i}" for i in range(40))
    texts = [
        shared,
        "prefix " + shared + " suffix",
        " ".join(f"uniq{i}" for i in range(40)),
    ]
    docs = spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    d = str(tmp_path / "spans")
    docs.coalesce(1).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    rows = {
        r["doc_id"]: r.asDict()
        for r in DQ.QUERIES["duplicate_span_detect"](spark, d).collect()
    }
    # doc 0: 40 tokens -> 25 spans, ALL also inside doc 1 -> run 25,
    # longest duplicated substring = 25 + 15 = 40 tokens (the passage)
    assert rows[0]["n_spans"] == 25 and rows[0]["n_dup_spans"] == 25
    assert rows[0]["max_dup_run"] == 25 and rows[0]["max_dup_tokens"] == 40
    # doc 2: nothing shared
    assert rows[2]["n_dup_spans"] == 0 and rows[2]["max_dup_tokens"] == 0


def test_stupid_backoff_semantics(spark, tmp_path):
    """Hand-built corpus where the backoff path MUST fire: the LM
    trains on even doc_ids only, and odd docs contain bigrams (and one
    word) absent from the training slice. Scores follow the published
    formula exactly (seen: ln(c12/c1); unseen: ln(0.4*c2/T), unseen
    word floors at count 1)."""
    import math

    texts = [
        "a b a b c",      # doc 0 (train)
        "a b zz a",       # doc 1 (held out: 'b zz', 'zz a' unseen; zz OOV)
        "c a b",          # doc 2 (train)
    ]
    docs = spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    d = str(tmp_path / "sb")
    docs.coalesce(1).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    rows = {
        r["doc_id"]: r.asDict()
        for r in DQ.QUERIES["stupid_backoff_score"](spark, d).collect()
    }
    # train slice = docs 0,2: unigrams a:3 b:3 c:2 (T=8);
    # bigrams: ab:3, ba:1, bc:1, ca:1
    T, c = 8, {"a": 3, "b": 3, "c": 2}
    big = {("a", "b"): 3, ("b", "a"): 1, ("b", "c"): 1, ("c", "a"): 1}

    def lp(w1, w2):
        if (w1, w2) in big:
            return math.floor(math.log(big[(w1, w2)] / c[w1]) * 1_000_000)
        return math.floor(math.log(0.4 * max(c.get(w2, 0), 1) / T) * 1_000_000)

    # doc 1: bigrams (a,b) seen, (b,zz) backoff+OOV, (zz,a) backoff
    want = [lp("a", "b"), lp("b", "zz"), lp("zz", "a")]
    assert rows[1]["n_bigrams"] == 3 and rows[1]["n_backoff"] == 2
    assert rows[1]["avg_logp_micro"] == sum(want) // 3
    # doc 0: all four bigrams seen in training
    assert rows[0]["n_backoff"] == 0


def test_duplicate_span_removal_semantics(spark, tmp_path):
    """The published removal rule: only the canonical (first (doc,pos))
    occurrence of a duplicated span survives. Two docs share a 40-token
    passage: doc 0 keeps it whole; doc 1 loses exactly the shared
    tokens and keeps its unique prefix/suffix; a unique doc is
    untouched."""
    import hashlib

    shared = " ".join(f"tok{i}" for i in range(40))
    texts = [
        shared,
        "prefix " + shared + " suffix",
        " ".join(f"uniq{i}" for i in range(40)),
    ]
    docs = spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    d = str(tmp_path / "spanrm")
    docs.coalesce(1).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    rows = {
        r["doc_id"]: r.asDict()
        for r in DQ.QUERIES["duplicate_span_removal"](spark, d).collect()
    }

    def h(s):
        return hashlib.md5(s.encode()).hexdigest()

    # doc 0 is canonical for every shared span: nothing removed
    assert rows[0]["n_removed"] == 0 and rows[0]["cleaned_md5"] == h(shared)
    # doc 1: all 40 shared tokens struck (its spans are non-canonical),
    # the unique prefix/suffix survive in order
    assert rows[1]["n_removed"] == 40
    assert rows[1]["cleaned_md5"] == h("prefix suffix")
    # doc 2: no duplicated spans anywhere
    assert rows[2]["n_removed"] == 0
    assert rows[2]["cleaned_md5"] == h(texts[2])


def test_hybrid_rrf_fusion_arithmetic(spark, sf_dir):
    """The fused score IS the RRF formula over the emitted ranks
    (integer micro-units), rows come out in (rrf desc, doc_id) order,
    and both lanes contribute at least one member to the fused top-10."""
    rows = [
        r.asDict()
        for r in DQ.QUERIES["hybrid_rrf_retrieval"](spark, sf_dir).collect()
    ]
    assert len(rows) == 10
    for r in rows:
        want = 0
        if r["rank_lex"] is not None:
            want += 1_000_000 // (60 + r["rank_lex"])
        if r["rank_vec"] is not None:
            want += 1_000_000 // (60 + r["rank_vec"])
        assert r["rrf_micro"] == want, r
    keys = [(-r["rrf_micro"], r["doc_id"]) for r in rows]
    assert keys == sorted(keys)
    assert any(r["rank_lex"] is not None for r in rows)
    assert any(r["rank_vec"] is not None for r in rows)
