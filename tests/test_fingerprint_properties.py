"""Property tests for the fingerprint/sketch additions: the Spark
implementations are checked against from-first-principles Python
references on random inputs, and the published guarantees are asserted
directly (not just cross-engine equality, which both engines could
fail identically)."""

from __future__ import annotations

import hashlib
import random

import pytest

from nyc_government_hiring_audit_data_platform_spark import driver_queries as DQ
from nyc_government_hiring_audit_data_platform_spark.driver_queries_datapipe import (
    _WIN_W,
)
from nyc_government_hiring_audit_data_platform_spark.functions.textstats import (
    SHINGLE_N,
)
from nyc_government_hiring_audit_data_platform_spark.operators.dedup import MH_M


def _norm(text: str) -> str:
    """Python twin of functions.text.normalize_text (lower, strip punct,
    collapse whitespace) - re-derived independently for the reference."""
    import re

    t = re.sub(r"[^\w\s]", "", (text or "").lower())
    return re.sub(r"\s+", " ", t).strip()


def _base_hash(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % MH_M


def _ref_winnow(text: str, n: int = SHINGLE_N, w: int = _WIN_W) -> set[int]:
    s = _norm(text)
    hs = [_base_hash(s[i : i + n]) for i in range(len(s) - n + 1)]
    if not hs:
        return set()
    if len(hs) < w:
        return {min(hs)}
    return {min(hs[i : i + w]) for i in range(len(hs) - w + 1)}


def _run_docs(spark, tmp_path, name, texts, subdir):
    docs = spark.createDataFrame(
        [(i, t, "en", f"s{i % 3}", len(t) if t else 0) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    d = str(tmp_path / subdir)
    docs.coalesce(1).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    return DQ.QUERIES[name](spark, d).collect()


def test_winnowing_matches_python_reference(spark, tmp_path):
    """Fingerprint inventory (count, min, max) equals an independent
    Python winnowing implementation on random texts."""
    rng = random.Random(11)
    words = ["alpha", "beta", "gamma", "delta", "x", "longerword", "zz"]
    texts = [
        " ".join(rng.choice(words) for _ in range(rng.randrange(0, 40)))
        for _ in range(20)
    ]
    rows = {
        r["doc_id"]: r.asDict()
        for r in _run_docs(spark, tmp_path, "winnowing_fingerprints", texts, "w")
    }
    for i, t in enumerate(texts):
        fps = _ref_winnow(t)
        assert rows[i]["n_fps"] == len(fps), (i, t)
        assert rows[i]["min_fp"] == (min(fps) if fps else None)
        assert rows[i]["max_fp"] == (max(fps) if fps else None)


def test_winnowing_shared_substring_guarantee(spark, tmp_path):
    """The published guarantee (Schleimer et al. 2003): two documents
    sharing a substring of length >= n + w - 1 share at least one
    fingerprint. Checked via the Python reference sets on docs built
    around a common passage at different positions."""
    passage = "the quick brown fox jumps over the lazy dog again"
    assert len(_norm(passage)) >= SHINGLE_N + _WIN_W - 1
    a = "left padding words " + passage + " trailing"
    b = "completely different prefix here " + passage
    fa, fb = _ref_winnow(a), _ref_winnow(b)
    assert fa & fb, "guarantee violated in the reference itself"
    # and the Spark outputs agree with those reference sets
    rows = {
        r["doc_id"]: r.asDict()
        for r in _run_docs(spark, tmp_path, "winnowing_fingerprints", [a, b], "g")
    }
    assert rows[0]["n_fps"] == len(fa) and rows[1]["n_fps"] == len(fb)


def test_duplicate_span_removal_matches_python_reference(spark, tmp_path):
    """Random corpora with engineered cross-doc and internal span
    repeats: the distributed removal matches an independent Python
    implementation of the canonical-survivor rule exactly (token
    counts, removed counts, and the md5 of the cleaned text)."""
    from collections import defaultdict

    SPAN = 16
    rng = random.Random(31)
    vocab = [f"v{i}" for i in range(50)]
    base = [
        " ".join(rng.choice(vocab) for _ in range(rng.randrange(0, 60)))
        for _ in range(12)
    ]
    # splice shared passages across docs + an internal repeat
    passage = " ".join(rng.choice(vocab) for _ in range(24))
    texts = base + [
        passage,
        "lead " + passage + " tail",
        passage + " middle " + passage,  # internal repeat too
        "",  # empty doc
    ]

    def ref(texts):
        toks = {
            i: [t for t in t_.split(" ") if t] for i, t_ in enumerate(texts)
        }
        info = {}
        occ = []
        for d in sorted(toks):
            tk = toks[d]
            for p in range(1, len(tk) - SPAN + 2):
                k = " ".join(tk[p - 1 : p - 1 + SPAN])
                occ.append((d, p, k))
                cnt_canon = info.setdefault(k, [0, (d, p)])
                cnt_canon[0] += 1
                if (d, p) < cnt_canon[1]:
                    cnt_canon[1] = (d, p)
        removed = defaultdict(set)
        for d, p, k in occ:
            cnt, canon = info[k]
            if cnt > 1 and (d, p) != canon:
                removed[d].update(range(p, p + SPAN))
        out = {}
        for d, tk in toks.items():
            kept = [t for i, t in enumerate(tk, 1) if i not in removed[d]]
            out[d] = (len(tk), len(removed[d]), " ".join(kept))
        return out

    want = ref(texts)
    rows = {
        r["doc_id"]: r.asDict()
        for r in _run_docs(spark, tmp_path, "duplicate_span_removal", texts, "rm")
    }
    assert sorted(rows) == sorted(want)
    for d, (n_tok, n_rm, cleaned) in want.items():
        assert rows[d]["n_tokens"] == n_tok, d
        assert rows[d]["n_removed"] == n_rm, d
        assert rows[d]["cleaned_md5"] == hashlib.md5(cleaned.encode()).hexdigest(), d


def test_cms_one_sided_bound_and_reference(spark, tmp_path):
    """Count-Min property: est >= exact for every probed term, and the
    estimates equal an independent Python CMS with the same hashes."""
    from nyc_government_hiring_audit_data_platform_spark.driver_queries_extended import (
        _CMS_D,
        _CMS_W,
    )
    from nyc_government_hiring_audit_data_platform_spark.operators.dedup import (
        MH_COEF,
        MH_P,
    )

    rng = random.Random(23)
    vocab = [f"t{i}" for i in range(40)]
    # skewed stream: low ids heavy
    stream = [vocab[min(int(rng.expovariate(0.12)), 39)] for _ in range(3000)]
    texts = [" ".join(stream[i : i + 100]) for i in range(0, 3000, 100)]
    rows = {
        r["term"]: r.asDict()
        for r in _run_docs(spark, tmp_path, "cms_frequency_bound", texts, "c")
    }
    # python reference sketch
    from collections import Counter

    exact = Counter(stream)
    sketch = [[0] * _CMS_W for _ in range(_CMS_D)]
    for term, c in exact.items():
        h = _base_hash(term)
        for j in range(_CMS_D):
            a, b = MH_COEF[j]
            sketch[j][((a * h + b) % MH_P) % _CMS_W] += c
    probes = sorted(exact, key=lambda t: (-exact[t], t))[:8]
    assert sorted(rows) == sorted(probes)
    for term in probes:
        h = _base_hash(term)
        est = min(
            sketch[j][((MH_COEF[j][0] * h + MH_COEF[j][1]) % MH_P) % _CMS_W]
            for j in range(_CMS_D)
        )
        assert rows[term]["exact_cnt"] == exact[term]
        assert rows[term]["est_cnt"] == est
        assert rows[term]["over_count"] >= 0  # one-sided guarantee
