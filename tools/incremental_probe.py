"""Index-size-axis probe for the two incremental paths (VERDICT r7
ask #7): does probing a persisted index with a FIXED batch stay cheap
as the index/corpus grows x10 / x100?

The cost-model claim under test:
- ``dedup.incremental_neardup``: per-probe work = hash/band the batch
  (fixed) + equi-join into the index's (band, bh) space. The batch side
  broadcasts, so the index is never SHUFFLED - but a plain parquet
  index is still fully SCANNED per probe, so local probe time carries a
  linear scan term with a small constant. At 100 TB a (band, bh)-
  partitioned index layout prunes that scan to the batch's own buckets;
  the Bloom gate (band_bloom_gate) additionally rejects batch rows
  map-side. This probe reports the measured per-decade alpha so the
  scan term is a NUMBER, not an assertion.
- ``streaming/ann_index``: encode_batch touches ONLY the batch (flat by
  construction - measured to prove the plan stays that way), and
  search_codes_index scans the (id, cluster, 8-byte codes) index with
  broadcast query LUTs - the scan term is 32x narrower than raw
  vectors.

Index sizes: sf0.1 documents/embeddings (x1) and the cached
fresh-vocabulary replicas (x10 / x100 - per-replica token vocabulary /
dimension permutation, so duplicate structure and cluster geometry
stay per-replica-realistic; see tools/scale_probe.py). Fixed batch =
sf0.01 documents / 20 query vectors.

Protocol per point: build + persist the index to parquet (timed
separately - build is the linear pass, probe is the claim), then one
warm probe lap + one timed lap, noop sink (count).

Usage: python tools/incremental_probe.py [--skip-x100]
Prints a markdown table to append to SCALING.md (curated by hand).
"""

from __future__ import annotations

import argparse
import math
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from nyc_government_hiring_audit_data_platform_spark.session import get_spark  # noqa: E402
from nyc_government_hiring_audit_data_platform_spark.operators import dedup as DD  # noqa: E402
from nyc_government_hiring_audit_data_platform_spark.operators import ann as ANN  # noqa: E402
from nyc_government_hiring_audit_data_platform_spark.streaming import ann_index as AI  # noqa: E402

SMALL = "/root/testdata/sf0.01"
CORPORA = [
    ("x1", "/root/testdata/sf0.1"),
    ("x10", "/tmp/spark_graft_scale_x10-fresh"),
    ("x100", "/tmp/spark_graft_scale_x100-fresh"),
]
WORK = "/tmp/spark_graft_incprobe"


def _timed(fn):
    fn()  # warm lap (JIT, parquet footers)
    t0 = time.time()
    fn()
    return round(time.time() - t0, 2)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-x100", action="store_true")
    args = ap.parse_args()
    corpora = CORPORA[:2] if args.skip_x100 else CORPORA

    spark = get_spark(app_name="incremental_probe")
    par = spark.sparkContext.defaultParallelism
    os.makedirs(WORK, exist_ok=True)

    batch = (
        spark.read.parquet(f"{SMALL}/documents.parquet")
        .select("doc_id", "text")
        .repartition(par)
        .persist()
    )
    batch.count()
    queries = (
        spark.read.parquet(f"{SMALL}/embeddings.parquet")
        .filter(F.col("vec_id") < 20)
        .select("vec_id", "embedding")
        .persist()
    )
    queries.count()
    # ONE frozen quantizer for every index size (the production shape:
    # the model does not grow with the corpus)
    model = AI.frozen_quantizer(
        ANN.kmeans_train(
            spark.read.parquet(f"{CORPORA[0][1]}/embeddings.parquet")
            .select("embedding"),
            "embedding",
        )
    )

    rows = []
    for label, src in corpora:
        docs = (
            spark.read.parquet(f"{src}/documents.parquet")
            .select("doc_id", "text")
            .repartition(par)
        )
        emb = spark.read.parquet(f"{src}/embeddings.parquet").select(
            "vec_id", "embedding"
        )
        # indexes are cached across runs (delete WORK to rebuild) - the
        # probe, not the build, is the quantity under test
        band_dir = f"{WORK}/band_{label}"
        codes_dir = f"{WORK}/codes_{label}"
        if os.path.exists(f"{band_dir}/_SUCCESS"):
            band_build = -1.0
        else:
            shutil.rmtree(band_dir, ignore_errors=True)
            t0 = time.time()
            DD.build_band_index(docs, "text", "doc_id").write.parquet(band_dir)
            band_build = round(time.time() - t0, 2)
        if os.path.exists(f"{codes_dir}/_SUCCESS"):
            codes_build = -1.0
        else:
            shutil.rmtree(codes_dir, ignore_errors=True)
            t0 = time.time()
            AI.encode_batch(emb, "vec_id", "embedding", model).write.parquet(
                codes_dir
            )
            codes_build = round(time.time() - t0, 2)

        band_index = spark.read.parquet(band_dir)
        n_index = band_index.count()
        probe_t = _timed(
            lambda: DD.incremental_neardup(
                batch, band_index, "text", "doc_id", 0.25
            ).count()
        )
        gate = DD.band_bloom_gate(band_index).persist()
        gate.count()
        probe_gated_t = _timed(
            lambda: DD.incremental_neardup(
                batch, band_index, "text", "doc_id", 0.25, bloom_gate=gate
            ).count()
        )
        gate.unpersist()

        codes = spark.read.parquet(codes_dir)
        n_codes = codes.count()
        encode_t = _timed(
            lambda: AI.encode_batch(
                spark.read.parquet(f"{SMALL}/embeddings.parquet"),
                "vec_id", "embedding", model,
            ).count()
        )
        search_t = _timed(
            lambda: AI.search_codes_index(
                codes, queries, "vec_id", "embedding", model, k=10, nprobe=4
            ).count()
        )
        rows.append(
            (label, n_index, band_build, probe_t, probe_gated_t,
             n_codes, codes_build, encode_t, search_t)
        )
        spark.catalog.clearCache()

    print(
        "\n| index | band rows | band build s | neardup probe s | "
        "probe+bloom s | code rows | codes build s | encode batch s | "
        "ADC search s |"
    )
    print("|---|---|---|---|---|---|---|---|---|")
    for r in rows:
        print("| " + " | ".join(str(x) for x in r) + " |")

    def alphas(idx):
        out = []
        for i in range(1, len(rows)):
            a = math.log10(max(rows[i][idx], 0.01) / max(rows[0][idx], 0.01)) / i
            out.append(f"{rows[i][0]}: {a:.2f}")
        return ", ".join(out)

    print("\nper-decade alpha vs x1 (0 = flat, 1 = linear):")
    for name, idx in [
        ("neardup probe", 3), ("probe+bloom", 4),
        ("encode batch", 7), ("ADC search", 8),
    ]:
        print(f"  {name}: {alphas(idx)}")


if __name__ == "__main__":
    main()
