"""Connected components over a pair/edge table.

The canonical last step of near-duplicate resolution: pairwise
similarity joins (MinHash-LSH / SimHash / embedding-cosine in
operators.dedup and operators.ann) emit EDGES; grouping documents into
duplicate CLUSTERS is the connected-components closure of that edge
set, with the canonical representative = min node id per component.

Implemented as iterative min-label propagation (the GraphX/GraphFrames
pattern expressed in plain DataFrame ops): every node starts labeled
with itself; each round every node takes the min of its own label and
its neighbors' labels; fixpoint in <= diameter rounds. Each round is
one equi-join + one aggregation - all distributed, nothing driver-side
except the convergence test (a scalar checksum). ``localCheckpoint``
truncates the lineage so plans do not grow with iteration count.

Scale: rounds cost O(|E|) shuffle each and near-dup graphs are sparse
with tiny diameter (duplicate clusters are cliques -> diameter ~1-2),
so the loop converges in 2-3 rounds at any data size. For adversarial
long-chain graphs, large-star/small-star (alternating conditional
joins) halves diameter per round; not needed for dedup workloads.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """Return (node, component) where component = min node id reachable
    over undirected edges. Deterministic for any edge order."""
    e = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
    )
    from pyspark.sql import Observation

    e = e.localCheckpoint(eager=True)
    # Convergence metric rides the SAME job that materializes each
    # round's labels (observe() collects during the eager checkpoint's
    # action - the fuzzy pipeline's zero-extra-job metrics pattern),
    # instead of a second agg+collect job per round (r13: halves the
    # loop's job count; labels and fixpoint test are unchanged).
    obs = Observation()
    labels = (
        e.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .observe(obs, F.sum("label").alias("s"))
        .localCheckpoint(eager=True)
    )
    prev_sum = obs.get["s"]
    for _ in range(max_iter):
        neighbor_min = (
            e.join(labels, e["b"] == labels["node"])
            .groupBy(F.col("a").alias("node"))
            .agg(F.min("label").alias("nlabel"))
        )
        obs = Observation()
        labels = (
            labels.alias("l")
            .join(neighbor_min.alias("n"), "node", "left")
            .select(
                "node",
                F.least(
                    F.col("l.label"), F.coalesce(F.col("n.nlabel"), F.col("l.label"))
                ).alias("label"),
            )
            .observe(obs, F.sum("label").alias("s"))
            .localCheckpoint(eager=True)
        )
        cur_sum = obs.get["s"]
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    else:
        raise RuntimeError(f"connected_components: no fixpoint in {max_iter} rounds")
    return labels.select("node", F.col("label").alias("component"))


def connected_components_sql(edges_sql: str, src: str = "src", dst: str = "dst") -> str:
    """DuckDB oracle: transitive min-label closure via a recursive CTE
    (UNION dedups, so the recursion terminates). Algorithm-independent
    result: (node, min reachable node)."""
    return f"""
    WITH RECURSIVE e AS (
      SELECT {src} AS a, {dst} AS b FROM ({edges_sql})
      UNION
      SELECT {dst} AS a, {src} AS b FROM ({edges_sql})
    ),
    reach(node, label) AS (
      SELECT a, a FROM e
      UNION
      SELECT e.a, reach.label FROM e JOIN reach ON e.b = reach.node
    )
    SELECT node, MIN(label) AS component FROM reach GROUP BY node
    """
