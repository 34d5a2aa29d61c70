"""Iterative graph algorithms on DataFrames: connected components.

The dedup pipeline's missing last step: near-dup PAIRS (minhash/simhash/
embedding verify output) → duplicate CLUSTERS, so "keep one per cluster"
is well-defined even when similarity is not transitive pair-wise.

Implementation is min-label propagation WITH POINTER DOUBLING — each
iteration every vertex adopts the smallest id among itself, its
neighbors, and its current label's own label:

- per iteration: one join (labels × edges) + one groupBy-min for the
  neighbor step, plus one labels self-join for the doubling hop — all
  shuffle on vertex id, so a round costs O(|E| + |V|) shuffled bytes;
- the doubling hop (comp ← label[comp]) is sound because the label
  invariant is "comp is a reachable vertex id": reachability is
  transitive, so the label of my label is also reachable, and it is ≤ my
  label by the min-propagation invariant;
- convergence drops from O(diameter) rounds (pure propagation) to
  O(log diameter) — at 100 TB every round is a full-data pass, so round
  count IS the cost model. Near-dup graphs are usually quasi-cliques
  (1-3 rounds either way), but threshold-chain graphs (embedding
  similarity at low thresholds) have real diameter and the doubling is
  what keeps them bounded;
- ``localCheckpoint`` each round truncates the lineage so the plan doesn't
  grow exponentially — the standard Spark iterative-algorithm pattern;
- the convergence probe rides the checkpointed frame (prev label carried
  as a column, no extra join).

At much larger scale the same shape extends to alternating small-star/
large-star (Kiveris et al., "Connected Components in MapReduce and
Beyond").
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


#: Edge-count ceiling for the driver union-find fast path: 2M (a, b)
#: long pairs ≈ 32 MB collected — the same bounded-collect discipline as
#: the engine's limit-fenced driver collects. Above it the distributed
#: min-label loop runs unchanged (the 100-TB path).
DRIVER_CC_MAX_EDGES = 2_000_000


def _driver_union_find(edge_rows) -> dict[int, int]:
    """Min-id union-find over collected edges: component label = smallest
    reachable vertex id (exactly the loop's fixpoint). Path-halving +
    union-by-min keeps it near-linear."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        r = parent.setdefault(x, x)
        while r != parent[r]:
            parent[r] = parent[parent[r]]
            r = parent[r]
        parent[x] = r
        return r

    for a, b in edge_rows:
        ra, rb = find(a), find(b)
        if ra == rb:
            continue
        if ra < rb:
            parent[rb] = ra
        else:
            parent[ra] = rb
    return {x: find(x) for x in parent}


def connected_components(
    vertices: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src_col: str = "src",
    dst_col: str = "dst",
    max_iter: int = 20,
    driver_max_edges: int = DRIVER_CC_MAX_EDGES,
) -> DataFrame:
    """Label vertices with their connected component (min vertex id).

    ``vertices``: one column ``id_col``; ``edges``: undirected pairs
    (``src_col``, ``dst_col``). Returns (id, component). Deterministic:
    component = smallest reachable vertex id.

    Two execution paths with IDENTICAL output:

    - **edge sets under ``driver_max_edges``** (bounded: ≈32 MB of long
      pairs at the 2M default) run a driver union-find and broadcast the
      edge-touched labels back — vertices never leave the cluster, and
      the iterative loop's ~5 Spark jobs PER ROUND (measured ~0.7 s/round
      of pure job overhead on metadata-sized graphs) collapse into one
      collect + one broadcast join. This is the same bounded-driver-
      collect discipline as the engine's limit-fenced wire collects.
    - **bigger edge sets** take the distributed min-label loop with
      pointer doubling below — the 100-TB path, unchanged.
    """
    # undirected: propagate both ways. Materialize ONCE: the edge list is
    # near-dup pairs — upstream is candidate generation (GEMM / LSH), and
    # without the checkpoint every iteration's join re-evaluates that
    # whole lineage (measured: the pair stage re-ran per round and
    # dominated the loop).
    e = edges.select(F.col(src_col).alias("a"), F.col(dst_col).alias("b"))
    e = (
        e.unionByName(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .distinct()
        .localCheckpoint()
    )

    if e.count() <= driver_max_edges:
        # count is a cheap job on the materialized checkpoint; the collect
        # is fenced by driver_max_edges BEFORE any row moves
        pdf = e.toPandas()  # Arrow path; ≤ driver_max_edges rows by the gate
        comp = _driver_union_find(zip(pdf["a"].tolist(), pdf["b"].tolist()))
        spark = vertices.sparkSession
        if not comp:
            return vertices.select(
                F.col(id_col).alias(id_col), F.col(id_col).alias("component")
            )
        # Arrow path: createDataFrame over a pandas frame ships the label
        # map in one Arrow batch; the list-of-tuples form pickles every
        # row (measured ~0.4 s at ~60k labels, per consumer query)
        import pandas as pd

        touched = spark.createDataFrame(
            pd.DataFrame(
                {"a": list(comp.keys()), "comp": list(comp.values())},
                dtype="int64",
            ),
            schema="a long, comp long",
        )
        return (
            vertices.join(
                F.broadcast(touched),
                vertices[id_col] == touched["a"],
                "left",
            )
            .select(
                vertices[id_col].alias(id_col),
                F.coalesce(F.col("comp"), vertices[id_col]).alias("component"),
            )
        )

    labels = vertices.select(F.col(id_col).alias("a"), F.col(id_col).alias("comp"))
    for _ in range(max_iter):
        neighbor_min = (
            e.join(labels, "a")
            .select(F.col("b").alias("a"), F.col("comp"))
            .groupBy("a")
            .agg(F.min("comp").alias("n_comp"))
        )
        stepped = (
            labels.join(neighbor_min, "a", "left")
            .select(
                "a",
                F.col("comp").alias("prev"),
                F.least(F.col("comp"), F.coalesce(F.col("n_comp"), F.col("comp"))).alias(
                    "comp1"
                ),
            )
        )
        # pointer doubling: follow my (post-step) label to ITS label
        hop = labels.select(
            F.col("a").alias("__root"), F.col("comp").alias("__root_comp")
        )
        new_labels = (
            stepped.join(hop, stepped["comp1"] == hop["__root"], "left")
            .select(
                "a",
                "prev",
                F.least(
                    F.col("comp1"), F.coalesce(F.col("__root_comp"), F.col("comp1"))
                ).alias("comp"),
            )
            .localCheckpoint()  # truncate lineage; one materialization per round
        )
        changed = new_labels.filter(F.col("comp") != F.col("prev")).limit(1).count()
        labels = new_labels.select("a", "comp")
        if changed == 0:
            break
    return labels.select(F.col("a").alias(id_col), F.col("comp").alias("component"))
