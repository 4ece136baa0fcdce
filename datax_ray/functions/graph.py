"""Distributed connected components over a pair/edge Dataset — the step
that turns near-duplicate PAIRS into duplicate CLUSTERS (one canonical doc
per component), the actual end-goal of fuzzy dedup in a training-data
pipeline.

Algorithm: iterative min-label propagation. Every node starts labeled with
itself; each round, every node takes the min of its own label and its
neighbors' labels. Labels only ever decrease, so sum(labels) is strictly
monotone until the fixpoint — an unchanged sum is an EXACT convergence
proof, not a heuristic. Rounds needed = graph diameter; near-dup components
are shallow (a handful of docs each), so in practice 2-4 rounds.

Scale shape: each round is two coarse-bucket groupbys over id-only rows
(node, label) — never text, never adjacency lists on the driver. The edge
set and the label frontier are materialized once per round (iterative
algorithms are the one legitimate use of mid-pipeline materialize(): the
next round's lineage would otherwise re-execute every prior round).
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def _bucket(vals: np.ndarray, num_buckets: int) -> np.ndarray:
    return ((vals.astype(np.uint64) * np.uint64(2654435761)) % num_buckets).astype(
        "int32"
    )


# Below this many edges, iterating distributed rounds is all fixed shuffle
# constant (two groupby executions per round at a multi-second floor each on
# this ray version) while a single-task union-find finishes in well under a
# second — same adaptive rule as dedup._SINGLE_REDUCE_ROWS. 5M edges of two
# int64s is 80 MB: comfortably one worker.
_SINGLE_TASK_EDGES = 5_000_000


def _union_find_cc(df: pd.DataFrame) -> pd.DataFrame:
    """Sequential union-find over one co-located edge table (the adaptive
    small-graph path — exact, and the reference the distributed path is
    tested against)."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(df["src"].to_numpy(), df["dst"].to_numpy()):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    nodes = np.fromiter(parent.keys(), dtype=np.int64, count=len(parent))
    labels = np.fromiter((find(int(x)) for x in nodes), dtype=np.int64, count=len(nodes))
    order = np.argsort(nodes)
    return pd.DataFrame({"node": nodes[order], "label": labels[order]})


def connected_components(
    pairs,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    num_buckets: int = 64,
    max_iters: int = 50,
):
    """pairs: Dataset with two int id columns (an undirected edge list).
    Returns a Dataset (doc_id, cluster_id) covering every node that appears
    in at least one pair; cluster_id = min doc_id of the component.
    Unpaired docs are implicitly their own singleton cluster (callers
    left-join this output and coalesce to doc_id)."""

    def both_dirs(df: pd.DataFrame) -> pd.DataFrame:
        a = df[a_col].to_numpy().astype(np.int64)
        b = df[b_col].to_numpy().astype(np.int64)
        return pd.DataFrame(
            {"src": np.concatenate([a, b]), "dst": np.concatenate([b, a])}
        )

    edges = pairs.map_batches(both_dirs, batch_format="pandas").materialize()

    if edges.count() <= _SINGLE_TASK_EDGES:
        labels = edges.repartition(1).map_batches(
            _union_find_cc, batch_format="pandas", batch_size=None
        )
        return labels.map_batches(
            lambda df: pd.DataFrame(
                {"doc_id": df["node"], "cluster_id": df["label"]}
            ),
            batch_format="pandas",
        )

    # initial labels: each node labeled by the min of itself and its direct
    # neighbors (this IS round one of propagation, fused into init)
    def init_partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("src", as_index=False)["dst"].min()
        g["label"] = np.minimum(g["src"].to_numpy(), g["dst"].to_numpy())
        g = g.rename(columns={"src": "node"})[["node", "label"]]
        g["_grp"] = _bucket(g["node"].to_numpy(), num_buckets)
        return g

    def min_label(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.drop(columns=["_grp"]).groupby("node", as_index=False)["label"].min()
        )

    labels = (
        edges.map_batches(init_partial, batch_format="pandas")
        .groupby("_grp")
        .map_groups(min_label, batch_format="pandas")
        .materialize()
    )
    prev_sum = labels.sum("label")

    def tag_edges(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {"node": df["src"], "dst": df["dst"], "label": np.int64(-1)}
        )
        out["_grp"] = _bucket(out["node"].to_numpy(), num_buckets)
        return out

    def tag_labels(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {"node": df["node"], "dst": np.int64(-1), "label": df["label"]}
        )
        out["_grp"] = _bucket(out["node"].to_numpy(), num_buckets)
        return out

    edges_tagged = edges.map_batches(tag_edges, batch_format="pandas").materialize()

    def propagate(df: pd.DataFrame) -> pd.DataFrame:
        """One co-partitioned bucket: join each edge's src label onto the
        edge and emit (dst, src_label) messages plus the self labels."""
        is_edge = df["dst"].to_numpy() >= 0
        e = df[is_edge]
        l = df[~is_edge][["node", "label"]]
        msgs = e[["node", "dst"]].merge(l, on="node", how="inner")
        out = pd.concat(
            [
                pd.DataFrame({"node": msgs["dst"], "label": msgs["label"]}),
                l,
            ],
            ignore_index=True,
        )
        # partial min within the bucket before the re-shuffle (combiner)
        out = out.groupby("node", as_index=False)["label"].min()
        out["_grp"] = _bucket(out["node"].to_numpy(), num_buckets)
        return out

    for _ in range(max_iters):
        labels_tagged = labels.map_batches(tag_labels, batch_format="pandas")
        labels = (
            edges_tagged.union(labels_tagged)
            .groupby("_grp")
            .map_groups(propagate, batch_format="pandas")
            .groupby("_grp")
            .map_groups(min_label, batch_format="pandas")
            .materialize()
        )
        cur_sum = labels.sum("label")
        if cur_sum == prev_sum:  # monotone ⇒ fixpoint reached
            break
        prev_sum = cur_sum

    def rename(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"doc_id": df["node"], "cluster_id": df["label"]}
        )

    return labels.map_batches(rename, batch_format="pandas")
