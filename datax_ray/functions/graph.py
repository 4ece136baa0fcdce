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
import pyarrow as pa
import pyarrow.compute as pc
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

    def both_dirs(t: pa.Table) -> pa.Table:
        a = pc.cast(t[a_col], pa.int64()).combine_chunks()
        b = pc.cast(t[b_col], pa.int64()).combine_chunks()
        return pa.table(
            {"src": pa.concat_arrays([a, b]), "dst": pa.concat_arrays([b, a])}
        )

    edges = pairs.map_batches(both_dirs, batch_format="pyarrow").materialize()

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

    def _grp_col(t: pa.Table, col: str) -> pa.Table:
        return t.append_column(
            "_grp",
            pa.array(_bucket(t[col].to_numpy(zero_copy_only=False), num_buckets)),
        )

    # initial labels: each node labeled by the min of itself and its direct
    # neighbors (this IS round one of propagation, fused into init)
    def init_partial(t: pa.Table) -> pa.Table:
        g = (
            t.group_by("src", use_threads=False)
            .aggregate([("dst", "min")])
            .rename_columns(["node", "dst_min"])
        )
        out = pa.table(
            {
                "node": g["node"],
                "label": pc.min_element_wise(g["node"], g["dst_min"]),
            }
        )
        return _grp_col(out, "node")

    def min_label(t: pa.Table) -> pa.Table:
        return (
            t.drop_columns(["_grp"])
            .group_by("node", use_threads=False)
            .aggregate([("label", "min")])
            .rename_columns(["node", "label"])
        )

    labels = (
        edges.map_batches(init_partial, batch_format="pyarrow")
        .groupby("_grp")
        .map_groups(min_label, batch_format="pyarrow")
        .materialize()
    )
    prev_sum = labels.sum("label")

    def tag_edges(t: pa.Table) -> pa.Table:
        out = pa.table(
            {
                "node": t["src"],
                "dst": t["dst"],
                "label": pa.array(np.full(t.num_rows, -1, dtype=np.int64)),
            }
        )
        return _grp_col(out, "node")

    def tag_labels(t: pa.Table) -> pa.Table:
        out = pa.table(
            {
                "node": t["node"],
                "dst": pa.array(np.full(t.num_rows, -1, dtype=np.int64)),
                "label": t["label"],
            }
        )
        return _grp_col(out, "node")

    edges_tagged = edges.map_batches(tag_edges, batch_format="pyarrow").materialize()

    def propagate(t: pa.Table) -> pa.Table:
        """One co-partitioned bucket: join each edge's src label onto the
        edge (Arrow hash join) and emit (dst, src_label) messages plus the
        self labels."""
        is_edge = pc.greater_equal(t["dst"], 0)
        e = t.filter(is_edge).select(["node", "dst"])
        lbl = t.filter(pc.invert(is_edge)).select(["node", "label"])
        msgs = e.join(lbl, keys=["node"], join_type="inner")
        out = pa.concat_tables(
            [
                pa.table({"node": msgs["dst"], "label": msgs["label"]}),
                lbl,
            ]
        )
        # partial min within the bucket before the re-shuffle (combiner)
        out = (
            out.group_by("node", use_threads=False)
            .aggregate([("label", "min")])
            .rename_columns(["node", "label"])
        )
        return _grp_col(out, "node")

    for _ in range(max_iters):
        labels_tagged = labels.map_batches(tag_labels, batch_format="pyarrow")
        labels = (
            edges_tagged.union(labels_tagged)
            .groupby("_grp")
            .map_groups(propagate, batch_format="pyarrow")
            .groupby("_grp")
            .map_groups(min_label, batch_format="pyarrow")
            .materialize()
        )
        cur_sum = labels.sum("label")
        if cur_sum == prev_sum:  # monotone ⇒ fixpoint reached
            break
        prev_sum = cur_sum

    def rename(t: pa.Table) -> pa.Table:
        return pa.table({"doc_id": t["node"], "cluster_id": t["label"]})

    return labels.map_batches(rename, batch_format="pyarrow")
