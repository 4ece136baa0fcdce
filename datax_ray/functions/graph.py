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


def _run_pairs(sort_key: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """All index pairs (i < j) within each run of equal values in the
    ALREADY-SORTED `sort_key` — fully vectorized (repeat + segmented
    arange), no Python loop over runs. Returns (i_idx, j_idx)."""
    n = len(sort_key)
    if n == 0:
        z = np.empty(0, dtype=np.int64)
        return z, z
    new_run = np.ones(n, dtype=bool)
    new_run[1:] = sort_key[1:] != sort_key[:-1]
    starts = np.flatnonzero(new_run)
    run_len = np.diff(np.append(starts, n))
    pos = np.arange(n, dtype=np.int64) - np.repeat(starts, run_len)
    remain = np.repeat(run_len, run_len) - pos - 1  # pairs this row starts
    i_idx = np.repeat(np.arange(n, dtype=np.int64), remain)
    total = int(remain.sum())
    base = np.concatenate(([0], np.cumsum(remain)[:-1]))
    off = np.arange(total, dtype=np.int64) - np.repeat(base, remain) + 1
    return i_idx, i_idx + off


def _pack32(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Exact uint64 code for an id pair — requires ids < 2^32 (asserted
    at the call sites; at a larger id space swap for a 2-column lexsort
    membership probe, same shape)."""
    return (a.astype(np.uint64) << np.uint64(32)) | b.astype(np.uint64)


def triangle_counts(edges, num_buckets: int = 64):
    """Per-vertex triangle counts over an undirected simple graph —
    degree-ordered wedge join (Schank/Ortmann node-iterator++), Ray-Data
    end to end. `edges` is a Dataset of int64 columns (u, v) with every
    undirected edge present exactly once and u != v. Returns a Dataset
    (node, n_triangles) for every vertex in >= 1 triangle.

    Plan: (1) degree fold (combiner partial_agg over exploded
    endpoints); the O(|V|) (node -> rank) table — vertex-dimension
    sized — broadcasts ONCE via ray.put, never per batch. (2) Orient
    each edge low-rank -> high-rank: out-degree is then bounded by
    O(sqrt(|E|)) even on power-law graphs, which bounds the wedge
    fan-out the way plain id-orientation cannot. (3) Wedges enumerate
    per src hash-bucket (vectorized run-pair expansion). (4) The
    closing-edge probe is a hash-bucket co-group of wedges with the
    directed edge set (sorted-code membership, no driver pair list);
    each hit credits all three vertices into a count combiner.
    No stage ever materializes edges or wedges on the driver."""
    import ray

    from datax_ray.functions.relational import key_buckets, partial_agg

    def explode(t: pa.Table) -> pa.Table:
        u = t["u"].to_numpy(zero_copy_only=False)
        v = t["v"].to_numpy(zero_copy_only=False)
        return pa.table({"node": pa.array(np.concatenate([u, v]), pa.int64())})

    deg = partial_agg(
        edges.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True),
        keys=["node"],
        counts="deg",
        single_reduce=True,  # O(|V|) grid — same order the driver holds anyway
    ).to_pandas()  # O(|V|) rows — the vertex dimension
    node = deg["node"].to_numpy(dtype=np.int64)
    assert node.size == 0 or (node.min() >= 0 and node.max() < 1 << 32), (
        "triangle_counts packs id pairs into uint64: vertex ids must be < 2^32"
    )
    order = np.lexsort((node, deg["deg"].to_numpy()))
    rank = np.empty(len(node), dtype=np.int64)
    rank[order] = np.arange(len(node), dtype=np.int64)
    by_id = np.argsort(node, kind="stable")
    rank_ref = ray.put((node[by_id], rank[by_id]))

    def orient(t: pa.Table) -> pa.Table:
        nodes_by_id, rank_by_id = ray.get(rank_ref)
        u = t["u"].to_numpy(zero_copy_only=False)
        v = t["v"].to_numpy(zero_copy_only=False)
        ru = rank_by_id[np.searchsorted(nodes_by_id, u)]
        rv = rank_by_id[np.searchsorted(nodes_by_id, v)]
        lo_is_u = ru < rv
        src = np.where(lo_is_u, u, v)
        dst = np.where(lo_is_u, v, u)
        out = pa.table(
            {
                "src": pa.array(src, pa.int64()),
                "dst": pa.array(dst, pa.int64()),
                "rdst": pa.array(np.where(lo_is_u, rv, ru), pa.int64()),
            }
        )
        return out.append_column("_grp", key_buckets(out, ["src"], num_buckets))

    directed = edges.map_batches(
        orient, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()  # consumed twice below (wedge + closing probe)

    def wedges(t: pa.Table) -> pa.Table:
        t = t.sort_by([("src", "ascending"), ("rdst", "ascending")])
        src = t["src"].to_numpy(zero_copy_only=False)
        dst = t["dst"].to_numpy(zero_copy_only=False)
        i, j = _run_pairs(src)
        out = pa.table(
            {
                "a": pa.array(dst[i], pa.int64()),  # rank(a) < rank(b) by sort
                "b": pa.array(dst[j], pa.int64()),
                "apex": pa.array(src[i], pa.int64()),
            }
        )
        return out.append_column("_grp", key_buckets(out, ["a", "b"], num_buckets))

    wedge_ds = directed.groupby("_grp").map_groups(wedges, batch_format="pyarrow")

    def edge_keys(t: pa.Table) -> pa.Table:
        out = pa.table(
            {
                "a": t["src"],
                "b": t["dst"],
                "apex": pa.array(np.full(t.num_rows, -1), pa.int64()),
            }
        )
        return out.append_column("_grp", key_buckets(out, ["a", "b"], num_buckets))

    edge_ds = directed.map_batches(
        edge_keys, batch_format="pyarrow", zero_copy_batch=True
    )

    def close(t: pa.Table) -> pa.Table:
        apex = t["apex"].to_numpy(zero_copy_only=False)
        a = t["a"].to_numpy(zero_copy_only=False)
        b = t["b"].to_numpy(zero_copy_only=False)
        is_edge = apex < 0
        codes_e = np.sort(_pack32(a[is_edge], b[is_edge]))
        wa, wb, wap = a[~is_edge], b[~is_edge], apex[~is_edge]
        wc = _pack32(wa, wb)
        pos = np.searchsorted(codes_e, wc)
        hit = (pos < len(codes_e)) & (codes_e[np.minimum(pos, max(0, len(codes_e) - 1))] == wc) if len(codes_e) else np.zeros(len(wc), bool)
        tri_nodes = np.concatenate([wap[hit], wa[hit], wb[hit]])
        g = (
            pa.table({"node": pa.array(tri_nodes, pa.int64())})
            .group_by(["node"], use_threads=False)
            .aggregate([([], "count_all")])
        )
        return pa.table(
            {"node": g["node"], "n": pc.cast(g["count_all"], pa.int64())}
        )

    return partial_agg(
        wedge_ds.union(edge_ds).groupby("_grp").map_groups(close, batch_format="pyarrow"),
        keys=["node"],
        sums={"n": "n"},
        single_reduce=True,  # output is vertex-bounded
    )
