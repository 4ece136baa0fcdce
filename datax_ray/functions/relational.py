"""Relational helpers the north-rule pipelines lean on: broadcast join,
partial (combiner) aggregation, distributed top-k. DataX has no relational
algebra (SURVEY.md §2A bottom row) — these are the Ray-idiomatic building
blocks used by the queries()/bench surface.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray


_ARROW_JOIN_TYPE = {"inner": "inner", "left": "left outer", "right": "right outer"}


def broadcast_join(ds, small: pa.Table, on: str, how: str = "inner"):
    """Join a Dataset against a SMALL table: the small side is ray.put once
    (zero-copy plasma hit after the first fetch per node) and joined per
    batch with Arrow's native hash join — the stream stays Arrow end to
    end, no pandas conversion."""
    small_ref = ray.put(small)
    join_type = _ARROW_JOIN_TYPE.get(how, how)

    def join(t: pa.Table) -> pa.Table:
        return t.join(ray.get(small_ref), keys=[on], join_type=join_type)

    return ds.map_batches(join, batch_format="pyarrow", zero_copy_batch=True)


def _join_partitions(requested: int | None) -> int:
    """Dataset.join spawns one hash-aggregator ACTOR per partition, each
    holding a 1-CPU slot — more partitions than cores deadlocks a small
    cluster and starves a big one. Default: half the cluster's cores
    (leaves the other half for read/map tasks); at scale pass an explicit
    value sized so one key-bucket of the bigger side fits an aggregator's
    heap (same rule as functions/_buckets.py)."""
    if requested is not None:
        return requested
    cpus = int(ray.cluster_resources().get("CPU", 8))
    return max(2, cpus // 2)


def semi_join(left, right, on: str, right_on: str | None = None,
              anti: bool = False, num_partitions: int | None = None):
    """Distributed semi/anti join of two LARGE datasets: Ray Data's
    hash-partitioned `Dataset.join` (left_semi / left_anti) — both sides
    shuffle into `num_partitions` key-hash buckets, no driver keyset. The
    right side pre-shrinks to per-batch unique keys (combiner) since only
    key existence matters; size num_partitions so one bucket of the LEFT
    side fits a worker (same rule as functions/_buckets.py).

    For a right side small enough to broadcast, the map-only
    broadcast_join/np.isin path in pipelines/queries.py is faster — this
    is the scale path two big tables need."""
    right_on = right_on or on

    def uniq(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table({right_on: pc.unique(t[right_on])})

    keys = right.map_batches(uniq, batch_format="pyarrow")
    return left.join(
        keys,
        "left_anti" if anti else "left_semi",
        _join_partitions(num_partitions),
        on=(on,),
        right_on=(right_on,),
    )


def large_join(left, right, on: str, right_on: str | None = None,
               num_partitions: int | None = None, join_type: str = "inner"):
    """Large-large equi-join via Ray Data's hash-partitioned Dataset.join.
    Project both sides to needed columns BEFORE calling (the shuffle moves
    every surviving column)."""
    return left.join(
        right,
        join_type,
        _join_partitions(num_partitions),
        on=(on,),
        right_on=((right_on or on),),
    )


def partial_agg(
    ds,
    keys: list[str],
    sums: dict[str, str] | None = None,
    counts: str | None = None,
    num_buckets: int = 64,
):
    """Combiner-style grouped aggregation: per-batch pandas groupby partials
    (one row per key per batch), then a shuffle of the partials into
    `num_buckets` coarse hash buckets and ONE vectorized pandas groupby-sum
    per bucket — never a Python call per key group, so millions of distinct
    keys cost the same task count as dozens. `sums` maps source column ->
    output name; `counts` names a count(*) output column."""
    sums = sums or {}
    out_cols = list(sums.values()) + ([counts] if counts else [])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        aggs = {out: (src, "sum") for src, out in sums.items()}
        if counts:
            df = df.assign(**{counts: 1})
            aggs[counts] = (counts, "sum")
        g = df.groupby(keys, as_index=False).agg(**aggs)
        grp = pd.util.hash_pandas_object(g[keys], index=False).to_numpy()
        g["_grp"] = (grp % num_buckets).astype("int32")
        return g

    def final(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.drop(columns=["_grp"])
            .groupby(keys, as_index=False)[out_cols]
            .sum()
        )

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("_grp")
        .map_groups(final, batch_format="pandas")
    )


def top_k(ds, by: str, k: int, tie_col: str | None = None, descending: bool = True):
    """Distributed top-k: per-batch partial top-k, then one final sort over
    the tiny union of partials (k rows per batch reach the driver-side
    reduce, never the full dataset)."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        cols = [by] + ([tie_col] if tie_col else [])
        asc = [not descending] + ([True] if tie_col else [])
        return df.sort_values(cols, ascending=asc, kind="stable").head(k)

    partials = ds.map_batches(partial, batch_format="pandas")
    cols = [by] + ([tie_col] if tie_col else [])
    desc = [descending] + ([False] if tie_col else [])
    return partials.sort(cols, descending=desc).limit(k)
