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


def asof_join(
    left,
    right,
    key: str,
    left_ts: str,
    right_ts: str,
    num_buckets: int = 64,
):
    """AS-OF join (inner, direction=backward): each left row matches the
    right row with the same `key` and the greatest `right_ts` <= `left_ts`.

    Ray Data has no asof operator; per the brief this composes from
    primitives: both sides hash-bucket by key (coarse buckets — many keys
    per bucket, scale via functions/_buckets.py), then ONE vectorized
    pd.merge_asof per bucket over the co-located rows. Right-side rows are
    assumed unique per (key, right_ts) — pre-aggregate otherwise, or the
    match among ties is undefined (same caveat as SQL ASOF JOIN)."""

    l_cols = list(left.schema().names)
    r_cols = list(right.schema().names)
    all_cols = l_cols + [c for c in r_cols if c not in l_cols]
    out_cols = l_cols + [c for c in r_cols if c not in l_cols]

    def tag(side: int, have: list[str]):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            out = pd.DataFrame({c: (df[c] if c in have else pd.NA) for c in all_cols})
            out["_side"] = np.int8(side)
            out["_jb"] = (
                pd.util.hash_array(df[key].to_numpy(), categorize=False)
                % num_buckets
            ).astype("int32")
            return out

        fn.__name__ = f"asof_tag_{side}"
        return fn

    l_tagged = left.map_batches(tag(0, l_cols), batch_format="pandas")
    r_tagged = right.map_batches(tag(1, r_cols), batch_format="pandas")
    both = l_tagged.union(r_tagged)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        lf = g[g["_side"] == 0][l_cols]
        rf = g[g["_side"] == 1][r_cols]
        if lf.empty or rf.empty:
            return pd.DataFrame(columns=out_cols)
        lf = lf.sort_values(left_ts, kind="stable")
        rf = rf.sort_values(right_ts, kind="stable")
        out = pd.merge_asof(
            lf, rf, left_on=left_ts, right_on=right_ts, by=key,
            direction="backward",
        )
        return out.dropna(subset=[right_ts])[out_cols]  # inner semantics

    return both.groupby("_jb").map_groups(merge, batch_format="pandas")


def partial_agg(
    ds,
    keys: list[str],
    sums: dict[str, str] | None = None,
    counts: str | None = None,
    maxs: dict[str, str] | None = None,
    num_buckets: int = 64,
    single_reduce: bool = False,
):
    """Combiner-style grouped aggregation: per-batch pandas groupby partials
    (one row per key per batch), then a shuffle of the partials into
    `num_buckets` coarse hash buckets and ONE vectorized pandas groupby
    per bucket — never a Python call per key group, so millions of distinct
    keys cost the same task count as dozens. `sums`/`maxs` map source
    column -> output name; `counts` names a count(*) output column (both
    decomposable aggregates, so partial-of-partial is exact).

    single_reduce=True folds the partials in ONE task instead of a
    key-shuffle — pick it when the caller KNOWS the key space is small
    (e.g. a handful of status/flag combinations): a shuffle execution
    costs a fixed multi-second constant that dwarfs a tiny reduce."""
    sums = sums or {}
    maxs = maxs or {}
    out_cols = list(sums.values()) + ([counts] if counts else []) + list(maxs.values())

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        aggs = {out: (src, "sum") for src, out in sums.items()}
        aggs.update({out: (src, "max") for src, out in maxs.items()})
        if counts:
            df = df.assign(**{counts: 1})
            aggs[counts] = (counts, "sum")
        g = df.groupby(keys, as_index=False).agg(**aggs)
        grp = pd.util.hash_pandas_object(g[keys], index=False).to_numpy()
        g["_grp"] = (grp % num_buckets).astype("int32")
        return g

    def final(df: pd.DataFrame) -> pd.DataFrame:
        aggs = {c: (c, "sum") for c in out_cols if c not in maxs.values()}
        aggs.update({c: (c, "max") for c in maxs.values()})
        return (
            df.drop(columns=["_grp"])
            .groupby(keys, as_index=False)
            .agg(**aggs)
        )

    partials = ds.map_batches(partial, batch_format="pandas")
    if single_reduce:
        return partials.repartition(1).map_batches(
            final, batch_format="pandas", batch_size=None
        )
    return partials.groupby("_grp").map_groups(final, batch_format="pandas")


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


def top_n_per_key(
    ds,
    keys: list[str],
    order_cols: list[str],
    n: int,
    num_buckets: int = 64,
    descending: bool = True,
):
    """Grouped top-N (row_number() <= N per key): per-batch combiner keeps
    at most N rows per key (vectorized sort + groupby-head — no Python per
    group), so only N·distinct-keys-per-batch rows shuffle; then the same
    head-N per key inside each coarse key-hash bucket. The generalization
    of the LWW arg-max (N=1, queries.py:latest_order_per_customer) to any
    N — same combiner-bounded shuffle shape."""
    asc = [True] * len(keys) + [not descending] * len(order_cols)
    sort_cols = keys + order_cols

    def head_n(df: pd.DataFrame) -> pd.DataFrame:
        out = (
            df.sort_values(sort_cols, ascending=asc, kind="stable")
            .groupby(keys, as_index=False, sort=False)
            .head(n)
        )
        grp = pd.util.hash_pandas_object(out[keys], index=False).to_numpy()
        return out.assign(_grp=(grp % num_buckets).astype("int32"))

    def final(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.drop(columns=["_grp"])
            .sort_values(sort_cols, ascending=asc, kind="stable")
            .groupby(keys, as_index=False, sort=False)
            .head(n)
        )

    return (
        ds.map_batches(head_n, batch_format="pandas")
        .groupby("_grp")
        .map_groups(final, batch_format="pandas")
    )
