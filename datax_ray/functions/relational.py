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


def broadcast_join(ds, small: pa.Table, on: str, how: str = "inner"):
    """Join a Dataset against a SMALL table: the small side is ray.put once
    and merged per batch with pandas — no shuffle of the big side."""
    small_ref = ray.put(small.to_pandas())

    class Joiner:
        def __init__(self):
            self.small = ray.get(small_ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            return df.merge(self.small, on=on, how=how)

    return ds.map_batches(Joiner, batch_format="pandas", concurrency=(1, 8))


def partial_agg(
    ds,
    keys: list[str],
    sums: dict[str, str] | None = None,
    counts: str | None = None,
):
    """Combiner-style grouped aggregation: per-batch pandas groupby partials
    (one row per key per batch), then a small global groupby().aggregate()
    over the partials. `sums` maps source column -> output name; `counts`
    names a count(*) output column."""
    sums = sums or {}

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        aggs = {out: (src, "sum") for src, out in sums.items()}
        if counts:
            df = df.assign(**{counts: 1})
            aggs[counts] = (counts, "sum")
        return df.groupby(keys, as_index=False).agg(**aggs)

    from ray.data.aggregate import Sum

    final_aggs = [Sum(out, alias_name=out) for out in sums.values()]
    if counts:
        final_aggs.append(Sum(counts, alias_name=counts))
    return ds.map_batches(partial, batch_format="pandas").groupby(keys).aggregate(
        *final_aggs
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
