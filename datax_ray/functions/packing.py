"""Sequence packing for LLM training: assign variable-length documents to
fixed-token-budget training sequences (bins) with minimal padding waste.

Greedy first-fit-decreasing (FFD) inside coarse hash buckets: docs
hash-route to a bucket, each bucket packs its own docs independently with a
vectorized-sort + O(n) bin scan, and bin ids are globalized as
(bucket << 32) | local_bin. Packing quality is within a constant of global
FFD (each bucket sees an iid sample of the length distribution) while the
work stays embarrassingly parallel — the global-FFD alternative is a
single-node sort of every doc, which cannot scale.

Deterministic: routing is a stable hash of the id, packing order is
(length desc, id asc) — same input ⇒ same bins on any cluster. No DataX
counterpart; training-data uplift (SURVEY.md §2B spirit).
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def pack_sequences(
    ds,
    id_col: str = "doc_id",
    len_col: str = "n_tokens",
    budget: int = 2048,
    num_buckets: int = 64,
):
    """Returns (id_col, len_col, bin_id, bin_fill): every input doc exactly
    once, per-bin token sums <= budget (docs longer than the budget get a
    singleton bin — callers chunk first, see doc_chunks). bin_fill is the
    packed token total of the doc's bin."""

    def add_grp(df: pd.DataFrame) -> pd.DataFrame:
        ids = df[id_col].to_numpy().astype(np.uint64)
        df["_grp"] = ((ids * np.uint64(2654435761)) % num_buckets).astype("int32")
        return df

    def pack(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([len_col, id_col], ascending=[False, True], kind="stable")
        lens = df[len_col].to_numpy().astype(np.int64)
        grp = int(df["_grp"].iloc[0])
        n = len(df)
        bin_of = np.empty(n, dtype=np.int64)
        fills: list[int] = []
        # first-fit over open bins; lengths arrive descending so bins close
        # quickly and the open list stays short
        open_bins: list[int] = []  # bin index -> current fill (parallel to fills)
        for i in range(n):
            ln = int(lens[i])
            placed = -1
            for b in open_bins:
                if fills[b] + ln <= budget:
                    placed = b
                    break
            if placed < 0:
                placed = len(fills)
                fills.append(0)
                open_bins.append(placed)
            fills[placed] += ln
            bin_of[i] = placed
            if budget - fills[placed] < int(lens[-1]):  # can't fit even the smallest
                open_bins.remove(placed)
        out = pd.DataFrame(
            {
                id_col: df[id_col].to_numpy(),
                len_col: lens,
                "bin_id": (np.int64(grp) << 32) | bin_of,
                "bin_fill": np.asarray(fills, dtype=np.int64)[bin_of],
            }
        )
        return out

    return (
        ds.map_batches(add_grp, batch_format="pandas")
        .groupby("_grp")
        .map_groups(pack, batch_format="pandas")
    )
