"""Per-key ordered-window operators: SQL window functions (row_number,
lag, running aggregates) and SCD Type-2 history derivation over a change
stream. Ray Data has no window functions; these compose from the same
coarse-bucket shape as functions/windows.py — hash-bucket by key (ALL rows
of a key co-locate; bucket count scales via functions/_buckets.py), then
ONE vectorized pandas pass per bucket (sort + key-boundary masks + cumsum),
never a Python call per key.

No reference counterpart (DataX has no relational algebra, SURVEY.md §2A
bottom row); these belong to the uplift surface.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def _add_bucket(df: pd.DataFrame, key_cols: list[str], num_buckets: int) -> pd.DataFrame:
    grp = pd.util.hash_pandas_object(df[key_cols[0]], index=False).to_numpy()
    df["_grp"] = (grp % num_buckets).astype("int32")
    return df


def keyed_window(
    ds,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value_micros",
    num_buckets: int = 64,
):
    """Classic per-key window-function triple over an ordered stream:
    row_number `rn`, microsecond gap to the previous row `gap_us` (-1 for
    the first row of a key, mirroring COALESCE(lag-diff, -1)), and running
    sum `run_value` — all ordered by (ts, id) within key.

    One bucket = one map_groups group = one worker's working set, so
    `num_buckets` must scale with input (functions/_buckets.py)."""

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key_col, ts_col, id_col], kind="stable")
        n = len(df)
        key = df[key_col].to_numpy()
        ts = df[ts_col].astype("int64").to_numpy()
        val = df[value_col].to_numpy()
        first = np.ones(n, dtype=bool)
        if n > 1:
            first[1:] = key[1:] != key[:-1]
        # row_number: global cumcount rebased to 0 at each key start
        idx = np.arange(n, dtype=np.int64)
        starts = idx[first]
        counts = np.diff(np.r_[starts, n])
        rn = idx - np.repeat(starts, counts) + 1
        gap = np.empty(n, dtype=np.int64)
        gap[0] = -1
        if n > 1:
            gap[1:] = ts[1:] - ts[:-1]
        gap[first] = -1
        # running sum rebased per key: cumsum minus the cumsum just before
        # each key's first row
        csum = np.cumsum(val)
        base = np.where(starts > 0, csum[starts - 1], 0)
        run = csum - np.repeat(base, counts)
        return pd.DataFrame(
            {
                id_col: df[id_col].to_numpy(),
                key_col: key,
                "rn": rn,
                "gap_us": gap,
                "run_value": run,
            }
        )

    return (
        ds.map_batches(
            lambda df: _add_bucket(df, [key_col], num_buckets), batch_format="pandas"
        )
        .groupby("_grp")
        .map_groups(per_bucket, batch_format="pandas")
    )


def scd2_history(
    changes_ds,
    key_cols: tuple[str, str] = ("conv_id", "turn_idx"),
    ts_col: str = "ts",
    lsn_col: str = "lsn",
    op_col: str = "op",
    payload_cols: tuple[str, ...] = ("role", "text"),
    num_buckets: int = 64,
):
    """Slowly-changing-dimension Type-2 history from a CDC change stream:
    every non-delete event becomes one VERSION row valid over
    [valid_from=ts, valid_to=next event's ts) within its key; the last
    version of a key is open (valid_to NULL) and flagged is_current —
    unless a trailing delete closed it. `version` numbers every event of
    the key (deletes included) in (ts, lsn) order, matching the SQL
    row_number() the oracle uses.

    The warehouse-history twin of the engine's LWW merge: same change
    stream, but KEEPING every superseded version instead of folding to the
    latest. Buckets by hash(key_cols[0]) so a conversation's full history
    co-locates; vectorized within the bucket."""
    k0, k1 = key_cols

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([k0, k1, ts_col, lsn_col], kind="stable")
        n = len(df)
        same_key = np.zeros(n, dtype=bool)
        if n > 1:
            same_key[:-1] = (
                (df[k0].to_numpy()[1:] == df[k0].to_numpy()[:-1])
                & (df[k1].to_numpy()[1:] == df[k1].to_numpy()[:-1])
            )
        first = np.ones(n, dtype=bool)
        first[1:] = ~same_key[:-1]
        idx = np.arange(n, dtype=np.int64)
        starts = idx[first]
        counts = np.diff(np.r_[starts, n])
        version = idx - np.repeat(starts, counts) + 1
        ts = df[ts_col].to_numpy()
        valid_to = np.full(n, np.datetime64("NaT"), dtype=ts.dtype)
        if n > 1:
            valid_to[:-1] = np.where(same_key[:-1], ts[1:], valid_to[:-1])
        out = pd.DataFrame(
            {
                k0: df[k0].to_numpy(),
                k1: df[k1].to_numpy(),
                "version": version,
                **{c: df[c].to_numpy() for c in payload_cols},
                "valid_from": ts,
                "valid_to": valid_to,
            }
        )
        keep = (df[op_col] != "delete").to_numpy()
        out = out[keep]
        out["is_current"] = out["valid_to"].isna()
        return out

    return (
        changes_ds.map_batches(
            lambda df: _add_bucket(df, [k0], num_buckets), batch_format="pandas"
        )
        .groupby("_grp")
        .map_groups(per_bucket, batch_format="pandas")
    )
