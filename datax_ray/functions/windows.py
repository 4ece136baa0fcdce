"""Stream-shaped operators over an ordered, keyed event log (Ray Data has
no native event-time windows; per the public Ray guidance these are
groupby(key).map_groups over ts-sorted groups — the ordering assumption is
per-key, imposed inside the group function itself).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def sessionize(
    ds,
    key_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str = "event_id",
    gap_us: int = 30 * 60 * 1_000_000,
    num_buckets: int = 64,
):
    """Assign session ids per key: a new session starts when the gap to the
    previous event exceeds `gap_us`. Returns (key, session_id, n_events,
    t_start, t_end) — one row per session.

    Sessionize shuffles the FULL event stream (each event must meet its
    key-neighbours), so `num_buckets` MUST scale with input size — one
    bucket is one map_groups group on one worker. Use
    functions._buckets.coarse_buckets(est_rows)."""

    from datax_ray.functions.relational import key_buckets

    def add_grp(t: pa.Table) -> pa.Table:
        return t.append_column("_grp", key_buckets(t, [key_col], num_buckets))

    def per_bucket(t: pa.Table) -> pa.Table:
        """One coarse bucket holds MANY keys; session assignment is fully
        vectorized across all of them (Arrow sort + numpy boundary masks):
        flag a new session at every key boundary or over-gap step, cumsum,
        then rebase the running id to start at 0 per key."""
        idx = pc.sort_indices(
            t,
            sort_keys=[(key_col, "ascending"), (ts_col, "ascending"),
                       (order_col, "ascending")],
        )
        t = t.take(idx)
        n = t.num_rows
        ts = pc.cast(t[ts_col], pa.int64()).to_numpy()
        uid = t[key_col].to_numpy(zero_copy_only=False)
        new = np.ones(n, dtype=np.int64)
        if n > 1:
            same = uid[1:] == uid[:-1]
            new[1:] = (~same) | ((ts[1:] - ts[:-1]) > gap_us)
        gsid = np.cumsum(new) - 1
        starts = np.flatnonzero(np.r_[True, uid[1:] != uid[:-1]] if n else [])
        counts = np.diff(np.r_[starts, n])
        offset = np.repeat(gsid[starts], counts) if n else gsid
        sess = t.select([key_col, ts_col]).append_column(
            "session_id", pa.array(gsid - offset, pa.int64())
        )
        g = sess.group_by([key_col, "session_id"], use_threads=False).aggregate(
            [([], "count_all"), (ts_col, "min"), (ts_col, "max")]
        )
        return g.rename_columns(
            [key_col, "session_id", "n_events", "t_start", "t_end"]
        )

    return (
        ds.map_batches(add_grp, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_grp")
        .map_groups(per_bucket, batch_format="pyarrow")
    )


def rolling_window_counts(
    ds,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    window_us: int = 3_600_000_000,
    num_buckets: int = 64,
):
    """Range join / sliding count: for each row, how many rows of the SAME
    key fall in the half-open time window (ts - window, ts]. The classic
    burst-detection primitive; SQL expresses it as an inequality self-join.

    Shape: coarse key-hash buckets (all rows of a key co-locate), then ONE
    searchsorted over a segment-offset timeline per bucket — no per-key
    Python or Cython group loop, no O(n²) pair materialization: each key
    segment is shifted onto its own disjoint span of a single monotone
    axis, so one global binary search respects every key boundary at
    once."""
    from datax_ray.functions.relational import key_buckets

    def add_grp(t: pa.Table) -> pa.Table:
        return t.append_column("_grp", key_buckets(t, [key_col], num_buckets))

    def per_bucket(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            t,
            sort_keys=[(key_col, "ascending"), (ts_col, "ascending"),
                       (id_col, "ascending")],
        )
        t = t.take(idx)
        n = t.num_rows
        ts = pc.cast(t[ts_col], pa.int64()).to_numpy()
        uid = t[key_col].to_numpy(zero_copy_only=False)
        if n == 0:
            return pa.table(
                {id_col: t[id_col], "n_win": pa.array([], pa.int64())}
            )
        seg = np.zeros(n, dtype=np.int64)
        if n > 1:
            seg[1:] = np.cumsum(uid[1:] != uid[:-1])
        span = np.int64(ts.max() - ts.min() + window_us + 1)
        adj = (ts - ts.min()) + seg * span
        # half-open (ts - window, ts]: first in-window position per row
        lo = np.searchsorted(adj, adj - window_us, side="right")
        counts = np.arange(n, dtype=np.int64) - lo + 1
        return pa.table({id_col: t[id_col], "n_win": pa.array(counts)})

    return (
        ds.map_batches(add_grp, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_grp")
        .map_groups(per_bucket, batch_format="pyarrow")
    )


def tumbling_window_counts(
    ds,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    window_us: int = 3_600_000_000,
):
    """Tumbling-window aggregate per key: (key, window_start, n_events,
    sum_value). Pre-aggregated inside map_batches (combiner), then a small
    groupby over the per-batch partials — the shuffle moves one row per
    (key, window, batch) instead of every event."""

    from datax_ray.functions.relational import partial_agg

    def prep(t: pa.Table) -> pa.Table:
        ts = pc.cast(t[ts_col], pa.int64())
        win = pc.multiply(pc.divide(ts, window_us), window_us)
        return pa.table(
            {key_col: t[key_col], "window_start": win, "sum_value": t[value_col]}
        )

    out = partial_agg(
        ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True),
        keys=[key_col, "window_start"],
        sums={"sum_value": "sum_value"},
        counts="n_events",
    )

    # restore timestamp type for the window edge
    def to_ts(t: pa.Table) -> pa.Table:
        i = t.schema.get_field_index("window_start")
        return t.set_column(
            i, "window_start", pc.cast(t["window_start"], pa.timestamp("us"))
        )

    return out.map_batches(to_ts, batch_format="pyarrow")


def hopping_window_counts(
    ds,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    window_us: int = 3_600_000_000,
    hop_us: int = 1_800_000_000,
):
    """Hopping (sliding) window aggregate: each event lands in
    window_us/hop_us overlapping windows. The replication happens inside
    map_batches (numpy repeat — no flat_map row path), then the same
    coarse-bucket partial aggregation as tumbling windows."""
    assert window_us % hop_us == 0, "window must be a multiple of hop"
    k = window_us // hop_us

    from datax_ray.functions.relational import partial_agg

    def explode(t: pa.Table) -> pa.Table:
        import numpy as np

        ts = pc.cast(t[ts_col], pa.int64()).to_numpy()
        n = len(ts)
        # latest hop-aligned window containing ts, then k-1 earlier ones
        w0 = (ts // hop_us) * hop_us
        starts = np.repeat(w0, k) - np.tile(
            np.arange(k, dtype=np.int64) * hop_us, n
        )
        idx = np.repeat(np.arange(n), k)
        keep = starts + window_us > np.repeat(ts, k)  # always true; guard
        return pa.table(
            {
                key_col: pa.array(
                    t[key_col].to_numpy(zero_copy_only=False)[idx[keep]]
                ),
                "window_start": pa.array(starts[keep], pa.int64()),
                "sum_value": pa.array(
                    t[value_col].to_numpy(zero_copy_only=False)[idx[keep]]
                ),
            }
        )

    out = partial_agg(
        ds.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True),
        keys=[key_col, "window_start"],
        sums={"sum_value": "sum_value"},
        counts="n_events",
    )

    def to_ts(t: pa.Table) -> pa.Table:
        i = t.schema.get_field_index("window_start")
        return t.set_column(
            i, "window_start", pc.cast(t["window_start"], pa.timestamp("us"))
        )

    return out.map_batches(to_ts, batch_format="pyarrow")
