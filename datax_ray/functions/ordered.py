"""Per-key ordered-window operators: SQL window functions (row_number,
lag, running aggregates) and SCD Type-2 history derivation over a change
stream. Ray Data has no window functions; these compose from the same
coarse-bucket shape as functions/windows.py — hash-bucket by key (ALL rows
of a key co-locate; bucket count scales via functions/_buckets.py), then
ONE vectorized pass per bucket (Arrow sort + key-boundary masks + cumsum),
never a Python call per key. Arrow end to end: blocks stay zero-copy
through the shuffle, and every emitted block carries its schema.

No reference counterpart (DataX has no relational algebra, SURVEY.md §2A
bottom row); these belong to the uplift surface.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


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
        key = t[key_col].to_numpy(zero_copy_only=False)
        ts = pc.cast(t[ts_col], pa.int64()).to_numpy()
        val = t[value_col].to_numpy(zero_copy_only=False)
        first = np.ones(n, dtype=bool)
        if n > 1:
            first[1:] = key[1:] != key[:-1]
        # row_number: global cumcount rebased to 0 at each key start
        idx_n = np.arange(n, dtype=np.int64)
        starts = idx_n[first]
        counts = np.diff(np.r_[starts, n])
        rn = idx_n - np.repeat(starts, counts) + 1
        gap = np.empty(n, dtype=np.int64)
        if n:
            gap[0] = -1
        if n > 1:
            gap[1:] = ts[1:] - ts[:-1]
        gap[first] = -1
        # running sum rebased per key: cumsum minus the cumsum just before
        # each key's first row
        csum = np.cumsum(val)
        base = np.where(starts > 0, csum[starts - 1], 0)
        run = csum - np.repeat(base, counts)
        return pa.table(
            {
                id_col: t[id_col],
                key_col: t[key_col],
                "rn": pa.array(rn),
                "gap_us": pa.array(gap),
                "run_value": pa.array(run.astype(np.int64)),
            }
        )

    return (
        ds.map_batches(add_grp, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_grp")
        .map_groups(per_bucket, batch_format="pyarrow")
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
    from datax_ray.functions.relational import key_buckets

    k0, k1 = key_cols

    def add_grp(t: pa.Table) -> pa.Table:
        return t.append_column("_grp", key_buckets(t, [k0], num_buckets))

    def per_bucket(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            t,
            sort_keys=[(k0, "ascending"), (k1, "ascending"),
                       (ts_col, "ascending"), (lsn_col, "ascending")],
        )
        t = t.take(idx)
        n = t.num_rows
        a0 = t[k0].to_numpy(zero_copy_only=False)
        a1 = t[k1].to_numpy(zero_copy_only=False)
        same_key = np.zeros(n, dtype=bool)
        if n > 1:
            same_key[:-1] = (a0[1:] == a0[:-1]) & (a1[1:] == a1[:-1])
        first = np.ones(n, dtype=bool)
        if n > 1:
            first[1:] = ~same_key[:-1]
        idx_n = np.arange(n, dtype=np.int64)
        starts = idx_n[first]
        counts = np.diff(np.r_[starts, n])
        version = idx_n - np.repeat(starts, counts) + 1
        ts_type = t[ts_col].type
        ts_i64 = pc.cast(t[ts_col], pa.int64()).to_numpy()
        valid_to = np.zeros(n, dtype=np.int64)
        has_next = np.zeros(n, dtype=bool)
        if n > 1:
            has_next[:-1] = same_key[:-1]
            valid_to[:-1] = np.where(same_key[:-1], ts_i64[1:], 0)
        keep = pc.not_equal(t[op_col], "delete")
        keep_np = keep.to_numpy(zero_copy_only=False)
        out = pa.table(
            {
                k0: t[k0].filter(keep),
                k1: t[k1].filter(keep),
                "version": pa.array(version[keep_np]),
                **{c: t[c].filter(keep) for c in payload_cols},
                "valid_from": t[ts_col].filter(keep),
                "valid_to": pc.cast(
                    pa.array(valid_to[keep_np], mask=~has_next[keep_np]),
                    ts_type,
                ),
                "is_current": pa.array(~has_next[keep_np]),
            }
        )
        return out

    return (
        changes_ds.map_batches(add_grp, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_grp")
        .map_groups(per_bucket, batch_format="pyarrow")
    )


def sweep_peak(
    points_ds,
    key_col: str,
    ts_col: str,
    delta_col: str,
    bucket_us: int = 3_600_000_000,
    out_col: str = "peak",
):
    """Interval sweep-line: peak running sum of +1/-1 (or weighted) deltas
    per key, ordered by (ts, delta) — i.e. max concurrent intervals under
    [start, end) semantics (an end at ts frees its slot before a start at
    the same ts occupies one). The classic single-machine algorithm is a
    global sort + cumulative scan; that serializes on one node, so this is
    the DISTRIBUTED two-level scan:

      1. each point maps to a (key, time-bucket) cell — bucket boundaries
         are data-independent (fixed-width epoch buckets), so assignment
         is a stateless vectorized map;
      2. one exchange co-locates each cell; the cell sorts ITS points,
         scans locally, and emits ONE row (key, bucket, total, local_max)
         — O(cells) rows survive, whatever the input size;
      3. a final per-key fold (keys × buckets rows, tiny) sorts the cell
         rows, prefix-sums the totals into per-cell offsets, and the peak
         is max(offset + local_max).

    The multiset of global prefix values is invariant to the order of
    equal (ts, delta) points, so the result is deterministic under any
    block layout. No driver state, no global sort, two exchanges of which
    the second moves O(keys × buckets) rows."""
    from datax_ray.functions.relational import key_buckets

    _CELL = pa.schema(
        [
            (key_col, pa.string()),
            ("bucket", pa.int64()),
            ("total", pa.int64()),
            ("local_max", pa.int64()),
        ]
    )

    def to_cells(t: pa.Table) -> pa.Table:
        ts = pc.cast(t[ts_col], pa.int64())
        b = pc.divide(ts, bucket_us)
        out = pa.table(
            {
                key_col: pc.cast(t[key_col], pa.string()),
                "bucket": pc.cast(b, pa.int64()),
                "ts": ts,
                "delta": pc.cast(t[delta_col], pa.int64()),
            }
        )
        return out.append_column(
            "_grp", key_buckets(out, [key_col, "bucket"], 1 << 30)
        )

    def scan_cell(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["_grp"])
        if g.num_rows == 0:
            return _CELL.empty_table()
        # a _grp collision can hold several (key, bucket) cells: scan each
        out = []
        g = g.sort_by(
            [(key_col, "ascending"), ("bucket", "ascending"),
             ("ts", "ascending"), ("delta", "ascending")]
        )
        keys = g[key_col].to_numpy(zero_copy_only=False)
        buckets = g["bucket"].to_numpy(zero_copy_only=False)
        deltas = g["delta"].to_numpy(zero_copy_only=False).astype(np.int64)
        cell_change = np.ones(len(keys), dtype=bool)
        cell_change[1:] = (keys[1:] != keys[:-1]) | (buckets[1:] != buckets[:-1])
        starts = np.flatnonzero(cell_change)
        ends = np.append(starts[1:], len(keys))
        run = np.cumsum(deltas)
        base = np.repeat(np.where(starts > 0, run[starts - 1], 0), ends - starts)
        local = run - base  # per-cell cumulative sum
        seg_max = np.maximum.reduceat(local, starts)
        seg_tot = local[ends - 1]
        return pa.table(
            {
                key_col: pa.array(keys[starts], pa.string()),
                "bucket": pa.array(buckets[starts], pa.int64()),
                "total": pa.array(seg_tot, pa.int64()),
                "local_max": pa.array(seg_max, pa.int64()),
            }
        )

    def fold_key(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.schema([(key_col, pa.string()), (out_col, pa.int64())]).empty_table()
        g = g.sort_by([(key_col, "ascending"), ("bucket", "ascending")])
        keys = g[key_col].to_numpy(zero_copy_only=False)
        tot = g["total"].to_numpy(zero_copy_only=False).astype(np.int64)
        lmax = g["local_max"].to_numpy(zero_copy_only=False).astype(np.int64)
        change = np.ones(len(keys), dtype=bool)
        change[1:] = keys[1:] != keys[:-1]
        starts = np.flatnonzero(change)
        run = np.cumsum(tot)
        base = np.repeat(np.where(starts > 0, run[starts - 1], 0),
                         np.append(starts[1:], len(keys)) - starts)
        offset = run - base - tot  # prefix of EARLIER cells within the key
        peak = np.maximum.reduceat(offset + lmax, starts)
        return pa.table(
            {
                key_col: pa.array(keys[starts], pa.string()),
                out_col: pa.array(peak, pa.int64()),
            }
        )

    return (
        points_ds.map_batches(to_cells, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_grp")
        .map_groups(scan_cell, batch_format="pyarrow")
        .groupby(key_col)
        .map_groups(fold_key, batch_format="pyarrow")
    )
