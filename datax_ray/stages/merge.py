"""LWW merge kernels: last-writer-wins upsert per (conv_id, turn_idx)
(SURVEY.md §2B-B4; the Ray-native descendant of DataX otswriter's
per-record PutRow/UpdateRow/DeleteRow apply, §2A row 9). The pipeline
stages that call these live in stages/delta.py.

`lww_reduce` is the vectorized core: sort by (key..., order...) and keep
the last row per key — no Python row loop; key-change detection is a numpy
adjacent-compare over dictionary codes. `apply_events` turns a batch of
CDC events into lake-state rows (tombstones kept as _deleted rows);
`merge_states` LWW-merges any set of lake-state tables (bases +
fragments).

LWW under max(ts, lsn) is associative and commutative: the winner per key
is the same whether applied event-by-event (the sequential oracle), batch
-by-batch (fragments), or merged once across base+fragments (the read
path / compaction) — so all views agree row-for-row. Tombstones must
OUTLIVE compaction: a late event (lsn above the watermark) may still carry
an older ts, and only the stored tombstone's (ts, _lsn) can defeat it.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from datax_ray.schemas import LSN_COL


def _key_codes(col: pa.ChunkedArray) -> np.ndarray:
    col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
        return pc.dictionary_encode(col).indices.to_numpy(zero_copy_only=False)
    if pa.types.is_timestamp(col.type):
        return col.cast(pa.int64()).to_numpy(zero_copy_only=False)
    return col.to_numpy(zero_copy_only=False)


def lww_reduce(
    t: pa.Table,
    key_cols: tuple[str, ...] = ("conv_id", "turn_idx"),
    order_cols: tuple[str, ...] = ("ts", "lsn"),
) -> pa.Table:
    """Keep the winning row (max over order_cols) per key_cols group.

    Vectorized: one multi-column sort, then numpy adjacent-compare over key
    codes to pick the last row of each run — no per-row Python.

    The payload is gathered ONCE: winner detection runs on sort INDICES +
    key codes only (ints), and the single `take` at the end moves only the
    winning rows' bytes. The naive sort-whole-table-then-filter shape
    moves every payload byte twice (full gather + winner copy) — measured
    ~20% slower on a 262k-row low-dup batch, and the saved memcpy is DRAM
    bandwidth, the scaling-limiting resource at full-node concurrency
    (BASELINE.md's membw analysis)."""
    if t.num_rows <= 1:
        return t
    sort_keys = [(c, "ascending") for c in (*key_cols, *order_cols)]
    idx = pc.sort_indices(t, sort_keys=sort_keys).to_numpy(
        zero_copy_only=False
    )
    neq = None
    for c in key_cols:
        arr = _key_codes(t[c])[idx]
        d = arr[:-1] != arr[1:]
        neq = d if neq is None else (neq | d)
    last = np.empty(len(idx), dtype=bool)
    last[:-1] = neq
    last[-1] = True
    return t.take(pa.array(idx[last]))


def apply_events(
    base: pa.Table | None,
    events: pa.Table,
    lake_schema: pa.Schema,
    key_cols: tuple[str, ...] = ("conv_id", "turn_idx"),
) -> pa.Table:
    """Merge one partition's base state with its new events; returns the new
    partition state in `lake_schema`, sorted by `key_cols` (lww_reduce's
    sort already leaves rows key-ordered — no extra sort pass).

    Callers that need the output grouped by a leading column (e.g. the
    fragment writer grouping by part_id) prepend it to `key_cols`: since
    (conv_id, turn_idx) determines part_id, the grouping is unchanged and
    the single sort does double duty.

    Delete-winners are KEPT as tombstone rows (_deleted=True, payload as the
    event carried it — null) so that a late, stale event arriving in a later
    epoch loses the LWW race against the tombstone instead of resurrecting
    the row."""
    from datax_ray.schemas import DELETED_COL, INTERNAL_COLS

    payload = [f.name for f in lake_schema if f.name not in INTERNAL_COLS]

    def unify(t: pa.Table, op_col, lsn_col) -> pa.Table:
        cols = {"op": op_col, "lsn": lsn_col}
        for name in payload:
            want = lake_schema.field(name).type
            if t.schema.get_field_index(name) == -1:
                cols[name] = pa.nulls(t.num_rows, want)
            else:
                c = t[name]
                cols[name] = pc.cast(c, want) if c.type != want else c
        return pa.table(cols)

    parts = []
    if base is not None and base.num_rows:
        base_op = pc.if_else(
            pc.fill_null(base[DELETED_COL], False),
            pa.scalar("delete", pa.string()),
            pa.scalar("base", pa.string()),
        )
        parts.append(unify(base, base_op, pc.cast(base[LSN_COL], pa.int64())))
    if events.num_rows:
        parts.append(unify(events, events["op"], events["lsn"]))
    if not parts:
        return lake_schema.empty_table()
    merged = lww_reduce(pa.concat_tables(parts), key_cols=key_cols)
    cols = {name: merged[name] for name in payload}
    cols[LSN_COL] = merged["lsn"]
    cols[DELETED_COL] = pc.equal(merged["op"], "delete")
    return pa.table(cols, schema=lake_schema)


def unify_to_schema(t: pa.Table, lake_schema: pa.Schema) -> pa.Table:
    """Project a (possibly pre-DDL historical) lake-schema table onto the
    current schema: null-fill added columns, widen-cast evolved ones."""
    cols = {}
    for f in lake_schema:
        if t.schema.get_field_index(f.name) == -1:
            cols[f.name] = pa.nulls(t.num_rows, f.type)
        else:
            c = t[f.name]
            cols[f.name] = pc.cast(c, f.type) if c.type != f.type else c
    return pa.table(cols, schema=lake_schema)


def merge_states(
    tables: list[pa.Table],
    lake_schema: pa.Schema,
    key_cols: tuple[str, ...] = ("conv_id", "turn_idx"),
) -> pa.Table:
    """LWW-merge lake-state tables (a base + any number of fragments, any
    order): winner per key is max (ts, _lsn); tombstone rows (_deleted)
    are kept. Output is sorted by `key_cols` (courtesy of lww_reduce's
    sort) — deterministic."""
    parts = [unify_to_schema(t, lake_schema) for t in tables if t.num_rows]
    if not parts:
        return lake_schema.empty_table()
    return lww_reduce(
        pa.concat_tables(parts), key_cols=key_cols, order_cols=("ts", LSN_COL)
    )
