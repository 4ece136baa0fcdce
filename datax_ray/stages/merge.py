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
    from datax_ray.schemas import (
        DELETED_COL,
        INTERNAL_COLS,
        renames_of,
        resolve_source_name,
    )

    payload = [f.name for f in lake_schema if f.name not in INTERNAL_COLS]
    renames = renames_of(lake_schema)

    def unify(t: pa.Table, op_col, lsn_col) -> pa.Table:
        cols = {"op": op_col, "lsn": lsn_col}
        for name in payload:
            want = lake_schema.field(name).type
            src = resolve_source_name(t.schema, name, renames)
            if src is None:
                cols[name] = pa.nulls(t.num_rows, want)
            else:
                c = t[src]
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
    current schema: null-fill added columns, widen-cast evolved ones, remap
    renamed ones via the schema's rename metadata."""
    from datax_ray.schemas import renames_of, resolve_source_name

    renames = renames_of(lake_schema)
    cols = {}
    for f in lake_schema:
        src = resolve_source_name(t.schema, f.name, renames)
        if src is None:
            cols[f.name] = pa.nulls(t.num_rows, f.type)
        else:
            c = t[src]
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


# ----------------------------------------------------------- patch merge --

# Column-level LWW for sparse/partial-update ("patch") change events —
# Debezium partial payloads / Hudi PartialUpdateAvroPayload semantics: an
# event SETS only the columns it carries (non-null); every other column
# keeps its previous value. Final state per key is, per column, the value
# from the highest-lsn event that set it. A per-column LWW register is
# associative and commutative, so the SAME reduce runs as within-batch
# combiner, per-bucket reducer and final fold — partials (one row per key
# per batch, with per-column winner lsns) are all that ever shuffles.

PATCH_LSN_PREFIX = "_plsn_"


def to_patch_partials(
    t: pa.Table,
    payload_cols: tuple[str, ...],
    key_cols: tuple[str, ...] = ("conv_id", "turn_idx"),
    lsn_col: str = "lsn",
) -> pa.Table:
    """Raw patch events -> partial form: each payload column c gains a
    parallel int64 `_plsn_c` = lsn where the event SET c (value non-null),
    null where the event did not touch c. Null-as-not-set is the patch
    contract; an explicit SET-to-null needs a full update event (the row
    LWW path), exactly as in Debezium's partial-payload encoding."""
    cols: dict = {k: t[k] for k in key_cols}
    lsn = pc.cast(t[lsn_col], pa.int64())
    nulls = pa.nulls(t.num_rows, pa.int64())
    for c in payload_cols:
        cols[c] = t[c]
        cols[PATCH_LSN_PREFIX + c] = pc.if_else(pc.is_valid(t[c]), lsn, nulls)
    return pa.table(cols)


def reduce_patch_partials(
    t: pa.Table,
    payload_cols: tuple[str, ...],
    key_cols: tuple[str, ...] = ("conv_id", "turn_idx"),
) -> pa.Table:
    """Column-level LWW reduce of patch partials: per key, per payload
    column, keep the value whose `_plsn_` is highest among rows that set
    it. Vectorized like lww_reduce: ONE key sort + numpy adjacent-compare
    for group boundaries, then one integer lexsort per payload column to
    find its per-group winner — values gather once, no per-row Python."""
    if t.num_rows <= 1:
        return t
    idx = pc.sort_indices(
        t, sort_keys=[(c, "ascending") for c in key_cols]
    ).to_numpy(zero_copy_only=False)
    neq = None
    for c in key_cols:
        arr = _key_codes(t[c])[idx]
        d = arr[:-1] != arr[1:]
        neq = d if neq is None else (neq | d)
    gid = np.zeros(len(idx), dtype=np.int64)
    gid[1:] = np.cumsum(neq)
    starts = np.flatnonzero(np.concatenate(([True], neq)))
    counts = np.diff(np.concatenate((starts, [len(idx)])))
    ends = np.cumsum(counts) - 1
    cols: dict = {}
    rep = pa.array(idx[starts])
    for k in key_cols:
        cols[k] = t[k].take(rep)
    for c in payload_cols:
        pl = pc.fill_null(t[PATCH_LSN_PREFIX + c], -1)
        ls = (
            pl.combine_chunks() if isinstance(pl, pa.ChunkedArray) else pl
        ).to_numpy(zero_copy_only=False)[idx]
        # lexsort is stable and keyed (gid, ls): the last row of each gid
        # run holds that group's max winner lsn (-1 = never set).
        order = np.lexsort((ls, gid))
        win_sorted = order[ends]
        win_lsn = ls[win_sorted]
        valid = pa.array(win_lsn >= 0)
        value = t[c].take(pa.array(idx[win_sorted]))
        cols[c] = pc.if_else(valid, value, pa.nulls(len(starts), value.type))
        cols[PATCH_LSN_PREFIX + c] = pc.if_else(
            valid, pa.array(win_lsn), pa.nulls(len(starts), pa.int64())
        )
    return pa.table(cols)


def finalize_patches(t: pa.Table, payload_cols: tuple[str, ...]) -> pa.Table:
    """Drop the per-column winner lsns once no further merging will occur."""
    return t.drop_columns([PATCH_LSN_PREFIX + c for c in payload_cols])
