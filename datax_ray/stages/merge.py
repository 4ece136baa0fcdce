"""Merge-apply: last-writer-wins upsert per (conv_id, turn_idx) (SURVEY.md
§2B-B4; the Ray-native descendant of DataX otswriter's per-record
PutRow/UpdateRow/DeleteRow apply, §2A row 9).

`lww_reduce` is the vectorized kernel: sort by (conv_id, turn_idx, ts, lsn)
and keep the last row per key — no Python row loop; key-change detection is
a numpy adjacent-compare over dictionary codes.

`MergeApplier` is the per-partition group function used after the hash
shuffle (`groupby("part_id").map_groups(...)`). The lake layout is
**base + deltas** per partition (LSM-flavored), so per-epoch write cost is
O(epoch events), NOT O(lake) — the property that keeps sustained 10^10-event
throughput flat as the lake grows. For its partition the applier:
  1. LWW-reduces this epoch's events into a DELTA (tombstones kept as
     _deleted rows) and writes `p=NNNNN/d=EEEEEE.parquet` — DETERMINISTIC
     name and row order, so Ray's at-least-once retries rewrite the
     identical file;
  2. every `compact_every` epochs per partition, instead folds
     base + committed deltas + this delta into a fresh base
     `p=NNNNN/b=EEEEEE.parquet` (amortized O(lake/compact_every) per
     epoch) and the manifest drops the delta list;
  3. returns ONE tiny lineage row — the data itself never flows back
     through the Dataset, only O(P) metadata reaches the driver, keeping
     the commit step small enough that 4N scaling holds (SURVEY §7 hp-6).

LWW across files is associative: the winner per key under max(ts, _lsn) is
the same whether applied event-by-event (the oracle), epoch-by-epoch (the
old full-rewrite plan), or merged once across base+deltas (the read path /
compaction) — so all three views agree row-for-row. Tombstones must
OUTLIVE compaction: a late event (lsn above the watermark) may still carry
an older ts, and only the stored tombstone's (ts, _lsn) can defeat it.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from datax_ray.schemas import LSN_COL, schema_from_json
from datax_ray.state.metrics import get_metrics_actor

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
    codes to pick the last row of each run — no per-row Python."""
    if t.num_rows <= 1:
        return t
    sort_keys = [(c, "ascending") for c in (*key_cols, *order_cols)]
    t = t.take(pc.sort_indices(t, sort_keys=sort_keys))
    neq = None
    for c in key_cols:
        arr = _key_codes(t[c])
        d = arr[:-1] != arr[1:]
        neq = d if neq is None else (neq | d)
    last = np.empty(t.num_rows, dtype=bool)
    last[:-1] = neq
    last[-1] = True
    return t.filter(pa.array(last))


def apply_events(
    base: pa.Table | None, events: pa.Table, lake_schema: pa.Schema
) -> pa.Table:
    """Merge one partition's base state with its new events; returns the new
    partition state in `lake_schema`, sorted by (conv_id, turn_idx).

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
    merged = lww_reduce(pa.concat_tables(parts))
    cols = {name: merged[name] for name in payload}
    cols[LSN_COL] = merged["lsn"]
    cols[DELETED_COL] = pc.equal(merged["op"], "delete")
    out = pa.table(cols, schema=lake_schema)
    return out.take(
        pc.sort_indices(
            out, sort_keys=[("conv_id", "ascending"), ("turn_idx", "ascending")]
        )
    )


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


def merge_states(tables: list[pa.Table], lake_schema: pa.Schema) -> pa.Table:
    """LWW-merge lake-state tables (a base + any number of deltas, any
    order): winner per (conv_id, turn_idx) is max (ts, _lsn); tombstone
    rows (_deleted) are kept. Sorted by key — deterministic."""
    parts = [unify_to_schema(t, lake_schema) for t in tables if t.num_rows]
    if not parts:
        return lake_schema.empty_table()
    merged = lww_reduce(
        pa.concat_tables(parts), key_cols=("conv_id", "turn_idx"), order_cols=("ts", LSN_COL)
    )
    return merged.take(
        pc.sort_indices(
            merged, sort_keys=[("conv_id", "ascending"), ("turn_idx", "ascending")]
        )
    )


LINEAGE_SCHEMA = pa.schema(
    [
        ("part_id", pa.int32()),
        ("epoch", pa.int32()),
        ("kind", pa.string()),  # "delta" | "base" (compaction)
        ("file", pa.string()),
        ("rows", pa.int64()),
        ("events_applied", pa.int64()),
        ("lsn_hi", pa.int64()),
        ("bytes", pa.int64()),
    ]
)


class MergeApplier:
    def __init__(
        self,
        lake_dir: str,
        epoch: int,
        part_recs: dict[int, dict],
        lake_schema_json: list[list[str]],
        compact_every: int = 8,
        metrics: bool = True,
    ):
        self.__name__ = "MergeApplier"  # Ray Data names task UDFs from this
        self.lake_dir = lake_dir
        self.epoch = epoch
        self.part_recs = part_recs  # pid -> {"base": rel|None, "deltas": [rel]}
        self.schema = schema_from_json(lake_schema_json)
        self.compact_every = max(1, compact_every)
        self._metrics = get_metrics_actor() if metrics else None

    def __call__(self, group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return LINEAGE_SCHEMA.empty_table()
        part_id = group["part_id"][0].as_py()
        rec = self.part_recs.get(part_id) or {"base": None, "deltas": []}

        # This epoch's LWW winners (incl. tombstones) — the delta.
        delta = apply_events(None, group, self.schema)

        if len(rec["deltas"]) + 1 >= self.compact_every:
            prior = [rec["base"]] if rec["base"] else []
            tables = [
                pq.read_table(os.path.join(self.lake_dir, f))
                for f in (*prior, *rec["deltas"])
            ]
            state = merge_states([*tables, delta], self.schema)
            rel = os.path.join(f"p={part_id:05d}", f"b={self.epoch:06d}.parquet")
            kind = "base"
        else:
            state = delta
            rel = os.path.join(f"p={part_id:05d}", f"d={self.epoch:06d}.parquet")
            kind = "delta"

        path = os.path.join(self.lake_dir, rel)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = path + ".tmp"
        pq.write_table(state, tmp)
        os.replace(tmp, path)  # deterministic name + atomic swap => idempotent
        nbytes = os.path.getsize(path)

        lsn_hi = pc.max(group["lsn"]).as_py() if group.num_rows else -1
        if self._metrics is not None:
            self._metrics.add.remote(
                "merge_apply",
                {
                    "events_in": group.num_rows,
                    "rows_out": state.num_rows,
                    "bytes_out": nbytes,
                    "partitions": 1,
                    "compactions": int(kind == "base"),
                },
            )
        return pa.table(
            {
                "part_id": pa.array([part_id], pa.int32()),
                "epoch": pa.array([self.epoch], pa.int32()),
                "kind": pa.array([kind], pa.string()),
                "file": pa.array([rel], pa.string()),
                "rows": pa.array([state.num_rows], pa.int64()),
                "events_applied": pa.array([group.num_rows], pa.int64()),
                "lsn_hi": pa.array([lsn_hi if lsn_hi is not None else -1], pa.int64()),
                "bytes": pa.array([nbytes], pa.int64()),
            },
            schema=LINEAGE_SCHEMA,
        )
