"""Envelope INGEST — consume a Debezium-style before/after change stream
(this engine's `feedout` output, or any foreign CDC producer speaking the
same shape) into the engine's change-log segment format, from which the
normal replay/tail machinery lands it in a lake. Closes the interop loop:
the lake both produces (sinks/feedout.py) and consumes envelope streams.

Identity contract — ORDER, not source LSNs: an envelope stream's truth is
its sequence (Kafka-connect consumers apply in partition order for the
same reason). Source systems assign LSNs we can't trust to be monotone or
collision-free with ours (feedout's own delete envelopes carry the
pre-image's lsn, and two producers' lsn spaces overlap), so the converter
synthesizes a fresh, strictly-increasing lsn per envelope record from the
stream order — (window, bucket file, in-file row) — persisted across runs
in `_envingest_state.json` (next_lsn + converted-file set), making ingest
INCREMENTAL and idempotent: re-running converts only new envelope files,
a crashed run re-converts to identical bytes.

Per-key correctness under LWW replay: within one stream a key's envelopes
appear in nondecreasing (window, epoch) order with at most one per source
epoch; synthesized lsns increase along that order, and event-times are
taken from the image a consumer would apply (after.ts for c/u, before.ts
for d — the pre-image's ts, so the tombstone exactly dominates the row it
deletes on the (ts, lsn) order without outrunning later legitimate
updates). Folding the converted log therefore reproduces the producer's
final state row-for-row (round-trip pytest).

Scope: the core transcript payload (conv_id, turn_idx, role, text, tool,
ts). DDL-added columns in a foreign stream need a matching DDL on the
target lake first; the converter ignores unknown keys inside the images
(forward-compatible) and accepts only jsonl envelopes (Arrow's C JSON
reader parses images into structs — no per-row Python; parquet envelopes
hold images as strings and would force row-wise json.loads)."""

from __future__ import annotations

import glob as _glob
import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from datax_ray.schemas import CHANGES_SCHEMA

_STATE = "_envingest_state.json"


def _load_state(d: str) -> dict:
    try:
        with open(os.path.join(d, _STATE)) as f:
            return json.load(f)
    except FileNotFoundError:
        return {}


def _save_state(d: str, state: dict) -> None:
    os.makedirs(d, exist_ok=True)
    tmp = os.path.join(d, f"{_STATE}.tmp.{os.getpid()}")
    with open(tmp, "w") as f:
        json.dump(state, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, os.path.join(d, _STATE))


def _img_col(img: pa.ChunkedArray | pa.Array, name: str, typ: pa.DataType,
             n: int) -> pa.Array:
    """Pull one field out of a struct column of images (null-safe: a null
    image yields a null field)."""
    if isinstance(img, pa.ChunkedArray):
        img = img.combine_chunks()
    if img.type == pa.null() or not isinstance(img.type, pa.StructType):
        return pa.nulls(n, typ)
    if img.type.get_field_index(name) < 0:
        return pa.nulls(n, typ)
    field = pc.struct_field(img, name)
    if typ == pa.timestamp("us") and pa.types.is_string(field.type):
        # ISO strings from the jsonl serializer cast directly
        return pc.cast(field, pa.timestamp("us"))
    return pc.cast(field, typ)


def _convert_file(path: str, base_lsn: int) -> pa.Table:
    """One envelope jsonl file → CHANGES rows with synthesized lsns
    base_lsn + row index (file rows are already (epoch, lsn, key)-sorted
    by the producer)."""
    from pyarrow import json as pa_json

    t = pa_json.read_json(path)
    n = t.num_rows
    if n == 0:
        return CHANGES_SCHEMA.empty_table()
    op_map = pc.case_when(
        pc.make_struct(
            pc.equal(t["op"], "c"),
            pc.equal(t["op"], "u"),
            pc.equal(t["op"], "d"),
        ),
        "insert",
        "update",
        "delete",
    )
    after = t["after"] if "after" in t.column_names else pa.nulls(n)
    before = t["before"] if "before" in t.column_names else pa.nulls(n)
    is_del = pc.equal(t["op"], "d")

    def payload(name: str, typ: pa.DataType) -> pa.Array:
        a = _img_col(after, name, typ, n)
        b = _img_col(before, name, typ, n)
        # c/u read the after image; d keeps payload null (CHANGES contract)
        return pc.if_else(is_del, pa.nulls(n, typ), a) if name != "ts" else (
            pc.if_else(is_del, b, a)
        )

    ts = payload("ts", pa.timestamp("us"))
    if ts.null_count > 0:
        # foreign producers may omit image ts — fall back to envelope ts_ms
        fallback = pc.cast(
            pc.multiply(pc.cast(t["ts_ms"], pa.int64()), 1000),
            pa.timestamp("us"),
        )
        ts = pc.if_else(pc.is_valid(ts), ts, fallback)
    return pa.table(
        {
            "lsn": pa.array(np.arange(base_lsn, base_lsn + n, dtype=np.int64)),
            "ts": ts,
            "op": op_map,
            "conv_id": pc.cast(t["conv_id"], pa.string()),
            "turn_idx": pc.cast(t["turn_idx"], pa.int32()),
            "role": payload("role", pa.string()),
            "text": payload("text", pa.string()),
            "tool": payload("tool", pa.string()),
            "ddl": pa.nulls(n, pa.string()),
        }
    ).cast(CHANGES_SCHEMA)


def envelopes_to_segments(env_dir: str, changes_dir: str) -> dict:
    """Convert NEW envelope jsonl files under env_dir into change-log
    segments under changes_dir (one segment per envelope file, named by
    its base lsn so name order == lsn order, the replay contract).
    Incremental + idempotent via `_envingest_state.json`. Returns
    {"converted_files", "rows", "next_lsn"}."""
    import pyarrow.parquet as pq

    state = _load_state(changes_dir)
    done = set(state.get("converted", []))
    next_lsn = int(state.get("next_lsn", 0))
    os.makedirs(changes_dir, exist_ok=True)

    # stream order: windows ascend (e{lo}-{hi} in the name), then bucket —
    # per-key envelopes never split across buckets, so any bucket order
    # works; sorting keeps runs deterministic.
    def window_key(p: str):
        name = os.path.basename(p)
        return (name.split("-e")[-1], name)

    pending = sorted(
        (
            p
            for p in _glob.glob(os.path.join(env_dir, "env-*.jsonl"))
            if os.path.basename(p) not in done
        ),
        key=window_key,
    )
    rows = 0
    for p in pending:
        t = _convert_file(p, next_lsn)
        if t.num_rows:
            seg = os.path.join(changes_dir, f"seg-{next_lsn:012d}.parquet")
            tmp = seg + f".tmp.{os.getpid()}"
            pq.write_table(t, tmp, compression="zstd", compression_level=1)
            os.replace(tmp, seg)
            next_lsn += t.num_rows
            rows += t.num_rows
        done.add(os.path.basename(p))
    _save_state(
        changes_dir,
        {"converted": sorted(done), "next_lsn": next_lsn},
    )
    return {"converted_files": len(pending), "rows": rows,
            "next_lsn": next_lsn}
