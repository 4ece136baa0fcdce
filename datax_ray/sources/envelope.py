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

Schema evolution flows THROUGH the interop loop: image keys beyond the
core transcript payload (a producer-side add_column DDL, or a foreign
system's extra fields) are auto-registered — the converter emits an
`op=ddl add_column` event (type inferred from the Arrow struct field the
C JSON reader produced) BEFORE the first data event carrying the column,
records it in the state so later files don't re-emit, and passes the
values through; the target lake evolves exactly like it would tailing a
native stream. Accepts only jsonl envelopes (Arrow's C JSON reader parses
images into structs — no per-row Python; parquet envelopes hold images as
strings and would force row-wise json.loads)."""

from __future__ import annotations

import glob as _glob
import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from datax_ray.schemas import CHANGES_SCHEMA
from datax_ray.state.schema_tracker import _NAMED_TYPES as _NAMED_DDL_TYPES

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


_CORE_IMG = {"conv_id", "turn_idx", "role", "text", "tool", "ts"}

_ARROW_TO_DDL = {
    pa.string(): "string",
    pa.large_string(): "string",
    pa.int32(): "int64",
    pa.int64(): "int64",
    pa.float32(): "double",
    pa.float64(): "double",
    pa.bool_(): "bool",
    pa.timestamp("us"): "timestamp[us]",
}


def _ddl_type_of(name: str, typ: pa.DataType) -> str:
    out = _ARROW_TO_DDL.get(typ)
    if out is None:
        raise ValueError(
            f"envelope image field {name!r} has type {typ} — not "
            "representable as a lake column (flatten nested payloads on "
            "the producer side)"
        )
    return out


def _extra_fields(t: pa.Table) -> dict[str, pa.DataType]:
    """Image struct fields beyond the core transcript payload."""
    out: dict[str, pa.DataType] = {}
    for img in ("after", "before"):
        if img not in t.column_names:
            continue
        typ = t[img].type
        if not isinstance(typ, pa.StructType):
            continue
        for f in typ:
            if f.name not in _CORE_IMG and f.name not in out:
                out[f.name] = f.type
    return out


def _convert_table(t: pa.Table, base_lsn: int,
                   extras: dict[str, str]) -> pa.Table:
    """One envelope table → CHANGES rows (+ extra payload columns) with
    synthesized lsns base_lsn + row index (file rows are already
    (epoch, lsn, key)-sorted by the producer)."""
    n = t.num_rows
    schema = CHANGES_SCHEMA
    for name, ddl_t in extras.items():
        schema = schema.append(pa.field(name, _NAMED_DDL_TYPES[ddl_t]))
    if n == 0:
        return schema.empty_table()
    op_map = pc.case_when(
        pc.make_struct(
            pc.is_in(t["op"], value_set=pa.array(["c", "r"])),  # Debezium
            pc.equal(t["op"], "u"),  # snapshot reads ("r") fold as inserts
            pc.equal(t["op"], "d"),
        ),
        "insert",
        "update",
        "delete",
    )
    if op_map.null_count:
        bad = pc.unique(
            t.filter(pc.is_null(op_map))["op"].combine_chunks()
        ).to_pylist()
        raise ValueError(
            f"envelope stream carries unsupported op values {bad!r} — "
            "expected c/r (insert), u (update), d (delete)"
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
        if "ts_ms" not in t.column_names:
            raise ValueError(
                "envelope rows lack both an image ts and a ts_ms field — "
                "no event-time to order the LWW merge by"
            )
        fallback = pc.cast(
            pc.multiply(pc.cast(t["ts_ms"], pa.int64()), 1000),
            pa.timestamp("us"),
        )
        ts = pc.if_else(pc.is_valid(ts), ts, fallback)
    cols = {
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
    for name, ddl_t in extras.items():
        cols[name] = payload(name, _NAMED_DDL_TYPES[ddl_t])
    return pa.table(cols).cast(schema)


def _ddl_rows(new_cols: dict[str, str], base_lsn: int, before_ts_us: int,
              extras: dict[str, str]) -> pa.Table:
    """op=ddl add_column events registering this run's new image fields —
    ts strictly before every data event (the epoch-boundary invariant)."""
    rows = []
    for i, (name, ddl_t) in enumerate(sorted(new_cols.items())):
        r = {
            "lsn": base_lsn + i,
            "ts": before_ts_us,
            "op": "ddl",
            "conv_id": "ddl",
            "turn_idx": 0,
            "role": None,
            "text": None,
            "tool": None,
            "ddl": json.dumps(
                {"action": "add_column", "name": name, "type": ddl_t}
            ),
        }
        for cname in extras:
            r[cname] = None
        rows.append(r)
    schema = CHANGES_SCHEMA
    for name, ddl_t in extras.items():
        schema = schema.append(pa.field(name, _NAMED_DDL_TYPES[ddl_t]))
    return pa.Table.from_pylist(rows).select(schema.names).cast(schema)


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

    # env_dir may live on an object store (the streaming spool's home —
    # state/fs.py contract); changes_dir is the engine's local ingest
    # staging. Listing and reads go through the contract, local paths
    # keep the direct-glob fast path.
    from datax_ray.state.fs import fs_for, is_remote

    if is_remote(env_dir):
        env_files = [
            p for p in fs_for(env_dir).list_prefix(env_dir)
            if os.path.basename(p).startswith("env-")
            and p.endswith(".jsonl")
        ]
    else:
        env_files = _glob.glob(os.path.join(env_dir, "env-*.jsonl"))
    pending = sorted(
        (p for p in env_files if os.path.basename(p) not in done),
        key=window_key,
    )

    def _jsonl_input(path: str):
        return fs_for(path).open_input(path) if is_remote(path) else path

    # Pass 1 — parse + discover image fields beyond the already-registered
    # set, so every segment of THIS run shares one schema (segments inside
    # one replay epoch concatenate) and each new column gets exactly one
    # DDL event before its first data event.
    from pyarrow import json as pa_json

    known: dict[str, str] = dict(state.get("ddl_cols", {}))
    new_cols: dict[str, str] = {}
    min_ts_us = None
    file_rows: list[int] = []
    for p in pending:
        # parse, harvest schema + row count + min ts, DROP — memory stays
        # O(one file) even on a first full-history export (pass 2 re-parses)
        t = pa_json.read_json(_jsonl_input(p))
        for name, typ in _extra_fields(t).items():
            if name not in known and name not in new_cols:
                new_cols[name] = _ddl_type_of(name, typ)
        file_rows.append(t.num_rows)
        if t.num_rows and "ts_ms" in t.column_names:
            lo = pc.min(t["ts_ms"]).as_py()
            if lo is not None:
                lo *= 1000
                min_ts_us = lo if min_ts_us is None else min(min_ts_us, lo)
        del t
    extras = {**known, **new_cols}

    # Pass 2 — write segments. Pass 1 fixed every file's base lsn, so each
    # file converts INDEPENDENTLY: large runs fan out as one Ray task per
    # file (a first full-history ingest is O(lake) work — a driver loop
    # would serialize it), tiny runs stay in-process.
    rows = 0
    plan = []
    base = next_lsn + len(new_cols)
    for p, n in zip(pending, file_rows):
        plan.append({"path": p, "base_lsn": base})
        base += n
    if new_cols:
        ddl_t = _ddl_rows(new_cols, next_lsn,
                          (min_ts_us or 0) - 1_000_000, extras)
        seg = os.path.join(changes_dir, f"seg-{next_lsn:012d}.parquet")
        tmp = seg + f".tmp.{os.getpid()}"
        pq.write_table(ddl_t, tmp, compression="zstd", compression_level=1)
        os.replace(tmp, seg)
        rows += ddl_t.num_rows
    next_lsn = base

    def convert_one(path: str, base_lsn: int) -> int:
        from datax_ray.state.fs import fs_for as _ff, is_remote as _ir

        t = pa_json.read_json(_ff(path).open_input(path) if _ir(path)
                              else path)
        out = _convert_table(t, base_lsn, extras)
        if out.num_rows:
            seg = os.path.join(changes_dir, f"seg-{base_lsn:012d}.parquet")
            tmp = seg + f".tmp.{os.getpid()}"
            pq.write_table(out, tmp, compression="zstd",
                           compression_level=1)
            os.replace(tmp, seg)
        return out.num_rows

    if len(plan) > 8:
        import ray
        import ray.data

        def task(t: pa.Table) -> pa.Table:
            counts = [
                convert_one(r["path"], int(r["base_lsn"]))
                for r in t.to_pylist()
            ]
            return pa.table({"rows": pa.array(counts, pa.int64())})

        for r in (
            ray.data.from_items(plan, override_num_blocks=len(plan))
            .map_batches(task, batch_format="pyarrow")
            .take_all()
        ):
            rows += int(r["rows"])
    else:
        for item in plan:
            rows += convert_one(item["path"], item["base_lsn"])
    for p in pending:
        done.add(os.path.basename(p))
    _save_state(
        changes_dir,
        {"converted": sorted(done), "next_lsn": next_lsn,
         "ddl_cols": extras},
    )
    return {"converted_files": len(pending), "rows": rows,
            "next_lsn": next_lsn, "added_columns": sorted(new_cols)}
