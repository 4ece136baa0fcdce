"""Canonical schemas for the CDC engine.

Shapes mandated by BASELINE.json `input_hint` (transcripts) and SURVEY.md §1.2
(change-event stream). The reference snapshot (/root/reference/README.md:1-3,
tbs005/DataX pre-code-release) ships no code; DataX's 6-type internal model
(Long/Double/String/Date/Bool/Bytes) maps onto Arrow as documented in
SURVEY.md §1.2 — our engine is columnar Arrow end to end.
"""

from __future__ import annotations

import pyarrow as pa

# The materialized lake table (input_hint, verbatim shape).
TRANSCRIPTS_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("text", pa.string()),
        ("tool", pa.string()),
        ("ts", pa.timestamp("us")),
    ]
)

# The binlog/WAL-style change-event stream the engine replays.
CHANGES_SCHEMA = pa.schema(
    [
        ("lsn", pa.int64()),
        ("ts", pa.timestamp("us")),
        ("op", pa.string()),  # insert | update | delete | ddl
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("text", pa.string()),
        ("tool", pa.string()),
        ("ddl", pa.string()),  # JSON payload, only for op="ddl"
    ]
)

# Internal columns the lake carries for LWW resumption; stripped from the
# user-facing final table. _lsn = winning event's LSN; _deleted = tombstone
# (a delete must outlive the row so a late, stale update in a later epoch
# cannot resurrect it — SURVEY.md §7 hard-part 2).
LSN_COL = "_lsn"
DELETED_COL = "_deleted"

LAKE_SCHEMA = TRANSCRIPTS_SCHEMA.append(pa.field(LSN_COL, pa.int64())).append(
    pa.field(DELETED_COL, pa.bool_())
)

VALID_OPS = ("insert", "update", "delete")

# Columns of the change stream that are bookkeeping, not row payload.
EVENT_META_COLS = ("lsn", "op", "ddl")


INTERNAL_COLS = (LSN_COL, DELETED_COL)


def payload_columns(lake_schema: pa.Schema) -> list[str]:
    """Payload columns of a lake schema (everything except internal cols).

    `ts` is payload: the applied row's ts is the winning event's ts.
    """
    return [f.name for f in lake_schema if f.name not in INTERNAL_COLS]


# --- Arrow type serde for manifests (schema evolution survives restarts) ---

_TYPE_STR_TO_ARROW = {
    "string": pa.string(),
    "large_string": pa.large_string(),
    "int8": pa.int8(),
    "int16": pa.int16(),
    "int32": pa.int32(),
    "int64": pa.int64(),
    "float": pa.float32(),
    "float32": pa.float32(),
    "double": pa.float64(),
    "float64": pa.float64(),
    "bool": pa.bool_(),
    "binary": pa.binary(),
    "timestamp[s]": pa.timestamp("s"),
    "timestamp[ms]": pa.timestamp("ms"),
    "timestamp[us]": pa.timestamp("us"),
    "timestamp[ns]": pa.timestamp("ns"),
}


# rename_column DDL state: schema metadata key holding a JSON map
# {historical_name: current_name}. It rides ON the pa.Schema so every
# consumer that already threads the lake schema (normalize, merge-read,
# compaction, feed) sees the mapping without new plumbing; serde keeps it
# via a sentinel row, so it survives the manifest round trip. Old manifests
# (no sentinel) deserialize to an empty map — fully backward compatible.
RENAMES_META_KEY = b"renames"
_RENAMES_SENTINEL = "__renames__"


def schema_to_json(schema: pa.Schema) -> list[list[str]]:
    out = [[f.name, str(f.type)] for f in schema]
    meta = schema.metadata or {}
    if meta.get(RENAMES_META_KEY):
        out.append([_RENAMES_SENTINEL, meta[RENAMES_META_KEY].decode()])
    return out


def schema_from_json(fields: list[list[str]]) -> pa.Schema:
    out = []
    renames_json: str | None = None
    for name, type_str in fields:
        if name == _RENAMES_SENTINEL:
            renames_json = type_str
            continue
        try:
            typ = _TYPE_STR_TO_ARROW[type_str]
        except KeyError:
            raise ValueError(f"unsupported serialized arrow type: {type_str!r}")
        out.append(pa.field(name, typ))
    schema = pa.schema(out)
    if renames_json:
        schema = schema.with_metadata({RENAMES_META_KEY: renames_json})
    return schema


def renames_of(schema: pa.Schema) -> dict[str, str]:
    """The {historical: current} column-rename map carried on a lake
    schema's metadata ({} when no rename DDL was ever applied)."""
    import json as _json

    meta = schema.metadata or {}
    raw = meta.get(RENAMES_META_KEY)
    return _json.loads(raw.decode()) if raw else {}


def resolve_source_name(
    src_schema: pa.Schema, name: str, renames: dict[str, str]
) -> str | None:
    """The column of `src_schema` that holds target column `name`'s data:
    `name` itself, or — for pre-rename tables / original change-stream
    events — a historical name that maps to it. None = genuinely absent
    (null-fill)."""
    if src_schema.get_field_index(name) != -1:
        return name
    for hist, cur in renames.items():
        if cur == name and src_schema.get_field_index(hist) != -1:
            return hist
    return None
