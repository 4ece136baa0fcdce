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


def schema_to_json(schema: pa.Schema) -> list[list[str]]:
    return [[f.name, str(f.type)] for f in schema]


def schema_from_json(fields: list[list[str]]) -> pa.Schema:
    out = []
    for name, type_str in fields:
        try:
            typ = _TYPE_STR_TO_ARROW[type_str]
        except KeyError:
            raise ValueError(f"unsupported serialized arrow type: {type_str!r}")
        out.append(pa.field(name, typ))
    return pa.schema(out)
