"""Exactly-once incremental SQL mirror — the writer half of DataX's
rdbms matrix (SURVEY.md §2A row 6) completed as true CDC *downstream
replication*: keep a SQL table equal to the committed lake state,
re-applying only what changed.

Unit of work = the partition RANGE (the same unit replay / compaction /
MV refresh use). Bookkeeping lives IN THE TARGET DATABASE
(`<table>__datax_mirror`: range_id -> file-set fingerprint), so one
DB transaction covers "replace this range's rows" + "record what they
were computed from" — crash anywhere and the transaction rolls back;
re-running applies exactly the ranges whose committed file set differs
from the recorded fingerprint (manifest-only check, no lake reads for
untouched ranges; content-hashed fragment names make the fingerprint
stable across byte-identical rewrites).

Rows carry a `_dxrange` column so a range's previous rows are
addressable for the DELETE half of the swap — the standard
partition-overwrite replication pattern (a real warehouse would use an
actual partition key; sqlite plays the JDBC endpoint here, any DB-API
factory works).

Parallelism: one Ray task per dirty range via from_items → map_batches
with a callable class (connection opens once per worker, not per
range). Lock-contended commits (sqlite single-writer) retry with
backoff inside the task.
"""

from __future__ import annotations

import hashlib
import sqlite3
import time
from collections.abc import Callable

import pyarrow as pa

import ray.data

from datax_ray.schemas import INTERNAL_COLS
from datax_ray.sinks.lake import _merge_read_range, _range_plan
from datax_ray.state.manifest import Manifest

_META_SUFFIX = "__datax_mirror"


def _fingerprint(files: list[str]) -> str:
    return hashlib.sha256("\n".join(sorted(files)).encode()).hexdigest()[:20]


def _sql_type(t: pa.DataType) -> str:
    if pa.types.is_integer(t) or pa.types.is_boolean(t):
        return "INTEGER"
    if pa.types.is_floating(t):
        return "REAL"
    return "TEXT"  # strings, timestamps (ISO text) — portable default


def _to_sql_value(v):
    if v is None:
        return None
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return v


class _MirrorApplier:
    """Per-range transactional swap: DELETE old range rows + INSERT fresh
    merge-read rows + UPSERT the fingerprint, in ONE transaction."""

    def __init__(
        self,
        lake_dir: str,
        connection_factory: Callable,
        table: str,
        schema_json: str,
        columns: list[str],
    ):
        self._lake_dir = lake_dir
        self._table = table
        self._schema_json = schema_json
        self._columns = columns
        self._conn = connection_factory()

    def _tx(self, fn, attempts: int = 8):
        for i in range(attempts):
            try:
                cur = self._conn.cursor()
                try:
                    # Explicit write lock up front (sqlite); drivers whose
                    # implicit transaction is already open just skip this.
                    cur.execute("BEGIN IMMEDIATE")
                except Exception:
                    pass
                fn(cur)
                self._conn.commit()
                return
            except Exception as exc:
                try:
                    self._conn.rollback()
                except Exception:
                    pass
                # Retry ONLY contention (sqlite 'database is locked' /
                # 'busy'); a permanent SQL error — dropped table, schema
                # mismatch — can never succeed and must surface now, not
                # after 8 backoff rounds.
                msg = str(exc).lower()
                retryable = isinstance(exc, sqlite3.OperationalError) and (
                    "locked" in msg or "busy" in msg
                )
                if not retryable or i == attempts - 1:
                    raise
                time.sleep(0.05 * (2**i))

    def __call__(self, t: pa.Table) -> pa.Table:
        out_rid, out_rows = [], []
        for row in t.to_pylist():
            rid, files, fp = int(row["range_id"]), list(row["files"]), row["fp"]
            merged = _merge_read_range(
                self._lake_dir, files, self._schema_json, include_internal=False
            )
            cols = [c for c in self._columns if c in merged.column_names]
            data = [
                tuple(_to_sql_value(v) for v in rec)
                for rec in zip(*(merged[c].to_pylist() for c in cols))
            ] if merged.num_rows else []
            tbl, meta = self._table, self._table + _META_SUFFIX
            placeholders = ",".join(["?"] * (len(cols) + 1))

            def apply(cur, rid=rid, fp=fp, data=data, cols=cols, placeholders=placeholders):
                cur.execute(f"DELETE FROM {tbl} WHERE _dxrange = ?", (rid,))
                if data:
                    cur.executemany(
                        f"INSERT INTO {tbl} (_dxrange, {', '.join(cols)}) "
                        f"VALUES ({placeholders})",
                        [(rid, *rec) for rec in data],
                    )
                cur.execute(
                    f"INSERT INTO {meta} (range_id, fp) VALUES (?, ?) "
                    "ON CONFLICT(range_id) DO UPDATE SET fp = excluded.fp",
                    (rid, fp),
                )

            self._tx(apply)
            out_rid.append(rid)
            out_rows.append(len(data))
        return pa.table({"range_id": out_rid, "rows": out_rows})


def mirror_to_sql(
    lake_dir: str,
    connection_factory: Callable,
    table: str,
    *,
    concurrency: int = 4,
) -> dict:
    """Bring `table` in the target DB up to the lake's committed state.
    Returns {"applied": n, "skipped": n, "dropped": n, "rows": n}."""
    from datax_ray.schemas import schema_to_json
    from datax_ray.sinks.lake import lake_schema

    m = Manifest(lake_dir)
    schema = lake_schema(lake_dir)
    out_schema = pa.schema([f for f in schema if f.name not in INTERNAL_COLS])
    columns = [f.name for f in out_schema]
    meta = table + _META_SUFFIX

    conn = connection_factory()
    cur = conn.cursor()
    col_defs = ", ".join(f"{f.name} {_sql_type(f.type)}" for f in out_schema)
    cur.execute(
        f"CREATE TABLE IF NOT EXISTS {table} (_dxrange INTEGER, {col_defs})"
    )
    cur.execute(
        f"CREATE TABLE IF NOT EXISTS {meta} "
        "(range_id INTEGER PRIMARY KEY, fp TEXT)"
    )
    # Schema evolution: lake DDL added a column the mirror lacks.
    existing = {d[0] for d in cur.execute(f"SELECT * FROM {table} LIMIT 0").description or []}
    for f in out_schema:
        if f.name not in existing:
            cur.execute(f"ALTER TABLE {table} ADD COLUMN {f.name} {_sql_type(f.type)}")
    known = {
        int(r[0]): r[1] for r in cur.execute(f"SELECT range_id, fp FROM {meta}")
    }
    conn.commit()

    parts = _range_plan(lake_dir, m)
    plan = {p["range_id"]: p for p in parts}
    dirty = [
        {"range_id": rid, "files": p["files"], "fp": _fingerprint(p["files"])}
        for rid, p in plan.items()
        if known.get(rid) != _fingerprint(p["files"])
    ]
    # Ranges that vanished from the plan (vacuumed empty) are dropped.
    gone = sorted(set(known) - set(plan))
    for rid in gone:
        cur = conn.cursor()
        cur.execute(f"DELETE FROM {table} WHERE _dxrange = ?", (rid,))
        cur.execute(f"DELETE FROM {meta} WHERE range_id = ?", (rid,))
        conn.commit()
    conn.close()

    rows = 0
    if dirty:
        applied = (
            ray.data.from_items(dirty)
            .map_batches(
                _MirrorApplier,
                fn_constructor_args=(
                    lake_dir,
                    connection_factory,
                    table,
                    schema_to_json(schema),
                    columns,
                ),
                batch_format="pyarrow",
                batch_size=1,
                concurrency=min(concurrency, len(dirty)),
            )
            .take_all()
        )
        rows = sum(int(r["rows"]) for r in applied)
    return {
        "applied": len(dirty),
        "skipped": len(plan) - len(dirty),
        "dropped": len(gone),
        "rows": rows,
    }
