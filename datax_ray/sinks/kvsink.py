"""Keyed KV sink — DataX's hbasewriter/otswriter contract (SURVEY.md §2A
row 9's EXTERNAL half; round-3 review "What's missing" #4): keep an
external key-value store equal to the lake by applying PER-RECORD
Put/Update/Delete operations, exactly the OTS PutRow/UpdateRow/DeleteRow
shape — row-level ops against a keyed store, not the SQL mirror's
range-replace swap (pipelines/mirror.py).

Source of truth is the committed CHANGE FEED with a durable named
consumer offset (pipelines/feed.py): each sync delivers only the epochs
since the last acknowledged one. Delivery is at-least-once (ack happens
AFTER all rows applied); correctness under redelivery comes from
CONDITIONAL writes — every upsert carries the row's (ts, lsn) version
and applies only when it does not regress the stored version:

    INSERT ... ON CONFLICT(rowkey) DO UPDATE SET ...
    WHERE excluded.ts > ts OR (excluded.ts = ts AND excluded.lsn >= lsn)

which is precisely OTS's conditional-update / HBase's checkAndPut. A
crash anywhere re-delivers the window and every row folds idempotently;
two syncs racing the same store converge to the same winners, the same
LWW the lake itself uses.

Deletes land as TOMBSTONE rows (deleted=1, payload nulled) rather than
physical deletes, so a redelivered older update cannot resurrect a
deleted key — the same reason the lake's merge keeps tombstones past
compaction (stages/merge.py). Readers filter deleted=0; `read_kv_table`
does.

The sandbox has no HBase/OTS endpoint; any DB-API factory plays the KV
store (sqlite in tests — single-writer, so appliers retry on lock, same
as the SQL mirror). The per-record operation stream, rowkey encoding,
conditional-version apply and consumer bookkeeping are the real
contract; a production deployment swaps the executemany for the store's
batch RPC.

Parallelism: the feed maps straight into `_KvApplier` (callable class —
one connection per worker), one batch of change rows per call. Rows
never route through the driver; the consumer ack is the only driver
write.
"""

from __future__ import annotations

import time
from collections.abc import Callable

import pyarrow as pa
import pyarrow.compute as pc

from datax_ray.schemas import DELETED_COL, LSN_COL

_KEY_SEP = "\x1f"  # unit separator: cannot appear in conv_id fixtures


def _sql_type(t: pa.DataType) -> str:
    if pa.types.is_integer(t) or pa.types.is_boolean(t):
        return "INTEGER"
    if pa.types.is_floating(t):
        return "REAL"
    return "TEXT"


def _ensure_table(conn, table: str, payload: list[tuple[str, str]]) -> None:
    cols = ", ".join(f'"{c}" {t}' for c, t in payload)
    conn.execute(
        f'CREATE TABLE IF NOT EXISTS "{table}" ('
        f"rowkey TEXT PRIMARY KEY, ts INTEGER, lsn INTEGER, "
        f"deleted INTEGER{', ' + cols if cols else ''})"
    )
    have = {r[1] for r in conn.execute(f'PRAGMA table_info("{table}")')}
    for c, t in payload:
        if c not in have:  # schema evolution: lake grew a column
            conn.execute(f'ALTER TABLE "{table}" ADD COLUMN "{c}" {t}')
    conn.commit()


class _KvApplier:
    """map_batches stage: one change-feed batch in, one count row out.
    Applies every row as a conditional versioned upsert (see module
    docstring); sqlite's single-writer lock retries with backoff."""

    def __init__(self, connection_factory: Callable, table: str,
                 payload_cols: list[str]):
        self.__name__ = "KvApplier"
        self._factory = connection_factory
        self._table = table
        self._payload = payload_cols
        self._conn = None

    def _sql(self) -> str:
        pay = list(self._payload)
        cols = ["rowkey", "ts", "lsn", "deleted", *pay]
        col_sql = ", ".join(f'"{c}"' for c in cols)
        ph = ", ".join("?" for _ in cols)
        sets = ", ".join(
            f'"{c}" = excluded."{c}"' for c in cols if c != "rowkey"
        )
        return (
            f'INSERT INTO "{self._table}" ({col_sql}) VALUES ({ph}) '
            f"ON CONFLICT(rowkey) DO UPDATE SET {sets} "
            f'WHERE excluded.ts > "{self._table}".ts '
            f'OR (excluded.ts = "{self._table}".ts '
            f'AND excluded.lsn >= "{self._table}".lsn)'
        )

    def __call__(self, t: pa.Table) -> pa.Table:
        if self._conn is None:
            self._conn = self._factory()
        rowkey = pc.binary_join_element_wise(
            pc.cast(t["conv_id"], pa.string()),
            pc.cast(t["turn_idx"], pa.string()),
            _KEY_SEP,
        )
        ts_us = pc.cast(pc.cast(t["ts"], pa.timestamp("us")), pa.int64())
        deleted = pc.cast(
            pc.fill_null(t[DELETED_COL], False), pa.int8()
        )
        pay_arrays = []
        for c in self._payload:
            col = t[c] if c in t.column_names else pa.nulls(t.num_rows)
            # tombstones store no payload (the delete dominates; values
            # would be stale the moment a later insert wins)
            pay_arrays.append([
                None if d else _to_store(v)
                for v, d in zip(col.to_pylist(), deleted.to_pylist())
            ])
        data = list(zip(
            rowkey.to_pylist(),
            ts_us.to_pylist(),
            t[LSN_COL].to_pylist(),
            deleted.to_pylist(),
            *pay_arrays,
        ))
        sql = self._sql()
        for attempt in range(8):
            try:
                cur = self._conn.cursor()
                cur.executemany(sql, data)
                self._conn.commit()
                break
            except Exception:
                try:
                    self._conn.rollback()
                except Exception:
                    pass
                if attempt == 7:
                    raise
                time.sleep(0.05 * (2 ** attempt))
        return pa.table({"applied": pa.array([t.num_rows], pa.int64())})


def _to_store(v):
    if v is None:
        return None
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return v


def mirror_to_kv(
    lake_dir: str,
    connection_factory: Callable,
    table: str,
    consumer: str | None = None,
    concurrency: int = 1,
) -> dict:
    """Incremental exactly-once sync of the committed lake into a keyed
    store. Returns {"applied", "from_epoch", "to_epoch"}; a second call
    with no new epochs applies nothing.

    `concurrency` sizes the applier actor pool — the store's ingest
    width. Any value is CORRECT regardless of how feed rows land on
    appliers: every write is a conditional versioned upsert, so two
    appliers racing the same key converge to the (ts, lsn) winner, the
    same LWW the lake uses. Default 1 suits single-writer stores
    (sqlite's default journal); a real KV store (or WAL-mode sqlite with
    a busy timeout) raises this to its batch-RPC width."""
    from datax_ray.pipelines.feed import (
        commit_consumer,
        read_change_feed_consumer,
    )
    from datax_ray.sources.sqlsource import check_identifier
    from datax_ray.state.manifest import Manifest

    check_identifier(table, "table name")
    consumer = consumer or f"kv__{table}"
    m = Manifest(lake_dir)
    schema = m.committed_schema()
    if schema is None:
        raise ValueError(f"no committed lake at {lake_dir}")
    payload = [
        (f.name, _sql_type(f.type))
        for f in schema
        if f.name not in ("conv_id", "turn_idx", "ts")
    ]
    conn = connection_factory()
    try:
        _ensure_table(conn, table, payload)
    finally:
        conn.close()

    ds, frm, to = read_change_feed_consumer(lake_dir, consumer)
    if to <= frm:
        return {"applied": 0, "from_epoch": frm, "to_epoch": to}
    counts = ds.map_batches(
        _KvApplier(connection_factory, table, [c for c, _ in payload]),
        batch_format="pyarrow",
        batch_size=8192,
        concurrency=max(1, int(concurrency)),
    ).take_all()
    applied = sum(int(r["applied"]) for r in counts)
    # ack AFTER the effects are durable: at-least-once + conditional
    # apply = exactly-once observable state
    commit_consumer(lake_dir, consumer, to)
    return {"applied": applied, "from_epoch": frm, "to_epoch": to}


def read_kv_table(
    connection_factory: Callable, table: str, payload_cols: list[str]
) -> pa.Table:
    """The store's LIVE rows (tombstones filtered) decoded back to
    (conv_id, turn_idx int32, payload..., ts timestamp[us]) for
    verification against final_table."""
    import datetime as _dt

    conn = connection_factory()
    try:
        cols = ", ".join(f'"{c}"' for c in payload_cols)
        cur = conn.execute(
            f'SELECT rowkey, ts, {cols} FROM "{table}" WHERE deleted = 0'
        )
        rows = cur.fetchall()
    finally:
        conn.close()
    conv, turn, ts = [], [], []
    pay: list[list] = [[] for _ in payload_cols]
    for r in rows:
        k_conv, k_turn = r[0].split(_KEY_SEP)
        conv.append(k_conv)
        turn.append(int(k_turn))
        ts.append(_dt.datetime.fromtimestamp(r[1] / 1e6, tz=_dt.timezone.utc)
                  .replace(tzinfo=None))
        for i, v in enumerate(r[2:]):
            pay[i].append(v)
    def col(v):
        arr = pa.array(v)
        # an all-null column infers the null type; string is the store's
        # portable default (matching _sql_type's TEXT fallback)
        return arr.cast(pa.string()) if pa.types.is_null(arr.type) else arr

    return pa.table(
        {
            "conv_id": pa.array(conv, pa.string()),
            "turn_idx": pa.array(turn, pa.int32()),
            **{c: col(v) for c, v in zip(payload_cols, pay)},
            "ts": pa.array(ts, pa.timestamp("us")),
        }
    ).sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
