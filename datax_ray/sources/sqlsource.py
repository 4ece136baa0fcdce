"""SQL (JDBC-shaped) source + sink — DataX's rdbms reader/writer contract
(SURVEY.md §2A rows 1, 6) re-expressed Ray-Data-first.

DataX's mysql/oracle/sqlserver/pg readers all share one plan: pick a
numeric `splitPk`, read MIN/MAX once, cut [min, max] into ranges, and give
each channel `SELECT cols FROM t WHERE pk >= lo AND pk < hi`. Here the
ranges become `from_items` rows and each range is fetched INSIDE a
map_batches task over the task's own DB connection (a connection cannot
cross process boundaries; the factory callable ships instead). Column
pruning and WHERE pushdown happen in the generated SQL — only requested
columns/rows leave the database.

The sandbox has no network DB; sqlite3 (stdlib) plays the role of the
JDBC endpoint in tests and in the `sql_source_events` catalog query. Any
DB-API connection factory works the same way.
"""

from __future__ import annotations

from collections.abc import Callable

import pyarrow as pa

import ray.data

# Arrow types we map DB-API values into when the caller declares a schema.
_DEFAULT_BATCH_ROWS = 65536

_IDENT_RE = __import__("re").compile(r"^[A-Za-z_][A-Za-z0-9_]*$")


def check_identifier(name: str, what: str = "identifier") -> str:
    """Refuse table/column names that are not plain SQL identifiers BEFORE
    they are interpolated into generated SQL text. DB-API has no parameter
    binding for identifiers, so interpolation is unavoidable; a name with
    spaces/quotes/reserved characters would otherwise break the probe
    query with a raw driver error — or execute unintended SQL."""
    if not _IDENT_RE.match(name or ""):
        raise ValueError(
            f"invalid SQL {what} {name!r}: must match [A-Za-z_][A-Za-z0-9_]*"
        )
    return name


def plan_pk_splits(
    connection_factory: Callable,
    table: str,
    split_pk: str,
    num_splits: int,
    where: str | None = None,
    dialect="ansi",
) -> list[tuple[int, int]]:
    """DataX splitPk planning: one MIN/MAX query, then half-open integer
    ranges [lo, hi) covering [min, max+1). Returns [] for an empty table."""
    from datax_ray.sources.dialects import get_dialect

    d = get_dialect(dialect)
    conn = connection_factory()
    try:
        cond = f" WHERE {where}" if where else ""
        # DB-API portability: execute() lives on cursors; sqlite3's
        # connection.execute is a convenience other drivers lack.
        cur = conn.cursor()
        cur.execute(
            f"SELECT MIN({d.quote(split_pk)}), MAX({d.quote(split_pk)}) "
            f"FROM {d.quote(table)}{cond}"
        )
        lo, hi = cur.fetchone()
    finally:
        conn.close()
    if lo is None:
        return []
    lo, hi = int(lo), int(hi) + 1
    n = max(1, min(num_splits, hi - lo))
    step = (hi - lo + n - 1) // n
    return [(s, min(s + step, hi)) for s in range(lo, hi, step)]


class SqlRangeReader:
    """map_batches stage: one split-range row in, that range's rows out.

    The connection opens lazily ONCE per worker (callable-class state), not
    per range. Output is Arrow; a declared `schema` pins column types
    (e.g. int64 microseconds -> timestamp[us]) so blocks from every range
    coalesce identically."""

    def __init__(
        self,
        connection_factory: Callable,
        table: str,
        columns: list[str],
        split_pk: str,
        where: str | None = None,
        schema: pa.Schema | None = None,
        dialect="ansi",
    ):
        self.__name__ = "SqlRangeReader"
        self.factory = connection_factory
        self.table = table
        self.columns = columns
        self.split_pk = split_pk
        self.where = where
        self.dialect = dialect
        self.schema_json = (
            [[f.name, str(f.type)] for f in schema] if schema is not None else None
        )
        self._conn = None

    def _sql(self, lo: int, hi: int) -> str:
        from datax_ray.sources.dialects import get_dialect

        d = get_dialect(self.dialect)
        cols = ", ".join(d.quote(c) for c in self.columns)
        pk = d.quote(self.split_pk)
        cond = f"{pk} >= {lo} AND {pk} < {hi}"
        if self.where:
            cond = f"({self.where}) AND {cond}"
        return (
            f"SELECT {cols} FROM {d.quote(self.table)} WHERE {cond} "
            f"ORDER BY {pk}"
        )

    def __call__(self, t: pa.Table) -> pa.Table:
        from datax_ray.schemas import schema_from_json

        if self._conn is None:
            self._conn = self.factory()
        target = (
            schema_from_json(self.schema_json) if self.schema_json is not None else None
        )
        out: list[pa.Table] = []
        for lo, hi in zip(t["lo"].to_pylist(), t["hi"].to_pylist()):
            cur = self._conn.cursor()
            cur.execute(self._sql(int(lo), int(hi)))
            rows = cur.fetchall()
            cols = list(zip(*rows)) if rows else [[] for _ in self.columns]
            if target is not None:
                tab = pa.table(
                    {
                        name: pa.array(vals, target.field(name).type)
                        for name, vals in zip(self.columns, cols)
                    }
                )
            else:
                tab = pa.table(
                    {name: pa.array(list(vals)) for name, vals in zip(self.columns, cols)}
                )
            out.append(tab)
        if not out:
            return (target or pa.schema([])).empty_table()
        return pa.concat_tables(out)


def read_sql_table(
    connection_factory: Callable,
    table: str,
    columns: list[str],
    split_pk: str,
    num_splits: int = 16,
    where: str | None = None,
    schema: pa.Schema | None = None,
    dialect="ansi",
) -> ray.data.Dataset:
    """Parallel range-split SQL read as a streaming Dataset. The split plan
    is O(1) driver work (one MIN/MAX query); each range fetches in its own
    task. Size num_splits so one range fits a worker (DataX channel rule)."""
    from datax_ray.sources.dialects import get_dialect

    d = get_dialect(dialect)
    check_identifier(table, "table name")
    check_identifier(split_pk, "splitPk column")
    for c in columns:
        check_identifier(c, "column name")
    splits = plan_pk_splits(
        connection_factory, table, split_pk, num_splits, where, dialect=d
    )
    if schema is None and splits:
        # Infer a pinned schema from ONE probe row on the driver: without
        # it, empty split ranges (sparse pk spaces) emit null-typed blocks
        # that cannot concat/write alongside the inferred non-empty ones.
        conn = connection_factory()
        try:
            cur = conn.cursor()
            cur.execute(d.probe_one(
                ", ".join(d.quote(c) for c in columns), d.quote(table)
            ))
            probe = cur.fetchone()
        finally:
            conn.close()
        if probe is not None:
            schema = pa.schema([
                (c, pa.array([v]).type) for c, v in zip(columns, probe)
            ])
    if not splits:
        out_schema = schema or pa.schema([(c, pa.null()) for c in columns])
        return ray.data.from_arrow(out_schema.empty_table())
    items = [{"lo": lo, "hi": hi} for lo, hi in splits]
    return ray.data.from_items(items, override_num_blocks=len(items)).map_batches(
        SqlRangeReader(
            connection_factory, table, columns, split_pk, where=where,
            schema=schema, dialect=dialect,
        ),
        batch_format="pyarrow",
        batch_size=None,
    )


class SqlBatchWriter:
    """map_batches sink stage: one batch per executemany, statement text
    from the dialect — DataX's writeMode matrix: `insert` (plain),
    `replace` (full-row overwrite: INSERT OR REPLACE / mysql REPLACE
    INTO), `upsert` (keep-and-update: ON CONFLICT DO UPDATE / ON
    DUPLICATE KEY UPDATE / MERGE; needs key_cols). Each task owns its
    connection and commits per batch; emits one (rows) lineage row."""

    def __init__(
        self,
        connection_factory: Callable,
        table: str,
        columns: list[str],
        mode: str = "insert",
        key_cols: list[str] | None = None,
        dialect="ansi",
    ):
        from datax_ray.sources.dialects import get_dialect

        self.__name__ = "SqlBatchWriter"
        if mode not in ("insert", "replace", "upsert"):
            raise ValueError("mode must be insert|replace|upsert")
        if mode == "upsert" and not key_cols:
            raise ValueError("mode='upsert' needs key_cols")
        self.factory = connection_factory
        self.table = table
        self.columns = columns
        self.mode = mode
        self.key_cols = list(key_cols or [])
        self.dialect = dialect
        # build (and therefore validate) the statement up front so an
        # unsupported mode/dialect pair refuses on the DRIVER, not in a
        # retried task
        self.sql = self._statement(get_dialect(dialect))
        self._conn = None

    def _statement(self, d) -> str:
        tq = d.quote(self.table)
        if self.mode == "insert":
            return d.insert(tq, self.columns)
        if self.mode == "replace":
            return d.replace(tq, self.columns)
        return d.upsert(tq, self.columns, self.key_cols)

    def __call__(self, t: pa.Table) -> pa.Table:
        if self._conn is None:
            self._conn = self.factory()
        data = list(zip(*[t[c].to_pylist() for c in self.columns]))
        self._conn.cursor().executemany(self.sql, data)
        self._conn.commit()
        return pa.table({"rows": pa.array([t.num_rows], pa.int64())})


def write_sql_table(
    ds: ray.data.Dataset,
    connection_factory: Callable,
    table: str,
    columns: list[str],
    mode: str = "insert",
    key_cols: list[str] | None = None,
    dialect="ansi",
) -> int:
    check_identifier(table, "table name")
    for c in columns:
        check_identifier(c, "column name")
    parts = ds.map_batches(
        SqlBatchWriter(connection_factory, table, columns, mode=mode,
                       key_cols=key_cols, dialect=dialect),
        batch_format="pyarrow",
        batch_size=_DEFAULT_BATCH_ROWS,
    ).take_all()
    return sum(int(r["rows"]) for r in parts)


# ------------------------------------------------------------- sql tail --


class _SqlChangeSegmentWriter:
    """map_batches stage for sql_tail: SQL log rows -> one CHANGES-schema
    segment file per batch (deterministic name from the batch's min pk).
    Emits one tiny lineage row; the change rows themselves stay on disk
    for the replay engine."""

    def __init__(self, out_dir: str, pk: str, has_op: bool):
        self.__name__ = "SqlChangeSegmentWriter"
        self.out_dir = out_dir
        self.pk = pk
        self.has_op = has_op

    def __call__(self, t: pa.Table) -> pa.Table:
        import os

        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        if t.num_rows == 0:
            return pa.table({"segment": pa.array([], pa.string()),
                             "rows": pa.array([], pa.int64())})
        lsn = pc.cast(t[self.pk], pa.int64())
        op = (
            pc.cast(t["op"], pa.string())
            if self.has_op
            else pa.array(["insert"] * t.num_rows, pa.string())
        )
        out = pa.table(
            {
                "lsn": lsn,
                "ts": pc.cast(t["ts"], pa.timestamp("us")),
                "op": op,
                "conv_id": pc.cast(t["conv_id"], pa.string()),
                "turn_idx": pc.cast(t["turn_idx"], pa.int32()),
                "role": pc.cast(t["role"], pa.string()),
                "text": pc.cast(t["text"], pa.string()),
                "tool": pc.cast(t["tool"], pa.string()),
                "ddl": pa.nulls(t.num_rows, pa.string()),
            }
        )
        os.makedirs(self.out_dir, exist_ok=True)
        lo = int(pc.min(lsn).as_py())
        path = os.path.join(self.out_dir, f"seg-sql-{lo:015d}.parquet")
        tmp = f"{path}.tmp.{os.getpid()}"
        pq.write_table(out, tmp, compression="zstd", compression_level=1)
        os.replace(tmp, path)
        return pa.table(
            {"segment": pa.array([os.path.basename(path)]),
             "rows": pa.array([out.num_rows], pa.int64())}
        )


def sql_tail(
    connection_factory: Callable,
    table: str,
    lake_dir: str,
    *,
    pk: str = "id",
    out_dir: str | None = None,
    num_splits: int = 8,
    num_partitions: int = 16,
    segments_per_epoch: int = 10_000,
) -> dict:
    """DataX's true incremental story — WHERE-clause deltas over a pk —
    elevated into the CDC engine: poll an append-only SQL LOG table for
    rows with pk > the lake's committed LSN watermark, derive change
    events with lsn = pk inside range-split read tasks, land them as
    segment files, and replay. Exactly-once needs NO extra bookkeeping:
    the lake's lsn_hi IS the SQL watermark, so a crash anywhere re-reads
    the same rows and the watermark filter / LWW fold absorb re-applies.
    An `op` column (insert/update/delete) is honored when the table has
    one; otherwise every row is an upsert. Repeated calls are the polling
    loop; an up-to-date table is a cheap no-op (one MIN/MAX query)."""
    from datax_ray.pipelines.replay import ReplayConfig, replay
    from datax_ray.state.manifest import Manifest

    wm = Manifest(lake_dir).committed_lsn_hi()
    out_dir = out_dir or f"{lake_dir}/_incoming_sql"

    # introspect columns once (drives the optional-op contract)
    conn = connection_factory()
    try:
        cur = conn.cursor()
        cur.execute(f"SELECT * FROM {table} LIMIT 1")
        colnames = [d[0] for d in cur.description]
    finally:
        conn.close()
    has_op = "op" in colnames
    cols = [pk, "ts", "conv_id", "turn_idx", "role", "text", "tool"]
    if has_op:
        cols.append("op")

    # explicit schema: a LIMIT-1 probe can land on a delete row whose
    # payload columns are all NULL, which infers useless null types
    schema = pa.schema(
        [
            (pk, pa.int64()),
            ("ts", pa.int64()),  # integer microseconds in the log table
            ("conv_id", pa.string()),
            ("turn_idx", pa.int64()),
            ("role", pa.string()),
            ("text", pa.string()),
            ("tool", pa.string()),
        ]
        + ([("op", pa.string())] if has_op else [])
    )
    src = read_sql_table(
        connection_factory,
        table=table,
        columns=cols,
        split_pk=pk,
        num_splits=num_splits,
        where=f"{pk} > {wm}",
        schema=schema,
    )
    lineage = src.map_batches(
        _SqlChangeSegmentWriter(out_dir, pk, has_op),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).take_all()  # O(segments) tiny rows
    rows_read = sum(int(r["rows"]) for r in lineage)
    reports = replay(
        ReplayConfig(
            changes_dir=out_dir,
            lake_dir=lake_dir,
            num_partitions=num_partitions,
            segments_per_epoch=segments_per_epoch,
        )
    )
    return {
        "watermark": wm,
        "rows_read": rows_read,
        "segments": len(lineage),
        "epochs": len(reports),
        "new_watermark": Manifest(lake_dir).committed_lsn_hi(),
    }
