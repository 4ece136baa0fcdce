"""SQL dialect layer (sources/dialects.py): generated statement text
pinned per dialect (mysql/postgres/sqlserver/oracle quoting, probes,
param markers, replace/upsert verbs); unsupported pairs refuse on the
driver; the dialects sqlite can execute are proven functionally through
the real range-split reader and batch writer."""

import functools
import sqlite3

import pyarrow as pa
import pytest

from datax_ray.sources.dialects import get_dialect
from datax_ray.sources.sqlsource import (
    SqlBatchWriter,
    read_sql_table,
    write_sql_table,
)

COLS = ["id", "name", "val"]


def test_statement_text_per_dialect():
    a = get_dialect("ansi")
    assert a.insert('"t"', COLS) == (
        'INSERT INTO "t" ("id", "name", "val") VALUES (?, ?, ?)'
    )
    assert a.replace('"t"', COLS).startswith('INSERT OR REPLACE INTO "t"')
    assert a.upsert('"t"', COLS, ["id"]) == (
        'INSERT INTO "t" ("id", "name", "val") VALUES (?, ?, ?) '
        'ON CONFLICT("id") DO UPDATE SET "name" = excluded."name", '
        '"val" = excluded."val"'
    )
    assert a.probe_one('"x"', '"t"') == 'SELECT "x" FROM "t" LIMIT 1'

    m = get_dialect("mysql")
    assert m.quote("tbl") == "`tbl`"
    assert m.insert("`t`", COLS) == (
        "INSERT INTO `t` (`id`, `name`, `val`) VALUES (%s, %s, %s)"
    )
    assert m.replace("`t`", COLS).startswith("REPLACE INTO `t`")
    assert m.upsert("`t`", COLS, ["id"]).endswith(
        "ON DUPLICATE KEY UPDATE `name` = VALUES(`name`), "
        "`val` = VALUES(`val`)"
    )

    p = get_dialect("postgres")
    assert p.param(0) == "%s"
    with pytest.raises(ValueError, match="no REPLACE INTO"):
        p.replace('"t"', COLS)
    assert "ON CONFLICT" in p.upsert('"t"', COLS, ["id"])

    ms = get_dialect("sqlserver")
    assert ms.quote("tbl") == "[tbl]"
    assert ms.probe_one("[x]", "[t]") == "SELECT TOP 1 [x] FROM [t]"
    merge = ms.upsert("[t]", COLS, ["id"])
    assert merge.startswith("MERGE [t] AS t USING")
    assert "WHEN MATCHED THEN UPDATE" in merge
    assert "WHEN NOT MATCHED THEN INSERT" in merge

    o = get_dialect("oracle")
    assert o.param(0) == ":1" and o.param(2) == ":3"
    assert o.probe_one('"x"', '"t"').endswith("FETCH FIRST 1 ROWS ONLY")
    assert "FROM dual" in o.upsert('"t"', COLS, ["id"])

    with pytest.raises(ValueError, match="unknown SQL dialect"):
        get_dialect("db2")


def test_unsupported_pairs_refuse_on_driver():
    for name in ("postgres", "sqlserver", "oracle"):
        with pytest.raises(ValueError, match="REPLACE INTO"):
            SqlBatchWriter(lambda: None, "t", COLS, mode="replace",
                           dialect=name)
    with pytest.raises(ValueError, match="needs key_cols"):
        SqlBatchWriter(lambda: None, "t", COLS, mode="upsert")


def test_sqlite_executes_ansi_and_postgres_grammars(tmp_path, ray_session):
    """Functional proof through the real reader/writer: sqlite executes
    the ANSI dialect end-to-end, and (>=3.24 implements the postgres
    ON CONFLICT grammar) the postgres-style upsert converges a re-write
    instead of duplicating or erroring."""
    db = str(tmp_path / "d.db")
    factory = functools.partial(sqlite3.connect, db, 30.0,
                                check_same_thread=False)
    con = factory()
    con.execute("CREATE TABLE t (id INTEGER PRIMARY KEY, name TEXT, val REAL)")
    con.commit()
    con.close()

    rows = pa.table({
        "id": pa.array(range(100), pa.int64()),
        "name": pa.array([f"n{i}" for i in range(100)]),
        "val": pa.array([float(i) for i in range(100)]),
    })
    import ray.data

    n = write_sql_table(ray.data.from_arrow(rows), factory, "t", COLS,
                        mode="insert", dialect="ansi")
    assert n == 100

    # upsert with the postgres grammar (qmark params still — sqlite's
    # paramstyle; the GRAMMAR under test is ON CONFLICT DO UPDATE)
    from datax_ray.sources.dialects import Dialect

    class PgOnSqlite(Dialect):
        name = "pg-grammar-on-sqlite"

    upd = pa.table({
        "id": pa.array([5, 6, 200], pa.int64()),
        "name": pa.array(["five", "six", "new"]),
        "val": pa.array([5.5, 6.5, 200.0]),
    })
    n2 = write_sql_table(ray.data.from_arrow(upd), factory, "t", COLS,
                         mode="upsert", key_cols=["id"],
                         dialect=PgOnSqlite())
    assert n2 == 3

    back = read_sql_table(factory, "t", COLS, split_pk="id",
                          num_splits=4, dialect="ansi").take_all()
    byid = {r["id"]: r for r in back}
    assert len(byid) == 101
    assert byid[5]["name"] == "five" and byid[5]["val"] == 5.5
    assert byid[200]["name"] == "new"
    assert byid[7]["name"] == "n7"  # untouched row kept
