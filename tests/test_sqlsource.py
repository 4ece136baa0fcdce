"""SQL (JDBC-shaped) source/sink over a sqlite stand-in."""

import functools
import sqlite3

import pyarrow as pa
import ray.data


def _mkdb(path, n=1000):
    con = sqlite3.connect(path)
    con.execute("CREATE TABLE t (pk INTEGER PRIMARY KEY, v INTEGER, s TEXT)")
    con.executemany(
        "INSERT INTO t VALUES (?, ?, ?)",
        [(i, i * 7 % 101, f"s{i}") for i in range(n)],
    )
    con.commit()
    con.close()


def _factory(path):
    return functools.partial(sqlite3.connect, path, 30.0, check_same_thread=False)


def test_split_planning(tmp_path):
    from datax_ray.sources.sqlsource import plan_pk_splits

    db = str(tmp_path / "a.db")
    _mkdb(db, n=100)
    splits = plan_pk_splits(_factory(db), "t", "pk", 4)
    assert len(splits) == 4
    # half-open, contiguous, covering [0, 100)
    assert splits[0][0] == 0 and splits[-1][1] == 100
    assert all(a[1] == b[0] for a, b in zip(splits, splits[1:]))
    # empty table -> no splits
    con = sqlite3.connect(str(tmp_path / "e.db"))
    con.execute("CREATE TABLE t (pk INTEGER, v INTEGER, s TEXT)")
    con.commit(); con.close()
    assert plan_pk_splits(_factory(str(tmp_path / "e.db")), "t", "pk", 4) == []


def test_read_matches_direct_query(tmp_path, ray_session):
    from datax_ray.sources.sqlsource import read_sql_table

    db = str(tmp_path / "b.db")
    _mkdb(db, n=1000)
    schema = pa.schema([("pk", pa.int64()), ("v", pa.int64()), ("s", pa.string())])
    ds = read_sql_table(
        _factory(db), "t", ["pk", "v", "s"], split_pk="pk", num_splits=7,
        where="v % 2 = 0", schema=schema,
    )
    rows = sorted((r["pk"], r["v"], r["s"]) for r in ds.take_all())
    con = sqlite3.connect(db)
    want = sorted(
        (pk, v, s)
        for pk, v, s in con.execute("SELECT pk, v, s FROM t WHERE v % 2 = 0")
    )
    con.close()
    assert rows == want and len(rows) > 0


def test_write_roundtrip(tmp_path, ray_session):
    from datax_ray.sources.sqlsource import read_sql_table, write_sql_table

    src = str(tmp_path / "c.db")
    _mkdb(src, n=500)
    dst = str(tmp_path / "d.db")
    con = sqlite3.connect(dst)
    con.execute("CREATE TABLE t2 (pk INTEGER PRIMARY KEY, v INTEGER)")
    con.commit(); con.close()

    schema = pa.schema([("pk", pa.int64()), ("v", pa.int64())])
    ds = read_sql_table(_factory(src), "t", ["pk", "v"], split_pk="pk",
                        num_splits=4, schema=schema)
    n = write_sql_table(ds, _factory(dst), "t2", ["pk", "v"], mode="replace")
    assert n == 500
    # idempotent re-run under replace mode (DataX writeMode=replace)
    n2 = write_sql_table(ds, _factory(dst), "t2", ["pk", "v"], mode="replace")
    assert n2 == 500
    con = sqlite3.connect(dst)
    assert con.execute("SELECT COUNT(*), SUM(v) FROM t2").fetchone() == \
        sqlite3.connect(src).execute("SELECT COUNT(*), SUM(v) FROM t").fetchone()
    con.close()


def test_bootstrap_from_sql_source(tmp_path):
    """DataX's JDBC-full-sync -> lake story: bootstrap epoch 0 from a
    range-split sqlite read, tail the change log on top, and match the
    sequential oracle replayed over the same base snapshot."""
    import functools
    import sqlite3

    import pyarrow as pa

    from datax_ray.fixtures.generator import gen_changes, gen_transcripts, write_segments
    from datax_ray.oracle import sequential_replay
    from datax_ray.pipelines.bootstrap import bootstrap
    from datax_ray.pipelines.replay import ReplayConfig, replay
    from datax_ray.schemas import LAKE_SCHEMA
    from datax_ray.sinks.lake import final_table
    from datax_ray.sources.sqlsource import read_sql_table

    snap = gen_transcripts(n_convs=120, seed=4)
    db = str(tmp_path / "snap.db")
    con = sqlite3.connect(db)
    con.execute(
        "CREATE TABLE transcripts "
        "(conv_id TEXT, turn_idx INT, role TEXT, text TEXT, tool TEXT, ts INT)"
    )
    con.executemany(
        "INSERT INTO transcripts VALUES (?,?,?,?,?,?)",
        [
            (r["conv_id"], r["turn_idx"], r["role"], r["text"], r["tool"],
             int(r["ts"].timestamp() * 1_000_000))
            for r in snap.to_pylist()
        ],
    )
    con.commit()
    con.close()

    cols = [f.name for f in LAKE_SCHEMA if not f.name.startswith("_")]
    src_ds = read_sql_table(
        functools.partial(sqlite3.connect, db, 30.0, check_same_thread=False),
        "transcripts",
        columns=cols,
        split_pk="rowid",
        num_splits=6,
        schema=pa.schema(
            [(f.name, f.type) for f in LAKE_SCHEMA if not f.name.startswith("_")]
        ),
    )

    lake = str(tmp_path / "lake")
    cfg = ReplayConfig(changes_dir="", lake_dir=lake, num_partitions=8)
    rep = bootstrap(None, cfg, src_ds=src_ds, src_label="snap.db:transcripts")
    assert rep.rows_out == snap.num_rows

    changes = gen_changes(2500, 120, seed=5)
    chg = str(tmp_path / "chg")
    write_segments(changes, chg, seg_rows=1000)
    replay(ReplayConfig(changes_dir=chg, lake_dir=lake, num_partitions=8))

    assert final_table(lake).equals(sequential_replay(changes, base=snap))


def test_sparse_splitpk_empty_ranges_align(tmp_path):
    """A sparse pk space (most split ranges empty) with NO declared schema
    must still produce type-aligned blocks: the reader probes one row to
    pin the schema, so empty ranges emit typed empties, not null-typed
    blocks that break concat/write."""
    import functools
    import sqlite3

    from datax_ray.sources.sqlsource import read_sql_table

    db = str(tmp_path / "sparse.db")
    con = sqlite3.connect(db)
    con.execute("CREATE TABLE t (pk INTEGER PRIMARY KEY, name TEXT)")
    con.executemany(
        "INSERT INTO t VALUES (?, ?)", [(1, "a"), (1_000_000, "b")]
    )
    con.commit()
    con.close()

    ds = read_sql_table(
        functools.partial(sqlite3.connect, db, 30.0, check_same_thread=False),
        "t",
        columns=["pk", "name"],
        split_pk="pk",
        num_splits=16,  # 14+ ranges come back empty
    )
    df = ds.to_pandas()
    assert sorted(df["pk"]) == [1, 1_000_000]
    assert sorted(df["name"]) == ["a", "b"]


def _log_db(path, changes):
    """Materialize a change table as an append-only SQL log (id = lsn,
    ts as integer microseconds)."""
    import pyarrow.compute as pc

    con = sqlite3.connect(path)
    con.execute(
        "CREATE TABLE IF NOT EXISTS log (id INTEGER PRIMARY KEY, ts INTEGER,"
        " op TEXT, conv_id TEXT, turn_idx INTEGER, role TEXT, text TEXT,"
        " tool TEXT)"
    )
    rows = list(
        zip(
            changes["lsn"].to_pylist(),
            pc.cast(changes["ts"], pa.int64()).to_pylist(),
            changes["op"].to_pylist(),
            changes["conv_id"].to_pylist(),
            changes["turn_idx"].to_pylist(),
            changes["role"].to_pylist(),
            changes["text"].to_pylist(),
            changes["tool"].to_pylist(),
        )
    )
    con.executemany("INSERT INTO log VALUES (?,?,?,?,?,?,?,?)", rows)
    con.commit()
    con.close()


def test_sql_tail_incremental_sync(tmp_path, ray_session):
    """DataX's WHERE-clause incremental mode through the CDC engine: poll
    an append-only SQL log, replay deltas with lsn = pk. First poll full
    sync, second poll only the delta, third poll a no-op; the lake always
    equals the sequential oracle over the whole log; op=delete honored."""
    import pyarrow.compute as pc

    from datax_ray.fixtures.generator import gen_changes
    from datax_ray.oracle import sequential_replay
    from datax_ray.sinks.lake import final_table
    from datax_ray.sources.sqlsource import sql_tail

    db = str(tmp_path / "log.db")
    lake = str(tmp_path / "lake")
    changes = gen_changes(3000, 50, seed=41, dup_frac=0.0)
    _log_db(db, changes)

    out1 = sql_tail(_factory(db), "log", lake, pk="id", num_partitions=8)
    assert out1["rows_read"] == 3000 and out1["epochs"] == 1
    got = final_table(lake).to_pandas().to_dict("records")
    assert got == sequential_replay(changes).to_pandas().to_dict("records")

    # delta: new rows land in the log (strictly increasing pk and ts)
    more = gen_changes(800, 50, seed=43, dup_frac=0.0)
    more = more.set_column(0, "lsn", pc.cast(pc.add(more["lsn"], 3000), pa.int64()))
    more = more.set_column(
        1, "ts", pc.add(more["ts"], pa.scalar(86_400_000_000, pa.duration("us")))
    )
    _log_db(db, more)
    out2 = sql_tail(_factory(db), "log", lake, pk="id", num_partitions=8)
    assert out2["watermark"] == out1["new_watermark"]
    assert out2["rows_read"] == 800
    combined = pa.concat_tables([changes, more]).combine_chunks()
    got2 = final_table(lake).to_pandas().to_dict("records")
    assert got2 == sequential_replay(combined).to_pandas().to_dict("records")

    # up to date -> cheap no-op
    out3 = sql_tail(_factory(db), "log", lake, pk="id", num_partitions=8)
    assert out3["rows_read"] == 0 and out3["epochs"] == 0
    assert out3["new_watermark"] == out2["new_watermark"]


def test_sql_tail_without_op_column(tmp_path, ray_session):
    """A log table with no `op` column: every row is an upsert (the plain
    DataX incremental case); LWW by (ts, lsn=pk) still resolves multiple
    rows per key to the latest."""
    import pyarrow.compute as pc

    from datax_ray.fixtures.generator import gen_changes
    from datax_ray.oracle import sequential_replay
    from datax_ray.sinks.lake import final_table
    from datax_ray.sources.sqlsource import sql_tail

    db = str(tmp_path / "plain.db")
    lake = str(tmp_path / "lake")
    changes = gen_changes(1200, 30, seed=47, dup_frac=0.0, p_delete=0.0)
    con = sqlite3.connect(db)
    con.execute(
        "CREATE TABLE log (id INTEGER PRIMARY KEY, ts INTEGER, conv_id TEXT,"
        " turn_idx INTEGER, role TEXT, text TEXT, tool TEXT)"
    )
    con.executemany(
        "INSERT INTO log VALUES (?,?,?,?,?,?,?)",
        list(zip(
            changes["lsn"].to_pylist(),
            pc.cast(changes["ts"], pa.int64()).to_pylist(),
            changes["conv_id"].to_pylist(),
            changes["turn_idx"].to_pylist(),
            changes["role"].to_pylist(),
            changes["text"].to_pylist(),
            changes["tool"].to_pylist(),
        )),
    )
    con.commit()
    con.close()

    out = sql_tail(_factory(db), "log", lake, pk="id", num_partitions=4)
    assert out["rows_read"] == 1200
    # oracle: the same stream with every op forced to insert (upsert)
    upserts = changes.set_column(
        2, "op", pa.array(["insert"] * changes.num_rows, pa.string())
    )
    got = final_table(lake).to_pandas().to_dict("records")
    assert got == sequential_replay(upserts).to_pandas().to_dict("records")


def test_identifier_validation_refuses_injection():
    """ADVICE r3: table/column names are interpolated into generated SQL
    (DB-API has no identifier binding) — non-identifier names must refuse
    with a clear error before any SQL runs."""
    import pytest

    from datax_ray.sources.sqlsource import check_identifier, read_sql_table

    for bad in ("t; DROP TABLE x", 'a"b', "has space", "", "1start"):
        with pytest.raises(ValueError, match="invalid SQL"):
            check_identifier(bad)
    check_identifier("good_Name2")
    with pytest.raises(ValueError, match="invalid SQL"):
        read_sql_table(lambda: None, "bad name", ["c"], "pk")
    with pytest.raises(ValueError, match="invalid SQL"):
        read_sql_table(lambda: None, "t", ["bad col"], "pk")
    with pytest.raises(ValueError, match="invalid SQL"):
        read_sql_table(lambda: None, "t", ["c"], "bad pk")


def test_sql_bootstrap_then_tail_equals_full_resync(tmp_path, ray_session):
    """The full DataX migration story over DB-API, composed end-to-end:
    splitPk-range BOOTSTRAP from a SQL snapshot table (epoch 0), then
    multi-poll incremental TAIL of the SQL log (pk > lsn watermark per
    epoch) — the lake after N polls equals the sequential oracle of
    snapshot + whole log, i.e. a full resync from scratch."""
    import pyarrow.compute as pc

    from datax_ray.fixtures.generator import gen_changes, gen_transcripts
    from datax_ray.oracle import sequential_replay
    from datax_ray.pipelines.bootstrap import bootstrap
    from datax_ray.pipelines.replay import ReplayConfig
    from datax_ray.sinks.lake import final_table
    from datax_ray.sources.sqlsource import read_sql_table, sql_tail

    db = str(tmp_path / "src.db")
    lake = str(tmp_path / "lake")

    # snapshot table (the pre-existing warehouse state)
    snap = gen_transcripts(n_convs=40, seed=7)
    con = sqlite3.connect(db)
    con.execute(
        "CREATE TABLE snap (rowid_pk INTEGER PRIMARY KEY, conv_id TEXT,"
        " turn_idx INTEGER, role TEXT, text TEXT, tool TEXT, ts INTEGER)"
    )
    con.executemany(
        "INSERT INTO snap VALUES (?,?,?,?,?,?,?)",
        list(zip(
            range(snap.num_rows),
            snap["conv_id"].to_pylist(),
            snap["turn_idx"].to_pylist(),
            snap["role"].to_pylist(),
            snap["text"].to_pylist(),
            snap["tool"].to_pylist(),
            pc.cast(snap["ts"], pa.int64()).to_pylist(),
        )),
    )
    con.commit()
    con.close()

    def to_ts(t: pa.Table) -> pa.Table:
        return t.set_column(
            t.column_names.index("ts"), "ts",
            pc.cast(t["ts"], pa.timestamp("us")),
        ).drop_columns(["rowid_pk"])

    src = read_sql_table(
        _factory(db), "snap",
        columns=["rowid_pk", "conv_id", "turn_idx", "role", "text", "tool", "ts"],
        split_pk="rowid_pk", num_splits=4,
    ).map_batches(to_ts, batch_format="pyarrow")
    bootstrap(None, ReplayConfig(changes_dir=str(tmp_path / "nochg"),
                                 lake_dir=lake, num_partitions=8),
              src_ds=src, src_label="sql:snap")

    # two tail polls over a growing log (ts after the snapshot's)
    log1 = gen_changes(1500, 40, seed=51, dup_frac=0.0)
    ts_bump = pa.scalar(4_000_000_000_000_000, pa.duration("us"))
    log1 = log1.set_column(1, "ts", pc.add(log1["ts"], ts_bump))
    _log_db(db, log1)
    sql_tail(_factory(db), "log", lake, pk="id", num_partitions=8)

    log2 = gen_changes(600, 40, seed=53, dup_frac=0.0)
    log2 = log2.set_column(0, "lsn", pc.cast(pc.add(log2["lsn"], 1500), pa.int64()))
    log2 = log2.set_column(
        1, "ts", pc.add(pc.add(log2["ts"], ts_bump),
                        pa.scalar(86_400_000_000, pa.duration("us")))
    )
    _log_db(db, log2)
    out = sql_tail(_factory(db), "log", lake, pk="id", num_partitions=8)
    assert out["rows_read"] == 600

    full_log = pa.concat_tables([log1, log2]).combine_chunks()
    want = sequential_replay(full_log, base=snap)
    got = final_table(lake).to_pandas().to_dict("records")
    assert got == want.to_pandas().to_dict("records")
