"""Exactly-once incremental SQL mirror: the mirrored table always equals
the committed lake state, and only dirty ranges are re-applied."""

import functools
import sqlite3

from datax_ray.fixtures.generator import gen_changes, write_segments
from datax_ray.pipelines.mirror import mirror_to_sql
from datax_ray.pipelines.replay import ReplayConfig, replay
from datax_ray.sinks.lake import final_table


def _factory(path):
    return functools.partial(sqlite3.connect, path, 30.0, check_same_thread=False)


def _mirror_rows(db, table="lake_mirror"):
    con = sqlite3.connect(db)
    cols = [d[1] for d in con.execute(f"PRAGMA table_info({table})")]
    rows = con.execute(f"SELECT {', '.join(cols)} FROM {table}").fetchall()
    con.close()
    keep = [i for i, c in enumerate(cols) if c != "_dxrange"]
    return sorted(tuple(r[i] for i in keep) for r in rows), [cols[i] for i in keep]


def _lake_rows(lake):
    t = final_table(lake)
    cols = t.column_names
    recs = [
        tuple(
            v.isoformat() if hasattr(v, "isoformat") else v
            for v in (row[c] for c in cols)
        )
        for row in t.to_pylist()
    ]
    return sorted(recs), cols


def _setup(tmp_path, n_events=3000, **gen_knobs):
    changes = gen_changes(n_events, 50, seed=11, **gen_knobs)
    chg = str(tmp_path / "chg")
    lake = str(tmp_path / "lake")
    write_segments(changes, chg, seg_rows=1000)
    replay(ReplayConfig(changes_dir=chg, lake_dir=lake, num_partitions=16,
                        segments_per_epoch=2))
    return chg, lake, changes


def test_mirror_matches_lake_and_is_incremental(tmp_path):
    chg, lake, changes = _setup(tmp_path)
    db = str(tmp_path / "m.db")

    stats = mirror_to_sql(lake, _factory(db), "lake_mirror")
    assert stats["applied"] > 0 and stats["skipped"] == 0
    got, gcols = _mirror_rows(db)
    want, wcols = _lake_rows(lake)
    assert gcols == wcols
    assert got == want

    # Untouched lake -> pure no-op (no range re-applied).
    stats2 = mirror_to_sql(lake, _factory(db), "lake_mirror")
    assert stats2["applied"] == 0
    assert stats2["skipped"] == stats["applied"]

    # New tail epoch touching few convs; only its ranges re-apply.
    import os

    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    small = gen_changes(300, 4, seed=12)
    shift = changes.num_rows + 1000
    small = small.set_column(
        small.schema.get_field_index("lsn"), "lsn", pc.add(small["lsn"], shift)
    )
    small = small.set_column(
        small.schema.get_field_index("ts"),
        "ts",
        pc.cast(
            pc.add(pc.cast(small["ts"], pa.int64()), shift * 1_000),
            pa.timestamp("us"),
        ),
    )
    pq.write_table(small, os.path.join(chg, f"seg-{shift:012d}.parquet"))
    replay(ReplayConfig(changes_dir=chg, lake_dir=lake, num_partitions=16))
    stats3 = mirror_to_sql(lake, _factory(db), "lake_mirror")
    assert stats3["applied"] > 0
    assert stats3["skipped"] > 0, "a 4-conv tail epoch must leave ranges clean"
    got3, _ = _mirror_rows(db)
    want3, _ = _lake_rows(lake)
    assert got3 == want3


def test_mirror_reapplies_tampered_range_exactly_once(tmp_path):
    """Simulates a lost/partial apply: invalidating one range's recorded
    fingerprint re-applies exactly that range and restores equality."""
    _, lake, _ = _setup(tmp_path)
    db = str(tmp_path / "m.db")
    mirror_to_sql(lake, _factory(db), "lake_mirror")

    con = sqlite3.connect(db)
    rid = con.execute(
        "SELECT range_id FROM lake_mirror__datax_mirror LIMIT 1"
    ).fetchone()[0]
    con.execute(
        "UPDATE lake_mirror__datax_mirror SET fp = 'stale' WHERE range_id = ?",
        (rid,),
    )
    # also corrupt that range's rows — the swap must fully repair them
    con.execute("DELETE FROM lake_mirror WHERE _dxrange = ?", (rid,))
    con.commit()
    con.close()

    stats = mirror_to_sql(lake, _factory(db), "lake_mirror")
    assert stats["applied"] == 1
    got, _ = _mirror_rows(db)
    want, _ = _lake_rows(lake)
    assert got == want


def test_mirror_follows_ddl_schema_evolution(tmp_path):
    _, lake, _ = _setup(tmp_path, with_ddl=True)
    db = str(tmp_path / "m.db")
    mirror_to_sql(lake, _factory(db), "lake_mirror")
    got, gcols = _mirror_rows(db)
    want, wcols = _lake_rows(lake)
    assert gcols == wcols  # DDL-added columns present in the mirror
    assert got == want
