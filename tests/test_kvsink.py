"""Keyed KV sink (sinks/kvsink.py): change-feed → conditional versioned
upserts into a DB-API store equals the lake's live state; incremental
consumer offsets; crash-redelivery idempotence; tombstones never
resurrect; schema evolution adds store columns."""

import functools
import os
import sqlite3

import pyarrow as pa
import pyarrow.compute as pc
import pytest

from datax_ray.fixtures.generator import gen_changes, write_segments
from datax_ray.pipelines.replay import ReplayConfig, replay
from datax_ray.sinks.kvsink import mirror_to_kv, read_kv_table
from datax_ray.sinks.lake import final_table


def _factory(db):
    return functools.partial(sqlite3.connect, db, 30.0, check_same_thread=False)


def _live(lake):
    t = final_table(lake)
    return t.select(
        ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    ).sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])


PAYLOAD = ["role", "text", "tool"]


@pytest.fixture()
def lake(tmp_path, ray_session):
    changes = gen_changes(4000, 60, seed=91, p_delete=0.15,
                          out_of_order_frac=0.1)
    chg = str(tmp_path / "chg")
    lk = str(tmp_path / "lake")
    write_segments(changes, chg, seg_rows=1000)
    replay(ReplayConfig(changes_dir=chg, lake_dir=lk, num_partitions=8,
                        segments_per_epoch=2))
    return changes, chg, lk


def test_kv_mirror_equals_live_state(lake, tmp_path):
    changes, chg, lk = lake
    db = str(tmp_path / "kv.db")
    out = mirror_to_kv(lk, _factory(db), "kv_store")
    assert out["applied"] > 0
    got = read_kv_table(_factory(db), "kv_store", PAYLOAD)
    assert got.equals(_live(lk).select(got.column_names))

    # up to date -> no-op
    out2 = mirror_to_kv(lk, _factory(db), "kv_store")
    assert out2["applied"] == 0


def test_kv_incremental_and_delete_no_resurrect(lake, tmp_path):
    changes, chg, lk = lake
    db = str(tmp_path / "kv.db")
    mirror_to_kv(lk, _factory(db), "kv_store")

    # new epoch: an update then a DELETE of one live key, plus fresh rows
    live = final_table(lk)
    victim_conv = live["conv_id"][0].as_py()
    victim_turn = live["turn_idx"][0].as_py()
    extra = gen_changes(600, 60, seed=93)
    extra = extra.set_column(
        extra.column_names.index("lsn"), "lsn",
        pc.add(extra["lsn"], 5_000_000),
    )
    import datetime as dt

    kill = pa.table({
        "lsn": pa.array([9_000_000], pa.int64()),
        "ts": pa.array([dt.datetime(2031, 1, 1)], pa.timestamp("us")),
        "op": pa.array(["delete"], pa.string()),
        "conv_id": pa.array([victim_conv], pa.string()),
        "turn_idx": pa.array([victim_turn], pa.int32()),
        "role": pa.array([None], pa.string()),
        "text": pa.array([None], pa.string()),
        "tool": pa.array([None], pa.string()),
        "ddl": pa.array([None], pa.string()),
    })
    write_segments(pa.concat_tables([extra, kill]), chg, seg_rows=1000,
                   start_seg=10)
    replay(ReplayConfig(changes_dir=chg, lake_dir=lk, num_partitions=8))

    out = mirror_to_kv(lk, _factory(db), "kv_store")
    assert out["applied"] > 0
    got = read_kv_table(_factory(db), "kv_store", PAYLOAD)
    assert got.equals(_live(lk).select(got.column_names))
    mask = pc.and_(
        pc.equal(got["conv_id"], victim_conv),
        pc.equal(got["turn_idx"], victim_turn),
    )
    assert got.filter(mask).num_rows == 0  # deleted key absent

    # crash-redelivery: roll the consumer offset back to the beginning —
    # the whole feed re-applies; conditional versioned upserts converge
    # to the identical store (older rows cannot resurrect the delete)
    from datax_ray.pipelines.feed import _consumer_path

    os.remove(_consumer_path(lk, "kv__kv_store"))
    out3 = mirror_to_kv(lk, _factory(db), "kv_store")
    assert out3["applied"] >= out["applied"]
    again = read_kv_table(_factory(db), "kv_store", PAYLOAD)
    assert again.equals(got)


def test_kv_schema_evolution_adds_column(lake, tmp_path):
    changes, chg, lk = lake
    db = str(tmp_path / "kv.db")
    mirror_to_kv(lk, _factory(db), "kv_store")

    import datetime as dt

    ddl = pa.table({
        "lsn": pa.array([7_000_000], pa.int64()),
        "ts": pa.array([dt.datetime(2030, 1, 1)], pa.timestamp("us")),
        "op": pa.array(["ddl"], pa.string()),
        "conv_id": pa.array([None], pa.string()),
        "turn_idx": pa.array([None], pa.int32()),
        "role": pa.array([None], pa.string()),
        "text": pa.array([None], pa.string()),
        "tool": pa.array([None], pa.string()),
        "ddl": pa.array(['{"action": "add_column", "name": "lang", "type": "string"}'],
                        pa.string()),
    })
    upd = pa.table({
        "lsn": pa.array([7_000_001], pa.int64()),
        "ts": pa.array([dt.datetime(2030, 1, 2)], pa.timestamp("us")),
        "op": pa.array(["insert"], pa.string()),
        "conv_id": pa.array(["evolved"], pa.string()),
        "turn_idx": pa.array([0], pa.int32()),
        "role": pa.array(["user"], pa.string()),
        "text": pa.array(["hi"], pa.string()),
        "tool": pa.array([""], pa.string()),
        "ddl": pa.array([None], pa.string()),
    })
    write_segments(pa.concat_tables([ddl, upd]), chg, seg_rows=10,
                   start_seg=20)
    replay(ReplayConfig(changes_dir=chg, lake_dir=lk, num_partitions=8))
    mirror_to_kv(lk, _factory(db), "kv_store")
    got = read_kv_table(_factory(db), "kv_store", PAYLOAD + ["lang"])
    live = final_table(lk).select(
        ["conv_id", "turn_idx", "role", "text", "tool", "lang", "ts"]
    ).sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
    assert got.equals(live.select(got.column_names))


def test_kv_mirror_parallel_appliers(lake, tmp_path):
    """concurrency=4 (VERDICT r4 #5): a parallel applier pool over a
    WAL-mode sqlite converges to the exact LWW live state — conditional
    versioned upserts make row order across appliers irrelevant — and the
    consumer offset still advances exactly once."""
    changes, chg, lk = lake
    db = str(tmp_path / "kvp.db")
    prime = sqlite3.connect(db)
    prime.execute("PRAGMA journal_mode=WAL")  # persistent, db-level
    prime.close()

    out = mirror_to_kv(lk, _factory(db), "kv_store", concurrency=4)
    assert out["applied"] > 0
    got = read_kv_table(_factory(db), "kv_store", PAYLOAD)
    assert got.equals(_live(lk).select(got.column_names))

    out2 = mirror_to_kv(lk, _factory(db), "kv_store", concurrency=4)
    assert out2["applied"] == 0
    assert out2["from_epoch"] == out["to_epoch"]
