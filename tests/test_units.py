"""Stage-level unit tests (SURVEY.md §5.6)."""

import json

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from datax_ray.schemas import CHANGES_SCHEMA, LAKE_SCHEMA, schema_from_json, schema_to_json
from datax_ray.stages.merge import apply_events, lww_reduce
from datax_ray.stages.partitioning import part_ids_for
from datax_ray.state.schema_tracker import SchemaTracker
from datax_ray.validation import valid_event_mask


def ev_table(rows: list[dict]) -> pa.Table:
    cols = {}
    for f in CHANGES_SCHEMA:
        cols[f.name] = pa.array([r.get(f.name) for r in rows], f.type)
    return pa.table(cols)


def test_lww_ties_broken_by_lsn():
    t = ev_table(
        [
            dict(lsn=1, ts=100, op="insert", conv_id="a", turn_idx=0, text="one"),
            dict(lsn=2, ts=100, op="update", conv_id="a", turn_idx=0, text="two"),
        ]
    )
    w = lww_reduce(t)
    assert w.num_rows == 1
    assert w["text"][0].as_py() == "two"


def test_lww_late_event_loses():
    t = ev_table(
        [
            dict(lsn=5, ts=500, op="update", conv_id="a", turn_idx=1, text="new"),
            dict(lsn=9, ts=100, op="update", conv_id="a", turn_idx=1, text="late-stale"),
        ]
    )
    w = lww_reduce(t)
    assert w["text"][0].as_py() == "new"


def test_apply_events_delete_tombstone_beats_stale_update():
    # epoch 1: insert + delete; epoch 2: stale update (older ts) must NOT resurrect
    e1 = ev_table(
        [
            dict(lsn=1, ts=100, op="insert", conv_id="a", turn_idx=0, text="x", role="user", tool=""),
            dict(lsn=2, ts=300, op="delete", conv_id="a", turn_idx=0),
        ]
    )
    schema = LAKE_SCHEMA
    state1 = apply_events(None, e1.drop_columns(["ddl"]), schema)
    assert state1.num_rows == 1  # tombstone row
    assert state1["_deleted"][0].as_py() is True
    e2 = ev_table(
        [dict(lsn=3, ts=200, op="update", conv_id="a", turn_idx=0, text="stale", role="user", tool="")]
    )
    state2 = apply_events(state1, e2.drop_columns(["ddl"]), schema)
    assert state2.num_rows == 1
    assert state2["_deleted"][0].as_py() is True  # still deleted


def test_apply_events_resurrect_with_newer_insert():
    e1 = ev_table([dict(lsn=1, ts=300, op="delete", conv_id="a", turn_idx=0)])
    schema = LAKE_SCHEMA
    s1 = apply_events(None, e1.drop_columns(["ddl"]), schema)
    e2 = ev_table(
        [dict(lsn=2, ts=400, op="insert", conv_id="a", turn_idx=0, text="back", role="user", tool="")]
    )
    s2 = apply_events(s1, e2.drop_columns(["ddl"]), schema)
    assert s2["_deleted"][0].as_py() is False
    assert s2["text"][0].as_py() == "back"


def test_part_ids_stable_and_salted():
    conv = pa.array(["a", "b", "a", "c", "a"])
    turn = pa.array([0, 0, 7, 0, 15], pa.int32())
    p1 = part_ids_for(conv, turn, 8)
    p2 = part_ids_for(conv, turn, 8)
    assert p1.equals(p2)
    # unsalted: same conv -> same partition
    vals = p1.to_pylist()
    assert vals[0] == vals[2] == vals[4]
    # salted by turn//4: same (conv, turn-bucket) -> same partition; key locality holds
    s1 = part_ids_for(conv, turn, 8, salt_turn_width=4).to_pylist()
    s2 = part_ids_for(conv, turn, 8, salt_turn_width=4).to_pylist()
    assert s1 == s2


def test_schema_tracker_add_and_widen():
    tr = SchemaTracker(LAKE_SCHEMA)
    tr.apply_ddl(json.dumps({"action": "add_column", "name": "lang", "type": "string"}))
    assert tr.schema.field("lang").type == pa.string()
    # _lsn stays last-ish (after payload)
    names = tr.schema.names
    assert names.index("lang") < names.index("_lsn")
    tr.apply_ddl(json.dumps({"action": "widen", "name": "turn_idx", "type": "int64"}))
    assert tr.schema.field("turn_idx").type == pa.int64()
    with pytest.raises(ValueError):
        tr.apply_ddl(json.dumps({"action": "widen", "name": "turn_idx", "type": "int32"}))
    # serde round-trip
    assert schema_from_json(schema_to_json(tr.schema)).equals(tr.schema)


def test_schema_tracker_drop():
    tr = SchemaTracker(LAKE_SCHEMA)
    tr.apply_ddl(json.dumps({"action": "drop_column", "name": "tool"}))
    assert "tool" not in tr.schema.names
    # idempotent: re-drop of an absent column is a no-op
    tr.apply_ddl(json.dumps({"action": "drop_column", "name": "tool"}))
    assert "tool" not in tr.schema.names
    # unify sheds the dropped column from pre-DDL tables
    old = LAKE_SCHEMA.empty_table()
    assert "tool" not in tr.unify(old).column_names
    # keying/ordering columns are protected
    for col in ("conv_id", "turn_idx", "ts", "_lsn"):
        with pytest.raises(ValueError):
            tr.apply_ddl(json.dumps({"action": "drop_column", "name": col}))
    # a dropped column can be re-added (comes back all-null downstream)
    tr.apply_ddl(json.dumps({"action": "add_column", "name": "tool", "type": "string"}))
    assert tr.schema.field("tool").type == pa.string()


def test_schema_tracker_rename():
    from datax_ray.schemas import renames_of, schema_to_json

    tr = SchemaTracker(LAKE_SCHEMA)
    tr.apply_ddl(json.dumps({"action": "rename_column", "name": "role", "to": "speaker"}))
    assert "speaker" in tr.schema.names and "role" not in tr.schema.names
    assert renames_of(tr.schema) == {"role": "speaker"}
    # idempotent re-apply is a no-op
    tr.apply_ddl(json.dumps({"action": "rename_column", "name": "role", "to": "speaker"}))
    # chained rename composes to a direct historical -> current map
    tr.apply_ddl(json.dumps({"action": "rename_column", "name": "speaker", "to": "who"}))
    assert renames_of(tr.schema) == {"role": "who", "speaker": "who"}
    # the map survives the manifest serde round trip
    rt = schema_from_json(schema_to_json(tr.schema))
    assert renames_of(rt) == {"role": "who", "speaker": "who"}
    # unify remaps a pre-rename table's column (no null-fill data loss)
    old = pa.table({"role": pa.array(["user"])})
    assert tr.unify(old, columns=["who"])["who"].to_pylist() == ["user"]
    # protected columns cannot be renamed (either side)
    for bad in (("conv_id", "x"), ("text", "ts")):
        with pytest.raises(ValueError):
            tr.apply_ddl(json.dumps(
                {"action": "rename_column", "name": bad[0], "to": bad[1]}))


def test_schema_tracker_unify():
    tr = SchemaTracker(LAKE_SCHEMA)
    tr.apply_ddl(json.dumps({"action": "add_column", "name": "lang", "type": "string"}))
    old = pa.table(
        {
            "conv_id": pa.array(["a"]),
            "turn_idx": pa.array([1], pa.int32()),
            "role": pa.array(["user"]),
            "text": pa.array(["t"]),
            "tool": pa.array([""]),
            "ts": pa.array([0], pa.timestamp("us")),
            "_lsn": pa.array([0], pa.int64()),
            "_deleted": pa.array([False]),
        }
    )
    u = tr.unify(old)
    assert "lang" in u.column_names
    assert u["lang"].null_count == 1


def test_valid_event_mask():
    t = ev_table(
        [
            dict(lsn=1, ts=1, op="insert", conv_id="a", turn_idx=0),
            dict(lsn=2, ts=1, op="insert", conv_id=None, turn_idx=0),
            dict(lsn=3, ts=None, op="insert", conv_id="a", turn_idx=0),
            dict(lsn=4, ts=1, op="insert", conv_id="a", turn_idx=-1),
            dict(lsn=5, ts=1, op="garbage", conv_id="a", turn_idx=0),
            dict(lsn=None, ts=1, op="insert", conv_id="a", turn_idx=0),
        ]
    )
    assert valid_event_mask(t).to_pylist() == [True, False, False, False, False, False]


def test_rate_limit_caps_throughput(tmp_path, ray_session):
    """DataX job.setting.speed analog: a 5k events/s cap makes a 15k-event
    replay take >= ~2s; uncapped it is much faster."""
    import time

    from datax_ray.fixtures.generator import gen_changes_dir
    from datax_ray.pipelines.replay import ReplayConfig, replay

    chg = str(tmp_path / "chg_rate")
    gen_changes_dir(chg, n_events=15_000, n_convs=200, seed=6, seg_rows=15_000)

    t0 = time.perf_counter()
    replay(ReplayConfig(changes_dir=chg, lake_dir=str(tmp_path / "l1"),
                        num_partitions=4))
    uncapped = time.perf_counter() - t0

    t0 = time.perf_counter()
    replay(ReplayConfig(changes_dir=chg, lake_dir=str(tmp_path / "l2"),
                        num_partitions=4, max_events_per_sec=5_000,
                        batch_size=5_000))
    capped = time.perf_counter() - t0
    # 15k events at 5k/s with a 1s burst bucket => >= ~1.5s of enforced wait
    assert capped > uncapped + 1.0
    assert capped >= 1.5


def test_lww_reduce_property_random(ray_session):
    """Property: lww_reduce equals a brute-force per-key python argmax on
    random tables (keys collide heavily, order values duplicate)."""
    import numpy as np
    import pyarrow as pa
    from hypothesis import given, settings, strategies as st

    from datax_ray.stages.merge import lww_reduce

    @settings(max_examples=30, deadline=None)
    @given(st.integers(0, 2**31 - 1), st.integers(1, 300))
    def check(seed, n):
        rng = np.random.default_rng(seed)
        conv = rng.integers(0, 8, size=n)
        t = pa.table(
            {
                "conv_id": pa.array([f"c{v}" for v in conv], pa.string()),
                "turn_idx": pa.array(rng.integers(0, 5, size=n).astype("int32")),
                "ts": pa.array(rng.integers(0, 50, size=n), pa.timestamp("us")),
                "lsn": pa.array(rng.permutation(n).astype("int64")),
                "v": pa.array(rng.integers(0, 1000, size=n)),
            }
        )
        got = {
            (r["conv_id"], r["turn_idx"]): (r["ts"], r["lsn"], r["v"])
            for r in lww_reduce(t).to_pylist()
        }
        want: dict = {}
        for r in t.to_pylist():
            k = (r["conv_id"], r["turn_idx"])
            cand = (r["ts"], r["lsn"], r["v"])
            if k not in want or cand[:2] > want[k][:2]:
                want[k] = cand
        assert got == want

    check()


def test_layout_frozen_on_resume(tmp_path, ray_session):
    """Resuming with DIFFERENT partitions/frag_ranges must keep the layout
    committed at epoch 0 — otherwise rows would shift across files."""
    from datax_ray.fixtures.generator import gen_changes_dir
    from datax_ray.oracle import sequential_replay
    from datax_ray.pipelines.replay import ReplayConfig, replay
    from datax_ray.sinks.lake import final_table
    from datax_ray.state.manifest import Manifest
    import pyarrow.dataset as pads
    import glob

    chg = str(tmp_path / "chg_layout")
    gen_changes_dir(chg, n_events=6000, n_convs=100, seed=8, seg_rows=2000)
    lake = str(tmp_path / "lake_layout")
    replay(ReplayConfig(changes_dir=chg, lake_dir=lake, num_partitions=16,
                        frag_ranges=8, segments_per_epoch=2))
    # resume the tail with conflicting cfg: frozen layout must win
    replay(ReplayConfig(changes_dir=chg, lake_dir=lake, num_partitions=64,
                        frag_ranges=32, segments_per_epoch=2))
    assert Manifest(lake).committed_layout() == {
        "num_partitions": 16, "frag_ranges": 8, "salt_turn_width": None,
    }
    changes = pads.dataset(sorted(glob.glob(f"{chg}/seg-*.parquet"))).to_table()
    ours = final_table(lake)
    assert ours.equals(sequential_replay(changes))


def test_salt_turn_width_frozen_on_resume(tmp_path, ray_session):
    """salt_turn_width is part of the frozen layout: a lake bootstrapped
    WITH salting must keep routing keys with that salt when a later replay
    omits the flag — otherwise keys shift ranges and LWW never sees both
    versions of a key together (duplicate keys / resurrected rows)."""
    import glob

    import pyarrow.dataset as pads
    import pyarrow.parquet as pq

    from datax_ray.fixtures.generator import gen_changes, gen_transcripts, write_segments
    from datax_ray.oracle import sequential_replay
    from datax_ray.pipelines.bootstrap import bootstrap
    from datax_ray.pipelines.replay import ReplayConfig, replay
    from datax_ray.sinks.lake import final_table
    from datax_ray.state.manifest import Manifest

    snap = gen_transcripts(n_convs=40, seed=21)
    snap_path = str(tmp_path / "snap.parquet")
    pq.write_table(snap, snap_path)
    chg = str(tmp_path / "chg_salt")
    write_segments(gen_changes(3000, 40, seed=22, hot_key_zipf_s=1.2), chg, seg_rows=1000)
    lake = str(tmp_path / "lake_salt")
    cfg_salted = ReplayConfig(changes_dir=chg, lake_dir=lake, num_partitions=16,
                              salt_turn_width=4, segments_per_epoch=1)
    bootstrap(snap_path, cfg_salted)
    # replay WITHOUT the salt flag: the committed layout's salt must win
    replay(ReplayConfig(changes_dir=chg, lake_dir=lake, num_partitions=16,
                        segments_per_epoch=1))
    assert Manifest(lake).committed_layout()["salt_turn_width"] == 4
    changes = pads.dataset(sorted(glob.glob(f"{chg}/seg-*.parquet"))).to_table()
    assert final_table(lake).equals(sequential_replay(changes, base=snap))
