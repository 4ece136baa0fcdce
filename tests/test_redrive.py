"""Dead-letter redrive (pipelines/redrive.py).

Contract: (1) redriving repaired dirty rows yields EXACTLY the lake the
sequential oracle produces from a stream where those rows were never
corrupt — the original (ts, lsn) ride along, so LWW places them correctly
(a repaired row must LOSE to a newer committed version of its key);
(2) consumed dl files are exactly-once (second run is up-to-date / no-op);
(3) rows the fix does not repair re-dead-letter and the lake is unchanged;
(4) fsck stays green through the whole chain.
"""

import pyarrow as pa
import pyarrow.compute as pc

from datax_ray.fixtures.generator import gen_changes, write_segments
from datax_ray.oracle import sequential_replay
from datax_ray.pipelines.redrive import pending_deadletters, redrive
from datax_ray.pipelines.replay import ReplayConfig, replay
from datax_ray.sinks.lake import final_table
from datax_ray.state.manifest import Manifest

from test_replay_e2e import assert_tables_equal

FIX_OP = [{"name": "dx_replace", "column": "op", "pattern": "garbage",
           "replacement": "update"}]


def _fixed(changes: pa.Table) -> pa.Table:
    """The oracle-side equivalent of FIX_OP: op 'garbage' -> 'update'."""
    op = pc.replace_substring(changes["op"], pattern="garbage",
                              replacement="update")
    return changes.set_column(changes.schema.get_field_index("op"), "op", op)


def _setup(tmp_path, tag, **gen_knobs):
    changes = gen_changes(4000, 60, seed=77, corrupt_frac=0.05, **gen_knobs)
    chg = str(tmp_path / f"chg_{tag}")
    lake = str(tmp_path / f"lake_{tag}")
    write_segments(changes, chg, seg_rows=1500)
    cfg = ReplayConfig(changes_dir=chg, lake_dir=lake, num_partitions=8)
    reports = replay(cfg)
    assert sum(r.dirty_rows for r in reports) > 0, "fixture produced no dirty rows"
    return changes, cfg


def test_redrive_fix_matches_oracle(ray_session, tmp_path):
    changes, cfg = _setup(tmp_path, "fix", out_of_order_frac=0.1)
    rep = redrive(cfg, fix_transformers=FIX_OP)
    assert rep["rows_applied"] > 0
    # Oracle: the stream as if the garbage ops had never been corrupted.
    # Equality here also proves the LWW placement of redriven rows: any
    # repaired event older than a committed winner for its key must lose,
    # exactly as in the in-order sequential walk.
    assert_tables_equal(final_table(cfg.lake_dir), sequential_replay(_fixed(changes)))


def test_redrive_exactly_once_and_requeue(ray_session, tmp_path):
    changes, cfg = _setup(tmp_path, "once")
    rep1 = redrive(cfg, fix_transformers=FIX_OP)
    state1 = final_table(cfg.lake_dir)
    # Rows the fix could not repair (null conv_id/ts, negative turn_idx)
    # re-queued into the redrive epoch's own dl dir.
    assert rep1["still_dirty"] > 0
    pend = pending_deadletters(cfg.lake_dir, Manifest(cfg.lake_dir))
    assert pend and all(f"epoch={rep1['epoch']:06d}" in p for p in pend)
    # A second run with the same (insufficient) fix consumes the requeued
    # rows, applies nothing, and leaves the lake state identical.
    rep2 = redrive(cfg, fix_transformers=FIX_OP)
    assert rep2["rows_applied"] == 0
    assert rep2["still_dirty"] == rep1["still_dirty"]
    assert_tables_equal(final_table(cfg.lake_dir), state1)


def test_redrive_up_to_date_when_fully_repaired(ray_session, tmp_path):
    # Hand-built stream: only garbage-op corruption, so ONE fix repairs
    # everything and the next redrive is a true no-op.
    ts = pa.array([1000, 2000, 3000, 4000], pa.timestamp("us"))
    changes = pa.table({
        "lsn": pa.array([1, 2, 3, 4], pa.int64()),
        "ts": ts,
        "op": pa.array(["insert", "garbage", "garbage", "update"]),
        "conv_id": pa.array(["a", "a", "b", "a"]),
        "turn_idx": pa.array([0, 0, 0, 0], pa.int32()),
        "role": pa.array(["user"] * 4),
        "text": pa.array(["v1", "stale-fix", "only-version", "v3"]),
        "tool": pa.array([None] * 4, pa.string()),
        "ddl": pa.array([None] * 4, pa.string()),
    })
    chg = str(tmp_path / "chg_h")
    write_segments(changes, chg, seg_rows=10)
    cfg = ReplayConfig(changes_dir=chg, lake_dir=str(tmp_path / "lake_h"),
                       num_partitions=4)
    replay(cfg)
    rep = redrive(cfg, fix_transformers=FIX_OP)
    assert rep["rows_applied"] == 2 and rep["still_dirty"] == 0
    final = final_table(cfg.lake_dir)
    by_key = {(r["conv_id"], r["turn_idx"]): r["text"] for r in final.to_pylist()}
    # ("a", 0): repaired lsn=2 event LOSES to the committed lsn=4 update.
    assert by_key[("a", 0)] == "v3"
    # ("b", 0): the repaired event is the only version -> appears.
    assert by_key[("b", 0)] == "only-version"
    rep2 = redrive(cfg, fix_transformers=FIX_OP)
    assert rep2.get("epochs") == 0 and "up-to-date" in rep2["status"]


def test_redrive_without_fix_changes_nothing(ray_session, tmp_path):
    changes, cfg = _setup(tmp_path, "nofix")
    before = final_table(cfg.lake_dir)
    rep = redrive(cfg)  # no fix: everything re-fails
    assert rep["rows_applied"] == 0
    assert rep["events_in"] == rep["still_dirty"] > 0
    assert_tables_equal(final_table(cfg.lake_dir), before)
    # every still-dirty row re-queued for the next redrive
    requeued = pending_deadletters(cfg.lake_dir, Manifest(cfg.lake_dir))
    assert requeued and all(f"epoch={rep['epoch']:06d}" in p for p in requeued)
