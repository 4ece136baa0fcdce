"""Lifecycle soak: one lake driven through the full operational
repertoire — incremental ingest, forced compaction, an online layout
migration, time-travel vacuum, tagging, continued ingest — with the
sequential oracle checked after EVERY stage, then a hard purge and a
deep fsck at the end. Each operation has its own test file; this one
asserts the COMPOSITION stays exact."""

import pyarrow as pa
import pyarrow.compute as pc

from datax_ray.fixtures.generator import gen_changes, write_segments
from datax_ray.oracle import sequential_replay
from datax_ray.pipelines.fsck import fsck
from datax_ray.pipelines.purge import purge
from datax_ray.pipelines.repartition import repartition_lake
from datax_ray.pipelines.replay import ReplayConfig, compact_lake, replay
from datax_ray.sinks.lake import final_table
from datax_ray.state.manifest import Manifest
from tests.test_replay_e2e import assert_tables_equal


def _shift(t: pa.Table, lsn_off: int, ts_off_s: int) -> pa.Table:
    t = t.set_column(0, "lsn", pc.cast(pc.add(t["lsn"], lsn_off), pa.int64()))
    return t.set_column(
        1, "ts",
        pc.add(t["ts"], pa.scalar(ts_off_s * 1_000_000, pa.duration("us"))),
    )


def test_lifecycle_soak(tmp_path):
    chg = str(tmp_path / "chg")
    lake = str(tmp_path / "lake")
    cfg = lambda: ReplayConfig(  # noqa: E731
        changes_dir=chg, lake_dir=lake, num_partitions=16,
        segments_per_epoch=2, compact_every=2,
    )
    applied: list[pa.Table] = []

    def ingest(n, seed, lsn_off, ts_off_s, start_seg, **knobs):
        t = _shift(gen_changes(n, 40, seed=seed, **knobs), lsn_off, ts_off_s)
        write_segments(t, chg, seg_rows=max(400, n // 4), start_seg=start_seg)
        applied.append(t)
        replay(cfg())

    def check():
        combined = pa.concat_tables(applied).combine_chunks()
        assert_tables_equal(final_table(lake), sequential_replay(combined))

    ingest(2500, 1, 0, 0, 0, out_of_order_frac=0.1, dup_frac=0.02)
    check()

    compact_lake(cfg())
    check()

    # online layout migration: grow partitions and add a salt mid-life
    repartition_lake(lake, num_partitions=32, salt_turn_width=4)
    check()

    ingest(1500, 2, 1_000_000, 86_400, 20, hot_key_zipf_s=1.2)
    check()

    # tag the head, drop older history, keep ingesting
    m = Manifest(lake)
    m.set_tag("mid", m.committed_epoch())
    m.vacuum(keep_epochs=1)
    check()

    ingest(1500, 3, 2_000_000, 2 * 86_400, 40)
    check()

    # the tag still resolves after more epochs + vacuum
    assert final_table(lake, as_of_epoch=m.resolve_tag("mid")).num_rows > 0

    # hard purge two live conversations, then the final invariants
    live = final_table(lake)
    convs = sorted(set(live["conv_id"].to_pylist()))[:2]
    purge(lake, convs, hard=True)
    got = final_table(lake)
    assert not pc.any(pc.is_in(got["conv_id"], value_set=pa.array(convs))).as_py()
    combined = pa.concat_tables(applied).combine_chunks()
    want = sequential_replay(combined)
    want = want.filter(
        pc.invert(pc.is_in(want["conv_id"], value_set=pa.array(convs)))
    )
    assert_tables_equal(got, want)
    assert fsck(lake, deep=True)["ok"]
