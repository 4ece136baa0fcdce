"""RESTORE (pipelines/replay.py:restore_lake) — Delta-style rollback of
the lake's visible state to a retained epoch by reference (one data-free
commit). CDC contract under test:

- restored state == the time-travel read AS OF the target epoch;
- the ingest watermark stays at HEAD: segments committed after the
  target never re-apply (their changes are discarded permanently), while
  genuinely NEW events (lsn > head watermark) land on the restored state
  exactly as LWW dictates;
- feed windows crossing a restore epoch refuse loudly (a restore is not
  a fragment delta); re-anchoring at the restore epoch works;
- restoring to a vacuumed epoch / an empty lake / past head refuses;
  restore-to-head is a no-op commit-nothing.
"""

import pyarrow as pa
import pyarrow.compute as pc
import pytest

from datax_ray.fixtures.generator import gen_changes, write_segments
from datax_ray.oracle import sequential_replay
from datax_ray.pipelines.feed import read_change_feed
from datax_ray.pipelines.replay import ReplayConfig, replay, restore_lake
from datax_ray.sinks.lake import final_table
from datax_ray.state.manifest import Manifest

from tests.test_replay_e2e import assert_tables_equal


def _lake_with_epochs(tmp_path, n_events=3000, n_convs=50, seed=21):
    """Replay one log as several epochs; returns (lake, chg_dir, changes)."""
    changes = gen_changes(n_events, n_convs, seed=seed, out_of_order_frac=0.1)
    chg = str(tmp_path / "chg")
    write_segments(changes, chg, seg_rows=500)
    lake = str(tmp_path / "lake")
    replay(ReplayConfig(changes_dir=chg, lake_dir=lake, num_partitions=8,
                        segments_per_epoch=2))
    return lake, chg, changes


def test_restore_state_equals_time_travel(tmp_path, ray_session):
    lake, _, _ = _lake_with_epochs(tmp_path)
    m = Manifest(lake)
    head = m.committed_epoch()
    target = head - 2
    expected = final_table(lake, as_of_epoch=target)
    out = restore_lake(lake, to_epoch=target)
    assert out["epoch"] == head + 1 and out["restored_to"] == target
    assert_tables_equal(final_table(lake), expected)
    # watermark untouched: re-running replay finds nothing to do
    assert m.committed_lsn_hi() == m.at_epoch(head)["lsn_hi"]
    reports = replay(ReplayConfig(changes_dir=str(tmp_path / "chg"),
                                  lake_dir=lake, num_partitions=8))
    assert reports == []  # nothing pending
    assert m.committed_epoch() == head + 1  # no new epoch committed
    assert_tables_equal(final_table(lake), expected)


def test_restore_then_new_events_fold_lww(tmp_path, ray_session):
    """Discarded changes stay discarded; NEW events (lsn > head watermark)
    apply to the restored state — expected = sequential oracle over
    (events with lsn <= target's watermark) + (the new events)."""
    lake, chg, changes = _lake_with_epochs(tmp_path)
    m = Manifest(lake)
    head = m.committed_epoch()
    target = head - 1
    cut = m.at_epoch(target)["lsn_hi"]
    restore_lake(lake, to_epoch=target)
    lsn0 = int(pc.max(changes["lsn"]).as_py()) + 1
    new = gen_changes(800, 50, seed=77)
    new = new.set_column(new.schema.get_field_index("lsn"), "lsn",
                         pc.add(pc.cast(new["lsn"], "int64"), lsn0))
    write_segments(new, chg, seg_rows=400, start_seg=100)
    replay(ReplayConfig(changes_dir=chg, lake_dir=lake, num_partitions=8))
    kept = changes.filter(pc.less_equal(pc.cast(changes["lsn"], "int64"), cut))
    expected = sequential_replay(
        pa.concat_tables([kept, new], promote_options="default")
    )
    assert_tables_equal(final_table(lake), expected)


def test_restore_feed_guard_and_reanchor(tmp_path, ray_session):
    lake, _, _ = _lake_with_epochs(tmp_path)
    m = Manifest(lake)
    head = m.committed_epoch()
    restore_lake(lake, to_epoch=head - 1)
    restore_epoch = m.committed_epoch()
    # a window crossing the restore refuses loudly
    with pytest.raises(ValueError, match="RESTORE epoch"):
        read_change_feed(lake, from_epoch=-1)
    with pytest.raises(ValueError, match="RESTORE epoch"):
        read_change_feed(lake, from_epoch=head - 1, to_epoch=restore_epoch)
    # re-anchoring AT the restore epoch works (empty until new epochs land)
    ds = read_change_feed(lake, from_epoch=restore_epoch)
    assert ds.count() == 0
    # windows wholly BEFORE the restore stay readable
    assert read_change_feed(lake, from_epoch=-1, to_epoch=head - 1).count() > 0


def test_restore_guards(tmp_path, ray_session):
    lake, _, _ = _lake_with_epochs(tmp_path)
    m = Manifest(lake)
    head = m.committed_epoch()
    # no-op restore to head
    assert restore_lake(lake, to_epoch=head)["noop"] is True
    assert m.committed_epoch() == head
    # exactly one of to_epoch / to_tag
    with pytest.raises(ValueError, match="exactly one"):
        restore_lake(lake)
    with pytest.raises(ValueError, match="exactly one"):
        restore_lake(lake, to_epoch=0, to_tag="x")
    # beyond head
    with pytest.raises(ValueError, match="beyond head"):
        restore_lake(lake, to_epoch=head + 5)
    # vacuumed target: drop history, then ask for an early epoch
    m.vacuum(keep_epochs=1)
    with pytest.raises(ValueError, match="not retained"):
        restore_lake(lake, to_epoch=0)
    # empty lake
    with pytest.raises(ValueError, match="empty lake"):
        restore_lake(str(tmp_path / "nolake"), to_epoch=0)


def test_restore_via_tag_survives_vacuum(tmp_path, ray_session):
    """tag → vacuum → restore --to-tag: the pinned epoch's manifest AND
    files survive vacuum, so the restore still works afterwards."""
    lake, _, _ = _lake_with_epochs(tmp_path)
    m = Manifest(lake)
    target = m.committed_epoch() - 2
    m.set_tag("pre-incident", target)
    expected = final_table(lake, as_of_epoch=target)
    m.vacuum(keep_epochs=1)
    out = restore_lake(lake, to_tag="pre-incident")
    assert out["restored_to"] == target
    assert_tables_equal(final_table(lake), expected)


def test_restore_undoes_purge(tmp_path, ray_session):
    """The headline use case: an (erroneous) purge rewound by restore —
    the purged conv's rows come back, byte for byte."""
    from datax_ray.pipelines.purge import purge

    lake, _, _ = _lake_with_epochs(tmp_path)
    before = final_table(lake)
    victim = before["conv_id"][0].as_py()
    pre_epoch = Manifest(lake).committed_epoch()
    purge(lake, [victim])
    mask = pc.equal(final_table(lake)["conv_id"], victim)
    assert pc.sum(pc.cast(mask, "int64")).as_py() in (0, None)
    restore_lake(lake, to_epoch=pre_epoch)
    assert_tables_equal(final_table(lake), before)
