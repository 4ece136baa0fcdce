"""Write-audit-publish (Iceberg WAP): `replay(stage=True)` lands ALL
pending segments as ONE STAGED epoch — a full manifest record at
`_manifest/staged.json`, invisible to committed readers, feeds and
artifacts — auditable via `as_of_epoch="staged"` reads, then atomically
promoted (`publish_staged`) or dropped (`abort_staged`). Contracts:

- staged state == what a direct commit would have produced; committed
  readers see NOTHING until publish;
- publish promotes atomically; the published lake equals the oracle;
- abort drops the record; fragments orphan (fsck reports, vacuum
  removes), segments stay uncommitted and re-apply exactly-once;
- a competing commit between stage and publish makes publish refuse
  (audited against a stale base) — abort + re-stage recovers;
- at most one staged epoch (second stage refuses);
- vacuum never deletes a staged epoch's fragments.
"""

import pytest

from datax_ray.fixtures.generator import gen_changes, write_segments
from datax_ray.oracle import sequential_replay
from datax_ray.pipelines.replay import ReplayConfig, replay
from datax_ray.sinks.lake import final_table
from datax_ray.state.manifest import ConcurrentCommitError, Manifest

from tests.test_replay_e2e import assert_tables_equal


def _cfg(tmp_path, **kw):
    return ReplayConfig(changes_dir=str(tmp_path / "chg"),
                        lake_dir=str(tmp_path / "lake"),
                        num_partitions=8, **kw)


def _log(tmp_path, n=2500, seed=51):
    changes = gen_changes(n, 40, seed=seed, out_of_order_frac=0.1)
    write_segments(changes, str(tmp_path / "chg"), seg_rows=600)
    return changes


def test_stage_audit_publish(tmp_path, ray_session):
    changes = _log(tmp_path)
    cfg = _cfg(tmp_path)
    reports = replay(cfg, stage=True)
    assert len(reports) == 1
    m = Manifest(cfg.lake_dir)
    # invisible to committed readers...
    assert m.committed_epoch() == -1
    assert m.staged_record()["epoch"] == 0
    # ...but fully auditable via the staged read point
    staged_view = final_table(cfg.lake_dir, as_of_epoch="staged")
    assert_tables_equal(staged_view, sequential_replay(changes))
    # a plain replay right now would find the segments still uncommitted
    # (we don't run it — it would race the staged epoch; see stale test)
    rec = m.publish_staged()
    assert rec["epoch"] == 0 and m.committed_epoch() == 0
    assert m.staged_record() is None
    assert_tables_equal(final_table(cfg.lake_dir), sequential_replay(changes))
    # publish with nothing staged refuses
    with pytest.raises(ValueError, match="nothing is staged"):
        m.publish_staged()


def test_stage_abort_then_replay_exactly_once(tmp_path, ray_session):
    changes = _log(tmp_path, seed=52)
    cfg = _cfg(tmp_path)
    replay(cfg, stage=True)
    m = Manifest(cfg.lake_dir)
    rec = m.abort_staged()
    assert rec["epoch"] == 0 and m.staged_record() is None
    assert m.committed_epoch() == -1
    # segments stayed uncommitted: a normal replay lands them exactly-once
    # (fragments rewrite identical content-hash bytes over the orphans)
    replay(cfg)
    assert_tables_equal(final_table(cfg.lake_dir), sequential_replay(changes))


def test_stage_on_existing_lake_and_incremental(tmp_path, ray_session):
    import pyarrow as pa
    import pyarrow.compute as pc

    changes = _log(tmp_path, seed=53)
    cfg = _cfg(tmp_path)
    replay(cfg)  # committed base
    before = final_table(cfg.lake_dir)
    lsn0 = int(pc.max(changes["lsn"]).as_py()) + 1
    new = gen_changes(900, 40, seed=54)
    new = new.set_column(new.schema.get_field_index("lsn"), "lsn",
                         pc.add(pc.cast(new["lsn"], "int64"), lsn0))
    write_segments(new, str(tmp_path / "chg"), seg_rows=500, start_seg=80)
    replay(cfg, stage=True)
    # committed view unchanged; staged view holds the fold of everything
    assert_tables_equal(final_table(cfg.lake_dir), before)
    expected = sequential_replay(
        pa.concat_tables([changes, new], promote_options="default"))
    assert_tables_equal(
        final_table(cfg.lake_dir, as_of_epoch="staged"), expected)
    # double-stage refuses while one is pending
    with pytest.raises(ValueError, match="already staged"):
        replay(cfg, stage=True)
    Manifest(cfg.lake_dir).publish_staged()
    assert_tables_equal(final_table(cfg.lake_dir), expected)


def test_publish_refuses_after_competing_commit(tmp_path, ray_session):
    import pyarrow.compute as pc

    changes = _log(tmp_path, seed=55)
    cfg = _cfg(tmp_path)
    replay(cfg)
    lsn0 = int(pc.max(changes["lsn"]).as_py()) + 1
    new = gen_changes(600, 40, seed=56)
    new = new.set_column(new.schema.get_field_index("lsn"), "lsn",
                         pc.add(pc.cast(new["lsn"], "int64"), lsn0))
    write_segments(new, str(tmp_path / "chg"), seg_rows=300, start_seg=80)
    replay(cfg, stage=True)
    m = Manifest(cfg.lake_dir)
    # competing writer commits the same segments directly (wins the epoch)
    replay(cfg)
    with pytest.raises(ConcurrentCommitError, match="no longer follows"):
        m.publish_staged()
    # recovery: abort the stale staged epoch; state is already correct
    m.abort_staged()
    assert m.staged_record() is None


def test_vacuum_keeps_staged_fragments(tmp_path, ray_session):
    import glob
    import os

    changes = _log(tmp_path, seed=57)
    cfg = _cfg(tmp_path)
    replay(cfg)
    import pyarrow.compute as pc
    lsn0 = int(pc.max(changes["lsn"]).as_py()) + 1
    new = gen_changes(500, 40, seed=58)
    new = new.set_column(new.schema.get_field_index("lsn"), "lsn",
                         pc.add(pc.cast(new["lsn"], "int64"), lsn0))
    write_segments(new, str(tmp_path / "chg"), seg_rows=300, start_seg=80)
    replay(cfg, stage=True)
    m = Manifest(cfg.lake_dir)
    staged_frags = {
        f for r in m.staged_record().get("ranges", {}).values()
        for f in r.get("frags", [])
    }
    committed_files = set()
    for r in m.current_ranges().values():
        committed_files.update(r.get("frags", []))
    fresh = staged_frags - committed_files
    assert fresh  # the staged epoch really wrote new fragments
    m.vacuum(keep_epochs=1)
    for rel in fresh:
        assert os.path.exists(os.path.join(cfg.lake_dir, rel)), rel
    # publish still works after the vacuum
    m.publish_staged()
    import pyarrow as pa
    assert_tables_equal(
        final_table(cfg.lake_dir),
        sequential_replay(pa.concat_tables([changes, new],
                                           promote_options="default")),
    )
