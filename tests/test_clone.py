"""Lake branching: state equality at the branch point, independent
divergence in both directions, hardlink copy-on-write safety."""

import glob
import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from datax_ray.fixtures.generator import gen_changes, write_segments
from datax_ray.oracle import sequential_replay
from datax_ray.pipelines.clone import clone_lake
from datax_ray.pipelines.fsck import fsck
from datax_ray.pipelines.replay import ReplayConfig, replay
from datax_ray.sinks.lake import final_table


def _build(tmp_path, n_events=4000, n_convs=50):
    changes = gen_changes(n_events, n_convs, seed=66, out_of_order_frac=0.1)
    chg, lake = str(tmp_path / "chg"), str(tmp_path / "lake")
    write_segments(changes, chg, seg_rows=1000)
    replay(ReplayConfig(changes_dir=chg, lake_dir=lake, num_partitions=8,
                        segments_per_epoch=2))
    return changes, chg, lake


def test_clone_equals_source_and_is_fsck_clean(tmp_path):
    _, _, lake = _build(tmp_path)
    br = str(tmp_path / "branch")
    rep = clone_lake(lake, br)
    assert rep["files"] > 0 and rep["copied"] == 0  # same fs -> all links

    assert final_table(br).equals(final_table(lake))
    assert fsck(br, deep=True)["ok"]
    assert fsck(lake, deep=True)["ok"]

    # Branching into an existing lake is refused.
    with pytest.raises(ValueError, match="already a committed lake"):
        clone_lake(lake, br)


def test_clone_at_epoch_and_branch_ingest_diverges(tmp_path):
    changes, chg, lake = _build(tmp_path)
    from datax_ray.state.manifest import Manifest

    head = Manifest(lake).committed_epoch()
    br = str(tmp_path / "branch")
    clone_lake(lake, br, as_of_epoch=head)

    # New segments land; replay them ONLY on the branch.
    more = gen_changes(2000, 50, seed=77)
    lsn_off = int(pc.max(changes["lsn"]).as_py()) + 1
    more = more.set_column(0, "lsn", pc.add(more["lsn"], lsn_off))
    import datetime
    ts_off = (
        pc.max(changes["ts"]).as_py() - pc.min(more["ts"]).as_py()
        + datetime.timedelta(seconds=1)
    )
    more = more.set_column(
        1, "ts", pc.add(more["ts"], pa.scalar(ts_off, pa.duration("us")))
    )
    chg_b = str(tmp_path / "chg_b")
    os.makedirs(chg_b)
    for seg in glob.glob(os.path.join(chg, "seg-*.parquet")):
        os.link(seg, os.path.join(chg_b, os.path.basename(seg)))
    pq.write_table(more, os.path.join(chg_b, "seg-000000900.parquet"))

    src_before = final_table(lake)
    replay(ReplayConfig(changes_dir=chg_b, lake_dir=br, num_partitions=8))

    combined = pa.concat_tables([changes, more]).combine_chunks()
    assert final_table(br).equals(sequential_replay(combined))
    # Exactly-once across the branch point: the branch's single record
    # carried the cumulative segment set, so nothing was re-applied.
    assert final_table(lake).equals(src_before)


def test_branch_purge_and_vacuum_never_touch_source(tmp_path):
    from datax_ray.pipelines.purge import purge

    changes, _, lake = _build(tmp_path)
    br = str(tmp_path / "branch")
    clone_lake(lake, br)

    src_before = final_table(lake)
    conv = src_before["conv_id"][0].as_py()
    purge(br, [conv], hard=True)  # rewrites + vacuums + scrubs on the branch

    assert not pc.any(
        pc.equal(final_table(br)["conv_id"], conv)
    ).as_py()
    # The source still has the conv, all its files, and a clean fsck.
    assert final_table(lake).equals(src_before)
    assert fsck(lake, deep=True)["ok"]


def test_branch_merge_back_via_replicate(tmp_path):
    """The Git-like workflow end to end: clone -> ingest on the branch ->
    MERGE BACK into the source with `replicate`. Re-shipped rows the
    source already holds fold as LWW no-ops, branch-only work lands, and
    the merged source equals the oracle over the union of both streams."""
    import datetime

    from datax_ray.pipelines.replicate import replicate

    from datax_ray.state.manifest import Manifest

    changes, chg, lake = _build(tmp_path)
    branch_point = Manifest(lake).committed_epoch()
    br = str(tmp_path / "branch")
    clone_lake(lake, br)

    # branch-only stream: lsns and ts strictly after the shared prefix
    more = gen_changes(1500, 50, seed=78)
    lsn_off = int(pc.max(changes["lsn"]).as_py()) + 1
    more = more.set_column(0, "lsn", pc.add(more["lsn"], lsn_off))
    ts_off = (
        pc.max(changes["ts"]).as_py() - pc.min(more["ts"]).as_py()
        + datetime.timedelta(seconds=1)
    )
    more = more.set_column(
        1, "ts", pc.add(more["ts"], pa.scalar(ts_off, pa.duration("us")))
    )
    chg_b = str(tmp_path / "chg_b")
    os.makedirs(chg_b)
    pq.write_table(more, os.path.join(chg_b, "seg-000000900.parquet"))
    replay(ReplayConfig(changes_dir=chg_b, lake_dir=br, num_partitions=8))

    # merge back: the source already holds the shared prefix, so the sync
    # window starts at the branch point (a clone's collapsed history has
    # no per-epoch feed below it)
    out = replicate(br, lake, num_partitions=8, from_epoch=branch_point)
    assert out["epochs_applied"] > 0
    combined = pa.concat_tables([changes, more]).combine_chunks()
    assert final_table(lake).equals(sequential_replay(combined))
    assert fsck(lake, deep=True)["ok"]
    # merge is idempotent: a second sync applies nothing new
    out2 = replicate(br, lake, num_partitions=8, from_epoch=branch_point)
    assert out2["epochs_applied"] == 0
    assert final_table(lake).equals(sequential_replay(combined))
