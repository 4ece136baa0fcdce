"""Additive MV (pipelines/mvadd.py): equality with a direct recompute of
the live lake, watermark incrementality, no-op refresh, vacuum fallback,
and crash-retry determinism of bucket files."""

import glob
import os

import pyarrow as pa
import pyarrow.compute as pc
import pytest

from datax_ray.fixtures.generator import gen_changes, write_segments
from datax_ray.pipelines.mvadd import (
    read_mv_additive,
    refresh_mv_additive,
)
from datax_ray.pipelines.replay import ReplayConfig, replay
from datax_ray.sinks.lake import final_table


def _direct(lake: str):
    live = final_table(lake)
    chars = pc.cast(pc.fill_null(pc.utf8_length(live["text"]), 0), pa.int64())
    g = (
        pa.table({"conv_id": live["conv_id"], "sum_chars": chars})
        .group_by("conv_id", use_threads=False)
        .aggregate([("sum_chars", "sum"), ("conv_id", "count")])
    )
    return (
        pa.table(
            {
                "conv_id": g["conv_id"],
                "n_turns": pc.cast(g["conv_id_count"], pa.int64()),
                "sum_chars": g["sum_chars_sum"],
            }
        )
        .sort_by("conv_id")
        .to_pandas()
    )


def _view(mv: str):
    return (
        read_mv_additive(mv)
        .to_pandas()
        .sort_values("conv_id")
        .reset_index(drop=True)[["conv_id", "n_turns", "sum_chars"]]
    )


@pytest.fixture()
def lake(tmp_path, ray_session):
    changes = gen_changes(5000, 60, seed=21, p_delete=0.15)
    chg = str(tmp_path / "chg")
    lk = str(tmp_path / "lake")
    write_segments(changes, chg, seg_rows=1000)
    replay(ReplayConfig(changes_dir=chg, lake_dir=lk, num_partitions=8,
                        segments_per_epoch=2))
    return chg, lk


def test_additive_equals_direct_and_incremental(lake, tmp_path):
    chg, lk = lake
    mv = str(tmp_path / "mv")
    r1 = refresh_mv_additive(lk, mv)
    assert r1["applied_from"] == -1 and r1["applied_to"] >= 0

    got = _view(mv)
    want = _direct(lk).reset_index(drop=True)
    assert got.equals(want)

    # no-op refresh: watermark holds, nothing touched
    r2 = refresh_mv_additive(lk, mv)
    assert r2["buckets_touched"] == 0
    assert r2["applied_to"] == r1["applied_to"]

    # more epochs (with deletes) fold additively from the feed only
    more = gen_changes(3000, 60, seed=22, p_delete=0.2)
    import pyarrow.compute as _pc

    more = more.set_column(
        more.schema.get_field_index("lsn"),
        "lsn",
        _pc.add(more["lsn"], 1_000_000),
    )
    write_segments(more, chg, seg_rows=1500, start_seg=100)
    replay(ReplayConfig(changes_dir=chg, lake_dir=lk, num_partitions=8,
                        segments_per_epoch=2))
    r3 = refresh_mv_additive(lk, mv)
    assert r3["applied_from"] == r1["applied_to"]  # incremental, not rebuilt
    assert _view(mv).equals(_direct(lk).reset_index(drop=True))


def test_crash_retry_is_deterministic(lake, tmp_path):
    """A refresh that dies after writing bucket files but BEFORE the state
    replace must be invisible: the retry rewrites identical files and one
    atomic state publish lands."""
    import json
    import shutil

    chg, lk = lake
    mv = str(tmp_path / "mv")
    refresh_mv_additive(lk, mv)
    state_path = os.path.join(mv, "_mvadd_state.json")
    committed_state = json.load(open(state_path))
    gen1 = str(tmp_path / "gen1")
    os.makedirs(gen1)
    for p in glob.glob(os.path.join(mv, "b=*.parquet")):
        shutil.copy2(p, os.path.join(gen1, os.path.basename(p)))

    # the second epoch's refresh publishes generation 2 and GC's gen 1
    more = gen_changes(2000, 60, seed=23)
    more = more.set_column(
        more.schema.get_field_index("lsn"), "lsn",
        pc.add(more["lsn"], 2_000_000),
    )
    write_segments(more, chg, seg_rows=1000, start_seg=200)
    replay(ReplayConfig(changes_dir=chg, lake_dir=lk, num_partitions=8,
                        segments_per_epoch=2))
    refresh_mv_additive(lk, mv)
    files_after = {
        os.path.basename(p): os.path.getsize(p)
        for p in glob.glob(os.path.join(mv, "b=*.parquet"))
    }
    # reconstruct the pre-crash disk: gen-2 files written, state still at
    # gen 1, gen-1 files still present (GC only runs after the publish)
    json.dump(committed_state, open(state_path, "w"))
    for p in glob.glob(os.path.join(gen1, "b=*.parquet")):
        shutil.copy2(p, os.path.join(mv, os.path.basename(p)))
    refresh_mv_additive(lk, mv)
    files_retry = {
        os.path.basename(p): os.path.getsize(p)
        for p in glob.glob(os.path.join(mv, "b=*.parquet"))
    }
    assert files_retry == files_after  # same names, same bytes
    assert _view(mv).equals(_direct(lk).reset_index(drop=True))


def test_vacuum_fallback_rebuild(lake, tmp_path):
    chg, lk = lake
    mv = str(tmp_path / "mv")
    refresh_mv_additive(lk, mv)

    from datax_ray.state.manifest import Manifest

    more = gen_changes(2000, 60, seed=24)
    more = more.set_column(
        more.schema.get_field_index("lsn"), "lsn",
        pc.add(more["lsn"], 3_000_000),
    )
    write_segments(more, chg, seg_rows=500, start_seg=300)
    replay(ReplayConfig(changes_dir=chg, lake_dir=lk, num_partitions=8,
                        segments_per_epoch=2))
    Manifest(lk).vacuum(keep_epochs=1)

    with pytest.raises(ValueError, match="vacuum"):
        refresh_mv_additive(lk, mv)
    refresh_mv_additive(lk, mv, rebuild=True)
    assert _view(mv).equals(_direct(lk).reset_index(drop=True))
