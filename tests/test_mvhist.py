"""Additive grouped-histogram MV (pipelines/mvhist.py): equality with a
direct recompute of the live lake, cross-cell mass transfer under
updates/deletes, param pinning, quantile extraction accuracy, vacuum
fallback, and registry sync."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from datax_ray.fixtures.generator import gen_changes, write_segments
from datax_ray.pipelines.mvhist import (
    hist_quantiles,
    read_mv_hist,
    refresh_mv_hist,
)
from datax_ray.pipelines.replay import ReplayConfig, replay
from datax_ray.sinks.lake import final_table

GCOL, WIDTH = "role", 2


def _direct(lake: str):
    """Histogram recomputed straight from the live lake."""
    live = final_table(lake)
    length = pc.cast(pc.fill_null(pc.utf8_length(live["text"]), 0), pa.int64())
    t = pa.table(
        {
            "group_val": pc.cast(live[GCOL], pa.string()),
            "bucket": pc.divide(length, WIDTH),
            "n_rows": pa.array(np.ones(live.num_rows, np.int64)),
            "sum_len": length,
        }
    )
    g = (
        t.group_by(["group_val", "bucket"], use_threads=False)
        .aggregate([("n_rows", "sum"), ("sum_len", "sum")])
        .rename_columns(["group_val", "bucket", "n_rows", "sum_len"])
    )
    return (
        g.sort_by([("group_val", "ascending"), ("bucket", "ascending")])
        .to_pandas()
        .reset_index(drop=True)
    )


def _view(mv: str):
    return (
        read_mv_hist(mv)
        .to_pandas()
        .sort_values(["group_val", "bucket"])
        .reset_index(drop=True)[["group_val", "bucket", "n_rows", "sum_len"]]
    )


@pytest.fixture()
def lake(tmp_path, ray_session):
    changes = gen_changes(5000, 60, seed=31, p_delete=0.15)
    chg = str(tmp_path / "chg")
    lk = str(tmp_path / "lake")
    write_segments(changes, chg, seg_rows=1000)
    replay(ReplayConfig(changes_dir=chg, lake_dir=lk, num_partitions=8,
                        segments_per_epoch=2))
    return chg, lk


def test_hist_equals_direct_and_incremental(lake, tmp_path):
    chg, lk = lake
    mv = str(tmp_path / "mv")
    r1 = refresh_mv_hist(lk, mv, group_col=GCOL, bucket_width=WIDTH)
    assert r1["applied_from"] == -1 and r1["applied_to"] >= 0
    assert _view(mv).equals(_direct(lk))

    # no-op refresh
    r2 = refresh_mv_hist(lk, mv)
    assert r2["shards_touched"] == 0 and r2["applied_to"] == r1["applied_to"]

    # more epochs with deletes + updates: mass transfers across cells via
    # the preimage feed only (incremental, never a rebuild)
    more = gen_changes(3000, 60, seed=32, p_delete=0.2)
    more = more.set_column(
        more.schema.get_field_index("lsn"), "lsn",
        pc.add(more["lsn"], 1_000_000),
    )
    write_segments(more, chg, seg_rows=1500, start_seg=100)
    replay(ReplayConfig(changes_dir=chg, lake_dir=lk, num_partitions=8,
                        segments_per_epoch=2))
    r3 = refresh_mv_hist(lk, mv)
    assert r3["applied_from"] == r1["applied_to"]
    assert _view(mv).equals(_direct(lk))


def test_hist_param_pinning(lake, tmp_path):
    _, lk = lake
    mv = str(tmp_path / "mv")
    refresh_mv_hist(lk, mv, group_col=GCOL, bucket_width=WIDTH)
    with pytest.raises(ValueError, match="pinned to group_col"):
        refresh_mv_hist(lk, mv, group_col="tool")
    with pytest.raises(ValueError, match="pinned to bucket_width"):
        refresh_mv_hist(lk, mv, bucket_width=WIDTH + 1)
    # omitted params reuse the stored ones (registry-sync contract)
    r = refresh_mv_hist(lk, mv)
    assert r["applied_to"] >= 0
    with pytest.raises(ValueError, match="positive"):
        refresh_mv_hist(lk, str(tmp_path / "mv2"), bucket_width=0)


def test_hist_quantiles_vs_numpy(lake, tmp_path):
    """Approximate quantiles from the folded cells are within one
    bucket_width of numpy's exact quantiles of the live lengths."""
    _, lk = lake
    mv = str(tmp_path / "mv")
    refresh_mv_hist(lk, mv, group_col=GCOL, bucket_width=WIDTH)
    live = final_table(lk)
    lengths = pc.cast(
        pc.fill_null(pc.utf8_length(live["text"]), 0), pa.int64()
    ).to_numpy(zero_copy_only=False)
    roles = live[GCOL].to_pylist()
    qt = hist_quantiles(mv, [0.5, 0.9])
    assert qt.num_rows > 0
    for gv, q, val in zip(
        qt["group_val"].to_pylist(), qt["q"].to_pylist(), qt["value"].to_pylist()
    ):
        exact = np.quantile(
            np.array([l for l, r in zip(lengths, roles) if r == gv]), q
        )
        assert abs(val - exact) <= WIDTH + 1e-9, (gv, q, val, exact)


def test_hist_vacuum_fallback_rebuild(lake, tmp_path):
    from datax_ray.state.manifest import Manifest

    chg, lk = lake
    mv = str(tmp_path / "mv")
    refresh_mv_hist(lk, mv, group_col=GCOL, bucket_width=WIDTH)
    more = gen_changes(2000, 60, seed=33)
    more = more.set_column(
        more.schema.get_field_index("lsn"), "lsn",
        pc.add(more["lsn"], 2_000_000),
    )
    write_segments(more, chg, seg_rows=1000, start_seg=200)
    replay(ReplayConfig(changes_dir=chg, lake_dir=lk, num_partitions=8,
                        segments_per_epoch=2))
    replay(ReplayConfig(changes_dir=chg, lake_dir=lk, num_partitions=8))
    Manifest(lk).vacuum(keep_epochs=1)
    with pytest.raises(ValueError, match="vacuumed"):
        refresh_mv_hist(lk, mv)
    r = refresh_mv_hist(lk, mv, rebuild=True)
    assert r["applied_from"] == -1
    assert _view(mv).equals(_direct(lk))
    # pinned params survive the rebuild
    with pytest.raises(ValueError, match="pinned to group_col"):
        refresh_mv_hist(lk, mv, group_col="tool")


def test_hist_registry_sync(lake, tmp_path):
    from datax_ray.pipelines.registry import register_artifact, sync_artifacts

    _, lk = lake
    mv = str(tmp_path / "mv")
    register_artifact(lk, "hist", "mvhist", mv,
                      params={"group_col": GCOL, "bucket_width": WIDTH})
    out = sync_artifacts(lk)
    assert out["failed"] == 0 and out["results"]["hist"]["ok"]
    assert _view(mv).equals(_direct(lk))
