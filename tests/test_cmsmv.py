"""Turnstile CMS MV (pipelines/cmsmv.py): register equality with a direct
recompute of the live lake (deletes folded exactly), incrementality,
overestimate guarantee of point queries, param pinning, vacuum fallback,
and registry sync."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from datax_ray.fixtures.generator import gen_changes, write_segments
from datax_ray.pipelines.cmsmv import (
    cms_mv_estimate,
    read_cms_mv,
    refresh_cms_mv,
)
from datax_ray.pipelines.replay import ReplayConfig, replay
from datax_ray.sinks.lake import final_table

DEPTH, WIDTH = 4, 256


def _direct(lake: str) -> pa.Table:
    """Registers recomputed straight from the live lake rows."""
    from datax_ray.functions.sketch import _cms_cols
    from datax_ray.pipelines.cmsmv import _conv_ordinals

    live = final_table(lake)
    ids = _conv_ordinals(live["conv_id"])
    cols = _cms_cols(ids, DEPTH, WIDTH)
    rows_out, cols_out, cnts_out = [], [], []
    for j in range(DEPTH):
        counts = np.bincount(cols[j], minlength=WIDTH)
        nz = np.flatnonzero(counts)
        rows_out.append(np.full(len(nz), j, dtype=np.int64))
        cols_out.append(nz.astype(np.int64))
        cnts_out.append(counts[nz].astype(np.int64))
    return pa.table(
        {
            "cms_row": pa.array(np.concatenate(rows_out)),
            "cms_col": pa.array(np.concatenate(cols_out)),
            "cnt": pa.array(np.concatenate(cnts_out)),
        }
    ).sort_by([("cms_row", "ascending"), ("cms_col", "ascending")])


@pytest.fixture()
def lake(tmp_path, ray_session):
    changes = gen_changes(5000, 60, seed=41, p_delete=0.15)
    chg = str(tmp_path / "chg")
    lk = str(tmp_path / "lake")
    write_segments(changes, chg, seg_rows=1000)
    replay(ReplayConfig(changes_dir=chg, lake_dir=lk, num_partitions=8,
                        segments_per_epoch=2))
    return chg, lk


def test_cms_equals_direct_and_incremental(lake, tmp_path):
    chg, lk = lake
    mv = str(tmp_path / "mv")
    r1 = refresh_cms_mv(lk, mv, depth=DEPTH, width=WIDTH)
    assert r1["applied_from"] == -1 and r1["applied_to"] >= 0
    assert read_cms_mv(mv).equals(_direct(lk))

    # no-op refresh
    r2 = refresh_cms_mv(lk, mv)
    assert r2["applied_to"] == r1["applied_to"]

    # more epochs (deletes included) fold additively from the feed only
    more = gen_changes(3000, 60, seed=42, p_delete=0.2)
    more = more.set_column(
        more.schema.get_field_index("lsn"), "lsn",
        pc.add(more["lsn"], 1_000_000),
    )
    write_segments(more, chg, seg_rows=1500, start_seg=100)
    replay(ReplayConfig(changes_dir=chg, lake_dir=lk, num_partitions=8,
                        segments_per_epoch=2))
    r3 = refresh_cms_mv(lk, mv)
    assert r3["applied_from"] == r1["applied_to"]  # incremental
    assert read_cms_mv(mv).equals(_direct(lk))


def test_cms_point_estimates_overestimate(lake, tmp_path):
    """est >= true for every conv; equality for most at this load factor."""
    _, lk = lake
    mv = str(tmp_path / "mv")
    refresh_cms_mv(lk, mv, depth=DEPTH, width=WIDTH)
    live = final_table(lk)
    true = {}
    for c in live["conv_id"].to_pylist():
        true[c] = true.get(c, 0) + 1
    convs = sorted(true)
    est = cms_mv_estimate(mv, convs)
    for c, e in zip(est["conv_id"].to_pylist(), est["est_turns"].to_pylist()):
        assert e >= true[c], (c, e, true[c])
    # a conv that never existed: estimate may collide but stays bounded
    ghost = cms_mv_estimate(mv, ["conv-999999"])["est_turns"][0].as_py()
    assert ghost >= 0


def test_cms_param_pinning(lake, tmp_path):
    _, lk = lake
    mv = str(tmp_path / "mv")
    refresh_cms_mv(lk, mv, depth=DEPTH, width=WIDTH)
    with pytest.raises(ValueError, match="pinned to depth"):
        refresh_cms_mv(lk, mv, depth=DEPTH + 1)
    with pytest.raises(ValueError, match="pinned to width"):
        refresh_cms_mv(lk, mv, width=WIDTH * 2)
    r = refresh_cms_mv(lk, mv)  # omitted params reuse stored
    assert r["applied_to"] >= 0
    with pytest.raises(ValueError, match="positive"):
        refresh_cms_mv(lk, str(tmp_path / "mv2"), depth=0)


def test_cms_vacuum_fallback_rebuild(lake, tmp_path):
    from datax_ray.state.manifest import Manifest

    chg, lk = lake
    mv = str(tmp_path / "mv")
    refresh_cms_mv(lk, mv, depth=DEPTH, width=WIDTH)
    more = gen_changes(2000, 60, seed=43)
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
        refresh_cms_mv(lk, mv)
    r = refresh_cms_mv(lk, mv, rebuild=True)
    assert r["applied_from"] == -1
    assert read_cms_mv(mv).equals(_direct(lk))
    with pytest.raises(ValueError, match="pinned to depth"):
        refresh_cms_mv(lk, mv, depth=DEPTH + 1)


def test_cms_registry_sync(lake, tmp_path):
    from datax_ray.pipelines.registry import register_artifact, sync_artifacts

    _, lk = lake
    mv = str(tmp_path / "mv")
    register_artifact(lk, "freq", "cmsmv", mv,
                      params={"depth": DEPTH, "width": WIDTH})
    out = sync_artifacts(lk)
    assert out["failed"] == 0 and out["results"]["freq"]["ok"]
    assert read_cms_mv(mv).equals(_direct(lk))
