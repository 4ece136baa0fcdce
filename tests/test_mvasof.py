"""AS-OF join MV (pipelines/mvasof.py): equality with a sequential as-of
reference over both lakes' live states; delta-keyed incrementality when
EITHER side changes (untouched buckets keep their generation); right-side
delete re-points dependents; rebuild; fallback equivalence."""

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from datax_ray.fixtures.generator import gen_changes, write_segments
from datax_ray.pipelines.mvasof import read_mv_asof, refresh_mv_asof
from datax_ray.pipelines.replay import ReplayConfig, replay
from datax_ray.sinks.lake import final_table


def _direct(left_lake: str, right_lake: str):
    """Sequential backward as-of reference (inner, ties at equal ts match)."""
    import pandas as pd

    lt = final_table(left_lake).select(["conv_id", "turn_idx", "ts"])
    rt = final_table(right_lake).select(["conv_id", "turn_idx", "ts", "text"])
    l = lt.to_pandas().astype({"turn_idx": "int64"})
    r = rt.to_pandas().astype({"turn_idx": "int64"}).rename(
        columns={"turn_idx": "r_turn_idx", "ts": "r_ts", "text": "r_text"}
    )
    l = l.sort_values("ts", kind="stable").reset_index(drop=True)
    r = r.sort_values("r_ts", kind="stable").reset_index(drop=True)
    j = pd.merge_asof(
        l, r, left_on="ts", right_on="r_ts", by="conv_id",
        direction="backward", allow_exact_matches=True,
    )
    j = j.dropna(subset=["r_ts"])
    j["r_turn_idx"] = j["r_turn_idx"].astype("int64")
    return (
        j[["conv_id", "turn_idx", "ts", "r_turn_idx", "r_ts", "r_text"]]
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )


def _view(mv: str):
    return (
        read_mv_asof(mv)
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)[
            ["conv_id", "turn_idx", "ts", "r_turn_idx", "r_ts", "r_text"]
        ]
    )


def _mklake(tmp_path, name, changes, spe=2, parts=8):
    chg = str(tmp_path / f"chg_{name}")
    lk = str(tmp_path / f"lake_{name}")
    write_segments(changes, chg, seg_rows=1000)
    replay(ReplayConfig(changes_dir=chg, lake_dir=lk, num_partitions=parts,
                        segments_per_epoch=spe))
    return chg, lk


@pytest.fixture()
def lakes(tmp_path, ray_session):
    left = gen_changes(4000, 50, seed=91, p_delete=0.12,
                       out_of_order_frac=0.1)
    right = gen_changes(2500, 50, seed=92, p_delete=0.15,
                        out_of_order_frac=0.1)
    chg_l, lk_l = _mklake(tmp_path, "l", left)
    chg_r, lk_r = _mklake(tmp_path, "r", right)
    return chg_l, lk_l, chg_r, lk_r


def test_equals_direct_and_incremental_both_sides(lakes, tmp_path):
    chg_l, lk_l, chg_r, lk_r = lakes
    mv = str(tmp_path / "mv")
    r1 = refresh_mv_asof(lk_l, lk_r, mv)
    assert r1["rows"] > 0
    assert _view(mv).equals(_direct(lk_l, lk_r))

    # no-op refresh
    assert refresh_mv_asof(lk_l, lk_r, mv)["buckets_touched"] == 0

    gen_before = json.load(
        open(os.path.join(mv, "_mvasof_state.json"))
    )["buckets"]

    # RIGHT side changes for 3 convs (incl. deletes): dependents re-point
    more_r = gen_changes(500, 3, seed=93, p_delete=0.4)
    more_r = more_r.set_column(
        0, "lsn", pc.add(more_r["lsn"], pa.scalar(2500, pa.int64()))
    )
    write_segments(more_r, chg_r, seg_rows=1000, start_seg=3)
    replay(ReplayConfig(changes_dir=chg_r, lake_dir=lk_r, num_partitions=8,
                        segments_per_epoch=2))
    r2 = refresh_mv_asof(lk_l, lk_r, mv)
    assert r2["applied_right"] > r1["applied_right"]
    assert _view(mv).equals(_direct(lk_l, lk_r))

    # LEFT side changes too
    more_l = gen_changes(500, 3, seed=94, p_delete=0.3)
    more_l = more_l.set_column(
        0, "lsn", pc.add(more_l["lsn"], pa.scalar(4000, pa.int64()))
    )
    write_segments(more_l, chg_l, seg_rows=1000, start_seg=4)
    replay(ReplayConfig(changes_dir=chg_l, lake_dir=lk_l, num_partitions=8,
                        segments_per_epoch=2))
    refresh_mv_asof(lk_l, lk_r, mv)
    assert _view(mv).equals(_direct(lk_l, lk_r))

    gen_after = json.load(
        open(os.path.join(mv, "_mvasof_state.json"))
    )["buckets"]
    untouched = [b for b in gen_before if gen_after.get(b) == gen_before[b]]
    assert untouched, "expected untouched bucket generations"


def test_status_tracks_right_lake_head(lakes, tmp_path):
    """A two-lake artifact's lag is measured against EACH lake's own head:
    a fully-synced view reads behind=0 even when the two heads differ, and
    a right-side-only commit shows up as right_behind."""
    chg_l, lk_l, chg_r, lk_r = lakes
    from datax_ray.pipelines.registry import register_artifact, sync_artifacts
    from datax_ray.pipelines.status import lake_status

    mv = str(tmp_path / "mv_status")
    register_artifact(lk_l, "enrich", "mvasof", mv, {"right_lake": lk_r})
    assert sync_artifacts(lk_l)["failed"] == 0
    rec = lake_status(lk_l)["artifacts"]["enrich"]
    assert rec["behind"] == 0 and rec["right_behind"] == 0

    more_r = gen_changes(500, 3, seed=95)
    more_r = more_r.set_column(
        0, "lsn", pc.add(more_r["lsn"], pa.scalar(2500, pa.int64()))
    )
    write_segments(more_r, chg_r, seg_rows=1000, start_seg=3)
    replay(ReplayConfig(changes_dir=chg_r, lake_dir=lk_r, num_partitions=8,
                        segments_per_epoch=2))
    rec = lake_status(lk_l)["artifacts"]["enrich"]
    assert rec["right_behind"] > 0 and rec["behind"] > 0
    assert sync_artifacts(lk_l)["failed"] == 0
    rec = lake_status(lk_l)["artifacts"]["enrich"]
    assert rec["behind"] == 0 and rec["right_behind"] == 0


def test_fallback_and_rebuild(lakes, tmp_path):
    _, lk_l, _, lk_r = lakes
    mv_a = str(tmp_path / "mv_a")
    mv_b = str(tmp_path / "mv_b")
    refresh_mv_asof(lk_l, lk_r, mv_a)
    refresh_mv_asof(lk_l, lk_r, mv_b, max_point_keys=0)
    assert _view(mv_a).equals(_view(mv_b))

    r = refresh_mv_asof(lk_l, lk_r, mv_a, rebuild=True)
    assert r["rows"] > 0
    assert _view(mv_a).equals(_direct(lk_l, lk_r))
