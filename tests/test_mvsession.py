"""Session-window MV (pipelines/mvsession.py): equality with a direct
sessionization of the live lake, delta-keyed incrementality (untouched
bucket files keep their generation), delete propagation, full-scan
fallback equivalence, gap pinning, rebuild."""

import glob
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from datax_ray.fixtures.generator import gen_changes, write_segments
from datax_ray.pipelines.mvsession import (
    read_mv_session,
    refresh_mv_session,
)
from datax_ray.pipelines.replay import ReplayConfig, replay
from datax_ray.sinks.lake import final_table

GAP_S = 1.0  # fixture ts advances ~1ms/event → sessions split on ooo gaps


def _direct(lake: str, gap_s: float):
    """Sequential reference: per-conv gap sessionization of the live state."""
    live = final_table(lake).sort_by(
        [("conv_id", "ascending"), ("ts", "ascending")]
    )
    ts = pc.cast(live["ts"], pa.int64()).to_numpy()
    conv = live["conv_id"].to_numpy(zero_copy_only=False)
    chars = pc.cast(
        pc.fill_null(pc.utf8_length(live["text"]), 0), pa.int64()
    ).to_numpy(zero_copy_only=False)
    gap_us = int(gap_s * 1_000_000)
    rows = []
    cur = None
    for i in range(len(ts)):
        if cur is None or conv[i] != cur["conv_id"] or ts[i] - cur["end"] > gap_us:
            sid = 0 if cur is None or conv[i] != cur["conv_id"] else cur["sid"] + 1
            if cur is not None:
                rows.append(cur)
            cur = {"conv_id": conv[i], "sid": sid, "start": ts[i],
                   "end": ts[i], "n": 1, "chars": int(chars[i])}
        else:
            cur["end"] = ts[i]
            cur["n"] += 1
            cur["chars"] += int(chars[i])
    if cur is not None:
        rows.append(cur)
    import pandas as pd

    df = pd.DataFrame(
        {
            "conv_id": [r["conv_id"] for r in rows],
            "session_idx": np.array([r["sid"] for r in rows], np.int64),
            "start_ts": np.array([r["start"] for r in rows], "datetime64[us]"),
            "end_ts": np.array([r["end"] for r in rows], "datetime64[us]"),
            "n_turns": np.array([r["n"] for r in rows], np.int64),
            "sum_chars": np.array([r["chars"] for r in rows], np.int64),
        }
    )
    return df.sort_values(["conv_id", "session_idx"]).reset_index(drop=True)


def _view(mv: str):
    return (
        read_mv_session(mv)
        .to_pandas()
        .sort_values(["conv_id", "session_idx"])
        .reset_index(drop=True)[
            ["conv_id", "session_idx", "start_ts", "end_ts", "n_turns", "sum_chars"]
        ]
    )


@pytest.fixture()
def lake(tmp_path, ray_session):
    changes = gen_changes(5000, 60, seed=41, p_delete=0.15,
                          out_of_order_frac=0.15)
    chg = str(tmp_path / "chg")
    lk = str(tmp_path / "lake")
    write_segments(changes, chg, seg_rows=1000)
    replay(ReplayConfig(changes_dir=chg, lake_dir=lk, num_partitions=8,
                        segments_per_epoch=2))
    return chg, lk


def test_equals_direct_and_incremental(lake, tmp_path):
    chg, lk = lake
    mv = str(tmp_path / "mv")
    r1 = refresh_mv_session(lk, mv, gap_s=GAP_S)
    assert r1["applied_from"] == -1 and r1["changed_convs"] > 0
    assert _view(mv).equals(_direct(lk, GAP_S))

    # no-op refresh
    r2 = refresh_mv_session(lk, mv, gap_s=GAP_S)
    assert r2["buckets_touched"] == 0

    # incremental refresh after more epochs: only changed convs' buckets
    # rewrite; untouched buckets keep their old generation file
    gen_before = dict(
        __import__("json").load(open(os.path.join(mv, "_mvsession_state.json")))
        ["buckets"]
    )
    more = gen_changes(600, 3, seed=42, p_delete=0.3,
                       out_of_order_frac=0.15)  # only 3 convs change
    more = more.set_column(0, "lsn", pc.add(more["lsn"], pa.scalar(5000, pa.int64())))
    write_segments(more, chg, seg_rows=1000, start_seg=5)
    replay(ReplayConfig(changes_dir=chg, lake_dir=lk, num_partitions=8,
                        segments_per_epoch=2))
    r3 = refresh_mv_session(lk, mv, gap_s=GAP_S)
    assert r3["applied_from"] == r1["applied_to"]
    assert _view(mv).equals(_direct(lk, GAP_S))
    gen_after = dict(
        __import__("json").load(open(os.path.join(mv, "_mvsession_state.json")))
        ["buckets"]
    )
    untouched = [b for b in gen_before if gen_after.get(b) == gen_before[b]]
    assert untouched, "expected at least one untouched bucket generation"


def test_delete_propagation(tmp_path, ray_session):
    """A conv whose every turn is deleted leaves the view entirely."""
    n = 40
    lsn = pa.array(np.arange(2 * n, dtype=np.int64))
    base = 1_700_000_000_000_000
    ts = pa.array(
        np.r_[base + np.arange(n) * 1000, base + 10_000_000 + np.arange(n) * 1000]
        .astype("datetime64[us]")
    )
    ops = ["insert"] * n + ["delete"] * n
    convs = [f"conv-{i % 4}" for i in range(n)] * 2
    turns = pa.array(np.r_[np.arange(n), np.arange(n)].astype(np.int32))
    t = pa.table(
        {
            "lsn": lsn,
            "ts": ts,
            "op": pa.array(ops, pa.string()),
            "conv_id": pa.array(convs, pa.string()),
            "turn_idx": turns,
            "role": pa.array(["user"] * n + [None] * n, pa.string()),
            "text": pa.array(["x" * 5] * n + [None] * n, pa.string()),
            "tool": pa.array([""] * n + [None] * n, pa.string()),
            "ddl": pa.array([None] * 2 * n, pa.string()),
        }
    )
    chg = str(tmp_path / "chg")
    lk = str(tmp_path / "lake")
    write_segments(t.slice(0, n), chg, seg_rows=n)
    replay(ReplayConfig(changes_dir=chg, lake_dir=lk, num_partitions=4,
                        segments_per_epoch=1))
    mv = str(tmp_path / "mv")
    refresh_mv_session(lk, mv, gap_s=3600.0)
    assert _view(mv)["n_turns"].sum() == n

    write_segments(t, chg, seg_rows=n)  # segment 1 = the deletes
    replay(ReplayConfig(changes_dir=chg, lake_dir=lk, num_partitions=4,
                        segments_per_epoch=1))
    refresh_mv_session(lk, mv, gap_s=3600.0)
    assert read_mv_session(mv).count() == 0


def test_fallback_pinning_rebuild(lake, tmp_path):
    chg, lk = lake
    # full-scan fallback (max_point_keys=0 forces it) equals point path
    mv_a = str(tmp_path / "mv_a")
    mv_b = str(tmp_path / "mv_b")
    refresh_mv_session(lk, mv_a, gap_s=GAP_S)
    refresh_mv_session(lk, mv_b, gap_s=GAP_S, max_point_keys=0)
    assert _view(mv_a).equals(_view(mv_b))

    with pytest.raises(ValueError, match="gap_s"):
        refresh_mv_session(lk, mv_a, gap_s=GAP_S * 7)

    # rebuild with a NEW gap re-keys the view from the live lake
    r = refresh_mv_session(lk, mv_a, gap_s=GAP_S * 7, rebuild=True)
    assert r["applied_to"] >= 0
    assert _view(mv_a).equals(_direct(lk, GAP_S * 7))


def test_full_scan_never_ships_driver_key_list(lake, tmp_path, monkeypatch):
    """r3 review item 2: with changed convs above max_point_keys the
    refresh must not collect the key set on the driver — every lake read
    is an unpruned streaming scan (conv_ids=None) and keys route to
    buckets through the same groupby the data takes."""
    import datax_ray.sinks.lake as lakemod

    chg, lk = lake
    calls = []
    real = lakemod.read_lake

    def spy(lake_dir, **kw):
        calls.append(kw.get("conv_ids"))
        return real(lake_dir, **kw)

    monkeypatch.setattr(lakemod, "read_lake", spy)
    mv = str(tmp_path / "mv_scan")
    r = refresh_mv_session(lk, mv, gap_s=GAP_S, max_point_keys=0)
    assert r["changed_convs"] > 0
    assert calls and all(c is None for c in calls)
    assert _view(mv).equals(_direct(lk, GAP_S))
