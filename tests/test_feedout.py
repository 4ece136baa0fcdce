"""Envelope export (sinks/feedout.py): folding the envelope stream in
(epoch, lsn) order reconstructs the lake's final state; jsonl lines parse
and carry raw before/after objects; incremental windows are disjoint and
a second export is a no-op; parquet and jsonl carry identical content."""

import glob
import json
import os

import pyarrow as pa
import pyarrow.compute as pc
import pytest

from datax_ray.fixtures.generator import gen_changes, write_segments
from datax_ray.pipelines.replay import ReplayConfig, replay
from datax_ray.sinks.feedout import (
    export_change_feed_envelopes,
    read_envelopes,
)
from datax_ray.sinks.lake import final_table


@pytest.fixture()
def lake(tmp_path, ray_session):
    changes = gen_changes(4000, 50, seed=61, p_delete=0.15,
                          out_of_order_frac=0.1)
    chg = str(tmp_path / "chg")
    lk = str(tmp_path / "lake")
    write_segments(changes, chg, seg_rows=1000)
    replay(ReplayConfig(changes_dir=chg, lake_dir=lk, num_partitions=8,
                        segments_per_epoch=2))
    return chg, lk


def _fold(env_rows: list[dict]) -> dict:
    """Sequential consumer: apply envelopes in (epoch, lsn) order."""
    state: dict = {}
    for r in sorted(env_rows, key=lambda r: (r["epoch"], r["lsn"],
                                             r["conv_id"], r["turn_idx"])):
        k = (r["conv_id"], r["turn_idx"])
        if r["op"] == "d":
            state.pop(k, None)
        else:
            after = r["after"]
            if isinstance(after, str):
                after = json.loads(after)
            state[k] = after["text"]
    return state


def test_envelopes_reconstruct_final_state(lake, tmp_path):
    _, lk = lake
    out = str(tmp_path / "env")
    r1 = export_change_feed_envelopes(lk, out, fmt="jsonl")
    assert r1["exported_from"] == -1 and r1["rows"] > 0

    rows = read_envelopes(out).take_all()
    # every op present; updates carry BOTH images
    ops = {r["op"] for r in rows}
    assert ops == {"c", "u", "d"}
    for r in rows:
        if r["op"] == "u":
            assert r["before"] is not None and r["after"] is not None
        elif r["op"] == "c":
            assert r["before"] is None and r["after"] is not None
        else:
            assert r["before"] is not None and r["after"] is None

    got = _fold(rows)
    live = final_table(lk)
    want = {
        (c, int(t)): x
        for c, t, x in zip(
            live["conv_id"].to_pylist(),
            live["turn_idx"].to_pylist(),
            live["text"].to_pylist(),
        )
    }
    assert got == want

    # raw jsonl lines parse; before/after are OBJECTS, not strings
    f = sorted(glob.glob(os.path.join(out, "env-*.jsonl")))[0]
    line = json.loads(open(f).readline())
    assert isinstance(line["after"] or line["before"], dict)

    # no-op second export
    r2 = export_change_feed_envelopes(lk, out, fmt="jsonl")
    assert r2["exported_to"] == r2["exported_from"]


def test_incremental_windows_and_parquet_parity(lake, tmp_path):
    chg, lk = lake
    out_j = str(tmp_path / "env_j")
    out_p = str(tmp_path / "env_p")
    export_change_feed_envelopes(lk, out_j, fmt="jsonl")

    more = gen_changes(1200, 50, seed=62, p_delete=0.25,
                       out_of_order_frac=0.1)
    more = more.set_column(0, "lsn", pc.add(more["lsn"],
                                            pa.scalar(4000, pa.int64())))
    write_segments(more, chg, seg_rows=1000, start_seg=4)
    replay(ReplayConfig(changes_dir=chg, lake_dir=lk, num_partitions=8,
                        segments_per_epoch=2))

    r = export_change_feed_envelopes(lk, out_j, fmt="jsonl")
    assert r["exported_from"] >= 0  # only the new window exported
    export_change_feed_envelopes(lk, out_p, fmt="parquet")

    with pytest.raises(ValueError, match="fmt"):
        export_change_feed_envelopes(lk, out_p, fmt="jsonl")

    jr = read_envelopes(out_j).take_all()
    prr = read_envelopes(out_p).take_all()
    assert _fold(jr) == _fold(prr)
    # identical multisets of (op, key, lsn, epoch)
    sig = lambda rs: sorted(
        (r["op"], r["conv_id"], r["turn_idx"], r["lsn"], r["epoch"])
        for r in rs
    )
    assert sig(jr) == sig(prr)
