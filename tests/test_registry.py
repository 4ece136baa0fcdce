"""Artifact registry + sync (pipelines/registry.py): one command refreshes
every registered artifact incrementally; second sync is all no-ops; new
epochs refresh only incrementally; per-artifact errors don't block the
rest; kind/param validation is eager."""

import json
import os

import pyarrow.compute as pc
import pytest

from datax_ray.fixtures.generator import gen_changes, write_segments
from datax_ray.pipelines.registry import (
    list_artifacts,
    register_artifact,
    sync_artifacts,
    unregister_artifact,
)
from datax_ray.pipelines.replay import ReplayConfig, replay


@pytest.fixture()
def lake(tmp_path, ray_session):
    changes = gen_changes(4000, 50, seed=51, p_delete=0.12)
    chg = str(tmp_path / "chg")
    lk = str(tmp_path / "lake")
    write_segments(changes, chg, seg_rows=1000)
    replay(ReplayConfig(changes_dir=chg, lake_dir=lk, num_partitions=8,
                        segments_per_epoch=2))
    return chg, lk


def test_register_sync_incremental(lake, tmp_path):
    chg, lk = lake
    register_artifact(lk, "stats", "mvadd", str(tmp_path / "mvadd"))
    register_artifact(lk, "sessions", "mvsession", str(tmp_path / "mvs"),
                      {"gap_s": 1.0})
    register_artifact(lk, "hourly", "mvwindow", str(tmp_path / "mvw"),
                      {"window_s": 2})
    register_artifact(lk, "terms", "index", str(tmp_path / "idx"))
    register_artifact(lk, "outbox", "export", str(tmp_path / "exp"),
                      {"fmt": "parquet"})
    register_artifact(lk, "cdc_out", "feedout", str(tmp_path / "env"),
                      {"fmt": "jsonl"})
    assert len(list_artifacts(lk)) == 6

    r1 = sync_artifacts(lk)
    assert r1["failed"] == 0 and r1["synced"] == 6
    assert r1["results"]["stats"]["applied_to"] >= 0
    assert os.path.exists(os.path.join(str(tmp_path / "exp"),
                                       "_export_state.json"))

    # second sync: every artifact reports a no-op
    r2 = sync_artifacts(lk)
    assert r2["failed"] == 0
    assert r2["results"]["stats"]["buckets_touched"] == 0
    assert r2["results"]["sessions"]["buckets_touched"] == 0
    assert r2["results"]["hourly"]["buckets_touched"] == 0
    assert r2["results"]["outbox"]["ranges_exported"] == 0
    assert r2["results"]["cdc_out"]["files"] == 0

    # new epochs: sync refreshes incrementally (applied_from advances)
    import pyarrow as pa

    more = gen_changes(1000, 50, seed=52, p_delete=0.2)
    more = more.set_column(0, "lsn", pc.add(more["lsn"],
                                            pa.scalar(4000, pa.int64())))
    write_segments(more, chg, seg_rows=1000, start_seg=4)
    replay(ReplayConfig(changes_dir=chg, lake_dir=lk, num_partitions=8,
                        segments_per_epoch=2))
    r3 = sync_artifacts(lk)
    assert r3["failed"] == 0
    assert r3["results"]["stats"]["applied_from"] == \
        r1["results"]["stats"]["applied_to"]

    # subset sync
    r4 = sync_artifacts(lk, only=["terms"])
    assert list(r4["results"]) == ["terms"]
    with pytest.raises(ValueError, match="not registered"):
        sync_artifacts(lk, only=["nope"])


def test_status_reports_lag_and_sync_clears_it(lake, tmp_path):
    import pyarrow as pa

    from datax_ray.pipelines.status import lake_status

    chg, lk = lake
    register_artifact(lk, "stats", "mvadd", str(tmp_path / "mvadd"))
    register_artifact(lk, "cdc_out", "feedout", str(tmp_path / "env"))
    # an mvwindow artifact registered WITHOUT params must reuse the view's
    # stored window_s on every sync (regression: the 3600 default used to
    # mismatch and fail forever)
    from datax_ray.pipelines.mvwindow import refresh_mv_window

    refresh_mv_window(lk, str(tmp_path / "mvw5"), window_s=5)
    register_artifact(lk, "win5", "mvwindow", str(tmp_path / "mvw5"))
    from datax_ray.pipelines.mvsession import refresh_mv_session

    refresh_mv_session(lk, str(tmp_path / "mvs7"), gap_s=7.0)
    register_artifact(lk, "sess7", "mvsession", str(tmp_path / "mvs7"))

    st0 = lake_status(lk)
    assert st0["artifacts"]["stats"]["state"] == "never refreshed"
    sync_artifacts(lk)
    st1 = lake_status(lk)
    assert st1["artifacts"]["stats"]["behind"] == 0
    assert st1["artifacts"]["cdc_out"]["behind"] == 0

    more = gen_changes(800, 50, seed=53)
    more = more.set_column(0, "lsn", pc.add(more["lsn"],
                                            pa.scalar(4000, pa.int64())))
    write_segments(more, chg, seg_rows=1000, start_seg=4)
    replay(ReplayConfig(changes_dir=chg, lake_dir=lk, num_partitions=8,
                        segments_per_epoch=2))
    st2 = lake_status(lk)
    assert st2["artifacts"]["stats"]["behind"] > 0
    assert st2["committed_epoch"] > st1["committed_epoch"]
    sync_artifacts(lk)
    st3 = lake_status(lk)
    assert all(a.get("behind", 0) == 0 for a in st3["artifacts"].values())
    assert st3["deadletter"]["pending_files"] == 0


def test_concurrent_syncs_are_safe(lake, tmp_path):
    """Two racing sync_artifacts calls on the same fleet: every refresher
    writes content-deterministic generation files (os.replace-atomic, same
    bytes from both racers) and the state replace is atomic, so both
    finish ok and the views equal a direct recompute."""
    import threading

    from datax_ray.pipelines.mvadd import read_mv_additive
    from datax_ray.sinks.lake import final_table

    _, lk = lake
    register_artifact(lk, "stats", "mvadd", str(tmp_path / "mvadd"))
    register_artifact(lk, "sessions", "mvsession", str(tmp_path / "mvs"),
                      {"gap_s": 1.0})

    results = [None, None]

    def run(i):
        results[i] = sync_artifacts(lk)

    ts = [threading.Thread(target=run, args=(i,)) for i in range(2)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert all(r is not None and r["failed"] == 0 for r in results)

    import pyarrow as pa
    import pyarrow.compute as pc2

    live = final_table(lk)
    chars = pc2.cast(pc2.fill_null(pc2.utf8_length(live["text"]), 0),
                     pa.int64())
    want = (
        pa.table({"conv_id": live["conv_id"], "c": chars})
        .group_by("conv_id", use_threads=False)
        .aggregate([("c", "sum")])
    )
    want_map = {r["conv_id"]: int(r["c_sum"]) for r in want.to_pylist()}
    got = {
        r["conv_id"]: int(r["sum_chars"])
        for r in read_mv_additive(str(tmp_path / "mvadd")).take_all()
    }
    assert got == want_map


def test_validation_errors_and_isolation(lake, tmp_path):
    _, lk = lake
    with pytest.raises(ValueError, match="unknown artifact kind"):
        register_artifact(lk, "x", "warp-drive", str(tmp_path / "x"))
    with pytest.raises(ValueError, match="does not accept params"):
        register_artifact(lk, "x", "mvadd", str(tmp_path / "x"),
                          {"gap_s": 1.0})

    # a broken artifact (bad column) fails alone; the good one still syncs
    register_artifact(lk, "bad", "colindex", str(tmp_path / "ci"),
                      {"column": "no_such_column"})
    register_artifact(lk, "good", "mvadd", str(tmp_path / "mvadd2"))
    r = sync_artifacts(lk)
    assert r["failed"] == 1
    assert not r["results"]["bad"]["ok"]
    assert r["results"]["good"]["ok"]

    assert unregister_artifact(lk, "bad")["found"]
    assert not unregister_artifact(lk, "bad")["found"]
    assert sync_artifacts(lk)["failed"] == 0


def test_scrubbed_export_artifact_syncs_redacted(lake, tmp_path):
    """Registry kind 'export' accepts a transformers param: `sync` keeps
    a REDACTED mirror warm (dx_mask applied on the way out), incremental
    and idempotent like every artifact."""
    import glob

    import pyarrow.parquet as pq

    from datax_ray.pipelines.registry import sync_artifacts

    chg, lk = lake
    spec = [{"name": "dx_mask", "column": "text",
             "pattern": "[0-9]+", "replacement": "#"}]
    out = str(tmp_path / "scrubbed")
    register_artifact(lk, "pub", "export", out,
                      {"fmt": "parquet", "transformers": spec})
    r1 = sync_artifacts(lk)
    assert r1["results"]["pub"]["ranges_exported"] > 0
    texts = []
    for p in glob.glob(os.path.join(out, "r=*", "*.parquet")):
        texts += [t for t in pq.read_table(p)["text"].to_pylist() if t]
    assert texts and all(not any(c.isdigit() for c in t) for t in texts)
    r2 = sync_artifacts(lk)
    assert r2["results"]["pub"]["ranges_exported"] == 0
