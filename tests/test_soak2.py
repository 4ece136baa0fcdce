"""Lifecycle soak #2 — the ROUND-3 operational repertoire composed on one
lake: registered artifacts (additive MV, session MV, watermarked window MV,
envelope outbox) kept warm by `sync` across epochs, a retroactive
`backfill` folding through every view, late-event admission, the envelope
round-trip into a second lake, and `status` telling the truth at each
stage. The first soak (tests/test_soak.py) covers ingest/compaction/
migration/vacuum/purge; this one proves the DERIVED-ARTIFACT layer
composes with the same exactness."""

import pyarrow as pa
import pyarrow.compute as pc

from datax_ray.fixtures.generator import gen_changes, write_segments
from datax_ray.pipelines.backfill import backfill
from datax_ray.pipelines.mvadd import read_mv_additive
from datax_ray.pipelines.mvsession import read_mv_session
from datax_ray.pipelines.mvwindow import admit_late_events, read_mv_window
from datax_ray.pipelines.registry import register_artifact, sync_artifacts
from datax_ray.pipelines.replay import ReplayConfig, replay
from datax_ray.pipelines.status import lake_status
from datax_ray.sinks.feedout import export_change_feed_envelopes
from datax_ray.sinks.lake import final_table
from datax_ray.sources.envelope import envelopes_to_segments

GAP_S = 1.0
WINDOW_S = 2


def _shift(t: pa.Table, lsn_off: int, ts_off_s: int) -> pa.Table:
    t = t.set_column(0, "lsn", pc.cast(pc.add(t["lsn"], lsn_off), pa.int64()))
    return t.set_column(
        1, "ts",
        pc.add(t["ts"], pa.scalar(ts_off_s * 1_000_000, pa.duration("us"))),
    )


def _mv_stats_direct(lake):
    live = final_table(lake)
    chars = pc.cast(pc.fill_null(pc.utf8_length(live["text"]), 0), pa.int64())
    g = (
        pa.table({"conv_id": live["conv_id"], "sum_chars": chars})
        .group_by("conv_id", use_threads=False)
        .aggregate([("sum_chars", "sum"), ("conv_id", "count")])
    )
    return {
        r["conv_id"]: (int(r["conv_id_count"]), int(r["sum_chars_sum"]))
        for r in g.to_pylist()
    }


def test_artifact_lifecycle_soak(tmp_path, ray_session):
    chg = str(tmp_path / "chg")
    lake = str(tmp_path / "lake")
    cfg = lambda: ReplayConfig(  # noqa: E731
        changes_dir=chg, lake_dir=lake, num_partitions=8,
        segments_per_epoch=2,
    )

    def ingest(n, seed, lsn_off, ts_off_s, start_seg, **knobs):
        t = _shift(gen_changes(n, 40, seed=seed, **knobs), lsn_off, ts_off_s)
        write_segments(t, chg, seg_rows=max(400, n // 4),
                       start_seg=start_seg)
        replay(cfg())

    ingest(2500, 11, 0, 0, 0, out_of_order_frac=0.2)

    # register the artifact fleet; first sync builds everything
    register_artifact(lake, "stats", "mvadd", str(tmp_path / "mvadd"))
    register_artifact(lake, "sessions", "mvsession", str(tmp_path / "mvs"),
                      {"gap_s": GAP_S})
    register_artifact(lake, "windows", "mvwindow", str(tmp_path / "mvw"),
                      {"window_s": WINDOW_S, "lateness_s": 0.8})
    register_artifact(lake, "outbox", "feedout", str(tmp_path / "env"),
                      {"fmt": "jsonl"})
    assert sync_artifacts(lake)["failed"] == 0

    def check_views():
        mv = {
            r["conv_id"]: (int(r["n_turns"]), int(r["sum_chars"]))
            for r in read_mv_additive(str(tmp_path / "mvadd")).take_all()
        }
        assert mv == _mv_stats_direct(lake)
        # session + window views internally consistent with the live state
        live = final_table(lake)
        n_live = live.num_rows
        sess = read_mv_session(str(tmp_path / "mvs")).take_all()
        assert sum(r["n_turns"] for r in sess) == n_live
        win = read_mv_window(str(tmp_path / "mvw")).take_all()
        late = lake_status(lake)  # status itself must not throw mid-life
        assert late["committed_epoch"] >= 0
        return n_live, win

    check_views()

    # more epochs (with out-of-order stragglers) -> sync keeps all fresh
    ingest(1500, 12, 1_000_000, 30, 20, out_of_order_frac=0.35)
    r = sync_artifacts(lake)
    assert r["failed"] == 0
    check_views()
    st = lake_status(lake)
    assert all(a.get("behind", 0) == 0 for a in st["artifacts"].values())

    # late deltas froze out of the window view: admit them; now the view
    # conserves the full live mass
    admit_late_events(str(tmp_path / "mvw"))
    n_live, win = check_views()
    assert sum(r["n_turns"] for r in win) == n_live

    # retroactive PII-style backfill folds through every view on sync
    spec = [{"name": "dx_replace", "column": "text", "pattern": "the",
             "replacement": "THE"}]
    assert backfill(lake, spec)["rewritten_rows"] > 0
    assert sync_artifacts(lake)["failed"] == 0
    check_views()

    # envelope round-trip into a brand-new lake reproduces the state
    export_change_feed_envelopes(lake, str(tmp_path / "env_rt"), fmt="jsonl")
    envelopes_to_segments(str(tmp_path / "env_rt"), str(tmp_path / "chg_rt"))
    replay(ReplayConfig(changes_dir=str(tmp_path / "chg_rt"),
                        lake_dir=str(tmp_path / "lake_rt"),
                        num_partitions=4, segments_per_epoch=10**9))

    def core(t):
        cols = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
        return (
            t.select(cols)
            .set_column(1, "turn_idx", pc.cast(t["turn_idx"], pa.int64()))
            .sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
        )

    assert core(final_table(str(tmp_path / "lake_rt"))).equals(
        core(final_table(lake))
    )
