"""JOIN MV (pipelines/mvjoin.py): equality with a direct join of both
live lakes, delta-keyed incrementality (untouched buckets keep their old
generation file), delete propagation, no-op refresh, crash-retry
determinism, and the vacuum-fallback rebuild."""

import glob
import json
import os
import shutil

import pyarrow as pa
import pyarrow.compute as pc
import pytest

from datax_ray.fixtures.generator import gen_changes, write_segments
from datax_ray.pipelines.mvjoin import read_mv_join, refresh_mv_join
from datax_ray.pipelines.replay import ReplayConfig, replay
from datax_ray.sinks.lake import final_table

VIEW_COLS = ["conv_id", "turn_idx", "role", "text", "r_text"]


def _direct(left: str, right: str):
    l = final_table(left).select(["conv_id", "turn_idx", "role", "text"])
    r = final_table(right).select(["conv_id", "text"]).rename_columns(
        ["conv_id", "r_text"]
    )
    j = l.join(r, keys=["conv_id"], join_type="inner")
    return (
        j.select(VIEW_COLS)
        .to_pandas()
        .sort_values(VIEW_COLS)
        .reset_index(drop=True)
    )


def _view(mv: str):
    return (
        read_mv_join(mv)
        .to_pandas()[VIEW_COLS]
        .sort_values(VIEW_COLS)
        .reset_index(drop=True)
    )


def _replay_more(chg: str, lk: str, seed: int, lsn_base: int, *, max_turns=20,
                 n_events=1500, start_seg=100, p_delete=0.09, n_convs=60):
    more = gen_changes(n_events, n_convs, seed=seed, max_turns=max_turns,
                       p_delete=p_delete)
    more = more.set_column(
        more.schema.get_field_index("lsn"), "lsn",
        pc.add(more["lsn"], lsn_base),
    )
    write_segments(more, chg, seg_rows=500, start_seg=start_seg)
    replay(ReplayConfig(changes_dir=chg, lake_dir=lk, num_partitions=8,
                        segments_per_epoch=2))


@pytest.fixture()
def lakes(tmp_path, ray_session):
    lchg, rchg = str(tmp_path / "lchg"), str(tmp_path / "rchg")
    ll, rl = str(tmp_path / "left"), str(tmp_path / "right")
    write_segments(gen_changes(4000, 60, seed=31), lchg, seg_rows=1000)
    # dimension side: max_turns=1 -> one live turn-0 row per conv (LWW
    # keeps the latest); some convs deleted so the inner join drops them
    write_segments(
        gen_changes(1500, 60, seed=32, max_turns=1, p_delete=0.15),
        rchg, seg_rows=500,
    )
    cfg = dict(num_partitions=8, segments_per_epoch=2)
    replay(ReplayConfig(changes_dir=lchg, lake_dir=ll, **cfg))
    replay(ReplayConfig(changes_dir=rchg, lake_dir=rl, **cfg))
    return lchg, rchg, ll, rl


def test_join_mv_equals_direct_and_incremental(lakes, tmp_path):
    lchg, rchg, ll, rl = lakes
    mv = str(tmp_path / "mv")
    r1 = refresh_mv_join(ll, rl, mv)
    assert r1["rows"] > 0
    assert _view(mv).equals(_direct(ll, rl))

    # no-op refresh
    r2 = refresh_mv_join(ll, rl, mv)
    assert r2["buckets_touched"] == 0 and r2["rows"] == r1["rows"]

    # advance LEFT only: second refresh folds just the new epochs' keys
    files_before = {
        os.path.basename(p) for p in glob.glob(os.path.join(mv, "b=*.parquet"))
    }
    # the delta touches only the first 5 convs of the 60-conv universe
    _replay_more(lchg, ll, seed=33, lsn_base=1_000_000, n_events=200,
                 n_convs=5)
    r3 = refresh_mv_join(ll, rl, mv)
    assert r3["applied_left"] > r1["applied_left"]
    assert r3["applied_right"] == r1["applied_right"]
    assert _view(mv).equals(_direct(ll, rl))
    # untouched buckets kept their old generation file (old epoch suffix)
    files_after = {
        os.path.basename(p) for p in glob.glob(os.path.join(mv, "b=*.parquet"))
    }
    assert files_before & files_after, "every bucket rewrote — not delta-keyed"
    assert 0 < r3["buckets_touched"]

    # advance RIGHT only: dimension updates re-join their convs' turns
    _replay_more(rchg, rl, seed=34, lsn_base=1_000_000, max_turns=1,
                 n_events=400, p_delete=0.3)
    r4 = refresh_mv_join(ll, rl, mv)
    assert r4["applied_right"] > r3["applied_right"]
    assert _view(mv).equals(_direct(ll, rl))


def test_join_mv_delete_propagates(lakes, tmp_path):
    lchg, rchg, ll, rl = lakes
    mv = str(tmp_path / "mv")
    refresh_mv_join(ll, rl, mv)
    view0 = _view(mv)
    conv = view0["conv_id"].iloc[0]

    # delete the conv's single dimension row -> inner join drops the conv
    dim = final_table(rl)
    row = dim.filter(pc.equal(dim["conv_id"], conv))
    assert row.num_rows == 1
    dead = pa.table(
        {
            "lsn": pa.array([5_000_000], pa.int64()),
            "ts": pa.array([pc.max(dim["ts"]).as_py()], pa.timestamp("us")),
            "op": pa.array(["delete"], pa.string()),
            "conv_id": pa.array([conv], pa.string()),
            "turn_idx": pa.array([0], pa.int32()),
            "role": pa.array([None], pa.string()),
            "text": pa.array([None], pa.string()),
            "tool": pa.array([None], pa.string()),
            "ddl": pa.array([None], pa.string()),
        }
    )
    write_segments(dead, rchg, seg_rows=10, start_seg=500)
    replay(ReplayConfig(changes_dir=rchg, lake_dir=rl, num_partitions=8,
                        segments_per_epoch=2))
    refresh_mv_join(ll, rl, mv)
    got = _view(mv)
    assert (got["conv_id"] == conv).sum() == 0
    assert got.equals(_direct(ll, rl))


def test_join_mv_crash_retry_deterministic(lakes, tmp_path):
    lchg, rchg, ll, rl = lakes
    mv = str(tmp_path / "mv")
    refresh_mv_join(ll, rl, mv)
    state_path = os.path.join(mv, "_mvjoin_state.json")
    committed_state = json.load(open(state_path))
    gen1 = str(tmp_path / "gen1")
    os.makedirs(gen1)
    for p in glob.glob(os.path.join(mv, "b=*.parquet")):
        shutil.copy2(p, os.path.join(gen1, os.path.basename(p)))

    _replay_more(lchg, ll, seed=35, lsn_base=2_000_000, n_events=800)
    refresh_mv_join(ll, rl, mv)
    files_after = {
        os.path.basename(p): os.path.getsize(p)
        for p in glob.glob(os.path.join(mv, "b=*.parquet"))
    }
    # pre-crash disk: gen-2 files written, state still gen 1, gen-1 files
    # still present (GC runs only after the publish)
    json.dump(committed_state, open(state_path, "w"))
    for p in glob.glob(os.path.join(gen1, "b=*.parquet")):
        shutil.copy2(p, os.path.join(mv, os.path.basename(p)))
    refresh_mv_join(ll, rl, mv)
    files_retry = {
        os.path.basename(p): os.path.getsize(p)
        for p in glob.glob(os.path.join(mv, "b=*.parquet"))
    }
    assert files_retry == files_after  # same names, same bytes
    assert _view(mv).equals(_direct(ll, rl))


def test_join_mv_vacuum_fallback_rebuild(lakes, tmp_path):
    lchg, rchg, ll, rl = lakes
    mv = str(tmp_path / "mv")
    refresh_mv_join(ll, rl, mv)

    from datax_ray.state.manifest import Manifest

    _replay_more(lchg, ll, seed=36, lsn_base=3_000_000, n_events=600)
    Manifest(ll).vacuum(keep_epochs=1)
    with pytest.raises(ValueError, match="vacuum"):
        refresh_mv_join(ll, rl, mv)
    refresh_mv_join(ll, rl, mv, rebuild=True)
    assert _view(mv).equals(_direct(ll, rl))


def test_join_mv_full_scan_fallback_matches(lakes, tmp_path):
    """max_point_keys=0 forces the streaming full-scan path — results
    must be identical to the point-read plan."""
    lchg, rchg, ll, rl = lakes
    mv1, mv2 = str(tmp_path / "mv1"), str(tmp_path / "mv2")
    refresh_mv_join(ll, rl, mv1)
    refresh_mv_join(ll, rl, mv2, max_point_keys=0)
    assert _view(mv1).equals(_view(mv2))
