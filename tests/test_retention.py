"""Age-based retention (pipelines/purge.py:retention): the TTL twin of
the keyed purge — tombstoned rows match a ts-filtered oracle, re-runs
are idempotent, newer source events still win after retention, and the
hard path physically compacts."""

import pyarrow as pa
import pyarrow.compute as pc

from datax_ray.fixtures.generator import gen_changes, write_segments
from datax_ray.oracle import sequential_replay
from datax_ray.pipelines.purge import retention
from datax_ray.pipelines.replay import ReplayConfig, replay
from datax_ray.sinks.lake import final_table


def _build(tmp_path, tag="r", n_events=4000, n_convs=60):
    changes = gen_changes(n_events, n_convs, seed=17, out_of_order_frac=0.1)
    chg = str(tmp_path / f"chg_{tag}")
    lake = str(tmp_path / f"lake_{tag}")
    write_segments(changes, chg, seg_rows=1500)
    replay(ReplayConfig(changes_dir=chg, lake_dir=lake, num_partitions=8))
    return changes, chg, lake


def _median_ts_us(live: pa.Table) -> int:
    ts = sorted(pc.cast(live["ts"], pa.int64()).to_pylist())
    return ts[len(ts) // 2]


def test_retention_matches_ts_filtered_oracle(tmp_path, ray_session):
    changes, _, lake = _build(tmp_path)
    live = final_table(lake)
    cutoff = _median_ts_us(live)
    n_old = int(
        pc.sum(pc.less(pc.cast(live["ts"], pa.int64()), cutoff)).as_py()
    )
    assert n_old > 0

    rep = retention(lake, cutoff)
    assert rep["tombstoned_rows"] == n_old
    assert rep["epoch"] is not None

    ours = final_table(lake)
    oracle = sequential_replay(changes)
    oracle = oracle.filter(
        pc.greater_equal(pc.cast(oracle["ts"], pa.int64()), cutoff)
    )
    assert ours.equals(oracle)

    # idempotent: everything old is already tombstoned
    rep2 = retention(lake, cutoff)
    assert rep2["tombstoned_rows"] == 0 and rep2["epoch"] is None


def test_retention_does_not_fence_future_events(tmp_path, ray_session):
    changes, chg, lake = _build(tmp_path, tag="f")
    live = final_table(lake)
    cutoff = int(pc.max(pc.cast(live["ts"], pa.int64())).as_py()) + 1
    rep = retention(lake, cutoff)  # everything goes
    assert final_table(lake).num_rows == 0
    assert rep["tombstoned_rows"] == live.num_rows

    # a NEW event later than every tombstone ts must re-insert its row
    from datax_ray.fixtures.generator import write_segments as _ws

    key = (live["conv_id"][0].as_py(), live["turn_idx"][0].as_py())
    new = pa.table(
        {
            "lsn": pa.array([10_000_000], pa.int64()),
            "ts": pc.cast(pa.array([cutoff + 1_000_000]), pa.timestamp("us")),
            "op": pa.array(["insert"], pa.string()),
            "conv_id": pa.array([key[0]], pa.string()),
            "turn_idx": pa.array([key[1]], pa.int32()),
            "role": pa.array(["user"], pa.string()),
            "text": pa.array(["fresh after retention"], pa.string()),
            "tool": pa.array([None], pa.string()),
        }
    )
    _ws(new, chg, seg_rows=1000, start_seg=999)
    replay(ReplayConfig(changes_dir=chg, lake_dir=lake, num_partitions=8))
    after = final_table(lake)
    assert after.num_rows == 1
    assert after["text"][0].as_py() == "fresh after retention"


def test_retention_hard_compacts(tmp_path, ray_session):
    _, _, lake = _build(tmp_path, tag="h")
    live = final_table(lake)
    cutoff = _median_ts_us(live)
    rep = retention(lake, cutoff, hard=True)
    assert rep["compacted_ranges"] > 0
    # survivors unchanged by the hard pass
    after = final_table(lake)
    assert after.num_rows == live.num_rows - rep["tombstoned_rows"]


def test_retention_prunes_by_ts_lo(tmp_path, ray_session):
    _, _, lake = _build(tmp_path, tag="p")
    live = final_table(lake)
    lo = int(pc.min(pc.cast(live["ts"], pa.int64())).as_py())
    # cutoff below every event time: all ranges provably hold no old
    # rows -> full prune, nothing scanned, nothing committed
    rep = retention(lake, lo)
    assert rep["ranges_scanned"] == 0 and rep["ranges_pruned"] > 0
    assert rep["tombstoned_rows"] == 0 and rep["epoch"] is None
    # cutoff above the minimum: at least one range scans and tombstones
    rep2 = retention(lake, lo + 1)
    assert rep2["ranges_scanned"] >= 1 and rep2["tombstoned_rows"] >= 1
