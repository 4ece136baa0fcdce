"""ts-clustering compaction (`compact --cluster-ts`, Delta OPTIMIZE
ZORDER analog for the time dimension): bases rewrite sorted by (ts,
conv_id, turn_idx) so their bounded row groups carry tight monotone ts
statistics — `read_lake(min_ts=)`'s pushed ts>=cutoff filter then skips
row groups before decompression. Contracts under test:

- clustering is a pure LAYOUT change: final state, min_ts slices and
  point lookups all stay byte-identical (the merge fold sorts inputs);
- base files are physically ts-sorted with monotone row-group ts stats;
- the policy PERSISTS (cluster-by=ts table property): later replays'
  auto-compaction keeps the layout; `alter --clear-cluster-by` stops it;
- explicit --cluster-ts rewrites every base; policy-only compactions
  stay O(frag-pending ranges).
"""

import pyarrow.compute as pc
import pyarrow.parquet as pq

from datax_ray.fixtures.generator import gen_changes, write_segments
from datax_ray.oracle import sequential_replay
from datax_ray.pipelines.replay import (
    ReplayConfig,
    alter_lake,
    compact_lake,
    replay,
)
from datax_ray.sinks.lake import final_table, read_lake
from datax_ray.state.manifest import Manifest

from tests.test_replay_e2e import assert_tables_equal


def _lake(tmp_path, n_events=4000, seed=31):
    changes = gen_changes(n_events, 60, seed=seed, out_of_order_frac=0.15)
    chg = str(tmp_path / "chg")
    write_segments(changes, chg, seg_rows=800)
    lake = str(tmp_path / "lake")
    replay(ReplayConfig(changes_dir=chg, lake_dir=lake, num_partitions=8,
                        segments_per_epoch=2))
    return lake, chg, changes


def _base_files(lake):
    m = Manifest(lake)
    return [v["base"] for v in m.current_partitions().values() if v.get("base")]


def test_cluster_pure_layout_change(tmp_path, ray_session):
    lake, _, changes = _lake(tmp_path)
    before = final_table(lake)
    out = compact_lake(ReplayConfig(changes_dir="", lake_dir=lake),
                       cluster_ts=True)
    assert out["epoch"] is not None
    assert_tables_equal(final_table(lake), before)
    assert_tables_equal(final_table(lake), sequential_replay(changes))
    # every base is physically ts-sorted, with monotone row-group ts stats
    import os
    for rel in _base_files(lake):
        pf = pq.ParquetFile(os.path.join(lake, rel))
        t = pf.read(columns=["ts"])
        ts = pc.cast(t["ts"], "int64").to_numpy(zero_copy_only=False)
        assert (ts[1:] >= ts[:-1]).all(), f"{rel} not ts-sorted"
        prev_max = None
        for g in range(pf.metadata.num_row_groups):
            st = pf.metadata.row_group(g).column(
                next(i for i in range(pf.metadata.row_group(g).num_columns)
                     if pf.metadata.row_group(g).column(i).path_in_schema == "ts")
            ).statistics
            assert st is not None and st.has_min_max
            if prev_max is not None:
                assert st.min >= prev_max
            prev_max = st.max


def test_cluster_min_ts_and_lookup_equality(tmp_path, ray_session):
    lake, _, _ = _lake(tmp_path, seed=32)
    full = final_table(lake)
    cut = pc.quantile(pc.cast(full["ts"], "int64"), 0.7)[0].as_py()
    slice_before = read_lake(lake, min_ts=int(cut)).take_all()
    key = full["conv_id"][5].as_py()
    look_before = final_table(lake, conv_ids=[key])
    compact_lake(ReplayConfig(changes_dir="", lake_dir=lake), cluster_ts=True)
    import pyarrow as pa
    slice_after = read_lake(lake, min_ts=int(cut)).take_all()

    def norm(rows):
        t = pa.Table.from_pylist(rows) if rows else None
        if t is None:
            return None
        return t.take(pc.sort_indices(t, sort_keys=[
            ("conv_id", "ascending"), ("turn_idx", "ascending")]))
    assert norm(slice_before) == norm(slice_after)
    assert_tables_equal(final_table(lake, conv_ids=[key]), look_before)


def test_cluster_policy_persists_through_replay(tmp_path, ray_session):
    """After one explicit clustering, the table property makes the replay
    path's auto-compaction keep the layout — and the lake still matches
    the sequential oracle after more epochs + compaction."""
    lake, chg, changes = _lake(tmp_path, seed=33)
    compact_lake(ReplayConfig(changes_dir="", lake_dir=lake), cluster_ts=True)
    assert Manifest(lake).committed_properties().get("cluster_by") == "ts"
    lsn0 = int(pc.max(changes["lsn"]).as_py()) + 1
    new = gen_changes(2000, 60, seed=34)
    new = new.set_column(new.schema.get_field_index("lsn"), "lsn",
                         pc.add(pc.cast(new["lsn"], "int64"), lsn0))
    write_segments(new, chg, seg_rows=500, start_seg=50)
    # compact_every=1 => every pending range compacts during the replay
    replay(ReplayConfig(changes_dir=chg, lake_dir=lake, num_partitions=8,
                        compact_every=1))
    import os
    import pyarrow as pa
    expected = sequential_replay(
        pa.concat_tables([changes, new], promote_options="default"))
    assert_tables_equal(final_table(lake), expected)
    for rel in _base_files(lake):
        t = pq.read_table(os.path.join(lake, rel), columns=["ts"])
        ts = pc.cast(t["ts"], "int64").to_numpy(zero_copy_only=False)
        assert (ts[1:] >= ts[:-1]).all(), f"{rel} lost clustering"
    # clear the policy: the next full rewrite restores key order
    alter_lake(lake, clear_cluster_by=True)
    assert "cluster_by" not in Manifest(lake).committed_properties()


def test_policy_only_compaction_stays_bounded(tmp_path, ray_session):
    """With the policy set but no pending fragments, a plain compact is a
    no-op (O(pending), never O(lake)); an explicit --cluster-ts rewrites
    everything."""
    lake, _, _ = _lake(tmp_path, seed=35)
    compact_lake(ReplayConfig(changes_dir="", lake_dir=lake), cluster_ts=True)
    head = Manifest(lake).committed_epoch()
    out = compact_lake(ReplayConfig(changes_dir="", lake_dir=lake))
    assert out["epoch"] is None and out["compacted_ranges"] == 0
    assert Manifest(lake).committed_epoch() == head
    out2 = compact_lake(ReplayConfig(changes_dir="", lake_dir=lake),
                        cluster_ts=True)
    assert out2["compacted_ranges"] > 0
