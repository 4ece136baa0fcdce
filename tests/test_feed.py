"""Change data feed: the feed over (A, B] is a complete delta — folding it
onto the lake state AS OF A reproduces the state AS OF B row-for-row."""

import pyarrow as pa
import pyarrow.compute as pc
import pytest

from datax_ray.fixtures.generator import gen_changes, write_segments
from datax_ray.pipelines.feed import plan_change_feed, read_change_feed
from datax_ray.pipelines.replay import ReplayConfig, replay
from datax_ray.schemas import DELETED_COL, INTERNAL_COLS
from datax_ray.sinks.lake import final_table, lake_schema, read_lake
from datax_ray.state.manifest import Manifest


def _build(tmp_path, compact_every=99):
    changes = gen_changes(4000, 60, seed=21, out_of_order_frac=0.1, dup_frac=0.02)
    chg = str(tmp_path / "chg")
    lake = str(tmp_path / "lake")
    write_segments(changes, chg, seg_rows=1000)
    replay(
        ReplayConfig(
            changes_dir=chg,
            lake_dir=lake,
            num_partitions=16,
            segments_per_epoch=1,
            compact_every=compact_every,
        )
    )
    return lake


def _fold(base_tables, lake, to_epoch):
    from datax_ray.stages.merge import merge_states

    schema = lake_schema(lake, to_epoch)
    state = merge_states(base_tables, schema)
    live = state.filter(pc.fill_null(pc.invert(state[DELETED_COL]), True))
    return live.drop_columns([c for c in INTERNAL_COLS if c in live.column_names])


def _feed_tables(lake, a, b):
    import ray

    tables = [x for x in ray.get(read_change_feed(lake, a, b).to_arrow_refs()) if x.num_rows]
    return [tbl.drop_columns(["_epoch"]) for tbl in tables]


def test_feed_from_beginning_rebuilds_final_state(tmp_path):
    lake = _build(tmp_path)
    committed = Manifest(lake).committed_epoch()
    assert committed >= 2  # multi-epoch
    got = _fold(_feed_tables(lake, -1, committed), lake, committed)
    want = final_table(lake)
    assert got.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")]).equals(
        want
    )


def test_feed_window_advances_state_exactly(tmp_path):
    """State(A) + feed(A, B] == State(B), for a middle window — and with
    compaction running inside the window (compaction bases excluded)."""
    lake = _build(tmp_path, compact_every=2)
    committed = Manifest(lake).committed_epoch()
    a, b = 1, committed
    import ray

    base = read_lake(
        lake, include_internal=True, as_of_epoch=a, keep_tombstones=True
    )
    base_tables = [t for t in ray.get(base.to_arrow_refs()) if t.num_rows]
    got = _fold(base_tables + _feed_tables(lake, a, b), lake, b)
    want = final_table(lake, as_of_epoch=b)
    assert got.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")]).equals(
        want
    )


def test_feed_empty_window_and_bad_bounds(tmp_path):
    lake = _build(tmp_path)
    committed = Manifest(lake).committed_epoch()
    assert plan_change_feed(lake, committed, committed) == []
    assert read_change_feed(lake, committed).count() == 0
    with pytest.raises(ValueError, match="committed"):
        plan_change_feed(lake, 0, committed + 5)


def test_feed_past_retention_raises(tmp_path):
    lake = _build(tmp_path)
    Manifest(lake).vacuum(keep_epochs=1)
    with pytest.raises(ValueError, match="vacuum|retention"):
        plan_change_feed(lake, -1)


def test_feed_covers_bootstrap_snapshot(tmp_path):
    import pyarrow.parquet as pq

    from datax_ray.fixtures.generator import gen_transcripts
    from datax_ray.pipelines.bootstrap import bootstrap

    snap = str(tmp_path / "snap.parquet")
    pq.write_table(gen_transcripts(n_convs=40, seed=5), snap)
    lake = str(tmp_path / "lake_bs")
    chg = str(tmp_path / "chg_bs")
    write_segments(gen_changes(1500, 40, seed=6), chg, seg_rows=800)
    bootstrap(snap, ReplayConfig(changes_dir="", lake_dir=lake, num_partitions=8))
    replay(ReplayConfig(changes_dir=chg, lake_dir=lake, num_partitions=8))
    committed = Manifest(lake).committed_epoch()
    got = _fold(_feed_tables(lake, -1, committed), lake, committed)
    want = final_table(lake)
    assert got.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")]).equals(
        want
    )


def test_plain_feed_skips_migration_epochs(tmp_path):
    """A feed window spanning a layout repartition must NOT re-emit the
    whole lake (migration changes no values; its CDC delta is empty), and
    the fold-forward contract must still hold across it."""
    import pyarrow as pa
    import pyarrow.compute as pc

    import ray

    from datax_ray.fixtures.generator import gen_changes, write_segments
    from datax_ray.pipelines.feed import plan_change_feed, read_change_feed
    from datax_ray.pipelines.repartition import repartition_lake
    from datax_ray.pipelines.replay import ReplayConfig, replay
    from datax_ray.schemas import DELETED_COL, INTERNAL_COLS
    from datax_ray.sinks.lake import final_table, lake_schema, read_lake
    from datax_ray.stages.merge import merge_states
    from datax_ray.state.manifest import Manifest

    changes = gen_changes(3000, 40, seed=71, out_of_order_frac=0.1)
    chg, lake = str(tmp_path / "chg"), str(tmp_path / "lake")
    write_segments(changes, chg, seg_rows=1000)
    replay(ReplayConfig(changes_dir=chg, lake_dir=lake, num_partitions=8,
                        segments_per_epoch=2))
    m = Manifest(lake)
    a = m.committed_epoch()

    rep = repartition_lake(lake, 20, salt_turn_width=4, compact=False)
    mig_epoch = rep["epoch"]
    b = m.committed_epoch()

    plan = plan_change_feed(lake, a, b)
    assert all(p["epoch"] != mig_epoch for p in plan)
    assert plan == []  # nothing else happened in (a, b]

    # Fold-forward across the migration window: state(a) + feed(a,b]
    # (empty) == live state(b).
    base_tables = [
        t for t in ray.get(
            read_lake(lake, as_of_epoch=a, keep_tombstones=True,
                      include_internal=True).to_arrow_refs()
        ) if t.num_rows
    ]
    feed_tables = [
        t.drop_columns(["_epoch"])
        for t in ray.get(read_change_feed(lake, a, b).to_arrow_refs())
        if t.num_rows
    ]
    state = merge_states(base_tables + feed_tables, lake_schema(lake, b))
    live = state.filter(pc.fill_null(pc.invert(state[DELETED_COL]), True))
    live = live.drop_columns(
        [c for c in INTERNAL_COLS if c in live.column_names]
    )
    assert live.equals(final_table(lake))


def test_named_consumer_offsets(tmp_path):
    """feed --consumer semantics: first read delivers everything, the
    acknowledged offset persists, the next read delivers ONLY new epochs,
    and an unacknowledged read re-delivers (at-least-once)."""
    from datax_ray.pipelines.feed import (
        commit_consumer,
        consumer_offset,
        read_change_feed_consumer,
    )

    lake = _build(tmp_path)
    head = Manifest(lake).committed_epoch()

    ds, frm, to = read_change_feed_consumer(lake, "sink-a")
    assert (frm, to) == (-1, head)
    n_all = ds.count()
    assert n_all > 0
    # not acknowledged yet -> a re-read delivers the same window
    ds2, frm2, to2 = read_change_feed_consumer(lake, "sink-a")
    assert (frm2, to2) == (-1, head) and ds2.count() == n_all

    commit_consumer(lake, "sink-a", to)
    assert consumer_offset(lake, "sink-a") == head
    ds3, frm3, to3 = read_change_feed_consumer(lake, "sink-a")
    assert (frm3, to3) == (head, head) and ds3.count() == 0

    # new epochs -> only the delta is delivered
    more = gen_changes(600, 20, seed=91)
    more = more.set_column(
        more.schema.get_field_index("lsn"), "lsn",
        pc.cast(pc.add(more["lsn"], 1_000_000), pa.int64()),
    )
    chg = str(tmp_path / "chg")
    write_segments(more, chg, seg_rows=600, start_seg=20)
    replay(ReplayConfig(changes_dir=chg, lake_dir=lake, num_partitions=16))
    new_head = Manifest(lake).committed_epoch()
    assert new_head > head
    ds4, frm4, to4 = read_change_feed_consumer(lake, "sink-a")
    assert (frm4, to4) == (head, new_head)
    delta = ds4.count()
    assert 0 < delta < n_all
    # a second, independent consumer still sees everything
    ds5, frm5, _ = read_change_feed_consumer(lake, "sink-b")
    assert frm5 == -1 and ds5.count() == n_all + delta

    with pytest.raises(ValueError):
        consumer_offset(lake, "../escape")
