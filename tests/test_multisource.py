"""Multi-source replication (MULTISOURCE_SLOTS glsn design, replay.py):
N producer change logs, each with its own strictly-increasing lsn space,
replayed into ONE lake with no merged-log converter and no global sort —
per-source lsns remap into a pinned disjoint glsn space and the ordinary
single-log replay path does the rest.

Oracle strategy: splitting ONE log's segments alternately across two
source dirs yields two valid producers (per-source lsns stay increasing)
whose glsn order is monotone in the original lsn (lsns are globally
unique), so the multi-source lake must equal the single-source lake —
which the DuckDB/sequential oracles already certify. Independent-logs
cases build the expected state by remapping + concatenating the source
tables and running the sequential oracle on the merged stream.
"""

import os
import shutil

import pyarrow as pa
import pyarrow.compute as pc
import pytest

from datax_ray.fixtures.generator import gen_changes, write_segments
from datax_ray.oracle import sequential_replay
from datax_ray.pipelines.replay import (
    MULTISOURCE_SLOTS,
    ReplayConfig,
    replay,
)
from datax_ray.sinks.lake import final_table
from datax_ray.state.manifest import Manifest

from tests.test_replay_e2e import assert_tables_equal


def split_segments(chg_dir: str, out_a: str, out_b: str) -> None:
    """Alternate one log's segment files across two source dirs (keeps
    each source's lsns strictly increasing)."""
    os.makedirs(out_a, exist_ok=True)
    os.makedirs(out_b, exist_ok=True)
    segs = sorted(os.listdir(chg_dir))
    for i, s in enumerate(segs):
        shutil.copy(
            os.path.join(chg_dir, s),
            os.path.join(out_a if i % 2 == 0 else out_b, s),
        )


def remap(t: pa.Table, slot: int, slots: int = MULTISOURCE_SLOTS) -> pa.Table:
    glsn = pc.add(pc.multiply(pc.cast(t["lsn"], "int64"), slots), slot)
    return t.set_column(t.schema.get_field_index("lsn"), "lsn", glsn)


def test_multisource_equals_single(tmp_path):
    """Split one certified log across two producers (with DDL events in
    the stream) — the multi-source lake must equal the single-source one
    byte for byte."""
    changes = gen_changes(4000, 60, seed=42, with_ddl=True, out_of_order_frac=0.2)
    chg = str(tmp_path / "chg")
    write_segments(changes, chg, seg_rows=500)
    a, b = str(tmp_path / "src_a"), str(tmp_path / "src_b")
    split_segments(chg, a, b)

    replay(ReplayConfig(changes_dir=chg, lake_dir=str(tmp_path / "lake1"),
                        num_partitions=8, segments_per_epoch=3))
    reports = replay(
        ReplayConfig(sources={"a": a, "b": b}, lake_dir=str(tmp_path / "lake2"),
                     num_partitions=8, segments_per_epoch=2)
    )
    assert reports
    assert_tables_equal(final_table(str(tmp_path / "lake2")),
                        final_table(str(tmp_path / "lake1")))
    ms = Manifest(str(tmp_path / "lake2")).committed_properties()["multisource"]
    assert ms["slots"] == MULTISOURCE_SLOTS
    assert set(ms["sources"]) == {"a", "b"}
    assert ms["sources"]["a"]["slot"] != ms["sources"]["b"]["slot"]


def test_multisource_independent_logs(tmp_path):
    """Two genuinely independent producers writing OVERLAPPING keys: the
    lake equals the sequential oracle over the glsn-merged stream."""
    ca = gen_changes(3000, 40, seed=1)
    cb = gen_changes(2500, 40, seed=2)  # same conv space, different events
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    write_segments(ca, a, seg_rows=700)
    write_segments(cb, b, seg_rows=700)
    lake = str(tmp_path / "lake")
    replay(ReplayConfig(sources={"a": a, "b": b}, lake_dir=lake, num_partitions=8))
    merged = pa.concat_tables([remap(ca, 0), remap(cb, 1)])
    assert_tables_equal(final_table(lake), sequential_replay(merged))


def test_multisource_incremental_uneven_progress(tmp_path):
    """Sources advance unevenly across replay invocations; the end state
    equals the one-shot replay of everything."""
    ca = gen_changes(3000, 40, seed=1)
    cb = gen_changes(2500, 40, seed=2)
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    segs_a = write_segments(ca, a, seg_rows=700)
    segs_b = write_segments(cb, b, seg_rows=700)
    # stage 1: only a's first two segments exist; b is empty
    a1, b1 = str(tmp_path / "a1"), str(tmp_path / "b1")
    os.makedirs(b1)
    os.makedirs(a1)
    for s in segs_a[:2]:
        shutil.copy(s, a1)
    lake = str(tmp_path / "lake")
    cfg = ReplayConfig(sources={"a": a1, "b": b1}, lake_dir=lake, num_partitions=8)
    r1 = replay(cfg)
    assert r1
    # stage 2: the rest of a + all of b land
    for s in segs_a[2:]:
        shutil.copy(s, a1)
    for s in segs_b:
        shutil.copy(s, b1)
    r2 = replay(cfg)
    assert r2
    merged = pa.concat_tables([remap(ca, 0), remap(cb, 1)])
    assert_tables_equal(final_table(lake), sequential_replay(merged))
    # idempotence: nothing pending => no new epoch
    m = Manifest(lake)
    before = m.committed_epoch()
    assert replay(cfg) == []
    assert m.committed_epoch() == before


def test_multisource_watermark_dedup_redelivery(tmp_path):
    """A producer re-delivers already-committed events inside a NEW
    segment file (binlog replay overlap): the per-source watermark drops
    them exactly; only genuinely new lsns apply."""
    ca = gen_changes(2000, 30, seed=5)
    a = str(tmp_path / "a")
    write_segments(ca, a, seg_rows=1000)
    lake = str(tmp_path / "lake")
    cfg = ReplayConfig(sources={"a": a}, lake_dir=lake, num_partitions=8)
    replay(cfg)
    # new segment = last 500 rows re-delivered + nothing new => no-op rows
    tail_dup = ca.slice(1500, 500)
    import pyarrow.parquet as pq

    pq.write_table(tail_dup, os.path.join(a, "seg-00099.parquet"))
    replay(cfg)  # commits an epoch (segment consumed) but applies 0 events
    assert_tables_equal(final_table(lake), sequential_replay(remap(ca, 0)))
    # the re-delivered segment is recorded committed (won't replay again)
    segs = Manifest(lake).committed_segments()
    assert "a::seg-00099.parquet" in segs


def test_multisource_add_producer_later(tmp_path):
    """Slot assignments are pinned: adding a producer later gets a fresh
    slot and never re-orders the existing history."""
    ca = gen_changes(2000, 30, seed=7)
    cb = gen_changes(1500, 30, seed=8)
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    write_segments(ca, a, seg_rows=600)
    lake = str(tmp_path / "lake")
    replay(ReplayConfig(sources={"a": a}, lake_dir=lake, num_partitions=8))
    slot_a = Manifest(lake).committed_properties()["multisource"]["sources"]["a"]["slot"]
    write_segments(cb, b, seg_rows=600)
    replay(ReplayConfig(sources={"a": a, "b": b}, lake_dir=lake, num_partitions=8))
    ms = Manifest(lake).committed_properties()["multisource"]["sources"]
    assert ms["a"]["slot"] == slot_a
    assert ms["b"]["slot"] != slot_a
    merged = pa.concat_tables(
        [remap(ca, ms["a"]["slot"]), remap(cb, ms["b"]["slot"])]
    )
    assert_tables_equal(final_table(lake), sequential_replay(merged))


def test_multisource_per_source_channel_stats(tmp_path, ray_session):
    """Per-producer channel statistics (rows delivered / deduped) land in
    the committed manifest metrics under stage 'source:<name>'."""
    ca = gen_changes(1200, 20, seed=9)
    cb = gen_changes(800, 20, seed=10)
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    write_segments(ca, a, seg_rows=600)
    write_segments(cb, b, seg_rows=600)
    lake = str(tmp_path / "lake")
    replay(ReplayConfig(sources={"a": a, "b": b}, lake_dir=lake, num_partitions=4))
    metrics = Manifest(lake).latest()["metrics"]
    assert metrics["source:a"]["rows_in"] == 1200
    assert metrics["source:b"]["rows_in"] == 800
    assert metrics["source:a"]["rows_deduped"] == 0
    # re-deliver b's log in new segment files: all rows dedup per-source
    write_segments(cb, b, seg_rows=600, start_seg=50)
    replay(ReplayConfig(sources={"a": a, "b": b}, lake_dir=lake, num_partitions=4))
    metrics = Manifest(lake).latest()["metrics"]
    assert "source:a" not in metrics  # nothing pending from a this epoch
    assert metrics["source:b"]["rows_in"] == 800
    assert metrics["source:b"]["rows_deduped"] == 800


def test_multisource_guards(tmp_path):
    ca = gen_changes(500, 10, seed=3)
    a = str(tmp_path / "a")
    write_segments(ca, a, seg_rows=300)
    lake_multi = str(tmp_path / "lake_multi")
    replay(ReplayConfig(sources={"a": a}, lake_dir=lake_multi, num_partitions=4))
    # single-source replay on a multi-source lake: loud error
    with pytest.raises(ValueError, match="multi-source"):
        replay(ReplayConfig(changes_dir=a, lake_dir=lake_multi, num_partitions=4))
    # multi-source replay on a lake with single-source history: loud error
    lake_single = str(tmp_path / "lake_single")
    replay(ReplayConfig(changes_dir=a, lake_dir=lake_single, num_partitions=4))
    with pytest.raises(ValueError, match="single-source"):
        replay(ReplayConfig(sources={"a": a}, lake_dir=lake_single, num_partitions=4))
    # reserved characters in source names
    with pytest.raises(ValueError, match="reserved"):
        replay(ReplayConfig(sources={"x::y": a}, lake_dir=str(tmp_path / "l3"),
                            num_partitions=4))
    # exactly one of changes_dir / sources
    with pytest.raises(ValueError, match="exactly one"):
        replay(ReplayConfig(changes_dir=a, sources={"a": a},
                            lake_dir=str(tmp_path / "l4")))
    with pytest.raises(ValueError, match="exactly one"):
        replay(ReplayConfig(lake_dir=str(tmp_path / "l5")))


def test_multisource_lsn_cap_guard(tmp_path):
    """Source lsns at/above 2^62/slots would remap into the reserved
    synthetic-lsn space purge/backfill tombstones use to dominate real
    log positions — the replay must refuse them LOUDLY, and the lake
    must stay at its previous committed state (nothing half-applied)."""
    cap = ((1 << 62) - 1) // MULTISOURCE_SLOTS
    ca = gen_changes(400, 10, seed=7)
    over = ca.set_column(
        ca.schema.get_field_index("lsn"), "lsn",
        pc.add(pc.cast(ca["lsn"], "int64"), cap + 1),
    )
    a = str(tmp_path / "a")
    write_segments(over, a, seg_rows=200)
    lake = str(tmp_path / "lake")
    # the guard fires inside the ingest map task; Ray wraps it, so match
    # the message through the propagated cause chain
    with pytest.raises(Exception, match="multi-source cap"):
        replay(ReplayConfig(sources={"a": a}, lake_dir=lake, num_partitions=4))
    assert Manifest(lake).latest() is None  # no epoch committed
    # just-under-cap lsns are fine and still dominate everything real
    under = ca.set_column(
        ca.schema.get_field_index("lsn"), "lsn",
        pc.add(pc.cast(ca["lsn"], "int64"), cap - 500_000),
    )
    b = str(tmp_path / "b")
    write_segments(under, b, seg_rows=200)
    lake2 = str(tmp_path / "lake2")
    replay(ReplayConfig(sources={"b": b}, lake_dir=lake2, num_partitions=4))
    assert_tables_equal(
        final_table(lake2), sequential_replay(remap(under, 0))
    )


def test_multisource_ddl_from_one_source(tmp_path):
    """A DDL event in ONE producer's log evolves the shared lake schema;
    the other producer's rows (which never heard of the column) land
    null-filled, exactly as in the single-log path."""
    ca = gen_changes(2000, 30, seed=11, with_ddl=True)  # adds 'lang'
    cb = gen_changes(1500, 30, seed=12)                 # no DDL
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    write_segments(ca, a, seg_rows=600)
    write_segments(cb, b, seg_rows=600)
    lake = str(tmp_path / "lake")
    replay(ReplayConfig(sources={"a": a, "b": b}, lake_dir=lake, num_partitions=8))
    out = final_table(lake)
    assert "lang" in out.column_names
    if "lang" not in cb.column_names:
        cb = cb.append_column("lang", pa.nulls(cb.num_rows, pa.string()))
    merged = pa.concat_tables(
        [remap(ca, 0), remap(cb, 1)], promote_options="default"
    )
    assert_tables_equal(out, sequential_replay(merged))


def test_multisource_after_bootstrap(tmp_path):
    """Snapshot-then-multi-tail: bootstrap commits with lsn_hi = -1, so
    multi-source replication may start on a bootstrapped lake; snapshot
    rows lose to any change at the same key (bootstrap lsn = -1)."""
    import pyarrow.parquet as pq

    from datax_ray.fixtures.generator import gen_transcripts
    from datax_ray.pipelines.bootstrap import bootstrap

    snap = gen_transcripts(n_convs=40, seed=13)
    snap_path = str(tmp_path / "snap.parquet")
    pq.write_table(snap, snap_path)
    lake = str(tmp_path / "lake")
    bootstrap(snap_path, ReplayConfig(changes_dir="unused",
                                      lake_dir=lake, num_partitions=8))
    ca = gen_changes(2000, 40, seed=14)
    a = str(tmp_path / "a")
    write_segments(ca, a, seg_rows=800)
    replay(ReplayConfig(sources={"a": a}, lake_dir=lake, num_partitions=8))
    assert_tables_equal(
        final_table(lake), sequential_replay(remap(ca, 0), base=snap)
    )
