"""Lake→lake incremental replication (pipelines/replicate.py).

Contract: after replicate(), the destination's final state equals the
source's row-for-row — including schema evolution (DDL replicated as
synthetic ddl events), tombstones (deletes don't resurrect), and a
DIFFERENT destination layout (re-sharding on apply). Sync N+1 ships only
epochs the destination hasn't committed (exactly-once bookkeeping derived
from the destination manifest's consumed-segment names).
"""

import os

import pyarrow.parquet as pq

from datax_ray.fixtures.generator import gen_changes, write_segments
from datax_ray.pipelines.replay import ReplayConfig, replay
from datax_ray.pipelines.replicate import replicate, replicated_through
from datax_ray.sinks.lake import final_table


def _final_records(lake):
    t = final_table(lake)
    return t.to_pandas().to_dict("records")


def _src_lake(tmp_path, with_ddl=False, segments_per_epoch=2):
    changes = str(tmp_path / "changes")
    table = gen_changes(
        3000, 60, seed=11, dup_frac=0.02, out_of_order_frac=0.1,
        corrupt_frac=0.02, with_ddl=with_ddl,
    )
    write_segments(table, changes, seg_rows=500)
    src = str(tmp_path / "src")
    replay(
        ReplayConfig(
            changes_dir=changes,
            lake_dir=src,
            num_partitions=8,
            segments_per_epoch=segments_per_epoch,
            compact_every=3,
        )
    )
    return src


def test_replica_matches_source(tmp_path, ray_session):
    src = _src_lake(tmp_path)
    dst = str(tmp_path / "dst")
    stats = replicate(src, dst, num_partitions=4)  # different layout
    # coalesced catch-up: the whole window lands as ONE destination epoch
    assert stats["epochs_applied"] == 1
    assert _final_records(dst) == _final_records(src)


def test_replica_matches_source_per_epoch(tmp_path, ray_session):
    """per_epoch=True mirrors the source epoch-for-epoch (strict mode)."""
    src = _src_lake(tmp_path)
    dst = str(tmp_path / "dst")
    stats = replicate(src, dst, num_partitions=4, per_epoch=True)
    assert stats["epochs_applied"] >= 2
    assert _final_records(dst) == _final_records(src)


def test_replicate_is_incremental_and_idempotent(tmp_path, ray_session):
    changes = str(tmp_path / "changes")
    table = gen_changes(2400, 50, seed=3, dup_frac=0.02, out_of_order_frac=0.1)
    write_segments(table, changes, seg_rows=400)
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    # first half of the stream
    replay(
        ReplayConfig(
            changes_dir=changes, lake_dir=src, num_partitions=8,
            segments_per_epoch=3,
        )
    )
    # six segments written above; replay consumed all. Re-point: delete
    # nothing — instead sync twice around fresh source epochs.
    s1 = replicate(src, dst)
    assert _final_records(dst) == _final_records(src)
    through = replicated_through(dst)

    # more source epochs arrive (a second change batch)
    t2 = gen_changes(1200, 50, seed=4)
    import pyarrow as pa
    import pyarrow.compute as pc

    t2 = t2.set_column(
        t2.schema.get_field_index("lsn"), "lsn", pc.add(t2["lsn"], 10_000)
    )
    t2 = t2.set_column(
        t2.schema.get_field_index("ts"),
        "ts",
        pc.cast(
            pc.add(pc.cast(t2["ts"], pa.int64()), 3_600_000_000),
            pa.timestamp("us"),
        ),
    )
    pq.write_table(t2, os.path.join(changes, "seg-99999.parquet"))
    replay(
        ReplayConfig(
            changes_dir=changes, lake_dir=src, num_partitions=8,
            segments_per_epoch=3,
        )
    )
    s2 = replicate(src, dst)
    assert replicated_through(dst) > through  # advanced
    assert s2["from_epoch"] == through  # shipped only the delta
    assert _final_records(dst) == _final_records(src)

    # idempotence: nothing new -> no epochs applied, state unchanged
    s3 = replicate(src, dst)
    assert s3["epochs_applied"] == 0
    assert _final_records(dst) == _final_records(src)


def test_replicates_schema_evolution(tmp_path, ray_session):
    src = _src_lake(tmp_path, with_ddl=True)
    dst = str(tmp_path / "dst")
    replicate(src, dst, num_partitions=4)
    src_t, dst_t = final_table(src), final_table(dst)
    assert src_t.schema.names == dst_t.schema.names  # lang added, turn widened
    assert src_t.schema == dst_t.schema
    assert _final_records(dst) == _final_records(src)


def test_replica_survives_source_compaction_and_purge_window(
    tmp_path, ray_session
):
    """Replication reads only fragments (compaction bases excluded), so a
    compacted source replicates identically."""
    src = _src_lake(tmp_path, segments_per_epoch=1)  # many epochs, compactions
    dst = str(tmp_path / "dst")
    replicate(src, dst)
    assert _final_records(dst) == _final_records(src)
