"""Automatic schema evolution (`replay --auto-ddl` /
sources/changelog.py:scan_schema_drift): new or widened payload columns
detected from parquet segment FOOTERS fold as synthetic add_column/widen
DDL — the Debezium/Fivetran "the column just appears in the source"
story, with zero data pages read at planning time. Contracts:

- a stream that CARRIES a new column but never declares DDL produces the
  same lake as the explicitly-DDL'd stream;
- widened segment types (int32→int64) widen the lake schema;
- the lake's pinned schema policy gates synthetic verbs exactly like
  stream DDL (additive forbids auto-widen, aborts pre-write);
- auto_ddl OFF keeps today's behavior (unknown columns dropped);
- unmappable Arrow types refuse loudly.
"""

import json

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from datax_ray.fixtures.generator import gen_changes, write_segments
from datax_ray.oracle import sequential_replay
from datax_ray.pipelines.replay import ReplayConfig, alter_lake, replay
from datax_ray.sinks.lake import final_table, lake_schema
from datax_ray.sources.changelog import scan_schema_drift
from datax_ray.state.manifest import Manifest

from tests.test_replay_e2e import assert_tables_equal


def _strip_ddl(t: pa.Table) -> pa.Table:
    """Drop the op='ddl' rows but KEEP the payload column they would have
    declared — the undeclared-schema-drift stream."""
    return t.filter(pc.fill_null(pc.invert(pc.equal(t["op"], "ddl")), True))


def test_autoddl_equals_explicit_ddl(tmp_path, ray_session):
    changes = gen_changes(3000, 40, seed=41, with_ddl=True)
    stripped = _strip_ddl(changes)
    chg = str(tmp_path / "chg")
    write_segments(stripped, chg, seg_rows=700)
    lake = str(tmp_path / "lake")
    replay(ReplayConfig(changes_dir=chg, lake_dir=lake, num_partitions=8,
                        auto_ddl=True))
    out = final_table(lake)
    assert "lang" in out.column_names
    # Oracle stream: the explicit add_column DDL kept, the explicit WIDEN
    # dropped — a widen is NOT footer-inferable here (segments physically
    # store int32), so auto-ddl correctly does not apply it. Otherwise the
    # two streams must land the identical lake.
    keep = pc.or_kleene(
        pc.invert(pc.fill_null(pc.equal(changes["op"], "ddl"), False)),
        pc.match_substring(pc.fill_null(changes["ddl"], ""), "add_column"),
    )
    assert_tables_equal(out, sequential_replay(changes.filter(keep)))


def test_autoddl_off_drops_unknown_columns(tmp_path, ray_session):
    changes = gen_changes(1500, 30, seed=42, with_ddl=True)
    chg = str(tmp_path / "chg")
    write_segments(_strip_ddl(changes), chg, seg_rows=700)
    lake = str(tmp_path / "lake")
    replay(ReplayConfig(changes_dir=chg, lake_dir=lake, num_partitions=8))
    assert "lang" not in lake_schema(lake).names


def test_autoddl_widen(tmp_path, ray_session):
    changes = gen_changes(1500, 30, seed=43)
    chg = str(tmp_path / "chg")
    write_segments(changes, chg, seg_rows=800)
    lake = str(tmp_path / "lake")
    replay(ReplayConfig(changes_dir=chg, lake_dir=lake, num_partitions=8))
    assert lake_schema(lake).field("turn_idx").type == pa.int32()
    lsn0 = int(pc.max(changes["lsn"]).as_py()) + 1
    new = gen_changes(800, 30, seed=44)
    new = new.set_column(new.schema.get_field_index("lsn"), "lsn",
                         pc.add(pc.cast(new["lsn"], "int64"), lsn0))
    new = new.set_column(new.schema.get_field_index("turn_idx"), "turn_idx",
                         pc.cast(new["turn_idx"], pa.int64()))
    write_segments(new, chg, seg_rows=400, start_seg=50)
    replay(ReplayConfig(changes_dir=chg, lake_dir=lake, num_partitions=8,
                        auto_ddl=True))
    assert lake_schema(lake).field("turn_idx").type == pa.int64()
    expected = sequential_replay(
        pa.concat_tables([changes, new.set_column(
            new.schema.get_field_index("turn_idx"), "turn_idx",
            pc.cast(new["turn_idx"], pa.int32()))], promote_options="default")
    )
    out = final_table(lake)
    assert out["turn_idx"].type == pa.int64()
    assert_tables_equal(
        out.set_column(out.schema.get_field_index("turn_idx"), "turn_idx",
                       pc.cast(out["turn_idx"], pa.int32())),
        expected,
    )


def test_autoddl_respects_schema_policy(tmp_path, ray_session):
    from datax_ray.state.schema_tracker import SchemaPolicyViolation

    changes = gen_changes(1200, 25, seed=45)
    chg = str(tmp_path / "chg")
    write_segments(changes, chg, seg_rows=600)
    lake = str(tmp_path / "lake")
    replay(ReplayConfig(changes_dir=chg, lake_dir=lake, num_partitions=8))
    alter_lake(lake, schema_policy="additive")
    head = Manifest(lake).committed_epoch()
    lsn0 = int(pc.max(changes["lsn"]).as_py()) + 1
    new = gen_changes(500, 25, seed=46)
    new = new.set_column(new.schema.get_field_index("lsn"), "lsn",
                         pc.add(pc.cast(new["lsn"], "int64"), lsn0))
    new = new.set_column(new.schema.get_field_index("turn_idx"), "turn_idx",
                         pc.cast(new["turn_idx"], pa.int64()))
    write_segments(new, chg, seg_rows=300, start_seg=50)
    # additive forbids the auto-WIDEN: abort before any write
    with pytest.raises(SchemaPolicyViolation):
        replay(ReplayConfig(changes_dir=chg, lake_dir=lake, num_partitions=8,
                            auto_ddl=True))
    assert Manifest(lake).committed_epoch() == head
    # relax to compatible: the widen folds
    alter_lake(lake, schema_policy="compatible")
    replay(ReplayConfig(changes_dir=chg, lake_dir=lake, num_partitions=8,
                        auto_ddl=True))
    assert lake_schema(lake).field("turn_idx").type == pa.int64()


def test_scan_schema_drift_unit(tmp_path):
    from datax_ray.schemas import LAKE_SCHEMA

    t = pa.table({
        "lsn": pa.array([0, 1], pa.int64()),
        "ts": pa.array([0, 1], pa.timestamp("us")),
        "op": pa.array(["insert", "insert"]),
        "conv_id": pa.array(["a", "b"]),
        "turn_idx": pa.array([0, 1], pa.int32()),
        "score": pa.array([1.5, 2.5], pa.float64()),
    })
    p = str(tmp_path / "seg-00000.parquet")
    pq.write_table(t, p)
    ddls = [json.loads(d) for d in scan_schema_drift([p], LAKE_SCHEMA)]
    assert {"action": "add_column", "name": "score", "type": "float64"} in ddls
    # an unmappable nested type refuses loudly
    t2 = t.append_column("tags", pa.array([[1], [2]], pa.list_(pa.int64())))
    p2 = str(tmp_path / "seg-00001.parquet")
    pq.write_table(t2, p2)
    with pytest.raises(ValueError, match="unmappable"):
        scan_schema_drift([p2], LAKE_SCHEMA)
    # non-parquet paths are skipped silently
    assert scan_schema_drift([str(tmp_path / "seg-9.jsonl")], LAKE_SCHEMA) == []
