"""Lake-pinned DDL-compatibility policy (alter --schema-policy):
'additive' admits only add_column, 'compatible' also admits widen;
rename/drop abort the replay loudly BEFORE any write, leaving the lake at
its previous committed epoch. Mirrors schema-registry compatibility modes
for the CDC ingest path (SURVEY.md §2B-B6 extension)."""

import json

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from datax_ray.fixtures.generator import gen_changes, write_segments
from datax_ray.oracle import sequential_replay
from datax_ray.pipelines.replay import ReplayConfig, alter_lake, replay
from datax_ray.schemas import CHANGES_SCHEMA
from datax_ray.sinks.lake import final_table
from datax_ray.state.manifest import Manifest
from datax_ray.state.schema_tracker import SchemaPolicyViolation


def _changes_with_ddl(tmp_path, actions, n=2000, seg_rows=800):
    """gen_changes with `actions` DDL events spliced contiguously at lsn
    position 1000 (same watermark-safe splice as the rename/drop e2e
    test)."""
    changes = gen_changes(n, 40, seed=7)
    k = len(actions)
    lsn = changes["lsn"].to_numpy(zero_copy_only=False)
    changes = changes.set_column(
        changes.schema.get_field_index("lsn"), "lsn",
        pa.array(np.where(lsn >= 1000, lsn + k, lsn), pa.int64()),
    )
    ts0 = pc.min(changes["ts"]).as_py()
    ddl = pa.table(
        {
            "lsn": pa.array([1000 + i for i in range(k)], pa.int64()),
            "ts": pa.array([ts0] * k, pa.timestamp("us")),
            "op": pa.array(["ddl"] * k),
            "conv_id": pa.array([None] * k, pa.string()),
            "turn_idx": pa.array([None] * k, pa.int32()),
            "role": pa.array([None] * k, pa.string()),
            "text": pa.array([None] * k, pa.string()),
            "tool": pa.array([None] * k, pa.string()),
            "ddl": pa.array([json.dumps(a) for a in actions], pa.string()),
        },
        schema=CHANGES_SCHEMA,
    )
    full = pa.concat_tables([changes.slice(0, 1000), ddl, changes.slice(1000)])
    chg = str(tmp_path / "changes")
    write_segments(full, chg, seg_rows=seg_rows)
    return full, chg


def _cfg(chg, lake):
    return ReplayConfig(
        changes_dir=chg, lake_dir=lake, num_partitions=4, segments_per_epoch=1
    )


def test_additive_policy_blocks_widen_before_any_write(tmp_path, ray_session):
    full, chg = _changes_with_ddl(
        tmp_path, [{"action": "widen", "name": "turn_idx", "type": "int64"}]
    )
    lake = str(tmp_path / "lake")
    alter_lake(lake, schema_policy="additive")  # pinned on the EMPTY lake
    with pytest.raises(SchemaPolicyViolation, match="forbids ddl action 'widen'"):
        replay(_cfg(chg, lake))
    # clean-segment epochs before the violation committed; the violating
    # epoch aborted BEFORE writing, and re-running stays blocked at the
    # same committed state (the policy is lake-pinned, not job config)
    after = Manifest(lake).committed_epoch()
    assert final_table(lake).schema.field("turn_idx").type == pa.int32()
    with pytest.raises(SchemaPolicyViolation):
        replay(_cfg(chg, lake))
    assert Manifest(lake).committed_epoch() == after


def test_compatible_policy_admits_widen_blocks_rename(tmp_path, ray_session):
    full, chg = _changes_with_ddl(
        tmp_path, [{"action": "widen", "name": "turn_idx", "type": "int64"}]
    )
    lake = str(tmp_path / "lake")
    alter_lake(lake, schema_policy="compatible")
    replay(_cfg(chg, lake))  # widen folds fine
    ours = final_table(lake)
    assert ours.schema.field("turn_idx").type == pa.int64()

    # a later rename DDL on the SAME policy-pinned lake must abort
    full2, chg2 = _changes_with_ddl(
        tmp_path / "r2",
        [{"action": "rename_column", "name": "role", "to": "speaker"}],
    )
    lake2 = str(tmp_path / "lake2")
    alter_lake(lake2, schema_policy="compatible")
    with pytest.raises(SchemaPolicyViolation, match="rename_column"):
        replay(_cfg(chg2, lake2))


def test_clearing_the_policy_unblocks_and_matches_oracle(tmp_path, ray_session):
    full, chg = _changes_with_ddl(
        tmp_path,
        [
            {"action": "rename_column", "name": "role", "to": "speaker"},
            {"action": "drop_column", "name": "tool"},
        ],
        n=1500,
    )
    lake = str(tmp_path / "lake")
    alter_lake(lake, schema_policy="additive")
    with pytest.raises(SchemaPolicyViolation):
        replay(_cfg(chg, lake))
    alter_lake(lake, clear_schema_policy=True)
    replay(_cfg(chg, lake))  # resumes and folds the formerly-blocked DDL
    ours = final_table(lake)
    assert "speaker" in ours.column_names and "tool" not in ours.column_names
    oracle = sequential_replay(full)
    assert ours.num_rows == oracle.num_rows


def test_policy_validates_eagerly_and_add_column_always_passes(
    tmp_path, ray_session
):
    with pytest.raises(ValueError, match="unknown schema policy"):
        alter_lake(str(tmp_path / "bad"), schema_policy="frozen")
    full, chg = _changes_with_ddl(
        tmp_path,
        [{"action": "add_column", "name": "score", "type": "float64"}],
        n=1200,
    )
    lake = str(tmp_path / "lake")
    alter_lake(lake, schema_policy="additive")
    replay(_cfg(chg, lake))
    assert "score" in final_table(lake).column_names
