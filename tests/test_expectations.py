"""Ingest expectations (validation.compile_expectations + ReplayConfig
.expectations): Delta-style CHECK constraints with DataX dirty-record
semantics — violating change rows dead-letter (reason
'expectation:<col>:<op>'), count against errorLimit, and the final lake
equals the sequential oracle run under the SAME expectations (shared
evaluator = single source of truth)."""

import glob
import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from datax_ray.fixtures.generator import gen_changes, write_segments
from datax_ray.oracle import sequential_replay
from datax_ray.pipelines.replay import DirtyLimitExceeded, ReplayConfig, replay
from datax_ray.sinks.lake import final_table

EXPECTATIONS = [
    {"column": "role", "op": "in", "values": ["user", "assistant", "tool"]},
    {"column": "turn_idx", "op": "between", "lo": 0, "hi": 18},
    {"column": "text", "op": "matches", "pattern": "^payload-"},
]


def _changes(tmp_path, n=2500):
    table = gen_changes(
        n, 50, seed=21, dup_frac=0.02, out_of_order_frac=0.1, corrupt_frac=0.03
    )
    # texts look like 'payload-...'? generator uses its own scheme — derive
    # the real prefix so the 'matches' rule bites on a KNOWN subset instead
    # of everything/nothing: rewrite a slice of texts to violate it.
    texts = table["text"].to_pylist()
    for i in range(0, n, 97):
        if texts[i] is not None:
            texts[i] = "corrupted " + texts[i]
    table = table.set_column(
        table.schema.get_field_index("text"), "text", pa.array(texts, pa.string())
    )
    changes = str(tmp_path / "changes")
    write_segments(table, changes, seg_rows=700)
    return table, changes


def test_lake_matches_oracle_under_expectations(tmp_path, ray_session):
    table, changes = _changes(tmp_path)
    expectations = [
        {"column": "turn_idx", "op": "between", "lo": 0, "hi": 15},
        {"column": "text", "op": "not_matches", "pattern": "^corrupted"},
    ]
    lake = str(tmp_path / "lake")
    replay(
        ReplayConfig(
            changes_dir=changes,
            lake_dir=lake,
            num_partitions=8,
            segments_per_epoch=2,
            expectations=expectations,
        )
    )
    got = final_table(lake).to_pandas().to_dict("records")
    want = (
        sequential_replay(table, expectations=expectations)
        .to_pandas()
        .to_dict("records")
    )
    assert got == want
    # and it differs from the unconstrained replay (the rules really bit)
    unconstrained = sequential_replay(table).to_pandas().to_dict("records")
    assert got != unconstrained


def test_violations_deadletter_with_reasons(tmp_path, ray_session):
    table, changes = _changes(tmp_path)
    lake = str(tmp_path / "lake")
    expectations = [{"column": "text", "op": "not_matches", "pattern": "^corrupted"}]
    replay(
        ReplayConfig(
            changes_dir=changes,
            lake_dir=lake,
            num_partitions=8,
            expectations=expectations,
        )
    )
    dl = sorted(glob.glob(os.path.join(lake, "_deadletter", "*", "*.parquet")))
    assert dl
    reasons = pa.concat_tables(
        [pq.read_table(p, columns=["reason"]) for p in dl]
    )["reason"].to_pylist()
    assert any(r == "expectation:text:not_matches" for r in reasons)
    # malformed rows keep their validity reason (it wins over expectations)
    assert any(r and not r.startswith("expectation:") for r in reasons)


def test_expectations_count_against_error_limit(tmp_path, ray_session):
    _, changes = _changes(tmp_path)
    lake = str(tmp_path / "lake")
    with pytest.raises(DirtyLimitExceeded):
        replay(
            ReplayConfig(
                changes_dir=changes,
                lake_dir=lake,
                num_partitions=8,
                error_limit_rows=0,
                expectations=[
                    {"column": "text", "op": "not_matches", "pattern": "^corrupted"}
                ],
            )
        )


def test_lake_level_constraints_persist(tmp_path, ray_session):
    """alter_lake persists expectations in the manifest: replays with NO
    job config enforce them — from the very first epoch on an empty lake,
    and across later incremental epochs (carried forward by every commit).
    Clearing them stops enforcement for subsequent epochs only."""
    from datax_ray.pipelines.replay import alter_lake
    from datax_ray.state.manifest import Manifest

    table, changes = _changes(tmp_path)
    expectations = [
        {"column": "turn_idx", "op": "between", "lo": 0, "hi": 15},
        {"column": "text", "op": "not_matches", "pattern": "^corrupted"},
    ]
    lake = str(tmp_path / "lake")
    out = alter_lake(lake, expectations=expectations)  # empty lake: epoch 0
    assert out["epoch"] == 0
    replay(
        ReplayConfig(
            changes_dir=changes, lake_dir=lake, num_partitions=8,
            segments_per_epoch=2,
        )
    )
    got = final_table(lake).to_pandas().to_dict("records")
    want = (
        sequential_replay(table, expectations=expectations)
        .to_pandas().to_dict("records")
    )
    assert got == want
    # properties survived the replay epochs' commits
    assert Manifest(lake).committed_properties()["expectations"] == expectations

    # clear → later segments ingest unconstrained; equal to oracle with
    # constraints applied only to the first stream
    lake2 = str(tmp_path / "lake2")
    alter_lake(lake2, expectations=expectations)
    replay(ReplayConfig(changes_dir=changes, lake_dir=lake2, num_partitions=8))
    alter_lake(lake2, clear_expectations=True)
    assert "expectations" not in Manifest(lake2).committed_properties()
    table2 = gen_changes(800, 50, seed=77)
    table2 = table2.set_column(  # lift lsns above the committed watermark
        table2.schema.get_field_index("lsn"), "lsn",
        pc.cast(pc.add(table2["lsn"], 1_000_000), pa.int64()),
    )
    table2 = table2.set_column(  # and ts past stream 1, so the oracle's
        # lsn=-1 base convention can't invert any (ts, lsn) race
        table2.schema.get_field_index("ts"), "ts",
        pc.add(table2["ts"], pa.scalar(86_400_000_000, pa.duration("us"))),
    )
    write_segments(table2, changes, seg_rows=700, start_seg=10)
    replay(ReplayConfig(changes_dir=changes, lake_dir=lake2, num_partitions=8))
    got2 = final_table(lake2).to_pandas().to_dict("records")
    base = sequential_replay(table, expectations=expectations)
    want2 = (
        sequential_replay(table2, base=base).to_pandas().to_dict("records")
    )
    assert got2 == want2


def test_job_and_lake_rules_compose(tmp_path, ray_session):
    """A row must satisfy BOTH the lake-level and the job-level rule set."""
    from datax_ray.pipelines.replay import alter_lake

    table, changes = _changes(tmp_path)
    lake = str(tmp_path / "lake")
    lake_rules = [{"column": "text", "op": "not_matches", "pattern": "^corrupted"}]
    job_rules = [{"column": "turn_idx", "op": "between", "lo": 0, "hi": 15}]
    alter_lake(lake, expectations=lake_rules)
    replay(
        ReplayConfig(
            changes_dir=changes, lake_dir=lake, num_partitions=8,
            expectations=job_rules,
        )
    )
    got = final_table(lake).to_pandas().to_dict("records")
    want = (
        sequential_replay(table, expectations=job_rules + lake_rules)
        .to_pandas().to_dict("records")
    )
    assert got == want


def test_deletes_are_exempt(tmp_path, ray_session):
    """A delete has null payload; payload expectations must not dirty it
    (else deletes would never apply and rows would resurrect)."""
    table, changes = _changes(tmp_path)
    lake = str(tmp_path / "lake")
    expectations = [{"column": "role", "op": "not_null"}]
    replay(
        ReplayConfig(
            changes_dir=changes,
            lake_dir=lake,
            num_partitions=8,
            expectations=expectations,
        )
    )
    got = final_table(lake).to_pandas().to_dict("records")
    want = (
        sequential_replay(table, expectations=expectations)
        .to_pandas()
        .to_dict("records")
    )
    assert got == want
    n_deletes = pc.sum(
        pc.cast(pc.equal(table["op"], "delete"), pa.int64())
    ).as_py()
    assert n_deletes > 0  # fixture really exercises the exemption
