"""Incremental export sync (sinks/export.py:export_lake_incremental) —
the file-sink analog of the SQL mirror: per-range part dirs + fingerprint
state, exactly-once under re-runs and crash-retry, O(changed ranges) work
on refresh."""

import glob
import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from datax_ray.fixtures.generator import gen_changes, write_segments
from datax_ray.pipelines.replay import ReplayConfig, replay
from datax_ray.sinks.export import export_lake_incremental, read_export_state
from datax_ray.sinks.lake import final_table
from tests.test_replay_e2e import assert_tables_equal


def _read_export(out_dir: str) -> pa.Table:
    state = read_export_state(out_dir)
    tables = []
    for rid, rec in state["ranges"].items():
        for name in rec["files"]:
            tables.append(pq.read_table(os.path.join(out_dir, f"r={int(rid):05d}", name)))
    if not tables:
        return pa.table({})
    t = pa.concat_tables(tables)
    return t.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])


def _setup(tmp_path, n=3000):
    changes = gen_changes(n, 50, seed=31, dup_frac=0.02, out_of_order_frac=0.1)
    chg = str(tmp_path / "chg")
    lake = str(tmp_path / "lake")
    write_segments(changes, chg, seg_rows=1000)
    return changes, chg, lake


def test_incremental_export_matches_lake_and_skips(tmp_path, ray_session):
    changes, chg, lake = _setup(tmp_path)
    out = str(tmp_path / "exp")
    # first sync: replay two of three segments, export everything once
    replay(ReplayConfig(changes_dir=chg, lake_dir=lake, num_partitions=8,
                        segments_per_epoch=2))
    r1 = export_lake_incremental(lake, out)
    assert r1["ranges_exported"] > 0 and r1["ranges_skipped"] == 0
    assert_tables_equal(_read_export(out), final_table(lake))

    # no change -> zero ranges re-exported, zero reads
    r2 = export_lake_incremental(lake, out)
    assert r2["ranges_exported"] == 0
    assert r2["ranges_skipped"] == r1["ranges_exported"]

    # one incremental epoch -> only the CHANGED ranges re-export, and the
    # synced view equals the new lake state
    more = gen_changes(400, 8, seed=77)
    more = more.set_column(
        more.schema.get_field_index("lsn"), "lsn",
        pc.cast(pc.add(more["lsn"], 1_000_000), pa.int64()),
    )
    more = more.set_column(
        more.schema.get_field_index("ts"), "ts",
        pc.add(more["ts"], pa.scalar(86_400_000_000, pa.duration("us"))),
    )
    write_segments(more, chg, seg_rows=400, start_seg=10)
    replay(ReplayConfig(changes_dir=chg, lake_dir=lake, num_partitions=8))
    r3 = export_lake_incremental(lake, out)
    assert r3["ranges_exported"] > 0
    assert r3["ranges_skipped"] > 0  # only touched ranges paid
    assert_tables_equal(_read_export(out), final_table(lake))


def test_incremental_export_crash_retry_is_idempotent(tmp_path, ray_session):
    """Parts written but state NOT published (crash window): the re-run
    rewrites identical content-hash bytes and publishes — same final
    file set, no dupes, no stale parts."""
    _, chg, lake = _setup(tmp_path)
    out = str(tmp_path / "exp")
    replay(ReplayConfig(changes_dir=chg, lake_dir=lake, num_partitions=8))
    export_lake_incremental(lake, out)
    files_before = sorted(glob.glob(os.path.join(out, "r=*", "*")))
    # simulate the crash-before-publish window: state file vanishes
    os.remove(os.path.join(out, "_export_state.json"))
    r = export_lake_incremental(lake, out)
    assert r["ranges_exported"] > 0  # everything redone (no state)
    assert sorted(glob.glob(os.path.join(out, "r=*", "*"))) == files_before
    assert_tables_equal(_read_export(out), final_table(lake))


def test_incremental_export_fmt_change_resyncs(tmp_path, ray_session):
    _, chg, lake = _setup(tmp_path, n=1200)
    out = str(tmp_path / "exp")
    replay(ReplayConfig(changes_dir=chg, lake_dir=lake, num_partitions=4))
    export_lake_incremental(lake, out, fmt="parquet")
    r = export_lake_incremental(lake, out, fmt="jsonl")  # fmt mismatch
    assert r["ranges_exported"] > 0
    state = read_export_state(out)
    assert state["fmt"] == "jsonl"
    for rec in state["ranges"].values():
        assert all(n.endswith(".jsonl") for n in rec["files"])
    # stale parquet parts were cleaned after publish
    assert not glob.glob(os.path.join(out, "r=*", "*.parquet"))


def test_export_with_transformer_chain_scrubs_egress(tmp_path, ray_session):
    """dx_* chain on export = the PII-scrubbed egress view: the exported
    files carry the transformed texts, the lake itself is untouched, and
    with --incremental the chain spec folds into the fingerprints so (a)
    an unchanged lake+chain re-sync is a no-op and (b) CHANGING the chain
    rewrites every range (two redaction policies can never mix)."""
    from datax_ray.sinks.export import export_lake

    changes, chg, lake = _setup(tmp_path, n=1500)
    replay(ReplayConfig(changes_dir=chg, lake_dir=lake, num_partitions=4,
                        segments_per_epoch=2))
    spec = [{"name": "dx_mask", "column": "text",
             "pattern": "[0-9]+", "replacement": "#"}]

    # full export: transformed view on disk, lake untouched
    out_full = str(tmp_path / "exp_full")
    export_lake(lake, out_full, transformers=spec)
    got = pa.concat_tables(
        [pq.read_table(p) for p in glob.glob(os.path.join(out_full, "*.parquet"))]
    )
    texts = [t for t in got["text"].to_pylist() if t]
    assert texts and all(not any(ch.isdigit() for ch in t) for t in texts)
    lake_texts = [t for t in final_table(lake)["text"].to_pylist() if t]
    assert any(any(ch.isdigit() for ch in t) for t in lake_texts)

    # incremental: scrubbed, idempotent, chain-change rewrites everything
    out_inc = str(tmp_path / "exp_inc")
    r1 = export_lake_incremental(lake, out_inc, transformers=spec)
    assert r1["ranges_exported"] > 0
    inc = _read_export(out_inc)
    inc_texts = [t for t in inc["text"].to_pylist() if t]
    assert all(not any(ch.isdigit() for ch in t) for t in inc_texts)
    r2 = export_lake_incremental(lake, out_inc, transformers=spec)
    assert r2["ranges_exported"] == 0
    spec2 = [{"name": "dx_mask", "column": "text",
              "pattern": "[0-9]+", "replacement": "*"}]
    r3 = export_lake_incremental(lake, out_inc, transformers=spec2)
    assert r3["ranges_exported"] == r1["ranges_exported"]


def test_ddl_epoch_reexports_every_range_no_mixed_schema(tmp_path, ray_session):
    """A DDL epoch (rename) must re-export even ranges whose FILES didn't
    change: the committed schema folds into every range fingerprint, so
    the mirror can never mix pre- and post-DDL columns."""
    import json as _json

    import numpy as np

    from datax_ray.schemas import CHANGES_SCHEMA

    changes, chg, lake = _setup(tmp_path, n=2000)
    replay(ReplayConfig(changes_dir=chg, lake_dir=lake, num_partitions=8,
                        segments_per_epoch=3))
    out = str(tmp_path / "sync")
    r1 = export_lake_incremental(lake, out)
    assert r1["ranges_exported"] > 0

    # a rename-only epoch: one DDL event, no data rows
    hi = int(pc.max(changes["lsn"]).as_py()) + 1
    ts0 = pc.min(changes["ts"]).as_py()
    ddl = pa.table(
        {
            "lsn": pa.array([hi], pa.int64()),
            "ts": pa.array([ts0], pa.timestamp("us")),
            "op": pa.array(["ddl"]),
            "conv_id": pa.array([None], pa.string()),
            "turn_idx": pa.array([None], pa.int32()),
            "role": pa.array([None], pa.string()),
            "text": pa.array([None], pa.string()),
            "tool": pa.array([None], pa.string()),
            "ddl": pa.array(
                [_json.dumps({"action": "rename_column", "name": "tool",
                              "to": "tool_name"})], pa.string()),
        },
        schema=CHANGES_SCHEMA,
    )
    pq.write_table(ddl, os.path.join(chg, "seg-zz-ddl.parquet"))
    replay(ReplayConfig(changes_dir=chg, lake_dir=lake, num_partitions=8,
                        segments_per_epoch=3))

    r2 = export_lake_incremental(lake, out)
    assert r2["ranges_exported"] == r1["ranges_exported"], (
        "schema change must invalidate every range fingerprint")
    # every exported file carries the NEW schema — no mixed mirror
    from datax_ray.sinks.export import read_export_state

    state = read_export_state(out)
    for rid, rec in state["ranges"].items():
        for name in rec["files"]:
            s = pq.read_schema(os.path.join(out, f"r={int(rid):05d}", name))
            assert "tool_name" in s.names and "tool" not in s.names


def test_partition_spec_truncate_load(tmp_path, ray_session):
    """odpswriter partition-spec semantics: export_partition loads one
    Hive partition, truncate clears ONLY that partition, append adds
    files; other partitions' bytes are never touched."""
    import glob

    import pyarrow.dataset as pads

    from datax_ray.fixtures.generator import gen_changes, write_segments
    from datax_ray.pipelines.replay import ReplayConfig, replay
    from datax_ray.sinks.export import export_lake, export_partition
    from datax_ray.sinks.lake import final_table

    changes = gen_changes(3000, 40, seed=97)
    chg = str(tmp_path / "chg")
    lk = str(tmp_path / "lake")
    write_segments(changes, chg, seg_rows=1000)
    replay(ReplayConfig(changes_dir=chg, lake_dir=lk, num_partitions=8))

    out = str(tmp_path / "wh")
    export_lake(lk, out, partition_by=["role"])
    other_files = set(glob.glob(os.path.join(out, "role=assistant", "*")))
    assert other_files

    # truncate-load the user partition twice: second run replaces the
    # first's files, assistant partition untouched byte-for-byte
    n1 = export_partition(lk, out, {"role": "user"}, truncate=True)
    files_a = set(glob.glob(os.path.join(out, "role=user", "*")))
    n2 = export_partition(lk, out, {"role": "user"}, truncate=True)
    files_b = set(glob.glob(os.path.join(out, "role=user", "*")))
    assert n1 == n2 and files_a == files_b  # content-hash deterministic
    assert set(glob.glob(os.path.join(out, "role=assistant", "*"))) == other_files

    # the loaded partition equals the lake's matching live rows
    live = final_table(lk)
    want = live.filter(pc.equal(live["role"], "user"))
    got = pads.dataset(out, partitioning="hive", format="parquet").to_table()
    got_u = got.filter(pc.equal(got["role"], "user"))
    assert got_u.num_rows == want.num_rows == n1

    # append mode adds files instead of replacing
    export_partition(lk, out, {"role": "user"}, truncate=False)
    assert set(glob.glob(os.path.join(out, "role=user", "*"))) == files_b
    # (identical bytes -> identical content-hash names; now change the
    # view via a transformer so append genuinely adds)
    export_partition(lk, out, {"role": "user"}, truncate=False,
                     transformers=[{"name": "dx_replace", "column": "text",
                                    "pattern": "a", "replacement": "b"}])
    assert len(glob.glob(os.path.join(out, "role=user", "*"))) > len(files_b)


def test_dynamic_partition_overwrite(tmp_path, ray_session):
    """overwrite='dynamic': only partitions receiving rows are truncated;
    a partition absent from the new export keeps its old files."""
    import glob

    from datax_ray.fixtures.generator import gen_changes, write_segments
    from datax_ray.pipelines.replay import ReplayConfig, replay
    from datax_ray.sinks.export import export_lake

    changes = gen_changes(3000, 40, seed=99)
    chg = str(tmp_path / "chg")
    lk = str(tmp_path / "lake")
    write_segments(changes, chg, seg_rows=1000)
    replay(ReplayConfig(changes_dir=chg, lake_dir=lk, num_partitions=8))

    out = str(tmp_path / "wh")
    export_lake(lk, out, partition_by=["role"])
    old_assistant = set(glob.glob(os.path.join(out, "role=assistant", "*")))

    # dynamic reload that REWRITES every role to 'user': only role=user
    # (the receiving partition) truncates; role=assistant keeps its files
    export_lake(lk, out, partition_by=["role"], overwrite="dynamic",
                transformers=[{"name": "dx_replace", "column": "role",
                               "pattern": "assistant",
                               "replacement": "user"}])
    assert set(glob.glob(os.path.join(out, "role=assistant", "*"))) == old_assistant
    assert glob.glob(os.path.join(out, "role=user", "*"))
