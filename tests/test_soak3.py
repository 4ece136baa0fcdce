"""Soak 3 — the governance lifecycle composed on ONE lake: pin a DDL
schema policy, replay a widen-DDL stream under it (allowed verb folds,
forbidden verb aborts pre-write), spot-verify with the sampled auditor,
full-verify, run a scrubbed incremental export twice (idempotent), relax
the policy and fold the previously-forbidden rename, and confirm the
scrubbed sync refreshes only the changed ranges while staying redacted."""

import glob
import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads
import pyarrow.parquet as pq
import pytest

from datax_ray.fixtures.generator import gen_changes, write_segments
from datax_ray.oracle import sampled_verify, sequential_replay
from datax_ray.pipelines.replay import ReplayConfig, alter_lake, replay
from datax_ray.schemas import CHANGES_SCHEMA
from datax_ray.sinks.export import export_lake_incremental, read_export_state
from datax_ray.sinks.lake import final_table
from datax_ray.sources.changelog import list_segments
from datax_ray.state.schema_tracker import SchemaPolicyViolation

SPEC = [{"name": "dx_mask", "column": "text",
         "pattern": "[0-9]+", "replacement": "#"}]


def _ddl_row(lsn, ts, action):
    return pa.table(
        {
            "lsn": pa.array([lsn], pa.int64()),
            "ts": pa.array([ts], pa.timestamp("us")),
            "op": pa.array(["ddl"]),
            "conv_id": pa.array([None], pa.string()),
            "turn_idx": pa.array([None], pa.int32()),
            "role": pa.array([None], pa.string()),
            "text": pa.array([None], pa.string()),
            "tool": pa.array([None], pa.string()),
            "ddl": pa.array([json.dumps(action)], pa.string()),
        },
        schema=CHANGES_SCHEMA,
    )


def _scrubbed_texts(out_dir):
    state = read_export_state(out_dir)
    texts = []
    for rid, rec in state["ranges"].items():
        for name in rec["files"]:
            t = pq.read_table(os.path.join(out_dir, f"r={int(rid):05d}", name))
            texts += [x for x in t["text"].to_pylist() if x]
    return texts


def test_governance_lifecycle_soak(tmp_path, ray_session):
    # --- stream: 3000 events with a widen DDL spliced at lsn 1500 and a
    # rename DDL at the very end (lsn = n+1, watermark-safe by position)
    n = 3000
    changes = gen_changes(n, 80, seed=99, dup_frac=0.02, out_of_order_frac=0.1)
    lsn = changes["lsn"].to_numpy(zero_copy_only=False)
    changes = changes.set_column(
        changes.schema.get_field_index("lsn"), "lsn",
        pa.array(np.where(lsn >= 1500, lsn + 1, lsn), pa.int64()),
    )
    ts0 = pc.min(changes["ts"]).as_py()
    widen = _ddl_row(1500, ts0, {"action": "widen", "name": "turn_idx",
                                 "type": "int64"})
    rename = _ddl_row(n + 1, ts0, {"action": "rename_column", "name": "tool",
                                   "to": "tool_name"})
    part1 = pa.concat_tables([changes.slice(0, 1500), widen,
                              changes.slice(1500)])
    chg = str(tmp_path / "chg")
    write_segments(part1, chg, seg_rows=1200)
    lake = str(tmp_path / "lake")

    # --- policy pinned before first ingest: widen is allowed under
    # 'compatible', so the whole stream folds
    alter_lake(lake, schema_policy="compatible")
    cfg = ReplayConfig(changes_dir=chg, lake_dir=lake, num_partitions=8,
                       segments_per_epoch=1)
    replay(cfg)
    assert final_table(lake).schema.field("turn_idx").type == pa.int64()

    # --- audits: sampled spot-verify AND the full sequential oracle
    stream = pads.dataset(list_segments(chg)).to_table()
    assert sampled_verify(stream, lake, 12)["match"]
    full = final_table(lake)
    oracle = sequential_replay(stream)
    assert full.schema.equals(oracle.schema) and full.equals(oracle)

    # --- scrubbed incremental export: redacted, idempotent
    out = str(tmp_path / "sync")
    r1 = export_lake_incremental(lake, out, transformers=SPEC)
    assert r1["ranges_exported"] > 0
    assert all(not any(c.isdigit() for c in t) for t in _scrubbed_texts(out))
    assert export_lake_incremental(lake, out, transformers=SPEC)[
        "ranges_exported"] == 0

    # --- a rename arrives: blocked under the pinned policy, pre-write
    nxt = os.path.join(chg, "seg-zz-rename.parquet")
    pq.write_table(rename, nxt)
    with pytest.raises(SchemaPolicyViolation, match="rename_column"):
        replay(cfg)

    # --- operator relaxes the policy; the held DDL folds; audits re-pass
    alter_lake(lake, clear_schema_policy=True)
    replay(cfg)
    evolved = final_table(lake)
    assert "tool_name" in evolved.column_names
    assert "tool" not in evolved.column_names
    stream2 = pads.dataset(list_segments(chg)).to_table()
    assert sampled_verify(stream2, lake, 12)["match"]

    # --- the scrubbed sync refreshes ONLY what the rename epoch touched
    # and stays redacted (rename rewrites schema, not every range's files;
    # whatever re-exported must still carry the mask)
    r3 = export_lake_incremental(lake, out, transformers=SPEC)
    assert r3["epoch"] > r1["epoch"]
    texts = _scrubbed_texts(out)
    assert texts and all(not any(c.isdigit() for c in t) for t in texts)
    state = read_export_state(out)
    assert state["epoch"] == r3["epoch"]
