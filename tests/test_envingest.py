"""Envelope ingest (sources/envelope.py): feedout → envingest → replay
round-trips the lake state row-for-row; incremental ingest converts only
new envelope files; foreign envelopes without image ts fall back to
ts_ms; idempotent re-run."""

import json
import os

import pyarrow as pa
import pyarrow.compute as pc
import pytest

from datax_ray.fixtures.generator import gen_changes, write_segments
from datax_ray.pipelines.replay import ReplayConfig, replay
from datax_ray.sinks.feedout import export_change_feed_envelopes
from datax_ray.sinks.lake import final_table
from datax_ray.sources.envelope import envelopes_to_segments


def _core(t: pa.Table):
    cols = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    return (
        t.select(cols)
        .set_column(1, "turn_idx", pc.cast(t["turn_idx"], pa.int64()))
        .sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
        .to_pandas()
        .reset_index(drop=True)
    )


def test_roundtrip_and_incremental(tmp_path, ray_session):
    changes = gen_changes(4000, 50, seed=71, p_delete=0.15,
                          out_of_order_frac=0.1)
    chg = str(tmp_path / "chg")
    src = str(tmp_path / "src_lake")
    write_segments(changes, chg, seg_rows=1000)
    replay(ReplayConfig(changes_dir=chg, lake_dir=src, num_partitions=8,
                        segments_per_epoch=2))
    env = str(tmp_path / "env")
    export_change_feed_envelopes(src, env, fmt="jsonl")

    # ingest into a brand-new lake
    chg2 = str(tmp_path / "chg2")
    dst = str(tmp_path / "dst_lake")
    r1 = envelopes_to_segments(env, chg2)
    assert r1["rows"] > 0
    replay(ReplayConfig(changes_dir=chg2, lake_dir=dst, num_partitions=4,
                        segments_per_epoch=4))
    assert _core(final_table(dst)).equals(_core(final_table(src)))

    # idempotent: nothing new to convert
    assert envelopes_to_segments(env, chg2)["converted_files"] == 0

    # more source epochs -> new envelope window -> incremental ingest
    more = gen_changes(1200, 50, seed=72, p_delete=0.25,
                       out_of_order_frac=0.1)
    more = more.set_column(0, "lsn", pc.add(more["lsn"],
                                            pa.scalar(4000, pa.int64())))
    write_segments(more, chg, seg_rows=1000, start_seg=4)
    replay(ReplayConfig(changes_dir=chg, lake_dir=src, num_partitions=8,
                        segments_per_epoch=2))
    export_change_feed_envelopes(src, env, fmt="jsonl")
    r2 = envelopes_to_segments(env, chg2)
    assert 0 < r2["converted_files"]
    replay(ReplayConfig(changes_dir=chg2, lake_dir=dst, num_partitions=4,
                        segments_per_epoch=4))
    assert _core(final_table(dst)).equals(_core(final_table(src)))


def test_ddl_flows_through_roundtrip(tmp_path, ray_session):
    """A producer-side add_column DDL survives the envelope loop: the
    converter auto-registers the extra image field with its own DDL event
    and the target lake's final state matches the source's INCLUDING the
    added column."""
    changes = gen_changes(3000, 40, seed=73, p_delete=0.1, with_ddl=True)
    chg = str(tmp_path / "chg")
    src = str(tmp_path / "src_lake")
    write_segments(changes, chg, seg_rows=1000)
    replay(ReplayConfig(changes_dir=chg, lake_dir=src, num_partitions=8,
                        segments_per_epoch=1))
    env = str(tmp_path / "env")
    export_change_feed_envelopes(src, env, fmt="jsonl")

    chg2 = str(tmp_path / "chg2")
    dst = str(tmp_path / "dst_lake")
    r = envelopes_to_segments(env, chg2)
    assert "lang" in r["added_columns"]
    replay(ReplayConfig(changes_dir=chg2, lake_dir=dst, num_partitions=4,
                        segments_per_epoch=10**9))

    a = final_table(src)
    b = final_table(dst)
    assert "lang" in b.column_names

    def full(t):
        cols = ["conv_id", "turn_idx", "role", "text", "tool", "ts", "lang"]
        return (
            t.select(cols)
            .set_column(1, "turn_idx", pc.cast(t["turn_idx"], pa.int64()))
            .sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
            .to_pandas()
            .reset_index(drop=True)
        )

    assert full(b).equals(full(a))


def test_foreign_envelopes_ts_ms_fallback(tmp_path, ray_session):
    """A minimal foreign producer: images without ts, envelope ts_ms only."""
    env = str(tmp_path / "env")
    os.makedirs(env)
    recs = [
        {"op": "c", "conv_id": "c-1", "turn_idx": 0, "ts_ms": 1_700_000_000_000,
         "lsn": 5, "epoch": 0,
         "before": None, "after": {"role": "user", "text": "hi", "tool": ""}},
        {"op": "u", "conv_id": "c-1", "turn_idx": 0, "ts_ms": 1_700_000_001_000,
         "lsn": 9, "epoch": 1,
         "before": {"role": "user", "text": "hi", "tool": ""},
         "after": {"role": "user", "text": "hello", "tool": ""}},
        {"op": "c", "conv_id": "c-2", "turn_idx": 0, "ts_ms": 1_700_000_000_500,
         "lsn": 7, "epoch": 0,
         "before": None, "after": {"role": "assistant", "text": "yo", "tool": ""}},
        {"op": "d", "conv_id": "c-2", "turn_idx": 0, "ts_ms": 1_700_000_002_000,
         "lsn": 11, "epoch": 1,
         "before": {"role": "assistant", "text": "yo", "tool": ""},
         "after": None},
    ]
    with open(os.path.join(env, "env-b0000-e000000-000001.jsonl"), "w") as f:
        for r in recs:
            f.write(json.dumps(r) + "\n")

    # Debezium snapshot records (op "r") fold as inserts
    recs.insert(0, {
        "op": "r", "conv_id": "c-0", "turn_idx": 0,
        "ts_ms": 1_699_999_999_000, "lsn": 1, "epoch": 0,
        "before": None, "after": {"role": "user", "text": "snap", "tool": ""},
    })
    with open(os.path.join(env, "env-b0000-e000000-000001.jsonl"), "w") as f:
        for r in recs:
            f.write(json.dumps(r) + "\n")

    # a FOREIGN dir (no _feedout_state.json) is still readable as a stream
    from datax_ray.sinks.feedout import read_envelopes

    assert read_envelopes(env).count() == 5

    chg = str(tmp_path / "chg")
    lk = str(tmp_path / "lake")
    assert envelopes_to_segments(env, chg)["rows"] == 5
    replay(ReplayConfig(changes_dir=chg, lake_dir=lk, num_partitions=2,
                        segments_per_epoch=1))
    live = final_table(lk)
    assert live.num_rows == 2
    got = dict(zip(live["conv_id"].to_pylist(), live["text"].to_pylist()))
    assert got == {"c-0": "snap", "c-1": "hello"}

    # unknown ops fail loudly, not silently
    env2 = str(tmp_path / "env2")
    os.makedirs(env2)
    with open(os.path.join(env2, "env-b0000-e000000-000000.jsonl"), "w") as f:
        f.write(json.dumps({"op": "x", "conv_id": "c", "turn_idx": 0,
                            "ts_ms": 1, "lsn": 0, "epoch": 0,
                            "before": None, "after": None}) + "\n")
    with pytest.raises(ValueError, match="unsupported op"):
        envelopes_to_segments(env2, str(tmp_path / "chg2"))
