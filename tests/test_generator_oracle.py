"""M0: fixture generator determinism + sequential-oracle sanity."""

import pyarrow.compute as pc
import pytest

from datax_ray.fixtures.generator import gen_changes, gen_transcripts, write_segments
from datax_ray.oracle import sequential_replay
from datax_ray.schemas import CHANGES_SCHEMA, TRANSCRIPTS_SCHEMA


def test_generator_deterministic():
    a = gen_changes(500, 20, seed=7, with_ddl=True, corrupt_frac=0.05)
    b = gen_changes(500, 20, seed=7, with_ddl=True, corrupt_frac=0.05)
    assert a.equals(b)
    c = gen_changes(500, 20, seed=8, with_ddl=True, corrupt_frac=0.05)
    assert not a.equals(c)


def test_changes_schema_matches_spec():
    t = gen_changes(200, 10)
    assert t.schema.equals(CHANGES_SCHEMA)
    t2 = gen_changes(200, 10, with_ddl=True)
    assert t2.column_names == CHANGES_SCHEMA.names + ["lang"]


def test_transcripts_schema():
    t = gen_transcripts(10)
    assert t.schema.equals(TRANSCRIPTS_SCHEMA)
    assert t.num_rows > 10


def test_oracle_basic_upsert_delete():
    t = gen_changes(2000, 50, seed=42)
    final = sequential_replay(t)
    assert final.num_rows > 0
    # keys unique and sorted
    keys = list(zip(final["conv_id"].to_pylist(), final["turn_idx"].to_pylist()))
    assert keys == sorted(keys)
    assert len(set(keys)) == len(keys)
    # no key that was last-deleted survives: spot-check via a manual pass
    ops = t.filter(pc.equal(t["op"], "delete"))
    assert ops.num_rows > 0


def test_oracle_lww_out_of_order():
    import pyarrow as pa

    # late (older ts) update must lose; delete tombstone beats older update
    rows = {
        "lsn": [1, 2, 3, 10, 11],
        "ts": [1000, 5000, 3000, 7000, 6500],
        "op": ["insert", "update", "update", "delete", "update"],
        "conv_id": ["c"] * 5,
        "turn_idx": [0] * 5,
        "role": ["user"] * 5,
        "text": ["a", "b", "late", None, "post-delete-stale"],
        "tool": [""] * 5,
        "ddl": [None] * 5,
    }
    t = pa.table(
        {
            k: pa.array(v, CHANGES_SCHEMA.field(k).type)
            for k, v in rows.items()
        }
    )
    final = sequential_replay(t)
    # winner at ts=7000 is the delete -> row gone
    assert final.num_rows == 0


def test_oracle_ddl_add_and_widen():
    t = gen_changes(3000, 40, seed=3, with_ddl=True)
    final = sequential_replay(t)
    assert "lang" in final.column_names
    assert final.schema.field("turn_idx").type == "int64"
    # lang only populated for post-ddl winners; some nulls and some values
    lang = final["lang"]
    assert lang.null_count < final.num_rows


def test_write_segments(tmp_path):
    t = gen_changes(2500, 30, seed=1)
    paths = write_segments(t, str(tmp_path / "chg"), seg_rows=1000)
    assert len(paths) == 3
    import pyarrow.parquet as pq

    total = sum(pq.ParquetFile(p).metadata.num_rows for p in paths)
    assert total == 2500
