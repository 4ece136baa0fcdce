"""Payload-value index (pipelines/colindex.py): predicate pruning for
`read_lake(where=...)` with manifest-fingerprint incrementality and
never-mis-prune staleness semantics."""

import os

import pyarrow.compute as pc
import pyarrow.parquet as pq

from datax_ray.fixtures.generator import gen_changes
from datax_ray.pipelines.colindex import refresh_value_index, value_index_rids
from datax_ray.pipelines.replay import ReplayConfig, replay
from datax_ray.sinks.lake import LakeDatasource, final_table, read_lake

import pytest


def _lake(tmp_path, n_events=3000, convs=60, seed=21):
    changes = str(tmp_path / "changes")
    os.makedirs(changes, exist_ok=True)
    t = gen_changes(n_events, convs, seed=seed, out_of_order_frac=0.0)
    pq.write_table(t, os.path.join(changes, "seg-00000.parquet"))
    lake = str(tmp_path / "lake")
    replay(
        ReplayConfig(
            changes_dir=changes, lake_dir=lake,
            num_partitions=16, frag_ranges=8,
        )
    )
    return changes, lake


def _rare_value(lake):
    """(column, value) pair that appears in FEW ranges: a conv-correlated
    payload value. The generator's `tool` column is sparse; fall back to
    a role value if needed."""
    full = final_table(lake)
    for col in ("tool", "role"):
        vals = [v for v in pc.unique(full[col]).to_pylist() if v is not None]
        if vals:
            # pick the least frequent value
            counts = [(full.filter(pc.equal(full[col], v)).num_rows, v) for v in vals]
            return col, sorted(counts)[0][1], full
    raise AssertionError("no payload values")


def test_where_read_prunes_with_index_and_matches_unpruned(tmp_path, ray_session):
    _, lake = _lake(tmp_path)
    col, val, full = _rare_value(lake)
    idx = str(tmp_path / "vidx")
    out = refresh_value_index(lake, idx, col)
    assert out["column"] == col and out["refreshed"] > 0

    plain = LakeDatasource(lake, where={col: val})
    pruned = LakeDatasource(lake, where={col: val}, where_index_dir=idx)
    assert len(pruned._parts) <= len(plain._parts)

    got = (
        read_lake(lake, where={col: val}, where_index_dir=idx)
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    want = (
        full.filter(pc.equal(full[col], val))
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    assert got.to_dict("records") == want.to_dict("records")
    assert len(got) > 0


def test_null_predicate_uses_null_presence(tmp_path, ray_session):
    _, lake = _lake(tmp_path)
    full = final_table(lake)
    idx = str(tmp_path / "vidx")
    refresh_value_index(lake, idx, "tool")
    got = read_lake(lake, where={"tool": None}, where_index_dir=idx).count()
    want = full.filter(pc.is_null(full["tool"])).num_rows
    assert got == want


def test_stale_index_never_misprunes(tmp_path, ray_session):
    changes, lake = _lake(tmp_path)
    col, val, _ = _rare_value(lake)
    idx = str(tmp_path / "vidx")
    refresh_value_index(lake, idx, col)

    # advance the lake past the index: new segment, new epoch
    t = gen_changes(3000, 60, seed=77, out_of_order_frac=0.0)
    t = t.set_column(t.schema.get_field_index("lsn"), "lsn", pc.add(t["lsn"], 3000))
    pq.write_table(t, os.path.join(changes, "seg-00001.parquet"))
    replay(ReplayConfig(changes_dir=changes, lake_dir=lake, num_partitions=16,
                        frag_ranges=8))

    full = final_table(lake)
    want = full.filter(pc.equal(full[col], val)).num_rows
    got = read_lake(lake, where={col: val}, where_index_dir=idx).count()
    assert got == want  # stale ranges are kept, results stay exact

    # refresh only re-reads changed ranges
    out = refresh_value_index(lake, idx, col)
    assert out["refreshed"] > 0
    out2 = refresh_value_index(lake, idx, col)
    assert out2["refreshed"] == 0 and out2["skipped"] > 0


def test_index_binding_and_errors(tmp_path, ray_session):
    _, lake = _lake(tmp_path)
    idx = str(tmp_path / "vidx")
    refresh_value_index(lake, idx, "role")
    with pytest.raises(ValueError):
        refresh_value_index(lake, idx, "tool")  # dir bound to another column
    with pytest.raises(ValueError):
        refresh_value_index(lake, str(tmp_path / "v2"), "no_such_col")
    # predicate on a non-indexed column: index abstains (no pruning)
    parts = LakeDatasource(lake)._parts
    assert value_index_rids(idx, parts, {"tool": "x"}) is None
