"""Replay-time transformer chain (DataX job.transformer parity in the
CDC path): applied to valid change rows between normalize and the
fragment write; equals transforming the change stream up front."""

import pyarrow.compute as pc
import pytest

from datax_ray.fixtures.generator import gen_changes, write_segments
from datax_ray.oracle import sequential_replay
from datax_ray.pipelines.replay import ReplayConfig, replay
from datax_ray.sinks.lake import final_table

SPECS = [
    {"name": "dx_replace", "column": "text", "pattern": "quick",
     "replacement": "slothful"},
    {"name": "dx_pad", "column": "role", "side": "right", "length": 9,
     "padString": "."},
]


def test_replay_transformers_match_pretransformed_oracle(tmp_path):
    changes = gen_changes(4000, 50, seed=55, out_of_order_frac=0.1)
    chg, lake = str(tmp_path / "chg"), str(tmp_path / "lake")
    write_segments(changes, chg, seg_rows=1200)
    replay(ReplayConfig(
        changes_dir=chg, lake_dir=lake, num_partitions=8,
        segments_per_epoch=2, transformers=SPECS,
    ))

    # Oracle: the same per-row text/role transform applied to the change
    # stream first, then the sequential replay. Equal because the
    # transforms touch no routing/ordering column.
    t = changes.set_column(
        changes.column_names.index("text"), "text",
        pc.replace_substring(changes["text"], "quick", "slothful"),
    )
    t = t.set_column(
        t.column_names.index("role"), "role",
        pc.utf8_rpad(t["role"], 9, "."),
    )
    assert final_table(lake).equals(sequential_replay(t))
    got = final_table(lake)
    assert not pc.any(
        pc.match_substring(pc.fill_null(got["text"], ""), "quick")
    ).as_py()


def test_replay_transformers_reject_routing_columns(tmp_path):
    changes = gen_changes(500, 10, seed=56)
    chg, lake = str(tmp_path / "chg"), str(tmp_path / "lake")
    write_segments(changes, chg, seg_rows=500)
    with pytest.raises(ValueError, match="routing/ordering"):
        replay(ReplayConfig(
            changes_dir=chg, lake_dir=lake, num_partitions=8,
            transformers=[{"name": "dx_substr", "column": "conv_id",
                           "startIndex": 0, "length": 3}],
        ))


def test_dx_lookup_inline_map(ray_session):
    import pyarrow as pa

    from datax_ray.functions.transformers import compile_transformers

    fn = compile_transformers(
        [
            {
                "name": "dx_lookup",
                "column": "role",
                "map": {"user": "HUMAN", "assistant": "MODEL"},
                "outColumn": "role_label",
                "default": "OTHER",
            }
        ]
    )
    t = pa.table({"role": ["user", "assistant", "system", None]})
    out = fn(t)
    assert out["role_label"].to_pylist() == ["HUMAN", "MODEL", "OTHER", "OTHER"]


def test_dx_lookup_side_parquet_and_replace_in_place(tmp_path, ray_session):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from datax_ray.functions.transformers import compile_transformers

    side = tmp_path / "dim.parquet"
    pq.write_table(
        pa.table({"k": ["a", "b"], "v": ["alpha", "beta"]}), side
    )
    fn = compile_transformers(
        [
            {
                "name": "dx_lookup",
                "column": "code",
                "sidePath": str(side),
                "keyField": "k",
                "valueField": "v",
            }
        ]
    )
    out = fn(pa.table({"code": ["b", "a", "zz"]}))
    # no default: misses become null; in-place (no outColumn)
    assert out["code"].to_pylist() == ["beta", "alpha", None]
