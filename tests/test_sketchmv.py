"""Incremental HLL sketch MV (pipelines/sketchmv.py): register ground
truth vs a direct computation, fingerprint incrementality under new
epochs, and estimate sanity."""

import numpy as np
import pytest

from datax_ray.pipelines.replay import ReplayConfig, replay
from datax_ray.pipelines.sketchmv import (
    conv_registers,
    estimate_distinct,
    read_sketch,
    refresh_sketch,
)
from datax_ray.sinks.lake import final_table


@pytest.fixture()
def lake(tmp_path):
    import ray

    from datax_ray.sources.derive import ChangeDeriver

    changes = str(tmp_path / "changes")
    ray.data.read_parquet(
        "/root/testdata/sf0.001/events.parquet",
        columns=["event_id", "ts", "user_id"],
    ).map_batches(
        ChangeDeriver(changes),
        batch_format="pyarrow",
        batch_size=2048,
    ).take_all()
    lk = str(tmp_path / "lake")
    replay(
        ReplayConfig(
            changes_dir=changes, lake_dir=lk, num_partitions=8, segments_per_epoch=2
        )
    )
    return changes, lk


def test_registers_match_direct_and_estimate_bounded(lake, tmp_path):
    _, lk = lake
    d = str(tmp_path / "sketch")
    stats = refresh_sketch(lk, d)
    assert stats["refreshed"] >= 1 and stats["skipped"] == 0

    folded = read_sketch(d).to_pandas().sort_values("bucket")
    live = final_table(lk)
    want = conv_registers(live["conv_id"]).to_pandas().sort_values("bucket")
    assert folded["bucket"].tolist() == want["bucket"].tolist()
    assert folded["max_rho"].tolist() == want["max_rho"].tolist()

    import pyarrow as pa

    exact = live.to_pandas()["conv_id"].nunique()
    est = estimate_distinct(pa.Table.from_pandas(folded))
    assert abs(est - exact) / exact < 0.15  # ~1.04/sqrt(512) => ~5%, slack 3x


def test_refresh_incremental(lake, tmp_path):
    changes, lk = lake
    d = str(tmp_path / "sketch")
    refresh_sketch(lk, d)
    again = refresh_sketch(lk, d)
    assert again["refreshed"] == 0 and again["skipped"] >= 1

    # a new replay epoch over MORE segments invalidates only touched ranges
    import ray

    from datax_ray.sources.derive import ChangeDeriver

    import numpy as np
    import pyarrow as pa

    def synth(b: pa.Table) -> pa.Table:
        ids = b["id"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "event_id": pa.array(ids + 1_000_000, pa.int64()),
                "ts": pa.array(1_700_000_000_000_000 + ids, pa.timestamp("us")),
                "user_id": pa.array(ids % 37, pa.int64()),
            }
        )

    ray.data.range(2000).map_batches(
        synth,
        batch_format="pyarrow",
        batch_size=1000,
    ).map_batches(
        ChangeDeriver(changes), batch_format="pyarrow", batch_size=1000
    ).take_all()
    replay(
        ReplayConfig(
            changes_dir=changes, lake_dir=lk, num_partitions=8, segments_per_epoch=2
        )
    )
    after = refresh_sketch(lk, d)
    assert after["refreshed"] >= 1
    # registers still equal a direct recompute of the new state
    folded = read_sketch(d).to_pandas().sort_values("bucket")
    want = (
        conv_registers(final_table(lk)["conv_id"]).to_pandas().sort_values("bucket")
    )
    assert folded["bucket"].tolist() == want["bucket"].tolist()
    assert folded["max_rho"].tolist() == want["max_rho"].tolist()
