"""Time-slice reads (`read_lake(min_ts=...)`) with manifest data-skipping.

The manifest records per-file event-time min/max (stages/delta._ts_bounds);
a time-slice read prunes every base/fragment file wholly below the cutoff
from the plan WITHOUT opening it. Pruning safety is one-sided by LWW order:
a file whose every ts < cutoff can neither produce an in-slice winner nor
suppress one (suppression needs ts >= the suppressed row's ts >= cutoff).
"""

import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from datax_ray.fixtures.generator import gen_changes
from datax_ray.pipelines.replay import ReplayConfig, replay
from datax_ray.sinks.lake import LakeDatasource, read_lake

CUTOFF = "2026-03-01 00:00:00"
CUTOFF_US = pa.scalar(__import__("datetime").datetime(2026, 3, 1)).cast(
    pa.timestamp("us")
).cast(pa.int64()).as_py()

SHIFT_US = 90 * 24 * 3600 * 1_000_000  # ~3 months: epoch 1 lands past CUTOFF


def _two_epoch_lake(tmp_path, compact_every=100):
    """Segment 0: base-ts (Jan-2026) events. Segment 1: later events shifted ~3
    months ahead (disjoint LSN space, same conv universe so epoch 1
    overwrites/deletes epoch-0 keys across the cutoff)."""
    t0 = gen_changes(1200, 40, seed=5, out_of_order_frac=0.0)
    t1 = gen_changes(1200, 40, seed=6, out_of_order_frac=0.0)
    t1 = t1.set_column(
        t1.schema.get_field_index("lsn"), "lsn", pc.add(t1["lsn"], 1200)
    )
    t1 = t1.set_column(
        t1.schema.get_field_index("ts"),
        "ts",
        pc.cast(pc.add(pc.cast(t1["ts"], pa.int64()), SHIFT_US), pa.timestamp("us")),
    )
    changes = str(tmp_path / "changes")
    os.makedirs(changes)
    pq.write_table(t0, os.path.join(changes, "seg-00000.parquet"))
    pq.write_table(t1, os.path.join(changes, "seg-00001.parquet"))
    lake = str(tmp_path / "lake")
    replay(
        ReplayConfig(
            changes_dir=changes,
            lake_dir=lake,
            num_partitions=8,
            segments_per_epoch=1,
            compact_every=compact_every,
        )
    )
    return lake


def test_slice_equals_postfilter_of_full_read(tmp_path, ray_session):
    lake = _two_epoch_lake(tmp_path)
    full = read_lake(lake).to_pandas()
    sliced = read_lake(lake, min_ts=CUTOFF).to_pandas()
    expect = full[full["ts"].astype("int64") >= CUTOFF_US // 1]
    key = ["conv_id", "turn_idx"]
    assert (
        sliced.sort_values(key).reset_index(drop=True).to_dict("records")
        == expect.sort_values(key).reset_index(drop=True).to_dict("records")
    )
    assert len(sliced) > 0
    # sanity: the slice really excludes something
    assert len(sliced) < len(full)


def test_slice_prunes_old_files_from_plan(tmp_path, ray_session):
    lake = _two_epoch_lake(tmp_path)
    full_files = {f for p in LakeDatasource(lake)._parts for f in p["files"]}
    slice_files = {
        f for p in LakeDatasource(lake, min_ts=CUTOFF)._parts for f in p["files"]
    }
    # everything wholly below the cutoff -> pruned without reads: epoch-0
    # fragments, plus any staggered-compaction base that folded only
    # epoch-0 rows (rid == epoch mod compact_every compacts each epoch)
    assert slice_files < full_files
    pruned = full_files - slice_files
    assert len(pruned) > 0
    assert all("e=000000" in f or "/b=" in f for f in pruned)
    # nothing that can hold an in-slice row was pruned: every epoch-1
    # fragment is still planned
    assert all("e=000001" in f for f in slice_files)


def test_slice_survives_compaction(tmp_path, ray_session):
    """After compaction folds both epochs into bases, file-level pruning
    can't apply (bases span the cutoff) but results stay identical."""
    lake = _two_epoch_lake(tmp_path, compact_every=1)
    full = read_lake(lake).to_pandas()
    sliced = read_lake(lake, min_ts=CUTOFF).to_pandas()
    expect = full[full["ts"].astype("int64") >= CUTOFF_US]
    assert len(sliced) == len(expect)
    key = ["conv_id", "turn_idx"]
    assert (
        sliced.sort_values(key).reset_index(drop=True).to_dict("records")
        == expect.sort_values(key).reset_index(drop=True).to_dict("records")
    )


def test_slice_int_and_datetime_cutoffs_agree(tmp_path, ray_session):
    from datetime import datetime

    lake = _two_epoch_lake(tmp_path)
    a = read_lake(lake, min_ts=CUTOFF).to_pandas()
    b = read_lake(lake, min_ts=datetime(2026, 3, 1)).to_pandas()
    c = read_lake(lake, min_ts=CUTOFF_US).to_pandas()
    assert len(a) == len(b) == len(c)
