"""Snapshot bootstrap — full load, then incremental tail (entry point E0).

DataX's bread-and-butter job is the full table sync [R:2]; real CDC
deployments do snapshot-then-binlog. Here the snapshot is a transcripts
Parquet table loaded as lake epoch 0: each row becomes a pseudo-event
(op='insert', lsn=-1, ts=row ts) and flows through the SAME normalize →
fragment pipeline as the change log, so the LWW rule arbitrates snapshot
vs log rows exactly like the oracle does — an event beats a snapshot row
iff its (ts, lsn) is higher, and lsn=-1 makes the snapshot lose every tie.

Commit records the pseudo-segment name `__snapshot__<basename>` with
lsn_hi = -1, so `replay` afterwards starts from the first real segment
with the watermark untouched.
"""

from __future__ import annotations

import os
import time

import pyarrow as pa

import ray
import ray.data

from datax_ray.pipelines.replay import EpochReport, ReplayConfig
from datax_ray.schemas import LAKE_SCHEMA, schema_to_json
from datax_ray.stages.delta import DeltaWriter
from datax_ray.stages.normalize import Normalizer
from datax_ray.state.manifest import Manifest
from datax_ray.state.metrics import get_metrics_actor, total_dirty


def _snapshot_to_changes(t: pa.Table) -> pa.Table:
    import numpy as np

    n = t.num_rows
    cols = {
        "lsn": pa.array(np.full(n, -1, dtype=np.int64)),
        "ts": t["ts"],
        "op": pa.array(np.full(n, "insert", dtype=object), pa.string()),
        "conv_id": t["conv_id"],
        "turn_idx": t["turn_idx"],
        "role": t["role"],
        "text": t["text"],
        "tool": t["tool"],
        "ddl": pa.nulls(n, pa.string()),
    }
    return pa.table(cols)


def bootstrap(
    src_parquet: str | None,
    cfg: ReplayConfig,
    src_ds: "ray.data.Dataset | None" = None,
    src_label: str | None = None,
) -> EpochReport:
    """Load a transcripts snapshot into an EMPTY lake as epoch 0.

    The snapshot is a parquet path by default; pass `src_ds` to bootstrap
    from ANY transcripts-shaped Dataset instead — e.g. the range-split SQL
    source (`sources/sqlsource.py:read_sql_table`), which is exactly
    DataX's JDBC-full-sync → lake story (`--sql` on the CLI). `src_label`
    names the pseudo-segment in the manifest for lineage."""
    t0 = time.perf_counter()
    manifest = Manifest(cfg.lake_dir)
    if manifest.committed_epoch() >= 0:
        raise RuntimeError(
            f"bootstrap requires an empty lake; {cfg.lake_dir} has committed epochs"
        )
    metrics = get_metrics_actor() if cfg.metrics else None
    if metrics is not None:
        ray.get(metrics.reset.remote())

    layout = {
        "num_partitions": cfg.num_partitions,
        "frag_ranges": min(cfg.frag_ranges, cfg.num_partitions),
        # Part of the frozen layout: later replays must route keys with the
        # same salt the lake was bootstrapped with (see run_epoch).
        "salt_turn_width": cfg.salt_turn_width,
    }
    schema_json = schema_to_json(LAKE_SCHEMA)

    ds = src_ds if src_ds is not None else ray.data.read_parquet(src_parquet)
    ds = ds.map_batches(
        _snapshot_to_changes, batch_format="pyarrow", zero_copy_batch=True
    )
    ds = ds.map_batches(
        Normalizer(
            target_schema_json=schema_json,
            num_partitions=cfg.num_partitions,
            watermark_lsn=-1,
            salt_turn_width=cfg.salt_turn_width,
            deadletter_dir=f"{cfg.lake_dir}/_deadletter/epoch=000000",
            metrics=cfg.metrics,
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=cfg.batch_size,
    )
    lineage_ds = ds.map_batches(
        DeltaWriter(
            lake_dir=cfg.lake_dir,
            epoch=0,
            num_partitions=cfg.num_partitions,
            frag_ranges=layout["frag_ranges"],
            lake_schema_json=schema_json,
            metrics=cfg.metrics,
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=cfg.frag_batch_size,
    )
    lineage = lineage_ds.take_all()

    snap = ray.get(metrics.snapshot.remote()) if metrics is not None else {}
    rows_in = int(snap.get("normalize", {}).get("rows_in", 0))

    ranges: dict[int, dict] = {}
    for r in lineage:
        rid = int(r["range_id"])
        rec = ranges.get(rid) or {"frags": [], "rows": 0, "lsn_hi": -1, "epochs": []}
        rec["frags"].append(r["file"])
        rec["rows"] += int(r["rows"])
        rec["epochs"] = [0]
        ranges[rid] = rec

    manifest.commit(
        0,
        segments=[
            "__snapshot__"
            + (src_label or os.path.basename(os.path.normpath(src_parquet or "ds")))
        ],
        lsn_hi=-1,
        schema=LAKE_SCHEMA,
        partitions={},
        ranges=ranges,
        layout=layout,
        lineage=[dict(r) for r in lineage],
        metrics=snap,
    )
    return EpochReport(
        epoch=0,
        segments=[src_parquet],
        events_in=rows_in,
        rows_out=sum(int(r["rows"]) for r in lineage),
        dirty_rows=total_dirty(snap),
        wall_s=time.perf_counter() - t0,
    )
