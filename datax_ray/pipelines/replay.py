"""The replay pipeline — entry point E1/E2 of SURVEY.md §3.2.

Per epoch:
    read_parquet(uncommitted segments)
      → map_batches(Normalizer)           # stateless: watermark, validate,
                                          # dirty-route, cast, part_id
      → groupby("part_id").map_groups(MergeApplier)   # THE shuffle + the
                                          # stateful per-partition LWW apply;
                                          # emits O(P) lineage rows only
      → take_all() lineage (tiny) → 2PC manifest commit (driver)

Resume (a crashed/killed run) is the identical code path: the planner skips
committed segments; orphan partition files are overwritten byte-identically.

Never calls ray.init — the caller owns the Ray session (driver contract).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

import ray
import ray.data
from ray.data.context import DataContext, ShuffleStrategy

from datax_ray.schemas import LAKE_SCHEMA, schema_to_json
from datax_ray.sources.changelog import max_lsn, plan_epochs, scan_ddl
from datax_ray.stages.merge import MergeApplier
from datax_ray.stages.normalize import Normalizer
from datax_ray.state.manifest import Manifest
from datax_ray.state.metrics import get_metrics_actor, total_dirty
from datax_ray.state.schema_tracker import SchemaTracker


class DirtyLimitExceeded(RuntimeError):
    pass


@dataclass
class ReplayConfig:
    changes_dir: str
    lake_dir: str
    num_partitions: int = 64
    segments_per_epoch: int | None = None  # None => one epoch for all pending
    salt_turn_width: int | None = None
    compact_every: int = 8  # fold deltas into a new base every K epochs/part
    batch_size: int | None = 65536
    error_limit_rows: int | None = None  # abort epoch if dirty rows exceed
    error_limit_pct: float | None = None  # ... or this fraction of rows_in
    normalize_concurrency: int | tuple | None = None  # task-parallelism cap
    merge_concurrency: int | tuple | None = None  # task-parallelism cap
    metrics: bool = True
    extra: dict = field(default_factory=dict)


@dataclass
class EpochReport:
    epoch: int
    segments: list[str]
    events_in: int
    rows_out: int
    dirty_rows: int
    wall_s: float


def run_epoch(cfg: ReplayConfig, manifest: Manifest, segments: list[str], epoch: int) -> EpochReport:
    t0 = time.perf_counter()
    metrics = get_metrics_actor() if cfg.metrics else None
    if metrics is not None:
        ray.get(metrics.reset.remote())

    # 1. Schema evolution: fold this epoch's DDL events (epoch-boundary
    #    application; see SchemaTracker docstring for the soundness argument).
    tracker = SchemaTracker(manifest.committed_schema() or LAKE_SCHEMA)
    for _, ddl in scan_ddl(segments):
        tracker.apply_ddl(ddl)
    lake_schema = tracker.schema
    schema_json = schema_to_json(lake_schema)

    watermark = manifest.committed_lsn_hi()
    part_recs = {
        pid: {"base": rec.get("base"), "deltas": list(rec.get("deltas", []))}
        for pid, rec in manifest.current_partitions().items()
    }

    # 2. The Dataset pipeline. Both stages are callable-class actor pools:
    #    config parsed once per actor in __init__, per-batch/-group work in
    #    __call__ (the DataX "plugin Task" lifecycle, Ray-natively).
    ncpu = int(ray.cluster_resources().get("CPU", 4))
    # Hash shuffle for the merge exchange: moves each row once to its
    # keyed aggregator instead of sort-shuffling the whole epoch (measured
    # 7x faster at 8M events). Shuffle width (aggregator partitions) tracks
    # the cluster's cores and is DECOUPLED from cfg.num_partitions (the
    # lake file layout): one shuffle partition carries many part_id groups,
    # and map_groups still hands MergeApplier complete per-part_id groups.
    ctx = DataContext.get_current()
    prev_strategy = ctx.shuffle_strategy
    prev_max_agg = ctx.max_hash_shuffle_aggregators
    ctx.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
    shuffle_width = max(8, min(cfg.num_partitions, ncpu))
    ctx.max_hash_shuffle_aggregators = min(shuffle_width, ncpu)
    # Both stages are plain-task stages (instances shipped once via the
    # object store): they hold only parsed config — no model/index state —
    # so the task pool's zero spin-up and instant elasticity beat an actor
    # pool here. cfg.normalize_concurrency/merge_concurrency (when set)
    # still cap the task parallelism.
    ds = ray.data.read_parquet(segments)
    ds = ds.map_batches(
        Normalizer(
            target_schema_json=schema_json,
            num_partitions=cfg.num_partitions,
            watermark_lsn=watermark,
            salt_turn_width=cfg.salt_turn_width,
            deadletter_dir=f"{cfg.lake_dir}/_deadletter/epoch={epoch:06d}",
            metrics=cfg.metrics,
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=cfg.batch_size,
        concurrency=cfg.normalize_concurrency,
    )
    lineage_ds = ds.groupby("part_id", num_partitions=shuffle_width).map_groups(
        MergeApplier(
            lake_dir=cfg.lake_dir,
            epoch=epoch,
            part_recs=part_recs,
            lake_schema_json=schema_json,
            compact_every=cfg.compact_every,
            metrics=cfg.metrics,
        ),
        batch_format="pyarrow",
        concurrency=cfg.merge_concurrency,
    )
    try:
        lineage = lineage_ds.take_all()  # O(partitions) tiny rows
    finally:
        # The DataContext is session-global: restore it so pipelines outside
        # the replay engine keep their own shuffle configuration.
        ctx.shuffle_strategy = prev_strategy
        ctx.max_hash_shuffle_aggregators = prev_max_agg

    snap = ray.get(metrics.snapshot.remote()) if metrics is not None else {}
    dirty = total_dirty(snap)
    rows_in = int(snap.get("normalize", {}).get("rows_in", 0))

    # 3. Dirty-record error limit (DataX errorLimit semantics): abort BEFORE
    #    commit, so the epoch can be retried after the source is fixed.
    if cfg.error_limit_rows is not None and dirty > cfg.error_limit_rows:
        raise DirtyLimitExceeded(f"{dirty} dirty rows > limit {cfg.error_limit_rows}")
    if (
        cfg.error_limit_pct is not None
        and rows_in > 0
        and dirty / rows_in > cfg.error_limit_pct
    ):
        raise DirtyLimitExceeded(f"dirty fraction {dirty/rows_in:.4f} > {cfg.error_limit_pct}")

    # 4. Commit: carry forward untouched partitions; touched ones either
    #    append this epoch's delta or (post-compaction) reset to a new base.
    partitions = manifest.current_partitions()
    for r in lineage:
        pid = int(r["part_id"])
        if r["kind"] == "base":
            partitions[pid] = {
                "base": r["file"],
                "deltas": [],
                "rows": int(r["rows"]),
                "lsn_hi": int(r["lsn_hi"]),
            }
        else:
            prev = partitions.get(pid) or {"base": None, "deltas": [], "rows": 0, "lsn_hi": -1}
            partitions[pid] = {
                "base": prev.get("base"),
                "deltas": [*prev.get("deltas", []), r["file"]],
                "rows": int(prev.get("rows", 0)) + int(r["rows"]),
                "lsn_hi": max(int(prev.get("lsn_hi", -1)), int(r["lsn_hi"])),
            }
    lsn_hi = max(watermark, max_lsn(segments))
    manifest.commit(
        epoch,
        segments=segments,
        lsn_hi=lsn_hi,
        schema=lake_schema,
        partitions=partitions,
        lineage=[dict(r) for r in lineage],
        metrics=snap,
    )
    rows_out = sum(int(r["rows"]) for r in lineage)
    return EpochReport(
        epoch=epoch,
        segments=[s for s in segments],
        events_in=rows_in,
        rows_out=rows_out,
        dirty_rows=dirty,
        wall_s=time.perf_counter() - t0,
    )


def replay(cfg: ReplayConfig) -> list[EpochReport]:
    """Replay all uncommitted segments (fresh run and resume alike)."""
    manifest = Manifest(cfg.lake_dir)
    reports = []
    epochs = plan_epochs(cfg.changes_dir, manifest, cfg.segments_per_epoch)
    epoch_no = manifest.committed_epoch() + 1
    for segments in epochs:
        reports.append(run_epoch(cfg, manifest, segments, epoch_no))
        epoch_no += 1
    return reports
