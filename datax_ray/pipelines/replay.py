"""The replay pipeline — entry point E1/E2 of SURVEY.md §3.2.

Per epoch (NO all-to-all — the lake merge "shuffles via storage", see
stages/delta.py for the measurements that forced this):
    read_parquet(uncommitted segments)
      → map_batches(Normalizer)      # stateless: watermark, validate,
                                     # dirty-route, cast, part_id
      → map_batches(DeltaWriter)     # within-batch LWW combine; write one
                                     # fragment per partition-RANGE with a
                                     # content-hash name; emit lineage rows
      → take_all() lineage (tiny)
    concurrently, for ranges holding >= compact_every COMMITTED epochs of
    fragments (disjoint files from this epoch's writes, so the two Dataset
    executions overlap and fill each other's idle cores):
      from_items(ranges) → map_batches(Compactor)  # fold bases+frags into
                                     # fresh per-partition bases
    → ONE 2PC manifest commit covering both.

Resume (a crashed/killed run) is the identical code path: the planner skips
committed segments; orphan files (never referenced by a committed manifest)
are invisible and re-runs rewrite fragments content-identically.

Never calls ray.init — the caller owns the Ray session (driver contract).
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field

import ray
import ray.data

from datax_ray.schemas import LAKE_SCHEMA, schema_from_json, schema_to_json
from datax_ray.sources.changelog import (
    max_lsn,
    plan_epochs,
    plan_epochs_multi,
    read_segments,
    scan_ddl,
    scan_ddl_ts,
    scan_schema_drift,
)
from datax_ray.stages.delta import Compactor, DeltaWriter
from datax_ray.stages.normalize import Normalizer
from datax_ray.state.manifest import ConcurrentCommitError, Manifest
from datax_ray.state.metrics import get_metrics_actor, total_dirty
from datax_ray.state.schema_tracker import SchemaTracker


class DirtyLimitExceeded(RuntimeError):
    pass


# Multi-source replication (MySQL multi-source / Debezium multi-topic
# analog): N producers, each with its OWN strictly-increasing lsn space,
# replay into ONE lake. No merged-log converter and no global sort is
# needed — LWW only requires a deterministic per-key total order, so each
# source's lsn maps into a disjoint global space
#     glsn = lsn * slots + slot        (slot = the source's pinned index)
# which preserves per-source order, never collides across sources, and
# breaks exact (ts) ties deterministically (by source lsn, then slot).
# `slots` is pinned at the lake's first multi-source commit and the
# name→slot map persists in manifest properties, so adding a producer
# later never re-orders history. Per-source watermarks (in SOURCE lsn
# space) persist next to the slots and dedup re-delivered events before
# the remap, exactly like the single-source watermark filter.
MULTISOURCE_SLOTS = 64


def _lsn_remap(slots: int, slot: int, watermark: int,
               source: str | None = None, metrics: bool = True):
    """Per-source ingest stage: drop already-committed events (source-lsn
    watermark, exact), then remap lsn → glsn. Vectorized, zero-copy in.
    Remapped glsns must stay BELOW 2^62 — lsns at/above 2^62 are the
    RESERVED synthetic space purge/backfill/retention tombstones use to
    dominate real log positions (purge.py:_SYNTH_LSN_BASE); a glsn
    wandering into it would let an ordinary change event tie-break past a
    governance rewrite. Source lsns are therefore capped at 2^62/slots
    (~7.2e16 at the default 64 — six orders beyond the 10^10-event
    design point) and the cap is enforced LOUDLY per batch. Per-SOURCE
    channel statistics (rows delivered / rows deduped) mirror into the
    metrics actor under stage "source:<name>" — the DataX
    channel-statistics analog at producer granularity, committed with
    the epoch's manifest like every other stage's counters."""
    import pyarrow.compute as _pc

    actor = get_metrics_actor() if (metrics and source) else None
    lsn_cap = ((1 << 62) - 1 - slot) // slots  # glsn stays < 2^62

    def remap(t):
        n_in = t.num_rows
        keep = _pc.fill_null(_pc.greater(t["lsn"], watermark), False)
        t = t.filter(keep)
        if actor is not None:
            actor.add.remote(
                f"source:{source}",
                {"rows_in": n_in, "rows_deduped": n_in - t.num_rows},
            )
        if t.num_rows:
            hi = _pc.max(t["lsn"]).as_py()
            if hi is not None and int(hi) > lsn_cap:
                raise ValueError(
                    f"source lsn {hi} exceeds the multi-source cap "
                    f"{lsn_cap} (glsn must stay below the 2^62 synthetic "
                    f"reserved space; see purge.py)"
                )
        idx = t.schema.get_field_index("lsn")
        glsn = _pc.add(
            _pc.multiply_checked(_pc.cast(t["lsn"], "int64"), slots), slot
        )
        return t.set_column(idx, "lsn", glsn)

    return remap


@dataclass
class ReplayConfig:
    changes_dir: str | None = None
    # Multi-source replication: {source_name: changes_dir}. Mutually
    # exclusive with changes_dir — when set, every source's uncommitted
    # segments replay each epoch with lsns remapped into the lake's pinned
    # glsn space (see MULTISOURCE_SLOTS above). Names must not contain
    # '::' or '/' (they qualify segment names in the manifest).
    sources: dict[str, str] | None = None
    lake_dir: str = ""
    num_partitions: int = 64
    segments_per_epoch: int | None = None  # None => one epoch for all pending
    salt_turn_width: int | None = None
    frag_ranges: int = 32  # partition ranges = unit of fragment files/compaction
    compact_every: int = 8  # compact a range when it holds >= this many frags
    # None (default): one batch per fused-decode input file — the decode→
    # normalize→DeltaWriter chain fuses into ONE task-pool operator, so
    # decoded rows never enter the object store between stages and the
    # per-task unit is the segment file (seg_rows at generation time is
    # the real batch knob). Setting a row count here forces the bundler
    # to accumulate that many INPUT rows per fused task — with 1-row
    # path items that collapses parallelism (measured 34 s vs 5.4 s
    # sustained at sf0.1/32 cpus) — so only set it together with
    # fuse_decode=False reads.
    batch_size: int | None = None
    frag_batch_size: int | None = None
    max_events_per_sec: float | None = None  # DataX job.setting.speed analog
    error_limit_rows: int | None = None  # abort epoch if dirty rows exceed
    error_limit_pct: float | None = None  # ... or this fraction of rows_in
    normalize_concurrency: int | tuple | None = None  # task-parallelism cap
    merge_concurrency: int | tuple | None = None  # task-parallelism cap
    # DataX job.transformer parity in the CDC path: a dx_*/udf spec list
    # (functions/transformers.py) fused into ONE map stage between
    # normalize and the fragment write. Transformers see only VALID
    # normalized change rows (dirty rows are already dead-lettered) and
    # must not touch routing/ordering columns — conv_id, turn_idx, ts,
    # lsn — or LWW/partitioning would silently break (enforced). Job-level
    # config, not lake layout: committed epochs are never reapplied, so
    # changing the spec affects only future epochs (keep it stable across
    # resumes of one logical job, exactly as with a DataX job config).
    transformers: list[dict] | None = None
    metrics: bool = True
    # Ingest expectations (Delta-style CHECK constraints, DataX dirty-record
    # semantics): violating change rows dead-letter with reason
    # "expectation:<col>:<op>" and count against errorLimit. Spec grammar in
    # validation.compile_expectations. Job-level config like transformers.
    expectations: list[dict] | None = None
    # AUTOMATIC schema evolution (Debezium/Fivetran "column just appears"):
    # detect new/widened payload columns from parquet segment FOOTERS at
    # epoch planning (zero data reads) and fold synthetic add_column/widen
    # DDL — after explicit DDL events, gated by the lake's schema policy
    # like any stream DDL. jsonl/csv segments (no typed footer) still need
    # explicit DDL. See sources/changelog.py:scan_schema_drift.
    auto_ddl: bool = False
    extra: dict = field(default_factory=dict)


@dataclass
class EpochReport:
    epoch: int
    segments: list[str]
    events_in: int
    rows_out: int
    dirty_rows: int
    wall_s: float


def run_epoch(
    cfg: ReplayConfig,
    manifest: Manifest,
    segments: "list[str] | dict[str, list[str]]",
    epoch: int,
    stage: bool = False,
) -> EpochReport:
    """One replay epoch. `segments` is a path list (single-source) or a
    {source_name: [paths]} dict (multi-source replication — see
    MULTISOURCE_SLOTS for the glsn design)."""
    t0 = time.perf_counter()
    multi = isinstance(segments, dict)
    metrics = get_metrics_actor() if cfg.metrics else None
    if metrics is not None:
        ray.get(metrics.reset.remote())

    props = manifest.committed_properties()
    ms = props.get("multisource")
    if multi:
        if ms is None and manifest.committed_lsn_hi() >= 0:
            raise ValueError(
                "multi-source replay on a lake with single-source change "
                "history — the committed lsn space is not glsn-remapped; "
                "start multi-source replication on a fresh (or bootstrap-"
                "only) lake"
            )
        slots = int(ms["slots"]) if ms else MULTISOURCE_SLOTS
        srcmap: dict[str, dict] = {
            k: dict(v) for k, v in ((ms or {}).get("sources") or {}).items()
        }
        for name in sorted(segments):
            if "::" in name or "/" in name:
                raise ValueError(f"invalid source name {name!r} ('::' and '/' are reserved)")
            if name not in srcmap:
                used = {int(v["slot"]) for v in srcmap.values()}
                free = next((i for i in range(slots) if i not in used), None)
                if free is None:
                    raise ValueError(
                        f"no free source slot (lake pinned slots={slots})"
                    )
                srcmap[name] = {"slot": free, "lsn_hi": -1}
    elif ms is not None:
        raise ValueError(
            "this lake is multi-source replicated — replay it with "
            "ReplayConfig(sources={name: dir, ...}), not changes_dir"
        )

    # 1. Schema evolution: fold this epoch's DDL events (epoch-boundary
    #    application; see SchemaTracker docstring for the soundness argument).
    #    A lake-pinned schema policy (alter --schema-policy) gates which DDL
    #    verbs may fold — a violation aborts HERE, before any write.
    tracker = SchemaTracker(
        manifest.committed_schema() or LAKE_SCHEMA,
        policy=props.get("schema_policy"),
    )
    if multi:
        # DDL from every source, folded in the SAME (ts, glsn) order the
        # data events merge under — deterministic across producers.
        ddl_events = []
        for name, paths in segments.items():
            slot, wm = int(srcmap[name]["slot"]), int(srcmap[name]["lsn_hi"])
            for ts_us, lsn, ddl in scan_ddl_ts(paths):
                if lsn <= wm:
                    continue
                ddl_events.append((ts_us, lsn * slots + slot, ddl))
        for _, _, ddl in sorted(ddl_events):
            tracker.apply_ddl(ddl)
    else:
        for _, ddl in scan_ddl(segments):
            tracker.apply_ddl(ddl)
    if cfg.auto_ddl:
        # AUTOMATIC schema evolution: fold footer-detected drift (new /
        # widened payload columns) AFTER explicit DDL, through the same
        # tracker — so the pinned schema policy gates synthetic verbs too
        # and stream-declared evolution always wins. Footer-only: O(this
        # epoch's segments) driver-side, zero data pages.
        paths = (
            [p for ps in segments.values() for p in ps] if multi else segments
        )
        for ddl in scan_schema_drift(paths, tracker.schema):
            tracker.apply_ddl(ddl)
    lake_schema = tracker.schema
    schema_json = schema_to_json(lake_schema)

    watermark = manifest.committed_lsn_hi()
    # The partition/range layout is a LAKE property, frozen at epoch 0:
    # resuming with different cfg values must not shift rows across files.
    # salt_turn_width is part of the layout — part_ids_for depends on it, so
    # replaying with a different value than the lake was built with would
    # route existing keys to different ranges (silent dup keys / resurrected
    # rows). The committed value always wins over cfg on resume.
    layout = manifest.committed_layout() or {
        "num_partitions": cfg.num_partitions,
        "frag_ranges": min(cfg.frag_ranges, cfg.num_partitions),
        "salt_turn_width": cfg.salt_turn_width,
    }
    num_partitions = int(layout["num_partitions"])
    frag_ranges = int(layout["frag_ranges"])
    salt_turn_width = layout.get("salt_turn_width")
    salt_turn_width = int(salt_turn_width) if salt_turn_width is not None else None
    parts_per_range = max(1, num_partitions // frag_ranges)

    partitions = manifest.current_partitions()
    ranges = manifest.current_ranges()

    # 2a. Compaction plan — from COMMITTED state only, so it can execute
    #     CONCURRENTLY with this epoch's fragment writing (disjoint files:
    #     compaction reads prior epochs' bases+frags, the delta stage only
    #     creates new ones). STAGGERED: each epoch compacts the 1/K of
    #     ranges with rid ≡ epoch (mod K), so compaction load is constant
    #     per epoch (≈ lake/K) and hides completely under the delta stage
    #     instead of spiking every K-th epoch. The >= K-pending condition
    #     is the backstop for rarely-hit ranges.
    K = max(1, cfg.compact_every)
    to_compact = sorted(
        rid for rid, rec in ranges.items()
        if rec.get("frags")
        and (rid % K == epoch % K or len(rec.get("epochs", [])) >= K)
    )
    compact_ds = None
    if to_compact:
        items = []
        for rid in to_compact:
            pids = range(rid * parts_per_range, min((rid + 1) * parts_per_range, num_partitions))
            withbase = [(p, partitions[p]["base"]) for p in pids if partitions.get(p, {}).get("base")]
            items.append(
                {
                    "range_id": rid,
                    "base_pids": [p for p, _ in withbase],
                    "base_files": [f for _, f in withbase],
                    "frag_files": list(ranges[rid]["frags"]),
                }
            )
        compact_ds = ray.data.from_items(items, override_num_blocks=len(items)).map_batches(
            Compactor(
                lake_dir=cfg.lake_dir,
                epoch=epoch,
                lake_schema_json=schema_json,
                metrics=cfg.metrics,
                # persisted clustering policy (compact --cluster-ts /
                # alter): auto-compaction keeps the layout, so a clustered
                # lake never silently reverts to key order
                cluster_ts=props.get("cluster_by") == "ts",
            ),
            batch_format="pyarrow",
            batch_size=None,
        )

    # 2b. Map-only Dataset pipeline (instances shipped once via the object
    #    store; task pools — zero spin-up, elastic). No shuffle anywhere:
    #    co-location happens in the lake's file layout itself.
    if multi:
        # One pruned read + vectorized lsn→glsn remap per source, then a
        # union: the streaming executor interleaves the sources' blocks,
        # and everything downstream (normalize → delta write → commit) is
        # the unchanged single-log path. Per-source watermark dedup runs
        # inside the remap (source-lsn space), so the Normalizer's global
        # watermark filter is disabled below.
        src_parts = []
        for name in sorted(segments):
            src_parts.append(
                read_segments(segments[name]).map_batches(
                    _lsn_remap(
                        slots,
                        int(srcmap[name]["slot"]),
                        int(srcmap[name]["lsn_hi"]),
                        source=name,
                        metrics=cfg.metrics,
                    ),
                    batch_format="pyarrow",
                    zero_copy_batch=True,
                    batch_size=cfg.batch_size,
                )
            )
        ds = src_parts[0]
        for p in src_parts[1:]:
            ds = ds.union(p)
    else:
        ds = read_segments(segments)
    ds = ds.map_batches(
        Normalizer(
            target_schema_json=schema_json,
            num_partitions=num_partitions,
            watermark_lsn=-1 if multi else watermark,
            salt_turn_width=salt_turn_width,
            deadletter_dir=f"{cfg.lake_dir}/_deadletter/epoch={epoch:06d}",
            metrics=cfg.metrics,
            max_events_per_sec=cfg.max_events_per_sec,
            # lake-level constraints (alter_lake) compose with job-level
            # ones: a change row must satisfy BOTH rule sets to ingest
            expectations=(
                (cfg.expectations or [])
                + (manifest.committed_properties().get("expectations") or [])
            )
            or None,
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=cfg.batch_size,
        concurrency=cfg.normalize_concurrency,
    )
    if cfg.transformers:
        from datax_ray.functions.transformers import compile_transformers

        banned = {
            "conv_id", "turn_idx", "ts", "lsn", "op",
            "_lsn", "_deleted", "part_id",
        }
        touched = {s.get("column") for s in cfg.transformers} & banned
        if touched:
            raise ValueError(
                f"replay transformers must not modify routing/ordering "
                f"columns {sorted(touched)}"
            )
        # udf specs carry no "column" and cannot be introspected — enforce
        # the same contract at runtime by checking the banned columns come
        # out of the fused chain unchanged (cheap: pointer-equality first,
        # value-equality only when buffers were rebuilt).
        fused_inner = compile_transformers(cfg.transformers)

        def fused_guarded(t: pa.Table) -> pa.Table:
            out = fused_inner(t)
            if out.num_rows == t.num_rows:
                for c in banned:
                    if c in t.column_names and c in out.column_names:
                        if out[c] is not t[c] and not out[c].equals(t[c]):
                            raise ValueError(
                                f"replay transformer modified routing/"
                                f"ordering column {c!r}"
                            )
            return out
        ds = ds.map_batches(
            fused_guarded,
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=cfg.batch_size,
            concurrency=cfg.normalize_concurrency,
        )
    lineage_ds = ds.map_batches(
        DeltaWriter(
            lake_dir=cfg.lake_dir,
            epoch=epoch,
            num_partitions=num_partitions,
            frag_ranges=frag_ranges,
            lake_schema_json=schema_json,
            metrics=cfg.metrics,
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=cfg.frag_batch_size,
        concurrency=cfg.merge_concurrency,
    )
    # Execute the delta stage and the (independent) compaction concurrently:
    # both are map-only and neither reads the other's files, so overlapping
    # them fills the cores a single phase would leave idle.
    base_lineage: list = []
    if compact_ds is not None:
        import concurrent.futures

        with concurrent.futures.ThreadPoolExecutor(max_workers=2) as pool:
            frag_fut = pool.submit(lineage_ds.take_all)
            comp_fut = pool.submit(compact_ds.take_all)
            lineage = frag_fut.result()
            base_lineage = comp_fut.result()
    else:
        lineage = lineage_ds.take_all()  # O(tasks x ranges) tiny rows
    if os.environ.get("DATAX_STATS"):
        import sys

        print(lineage_ds.stats(), file=sys.stderr)

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

    # 4. Fold: compaction first (it covered the PRIOR epochs' fragments of
    #    the compacted ranges), then this epoch's fresh fragments on top.
    for r in base_lineage:
        partitions[int(r["part_id"])] = {
            "base": r["file"],
            "rows": int(r["rows"]),
            "lsn_hi": int(r["lsn_hi"]),
            "ts_lo": r.get("ts_lo"),
            "ts_hi": r.get("ts_hi"),
            "bloom": r.get("key_bloom"),
        }
    for rid in to_compact:
        ranges[rid] = {"frags": [], "rows": 0, "lsn_hi": int(ranges[rid]["lsn_hi"]), "epochs": []}
    for r in lineage:
        rid = int(r["range_id"])
        rec = ranges.get(rid) or {"frags": [], "rows": 0, "lsn_hi": -1, "epochs": []}
        # Two batches whose LWW-reduced content is byte-identical share a
        # content-hash path — record the file (and its rows/bytes) once.
        if r["file"] in rec.get("frags", []):
            continue
        rec["frags"] = [*rec.get("frags", []), r["file"]]
        rec["rows"] = int(rec.get("rows", 0)) + int(r["rows"])
        rec["lsn_hi"] = max(int(rec.get("lsn_hi", -1)), int(r["lsn_hi"]))
        if r.get("ts_lo") is not None or r.get("ts_hi") is not None:
            # per-file event-time stats for data-skipping reads (lake.py
            # min_ts); keyed by file so purge/repartition rewrites that
            # drop a file simply orphan its entry (readers only look up
            # files still in `frags`; missing stats = never pruned).
            rec["frag_ts"] = {
                **rec.get("frag_ts", {}),
                r["file"]: [r.get("ts_lo"), r.get("ts_hi")],
            }
        if r.get("key_bloom"):
            # per-file conv_id Bloom (state/bloom.py): point lookups drop
            # fragments of epochs that never touched the key — keyed by
            # file like frag_ts, so rewrites simply orphan the entry
            rec["frag_bloom"] = {
                **rec.get("frag_bloom", {}),
                r["file"]: r["key_bloom"],
            }
        eps = rec.get("epochs", [])
        if epoch not in eps:
            eps = [*eps, epoch]
        rec["epochs"] = eps
        ranges[rid] = rec

    # 5. ONE atomic commit covering fragments + compaction.
    commit_props = None  # None => manifest carries prior properties forward
    if multi:
        lsn_hi = watermark
        seg_names = []
        for name, paths in segments.items():
            seg_names.extend(f"{name}::{os.path.basename(p)}" for p in paths)
            src_hi = max_lsn(paths)
            if src_hi >= 0:
                srcmap[name]["lsn_hi"] = max(int(srcmap[name]["lsn_hi"]), src_hi)
                lsn_hi = max(lsn_hi, src_hi * slots + int(srcmap[name]["slot"]))
        props["multisource"] = {"slots": slots, "sources": srcmap}
        commit_props = props
        commit_segments = sorted(seg_names)
    else:
        lsn_hi = max(watermark, max_lsn(segments))
        commit_segments = segments
    publish = manifest.stage if stage else manifest.commit
    publish(
        epoch,
        segments=commit_segments,
        lsn_hi=lsn_hi,
        schema=lake_schema,
        partitions=partitions,
        ranges=ranges,
        layout=layout,
        lineage=[dict(r) for r in (*lineage, *base_lineage)],
        metrics=snap,
        properties=commit_props,
    )
    rows_out = sum(int(r["rows"]) for r in lineage)
    return EpochReport(
        epoch=epoch,
        segments=[s for s in commit_segments],
        events_in=rows_in,
        rows_out=rows_out,
        dirty_rows=dirty,
        wall_s=time.perf_counter() - t0,
    )


def alter_lake(
    lake_dir: str,
    expectations: list[dict] | None = None,
    clear_expectations: bool = False,
    schema_policy: str | None = None,
    clear_schema_policy: bool = False,
    clear_cluster_by: bool = False,
) -> dict:
    """Set / clear LAKE-LEVEL table properties: ingest expectations
    (Delta-style CHECK constraints) and/or a DDL-compatibility schema
    policy ('additive' = add_column only; 'compatible' = add_column +
    widen — rename/drop always require clearing the policy first, they
    break name-bound consumers). Both persist in the manifest's
    `properties` and are enforced by EVERY subsequent replay on this
    lake, no job config needed — unlike
    `ReplayConfig.expectations`, which stays job-scoped (both compose:
    lake rules AND job rules must pass). Commits a data-free 'alter' epoch
    (state unchanged, properties replaced); works on an empty lake too, so
    constraints can be in force from the very first ingest epoch. The spec
    is validated eagerly (compile_expectations) so a bad rule fails here,
    not mid-replay."""
    from datax_ray.validation import compile_expectations

    m = Manifest(lake_dir)
    props = m.committed_properties()
    if clear_expectations:
        props.pop("expectations", None)
    if expectations is not None:
        compile_expectations(expectations)  # validate the spec now
        props["expectations"] = expectations
    if clear_schema_policy:
        props.pop("schema_policy", None)
    if clear_cluster_by:
        # stop clustering FUTURE compactions; existing clustered bases stay
        # as written until their next rewrite (layout, not correctness)
        props.pop("cluster_by", None)
    if schema_policy is not None:
        from datax_ray.state.schema_tracker import SCHEMA_POLICIES

        if schema_policy not in SCHEMA_POLICIES:
            raise ValueError(
                f"unknown schema policy {schema_policy!r} "
                f"(expected one of {sorted(SCHEMA_POLICIES)})"
            )
        props["schema_policy"] = schema_policy
    rec = m.latest()
    epoch = m.committed_epoch() + 1
    m.commit(
        epoch,
        segments=[],
        lsn_hi=rec["lsn_hi"] if rec else -1,
        schema=m.committed_schema() or LAKE_SCHEMA,
        partitions=m.current_partitions(),
        ranges=m.current_ranges(),
        layout=m.committed_layout(),
        lineage=[],
        metrics={"alter": {"properties": sorted(props)}},
        properties=props,
    )
    return {"epoch": epoch, "properties": props}


def restore_lake(
    lake_dir: str,
    to_epoch: int | None = None,
    to_tag: str | None = None,
) -> dict:
    """Delta-style RESTORE: rewind the lake's VISIBLE STATE to a retained
    committed epoch by committing one data-free epoch whose partitions /
    ranges / layout / schema are the target record's, verbatim. Data files
    are immutable and content-/epoch-addressed, so the old state is
    reconstructed by reference — zero data bytes move, O(manifest) work,
    no Ray session.

    Contract (the CDC-specific part):
    - The ingest WATERMARK (lsn_hi, and per-source watermarks in the
      manifest properties) stays at HEAD: changes discarded by the restore
      are discarded PERMANENTLY — already-committed segments never
      re-apply, and future events land on the restored state exactly as
      they would have (a genuinely newer event still wins under LWW).
      This keeps single- and multi-source lakes consistent and makes
      restore the honest "undo a bad backfill/purge/ingest window" verb.
    - Table PROPERTIES (constraints, schema policy, source slot map) stay
      at head too — restore rewinds data, not governance; use `alter` for
      that.
    - Feed-based incremental consumers (mvadd/mvhist/cmsmv/mvwindow,
      feedout, named consumers) cannot express a restore as a fragment
      delta, so feed windows CROSSING a restore epoch raise loudly
      (plan_change_feed / plan_feed_preimages) — restart them from the
      restore epoch or --rebuild. State-fingerprint consumers (SQL
      mirror, incremental export, recompute MVs, indexes) handle restore
      for free: changed ranges' fingerprints change, untouched ranges
      still skip.
    - The target epoch must be retained (its manifest record AND files
      survive vacuum; tag it to pin). Restoring TO head is a no-op.
    """
    m = Manifest(lake_dir)
    head = m.committed_epoch()
    if head < 0:
        raise ValueError("cannot restore an empty lake (no committed epoch)")
    if (to_epoch is None) == (to_tag is None):
        raise ValueError("restore needs exactly one of to_epoch / to_tag")
    if to_tag is not None:
        to_epoch = m.resolve_tag(to_tag)
    if to_epoch > head:
        raise ValueError(f"restore target {to_epoch} is beyond head {head}")
    if to_epoch == head:
        return {"epoch": None, "restored_to": to_epoch, "noop": True}
    rec = m.at_epoch(to_epoch)
    if rec is None or rec["epoch"] != to_epoch:
        raise ValueError(
            f"epoch {to_epoch} is not retained (never committed or dropped "
            "by vacuum) — restore needs its exact manifest record; tag "
            "epochs you may want to restore to"
        )
    # cheap existence sweep: every referenced file must still be on disk
    refs = [p.get("base") for p in rec.get("partitions", {}).values() if p.get("base")]
    for r in rec.get("ranges", {}).values():
        refs.extend(r.get("frags", []))
    from datax_ray.state.fs import fs_for as _ff

    missing = [
        f for f in refs if not _ff(lake_dir).exists(os.path.join(lake_dir, f))
    ]
    if missing:
        raise ValueError(
            f"epoch {to_epoch} is not restorable: {len(missing)} referenced "
            f"file(s) missing (first: {missing[0]}) — dropped by vacuum?"
        )
    latest = m.latest()
    epoch = head + 1
    m.commit(
        epoch,
        segments=[],
        lsn_hi=latest["lsn_hi"],  # watermark preserved — see docstring
        schema=schema_from_json(rec["schema"]),
        partitions={int(k): v for k, v in rec.get("partitions", {}).items()},
        ranges={int(k): v for k, v in rec.get("ranges", {}).items()},
        layout=rec.get("layout"),
        lineage=[],
        metrics={"restore": {"to_epoch": int(to_epoch), "from_epoch": head}},
    )
    return {"epoch": epoch, "restored_to": int(to_epoch), "noop": False}


def compact_lake(
    cfg: ReplayConfig,
    only_rids: set[int] | None = None,
    cluster_ts: bool = False,
) -> dict:
    """Force-compact every range with pending fragments into per-partition
    bases (same map-only Compactor the replay path uses), committing one
    epoch with no new segments. Useful before export or when tailing stops.
    `only_rids` restricts compaction to those ranges (purge's hard phase
    compacts only the ranges that can hold the purged keys).

    `cluster_ts=True` is the Delta OPTIMIZE ZORDER analog for the
    time-slice dimension: base rows are written sorted by (ts, conv_id,
    turn_idx) instead of (conv_id, turn_idx), and EVERY range with a base
    rewrites (not just frag-pending ones). The merge fold never assumes
    input order (merge_states sorts), so correctness is untouched; the
    payoff is that the bounded row groups acquire tight, monotone ts
    statistics, and `read_lake(min_ts=)`'s pushed ts>=cutoff filter then
    skips whole row groups before decompression — extending the D18
    file-level pruning tier INSIDE compacted bases, where a cold lake's
    bytes live. Trade-off (the ZORDER-dimension choice): clustered bases
    lose conv_id row-group pruning for point lookups — file-level Bloom
    pruning still applies — so cluster time-series lakes, not
    point-lookup-heavy ones."""
    manifest = Manifest(cfg.lake_dir)
    committed = manifest.committed_epoch()
    if committed < 0:
        return {"compacted_ranges": 0, "epoch": None}
    props = manifest.committed_properties()
    # cluster_ts=True PERSISTS the policy (Delta clustering-columns
    # semantics): later compactions — incl. the replay path's staggered
    # auto-compaction — keep the layout. An already-persisted policy makes
    # plain compactions cluster too.
    set_policy = cluster_ts and props.get("cluster_by") != "ts"
    if set_policy:
        props["cluster_by"] = "ts"
    # explicit cluster_ts=True rewrites EVERY base (the one-shot OPTIMIZE);
    # a persisted policy only changes the LAYOUT of ranges being compacted
    # anyway — routine frag compactions stay O(pending), never O(lake)
    rewrite_all = cluster_ts
    cluster_ts = cluster_ts or props.get("cluster_by") == "ts"
    layout = manifest.committed_layout() or {
        "num_partitions": cfg.num_partitions,
        "frag_ranges": min(cfg.frag_ranges, cfg.num_partitions),
    }
    num_partitions = int(layout["num_partitions"])
    parts_per_range = max(1, num_partitions // int(layout["frag_ranges"]))
    partitions = manifest.current_partitions()
    ranges = manifest.current_ranges()
    schema = manifest.committed_schema() or LAKE_SCHEMA
    schema_json = schema_to_json(schema)
    epoch = committed + 1

    all_rids = set(ranges) | {pid // parts_per_range for pid in partitions}
    to_compact = sorted(
        rid
        for rid in all_rids
        if (ranges.get(rid, {}).get("frags") or rewrite_all)
        and (only_rids is None or rid in only_rids)
    )
    if not to_compact:
        return {"compacted_ranges": 0, "epoch": None}
    items = []
    for rid in list(to_compact):
        pids = range(rid * parts_per_range, min((rid + 1) * parts_per_range, num_partitions))
        withbase = [(p, partitions[p]["base"]) for p in pids if partitions.get(p, {}).get("base")]
        frag_files = list(ranges.get(rid, {}).get("frags", []))
        if not withbase and not frag_files:
            to_compact.remove(rid)
            continue
        items.append(
            {
                "range_id": rid,
                "base_pids": [p for p, _ in withbase],
                "base_files": [f for _, f in withbase],
                "frag_files": frag_files,
            }
        )
    if not items:
        return {"compacted_ranges": 0, "epoch": None}
    lineage = ray.data.from_items(items, override_num_blocks=len(items)).map_batches(
        Compactor(
            lake_dir=cfg.lake_dir,
            epoch=epoch,
            lake_schema_json=schema_json,
            metrics=cfg.metrics,
            cluster_ts=cluster_ts,
        ),
        batch_format="pyarrow",
        batch_size=None,
    ).take_all()
    for r in lineage:
        partitions[int(r["part_id"])] = {
            "base": r["file"],
            "rows": int(r["rows"]),
            "lsn_hi": int(r["lsn_hi"]),
            "ts_lo": r.get("ts_lo"),
            "ts_hi": r.get("ts_hi"),
            "bloom": r.get("key_bloom"),
        }
    for rid in to_compact:
        prev_hi = int(ranges.get(rid, {}).get("lsn_hi", -1))
        ranges[rid] = {"frags": [], "rows": 0, "lsn_hi": prev_hi, "epochs": []}
    manifest.commit(
        epoch,
        segments=[],
        lsn_hi=manifest.committed_lsn_hi(),
        schema=schema,
        partitions=partitions,
        ranges=ranges,
        layout=layout,
        lineage=[dict(r) for r in lineage],
        metrics={"cluster": {"by": "ts"}} if cluster_ts else {},
        properties=props if set_policy else None,
    )
    return {"compacted_ranges": len(to_compact), "epoch": epoch}


def replay(
    cfg: ReplayConfig, max_commit_retries: int = 3, stage: bool = False
) -> list[EpochReport]:
    """Replay all uncommitted segments (fresh run and resume alike).

    Concurrent-writer REBASE: the manifest's exclusive commit (os.link)
    guarantees one winner per epoch; the loser raises
    ConcurrentCommitError. Instead of dying, replay re-plans from the NEW
    committed state — the winner's epoch consumed some segments, so the
    fresh plan covers exactly what remains — and continues. Safe because
    the loser's already-written fragments are content-hash named (identical
    bytes on re-run, orphans if the segments were taken by the winner) and
    uncommitted segments re-apply idempotently. Optimistic concurrency in
    the Delta commit-protocol sense, at epoch granularity."""
    if bool(cfg.changes_dir) == bool(cfg.sources):
        raise ValueError("ReplayConfig needs exactly one of changes_dir / sources")
    if not cfg.lake_dir:
        raise ValueError("ReplayConfig.lake_dir is required")
    manifest = Manifest(cfg.lake_dir)
    if stage:
        # write-audit-publish: land ALL pending segments as ONE staged
        # epoch (the audit unit), invisible to committed readers until
        # `publish_staged`. At most one staged epoch exists; a pending one
        # must be published or aborted first (Manifest.stage enforces it,
        # but check here so the pipeline never runs for nothing).
        if manifest.staged_record() is not None:
            raise ValueError(
                "an epoch is already staged on this lake — publish or "
                "abort it before staging another"
            )
        if cfg.sources:
            epochs = plan_epochs_multi(cfg.sources, manifest, None)
        else:
            epochs = plan_epochs(cfg.changes_dir, manifest, None)
        if not epochs:
            return []
        return [
            run_epoch(
                cfg, manifest, epochs[0], manifest.committed_epoch() + 1,
                stage=True,
            )
        ]
    reports: list[EpochReport] = []
    retries = 0
    while True:
        if cfg.sources:
            epochs = plan_epochs_multi(cfg.sources, manifest, cfg.segments_per_epoch)
        else:
            epochs = plan_epochs(cfg.changes_dir, manifest, cfg.segments_per_epoch)
        if not epochs:
            return reports
        epoch_no = manifest.committed_epoch() + 1
        try:
            for segments in epochs:
                reports.append(run_epoch(cfg, manifest, segments, epoch_no))
                epoch_no += 1
            return reports
        except ConcurrentCommitError:
            retries += 1
            if retries > max_commit_retries:
                raise
            continue  # rebase: re-plan against the winner's committed state


def tail(
    cfg: ReplayConfig,
    poll_interval_s: float = 2.0,
    max_polls: int | None = None,
    idle_exit: int | None = None,
    on_epoch=None,
) -> list[EpochReport]:
    """Continuous CDC tailing (the north rule's 'binlog/WAL tail → lake
    upsert' loop): poll the change directory, replay any newly-landed
    uncommitted segments as incremental epochs, sleep when idle. Each poll
    is exactly a `replay()` call, so crash/resume semantics are identical
    to batch replay — killing a tailer and restarting it resumes from the
    committed manifest like any other run.

    Stops after `max_polls` polls or `idle_exit` CONSECUTIVE empty polls
    (None = run until the other bound; at least one must be set)."""
    import time as _time

    if max_polls is None and idle_exit is None:
        raise ValueError("tail needs max_polls or idle_exit (else it never stops)")
    all_reports: list[EpochReport] = []
    idle = 0
    polls = 0
    while True:
        reports = replay(cfg)
        polls += 1
        if reports:
            idle = 0
            all_reports.extend(reports)
            if on_epoch:
                for r in reports:
                    on_epoch(r)
        else:
            idle += 1
        if max_polls is not None and polls >= max_polls:
            break
        if idle_exit is not None and idle >= idle_exit:
            break
        _time.sleep(poll_interval_s)
    return all_reports
