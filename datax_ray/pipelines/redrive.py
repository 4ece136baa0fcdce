"""Dead-letter redrive — repair-and-reingest for dirty records.

Every replay/bootstrap epoch spills its invalid change rows (with a
`reason` column) to `<lake>/_deadletter/epoch=NNNNNN/dl-<contenthash>.parquet`
(stages/normalize.py:_spill_dirty). This module closes the loop — the DLQ
redrive pattern of Kafka Connect / SQS, reframed Ray-Data-first:

    pending dl files → read_parquet → [fix transformer chain]
      → map_batches(Normalizer, watermark=-1)   # RE-validate; still-bad
                                                # rows re-dead-letter into
                                                # THIS epoch's dl dir
      → map_batches(DeltaWriter)                # standard LWW fragment path
      → ONE manifest commit, consuming the dl files exactly-once.

Key semantics:
  * The fix chain (same dx_*/udf spec grammar as replay transformers,
    functions/transformers.py) is ALLOWED to touch routing/ordering
    columns — repairing a corrupt turn_idx or op is the whole point. It
    runs BEFORE validation, and sees the `reason` column.
  * Redriven rows keep their original (ts, lsn), so the LWW merge puts
    them exactly where the event stream would have: a repaired row loses
    to any newer committed version of its key and wins over older ones.
    Correctness needs no replay-order coupling — only the (ts, lsn) total
    order, which the fix must not fabricate above the committed watermark.
  * The watermark filter is BYPASSED (watermark_lsn=-1): dead-lettered
    rows always carry lsns at or below the committed watermark (their
    source epoch committed), and they never reached the lake, so they are
    not replays. The commit keeps lsn_hi unchanged.
  * Exactly-once: each consumed dl file is recorded in the manifest's
    committed-segment set under a collision-free token
    `epoch=NNNNNN__dl-<hash>.parquet`; a re-run finds nothing pending and
    reports up-to-date. Rows that STILL fail validation re-spill into the
    redrive epoch's own dl dir (content-hash names, idempotent under task
    retry) and become the next redrive's input — run it again after a
    better fix.

Scale shape: map-only end to end (no all-to-all), identical to the replay
path; dl volume is the dirty fraction of the stream, so this is the cheap
tail of ingest. Never calls ray.init (driver contract).
"""

from __future__ import annotations

import os
import time

import pyarrow as pa
import ray
import ray.data

from datax_ray.schemas import CHANGES_SCHEMA, LAKE_SCHEMA, schema_to_json
from datax_ray.stages.delta import DeltaWriter
from datax_ray.stages.normalize import Normalizer
from datax_ray.state.manifest import Manifest
from datax_ray.state.metrics import get_metrics_actor, total_dirty

from .replay import ReplayConfig


def _dl_token(path: str) -> str:
    """Manifest segment token for a dead-letter file: includes the source
    epoch dir so identical dirty content spilled by two epochs (same
    content-hash basename) consumes independently. Slash-free, so it
    round-trips through Manifest.commit's basename normalization."""
    return f"{os.path.basename(os.path.dirname(path))}__{os.path.basename(path)}"


def pending_deadletters(lake_dir: str, manifest: Manifest) -> list[str]:
    """Dead-letter files not yet consumed by a committed redrive epoch."""
    from datax_ray.state.fs import fs_for

    committed = manifest.committed_segments()
    paths = [
        p for p in fs_for(lake_dir).list_prefix(
            os.path.join(lake_dir, "_deadletter")
        )
        if os.path.basename(p).startswith("dl-") and p.endswith(".parquet")
        and os.path.basename(os.path.dirname(p)).startswith("epoch=")
    ]
    return [p for p in paths if _dl_token(p) not in committed]


def redrive(cfg: ReplayConfig, fix_transformers: list[dict] | None = None) -> dict:
    """Reprocess all pending dead-letter files through the standard
    normalize → LWW-merge epoch path, optionally repairing them first.
    Returns a report dict; {"status": "up-to-date"} when nothing pends."""
    t0 = time.perf_counter()
    manifest = Manifest(cfg.lake_dir)
    if manifest.committed_epoch() < 0:
        return {"status": "empty lake (nothing ever replayed)", "epochs": 0}
    pending = pending_deadletters(cfg.lake_dir, manifest)
    if not pending:
        return {"status": "up-to-date (no pending dead-letter files)", "epochs": 0}

    epoch = manifest.committed_epoch() + 1
    schema = manifest.committed_schema() or LAKE_SCHEMA
    schema_json = schema_to_json(schema)
    layout = manifest.committed_layout() or {
        "num_partitions": cfg.num_partitions,
        "frag_ranges": min(cfg.frag_ranges, cfg.num_partitions),
        "salt_turn_width": cfg.salt_turn_width,
    }
    num_partitions = int(layout["num_partitions"])
    frag_ranges = int(layout["frag_ranges"])
    salt_turn_width = layout.get("salt_turn_width")
    salt_turn_width = int(salt_turn_width) if salt_turn_width is not None else None

    metrics = get_metrics_actor() if cfg.metrics else None
    if metrics is not None:
        ray.get(metrics.reset.remote())

    def align(t: pa.Table) -> pa.Table:
        """Null-fill CHANGES columns a dl file predates (schema evolution
        added them later) and fix column order, so blocks from different
        source epochs coalesce — same contract as read_segments' canon."""
        cols = {}
        for f in CHANGES_SCHEMA:
            if t.schema.get_field_index(f.name) == -1:
                cols[f.name] = pa.nulls(t.num_rows, f.type)
            else:
                cols[f.name] = t[f.name]
        for name in t.column_names:
            if name not in cols:
                cols[name] = t[name]
        return pa.table(cols)

    from datax_ray.state.fs import fs_for, is_remote

    if is_remote(cfg.lake_dir):
        # object-store lake: dl files are objects — read them inside map
        # tasks via the storage contract (ray.data.read_parquet wants
        # registered filesystems; one file per task matches dl sizing)
        import pyarrow.parquet as _pq

        def _read_dl(t: pa.Table) -> pa.Table:
            tabs = [
                _pq.read_table(fs_for(p).open_input(p))
                for p in t["path"].to_pylist()
            ]
            return pa.concat_tables(tabs, promote_options="permissive")

        ds = ray.data.from_items(
            [{"path": p} for p in pending], override_num_blocks=len(pending)
        ).map_batches(_read_dl, batch_format="pyarrow")
    else:
        ds = ray.data.read_parquet(pending)
    ds = ds.map_batches(
        align, batch_format="pyarrow", zero_copy_batch=True
    )
    if fix_transformers:
        from datax_ray.functions.transformers import compile_transformers

        # Unlike replay transformers, the fix chain MAY touch routing /
        # ordering columns — that is how a corrupt key gets repaired.
        ds = ds.map_batches(
            compile_transformers(fix_transformers),
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=cfg.batch_size,
        )

    def drop_reason(t: pa.Table) -> pa.Table:
        # The spill path appends a fresh `reason`; carrying the old one in
        # would duplicate the column name on re-spill.
        i = t.schema.get_field_index("reason")
        return t.remove_column(i) if i != -1 else t

    lineage = (
        ds.map_batches(drop_reason, batch_format="pyarrow", zero_copy_batch=True)
        .map_batches(
            Normalizer(
                target_schema_json=schema_json,
                num_partitions=num_partitions,
                watermark_lsn=-1,  # dl lsns precede the watermark by design
                salt_turn_width=salt_turn_width,
                deadletter_dir=f"{cfg.lake_dir}/_deadletter/epoch={epoch:06d}",
                metrics=cfg.metrics,
                expectations=cfg.expectations,
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=cfg.batch_size,
        )
        .map_batches(
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
        )
        .take_all()
    )

    snap = ray.get(metrics.snapshot.remote()) if metrics is not None else {}
    still_dirty = total_dirty(snap)
    rows_in = int(snap.get("normalize", {}).get("rows_in", 0))

    partitions = manifest.current_partitions()
    ranges = manifest.current_ranges()
    for r in lineage:
        rid = int(r["range_id"])
        rec = ranges.get(rid) or {"frags": [], "rows": 0, "lsn_hi": -1, "epochs": []}
        if r["file"] in rec.get("frags", []):
            continue
        rec["frags"] = [*rec.get("frags", []), r["file"]]
        rec["rows"] = int(rec.get("rows", 0)) + int(r["rows"])
        rec["lsn_hi"] = max(int(rec.get("lsn_hi", -1)), int(r["lsn_hi"]))
        if r.get("ts_lo") is not None or r.get("ts_hi") is not None:
            rec["frag_ts"] = {
                **rec.get("frag_ts", {}),
                r["file"]: [r.get("ts_lo"), r.get("ts_hi")],
            }
        if r.get("key_bloom"):
            rec["frag_bloom"] = {
                **rec.get("frag_bloom", {}),
                r["file"]: r["key_bloom"],
            }
        eps = rec.get("epochs", [])
        if epoch not in eps:
            eps = [*eps, epoch]
        rec["epochs"] = eps
        ranges[rid] = rec

    manifest.commit(
        epoch,
        segments=[_dl_token(p) for p in pending],
        lsn_hi=manifest.committed_lsn_hi(),  # redrive never advances it
        schema=schema,
        partitions=partitions,
        ranges=ranges,
        layout=layout,
        lineage=[dict(r) for r in lineage],
        metrics=snap,
    )
    return {
        "epoch": epoch,
        "files_consumed": len(pending),
        "events_in": rows_in,
        "rows_applied": sum(int(r["rows"]) for r in lineage),
        "still_dirty": still_dirty,
        "wall_s": round(time.perf_counter() - t0, 3),
    }
