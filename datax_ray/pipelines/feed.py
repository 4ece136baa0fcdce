"""Change data feed — the lake as a CDC *source* (Delta's table_changes /
Hudi's incremental query, over this engine's epoch lineage): every change
row the engine committed in epochs (from_epoch, to_epoch], streamed as a
Dataset, without replaying the upstream log.

What a feed row is: fragments are the engine's durable change records —
each is the LWW-reduced net effect of one (range, epoch, batch) slice of
the upstream stream, carrying payload columns plus `_lsn` (winning LSN)
and `_deleted` (tombstone). The feed enumerates exactly the fragment
files first referenced by each epoch's manifest (manifest diffing — an
O(ranges) driver plan, no storage reads), tags rows with `_epoch`, and
unifies pre-DDL schemas to the target epoch's. Compaction bases are
EXCLUDED (compaction rewrites state, it does not change it); epoch-0
bootstrap bases are included (the snapshot IS an insert stream).

Correctness contract (pytest-verified): LWW-folding the feed (A, B] onto
the lake state AS OF A reproduces the lake state AS OF B row-for-row —
i.e. the feed is a complete, sufficient delta. Downstream consumers
(mirrors, MVs, search indexes) can therefore stay fresh reading only
O(changed bytes) per sync.

Availability window = manifest retention: `vacuum` trims history, and a
feed reaching past it raises (never silently under-delivers) — same rule
as time-travel reads.
"""

from __future__ import annotations

import json
import os

import pyarrow as pa

import ray.data

from datax_ray.state.manifest import Manifest

_EPOCH_COL = "_epoch"


def _exact_records(m: Manifest, epochs: list[int]) -> dict[int, dict]:
    by_epoch = dict(m._epoch_files())
    missing = [e for e in epochs if e not in by_epoch]
    if missing:
        raise ValueError(
            f"change feed needs the manifest record of epoch(s) {missing}, "
            "which were never committed or were dropped by vacuum — the "
            "feed window cannot reach past retention"
        )
    out = {}
    for e in epochs:
        with open(by_epoch[e]) as f:
            out[e] = json.load(f)
    return out


def _frag_set(rec: dict | None) -> set[str]:
    if not rec:
        return set()
    files: set[str] = set()
    for r in rec.get("ranges", {}).values():
        files.update(r.get("frags", []))
    return files


def plan_change_feed(
    lake_dir: str, from_epoch: int, to_epoch: int | None = None
) -> list[dict]:
    """[{epoch, file}] for every change file first committed in
    (from_epoch, to_epoch]. from_epoch=-1 means 'since the beginning'."""
    m = Manifest(lake_dir)
    committed = m.committed_epoch()
    to_epoch = committed if to_epoch is None else to_epoch
    if to_epoch > committed:
        raise ValueError(f"to_epoch {to_epoch} > committed epoch {committed}")
    if from_epoch >= to_epoch:
        return []
    need = [e for e in range(max(from_epoch, 0), to_epoch + 1)]
    recs = _exact_records(m, need)
    plan: list[dict] = []
    for e in range(from_epoch + 1, to_epoch + 1):
        prev = recs.get(e - 1)
        new_frags = sorted(_frag_set(recs[e]) - _frag_set(prev))
        plan.extend({"epoch": e, "file": f} for f in new_frags)
        if e == 0:
            # bootstrap snapshot: epoch-0 partition bases are insert rows
            bases = sorted(
                p["base"]
                for p in recs[0].get("partitions", {}).values()
                if p.get("base")
            )
            plan.extend({"epoch": 0, "file": f} for f in bases)
    return plan


class _FeedReader:
    """Per-file read + schema-unify + epoch tag (callable class: the
    target-schema tracker builds once per worker, not per file)."""

    def __init__(self, lake_dir: str, schema_json):
        from datax_ray.schemas import schema_from_json
        from datax_ray.state.schema_tracker import SchemaTracker

        self._lake_dir = lake_dir
        target = schema_from_json(schema_json)
        self._tracker = SchemaTracker(target)
        self._empty = target.append(pa.field(_EPOCH_COL, pa.int32())).empty_table()

    def __call__(self, t: pa.Table) -> pa.Table:
        import pyarrow.parquet as pq

        out = []
        for row in t.to_pylist():
            tbl = self._tracker.unify(
                pq.read_table(os.path.join(self._lake_dir, row["file"]))
            )
            out.append(
                tbl.append_column(
                    _EPOCH_COL,
                    pa.array([int(row["epoch"])] * tbl.num_rows, pa.int32()),
                )
            )
        return pa.concat_tables(out) if out else self._empty


def read_change_feed(
    lake_dir: str, from_epoch: int, to_epoch: int | None = None
) -> ray.data.Dataset:
    """The committed change rows of epochs (from_epoch, to_epoch] as a
    streaming Dataset: payload columns + `_lsn`, `_deleted`, `_epoch`.
    One read task per change file; the plan is manifest-only."""
    from datax_ray.schemas import schema_to_json
    from datax_ray.sinks.lake import lake_schema

    plan = plan_change_feed(lake_dir, from_epoch, to_epoch)
    schema = lake_schema(lake_dir, to_epoch)
    feed_schema = schema.append(pa.field(_EPOCH_COL, pa.int32()))
    if not plan:
        return ray.data.from_arrow(feed_schema.empty_table())
    return ray.data.from_items(plan, override_num_blocks=len(plan)).map_batches(
        _FeedReader,
        fn_constructor_args=(lake_dir, schema_to_json(schema)),
        batch_format="pyarrow",
        batch_size=4,
        concurrency=min(8, len(plan)),
    )
