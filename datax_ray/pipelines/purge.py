"""Key purge — right-to-be-forgotten for the lake (GDPR Art. 17 shape).

DataX has no notion of retroactive deletion (offline one-shot sync,
SURVEY.md §3.1); a CDC lake MUST have one: the mandate to remove a
subject's data is retroactive, while the change stream only moves forward.
This is the Delta Lake / Hudi "delete + compact + vacuum" pattern,
re-expressed over this engine's fragment-delta layout:

Phase 1 — logical purge (always; O(purged keys), never O(lake)):
  * The manifest's hash layout prunes the range plan to only ranges that
    can hold the purged conv_ids (same pruning as the keyed point lookup;
    salted layouts scan all ranges but still filter rows exactly).
  * One map task per candidate range merge-reads ONLY the purged keys'
    current winners and writes a TOMBSTONE fragment: payload columns null,
    ts = the stored winner's ts, _lsn = winner's _lsn + 1 + 2^62 — it
    defeats the stored row in the LWW order while still losing to any
    genuinely newer source event (any ts above the winner's wins
    regardless of lsn; new data after a purge is new data — purge cannot
    and should not fence the future). The 2^62 offset puts synthetic
    lsns in a RESERVED space disjoint from real log positions: without
    it, a real future event could land on exactly (winner_ts,
    winner_lsn+1) — a same-microsecond update whose lsn happens to be
    next — producing an exact (ts, lsn) tie that the merge would break
    arbitrarily by file order while the preimage feed's strict
    comparison calls it a loss, silently diverging the two.
  * One atomic manifest commit. The manifest lsn_hi is NOT advanced:
    purge lsns are per-key synthetic, not log positions, and bumping the
    watermark would make the replay dedup filter drop a real future event.

  Because tombstone fragments are ordinary change records, every
  downstream contract holds for free: live reads drop the rows at merge
  time, the change feed emits them as `_deleted` rows (consumers fold the
  deletion incrementally), and the SQL mirror deletes them on its next
  incremental sync.

Phase 2 — hard purge (`hard=True`): physically remove the payload bytes.
  * Force-compact exactly the candidate ranges: compaction keeps only LWW
    winners, and every purged key's winner is now a null-payload
    tombstone, so the fresh bases contain no purged payload. (Tombstones
    themselves survive compaction BY DESIGN — stages/merge.py — so a late
    stale event cannot resurrect a purged row; only the key strings
    remain, not the content.)
  * `Manifest.vacuum(keep_epochs)` then deletes the historical files that
    still held the payload. Time travel to pre-purge epochs subsequently
    raises (existing vacuum semantics) — which is precisely what a
    forget-request requires.
  * Dead-letter files are scrubbed too: rejected dirty rows carry the raw
    payload, so each `_deadletter/**.parquet` holding a purged key is
    atomically rewritten with that key's payload columns nulled (the row
    and its reject reason survive — dirty accounting stays intact, only
    the content goes). One map task per file; at scale dead-letter volume
    is O(errorLimit fraction) of the stream, so this is the same
    distributed shape as the tombstone phase.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray
import ray.data

from datax_ray.schemas import DELETED_COL, LSN_COL, schema_from_json, schema_to_json
from datax_ray.stages.delta import FRAG_LINEAGE_SCHEMA, write_fragment
from datax_ray.stages.partitioning import part_ids_for
from datax_ray.state.manifest import Manifest


# Synthetic (purge) lsns live above real log positions — see module
# docstring for why an exact (ts, lsn) collision with a real event must
# be impossible. Real lsns are log offsets, far below 2^62.
_SYNTH_LSN_BASE = 1 << 62


def bump_synthetic_lsn(lsn: "pa.ChunkedArray | pa.Array") -> pa.Array:
    """Dominating synthetic lsn, overflow-safe for winners that are
    ALREADY synthetic (a backfill rewrite then a purge of the same key, or
    repeated backfills): real lsns jump into the reserved space, reserved
    ones step within it."""
    if isinstance(lsn, pa.ChunkedArray):
        lsn = lsn.combine_chunks()
    return pc.if_else(
        pc.less(lsn, _SYNTH_LSN_BASE),
        pc.add(lsn, _SYNTH_LSN_BASE + 1),
        pc.add(lsn, 1),
    )


class PurgeTombstoner:
    """Map task over range-plan items: merge-read the purged keys' current
    winners in one range, emit a dominating tombstone fragment for the
    still-live ones. The purge keyset is broadcast via ray.put (fetched
    once per worker, zero-copy plasma after that — never re-shipped per
    task)."""

    def __init__(
        self,
        lake_dir: str,
        epoch: int,
        schema_json,
        num_partitions: int,
        salt_turn_width: int | None,
        parts_per_range: int,
        conv_ids_ref,
        before_us: int | None = None,
    ):
        self.__name__ = "PurgeTombstoner"
        self.lake_dir = lake_dir
        self.epoch = epoch
        self.schema_json = schema_json
        self.num_partitions = num_partitions
        self.salt_turn_width = salt_turn_width
        self.parts_per_range = parts_per_range
        self.conv_ids_ref = conv_ids_ref
        self.before_us = before_us

    def __call__(self, batch: pa.Table) -> pa.Table:
        from datax_ray.sinks.lake import _merge_read_range

        conv_ids: list[str] | None = (
            ray.get(self.conv_ids_ref) if self.conv_ids_ref is not None else None
        )
        schema = schema_from_json(self.schema_json)
        out_rows = []
        for item in batch.to_pylist():
            rid = int(item["range_id"])
            state = _merge_read_range(
                self.lake_dir,
                list(item["files"]),
                self.schema_json,
                include_internal=True,
                conv_ids=conv_ids,
                keep_tombstones=True,
            )
            live = state.filter(
                pc.fill_null(pc.invert(state[DELETED_COL]), True)
            )
            if self.before_us is not None:
                live = live.filter(
                    pc.less(pc.cast(live["ts"], pa.int64()), self.before_us)
                )
            if live.num_rows == 0:
                continue
            cols = {}
            for f in schema:
                if f.name == "conv_id":
                    cols[f.name] = live["conv_id"]
                elif f.name == "turn_idx":
                    cols[f.name] = live["turn_idx"]
                elif f.name == "ts":
                    cols[f.name] = live["ts"]
                elif f.name == LSN_COL:
                    cols[f.name] = bump_synthetic_lsn(live[LSN_COL])
                elif f.name == DELETED_COL:
                    cols[f.name] = pa.array(
                        np.ones(live.num_rows, dtype=bool)
                    )
                else:  # payload scrubbed to null
                    cols[f.name] = pa.nulls(live.num_rows, type=f.type)
            tomb = pa.table(cols)
            tomb = tomb.append_column(
                "part_id",
                part_ids_for(
                    tomb["conv_id"],
                    tomb["turn_idx"],
                    self.num_partitions,
                    self.salt_turn_width,
                ),
            )
            out_rows.append(
                write_fragment(tomb, self.lake_dir, rid, self.epoch)
            )
        return pa.Table.from_pylist(out_rows, schema=FRAG_LINEAGE_SCHEMA)


# Dead-letter columns that identify/classify the rejected row and must
# survive a scrub; everything else is payload and is nulled.
_DL_KEEP = {"lsn", "ts", "op", "conv_id", "turn_idx", "reason"}


def _scrub_deadletter(lake_dir: str, conv_ids: list[str]) -> int:
    """Null the payload columns of purged keys inside every dead-letter
    parquet file. Returns the number of rows scrubbed. Distributed: one
    map task per file, keyset broadcast once via ray.put; files without a
    hit are left untouched (idempotent — already-null rows don't count)."""
    from datax_ray.state.fs import fs_for

    files = [
        p for p in fs_for(lake_dir).list_prefix(
            os.path.join(lake_dir, "_deadletter")
        )
        if p.endswith(".parquet")
    ]
    if not files or not conv_ids:
        return 0
    keys_ref = ray.put(sorted(set(conv_ids)))

    def scrub(batch: pa.Table) -> pa.Table:
        keyset = pa.array(ray.get(keys_ref))
        scrubbed = []
        from datax_ray.state.fs import fs_for as _ff

        for path in batch["path"].to_pylist():
            t = pq.read_table(_ff(path).open_input(path))
            mask = pc.is_in(t["conv_id"], value_set=keyset)
            payload_cols = [c for c in t.column_names if c not in _DL_KEEP]
            dirty = pc.and_(
                mask,
                pa.array(
                    np.logical_or.reduce(
                        [pc.is_valid(t[c]).to_numpy(zero_copy_only=False)
                         for c in payload_cols]
                    )
                    if payload_cols
                    else np.zeros(t.num_rows, dtype=bool)
                ),
            )
            n = int(pc.sum(dirty).as_py() or 0)
            if n == 0:
                continue
            for c in payload_cols:
                i = t.column_names.index(c)
                t = t.set_column(
                    i, c, pc.if_else(mask, pa.nulls(t.num_rows, t[c].type), t[c])
                )
            sink = pa.BufferOutputStream()
            pq.write_table(t, sink, compression="zstd", compression_level=1)
            _ff(path).put(path, sink.getvalue())
            scrubbed.append(n)
        return pa.table({"scrubbed": pa.array(scrubbed, pa.int64())})

    out = (
        ray.data.from_items(
            [{"path": p} for p in files],
            override_num_blocks=min(len(files), 64),
        )
        .map_batches(scrub, batch_format="pyarrow", batch_size=None)
        .take_all()
    )
    return sum(int(r["scrubbed"]) for r in out)


def purge(
    lake_dir: str,
    conv_ids: list[str],
    hard: bool = False,
    keep_epochs: int = 1,
    metrics: bool = False,
) -> dict:
    """Purge every row of `conv_ids` from the committed lake. Logical by
    default (tombstone fragments, one commit); `hard=True` additionally
    force-compacts the affected ranges and vacuums history so the payload
    bytes are physically gone. Idempotent: re-running finds no live rows
    and commits nothing new."""
    from datax_ray.sinks.lake import _lookup_rids, _range_plan

    m = Manifest(lake_dir)
    committed = m.committed_epoch()
    if committed < 0:
        raise ValueError(f"no committed lake at {lake_dir}")
    layout = m.committed_layout() or {}
    schema = m.committed_schema()
    rids = _lookup_rids(layout, conv_ids, m.committed_turn_bounds())
    plan = _range_plan(lake_dir, m, only_rids=rids)
    epoch = committed + 1
    num_partitions = int(layout.get("num_partitions", 1) or 1)
    frag_ranges = int(layout.get("frag_ranges", 1) or 1)
    salt = layout.get("salt_turn_width")

    lineage: list = []
    if plan and conv_ids:
        lineage = (
            ray.data.from_items(plan, override_num_blocks=len(plan))
            .map_batches(
                PurgeTombstoner(
                    lake_dir=lake_dir,
                    epoch=epoch,
                    schema_json=schema_to_json(schema),
                    num_partitions=num_partitions,
                    salt_turn_width=int(salt) if salt else None,
                    parts_per_range=max(1, num_partitions // frag_ranges),
                    conv_ids_ref=ray.put(sorted(set(conv_ids))),
                ),
                batch_format="pyarrow",
                batch_size=None,
            )
            .take_all()
        )

    tombstoned = sum(int(r["rows"]) for r in lineage)
    result = {
        "requested_keys": len(set(conv_ids)),
        "tombstoned_rows": tombstoned,
        "epoch": None,
        "hard": hard,
    }
    if lineage:
        partitions = m.current_partitions()
        ranges = m.current_ranges()
        for r in lineage:
            rid = int(r["range_id"])
            rec = ranges.get(rid) or {
                "frags": [], "rows": 0, "lsn_hi": -1, "epochs": [],
            }
            if r["file"] in rec.get("frags", []):
                continue
            rec["frags"] = [*rec.get("frags", []), r["file"]]
            rec["rows"] = int(rec.get("rows", 0)) + int(r["rows"])
            rec["lsn_hi"] = max(int(rec.get("lsn_hi", -1)), int(r["lsn_hi"]))
            if r.get("key_bloom"):
                rec["frag_bloom"] = {
                    **rec.get("frag_bloom", {}),
                    r["file"]: r["key_bloom"],
                }
            eps = rec.get("epochs", [])
            rec["epochs"] = eps if epoch in eps else [*eps, epoch]
            ranges[rid] = rec
        m.commit(
            epoch,
            segments=[],
            # watermark intentionally unchanged — see module docstring
            lsn_hi=m.committed_lsn_hi(),
            schema=schema,
            partitions=partitions,
            ranges=ranges,
            layout=layout,
            lineage=[dict(r) for r in lineage],
            metrics={"purge": {
                "requested_keys": len(set(conv_ids)),
                "tombstoned_rows": tombstoned,
            }},
        )
        result["epoch"] = epoch

    if hard:
        from datax_ray.pipelines.replay import ReplayConfig, compact_lake

        comp = compact_lake(
            ReplayConfig(
                changes_dir="", lake_dir=lake_dir, metrics=metrics,
            ),
            only_rids={int(p["range_id"]) for p in plan},
        )
        vac = m.vacuum(keep_epochs=keep_epochs)
        result["compacted_ranges"] = comp.get("compacted_ranges", 0)
        result["files_removed"] = vac.get("files_removed", 0)
        result["manifests_removed"] = vac.get("manifests_removed", 0)
        result["deadletter_rows_scrubbed"] = _scrub_deadletter(
            lake_dir, conv_ids
        )
    return result


def retention(
    lake_dir: str,
    before_us: int,
    hard: bool = False,
    keep_epochs: int = 1,
    metrics: bool = False,
) -> dict:
    """Age-based retention (TTL): tombstone every live row whose event
    time is strictly below `before_us` — the time-policy twin of the
    keyed purge (Delta/Hudi "DELETE WHERE ts < cutoff" + compact +
    vacuum). Reuses the purge machinery end to end: the same dominating
    synthetic-LSN tombstones (so the change feed, SQL mirror and preimage
    MV all fold the deletions incrementally, and genuinely newer source
    events still win), the same single atomic manifest commit with the
    watermark intentionally unchanged, the same hard path (force-compact
    + vacuum) to physically drop the payload bytes.

    Data skipping: the manifest records per-file ts_lo/ts_hi (base
    partitions carry ts_lo; fragments carry frag_ts = [lo, hi]), so a
    range whose EVERY file has ts_lo >= cutoff provably holds no row
    older than the cutoff and is pruned from the scan — the mirror image
    of the time-slice read's ts_hi pruning. Missing stats (pre-upgrade
    manifests) degrade to scanned, never mis-pruned. Idempotent: a
    second run finds the rows already tombstoned and commits nothing —
    note idempotence re-scans (the tombstones share the winners' old
    ts), so `ranges_scanned` stays constant across re-runs."""
    from datax_ray.sinks.lake import _range_plan

    m = Manifest(lake_dir)
    committed = m.committed_epoch()
    if committed < 0:
        raise ValueError(f"no committed lake at {lake_dir}")
    layout = m.committed_layout() or {}
    schema = m.committed_schema()
    plan = _range_plan(lake_dir, m)

    # prune: a range where every file's ts_lo >= cutoff has no old rows
    file_lo: dict[str, int | None] = {}
    for prec in m.current_partitions().values():
        if prec.get("base"):
            file_lo[prec["base"]] = prec.get("ts_lo")
    for rec in m.current_ranges().values():
        for f, bounds in (rec.get("frag_ts") or {}).items():
            file_lo[f] = bounds[0] if bounds else None

    def may_hold_old(item) -> bool:
        for f in item["files"]:
            lo = file_lo.get(f)
            if lo is None or int(lo) < int(before_us):
                return True
        return False

    total_ranges = len(plan)
    plan = [p for p in plan if may_hold_old(p)]
    epoch = committed + 1
    num_partitions = int(layout.get("num_partitions", 1) or 1)
    frag_ranges = int(layout.get("frag_ranges", 1) or 1)
    salt = layout.get("salt_turn_width")

    lineage: list = []
    if plan:
        lineage = (
            ray.data.from_items(plan, override_num_blocks=len(plan))
            .map_batches(
                PurgeTombstoner(
                    lake_dir=lake_dir,
                    epoch=epoch,
                    schema_json=schema_to_json(schema),
                    num_partitions=num_partitions,
                    salt_turn_width=int(salt) if salt else None,
                    parts_per_range=max(1, num_partitions // frag_ranges),
                    conv_ids_ref=None,
                    before_us=int(before_us),
                ),
                batch_format="pyarrow",
                batch_size=None,
            )
            .take_all()
        )

    tombstoned = sum(int(r["rows"]) for r in lineage)
    result = {
        "before_us": int(before_us),
        "tombstoned_rows": tombstoned,
        "ranges_scanned": len(plan),
        "ranges_pruned": total_ranges - len(plan),
        "epoch": None,
        "hard": hard,
    }
    if lineage:
        partitions = m.current_partitions()
        ranges = m.current_ranges()
        for r in lineage:
            rid = int(r["range_id"])
            rec = ranges.get(rid) or {
                "frags": [], "rows": 0, "lsn_hi": -1, "epochs": [],
            }
            if r["file"] in rec.get("frags", []):
                continue
            rec["frags"] = [*rec.get("frags", []), r["file"]]
            rec["rows"] = int(rec.get("rows", 0)) + int(r["rows"])
            rec["lsn_hi"] = max(int(rec.get("lsn_hi", -1)), int(r["lsn_hi"]))
            if r.get("key_bloom"):
                rec["frag_bloom"] = {
                    **rec.get("frag_bloom", {}),
                    r["file"]: r["key_bloom"],
                }
            eps = rec.get("epochs", [])
            rec["epochs"] = eps if epoch in eps else [*eps, epoch]
            ranges[rid] = rec
        m.commit(
            epoch,
            segments=[],
            lsn_hi=m.committed_lsn_hi(),
            schema=schema,
            partitions=partitions,
            ranges=ranges,
            layout=layout,
            lineage=[dict(r) for r in lineage],
            metrics={"retention": {
                "before_us": int(before_us),
                "tombstoned_rows": tombstoned,
            }},
        )
        result["epoch"] = epoch

    if hard and lineage:
        from datax_ray.pipelines.replay import ReplayConfig, compact_lake

        comp = compact_lake(
            ReplayConfig(changes_dir="", lake_dir=lake_dir, metrics=metrics),
            only_rids={int(r["range_id"]) for r in lineage},
        )
        vac = m.vacuum(keep_epochs=keep_epochs)
        result["compacted_ranges"] = comp.get("compacted_ranges", 0)
        result["files_removed"] = vac.get("files_removed", 0)
        result["manifests_removed"] = vac.get("manifests_removed", 0)
    return result
