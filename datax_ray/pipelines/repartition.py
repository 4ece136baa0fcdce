"""Online lake repartition — layout migration as one committed epoch.

The partition/range layout is frozen at epoch 0 (pipelines/replay.py:95)
because rows must never silently shift across files between epochs. But a
long-lived lake eventually NEEDS a different layout: the data outgrew
`num_partitions` (compaction tasks no longer fit a worker: the sizing rule
in stages/delta.py says num_partitions ~ lake_bytes / 256 MB), a hot key
appeared (add `salt_turn_width`), or the hot key cooled (drop the salt to
re-enable the manifest's point-lookup pruning, sinks/lake.py:_lookup_rids).
Delta/Iceberg solve this with "rewrite with a new partition spec"; this is
that operation for the fragment-delta layout:

  1. One map task per OLD range merge-reads its full state — LWW winners
     AND tombstones (tombstones must survive the migration or a late stale
     event could resurrect a deleted/purged row in the new layout) — and
     re-routes every row through `part_ids_for` under the NEW layout,
     writing one content-hash fragment per NEW range it hits. This is the
     engine's usual "shuffle via storage" (stages/delta.py): an inherent
     all-to-all expressed as map-only tasks + files, no in-memory exchange.
  2. ONE atomic manifest commit flips layout + file references together:
     epoch N reads old-layout bases/frags, epoch N+1 reads only the new
     fragments. A crash before the commit leaves only unreferenced
     content-hash files (a retry rewrites identical bytes); there is no
     intermediate state a reader can observe.
  3. An optional forced compaction (on by default) immediately folds the
     new fragments into per-partition bases; old-layout files remain
     available for time travel until `vacuum`.

Subsequent `replay()` calls adopt the new layout automatically — the
committed layout always wins over cfg on resume — so the migration is
transparent to the ingest path, the change feed (layout epochs reference
only rewritten rows; consumers already tolerate compaction epochs), the
SQL mirror (range fingerprints change, full resync of content-identical
rows), and point lookups (pruning keys off the NEW layout).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

import ray
import ray.data

from datax_ray.schemas import schema_to_json
from datax_ray.stages.delta import FRAG_LINEAGE_SCHEMA, write_fragment
from datax_ray.stages.partitioning import part_ids_for
from datax_ray.state.manifest import Manifest


class RepartitionWriter:
    """Map task over old-range plan items: merge-read one old range (with
    tombstones), re-route rows under the new layout, write one fragment
    per new range. Same content-hash/atomic-rename discipline as
    DeltaWriter, so at-least-once execution stays exactly-once."""

    def __init__(
        self,
        lake_dir: str,
        epoch: int,
        schema_json,
        num_partitions: int,
        frag_ranges: int,
        salt_turn_width: int | None,
    ):
        self.__name__ = "RepartitionWriter"
        self.lake_dir = lake_dir
        self.epoch = epoch
        self.schema_json = schema_json
        self.num_partitions = num_partitions
        self.parts_per_range = max(1, num_partitions // frag_ranges)
        self.salt_turn_width = salt_turn_width

    def __call__(self, batch: pa.Table) -> pa.Table:
        from datax_ray.sinks.lake import _merge_read_range

        out_rows = []
        for item in batch.to_pylist():
            state = _merge_read_range(
                self.lake_dir,
                list(item["files"]),
                self.schema_json,
                include_internal=True,
                keep_tombstones=True,
            )
            if state.num_rows == 0:
                continue
            pid = part_ids_for(
                state["conv_id"],
                state["turn_idx"],
                self.num_partitions,
                self.salt_turn_width,
            )
            state = state.append_column("part_id", pid)
            rid_np = (
                pid.to_numpy(zero_copy_only=False) // self.parts_per_range
            ).astype(np.int32)
            order = np.argsort(rid_np, kind="stable")
            state = state.take(pa.array(order))
            rid_sorted = rid_np[order]
            bounds = np.flatnonzero(
                np.r_[True, rid_sorted[1:] != rid_sorted[:-1]]
            )
            bounds = np.r_[bounds, len(rid_sorted)]
            for i in range(len(bounds) - 1):
                lo, hi = int(bounds[i]), int(bounds[i + 1])
                rid = int(rid_sorted[lo])
                row = write_fragment(
                    state.slice(lo, hi - lo), self.lake_dir, rid, self.epoch
                )
                row["events_applied"] = 0  # migration moves, not applies
                out_rows.append(row)
        return pa.Table.from_pylist(out_rows, schema=FRAG_LINEAGE_SCHEMA)


def repartition_lake(
    lake_dir: str,
    num_partitions: int,
    frag_ranges: int | None = None,
    salt_turn_width: int | None = None,
    compact: bool = True,
) -> dict:
    """Migrate the committed lake to a new {num_partitions, frag_ranges,
    salt_turn_width} layout in one atomic epoch (see module docstring).
    No-op (changed=False) when the requested layout equals the committed
    one — which also makes a crashed-then-retried migration idempotent."""
    m = Manifest(lake_dir)
    committed = m.committed_epoch()
    if committed < 0:
        raise ValueError(f"no committed lake at {lake_dir}")
    old = m.committed_layout() or {}
    new_layout = {
        "num_partitions": int(num_partitions),
        "frag_ranges": min(
            int(frag_ranges if frag_ranges is not None
                else old.get("frag_ranges", num_partitions)),
            int(num_partitions),
        ),
        "salt_turn_width": (
            int(salt_turn_width) if salt_turn_width else None
        ),
    }
    old_norm = {
        "num_partitions": int(old.get("num_partitions", 0) or 0),
        "frag_ranges": int(old.get("frag_ranges", 0) or 0),
        "salt_turn_width": (
            int(old["salt_turn_width"]) if old.get("salt_turn_width") else None
        ),
    }
    if new_layout == old_norm:
        return {"changed": False, "epoch": None, "layout": new_layout}

    from datax_ray.sinks.lake import _range_plan

    schema = m.committed_schema()
    plan = _range_plan(lake_dir, m)
    epoch = committed + 1
    lineage: list = []
    if plan:
        lineage = (
            ray.data.from_items(plan, override_num_blocks=len(plan))
            .map_batches(
                RepartitionWriter(
                    lake_dir=lake_dir,
                    epoch=epoch,
                    schema_json=schema_to_json(schema),
                    num_partitions=new_layout["num_partitions"],
                    frag_ranges=new_layout["frag_ranges"],
                    salt_turn_width=new_layout["salt_turn_width"],
                ),
                batch_format="pyarrow",
                batch_size=None,
            )
            .take_all()
        )

    ranges: dict[int, dict] = {}
    for r in lineage:
        rid = int(r["range_id"])
        rec = ranges.setdefault(
            rid, {"frags": [], "rows": 0, "lsn_hi": -1, "epochs": [epoch]}
        )
        if r["file"] in rec["frags"]:
            continue
        rec["frags"].append(r["file"])
        rec["rows"] += int(r["rows"])
        rec["lsn_hi"] = max(rec["lsn_hi"], int(r["lsn_hi"]))
        if r.get("key_bloom"):
            rec["frag_bloom"] = {
                **rec.get("frag_bloom", {}),
                r["file"]: r["key_bloom"],
            }

    m.commit(
        epoch,
        segments=[],
        lsn_hi=m.committed_lsn_hi(),
        schema=schema,
        partitions={},  # all state lives in the new fragments until compaction
        ranges=ranges,
        layout=new_layout,
        lineage=[dict(r) for r in lineage],
        metrics={"repartition": {
            "from": old_norm, "to": new_layout,
            "rows_moved": sum(int(r["rows"]) for r in lineage),
        }},
    )
    result = {
        "changed": True,
        "epoch": epoch,
        "layout": new_layout,
        "rows_moved": sum(int(r["rows"]) for r in lineage),
        "new_ranges": len(ranges),
    }
    if compact:
        from datax_ray.pipelines.replay import ReplayConfig, compact_lake

        comp = compact_lake(
            ReplayConfig(changes_dir="", lake_dir=lake_dir, metrics=False)
        )
        result["compacted_ranges"] = comp.get("compacted_ranges", 0)
    return result
