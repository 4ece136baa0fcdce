"""Bulk UPDATE / backfill — the Delta-Lake `UPDATE table SET ... WHERE ...`
verb over the fragment-delta layout: apply a dx_* transformer chain
(functions/transformers.py — the same specs the replay path and the JSON
job runner accept) to the lake's LIVE rows retroactively, committed as ONE
ordinary epoch.

Why a lake needs it: the change stream only moves forward, but curation is
retroactive — scrub PII the ingest chain missed, normalize a payload
column, re-score quality. DataX would re-run the whole offline sync; a
100 TB lake cannot.

Mechanics (the purge/retention machinery, pointed at content instead of
deletion):
  * The range plan prunes to the ranges that can hold `conv_ids` (hash
    routing + Bloom) when a keyset is given; otherwise every range scans —
    but each task still reads only its own range's winners.
  * One map task per range merge-reads the LIVE winners (optionally
    `where`-filtered post-merge), runs the fused transformer chain on the
    whole batch, pairs output to input on (conv_id, turn_idx), and keeps
    ONLY the rows the chain actually changed (null-safe column compare) —
    an idempotent chain therefore converges: the second run writes
    nothing.
  * Changed rows land as an ordinary fragment with the stored event-time
    and a DOMINATING SYNTHETIC lsn (same reserved 2^62 space as purge, and
    the same reasoning: the rewrite defeats the stored row on the (ts,
    lsn) order while any genuinely newer source event still wins — a
    backfill must never fence the future). Winners that are ALREADY
    synthetic (a second backfill over backfilled rows, or chained
    lifecycle verbs) bump by +1 INSIDE the reserved space instead of
    re-adding the base — unconditional re-adding would overflow int64.
  * One atomic manifest commit; the replay watermark is untouched
    (synthetic lsns are not log positions). Because the fragment is an
    ordinary change record, every downstream contract folds the rewrite
    incrementally for free: the preimage feed emits exact
    update_pre/postimages, mirrors/MVs/envelope exports stay consistent.

Immutability contract: the chain must not modify conv_id, turn_idx or ts
(keys and LWW event-time) — re-keying or time-shifting history would
corrupt the merge order; both are detected and rejected loudly. Chain
filters (dx_filter) restrict which rows update, composing with `where`.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from datax_ray.pipelines.purge import bump_synthetic_lsn
from datax_ray.schemas import DELETED_COL, LSN_COL, schema_from_json, schema_to_json
from datax_ray.stages.delta import FRAG_LINEAGE_SCHEMA, write_fragment
from datax_ray.stages.partitioning import part_ids_for
from datax_ray.state.manifest import Manifest

_IMMUTABLE = ("conv_id", "turn_idx", "ts")


def _null_safe_neq(a, b) -> pa.Array:
    eq = pc.fill_null(pc.equal(a, b), False)
    both_null = pc.and_(pc.is_null(a), pc.is_null(b))
    return pc.invert(pc.or_(eq, both_null))


class BackfillRewriter:
    """Map task over range-plan items: merge-read the range's live
    winners, transform, keep changed rows, write one fragment."""

    def __init__(
        self,
        lake_dir: str,
        epoch: int,
        schema_json,
        num_partitions: int,
        salt_turn_width: int | None,
        specs,
        where: dict | None,
        conv_ids_ref,
    ):
        self.__name__ = "BackfillRewriter"
        self.lake_dir = lake_dir
        self.epoch = epoch
        self.schema_json = schema_json
        self.num_partitions = num_partitions
        self.salt_turn_width = salt_turn_width
        self.specs = specs
        self.where = where
        self.conv_ids_ref = conv_ids_ref

    def __call__(self, batch: pa.Table) -> pa.Table:
        from datax_ray.functions.transformers import compile_transformers
        from datax_ray.sinks.lake import _merge_read_range

        fused = compile_transformers(self.specs)
        conv_ids = (
            ray.get(self.conv_ids_ref) if self.conv_ids_ref is not None else None
        )
        schema = schema_from_json(self.schema_json)
        payload_cols = [
            f.name
            for f in schema
            if f.name not in _IMMUTABLE and not f.name.startswith("_")
        ]
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
                where=self.where,
            )
            live = state.filter(
                pc.fill_null(pc.invert(state[DELETED_COL]), True)
            )
            if live.num_rows == 0:
                continue
            new = fused(live.drop_columns([LSN_COL, DELETED_COL]))
            if new.num_rows > live.num_rows:
                raise ValueError(
                    "backfill chain must not add rows "
                    f"({live.num_rows} in, {new.num_rows} out)"
                )
            # pair output to input on the key; a re-keyed row fails to join
            old_keyed = live.select(
                ["conv_id", "turn_idx", "ts", LSN_COL, *payload_cols]
            ).rename_columns(
                ["conv_id", "turn_idx", "_old_ts", LSN_COL,
                 *[f"_old_{c}" for c in payload_cols]]
            )
            j = new.join(
                old_keyed, keys=["conv_id", "turn_idx"], join_type="left outer"
            )
            if j[LSN_COL].null_count:
                raise ValueError(
                    "backfill chain modified conv_id/turn_idx — keys are "
                    "immutable (re-key via export + fresh ingest instead)"
                )
            if pc.any(_null_safe_neq(j["ts"], j["_old_ts"])).as_py():
                raise ValueError(
                    "backfill chain modified ts — event-time orders the "
                    "LWW merge and is immutable retroactively"
                )
            changed = pa.array(np.zeros(j.num_rows, dtype=bool))
            for c in payload_cols:
                changed = pc.or_(changed, _null_safe_neq(j[c], j[f"_old_{c}"]))
            j = j.filter(changed)
            if j.num_rows == 0:
                continue
            cols = {}
            for f in schema:
                if f.name == LSN_COL:
                    cols[f.name] = bump_synthetic_lsn(j[LSN_COL])
                elif f.name == DELETED_COL:
                    cols[f.name] = pa.array(np.zeros(j.num_rows, dtype=bool))
                else:
                    cols[f.name] = pc.cast(j[f.name], f.type)
            frag = pa.table(cols)
            frag = frag.append_column(
                "part_id",
                part_ids_for(
                    frag["conv_id"],
                    frag["turn_idx"],
                    self.num_partitions,
                    self.salt_turn_width,
                ),
            )
            out_rows.append(
                write_fragment(frag, self.lake_dir, rid, self.epoch)
            )
        return pa.Table.from_pylist(out_rows, schema=FRAG_LINEAGE_SCHEMA)


def backfill(
    lake_dir: str,
    transformers: list[dict],
    where: dict | None = None,
    conv_ids: list[str] | None = None,
) -> dict:
    """Apply the transformer chain to the lake's live rows; commit changed
    rows as one epoch. Returns {"rewritten_rows", "ranges_touched",
    "epoch"} — epoch None when the chain changed nothing (idempotent
    convergence)."""
    from datax_ray.sinks.lake import _lookup_rids, _range_plan

    if not transformers:
        raise ValueError("backfill needs a non-empty transformer chain")
    m = Manifest(lake_dir)
    committed = m.committed_epoch()
    if committed < 0:
        raise ValueError(f"no committed lake at {lake_dir}")
    layout = m.committed_layout() or {}
    schema = m.committed_schema()
    rids = (
        _lookup_rids(layout, conv_ids, m.committed_turn_bounds())
        if conv_ids
        else None
    )
    plan = _range_plan(lake_dir, m, only_rids=rids)
    epoch = committed + 1
    num_partitions = int(layout.get("num_partitions", 1) or 1)
    salt = layout.get("salt_turn_width")

    lineage: list = []
    if plan:
        lineage = (
            ray.data.from_items(plan, override_num_blocks=len(plan))
            .map_batches(
                BackfillRewriter(
                    lake_dir=lake_dir,
                    epoch=epoch,
                    schema_json=schema_to_json(schema),
                    num_partitions=num_partitions,
                    salt_turn_width=int(salt) if salt else None,
                    specs=transformers,
                    where=where,
                    conv_ids_ref=ray.put(sorted(set(conv_ids)))
                    if conv_ids
                    else None,
                ),
                batch_format="pyarrow",
                batch_size=None,
            )
            .take_all()
        )

    rewritten = sum(int(r["rows"]) for r in lineage)
    result = {
        "rewritten_rows": rewritten,
        "ranges_touched": len(lineage),
        "epoch": None,
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
            # watermark untouched: synthetic lsns are not log positions
            lsn_hi=m.committed_lsn_hi(),
            schema=schema,
            partitions=partitions,
            ranges=ranges,
            layout=layout,
            lineage=[dict(r) for r in lineage],
            metrics={"backfill": {
                "rewritten_rows": rewritten,
                "transformers": [s.get("name") for s in transformers],
            }},
        )
        result["epoch"] = epoch
    return result
