"""MERGE INTO — the Delta-Lake/Iceberg conditional snapshot merge verb
over the fragment-delta layout: fold a keyed SOURCE table (a parquet
snapshot, not a change log) into the lake's live rows in ONE ordinary
epoch, with per-clause conditions:

    WHEN MATCHED     [AND cond]  THEN UPDATE (source payload wins) | DELETE
    WHEN NOT MATCHED [AND cond]  THEN INSERT

Why a CDC lake still needs it: the change stream carries the *log*, but
reference/dimension corrections arrive as *state* — a curated snapshot, a
vendor re-delivery, a human-edited correction table. DataX would model
this as a full re-sync; MERGE ships O(source rows), touching only the
ranges their keys hash into.

Mechanics (the backfill/purge machinery, driven by a distributed source):
  * The source Dataset maps to range ids with the writer's own hash
    (stages/partitioning.part_ids_for — exact per-row even under salted
    layouts, since MERGE knows both key columns), then ONE
    groupby(range_id).map_groups task per touched range: untouched ranges
    never read, and inside a touched range `_merge_read_range` point-reads
    only the group's conv_ids (Bloom + row-group pruning as for lookups).
  * MATCHED = the key has a LIVE winner. Updates take the SOURCE's payload
    columns (a source may carry a payload subset; absent columns keep the
    stored value), keep the stored event-time, and dominate via the
    reserved synthetic-lsn space (purge.bump_synthetic_lsn) — exactly the
    backfill reasoning: a retroactive state edit must defeat the stored
    row on (ts, lsn) while a genuinely newer log event still wins.
    Value-unchanged rows are dropped (null-safe compare), so a re-run of
    the same MERGE converges to a no-op epoch=None.
  * A TOMBSTONED key counts as NOT MATCHED (Delta semantics: deleted rows
    don't match). An insert over a tombstone must dominate it, so its
    stored event-time becomes max(source ts, tombstone ts) and its lsn
    bumps the tombstone's — re-inserting a purged key is visible
    immediately, while the "newer log event wins" rule is preserved for
    any event with ts beyond the tombstone's. Fresh keys insert at the
    source ts with a base reserved lsn.
  * Conditions are AND-ed [col, op, value] triples (ops: > < >= <= = !=
    like not_like — dx_filter's operator set, null ⇒ false). In
    `matched_cond`, a bare column names the TARGET value and `src_<col>`
    the source value; in `not_matched_cond` bare columns name the SOURCE
    row (no target exists).
  * One fragment per touched range, one atomic manifest commit, replay
    watermark untouched (synthetic lsns are not log positions). Because
    the fragment is an ordinary change record, the change feed, SQL
    mirror, envelope export and every MV fold the merge incrementally.

Loud refusals (tested): duplicate (conv_id, turn_idx) keys in the source
(Delta's multiple-matches error), source columns unknown to the committed
schema (evolve first: `alter`/--auto-ddl), null keys, and inserts without
a source `ts` column.
"""

from __future__ import annotations

import glob
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from datax_ray.functions.transformers import _FILTER_KERNELS
from datax_ray.pipelines.purge import _SYNTH_LSN_BASE, bump_synthetic_lsn
from datax_ray.schemas import DELETED_COL, LSN_COL, schema_from_json, schema_to_json
from datax_ray.stages.delta import FRAG_LINEAGE_SCHEMA, write_fragment
from datax_ray.stages.partitioning import part_ids_for
from datax_ray.state.manifest import Manifest

_KEYS = ("conv_id", "turn_idx")


def _cond_mask(t: pa.Table, cond: list | None) -> pa.Array:
    """AND-fold [col, op, value] triples into a boolean mask (null ⇒
    False, dx_filter semantics). Missing column ⇒ loud KeyError."""
    mask = pa.array(np.ones(t.num_rows, dtype=bool))
    for triple in cond or []:
        col, op, value = triple
        if col not in t.column_names:
            raise KeyError(
                f"merge condition references unknown column {col!r} "
                f"(have {t.column_names})"
            )
        if op in _FILTER_KERNELS:
            m = _FILTER_KERNELS[op](t[col], value)
        elif op in ("like", "not_like"):
            import re

            regex = "^" + ".*".join(re.escape(p) for p in str(value).split("%")) + "$"
            m = pc.match_substring_regex(t[col], regex)
            if op == "not_like":
                m = pc.invert(m)
        else:
            raise ValueError(f"unsupported merge condition op: {op!r}")
        mask = pc.and_(mask, pc.fill_null(m, False))
    return mask


def _null_safe_neq(a, b) -> pa.Array:
    eq = pc.fill_null(pc.equal(a, b), False)
    both_null = pc.and_(pc.is_null(a), pc.is_null(b))
    return pc.invert(pc.or_(eq, both_null))


def enforce_expectations(frag: pa.Table, specs: list[dict], verb: str) -> None:
    """Lake-pinned CHECK constraints (alter --expectations) gate
    state-edit verbs too — but ABORT instead of dead-lettering: a
    snapshot merge is interactive, so the caller fixes the snapshot
    rather than mining a DLQ. Tombstones are exempt (the same op=delete
    rule the ingest path applies). Raises before anything commits."""
    from datax_ray.validation import compile_expectations

    view = frag.append_column(
        "op",
        pc.if_else(
            pc.fill_null(frag[DELETED_COL], False),
            pa.scalar("delete", pa.string()),
            pa.scalar("insert", pa.string()),
        ),
    )
    mask, reason = compile_expectations(specs)(view)
    bad = pc.invert(mask)
    n_bad = int(pc.sum(pc.cast(bad, pa.int64())).as_py() or 0)
    if n_bad:
        ex = view.filter(bad)
        first = reason.filter(bad)[0].as_py()
        raise ValueError(
            f"{verb} violates {n_bad} lake expectation(s) "
            f"(first: {first!r} at key ({ex['conv_id'][0].as_py()!r}, "
            f"{ex['turn_idx'][0].as_py()})) — fix the source or relax "
            f"`alter --expectations`; nothing was committed"
        )


class MergeApplier:
    """map_groups task over one range's source rows: point-read the
    range's current winners for the group's conv_ids, classify each
    source row matched/tombstoned/fresh, emit ONE fragment of dominating
    change rows. The {rid: files} plan is ray.put once and fetched per
    actor, never re-shipped per group."""

    def __init__(
        self,
        lake_dir: str,
        epoch: int,
        schema_json,
        num_partitions: int,
        salt_turn_width: int | None,
        plan_ref,
        when_matched: str,
        when_not_matched: str,
        matched_cond: list | None,
        not_matched_cond: list | None,
        src_payload: list[str],
        src_has_ts: bool,
        expectations: list[dict] | None = None,
        dry_run: bool = False,
    ):
        self.lake_dir = lake_dir
        self.epoch = epoch
        self.schema_json = schema_json
        self.num_partitions = num_partitions
        self.salt_turn_width = salt_turn_width
        self.plan_ref = plan_ref
        self.when_matched = when_matched
        self.when_not_matched = when_not_matched
        self.matched_cond = matched_cond
        self.not_matched_cond = not_matched_cond
        self.src_payload = src_payload
        self.src_has_ts = src_has_ts
        self.expectations = expectations
        self.dry_run = dry_run

    def __call__(self, src: pa.Table) -> pa.Table:
        from datax_ray.sinks.lake import _merge_read_range

        counts = {"updated": 0, "deleted": 0, "inserted": 0}
        rid = int(src["_rid"][0].as_py())
        src = src.drop_columns(["_rid"]).combine_chunks()
        schema = schema_from_json(self.schema_json)
        payload_cols = [
            f.name
            for f in schema
            if f.name not in (*_KEYS, "ts") and not f.name.startswith("_")
        ]

        # Delta's multiple-matches error: MERGE is only well-defined when
        # each target row pairs with at most one source row.
        kg = (
            src.select(list(_KEYS))
            .group_by(list(_KEYS), use_threads=False)
            .aggregate([([], "count_all")])
        )
        if kg.num_rows != src.num_rows:
            raise ValueError(
                "merge source has duplicate (conv_id, turn_idx) keys — "
                "dedup the snapshot first (each target row must match at "
                "most one source row)"
            )

        plan: dict = ray.get(self.plan_ref)
        files = list(plan.get(rid, []))
        convs = pc.unique(src["conv_id"]).to_pylist()
        if files:
            state = _merge_read_range(
                self.lake_dir,
                files,
                self.schema_json,
                include_internal=True,
                conv_ids=convs,
                keep_tombstones=True,
            )
        else:  # a range with no committed files: every source row is fresh
            state = pa.table(
                {
                    **{f.name: pa.array([], f.type) for f in schema},
                    LSN_COL: pa.array([], pa.int64()),
                    DELETED_COL: pa.array([], pa.bool_()),
                }
            )
        tgt = state.rename_columns(
            [
                c if c in _KEYS else f"_tgt_{c.lstrip('_')}"
                for c in state.column_names
            ]
        )
        j = src.join(tgt, keys=list(_KEYS), join_type="left outer").combine_chunks()
        has_tgt = pc.is_valid(j["_tgt_lsn"])
        tombed = pc.and_(has_tgt, pc.fill_null(j["_tgt_deleted"], False))
        matched = pc.and_(has_tgt, pc.invert(tombed))

        # condition eval views: matched ⇒ bare col = TARGET, src_<col> =
        # source; not-matched ⇒ bare col = SOURCE row
        m_view = pa.table(
            {
                "conv_id": j["conv_id"],
                "turn_idx": j["turn_idx"],
                "ts": j["_tgt_ts"],
                **{c: j[f"_tgt_{c}"] for c in payload_cols},
                **{f"src_{c}": j[c] for c in self.src_payload},
                **({"src_ts": j["src_ts"]} if self.src_has_ts else {}),
            }
        )
        nm_view = pa.table(
            {
                "conv_id": j["conv_id"],
                "turn_idx": j["turn_idx"],
                **({"ts": j["src_ts"]} if self.src_has_ts else {}),
                **{c: j[c] for c in self.src_payload},
            }
        )

        pieces = []
        if self.when_matched == "update":
            changed = pa.array(np.zeros(j.num_rows, dtype=bool))
            for c in self.src_payload:
                changed = pc.or_(changed, _null_safe_neq(j[c], j[f"_tgt_{c}"]))
            take = pc.and_(
                pc.and_(matched, _cond_mask(m_view, self.matched_cond)), changed
            )
            u = j.filter(take)
            if u.num_rows:
                cols = {
                    "conv_id": u["conv_id"],
                    "turn_idx": u["turn_idx"],
                    "ts": u["_tgt_ts"],
                    LSN_COL: bump_synthetic_lsn(u["_tgt_lsn"]),
                    DELETED_COL: pa.array(np.zeros(u.num_rows, dtype=bool)),
                }
                for c in payload_cols:
                    cols[c] = u[c] if c in self.src_payload else u[f"_tgt_{c}"]
                pieces.append(cols)
                counts["updated"] = u.num_rows
        elif self.when_matched == "delete":
            take = pc.and_(matched, _cond_mask(m_view, self.matched_cond))
            d = j.filter(take)
            if d.num_rows:
                cols = {
                    "conv_id": d["conv_id"],
                    "turn_idx": d["turn_idx"],
                    "ts": d["_tgt_ts"],
                    LSN_COL: bump_synthetic_lsn(d["_tgt_lsn"]),
                    DELETED_COL: pa.array(np.ones(d.num_rows, dtype=bool)),
                }
                for c in payload_cols:
                    cols[c] = pa.nulls(d.num_rows, schema.field(c).type)
                pieces.append(cols)
                counts["deleted"] = d.num_rows

        if self.when_not_matched == "insert":
            take = pc.and_(
                pc.invert(matched), _cond_mask(nm_view, self.not_matched_cond)
            )
            i = j.filter(take)
            if i.num_rows:
                i_tomb = pc.fill_null(
                    pc.and_(pc.is_valid(i["_tgt_lsn"]), i["_tgt_deleted"]), False
                )
                # dominate a tombstoned predecessor: event-time floors at
                # the tombstone's, lsn bumps it; fresh keys take src ts +
                # the base reserved lsn
                ts = pc.if_else(
                    pc.and_(
                        i_tomb,
                        pc.fill_null(pc.greater(i["_tgt_ts"], i["src_ts"]), False),
                    ),
                    i["_tgt_ts"],
                    i["src_ts"],
                )
                lsn = pc.if_else(
                    i_tomb,
                    bump_synthetic_lsn(
                        pc.fill_null(i["_tgt_lsn"], 0).combine_chunks()
                        if isinstance(i["_tgt_lsn"], pa.ChunkedArray)
                        else pc.fill_null(i["_tgt_lsn"], 0)
                    ),
                    pa.array(
                        np.full(i.num_rows, _SYNTH_LSN_BASE + 1, dtype=np.int64)
                    ),
                )
                cols = {
                    "conv_id": i["conv_id"],
                    "turn_idx": i["turn_idx"],
                    "ts": ts,
                    LSN_COL: lsn,
                    DELETED_COL: pa.array(np.zeros(i.num_rows, dtype=bool)),
                }
                for c in payload_cols:
                    cols[c] = (
                        i[c]
                        if c in self.src_payload
                        else pa.nulls(i.num_rows, schema.field(c).type)
                    )
                pieces.append(cols)
                counts["inserted"] = i.num_rows

        if not pieces:
            return pa.table(
                {
                    **{
                        f.name: pa.array([], f.type)
                        for f in FRAG_LINEAGE_SCHEMA
                    },
                    "n_updated": pa.array([], pa.int64()),
                    "n_deleted": pa.array([], pa.int64()),
                    "n_inserted": pa.array([], pa.int64()),
                }
            )

        out_schema = [*schema, pa.field(LSN_COL, pa.int64()),
                      pa.field(DELETED_COL, pa.bool_())]
        frag = pa.concat_tables(
            pa.table(
                {f.name: pc.cast(p[f.name], f.type) for f in out_schema}
            )
            for p in pieces
        ).sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
        if self.expectations:
            enforce_expectations(frag, self.expectations, "merge")
        if self.dry_run:
            row = {
                "range_id": rid, "epoch": self.epoch, "kind": "frag",
                "file": None, "rows": frag.num_rows,
                "events_applied": 0, "lsn_hi": -1, "bytes": 0,
                "ts_lo": None, "ts_hi": None, "turn_lo": None,
                "turn_hi": None, "key_bloom": None,
            }
        else:
            frag = frag.append_column(
                "part_id",
                part_ids_for(
                    frag["conv_id"],
                    frag["turn_idx"],
                    self.num_partitions,
                    self.salt_turn_width,
                ),
            )
            row = write_fragment(frag, self.lake_dir, rid, self.epoch)
        out = pa.Table.from_pylist([row], schema=FRAG_LINEAGE_SCHEMA)
        for k in ("updated", "deleted", "inserted"):
            out = out.append_column(
                f"n_{k}", pa.array([counts[k]], pa.int64())
            )
        return out


def merge_into(
    lake_dir: str,
    source,
    when_matched: str = "update",
    when_not_matched: str = "insert",
    matched_cond: list | None = None,
    not_matched_cond: list | None = None,
    dry_run: bool = False,
) -> dict:
    """Fold a keyed source snapshot (parquet path/dir or pyarrow.Table)
    into the lake. Returns {"updated", "deleted", "inserted",
    "ranges_touched", "epoch"} — epoch None when nothing changed
    (idempotent convergence)."""
    from datax_ray.sinks.lake import _range_plan

    if when_matched not in ("update", "delete", "skip"):
        raise ValueError(f"when_matched must be update|delete|skip, got {when_matched!r}")
    if when_not_matched not in ("insert", "skip"):
        raise ValueError(
            f"when_not_matched must be insert|skip, got {when_not_matched!r}"
        )
    m = Manifest(lake_dir)
    committed = m.committed_epoch()
    if committed < 0:
        raise ValueError(f"no committed lake at {lake_dir}")
    layout = m.committed_layout() or {}
    schema = m.committed_schema()
    num_partitions = int(layout.get("num_partitions", 1) or 1)
    frag_ranges = int(layout.get("frag_ranges", 1) or 1)
    ppr = max(1, num_partitions // frag_ranges)
    salt = layout.get("salt_turn_width")
    salt = int(salt) if salt else None
    epoch = committed + 1

    if isinstance(source, pa.Table):
        ds = ray.data.from_arrow(source)
        src_names = source.column_names
    elif isinstance(source, ray.data.Dataset):
        # any Dataset works as a source — e.g. a splitPk-range SQL read
        # (sources/sqlsource.read_sql_table), a lake read, another
        # pipeline's output. schema() is metadata-only for typed sources.
        ds = source
        src_names = list(ds.schema().names)
    else:
        import pyarrow.parquet as pq

        ds = ray.data.read_parquet(source)
        paths = (
            sorted(glob.glob(os.path.join(source, "*.parquet")))
            if os.path.isdir(source)
            else [source]
        )
        # refuse heterogeneous directories up front: a first-file-only
        # schema would silently drop columns present in later files (or
        # KeyError mid-pipeline on columns later files lack)
        schemas = {p: pq.read_schema(p) for p in paths}
        names0 = schemas[paths[0]].names
        for p, s in schemas.items():
            if s.names != names0:
                raise ValueError(
                    f"merge source directory has disagreeing schemas: "
                    f"{paths[0]} has columns {names0} but {p} has "
                    f"{s.names} — make the source files schema-uniform"
                )
        src_names = names0

    known = {f.name for f in schema}
    unknown = [c for c in src_names if c not in known]
    if unknown:
        raise ValueError(
            f"merge source carries columns unknown to the committed schema: "
            f"{unknown} — evolve the lake first (`alter` / replay --auto-ddl)"
        )
    for k in _KEYS:
        if k not in src_names:
            raise ValueError(f"merge source must carry key column {k!r}")
    src_has_ts = "ts" in src_names
    if when_not_matched == "insert" and not src_has_ts:
        raise ValueError(
            "WHEN NOT MATCHED INSERT needs a source `ts` column (the "
            "inserted row's event-time)"
        )
    src_payload = [c for c in src_names if c not in (*_KEYS, "ts")]

    plan_items = _range_plan(lake_dir, m)
    plan = {int(it["range_id"]): list(it["files"]) for it in plan_items}
    plan_ref = ray.put(plan)

    ts_field = schema.field("ts").type

    def route(t: pa.Table) -> pa.Table:
        if t["conv_id"].null_count or t["turn_idx"].null_count:
            raise ValueError("merge source keys must be non-null")
        cols = {
            "conv_id": pc.cast(t["conv_id"], pa.string()),
            "turn_idx": pc.cast(t["turn_idx"], schema.field("turn_idx").type),
        }
        if src_has_ts:
            cols["src_ts"] = pc.cast(t["ts"], ts_field)
        for c in src_payload:
            cols[c] = pc.cast(t[c], schema.field(c).type)
        out = pa.table(cols)
        pid = part_ids_for(
            out["conv_id"], out["turn_idx"], num_partitions, salt
        )
        rid = (pid.to_numpy(zero_copy_only=False) // ppr).astype(np.int32)
        return out.append_column("_rid", pa.array(rid))

    lineage_t = (
        ds.map_batches(route, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_rid")
        .map_groups(
            # bound __call__: map_groups needs a plain function (it reads
            # fn.__name__); the instance just carries config
            MergeApplier(
                lake_dir=lake_dir,
                epoch=epoch,
                schema_json=schema_to_json(schema),
                num_partitions=num_partitions,
                salt_turn_width=salt,
                plan_ref=plan_ref,
                when_matched=when_matched,
                when_not_matched=when_not_matched,
                matched_cond=matched_cond,
                not_matched_cond=not_matched_cond,
                src_payload=src_payload,
                src_has_ts=src_has_ts,
                expectations=m.committed_properties().get("expectations"),
                dry_run=dry_run,
            ).__call__,
            batch_format="pyarrow",
        )
        .take_all()
    )  # O(touched ranges) driver rows

    result = {
        "updated": sum(int(r["n_updated"]) for r in lineage_t),
        "deleted": sum(int(r["n_deleted"]) for r in lineage_t),
        "inserted": sum(int(r["n_inserted"]) for r in lineage_t),
        "ranges_touched": len(lineage_t),
        "epoch": None,
    }
    if not lineage_t or dry_run:
        return result
    lineage = [
        {k: v for k, v in r.items() if not k.startswith("n_")} for r in lineage_t
    ]
    partitions = m.current_partitions()
    ranges = m.current_ranges()
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
        lineage=lineage,
        metrics={"merge": {
            "updated": result["updated"],
            "deleted": result["deleted"],
            "inserted": result["inserted"],
            "when_matched": when_matched,
            "when_not_matched": when_not_matched,
        }},
    )
    result["epoch"] = epoch
    return result
