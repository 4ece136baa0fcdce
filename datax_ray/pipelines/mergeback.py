"""Branch MERGE-BACK — fold a cloned branch's divergence into its parent
lake (the LakeFS/Nessie merge, completing the `clone` branching story:
branch at an epoch → curate/ingest on the branch → merge the delta back).

What merges: the branch's CURRENT winner (or tombstone) for every key its
post-branch-point change feed touched — never feed rows directly, because
fragment rows include LWW *losers* (a late out-of-order event lands as a
fragment but may not win the fold); upserting a loser would resurrect it.
The winner is re-read from branch live state per key, so a change that
lost on the branch merges as a value-equal no-op.

Why this terminates in O(branch delta): the key set comes from the
manifest-planned change feed (pipelines/feed.py), flows as DATA through
two grouped stages (no driver materialization, no broadcast):

  stage 1 (branch side)  feed → per-batch distinct keys → groupby branch
      range → point-read that range's winners for exactly those keys
      (Bloom + row-group pruning as for lookups; keys whose rows were
      compacted away entirely surface as deletions);
  stage 2 (parent side)  winners → route by the PARENT layout (the two
      lakes may be partitioned differently) → groupby parent range →
      compare against the parent's current winners and emit ONE fragment
      of dominating rewrites per touched range.

Merge semantics (the backfill/purge reasoning, applied across lakes):
  * A merged row keeps the branch winner's event-time, floored at the
    parent winner's (`max(ts_b, ts_p)`) so it dominates under (ts, lsn)
    with a reserved synthetic lsn — while any genuinely newer event
    later replayed on the parent still wins. In the conflict-free case
    ts_b >= ts_p always (the parent's row was an input to the branch's
    fold), so merged state is byte-equal to folding the union of both
    logs — the driver-verified invariant (cdc_branch_merge).
  * Value-equal keys are skipped, so re-running a merge converges to a
    no-op epoch=None, and merging a branch with no effective divergence
    commits nothing.
  * CONFLICTS — keys changed on BOTH sides to DIFFERENT values since the
    MERGE BASE (git semantics: identical edits merge clean, and each
    successful sync advances the base, so an earlier merge of this very
    branch is never reported as a parent-side change). Detection is a
    time-travel read of the parent's merge-base record; masks are only
    computed AFTER every join — pyarrow joins reorder rows, so a mask
    built pre-join would silently misalign (a bug the incremental-cursor
    oracle test caught). `on_conflict="branch"` (default) lets the
    branch win, "parent" keeps the parent's row, "abort" raises before
    any commit. If the parent no longer retains the exact merge-base
    record (vacuum) and has advanced, conflicts are undetectable:
    "parent"/"abort" refuse loudly, "branch" proceeds with
    conflicts=None.
  * INCREMENTAL: each successful sync records a cursor (+ the new merge
    base) in the parent's properties, so repeated syncs read only the
    branch's NEW epochs — O(new delta). A re-created branch at the same
    path (different branch point) resets the cursor. `dry_run` audits
    the pending sync without writing.

Loud refusals: the branch's earliest record must name this parent
(clone's metrics.branch provenance), branch payload columns must be a
subset of the parent's committed schema (evolve the parent first), and a
vacuumed-past-the-branch-point branch fails in plan_change_feed's
availability check (pin the feed window with a tag).
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from datax_ray.pipelines.purge import _SYNTH_LSN_BASE, bump_synthetic_lsn
from datax_ray.schemas import DELETED_COL, LSN_COL, schema_from_json, schema_to_json
from datax_ray.stages.delta import FRAG_LINEAGE_SCHEMA, write_fragment
from datax_ray.stages.partitioning import part_ids_for
from datax_ray.state.manifest import Manifest

_KEYS = ("conv_id", "turn_idx")


def _null_safe_eq(a, b) -> pa.Array:
    eq = pc.fill_null(pc.equal(a, b), False)
    both_null = pc.and_(pc.is_null(a), pc.is_null(b))
    return pc.or_(eq, both_null)


class BranchWinnerReader:
    """Stage 1 map_groups task: one branch range's changed keys in, that
    range's current winners (or tombstones / compacted-away deletions)
    for exactly those keys out."""

    def __init__(self, branch_dir: str, schema_json, plan_ref, payload_cols):
        self.branch_dir = branch_dir
        self.schema_json = schema_json
        self.plan_ref = plan_ref
        self.payload_cols = payload_cols

    def __call__(self, keys_t: pa.Table) -> pa.Table:
        from datax_ray.sinks.lake import _merge_read_range

        rid = int(keys_t["_rid"][0].as_py())
        keys = (
            keys_t.drop_columns(["_rid"])
            .group_by(list(_KEYS), use_threads=False)
            .aggregate([])
        )
        schema = schema_from_json(self.schema_json)
        plan: dict = ray.get(self.plan_ref)
        files = list(plan.get(rid, []))
        if files:
            state = _merge_read_range(
                self.branch_dir,
                files,
                self.schema_json,
                include_internal=True,
                conv_ids=pc.unique(keys["conv_id"]).to_pylist(),
                keep_tombstones=True,
            )
        else:
            state = pa.table(
                {
                    **{f.name: pa.array([], f.type) for f in schema},
                    LSN_COL: pa.array([], pa.int64()),
                    DELETED_COL: pa.array([], pa.bool_()),
                }
            )
        j = keys.join(state, keys=list(_KEYS), join_type="left outer")
        # a key with NO surviving row (tombstone compacted away) merges as
        # a deletion with unknown event-time (stage 2 floors it at the
        # parent's)
        bdel = pc.if_else(
            pc.is_valid(j[LSN_COL]),
            pc.fill_null(j[DELETED_COL], False),
            pa.array(np.ones(j.num_rows, dtype=bool)),
        )
        return pa.table(
            {
                "conv_id": j["conv_id"],
                "turn_idx": j["turn_idx"],
                "ts": j["ts"],
                **{c: j[c] for c in self.payload_cols},
                "_bdel": bdel,
            }
        )


class MergeBackApplier:
    """Stage 2 map_groups task: one parent range's branch winners in, one
    fragment of dominating rewrites out (plus conflict accounting)."""

    def __init__(
        self,
        parent_dir: str,
        epoch: int,
        schema_json,
        num_partitions: int,
        salt_turn_width: int | None,
        plan_ref,
        plan_bp_ref,
        branch_payload: list[str],
        on_conflict: str,
        expectations: list[dict] | None = None,
        dry_run: bool = False,
        list_conflicts: int = 0,
    ):
        self.parent_dir = parent_dir
        self.epoch = epoch
        self.schema_json = schema_json
        self.num_partitions = num_partitions
        self.salt_turn_width = salt_turn_width
        self.plan_ref = plan_ref
        self.plan_bp_ref = plan_bp_ref  # None => no conflict detection
        self.branch_payload = branch_payload
        self.on_conflict = on_conflict
        self.expectations = expectations
        self.dry_run = dry_run
        self.list_conflicts = list_conflicts

    def __call__(self, src: pa.Table) -> pa.Table:
        from datax_ray.sinks.lake import _merge_read_range

        rid = int(src["_prid"][0].as_py())
        src = src.drop_columns(["_prid"]).combine_chunks()
        schema = schema_from_json(self.schema_json)
        payload_cols = [
            f.name
            for f in schema
            if f.name not in (*_KEYS, "ts") and not f.name.startswith("_")
        ]
        convs = pc.unique(src["conv_id"]).to_pylist()

        def read_state(plan: dict) -> pa.Table:
            files = list(plan.get(rid, []))
            if not files:
                return pa.table(
                    {
                        **{f.name: pa.array([], f.type) for f in schema},
                        LSN_COL: pa.array([], pa.int64()),
                        DELETED_COL: pa.array([], pa.bool_()),
                    }
                )
            return _merge_read_range(
                self.parent_dir,
                files,
                self.schema_json,
                include_internal=True,
                conv_ids=convs,
                keep_tombstones=True,
            )

        state = read_state(ray.get(self.plan_ref))
        tgt = state.rename_columns(
            [c if c in _KEYS else f"_tgt_{c.lstrip('_')}" for c in state.column_names]
        )
        j = src.join(tgt, keys=list(_KEYS), join_type="left outer").combine_chunks()

        # the conflict-baseline join must happen BEFORE any row mask is
        # computed: pyarrow joins reorder rows, so a mask built on the
        # pre-join table would silently misalign (caught by the
        # incremental-cursor oracle test)
        if self.plan_bp_ref is not None:
            old = read_state(ray.get(self.plan_bp_ref))
            old = old.select([*_KEYS, "ts", LSN_COL]).rename_columns(
                [*_KEYS, "_old_ts", "_old_lsn"]
            )
            j = j.join(old, keys=list(_KEYS), join_type="left outer").combine_chunks()

        tgt_live = pc.and_(
            pc.is_valid(j["_tgt_lsn"]),
            pc.invert(pc.fill_null(j["_tgt_deleted"], False)),
        )
        bdel = j["_bdel"]

        # value-equal keys skip: same liveness and (if live) same branch
        # payload (parent-only columns keep their stored values on merge,
        # so they never make a key unequal). A live row is only a true
        # no-op when the parent's ts floor would not move either
        # (parent ts >= branch winner ts): skipping an identical-payload
        # row with a LATER branch ts would leave the parent's older
        # (ts, lsn) standing, letting a subsequent intermediate-ts parent
        # event win LWW that would have lost against the merged log.
        same_payload = pa.array(np.ones(j.num_rows, dtype=bool))
        for c in self.branch_payload:
            same_payload = pc.and_(same_payload, _null_safe_eq(j[c], j[f"_tgt_{c}"]))
        ts_noop = pc.fill_null(pc.greater_equal(j["_tgt_ts"], j["ts"]), False)
        live_same_payload = pc.and_(
            pc.invert(pc.fill_null(bdel, True)), pc.and_(tgt_live, same_payload)
        )
        dead_both = pc.and_(pc.fill_null(bdel, True), pc.invert(tgt_live))
        # conflict detection stays payload-based ("identical edits merge
        # clean" regardless of event time); the write-skip additionally
        # requires the ts floor not to move
        payload_equal = pc.or_(live_same_payload, dead_both)
        equal = pc.or_(pc.and_(live_same_payload, ts_noop), dead_both)

        conflicts = None
        conflict_mask = pa.array(np.zeros(j.num_rows, dtype=bool))
        if self.plan_bp_ref is not None:
            # parent changed the key since the branch point iff its winner
            # identity (ts, lsn) moved — including appear/disappear. Keys
            # where both sides converged to the SAME value (e.g. an
            # earlier merge-back of this very branch) are NOT conflicts —
            # the git rule: identical edits merge clean, which also makes
            # abort/parent re-runs idempotent.
            same = pc.and_(
                _null_safe_eq(j["_tgt_ts"], j["_old_ts"]),
                _null_safe_eq(j["_tgt_lsn"], j["_old_lsn"]),
            )
            both_absent = pc.and_(
                pc.is_null(j["_tgt_lsn"]), pc.is_null(j["_old_lsn"])
            )
            conflict_mask = pc.and_(
                pc.invert(pc.or_(same, both_absent)), pc.invert(payload_equal)
            )
            conflicts = int(pc.sum(pc.cast(conflict_mask, pa.int64())).as_py() or 0)
            if conflicts and self.on_conflict == "abort":
                ex = j.filter(conflict_mask)
                raise ValueError(
                    f"merge-back conflict: {conflicts} key(s) changed on "
                    f"both parent and branch since the branch point "
                    f"(first: {ex['conv_id'][0].as_py()!r} turn "
                    f"{ex['turn_idx'][0].as_py()}) — re-run with "
                    f"on_conflict='branch'|'parent' to resolve"
                )

        take = pc.invert(equal)
        if self.on_conflict == "parent" and self.plan_bp_ref is not None:
            take = pc.and_(take, pc.invert(conflict_mask))
        rows = j.filter(take)

        # always emit one accounting row (file=None when nothing rewrote)
        # so conflict counts survive ranges whose every change was skipped
        out = pa.Table.from_pylist(
            [{"range_id": rid, "epoch": self.epoch, "kind": "frag",
              "file": None, "rows": 0, "events_applied": 0, "lsn_hi": -1,
              "bytes": 0, "ts_lo": None, "ts_hi": None, "turn_lo": None,
              "turn_hi": None, "key_bloom": None}],
            schema=FRAG_LINEAGE_SCHEMA,
        )
        n_applied = 0
        if rows.num_rows:
            rdel = pc.fill_null(rows["_bdel"], True)
            # event-time: branch winner's, floored at the parent's so the
            # rewrite dominates; a compacted-away deletion has no branch
            # ts and takes the parent's
            ts = pc.if_else(
                pc.fill_null(pc.greater(rows["_tgt_ts"], rows["ts"]), True),
                rows["_tgt_ts"],
                rows["ts"],
            )
            ts = pc.if_else(pc.is_valid(ts), ts, rows["ts"])
            lsn = pc.if_else(
                pc.is_valid(rows["_tgt_lsn"]),
                bump_synthetic_lsn(
                    pc.fill_null(rows["_tgt_lsn"], 0).combine_chunks()
                    if isinstance(rows["_tgt_lsn"], pa.ChunkedArray)
                    else pc.fill_null(rows["_tgt_lsn"], 0)
                ),
                pa.array(np.full(rows.num_rows, _SYNTH_LSN_BASE + 1, np.int64)),
            )
            cols = {
                "conv_id": rows["conv_id"],
                "turn_idx": rows["turn_idx"],
                "ts": ts,
                LSN_COL: lsn,
                DELETED_COL: rdel,
            }
            for c in payload_cols:
                if c in self.branch_payload:
                    v = pc.if_else(rdel, pa.nulls(rows.num_rows, rows[c].type), rows[c])
                else:  # parent-only column: keep the stored value on update
                    v = pc.if_else(
                        rdel,
                        pa.nulls(rows.num_rows, rows[f"_tgt_{c}"].type),
                        rows[f"_tgt_{c}"],
                    )
                cols[c] = v
            out_schema = [*schema, pa.field(LSN_COL, pa.int64()),
                          pa.field(DELETED_COL, pa.bool_())]
            frag = pa.table(
                {f.name: pc.cast(cols[f.name], f.type) for f in out_schema}
            ).sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
            if self.expectations:
                from datax_ray.pipelines.mergeinto import enforce_expectations

                # the PARENT's pinned CHECK constraints gate what merges
                # in — a branch may have been curated under laxer rules
                enforce_expectations(frag, self.expectations, "merge-back")
            frag = frag.append_column(
                "part_id",
                part_ids_for(
                    frag["conv_id"], frag["turn_idx"],
                    self.num_partitions, self.salt_turn_width,
                ),
            )
            n_applied = frag.num_rows
            if not self.dry_run:
                row = write_fragment(frag, self.parent_dir, rid, self.epoch)
                out = pa.Table.from_pylist([row], schema=FRAG_LINEAGE_SCHEMA)
        out = out.append_column(
            "n_applied", pa.array([n_applied] * out.num_rows, pa.int64())
        )
        out = out.append_column(
            "n_conflicts",
            pa.array(
                [conflicts if conflicts is not None else -1] * out.num_rows,
                pa.int64(),
            ),
        )
        sample = ""
        if self.list_conflicts and conflicts:
            ex = j.filter(conflict_mask).slice(0, self.list_conflicts)
            sample = json.dumps([
                {"conv_id": c, "turn_idx": int(t)}
                for c, t in zip(ex["conv_id"].to_pylist(),
                                ex["turn_idx"].to_pylist())
            ])
        out = out.append_column(
            "conflict_sample", pa.array([sample] * out.num_rows, pa.string())
        )
        return out


def merge_back(
    parent_dir: str, branch_dir: str, on_conflict: str = "branch",
    dry_run: bool = False, list_conflicts: int = 0,
) -> dict:
    """Merge a branch's post-branch-point divergence into its parent.
    Returns {"applied", "conflicts", "ranges_touched", "epoch",
    "branch_point"} — epoch None when the branch carries no effective
    divergence (or it all lost to value-equality), conflicts None when
    undetectable (parent vacuumed the branch-point record). `dry_run`
    runs the full two-stage plan — conflict detection, value-equality,
    expectation checks (which still raise) — but writes no fragment and
    commits nothing: the pre-merge audit (`applied` = would-apply)."""
    from datax_ray.pipelines.feed import read_change_feed
    from datax_ray.sinks.lake import _range_plan

    if on_conflict not in ("branch", "parent", "abort"):
        raise ValueError(
            f"on_conflict must be branch|parent|abort, got {on_conflict!r}"
        )
    mp = Manifest(parent_dir)
    mb = Manifest(branch_dir)
    if mp.committed_epoch() < 0:
        raise ValueError(f"no committed lake at {parent_dir}")
    eb = mb._epoch_files()
    if not eb:
        raise ValueError(f"no committed lake at {branch_dir}")
    from datax_ray.state.fs import canon_path, read_json

    bp, first_path = eb[0]
    first = read_json(first_path)
    prov = (first.get("metrics") or {}).get("branch") or {}
    if canon_path(prov.get("from", "")) != canon_path(parent_dir):
        raise ValueError(
            f"{branch_dir} is not a branch of {parent_dir} (earliest record "
            f"names {prov.get('from')!r}) — merge-back needs clone provenance"
        )
    head_b = mb.committed_epoch()
    # incremental sync cursor: a previous merge-back of THIS branch (same
    # branch point — a re-created branch at the same path resets it)
    # recorded how far it merged, so repeated syncs read only the
    # branch's NEW epochs: O(new delta), not O(all post-branch-point
    # delta). Conflict detection keeps the branch POINT as its baseline
    # regardless — the cursor narrows the key set, never the semantics.
    props = mp.committed_properties()
    cursors = dict(props.get("mergeback_cursors") or {})
    from datax_ray.state.fs import canon_path

    # canon_path: an obj:///s3:// branch dir must key the cursor stably
    # across sessions (abspath would prefix the cwd to the URL)
    bkey = canon_path(branch_dir)
    cur = cursors.get(bkey) or {}
    cursor_valid = int(cur.get("branch_point", bp)) == bp
    feed_from = max(bp, int(cur.get("epoch", bp))) if cursor_valid else bp
    # conflict baseline = the MERGE-BASE, git-style: a successful sync
    # resolves all divergence up to its point, so later syncs compare
    # against the parent AS OF that merge, not the original branch point
    # — our own earlier merge is never reported as a parent-side change
    base_epoch = (
        int(cur["parent_epoch"])
        if cursor_valid and cur.get("parent_epoch") is not None
        else bp
    )
    result = {
        "applied": 0, "conflicts": None, "ranges_touched": 0,
        "epoch": None, "branch_point": bp, "feed_from": feed_from,
    }
    if head_b <= feed_from:
        return result

    p_schema = mp.committed_schema()
    b_schema = mb.committed_schema()
    p_names = {f.name for f in p_schema}
    extra = [
        f.name for f in b_schema
        if f.name not in p_names and not f.name.startswith("_")
    ]
    if extra:
        raise ValueError(
            f"branch evolved columns the parent lacks: {extra} — evolve the "
            f"parent first (`alter`), then merge"
        )
    branch_payload = [
        f.name for f in b_schema
        if f.name not in (*_KEYS, "ts") and not f.name.startswith("_")
    ]

    p_head = mp.committed_epoch()
    plan_bp_ref = None
    if p_head > base_epoch:
        rec_bp = mp.at_epoch(base_epoch)
        if rec_bp is None or int(rec_bp.get("epoch", -1)) != base_epoch:
            if on_conflict != "branch":
                raise ValueError(
                    f"parent advanced past merge base {base_epoch} but no "
                    f"longer retains that record (vacuum) — conflicts are "
                    f"undetectable; only on_conflict='branch' can proceed"
                )
        else:
            plan_bp = {
                int(it["range_id"]): list(it["files"])
                for it in _range_plan(parent_dir, mp, as_of_epoch=base_epoch)
            }
            plan_bp_ref = ray.put(plan_bp)

    p_layout = mp.committed_layout() or {}
    p_parts = int(p_layout.get("num_partitions", 1) or 1)
    p_ppr = max(1, p_parts // int(p_layout.get("frag_ranges", 1) or 1))
    p_salt = p_layout.get("salt_turn_width")
    p_salt = int(p_salt) if p_salt else None

    b_layout = mb.committed_layout() or {}
    b_parts = int(b_layout.get("num_partitions", 1) or 1)
    b_ppr = max(1, b_parts // int(b_layout.get("frag_ranges", 1) or 1))
    b_salt = b_layout.get("salt_turn_width")
    b_salt = int(b_salt) if b_salt else None

    b_plan_ref = ray.put(
        {int(it["range_id"]): list(it["files"])
         for it in _range_plan(branch_dir, mb)}
    )
    p_plan_ref = ray.put(
        {int(it["range_id"]): list(it["files"])
         for it in _range_plan(parent_dir, mp)}
    )
    epoch = p_head + 1

    def keys_only(t: pa.Table) -> pa.Table:
        g = (
            t.select(list(_KEYS))
            .group_by(list(_KEYS), use_threads=False)
            .aggregate([])
        )
        pid = part_ids_for(g["conv_id"], g["turn_idx"], b_parts, b_salt)
        rid = (pid.to_numpy(zero_copy_only=False) // b_ppr).astype(np.int32)
        return g.append_column("_rid", pa.array(rid))

    def route_parent(t: pa.Table) -> pa.Table:
        pid = part_ids_for(t["conv_id"], t["turn_idx"], p_parts, p_salt)
        rid = (pid.to_numpy(zero_copy_only=False) // p_ppr).astype(np.int32)
        return t.append_column("_prid", pa.array(rid))

    lineage_t = (
        read_change_feed(branch_dir, feed_from)
        .map_batches(keys_only, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_rid")
        .map_groups(
            # bound __call__: map_groups needs a plain function (it reads
            # fn.__name__); the instance just carries config
            BranchWinnerReader(
                branch_dir, schema_to_json(b_schema), b_plan_ref, branch_payload
            ).__call__,
            batch_format="pyarrow",
        )
        .map_batches(route_parent, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_prid")
        .map_groups(
            MergeBackApplier(
                parent_dir=parent_dir,
                epoch=epoch,
                schema_json=schema_to_json(p_schema),
                num_partitions=p_parts,
                salt_turn_width=p_salt,
                plan_ref=p_plan_ref,
                plan_bp_ref=plan_bp_ref,
                branch_payload=branch_payload,
                on_conflict=on_conflict,
                expectations=mp.committed_properties().get("expectations"),
                dry_run=dry_run,
                list_conflicts=list_conflicts,
            ).__call__,
            batch_format="pyarrow",
        )
        .take_all()
    )  # O(touched ranges) driver rows

    result["applied"] = sum(int(r["n_applied"]) for r in lineage_t)
    if plan_bp_ref is not None:
        result["conflicts"] = sum(
            max(0, int(r["n_conflicts"])) for r in lineage_t
        )
    elif p_head == base_epoch:
        result["conflicts"] = 0
    if list_conflicts:
        keys = []
        for r in lineage_t:
            if r.get("conflict_sample"):
                keys.extend(json.loads(r["conflict_sample"]))
            if len(keys) >= list_conflicts:
                break
        result["conflict_keys"] = keys[:list_conflicts]
    lineage = [
        {k: v for k, v in r.items()
         if not k.startswith("n_") and k != "conflict_sample"}
        for r in lineage_t
        if r.get("file")
    ]
    result["ranges_touched"] = len(lineage)
    if not lineage or dry_run:
        return result

    partitions = mp.current_partitions()
    ranges = mp.current_ranges()
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
    mp.commit(
        epoch,
        segments=[],
        # watermark untouched: synthetic lsns are not log positions
        lsn_hi=mp.committed_lsn_hi(),
        schema=p_schema,
        partitions=partitions,
        ranges=ranges,
        layout=p_layout,
        properties={
            **props,
            "mergeback_cursors": {
                **cursors,
                bkey: {"epoch": head_b, "branch_point": bp,
                       "parent_epoch": epoch},
            },
        },
        lineage=lineage,
        metrics={"mergeback": {
            "branch": canon_path(branch_dir),
            "branch_point": bp,
            "branch_head": head_b,
            "applied": result["applied"],
            "conflicts": result["conflicts"],
            "on_conflict": on_conflict,
        }},
    )
    result["epoch"] = epoch
    return result
