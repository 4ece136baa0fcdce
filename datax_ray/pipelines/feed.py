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

from datax_ray.state.fs import fs_for
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
        from datax_ray.state.fs import read_json

        out[e] = read_json(by_epoch[e])
    return out


def _refuse_restore_in_window(rec: dict, e: int) -> None:
    """A RESTORE epoch rewinds state by REFERENCE — it commits no new
    fragments, so the fragment-delta feeds cannot express its (arbitrary,
    possibly row-removing) state change. Silently skipping it (the
    migration rule) would let downstream folds diverge from the lake, so
    a feed window that CROSSES a restore epoch refuses loudly: restart
    consumers at/after the restore epoch, or --rebuild fold-based views."""
    if "restore" in (rec.get("metrics") or {}):
        r = rec["metrics"]["restore"]
        raise ValueError(
            f"feed window crosses RESTORE epoch {e} (head rewound to epoch "
            f"{r.get('to_epoch')}): a restore is not expressible as a "
            "fragment delta — re-anchor this consumer at from_epoch >= "
            f"{e} or rebuild the downstream view"
        )


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
        # Layout migrations rewrite EVERY row without changing any value —
        # their CDC delta is empty (same rule as plan_feed_preimages; Delta
        # emits nothing for OPTIMIZE). Without this skip, a feed window
        # spanning a repartition would re-ship the whole lake as "changes".
        if "repartition" in (recs[e].get("metrics") or {}):
            continue
        _refuse_restore_in_window(recs[e], e)
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
                pq.read_table(
                    fs_for(self._lake_dir).open_input(
                        os.path.join(self._lake_dir, row["file"])
                    )
                )
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
    # Bound the OUTPUT block count, not just read parallelism: a large
    # feed window (first MV refresh over a whole sf1 lake = thousands of
    # small change files) must not become thousands of small blocks —
    # Ray 2.49's hash-shuffle groupby degrades superlinearly with input
    # block count (measured: the same 6M rows take 4 s / 0.5 GiB driver
    # at 64 blocks but 419 s / 13.5 GiB at 2048), which is exactly what
    # every feed-consuming keyed refresh feeds into. 128 blocks keeps
    # 8-actor parallelism saturated while capping that cost.
    n_blocks = min(len(plan), 128)
    return ray.data.from_items(plan, override_num_blocks=n_blocks).map_batches(
        _FeedReader,
        fn_constructor_args=(lake_dir, schema_to_json(schema)),
        batch_format="pyarrow",
        batch_size=None,
        concurrency=min(8, n_blocks),
    )


# ----------------------------------------------------- consumer offsets --


def _consumer_path(lake_dir: str, name: str) -> str:
    if not name or "/" in name or name.startswith("."):
        raise ValueError(f"bad consumer name {name!r}")
    return os.path.join(lake_dir, "_manifest", "consumers", f"{name}.json")


def consumer_offset(lake_dir: str, name: str) -> int:
    """The last epoch this named consumer has acknowledged (-1 = never
    consumed: next read delivers since the beginning)."""
    from datax_ray.state.fs import fs_for as _ff, read_json

    p = _consumer_path(lake_dir, name)
    if not _ff(p).exists(p):
        return -1
    return int(read_json(p)["epoch"])


def commit_consumer(lake_dir: str, name: str, epoch: int) -> None:
    """Durably acknowledge epochs <= `epoch` for this consumer (atomic
    file replace). The at-least-once contract: acknowledge AFTER your
    downstream effect is durable — a crash in between re-delivers the
    same rows, and CDC rows fold idempotently under LWW."""
    from datax_ray.state.fs import fs_for as _ff, json_bytes

    p = _consumer_path(lake_dir, name)
    _ff(p).put(p, json_bytes({"epoch": int(epoch)}))


def read_change_feed_consumer(
    lake_dir: str, name: str, to_epoch: int | None = None, preimages: bool = False
) -> tuple[ray.data.Dataset, int, int]:
    """Named-consumer feed read (Kafka-consumer-group analog for the CDC
    source): delivers epochs (last-acknowledged, to_epoch-or-head] and
    returns (dataset, from_epoch, to_epoch). The caller processes the
    rows, then calls commit_consumer(lake_dir, name, to_epoch) — NOT this
    function — so delivery is at-least-once, never silently lossy.
    Vacuumed history past the offset raises (plan_change_feed's
    availability rule): pin the feed window with a tag, or rebuild the
    consumer from a full read."""
    m = Manifest(lake_dir)
    frm = consumer_offset(lake_dir, name)
    to = m.committed_epoch() if to_epoch is None else int(to_epoch)
    if preimages:
        ds = read_change_feed_preimages(lake_dir, frm, to)
    else:
        ds = read_change_feed(lake_dir, frm, to)
    return ds, frm, to


# ------------------------------------------------------------ preimages --

_CHANGE_COL = "_change_type"


def plan_feed_preimages(
    lake_dir: str, from_epoch: int, to_epoch: int | None = None
) -> list[dict]:
    """[{epoch, range_id, new_files, prior_files}] — one item per
    (epoch, changed range). Layout-migration epochs are skipped: they
    rewrite every row under a new layout without changing any value, so
    their CDC delta is empty (Delta emits nothing for OPTIMIZE either)."""
    from datax_ray.sinks.lake import _range_plan

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
        rec = recs[e]
        if "repartition" in (rec.get("metrics") or {}):
            continue
        _refuse_restore_in_window(rec, e)
        prev = recs.get(e - 1)
        new_by_rid: dict[int, list[str]] = {}
        prev_frags = _frag_set(prev)
        for rid, r in rec.get("ranges", {}).items():
            fresh = [f for f in r.get("frags", []) if f not in prev_frags]
            if fresh:
                new_by_rid[int(rid)] = sorted(fresh)
        if e == 0:
            # bootstrap bases are the insert stream; group by their range
            layout = rec.get("layout") or {}
            ppr = max(
                1,
                int(layout.get("num_partitions", 1) or 1)
                // int(layout.get("frag_ranges", 1) or 1),
            )
            for pid, p in rec.get("partitions", {}).items():
                if p.get("base"):
                    new_by_rid.setdefault(int(pid) // ppr, []).append(p["base"])
        # ONE as-of plan per epoch covering every changed range (not one
        # per range: _range_plan re-parses manifest JSON, so per-range
        # calls would cost O(epochs x ranges x manifest-size) driver work).
        prior_by_rid: dict[int, list[str]] = {}
        if e > 0 and new_by_rid:
            for p in _range_plan(
                lake_dir, m, as_of_epoch=e - 1, only_rids=set(new_by_rid)
            ):
                prior_by_rid[int(p["range_id"])] = p["files"]
        for rid, files in sorted(new_by_rid.items()):
            plan.append({
                "epoch": e,
                "range_id": rid,
                "new_files": json.dumps(files),
                "prior_files": json.dumps(prior_by_rid.get(rid, [])),
            })
    return plan


class _PreimageReader:
    """One (epoch, range) item in → classified CDC rows out: the epoch's
    final winner per key (LWW over its new fragments) diffed against the
    key's winner AS OF the prior epoch, emitted Delta-CDF style:
    insert / update_preimage+update_postimage / delete (delete carries
    the OLD values). Intra-epoch churn collapses to the epoch's net
    effect — per-commit semantics, exactly like Delta's table_changes."""

    def __init__(self, lake_dir: str, schema_json):
        from datax_ray.schemas import schema_from_json
        from datax_ray.state.schema_tracker import SchemaTracker

        self.__name__ = "_PreimageReader"
        self._lake_dir = lake_dir
        self._schema_json = schema_json
        self._target = schema_from_json(schema_json)
        self._tracker = SchemaTracker(self._target)

    def _out_schema(self) -> pa.Schema:
        return self._target.append(
            pa.field(_EPOCH_COL, pa.int32())
        ).append(pa.field(_CHANGE_COL, pa.string()))

    def __call__(self, t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        from datax_ray.schemas import DELETED_COL, LSN_COL
        from datax_ray.sinks.lake import _merge_read_range
        from datax_ray.stages.merge import lww_reduce

        out: list[pa.Table] = []

        def emit(rows: pa.Table, epoch: int, kind: str) -> None:
            if rows.num_rows == 0:
                return
            rows = pa.table(
                {f.name: rows[f.name] for f in self._target}
            )
            rows = rows.append_column(
                _EPOCH_COL, pa.array([epoch] * rows.num_rows, pa.int32())
            ).append_column(
                _CHANGE_COL, pa.array([kind] * rows.num_rows, pa.string())
            )
            out.append(rows)

        for item in t.to_pylist():
            e = int(item["epoch"])
            new_files = json.loads(item["new_files"])
            prior_files = json.loads(item["prior_files"])
            post = lww_reduce(
                pa.concat_tables(
                    [
                        self._tracker.unify(
                            pq.read_table(
                                fs_for(self._lake_dir).open_input(
                                    os.path.join(self._lake_dir, f)
                                )
                            )
                        )
                        for f in new_files
                    ]
                ),
                order_cols=("ts", LSN_COL),
            )
            convs = sorted(set(post["conv_id"].to_pylist()))
            pre = (
                _merge_read_range(
                    self._lake_dir,
                    prior_files,
                    self._schema_json,
                    include_internal=True,
                    conv_ids=convs,
                    keep_tombstones=True,
                )
                if prior_files and convs
                else self._target.empty_table()
            )
            # Join against the FULL prior state, tombstones included: a
            # late event must defeat the stored (ts, _lsn) — including a
            # purge/delete tombstone's — before it is a visible change;
            # a loser changes nothing and must emit nothing.
            j = post.join(
                pre,
                keys=["conv_id", "turn_idx"],
                join_type="left outer",
                right_suffix="_pre",
            )
            had_pre = pc.is_valid(j[LSN_COL + "_pre"])
            pre_tomb = pc.fill_null(j[DELETED_COL + "_pre"], False)
            pre_live_m = pc.and_(had_pre, pc.invert(pre_tomb))
            post_tomb = pc.fill_null(j[DELETED_COL], False)
            post_wins = pc.or_(
                pc.invert(had_pre),
                pc.or_(
                    pc.greater(j["ts"], j["ts_pre"]),
                    pc.and_(
                        pc.equal(j["ts"], j["ts_pre"]),
                        pc.greater(j[LSN_COL], j[LSN_COL + "_pre"]),
                    ),
                ),
            )
            post_wins = pc.fill_null(post_wins, True)
            j = j.filter(post_wins)
            had_pre = had_pre.filter(post_wins)
            pre_live_m = pre_live_m.filter(post_wins)
            post_tomb = post_tomb.filter(post_wins)

            inserts = j.filter(
                pc.and_(pc.invert(pre_live_m), pc.invert(post_tomb))
            )
            emit(inserts, e, "insert")

            updates = j.filter(pc.and_(pre_live_m, pc.invert(post_tomb)))
            emit(updates, e, "update_postimage")
            pre_cols = pa.table({
                f.name: updates[
                    f.name + "_pre" if f.name + "_pre" in updates.column_names else f.name
                ]
                for f in self._target
            })
            emit(pre_cols, e, "update_preimage")

            deletes = j.filter(pc.and_(pre_live_m, post_tomb))
            del_cols = pa.table({
                f.name: deletes[
                    f.name + "_pre" if f.name + "_pre" in deletes.column_names else f.name
                ]
                for f in self._target
            })
            emit(del_cols, e, "delete")

        return (
            pa.concat_tables(out)
            if out
            else self._out_schema().empty_table()
        )


def read_change_feed_preimages(
    lake_dir: str, from_epoch: int, to_epoch: int | None = None
) -> ray.data.Dataset:
    """Delta-CDF-style change rows for epochs (from_epoch, to_epoch]:
    payload + `_lsn` + `_epoch` + `_change_type` in
    {insert, update_preimage, update_postimage, delete}, where delete and
    update_preimage rows carry the OLD values. Enables ADDITIVE downstream
    aggregation (count += insert - delete; sum += post - pre) — no LWW
    fold needed. One task per (epoch, changed range); preimages come from
    a conv-pruned merge-read of the range AS OF the prior epoch, so the
    cost is O(changed ranges), never O(lake)."""
    from datax_ray.schemas import schema_to_json
    from datax_ray.sinks.lake import lake_schema

    plan = plan_feed_preimages(lake_dir, from_epoch, to_epoch)
    schema = lake_schema(lake_dir, to_epoch)
    out_schema = schema.append(pa.field(_EPOCH_COL, pa.int32())).append(
        pa.field(_CHANGE_COL, pa.string())
    )
    if not plan:
        return ray.data.from_arrow(out_schema.empty_table())
    # same bounded-block-count rule as read_change_feed (hash-shuffle
    # block-count pathology) — one (epoch, range) item stays one read
    # call; the items just share blocks
    n_blocks = min(len(plan), 128)
    return ray.data.from_items(plan, override_num_blocks=n_blocks).map_batches(
        _PreimageReader,
        fn_constructor_args=(lake_dir, schema_to_json(schema)),
        batch_format="pyarrow",
        batch_size=None,
        concurrency=min(8, n_blocks),
    )


def change_feed_summary(
    lake_dir: str, from_epoch: int, to_epoch: int | None = None
) -> dict:
    """Epoch-to-epoch DIFF report — "what changed between epochs (from,
    to]" as an operator-readable summary: per-change-type row counts,
    distinct conversations touched, and the event-time span of the
    changes. Runs on the preimage feed (O(changed ranges), never
    O(lake)); the heavy reduction is a per-batch combiner + one tiny
    driver fold, so the driver never sees row-level data."""
    import pyarrow.compute as pc

    from datax_ray.state.manifest import Manifest

    m = Manifest(lake_dir)
    committed = m.committed_epoch()
    to_epoch = committed if to_epoch is None else to_epoch
    out = {
        "lake": lake_dir,
        "from_epoch": from_epoch,
        "to_epoch": to_epoch,
    }

    def partial(t: pa.Table) -> pa.Table:
        g = (
            pa.table({"change": t[_CHANGE_COL], "conv_id": t["conv_id"]})
            .group_by(["change"], use_threads=False)
            .aggregate([("conv_id", "count_distinct"), ("change", "count")])
        )
        ts = t["ts"]
        lo = pc.min(ts).as_py()
        hi = pc.max(ts).as_py()
        return pa.table(
            {
                "change": g["change"],
                "rows": pc.cast(g["change_count"], pa.int64()),
                "convs_ub": pc.cast(g["conv_id_count_distinct"], pa.int64()),
                "ts_lo": pa.array([lo] * g.num_rows, pa.timestamp("us")),
                "ts_hi": pa.array([hi] * g.num_rows, pa.timestamp("us")),
            }
        )

    parts = [
        b
        for b in read_change_feed_preimages(lake_dir, from_epoch, to_epoch)
        .map_batches(partial, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow", batch_size=65536)
    ]
    if not parts or sum(p.num_rows for p in parts) == 0:
        out.update(changes={}, rows=0, ts_lo=None, ts_hi=None)
        return out
    t = pa.concat_tables(parts)
    folded = (
        t.group_by(["change"], use_threads=False)
        .aggregate([("rows", "sum")])
        .rename_columns(["change", "rows"])
    )
    out["changes"] = dict(
        zip(folded["change"].to_pylist(), folded["rows"].to_pylist())
    )
    out["rows"] = int(sum(out["changes"].values()))
    los = [v for v in t["ts_lo"].to_pylist() if v is not None]
    his = [v for v in t["ts_hi"].to_pylist() if v is not None]
    out["ts_lo"] = min(los).isoformat() if los else None
    out["ts_hi"] = max(his).isoformat() if his else None
    # net live-row delta: inserts − deletes (update pre/post images cancel)
    ch = out["changes"]
    out["net_rows"] = int(ch.get("insert", 0) - ch.get("delete", 0))
    return out
