"""Lake read side.

The lake is base+delta partition files (`<lake>/p=NNNNN/{b,d}=EEEEEE.parquet`)
plus the `_manifest/` commit log. Readers trust ONLY files referenced by the
latest committed manifest — orphans from crashed epochs are invisible
(SURVEY.md §2B-B5). Each read task LWW-merges one partition's base and
deltas (winner per (conv_id, turn_idx) = max (ts, _lsn)) and drops
tombstones, after unifying historical pre-DDL schemas to the committed one.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray.data

from datax_ray.schemas import DELETED_COL, INTERNAL_COLS, LAKE_SCHEMA
from datax_ray.state.fs import fs_for
from datax_ray.state.manifest import Manifest
from datax_ray.state.schema_tracker import SchemaTracker


def lake_schema(lake_dir: str, as_of_epoch: int | None = None) -> pa.Schema:
    m = Manifest(lake_dir)
    return m.committed_schema(as_of_epoch) or LAKE_SCHEMA


_MAX_LOOKUP_SALTS = 4096  # above this a salted lookup stops pruning


def _lookup_rids(
    layout: dict, conv_ids: list[str],
    turn_bounds: tuple[int | None, int | None] = (None, None),
) -> set[int] | None:
    """Range ids that can contain `conv_ids`, from the manifest alone
    (no storage reads) — the keyed-range pruning of SURVEY §2A row 3:
    recompute the same dictionary hash the writer used (partitioning.py)
    and map pid -> rid.

    Salted layouts spread one conversation's rows over partitions by
    salt = turn_idx // W, but the salt VALUE SET is bounded by the
    manifest's global turn bounds: every committed row's salt lies in
    [turn_lo // W, turn_hi // W], so the candidate pids are exactly
    {(hash(conv) + s*MIX) % P} over that salt range — still O(convs ×
    salts) manifest-only arithmetic, no storage reads. Returns None
    (no pruning, correct-but-unpruned reads) when bounds are unknown
    (pre-upgrade manifests), turn_lo is negative (the writer's uint64
    cast wraps), or the salt range exceeds _MAX_LOOKUP_SALTS."""
    import numpy as np

    from datax_ray.stages.partitioning import _SALT_MIX, _stable_hash_strings

    num_partitions = int(layout.get("num_partitions", 0) or 0)
    if not num_partitions:
        return None
    frag_ranges = int(layout.get("frag_ranges", 1) or 1)
    ppr = max(1, num_partitions // frag_ranges)
    h = _stable_hash_strings(np.asarray(list(conv_ids), dtype=object))
    width = int(layout.get("salt_turn_width") or 0)
    if width:
        turn_lo, turn_hi = turn_bounds
        if turn_lo is None or turn_hi is None or turn_lo < 0:
            return None
        s_lo, s_hi = turn_lo // width, turn_hi // width
        if s_hi - s_lo + 1 > _MAX_LOOKUP_SALTS:
            return None
        salts = np.arange(s_lo, s_hi + 1, dtype=np.uint64)
        h = (h[:, None] + salts[None, :] * _SALT_MIX).ravel()
    pids = (h % np.uint64(num_partitions)).astype(np.int64)
    return {int(pid) // ppr for pid in pids}


def _ts_us(min_ts) -> int | None:
    """Normalize a time-slice cutoff (ISO string / datetime / µs int) to
    µs-since-epoch, matching the lake's timestamp("us") column."""
    if min_ts is None:
        return None
    if isinstance(min_ts, int):
        return min_ts
    if isinstance(min_ts, str):
        from datetime import datetime

        min_ts = datetime.fromisoformat(min_ts)
    return pa.scalar(min_ts, pa.timestamp("us")).cast(pa.int64()).as_py()


def _range_plan(
    lake_dir: str, m: Manifest, as_of_epoch: int | None = None,
    only_rids: set[int] | None = None, min_ts_us: int | None = None,
    probe: "np.ndarray | None" = None, explain: dict | None = None,
) -> list[dict]:
    """[{range_id, files, rows}] from the committed manifest — the unit of
    merge-read parallelism (base files of the range's partitions + its
    pending fragments). `as_of_epoch` plans against that epoch's record
    (time travel); `only_rids` restricts the plan to those ranges (keyed
    point lookup); `probe` (uint64 key hashes, state/bloom.py) drops
    individual FILES whose per-file conv_id Bloom proves they hold none
    of the looked-up keys — the pruning tier between range routing and
    parquet row-group stats. Safe under LWW: a pruned file has no row of
    the probed keys at all, and rows of other keys are filtered pre-merge
    anyway; missing blooms (pre-upgrade manifests, large files) never
    prune."""
    layout = m.committed_layout(as_of_epoch) or {}
    num_partitions = int(layout.get("num_partitions", 0) or 0)
    frag_ranges = int(layout.get("frag_ranges", 1) or 1)
    ppr = max(1, num_partitions // frag_ranges) if num_partitions else 1
    partitions = m.current_partitions(as_of_epoch)
    range_recs = m.current_ranges(as_of_epoch)
    parts = []
    all_rids = set(range_recs) | {pid // ppr for pid in partitions}
    if explain is not None:
        explain["ranges_total"] = len(all_rids)
    if only_rids is not None:
        all_rids &= only_rids
    if explain is not None:
        explain["ranges_after_hash_routing"] = len(all_rids)
        explain.update(base_files_kept=0, base_pruned_ts=0,
                       base_pruned_bloom=0, frags_kept=0, frags_pruned_ts=0,
                       frags_pruned_bloom=0)
    def below_cutoff(ts_hi) -> bool:
        # A file whose every event-time is strictly below the cutoff can
        # neither produce an in-slice winner (its rows' ts < cutoff) nor
        # suppress one (LWW order is (ts, lsn); suppressing a row with
        # ts >= cutoff needs ts >= that row's ts > every ts in this file).
        # Missing stats (pre-upgrade manifests) => never pruned.
        return (
            min_ts_us is not None and ts_hi is not None and int(ts_hi) < min_ts_us
        )

    from datax_ray.state.bloom import bloom_may_contain

    def bloom_ok(b64) -> bool:
        return probe is None or bloom_may_contain(b64, probe)

    for rid in sorted(all_rids):
        files, rows = [], 0
        for p in range(rid * ppr, (rid + 1) * ppr):
            prec = partitions.get(p, {})
            if not prec.get("base"):
                continue
            if below_cutoff(prec.get("ts_hi")):
                if explain is not None:
                    explain["base_pruned_ts"] += 1
                continue
            if not bloom_ok(prec.get("bloom")):
                if explain is not None:
                    explain["base_pruned_bloom"] += 1
                continue
            if explain is not None:
                explain["base_files_kept"] += 1
            files.append(prec["base"])
            rows += int(prec.get("rows", 0))
        rec = range_recs.get(rid, {})
        frag_ts = rec.get("frag_ts", {})
        frag_bloom = rec.get("frag_bloom", {})
        all_frags = rec.get("frags", [])
        kept_frags = 0
        for f in all_frags:
            stats = frag_ts.get(f)
            if stats is not None and below_cutoff(stats[1]):
                if explain is not None:
                    explain["frags_pruned_ts"] += 1
                continue
            if not bloom_ok(frag_bloom.get(f)):
                if explain is not None:
                    explain["frags_pruned_bloom"] += 1
                continue
            if explain is not None:
                explain["frags_kept"] += 1
            files.append(f)
            kept_frags += 1
        # planner ESTIMATE only: fragment rows are recorded per range, not
        # per file, so scale pro-rata by the surviving fragment count —
        # keeps the BlockMetadata num_rows consistent with the base-side
        # pruning instead of over-counting pruned fragments
        frag_rows = int(rec.get("rows", 0))
        if all_frags:
            rows += (frag_rows * kept_frags) // len(all_frags)
        if files:
            parts.append({"range_id": rid, "files": files, "rows": rows})
    return parts


def _merge_read_range(
    lake_dir: str, files: list[str], schema_json, include_internal: bool,
    conv_ids: list[str] | None = None, keep_tombstones: bool = False,
    min_ts_us: int | None = None, where: dict | None = None,
) -> pa.Table:
    """Merge-read one range: LWW-fold its base+fragment files, drop
    tombstones, unify historical pre-DDL schemas to the committed one.
    `conv_ids` filters each file BEFORE the merge — safe because the LWW
    fold is independent per (conv_id, turn_idx) key. `min_ts_us` also
    filters pre-merge: a row with ts < cutoff can neither be an in-slice
    winner (the output needs winner ts >= cutoff) nor beat one (LWW
    (ts, lsn) order), so dropping it before the fold changes nothing —
    the row-level twin of _range_plan's file-level pruning."""
    import pyarrow.dataset as pads

    from datax_ray.schemas import schema_from_json
    from datax_ray.stages.merge import merge_states

    target = schema_from_json(schema_json)
    tracker = SchemaTracker(target)
    # Predicate PUSHDOWN into the parquet reader: bases and fragments are
    # written sorted by (conv_id, turn_idx) with bounded row groups
    # (stages/delta.py), so conv_id row-group statistics skip whole row
    # groups of a point read before decompression — the third data-skipping
    # tier after manifest range pruning and file-level ts stats.
    flt = None
    if conv_ids is not None:
        flt = pads.field("conv_id").isin(pa.array(conv_ids, pa.string()))
    if min_ts_us is not None:
        ts_ok = pads.field("ts") >= pa.scalar(min_ts_us, pa.timestamp("us"))
        flt = ts_ok if flt is None else (flt & ts_ok)
    fs = fs_for(lake_dir)
    tables = []
    for f in files:
        t = pq.read_table(fs.open_input(os.path.join(lake_dir, f)), filters=flt)
        tables.append(tracker.unify(t))
    state = merge_states(tables, target)
    if not keep_tombstones:
        state = state.filter(pc.fill_null(pc.invert(state[DELETED_COL]), True))
    if where:
        # Payload predicates apply POST-merge, inside the task: pre-merge
        # filtering on a payload column would be WRONG (a losing version
        # could match while the true LWW winner does not — the winner must
        # be found first, then tested). Rows still never leave the task.
        for col, val in where.items():
            if val is None:
                mask = pc.is_null(state[col])
            else:
                mask = pc.fill_null(pc.equal(state[col], val), False)
            state = state.filter(mask)
    return state if include_internal else state.drop_columns(list(INTERNAL_COLS))


class LakeDatasource(ray.data.Datasource):
    """Custom `ray.data.Datasource` over the committed lake (SURVEY §2A
    row 3's keyed-range reader): one ReadTask per partition-RANGE, each
    carrying real BlockMetadata (row counts from the manifest, on-disk
    bytes, input files) so Ray's planner sees size/locality per task —
    the pattern to copy for new keyed-range sources."""

    def __init__(
        self,
        lake_dir: str,
        include_internal: bool = False,
        as_of_epoch: int | None = None,
        conv_ids: list[str] | None = None,
        keep_tombstones: bool = False,
        min_ts=None,
        where: dict | None = None,
        where_index_dir: str | None = None,
    ):
        from datax_ray.schemas import schema_to_json

        self._lake_dir = lake_dir
        self._include_internal = include_internal
        self._keep_tombstones = keep_tombstones
        self._min_ts_us = _ts_us(min_ts)
        self._where = dict(where) if where else None
        self._conv_ids = sorted(set(conv_ids)) if conv_ids is not None else None
        m = Manifest(lake_dir)
        if as_of_epoch is not None and m.at_epoch(as_of_epoch) is None:
            raise ValueError(
                f"no committed manifest at or before epoch {as_of_epoch} "
                "(never committed, or dropped by vacuum)"
            )
        self._schema = m.committed_schema(as_of_epoch) or LAKE_SCHEMA
        self._schema_json = schema_to_json(self._schema)
        only_rids = (
            _lookup_rids(
                m.committed_layout(as_of_epoch) or {},
                self._conv_ids,
                m.committed_turn_bounds(as_of_epoch),
            )
            if self._conv_ids is not None
            else None
        )
        probe = None
        if self._conv_ids:
            from datax_ray.state.bloom import _probe_hashes

            probe = _probe_hashes(self._conv_ids)
        self._explain: dict = {
            "hash_routing": "on" if only_rids is not None else "off (full scan"
            " or salted layout)",
            "bloom_probe": "on" if probe is not None else "off",
            "ts_cutoff": self._min_ts_us,
            "value_index": "off",
        }
        self._parts = _range_plan(
            lake_dir, m, as_of_epoch, only_rids=only_rids,
            min_ts_us=self._min_ts_us, probe=probe, explain=self._explain,
        )
        if self._where and where_index_dir:
            # payload-value index pruning (pipelines/colindex.py): keep a
            # range only if its LIVE value set may satisfy the predicate —
            # stale/unindexed ranges always stay (safe under lag). Only
            # meaningful for the latest state: an as_of read predates the
            # index's refresh point, so skip pruning for time travel.
            if as_of_epoch is None:
                from datax_ray.pipelines.colindex import value_index_rids

                before = len(self._parts)
                rids = value_index_rids(where_index_dir, self._parts, self._where)
                if rids is not None:
                    self._parts = [
                        p for p in self._parts if int(p["range_id"]) in rids
                    ]
                    self._explain["value_index"] = "on"
                    self._explain["ranges_pruned_value_index"] = (
                        before - len(self._parts)
                    )
                else:
                    self._explain["value_index"] = (
                        "abstained (stale index or unindexed column)"
                    )
            else:
                self._explain["value_index"] = "skipped (time travel)"

        self._explain["ranges_planned"] = len(self._parts)
        self._explain["files_planned"] = sum(
            len(p["files"]) for p in self._parts
        )
        self._explain["estimated_rows"] = sum(p["rows"] for p in self._parts)

    def get_name(self) -> str:
        return "DataxLake"

    def estimate_inmemory_data_size(self) -> int | None:
        return sum(self._disk_bytes(p["files"]) for p in self._parts) or None

    def _disk_bytes(self, files: list[str]) -> int:
        fs = fs_for(self._lake_dir)
        total = 0
        for f in files:
            try:
                total += fs.size(os.path.join(self._lake_dir, f))
            except OSError:
                pass
        return total

    def get_read_tasks(self, parallelism: int) -> list:
        from ray.data.block import BlockMetadata
        from ray.data.datasource import ReadTask

        lake_dir, schema_json, internal, conv_ids, tombs, min_ts_us, where = (
            self._lake_dir,
            self._schema_json,
            self._include_internal,
            self._conv_ids,
            self._keep_tombstones,
            self._min_ts_us,
            self._where,
        )
        tasks = []
        for p in self._parts:
            files = list(p["files"])
            # num_rows must stay None: Ray trusts BlockMetadata.num_rows as
            # EXACT (Dataset.count() sums it without executing), but the
            # stored row count is pre-merge — LWW folding, tombstone drops
            # and conv_ids/min_ts filters all shrink the output. size_bytes
            # still feeds the scheduler its scale estimate.
            meta = BlockMetadata(
                num_rows=None,
                size_bytes=self._disk_bytes(files) or None,
                exec_stats=None,
                input_files=[os.path.join(lake_dir, f) for f in files],
            )

            def read_fn(files=files):
                yield _merge_read_range(
                    lake_dir, files, schema_json, internal, conv_ids, tombs,
                    min_ts_us, where,
                )

            tasks.append(ReadTask(read_fn, meta))
        return tasks


def read_lake(
    lake_dir: str,
    *,
    include_internal: bool = False,
    as_of_epoch: int | None = None,
    conv_ids: list[str] | None = None,
    keep_tombstones: bool = False,
    min_ts=None,
    where: dict | None = None,
    where_index_dir: str | None = None,
) -> ray.data.Dataset:
    """Committed lake state as a Dataset (live rows only unless asked):
    one merge-read task per partition range via LakeDatasource, streaming —
    never materializes the lake on the driver. `as_of_epoch` reads the
    lake AS OF that committed epoch (time travel over retained manifests —
    any epoch `vacuum` hasn't dropped). `conv_ids` is a keyed point
    lookup: the plan is pruned to the ranges that can hold those keys
    (manifest-only hash routing, no storage reads for other ranges), and
    rows are filtered to exactly those conversations; with a salted
    layout the plan can't prune (keys spread by design) but the filter
    still applies. `keep_tombstones` (with include_internal) returns the
    full internal state INCLUDING delete markers — the state-handoff view
    a downstream CDC consumer needs so late out-of-order events in a
    subsequent change-feed window cannot resurrect deleted keys.
    `min_ts` (ISO string / datetime / µs int) is a time-slice read: only
    final-state rows whose winning event-time is >= the cutoff, with
    whole files pruned from the plan via the manifest's per-file ts stats
    (data skipping — an incremental consumer of a 100 TB lake opens only
    files that can hold in-slice rows, no storage reads for the rest).
    `where` is a {column: value} equality filter applied POST-merge inside
    each read task (value None matches null): payload predicates must see
    the LWW winner, so they cannot prune files or pre-filter — but the
    non-matching rows are dropped before ever leaving the task.
    `where_index_dir` points at a value index (pipelines/colindex.py)
    over one payload column: ranges whose LIVE value set provably lacks
    the predicate value are pruned from the plan (per-range fingerprints
    guard staleness — a lagging index stops pruning, never mis-prunes)."""
    src = LakeDatasource(
        lake_dir,
        include_internal=include_internal,
        as_of_epoch=as_of_epoch,
        conv_ids=conv_ids,
        keep_tombstones=keep_tombstones,
        min_ts=min_ts,
        where=where,
        where_index_dir=where_index_dir,
    )
    if not src._parts:
        out_schema = src._schema if include_internal else pa.schema(
            [f for f in src._schema if f.name not in INTERNAL_COLS]
        )
        return ray.data.from_arrow(out_schema.empty_table())
    return ray.data.read_datasource(src, override_num_blocks=len(src._parts))


def final_table(
    lake_dir: str,
    as_of_epoch: int | None = None,
    conv_ids: list[str] | None = None,
) -> pa.Table:
    """Materialized final state sorted by (conv_id, turn_idx) — the
    verification view (BASELINE.json: per-turn text equality under stable
    turn ordering). Only for test/small-scale use: materializes.
    `conv_ids` restricts to a keyed sample via the manifest-pruned point
    read — O(sample), the sampled auditor's view."""
    batches = [
        b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
        for b in read_lake(
            lake_dir, as_of_epoch=as_of_epoch, conv_ids=conv_ids
        ).iter_batches(batch_format="pyarrow", batch_size=65536)
    ]
    schema = pa.schema(
        [f for f in lake_schema(lake_dir, as_of_epoch) if f.name not in INTERNAL_COLS]
    )
    if not batches:
        return schema.empty_table()
    t = pa.concat_tables(batches)
    return t.take(
        pc.sort_indices(
            t, sort_keys=[("conv_id", "ascending"), ("turn_idx", "ascending")]
        )
    )
