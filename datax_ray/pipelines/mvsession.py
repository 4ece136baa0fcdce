"""Incrementally-maintained SESSION-WINDOW view of the transcript lake —
the gap-window member of the MV family (mv.py recompute / mvadd.py additive
fold / mvjoin.py delta-keyed join / mvwindow.py watermarked tumbling):

View contents: per (conv_id, session_idx) gap-based sessions over the
conv's LIVE turns — a new session starts when the event-time gap to the
previous turn exceeds `gap_s` — with start_ts, end_ts, n_turns, sum_chars.

Why delta-KEYED recompute (not additive fold): session windows MERGE and
SPLIT — one inserted turn can weld two sessions into one, one delete can
split a session in two — so per-cell ± deltas cannot maintain them. But
sessions of different conversations are independent, so the honest
incremental unit is the CONVERSATION: distinct conv_ids of the change feed
(id-only combiner rows) select which convs re-sessionize, their live turns
come from a manifest-pruned point-read AS OF the target epoch (hash-routing
+ Bloom pruning open only affected ranges), and each view bucket drops the
changed convs' old rows and splices the freshly-computed sessions in.
Refresh cost is O(changed convs' turns), never O(lake); past
`max_point_keys` changed convs a streaming full-scan fallback kicks in
(filtered in-bucket to the changed set, same result).

Sessionization itself is fully vectorized in-bucket (one Arrow sort +
numpy boundary masks over ALL convs of the bucket at once — the kernel of
functions/windows.py:sessionize extended with char sums); conv-hash
bucketing guarantees every turn of a conv lands in the same group.

Storage/publish protocol is the family's: bucket generations
`b=NNNN-e=EEEEEE.parquet` derived deterministically from (old file, group
content) — retried tasks rewrite identical bytes — one atomic
`_mvsession_state.json` replace publishes, untouched buckets keep their
old file. Deletes propagate (a fully-deleted conv leaves the view);
vacuumed-history `rebuild=True` re-sessionizes everything in one streaming
pass.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

_STATE = "_mvsession_state.json"
N_BUCKETS = 64

_VIEW_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("session_idx", pa.int64()),
        ("start_ts", pa.timestamp("us")),
        ("end_ts", pa.timestamp("us")),
        ("n_turns", pa.int64()),
        ("sum_chars", pa.int64()),
    ]
)


def _load_state(d: str) -> dict:
    from datax_ray.state.fs import fs_for, read_json

    p = os.path.join(d, _STATE)
    return read_json(p) if fs_for(p).exists(p) else {}


def _save_state(d: str, state: dict) -> None:
    # atomic full-object put (state/fs.py): artifacts share the lake's
    # object-store-safe storage contract
    from datax_ray.state.fs import fs_for, json_bytes

    p = os.path.join(d, _STATE)
    fs_for(p).put(p, json_bytes(state))


def _bucket_of(conv: pa.Array) -> pa.Array:
    from datax_ray.functions.relational import key_buckets

    return key_buckets(pa.table({"conv_id": conv}), ["conv_id"], N_BUCKETS)


def _sessionize_table(t: pa.Table, gap_us: int) -> pa.Table:
    """(conv_id, ts, text) live turns → one row per (conv, session):
    vectorized across every conv in the table at once."""
    if t.num_rows == 0:
        return _VIEW_SCHEMA.empty_table()
    idx = pc.sort_indices(
        t, sort_keys=[("conv_id", "ascending"), ("ts", "ascending")]
    )
    t = t.take(idx)
    n = t.num_rows
    ts = pc.cast(t["ts"], pa.int64()).to_numpy()
    conv = t["conv_id"].to_numpy(zero_copy_only=False)
    chars = (
        pc.cast(pc.fill_null(pc.utf8_length(t["text"]), 0), pa.int64())
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    new = np.ones(n, dtype=np.int64)
    if n > 1:
        same = conv[1:] == conv[:-1]
        new[1:] = (~same) | ((ts[1:] - ts[:-1]) > gap_us)
    gsid = np.cumsum(new) - 1
    conv_starts = np.flatnonzero(np.r_[True, conv[1:] != conv[:-1]])
    counts = np.diff(np.r_[conv_starts, n])
    sid = gsid - np.repeat(gsid[conv_starts], counts)  # 0-based per conv
    g = (
        pa.table(
            {
                "conv_id": t["conv_id"],
                "session_idx": pa.array(sid, pa.int64()),
                "ts": t["ts"],
                "chars": pa.array(chars, pa.int64()),
            }
        )
        .group_by(["conv_id", "session_idx"], use_threads=False)
        .aggregate(
            [("ts", "min"), ("ts", "max"), ([], "count_all"), ("chars", "sum")]
        )
        .rename_columns(
            ["conv_id", "session_idx", "start_ts", "end_ts", "n_turns", "sum_chars"]
        )
    )
    return g.select(_VIEW_SCHEMA.names).cast(_VIEW_SCHEMA)


class _SessionBucketFolder:
    """map_groups over one view bucket's union slice (_k=0 changed-key
    markers, _k=1 fresh live turns): drop the old generation's rows of the
    changed convs, sessionize the fresh turns, splice, write the
    target-epoch generation file. Deterministic → crash-retry rewrites
    identical bytes."""

    def __init__(self, mv_dir: str, old_files: dict, to_epoch: int,
                 gap_us: int, rebuild: bool):
        self.__name__ = "_SessionBucketFolder"
        self.mv_dir = mv_dir
        self.old_files = old_files
        self.to_epoch = to_epoch
        self.gap_us = gap_us
        self.rebuild = rebuild

    def __call__(self, g: pa.Table) -> pa.Table:
        import pyarrow.parquet as pq

        b = int(g["_b"][0].as_py())
        kind = g["_k"]
        fresh_rows = g.filter(pc.equal(kind, 1))
        if self.rebuild:
            old = _VIEW_SCHEMA.empty_table()
        else:
            keys = pc.unique(
                g.filter(pc.equal(kind, 0))["conv_id"].combine_chunks()
            )
            old_rel = self.old_files.get(str(b))
            if old_rel:
                from datax_ray.state.fs import open_parquet

                old = pq.read_table(
                    open_parquet(os.path.join(self.mv_dir, old_rel))
                )
                old = old.filter(
                    pc.invert(pc.is_in(old["conv_id"], value_set=keys))
                )
            else:
                old = _VIEW_SCHEMA.empty_table()
            # full-scan fallback ships unchanged convs too: keep only rows
            # of keys this refresh touched (no-op on the point-read path)
            fresh_rows = fresh_rows.filter(
                pc.is_in(fresh_rows["conv_id"], value_set=keys)
            )
        fresh = _sessionize_table(
            fresh_rows.select(["conv_id", "ts", "text"]), self.gap_us
        )
        merged = pa.concat_tables([old, fresh]).sort_by(
            [("conv_id", "ascending"), ("session_idx", "ascending")]
        )
        if merged.num_rows == 0:
            return pa.table(
                {
                    "bucket": pa.array([b], pa.int64()),
                    "file": pa.array([""], pa.string()),
                    "rows": pa.array([0], pa.int64()),
                }
            )
        rel = f"b={b:04d}-e={self.to_epoch:06d}.parquet"
        from datax_ray.state.fs import put_parquet

        put_parquet(merged, os.path.join(self.mv_dir, rel),
                    compression="zstd", compression_level=1)
        return pa.table(
            {
                "bucket": pa.array([b], pa.int64()),
                "file": pa.array([rel], pa.string()),
                "rows": pa.array([merged.num_rows], pa.int64()),
            }
        )


def _tag(kind: int):
    def apply(t: pa.Table) -> pa.Table:
        out = pa.table(
            {
                "conv_id": pc.cast(t["conv_id"], pa.string()),
                "ts": pc.cast(t["ts"], pa.timestamp("us"))
                if "ts" in t.column_names
                else pa.nulls(t.num_rows, pa.timestamp("us")),
                "text": pc.cast(t["text"], pa.string())
                if "text" in t.column_names
                else pa.nulls(t.num_rows, pa.string()),
            }
        )
        out = out.append_column("_k", pa.array([kind] * out.num_rows, pa.int8()))
        return out.append_column(
            "_b", _bucket_of(out["conv_id"].combine_chunks())
        )

    return apply


def refresh_mv_session(
    lake_dir: str,
    mv_dir: str,
    gap_s: float | None = None,
    rebuild: bool = False,
    max_point_keys: int = 100_000,
) -> dict:
    """Bring the session view up to the lake's committed head. Returns
    {"applied_from", "applied_to", "buckets_touched", "rows",
    "changed_convs"}."""
    from datax_ray.sinks.lake import read_lake
    from datax_ray.state.manifest import Manifest

    m = Manifest(lake_dir)
    committed = m.committed_epoch()
    if committed < 0:
        raise ValueError(f"no committed lake at {lake_dir}")
    state = _load_state(mv_dir)
    if state:
        if gap_s is not None and gap_s != state["gap_s"] and not rebuild:
            raise ValueError(
                f"view was created with gap_s={state['gap_s']}; got "
                f"{gap_s} — sessions cannot be re-keyed incrementally "
                "(rebuild=True to re-create)"
            )
        if gap_s is None:  # omitted -> reuse stored, rebuild or not
            gap_s = state["gap_s"]
    if gap_s is None:
        gap_s = 1800.0
    applied = int(state.get("applied_epoch", -1))
    from datax_ray.state.fs import is_remote as _is_remote

    if not _is_remote(mv_dir):
        os.makedirs(mv_dir, exist_ok=True)
    gap_us = int(gap_s * 1_000_000)

    if not rebuild:
        if applied >= committed:
            return {
                "applied_from": applied,
                "applied_to": applied,
                "buckets_touched": 0,
                "rows": int(state.get("rows", 0)),
                "changed_convs": 0,
            }
        if applied >= 0 and m.at_epoch(applied) is None:
            raise ValueError(
                f"epochs since {applied} were vacuumed — run with "
                "rebuild=True"
            )

    if rebuild:
        # old generations stay on disk until the atomic state publish —
        # a crashed rebuild leaves the previous view fully readable
        stream = read_lake(lake_dir, as_of_epoch=committed).map_batches(
            _tag(1), batch_format="pyarrow"
        )
        folder = _SessionBucketFolder(mv_dir, {}, committed, gap_us, True)
        lineage = (
            stream.groupby("_b")
            .map_groups(folder, batch_format="pyarrow")
            .take_all()
        )
        return _publish(mv_dir, {}, lineage, applied, committed, gap_s, 0,
                        state=None)

    from datax_ray.pipelines.feed import read_change_feed

    def uniq(t: pa.Table) -> pa.Table:
        ids = pc.unique(t["conv_id"].combine_chunks()).drop_null()
        return pa.table({"conv_id": pc.cast(ids, pa.string())})

    # Changed keys stay a DATASET: per-batch distinct ids, materialized as
    # tiny distributed blocks (never the driver). The sum of per-batch
    # distinct counts upper-bounds the true distinct count, so
    # `n_bound <= max_point_keys` certifies the point-read path — only
    # THEN do the (bounded) ids come to the driver, to feed the pruned
    # conv_ids read. Above the bound, keys route to buckets via the same
    # groupby the data takes and the refresh falls back to the full scan:
    # an epoch touching most keys at 100 TB never materializes the key
    # universe on the driver (round-3 review item 2).
    changed_ds = (
        read_change_feed(lake_dir, applied, committed)
        .map_batches(uniq, batch_format="pyarrow", batch_size=None)
        .materialize()
    )  # id-only blocks, O(changed convs) distributed
    n_bound = changed_ds.count()
    if n_bound == 0:
        _save_state(mv_dir, {**state, "applied_epoch": committed,
                             "gap_s": gap_s})
        return {
            "applied_from": applied,
            "applied_to": committed,
            "buckets_touched": 0,
            "rows": int(state.get("rows", 0)),
            "changed_convs": 0,
        }
    point = n_bound <= max_point_keys
    if point:
        changed = sorted({r["conv_id"] for r in changed_ds.take_all()})
        live = read_lake(lake_dir, as_of_epoch=committed, conv_ids=changed)
        key_tbl = pa.table({"conv_id": pa.array(changed, pa.string())})
        key_src = ray.data.from_arrow(_tag(0)(key_tbl))
        n_changed = len(changed)
    else:
        live = read_lake(lake_dir, as_of_epoch=committed)
        key_src = changed_ds.map_batches(_tag(0), batch_format="pyarrow")
        n_changed = n_bound  # upper bound (exact dedup happens per bucket)
    stream = key_src.union(
        live.map_batches(_tag(1), batch_format="pyarrow")
    )
    old_files = dict(state.get("buckets", {}))
    folder = _SessionBucketFolder(mv_dir, old_files, committed, gap_us, False)
    lineage = (
        stream.groupby("_b")
        .map_groups(folder, batch_format="pyarrow")
        .take_all()
    )  # O(touched buckets) tiny rows
    return _publish(mv_dir, old_files, lineage, applied, committed, gap_s,
                    n_changed, state)


def _publish(
    mv_dir: str, old_files: dict, lineage: list, applied: int, committed: int,
    gap_s: float, changed_convs: int, state: dict | None,
) -> dict:
    state = dict(state or {})
    new_files = dict(old_files)
    bucket_rows = dict(state.get("bucket_rows", {}))
    for r in lineage:
        b = str(int(r["bucket"]))
        if r["file"]:
            new_files[b] = r["file"]
            bucket_rows[b] = int(r["rows"])
        else:
            new_files.pop(b, None)
            bucket_rows.pop(b, None)
    total = sum(bucket_rows.values())
    _save_state(
        mv_dir,
        {
            "applied_epoch": committed,
            "gap_s": gap_s,
            "buckets": new_files,
            "bucket_rows": bucket_rows,
            "rows": total,
        },
    )
    from datax_ray.state.fs import fs_for as _ff

    live = {os.path.join(mv_dir, f) for f in new_files.values()}
    for p in _ff(mv_dir).list_prefix(mv_dir):
        name = os.path.basename(p)
        if name.startswith("b=") and name.endswith(".parquet") and p not in live:
            _ff(mv_dir).delete(p)
    return {
        "applied_from": applied,
        "applied_to": committed,
        "buckets_touched": len(lineage),
        "rows": total,
        "changed_convs": changed_convs,
    }


def read_mv_session(mv_dir: str) -> ray.data.Dataset:
    """The session view as a Dataset — buckets are disjoint and final."""
    from datax_ray.state.fs import read_parquet_dataset

    state = _load_state(mv_dir)
    files = [
        os.path.join(mv_dir, f)
        for f in sorted(state.get("buckets", {}).values())
    ]
    return read_parquet_dataset(files, _VIEW_SCHEMA)
