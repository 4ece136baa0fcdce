"""ADDITIVE materialized-view maintenance from the preimage change feed —
the second MV refresh strategy, complementary to pipelines/mv.py:

- `mv.py` (recompute): a range whose committed FILE SET changed is
  merge-read again. Cost O(changed ranges) — right when epochs touch few
  ranges, or for non-additive aggregates (max, distinct).
- this module (fold): the Delta-CDF preimage feed
  (feed.py:read_change_feed_preimages) yields exact +post/−pre deltas per
  epoch, so purely ADDITIVE stats fold into the stored view WITHOUT
  re-reading any lake range. Cost O(changed rows + touched view buckets)
  — right when every epoch touches most ranges (uniform CDC streams do),
  where the recompute rule degrades to O(lake) per refresh.

View contents: per-conversation (n_turns, sum_chars). Both are additive
under the feed algebra: insert → (+1, +len), delete → (−1, −len),
update_preimage/update_postimage → (−len_pre, +len_post) with the counts
cancelling. A conv whose n_turns reaches 0 leaves the view.

Storage: the view shards into fixed conv-hash buckets
(`<dir>/b=NNNN-e=EEEEEE.parquet`, one row per conv) + `_mvadd_state.json`
(applied epoch + the exact live file per bucket). Refresh is two-phase:
new bucket files carry the target epoch in their name and derive
deterministically from (old file content + order-independent delta sums),
so a crashed refresh leaves the state pointing at the old files and a
retry rewrites the same new files; ONE atomic state replace publishes.
Untouched buckets keep their old file — zero reads, zero writes.

Availability is bounded by manifest retention, like any feed consumer: if
vacuum dropped the epochs since the last refresh, `refresh_mv_additive`
raises and `rebuild=True` recomputes the view from one streaming pass of
the live lake (read_lake → combiner), re-anchoring the watermark.
"""

from __future__ import annotations

import glob as _glob
import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

_STATE = "_mvadd_state.json"
N_BUCKETS = 64


def _load_state(d: str) -> dict:
    from datax_ray.state.fs import fs_for, read_json

    p = os.path.join(d, _STATE)
    return read_json(p) if fs_for(p).exists(p) else {}


def _save_state(d: str, state: dict) -> None:
    from datax_ray.state.fs import fs_for, json_bytes

    p = os.path.join(d, _STATE)
    fs_for(p).put(p, json_bytes(state))


_VIEW_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("n_turns", pa.int64()),
        ("sum_chars", pa.int64()),
    ]
)


def _bucket_of(conv: pa.Array) -> pa.Array:
    from datax_ray.functions.relational import key_buckets

    return key_buckets(pa.table({"conv_id": conv}), ["conv_id"], N_BUCKETS)


def _delta_partials(t: pa.Table) -> pa.Table:
    """Feed rows → per-(bucket, conv) additive partials. Combiner: shrinks
    each feed batch before the bucket exchange."""
    sign = pc.if_else(
        pc.is_in(
            t["_change_type"],
            value_set=pa.array(["insert", "update_postimage"]),
        ),
        pa.scalar(1, pa.int64()),
        pa.scalar(-1, pa.int64()),
    )
    chars = pc.cast(
        pc.fill_null(pc.utf8_length(t["text"]), 0), pa.int64()
    )
    d = pa.table(
        {
            "conv_id": t["conv_id"],
            "dn": pc.if_else(
                pc.is_in(
                    t["_change_type"], value_set=pa.array(["insert", "delete"])
                ),
                sign,
                pa.scalar(0, pa.int64()),
            ),
            "dchars": pc.multiply(sign, chars),
        }
    )
    g = (
        d.group_by(["conv_id"], use_threads=False)
        .aggregate([("dn", "sum"), ("dchars", "sum")])
        .rename_columns(["conv_id", "dn", "dchars"])
    )
    return g.append_column("_b", _bucket_of(g["conv_id"].combine_chunks()))


class _BucketFolder:
    """map_groups stage over one view bucket's deltas: fold into the old
    bucket file, drop zeroed convs, write the target-epoch file. Output
    content is a deterministic function of (old file, delta sums), so a
    retried task rewrites identical bytes at the same name."""

    def __init__(self, mv_dir: str, old_files: dict, to_epoch: int):
        self.__name__ = "_BucketFolder"
        self.mv_dir = mv_dir
        self.old_files = old_files
        self.to_epoch = to_epoch

    def __call__(self, g: pa.Table) -> pa.Table:
        import pyarrow.parquet as pq

        b = int(g["_b"][0].as_py())
        old_rel = self.old_files.get(str(b))
        if old_rel:
            old = pq.read_table(__import__('datax_ray.state.fs', fromlist=['open_parquet']).open_parquet(os.path.join(self.mv_dir, old_rel)))
        else:
            old = _VIEW_SCHEMA.empty_table()
        merged = (
            pa.concat_tables(
                [
                    old,
                    pa.table(
                        {
                            "conv_id": g["conv_id"],
                            "n_turns": g["dn"],
                            "sum_chars": g["dchars"],
                        }
                    ),
                ]
            )
            .group_by(["conv_id"], use_threads=False)
            .aggregate([("n_turns", "sum"), ("sum_chars", "sum")])
            .rename_columns(["conv_id", "n_turns", "sum_chars"])
        )
        merged = merged.filter(pc.not_equal(merged["n_turns"], 0)).sort_by(
            "conv_id"
        )
        rel = f"b={b:04d}-e={self.to_epoch:06d}.parquet"
        from datax_ray.state.fs import put_parquet

        put_parquet(merged, os.path.join(self.mv_dir, rel),
                    compression="zstd", compression_level=1)
        return pa.table(
            {
                "bucket": pa.array([b], pa.int64()),
                "file": pa.array([rel], pa.string()),
                "convs": pa.array([merged.num_rows], pa.int64()),
            }
        )


def refresh_mv_additive(
    lake_dir: str, mv_dir: str, rebuild: bool = False
) -> dict:
    """Fold the preimage feed since the last applied epoch into the view.
    Returns {"applied_from", "applied_to", "buckets_touched", "convs"}."""
    from datax_ray.pipelines.feed import read_change_feed_preimages
    from datax_ray.state.manifest import Manifest

    m = Manifest(lake_dir)
    committed = m.committed_epoch()
    if committed < 0:
        raise ValueError(f"no committed lake at {lake_dir}")
    state = _load_state(mv_dir)
    applied = int(state.get("applied_epoch", -1))
    from datax_ray.state.fs import is_remote as _is_remote

    if not _is_remote(mv_dir):
        os.makedirs(mv_dir, exist_ok=True)

    if rebuild:
        return _rebuild(lake_dir, mv_dir, committed)
    if applied >= committed:
        return {
            "applied_from": applied,
            "applied_to": applied,
            "buckets_touched": 0,
            "convs": int(state.get("convs", 0)),
        }
    if applied >= 0 and m.at_epoch(applied) is None:
        raise ValueError(
            f"epochs since {applied} were vacuumed — additive refresh "
            "cannot replay them; run with rebuild=True"
        )

    deltas = read_change_feed_preimages(lake_dir, applied, committed).map_batches(
        _delta_partials, batch_format="pyarrow"
    )
    old_files = dict(state.get("buckets", {}))
    lineage = (
        deltas.groupby("_b")
        .map_groups(
            _BucketFolder(mv_dir, old_files, committed), batch_format="pyarrow"
        )
        .take_all()
    )  # O(touched buckets) tiny rows

    new_files = dict(old_files)
    touched_convs = 0
    for r in lineage:
        new_files[str(int(r["bucket"]))] = r["file"]
        touched_convs += int(r["convs"])
    untouched = sum(
        int(state.get("bucket_convs", {}).get(b, 0))
        for b in old_files
        if new_files[b] == old_files[b]
    )
    bucket_convs = dict(state.get("bucket_convs", {}))
    for r in lineage:
        bucket_convs[str(int(r["bucket"]))] = int(r["convs"])
    total = touched_convs + untouched

    _save_state(
        mv_dir,
        {
            "applied_epoch": committed,
            "buckets": new_files,
            "bucket_convs": bucket_convs,
            "convs": total,
        },
    )
    # old bucket generations are unreferenced now
    live = {os.path.join(mv_dir, f) for f in new_files.values()}
    from datax_ray.state.fs import fs_for as _ff

    for p in _ff(mv_dir).list_prefix(mv_dir):
        name = os.path.basename(p)
        if (name.startswith("b=") and name.endswith(".parquet")
                and p not in live):
            _ff(mv_dir).delete(p)
    return {
        "applied_from": applied,
        "applied_to": committed,
        "buckets_touched": len(lineage),
        "convs": total,
    }


def _rebuild(lake_dir: str, mv_dir: str, committed: int) -> dict:
    """One streaming pass of the live lake → fresh view, re-anchoring the
    watermark (the vacuum-fallback path; also a from-scratch bootstrap)."""
    from datax_ray.sinks.lake import read_lake

    def partial(t: pa.Table) -> pa.Table:
        chars = pc.cast(pc.fill_null(pc.utf8_length(t["text"]), 0), pa.int64())
        d = pa.table(
            {
                "conv_id": t["conv_id"],
                "dn": pa.array(np.ones(t.num_rows, np.int64), pa.int64()),
                "dchars": chars,
            }
        )
        g = (
            d.group_by(["conv_id"], use_threads=False)
            .aggregate([("dn", "sum"), ("dchars", "sum")])
            .rename_columns(["conv_id", "dn", "dchars"])
        )
        return g.append_column("_b", _bucket_of(g["conv_id"].combine_chunks()))

    from datax_ray.state.fs import fs_for as _ff2

    for p in _ff2(mv_dir).list_prefix(mv_dir):
        name = os.path.basename(p)
        if name.startswith("b=") and name.endswith(".parquet"):
            _ff2(mv_dir).delete(p)
    lineage = (
        read_lake(lake_dir)
        .map_batches(partial, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(_BucketFolder(mv_dir, {}, committed), batch_format="pyarrow")
        .take_all()
    )
    files = {str(int(r["bucket"])): r["file"] for r in lineage}
    bucket_convs = {str(int(r["bucket"])): int(r["convs"]) for r in lineage}
    total = sum(bucket_convs.values())
    _save_state(
        mv_dir,
        {
            "applied_epoch": committed,
            "buckets": files,
            "bucket_convs": bucket_convs,
            "convs": total,
        },
    )
    return {
        "applied_from": -1,
        "applied_to": committed,
        "buckets_touched": len(lineage),
        "convs": total,
    }


def read_mv_additive(mv_dir: str) -> ray.data.Dataset:
    """The view as a Dataset. Buckets are disjoint and already folded —
    one row per conv, NO combine step at read time (unlike the recompute
    MV, whose per-range partials must fold on read)."""
    state = _load_state(mv_dir)
    files = [
        os.path.join(mv_dir, f) for f in sorted(state.get("buckets", {}).values())
    ]
    from datax_ray.state.fs import read_parquet_dataset

    return read_parquet_dataset(files, _VIEW_SCHEMA)
