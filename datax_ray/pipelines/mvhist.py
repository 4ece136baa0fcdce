"""ADDITIVE grouped-HISTOGRAM materialized view from the preimage change
feed — incremental distribution / quantile observability over the lake.

The view holds one row per (group_val, bucket) cell:
    group_val = the grouping column's value (default `role`)
    bucket    = floor(length(text) / bucket_width)
    n_rows    = live rows in the cell
    sum_len   = summed text length in the cell
Both measures are ADDITIVE under the Delta-CDF preimage algebra
(feed.py:read_change_feed_preimages): insert → +1/+len at the post cell,
delete → −1/−len at the pre cell, and an update subtracts at its OLD
(group, bucket) cell and adds at its NEW one — so a row that moves across
cells transfers mass exactly, with no lake range ever re-read. Refresh
cost is O(changed rows + touched cells), the same contract as mvadd.py
(whose two-phase crash-safe storage layout this module reuses: epoch-named
bucket-shard generations + one atomic state publish; retried refreshes
rewrite identical bytes at identical names).

The cell space is bounded (groups x buckets), so the view is tiny at any
lake scale — but the FOLD still runs distributed (feed partials are
combined per batch, then one hash exchange over N_BUCKETS shards), so a
high-cardinality group_col (e.g. conv_id) degrades gracefully instead of
serializing on the driver.

`group_col` and `bucket_width` are pinned in the view state at creation
(the sketch-p rule of sketchmv.py): a refresh with different params
raises instead of silently mixing two cell layouts in one view; omitted
params reuse the stored ones, so registry syncs need no config.

Read side: `read_mv_hist` returns the folded cells; `hist_quantiles`
turns them into per-group approximate percentiles (cumulative walk +
linear interpolation inside the hit bucket — error bounded by
bucket_width) in O(cells) on the driver.

Vacuumed-gap and rebuild semantics are identical to mvadd.py: if the
epochs since the last refresh were vacuumed the incremental fold refuses
loudly, and `rebuild=True` recomputes from one streaming pass of the
live lake, re-anchoring the watermark.
"""

from __future__ import annotations

import glob as _glob
import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

_STATE = "_mvhist_state.json"
N_BUCKETS = 16  # exchange shards (cells hash across these), not histogram bins

VIEW_SCHEMA = pa.schema(
    [
        ("group_val", pa.string()),
        ("bucket", pa.int64()),
        ("n_rows", pa.int64()),
        ("sum_len", pa.int64()),
    ]
)


def _load_state(d: str) -> dict:
    from datax_ray.state.fs import fs_for, read_json

    p = os.path.join(d, _STATE)
    return read_json(p) if fs_for(p).exists(p) else {}


def _save_state(d: str, state: dict) -> None:
    from datax_ray.state.fs import fs_for, json_bytes

    p = os.path.join(d, _STATE)
    fs_for(p).put(p, json_bytes(state))


def _shard_of(group_val: pa.Array, bucket: pa.Array) -> pa.Array:
    from datax_ray.functions.relational import key_buckets

    return key_buckets(
        pa.table({"group_val": group_val, "bucket": bucket}),
        ["group_val", "bucket"],
        N_BUCKETS,
    )


def _cell_partials(t: pa.Table, group_col: str, width: int, signed: bool) -> pa.Table:
    """Rows → per-(shard, group, bucket) additive partials. Combiner:
    shrinks each batch to at most its distinct touched cells before the
    shard exchange. `signed=False` is the rebuild path (every live row
    counts +1)."""
    if signed:
        sign = pc.if_else(
            pc.is_in(
                t["_change_type"],
                value_set=pa.array(["insert", "update_postimage"]),
            ),
            pa.scalar(1, pa.int64()),
            pa.scalar(-1, pa.int64()),
        )
    else:
        sign = pa.array(np.ones(t.num_rows, np.int64), pa.int64())
    length = pc.cast(pc.fill_null(pc.utf8_length(t["text"]), 0), pa.int64())
    d = pa.table(
        {
            "group_val": pc.cast(t[group_col], pa.string()),
            # int64 / int is Arrow trunc-division == floor for lengths >= 0
            "bucket": pc.divide(length, width),
            "dn": sign,
            "dlen": pc.multiply(sign, length),
        }
    )
    g = (
        d.group_by(["group_val", "bucket"], use_threads=False)
        .aggregate([("dn", "sum"), ("dlen", "sum")])
        .rename_columns(["group_val", "bucket", "dn", "dlen"])
    )
    return g.append_column(
        "_shard",
        _shard_of(g["group_val"].combine_chunks(), g["bucket"].combine_chunks()),
    )


class _ShardFolder:
    """map_groups over one shard's cell deltas: fold into the old shard
    file, drop zeroed cells, write the target-epoch file. Output content
    is a deterministic function of (old file, delta sums) — retried tasks
    rewrite identical bytes at identical names."""

    def __init__(self, mv_dir: str, old_files: dict, to_epoch: int):
        self.__name__ = "_ShardFolder"
        self.mv_dir = mv_dir
        self.old_files = old_files
        self.to_epoch = to_epoch

    def __call__(self, g: pa.Table) -> pa.Table:
        import pyarrow.parquet as pq

        shard = int(g["_shard"][0].as_py())
        old_rel = self.old_files.get(str(shard))
        if old_rel:
            old = pq.read_table(__import__('datax_ray.state.fs', fromlist=['open_parquet']).open_parquet(os.path.join(self.mv_dir, old_rel)))
        else:
            old = VIEW_SCHEMA.empty_table()
        merged = (
            pa.concat_tables(
                [
                    old,
                    pa.table(
                        {
                            "group_val": g["group_val"],
                            "bucket": g["bucket"],
                            "n_rows": g["dn"],
                            "sum_len": g["dlen"],
                        }
                    ),
                ]
            )
            .group_by(["group_val", "bucket"], use_threads=False)
            .aggregate([("n_rows", "sum"), ("sum_len", "sum")])
            .rename_columns(["group_val", "bucket", "n_rows", "sum_len"])
        )
        merged = merged.filter(pc.not_equal(merged["n_rows"], 0)).sort_by(
            [("group_val", "ascending"), ("bucket", "ascending")]
        )
        rel = f"h={shard:04d}-e={self.to_epoch:06d}.parquet"
        from datax_ray.state.fs import put_parquet

        put_parquet(merged, os.path.join(self.mv_dir, rel),
                    compression="zstd", compression_level=1)
        return pa.table(
            {
                "shard": pa.array([shard], pa.int64()),
                "file": pa.array([rel], pa.string()),
                "cells": pa.array([merged.num_rows], pa.int64()),
            }
        )


def _resolve_params(
    state: dict, group_col: str | None, bucket_width: int | None
) -> tuple[str, int]:
    """Pin-at-creation: stored params win; explicit params must match the
    stored ones; first creation takes explicit-or-default."""
    stored_g = state.get("group_col")
    stored_w = state.get("bucket_width")
    if stored_g is not None:
        if group_col is not None and group_col != stored_g:
            raise ValueError(
                f"view is pinned to group_col={stored_g!r}; refusing "
                f"group_col={group_col!r} (one view, one cell layout)"
            )
        if bucket_width is not None and int(bucket_width) != int(stored_w):
            raise ValueError(
                f"view is pinned to bucket_width={stored_w}; refusing "
                f"bucket_width={bucket_width}"
            )
        return stored_g, int(stored_w)
    g = group_col if group_col is not None else "role"
    w = int(bucket_width) if bucket_width is not None else 64
    if w <= 0:
        raise ValueError(f"bucket_width must be positive, got {w}")
    return g, w


def refresh_mv_hist(
    lake_dir: str,
    mv_dir: str,
    group_col: str | None = None,
    bucket_width: int | None = None,
    rebuild: bool = False,
) -> dict:
    """Fold the preimage feed since the last applied epoch into the
    histogram view. Returns {"applied_from", "applied_to",
    "shards_touched", "cells"}."""
    from datax_ray.pipelines.feed import read_change_feed_preimages
    from datax_ray.state.manifest import Manifest

    m = Manifest(lake_dir)
    committed = m.committed_epoch()
    if committed < 0:
        raise ValueError(f"no committed lake at {lake_dir}")
    state = _load_state(mv_dir)
    gcol, width = _resolve_params(state, group_col, bucket_width)
    applied = int(state.get("applied_epoch", -1))
    from datax_ray.state.fs import is_remote as _is_remote

    if not _is_remote(mv_dir):
        os.makedirs(mv_dir, exist_ok=True)

    if rebuild:
        return _rebuild(lake_dir, mv_dir, committed, gcol, width)
    if applied >= committed:
        return {
            "applied_from": applied,
            "applied_to": applied,
            "shards_touched": 0,
            "cells": int(state.get("cells", 0)),
        }
    if applied >= 0 and m.at_epoch(applied) is None:
        raise ValueError(
            f"epochs since {applied} were vacuumed — additive refresh "
            "cannot replay them; run with rebuild=True"
        )

    deltas = read_change_feed_preimages(lake_dir, applied, committed).map_batches(
        lambda t: _cell_partials(t, gcol, width, signed=True),
        batch_format="pyarrow",
    )
    old_files = dict(state.get("shards", {}))
    lineage = (
        deltas.groupby("_shard")
        .map_groups(
            _ShardFolder(mv_dir, old_files, committed), batch_format="pyarrow"
        )
        .take_all()
    )  # O(touched shards) tiny rows
    return _publish(mv_dir, state, old_files, lineage, committed, gcol, width,
                    applied_from=applied)


def _publish(
    mv_dir: str, state: dict, old_files: dict, lineage: list, committed: int,
    gcol: str, width: int, applied_from: int,
) -> dict:
    new_files = dict(old_files)
    shard_cells = dict(state.get("shard_cells", {}))
    for r in lineage:
        new_files[str(int(r["shard"]))] = r["file"]
        shard_cells[str(int(r["shard"]))] = int(r["cells"])
    total = sum(shard_cells.values())
    _save_state(
        mv_dir,
        {
            "applied_epoch": committed,
            "group_col": gcol,
            "bucket_width": width,
            "shards": new_files,
            "shard_cells": shard_cells,
            "cells": total,
        },
    )
    live = {os.path.join(mv_dir, f) for f in new_files.values()}
    from datax_ray.state.fs import fs_for as _ffc

    for p in _ffc(mv_dir).list_prefix(mv_dir):
        name = os.path.basename(p)
        if (name.startswith("h=") and name.endswith(".parquet")
                and p not in live):
            _ffc(mv_dir).delete(p)
    return {
        "applied_from": applied_from,
        "applied_to": committed,
        "shards_touched": len(lineage),
        "cells": total,
    }


def _rebuild(
    lake_dir: str, mv_dir: str, committed: int, gcol: str, width: int
) -> dict:
    """One streaming pass of the live lake → fresh view (vacuum fallback /
    bootstrap), re-anchoring the watermark."""
    from datax_ray.sinks.lake import read_lake

    from datax_ray.state.fs import fs_for as _ffr

    for p in _ffr(mv_dir).list_prefix(mv_dir):
        name = os.path.basename(p)
        if name.startswith("h=") and name.endswith(".parquet"):
            _ffr(mv_dir).delete(p)
    lineage = (
        read_lake(lake_dir)
        .map_batches(
            lambda t: _cell_partials(t, gcol, width, signed=False),
            batch_format="pyarrow",
        )
        .groupby("_shard")
        .map_groups(_ShardFolder(mv_dir, {}, committed), batch_format="pyarrow")
        .take_all()
    )
    return _publish(mv_dir, {}, {}, lineage, committed, gcol, width,
                    applied_from=-1)


def read_mv_hist(mv_dir: str) -> ray.data.Dataset:
    """The folded cells as a Dataset (shards are disjoint and pre-folded —
    no combine at read time)."""
    state = _load_state(mv_dir)
    files = [
        os.path.join(mv_dir, f) for f in sorted(state.get("shards", {}).values())
    ]
    from datax_ray.state.fs import read_parquet_dataset

    return read_parquet_dataset(files, VIEW_SCHEMA)


def hist_quantiles(mv_dir: str, qs: list[float]) -> pa.Table:
    """Per-group approximate quantiles of text length from the folded
    cells: cumulative walk over the (sorted) buckets + linear
    interpolation inside the hit bucket. Error ≤ bucket_width. O(cells)
    driver-side — the view is bounded by groups x buckets regardless of
    lake size."""
    import pyarrow.parquet as pq

    state = _load_state(mv_dir)
    width = int(state.get("bucket_width", 64))
    files = [os.path.join(mv_dir, f) for f in sorted(state.get("shards", {}).values())]
    if not files:
        return pa.table(
            {"group_val": pa.array([], pa.string()),
             "q": pa.array([], pa.float64()),
             "value": pa.array([], pa.float64())}
        )
    t = pa.concat_tables([pq.read_table(f) for f in files]).sort_by(
        [("group_val", "ascending"), ("bucket", "ascending")]
    )
    groups_out, qs_out, vals_out = [], [], []
    gv = t["group_val"].to_pylist()
    bk = t["bucket"].to_numpy(zero_copy_only=False)
    nn = t["n_rows"].to_numpy(zero_copy_only=False)
    start = 0
    for i in range(1, len(gv) + 1):
        if i == len(gv) or gv[i] != gv[start]:
            b, n = bk[start:i], nn[start:i]
            cum = np.cumsum(n)
            total = cum[-1]
            for q in qs:
                target = q * total
                j = int(np.searchsorted(cum, target, side="left"))
                j = min(j, len(b) - 1)
                prev = cum[j - 1] if j > 0 else 0
                frac = (target - prev) / n[j] if n[j] > 0 else 0.0
                vals_out.append(float(b[j] * width + frac * width))
                groups_out.append(gv[start])
                qs_out.append(float(q))
            start = i
    return pa.table(
        {
            "group_val": pa.array(groups_out, pa.string()),
            "q": pa.array(qs_out, pa.float64()),
            "value": pa.array(vals_out, pa.float64()),
        }
    )
