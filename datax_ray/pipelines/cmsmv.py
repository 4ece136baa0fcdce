"""Incremental TURNSTILE Count-Min sketch MV from the preimage change
feed — approximate per-conversation live-turn counts in O(depth x width)
space (the default 4x1024 int64 cells = 32 KiB), kept exact-to-the-feed
after every epoch with NO lake rescans.

Turnstile = the signed-update CMS model: insert → +1, delete → −1 at the
key's hashed cells, update pre/post images cancel (the key — the
conversation — cannot change under an update; keys/ts immutability is
enforced at ingest). Because only rows that exist are ever deleted,
every cell stays the exact sum of the non-negative key counts hashing
into it, so the classic overestimate guarantee (point estimate >= true
count) survives deletion — unlike a sampled or counter-decay scheme.

Contrast with the engine's other frequency surfaces:
- `mvadd` / `mvhist` hold EXACT per-key cells — right when the key space
  is bounded (convs in a view shard, role x bucket).
- this MV holds a CONSTANT 32 KiB regardless of key cardinality — the
  10^10-scale shape for "how many live turns does conv X have, roughly,
  right now" monitoring, where an exact per-conv view is itself a lake.
- `sketchmv` (HLL) answers set cardinality; this answers per-key
  frequency.

The key is the conversation ORDINAL (the integer after 'conv-'), hashed
through the same fixed fmix32 chain as the batch CMS operator
(functions/sketch.py:_cms_cols) — deterministic, so the DuckDB oracle
reproduces every cell of the folded registers against the LWW-final
state (query `cdc_cms_mv`).

Storage: ONE epoch-named parquet of (cms_row, cms_col, cnt) cells
(zero-count cells dropped, sorted) + `_cmsmv_state.json`; the new file's
content is a deterministic function of (old registers, feed delta sums),
so a crashed refresh retries to identical bytes and one atomic state
replace publishes. depth/width are pinned at creation (mismatch raises,
omitted reuses — registry-sync contract). Vacuumed-gap refusal and
`rebuild=True` (one streaming pass of the live lake) as in mvadd.py.
"""

from __future__ import annotations

import glob as _glob
import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_STATE = "_cmsmv_state.json"


def _load_state(d: str) -> dict:
    from datax_ray.state.fs import fs_for, read_json

    p = os.path.join(d, _STATE)
    return read_json(p) if fs_for(p).exists(p) else {}


def _save_state(d: str, state: dict) -> None:
    from datax_ray.state.fs import fs_for, json_bytes

    p = os.path.join(d, _STATE)
    fs_for(p).put(p, json_bytes(state))


def _conv_ordinals(conv: "pa.Array | pa.ChunkedArray") -> np.ndarray:
    """conv_id 'conv-<n>' → int64 ordinal (the sketchmv key rule)."""
    if isinstance(conv, pa.ChunkedArray):
        conv = conv.combine_chunks()
    return pc.cast(pc.utf8_slice_codeunits(conv, 5), pa.int64()).to_numpy(
        zero_copy_only=False
    )


def _signed_cells(t: pa.Table, depth: int, width: int, signed: bool) -> pa.Table:
    """Feed (or lake) rows → (cms_row, cms_col, dcnt) signed cell partials.
    Vectorized: one bincount per depth row with ±1 weights."""
    from datax_ray.functions.sketch import _cms_cols

    empty = pa.table(
        {
            "cms_row": pa.array([], pa.int64()),
            "cms_col": pa.array([], pa.int64()),
            "dcnt": pa.array([], pa.int64()),
        }
    )
    if t.num_rows == 0:
        return empty
    ids = _conv_ordinals(t["conv_id"])
    if signed:
        ct = t["_change_type"]
        if isinstance(ct, pa.ChunkedArray):
            ct = ct.combine_chunks()
        plus = pc.is_in(
            ct, value_set=pa.array(["insert", "update_postimage"])
        ).to_numpy(zero_copy_only=False)
        sign = np.where(plus, 1.0, -1.0)
    else:
        sign = np.ones(len(ids), np.float64)
    cols = _cms_cols(ids, depth, width)
    rows_out, cols_out, cnts_out = [], [], []
    for j in range(depth):
        sums = np.bincount(cols[j], weights=sign, minlength=width)
        nz = np.flatnonzero(sums)
        rows_out.append(np.full(len(nz), j, dtype=np.int64))
        cols_out.append(nz.astype(np.int64))
        cnts_out.append(sums[nz].astype(np.int64))
    return pa.table(
        {
            "cms_row": pa.array(np.concatenate(rows_out)),
            "cms_col": pa.array(np.concatenate(cols_out)),
            "dcnt": pa.array(np.concatenate(cnts_out)),
        }
    )


def _fold_and_publish(
    mv_dir: str, old_cells: pa.Table, deltas: pa.Table, committed: int,
    depth: int, width: int, applied_from: int,
) -> dict:
    merged = (
        pa.concat_tables(
            [
                old_cells,
                deltas.rename_columns(["cms_row", "cms_col", "cnt"]),
            ]
        )
        .group_by(["cms_row", "cms_col"], use_threads=False)
        .aggregate([("cnt", "sum")])
        .rename_columns(["cms_row", "cms_col", "cnt"])
    )
    merged = merged.filter(pc.not_equal(merged["cnt"], 0)).sort_by(
        [("cms_row", "ascending"), ("cms_col", "ascending")]
    )
    import pyarrow.parquet as pq

    rel = f"cms-e={committed:06d}.parquet"
    from datax_ray.state.fs import put_parquet

    put_parquet(merged, os.path.join(mv_dir, rel),
                compression="zstd", compression_level=1)
    _save_state(
        mv_dir,
        {
            "applied_epoch": committed,
            "depth": depth,
            "width": width,
            "registers": rel,
            "cells": merged.num_rows,
        },
    )
    from datax_ray.state.fs import fs_for as _ffc

    for p in _ffc(mv_dir).list_prefix(mv_dir):
        name = os.path.basename(p)
        if (name.startswith("cms-e=") and name.endswith(".parquet")
                and name != rel):
            _ffc(mv_dir).delete(p)
    return {
        "applied_from": applied_from,
        "applied_to": committed,
        "cells": merged.num_rows,
    }


def _resolve_params(state: dict, depth, width) -> tuple[int, int]:
    if state.get("depth") is not None:
        if depth is not None and int(depth) != int(state["depth"]):
            raise ValueError(
                f"view is pinned to depth={state['depth']}; refusing "
                f"depth={depth} (mixed hash layouts corrupt estimates)"
            )
        if width is not None and int(width) != int(state["width"]):
            raise ValueError(
                f"view is pinned to width={state['width']}; refusing "
                f"width={width}"
            )
        return int(state["depth"]), int(state["width"])
    d = int(depth) if depth is not None else 4
    w = int(width) if width is not None else 1024
    if d <= 0 or w <= 0:
        raise ValueError(f"depth/width must be positive, got {d}/{w}")
    return d, w


def _stored_cells(mv_dir: str, state: dict) -> pa.Table:
    import pyarrow.parquet as pq

    empty = pa.table(
        {
            "cms_row": pa.array([], pa.int64()),
            "cms_col": pa.array([], pa.int64()),
            "cnt": pa.array([], pa.int64()),
        }
    )
    rel = state.get("registers")
    if not rel:
        return empty
    from datax_ray.state.fs import open_parquet

    return pq.read_table(open_parquet(os.path.join(mv_dir, rel)))


def refresh_cms_mv(
    lake_dir: str,
    mv_dir: str,
    depth: int | None = None,
    width: int | None = None,
    rebuild: bool = False,
) -> dict:
    """Fold the preimage feed since the last applied epoch into the CMS
    registers. Returns {"applied_from", "applied_to", "cells"}."""
    from datax_ray.pipelines.feed import read_change_feed_preimages
    from datax_ray.state.manifest import Manifest

    m = Manifest(lake_dir)
    committed = m.committed_epoch()
    if committed < 0:
        raise ValueError(f"no committed lake at {lake_dir}")
    state = _load_state(mv_dir)
    depth, width = _resolve_params(state, depth, width)
    applied = int(state.get("applied_epoch", -1))
    from datax_ray.state.fs import is_remote as _is_remote

    if not _is_remote(mv_dir):
        os.makedirs(mv_dir, exist_ok=True)

    if rebuild:
        return _rebuild(lake_dir, mv_dir, committed, depth, width)
    if applied >= committed:
        return {
            "applied_from": applied,
            "applied_to": applied,
            "cells": int(state.get("cells", 0)),
        }
    if applied >= 0 and m.at_epoch(applied) is None:
        raise ValueError(
            f"epochs since {applied} were vacuumed — additive refresh "
            "cannot replay them; run with rebuild=True"
        )

    from datax_ray.functions.relational import partial_agg

    partials = read_change_feed_preimages(lake_dir, applied, committed).map_batches(
        lambda t: _signed_cells(t, depth, width, signed=True),
        batch_format="pyarrow",
    )
    # <= depth*width rows after the combiner reduce — tiny by construction,
    # so the final fold runs driver-side on purpose
    deltas = pa.concat_tables(
        [
            b
            for b in partial_agg(
                partials, keys=["cms_row", "cms_col"], sums={"dcnt": "dcnt"},
                single_reduce=True,  # <= depth*width keys by construction
            ).iter_batches(batch_format="pyarrow", batch_size=65536)
        ]
        or [
            pa.table(
                {
                    "cms_row": pa.array([], pa.int64()),
                    "cms_col": pa.array([], pa.int64()),
                    "dcnt": pa.array([], pa.int64()),
                }
            )
        ]
    )
    return _fold_and_publish(
        mv_dir, _stored_cells(mv_dir, state), deltas, committed, depth, width,
        applied_from=applied,
    )


def _rebuild(
    lake_dir: str, mv_dir: str, committed: int, depth: int, width: int
) -> dict:
    from datax_ray.functions.relational import partial_agg
    from datax_ray.sinks.lake import read_lake

    partials = read_lake(lake_dir).map_batches(
        lambda t: _signed_cells(t, depth, width, signed=False),
        batch_format="pyarrow",
    )
    deltas = pa.concat_tables(
        [
            b
            for b in partial_agg(
                partials, keys=["cms_row", "cms_col"], sums={"dcnt": "dcnt"},
                single_reduce=True,  # <= depth*width keys by construction
            ).iter_batches(batch_format="pyarrow", batch_size=65536)
        ]
        or [
            pa.table(
                {
                    "cms_row": pa.array([], pa.int64()),
                    "cms_col": pa.array([], pa.int64()),
                    "dcnt": pa.array([], pa.int64()),
                }
            )
        ]
    )
    empty = pa.table(
        {
            "cms_row": pa.array([], pa.int64()),
            "cms_col": pa.array([], pa.int64()),
            "cnt": pa.array([], pa.int64()),
        }
    )
    return _fold_and_publish(
        mv_dir, empty, deltas, committed, depth, width, applied_from=-1
    )


def read_cms_mv(mv_dir: str) -> pa.Table:
    """The folded (cms_row, cms_col, cnt) register cells."""
    return _stored_cells(mv_dir, _load_state(mv_dir))


def cms_mv_estimate(mv_dir: str, conv_ids: list[str]) -> pa.Table:
    """Point frequency estimates (>= true live-turn count) for specific
    conversations, from the 32 KiB register file alone — no lake reads."""
    from datax_ray.functions.sketch import _cms_cols

    state = _load_state(mv_dir)
    depth, width = int(state.get("depth", 4)), int(state.get("width", 1024))
    cells = _stored_cells(mv_dir, state)
    dense = np.zeros((depth, width), np.int64)
    dense[
        cells["cms_row"].to_numpy(zero_copy_only=False),
        cells["cms_col"].to_numpy(zero_copy_only=False),
    ] = cells["cnt"].to_numpy(zero_copy_only=False)
    ords = _conv_ordinals(pa.array(conv_ids, pa.string()))
    cols = _cms_cols(ords, depth, width)
    est = np.min(
        np.stack([dense[j, cols[j]] for j in range(depth)]), axis=0
    )
    return pa.table(
        {
            "conv_id": pa.array(conv_ids, pa.string()),
            "est_turns": pa.array(est, pa.int64()),
        }
    )
