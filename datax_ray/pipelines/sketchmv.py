"""Incremental SKETCH materialized view over the committed lake: per-range
HyperLogLog registers as lake artifacts — the monitoring path that answers
"how many distinct conversations does the lake hold" after every epoch
WITHOUT rescanning unchanged data.

Same refresh contract as the stats MV (pipelines/mv.py), the text index
(pipelines/index.py), the IVF index (pipelines/vecindex.py) and the dedup
index (pipelines/dedupscan.py) — the fifth member of the incremental-
artifact family:

- one register file per partition range (`<dir>/r=NNNNN.parquet`,
  (bucket, max_rho) rows, <= 2^p of them);
- `_sketch_state.json` fingerprints the exact committed file set each
  range's registers were computed from; a range re-sketches ONLY if its
  file set changed (manifest-only check, no storage reads for skipped
  ranges);
- registers fold by MAX on read — the same union rule that lets
  per-range partials, per-day sketches and multi-lake sketches combine
  exactly, so `read_sketch` moves <= ranges x 2^p integer rows.

The register content is deterministic (fixed fmix32 chain over the
conversation ordinal), so the driver's DuckDB oracle verifies every cell
against the LWW-final state (query `cdc_hll_conv_mv`).
"""

from __future__ import annotations

import glob as _glob
import hashlib
import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

_STATE = "_sketch_state.json"
_M32 = np.uint64(4294967296)


def _fingerprint(files: list[str]) -> str:
    return hashlib.md5("\n".join(sorted(files)).encode()).hexdigest()


def _load_state(d: str) -> dict:
    from datax_ray.state.fs import fs_for, read_json

    p = os.path.join(d, _STATE)
    return read_json(p) if fs_for(p).exists(p) else {}


def _save_state(d: str, state: dict) -> None:
    from datax_ray.state.fs import fs_for, json_bytes

    p = os.path.join(d, _STATE)
    fs_for(p).put(p, json_bytes(state))


def conv_registers(conv: pa.Array, p: int = 9) -> pa.Table:
    """(bucket, max_rho) HLL registers of a conv_id array. Hashes the
    numeric conversation ordinal (the part after 'conv-') through the
    house fmix32 chain so DuckDB reproduces every register."""
    if isinstance(conv, pa.ChunkedArray):
        conv = conv.combine_chunks()
    if len(conv) == 0:
        return pa.table(
            {"bucket": pa.array([], pa.int64()), "max_rho": pa.array([], pa.int64())}
        )
    ords = pc.cast(pc.utf8_slice_codeunits(conv, 5), pa.int64()).to_numpy(
        zero_copy_only=False
    )
    m = np.uint64(1 << p)
    top = 32 - p
    h = ords.astype(np.uint64) % _M32
    h ^= h >> np.uint64(16)
    h = (h * np.uint64(2246822507)) % _M32
    h ^= h >> np.uint64(13)
    h = (h * np.uint64(3266489909)) % _M32
    h ^= h >> np.uint64(16)
    bucket = (h % m).astype(np.int64)
    w = (h // m).astype(np.int64)
    nbits = np.zeros(len(w), np.int64)
    nz = w > 0
    nbits[nz] = np.floor(np.log2(w[nz])).astype(np.int64) + 1
    rho = np.where(w == 0, top + 1, top + 1 - nbits)
    return (
        pa.table(
            {
                "bucket": pa.array(bucket, pa.int64()),
                "rho": pa.array(rho, pa.int64()),
            }
        )
        .group_by(["bucket"], use_threads=False)
        .aggregate([("rho", "max")])
        .rename_columns(["bucket", "max_rho"])
    )


class _RangeSketcher:
    """map_batches stage over (range_id, files) rows: merge-read the range,
    compute its registers, atomically (re)write the range's register file.
    Content derives only from the committed range files ⇒ a retried task
    rewrites the identical file."""

    def __init__(self, lake_dir: str, sketch_dir: str, schema_json: str, p: int):
        self.__name__ = "_RangeSketcher"
        self.lake_dir = lake_dir
        self.sketch_dir = sketch_dir
        self.schema_json = schema_json
        self.p = p

    def __call__(self, t: pa.Table) -> pa.Table:
        import pyarrow.parquet as pq

        from datax_ray.sinks.lake import _merge_read_range

        out = []
        for rid, files_json in zip(t["range_id"].to_pylist(), t["files"].to_pylist()):
            files = json.loads(files_json)
            live = _merge_read_range(self.lake_dir, files, self.schema_json, False)
            regs = conv_registers(live["conv_id"], p=self.p)
            from datax_ray.state.fs import put_parquet

            put_parquet(regs, os.path.join(self.sketch_dir, f"r={rid:05d}.parquet"),
                        compression="zstd", compression_level=1)
            out.append((int(rid), regs.num_rows))
        return pa.table(
            {
                "range_id": pa.array([r for r, _ in out], pa.int64()),
                "registers": pa.array([n for _, n in out], pa.int64()),
            }
        )


def refresh_sketch(lake_dir: str, sketch_dir: str,
                   p: int | None = None) -> dict:
    """Bring the register artifacts up to the lake's committed state.
    `p` is pinned at creation (omitted → reuse stored; default 9 for a
    fresh sketch) and folded into every per-range fingerprint, so changing
    it re-sketches EVERY range — mixed register sizes across ranges would
    silently corrupt the distinct estimate. Returns {"refreshed": n,
    "skipped": n, "removed": n}."""
    from datax_ray.schemas import schema_to_json
    from datax_ray.sinks.lake import _range_plan, lake_schema
    from datax_ray.state.manifest import Manifest

    m = Manifest(lake_dir)
    parts = _range_plan(lake_dir, m)
    state = _load_state(sketch_dir)
    if p is None:
        if state and "_p" not in state:
            raise ValueError(
                "this sketch predates precision pinning and does not "
                "record its p — pass p= matching the original precision "
                "once to upgrade (a wrong guess would silently mix "
                "register sizes)"
            )
        p = int(state.get("_p", 9))
    from datax_ray.state.fs import is_remote as _is_remote

    if not _is_remote(sketch_dir):
        os.makedirs(sketch_dir, exist_ok=True)

    todo, skipped = [], 0
    new_state: dict[str, str | int] = {"_p": p}
    for part in parts:
        rid = int(part["range_id"])
        fp = _fingerprint(part["files"]) + f":p={p}"
        new_state[str(rid)] = fp
        from datax_ray.state.fs import fs_for as _ffe

        if state.get(str(rid)) == fp and _ffe(sketch_dir).exists(
            os.path.join(sketch_dir, f"r={rid:05d}.parquet")
        ):
            skipped += 1
        else:
            todo.append({"range_id": rid, "files": json.dumps(part["files"])})

    from datax_ray.state.fs import fs_for as _ff

    removed = 0
    live_rids = {int(part["range_id"]) for part in parts}
    for path in _ff(sketch_dir).list_prefix(sketch_dir):
        name = os.path.basename(path)
        if not (name.startswith("r=") and name.endswith(".parquet")):
            continue
        rid = int(name[2:-8])
        if rid not in live_rids:
            _ff(sketch_dir).delete(path)
            removed += 1

    if todo:
        schema_json = schema_to_json(lake_schema(lake_dir))
        ray.data.from_items(todo).map_batches(
            _RangeSketcher(lake_dir, sketch_dir, schema_json, p),
            batch_size=1,
            batch_format="pyarrow",
        ).take_all()  # O(ranges) lineage rows only

    _save_state(sketch_dir, new_state)
    return {"refreshed": len(todo), "skipped": skipped, "removed": removed}


def read_sketch(sketch_dir: str) -> ray.data.Dataset:
    """Folded registers as a Dataset: per-range partials union by MAX."""
    from datax_ray.functions.relational import partial_agg

    from datax_ray.state.fs import fs_for as _ffr, read_parquet_dataset

    files = sorted(
        p for p in _ffr(sketch_dir).list_prefix(sketch_dir)
        if os.path.basename(p).startswith("r=")
        and p.endswith(".parquet")
    )
    if not files:
        return ray.data.from_arrow(
            pa.table(
                {"bucket": pa.array([], pa.int64()), "max_rho": pa.array([], pa.int64())}
            )
        )
    ds = read_parquet_dataset(files, pa.schema([]))
    return partial_agg(
        ds.map_batches(
            lambda t: t.rename_columns(["bucket", "rho"]), batch_format="pyarrow"
        ),
        keys=["bucket"],
        maxs={"rho": "max_rho"},
        single_reduce=True,  # <= 2^p register rows
    )


def estimate_distinct(registers: pa.Table, p: int = 9) -> float:
    """Standard HLL estimate from a folded register table (monitoring
    convenience; the driver-verified artifact is the registers)."""
    m = 1 << p
    rho = np.zeros(m, np.int64)
    rho[registers["bucket"].to_numpy(zero_copy_only=False)] = registers[
        "max_rho"
    ].to_numpy(zero_copy_only=False)
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-rho.astype(np.float64)))
    zeros = int((rho == 0).sum())
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)
    return float(est)
