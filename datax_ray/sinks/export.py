"""Lake export — the writer side of the DataX sync matrix (SURVEY.md §2A
rows 6-8): materialize the committed lake state to parquet / ORC / CSV /
JSONL sinks, streaming (one task per range, never driver-materialized).

`partition_by` writes a Hive-style partitioned layout
(`out/<col>=<val>/part-<hash>.<ext>`, partition columns dropped from the
file content, null → __HIVE_DEFAULT_PARTITION__) — the odpswriter/
adswriter partition-spec analog [SURVEY §2A row 8]; any Hive-aware reader
(pyarrow.dataset partitioning="hive") restores the columns from the
paths. Byte formats are shared with the job runner's atomic sink
(sinks/datasink.py:serialize_table), so CSV keeps the `\\N` null sentinel
symmetric with the CSV reader and a lake → csv → changes → lake round
trip stays lossless for nulls vs empty strings.
"""

from __future__ import annotations

import os
import shutil

import numpy as np
import pyarrow as pa

from datax_ray.sinks.lake import read_lake

FORMATS = ("parquet", "orc", "csv", "jsonl")
_HIVE_NULL = "__HIVE_DEFAULT_PARTITION__"


def _partition_slices(t: pa.Table, cols: list[str]):
    """Yield (relative subdir, slice-with-partition-cols-dropped) per
    distinct partition-key combination in the batch — vectorized combo
    coding, no Python per row."""
    import pandas as pd

    n = t.num_rows
    code = np.zeros(n, dtype=np.int64)
    uniques: list[pd.Index] = []
    for c in cols:
        s = pd.Series(t[c].to_numpy(zero_copy_only=False))
        f, u = pd.factorize(s, use_na_sentinel=False)
        code = code * max(len(u), 1) + f
        uniques.append(u)
    for combo in np.unique(code):
        mask = code == combo
        # decode the combo back into per-column values
        parts = []
        rem = int(combo)
        radices = [max(len(u), 1) for u in uniques]
        digits = []
        for r in reversed(radices):
            digits.append(rem % r)
            rem //= r
        digits.reverse()
        for c, u, d in zip(cols, uniques, digits):
            v = u[d]
            sval = _HIVE_NULL if v is None or (isinstance(v, float) and np.isnan(v)) else str(v)
            parts.append(f"{c}={sval}")
        yield os.path.join(*parts), t.filter(pa.array(mask)).drop_columns(cols)


def export_lake(
    lake_dir: str,
    out_dir: str,
    fmt: str = "parquet",
    as_of_epoch: int | None = None,
    partition_by: list[str] | None = None,
    transformers: list[dict] | None = None,
    overwrite: str = "all",
) -> int:
    """Write the lake's live rows to `out_dir` in `fmt`; returns row count.
    `as_of_epoch` exports a past committed state (time travel);
    `partition_by` produces the Hive layout above; `transformers` applies
    a dx_* chain (functions/transformers.py) to every batch before the
    write — the PII-scrubbed / redacted EGRESS view (dx_mask + export),
    leaving the lake itself untouched. The chain compiles ONCE on the
    driver (broadcast state like dx_lookup's table ships via ray.put) and
    fuses into the per-range write task.

    Files carry content-hash names (one or more per range task; a retried
    task rewrites identical bytes). `overwrite` picks the reload scope —
    the ads/odpswriter partition-load semantics [SURVEY §2A row 8]:

      * "all" (default): TRUE full overwrite — `out_dir` cleared first,
        so a reader never sees a stale part file from a previous export
        of a since-changed lake alongside the new ones.
      * "dynamic" (requires partition_by): Spark-style dynamic partition
        overwrite — only the partitions that RECEIVE rows this run are
        truncated first; untouched partitions keep their files. The
        affected-partition set is computed distributed (per-batch
        distinct combos — O(partitions), never the rows) and cleared
        once on the driver before any write task runs."""
    if fmt not in FORMATS:
        raise ValueError(f"fmt must be one of {FORMATS}")
    if overwrite not in ("all", "dynamic"):
        raise ValueError("overwrite must be 'all' or 'dynamic'")
    if overwrite == "dynamic" and not partition_by:
        raise ValueError("overwrite='dynamic' requires partition_by")
    xform = None
    if transformers:
        from datax_ray.functions.transformers import compile_transformers

        xform = compile_transformers(transformers)
    ds = read_lake(lake_dir, as_of_epoch=as_of_epoch)
    if overwrite == "all":
        if os.path.isdir(out_dir):
            shutil.rmtree(out_dir)
    else:
        # dynamic: truncate exactly the partitions this run will load.
        # The export view is the source of the combo set, so a transformer
        # that rewrites partition columns is applied first, same as the
        # write path will.
        def combos(t: pa.Table) -> pa.Table:
            if xform is not None:
                t = xform(t)
            return (
                t.select(partition_by)
                .group_by(partition_by, use_threads=False)
                .aggregate([])
            )

        touched = (
            ds.map_batches(combos, batch_format="pyarrow")
            .take_all()
        )  # O(distinct partition combos) tiny rows
        seen = set()
        for r in touched:
            parts = []
            for c in partition_by:
                v = r[c]
                sval = _HIVE_NULL if v is None else str(v)
                parts.append(f"{c}={sval}")
            seen.add(os.path.join(*parts))
        for rel in sorted(seen):
            shutil.rmtree(os.path.join(out_dir, rel), ignore_errors=True)
    os.makedirs(out_dir, exist_ok=True)

    def write_batch(t: pa.Table) -> pa.Table:
        if xform is not None:
            t = xform(t)
        import hashlib

        from datax_ray.sinks.datasink import serialize_table

        pieces = (
            _partition_slices(t, partition_by) if partition_by else [("", t)]
        )
        rows = 0
        for subdir, piece in pieces:
            if piece.num_rows == 0:
                continue
            blob, ext = serialize_table(piece, fmt)
            d = os.path.join(out_dir, subdir) if subdir else out_dir
            os.makedirs(d, exist_ok=True)
            name = hashlib.sha1(blob).hexdigest()[:16]
            path = os.path.join(d, f"part-{name}.{ext}")
            tmp = path + f".tmp.{os.getpid()}"
            with open(tmp, "wb") as f:
                f.write(blob)  # pa.Buffer/bytes via buffer protocol
            os.replace(tmp, path)
            rows += piece.num_rows
        return pa.table({"rows": pa.array([rows], pa.int64())})

    parts = ds.map_batches(
        write_batch, batch_format="pyarrow", batch_size=None
    ).take_all()  # O(tasks) stat rows only
    return sum(int(r["rows"]) for r in parts)


def export_partition(
    lake_dir: str,
    out_dir: str,
    partition_spec: dict,
    fmt: str = "parquet",
    as_of_epoch: int | None = None,
    truncate: bool = True,
    transformers: list[dict] | None = None,
) -> int:
    """odpswriter's partition-spec load, 1:1 (SURVEY §2A row 8): load the
    lake's live rows matching `partition_spec` (e.g. {"role": "user"})
    into EXACTLY that Hive partition directory —
    `out/<col>=<val>/...` — truncating ONLY that partition first when
    `truncate=True` (DataX writeMode=truncate scoped to the partition;
    every other partition's files are untouched), appending new
    content-hash part files when False (writeMode=append). The row
    filter pushes into the merge-read (`read_lake(where=...)`), so only
    the partition's rows ever leave the lake tasks. Returns rows
    written."""
    if fmt not in FORMATS:
        raise ValueError(f"fmt must be one of {FORMATS}")
    if not partition_spec:
        raise ValueError("partition_spec must name at least one column=value")
    xform = None
    if transformers:
        from datax_ray.functions.transformers import compile_transformers

        xform = compile_transformers(transformers)
    cols = list(partition_spec)
    rel = os.path.join(*(f"{c}={partition_spec[c]}" for c in cols))
    part_dir = os.path.join(out_dir, rel)
    if truncate:
        shutil.rmtree(part_dir, ignore_errors=True)
    os.makedirs(part_dir, exist_ok=True)

    ds = read_lake(lake_dir, as_of_epoch=as_of_epoch, where=dict(partition_spec))

    def write_batch(t: pa.Table) -> pa.Table:
        if xform is not None:
            t = xform(t)
        import hashlib

        from datax_ray.sinks.datasink import serialize_table

        t = t.drop_columns(cols)
        if t.num_rows == 0:
            return pa.table({"rows": pa.array([0], pa.int64())})
        blob, ext = serialize_table(t, fmt)
        name = hashlib.sha1(blob).hexdigest()[:16]
        path = os.path.join(part_dir, f"part-{name}.{ext}")
        tmp = path + f".tmp.{os.getpid()}"
        with open(tmp, "wb") as f:
            f.write(blob)
        os.replace(tmp, path)
        return pa.table({"rows": pa.array([t.num_rows], pa.int64())})

    parts = ds.map_batches(
        write_batch, batch_format="pyarrow", batch_size=None
    ).take_all()
    return sum(int(r["rows"]) for r in parts)


# ------------------------------------------------- incremental export sync --

_STATE_NAME = "_export_state.json"


def _range_fingerprint(files: list[str], extra: str = "") -> str:
    import hashlib

    return hashlib.sha1(
        ("\n".join(sorted(files)) + "\x00" + extra).encode()
    ).hexdigest()[:16]


class _RangeExporter:
    """One call = one changed-range descriptor: merge-read the range's
    live rows, serialize, write content-hash part files under
    out/r=NNNNN/ (idempotent under task retry), return a stat row."""

    def __init__(self, lake_dir: str, out_dir: str, fmt: str, schema_json,
                 xform=None):
        self.__name__ = "RangeExporter"
        self.lake_dir = lake_dir
        self.out_dir = out_dir
        self.fmt = fmt
        self.schema_json = schema_json
        self.xform = xform

    def __call__(self, batch: pa.Table) -> pa.Table:
        import hashlib
        import json

        from datax_ray.sinks.datasink import serialize_table
        from datax_ray.sinks.lake import _merge_read_range

        out_rows = []
        for item in batch.to_pylist():
            rid = int(item["range_id"])
            files = json.loads(item["files_json"])
            t = _merge_read_range(
                self.lake_dir, files, self.schema_json, include_internal=False
            )
            if self.xform is not None:
                t = self.xform(t)
            d = os.path.join(self.out_dir, f"r={rid:05d}")
            os.makedirs(d, exist_ok=True)
            names = []
            if t.num_rows:
                blob, ext = serialize_table(t, self.fmt)
                name = f"part-{hashlib.sha1(blob).hexdigest()[:16]}.{ext}"
                tmp = os.path.join(d, name + f".tmp.{os.getpid()}")
                with open(tmp, "wb") as f:
                    f.write(blob)
                os.replace(tmp, os.path.join(d, name))
                names.append(name)
            out_rows.append(
                {
                    "range_id": rid,
                    "fp": item["fp"],
                    "rows": t.num_rows,
                    "names_json": json.dumps(names),
                }
            )
        return pa.Table.from_pylist(out_rows)


def export_lake_incremental(
    lake_dir: str,
    out_dir: str,
    fmt: str = "parquet",
    transformers: list[dict] | None = None,
) -> dict:
    """Exactly-once INCREMENTAL export — the file-sink analog of the SQL
    mirror (pipelines/mirror.py): per-range output directories plus a
    state file recording each range's committed file-set fingerprint, so a
    re-run after new epochs rewrites ONLY ranges whose committed files
    changed (manifest-only check — zero lake reads for untouched ranges)
    and a downstream consumer syncs in O(changed bytes), never O(lake).
    `transformers` applies a dx_* chain per range before serialization
    (scrubbed-egress sync); the chain SPEC folds into every range
    fingerprint, so changing the chain rewrites everything — a stale
    sync can never mix two redaction policies.

    Two-phase: content-hash part files land first (a retried/crashed task
    rewrites identical bytes), then ONE atomic state publish; stale parts
    of changed ranges and dirs of vanished ranges (layout migration) are
    removed only after the new state is durable. Readers that honor the
    state file (`read_export_state`) never see a half-synced view."""
    import json

    from datax_ray.sinks.lake import _range_plan
    from datax_ray.state.manifest import Manifest

    if fmt not in FORMATS:
        raise ValueError(f"fmt must be one of {FORMATS}")
    xform = None
    xspec = ""
    if transformers:
        from datax_ray.functions.transformers import compile_transformers

        xform = compile_transformers(transformers)
        xspec = json.dumps(transformers, sort_keys=True)
    m = Manifest(lake_dir)
    from datax_ray.schemas import LAKE_SCHEMA, schema_to_json

    schema_json = schema_to_json(m.committed_schema() or LAKE_SCHEMA)
    # the committed SCHEMA folds into every fingerprint too: a DDL epoch
    # (rename/widen/add) must re-export even ranges whose FILES didn't
    # change, or the mirror would mix pre- and post-DDL columns forever.
    # (Fingerprint-format changes cost one full re-export on first sync —
    # the safe direction: stale fps rewrite, never mis-skip.)
    xspec = xspec + "\x00" + json.dumps(schema_json, sort_keys=True)
    plan = _range_plan(lake_dir, m)
    state_path = os.path.join(out_dir, _STATE_NAME)
    prev: dict = {}
    if os.path.exists(state_path):
        with open(state_path) as f:
            prev = json.load(f)
    known = prev.get("ranges", {}) if prev.get("fmt") == fmt else {}

    todo = []
    for p in plan:
        fp = _range_fingerprint(p["files"], xspec)
        if known.get(str(p["range_id"]), {}).get("fp") != fp:
            todo.append(
                {
                    "range_id": p["range_id"],
                    "files_json": json.dumps(p["files"]),
                    "fp": fp,
                }
            )

    results = []
    if todo:
        import ray.data

        results = (
            ray.data.from_items(todo, override_num_blocks=len(todo))
            .map_batches(
                _RangeExporter(lake_dir, out_dir, fmt, schema_json, xform),
                batch_format="pyarrow",
                batch_size=None,
            )
            .take_all()
        )

    # fold: carried-forward unchanged ranges + freshly written ones
    new_ranges = {
        str(p["range_id"]): known[str(p["range_id"])]
        for p in plan
        if str(p["range_id"]) in known
        and known[str(p["range_id"])].get("fp")
        == _range_fingerprint(p["files"], xspec)
    }
    rows_written = 0
    for r in results:
        new_ranges[str(int(r["range_id"]))] = {
            "fp": r["fp"],
            "files": json.loads(r["names_json"]),
            "rows": int(r["rows"]),
        }
        rows_written += int(r["rows"])

    os.makedirs(out_dir, exist_ok=True)
    state = {"fmt": fmt, "epoch": m.committed_epoch(), "ranges": new_ranges}
    import threading

    tmp = state_path + f".tmp.{os.getpid()}.{threading.get_ident()}"
    with open(tmp, "w") as f:
        json.dump(state, f, indent=1, sort_keys=True)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, state_path)

    # post-publish cleanup: stale parts inside changed ranges, dirs of
    # ranges no longer in the plan (safe — the new state is durable)
    import glob as _glob

    live_rids = set(new_ranges)
    for d in _glob.glob(os.path.join(out_dir, "r=*")):
        rid = os.path.basename(d).split("=", 1)[1].lstrip("0") or "0"
        if rid not in live_rids:
            shutil.rmtree(d, ignore_errors=True)
            continue
        keep = set(new_ranges[rid].get("files", []))
        for f in os.listdir(d):
            if f not in keep:
                os.remove(os.path.join(d, f))
    return {
        "ranges_exported": len(todo),
        "ranges_skipped": len(plan) - len(todo),
        "rows_written": rows_written,
        "epoch": m.committed_epoch(),
        "out": out_dir,
    }


def read_export_state(out_dir: str) -> dict:
    """The committed view of an incremental export: fmt, source epoch and
    per-range part-file lists. Consumers reading ONLY files listed here
    see exactly one consistent sync, never a half-written one."""
    import json

    with open(os.path.join(out_dir, _STATE_NAME)) as f:
        return json.load(f)
