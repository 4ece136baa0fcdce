"""AtomicDirDatasink — the `ray.data.Datasink` extension exemplar
(SURVEY.md §2C: "a sink = ray.data.Datasink or a write stage + commit").

DataX's hdfswriter writes to a temp dir and atomically renames into place
(SURVEY.md §2A row 7); this generalizes that into Ray Data's native sink
interface with the same exactly-once recipe the lake uses
(state/manifest.py): write tasks emit part files with CONTENT-HASH names
(a retried task rewrites the identical bytes to the identical name — no
dupes), and `on_write_complete` publishes one `_MANIFEST.json` via
os.replace listing exactly the committed files. A failed job leaves no
manifest; orphan parts are ignored by `read_committed` and overwritten
byte-identically on re-run.

Use `ds.write_datasink(AtomicDirDatasink(out, fmt))`; a user writing a new
sink for this engine copies this file's shape.
"""

from __future__ import annotations

import hashlib
import json
import os
from collections.abc import Iterable

import pyarrow as pa

import ray.data


def serialize_table(t: pa.Table, fmt: str) -> tuple[bytes, str]:
    """One block → (serialized bytes, file extension)."""
    if fmt == "parquet":
        import pyarrow.parquet as pq

        sink = pa.BufferOutputStream()
        pq.write_table(t, sink, compression="zstd", compression_level=1)
        return sink.getvalue().to_pybytes(), "parquet"
    if fmt == "orc":
        from pyarrow import orc

        sink = pa.BufferOutputStream()
        orc.write_table(t, sink)
        return sink.getvalue().to_pybytes(), "orc"
    if fmt == "csv":
        return t.to_pandas().to_csv(index=False, na_rep="\\N").encode(), "csv"
    if fmt == "jsonl":
        rows = []
        for r in t.to_pylist():
            for k, v in list(r.items()):
                if hasattr(v, "isoformat"):
                    r[k] = v.isoformat()
            rows.append(json.dumps(r))
        return ("\n".join(rows) + "\n").encode(), "jsonl"
    raise ValueError(f"unknown format {fmt!r}")


class AtomicDirDatasink(ray.data.Datasink):
    """Two-phase-commit directory sink: staged content-hash parts, one
    atomic manifest publish. `write()` returns this task's file list; the
    aggregated returns become the manifest in `on_write_complete`."""

    MANIFEST = "_MANIFEST.json"

    def __init__(self, out_dir: str, fmt: str = "parquet", append: bool = False):
        self.out_dir = out_dir
        self.fmt = fmt
        self.append = append
        self._prior_files: list[dict] = []
        self._gen = 0
        if append:
            # DataX hdfswriter `append`: earlier jobs' data stays visible.
            # Carry the prior manifest's files into this job's commit and
            # stamp new parts with a generation so a job appending
            # byte-identical content cannot collide with an old part name
            # (which would silently collapse the duplicate rows append
            # semantics requires). Captured in __init__ — before Ray
            # pickles the sink for write tasks.
            try:
                with open(os.path.join(out_dir, self.MANIFEST)) as f:
                    prior = json.load(f)
                if prior.get("format") not in (None, fmt):
                    raise ValueError(
                        f"append format mismatch: dir holds {prior['format']!r},"
                        f" job writes {fmt!r}"
                    )
                self._prior_files = list(prior.get("files", []))
                self._gen = int(prior.get("generation", 0)) + 1
            except FileNotFoundError:
                pass

    def on_write_start(self) -> None:
        os.makedirs(self.out_dir, exist_ok=True)
        if not self.append:
            # A fresh overwrite invalidates any previous commit until it
            # completes; append keeps the old manifest readable until the
            # atomic merged replace below (a crashed append job is
            # invisible: old data stays committed, new parts are orphans).
            try:
                os.remove(os.path.join(self.out_dir, self.MANIFEST))
            except FileNotFoundError:
                pass

    def write(self, blocks: Iterable, ctx) -> list[dict]:
        out = []
        for i, block in enumerate(blocks):
            t = (
                block
                if isinstance(block, pa.Table)
                else pa.Table.from_pandas(block, preserve_index=False)
            )
            if t.num_rows == 0:
                continue
            blob, ext = serialize_table(t, self.fmt)
            # Name = (task_idx, block ordinal, content hash): task_idx and
            # the ordinal are stable across RETRIES of the same write task
            # (same file rewritten byte-identically — exactly-once), while
            # DISTINCT tasks that happen to produce byte-identical blocks
            # (e.g. constant columns) still get distinct files — a pure
            # content hash would silently collapse them and lose rows.
            digest = hashlib.sha1(blob).hexdigest()[:16]
            name = f"g{self._gen:03d}-part-{ctx.task_idx:05d}-{i:03d}-{digest}.{ext}"
            path = os.path.join(self.out_dir, name)
            tmp = path + f".tmp-{os.getpid()}"
            with open(tmp, "wb") as f:
                f.write(blob)
            os.replace(tmp, path)
            out.append({"file": name, "rows": t.num_rows})
        return out

    def on_write_complete(self, write_result) -> None:
        files: list[dict] = list(self._prior_files)
        seen = {r["file"] for r in files}
        for task_files in write_result.write_returns:
            for rec in task_files:
                # A retried task re-reports the same (task_idx, ordinal,
                # hash) name; list it once.
                if rec["file"] not in seen:
                    seen.add(rec["file"])
                    files.append(rec)
        manifest = {
            "format": self.fmt,
            "generation": self._gen,
            "files": sorted(files, key=lambda r: r["file"]),
            "rows": sum(r["rows"] for r in files),
        }
        path = os.path.join(self.out_dir, self.MANIFEST)
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, path)


def read_committed(out_dir: str) -> ray.data.Dataset:
    """Read back ONLY the files named by the committed manifest — orphans
    from failed/partial writes are invisible, like the lake's reader."""
    with open(os.path.join(out_dir, AtomicDirDatasink.MANIFEST)) as f:
        manifest = json.load(f)
    paths = [os.path.join(out_dir, r["file"]) for r in manifest["files"]]
    fmt = manifest["format"]
    if not paths:
        return ray.data.from_arrow(pa.schema([]).empty_table())
    if fmt == "parquet":
        return ray.data.read_parquet(paths)
    if fmt == "orc":
        from datax_ray.sources.orcsource import read_orc

        return read_orc(paths)
    if fmt == "csv":
        return ray.data.read_csv(paths)
    return ray.data.read_json(paths)
