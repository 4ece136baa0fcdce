"""Lake export — the writer side of the DataX sync matrix (SURVEY.md §2A
rows 6-8): materialize the committed lake state to parquet / CSV / JSONL
sinks, streaming (one task per range, never driver-materialized).

CSV uses the `\\N` null sentinel symmetric with the CSV reader, so a
lake -> csv -> changes -> lake round trip is lossless for nulls vs empty
strings.
"""

from __future__ import annotations

import os
import shutil

import pyarrow as pa

from datax_ray.sinks.lake import read_lake

FORMATS = ("parquet", "csv", "jsonl")


def export_lake(
    lake_dir: str,
    out_dir: str,
    fmt: str = "parquet",
    as_of_epoch: int | None = None,
) -> int:
    """Write the lake's live rows to `out_dir` in `fmt`; returns row count.
    `as_of_epoch` exports a past committed state (time travel).

    Files are written with a per-batch writer (content-hash filenames, one
    file per range task). Re-running is a TRUE full overwrite: `out_dir` is
    cleared first, so a reader never sees a stale part file from a previous
    export of a since-changed lake alongside the new ones."""
    if fmt not in FORMATS:
        raise ValueError(f"fmt must be one of {FORMATS}")
    ds = read_lake(lake_dir, as_of_epoch=as_of_epoch)
    if os.path.isdir(out_dir):
        shutil.rmtree(out_dir)
    os.makedirs(out_dir, exist_ok=True)

    if fmt == "parquet":
        # Same per-batch writer pattern as csv/jsonl: one pipeline execution
        # yields both the files and the row count (write_parquet + count()
        # would run the whole lake merge twice).
        def write_parquet_batch(t: pa.Table) -> pa.Table:
            import hashlib

            import pyarrow.parquet as pq

            sink = pa.BufferOutputStream()
            pq.write_table(t, sink, compression="zstd", compression_level=1)
            buf = sink.getvalue()
            name = hashlib.sha1(buf).hexdigest()[:16]
            path = os.path.join(out_dir, f"part-{name}.parquet")
            tmp = path + ".tmp"
            with open(tmp, "wb") as f:
                f.write(buf)  # pa.Buffer via buffer protocol: no extra copy
            os.replace(tmp, path)
            return pa.table({"rows": pa.array([t.num_rows], pa.int64())})

        parts = ds.map_batches(
            write_parquet_batch, batch_format="pyarrow", batch_size=None
        ).take_all()
        return sum(int(r["rows"]) for r in parts)

    if fmt == "csv":
        def write_csv_batch(t: pa.Table) -> pa.Table:
            # pandas na_rep writes the \N sentinel; pyarrow's csv writer
            # cannot distinguish null from "" on write.
            import hashlib

            df = t.to_pandas()
            blob = df.to_csv(index=False, na_rep="\\N").encode()
            name = hashlib.sha1(blob).hexdigest()[:16]
            with open(os.path.join(out_dir, f"part-{name}.csv"), "wb") as f:
                f.write(blob)
            return pa.table({"rows": pa.array([t.num_rows], pa.int64())})

        parts = ds.map_batches(write_csv_batch, batch_format="pyarrow", batch_size=None).take_all()
        return sum(int(r["rows"]) for r in parts)

    # jsonl
    def write_jsonl_batch(t: pa.Table) -> pa.Table:
        import hashlib
        import json

        lines = []
        for r in t.to_pylist():
            for k, v in list(r.items()):
                if hasattr(v, "isoformat"):
                    r[k] = v.isoformat()
            lines.append(json.dumps(r))
        blob = ("\n".join(lines) + "\n").encode()
        name = hashlib.sha1(blob).hexdigest()[:16]
        with open(os.path.join(out_dir, f"part-{name}.jsonl"), "wb") as f:
            f.write(blob)
        return pa.table({"rows": pa.array([t.num_rows], pa.int64())})

    parts = ds.map_batches(write_jsonl_batch, batch_format="pyarrow", batch_size=None).take_all()
    return sum(int(r["rows"]) for r in parts)
