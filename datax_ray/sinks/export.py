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
) -> int:
    """Write the lake's live rows to `out_dir` in `fmt`; returns row count.
    `as_of_epoch` exports a past committed state (time travel);
    `partition_by` produces the Hive layout above.

    Files carry content-hash names (one or more per range task; a retried
    task rewrites identical bytes). Re-running is a TRUE full overwrite:
    `out_dir` is cleared first, so a reader never sees a stale part file
    from a previous export of a since-changed lake alongside the new
    ones."""
    if fmt not in FORMATS:
        raise ValueError(f"fmt must be one of {FORMATS}")
    ds = read_lake(lake_dir, as_of_epoch=as_of_epoch)
    if os.path.isdir(out_dir):
        shutil.rmtree(out_dir)
    os.makedirs(out_dir, exist_ok=True)

    def write_batch(t: pa.Table) -> pa.Table:
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
