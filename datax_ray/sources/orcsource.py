"""ORC file connector — the columnar half of DataX's hdfsreader/hdfswriter
contract (SURVEY §2A rows 2/7: HDFS text AND ORC; README.md:2 names HDFS/
Hive, whose warehouse format is ORC).

Read side mirrors DataX's split semantics: the ORC *stripe* is the unit of
parallelism (DataX splits hdfsreader tasks per file/block; ORC's internal
block is the stripe). Planning touches only file FOOTERS — O(files) driver
metadata, never data — then one Ray task reads one stripe slice with
column pruning pushed into the ORC reader, so a 100 TB warehouse scan
fans out to stripes and prunes columns at the storage layer exactly like
the parquet path.

Write side rides the engine's two-phase-commit `AtomicDirDatasink`
(fmt="orc"): staged content-hash parts + one atomic manifest, so a failed
job is invisible and a retried task rewrites identical bytes.
"""

from __future__ import annotations

import glob as _glob
import os

import pyarrow as pa

import ray.data


def _orc_files(path: str) -> list[str]:
    if os.path.isdir(path):
        return sorted(
            _glob.glob(os.path.join(path, "**", "*.orc"), recursive=True)
        )
    return sorted(_glob.glob(path)) if any(c in path for c in "*?[") else [path]


class _StripeReader:
    """map_batches stage over (path, stripe_lo, stripe_hi) plan rows: read
    the stripe slice with column pruning. Opening the file per task is the
    point — no handle or table state ever crosses tasks."""

    def __init__(self, columns: list[str] | None):
        self.__name__ = "_StripeReader"
        self.columns = columns

    def __call__(self, t: pa.Table) -> pa.Table:
        from pyarrow import orc

        out = []
        for path, lo, hi in zip(
            t["path"].to_pylist(),
            t["stripe_lo"].to_pylist(),
            t["stripe_hi"].to_pylist(),
        ):
            f = orc.ORCFile(path)
            for i in range(lo, hi):
                # read_stripe yields a RecordBatch
                out.append(pa.Table.from_batches([f.read_stripe(i, columns=self.columns)]))
        return pa.concat_tables(out, promote_options="default")


def read_orc(
    path: str | list[str],
    columns: list[str] | None = None,
    stripes_per_task: int = 4,
) -> ray.data.Dataset:
    """Stream ORC file(s)/dir/glob as a Dataset: footer-only planning into
    stripe-range tasks, column projection pushed to the ORC reader. An
    explicit list of paths is read verbatim (manifest-scoped readers)."""
    from pyarrow import orc

    files = list(path) if isinstance(path, (list, tuple)) else _orc_files(path)
    if not files:
        raise FileNotFoundError(f"no ORC files under {path!r}")
    plan = []
    for p in files:
        n = orc.ORCFile(p).nstripes  # footer metadata only
        for lo in range(0, n, stripes_per_task):
            plan.append(
                {"path": p, "stripe_lo": lo, "stripe_hi": min(n, lo + stripes_per_task)}
            )
    return ray.data.from_items(plan).map_batches(
        _StripeReader(columns), batch_size=1, batch_format="pyarrow"
    )


def write_orc(ds: ray.data.Dataset, out_dir: str) -> int:
    """Write a Dataset as an atomically-committed ORC directory; returns
    committed row count (manifest-backed, exactly-once under retries)."""
    import json

    from datax_ray.sinks.datasink import AtomicDirDatasink

    sink = AtomicDirDatasink(out_dir, "orc")
    ds.write_datasink(sink)
    with open(os.path.join(out_dir, sink.MANIFEST)) as f:
        return int(json.load(f)["rows"])
