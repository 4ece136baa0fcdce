"""Change-log source + epoch planner (SURVEY.md §2B-B1, B8).

The change log is a directory of ordered Parquet segment files
(`seg-00000.parquet`, ...), each a contiguous slice of the binlog/WAL. The
planner lists segments, subtracts those already recorded in committed
manifests, and chunks the remainder into epochs — resume is therefore the
same code path as a fresh run (SURVEY.md §3.2 E2).

`scan_ddl` is a column-pruned pyarrow scan (only lsn/ts/op/ddl leave the
files) — DDL events are rare, so folding them driver-side costs almost
nothing even on wide segments.
"""

from __future__ import annotations

import glob
import os

import pyarrow.compute as pc

from datax_ray.state.manifest import Manifest


def list_segments(changes_dir: str) -> list[str]:
    return sorted(glob.glob(os.path.join(changes_dir, "seg-*.parquet")))


def plan_epochs(
    changes_dir: str, manifest: Manifest, segments_per_epoch: int | None = None
) -> list[list[str]]:
    """Uncommitted segments, chunked into epochs (default: all-in-one)."""
    committed = manifest.committed_segments()
    pending = [s for s in list_segments(changes_dir) if os.path.basename(s) not in committed]
    if not pending:
        return []
    if not segments_per_epoch or segments_per_epoch <= 0:
        return [pending]
    return [
        pending[i : i + segments_per_epoch]
        for i in range(0, len(pending), segments_per_epoch)
    ]


def scan_ddl(segment_paths: list[str]) -> list[tuple[int, str]]:
    """[(lsn, ddl_json)] for op='ddl' rows, in (ts, lsn) order.

    Row-group pruning via parquet min/max statistics on `op`: a row group
    can contain 'ddl' rows only if min(op) <= 'ddl' (every other op string
    sorts after 'ddl'), so with rare DDL almost no data pages are read and
    this stays O(files) driver-side at any event scale."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    tables = []
    for path in segment_paths:
        f = pq.ParquetFile(path)
        md = f.metadata
        idx = md.schema.to_arrow_schema().get_field_index("op")
        cand = []
        for rg in range(md.num_row_groups):
            stats = md.row_group(rg).column(idx).statistics
            if stats is None or not stats.has_min_max or stats.min <= "ddl":
                cand.append(rg)
        if cand:
            t = f.read_row_groups(cand, columns=["lsn", "ts", "op", "ddl"])
            tables.append(t.filter(pc.equal(t["op"], "ddl")))
    if not tables:
        return []
    t = pa.concat_tables(tables)
    if t.num_rows == 0:
        return []
    t = t.take(pc.sort_indices(t, sort_keys=[("ts", "ascending"), ("lsn", "ascending")]))
    return list(zip(t["lsn"].to_pylist(), t["ddl"].to_pylist()))


def max_lsn(segment_paths: list[str]) -> int:
    """Max LSN across segments from parquet row-group statistics (no data
    pages read — metadata only, so this stays O(files) at any scale)."""
    import pyarrow.parquet as pq

    hi = -1
    for p in segment_paths:
        md = pq.ParquetFile(p).metadata
        idx = md.schema.to_arrow_schema().get_field_index("lsn")
        for rg in range(md.num_row_groups):
            stats = md.row_group(rg).column(idx).statistics
            if stats is not None and stats.has_min_max:
                hi = max(hi, stats.max)
    return hi
