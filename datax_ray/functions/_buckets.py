"""Coarse-bucket sizing for groupby(map_groups) shuffle stages.

Ray Data's groupby().map_groups calls the group function once per GROUP, so
every shuffle-then-reduce stage here groups by a COARSE hash bucket (many
logical keys per bucket) and vectorizes inside the bucket. That makes one
bucket = one map_groups group = one worker's working set — so the bucket
COUNT must scale with input size or a fixed-64 bucketing OOMs at 100 TB
(each bucket would hold rows/64 of the whole stream).

Sizing rule (same shape as the fragment-range rule in stages/delta.py):
    num_buckets = max(floor, ceil(est_rows / rows_per_bucket))
with rows_per_bucket chosen so one bucket's rows fit comfortably in a worker
heap (default 2M rows ≈ a few hundred MB for text-bearing rows). The floor
keeps small inputs spread over the task pool. Results are invariant to the
bucket count (hash-partitioning only routes; the per-bucket kernels are
key-exact) — tests assert 64 vs 512 buckets produce identical output.
"""

from __future__ import annotations

import math


def coarse_buckets(
    est_rows: int | None,
    rows_per_bucket: int = 2_000_000,
    floor: int = 64,
) -> int:
    if not est_rows or est_rows <= 0:
        return floor
    return max(floor, math.ceil(est_rows / rows_per_bucket))


def parquet_rows(path: str) -> int:
    """Row count from parquet footer metadata — no data pages read."""
    import pyarrow.parquet as pq

    return pq.ParquetFile(path).metadata.num_rows
