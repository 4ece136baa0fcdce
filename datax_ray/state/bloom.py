"""Per-file key Bloom filters — the fourth data-skipping tier.

Point lookups already prune (1) ranges by manifest hash routing
(sinks/lake.py:_lookup_rids), (2) whole files by event-time stats
(time slices), and (3) parquet row groups by conv_id min/max pushdown.
What none of those catch: a range accumulates one FRAGMENT per epoch,
and most epochs never touch the conversation being looked up — hash
routing keeps the file in the plan (right range) and row-group stats
only help after the file is opened. A tiny per-file Bloom over the
file's distinct conv_ids, carried in the manifest, lets the planner
drop those fragments without any storage read — the same role as
Parquet column Bloom filters / Delta file-level Bloom indexes, but
manifest-resident so the lookup stays O(manifest).

Determinism: bits derive from the SAME process-stable string hash the
partitioner uses (pandas.util.hash_array via stages/partitioning.py),
so a retried task rewrites the identical lineage row and content-hash
discipline is preserved. Probes are 4 independent 16-bit slices of the
64-bit hash, each modulo the (power-of-two, <= 2^16) bit count.

Sizing: m = pow2ceil(8n) bits capped at _MAX_BITS. Above the cap the
filter's false-positive rate stops paying for its manifest bytes — and
files that large are compacted bases whose row-group stats already
skip well — so builders return None and readers treat a missing bloom
as "may contain" (which also keeps pre-upgrade manifests correct).
"""

from __future__ import annotations

import base64

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from datax_ray.stages.partitioning import _stable_hash_strings

_MAX_BITS = 8192  # 1 KiB of bits -> ~1.4 KiB base64 per manifest entry
_SHIFTS = (np.uint64(0), np.uint64(16), np.uint64(32), np.uint64(48))
_MASK16 = np.uint64(0xFFFF)


def _probe_hashes(keys) -> np.ndarray:
    """uint64 stable hashes for an iterable/array of key strings."""
    arr = np.asarray(list(keys), dtype=object)
    if len(arr) == 0:
        return np.empty(0, np.uint64)
    return _stable_hash_strings(arr)


def bloom_of_keys(col: pa.ChunkedArray | pa.Array) -> str | None:
    """base64 Bloom over the column's distinct non-null values, or None
    when empty / too many distincts for the capped filter to be useful."""
    uniq = pc.unique(
        col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    ).drop_null()
    n = len(uniq)
    if n == 0 or n * 8 > _MAX_BITS:
        return None
    m = 256
    while m < n * 8:
        m <<= 1
    h = _probe_hashes(uniq.to_pylist())
    bits = np.zeros(m, dtype=bool)
    mod = np.uint64(m)
    for s in _SHIFTS:
        bits[((h >> s) & _MASK16) % mod] = True
    return base64.b64encode(np.packbits(bits).tobytes()).decode()


def bloom_may_contain(b64: str | None, probe: np.ndarray) -> bool:
    """May ANY of the probe hashes be in the filter? Missing filter or
    empty probe set -> True (never prune on absent evidence)."""
    if not b64 or len(probe) == 0:
        return True
    bits = np.unpackbits(np.frombuffer(base64.b64decode(b64), dtype=np.uint8))
    mod = np.uint64(len(bits))
    hit = np.ones(len(probe), dtype=bool)
    for s in _SHIFTS:
        hit &= bits[((probe >> s) & _MASK16) % mod].astype(bool)
    return bool(hit.any())
