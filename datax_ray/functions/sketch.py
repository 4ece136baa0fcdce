"""HyperLogLog approximate COUNT(DISTINCT) as a decomposable combiner.

The exact distinct-count path (pipelines/queries.py:count_distinct_users_daily)
shuffles one row per distinct key — at 100 TB that is still O(keys). This
sketch bounds the shuffle at 2^p register rows per BATCH regardless of
cardinality (p=12 → 4096 rows, ~1.6% standard error), and registers merge
with max() — a decomposable aggregate, so partial-of-partial is exact for
the sketch itself. The reference has no sketches (no relational algebra at
all, SURVEY.md §2A bottom row); this is training-data-pipeline uplift, where
"how many distinct users/URLs/docs" at crawl scale never needs exactness.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _rho(rem: np.ndarray, max_rho: int) -> np.ndarray:
    """Position (1-based) of the first set bit of each uint64 in `rem`,
    capped at max_rho (all-zero → max_rho). Exact: unpack to a bit matrix
    and argmax — vectorized, no float rounding at 2^k boundaries."""
    bits = np.unpackbits(
        rem.astype(">u8").view(np.uint8).reshape(-1, 8), axis=1
    )
    first = np.argmax(bits, axis=1).astype(np.int64) + 1
    first[bits.max(axis=1) == 0] = max_rho
    return np.minimum(first, max_rho)


def hll_register_partial(col: np.ndarray, p: int) -> pa.Table:
    """One batch's HLL registers as (reg_idx, rho) rows — nonzero only, so
    an under-full batch ships fewer than 2^p rows."""
    m = 1 << p
    h = pd.util.hash_array(col, categorize=False).astype(np.uint64)
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    rem = h << np.uint64(p)
    rho = _rho(rem, max_rho=64 - p + 1)
    reg = np.zeros(m, dtype=np.int64)
    np.maximum.at(reg, idx, rho)
    nz = np.flatnonzero(reg)
    return pa.table(
        {
            "reg_idx": pa.array(nz, pa.int64()),
            "rho": pa.array(reg[nz], pa.int64()),
        }
    )


def hll_estimate(reg_idx: np.ndarray, rho: np.ndarray, p: int) -> int:
    """Fold merged registers into the HLL cardinality estimate (Flajolet et
    al. 2007 constants, linear-counting small-range correction)."""
    m = 1 << p
    reg = np.zeros(m, dtype=np.int64)
    reg[reg_idx] = rho
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-reg.astype(np.float64)))
    zeros = int(np.sum(reg == 0))
    if est <= 2.5 * m and zeros > 0:
        est = m * np.log(m / zeros)
    return int(round(est))


def hll_count_distinct(ds, col: str, p: int = 12) -> pa.Table:
    """Distributed approximate COUNT(DISTINCT ds[col]): per-batch register
    combiners → max-merge (functions/relational.py:partial_agg, single
    reduce — the register table is 2^p rows, never key-count rows) → one
    driver-side fold. Returns a one-row table
    {approx_distinct, precision_p, registers}."""
    from datax_ray.functions.relational import partial_agg

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return hll_register_partial(df[col].to_numpy(), p).to_pandas()

    merged = partial_agg(
        ds.map_batches(partial, batch_format="pandas"),
        keys=["reg_idx"],
        maxs={"rho": "rho"},
        single_reduce=True,  # bounded by 2^p registers, not input size
    ).take_all()
    idx = np.array([r["reg_idx"] for r in merged], dtype=np.int64)
    rho = np.array([r["rho"] for r in merged], dtype=np.int64)
    return pa.table(
        {
            "approx_distinct": pa.array([hll_estimate(idx, rho, p)], pa.int64()),
            "precision_p": pa.array([p], pa.int64()),
            "registers": pa.array([1 << p], pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# Oracle-checkable register variant: same HLL, but over the Murmur3 32-bit
# FINALIZER (public domain mixing constants) of a NON-NEGATIVE INTEGER key,
# which DuckDB reproduces exactly with xor()/shift/HUGEINT-product-mod-2^32
# arithmetic (pipelines/queries.py:HLL_SQL) — a plain multiplicative hash is
# NOT enough here: on sequential ids its leading-zero pattern is structured
# and the estimate biased +80% (measured); the finalizer's xor-shift rounds
# bring it back inside the 1.04/sqrt(m) band. hll_count_distinct above
# hashes arbitrary columns (pd.util.hash_array, 64-bit) and is rows-only by
# nature; this variant trades hash generality for a bit-for-bit register
# oracle, so the driver independently verifies the whole distributed
# combiner path — only the final estimate remains approximate
# (pytest-bounded, tests/test_sketch.py). Same scale shape: <= 2^p integer
# rows shuffle per batch, never data rows.

_M32 = np.uint64(0xFFFFFFFF)


def _mix32(ids: np.ndarray) -> np.ndarray:
    """Murmur3 fmix32 over ids mod 2^32 (keys must be non-negative)."""
    h = ids.astype(np.uint64) & _M32
    h ^= h >> np.uint64(16)
    h = (h * np.uint64(0x85EBCA6B)) & _M32
    h ^= h >> np.uint64(13)
    h = (h * np.uint64(0xC2B2AE35)) & _M32
    h ^= h >> np.uint64(16)
    return h


def _registers_kernel32(ids: np.ndarray, p: int) -> tuple[np.ndarray, np.ndarray]:
    """(bucket, rho) per value for the fmix32 hash; rho is the 1-based
    position of the leftmost 1-bit of the (32-p)-bit suffix, with
    rho = 32-p+1 for an all-zero suffix (standard HLL)."""
    m = 1 << p
    width = 32 - p
    hv = _mix32(ids)
    bucket = (hv % np.uint64(m)).astype(np.int64)
    w = (hv >> np.uint64(p)).astype(np.int64)
    bitlen = np.frexp(w.astype(np.float64))[1]  # exact bit length below 2^53
    rho = np.where(w == 0, width + 1, width + 1 - bitlen).astype(np.int64)
    return bucket, rho


def hll_registers(ds, col: str, p: int = 9):
    """Dataset -> (bucket:int64, max_rho:int64) register table, one row per
    OBSERVED bucket (<= 2^p rows), sorted by bucket — deterministic, so
    DuckDB-oracle-checkable."""
    m = 1 << p

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"bucket": pa.array([], pa.int64()), "max_rho": pa.array([], pa.int64())}
            )
        c = t[col]
        ids = (
            c.combine_chunks().to_numpy(zero_copy_only=False)
            if isinstance(c, pa.ChunkedArray)
            else c.to_numpy(zero_copy_only=False)
        )
        bucket, rho = _registers_kernel32(ids, p)
        regs = np.zeros(m, dtype=np.int64)
        np.maximum.at(regs, bucket, rho)
        nz = np.flatnonzero(regs)
        return pa.table(
            {"bucket": pa.array(nz, pa.int64()), "max_rho": pa.array(regs[nz], pa.int64())}
        )

    out = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .max("max_rho")
    )

    def rename(t: pa.Table) -> pa.Table:  # Ray names the agg "max(max_rho)"
        return t.rename_columns(
            ["bucket" if n == "bucket" else "max_rho" for n in t.column_names]
        )

    return out.map_batches(rename, batch_format="pyarrow").sort("bucket")


def hll_estimate_from_registers(registers: pa.Table, p: int = 9) -> float:
    """hll_estimate over an hll_registers output table."""
    b = registers["bucket"].to_numpy(zero_copy_only=False)
    r = registers["max_rho"].to_numpy(zero_copy_only=False)
    return float(hll_estimate(b, r, p))


# ---------------------------------------------------- count-min sketch --
# Frequency sketch next to HLL (distinct) / Misra-Gries (heavy hitters) /
# the quantile sketch: est(key) >= true(key) always, and
# est <= true + e*N/width with probability 1 - (1/2)^depth (Cormode &
# Muthukrishnan 2005). Register-level oracle in the HLL house style: row
# j's hash is fmix32((key + j*2654435761) mod 2^32) — DuckDB reproduces it
# bit-for-bit (pipelines/queries.py:CMS_SQL), so the driver verifies the
# entire distributed counting path; only the final min-fold estimate is
# approximate (overestimate-guarantee pytest, tests/test_sketch.py).
# Scale shape: per-batch combiner emits <= depth*width integer cell rows,
# the coarse-bucket reduce sums cells — the shuffle never carries data
# rows, whatever N is.

_CMS_SALT = np.uint64(2654435761)  # Knuth's 2^32/phi multiplicative constant


def _cms_cols(ids: np.ndarray, depth: int, width: int) -> np.ndarray:
    """(depth, n) column indices: row j hashes fmix32(key + j*salt)."""
    base = ids.astype(np.uint64) & _M32
    return np.stack(
        [
            (_mix32(base + np.uint64(j) * _CMS_SALT) % np.uint64(width)).astype(
                np.int64
            )
            for j in range(depth)
        ]
    )


def cms_registers(ds, col: str, depth: int = 4, width: int = 1024,
                  num_buckets: int = 8):
    """Dataset -> (cms_row, cms_col, cnt) int64 Count-Min cell table,
    one row per OBSERVED cell (<= depth*width rows), sorted by (row, col)
    — deterministic given the fixed fmix32 row hashes, so
    DuckDB-oracle-checkable. Keys must be non-negative integers (the
    oracle's HUGEINT arithmetic assumes mod-2^32 of a non-negative)."""
    from datax_ray.functions.relational import partial_agg

    empty = pa.table(
        {
            "cms_row": pa.array([], pa.int64()),
            "cms_col": pa.array([], pa.int64()),
            "cnt": pa.array([], pa.int64()),
        }
    )

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return empty
        c = t[col]
        ids = (
            c.combine_chunks().to_numpy(zero_copy_only=False)
            if isinstance(c, pa.ChunkedArray)
            else c.to_numpy(zero_copy_only=False)
        )
        cols = _cms_cols(ids, depth, width)
        rows_out, cols_out, cnts_out = [], [], []
        for j in range(depth):
            counts = np.bincount(cols[j], minlength=width)
            nz = np.flatnonzero(counts)
            rows_out.append(np.full(len(nz), j, dtype=np.int64))
            cols_out.append(nz.astype(np.int64))
            cnts_out.append(counts[nz].astype(np.int64))
        return pa.table(
            {
                "cms_row": pa.array(np.concatenate(rows_out)),
                "cms_col": pa.array(np.concatenate(cols_out)),
                "cnt": pa.array(np.concatenate(cnts_out)),
            }
        )

    merged = partial_agg(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        keys=["cms_row", "cms_col"],
        sums={"cnt": "cnt"},
        num_buckets=num_buckets,
    )
    return merged.sort(["cms_row", "cms_col"])


def cms_estimate_from_registers(
    registers: pa.Table, keys: np.ndarray, depth: int = 4, width: int = 1024
) -> np.ndarray:
    """Point-frequency estimates for `keys` from a cms_registers table:
    min over rows of the addressed cell (absent cell = 0). Vectorized via
    a dense (depth, width) reconstruction — depth*width ints, driver-safe."""
    dense = np.zeros((depth, width), dtype=np.int64)
    r = registers["cms_row"].to_numpy(zero_copy_only=False)
    c = registers["cms_col"].to_numpy(zero_copy_only=False)
    v = registers["cnt"].to_numpy(zero_copy_only=False)
    dense[r, c] = v
    cols = _cms_cols(np.asarray(keys), depth, width)
    ests = dense[np.arange(depth)[:, None], cols]
    return ests.min(axis=0)


# ------------------------------------------------------- heavy hitters --


def _mg_summary(values: np.ndarray, counts: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
    """Misra-Gries compress: keep at most k-1 (value, count) counters.
    Standard weighted variant: sort by count desc, keep the top k-1 and
    subtract the k-th largest surviving count from each (the decrement
    step batched). Guarantee preserved: est(v) >= true(v) - N/k."""
    if len(values) < k:
        return values, counts
    order = np.argsort(-counts, kind="stable")
    values, counts = values[order], counts[order]
    dec = counts[k - 1]
    keep = counts[: k - 1] - dec
    m = keep > 0
    return values[: k - 1][m], keep[m]


def heavy_hitters(ds, col: str, k: int = 64, num_buckets: int = 16):
    """Misra-Gries heavy hitters: every value with frequency > N/k is
    GUARANTEED to surface, using k-bounded memory per stage — the
    frequent-items sketch next to HLL (distinct) and the quantile sketch.
    Approximate by design (counts are lower bounds, est >= true - N/k):
    rows-only checks + the guarantee pytest, like the other sketches.

    Scale shape: per-batch exact value counts compress to k-1 counters
    (combiner), per-bucket merges compress again (MG summaries merge by
    counter addition + re-compress), one final k-bounded fold — the
    shuffle never carries more than buckets x k counter rows, whatever N
    is. Returns (value, est_count) sorted by est desc."""
    import pandas as pd

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by([col], use_threads=False).aggregate([([], "count_all")])
        v = g[col].to_numpy(zero_copy_only=False)
        c = g["count_all"].to_numpy(zero_copy_only=False).astype(np.int64)
        v, c = _mg_summary(v, c, k)
        h = pd.util.hash_array(np.asarray(v), categorize=False)
        return pa.table(
            {
                col: pa.array(v),
                "est": pa.array(c),
                "_grp": pa.array((h % np.uint64(num_buckets)).astype("int32")),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        g = (
            t.drop_columns(["_grp"])
            .group_by([col], use_threads=False)
            .aggregate([("est", "sum")])
        )
        v = g[col].to_numpy(zero_copy_only=False)
        c = g["est_sum"].to_numpy(zero_copy_only=False).astype(np.int64)
        v, c = _mg_summary(v, c, k)
        return pa.table({col: pa.array(v), "est": pa.array(c)})

    def final(t: pa.Table) -> pa.Table:
        g = t.group_by([col], use_threads=False).aggregate([("est", "sum")])
        v = g[col].to_numpy(zero_copy_only=False)
        c = g["est_sum"].to_numpy(zero_copy_only=False).astype(np.int64)
        v, c = _mg_summary(v, c, k)
        order = np.argsort(-c, kind="stable")
        return pa.table({col: pa.array(v[order]), "est": pa.array(c[order])})

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_grp")
        .map_groups(merge, batch_format="pyarrow")
        .repartition(1)
        .map_batches(final, batch_format="pyarrow", batch_size=None)
    )


def hll_registers_grouped(ds, col: str, group_col: str, p: int = 9):
    """Per-group HLL register tables in ONE pass: (group, bucket, max_rho)
    with <= groups x 2^p rows ever shuffled. The merge property (union
    sketch == per-bucket max of the operand sketches) is exact, so unions
    and inclusion-exclusion overlap estimates derive from this table with
    no further data passes."""
    def partial(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                group_col: pa.array([], pa.string()),
                "bucket": pa.array([], pa.int64()),
                "max_rho": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        c = t[col]
        ids = (
            c.combine_chunks().to_numpy(zero_copy_only=False)
            if isinstance(c, pa.ChunkedArray)
            else c.to_numpy(zero_copy_only=False)
        )
        bucket, rho = _registers_kernel32(ids, p)
        part = (
            pa.table(
                {
                    group_col: pc.cast(t[group_col], pa.string()),
                    "bucket": pa.array(bucket, pa.int64()),
                    "rho": pa.array(rho, pa.int64()),
                }
            )
            .group_by([group_col, "bucket"], use_threads=False)
            .aggregate([("rho", "max")])
            .rename_columns([group_col, "bucket", "max_rho"])
        )
        return part

    out = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby([group_col, "bucket"])
        .max("max_rho")
    )

    def rename(t: pa.Table) -> pa.Table:
        return t.rename_columns(
            [n if not n.startswith("max(") else "max_rho" for n in t.column_names]
        )

    return out.map_batches(rename, batch_format="pyarrow")


def hll_merge_registers(tables: list[pa.Table]) -> pa.Table:
    """Union of HLL sketches: per-bucket max across the operand register
    tables — EXACT (the defining merge property of HLL), so a merged
    sketch is bit-identical to the sketch of the unioned stream."""
    both = pa.concat_tables([t.select(["bucket", "max_rho"]) for t in tables])
    return (
        both.group_by(["bucket"], use_threads=False)
        .aggregate([("max_rho", "max")])
        .rename_columns(["bucket", "max_rho"])
        .sort_by([("bucket", "ascending")])
    )
