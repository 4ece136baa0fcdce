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
