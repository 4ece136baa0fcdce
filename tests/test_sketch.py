"""HyperLogLog sketch (functions/sketch.py).

Registers are exact (DuckDB parity is covered by test_query_parity's
hll_registers_events); here: (1) the estimate is within the standard-error
bound of the true cardinality across scales including the linear-counting
regime; (2) the combiner is block-layout invariant (register MAX is
associative+commutative); (3) duplicate values never change registers.
"""

import numpy as np
import pyarrow as pa

import ray.data

from datax_ray.functions.sketch import hll_estimate_from_registers, hll_registers

P = 9  # 512 buckets, standard error 1.04/sqrt(512) ~ 4.6%


def _regs(ids: np.ndarray, blocks: int = 5) -> pa.Table:
    ds = ray.data.from_arrow(
        pa.table({"event_id": pa.array(ids, pa.int64())})
    ).repartition(blocks)
    return pa.Table.from_pandas(
        hll_registers(ds, "event_id", p=P).to_pandas(), preserve_index=False
    )


def test_estimate_within_error_bound(ray_session):
    for n in (2_000, 20_000, 100_000):
        ids = np.arange(n, dtype=np.int64) * 7 + 13
        est = hll_estimate_from_registers(_regs(ids), p=P)
        assert abs(est - n) / n < 0.15, (n, est)  # > 3 sigma margin


def test_linear_counting_regime(ray_session):
    ids = np.arange(40, dtype=np.int64)
    est = hll_estimate_from_registers(_regs(ids, blocks=2), p=P)
    assert abs(est - 40) / 40 < 0.25


def test_layout_invariant_and_duplicate_proof(ray_session):
    ids = np.arange(5_000, dtype=np.int64)
    a = _regs(ids, blocks=3)
    b = _regs(ids, blocks=17)
    assert a.equals(b)
    dup = np.concatenate([ids, ids, ids[:123]])
    c = _regs(dup, blocks=7)
    assert a.equals(c)


# ---------------------------------------------------- count-min sketch --


def test_cms_guarantees(ray_session):
    """CMS guarantees: (1) point estimates NEVER undercount (est >= true —
    the defining one-sided error of Count-Min); (2) total mass is
    preserved per hash row; (3) the combiner is block-layout invariant
    (cell SUM is associative+commutative); (4) error on planted heavy keys
    stays within the e*N/width expectation band."""
    import pandas as pd

    from datax_ray.functions.sketch import (
        cms_estimate_from_registers,
        cms_registers,
    )

    rng = np.random.default_rng(23)
    heavy = np.repeat(np.array([5, 77, 901], dtype=np.int64), [8000, 5000, 2500])
    tail = rng.integers(0, 50_000, size=30_000).astype(np.int64)
    vals = np.concatenate([heavy, tail])
    rng.shuffle(vals)
    n = len(vals)
    depth, width = 4, 1024

    def regs(blocks: int) -> pa.Table:
        ds = ray.data.from_arrow(
            pa.table({"k": pa.array(vals, pa.int64())})
        ).repartition(blocks)
        t = cms_registers(ds, "k", depth=depth, width=width)
        return pa.Table.from_pandas(t.to_pandas(), preserve_index=False)

    a = regs(5)
    # (3) layout invariance
    assert a.equals(regs(13))
    # (2) each hash row sees every value exactly once
    per_row = (
        a.to_pandas().groupby("cms_row")["cnt"].sum().to_numpy()
    )
    assert (per_row == n).all(), per_row
    # (1) + (4): overestimate-only, bounded error on distinct probe keys
    probe = np.unique(vals)[:2000]
    true = pd.Series(vals).value_counts()
    est = cms_estimate_from_registers(a, probe, depth=depth, width=width)
    for k, e in zip(probe, est):
        assert e >= true[k], (k, e, true[k])
    for k, cnt in [(5, 8000), (77, 5000), (901, 2500)]:
        e = cms_estimate_from_registers(
            a, np.array([k]), depth=depth, width=width
        )[0]
        assert e - cnt <= 3 * n // width, (k, e, cnt)


# ------------------------------------------------------- Misra-Gries --


def test_heavy_hitters_guarantees():
    """MG guarantees: (1) counts are LOWER bounds (never overcount);
    (2) every value with true frequency > ~N * (levels/k) survives the
    sketch (3 compression levels here: batch, bucket-merge, final)."""
    import numpy as np
    import pandas as pd

    import ray

    from datax_ray.functions.sketch import heavy_hitters

    rng = np.random.default_rng(11)
    # zipf-ish: a few heavy values over a long uniform tail
    heavy = np.repeat(np.array([7, 13, 42], dtype=np.int64), [9000, 6000, 4000])
    tail = rng.integers(1000, 200_000, size=21_000).astype(np.int64)
    vals = np.concatenate([heavy, tail])
    rng.shuffle(vals)
    n = len(vals)
    ds = ray.data.from_pandas(pd.DataFrame({"v": vals})).repartition(12)

    k = 64
    out = heavy_hitters(ds, "v", k=k, num_buckets=8).to_pandas()
    true = pd.Series(vals).value_counts()
    est = dict(zip(out["v"], out["est"]))

    # (1) lower bound, never overcount
    for v, e in est.items():
        assert e <= true[v], (v, e, true[v])
    # (2) the three planted heavy hitters (freq >> 3N/k ≈ 1400) surface,
    #     with est within the summed compression error
    for v, cnt in [(7, 9000), (13, 6000), (42, 4000)]:
        assert v in est, f"heavy hitter {v} lost"
        assert est[v] >= cnt - 3 * n // k, (v, est[v], cnt)
    # bounded output
    assert len(out) < k
