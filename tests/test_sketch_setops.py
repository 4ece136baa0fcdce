"""HLL set operations (functions/sketch.py:hll_registers_grouped /
hll_merge_registers): the merge property is EXACT (union sketch ==
per-bucket max), and the inclusion-exclusion overlap estimate stays
inside the p=9 error envelope on planted-overlap sets."""

import numpy as np
import pyarrow as pa

import ray.data

from datax_ray.functions.sketch import (
    hll_estimate_from_registers,
    hll_merge_registers,
    hll_registers,
    hll_registers_grouped,
)

P = 9


def _table(ids_a, ids_b):
    return pa.table(
        {
            "uid": pa.array(np.concatenate([ids_a, ids_b]), pa.int64()),
            "grp": pa.array(["a"] * len(ids_a) + ["b"] * len(ids_b), pa.string()),
        }
    )


def _split(grouped: pa.Table, g: str) -> pa.Table:
    import pyarrow.compute as pc

    sel = grouped.filter(pc.equal(grouped["grp"], g))
    return sel.select(["bucket", "max_rho"])


def test_hll_merge_equals_union_sketch(ray_session):
    rng = np.random.default_rng(11)
    a = rng.choice(2_000_000, 30_000, replace=False).astype(np.int64)
    b = np.concatenate([a[:10_000], (rng.choice(500_000, 20_000, replace=False) + 3_000_000)])
    ds = ray.data.from_arrow(_table(a, b)).repartition(4)
    grouped = pa.concat_tables(
        [t for t in ray.get(
            hll_registers_grouped(ds, "uid", "grp", p=P).to_arrow_refs()
        ) if t.num_rows]
    )
    merged = hll_merge_registers([_split(grouped, "a"), _split(grouped, "b")])

    direct = pa.concat_tables(
        [t for t in ray.get(
            hll_registers(
                ray.data.from_arrow(
                    pa.table({"uid": pa.array(np.unique(np.concatenate([a, b])), pa.int64())})
                ),
                "uid",
                p=P,
            ).to_arrow_refs()
        ) if t.num_rows]
    ).sort_by([("bucket", "ascending")])
    assert merged.equals(direct)


def test_hll_inclusion_exclusion_overlap(ray_session):
    rng = np.random.default_rng(23)
    overlap = rng.choice(10_000_000, 12_000, replace=False).astype(np.int64)
    only_a = rng.choice(5_000_000, 25_000, replace=False).astype(np.int64) + 20_000_000
    only_b = rng.choice(5_000_000, 18_000, replace=False).astype(np.int64) + 40_000_000
    a = np.concatenate([overlap, only_a])
    b = np.concatenate([overlap, only_b])
    ds = ray.data.from_arrow(_table(a, b)).repartition(3)
    grouped = pa.concat_tables(
        [t for t in ray.get(
            hll_registers_grouped(ds, "uid", "grp", p=P).to_arrow_refs()
        ) if t.num_rows]
    )
    ra, rb = _split(grouped, "a"), _split(grouped, "b")
    ea = hll_estimate_from_registers(ra, p=P)
    eb = hll_estimate_from_registers(rb, p=P)
    eu = hll_estimate_from_registers(hll_merge_registers([ra, rb]), p=P)
    est_overlap = ea + eb - eu
    true_overlap = len(overlap)
    # inclusion-exclusion compounds three +-1.04/sqrt(512) (~4.6%)
    # estimates scaled by the set sizes; allow a generous union-scaled bound
    tol = 0.15 * (len(a) + len(b))
    assert abs(est_overlap - true_overlap) < tol
    # and each single-set estimate stays in its own envelope
    assert abs(ea - len(a)) < 0.2 * len(a)
    assert abs(eb - len(b)) < 0.2 * len(b)
