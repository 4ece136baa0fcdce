"""Full-outer join paths (functions/relational.py:large_join and the
union+MAX-fold plan used by queries.py:full_outer_daily_click_purchase)
must agree with each other and with pyarrow's reference full outer join —
including unmatched rows on BOTH sides and composite keys."""

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from datax_ray.functions.relational import large_join, partial_agg


def _sides(seed: int = 5, n: int = 400):
    rng = np.random.default_rng(seed)
    # overlapping but not identical composite key sets
    lk = rng.integers(0, 60, size=n)
    ld = rng.integers(0, 8, size=n)
    rk = rng.integers(30, 90, size=n)
    rd = rng.integers(0, 8, size=n)
    left = (
        pd.DataFrame({"k": lk, "d": ld})
        .groupby(["k", "d"], as_index=False)
        .size()
        .rename(columns={"size": "a"})
    )
    right = (
        pd.DataFrame({"k": rk, "d": rd})
        .groupby(["k", "d"], as_index=False)
        .size()
        .rename(columns={"size": "b"})
    )
    return left.astype("int64"), right.astype("int64")


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[["k", "d", "a", "b"]].astype("float64")
    return df.sort_values(["k", "d"]).reset_index(drop=True)


def test_large_join_full_outer_matches_reference_and_cogroup(ray_session):
    left, right = _sides()
    ref = _norm(pd.merge(left, right, on=["k", "d"], how="outer"))
    assert ref["a"].isna().any() and ref["b"].isna().any(), "degenerate fixture"

    lds = ray.data.from_pandas(left).repartition(7)
    rds = ray.data.from_pandas(right).repartition(5)
    joined = _norm(
        large_join(lds, rds, on=("k", "d"), join_type="full_outer").to_pandas()
    )
    pd.testing.assert_frame_equal(joined, ref)

    # union + per-key MAX fold (keys unique per side) — the cheap plan
    def widen(col):
        def fn(t: pa.Table) -> pa.Table:
            n = t.num_rows
            return pa.table(
                {
                    "k": t["k"],
                    "d": t["d"],
                    "a": t["a"] if col == "a" else pa.nulls(n, pa.int64()),
                    "b": t["b"] if col == "b" else pa.nulls(n, pa.int64()),
                }
            )

        return fn

    both = lds.map_batches(widen("a"), batch_format="pyarrow").union(
        rds.map_batches(widen("b"), batch_format="pyarrow")
    )
    cg = _norm(
        partial_agg(
            both, keys=["k", "d"], maxs={"a": "a", "b": "b"}, num_buckets=8
        ).to_pandas()
    )
    pd.testing.assert_frame_equal(cg, ref)
