"""Stream-shaped operators over an ordered, keyed event log (Ray Data has
no native event-time windows; per the public Ray guidance these are
groupby(key).map_groups over ts-sorted groups — the ordering assumption is
per-key, imposed inside the group function itself).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def sessionize(
    ds,
    key_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str = "event_id",
    gap_us: int = 30 * 60 * 1_000_000,
):
    """Assign session ids per key: a new session starts when the gap to the
    previous event exceeds `gap_us`. Returns (key, session_id, n_events,
    t_start, t_end) — one row per session."""

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([ts_col, order_col], kind="stable")
        ts = g[ts_col].astype("int64").to_numpy()
        new = np.ones(len(g), dtype=np.int64)
        new[1:] = (ts[1:] - ts[:-1]) > gap_us
        sid = np.cumsum(new) - 1
        g = g.assign(session_id=sid)
        out = (
            g.groupby("session_id")
            .agg(
                n_events=(order_col, "count"),
                t_start=(ts_col, "min"),
                t_end=(ts_col, "max"),
            )
            .reset_index()
        )
        out.insert(0, key_col, g[key_col].iloc[0])
        return out

    return ds.groupby(key_col).map_groups(per_key, batch_format="pandas")


def tumbling_window_counts(
    ds,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    window_us: int = 3_600_000_000,
):
    """Tumbling-window aggregate per key: (key, window_start, n_events,
    sum_value). Pre-aggregated inside map_batches (combiner), then a small
    groupby over the per-batch partials — the shuffle moves one row per
    (key, window, batch) instead of every event."""

    def partial(t: pa.Table) -> pa.Table:
        ts = pc.cast(t[ts_col], pa.int64())
        win = pc.multiply(pc.divide(ts, window_us), window_us)
        tt = pa.table(
            {
                key_col: t[key_col],
                "window_start": win,
                "n_events": pa.array(np.ones(t.num_rows, dtype=np.int64)),
                "sum_value": t[value_col],
            }
        )
        df = tt.to_pandas()
        out = (
            df.groupby([key_col, "window_start"], as_index=False)
            .agg(n_events=("n_events", "sum"), sum_value=("sum_value", "sum"))
        )
        return pa.Table.from_pandas(out, preserve_index=False)

    from ray.data.aggregate import Sum

    out = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby([key_col, "window_start"])
        .aggregate(
            Sum("n_events", alias_name="n_events"),
            Sum("sum_value", alias_name="sum_value"),
        )
    )
    # restore timestamp type for the window edge
    def to_ts(t: pa.Table) -> pa.Table:
        i = t.schema.get_field_index("window_start")
        return t.set_column(
            i, "window_start", pc.cast(t["window_start"], pa.timestamp("us"))
        )

    return out.map_batches(to_ts, batch_format="pyarrow")
