"""Shared dirty-record rules.

DataX routes records that fail conversion/validation to a dirty-record
collector with an error-limit abort (SURVEY.md §2A rows 17, 20; BASELINE.json
"dirty-record accounting"). These predicates are the single source of truth
used by BOTH the engine's normalize stage and the sequential oracle, so the
two always agree on which events count.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from datax_ray.schemas import VALID_OPS


def valid_event_mask(t: pa.Table) -> pa.ChunkedArray:
    """True per row iff the event is well-formed (op=ddl rows excluded upstream).

    Rules: conv_id / ts / lsn / turn_idx non-null, turn_idx >= 0, op in
    {insert, update, delete}.
    """
    m = pc.is_valid(t["conv_id"])
    m = pc.and_kleene(m, pc.is_valid(t["ts"]))
    m = pc.and_kleene(m, pc.is_valid(t["lsn"]))
    m = pc.and_kleene(m, pc.is_valid(t["turn_idx"]))
    m = pc.and_kleene(
        m, pc.fill_null(pc.greater_equal(t["turn_idx"], 0), False)
    )
    m = pc.and_kleene(m, pc.is_in(t["op"], value_set=pa.array(VALID_OPS)))
    return pc.fill_null(m, False)


def dirty_reason(t: pa.Table) -> pa.Array:
    """A human-readable reason per row (null for valid rows)."""
    n = t.num_rows
    reasons = [None] * n
    conv_null = pc.is_null(t["conv_id"]).to_pylist()
    ts_null = pc.is_null(t["ts"]).to_pylist()
    lsn_null = pc.is_null(t["lsn"]).to_pylist()
    turn = t["turn_idx"].to_pylist()
    op = t["op"].to_pylist()
    for i in range(n):
        if conv_null[i]:
            reasons[i] = "null conv_id"
        elif ts_null[i]:
            reasons[i] = "null ts"
        elif lsn_null[i]:
            reasons[i] = "null lsn"
        elif turn[i] is None:
            reasons[i] = "null turn_idx"
        elif turn[i] < 0:
            reasons[i] = "negative turn_idx"
        elif op[i] not in VALID_OPS:
            reasons[i] = f"invalid op {op[i]!r}"
    return pa.array(reasons, pa.string())
