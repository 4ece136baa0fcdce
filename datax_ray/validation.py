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


# ------------------------------------------------------------ expectations --

# Ingest expectations (Delta-style CHECK constraints expressed DataX-style:
# violations are dirty records, counted against errorLimit, never silently
# dropped). Spec grammar (JSON-friendly list of dicts):
#   {"column": c, "op": "not_null"}
#   {"column": c, "op": "in", "values": [...]}
#   {"column": c, "op": "between", "lo": x, "hi": y}   # numeric / turn_idx
#   {"column": c, "op": "matches", "pattern": "regex"} # string columns (RE2)
#   {"column": c, "op": "not_matches", "pattern": "regex"}  # inverted match
#   {"column": c, "op": "max_len", "value": n}         # utf8 length bound
# Evaluation rules: expectations apply to insert/update rows only (a delete
# carries no payload). "not_null" fails on a null/missing column; every
# value rule PASSES on null (null means "absent", and absent-ness is
# not_null's job) — so one column can carry both a presence and a shape
# expectation without double-counting.


def compile_expectations(specs: list[dict]):
    """specs -> fn(table) -> (pass_mask, reason_array). Pure pyarrow
    kernels; reasons are null for passing rows, 'expectation:<col>:<op>'
    for the FIRST failed expectation per row (spec order)."""

    def _col(t: pa.Table, name: str):
        i = t.schema.get_field_index(name)
        return t[name] if i != -1 else None

    def check(t: pa.Table):
        n = t.num_rows
        exempt = pc.fill_null(pc.equal(t["op"], "delete"), False)
        pass_all = pa.chunked_array([pa.array([True] * n, pa.bool_())])
        reason = pa.chunked_array([pa.nulls(n, pa.string())])
        for spec in specs:
            cname, op = spec["column"], spec["op"]
            col = _col(t, cname)
            if col is None:
                ok = pa.chunked_array(
                    [pa.array([op != "not_null"] * n, pa.bool_())]
                )
            elif op == "not_null":
                ok = pc.is_valid(col)
            elif op == "in":
                vals = pa.array(spec["values"], col.type)
                ok = pc.fill_null(pc.is_in(col, value_set=vals), True)
                ok = pc.or_kleene(ok, pc.is_null(col))
            elif op == "between":
                ok = pc.and_kleene(
                    pc.greater_equal(col, spec["lo"]),
                    pc.less_equal(col, spec["hi"]),
                )
                ok = pc.or_kleene(pc.fill_null(ok, False), pc.is_null(col))
            elif op in ("matches", "not_matches"):
                ok = pc.match_substring_regex(col, spec["pattern"])
                if op == "not_matches":
                    ok = pc.invert(ok)
                ok = pc.or_kleene(pc.fill_null(ok, False), pc.is_null(col))
            elif op == "max_len":
                ok = pc.less_equal(pc.utf8_length(col), spec["value"])
                ok = pc.or_kleene(pc.fill_null(ok, False), pc.is_null(col))
            else:
                raise ValueError(f"unknown expectation op {op!r}")
            ok = pc.or_kleene(pc.fill_null(ok, False), exempt)
            newly_bad = pc.and_kleene(
                pc.and_kleene(pass_all, pc.invert(ok)), pc.is_null(reason)
            )
            reason = pc.if_else(
                newly_bad, f"expectation:{cname}:{op}", reason
            )
            pass_all = pc.and_kleene(pass_all, ok)
        return pc.fill_null(pass_all, False), reason

    return check
