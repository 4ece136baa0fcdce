"""Per-record transformer pipeline — DataX's dx_substr / dx_pad / dx_replace /
dx_filter / dx_groovy re-expressed as vectorized Arrow batch transforms
(SURVEY.md §2A rows 10-14). DataX ran these row-at-a-time between reader and
channel; here each is a pyarrow.compute kernel inside `map_batches`, and a
config list (like DataX's job-config `transformer` array) compiles to one
fused batch function.
"""

from __future__ import annotations

from collections.abc import Callable

import pyarrow as pa
import pyarrow.compute as pc


def substr(col: str, start: int, length: int) -> Callable[[pa.Table], pa.Table]:
    """dx_substr: keep [start, start+length) of a string column (0-based)."""

    def fn(t: pa.Table) -> pa.Table:
        out = pc.utf8_slice_codeunits(t[col], start=start, stop=start + length)
        return t.set_column(t.schema.get_field_index(col), col, out)

    return fn


def pad(col: str, length: int, pad_str: str = " ", side: str = "left") -> Callable:
    """dx_pad: pad a string column to `length` with `pad_str`."""
    kernel = pc.utf8_lpad if side == "left" else pc.utf8_rpad

    def fn(t: pa.Table) -> pa.Table:
        out = kernel(t[col], width=length, padding=pad_str)
        return t.set_column(t.schema.get_field_index(col), col, out)

    return fn


def replace(col: str, pattern: str, replacement: str) -> Callable:
    """dx_replace: replace every occurrence of a literal substring."""

    def fn(t: pa.Table) -> pa.Table:
        out = pc.replace_substring(t[col], pattern=pattern, replacement=replacement)
        return t.set_column(t.schema.get_field_index(col), col, out)

    return fn


_FILTER_KERNELS = {
    ">": pc.greater,
    "<": pc.less,
    ">=": pc.greater_equal,
    "<=": pc.less_equal,
    "=": pc.equal,
    "!=": pc.not_equal,
}


def filter_rows(col: str, op: str, value) -> Callable:
    """dx_filter: keep rows matching the predicate. `op` is one of
    > < >= <= = != like not_like ('%' wildcards, translated to a regex)."""
    if op in _FILTER_KERNELS:
        kernel = _FILTER_KERNELS[op]

        def fn(t: pa.Table) -> pa.Table:
            return t.filter(pc.fill_null(kernel(t[col], value), False))

        return fn
    if op in ("like", "not_like"):
        import re

        regex = "^" + ".*".join(re.escape(p) for p in str(value).split("%")) + "$"

        def fn(t: pa.Table) -> pa.Table:
            m = pc.match_substring_regex(t[col], regex)
            if op == "not_like":
                m = pc.invert(m)
            return t.filter(pc.fill_null(m, False))

        return fn
    raise ValueError(f"unsupported filter op: {op!r}")


def mask(col: str, pattern: str, replacement: str) -> Callable:
    """dx_mask: REGEX replace (RE2 semantics via Arrow's
    replace_substring_regex — the same engine DuckDB's regexp_replace
    uses, so oracles reproduce outputs exactly). The PII-redaction
    primitive of a training-data pipeline: emails, phone numbers, digit
    runs → a placeholder token. Distinct from dx_replace, which is
    LITERAL-substring per the DataX contract."""

    def fn(t: pa.Table) -> pa.Table:
        out = pc.replace_substring_regex(
            t[col], pattern=pattern, replacement=replacement
        )
        return t.set_column(t.schema.get_field_index(col), col, out)

    return fn


def udf(fn: Callable[[pa.Table], pa.Table]) -> Callable:
    """dx_groovy's escape hatch: any Arrow-table → Arrow-table callable."""
    return fn


def lookup(
    col: str,
    mapping: dict | None = None,
    side_path: str | None = None,
    key_field: str = "key",
    value_field: str = "value",
    out_col: str | None = None,
    default: str | None = None,
) -> Callable:
    """dx_lookup: dictionary / small-dimension enrichment — map a column
    through a key→value table given inline (`mapping`) or as a side
    parquet file (`side_path` + key/value field names). The classic ETL
    code-table join, done the broadcast way: the mapping is `ray.put`
    ONCE at compile time and each task `ray.get`s it from shared memory
    (zero re-ship per batch); the probe is one vectorized searchsorted
    per batch. Misses take `default` (or null). For dimensions too big to
    broadcast, use the lake join path (`cdc_enrich_dimension`), not a
    transformer."""
    import numpy as np

    import ray

    if mapping is None:
        if side_path is None:
            raise ValueError("dx_lookup needs `mapping` or `side_path`")
        import pyarrow.parquet as pq

        side = pq.read_table(side_path, columns=[key_field, value_field])
        keys = np.asarray(side[key_field].to_pylist(), dtype=object)
        vals = np.asarray(side[value_field].to_pylist(), dtype=object)
    else:
        keys = np.asarray(list(mapping.keys()), dtype=object)
        vals = np.asarray(list(mapping.values()), dtype=object)
    order = np.argsort(keys)
    ref = ray.put((keys[order], vals[order]))
    target = out_col or col

    def fn(t: pa.Table) -> pa.Table:
        k_sorted, v_sorted = ray.get(ref)
        probe = np.asarray(
            pc.cast(t[col], pa.string()).to_pylist(), dtype=object
        )
        # searchsorted needs non-null comparables; nulls miss by definition
        null_mask = np.array([p is None for p in probe], dtype=bool)
        safe = np.where(null_mask, "", probe)
        pos = np.clip(np.searchsorted(k_sorted, safe), 0, len(k_sorted) - 1)
        hit = (k_sorted[pos] == safe) & ~null_mask if len(k_sorted) else np.zeros(
            len(probe), dtype=bool
        )
        out_vals = np.where(
            hit, v_sorted[pos] if len(k_sorted) else None, default
        )
        arr = pa.array(out_vals.tolist(), pa.string())
        if target in t.column_names:
            return t.set_column(t.schema.get_field_index(target), target, arr)
        return t.append_column(target, arr)

    return fn


_BUILDERS = {
    "dx_substr": lambda p: substr(p["column"], int(p["startIndex"]), int(p["length"])),
    "dx_pad": lambda p: pad(
        p["column"], int(p["length"]), p.get("padString", " "), p.get("side", "left")
    ),
    "dx_replace": lambda p: replace(p["column"], p["pattern"], p["replacement"]),
    "dx_mask": lambda p: mask(p["column"], p["pattern"], p["replacement"]),
    "dx_filter": lambda p: filter_rows(p["column"], p["op"], p["value"]),
    "dx_lookup": lambda p: lookup(
        p["column"],
        mapping=p.get("map"),
        side_path=p.get("sidePath"),
        key_field=p.get("keyField", "key"),
        value_field=p.get("valueField", "value"),
        out_col=p.get("outColumn"),
        default=p.get("default"),
    ),
}


def compile_transformers(specs: list[dict]) -> Callable[[pa.Table], pa.Table]:
    """Compile a DataX-style transformer spec list into ONE fused batch fn,
    e.g. [{"name": "dx_substr", "column": "text", "startIndex": 0,
    "length": 10}, ...]. Unknown names may supply {"name": "udf", "fn": f}."""
    fns = []
    for s in specs:
        name = s["name"]
        if name == "udf":
            fns.append(s["fn"])
        else:
            fns.append(_BUILDERS[name]({k: v for k, v in s.items() if k != "name"}))

    def fused(t: pa.Table) -> pa.Table:
        for f in fns:
            t = f(t)
        return t

    return fused


def apply_transformers(ds, specs: list[dict], **map_kwargs):
    """Attach a transformer chain to a Dataset as a single map_batches stage."""
    fused = compile_transformers(specs)
    return ds.map_batches(
        fused, batch_format="pyarrow", zero_copy_batch=True, **map_kwargs
    )
