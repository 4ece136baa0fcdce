"""CSV / JSONL file sources with DataX-style column specs, the 6-type
conversion matrix and dirty-record routing.

DataX's txtfilereader reads delimited text shards, converts every field
through its internal type system (Long / Double / String / Date / Bool /
Bytes — README.md:2's heterogeneous-source vocabulary), and rows that
fail conversion become dirty records counted against errorLimit. This is
that contract on Ray Data:

- ``ray.data.read_text`` streams line blocks (file shards parallelize
  like any other source; no whole-file driver reads);
- structural parsing (delimiter split, column count) and EVERY type
  coercion are vectorized per batch: pandas ``to_numeric`` /
  ``to_datetime`` with ``errors='coerce'`` give a per-row validity mask
  without a Python loop over rows;
- rows with any failed required conversion route to a dead-letter
  parquet sink with a CONTENT-HASH filename (same idempotent side channel
  as stages/normalize.py — a retried task rewrites the identical file)
  and a per-column reason;
- clean rows emit as a typed Arrow table matching the spec.

Type matrix (spec string -> Arrow type), mirroring DataX's six internal
column types:

    long    -> int64        double -> float64      string -> string
    date    -> timestamp[us] bool  -> bool          bytes  -> binary
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import ray.data

TYPE_MATRIX: dict[str, pa.DataType] = {
    "long": pa.int64(),
    "double": pa.float64(),
    "string": pa.string(),
    "date": pa.timestamp("us"),
    "bool": pa.bool_(),
    "bytes": pa.binary(),
}

_BOOL_MAP = {"true": True, "false": False, "1": True, "0": False}


def _coerce(col: pd.Series, typ: str):
    """Vectorized coercion of a string column to `typ`. Returns
    (values: pd.Series, bad: np.ndarray bool mask). Empty string = NULL
    (valid), matching DataX's null handling for delimited text."""
    raw = col.fillna("")
    isnull = raw.str.len() == 0
    if typ == "string":
        vals = raw.where(~isnull, None)
        return vals, np.zeros(len(col), dtype=bool)
    if typ == "bytes":
        vals = raw.map(lambda s: s.encode("utf-8") if s else None)
        return vals, np.zeros(len(col), dtype=bool)
    if typ == "long":
        num = pd.to_numeric(raw.where(~isnull, None), errors="coerce")
        bad = num.isna() & ~isnull
        # reject non-integral values for LONG (DataX raises on '1.5')
        frac = num.dropna() % 1 != 0
        if frac.any():
            bad.loc[frac[frac].index] = True
        return num, bad.to_numpy()
    if typ == "double":
        num = pd.to_numeric(raw.where(~isnull, None), errors="coerce")
        return num, (num.isna() & ~isnull).to_numpy()
    if typ == "date":
        ts = pd.to_datetime(raw.where(~isnull, None), errors="coerce", utc=False)
        return ts, (ts.isna() & ~isnull).to_numpy()
    if typ == "bool":
        low = raw.str.lower().map(_BOOL_MAP)
        return low, (low.isna() & ~isnull).to_numpy()
    raise ValueError(f"unknown column type {typ!r} (allowed: {list(TYPE_MATRIX)})")


def _route_dirty(dirty: pd.DataFrame, deadletter_dir: str) -> None:
    """Content-hash-named parquet in the dead-letter dir — idempotent
    under task retry (a retried task rewrites the identical file)."""
    os.makedirs(deadletter_dir, exist_ok=True)
    t = pa.Table.from_pandas(dirty, preserve_index=False)
    buf = t.to_pandas().to_csv(index=False).encode()
    name = hashlib.sha256(buf).hexdigest()[:24]
    path = os.path.join(deadletter_dir, f"dirty-{name}.parquet")
    tmp = f"{path}.tmp.{os.getpid()}"
    pq.write_table(t, tmp)
    os.replace(tmp, path)


class _LineParser:
    """Callable-class batch UDF (actor-pool friendly: spec compiled once
    per actor in __init__, per-batch work vectorized)."""

    def __init__(
        self,
        columns: list[dict],
        delimiter: str = ",",
        deadletter_dir: str | None = None,
        fmt: str = "csv",
        skip_header: str | None = None,
    ):
        self.__name__ = "TextSourceParser"
        self.columns = columns
        self.delimiter = delimiter
        self.deadletter_dir = deadletter_dir
        self.fmt = fmt
        self.skip_header = skip_header
        self.schema = pa.schema(
            [(c["name"], TYPE_MATRIX[c["type"]]) for c in columns]
        )

    def _frame_csv(self, lines: pd.Series) -> tuple[pd.DataFrame, np.ndarray]:
        parts = lines.str.split(self.delimiter, expand=True)
        ncols = len(self.columns)
        structural_bad = np.zeros(len(lines), dtype=bool)
        if parts.shape[1] < ncols:
            for j in range(parts.shape[1], ncols):
                parts[j] = None
        elif parts.shape[1] > ncols:
            structural_bad |= parts[ncols].notna().to_numpy()
            parts = parts.iloc[:, :ncols]
        parts.columns = [c["name"] for c in self.columns]
        # a short row leaves trailing columns as NaN — that is a MISSING
        # field, not a null value: flag rows whose raw split was short
        import re

        nfields = lines.str.count(re.escape(self.delimiter)) + 1
        structural_bad |= (nfields != ncols).to_numpy()
        return parts, structural_bad

    def _frame_jsonl(self, lines: pd.Series) -> tuple[pd.DataFrame, np.ndarray]:
        import json

        ncols = len(self.columns)
        names = [c["name"] for c in self.columns]
        rows = np.empty((len(lines), ncols), dtype=object)
        structural_bad = np.zeros(len(lines), dtype=bool)
        # JSON has no vectorized splitter; parse per line but only into
        # STRING cells (coercion below stays vectorized). This is the
        # structural step a C-parser (pyarrow.json) would do — swapped
        # out here because pa.json aborts the whole block on one bad
        # line, which breaks dirty-record semantics.
        for i, s in enumerate(lines.to_numpy()):
            try:
                obj = json.loads(s)
                if not isinstance(obj, dict):
                    raise ValueError
                for j, nm in enumerate(names):
                    v = obj.get(nm)
                    rows[i, j] = (
                        None
                        if v is None
                        else (v if isinstance(v, str) else json.dumps(v))
                    )
            except ValueError:
                structural_bad[i] = True
        return pd.DataFrame(rows, columns=names), structural_bad

    def __call__(self, batch: pd.DataFrame) -> pa.Table:
        lines = batch["text"].astype(str)
        if self.skip_header is not None:
            keep = lines != self.skip_header
            lines = lines[keep]
        if len(lines) == 0:
            return self.schema.empty_table()
        frame, bad = (
            self._frame_csv(lines)
            if self.fmt == "csv"
            else self._frame_jsonl(lines)
        )
        out: dict[str, pd.Series] = {}
        reasons = np.where(bad, "structural", "")
        for c in self.columns:
            vals, cbad = _coerce(frame[c["name"]].astype(object).astype(str)
                                 .where(frame[c["name"]].notna(), ""), c["type"])
            fresh = cbad & ~bad
            reasons = np.where(fresh, f"cast:{c['name']}:{c['type']}", reasons)
            bad = bad | cbad
            out[c["name"]] = vals
        if bad.any() and self.deadletter_dir:
            dirty = pd.DataFrame(
                {"line": lines.to_numpy()[bad], "reason": reasons[bad]}
            )
            _route_dirty(dirty, self.deadletter_dir)
        good = pd.DataFrame({k: v[~bad] for k, v in out.items()})
        arrays = []
        for c in self.columns:
            typ = TYPE_MATRIX[c["type"]]
            s = good[c["name"]]
            if c["type"] == "long":
                # via pandas nullable Int64: NaN -> null, no float64
                # round-trip for values that fit (parse itself is float64
                # bound — > 2^53 longs need the bytes type, as in DataX
                # where oversized longs go through String)
                arr = pa.Array.from_pandas(s.astype("Int64"), type=pa.int64())
            elif c["type"] == "date":
                arr = pa.Array.from_pandas(s).cast(pa.timestamp("us"))
            else:
                arr = pa.Array.from_pandas(s, type=typ)
            arrays.append(arr)
        return pa.Table.from_arrays(arrays, schema=self.schema)


def csv_source(
    paths: str | list[str],
    columns: list[dict],
    delimiter: str = ",",
    deadletter_dir: str | None = None,
    skip_header: str | None = None,
    concurrency=None,
) -> "ray.data.Dataset":
    """Delimited-text reader with DataX column spec + dirty routing.
    `columns`: [{"name": ..., "type": "long|double|string|date|bool|bytes"}].
    `skip_header`: the literal header line to drop (file-order-independent,
    so it works on line-level blocks)."""
    ds = ray.data.read_text(paths)
    parser = _LineParser(
        columns, delimiter, deadletter_dir, fmt="csv", skip_header=skip_header
    )
    kw = {"concurrency": concurrency} if concurrency else {}
    return ds.map_batches(parser, batch_format="pandas", **kw)


def jsonl_source(
    paths: str | list[str],
    columns: list[dict],
    deadletter_dir: str | None = None,
    concurrency=None,
) -> "ray.data.Dataset":
    """JSON-lines reader with the same spec/type-matrix/dirty contract."""
    ds = ray.data.read_text(paths)
    parser = _LineParser(columns, deadletter_dir=deadletter_dir, fmt="jsonl")
    kw = {"concurrency": concurrency} if concurrency else {}
    return ds.map_batches(parser, batch_format="pandas", **kw)
