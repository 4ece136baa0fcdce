"""Change-log source + epoch planner (SURVEY.md §2B-B1, B8).

The change log is a directory of ordered Parquet segment files
(`seg-00000.parquet`, ...), each a contiguous slice of the binlog/WAL. The
planner lists segments, subtracts those already recorded in committed
manifests, and chunks the remainder into epochs — resume is therefore the
same code path as a fresh run (SURVEY.md §3.2 E2).

`scan_ddl` is a column-pruned pyarrow scan (only lsn/ts/op/ddl leave the
files) — DDL events are rare, so folding them driver-side costs almost
nothing even on wide segments.
"""

from __future__ import annotations

import glob
import json
import os

import pyarrow.compute as pc

from datax_ray.state.manifest import Manifest


SEGMENT_FORMATS = ("parquet", "jsonl", "csv")


def list_segments(changes_dir: str) -> list[str]:
    """Ordered change-log segments. Heterogeneous source formats (the DataX
    reader matrix, SURVEY.md §2A rows 1-4) are supported by extension:
    seg-NNNNN.parquet | .jsonl | .csv — one log may even mix them."""
    out: list[str] = []
    for ext in SEGMENT_FORMATS:
        out.extend(glob.glob(os.path.join(changes_dir, f"seg-*.{ext}")))
    return sorted(out)


def read_segments(segments: list[str], fuse_decode: bool = True):
    """A Dataset over segments of any supported format, normalized to the
    CHANGES arrow schema (casts happen in the normalize stage).

    fuse_decode=True (default) decodes INSIDE the map chain: the Dataset
    is `from_items(paths) → map_batches(decode)`, which Ray's operator
    fusion merges with the downstream normalize→DeltaWriter maps into ONE
    task per file — decoded rows never enter the object store between
    stages. Measured on the 4-raylet node-mode bench: Ray 2.49 never
    fuses a Read operator with downstream maps, so the `read_parquet`
    plan shipped the ENTIRE decoded change log (8.5 GiB at sf0.1) across
    raylets between ReadParquet and the map stage; with fused decode the
    only inter-node objects are file-path strings and tiny lineage rows —
    the read moves bytes from (shared) storage instead of plasma, the
    same storage-shuffle principle the lake merge uses (stages/delta.py).
    fuse_decode=False keeps the `ray.data.read_parquet` plan (row-group
    level splitting) for single-node/debug use."""
    import ray.data

    import pyarrow as pa
    import pyarrow.compute as _pc

    from datax_ray.schemas import CHANGES_SCHEMA

    canon_types = {f.name: f.type for f in CHANGES_SCHEMA}  # csv ConvertOptions

    def canon(t: pa.Table) -> pa.Table:
        """Cast a source batch to the canonical changes column types (the
        DataX type-conversion-matrix analog, SURVEY.md §2A row 20) so
        blocks from different formats coalesce cleanly. Columns a segment
        omits entirely (e.g. pyarrow.json never infers an all-null `ddl`
        field) are null-filled, and output columns come in a fixed order
        (CHANGES first, extras after) so heterogeneous segments align."""
        cols = {}
        for f in CHANGES_SCHEMA:
            if t.schema.get_field_index(f.name) == -1:
                cols[f.name] = pa.nulls(t.num_rows, f.type)
            else:
                c = t[f.name]
                cols[f.name] = _pc.cast(c, f.type) if c.type != f.type else c
        for name in t.column_names:  # extra payload cols (e.g. DDL-added)
            if name not in cols:
                cols[name] = t[name]
        return pa.table(cols)

    if fuse_decode:
        def decode(t: pa.Table) -> pa.Table:
            from pyarrow import json as pa_json
            import pyarrow.csv as pacsv
            import pyarrow.parquet as pq

            paths = [
                p for group in t["path"].to_pylist()
                for p in group.split("\n")
            ]
            out = []
            for path in paths:
                ext = path.rsplit(".", 1)[-1]
                if ext == "parquet":
                    out.append(canon(pq.read_table(path)))
                elif ext == "jsonl":
                    out.append(canon(pa_json.read_json(path)))
                elif ext == "csv":
                    convert = pacsv.ConvertOptions(
                        column_types=canon_types,
                        null_values=["\\N"],
                        strings_can_be_null=True,
                    )
                    out.append(canon(pacsv.read_csv(
                        path, convert_options=convert
                    )))
                else:  # pragma: no cover - planner only lists known exts
                    raise ValueError(f"unsupported segment format: {path}")
            return pa.concat_tables(out, promote_options="permissive")

        # Group tiny files per decode task, but never below cluster
        # parallelism: a feed of many small segments (replicate's
        # per-fragment files) must not pay per-task overhead per file,
        # AND an epoch must still fan out to every core (a fixed 32 MB
        # target measured 10 tasks for a 64-segment epoch — 22 of 32
        # cores idle, scaling efficiency 0.27). Target = whichever is
        # smaller of 32 MB and total/(2*cluster cpus), floored at 1 MB;
        # a group never splits a file.
        sizes = {}
        total = 0
        for s in segments:
            try:
                sizes[s] = os.path.getsize(s)
            except OSError:
                sizes[s] = 32 << 20
            total += sizes[s]
        try:
            import ray as _ray

            cpus = int(_ray.cluster_resources().get("CPU", 8)) if (
                _ray.is_initialized()
            ) else 8
        except Exception:  # pragma: no cover
            cpus = 8
        target = max(1 << 20, min(32 << 20, total // max(1, cpus * 2)))
        groups: list[list[str]] = []
        cur: list[str] = []
        cur_bytes = 0
        for s in sorted(segments):
            sz = sizes[s]
            if cur and cur_bytes + sz > target:
                groups.append(cur)
                cur, cur_bytes = [], 0
            cur.append(s)
            cur_bytes += sz
        if cur:
            groups.append(cur)
        return ray.data.from_items(
            [{"path": "\n".join(g)} for g in groups],
            override_num_blocks=len(groups),
        ).map_batches(decode, batch_format="pyarrow", batch_size=None)

    by_ext: dict[str, list[str]] = {}
    for s in segments:
        by_ext.setdefault(s.rsplit(".", 1)[-1], []).append(s)
    parts = []
    if by_ext.get("parquet"):
        parts.append(ray.data.read_parquet(by_ext["parquet"]))
    if by_ext.get("jsonl"):
        parts.append(
            ray.data.read_json(by_ext["jsonl"]).map_batches(
                canon, batch_format="pyarrow", zero_copy_batch=True
            )
        )
    if by_ext.get("csv"):
        import pyarrow.csv as pacsv

        # CSV null convention: \\N (DataX's nullFormat default for
        # text sources); bare empty fields remain empty STRINGS.
        convert = pacsv.ConvertOptions(
            column_types=canon_types,
            null_values=["\\N"],
            strings_can_be_null=True,
        )
        parts.append(
            ray.data.read_csv(by_ext["csv"], convert_options=convert).map_batches(
                canon, batch_format="pyarrow", zero_copy_batch=True
            )
        )
    ds = parts[0]
    for p in parts[1:]:
        ds = ds.union(p)
    return ds


def plan_epochs(
    changes_dir: str, manifest: Manifest, segments_per_epoch: int | None = None
) -> list[list[str]]:
    """Uncommitted segments, chunked into epochs (default: all-in-one)."""
    committed = manifest.committed_segments()
    pending = [s for s in list_segments(changes_dir) if os.path.basename(s) not in committed]
    if not pending:
        return []
    if not segments_per_epoch or segments_per_epoch <= 0:
        return [pending]
    return [
        pending[i : i + segments_per_epoch]
        for i in range(0, len(pending), segments_per_epoch)
    ]


def plan_epochs_multi(
    sources: dict[str, str],
    manifest: Manifest,
    segments_per_epoch: int | None = None,
) -> list[dict[str, list[str]]]:
    """Multi-source epoch plan: uncommitted segments of EVERY source,
    chunked so one epoch takes up to `segments_per_epoch` segments from
    EACH source (sources advance together; a source with nothing new
    simply contributes nothing that epoch). Committed segments are
    recorded source-qualified ('name::basename') so two producers may
    both ship a seg-00000.parquet without colliding."""
    committed = manifest.committed_segments()
    pending: dict[str, list[str]] = {}
    for name, d in sources.items():
        segs = [
            s
            for s in list_segments(d)
            if f"{name}::{os.path.basename(s)}" not in committed
        ]
        if segs:
            pending[name] = segs
    if not pending:
        return []
    if not segments_per_epoch or segments_per_epoch <= 0:
        return [pending]
    n_epochs = max(
        -(-len(v) // segments_per_epoch) for v in pending.values()
    )
    out: list[dict[str, list[str]]] = []
    for i in range(n_epochs):
        ep = {
            name: segs[i * segments_per_epoch : (i + 1) * segments_per_epoch]
            for name, segs in pending.items()
        }
        ep = {k: v for k, v in ep.items() if v}
        if ep:
            out.append(ep)
    return out


def scan_ddl(segment_paths: list[str]) -> list[tuple[int, str]]:
    """[(lsn, ddl_json)] for op='ddl' rows, in (ts, lsn) order.

    Row-group pruning via parquet min/max statistics on `op`: a row group
    can contain 'ddl' rows only if min(op) <= 'ddl' (every other op string
    sorts after 'ddl'), so with rare DDL almost no data pages are read and
    this stays O(files) driver-side at any event scale."""
    return [(lsn, ddl) for _, lsn, ddl in scan_ddl_ts(segment_paths)]


def scan_ddl_ts(segment_paths: list[str]) -> list[tuple[int, int, str]]:
    """[(ts_us, lsn, ddl_json)] for op='ddl' rows, in (ts, lsn) order —
    the ts-carrying variant multi-source replay needs to merge DDL events
    from several logs into one deterministic fold order. Same row-group
    pruning as scan_ddl (which is a thin wrapper over this)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    tables = []
    for path in segment_paths:
        if not path.endswith(".parquet"):
            t = _read_any(path, columns=["lsn", "ts", "op", "ddl"])
            tables.append(t.filter(pc.equal(t["op"], "ddl")))
            continue
        f = pq.ParquetFile(path)
        md = f.metadata
        idx = md.schema.to_arrow_schema().get_field_index("op")
        cand = []
        for rg in range(md.num_row_groups):
            stats = md.row_group(rg).column(idx).statistics
            if stats is None or not stats.has_min_max or stats.min <= "ddl":
                cand.append(rg)
        if cand:
            t = f.read_row_groups(cand, columns=["lsn", "ts", "op", "ddl"])
            tables.append(t.filter(pc.equal(t["op"], "ddl")))
    if not tables:
        return []
    scan_schema = pa.schema(
        [
            ("lsn", pa.int64()),
            ("ts", pa.timestamp("us")),
            ("op", pa.string()),
            ("ddl", pa.string()),
        ]
    )
    tables = [
        pa.table(
            {f.name: pc.cast(t[f.name], f.type) for f in scan_schema},
            schema=scan_schema,
        )
        for t in tables
    ]
    t = pa.concat_tables(tables)
    if t.num_rows == 0:
        return []
    t = t.take(pc.sort_indices(t, sort_keys=[("ts", "ascending"), ("lsn", "ascending")]))
    ts_us = pc.cast(t["ts"], pa.int64()).to_pylist()
    return list(zip(ts_us, t["lsn"].to_pylist(), t["ddl"].to_pylist()))


def scan_schema_drift(
    segment_paths: list[str], lake_schema: "pa.Schema"
) -> list[str]:
    """AUTOMATIC schema evolution (the Debezium/Fivetran "new column just
    appears in the source" story): detect payload columns the change
    segments carry that the lake schema does not, and value-preserving
    widenings, from parquet FOOTERS ONLY — O(segments) driver-side, zero
    data pages read at any event scale. Returns synthetic DDL json
    strings (same grammar as op='ddl' events) to fold into the
    SchemaTracker; folded AFTER explicit DDL so stream-declared evolution
    always wins and auto-DDL only covers what is still missing.

    Rules:
    - a segment column that is neither a change-control column (op/lsn/
      ddl), nor a lake column, nor a historical name in the lake's rename
      map → add_column (idempotent under the tracker);
    - a lake column whose segment type is a _WIDEN_OK widening → widen;
    - a lake column whose segment type mismatches in any OTHER way is NOT
      a DDL matter — the normalize stage casts or dirty-routes per row;
    - unmappable Arrow types (nested/list/struct) raise loudly: auto-DDL
      must never silently guess a lossy mapping;
    - non-parquet segments (jsonl/csv) have no typed footer and are
      skipped — declare DDL explicitly for those logs.

    Composes with the lake's pinned schema policy exactly like stream
    DDL: the tracker gates every synthetic verb, so 'additive' forbids
    auto-widen and aborts the replay before any write."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from datax_ray.schemas import CHANGES_SCHEMA, renames_of
    from datax_ray.state.schema_tracker import _NAMED_TYPES, _WIDEN_OK

    type_names = {t: n for n, t in _NAMED_TYPES.items() if n != "double"}
    control = {"op", "lsn", "ddl"}
    changes_types = {f.name: f.type for f in CHANGES_SCHEMA}
    lake_types = {f.name: f.type for f in lake_schema}
    historical = set(renames_of(lake_schema))
    out: list[str] = []
    seen: set[tuple] = set()
    for path in segment_paths:
        if not path.endswith(".parquet"):
            continue
        for f in pq.read_schema(path):
            if f.name in control or f.name in historical:
                continue
            cur = lake_types.get(f.name)
            if cur is None and f.name not in changes_types:
                if pa.types.is_null(f.type):
                    continue  # an all-null column carries no type claim
                name = type_names.get(f.type)
                if name is None:
                    raise ValueError(
                        f"auto-ddl: segment {os.path.basename(path)} column "
                        f"{f.name!r} has unmappable type {f.type} — declare "
                        "an explicit ddl event or drop the column upstream"
                    )
                key = ("add_column", f.name, name)
                if key not in seen:
                    seen.add(key)
                    out.append(json.dumps(
                        {"action": "add_column", "name": f.name, "type": name}
                    ))
            elif cur is not None and f.type != cur and (cur, f.type) in _WIDEN_OK:
                name = type_names.get(f.type)
                if name is not None:
                    key = ("widen", f.name, name)
                    if key not in seen:
                        seen.add(key)
                        out.append(json.dumps(
                            {"action": "widen", "name": f.name, "type": name}
                        ))
    return out


def _read_any(path: str, columns: list[str] | None = None):
    """Driver-side single-file read for non-parquet segments (jsonl/csv)."""
    import pyarrow as pa
    import pyarrow.csv as pacsv
    import pyarrow.json as pajson

    from datax_ray.schemas import CHANGES_SCHEMA

    if path.endswith(".jsonl"):
        t = pajson.read_json(path)
    elif path.endswith(".csv"):
        t = pacsv.read_csv(
            path,
            convert_options=pacsv.ConvertOptions(
                column_types={f.name: f.type for f in CHANGES_SCHEMA},
                null_values=["\\N"],
                strings_can_be_null=True,
            ),
        )
    else:
        raise ValueError(f"unsupported segment format: {path}")
    if columns:
        have = [c for c in columns if c in t.column_names]
        t = t.select(have)
        for c in columns:
            if c not in t.column_names:
                t = t.append_column(c, pa.nulls(t.num_rows, pa.string()))
        t = t.select(columns)
    return t


def max_lsn(segment_paths: list[str]) -> int:
    """Max LSN across segments from parquet row-group statistics (no data
    pages read — metadata only, so this stays O(files) at any scale);
    non-parquet segments fall back to a driver-side column scan."""
    import pyarrow.compute as _pc
    import pyarrow.parquet as pq

    hi = -1
    for p in segment_paths:
        if not p.endswith(".parquet"):
            v = _pc.max(_read_any(p, columns=["lsn"])["lsn"].cast("int64")).as_py()
            if v is not None:
                hi = max(hi, int(v))
            continue
        md = pq.ParquetFile(p).metadata
        idx = md.schema.to_arrow_schema().get_field_index("lsn")
        for rg in range(md.num_row_groups):
            stats = md.row_group(rg).column(idx).statistics
            if stats is not None and stats.has_min_max:
                hi = max(hi, stats.max)
    return hi
