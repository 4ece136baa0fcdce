"""Sequential replay oracle (FIXTURES.md §3).

A deliberately naive, single-process, row-at-a-time replayer: apply change
events one by one in (ts, lsn) order into a dict keyed (conv_id, turn_idx).
This is the ground truth the distributed engine must match row-for-row with
per-turn text equality under stable (conv_id, turn_idx) ordering
(BASELINE.json correctness gate). The reference ships no executable
(/root/reference/README.md:3), so this oracle IS the reference final state.

Kept intentionally different in structure from the engine (python dict loop
vs vectorized Arrow LWW) so they fail independently.
"""

from __future__ import annotations

import json

import pyarrow as pa
import pyarrow.compute as pc

from datax_ray.schemas import TRANSCRIPTS_SCHEMA
from datax_ray.validation import valid_event_mask

_WIDEN = {
    "int64": pa.int64(),
    "float64": pa.float64(),
    "string": pa.string(),
}


def sequential_replay(
    changes: pa.Table,
    base: pa.Table | None = None,
    expectations: list[dict] | None = None,
) -> pa.Table:
    """Replay a change table (optionally on top of a `base` transcripts
    snapshot — each base row is a pseudo-event op='insert', lsn=-1, ts=row
    ts, merged into the same (ts, lsn) walk, mirroring the engine's
    bootstrap path); returns the final lake state sorted by
    (conv_id, turn_idx), with the evolved schema. Dirty rows are skipped
    under the shared validation rules."""
    schema_fields: list[tuple[str, pa.DataType]] = [
        (f.name, f.type) for f in TRANSCRIPTS_SCHEMA
    ]
    base_payload = ["role", "text", "tool"]

    idx = pc.sort_indices(
        changes, sort_keys=[("ts", "ascending"), ("lsn", "ascending")]
    )
    changes = changes.take(idx)

    is_ddl = pc.equal(changes["op"], "ddl")
    ddl_rows = changes.filter(pc.fill_null(is_ddl, False))
    data_rows = changes.filter(pc.fill_null(pc.invert(is_ddl), True))
    valid = valid_event_mask(data_rows)
    if expectations:
        from datax_ray.validation import compile_expectations

        exp_mask, _ = compile_expectations(expectations)(data_rows)
        valid = pc.and_kleene(valid, exp_mask)
    data_rows = data_rows.filter(valid)

    # Interleave ddl + data in (ts, lsn) order via a merged python walk.
    ddl_list = ddl_rows.to_pylist()
    rows = data_rows.to_pylist()
    if base is not None:
        for r in base.to_pylist():
            rows.append(
                {
                    "op": "insert",
                    "lsn": -1,
                    "ts": r["ts"],
                    "conv_id": r["conv_id"],
                    "turn_idx": r["turn_idx"],
                    "role": r.get("role"),
                    "text": r.get("text"),
                    "tool": r.get("tool"),
                }
            )

    def key_of(r):
        return (r["ts"], r["lsn"])

    merged = sorted(ddl_list + rows, key=key_of)

    # source-column -> current lake-column name (identity until a
    # rename_column DDL is applied)
    col_map: dict[str, str] = {c: c for c in base_payload}
    state: dict[tuple, dict] = {}
    for r in merged:
        if r["op"] == "ddl":
            try:
                d = json.loads(r["ddl"])
            except (TypeError, ValueError):
                continue
            if d.get("action") == "add_column":
                name, typ = d["name"], d["type"]
                if all(n != name for n, _ in schema_fields):
                    schema_fields.append((name, _WIDEN.get(typ, pa.string())))
                    col_map[name] = name
            elif d.get("action") == "widen":
                name, typ = d["name"], d["type"]
                schema_fields = [
                    (n, _WIDEN[typ] if n == name else t) for n, t in schema_fields
                ]
            elif d.get("action") == "drop_column":
                name = d["name"]
                schema_fields = [(n, t) for n, t in schema_fields if n != name]
                col_map = {s: c for s, c in col_map.items() if c != name}
            elif d.get("action") == "rename_column":
                # the lake column changes name; incoming change events keep
                # the ORIGINAL stream name, so record the mapping and keep
                # reading events (and already-applied state rows) via it
                old, new = d["name"], d["to"]
                schema_fields = [
                    (new if n == old else n, t) for n, t in schema_fields
                ]
                col_map = {
                    src: (new if cur == old else cur)
                    for src, cur in col_map.items()
                }
                for row in state.values():  # migrate already-applied rows
                    if old in row:
                        row[new] = row.pop(old)
            continue
        k = (r["conv_id"], r["turn_idx"])
        if r["op"] == "delete":
            state.pop(k, None)
        else:  # insert/update == upsert
            row = {
                "conv_id": r["conv_id"],
                "turn_idx": r["turn_idx"],
                "ts": r["ts"],
            }
            for src, cur in col_map.items():
                row[cur] = r.get(src)
            state[k] = row

    schema = pa.schema(schema_fields)
    out_rows = [state[k] for k in sorted(state.keys())]
    if not out_rows:
        return schema.empty_table()
    cols = {
        f.name: pa.array([r.get(f.name) for r in out_rows], f.type)
        for f in schema
    }
    return pa.table(cols, schema=schema)


def sampled_verify(
    changes: pa.Table, lake_dir: str, n: int, base: pa.Table | None = None
) -> dict:
    """Spot-verify N deterministically-chosen conversations against the
    sequential oracle — the scale-practical audit: the oracle folds only
    the sample's change rows (O(sample) memory; DDL events are kept so
    schema evolution still applies), and the lake side point-reads just
    the sample's ranges via manifest hash-routing (`read_lake(conv_ids=)`)
    — never an O(lake) read. Sample = the n smallest sha1(conv_id) across
    every conv the stream/base mentions, so re-runs audit the same set.
    Returns {"match", "rows", "oracle_rows", "sampled_convs"}."""
    import hashlib

    from datax_ray.sinks.lake import final_table

    if n <= 0:
        raise ValueError(f"sample size must be positive, got {n}")
    convs = set(pc.drop_null(changes["conv_id"]).unique().to_pylist())
    if base is not None:
        convs |= set(pc.drop_null(base["conv_id"]).unique().to_pylist())
    sampled = sorted(convs, key=lambda c: hashlib.sha1(c.encode()).hexdigest())[:n]
    in_sample = pc.is_in(changes["conv_id"], pa.array(sampled, pa.string()))
    changes = changes.filter(
        pc.or_kleene(in_sample, pc.equal(changes["op"], "ddl"))
    )
    if base is not None:
        base = base.filter(pc.is_in(base["conv_id"], pa.array(sampled, pa.string())))
    oracle = sequential_replay(changes, base=base)
    ours = final_table(lake_dir, conv_ids=sampled)
    ok = ours.schema.equals(oracle.schema) and ours.equals(oracle)
    return {
        "match": bool(ok),
        "rows": ours.num_rows,
        "oracle_rows": oracle.num_rows,
        "sampled_convs": len(sampled),
    }
