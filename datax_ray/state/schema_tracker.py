"""Schema-evolution state (SURVEY.md §2B-B6).

Folds `op=ddl` events (add_column / widen) into an evolving Arrow lake
schema, and unifies any batch to the current target schema: missing columns
null-filled, widenable types cast. This carries DataX's per-plugin
type-conversion-matrix spirit (SURVEY.md §2A row 20) into explicit Arrow
casts; cast failures are dirty records, handled by the normalize stage.

DDL is applied at epoch boundaries — sound because the fixture/CDC contract
guarantees DDL events sort before the data events of their epoch and that a
DDL-added column's payload is null for events preceding the DDL (see
generator docstring and SURVEY.md §7 hard-part 4).
"""

from __future__ import annotations

import json

import pyarrow as pa
import pyarrow.compute as pc

from datax_ray.schemas import (
    LSN_COL,
    RENAMES_META_KEY,
    renames_of,
    resolve_source_name,
)

_NAMED_TYPES = {
    "string": pa.string(),
    "large_string": pa.large_string(),
    "int32": pa.int32(),
    "int64": pa.int64(),
    "float32": pa.float32(),
    "float64": pa.float64(),
    "double": pa.float64(),
    "bool": pa.bool_(),
    "binary": pa.binary(),
    "timestamp[us]": pa.timestamp("us"),
}

# Allowed widenings (value-preserving, order-independent).
_WIDEN_OK = {
    (pa.int32(), pa.int64()),
    (pa.int16(), pa.int32()),
    (pa.int16(), pa.int64()),
    (pa.float32(), pa.float64()),
    (pa.string(), pa.large_string()),
    (pa.timestamp("s"), pa.timestamp("us")),
    (pa.timestamp("ms"), pa.timestamp("us")),
}


# Columns the engine's keying/ordering depends on: dropping any of these
# would break LWW ordering (ts), the merge key (conv_id, turn_idx) or
# lineage (_lsn) — rejected at DDL-application time.
_PROTECTED = ("conv_id", "turn_idx", "ts", LSN_COL)

# DDL-compatibility policies (schema-registry style) an operator can pin
# on the lake (`alter --schema-policy`, persisted in manifest properties):
# which DDL verbs later replays may fold. "additive" admits only new
# columns (old readers keep working untouched); "compatible" also admits
# value-preserving widenings (readers re-resolving the committed schema
# stay correct); rename/drop — the verbs that break downstream consumers
# bound to a column name — always need the policy cleared first.
SCHEMA_POLICIES = {
    "additive": frozenset({"add_column"}),
    "compatible": frozenset({"add_column", "widen"}),
}


class SchemaPolicyViolation(ValueError):
    """A change-stream DDL event asked for a verb the lake's pinned
    schema policy forbids. Raised BEFORE any of the epoch's data is
    written, so the replay aborts loudly with the lake untouched."""


class SchemaTracker:
    def __init__(self, schema: pa.Schema, policy: str | None = None):
        if policy is not None and policy not in SCHEMA_POLICIES:
            raise ValueError(
                f"unknown schema policy {policy!r} "
                f"(expected one of {sorted(SCHEMA_POLICIES)})"
            )
        self.schema = schema
        self.policy = policy

    def apply_ddl(self, ddl_json: str) -> None:
        d = json.loads(ddl_json)
        action = d.get("action")
        name = d.get("name")
        # verb validation FIRST: a malformed/unknown action must not be
        # misreported as a policy violation (which would steer an operator
        # into clearing a governance guard for a garbage event)
        if action not in ("add_column", "widen", "drop_column", "rename_column"):
            raise ValueError(f"unknown ddl action: {action!r}")
        if self.policy is not None and action not in SCHEMA_POLICIES[self.policy]:
            raise SchemaPolicyViolation(
                f"lake schema policy {self.policy!r} forbids ddl action "
                f"{action!r} (event: {ddl_json}); clear or relax the policy "
                f"via `alter --schema-policy` to apply it"
            )
        if action == "drop_column":
            if name in _PROTECTED:
                raise ValueError(f"cannot drop protected column {name!r}")
            i = self.schema.get_field_index(name)
            if i != -1:  # idempotent: re-drop of an absent column is a no-op
                meta = self.schema.metadata
                self.schema = self.schema.remove(i)
                if meta:  # Schema.remove drops metadata; keep the renames
                    self.schema = self.schema.with_metadata(meta)
            return
        if action == "rename_column":
            new = d.get("to")
            if name in _PROTECTED or new in _PROTECTED:
                raise ValueError(f"cannot rename protected column ({name!r} -> {new!r})")
            i = self.schema.get_field_index(name)
            if i == -1:
                if self.schema.get_field_index(new) != -1:
                    return  # idempotent: rename already applied
                raise ValueError(f"rename of unknown column {name!r}")
            if self.schema.get_field_index(new) != -1:
                raise ValueError(f"rename target {new!r} already exists")
            # fold into the {historical: current} map so pre-rename
            # fragments and original-name change events keep resolving
            renames = {
                h: (new if cur == name else cur)
                for h, cur in renames_of(self.schema).items()
            }
            renames[name] = new
            renames = {h: c for h, c in renames.items() if h != c}
            schema = self.schema.set(
                i, pa.field(new, self.schema.field(i).type)
            )
            self.schema = schema.with_metadata(
                {**(schema.metadata or {}), RENAMES_META_KEY: json.dumps(renames)}
            )
            return
        typ = _NAMED_TYPES.get(d.get("type"))
        if typ is None:
            raise ValueError(f"unsupported ddl type: {d.get('type')!r}")
        if action == "add_column":
            if self.schema.get_field_index(name) == -1:
                # keep _lsn last: insert before it if present
                i = self.schema.get_field_index(LSN_COL)
                pos = i if i != -1 else len(self.schema)
                meta = self.schema.metadata
                self.schema = self.schema.insert(pos, pa.field(name, typ))
                if meta:
                    self.schema = self.schema.with_metadata(meta)
        elif action == "widen":
            i = self.schema.get_field_index(name)
            if i == -1:
                raise ValueError(f"widen of unknown column {name!r}")
            cur = self.schema.field(i).type
            if cur == typ:
                return
            if (cur, typ) not in _WIDEN_OK:
                raise ValueError(f"illegal widen {cur} -> {typ} for {name!r}")
            self.schema = self.schema.set(i, pa.field(name, typ))
        else:
            raise ValueError(f"unknown ddl action: {action!r}")

    def unify(self, t: pa.Table, columns: list[str] | None = None) -> pa.Table:
        """Project/cast `t` to the target schema (or a subset of its columns):
        missing columns null-filled, widenable mismatches cast."""
        names = columns if columns is not None else [f.name for f in self.schema]
        renames = renames_of(self.schema)
        out = []
        n = t.num_rows
        for name in names:
            want = self.schema.field(name).type
            src = resolve_source_name(t.schema, name, renames)
            if src is None:
                out.append(pa.nulls(n, want))
                continue
            col = t[src]
            if col.type != want:
                col = pc.cast(col, want)
            out.append(col)
        return pa.table(dict(zip(names, out)))
