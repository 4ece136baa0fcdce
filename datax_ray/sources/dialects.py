"""SQL dialect layer for the JDBC-shaped source/sink — the driver-specific
half of DataX's rdbms matrix (round-3 review "What's missing" #2: the
generic DB-API reader/writer is sqlite-proven, but real mysql / postgres /
sqlserver / oracle endpoints need their own identifier quoting, probe
(LIMIT-1) syntax, parameter markers and upsert verbs).

The sandbox has no network databases, so the NETWORK half of that gap is
irreducible here — but the SQL-TEXT half is not: every statement the
engine generates routes through a Dialect, each dialect's text is pinned
by unit tests, and the two dialects sqlite can actually execute
(`ansi`/`sqlite` and — because sqlite ≥3.24 implements the postgres
`ON CONFLICT ... DO UPDATE` grammar — `postgres` upserts) are proven
FUNCTIONALLY end-to-end through the same range-split reader and batch
writer a real deployment uses. Plugging in a real driver is then:
connection factory + dialect name, nothing else.

splitPk range pagination (`pk >= lo AND pk < hi`) is deliberately
dialect-free — it is plain comparisons, the whole point of DataX's
splitPk design (no OFFSET pagination, which every dialect does
differently AND degrades quadratically).
"""

from __future__ import annotations

_DIALECTS: dict[str, "Dialect"] = {}


class Dialect:
    """ANSI / sqlite base: double-quote identifiers, qmark params,
    LIMIT-1 probes, INSERT OR REPLACE as the replace verb."""

    name = "ansi"
    paramstyle = "qmark"  # DB-API paramstyle the driver expects

    def __init_subclass__(cls, **kw):
        super().__init_subclass__(**kw)
        _DIALECTS[cls.name] = cls()

    def quote(self, ident: str) -> str:
        from datax_ray.sources.sqlsource import check_identifier

        return f'"{check_identifier(ident)}"'

    def param(self, i: int) -> str:
        """The i-th (0-based) parameter marker of a VALUES list."""
        return "?"

    def probe_one(self, cols_sql: str, table_sql: str) -> str:
        """One-row probe for schema inference."""
        return f"SELECT {cols_sql} FROM {table_sql} LIMIT 1"

    def insert(self, table_sql: str, cols: list[str]) -> str:
        cols_sql = ", ".join(self.quote(c) for c in cols)
        ph = ", ".join(self.param(i) for i in range(len(cols)))
        return f"INSERT INTO {table_sql} ({cols_sql}) VALUES ({ph})"

    def replace(self, table_sql: str, cols: list[str]) -> str:
        """DataX writeMode=replace: full-row overwrite on key conflict."""
        return self.insert(table_sql, cols).replace(
            "INSERT INTO", "INSERT OR REPLACE INTO", 1
        )

    def upsert(self, table_sql: str, cols: list[str],
               key_cols: list[str]) -> str:
        """DataX writeMode=update: keep the row, update non-key columns."""
        base = self.insert(table_sql, cols)
        keys_sql = ", ".join(self.quote(k) for k in key_cols)
        sets = ", ".join(
            f"{self.quote(c)} = excluded.{self.quote(c)}"
            for c in cols if c not in key_cols
        )
        return f"{base} ON CONFLICT({keys_sql}) DO UPDATE SET {sets}"


class Sqlite(Dialect):
    name = "sqlite"


class Postgres(Dialect):
    name = "postgres"
    paramstyle = "pyformat"

    def param(self, i: int) -> str:
        return "%s"

    # probe/quote inherit ANSI (postgres is the ANSI reference)
    def replace(self, table_sql: str, cols: list[str]) -> str:
        raise ValueError(
            "postgres has no REPLACE INTO — use mode='upsert' with "
            "key_cols (ON CONFLICT DO UPDATE)"
        )


class MySQL(Dialect):
    name = "mysql"
    paramstyle = "pyformat"

    def quote(self, ident: str) -> str:
        from datax_ray.sources.sqlsource import check_identifier

        return f"`{check_identifier(ident)}`"

    def param(self, i: int) -> str:
        return "%s"

    def replace(self, table_sql: str, cols: list[str]) -> str:
        return self.insert(table_sql, cols).replace(
            "INSERT INTO", "REPLACE INTO", 1
        )

    def upsert(self, table_sql: str, cols: list[str],
               key_cols: list[str]) -> str:
        base = self.insert(table_sql, cols)
        sets = ", ".join(
            f"{self.quote(c)} = VALUES({self.quote(c)})"
            for c in cols if c not in key_cols
        )
        return f"{base} ON DUPLICATE KEY UPDATE {sets}"


class SqlServer(Dialect):
    name = "sqlserver"

    def quote(self, ident: str) -> str:
        from datax_ray.sources.sqlsource import check_identifier

        return f"[{check_identifier(ident)}]"

    def probe_one(self, cols_sql: str, table_sql: str) -> str:
        return f"SELECT TOP 1 {cols_sql} FROM {table_sql}"

    def replace(self, table_sql: str, cols: list[str]) -> str:
        raise ValueError(
            "sqlserver has no REPLACE INTO — use mode='upsert' (MERGE)"
        )

    def upsert(self, table_sql: str, cols: list[str],
               key_cols: list[str]) -> str:
        cols_q = [self.quote(c) for c in cols]
        src = ", ".join(f"{self.param(i)} AS {q}"
                        for i, q in enumerate(cols_q))
        on = " AND ".join(
            f"t.{self.quote(k)} = s.{self.quote(k)}" for k in key_cols
        )
        sets = ", ".join(
            f"t.{self.quote(c)} = s.{self.quote(c)}"
            for c in cols if c not in key_cols
        )
        return (
            f"MERGE {table_sql} AS t USING (SELECT {src}) AS s ON {on} "
            f"WHEN MATCHED THEN UPDATE SET {sets} "
            f"WHEN NOT MATCHED THEN INSERT ({', '.join(cols_q)}) "
            f"VALUES ({', '.join('s.' + q for q in cols_q)});"
        )


class Oracle(Dialect):
    name = "oracle"
    paramstyle = "numeric"

    def param(self, i: int) -> str:
        return f":{i + 1}"

    def probe_one(self, cols_sql: str, table_sql: str) -> str:
        return f"SELECT {cols_sql} FROM {table_sql} FETCH FIRST 1 ROWS ONLY"

    def replace(self, table_sql: str, cols: list[str]) -> str:
        raise ValueError(
            "oracle has no REPLACE INTO — use mode='upsert' (MERGE)"
        )

    def upsert(self, table_sql: str, cols: list[str],
               key_cols: list[str]) -> str:
        cols_q = [self.quote(c) for c in cols]
        src = ", ".join(
            f"{self.param(i)} AS {q}" for i, q in enumerate(cols_q)
        )
        on = " AND ".join(
            f"t.{self.quote(k)} = s.{self.quote(k)}" for k in key_cols
        )
        sets = ", ".join(
            f"t.{self.quote(c)} = s.{self.quote(c)}"
            for c in cols if c not in key_cols
        )
        return (
            f"MERGE INTO {table_sql} t USING (SELECT {src} FROM dual) s "
            f"ON ({on}) WHEN MATCHED THEN UPDATE SET {sets} "
            f"WHEN NOT MATCHED THEN INSERT ({', '.join(cols_q)}) "
            f"VALUES ({', '.join('s.' + q for q in cols_q)})"
        )


# instantiate the base too (subclass hook only registers subclasses)
_DIALECTS["ansi"] = Dialect()


def get_dialect(name_or_dialect) -> Dialect:
    if isinstance(name_or_dialect, Dialect):
        return name_or_dialect
    try:
        return _DIALECTS[name_or_dialect]
    except KeyError:
        raise ValueError(
            f"unknown SQL dialect {name_or_dialect!r} "
            f"(have: {sorted(_DIALECTS)})"
        ) from None
