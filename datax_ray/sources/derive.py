"""Task-side change-log derivation for the flagship harness.

The driver's `events` table stands in for an upstream OLTP table; the
flagship pipelines derive a deterministic transcript change stream from it.
Derivation runs INSIDE `map_batches` tasks (never materializing the events
table on the driver) and each task writes its contiguous slice straight to a
segment file — at 100 TB the driver only ever sees O(segments) lineage rows.

Segment naming: `event_id` is the row index of the events table (verified
monotonic/contiguous in the testdata), Ray Data's parquet read yields
contiguous row ranges per batch, so `seg-{min_lsn:012d}.parquet` gives
name-order == LSN-order with disjoint LSN ranges — exactly the contract
`plan_epochs`/the watermark dedup rely on. Content is derived purely from
(event_id, user_id, ts), so a retried task rewrites the identical file.

The derivation rule (shared by the DuckDB oracles in pipelines/queries.py):
    op      = delete if event_id % 10 == 0 else insert if even else update
    conv_id = f"{conv_prefix}{user_id}"
    turn_idx= event_id % turn_mod
    role    = user if even else assistant   (null on delete)
    text    = f"payload-{event_id}"         (null on delete)
    tool    = ""                            (null on delete)
    lsn, ts = event_id, events.ts
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

LINEAGE_SCHEMA = pa.schema(
    [("file", pa.string()), ("rows", pa.int64()), ("lsn_lo", pa.int64()), ("lsn_hi", pa.int64())]
)


def _write_atomic(t: pa.Table, path: str) -> None:
    import pyarrow.parquet as pq

    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = f"{path}.tmp.{os.getpid()}"
    pq.write_table(t, tmp, compression="zstd", compression_level=1)
    os.replace(tmp, path)


_DDL_ADD_SENTIMENT = '{"action": "add_column", "name": "sentiment", "type": "string"}'
_DDL_WIDEN_TURN = '{"action": "widen", "name": "turn_idx", "type": "int64"}'
_DDL_DROP_TOOL = '{"action": "drop_column", "name": "tool"}'
_DDL_RENAME_ROLE = '{"action": "rename_column", "name": "role", "to": "speaker"}'


def derive_changes(
    t: pa.Table,
    conv_prefix: str = "conv-",
    turn_mod: int = 25,
    corrupt_mod: int | None = None,
    ddl_mod: int | None = None,
    text_mod: int | None = None,
    widen_mod: int | None = None,
    text_words: int | None = None,
    drop_mod: int | None = None,
    rename_mod: int | None = None,
    extra_col_mod: int | None = None,
) -> pa.Table:
    """Pure derivation: events batch -> change-stream batch (CHANGES
    schema). Shared by ChangeDeriver (which also writes segments) and by
    pipelines that consume the derived stream in-flight (e.g. SCD2
    history), so the DuckDB oracles stay single-sourced on this rule.

    ddl_mod=N turns every event with event_id % N == N-1 into an op='ddl'
    add_column("sentiment", string) event (idempotent in SchemaTracker) —
    a deterministic, SQL-expressible schema-evolution rule: the oracle
    excludes those events from the LWW fold and appends an all-null
    sentiment column. widen_mod=N does the same with a
    widen("turn_idx", int64) DDL — value-preserving, so WHEN it applies
    (epoch boundary) cannot change row content, only the Arrow type; the
    oracle casts turn_idx to BIGINT and excludes the ddl lsns."""
    eid = t["event_id"].combine_chunks() if isinstance(t["event_id"], pa.ChunkedArray) else t["event_id"]
    e = eid.to_numpy()
    is_del = pa.array(e % 10 == 0)
    is_even = pa.array(e % 2 == 0)
    nulls = pa.nulls(t.num_rows, pa.string())
    conv = pc.binary_join_element_wise(
        conv_prefix, pc.cast(t["user_id"], pa.string()), ""
    )
    # text_mod=M folds texts onto M distinct payloads (event_id % M) —
    # deterministic DUPLICATE texts for the dedup-scan oracle; default is
    # one unique payload per event
    text_src = pa.array(e % text_mod) if text_mod else eid
    if text_words:
        # text_words=W emits "w<m> w<m+1> ... w<m+W-1>" — a SLIDING word
        # window over the id space, so texts whose m differ by d < W share
        # W-d words: deterministic NEAR-duplicates with SQL-computable
        # n-gram Jaccard (the near-dup index oracle)
        m = text_src.to_numpy(zero_copy_only=False)
        parts: list = []
        for j in range(int(text_words)):
            parts.append("w" if j == 0 else " w")
            parts.append(pc.cast(pa.array(m + j), pa.string()))
        text = pc.binary_join_element_wise(*parts, "")
    else:
        text = pc.binary_join_element_wise(
            "payload-", pc.cast(text_src, pa.string()), ""
        )
    op = pc.if_else(is_del, "delete", pc.if_else(is_even, "insert", "update"))
    role = pc.if_else(is_del, nulls, pc.if_else(is_even, "user", "assistant"))
    turn = e % turn_mod
    if corrupt_mod:
        turn = np.where(e % corrupt_mod == 3, -1, turn)
    ddl = pa.nulls(t.num_rows, pa.string())
    if ddl_mod:
        is_ddl = pa.array(e % ddl_mod == ddl_mod - 1)
        op = pc.if_else(is_ddl, "ddl", op)
        role = pc.if_else(is_ddl, nulls, role)
        ddl = pc.if_else(
            is_ddl,
            pa.array(np.full(t.num_rows, _DDL_ADD_SENTIMENT, dtype=object), pa.string()),
            ddl,
        )
    if widen_mod:
        is_w = pa.array(e % widen_mod == widen_mod - 1)
        op = pc.if_else(is_w, "ddl", op)
        role = pc.if_else(is_w, nulls, role)
        ddl = pc.if_else(
            is_w,
            pa.array(np.full(t.num_rows, _DDL_WIDEN_TURN, dtype=object), pa.string()),
            ddl,
        )
    if drop_mod:
        # drop_mod=N emits a drop_column("tool") DDL at event_id % N == N-1:
        # the column disappears from the lake schema at that epoch's
        # boundary, old fragments shed it at merge-read (unify projects the
        # target schema), and the oracle simply omits the column.
        is_d = pa.array(e % drop_mod == drop_mod - 1)
        op = pc.if_else(is_d, "ddl", op)
        role = pc.if_else(is_d, nulls, role)
        ddl = pc.if_else(
            is_d,
            pa.array(np.full(t.num_rows, _DDL_DROP_TOOL, dtype=object), pa.string()),
            ddl,
        )
    if rename_mod:
        # rename_mod=N emits a rename_column("role" -> "speaker") DDL:
        # events keep emitting "role" (the source system doesn't know),
        # the lake serves the column as "speaker", and pre-rename
        # fragments remap at merge-read via the schema's rename metadata.
        is_r = pa.array(e % rename_mod == rename_mod - 1)
        op = pc.if_else(is_r, "ddl", op)
        role = pc.if_else(is_r, nulls, role)
        ddl = pc.if_else(
            is_r,
            pa.array(np.full(t.num_rows, _DDL_RENAME_ROLE, dtype=object), pa.string()),
            ddl,
        )
    cols = {
        "lsn": eid,
        "ts": t["ts"],
        "op": op,
        "conv_id": conv,
        "turn_idx": pc.cast(pa.array(turn), pa.int32()),
        "role": role,
        "text": pc.if_else(is_del, nulls, text),
        "tool": pc.if_else(is_del, nulls, pa.array(np.full(t.num_rows, "", dtype=object), pa.string())),
        "ddl": ddl,
    }
    if extra_col_mod:
        # extra_col_mod=N: an UNDECLARED payload column (sentiment =
        # 's<event_id % N>', null on deletes) appears in every segment
        # with NO op='ddl' event — the schema-drift stream the auto-DDL
        # path (replay --auto-ddl) must evolve from footers alone.
        cols["sentiment"] = pc.if_else(
            is_del,
            nulls,
            pc.binary_join_element_wise(
                "s", pc.cast(pa.array(e % extra_col_mod), pa.string()), ""
            ),
        )
    return pa.table(cols)


class ChangeDeriver:
    """map_batches stage: events batch -> derived CDC segment on disk.

    Emits one tiny lineage row per written segment; the change rows
    themselves never flow back through the pipeline."""

    def __init__(
        self,
        out_dir: str,
        conv_prefix: str = "conv-",
        turn_mod: int = 25,
        corrupt_mod: int | None = None,
        ddl_mod: int | None = None,
        text_mod: int | None = None,
        widen_mod: int | None = None,
        text_words: int | None = None,
        drop_mod: int | None = None,
        rename_mod: int | None = None,
        extra_col_mod: int | None = None,
    ):
        """corrupt_mod=N marks every event with event_id % N == 3 dirty
        (turn_idx = -1, which fails validation) — a deterministic,
        SQL-expressible corruption so the dirty-record/dead-letter path
        gets its own DuckDB oracle. ddl_mod: see derive_changes."""
        self.__name__ = "ChangeDeriver"
        self.out_dir = out_dir
        self.conv_prefix = conv_prefix
        self.turn_mod = turn_mod
        self.corrupt_mod = corrupt_mod
        self.ddl_mod = ddl_mod
        self.text_mod = text_mod
        self.widen_mod = widen_mod
        self.text_words = text_words
        self.drop_mod = drop_mod
        self.rename_mod = rename_mod
        self.extra_col_mod = extra_col_mod

    def derive(self, t: pa.Table) -> pa.Table:
        return derive_changes(
            t, self.conv_prefix, self.turn_mod, self.corrupt_mod, self.ddl_mod,
            self.text_mod, self.widen_mod, self.text_words, self.drop_mod,
            self.rename_mod, self.extra_col_mod,
        )

    def __call__(self, t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return LINEAGE_SCHEMA.empty_table()
        out = self.derive(t)
        lo = int(pc.min(out["lsn"]).as_py())
        hi = int(pc.max(out["lsn"]).as_py())
        path = os.path.join(self.out_dir, f"seg-{lo:012d}.parquet")
        _write_atomic(out, path)
        return pa.table(
            {
                "file": pa.array([path], pa.string()),
                "rows": pa.array([out.num_rows], pa.int64()),
                "lsn_lo": pa.array([lo], pa.int64()),
                "lsn_hi": pa.array([hi], pa.int64()),
            },
            schema=LINEAGE_SCHEMA,
        )


class SnapshotDeriver:
    """map_batches stage: customer batch -> transcripts snapshot parts.

    Snapshot rows carry a constant far-past ts, so every derived change
    event (2024 timestamps) beats its snapshot row under LWW — same rule
    the DuckDB oracle expresses with lsn=-1 pseudo-events."""

    SNAP_TS_US = 694_224_000_000_000  # 1992-01-01T00:00:00Z in microseconds

    def __init__(self, out_dir: str, turns: int = 4, conv_prefix: str = "conv-c"):
        self.__name__ = "SnapshotDeriver"
        self.out_dir = out_dir
        self.turns = turns
        self.conv_prefix = conv_prefix

    def __call__(self, t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return LINEAGE_SCHEMA.empty_table()
        ck = t["c_custkey"].combine_chunks() if isinstance(t["c_custkey"], pa.ChunkedArray) else t["c_custkey"]
        keys = ck.to_numpy()
        n, k = len(keys), self.turns
        rep = np.repeat(keys, k)
        turn = np.tile(np.arange(k, dtype=np.int64), n)
        ck_s = pc.cast(pa.array(rep), pa.string())
        turn_s = pc.cast(pa.array(turn), pa.string())
        out = pa.table(
            {
                "conv_id": pc.binary_join_element_wise(self.conv_prefix, ck_s, ""),
                "turn_idx": pc.cast(pa.array(turn), pa.int32()),
                "role": pc.if_else(pa.array(turn % 2 == 0), "user", "assistant"),
                "text": pc.binary_join_element_wise("snap-", ck_s, "-", turn_s, ""),
                "tool": pa.array([""] * (n * k), pa.string()),
                "ts": pa.array(np.full(n * k, self.SNAP_TS_US, dtype=np.int64), pa.timestamp("us")),
            }
        )
        lo = int(keys.min())
        path = os.path.join(self.out_dir, f"snap-{lo:012d}.parquet")
        _write_atomic(out, path)
        return pa.table(
            {
                "file": pa.array([path], pa.string()),
                "rows": pa.array([out.num_rows], pa.int64()),
                "lsn_lo": pa.array([-1], pa.int64()),
                "lsn_hi": pa.array([-1], pa.int64()),
            },
            schema=LINEAGE_SCHEMA,
        )


def derive_patches(
    t: pa.Table, conv_prefix: str = "conv-", turn_mod: int = 25
) -> pa.Table:
    """Sparse partial-update ("patch") stream derivation — the Debezium
    partial-payload / Hudi PartialUpdateAvroPayload shape: each change
    event SETS only the columns it carries (non-null); null = not-set.
    Deterministic, SQL-expressible rule (shared with PATCH_SQL in
    pipelines/queries.py), order = lsn alone:
        lsn      = event_id
        conv_id  = f"{conv_prefix}{user_id}"; turn_idx = event_id % turn_mod
        role set iff event_id % 3 == 0  -> 'user' if even else 'assistant'
        text set iff event_id % 3 != 0  -> f"payload-{event_id}"
        tool set iff event_id % 5 == 0  -> f"tool-{event_id % 4}"
    """
    eid = (
        t["event_id"].combine_chunks()
        if isinstance(t["event_id"], pa.ChunkedArray)
        else t["event_id"]
    )
    e = eid.to_numpy()
    nulls = pa.nulls(t.num_rows, pa.string())
    conv = pc.binary_join_element_wise(
        conv_prefix, pc.cast(t["user_id"], pa.string()), ""
    )
    role = pc.if_else(
        pa.array(e % 3 == 0),
        pc.if_else(pa.array(e % 2 == 0), "user", "assistant"),
        nulls,
    )
    text = pc.if_else(
        pa.array(e % 3 != 0),
        pc.binary_join_element_wise("payload-", pc.cast(eid, pa.string()), ""),
        nulls,
    )
    tool = pc.if_else(
        pa.array(e % 5 == 0),
        pc.binary_join_element_wise(
            "tool-", pc.cast(pa.array(e % 4), pa.string()), ""
        ),
        nulls,
    )
    return pa.table(
        {
            "lsn": eid,
            "conv_id": conv,
            "turn_idx": pc.cast(pa.array(e % turn_mod), pa.int32()),
            "role": role,
            "text": text,
            "tool": tool,
        }
    )
