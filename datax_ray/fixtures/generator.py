"""Deterministic fixture generators (FIXTURES.md schemas).

Everything is seeded numpy — no wall clock, no external data — so the same
(seed, knobs) always yields byte-identical tables. This is our stand-in for
DataX's `streamreader` synthetic source (SURVEY.md §2A row 5); the reference
snapshot itself ships no generator (/root/reference/README.md:3).

Knobs (FIXTURES.md §2): op mix, out-of-order fraction, duplicate-LSN fraction,
zipf hot-key skew, corrupt fraction (dirty-record tests), optional DDL events.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from datax_ray.schemas import CHANGES_SCHEMA, TRANSCRIPTS_SCHEMA

ROLES = np.array(["user", "assistant", "system", "tool"], dtype=object)
TOOLS = np.array(["", "search", "python", "browser", "calculator"], dtype=object)
LANGS = np.array(["en", "fr", "de", "es", "ja"], dtype=object)

# Epoch base for synthetic event time: 2026-01-01T00:00:00 UTC in microseconds.
BASE_TS_US = 1_767_225_600_000_000

_FILLER = (
    "the quick brown fox jumps over the lazy dog while discussing the plan "
    "for the next step of the multi turn agent conversation with tools and "
    "careful reasoning about data pipelines at scale "
) * 4


def _conv_ids(idx: np.ndarray) -> np.ndarray:
    # Vectorized "conv-%06d" formatting via Arrow kernels (np.char is ~10x
    # slower — it loops a Python-level ufunc over U-dtype temporaries).
    padded = pc.utf8_lpad(pc.cast(pa.array(idx.astype(np.int64)), pa.string()), width=6, padding="0")
    out = pc.binary_join_element_wise("conv-", padded, "")
    return out.to_numpy(zero_copy_only=False)


def _texts(lsn: np.ndarray, conv_idx: np.ndarray, turn: np.ndarray, rng) -> np.ndarray:
    """Deterministic per-event text with varying length."""
    lens = rng.integers(16, 160, size=len(lsn))
    # Index into the 144 possible prefixes instead of slicing per row.
    prefixes = np.array([_FILLER[:n] for n in range(16, 160)], dtype=object)
    filler = pa.array(prefixes[lens - 16], pa.string())
    la = pc.cast(pa.array(lsn), pa.string())
    ca = pc.cast(pa.array(conv_idx.astype(np.int64)), pa.string())
    ta = pc.cast(pa.array(turn.astype(np.int64)), pa.string())
    out = pc.binary_join_element_wise("t", la, "-c", ca, "-x", ta, " ", filler, "")
    return out.to_numpy(zero_copy_only=False)


def _zipf_conv_choice(rng, n_events: int, n_convs: int, s: float) -> np.ndarray:
    """Pick a conv index per event; s>0 gives zipf-skewed hot keys."""
    if s <= 0.0:
        return rng.integers(0, n_convs, size=n_events)
    ranks = np.arange(1, n_convs + 1, dtype=np.float64)
    p = ranks ** (-s)
    p /= p.sum()
    return rng.choice(n_convs, size=n_events, p=p)


def gen_transcripts(n_convs: int = 50, seed: int = 42, mean_turns: int = 8) -> pa.Table:
    """A plain transcripts table (TRANSCRIPTS_SCHEMA) — base-lake fixture."""
    rng = np.random.default_rng(seed)
    turns_per_conv = 1 + rng.geometric(1.0 / mean_turns, size=n_convs)
    conv_idx = np.repeat(np.arange(n_convs), turns_per_conv)
    turn = np.concatenate([np.arange(t) for t in turns_per_conv]).astype(np.int32)
    n = len(conv_idx)
    role = ROLES[np.where(turn % 2 == 0, 0, 1)].copy()
    tool_mask = rng.random(n) < 0.1
    role[tool_mask] = "tool"
    tool = np.where(tool_mask, TOOLS[rng.integers(1, len(TOOLS), size=n)], "")
    ts = BASE_TS_US + conv_idx.astype(np.int64) * 3_600_000_000 + turn.astype(np.int64) * 30_000_000
    text = _texts(np.arange(n), conv_idx, turn, rng)
    return pa.table(
        {
            "conv_id": pa.array(_conv_ids(conv_idx), pa.string()),
            "turn_idx": pa.array(turn, pa.int32()),
            "role": pa.array(role, pa.string()),
            "text": pa.array(text, pa.string()),
            "tool": pa.array(tool, pa.string()),
            "ts": pa.array(ts, pa.timestamp("us")),
        },
        schema=TRANSCRIPTS_SCHEMA,
    )


def gen_changes(
    n_events: int = 2000,
    n_convs: int = 50,
    seed: int = 42,
    *,
    p_insert: float = 0.61,
    p_update: float = 0.30,
    p_delete: float = 0.09,
    max_turns: int = 20,
    out_of_order_frac: float = 0.05,
    dup_frac: float = 0.01,
    corrupt_frac: float = 0.0,
    hot_key_zipf_s: float = 0.0,
    with_ddl: bool = False,
) -> pa.Table:
    """The CDC event log (CHANGES_SCHEMA, plus a `lang` payload column when
    `with_ddl` — null before the add_column DDL takes effect).

    Invariants the engine's epoch-boundary DDL simplification relies on
    (SURVEY.md §7 hard-part 4):
      * DDL events carry ts earlier than every data event, so applying them
        "first" (epoch boundary) equals applying them in (ts, lsn) order.
      * Payload values for a DDL-added column are null for every event with
        lsn below the DDL's lsn.
    """
    rng = np.random.default_rng(seed)
    n = n_events

    lsn = np.arange(n, dtype=np.int64)
    conv_idx = _zipf_conv_choice(rng, n, n_convs, hot_key_zipf_s)
    turn = rng.integers(0, max_turns, size=n).astype(np.int32)

    u = rng.random(n)
    op = np.full(n, "insert", dtype=object)
    op[u >= p_insert] = "update"
    op[u >= p_insert + p_update] = "delete"
    # (p_delete tail implied; anything beyond stays delete)

    ts = BASE_TS_US + lsn * 1_000 + rng.integers(0, 900, size=n)
    ooo = rng.random(n) < out_of_order_frac
    ts = np.where(ooo, np.maximum(BASE_TS_US, ts - rng.integers(1, 5_000_000, size=n)), ts)

    role = ROLES[rng.integers(0, 2, size=n)].copy()
    tool_mask = rng.random(n) < 0.08
    role[tool_mask] = "tool"
    tool = np.where(tool_mask, TOOLS[rng.integers(1, len(TOOLS), size=n)], "")
    text = _texts(lsn, conv_idx, turn, rng)

    conv = _conv_ids(conv_idx)
    ddl_json = np.full(n, None, dtype=object)
    lang = np.full(n, None, dtype=object)

    # Payload null for delete rows (FIXTURES.md: payload null when op delete/ddl).
    is_del = op == "delete"
    role = np.where(is_del, None, role)
    text = np.where(is_del, None, text)
    tool = np.where(is_del, None, tool)

    if with_ddl and n >= 10:
        add_pos = n // 3
        widen_pos = (2 * n) // 3
        for pos, payload in (
            (add_pos, {"action": "add_column", "name": "lang", "type": "string"}),
            (widen_pos, {"action": "widen", "name": "turn_idx", "type": "int64"}),
        ):
            op[pos] = "ddl"
            ddl_json[pos] = json.dumps(payload)
            ts[pos] = BASE_TS_US - 1_000_000  # sorts before all data events
            role[pos] = None
            text[pos] = None
            tool[pos] = None
        post = (lsn > add_pos) & (op != "ddl") & (op != "delete")
        lang = np.where(post, LANGS[rng.integers(0, len(LANGS), size=n)], None)

    # Duplicate-LSN injection: row i becomes an exact copy of row i-1
    # (re-delivered event; idempotence tests).
    if dup_frac > 0:
        dups = np.flatnonzero(rng.random(n) < dup_frac)
        dups = dups[dups > 0]
        dups = dups[op[dups - 1] != "ddl"]
        for arr in (lsn, conv, turn, op, ts, role, text, tool, ddl_json, lang):
            arr[dups] = arr[dups - 1]

    # Corruption injection (dirty-record tests): rotate through failure modes.
    ts_arr: np.ndarray = ts.astype("datetime64[us]")
    if corrupt_frac > 0:
        bad = np.flatnonzero(rng.random(n) < corrupt_frac)
        bad = bad[op[bad] != "ddl"]
        mode = bad % 4
        conv[bad[mode == 0]] = None
        turn_f = turn.astype(object)
        turn_f[bad[mode == 1]] = -1
        turn = turn_f
        ts_arr = ts_arr.astype(object)
        ts_arr[bad[mode == 2]] = None
        op[bad[mode == 3]] = "garbage"

    cols = {
        "lsn": pa.array(lsn, pa.int64()),
        "ts": pa.array(ts_arr, pa.timestamp("us")),
        "op": pa.array(op, pa.string()),
        "conv_id": pa.array(conv, pa.string()),
        "turn_idx": pa.array(turn, pa.int32()),
        "role": pa.array(role, pa.string()),
        "text": pa.array(text, pa.string()),
        "tool": pa.array(tool, pa.string()),
        "ddl": pa.array(ddl_json, pa.string()),
    }
    if with_ddl:
        cols["lang"] = pa.array(lang, pa.string())
    return pa.table(cols)


def write_segments(
    table: pa.Table, out_dir: str, seg_rows: int = 10_000, start_seg: int = 0
) -> list[str]:
    """Write the change log as ordered segment files seg-%05d.parquet.

    A segment is a contiguous slice of the log (contiguous row range, and —
    modulo injected duplicates — a contiguous LSN range); segments are the
    unit of epoch planning and replay offsets. `start_seg` offsets the
    numbering so later batches can land beside earlier ones (tail tests).
    """
    os.makedirs(out_dir, exist_ok=True)
    paths = []
    for i, start in enumerate(range(0, max(table.num_rows, 1), seg_rows), start=start_seg):
        part = table.slice(start, seg_rows)
        path = os.path.join(out_dir, f"seg-{i:05d}.parquet")
        pq.write_table(part, path, compression="zstd", compression_level=1)
        paths.append(path)
    return paths


def gen_changes_dir(
    out_dir: str,
    n_events: int = 2000,
    n_convs: int = 50,
    seed: int = 42,
    seg_rows: int = 10_000,
    chunk_rows: int = 2_000_000,
    **knobs,
) -> list[str]:
    """Write the change log as segments. Above `chunk_rows` events the log
    is generated in chunks (np.char temporaries on a U~200 text column cost
    ~0.8 KB/row — a monolithic 32M-row build would churn >25 GB): chunk c
    gets seed+c, its LSNs/timestamps offset to stay globally ordered, and
    DDL events only in chunk 0 (so they precede all data events, the
    invariant gen_changes documents). Same (seed, knobs) => same bytes."""
    if n_events <= chunk_rows:
        table = gen_changes(n_events, n_convs, seed, **knobs)
        return write_segments(table, out_dir, seg_rows=seg_rows)

    os.makedirs(out_dir, exist_ok=True)
    paths: list[str] = []
    seg_idx = 0
    for c, start in enumerate(range(0, n_events, chunk_rows)):
        n = min(chunk_rows, n_events - start)
        ck = dict(knobs)
        if c > 0:
            ck["with_ddl"] = False
        t = gen_changes(n, n_convs, seed + c, **ck)
        # shift lsn/ts into this chunk's global range
        lsn = pc.add(t["lsn"], start)
        ts = pc.add(pc.cast(t["ts"], pa.int64()), start * 1_000)
        t = t.set_column(t.schema.get_field_index("lsn"), "lsn", lsn)
        t = t.set_column(
            t.schema.get_field_index("ts"), "ts", pc.cast(ts, pa.timestamp("us"))
        )
        if c > 0 and "lang" not in t.column_names and knobs.get("with_ddl"):
            t = t.append_column("lang", pa.nulls(t.num_rows, pa.string()))
        for s in range(0, n, seg_rows):
            part = t.slice(s, seg_rows)
            path = os.path.join(out_dir, f"seg-{seg_idx:05d}.parquet")
            pq.write_table(part, path, compression="zstd", compression_level=1)
            paths.append(path)
            seg_idx += 1
    return paths


def gen_docs_with_near_dups(
    n_docs: int = 300,
    n_dup_pairs: int = 30,
    seed: int = 9,
    n_tokens: int = 40,
    mutate: int = 2,
) -> tuple[pa.Table, list[tuple[int, int]]]:
    """Documents with PLANTED near-duplicate pairs — the ground truth for
    dedup recall tests (the approximate family must be measured against a
    known answer, not tuned to a dataset's accidental distribution).

    Base docs are random token sequences over a large vocabulary (random
    pairs have ~zero 3-gram Jaccard). Each planted dup copies base doc j
    with `mutate` of its `n_tokens` tokens replaced: word-3-gram Jaccard
    ≈ (n-3m)/(n+3m) — e.g. 40 tokens / 2 mutations ≈ 0.73. Returns
    (table, [(base_id, dup_id), ...]) with dup ids n_docs..n_docs+pairs-1.
    """
    rng = np.random.default_rng(seed)
    vocab = np.array([f"tok{i:04d}" for i in range(5000)], dtype=object)
    base = rng.integers(0, len(vocab), size=(n_docs, n_tokens))
    texts = [" ".join(vocab[row]) for row in base]
    planted = []
    for j in range(n_dup_pairs):
        row = base[j].copy()
        pos = rng.choice(n_tokens, size=mutate, replace=False)
        row[pos] = rng.integers(0, len(vocab), size=mutate)
        texts.append(" ".join(vocab[row]))
        planted.append((j, n_docs + j))
    ids = np.arange(n_docs + n_dup_pairs, dtype=np.int64)
    return (
        pa.table({"doc_id": pa.array(ids), "text": pa.array(texts, pa.string())}),
        planted,
    )


def gen_embeddings_with_near_dups(
    n: int = 500,
    n_dup_pairs: int = 40,
    dim: int = 32,
    seed: int = 9,
    noise: float = 0.02,
) -> tuple[pa.Table, list[tuple[int, int]]]:
    """Embeddings with planted near-duplicates: dup vector = base + noise·g
    (cosine ≈ 1/sqrt(1+noise²) ≈ 0.9998 at the default). Random base pairs
    in 32-dim are near-orthogonal, so the planted pairs are the only ones
    above any high threshold. Returns (table, planted_pairs)."""
    rng = np.random.default_rng(seed)
    base = rng.standard_normal((n, dim))
    dups = base[:n_dup_pairs] + noise * rng.standard_normal((n_dup_pairs, dim))
    vecs = np.vstack([base, dups])
    ids = np.arange(len(vecs), dtype=np.int64)
    planted = [(j, n + j) for j in range(n_dup_pairs)]
    return (
        pa.table(
            {
                "vec_id": pa.array(ids),
                "embedding": pa.array([v.tolist() for v in vecs], pa.list_(pa.float32())),
            }
        ),
        planted,
    )
