"""Change-feed ENVELOPE export — the lake as a CDC *producer* for external
consumers (Debezium/outbox interop, file-based): every committed change of
epochs (exported, head] leaves as one envelope record

    {"op": "c"|"u"|"d", "conv_id", "turn_idx", "ts_ms", "lsn", "epoch",
     "before": {full pre-image row}|null, "after": {full post-image}|null}

built from the Delta-CDF preimage feed (feed.py:read_change_feed_preimages
— update pre/post rows pair on (conv_id, turn_idx, _epoch), unique because
the feed is LWW-reduced per epoch). A downstream system that speaks
before/after envelopes (Kafka-connect sinks, audit pipelines, another
vendor's CDC ingester) can consume the lake's history without knowing
anything about manifests or fragments.

Exactly-once protocol mirrors the incremental file export: one file per
conv-hash bucket per export window, named `env-bNNNN-eAAAAAA-BBBBBB.{ext}`
— a deterministic function of the committed feed, so a crashed export
re-runs to identical bytes — then ONE atomic `_feedout_state.json` replace
publishes the new watermark; files accumulate across runs (each covers a
disjoint epoch window) and strays from crashed attempts are GC'd at the
next publish. Availability is bounded by manifest retention like every
feed consumer.

Formats: `parquet` (envelope columns, before/after as JSON strings) and
`jsonl` (one envelope object per line, pandas' C serializer — no
per-row Python). Row order inside a file is (epoch, lsn, conv_id,
turn_idx) — stable and replayable in commit order.
"""

from __future__ import annotations

import glob as _glob
import json
import os

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

_STATE = "_feedout_state.json"
N_BUCKETS = 32
FORMATS = ("parquet", "jsonl")

_ENV_SCHEMA = pa.schema(
    [
        ("op", pa.string()),
        ("conv_id", pa.string()),
        ("turn_idx", pa.int64()),
        ("ts_ms", pa.int64()),
        ("lsn", pa.int64()),
        ("epoch", pa.int32()),
        ("before", pa.string()),
        ("after", pa.string()),
    ]
)


def _load_state(d: str) -> dict:
    try:
        with open(os.path.join(d, _STATE)) as f:
            return json.load(f)
    except FileNotFoundError:
        return {}


def _save_state(d: str, state: dict) -> None:
    os.makedirs(d, exist_ok=True)
    tmp = os.path.join(d, f"{_STATE}.tmp.{os.getpid()}")
    with open(tmp, "w") as f:
        json.dump(state, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, os.path.join(d, _STATE))


def _payload_json(t: pa.Table, cols: list[str]) -> pa.Array:
    """One compact JSON object string per row over `cols` — pandas'
    vectorized C serializer, not a Python loop. Timestamps render ISO."""
    if t.num_rows == 0:
        return pa.array([], pa.string())
    df = t.select(cols).to_pandas()
    lines = df.to_json(
        orient="records", lines=True, date_format="iso", date_unit="us"
    ).splitlines()
    return pa.array(lines, pa.string())


class _EnvelopeWriter:
    """map_groups over one conv-hash bucket of the feed window: pair
    update pre/post images, serialize before/after JSON, write the
    bucket's envelope file at a deterministic name."""

    def __init__(self, out_dir: str, payload_cols: list[str], lo: int,
                 hi: int, fmt: str):
        self.__name__ = "_EnvelopeWriter"
        self.out_dir = out_dir
        self.payload_cols = payload_cols
        self.lo = lo
        self.hi = hi
        self.fmt = fmt

    def _assemble(self, g: pa.Table) -> pa.Table:
        ct = g["_change_type"]
        cols = self.payload_cols

        def base(rows: pa.Table, op: str, before, after) -> pa.Table:
            return pa.table(
                {
                    "op": pa.array([op] * rows.num_rows, pa.string()),
                    "conv_id": rows["conv_id"],
                    "turn_idx": pc.cast(rows["turn_idx"], pa.int64()),
                    "ts_ms": pc.cast(
                        pc.divide(pc.cast(rows["ts"], pa.int64()), 1000),
                        pa.int64(),
                    ),
                    "lsn": pc.cast(rows["_lsn"], pa.int64()),
                    "epoch": pc.cast(rows["_epoch"], pa.int32()),
                    "before": before,
                    "after": after,
                }
            )

        parts = []
        ins = g.filter(pc.equal(ct, "insert"))
        if ins.num_rows:
            parts.append(
                base(ins, "c", pa.nulls(ins.num_rows, pa.string()),
                     _payload_json(ins, cols))
            )
        dels = g.filter(pc.equal(ct, "delete"))
        if dels.num_rows:
            parts.append(
                base(dels, "d", _payload_json(dels, cols),
                     pa.nulls(dels.num_rows, pa.string()))
            )
        post = g.filter(pc.equal(ct, "update_postimage"))
        pre = g.filter(pc.equal(ct, "update_preimage"))
        if post.num_rows:
            pre_j = pa.table(
                {
                    "conv_id": pre["conv_id"],
                    "turn_idx": pc.cast(pre["turn_idx"], pa.int64()),
                    "_epoch": pre["_epoch"],
                    "before": _payload_json(pre, cols),
                }
            )
            post_k = post.append_column(
                "_ti64", pc.cast(post["turn_idx"], pa.int64())
            )
            j = post_k.join(
                pre_j.rename_columns(
                    ["conv_id", "_ti64", "_epoch", "before"]
                ),
                keys=["conv_id", "_ti64", "_epoch"],
                join_type="left outer",
            )
            parts.append(base(j, "u", j["before"], _payload_json(j, cols)))
        if not parts:
            return _ENV_SCHEMA.empty_table()
        return pa.concat_tables(parts).sort_by(
            [("epoch", "ascending"), ("lsn", "ascending"),
             ("conv_id", "ascending"), ("turn_idx", "ascending")]
        )

    def __call__(self, g: pa.Table) -> pa.Table:
        b = int(g["_b"][0].as_py())
        env = self._assemble(g.drop_columns(["_b"]))
        ext = "parquet" if self.fmt == "parquet" else "jsonl"
        rel = f"env-b{b:04d}-e{self.lo:06d}-{self.hi:06d}.{ext}"
        tmp = os.path.join(self.out_dir, rel + f".tmp.{os.getpid()}")
        if self.fmt == "parquet":
            import pyarrow.parquet as pq

            pq.write_table(env, tmp, compression="zstd", compression_level=1)
        else:
            # before/after already hold JSON object strings — splice them
            # in as raw objects (not double-encoded): serialize the scalar
            # metadata with pandas' C writer, strip the closing brace,
            # append the images with one vectorized element-wise join.
            if env.num_rows == 0:
                txt = ""
            else:
                meta = env.drop_columns(["before", "after"])
                heads = pc.utf8_rtrim(
                    _payload_json(meta, meta.column_names), "}"
                )
                null_lit = pa.scalar("null", pa.string())
                full = pc.binary_join_element_wise(
                    heads,
                    pa.array([',"before":'] * env.num_rows, pa.string()),
                    pc.fill_null(env["before"].combine_chunks(), null_lit),
                    pa.array([',"after":'] * env.num_rows, pa.string()),
                    pc.fill_null(env["after"].combine_chunks(), null_lit),
                    pa.array(["}"] * env.num_rows, pa.string()),
                    "",
                )
                txt = "\n".join(full.to_pylist()) + "\n"
            with open(tmp, "w") as f:
                f.write(txt)
                f.flush()
                os.fsync(f.fileno())
        os.replace(tmp, os.path.join(self.out_dir, rel))
        return pa.table(
            {
                "bucket": pa.array([b], pa.int64()),
                "file": pa.array([rel], pa.string()),
                "rows": pa.array([env.num_rows], pa.int64()),
            }
        )


def export_change_feed_envelopes(
    lake_dir: str, out_dir: str, fmt: str = "jsonl"
) -> dict:
    """Export epochs (exported, head] as envelope files. Returns
    {"exported_from", "exported_to", "files", "rows"}."""
    from datax_ray.functions.relational import key_buckets
    from datax_ray.pipelines.feed import read_change_feed_preimages
    from datax_ray.sinks.lake import lake_schema
    from datax_ray.state.manifest import Manifest

    if fmt not in FORMATS:
        raise ValueError(f"fmt must be one of {FORMATS}, got {fmt!r}")
    m = Manifest(lake_dir)
    committed = m.committed_epoch()
    if committed < 0:
        raise ValueError(f"no committed lake at {lake_dir}")
    state = _load_state(out_dir)
    if state and state.get("fmt") != fmt:
        raise ValueError(
            f"export was created with fmt={state.get('fmt')}; got {fmt}"
        )
    exported = int(state.get("exported_epoch", -1))
    os.makedirs(out_dir, exist_ok=True)
    if exported >= committed:
        return {
            "exported_from": exported,
            "exported_to": exported,
            "files": 0,
            "rows": int(state.get("rows", 0)),
        }
    if exported >= 0 and m.at_epoch(exported) is None:
        raise ValueError(
            f"epochs since {exported} were vacuumed — the envelope stream "
            "has a gap; point consumers at a fresh bootstrap instead"
        )

    schema = lake_schema(lake_dir, committed)
    payload_cols = [f.name for f in schema if not f.name.startswith("_")]

    def bucketed(t: pa.Table) -> pa.Table:
        return t.append_column(
            "_b", key_buckets(t, ["conv_id"], N_BUCKETS)
        )

    lineage = (
        read_change_feed_preimages(lake_dir, exported, committed)
        .map_batches(bucketed, batch_format="pyarrow")
        # collapse the feed's many small blocks before the hash shuffle:
        # groupby cost grows with input block count (the r4 block-count
        # pathology), and N_BUCKETS output groups never need more input
        # granularity than this (measured ~1.3x on the shuffle stage)
        .repartition(N_BUCKETS)
        .groupby("_b")
        .map_groups(
            _EnvelopeWriter(out_dir, payload_cols, exported + 1, committed,
                            fmt),
            batch_format="pyarrow",
        )
        .take_all()
    )  # O(buckets) tiny rows
    files = list(state.get("files", []))
    new_rows = 0
    for r in lineage:
        if int(r["rows"]):
            files.append(r["file"])
            new_rows += int(r["rows"])
        else:
            # empty bucket file: remove rather than publish
            try:
                os.remove(os.path.join(out_dir, r["file"]))
            except FileNotFoundError:
                pass
    total = int(state.get("rows", 0)) + new_rows
    _save_state(
        out_dir,
        {"exported_epoch": committed, "fmt": fmt, "files": files,
         "rows": total},
    )
    live = {os.path.join(out_dir, f) for f in files}
    for p in _glob.glob(os.path.join(out_dir, "env-*.parquet")) + _glob.glob(
        os.path.join(out_dir, "env-*.jsonl")
    ):
        if p not in live:
            os.remove(p)
    return {
        "exported_from": exported,
        "exported_to": committed,
        "files": len(lineage),
        "rows": total,
    }


def read_envelopes(out_dir: str) -> ray.data.Dataset:
    """Published envelope records as a Dataset (both formats). Our own
    exports read exactly the state-published file set; a FOREIGN
    producer's directory (no `_feedout_state.json`) falls back to every
    `env-*` file on disk — the same contract sources/envelope.py ingests."""
    state = _load_state(out_dir)
    fmt = state.get("fmt")
    files = [os.path.join(out_dir, f) for f in state.get("files", [])]
    if not files and not state:
        jl = sorted(_glob.glob(os.path.join(out_dir, "env-*.jsonl")))
        pq_f = sorted(_glob.glob(os.path.join(out_dir, "env-*.parquet")))
        files, fmt = (jl, "jsonl") if jl else (pq_f, "parquet")
    if not files:
        return ray.data.from_arrow(_ENV_SCHEMA.empty_table())
    if fmt == "parquet":
        return ray.data.read_parquet(files)
    return ray.data.read_json(files)
