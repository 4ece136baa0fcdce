"""The driver-facing query catalog: every operator/pipeline from SURVEY.md §2
as a callable over an sf_dir of parquet tables, each paired (where SQL can
express it) with a DuckDB oracle in ORACLE_SQL. Column names match the SQL
exactly — the driver hash-compares values after sorting columns by name.

Float-sum queries use the integer-cents trick (CAST(ROUND(x*100) AS BIGINT)
per row, then integer sums) so results are exact and order-independent on
both engines.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from datax_ray.functions._buckets import coarse_buckets, parquet_rows
from datax_ray.functions.dedup import exact_dedup
from datax_ray.functions.relational import broadcast_join, partial_agg, top_k
from datax_ray.functions.text import LangId, add_fingerprint, add_quality_signals
from datax_ray.functions.transformers import apply_transformers
from datax_ray.stages.merge import lww_reduce


def _read(sf_dir: str, table: str, columns: list[str] | None = None) -> ray.data.Dataset:
    """Column-pruned read: only the named columns leave storage (parquet
    projection pushdown) — at 100 TB a full-width read for a two-column
    transform is the first thing to get wrong."""
    return ray.data.read_parquet(
        os.path.join(sf_dir, f"{table}.parquet"), columns=columns
    )


def _cents(col, factor: int = 100):
    return pc.cast(pc.round(pc.multiply(col, factor)), pa.int64())


def _tokens_with_doc(t: pa.Table, id_col: str | None = None):
    """Whitespace-tokenize t['text'] with Arrow kernels (no pandas
    explode): returns (flat_terms, repeated_ids_or_None). Matches
    string_split semantics exactly — '' yields one empty token, adjacent
    separators yield empty tokens — so the DuckDB oracles agree."""
    toks = pc.split_pattern(pc.fill_null(t["text"], ""), " ")
    flat = pc.list_flatten(toks)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    if id_col is None:
        return flat, None
    n = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
    ids = (
        t[id_col].combine_chunks().to_numpy(zero_copy_only=False)
        if isinstance(t[id_col], pa.ChunkedArray)
        else t[id_col].to_numpy(zero_copy_only=False)
    )
    return flat, pa.array(np.repeat(ids, n))


def _derive_changes(sf_dir: str, work: str, target_epochs: int = 5, **deriver_kw) -> int:
    """Clear `work`, derive the transcript change log from `events` INSIDE
    map_batches tasks (each task writes its contiguous slice as a segment;
    the events table never lands on the driver), and return a
    segments_per_epoch sized so replay runs ~target_epochs incremental
    epochs at ANY sf (floor: 2 segments/epoch, so multi-epoch semantics
    survive small inputs). Per-epoch fixed cost — range plan, two-phase
    commit, compaction check — is a constant; letting the epoch count grow
    linearly with sf would time the harness, not the engine."""
    import shutil

    from datax_ray.sources.derive import ChangeDeriver

    shutil.rmtree(work, ignore_errors=True)
    lineage = (
        _read(sf_dir, "events", columns=["event_id", "ts", "user_id"])
        .map_batches(
            ChangeDeriver(f"{work}/changes", **deriver_kw),
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=4096,
        )
        .take_all()
    )  # one tiny lineage row per segment — O(segments) driver rows
    n_segs = max(1, len(lineage))
    return max(2, -(-n_segs // target_epochs))


def _buckets_for(sf_dir: str, table: str) -> int:
    """Coarse-bucket count scaled to the input table (parquet footer row
    count, no data read) — the sizing rule every groupby(map_groups) stage
    here uses instead of a fixed constant (see functions/_buckets.py)."""
    return coarse_buckets(parquet_rows(os.path.join(sf_dir, f"{table}.parquet")))


# ------------------------------------------------------------------ CDC --


def cdc_lww_upsert(sf_dir: str, num_buckets: int | None = None):
    """LWW upsert over a change stream derived from `events`: key =
    (user_id, event_type), order = (ts, lsn=event_id), op = delete when
    event_id % 10 == 0. Exercises the engine's real lww_reduce kernel,
    distributed the same way the replay engine does it: a vectorized
    per-batch pre-reduce (combiner — shrinks the shuffle), then a hash
    bucket per ~64 keys-worth of users so the post-shuffle reduce runs
    once per BUCKET (vectorized), not once per user."""
    KEYS = ("user_id", "event_type")
    ORDER = ("ts", "lsn")
    if num_buckets is None:
        num_buckets = _buckets_for(sf_dir, "events")

    def derive(t: pa.Table) -> pa.Table:
        eid = t["event_id"].to_numpy()
        uid = t["user_id"].to_numpy()
        op = pa.array(
            np.where(eid % 10 == 0, "delete", "upsert").astype(object), pa.string()
        )
        pre = pa.table(
            {
                "bucket": pa.array(
                    ((uid.astype(np.uint64) * 2654435761) % num_buckets).astype(
                        np.int32
                    ),
                    pa.int32(),
                ),
                "lsn": t["event_id"],
                "ts": t["ts"],
                "user_id": t["user_id"],
                "event_type": t["event_type"],
                "op": op,
                "value": t["value"],
            }
        )
        return lww_reduce(pre, key_cols=KEYS, order_cols=ORDER)

    def per_bucket(g: pa.Table) -> pa.Table:
        w = lww_reduce(g, key_cols=KEYS, order_cols=ORDER)
        w = w.filter(pc.not_equal(w["op"], "delete"))
        return w.select(["user_id", "event_type", "ts", "lsn", "value"])

    ds = _read(
        sf_dir, "events", columns=["event_id", "ts", "user_id", "event_type", "value"]
    ).map_batches(derive, batch_format="pyarrow", zero_copy_batch=True)
    return ds.groupby("bucket").map_groups(per_bucket, batch_format="pyarrow")


CDC_LWW_SQL = """
WITH c AS (
  SELECT event_id AS lsn, ts, user_id, event_type,
         CASE WHEN event_id % 10 = 0 THEN 'delete' ELSE 'upsert' END AS op,
         value
  FROM events
), w AS (
  SELECT *, row_number() OVER (
      PARTITION BY user_id, event_type ORDER BY ts DESC, lsn DESC) AS rn
  FROM c
)
SELECT user_id, event_type, ts, lsn, value FROM w WHERE rn = 1 AND op <> 'delete'
"""


def cdc_replay_final(sf_dir: str):
    """Full engine path: derive a transcript change log from `events`
    INSIDE map_batches tasks (each task writes its contiguous slice as a
    segment — the events table never lands on the driver), replay through
    normalize → fragment-delta write → compaction → manifest commit, and
    return the final lake. The derivation rule is deterministic, so the
    DuckDB oracle (CDC_REPLAY_SQL) expresses the expected lake as a
    row_number() LWW over the same derivation."""
    import shutil

    from datax_ray.pipelines.replay import ReplayConfig, replay
    from datax_ray.sinks.lake import final_table

    work = f"/tmp/datax_cdc_replay/{os.path.basename(os.path.normpath(sf_dir))}"
    spe = _derive_changes(sf_dir, work)
    replay(
        ReplayConfig(
            changes_dir=f"{work}/changes",
            lake_dir=f"{work}/lake",
            num_partitions=16,
            segments_per_epoch=spe,
        )
    )
    return final_table(f"{work}/lake")


# The derived change stream of ChangeDeriver (sources/derive.py), LWW-folded
# exactly like the engine's merge: winner per (conv_id, turn_idx) is max
# (ts, lsn); a winning delete removes the row.
CDC_REPLAY_SQL = """
WITH c AS (
  SELECT event_id AS lsn, ts,
         CASE WHEN event_id % 10 = 0 THEN 'delete'
              WHEN event_id % 2 = 0 THEN 'insert' ELSE 'update' END AS op,
         'conv-' || CAST(user_id AS VARCHAR) AS conv_id,
         CAST(event_id % 25 AS INTEGER) AS turn_idx,
         CASE WHEN event_id % 10 = 0 THEN NULL
              WHEN event_id % 2 = 0 THEN 'user' ELSE 'assistant' END AS role,
         CASE WHEN event_id % 10 = 0 THEN NULL
              ELSE 'payload-' || CAST(event_id AS VARCHAR) END AS text,
         CASE WHEN event_id % 10 = 0 THEN NULL ELSE '' END AS tool
  FROM events
), w AS (
  SELECT *, row_number() OVER (PARTITION BY conv_id, turn_idx
                               ORDER BY ts DESC, lsn DESC) AS rn
  FROM c
)
SELECT conv_id, turn_idx, role, text, tool, ts FROM w WHERE rn = 1 AND op <> 'delete'
"""


def cdc_multisource_replay(sf_dir: str):
    """Multi-source replication (replay.py MULTISOURCE_SLOTS design): the
    derived change log is split segment-alternately across TWO producer
    dirs — each keeps a strictly-increasing lsn space — and replayed with
    ReplayConfig(sources=...). Because the glsn remap (lsn*slots + slot)
    is monotone in the original, globally-unique lsn, the merged LWW fold
    is IDENTICAL to the single-log fold, so the oracle is CDC_REPLAY_SQL
    verbatim — the driver hash-verifies the per-source watermarking, slot
    pinning, union-of-remapped-reads path end to end."""
    import shutil

    from datax_ray.pipelines.replay import ReplayConfig, replay
    from datax_ray.sinks.lake import final_table

    work = f"/tmp/datax_cdc_multisrc/{os.path.basename(os.path.normpath(sf_dir))}"
    spe = _derive_changes(sf_dir, work)
    src_a, src_b = f"{work}/src_a", f"{work}/src_b"
    os.makedirs(src_a, exist_ok=True)
    os.makedirs(src_b, exist_ok=True)
    segs = sorted(os.listdir(f"{work}/changes"))
    for i, s in enumerate(segs):
        os.rename(
            os.path.join(f"{work}/changes", s),
            os.path.join(src_a if i % 2 == 0 else src_b, s),
        )
    replay(
        ReplayConfig(
            sources={"alpha": src_a, "beta": src_b},
            lake_dir=f"{work}/lake",
            num_partitions=16,
            segments_per_epoch=spe,
        )
    )
    return final_table(f"{work}/lake")


def cdc_envelope_roundtrip(sf_dir: str):
    """Full INTEROP loop, driver-verified: derive → replay into lake A →
    export the change feed as Debezium-style before/after envelopes
    (sinks/feedout.py) → ingest the envelope stream into a BRAND-NEW lake
    B through sources/envelope.py (fresh synthesized lsn space, different
    partition count) → return B's final state. Equality with the LWW
    oracle proves the envelope format is a complete, sufficient encoding
    of the lake's history — a foreign consumer applying it in stream
    order reconstructs the table exactly (the converter lands envelopes in
    the CHANGES schema, so B's turn_idx is int32 like any ingested lake)."""
    from datax_ray.pipelines.replay import ReplayConfig, replay
    from datax_ray.sinks.feedout import export_change_feed_envelopes
    from datax_ray.sinks.lake import final_table
    from datax_ray.sources.envelope import envelopes_to_segments

    work = f"/tmp/datax_cdc_envrt/{os.path.basename(os.path.normpath(sf_dir))}"
    spe = _derive_changes(sf_dir, work)
    replay(ReplayConfig(
        changes_dir=f"{work}/changes", lake_dir=f"{work}/lake",
        num_partitions=16, segments_per_epoch=spe,
    ))
    export_change_feed_envelopes(f"{work}/lake", f"{work}/env", fmt="jsonl")
    envelopes_to_segments(f"{work}/env", f"{work}/changes_rt")
    replay(ReplayConfig(
        changes_dir=f"{work}/changes_rt", lake_dir=f"{work}/lake_rt",
        num_partitions=8, segments_per_epoch=10**9,
    ))
    return final_table(f"{work}/lake_rt")


def cdc_stream_roundtrip(sf_dir: str):
    """The envelope interop loop over a NETWORK transport, driver-verified:
    replay into lake A -> export envelopes -> serve every record over a
    localhost TCP socket through the resume-handshake broker protocol
    (sources/stream.py) WITH mid-stream disconnects and at-least-once
    redelivery injected -> consumer spools, converts and replays into a
    brand-new lake B -> B's final state must equal the same LWW oracle as
    the file-based round-trip. Proves the streaming consumer adds no
    loss, duplication or reordering on top of the envelope contract."""
    import glob as _glob
    import json as _json

    from datax_ray.pipelines.replay import ReplayConfig, replay
    from datax_ray.sinks.feedout import export_change_feed_envelopes
    from datax_ray.sinks.lake import final_table
    from datax_ray.sources.stream import EnvelopeStreamServer, stream_ingest

    work = f"/tmp/datax_cdc_streamrt/{os.path.basename(os.path.normpath(sf_dir))}"
    import shutil as _shutil

    _shutil.rmtree(work, ignore_errors=True)
    spe = _derive_changes(sf_dir, work)
    replay(ReplayConfig(
        changes_dir=f"{work}/changes", lake_dir=f"{work}/lake",
        num_partitions=16, segments_per_epoch=spe,
    ))
    export_change_feed_envelopes(f"{work}/lake", f"{work}/env", fmt="jsonl")

    def window_key(p):
        name = os.path.basename(p)
        return (name.split("-e")[-1], name)

    records = []
    for p in sorted(_glob.glob(os.path.join(f"{work}/env", "env-*.jsonl")),
                    key=window_key):
        with open(p) as f:
            records.extend(_json.loads(line) for line in f if line.strip())
    cfg = ReplayConfig(
        changes_dir=f"{work}/changes_rt", lake_dir=f"{work}/lake_rt",
        num_partitions=8, segments_per_epoch=10**9,
    )
    with EnvelopeStreamServer(records, drop_every=max(500, len(records) // 5),
                              redeliver=40) as srv:
        stream_ingest(srv.addr, f"{work}/spool", f"{work}/changes_rt",
                      replay_cfg=cfg, batch_records=1000)
    return final_table(f"{work}/lake_rt")


CDC_ENVELOPE_RT_SQL = """
WITH c AS (
  SELECT event_id AS lsn, ts,
         CASE WHEN event_id % 10 = 0 THEN 'delete'
              WHEN event_id % 2 = 0 THEN 'insert' ELSE 'update' END AS op,
         'conv-' || CAST(user_id AS VARCHAR) AS conv_id,
         CAST(event_id % 25 AS INTEGER) AS turn_idx,
         CASE WHEN event_id % 10 = 0 THEN NULL
              WHEN event_id % 2 = 0 THEN 'user' ELSE 'assistant' END AS role,
         CASE WHEN event_id % 10 = 0 THEN NULL
              ELSE 'payload-' || CAST(event_id AS VARCHAR) END AS text,
         CASE WHEN event_id % 10 = 0 THEN NULL ELSE '' END AS tool
  FROM events
), w AS (
  SELECT *, row_number() OVER (PARTITION BY conv_id, turn_idx
                               ORDER BY ts DESC, lsn DESC) AS rn
  FROM c
)
SELECT conv_id, turn_idx, role, text, tool, ts FROM w WHERE rn = 1 AND op <> 'delete'
"""


def cdc_broker_roundtrip(sf_dir: str):
    """The envelope interop loop over the SECOND transport behind the
    Consumer seam (sources/stream.py:FileBrokerConsumer): replay into
    lake A -> export envelopes -> publish into a file-backed 2-PARTITION
    topic keyed by conv_id (Kafka's per-key-order contract) -> one
    consumer per partition spools through the SAME stream_consume loop
    as the socket transport -> each partition replays as its own source
    via multi-source replication -> the merged lake must equal the same
    LWW oracle as the socket round-trip. Proves the consumer protocol is
    transport-agnostic AND that key-partitioned consumption preserves
    the per-key order LWW needs."""
    import glob as _glob
    import json as _json

    from datax_ray.pipelines.replay import ReplayConfig, replay
    from datax_ray.sinks.feedout import export_change_feed_envelopes
    from datax_ray.sinks.lake import final_table
    from datax_ray.sources.envelope import envelopes_to_segments
    from datax_ray.sources.stream import (
        FileBroker,
        FileBrokerConsumer,
        stream_consume,
    )

    work = f"/tmp/datax_cdc_brokerrt/{os.path.basename(os.path.normpath(sf_dir))}"
    import shutil as _shutil

    _shutil.rmtree(work, ignore_errors=True)
    spe = _derive_changes(sf_dir, work)
    replay(ReplayConfig(
        changes_dir=f"{work}/changes", lake_dir=f"{work}/lake",
        num_partitions=16, segments_per_epoch=spe,
    ))
    export_change_feed_envelopes(f"{work}/lake", f"{work}/env", fmt="jsonl")

    def window_key(p):
        name = os.path.basename(p)
        return (name.split("-e")[-1], name)

    records = []
    for p in sorted(_glob.glob(os.path.join(f"{work}/env", "env-*.jsonl")),
                    key=window_key):
        with open(p) as f:
            records.extend(_json.loads(line) for line in f if line.strip())

    def key(rec):
        for side in ("after", "before"):
            img = rec.get(side)
            if isinstance(img, dict) and img.get("conv_id"):
                return img["conv_id"]
        return rec.get("conv_id", "")

    broker = FileBroker(f"{work}/broker", partitions=2)
    broker.publish(records, key=key)
    broker.seal()

    sources = {}
    for p in range(2):
        stream_consume(
            FileBrokerConsumer(f"{work}/broker", partition=p),
            f"{work}/spool{p}", batch_records=4000,
        )
        envelopes_to_segments(f"{work}/spool{p}", f"{work}/changes_p{p}")
        sources[f"p{p}"] = f"{work}/changes_p{p}"
    replay(ReplayConfig(
        sources=sources, lake_dir=f"{work}/lake_rt", num_partitions=8,
        segments_per_epoch=10**9,
    ))
    return final_table(f"{work}/lake_rt")


def cdc_backfill_scrub(sf_dir: str):
    """Bulk UPDATE through the full engine, driver-verified
    (pipelines/backfill.py): replay the derived log, then retroactively
    rewrite every live row's text with a dx_replace chain (the
    'scrub/normalize history' shape) — one epoch of dominating synthetic-
    lsn rewrites, O(changed rows); a second identical backfill must
    converge to a no-op (asserted). The oracle applies the same literal
    replacement to the LWW fold."""
    from datax_ray.pipelines.backfill import backfill
    from datax_ray.pipelines.replay import ReplayConfig, replay
    from datax_ray.sinks.lake import final_table

    work = f"/tmp/datax_cdc_backfill/{os.path.basename(os.path.normpath(sf_dir))}"
    spe = _derive_changes(sf_dir, work)
    replay(ReplayConfig(
        changes_dir=f"{work}/changes", lake_dir=f"{work}/lake",
        num_partitions=16, segments_per_epoch=spe,
    ))
    spec = [{"name": "dx_replace", "column": "text",
             "pattern": "payload-", "replacement": "doc-"}]
    r = backfill(f"{work}/lake", spec)
    assert r["rewritten_rows"] > 0
    assert backfill(f"{work}/lake", spec)["epoch"] is None  # converged
    return final_table(f"{work}/lake")


CDC_BACKFILL_SQL = """
WITH c AS (
  SELECT event_id AS lsn, ts,
         CASE WHEN event_id % 10 = 0 THEN 'delete'
              WHEN event_id % 2 = 0 THEN 'insert' ELSE 'update' END AS op,
         'conv-' || CAST(user_id AS VARCHAR) AS conv_id,
         CAST(event_id % 25 AS INTEGER) AS turn_idx,
         CASE WHEN event_id % 10 = 0 THEN NULL
              WHEN event_id % 2 = 0 THEN 'user' ELSE 'assistant' END AS role,
         CASE WHEN event_id % 10 = 0 THEN NULL
              ELSE 'payload-' || CAST(event_id AS VARCHAR) END AS text,
         CASE WHEN event_id % 10 = 0 THEN NULL ELSE '' END AS tool
  FROM events
), w AS (
  SELECT *, row_number() OVER (PARTITION BY conv_id, turn_idx
                               ORDER BY ts DESC, lsn DESC) AS rn
  FROM c
)
SELECT conv_id, turn_idx, role,
       replace(text, 'payload-', 'doc-') AS text, tool, ts
FROM w WHERE rn = 1 AND op <> 'delete'
"""


def cdc_merge_into(sf_dir: str):
    """MERGE INTO through the full engine, driver-verified
    (pipelines/mergeinto.py): replay the derived log, then fold a keyed
    source snapshot — one 'editor' row per distinct user at turn 5
    (matched where it survives the fold) and turn 27 (always fresh: the
    derivation only emits turns 0–24) — with a matched condition on the
    TARGET text and a not-matched condition restricting inserts to the
    fresh turn band. Updates keep the stored event-time and dominate via
    reserved synthetic lsns; a second identical merge must converge to a
    no-op (asserted). The distinct-user source derives from a per-batch
    unique combiner (O(users) driver rows, the count-distinct pattern)."""
    from datax_ray.pipelines.mergeinto import merge_into
    from datax_ray.pipelines.replay import ReplayConfig, replay
    from datax_ray.sinks.lake import final_table

    work = f"/tmp/datax_cdc_merge/{os.path.basename(os.path.normpath(sf_dir))}"
    spe = _derive_changes(sf_dir, work)
    replay(ReplayConfig(
        changes_dir=f"{work}/changes", lake_dir=f"{work}/lake",
        num_partitions=16, segments_per_epoch=spe,
    ))

    def uniq(t: pa.Table) -> pa.Table:
        return pa.table({"user_id": pc.unique(t["user_id"])})

    partials = (
        _read(sf_dir, "events", columns=["user_id"])
        .map_batches(uniq, batch_format="pyarrow")
        .take_all()
    )
    users = sorted({int(r["user_id"]) for r in partials})
    ts0 = 1_893_456_000_000_000  # 2030-01-01T00:00:00Z in µs
    src = pa.table(
        {
            "conv_id": pa.array(
                [f"conv-{u}" for u in users] * 2, pa.string()
            ),
            "turn_idx": pa.array(
                [5] * len(users) + [27] * len(users), pa.int32()
            ),
            "role": pa.array(["editor"] * (2 * len(users)), pa.string()),
            "text": pa.array(
                [f"merged-{u}-5" for u in users]
                + [f"merged-{u}-27" for u in users],
                pa.string(),
            ),
            "tool": pa.array([""] * (2 * len(users)), pa.string()),
            "ts": pa.array([ts0] * (2 * len(users)), pa.timestamp("us")),
        }
    )
    r = merge_into(
        f"{work}/lake", src,
        matched_cond=[["text", "not_like", "%3"]],
        not_matched_cond=[["turn_idx", ">=", 25]],
    )
    assert r["inserted"] == len(users)
    assert merge_into(
        f"{work}/lake", src,
        matched_cond=[["text", "not_like", "%3"]],
        not_matched_cond=[["turn_idx", ">=", 25]],
    )["epoch"] is None  # converged
    return final_table(f"{work}/lake")


CDC_MERGE_SQL = """
WITH c AS (
  SELECT event_id AS lsn, ts,
         CASE WHEN event_id % 10 = 0 THEN 'delete'
              WHEN event_id % 2 = 0 THEN 'insert' ELSE 'update' END AS op,
         'conv-' || CAST(user_id AS VARCHAR) AS conv_id,
         CAST(event_id % 25 AS INTEGER) AS turn_idx,
         CASE WHEN event_id % 10 = 0 THEN NULL
              WHEN event_id % 2 = 0 THEN 'user' ELSE 'assistant' END AS role,
         CASE WHEN event_id % 10 = 0 THEN NULL
              ELSE 'payload-' || CAST(event_id AS VARCHAR) END AS text,
         CASE WHEN event_id % 10 = 0 THEN NULL ELSE '' END AS tool
  FROM events
), w AS (
  SELECT *, row_number() OVER (PARTITION BY conv_id, turn_idx
                               ORDER BY ts DESC, lsn DESC) AS rn
  FROM c
), final AS (
  SELECT conv_id, turn_idx, role, text, tool, ts FROM w
  WHERE rn = 1 AND op <> 'delete'
), u AS (SELECT DISTINCT user_id FROM events),
src AS (
  SELECT 'conv-' || CAST(user_id AS VARCHAR) AS conv_id,
         CAST(5 AS INTEGER) AS turn_idx, 'editor' AS role,
         'merged-' || CAST(user_id AS VARCHAR) || '-5' AS text,
         '' AS tool, TIMESTAMP '2030-01-01 00:00:00' AS ts FROM u
  UNION ALL
  SELECT 'conv-' || CAST(user_id AS VARCHAR),
         CAST(27 AS INTEGER), 'editor',
         'merged-' || CAST(user_id AS VARCHAR) || '-27',
         '', TIMESTAMP '2030-01-01 00:00:00' FROM u
), upd AS (
  SELECT f.conv_id, f.turn_idx,
         CASE WHEN s.conv_id IS NOT NULL AND f.text NOT LIKE '%3'
              THEN s.role ELSE f.role END AS role,
         CASE WHEN s.conv_id IS NOT NULL AND f.text NOT LIKE '%3'
              THEN s.text ELSE f.text END AS text,
         CASE WHEN s.conv_id IS NOT NULL AND f.text NOT LIKE '%3'
              THEN s.tool ELSE f.tool END AS tool,
         f.ts
  FROM final f
  LEFT JOIN src s ON f.conv_id = s.conv_id AND f.turn_idx = s.turn_idx
), ins AS (
  SELECT s.conv_id, s.turn_idx, s.role, s.text, s.tool, s.ts
  FROM src s
  LEFT JOIN final f ON f.conv_id = s.conv_id AND f.turn_idx = s.turn_idx
  WHERE f.conv_id IS NULL AND s.turn_idx >= 25
)
SELECT conv_id, CAST(turn_idx AS INTEGER) AS turn_idx, role, text, tool, ts
FROM upd
UNION ALL
SELECT conv_id, CAST(turn_idx AS INTEGER) AS turn_idx, role, text, tool, ts
FROM ins
"""


def cdc_merge_delete(sf_dir: str):
    """MERGE's DELETE clause, driver-verified: the same distinct-user
    snapshot keys (turn 5), but WHEN MATCHED AND role='assistant' THEN
    DELETE, NOT MATCHED skip — conditional tombstoning driven by a keyed
    snapshot. A second identical merge must converge (the deleted keys
    are no longer matched and the skip clause leaves them dead)."""
    from datax_ray.pipelines.mergeinto import merge_into
    from datax_ray.pipelines.replay import ReplayConfig, replay
    from datax_ray.sinks.lake import final_table

    work = f"/tmp/datax_cdc_mergedel/{os.path.basename(os.path.normpath(sf_dir))}"
    spe = _derive_changes(sf_dir, work)
    replay(ReplayConfig(
        changes_dir=f"{work}/changes", lake_dir=f"{work}/lake",
        num_partitions=16, segments_per_epoch=spe,
    ))

    def uniq(t: pa.Table) -> pa.Table:
        return pa.table({"user_id": pc.unique(t["user_id"])})

    partials = (
        _read(sf_dir, "events", columns=["user_id"])
        .map_batches(uniq, batch_format="pyarrow")
        .take_all()
    )
    users = sorted({int(r["user_id"]) for r in partials})
    src = pa.table(
        {
            "conv_id": pa.array([f"conv-{u}" for u in users], pa.string()),
            "turn_idx": pa.array([5] * len(users), pa.int32()),
        }
    )
    kw = dict(when_matched="delete", when_not_matched="skip",
              matched_cond=[["role", "=", "assistant"]])
    r = merge_into(f"{work}/lake", src, **kw)
    assert r["inserted"] == 0 and r["updated"] == 0
    assert merge_into(f"{work}/lake", src, **kw)["epoch"] is None
    return final_table(f"{work}/lake")


CDC_MERGE_DELETE_SQL = """
WITH c AS (
  SELECT event_id AS lsn, ts,
         CASE WHEN event_id % 10 = 0 THEN 'delete'
              WHEN event_id % 2 = 0 THEN 'insert' ELSE 'update' END AS op,
         'conv-' || CAST(user_id AS VARCHAR) AS conv_id,
         CAST(event_id % 25 AS INTEGER) AS turn_idx,
         CASE WHEN event_id % 10 = 0 THEN NULL
              WHEN event_id % 2 = 0 THEN 'user' ELSE 'assistant' END AS role,
         CASE WHEN event_id % 10 = 0 THEN NULL
              ELSE 'payload-' || CAST(event_id AS VARCHAR) END AS text,
         CASE WHEN event_id % 10 = 0 THEN NULL ELSE '' END AS tool
  FROM events
), w AS (
  SELECT *, row_number() OVER (PARTITION BY conv_id, turn_idx
                               ORDER BY ts DESC, lsn DESC) AS rn
  FROM c
), final AS (
  SELECT conv_id, turn_idx, role, text, tool, ts FROM w
  WHERE rn = 1 AND op <> 'delete'
), u AS (SELECT DISTINCT user_id FROM events),
del AS (
  SELECT 'conv-' || CAST(user_id AS VARCHAR) AS conv_id,
         CAST(5 AS INTEGER) AS turn_idx FROM u
)
SELECT f.conv_id, f.turn_idx, f.role, f.text, f.tool, f.ts
FROM final f
LEFT JOIN del d ON f.conv_id = d.conv_id AND f.turn_idx = d.turn_idx
WHERE d.conv_id IS NULL OR f.role <> 'assistant'
"""


def cdc_branch_merge(sf_dir: str):
    """Branch → diverge → MERGE-BACK, driver-verified
    (pipelines/mergeback.py): replay the first half of the derived log
    into the parent, `clone` it (O(metadata) hardlink branch), replay the
    SECOND half into the branch only (the branch's cloned manifest
    carries tranche 1's segments, so exactly-once applies just the new
    ones), then merge the branch back. The merged parent must equal the
    LWW fold of the WHOLE log — including event-times, because in the
    conflict-free case every branch winner's (ts, lsn) dominates the
    parent's stored row, so the merge writes the fold's own winners. A
    second merge-back must converge to a no-op (asserted). Oracle:
    CDC_REPLAY_SQL over all events."""
    import shutil

    from datax_ray.pipelines.clone import clone_lake
    from datax_ray.pipelines.mergeback import merge_back
    from datax_ray.pipelines.replay import ReplayConfig, replay
    from datax_ray.sinks.lake import final_table
    from datax_ray.sources.derive import ChangeDeriver

    n = parquet_rows(os.path.join(sf_dir, "events.parquet"))
    cut = n // 2
    work = f"/tmp/datax_cdc_brmerge/{os.path.basename(os.path.normpath(sf_dir))}"
    shutil.rmtree(work, ignore_errors=True)

    def derive_tranche(lo_incl: int | None, hi_excl: int | None) -> int:
        mask_fn = (
            (lambda t: t.filter(pc.less(t["event_id"], hi_excl)))
            if hi_excl is not None
            else (lambda t: t.filter(pc.greater_equal(t["event_id"], lo_incl)))
        )
        segs = (
            _read(sf_dir, "events", columns=["event_id", "ts", "user_id"])
            .map_batches(mask_fn, batch_format="pyarrow", zero_copy_batch=True)
            .map_batches(
                ChangeDeriver(f"{work}/changes"),
                batch_format="pyarrow",
                zero_copy_batch=True,
                batch_size=4096,
            )
            .count()
        )
        return max(1, int(segs))

    n_segs = derive_tranche(None, cut)
    replay(ReplayConfig(
        changes_dir=f"{work}/changes", lake_dir=f"{work}/parent",
        num_partitions=16, segments_per_epoch=max(2, -(-n_segs // 2)),
    ))
    clone_lake(f"{work}/parent", f"{work}/branch")
    n_segs2 = derive_tranche(cut, None)
    replay(ReplayConfig(
        changes_dir=f"{work}/changes", lake_dir=f"{work}/branch",
        num_partitions=16, segments_per_epoch=max(2, -(-n_segs2 // 2)),
    ))
    r = merge_back(f"{work}/parent", f"{work}/branch")
    assert r["epoch"] is not None and r["conflicts"] == 0
    assert merge_back(f"{work}/parent", f"{work}/branch")["epoch"] is None
    return final_table(f"{work}/parent")


def cdc_dup_texts(sf_dir: str):
    """Duplicate-content scan over the CDC lake, driver-verified
    (pipelines/dedupscan.py): derive a change log whose texts fold onto
    500 distinct payloads (text_mod — deterministic duplicates), replay it,
    refresh the incremental hash-postings index (per-range artifacts,
    manifest-fingerprint skip), and emit every live turn whose text is
    byte-identical to another's, with its group size. The index derives
    from LIVE merge-read state, so LWW losers and deletes can never
    resurrect into a duplicate group — exactly what the oracle (LWW SQL
    fold + COUNT(*) OVER (PARTITION BY text)) asserts."""
    import shutil

    from datax_ray.pipelines.dedupscan import duplicate_groups, refresh_dedup_index
    from datax_ray.pipelines.replay import ReplayConfig, replay

    work = f"/tmp/datax_cdc_dup/{os.path.basename(os.path.normpath(sf_dir))}"
    spe = _derive_changes(sf_dir, work, text_mod=500)
    replay(
        ReplayConfig(
            changes_dir=f"{work}/changes",
            lake_dir=f"{work}/lake",
            num_partitions=16,
            segments_per_epoch=spe,
        )
    )
    refresh_dedup_index(f"{work}/lake", f"{work}/dupidx")
    out = duplicate_groups(f"{work}/dupidx", min_count=2)

    def cast_out(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "conv_id": t["conv_id"],
                "turn_idx": pc.cast(t["turn_idx"], pa.int32()),
                "grp_size": pc.cast(t["grp_size"], pa.int64()),
            }
        )

    return out.map_batches(cast_out, batch_format="pyarrow")


CDC_DUP_SQL = """
WITH c AS (
  SELECT event_id AS lsn, ts,
         CASE WHEN event_id % 10 = 0 THEN 'delete'
              WHEN event_id % 2 = 0 THEN 'insert' ELSE 'update' END AS op,
         'conv-' || CAST(user_id AS VARCHAR) AS conv_id,
         CAST(event_id % 25 AS INTEGER) AS turn_idx,
         CASE WHEN event_id % 10 = 0 THEN NULL
              ELSE 'payload-' || CAST(event_id % 500 AS VARCHAR) END AS text
  FROM events
), w AS (
  SELECT *, row_number() OVER (PARTITION BY conv_id, turn_idx
                               ORDER BY ts DESC, lsn DESC) AS rn
  FROM c
), final AS (
  SELECT conv_id, turn_idx, text FROM w WHERE rn = 1 AND op <> 'delete'
), g AS (
  SELECT conv_id, turn_idx,
         COUNT(*) OVER (PARTITION BY text) AS grp_size
  FROM final
)
SELECT conv_id, CAST(turn_idx AS INTEGER) AS turn_idx,
       CAST(grp_size AS BIGINT) AS grp_size
FROM g WHERE grp_size >= 2
"""


def cdc_point_lookup(sf_dir: str):
    """Keyed point lookup over the CDC lake (the HBase/OTS keyed-range
    read of SURVEY §2A row 3): replay the derived change log into a lake,
    then fetch three conversations via `read_lake(conv_ids=...)` — the
    plan is pruned to the ranges whose hash routing can hold those keys
    (manifest-only; untouched ranges are never opened), and the result is
    exactly the LWW-final rows of those conversations. At 100 TB this is
    the difference between reading 3 ranges and reading the lake."""
    import shutil

    from datax_ray.pipelines.replay import ReplayConfig, replay
    from datax_ray.sinks.lake import LakeDatasource, read_lake

    keys = ["conv-1", "conv-7", "conv-13"]
    work = f"/tmp/datax_cdc_lookup/{os.path.basename(os.path.normpath(sf_dir))}"
    spe = _derive_changes(sf_dir, work)
    replay(
        ReplayConfig(
            changes_dir=f"{work}/changes",
            lake_dir=f"{work}/lake",
            num_partitions=16,
            segments_per_epoch=spe,
        )
    )
    src = LakeDatasource(f"{work}/lake", conv_ids=keys)
    total = LakeDatasource(f"{work}/lake")
    assert len(src._parts) < len(total._parts) or len(total._parts) <= len(keys), (
        "point lookup failed to prune the range plan"
    )
    return read_lake(f"{work}/lake", conv_ids=keys).to_pandas()


CDC_LOOKUP_SQL = CDC_REPLAY_SQL.replace(
    "WHERE rn = 1 AND op <> 'delete'",
    "WHERE rn = 1 AND op <> 'delete' "
    "AND conv_id IN ('conv-1', 'conv-7', 'conv-13')",
)


def cdc_time_slice(sf_dir: str):
    """Time-slice read over the CDC lake (data skipping): replay the
    derived change log, then `read_lake(min_ts=...)` — final-state rows
    whose winning event-time is on/after the cutoff, with whole base/
    fragment files pruned from the plan via the manifest's per-file ts
    min/max stats (no storage reads for files wholly below the cutoff;
    safe one-sided pruning — an all-older file can neither produce nor
    suppress an in-slice LWW winner). The incremental-consumer read of a
    100 TB lake: epochs are time-correlated, so 'what changed since T'
    opens only recent files."""
    import shutil

    from datax_ray.pipelines.replay import ReplayConfig, replay
    from datax_ray.sinks.lake import read_lake

    cutoff = "2024-01-16 00:00:00"
    work = f"/tmp/datax_cdc_slice/{os.path.basename(os.path.normpath(sf_dir))}"
    spe = _derive_changes(sf_dir, work)
    replay(
        ReplayConfig(
            changes_dir=f"{work}/changes",
            lake_dir=f"{work}/lake",
            num_partitions=16,
            segments_per_epoch=spe,
        )
    )
    return read_lake(f"{work}/lake", min_ts=cutoff).to_pandas()


CDC_SLICE_SQL = CDC_REPLAY_SQL.replace(
    "WHERE rn = 1 AND op <> 'delete'",
    "WHERE rn = 1 AND op <> 'delete' "
    "AND ts >= TIMESTAMP '2024-01-16 00:00:00'",
)


def cdc_replicate_lake(sf_dir: str):
    """Lake→lake incremental replication (pipelines/replicate.py): replay
    the derived change log into a source lake (4 epochs), then replicate
    it into a destination lake with a DIFFERENT layout (4 partitions vs
    16) via the change feed — one dst epoch per src epoch, exactly-once.
    The replica's final state must equal the source's, which equals the
    LWW oracle — so the driver checks the whole chain: derive → replay →
    feed → convert → re-replay."""
    import shutil

    from datax_ray.pipelines.replay import ReplayConfig, replay
    from datax_ray.pipelines.replicate import replicate
    from datax_ray.sinks.lake import final_table

    work = f"/tmp/datax_cdc_replicate/{os.path.basename(os.path.normpath(sf_dir))}"
    spe = _derive_changes(sf_dir, work)
    replay(
        ReplayConfig(
            changes_dir=f"{work}/changes",
            lake_dir=f"{work}/src",
            num_partitions=16,
            segments_per_epoch=spe,
        )
    )
    replicate(f"{work}/src", f"{work}/dst", num_partitions=4)
    return final_table(f"{work}/dst")


def cdc_purge_forget(sf_dir: str):
    """Right-to-be-forgotten, driver-verified (pipelines/purge.py): replay
    the derived change log into a lake, then HARD-purge every conversation
    of users with user_id % 41 == 0 — tombstone fragments for the live
    rows (manifest-pruned range plan, O(purged keys)), force-compaction of
    the affected ranges, and a history vacuum so the payload bytes are
    physically gone. Returns the final lake, which must equal the LWW
    oracle minus the purged conversations."""
    import shutil

    from datax_ray.pipelines.purge import purge
    from datax_ray.pipelines.replay import ReplayConfig, replay
    from datax_ray.sinks.lake import final_table

    work = f"/tmp/datax_cdc_purge/{os.path.basename(os.path.normpath(sf_dir))}"
    spe = _derive_changes(sf_dir, work)
    replay(
        ReplayConfig(
            changes_dir=f"{work}/changes",
            lake_dir=f"{work}/lake",
            num_partitions=16,
            segments_per_epoch=spe,
        )
    )

    # The forget-request keyset: distinct matching users (per-batch unique
    # combiner — the driver only ever sees the already-small keyset, the
    # realistic shape of a GDPR request list).
    def forget_keys(t: pa.Table) -> pa.Table:
        uid = pc.unique(t["user_id"])
        hit = pa.array(uid.to_numpy(zero_copy_only=False) % 41 == 0)
        return pa.table({"conv_id": pc.binary_join_element_wise(
            "conv-", pc.cast(uid.filter(hit), pa.string()), ""
        )})

    keys = sorted(
        {
            r["conv_id"]
            for r in _read(sf_dir, "events", columns=["user_id"])
            .map_batches(forget_keys, batch_format="pyarrow", zero_copy_batch=True)
            .take_all()
        }
    )
    purge(f"{work}/lake", keys, hard=True)
    return final_table(f"{work}/lake")


CDC_PURGE_SQL = CDC_REPLAY_SQL.replace(
    "         CASE WHEN event_id % 10 = 0 THEN NULL ELSE '' END AS tool\n",
    "         CASE WHEN event_id % 10 = 0 THEN NULL ELSE '' END AS tool,\n"
    "         user_id\n",
).replace(
    "WHERE rn = 1 AND op <> 'delete'",
    "WHERE rn = 1 AND op <> 'delete' AND user_id % 41 <> 0",
)


def cdc_repartition_migrate(sf_dir: str):
    """Online layout migration mid-stream, driver-verified
    (pipelines/repartition.py): replay the FIRST HALF of the derived
    change log into a 16-partition unsalted lake, migrate it to 48
    partitions + turn-salt 8 in one atomic epoch (rows re-routed through
    storage, tombstones included), then replay the SECOND HALF — the new
    events route under the NEW layout and must LWW-meet the migrated
    rows. Final state must equal the plain LWW oracle: a correct
    migration is invisible to the data."""
    import glob as _glob
    import shutil

    from datax_ray.pipelines.repartition import repartition_lake
    from datax_ray.pipelines.replay import ReplayConfig, replay
    from datax_ray.sinks.lake import final_table
    from datax_ray.state.manifest import Manifest

    work = f"/tmp/datax_cdc_repart/{os.path.basename(os.path.normpath(sf_dir))}"
    spe = _derive_changes(sf_dir, work)

    segs = sorted(_glob.glob(f"{work}/changes/seg-*.parquet"))
    os.makedirs(f"{work}/changes_half", exist_ok=True)
    for s in segs[: max(1, len(segs) // 2)]:
        os.link(s, os.path.join(f"{work}/changes_half", os.path.basename(s)))

    cfg = dict(num_partitions=16, segments_per_epoch=spe)
    replay(ReplayConfig(
        changes_dir=f"{work}/changes_half", lake_dir=f"{work}/lake", **cfg
    ))
    repartition_lake(f"{work}/lake", 48, salt_turn_width=8)
    replay(ReplayConfig(
        changes_dir=f"{work}/changes", lake_dir=f"{work}/lake", **cfg
    ))
    assert Manifest(f"{work}/lake").committed_layout()["num_partitions"] == 48
    return final_table(f"{work}/lake")


def cdc_text_search(sf_dir: str):
    """Secondary-index probe, driver-verified (pipelines/index.py):
    replay the derived change log into a lake, refresh the incremental
    inverted text index (per-range postings, manifest-fingerprint skip),
    and search it for a deterministic spread sample of payload tokens.
    The index derives from the LIVE merge-read state, so hits are exactly
    the LWW winners whose text is in the term set — which is what the
    oracle (LWW SQL filtered to the same sample) asserts. Rows that LOST
    the LWW race for their key must NOT appear even though their term is
    probed: the index cannot resurrect overwritten data."""
    import shutil

    from datax_ray.pipelines.index import refresh_index, search_index
    from datax_ray.pipelines.replay import ReplayConfig, replay

    work = f"/tmp/datax_cdc_search/{os.path.basename(os.path.normpath(sf_dir))}"
    spe = _derive_changes(sf_dir, work)
    replay(
        ReplayConfig(
            changes_dir=f"{work}/changes",
            lake_dir=f"{work}/lake",
            num_partitions=16,
            segments_per_epoch=spe,
        )
    )
    refresh_index(f"{work}/lake", f"{work}/idx")

    # The query-term set: payload tokens of a deterministic event sample
    # (every 997th id — a search term list is small BY NATURE; computing
    # it is a pruned column scan + tiny take).
    def sample_terms(t: pa.Table) -> pa.Table:
        eid = t["event_id"]
        import numpy as np_

        hit = pa.array(
            eid.to_numpy(zero_copy_only=False).astype(np_.int64) % 997 == 0
        )
        return pa.table({
            "term": pc.binary_join_element_wise(
                "payload-", pc.cast(eid.filter(hit), pa.string()), ""
            )
        })

    terms = sorted({
        r["term"]
        for r in _read(sf_dir, "events", columns=["event_id"])
        .map_batches(sample_terms, batch_format="pyarrow", zero_copy_batch=True)
        .take_all()
    })
    return search_index(f"{work}/idx", terms)


CDC_SEARCH_SQL = CDC_REPLAY_SQL.replace(
    "SELECT conv_id, turn_idx, role, text, tool, ts FROM w "
    "WHERE rn = 1 AND op <> 'delete'",
    "SELECT text AS term, conv_id, turn_idx FROM w "
    "WHERE rn = 1 AND op <> 'delete' AND lsn % 997 = 0",
)


def cdc_neardup_texts(sf_dir: str):
    """Incremental NEAR-duplicate index over the CDC lake, driver-verified
    (pipelines/dedupscan.py near-dup family): derive a change log whose
    texts are 5-word sliding windows over a folded id space (adjacent ids
    share 4 of 5 words — deterministic near-duplicates), replay it,
    refresh the per-range shingle-postings index (manifest-fingerprint
    skip), and emit every live pair with word-3-gram Jaccard >= 0.45 as
    integer milli-scores. EXACT AllPairs plan over the persisted postings
    — the oracle computes the identical shingle join over the LWW-final
    state. LSH remains the adversarial-df path; this index's contract is
    exactness (functions/dedup.ngram_pairs_exact's contract, made
    incremental)."""
    from datax_ray.pipelines.dedupscan import (
        near_duplicate_pairs,
        refresh_neardup_index,
    )
    from datax_ray.pipelines.replay import ReplayConfig, replay

    work = f"/tmp/datax_cdc_neardup/{os.path.basename(os.path.normpath(sf_dir))}"
    spe = _derive_changes(sf_dir, work, text_mod=_NEARDUP_MOD, text_words=5)
    replay(
        ReplayConfig(
            changes_dir=f"{work}/changes",
            lake_dir=f"{work}/lake",
            num_partitions=16,
            segments_per_epoch=spe,
        )
    )
    refresh_neardup_index(f"{work}/lake", f"{work}/nearidx")
    return near_duplicate_pairs(f"{work}/nearidx", threshold=0.45)


# fixed id-fold for the near-dup derivation: the oracle string is static,
# so the knob cannot scale with sf; 5000 keeps pair volume bounded at the
# driver's sf0.01 while still planting dense duplicate neighborhoods
_NEARDUP_MOD = 5000


def _neardup_sql(mod: int) -> str:
    return f"""
WITH c AS (
  SELECT event_id AS lsn, ts,
         CASE WHEN event_id % 10 = 0 THEN 'delete'
              WHEN event_id % 2 = 0 THEN 'insert' ELSE 'update' END AS op,
         'conv-' || CAST(user_id AS VARCHAR) AS conv_id,
         CAST(event_id % 25 AS INTEGER) AS turn_idx,
         event_id % {mod} AS m
  FROM events
), w AS (
  SELECT *, row_number() OVER (PARTITION BY conv_id, turn_idx
                               ORDER BY ts DESC, lsn DESC) AS rn
  FROM c
), final AS (
  SELECT conv_id, turn_idx, m FROM w WHERE rn = 1 AND op <> 'delete'
), sh AS (
  SELECT conv_id, turn_idx,
         'w' || (m + i) || ' w' || (m + i + 1) || ' w' || (m + i + 2) AS g
  FROM final, UNNEST(range(3)) AS t(i)
), inter AS (
  SELECT a.conv_id AS conv_a, a.turn_idx AS turn_a,
         b.conv_id AS conv_b, b.turn_idx AS turn_b, COUNT(*) AS c
  FROM sh a JOIN sh b
    ON a.g = b.g AND (a.conv_id, a.turn_idx) < (b.conv_id, b.turn_idx)
  GROUP BY 1, 2, 3, 4
)
SELECT conv_a, CAST(turn_a AS INTEGER) AS turn_a,
       conv_b, CAST(turn_b AS INTEGER) AS turn_b,
       CAST(1000 * c // (6 - c) AS BIGINT) AS jacc_milli
FROM inter WHERE 1000 * c // (6 - c) >= 450
"""


def cdc_feed_additive_stats(sf_dir: str):
    """Additive CDC consumption, driver-verified: replay the derived
    change log, then compute per-conversation turn counts by folding the
    PREIMAGE feed additively (+1 insert, -1 delete; updates cancel) —
    no LWW merge, no lake read. The oracle is the LWW SQL grouped count,
    so this independently proves the preimage feed's additive contract:
    any miscounted insert/update/delete classification breaks the hash."""
    import shutil

    import pandas as pd

    from datax_ray.functions.relational import partial_agg
    from datax_ray.pipelines.feed import read_change_feed_preimages
    from datax_ray.pipelines.replay import ReplayConfig, replay

    work = f"/tmp/datax_cdc_addfeed/{os.path.basename(os.path.normpath(sf_dir))}"
    spe = _derive_changes(sf_dir, work)
    replay(
        ReplayConfig(
            changes_dir=f"{work}/changes",
            lake_dir=f"{work}/lake",
            num_partitions=16,
            segments_per_epoch=spe,
        )
    )

    feed = read_change_feed_preimages(f"{work}/lake", -1)

    def deltas(t: pa.Table) -> pa.Table:
        ct = t["_change_type"]
        d = pc.fill_null(
            pc.subtract(
                pc.cast(pc.equal(ct, "insert"), pa.int64()),
                pc.cast(pc.equal(ct, "delete"), pa.int64()),
            ),
            0,
        )
        out = pa.table({"conv_id": t["conv_id"], "delta": d})
        return out.filter(pc.not_equal(out["delta"], 0))

    folded = partial_agg(
        feed.map_batches(deltas, batch_format="pyarrow", zero_copy_batch=True),
        keys=["conv_id"],
        sums={"delta": "n_turns"},
    )

    def live_only(t: pa.Table) -> pa.Table:
        t = t.set_column(
            t.column_names.index("n_turns"), "n_turns",
            pc.cast(t["n_turns"], pa.int64()),
        )
        return t.filter(pc.greater(t["n_turns"], 0))

    return folded.map_batches(
        live_only, batch_format="pyarrow", zero_copy_batch=True
    )


CDC_ADDITIVE_SQL = CDC_REPLAY_SQL.replace(
    "SELECT conv_id, turn_idx, role, text, tool, ts FROM w "
    "WHERE rn = 1 AND op <> 'delete'",
    "SELECT conv_id, COUNT(*) AS n_turns FROM w "
    "WHERE rn = 1 AND op <> 'delete' GROUP BY conv_id",
)


def cdc_change_feed_rebuild(sf_dir: str):
    """Change-data-feed completeness, driver-verified: replay the derived
    change log into a lake, then reconstruct the final state using ONLY
    the change feed (pipelines/feed.py — the fragment files each epoch's
    manifest first referenced, read as a Dataset and LWW-folded per
    key-hash bucket). If the feed dropped or duplicated any change, the
    fold diverges from the row_number() oracle."""
    import shutil

    from datax_ray.pipelines.feed import read_change_feed
    from datax_ray.pipelines.replay import ReplayConfig, replay
    from datax_ray.schemas import DELETED_COL, INTERNAL_COLS

    work = f"/tmp/datax_cdc_feed/{os.path.basename(os.path.normpath(sf_dir))}"
    spe = _derive_changes(sf_dir, work)
    replay(
        ReplayConfig(
            changes_dir=f"{work}/changes",
            lake_dir=f"{work}/lake",
            num_partitions=16,
            segments_per_epoch=spe,
        )
    )
    feed = read_change_feed(f"{work}/lake", -1)
    # bucket count scales with input size (feed rows <= derived events)
    nb = _buckets_for(sf_dir, "events")

    def fold(g: pa.Table) -> pa.Table:
        state = lww_reduce(
            g.drop_columns(["_epoch", "_kb"]),
            key_cols=("conv_id", "turn_idx"),
            order_cols=("ts", "_lsn"),
        )
        live = state.filter(pc.fill_null(pc.invert(state[DELETED_COL]), True))
        return live.drop_columns(list(INTERNAL_COLS))

    def add_bucket(t: pa.Table) -> pa.Table:
        import pandas as pd_

        h = pd_.util.hash_array(
            t["conv_id"].to_pandas().to_numpy(dtype=object), categorize=False
        )
        return t.append_column("_kb", pa.array((h % nb).astype("int32")))

    return (
        feed.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("_kb")
        .map_groups(fold, batch_format="pyarrow")
        .to_pandas()
    )


CDC_FEED_SQL = CDC_REPLAY_SQL


def cdc_sql_mirror(sf_dir: str):
    """Full downstream-replication loop, driver-verified: derive → replay
    into the lake → exactly-once incremental mirror into a SQL table
    (pipelines/mirror.py; sqlite stands in for the JDBC endpoint) →
    parallel range-split read BACK through the JDBC-shaped source
    (sqlsource.read_sql_table over rowid). The mirrored table must equal
    the LWW-final lake, so the oracle is the same row_number() fold."""
    import functools
    import shutil
    import sqlite3

    import pandas as pd

    from datax_ray.pipelines.mirror import mirror_to_sql
    from datax_ray.pipelines.replay import ReplayConfig, replay
    from datax_ray.sources.sqlsource import read_sql_table

    work = f"/tmp/datax_cdc_mirror/{os.path.basename(os.path.normpath(sf_dir))}"
    spe = _derive_changes(sf_dir, work)
    os.makedirs(work, exist_ok=True)
    replay(
        ReplayConfig(
            changes_dir=f"{work}/changes",
            lake_dir=f"{work}/lake",
            num_partitions=16,
            segments_per_epoch=spe,
        )
    )
    db = f"{work}/mirror.db"
    factory = functools.partial(sqlite3.connect, db, 30.0, check_same_thread=False)
    mirror_to_sql(f"{work}/lake", factory, "lake_mirror")
    out = read_sql_table(
        factory,
        "lake_mirror",
        ["conv_id", "turn_idx", "role", "text", "tool", "ts"],
        split_pk="rowid",
        num_splits=8,
    ).to_pandas()
    out["ts"] = pd.to_datetime(out["ts"])
    out["turn_idx"] = out["turn_idx"].astype("int32")
    return out


def cdc_kv_mirror(sf_dir: str):
    """DataX's hbase/otswriter as an EXTERNAL store, driver-verified:
    derive → replay → change-feed consumer → per-record conditional
    versioned Put/Delete into a keyed DB-API store (sinks/kvsink.py;
    sqlite plays the KV endpoint) → read the store's LIVE rows back.
    Must equal the same LWW fold as the lake itself — proving the
    row-level op stream + tombstones reconstruct the table in an
    external keyed system (the mirror's range-swap cousin)."""
    import functools
    import shutil
    import sqlite3

    from datax_ray.pipelines.replay import ReplayConfig, replay
    from datax_ray.sinks.kvsink import mirror_to_kv, read_kv_table

    work = f"/tmp/datax_cdc_kv/{os.path.basename(os.path.normpath(sf_dir))}"
    shutil.rmtree(work, ignore_errors=True)
    spe = _derive_changes(sf_dir, work)
    replay(
        ReplayConfig(
            changes_dir=f"{work}/changes",
            lake_dir=f"{work}/lake",
            num_partitions=16,
            segments_per_epoch=spe,
        )
    )
    db = f"{work}/kv.db"
    factory = functools.partial(sqlite3.connect, db, 30.0,
                                check_same_thread=False)
    mirror_to_kv(f"{work}/lake", factory, "kv_store")
    return read_kv_table(factory, "kv_store", ["role", "text", "tool"])


def cdc_objstore_replay(sf_dir: str):
    """The round-4 object-store lake, driver-verified: the standard
    derive → replay → compact pipeline run on an `obj://` lake, where the
    storage layer exposes ONLY the eight-op object contract (state/fs.py:
    atomic put, conditional create, list/delete/copy — no rename, no
    link). The final state must hash-equal the same LWW oracle as the
    POSIX lake — the S3-deployability proof as a catalog row."""
    import shutil

    from datax_ray.pipelines.replay import ReplayConfig, replay
    from datax_ray.sinks.lake import final_table

    work = f"/tmp/datax_cdc_obj/{os.path.basename(os.path.normpath(sf_dir))}"
    shutil.rmtree(work, ignore_errors=True)
    spe = _derive_changes(sf_dir, work)
    replay(ReplayConfig(
        changes_dir=f"{work}/changes",
        lake_dir=f"obj://{work}/lake",
        num_partitions=16,
        segments_per_epoch=spe,
        compact_every=2,
    ))
    return final_table(f"obj://{work}/lake")


CDC_MIRROR_SQL = CDC_REPLAY_SQL


def cdc_replay_dirty_routed(sf_dir: str):
    """The dirty-record/dead-letter path, driver-verified: the derived
    change log carries deterministic corruption (event_id % 97 == 3 ⇒
    turn_idx = -1, which fails validation and routes to the dead-letter
    sink), so the final lake must equal the LWW fold of the CLEAN subset —
    which the oracle expresses with one extra WHERE clause."""
    import shutil

    from datax_ray.pipelines.replay import ReplayConfig, replay
    from datax_ray.sinks.lake import final_table

    work = f"/tmp/datax_cdc_dirty/{os.path.basename(os.path.normpath(sf_dir))}"
    spe = _derive_changes(sf_dir, work, corrupt_mod=97)
    replay(
        ReplayConfig(
            changes_dir=f"{work}/changes",
            lake_dir=f"{work}/lake",
            num_partitions=16,
            segments_per_epoch=spe,
        )
    )
    return final_table(f"{work}/lake")


CDC_DIRTY_SQL = """
WITH c AS (
  SELECT event_id AS lsn, ts,
         CASE WHEN event_id % 10 = 0 THEN 'delete'
              WHEN event_id % 2 = 0 THEN 'insert' ELSE 'update' END AS op,
         'conv-' || CAST(user_id AS VARCHAR) AS conv_id,
         CAST(event_id % 25 AS INTEGER) AS turn_idx,
         CASE WHEN event_id % 10 = 0 THEN NULL
              WHEN event_id % 2 = 0 THEN 'user' ELSE 'assistant' END AS role,
         CASE WHEN event_id % 10 = 0 THEN NULL
              ELSE 'payload-' || CAST(event_id AS VARCHAR) END AS text,
         CASE WHEN event_id % 10 = 0 THEN NULL ELSE '' END AS tool
  FROM events
  WHERE event_id % 97 <> 3  -- the corrupted (dead-lettered) events
), w AS (
  SELECT *, row_number() OVER (PARTITION BY conv_id, turn_idx
                               ORDER BY ts DESC, lsn DESC) AS rn
  FROM c
)
SELECT conv_id, turn_idx, role, text, tool, ts FROM w WHERE rn = 1 AND op <> 'delete'
"""


def cdc_redrive_repair(sf_dir: str):
    """The dead-letter REDRIVE path, driver-verified end to end: replay the
    deterministically-corrupted change log (event_id % 97 == 3 ⇒
    turn_idx = -1 routes to the dead-letter sink), then redrive the dirty
    rows through pipelines/redrive.py with a udf fix that restores the
    true turn (lsn % 25 — the derivation rule). Because redriven rows keep
    their original (ts, lsn), the repaired lake must equal the LWW fold of
    the stream AS IF IT HAD NEVER BEEN CORRUPTED — i.e. the same oracle as
    cdc_replay_final (CDC_REPLAY_SQL), which is the strongest possible
    check of the redrive's exactly-once + LWW-placement semantics."""
    import shutil

    from datax_ray.pipelines.redrive import redrive
    from datax_ray.pipelines.replay import ReplayConfig, replay
    from datax_ray.sinks.lake import final_table

    work = f"/tmp/datax_cdc_redrive/{os.path.basename(os.path.normpath(sf_dir))}"
    spe = _derive_changes(sf_dir, work, corrupt_mod=97)
    cfg = ReplayConfig(
        changes_dir=f"{work}/changes",
        lake_dir=f"{work}/lake",
        num_partitions=16,
        segments_per_epoch=spe,
    )
    replay(cfg)

    def fix_turn(t: pa.Table) -> pa.Table:
        lsn = t["lsn"].to_numpy()
        turn = t["turn_idx"].to_numpy(zero_copy_only=False)
        repaired = np.where(turn < 0, (lsn % 25).astype(np.int32), turn)
        return t.set_column(
            t.schema.get_field_index("turn_idx"),
            "turn_idx",
            pa.array(repaired, pa.int32()),
        )

    redrive(cfg, fix_transformers=[{"name": "udf", "fn": fix_turn}])
    return final_table(f"{work}/lake")


def cdc_replay_expectations(sf_dir: str):
    """Ingest expectations through the full engine, driver-verified: replay
    the derived change log under two CHECK constraints — turn_idx between
    0 and 19, text not matching /7$/ — so violating insert/update rows
    dead-letter (deletes are exempt by the patch contract: they carry no
    payload) and the final lake equals the LWW fold of the conforming
    subset, which the oracle expresses as one WHERE clause. Shares the
    evaluator with the sequential oracle (validation.compile_expectations)."""
    import shutil

    from datax_ray.pipelines.replay import ReplayConfig, replay
    from datax_ray.sinks.lake import final_table

    work = f"/tmp/datax_cdc_expect/{os.path.basename(os.path.normpath(sf_dir))}"
    spe = _derive_changes(sf_dir, work)
    replay(
        ReplayConfig(
            changes_dir=f"{work}/changes",
            lake_dir=f"{work}/lake",
            num_partitions=16,
            segments_per_epoch=spe,
            expectations=[
                {"column": "turn_idx", "op": "between", "lo": 0, "hi": 19},
                {"column": "text", "op": "not_matches", "pattern": "7$"},
            ],
        )
    )
    return final_table(f"{work}/lake")


CDC_EXPECT_SQL = """
WITH c AS (
  SELECT event_id AS lsn, ts,
         CASE WHEN event_id % 10 = 0 THEN 'delete'
              WHEN event_id % 2 = 0 THEN 'insert' ELSE 'update' END AS op,
         'conv-' || CAST(user_id AS VARCHAR) AS conv_id,
         CAST(event_id % 25 AS INTEGER) AS turn_idx,
         CASE WHEN event_id % 10 = 0 THEN NULL
              WHEN event_id % 2 = 0 THEN 'user' ELSE 'assistant' END AS role,
         CASE WHEN event_id % 10 = 0 THEN NULL
              ELSE 'payload-' || CAST(event_id AS VARCHAR) END AS text,
         CASE WHEN event_id % 10 = 0 THEN NULL ELSE '' END AS tool
  FROM events
), conforming AS (
  -- expectations apply to insert/update only (delete-exempt); value rules
  -- pass on NULL, spelled out explicitly (x IS NULL OR <rule>) so a
  -- null-valued insert/update is kept, matching compile_expectations
  SELECT * FROM c
  WHERE op = 'delete'
     OR ((turn_idx IS NULL OR turn_idx BETWEEN 0 AND 19)
         AND (text IS NULL OR NOT regexp_matches(text, '7$')))
), w AS (
  SELECT *, row_number() OVER (PARTITION BY conv_id, turn_idx
                               ORDER BY ts DESC, lsn DESC) AS rn
  FROM conforming
)
SELECT conv_id, turn_idx, role, text, tool, ts FROM w WHERE rn = 1 AND op <> 'delete'
"""


def cdc_replay_rename(sf_dir: str):
    """RENAME-COLUMN schema evolution — the fourth DDL verb (add / widen /
    drop / rename): every event with event_id % 500 == 499 becomes an
    op='ddl' rename_column("role" -> "speaker") event. The source keeps
    emitting "role" (it doesn't know about lake-side renames): the rename
    map rides on the lake schema's metadata, so the Normalizer keeps
    resolving incoming events and merge-read remaps pre-rename fragments —
    no data rewrite, Delta-column-mapping style. The oracle aliases the
    column."""
    from datax_ray.pipelines.replay import ReplayConfig, replay
    from datax_ray.sinks.lake import final_table

    work = f"/tmp/datax_cdc_rename/{os.path.basename(os.path.normpath(sf_dir))}"
    spe = _derive_changes(sf_dir, work, rename_mod=500)
    replay(
        ReplayConfig(
            changes_dir=f"{work}/changes",
            lake_dir=f"{work}/lake",
            num_partitions=16,
            segments_per_epoch=spe,
        )
    )
    return final_table(f"{work}/lake")


CDC_RENAME_SQL = """
WITH c AS (
  SELECT event_id AS lsn, ts,
         CASE WHEN event_id % 10 = 0 THEN 'delete'
              WHEN event_id % 2 = 0 THEN 'insert' ELSE 'update' END AS op,
         'conv-' || CAST(user_id AS VARCHAR) AS conv_id,
         CAST(event_id % 25 AS INTEGER) AS turn_idx,
         CASE WHEN event_id % 10 = 0 THEN NULL
              WHEN event_id % 2 = 0 THEN 'user' ELSE 'assistant' END AS role,
         CASE WHEN event_id % 10 = 0 THEN NULL
              ELSE 'payload-' || CAST(event_id AS VARCHAR) END AS text,
         CASE WHEN event_id % 10 = 0 THEN NULL ELSE '' END AS tool
  FROM events
  WHERE event_id % 500 <> 499  -- the ddl events (schema-only, no row)
), w AS (
  SELECT *, row_number() OVER (PARTITION BY conv_id, turn_idx
                               ORDER BY ts DESC, lsn DESC) AS rn
  FROM c
)
SELECT conv_id, turn_idx, role AS speaker, text, tool, ts
FROM w WHERE rn = 1 AND op <> 'delete'
"""


def cdc_lake_constraints(sf_dir: str):
    """LAKE-LEVEL persisted CHECK constraints (Delta table constraints, vs
    cdc_replay_expectations' job-level rules): `alter_lake` commits the
    expectation spec into the manifest's properties BEFORE any ingest, and
    every subsequent replay — run here with NO job config — enforces it,
    dead-lettering violating insert/update rows. Same rules and oracle as
    the job-level query: the lake equals the LWW fold of the conforming
    subset; the difference under test is the persistence surface."""
    from datax_ray.pipelines.replay import ReplayConfig, alter_lake, replay
    from datax_ray.sinks.lake import final_table

    work = f"/tmp/datax_cdc_tblcon/{os.path.basename(os.path.normpath(sf_dir))}"
    spe = _derive_changes(sf_dir, work)
    alter_lake(
        f"{work}/lake",
        expectations=[
            {"column": "turn_idx", "op": "between", "lo": 0, "hi": 19},
            {"column": "text", "op": "not_matches", "pattern": "7$"},
        ],
    )
    replay(
        ReplayConfig(
            changes_dir=f"{work}/changes",
            lake_dir=f"{work}/lake",
            num_partitions=16,
            segments_per_epoch=spe,
        )
    )
    return final_table(f"{work}/lake")


def cdc_replay_ddl(sf_dir: str):
    """Schema evolution through the full engine, driver-verified: every
    event with event_id % 500 == 499 becomes an op='ddl'
    add_column("sentiment", string) event. scan_ddl folds it into the
    SchemaTracker at the epoch boundary, later epochs write the widened
    schema, and the merged final lake carries the new (all-null) column —
    which the oracle expresses by excluding ddl events from the LWW fold
    and appending CAST(NULL AS VARCHAR) AS sentiment."""
    import shutil

    from datax_ray.pipelines.replay import ReplayConfig, replay
    from datax_ray.sinks.lake import final_table

    work = f"/tmp/datax_cdc_ddl/{os.path.basename(os.path.normpath(sf_dir))}"
    spe = _derive_changes(sf_dir, work, ddl_mod=500)
    replay(
        ReplayConfig(
            changes_dir=f"{work}/changes",
            lake_dir=f"{work}/lake",
            num_partitions=16,
            segments_per_epoch=spe,
        )
    )
    return final_table(f"{work}/lake")


CDC_DDL_SQL = """
WITH c AS (
  SELECT event_id AS lsn, ts,
         CASE WHEN event_id % 10 = 0 THEN 'delete'
              WHEN event_id % 2 = 0 THEN 'insert' ELSE 'update' END AS op,
         'conv-' || CAST(user_id AS VARCHAR) AS conv_id,
         CAST(event_id % 25 AS INTEGER) AS turn_idx,
         CASE WHEN event_id % 10 = 0 THEN NULL
              WHEN event_id % 2 = 0 THEN 'user' ELSE 'assistant' END AS role,
         CASE WHEN event_id % 10 = 0 THEN NULL
              ELSE 'payload-' || CAST(event_id AS VARCHAR) END AS text,
         CASE WHEN event_id % 10 = 0 THEN NULL ELSE '' END AS tool
  FROM events
  WHERE event_id % 500 <> 499  -- the ddl events (schema-only, no row)
), w AS (
  SELECT *, row_number() OVER (PARTITION BY conv_id, turn_idx
                               ORDER BY ts DESC, lsn DESC) AS rn
  FROM c
)
SELECT conv_id, turn_idx, role, text, tool,
       CAST(NULL AS VARCHAR) AS sentiment, ts
FROM w WHERE rn = 1 AND op <> 'delete'
"""


def cdc_replay_drop(sf_dir: str):
    """DROP-COLUMN schema evolution through the full engine — the third
    DDL verb next to add_column (cdc_replay_ddl) and widen
    (cdc_replay_widen): every event with event_id % 500 == 499 becomes an
    op='ddl' drop_column("tool") event. The SchemaTracker removes the
    field at the epoch boundary (protected keying/ordering columns are
    rejected), later epochs stop writing it, and old fragments shed it at
    merge-read because unify projects the TARGET schema — the oracle
    simply omits the column from the LWW fold."""
    from datax_ray.pipelines.replay import ReplayConfig, replay
    from datax_ray.sinks.lake import final_table

    work = f"/tmp/datax_cdc_drop/{os.path.basename(os.path.normpath(sf_dir))}"
    spe = _derive_changes(sf_dir, work, drop_mod=500)
    replay(
        ReplayConfig(
            changes_dir=f"{work}/changes",
            lake_dir=f"{work}/lake",
            num_partitions=16,
            segments_per_epoch=spe,
        )
    )
    return final_table(f"{work}/lake")


CDC_DROP_SQL = """
WITH c AS (
  SELECT event_id AS lsn, ts,
         CASE WHEN event_id % 10 = 0 THEN 'delete'
              WHEN event_id % 2 = 0 THEN 'insert' ELSE 'update' END AS op,
         'conv-' || CAST(user_id AS VARCHAR) AS conv_id,
         CAST(event_id % 25 AS INTEGER) AS turn_idx,
         CASE WHEN event_id % 10 = 0 THEN NULL
              WHEN event_id % 2 = 0 THEN 'user' ELSE 'assistant' END AS role,
         CASE WHEN event_id % 10 = 0 THEN NULL
              ELSE 'payload-' || CAST(event_id AS VARCHAR) END AS text
  FROM events
  WHERE event_id % 500 <> 499  -- the ddl events (schema-only, no row)
), w AS (
  SELECT *, row_number() OVER (PARTITION BY conv_id, turn_idx
                               ORDER BY ts DESC, lsn DESC) AS rn
  FROM c
)
SELECT conv_id, turn_idx, role, text, ts
FROM w WHERE rn = 1 AND op <> 'delete'
"""


def cdc_mv_conv_stats(sf_dir: str):
    """Incremental materialized view through the full engine: derive +
    replay the change log, then refresh a per-conversation stats MV
    (pipelines/mv.py — only ranges whose committed file set changed are
    recomputed; here that is all of them on the first refresh) and return
    the folded MV. The oracle aggregates the same LWW-final lake the
    cdc_replay_final oracle derives."""
    import shutil

    from datax_ray.pipelines.mv import read_mv, refresh_mv
    from datax_ray.pipelines.replay import ReplayConfig, replay

    work = f"/tmp/datax_cdc_mv/{os.path.basename(os.path.normpath(sf_dir))}"
    spe = _derive_changes(sf_dir, work)
    replay(
        ReplayConfig(
            changes_dir=f"{work}/changes",
            lake_dir=f"{work}/lake",
            num_partitions=16,
            segments_per_epoch=spe,
        )
    )
    refresh_mv(f"{work}/lake", f"{work}/mv")
    return read_mv(f"{work}/mv")


CDC_MV_SQL = """
WITH c AS (
  SELECT event_id AS lsn, ts,
         CASE WHEN event_id % 10 = 0 THEN 'delete'
              WHEN event_id % 2 = 0 THEN 'insert' ELSE 'update' END AS op,
         'conv-' || CAST(user_id AS VARCHAR) AS conv_id,
         CAST(event_id % 25 AS INTEGER) AS turn_idx
  FROM events
), w AS (
  SELECT *, row_number() OVER (PARTITION BY conv_id, turn_idx
                               ORDER BY ts DESC, lsn DESC) AS rn
  FROM c
), final AS (
  SELECT conv_id, turn_idx, ts FROM w WHERE rn = 1 AND op <> 'delete'
)
SELECT conv_id, COUNT(*) AS n_turns, MAX(ts) AS last_ts
FROM final GROUP BY conv_id
"""


def cdc_mv_additive_stats(sf_dir: str):
    """ADDITIVE MV maintenance through the full engine, driver-verified
    mid-stream (pipelines/mvadd.py): replay HALF the change log, fold the
    preimage feed into the view, replay the rest, fold ONLY the new
    epochs' feed — no lake range is ever re-read on the second refresh
    (O(changed rows), vs the recompute MV's O(changed ranges)). The final
    view must equal the whole-stream LWW oracle: per-conv live turn count
    and summed text length, with deletes/updates folded via exact
    +post/−pre deltas."""
    import glob as _glob

    from datax_ray.pipelines.mvadd import read_mv_additive, refresh_mv_additive
    from datax_ray.pipelines.replay import ReplayConfig, replay

    work = f"/tmp/datax_cdc_mvadd/{os.path.basename(os.path.normpath(sf_dir))}"
    spe = _derive_changes(sf_dir, work)

    segs = sorted(_glob.glob(f"{work}/changes/seg-*.parquet"))
    os.makedirs(f"{work}/changes_half", exist_ok=True)
    for s in segs[: max(1, len(segs) // 2)]:
        os.link(s, os.path.join(f"{work}/changes_half", os.path.basename(s)))

    cfg = dict(num_partitions=16, segments_per_epoch=spe)
    replay(ReplayConfig(
        changes_dir=f"{work}/changes_half", lake_dir=f"{work}/lake", **cfg
    ))
    refresh_mv_additive(f"{work}/lake", f"{work}/mvadd")
    replay(ReplayConfig(
        changes_dir=f"{work}/changes", lake_dir=f"{work}/lake", **cfg
    ))
    stats = refresh_mv_additive(f"{work}/lake", f"{work}/mvadd")
    assert stats["applied_from"] >= 0  # second refresh was incremental
    return read_mv_additive(f"{work}/mvadd")


def cdc_hist_mv(sf_dir: str):
    """ADDITIVE grouped-HISTOGRAM MV through the full engine, driver-
    verified mid-stream (pipelines/mvhist.py): replay HALF the change
    log, fold the preimage feed into per-(role, length-bucket) cells,
    replay the rest, fold ONLY the new epochs' feed — updates transfer
    mass across cells via exact −pre/+post deltas, no lake range re-read.
    The final cells must equal the whole-stream LWW oracle's histogram
    (CDC_HIST_MV_SQL)."""
    import glob as _glob

    from datax_ray.pipelines.mvhist import read_mv_hist, refresh_mv_hist
    from datax_ray.pipelines.replay import ReplayConfig, replay

    work = f"/tmp/datax_cdc_mvhist/{os.path.basename(os.path.normpath(sf_dir))}"
    spe = _derive_changes(sf_dir, work)

    segs = sorted(_glob.glob(f"{work}/changes/seg-*.parquet"))
    os.makedirs(f"{work}/changes_half", exist_ok=True)
    for s in segs[: max(1, len(segs) // 2)]:
        os.link(s, os.path.join(f"{work}/changes_half", os.path.basename(s)))

    cfg = dict(num_partitions=16, segments_per_epoch=spe)
    replay(ReplayConfig(
        changes_dir=f"{work}/changes_half", lake_dir=f"{work}/lake", **cfg
    ))
    refresh_mv_hist(f"{work}/lake", f"{work}/mvhist",
                    group_col="role", bucket_width=2)
    replay(ReplayConfig(
        changes_dir=f"{work}/changes", lake_dir=f"{work}/lake", **cfg
    ))
    stats = refresh_mv_hist(f"{work}/lake", f"{work}/mvhist")
    assert stats["applied_from"] >= 0  # second refresh was incremental
    return read_mv_hist(f"{work}/mvhist")


CDC_HIST_MV_SQL = """
WITH c AS (
  SELECT event_id AS lsn, ts,
         CASE WHEN event_id % 10 = 0 THEN 'delete'
              WHEN event_id % 2 = 0 THEN 'insert' ELSE 'update' END AS op,
         'conv-' || CAST(user_id AS VARCHAR) AS conv_id,
         CAST(event_id % 25 AS INTEGER) AS turn_idx,
         CASE WHEN event_id % 10 = 0 THEN NULL
              WHEN event_id % 2 = 0 THEN 'user' ELSE 'assistant' END AS role,
         CASE WHEN event_id % 10 = 0 THEN NULL
              ELSE 'payload-' || CAST(event_id AS VARCHAR) END AS text
  FROM events
), w AS (
  SELECT *, row_number() OVER (PARTITION BY conv_id, turn_idx
                               ORDER BY ts DESC, lsn DESC) AS rn
  FROM c
), final AS (
  SELECT role, COALESCE(length(text), 0) AS len
  FROM w WHERE rn = 1 AND op <> 'delete'
)
SELECT role AS group_val, CAST(len // 2 AS BIGINT) AS bucket,
       COUNT(*) AS n_rows, CAST(SUM(len) AS BIGINT) AS sum_len
FROM final GROUP BY 1, 2
"""


def cdc_cms_mv(sf_dir: str):
    """TURNSTILE Count-Min register MV through the full engine, driver-
    verified mid-stream (pipelines/cmsmv.py): replay HALF the change log,
    fold the preimage feed into the 4x256 register cells, replay the
    rest, fold ONLY the new epochs' feed — deletes subtract exactly, so
    the final cells must equal the CMS of the whole-stream LWW state,
    which DuckDB reproduces bit-for-bit from the fixed fmix32 chain
    (CDC_CMS_MV_SQL, the cms_registers_users HUGEINT recipe keyed on the
    conversation ordinal)."""
    import glob as _glob

    from datax_ray.pipelines.cmsmv import read_cms_mv, refresh_cms_mv
    from datax_ray.pipelines.replay import ReplayConfig, replay

    work = f"/tmp/datax_cdc_cmsmv/{os.path.basename(os.path.normpath(sf_dir))}"
    spe = _derive_changes(sf_dir, work)

    segs = sorted(_glob.glob(f"{work}/changes/seg-*.parquet"))
    os.makedirs(f"{work}/changes_half", exist_ok=True)
    for s in segs[: max(1, len(segs) // 2)]:
        os.link(s, os.path.join(f"{work}/changes_half", os.path.basename(s)))

    cfg = dict(num_partitions=16, segments_per_epoch=spe)
    replay(ReplayConfig(
        changes_dir=f"{work}/changes_half", lake_dir=f"{work}/lake", **cfg
    ))
    refresh_cms_mv(f"{work}/lake", f"{work}/cmsmv", depth=4, width=256)
    replay(ReplayConfig(
        changes_dir=f"{work}/changes", lake_dir=f"{work}/lake", **cfg
    ))
    stats = refresh_cms_mv(f"{work}/lake", f"{work}/cmsmv")
    assert stats["applied_from"] >= 0  # second refresh was incremental
    return read_cms_mv(f"{work}/cmsmv")


CDC_CMS_MV_SQL = """
WITH c AS (
  SELECT event_id AS lsn, ts,
         CASE WHEN event_id % 10 = 0 THEN 'delete'
              WHEN event_id % 2 = 0 THEN 'insert' ELSE 'update' END AS op,
         'conv-' || CAST(user_id AS VARCHAR) AS conv_id,
         CAST(event_id % 25 AS INTEGER) AS turn_idx,
         user_id
  FROM events
), w AS (
  SELECT *, row_number() OVER (PARTITION BY conv_id, turn_idx
                               ORDER BY ts DESC, lsn DESC) AS rn
  FROM c
), final AS (
  SELECT user_id AS ord FROM w WHERE rn = 1 AND op <> 'delete'
), seeds AS (SELECT * FROM (VALUES (0), (1), (2), (3)) t(j)),
s0 AS (SELECT j, (ord + j * 2654435761) % 4294967296 AS h
       FROM final CROSS JOIN seeds),
s1 AS (SELECT j, xor(h, h >> 16) AS h FROM s0),
s2 AS (SELECT j, CAST(CAST(h AS HUGEINT) * 2246822507 % 4294967296 AS BIGINT) AS h FROM s1),
s3 AS (SELECT j, xor(h, h >> 13) AS h FROM s2),
s4 AS (SELECT j, CAST(CAST(h AS HUGEINT) * 3266489909 % 4294967296 AS BIGINT) AS h FROM s3),
hv AS (SELECT j, xor(h, h >> 16) AS hv FROM s4)
SELECT CAST(j AS BIGINT) AS cms_row, CAST(hv % 256 AS BIGINT) AS cms_col,
       COUNT(*) AS cnt
FROM hv GROUP BY 1, 2 ORDER BY 1, 2
"""


CDC_MV_ADD_SQL = """
WITH c AS (
  SELECT event_id AS lsn, ts,
         CASE WHEN event_id % 10 = 0 THEN 'delete'
              WHEN event_id % 2 = 0 THEN 'insert' ELSE 'update' END AS op,
         'conv-' || CAST(user_id AS VARCHAR) AS conv_id,
         CAST(event_id % 25 AS INTEGER) AS turn_idx,
         CASE WHEN event_id % 10 = 0 THEN NULL
              ELSE 'payload-' || CAST(event_id AS VARCHAR) END AS text
  FROM events
), w AS (
  SELECT *, row_number() OVER (PARTITION BY conv_id, turn_idx
                               ORDER BY ts DESC, lsn DESC) AS rn
  FROM c
), final AS (
  SELECT conv_id, text FROM w WHERE rn = 1 AND op <> 'delete'
)
SELECT conv_id, COUNT(*) AS n_turns,
       CAST(SUM(length(text)) AS BIGINT) AS sum_chars
FROM final GROUP BY conv_id
"""


def cdc_window_mv(sf_dir: str):
    """Event-time TUMBLING-WINDOW aggregate MV through the full engine,
    driver-verified MID-stream (pipelines/mvwindow.py — the streaming-window
    MV strategy): replay HALF the change log, fold the preimage feed into
    daily (window_start, role) cells, replay the rest, fold ONLY the new
    epochs' deltas — updates whose ts moved windows transfer mass between
    cells via exact −pre/+post deltas. With lateness disabled the complete
    fold must equal the tumbling-window aggregate of the whole-stream LWW
    oracle (each live row nets +1 at its final window; deleted and moved
    rows cancel). The watermark/allowed-lateness freeze path is pytest-
    verified (tests/test_mvwindow.py) — freezing depends on epoch lineage,
    which SQL over the raw events cannot see."""
    import glob as _glob

    from datax_ray.pipelines.mvwindow import read_mv_window, refresh_mv_window
    from datax_ray.pipelines.replay import ReplayConfig, replay

    work = f"/tmp/datax_cdc_mvwindow/{os.path.basename(os.path.normpath(sf_dir))}"
    spe = _derive_changes(sf_dir, work)

    segs = sorted(_glob.glob(f"{work}/changes/seg-*.parquet"))
    os.makedirs(f"{work}/changes_half", exist_ok=True)
    for s in segs[: max(1, len(segs) // 2)]:
        os.link(s, os.path.join(f"{work}/changes_half", os.path.basename(s)))

    cfg = dict(num_partitions=16, segments_per_epoch=spe)
    replay(ReplayConfig(
        changes_dir=f"{work}/changes_half", lake_dir=f"{work}/lake", **cfg
    ))
    refresh_mv_window(
        f"{work}/lake", f"{work}/mvw", window_s=86400, lateness_s=None
    )
    replay(ReplayConfig(
        changes_dir=f"{work}/changes", lake_dir=f"{work}/lake", **cfg
    ))
    stats = refresh_mv_window(f"{work}/lake", f"{work}/mvw", window_s=86400)
    assert stats["applied_from"] >= 0  # second refresh was incremental
    return read_mv_window(f"{work}/mvw")


CDC_WINDOW_MV_SQL = """
WITH c AS (
  SELECT event_id AS lsn, ts,
         CASE WHEN event_id % 10 = 0 THEN 'delete'
              WHEN event_id % 2 = 0 THEN 'insert' ELSE 'update' END AS op,
         'conv-' || CAST(user_id AS VARCHAR) AS conv_id,
         CAST(event_id % 25 AS INTEGER) AS turn_idx,
         CASE WHEN event_id % 10 = 0 THEN NULL
              ELSE 'payload-' || CAST(event_id AS VARCHAR) END AS text,
         CASE WHEN event_id % 10 = 0 THEN NULL
              WHEN event_id % 2 = 0 THEN 'user' ELSE 'assistant' END AS role
  FROM events
), w AS (
  SELECT *, row_number() OVER (PARTITION BY conv_id, turn_idx
                               ORDER BY ts DESC, lsn DESC) AS rn
  FROM c
), final AS (
  SELECT role, text, ts FROM w WHERE rn = 1 AND op <> 'delete'
)
SELECT make_timestamp((epoch_us(ts) // 86400000000) * 86400000000)
         AS window_start,
       role,
       COUNT(*) AS n_turns,
       CAST(SUM(length(text)) AS BIGINT) AS sum_chars
FROM final GROUP BY 1, 2
"""


def cdc_hopping_mv(sf_dir: str):
    """HOPPING-window variant of the watermarked MV (pipelines/mvwindow.py
    with hop_s < window_s): every live row counts in window/hop = 2
    overlapping windows (2-day windows hopping daily), folded from the
    preimage feed with one np.repeat explode per batch; driver-verified
    MID-stream like cdc_window_mv. The oracle explodes the LWW fold with a
    2-row range join."""
    import glob as _glob

    from datax_ray.pipelines.mvwindow import read_mv_window, refresh_mv_window
    from datax_ray.pipelines.replay import ReplayConfig, replay

    work = f"/tmp/datax_cdc_mvhop/{os.path.basename(os.path.normpath(sf_dir))}"
    spe = _derive_changes(sf_dir, work)

    segs = sorted(_glob.glob(f"{work}/changes/seg-*.parquet"))
    os.makedirs(f"{work}/changes_half", exist_ok=True)
    for s in segs[: max(1, len(segs) // 2)]:
        os.link(s, os.path.join(f"{work}/changes_half", os.path.basename(s)))

    cfg = dict(num_partitions=16, segments_per_epoch=spe)
    replay(ReplayConfig(
        changes_dir=f"{work}/changes_half", lake_dir=f"{work}/lake", **cfg
    ))
    refresh_mv_window(
        f"{work}/lake", f"{work}/mvh", window_s=172800, hop_s=86400,
        lateness_s=None,
    )
    replay(ReplayConfig(
        changes_dir=f"{work}/changes", lake_dir=f"{work}/lake", **cfg
    ))
    stats = refresh_mv_window(f"{work}/lake", f"{work}/mvh", window_s=172800)
    assert stats["applied_from"] >= 0  # second refresh was incremental
    return read_mv_window(f"{work}/mvh")


CDC_HOPPING_MV_SQL = """
WITH c AS (
  SELECT event_id AS lsn, ts,
         CASE WHEN event_id % 10 = 0 THEN 'delete'
              WHEN event_id % 2 = 0 THEN 'insert' ELSE 'update' END AS op,
         'conv-' || CAST(user_id AS VARCHAR) AS conv_id,
         CAST(event_id % 25 AS INTEGER) AS turn_idx,
         CASE WHEN event_id % 10 = 0 THEN NULL
              ELSE 'payload-' || CAST(event_id AS VARCHAR) END AS text,
         CASE WHEN event_id % 10 = 0 THEN NULL
              WHEN event_id % 2 = 0 THEN 'user' ELSE 'assistant' END AS role
  FROM events
), w AS (
  SELECT *, row_number() OVER (PARTITION BY conv_id, turn_idx
                               ORDER BY ts DESC, lsn DESC) AS rn
  FROM c
), final AS (
  SELECT role, text, ts FROM w WHERE rn = 1 AND op <> 'delete'
), exploded AS (
  SELECT f.role, f.text,
         make_timestamp(
           ((epoch_us(f.ts) // 86400000000) - j.i) * 86400000000
         ) AS window_start
  FROM final f CROSS JOIN (SELECT 0 AS i UNION ALL SELECT 1) j
)
SELECT window_start, role,
       COUNT(*) AS n_turns,
       CAST(SUM(length(text)) AS BIGINT) AS sum_chars
FROM exploded GROUP BY 1, 2
"""


def cdc_session_mv(sf_dir: str):
    """Delta-keyed SESSION-window MV through the full engine,
    driver-verified MID-stream (pipelines/mvsession.py): replay HALF the
    change log, sessionize every conversation's live turns into 2-day-gap
    sessions, replay the rest, re-sessionize ONLY the conversations the
    new epochs touched (manifest-pruned point reads; untouched view
    buckets keep their generation files). Session windows merge and split
    under inserts/deletes, which additive folds cannot express — the
    per-conv recompute handles both. The oracle sessionizes the
    whole-stream LWW fold with lag/gap window functions."""
    import glob as _glob

    from datax_ray.pipelines.mvsession import read_mv_session, refresh_mv_session
    from datax_ray.pipelines.replay import ReplayConfig, replay

    work = f"/tmp/datax_cdc_mvsession/{os.path.basename(os.path.normpath(sf_dir))}"
    spe = _derive_changes(sf_dir, work)

    segs = sorted(_glob.glob(f"{work}/changes/seg-*.parquet"))
    os.makedirs(f"{work}/changes_half", exist_ok=True)
    for s in segs[: max(1, len(segs) // 2)]:
        os.link(s, os.path.join(f"{work}/changes_half", os.path.basename(s)))

    cfg = dict(num_partitions=16, segments_per_epoch=spe)
    replay(ReplayConfig(
        changes_dir=f"{work}/changes_half", lake_dir=f"{work}/lake", **cfg
    ))
    refresh_mv_session(f"{work}/lake", f"{work}/mvs", gap_s=172800.0)
    replay(ReplayConfig(
        changes_dir=f"{work}/changes", lake_dir=f"{work}/lake", **cfg
    ))
    stats = refresh_mv_session(f"{work}/lake", f"{work}/mvs", gap_s=172800.0)
    assert stats["applied_from"] >= 0  # second refresh was incremental
    return read_mv_session(f"{work}/mvs")


CDC_SESSION_MV_SQL = """
WITH c AS (
  SELECT event_id AS lsn, ts,
         CASE WHEN event_id % 10 = 0 THEN 'delete'
              WHEN event_id % 2 = 0 THEN 'insert' ELSE 'update' END AS op,
         'conv-' || CAST(user_id AS VARCHAR) AS conv_id,
         CAST(event_id % 25 AS INTEGER) AS turn_idx,
         CASE WHEN event_id % 10 = 0 THEN NULL
              ELSE 'payload-' || CAST(event_id AS VARCHAR) END AS text
  FROM events
), w AS (
  SELECT *, row_number() OVER (PARTITION BY conv_id, turn_idx
                               ORDER BY ts DESC, lsn DESC) AS rn
  FROM c
), final AS (
  SELECT conv_id, text, ts FROM w WHERE rn = 1 AND op <> 'delete'
), s AS (
  SELECT conv_id, ts, text,
         CASE WHEN lag(ts) OVER (PARTITION BY conv_id ORDER BY ts) IS NULL
                OR ts - lag(ts) OVER (PARTITION BY conv_id ORDER BY ts)
                   > INTERVAL 172800 SECONDS
              THEN 1 ELSE 0 END AS brk
  FROM final
), g AS (
  SELECT conv_id, ts, text,
         SUM(brk) OVER (PARTITION BY conv_id ORDER BY ts
                        ROWS UNBOUNDED PRECEDING) - 1 AS session_idx
  FROM s
)
SELECT conv_id, CAST(session_idx AS BIGINT) AS session_idx,
       MIN(ts) AS start_ts, MAX(ts) AS end_ts,
       COUNT(*) AS n_turns,
       CAST(SUM(length(text)) AS BIGINT) AS sum_chars
FROM g GROUP BY conv_id, session_idx
"""


def cdc_join_mv(sf_dir: str):
    """Incrementally-maintained JOIN view between TWO CDC lakes
    (pipelines/mvjoin.py — the third MV refresh strategy), driver-verified
    MID-stream: the transcript lake (turn_mod=25) and a conv-level
    dimension lake (turn_mod=1: every event upserts its conv's single
    dimension row, LWW keeps the latest) both replay from derivations of
    `events`; the view inner-joins per-turn text with the conv's current
    dimension text on conv_id. First refresh runs after HALF the left
    stream, the second folds only the remaining epochs' changed keys —
    unaffected view buckets keep their old generation file. The oracle is
    the SQL join of the two LWW folds."""
    import glob as _glob

    from datax_ray.pipelines.mvjoin import read_mv_join, refresh_mv_join
    from datax_ray.pipelines.replay import ReplayConfig, replay

    work = f"/tmp/datax_cdc_mvjoin/{os.path.basename(os.path.normpath(sf_dir))}"
    spe = _derive_changes(sf_dir, work)  # clears work; left log at /changes
    lineage = (
        _read(sf_dir, "events", columns=["event_id", "ts", "user_id"])
        .map_batches(
            __import__("datax_ray.sources.derive", fromlist=["ChangeDeriver"])
            .ChangeDeriver(f"{work}/changes_dim", turn_mod=1),
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=4096,
        )
        .take_all()
    )
    assert lineage

    segs = sorted(_glob.glob(f"{work}/changes/seg-*.parquet"))
    os.makedirs(f"{work}/changes_half", exist_ok=True)
    for s in segs[: max(1, len(segs) // 2)]:
        os.link(s, os.path.join(f"{work}/changes_half", os.path.basename(s)))

    cfg = dict(num_partitions=16, segments_per_epoch=spe)
    replay(ReplayConfig(
        changes_dir=f"{work}/changes_dim", lake_dir=f"{work}/dim", **cfg
    ))
    replay(ReplayConfig(
        changes_dir=f"{work}/changes_half", lake_dir=f"{work}/lake", **cfg
    ))
    refresh_mv_join(f"{work}/lake", f"{work}/dim", f"{work}/mvjoin")
    replay(ReplayConfig(
        changes_dir=f"{work}/changes", lake_dir=f"{work}/lake", **cfg
    ))
    stats = refresh_mv_join(f"{work}/lake", f"{work}/dim", f"{work}/mvjoin")
    assert stats["applied_left"] >= 0  # second refresh was incremental
    return read_mv_join(f"{work}/mvjoin")


def cdc_asof_mv(sf_dir: str):
    """Incrementally-maintained AS-OF JOIN view between TWO CDC lakes
    (pipelines/mvasof.py — the temporal-enrichment MV), driver-verified
    MID-stream: the transcript lake (turn_mod=25) and a second derivation
    (turn_mod=7 — several enrichment rows per conv at varied event-times)
    both replay from `events`; per live left turn the view carries the
    right row with the greatest ts at-or-before it (backward as-of, exact
    ties match). First refresh runs after HALF the left stream, the second
    folds only changed conversations. The oracle is DuckDB's ASOF JOIN of
    the two LWW folds."""
    import glob as _glob

    from datax_ray.pipelines.mvasof import read_mv_asof, refresh_mv_asof
    from datax_ray.pipelines.replay import ReplayConfig, replay

    work = f"/tmp/datax_cdc_mvasof/{os.path.basename(os.path.normpath(sf_dir))}"
    spe = _derive_changes(sf_dir, work)  # clears work; left log at /changes
    lineage = (
        _read(sf_dir, "events", columns=["event_id", "ts", "user_id"])
        .map_batches(
            __import__("datax_ray.sources.derive", fromlist=["ChangeDeriver"])
            .ChangeDeriver(f"{work}/changes_enrich", turn_mod=7),
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=4096,
        )
        .take_all()
    )
    assert lineage

    segs = sorted(_glob.glob(f"{work}/changes/seg-*.parquet"))
    os.makedirs(f"{work}/changes_half", exist_ok=True)
    for s in segs[: max(1, len(segs) // 2)]:
        os.link(s, os.path.join(f"{work}/changes_half", os.path.basename(s)))

    cfg = dict(num_partitions=16, segments_per_epoch=spe)
    replay(ReplayConfig(
        changes_dir=f"{work}/changes_enrich", lake_dir=f"{work}/enrich", **cfg
    ))
    replay(ReplayConfig(
        changes_dir=f"{work}/changes_half", lake_dir=f"{work}/lake", **cfg
    ))
    refresh_mv_asof(f"{work}/lake", f"{work}/enrich", f"{work}/mvasof")
    replay(ReplayConfig(
        changes_dir=f"{work}/changes", lake_dir=f"{work}/lake", **cfg
    ))
    stats = refresh_mv_asof(f"{work}/lake", f"{work}/enrich", f"{work}/mvasof")
    assert stats["applied_left"] >= 0  # second refresh was incremental
    return read_mv_asof(f"{work}/mvasof")


CDC_ASOF_MV_SQL = """
WITH c AS (
  SELECT event_id AS lsn, ts,
         CASE WHEN event_id % 10 = 0 THEN 'delete'
              WHEN event_id % 2 = 0 THEN 'insert' ELSE 'update' END AS op,
         'conv-' || CAST(user_id AS VARCHAR) AS conv_id,
         CAST(event_id % 25 AS INTEGER) AS lturn,
         CAST(event_id % 7 AS INTEGER) AS rturn,
         CASE WHEN event_id % 10 = 0 THEN NULL
              ELSE 'payload-' || CAST(event_id AS VARCHAR) END AS text
  FROM events
), lw AS (
  SELECT *, row_number() OVER (PARTITION BY conv_id, lturn
                               ORDER BY ts DESC, lsn DESC) AS rn
  FROM c
), lfinal AS (
  SELECT conv_id, CAST(lturn AS BIGINT) AS turn_idx, ts
  FROM lw WHERE rn = 1 AND op <> 'delete'
), rw AS (
  SELECT *, row_number() OVER (PARTITION BY conv_id, rturn
                               ORDER BY ts DESC, lsn DESC) AS rn
  FROM c
), rfinal AS (
  SELECT conv_id, CAST(rturn AS BIGINT) AS r_turn_idx, ts AS r_ts,
         text AS r_text
  FROM rw WHERE rn = 1 AND op <> 'delete'
)
SELECT l.conv_id, l.turn_idx, l.ts, r.r_turn_idx, r.r_ts, r.r_text
FROM lfinal l ASOF JOIN rfinal r
  ON l.conv_id = r.conv_id AND l.ts >= r.r_ts
"""


CDC_JOIN_MV_SQL = """
WITH c AS (
  SELECT event_id AS lsn, ts,
         CASE WHEN event_id % 10 = 0 THEN 'delete'
              WHEN event_id % 2 = 0 THEN 'insert' ELSE 'update' END AS op,
         'conv-' || CAST(user_id AS VARCHAR) AS conv_id,
         CAST(event_id % 25 AS INTEGER) AS turn_idx,
         CASE WHEN event_id % 10 = 0 THEN NULL
              WHEN event_id % 2 = 0 THEN 'user' ELSE 'assistant' END AS role,
         CASE WHEN event_id % 10 = 0 THEN NULL
              ELSE 'payload-' || CAST(event_id AS VARCHAR) END AS text
  FROM events
), lw AS (
  SELECT *, row_number() OVER (PARTITION BY conv_id, turn_idx
                               ORDER BY ts DESC, lsn DESC) AS rn
  FROM c
), lfinal AS (
  SELECT conv_id, turn_idx, role, text
  FROM lw WHERE rn = 1 AND op <> 'delete'
), rw AS (
  SELECT conv_id, op, text, row_number() OVER (PARTITION BY conv_id
                               ORDER BY ts DESC, lsn DESC) AS rn
  FROM c
), rfinal AS (
  SELECT conv_id, text AS r_text FROM rw WHERE rn = 1 AND op <> 'delete'
)
SELECT l.conv_id, l.turn_idx, l.role, l.text, r.r_text
FROM lfinal l JOIN rfinal r ON l.conv_id = r.conv_id
"""


def cdc_bootstrap_replay(sf_dir: str):
    """Snapshot full-load (epoch 0, DataX full-sync analog) + incremental
    change replay. The snapshot derives from `customer` (4 turns per
    customer conv, constant 1992 ts) and the change stream from `events`
    ('conv-c' prefix so changes land on snapshot convs) — both in tasks,
    both deterministic, so CDC_BOOTSTRAP_SQL expresses the final lake."""
    import shutil

    from datax_ray.pipelines.bootstrap import bootstrap
    from datax_ray.pipelines.replay import ReplayConfig, replay
    from datax_ray.sinks.lake import final_table
    from datax_ray.sources.derive import SnapshotDeriver

    work = f"/tmp/datax_cdc_bootstrap/{os.path.basename(os.path.normpath(sf_dir))}"
    spe = _derive_changes(sf_dir, work, conv_prefix="conv-c")  # clears work
    _read(sf_dir, "customer", columns=["c_custkey"]).map_batches(
        SnapshotDeriver(f"{work}/snapshot", turns=4, conv_prefix="conv-c"),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=4096,
    ).take_all()
    cfg = ReplayConfig(
        changes_dir=f"{work}/changes",
        lake_dir=f"{work}/lake",
        num_partitions=16,
        segments_per_epoch=spe,
        compact_every=2,
    )
    bootstrap(f"{work}/snapshot", cfg)
    replay(cfg)
    return final_table(f"{work}/lake")


# Snapshot rows as lsn=-1 pseudo-events (they lose every LWW race against a
# real change event — 1992 ts vs 2024 event ts), unioned with the derived
# change stream, then the same row_number() LWW fold.
CDC_BOOTSTRAP_SQL = """
WITH snap AS (
  SELECT 'conv-c' || CAST(c_custkey AS VARCHAR) AS conv_id,
         CAST(t.i AS INTEGER) AS turn_idx,
         CASE WHEN t.i % 2 = 0 THEN 'user' ELSE 'assistant' END AS role,
         'snap-' || CAST(c_custkey AS VARCHAR) || '-' || CAST(t.i AS VARCHAR) AS text,
         '' AS tool,
         TIMESTAMP '1992-01-01 00:00:00' AS ts,
         CAST(-1 AS BIGINT) AS lsn,
         'insert' AS op
  FROM customer, (SELECT unnest(range(4)) AS i) t
), chg AS (
  SELECT 'conv-c' || CAST(user_id AS VARCHAR) AS conv_id,
         CAST(event_id % 25 AS INTEGER) AS turn_idx,
         CASE WHEN event_id % 10 = 0 THEN NULL
              WHEN event_id % 2 = 0 THEN 'user' ELSE 'assistant' END AS role,
         CASE WHEN event_id % 10 = 0 THEN NULL
              ELSE 'payload-' || CAST(event_id AS VARCHAR) END AS text,
         CASE WHEN event_id % 10 = 0 THEN NULL ELSE '' END AS tool,
         ts,
         event_id AS lsn,
         CASE WHEN event_id % 10 = 0 THEN 'delete'
              WHEN event_id % 2 = 0 THEN 'insert' ELSE 'update' END AS op
  FROM events
), u AS (
  SELECT * FROM snap UNION ALL SELECT * FROM chg
), w AS (
  SELECT *, row_number() OVER (PARTITION BY conv_id, turn_idx
                               ORDER BY ts DESC, lsn DESC) AS rn
  FROM u
)
SELECT conv_id, turn_idx, role, text, tool, ts FROM w WHERE rn = 1 AND op <> 'delete'
"""


# --------------------------------------------------------- transformers --


def dx_substr(sf_dir: str):
    ds = _read(sf_dir, "part", columns=["p_partkey", "p_name"])

    def fn(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "p_partkey": t["p_partkey"],
                "name_sub": pc.utf8_slice_codeunits(t["p_name"], start=0, stop=8),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


DX_SUBSTR_SQL = "SELECT p_partkey, substr(p_name, 1, 8) AS name_sub FROM part"


def dx_pad(sf_dir: str):
    ds = _read(sf_dir, "supplier", columns=["s_suppkey", "s_name"])

    def fn(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "s_suppkey": t["s_suppkey"],
                "name_pad": pc.utf8_lpad(t["s_name"], width=24, padding="_"),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


DX_PAD_SQL = "SELECT s_suppkey, lpad(s_name, 24, '_') AS name_pad FROM supplier"


def dx_replace(sf_dir: str):
    ds = _read(sf_dir, "part", columns=["p_partkey", "p_type"])

    def fn(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "p_partkey": t["p_partkey"],
                "type_mod": pc.replace_substring(
                    t["p_type"], pattern="BRASS", replacement="BR@SS"
                ),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


DX_REPLACE_SQL = (
    "SELECT p_partkey, replace(p_type, 'BRASS', 'BR@SS') AS type_mod FROM part"
)


def dx_mask_pii(sf_dir: str):
    """dx_mask through the transformer chain: redact every digit run in the
    events payload JSON — the PII-scrub shape (emails/phones/ids → token)
    a training pipeline runs before text ever reaches a tokenizer. Regex
    semantics are RE2 on both engines (Arrow replace_substring_regex /
    DuckDB regexp_replace), so outputs match bit-for-bit."""
    ds = _read(sf_dir, "events", columns=["event_id", "props"])
    ds = apply_transformers(
        ds,
        [{"name": "dx_mask", "column": "props",
          "pattern": "[0-9]+", "replacement": "<NUM>"}],
    )
    return ds.map_batches(
        lambda t: pa.table(
            {"event_id": pc.cast(t["event_id"], pa.int64()),
             "props_redacted": t["props"]}
        ),
        batch_format="pyarrow",
    )


DX_MASK_SQL = """
SELECT CAST(event_id AS BIGINT) AS event_id,
       regexp_replace(props, '[0-9]+', '<NUM>', 'g') AS props_redacted
FROM events
"""


def dx_filter(sf_dir: str):
    ds = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_linenumber", "l_quantity"])
    ds = apply_transformers(
        ds, [{"name": "dx_filter", "column": "l_quantity", "op": ">", "value": 45.0}]
    )
    return ds.map_batches(
        lambda t: t.select(["l_orderkey", "l_linenumber", "l_quantity"]),
        batch_format="pyarrow",
    )


DX_FILTER_SQL = (
    "SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem WHERE l_quantity > 45"
)


def json_extract_props(sf_dir: str):
    """JSON scalar extraction from the events.props column (the arbitrary
    per-record transform slot DataX fills with dx_groovy, §2A row 14):
    pull props.k as an int. Fully Arrow-native: a binary_join kernel
    newline-terminates every value IN the Arrow buffer, and pa.json parses
    that buffer directly — no per-row Python strings materialize."""
    ds = _read(sf_dir, "events", columns=["event_id", "props"])

    def fn(t: pa.Table) -> pa.Table:
        import pyarrow.json as pajson

        col = t["props"]
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        valid = None
        if col.null_count:  # rare path: parse valid rows, null-scatter back
            valid = pc.is_valid(col).to_numpy(zero_copy_only=False)
            col = col.drop_null()
        nl = pc.binary_join_element_wise(col, "", "\n")  # value + "\n", in-buffer
        nl = nl.combine_chunks() if isinstance(nl, pa.ChunkedArray) else nl
        # StringArray buffers: [validity, int32 offsets, data] — the data
        # buffer between the first and last offset IS the newline-delimited
        # JSON blob; hand it to the parser without any Python strings.
        offs = np.frombuffer(nl.buffers()[1], dtype=np.int32)
        start = int(offs[nl.offset])
        end = int(offs[nl.offset + len(nl)])
        blob = nl.buffers()[2].slice(start, end - start)
        parsed = pajson.read_json(pa.BufferReader(blob))
        k = pc.cast(parsed["k"], pa.int64())
        if valid is not None:
            full = np.full(t.num_rows, None, dtype=object)
            full[valid] = k.to_pylist()
            k = pa.array(full, pa.int64())
        return pa.table({"event_id": t["event_id"], "k": k})

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


JSON_EXTRACT_SQL = """
SELECT event_id, CAST(json_extract(props, '$.k') AS BIGINT) AS k FROM events
"""


# ----------------------------------------------------------- relational --


def agg_pricing_summary(sf_dir: str):
    """TPC-H Q1-flavored grouped aggregate with per-batch combiners."""
    ds = _read(sf_dir, "lineitem", columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "l_linestatus": t["l_linestatus"],
                "sum_qty": pc.cast(t["l_quantity"], pa.int64()),
                "sum_base_cents": _cents(t["l_extendedprice"]),
            }
        )

    return partial_agg(
        ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True),
        keys=["l_returnflag", "l_linestatus"],
        sums={"sum_qty": "sum_qty", "sum_base_cents": "sum_base_cents"},
        counts="count_order",
        single_reduce=True,  # 6 flag/status combos — skip the shuffle
    )


AGG_PRICING_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
       CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_base_cents,
       COUNT(*) AS count_order
FROM lineitem GROUP BY l_returnflag, l_linestatus
"""


def join_orders_by_nation(sf_dir: str):
    """orders ⋈ customer ⋈ nation with both small sides broadcast."""
    import pyarrow.parquet as pq

    cust = pq.read_table(os.path.join(sf_dir, "customer.parquet"))
    nation = pq.read_table(os.path.join(sf_dir, "nation.parquet"))
    side = (
        cust.join(nation, keys=["c_nationkey"], right_keys=["n_nationkey"])
        .select(["c_custkey", "n_name"])
        .rename_columns(["o_custkey", "n_name"])
    )
    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_custkey": t["o_custkey"],
                "total_cents": _cents(t["o_totalprice"]),
            }
        )

    joined = broadcast_join(
        orders.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True),
        side,
        on="o_custkey",
    )
    return partial_agg(
        joined, keys=["n_name"], sums={"total_cents": "total_cents"},
        counts="n_orders",
        single_reduce=True,  # 25 nations — skip the shuffle
    )


JOIN_NATION_SQL = """
SELECT n.n_name,
       CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents,
       COUNT(*) AS n_orders
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name
"""


def sort_topk_orders(sf_dir: str):
    ds = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_totalprice"]).map_batches(
        lambda t: t.select(["o_orderkey", "o_custkey", "o_totalprice"]),
        batch_format="pyarrow",
    )
    return top_k(ds, by="o_totalprice", k=10, tie_col="o_orderkey")


SORT_TOPK_SQL = """
SELECT o_orderkey, o_custkey, o_totalprice FROM orders
ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
"""


def agg_global_extremes(sf_dir: str):
    """Global (group-less) aggregate: min/max order date + count, computed
    per batch then reduced over the tiny partials."""
    ds = _read(sf_dir, "orders", columns=["o_orderdate"])

    def partial(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "min_date": pa.array([pc.min(t["o_orderdate"]).as_py()], pa.timestamp("us")),
                "max_date": pa.array([pc.max(t["o_orderdate"]).as_py()], pa.timestamp("us")),
                "n_orders": pa.array([t.num_rows], pa.int64()),
            }
        )

    parts = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True).take_all()
    return pa.table(
        {
            "min_date": pa.array([min(r["min_date"] for r in parts)], pa.timestamp("us")),
            "max_date": pa.array([max(r["max_date"] for r in parts)], pa.timestamp("us")),
            "n_orders": pa.array([sum(r["n_orders"] for r in parts)], pa.int64()),
        }
    )


GLOBAL_EXTREMES_SQL = """
SELECT MIN(o_orderdate) AS min_date, MAX(o_orderdate) AS max_date,
       COUNT(*) AS n_orders
FROM orders
"""


def distinct_event_types(sf_dir: str):
    """Distributed DISTINCT: per-batch unique combiner, then one reduce."""
    ds = _read(sf_dir, "events", columns=["event_type"])

    def uniq(t: pa.Table) -> pa.Table:
        return pa.table({"event_type": pc.unique(t["event_type"])})

    partials = ds.map_batches(uniq, batch_format="pyarrow").take_all()
    vals = sorted({r["event_type"] for r in partials})
    return pa.table({"event_type": pa.array(vals, pa.string())})


DISTINCT_TYPES_SQL = "SELECT DISTINCT event_type FROM events"


def count_distinct_users_daily(sf_dir: str):
    """Exact COUNT(DISTINCT) per group, distributed: per-batch (day, user)
    unique combiner, a coarse hash shuffle of the SURVIVORS (one row per
    distinct pair per batch, never raw events), one per-bucket exact dedup
    + count, then a tiny per-day fold. The daily-active-users shape; at
    100 TB the shuffle payload is bounded by distinct pairs, not events.
    Arrow end-to-end: per-batch group_by dedup, int-key bucketing, no
    pandas round-trips (r3 review item 3)."""
    ds = _read(sf_dir, "events", columns=["ts", "user_id"])
    num_buckets = _buckets_for(sf_dir, "events")

    def pairs(t: pa.Table) -> pa.Table:
        day = pc.cast(
            pc.multiply(
                pc.divide(pc.cast(t["ts"], pa.int64()), 86_400_000_000),
                86_400_000_000,
            ),
            pa.timestamp("us"),
        )
        both = pa.table({"day": day, "user_id": t["user_id"]})
        uniq = both.group_by(["day", "user_id"], use_threads=False).aggregate([])
        # bucket by user so a pair dedups exactly once (user_id is int64)
        grp = (uniq["user_id"].to_numpy() % num_buckets).astype(np.int32)
        return uniq.append_column("_grp", pa.array(grp))

    def per_bucket(t: pa.Table) -> pa.Table:
        uniq = t.group_by(["day", "user_id"], use_threads=False).aggregate([])
        out = uniq.group_by("day", use_threads=False).aggregate(
            [("user_id", "count")]
        )
        return pa.table({"day": out["day"], "n_users": out["user_id_count"]})

    partials = (
        ds.map_batches(pairs, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_grp")
        .map_groups(per_bucket, batch_format="pyarrow")
    )

    def fold(t: pa.Table) -> pa.Table:
        out = t.group_by("day", use_threads=False).aggregate([("n_users", "sum")])
        return pa.table({
            "day": out["day"],
            "n_users": pc.cast(out["n_users_sum"], pa.int64()),
        })

    return partials.repartition(1).map_batches(
        fold, batch_format="pyarrow", batch_size=None
    )


COUNT_DISTINCT_SQL = """
SELECT time_bucket(INTERVAL 1 DAY, ts) AS day,
       COUNT(DISTINCT user_id) AS n_users
FROM events GROUP BY day
"""


def semi_join_urgent_customers(sf_dir: str):
    """Semi join (EXISTS): customers having at least one 1-URGENT order.
    Distributed shape: both sides hash-shuffle into key buckets via
    Dataset.join(left_semi) — the urgent-key set never lands on the driver
    (at 100 TB it is O(customers)). The orders side pre-filters and
    pre-uniques per batch, so only distinct urgent keys shuffle."""
    from datax_ray.functions.relational import semi_join

    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_orderpriority"])
    urgent = orders.map_batches(
        lambda t: t.filter(pc.equal(t["o_orderpriority"], "1-URGENT")).select(
            ["o_custkey"]
        ),
        batch_format="pyarrow",
    )
    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_name"])
    return semi_join(cust, urgent, on="c_custkey", right_on="o_custkey")


SEMI_JOIN_SQL = """
SELECT c_custkey, c_name FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
"""


def anti_join_quiet_customers(sf_dir: str):
    """Anti join (NOT EXISTS): customers with no 1-URGENT order — same
    distributed Dataset.join shape as the semi join (left_anti)."""
    from datax_ray.functions.relational import semi_join

    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_orderpriority"])
    urgent = orders.map_batches(
        lambda t: t.filter(pc.equal(t["o_orderpriority"], "1-URGENT")).select(
            ["o_custkey"]
        ),
        batch_format="pyarrow",
    )
    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_acctbal"])
    return semi_join(cust, urgent, on="c_custkey", right_on="o_custkey", anti=True)


ANTI_JOIN_SQL = """
SELECT c_custkey, c_acctbal FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
"""


def join_lineitem_orders_large(sf_dir: str):
    """Large-large fact-fact join: lineitem ⋈ orders on orderkey, neither
    side broadcastable at 100 TB — Ray Data's hash-partitioned Dataset.join
    (both sides shuffle into key buckets), then the usual combiner agg.
    Both sides are projected to the join/agg columns before the shuffle."""
    from datax_ray.functions.relational import large_join

    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_extendedprice"]).map_batches(
        lambda t: pa.table(
            {"l_orderkey": t["l_orderkey"], "price_cents": _cents(t["l_extendedprice"])}
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_orderpriority"])
    joined = large_join(li, orders, on="l_orderkey", right_on="o_orderkey")
    return partial_agg(
        joined,
        keys=["o_orderpriority"],
        sums={"price_cents": "rev_cents"},
        counts="n_items",
        single_reduce=True,  # 5 priorities — skip the shuffle
    )


JOIN_LARGE_SQL = """
SELECT o.o_orderpriority,
       CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS rev_cents,
       COUNT(*) AS n_items
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY o.o_orderpriority
"""


def left_join_customer_orders(sf_dir: str):
    """LEFT OUTER large-large join: every customer with their order count,
    zero-order customers kept with n_orders=0. Order counts pre-shrink via
    the combiner (one row per custkey) before the hash-partitioned outer
    join, so the shuffle moves one row per customer per side."""
    from datax_ray.functions.relational import large_join, partial_agg

    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])
    counts = partial_agg(
        _read(sf_dir, "orders", columns=["o_custkey"]),
        keys=["o_custkey"],
        counts="n",
        num_buckets=_buckets_for(sf_dir, "customer"),
    )
    joined = large_join(
        cust, counts, on="c_custkey", right_on="o_custkey", join_type="left_outer"
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "c_custkey": t["c_custkey"],
                "c_mktsegment": t["c_mktsegment"],
                "n_orders": pc.fill_null(pc.cast(t["n"], pa.int64()), 0),
            }
        )

    return joined.map_batches(finish, batch_format="pyarrow")


LEFT_JOIN_SQL = """
SELECT c.c_custkey, c.c_mktsegment, COUNT(o.o_orderkey) AS n_orders
FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
GROUP BY c.c_custkey, c.c_mktsegment
"""


def _sqlite_events_fixture(sf_dir: str) -> str:
    """A sqlite DB standing in for the upstream JDBC endpoint (no network
    DB in the sandbox): events (event_id, user_id) loaded once per sf_dir,
    keyed by row count so a stale/partial build is redone. Fixture setup
    only — the graded path is the range-split READ."""
    import sqlite3

    import pyarrow.parquet as pq

    n = parquet_rows(os.path.join(sf_dir, "events.parquet"))
    path = f"/tmp/datax_sqlsource/{os.path.basename(os.path.normpath(sf_dir))}.db"
    os.makedirs(os.path.dirname(path), exist_ok=True)
    if os.path.exists(path):
        try:
            con = sqlite3.connect(path)
            have = con.execute("SELECT COUNT(*) FROM events").fetchone()[0]
            con.close()
            if have == n:
                return path
        except sqlite3.Error:
            pass
        os.remove(path)
    tmp = f"{path}.tmp.{os.getpid()}"
    con = sqlite3.connect(tmp)
    con.execute("CREATE TABLE events (event_id INTEGER PRIMARY KEY, user_id INTEGER)")
    pf = pq.ParquetFile(os.path.join(sf_dir, "events.parquet"))
    for b in pf.iter_batches(batch_size=65536, columns=["event_id", "user_id"]):
        con.executemany(
            "INSERT INTO events VALUES (?, ?)",
            zip(b["event_id"].to_pylist(), b["user_id"].to_pylist()),
        )
    con.commit()
    con.close()
    os.replace(tmp, path)
    return path


def sql_source_events(sf_dir: str):
    """The DataX rdbmsreader contract (SURVEY §2A row 1): splitPk range
    planning (one MIN/MAX query), per-range SELECTs in parallel tasks with
    column pruning + WHERE pushdown, over a DB-API connection factory."""
    import functools
    import sqlite3

    from datax_ray.sources.sqlsource import read_sql_table

    db = _sqlite_events_fixture(sf_dir)
    factory = functools.partial(sqlite3.connect, db, 30.0, check_same_thread=False)
    return read_sql_table(
        factory,
        "events",
        columns=["event_id", "user_id"],
        split_pk="event_id",
        num_splits=8,
        where="user_id % 3 = 0",
        schema=pa.schema([("event_id", pa.int64()), ("user_id", pa.int64())]),
    )


SQL_SOURCE_SQL = "SELECT event_id, user_id FROM events WHERE user_id % 3 = 0"


def asof_join_latest_order(sf_dir: str):
    """AS-OF join (the brief's canonical custom operator): each event joins
    the latest order of the same customer at-or-before the event time.
    Composition: coarse key-hash bucket both sides + one vectorized
    Arrow pass per bucket (functions/relational.py:asof_join — sort +
    segmented maximum.accumulate, zero pandas). The right side pre-reduces
    to one row per (custkey, orderdate) so tie-breaks are
    engine-independent."""
    from datax_ray.functions.relational import asof_join, partial_agg

    events = _read(sf_dir, "events", columns=["event_id", "user_id", "ts"]).map_batches(
        lambda t: pa.table(
            {"custkey": t["user_id"], "event_id": t["event_id"], "ts": t["ts"]}
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_orderdate", "o_orderkey"]).map_batches(
        lambda t: pa.table(
            {
                "custkey": t["o_custkey"],
                "o_orderdate": t["o_orderdate"],
                "o_orderkey": t["o_orderkey"],
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    dedup_orders = partial_agg(
        orders.map_batches(
            lambda t: t.rename_columns(["custkey", "o_orderdate", "max_orderkey"]),
            batch_format="pyarrow",
        ),
        keys=["custkey", "o_orderdate"],
        maxs={"max_orderkey": "max_orderkey"},
    )
    return asof_join(
        events, dedup_orders, key="custkey", left_ts="ts", right_ts="o_orderdate"
    )


ASOF_JOIN_SQL = """
WITH o AS (
  SELECT o_custkey AS custkey, o_orderdate,
         MAX(o_orderkey) AS max_orderkey
  FROM orders GROUP BY 1, 2
)
SELECT e.event_id, e.user_id AS custkey, e.ts, o.o_orderdate, o.max_orderkey
FROM events e
ASOF JOIN o ON e.user_id = o.custkey AND e.ts >= o.o_orderdate
"""


def sample_events_hash(sf_dir: str):
    """Deterministic distributed sampling: hash-bernoulli on the row key
    (the only sampling that is reproducible AND embarrassingly parallel at
    100 TB — no global row numbering, no RNG state coordination)."""
    ds = _read(sf_dir, "events", columns=["event_id", "user_id"])

    def pick(t: pa.Table) -> pa.Table:
        e = t["event_id"].to_numpy()
        return t.filter(pa.array((e * 2654435761) % 100 < 10))

    return ds.map_batches(pick, batch_format="pyarrow", zero_copy_batch=True)


SAMPLE_SQL = """
SELECT event_id, user_id FROM events WHERE (event_id * 2654435761) % 100 < 10
"""


def sample_events_stratified(sf_dir: str):
    """Stratified deterministic sampling: a different hash-bernoulli rate
    per stratum (down-weight the dominant 'view'/'click' strata, keep all
    rare 'error' rows) — the class-balance step of training-data curation.
    Same embarrassingly-parallel shape as sample_events_hash: no per-class
    counting pass, no RNG coordination, reproducible on any cluster."""
    RATES = {"view": 5, "click": 10, "error": 100}  # percent kept; default 20
    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "event_type"])

    def pick(t: pa.Table) -> pa.Table:
        e = t["event_id"].to_numpy()
        et = t["event_type"].to_pandas()
        rate = et.map(RATES).fillna(20).to_numpy(dtype=np.int64)
        return t.filter(pa.array((e * 2654435761) % 100 < rate))

    return ds.map_batches(pick, batch_format="pyarrow", zero_copy_batch=True)


SAMPLE_STRAT_SQL = """
SELECT event_id, user_id, event_type FROM events
WHERE (event_id * 2654435761) % 100 <
      CASE event_type WHEN 'view' THEN 5 WHEN 'click' THEN 10
                      WHEN 'error' THEN 100 ELSE 20 END
"""


def token_count_bpe(sf_dir: str):
    """BPE-ish subword token counting via a word/number/punct regex — both
    engines run the same RE2 pattern (pyarrow count_substring_regex vs
    DuckDB regexp_extract_all)."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    pat = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

    def fn(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_bpe_tokens": pc.cast(
                    pc.count_substring_regex(t["text"], pattern=pat), pa.int64()
                ),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


TOKEN_BPE_SQL = r"""
SELECT doc_id,
       CAST(length(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT)
           AS n_bpe_tokens
FROM documents
"""


def range_join_event_burst(sf_dir: str):
    """Range join (inequality self-join): per event, the count of same-user
    events in the trailing 1-hour window — implemented as coarse key-hash
    buckets + vectorized groupby-rolling, not an O(n²) pair join."""
    from datax_ray.functions.windows import rolling_window_counts

    out = rolling_window_counts(
        _read(sf_dir, "events", columns=["event_id", "user_id", "ts"]),
        window_us=3_600_000_000,
        num_buckets=_buckets_for(sf_dir, "events"),
    )
    return out.map_batches(
        lambda t: pa.table(
            {
                "event_id": pc.cast(t["event_id"], pa.int64()),
                "n_win": pc.cast(t["n_win"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


RANGE_JOIN_SQL = """
SELECT e.event_id, COUNT(*) AS n_win
FROM events e JOIN events e2
  ON e.user_id = e2.user_id
 AND e2.ts <= e.ts AND e2.ts > e.ts - INTERVAL 1 HOUR
GROUP BY e.event_id
"""


def quantile_sketch_order_price(sf_dir: str):
    """Distributed exact quantiles at bounded value resolution (whole
    dollars): per-batch value-count combiners shuffle a HISTOGRAM
    (O(distinct grid values), never O(rows)); the driver folds cumulative
    counts with quantile_disc's index rule ceil(q·n)−1. The grid resolution
    is the sketch's documented accuracy knob — at 100 TB the histogram
    stays ~10^5 rows regardless of input size."""
    from datax_ray.functions.relational import partial_agg

    ds = _read(sf_dir, "orders", columns=["o_totalprice"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({"dollars": _cents(t["o_totalprice"], 1)})

    hist = partial_agg(
        ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True),
        keys=["dollars"],
        counts="n",
    ).take_all()  # bounded by the value grid, not row count
    hist.sort(key=lambda r: r["dollars"])
    values = np.array([r["dollars"] for r in hist], dtype=np.int64)
    counts = np.array([r["n"] for r in hist], dtype=np.int64)
    cum = np.cumsum(counts)
    total = int(cum[-1]) if len(cum) else 0

    def q_at(q: float) -> int:
        idx = max(0, int(np.ceil(q * total)) - 1)  # quantile_disc's rule
        return int(values[np.searchsorted(cum, idx + 1)])

    return pa.table(
        {
            "p50": pa.array([q_at(0.5)], pa.int64()),
            "p90": pa.array([q_at(0.9)], pa.int64()),
            "p99": pa.array([q_at(0.99)], pa.int64()),
        }
    )


QUANTILE_SQL = """
SELECT quantile_disc(CAST(ROUND(o_totalprice) AS BIGINT), 0.5) AS p50,
       quantile_disc(CAST(ROUND(o_totalprice) AS BIGINT), 0.9) AS p90,
       quantile_disc(CAST(ROUND(o_totalprice) AS BIGINT), 0.99) AS p99
FROM orders
"""


def _cell_groups(t: pa.Table, group_col: str, val_col: str):
    """Iterate a BOUNDED folded-cell table (group, value, n) as
    (group_key, sorted_values, counts) slices — Arrow → numpy directly,
    no pandas round-trip (the r4 review's Arrow-native consistency note).
    The table is O(groups × distinct values) by construction (partial_agg
    single_reduce), so the per-group Python loop is over a bounded count,
    never rows."""
    t = t.sort_by([(group_col, "ascending"), (val_col, "ascending")])
    grp = np.asarray(t[group_col].to_pylist(), dtype=object)
    vals = t[val_col].to_numpy(zero_copy_only=False)
    cnts = t["n"].to_numpy(zero_copy_only=False)
    if len(grp) == 0:
        return
    starts = np.flatnonzero(np.r_[True, grp[1:] != grp[:-1]])
    ends = np.r_[starts[1:], len(grp)]
    for s, e in zip(starts, ends):
        yield grp[s], vals[s:e], cnts[s:e]


def grouped_median_order_price(sf_dir: str):
    """Per-group EXACT median (cent resolution): the same histogram
    combiner as quantile_sketch_order_price but keyed by (group, value) —
    the shuffle moves O(groups x distinct cents), never O(rows) — then one
    vectorized fold applies quantile_disc's index rule per group. The
    grouped-quantile shape that a 100 TB curation pipeline uses for
    per-source length/score cutoffs."""
    from datax_ray.functions.relational import partial_agg

    ds = _read(sf_dir, "orders", columns=["o_orderpriority", "o_totalprice"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderpriority": t["o_orderpriority"],
                "cents": _cents(t["o_totalprice"]),
            }
        )

    hist = partial_agg(
        ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True),
        keys=["o_orderpriority", "cents"],
        counts="n",
        single_reduce=True,  # histogram is bounded by the value grid
    )

    def fold(t: pa.Table) -> pa.Table:
        prios, medians = [], []
        for pr, vals, cnts in _cell_groups(t, "o_orderpriority", "cents"):
            cum = np.cumsum(cnts)
            idx = max(0, int(np.ceil(0.5 * cum[-1])) - 1)
            medians.append(int(vals[np.searchsorted(cum, idx + 1)]))
            prios.append(pr)
        return pa.table(
            {
                "o_orderpriority": pa.array(prios, pa.string()),
                "p50_cents": pa.array(medians, pa.int64()),
            }
        )

    return hist.map_batches(fold, batch_format="pyarrow", batch_size=None)


GROUPED_MEDIAN_SQL = """
SELECT o_orderpriority,
       quantile_disc(CAST(ROUND(o_totalprice * 100) AS BIGINT), 0.5) AS p50_cents
FROM orders GROUP BY o_orderpriority
"""


def grouped_percentiles_order_price(sf_dir: str):
    """Per-group INTERPOLATED quantiles (percentile_cont) from the same
    O(groups x distinct-cents) histogram combiner as the grouped median —
    no per-row shuffle. Quartile positions q*(n-1) have fractional parts
    in {0, .25, .5, .75}, so value*4 is an exact integer: results are
    returned x4 (`pNN_x4`) to make the float interpolation hash-exact
    against the SQL oracle (no 1-ulp drift at cent scale)."""
    from datax_ray.functions.relational import partial_agg

    ds = _read(sf_dir, "orders", columns=["o_orderpriority", "o_totalprice"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderpriority": t["o_orderpriority"],
                "cents": _cents(t["o_totalprice"]),
            }
        )

    hist = partial_agg(
        ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True),
        keys=["o_orderpriority", "cents"],
        counts="n",
        single_reduce=True,  # histogram is bounded by the value grid
    )

    def fold(t: pa.Table) -> pa.Table:
        qs = {"p25_x4": 0.25, "p50_x4": 0.5, "p75_x4": 0.75}
        out: dict[str, list] = {"o_orderpriority": []}
        for c in qs:
            out[c] = []
        for pr, vals, cnts in _cell_groups(t, "o_orderpriority", "cents"):
            cum = np.cumsum(cnts)
            n = int(cum[-1])
            out["o_orderpriority"].append(pr)
            for col, q in qs.items():
                pos = q * (n - 1)
                lo, hi = int(np.floor(pos)), int(np.ceil(pos))
                v_lo = int(vals[np.searchsorted(cum, lo + 1)])
                v_hi = int(vals[np.searchsorted(cum, hi + 1)])
                out[col].append(round(4 * v_lo + (pos - lo) * 4 * (v_hi - v_lo)))
        return pa.table(
            {
                "o_orderpriority": pa.array(out["o_orderpriority"], pa.string()),
                **{c: pa.array(out[c], pa.int64()) for c in qs},
            }
        )

    return hist.map_batches(fold, batch_format="pyarrow", batch_size=None)


GROUPED_PERCENTILES_SQL = """
SELECT o_orderpriority,
       CAST(ROUND(4 * percentile_cont(0.25) WITHIN GROUP
            (ORDER BY CAST(ROUND(o_totalprice * 100) AS BIGINT))) AS BIGINT) AS p25_x4,
       CAST(ROUND(4 * percentile_cont(0.5) WITHIN GROUP
            (ORDER BY CAST(ROUND(o_totalprice * 100) AS BIGINT))) AS BIGINT) AS p50_x4,
       CAST(ROUND(4 * percentile_cont(0.75) WITHIN GROUP
            (ORDER BY CAST(ROUND(o_totalprice * 100) AS BIGINT))) AS BIGINT) AS p75_x4
FROM orders GROUP BY o_orderpriority
"""


def latest_order_per_customer(sf_dir: str):
    """Relational ARG-MAX (latest order per customer) via the engine's own
    LWW kernel: per-batch lww_reduce keeps one candidate per custkey
    (combiner — only survivors shuffle), then per coarse key-hash bucket
    the same kernel picks the global winner, ordered by
    (o_orderdate, o_orderkey). The CDC merge and SQL's
    row_number()=1-over-desc are literally the same operator here."""
    from datax_ray.stages.merge import lww_reduce

    ds = _read(
        sf_dir,
        "orders",
        columns=["o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"],
    )
    nb = _buckets_for(sf_dir, "orders")
    key = ("o_custkey",)
    order = ("o_orderdate", "o_orderkey")

    def combine(t: pa.Table) -> pa.Table:
        t = lww_reduce(t, key_cols=key, order_cols=order)
        h = t["o_custkey"].to_numpy(zero_copy_only=False).astype(np.uint64)
        return t.append_column("_kb", pa.array((h % nb).astype("int32")))

    def pick(g: pa.Table) -> pa.Table:
        return lww_reduce(g.drop_columns(["_kb"]), key_cols=key, order_cols=order)

    return (
        ds.map_batches(combine, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_kb")
        .map_groups(pick, batch_format="pyarrow")
    )


LATEST_ORDER_SQL = """
SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice
FROM (
  SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
  FROM orders
) WHERE rn = 1
"""


def top3_orders_per_customer(sf_dir: str):
    """Grouped top-N (N=3 most recent orders per customer) via the
    combiner-bounded top_n_per_key kernel (functions/relational.py): at
    most 3 rows per key leave any batch, so the shuffle carries
    O(3 × customers), never O(orders)."""
    from datax_ray.functions.relational import top_n_per_key

    ds = _read(
        sf_dir,
        "orders",
        columns=["o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"],
    )
    return top_n_per_key(
        ds,
        keys=["o_custkey"],
        order_cols=["o_orderdate", "o_orderkey"],
        n=3,
        num_buckets=_buckets_for(sf_dir, "orders"),
    )


TOP3_ORDERS_SQL = """
SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice
FROM (
  SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
  FROM orders
) WHERE rn <= 3
"""


def unpivot_part_measures(sf_dir: str):
    """UNPIVOT (wide -> long; completes the PIVOT family): each part row
    becomes one row per measure column. Pure map-side Arrow reshape —
    embarrassingly parallel, no shuffle, columns concatenated zero-copy
    per batch."""
    measures = ["p_size", "p_retailprice"]

    def to_long(t: pa.Table) -> pa.Table:
        n = t.num_rows
        keys = pa.concat_arrays(
            [t["p_partkey"].combine_chunks()] * len(measures)
        )
        names = pa.concat_arrays(
            [pa.array([m] * n, pa.string()) for m in measures]
        )
        vals = pa.concat_arrays(
            [pc.cast(t[m], pa.float64()).combine_chunks() for m in measures]
        )
        return pa.table(
            {"p_partkey": keys, "measure": names, "value": vals}
        )

    return _read(sf_dir, "part", columns=["p_partkey", *measures]).map_batches(
        to_long, batch_format="pyarrow", zero_copy_batch=True
    )


UNPIVOT_SQL = """
SELECT p_partkey, 'p_size' AS measure, CAST(p_size AS DOUBLE) AS value FROM part
UNION ALL
SELECT p_partkey, 'p_retailprice' AS measure, CAST(p_retailprice AS DOUBLE) AS value FROM part
"""


def percent_rank_orders(sf_dir: str):
    """Window percent_rank per customer, integer-exact: emits rank and
    partition count as integers plus percent_rank scaled to basis points
    via integer floor-division — float-free, so the value hash matches
    the oracle bit-for-bit. Per-key machinery: within-batch nothing can
    be final (rank needs the whole partition), so orders shuffle by
    coarse customer-hash bucket and ONE vectorized pandas pass per bucket
    ranks every partition in it (same shape as window_user_running)."""
    import pandas as pd

    ds = _read(
        sf_dir, "orders", columns=["o_custkey", "o_orderkey", "o_totalprice"]
    )
    nb = _buckets_for(sf_dir, "orders")

    def bucket(df: pd.DataFrame) -> pd.DataFrame:
        h = pd.util.hash_array(df["o_custkey"].to_numpy())
        return df.assign(_grp=(h % nb).astype("int32"))

    def rank_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=["_grp"]).sort_values(
            ["o_custkey", "o_totalprice", "o_orderkey"], kind="stable"
        )
        g = df.groupby("o_custkey", sort=False)
        rnk = g["o_totalprice"].rank(method="min").astype("int64")
        cnt = g["o_custkey"].transform("size").astype("int64")
        pr_bp = ((rnk - 1) * 10000) // (cnt - 1).where(cnt > 1, 1)
        return df.assign(
            rnk=rnk, part_n=cnt, pr_bp=pr_bp.where(cnt > 1, 0).astype("int64")
        )

    return (
        ds.map_batches(bucket, batch_format="pandas")
        .groupby("_grp")
        .map_groups(rank_bucket, batch_format="pandas")
    )


PERCENT_RANK_SQL = """
SELECT o_custkey, o_orderkey, o_totalprice,
       CAST(rnk AS BIGINT) AS rnk, CAST(part_n AS BIGINT) AS part_n,
       CASE WHEN part_n = 1 THEN 0
            ELSE (rnk - 1) * 10000 // (part_n - 1) END AS pr_bp
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         rank() OVER (PARTITION BY o_custkey ORDER BY o_totalprice) AS rnk,
         COUNT(*) OVER (PARTITION BY o_custkey) AS part_n
  FROM orders
)
"""


def sample2_orders_per_customer(sf_dir: str):
    """Deterministic per-key reservoir sample (k=2 orders per customer):
    priority = Knuth multiplicative hash of the row id, computable
    identically in SQL, so the sample is EXACT-oracle-checkable — unlike
    random() sampling. Physically it is the same combiner-bounded
    top_n_per_key shuffle as grouped top-N: at most k rows per key leave
    any batch regardless of group size (the scale answer to 'give me k
    examples per user over 100 TB')."""
    import pandas as pd

    from datax_ray.functions.relational import top_n_per_key

    ds = _read(sf_dir, "orders", columns=["o_custkey", "o_orderkey"])

    def prio(df: pd.DataFrame) -> pd.DataFrame:
        # Knuth multiplicative hash in uint32 space — bit-identical to the
        # oracle's (o_orderkey * 2654435761) % 4294967296.
        h = (df["o_orderkey"].to_numpy().astype(np.uint64) * 2654435761) % (1 << 32)
        return df.assign(prio=h.astype("int64"))

    out = top_n_per_key(
        ds.map_batches(prio, batch_format="pandas"),
        keys=["o_custkey"],
        order_cols=["prio", "o_orderkey"],
        n=2,
        num_buckets=_buckets_for(sf_dir, "orders"),
        descending=False,  # smallest priorities win: a true k-minwise sample
    )

    def cast_out(df: pd.DataFrame) -> pd.DataFrame:
        return df[["o_custkey", "o_orderkey", "prio"]]

    return out.map_batches(cast_out, batch_format="pandas")


SAMPLE2_SQL = """
SELECT o_custkey, o_orderkey, prio
FROM (
  -- HUGEINT: BIGINT would overflow for orderkeys above ~3.47e9 (large
  -- SFs), while the engine wraps in uint64; (a*b) % 2^32 is identical
  -- under both because 2^32 divides 2^64.
  SELECT o_custkey, o_orderkey,
         CAST((CAST(o_orderkey AS HUGEINT) * 2654435761) % 4294967296 AS BIGINT) AS prio,
         row_number() OVER (
           PARTITION BY o_custkey
           ORDER BY (CAST(o_orderkey AS HUGEINT) * 2654435761) % 4294967296,
                    o_orderkey
         ) AS rn
  FROM orders
) WHERE rn <= 2
"""


def term_postings_lookup(sf_dir: str):
    """Inverted-index probe: the distinct postings (term, doc_id) for a
    small query-term set. The term filter applies INSIDE the tokenizing
    map task, so only matching postings ever shuffle — probing 3 terms
    over a 100 TB corpus moves O(matching docs) rows, not the token
    stream. Dedup via the distinct-pair combiner (partial_agg on the
    pair key with count sink discarded)."""
    from datax_ray.functions.relational import partial_agg

    terms = ["merge", "spark", "window"]

    def postings(t: pa.Table) -> pa.Table:
        flat, ids = _tokens_with_doc(t, "doc_id")
        tbl = pa.table({"term": flat, "doc_id": ids})
        tbl = tbl.filter(pc.is_in(tbl["term"], value_set=pa.array(terms)))
        return tbl.group_by(["term", "doc_id"], use_threads=False).aggregate([])

    hits = _read(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
        postings, batch_format="pyarrow", zero_copy_batch=True
    )
    dedup = partial_agg(
        hits,
        keys=["term", "doc_id"],
        counts="_c",
        num_buckets=_buckets_for(sf_dir, "documents"),
    )

    def drop_cnt(t: pa.Table) -> pa.Table:
        return t.select(["term", "doc_id"])

    return dedup.map_batches(drop_cnt, batch_format="pyarrow")


TERM_POSTINGS_SQL = """
SELECT DISTINCT term, doc_id
FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents)
WHERE term IN ('merge', 'spark', 'window')
"""


def scrub_pii_docs(sf_dir: str):
    """PII scrubbing (training-data hygiene): redact email-shaped and
    long-digit-run tokens via compiled RE2 patterns — both engines run the
    SAME regexes (pyarrow replace_substring_regex vs DuckDB
    regexp_replace 'g'), so the redacted text hashes identically."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
    DIGITS = r"[0-9]{6,}"

    def fn(t: pa.Table) -> pa.Table:
        s = pc.replace_substring_regex(t["text"], pattern=EMAIL, replacement="<EMAIL>")
        s = pc.replace_substring_regex(s, pattern=DIGITS, replacement="<NUM>")
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "scrubbed": s,
                "redacted": pc.invert(pc.equal(s, t["text"])),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


SCRUB_SQL = r"""
SELECT doc_id,
       regexp_replace(regexp_replace(text,
           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
           '[0-9]{6,}', '<NUM>', 'g') AS scrubbed,
       regexp_replace(regexp_replace(text,
           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
           '[0-9]{6,}', '<NUM>', 'g') <> text AS redacted
FROM documents
"""


def tfidf_top_terms(sf_dir: str, k: int = 3):
    """Corpus-level TF-IDF scoring, fully distributed with NO join stage:
    per-batch tokenize gives the exact global (doc, term) tf table in one
    map (a document's tokens all come from its single row, so the
    per-batch count is final); tf rows then shuffle ONCE by term-hash
    bucket, where df(term) = the bucket-local row count per term (tf rows
    are globally unique per (doc, term)) — the vocabulary never
    broadcasts and never joins; finally per-doc top-k inside coarse
    doc-hash buckets. idf is integer-scaled (n_docs*1000 // df) so both
    engines rank and hash identically — no float log in the compare
    path. Two sort-shuffles total; the former df-aggregate + hash-join
    plan cost three exchanges and 16s of join-actor CPU at sf0.1."""
    from datax_ray.functions.relational import key_buckets

    n_docs = parquet_rows(os.path.join(sf_dir, "documents.parquet"))
    num_buckets = _buckets_for(sf_dir, "documents")
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def term_counts(t: pa.Table) -> pa.Table:
        flat, ids = _tokens_with_doc(t, "doc_id")
        g = (
            pa.table({"doc_id": ids, "term": flat})
            .group_by(["doc_id", "term"], use_threads=False)
            .aggregate([([], "count_all")])
            .rename_columns(["doc_id", "term", "tf"])
        )
        return g.append_column("_grp", key_buckets(g, ["term"], num_buckets))

    tf = ds.map_batches(term_counts, batch_format="pyarrow", zero_copy_batch=True)

    def score_bucket(t: pa.Table) -> pa.Table:
        # All tf rows of a term co-locate here; rows are unique per
        # (doc, term), so df = occurrences of the term in this bucket.
        t = t.drop_columns(["_grp"])
        term = t["term"]
        if isinstance(term, pa.ChunkedArray):
            term = term.combine_chunks()
        idxs = pc.dictionary_encode(term).indices.to_numpy(zero_copy_only=False)
        dfc = np.bincount(idxs)
        idf = (np.int64(n_docs) * 1000) // dfc
        score = t["tf"].to_numpy(zero_copy_only=False) * idf[idxs]
        out = pa.table(
            {
                "doc_id": t["doc_id"],
                "term": t["term"],
                "score_milli": pa.array(score, pa.int64()),
            }
        )
        return out.append_column("_grp", key_buckets(out, ["doc_id"], num_buckets))

    def topk(t: pa.Table) -> pa.Table:
        t = t.drop_columns(["_grp"]).sort_by(
            [("doc_id", "ascending"), ("score_milli", "descending"),
             ("term", "ascending")]
        )
        d = t["doc_id"].to_numpy(zero_copy_only=False)
        new_run = np.ones(len(d), dtype=bool)
        new_run[1:] = d[1:] != d[:-1]
        start_idx = np.flatnonzero(new_run)
        run_id = np.cumsum(new_run) - 1
        rnk = np.arange(len(d)) - start_idx[run_id] + 1
        t = t.append_column("rnk", pa.array(rnk, pa.int64()))
        return t.filter(pa.array(rnk <= k)).select(
            ["doc_id", "term", "rnk", "score_milli"]
        )

    return (
        tf.groupby("_grp")
        .map_groups(score_bucket, batch_format="pyarrow")
        .groupby("_grp")
        .map_groups(topk, batch_format="pyarrow")
    )


TFIDF_SQL = """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
), tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY doc_id, term
), df AS (
  SELECT term, COUNT(*) AS df FROM tf GROUP BY term
), n AS (SELECT COUNT(*) AS n FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term, tf.tf * ((n.n * 1000) // df.df) AS score_milli
  FROM tf JOIN df USING (term) CROSS JOIN n
), ranked AS (
  SELECT doc_id, term, score_milli,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY score_milli DESC, term) AS rnk
  FROM scored
)
SELECT doc_id, term, CAST(rnk AS BIGINT) AS rnk,
       CAST(score_milli AS BIGINT) AS score_milli
FROM ranked WHERE rnk <= 3
"""


def bm25_topk_docs(sf_dir: str, terms: tuple[str, ...] = ("join", "merge", "spark"),
                   k: int = 10):
    """BM25-style retrieval scoring over the corpus (k1=1.2, b=0.75) for a
    fixed query — the search-quality primitive next to tfidf_top_terms.
    ALL arithmetic is integer (idf milli-scaled as n_docs*1000//df, avgdl
    milli-scaled, one floor division per (doc, term) component) so DuckDB
    reproduces every score bit-for-bit — no float log/sum in the compare
    path. Int64-safe while n_docs*1000 * tf * 22 * avgdl_milli < 2^63
    (holds through ~1e7 docs at this corpus shape; beyond that drop the
    idf scale to match).

    Scale shape: TWO streaming passes and no data shuffle at all — each
    document lives wholly inside its batch row, so pass 1 is a tiny
    global-stats combiner (one row per batch: n_docs, n_tokens, df per
    query term — driver folds O(|terms|) numbers), pass 2 scores each
    batch against the broadcast globals, and only the per-batch top-k
    partials move (relational.top_k tree)."""
    from datax_ray.functions.relational import top_k

    terms = tuple(terms)
    term_arr = pa.array(list(terms), pa.string())

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def _tok(t: pa.Table):
        toks = pc.split_pattern(pc.fill_null(t["text"], ""), " ")
        flat = pc.list_flatten(toks)
        par = pc.list_parent_indices(toks)
        dl = pc.list_value_length(toks)
        return flat, par, dl

    # pass 1: one combiner row per batch -> driver folds O(|terms|) ints
    def stats(t: pa.Table) -> pa.Table:
        flat, par, dl = _tok(t)
        hit = pc.is_in(flat, value_set=term_arr)
        tt = pa.table({"p": par.filter(hit), "term": flat.filter(hit)})
        docs_per_term = (
            tt.group_by(["p", "term"], use_threads=False)
            .aggregate([])
            .group_by(["term"], use_threads=False)
            .aggregate([([], "count_all")])
        )
        dfm = dict(
            zip(
                docs_per_term["term"].to_pylist(),
                docs_per_term["count_all"].to_pylist(),
            )
        )
        row = {
            "n_docs": [t.num_rows],
            "n_tokens": [int(pc.sum(dl).as_py() or 0)],
        }
        for i, term in enumerate(terms):
            row[f"df_{i}"] = [int(dfm.get(term, 0))]
        return pa.table(row)

    cols = ["n_docs", "n_tokens"] + [f"df_{i}" for i in range(len(terms))]
    folded = ds.map_batches(stats, batch_format="pyarrow").sum(cols)
    n_docs = int(folded["sum(n_docs)"])
    n_tokens = int(folded["sum(n_tokens)"])
    avgdl_milli = (1000 * n_tokens) // max(1, n_docs)
    idf_milli = {
        t_: (n_docs * 1000) // folded[f"sum(df_{i})"]
        for i, t_ in enumerate(terms)
        if folded[f"sum(df_{i})"]
    }

    # pass 2: score each batch against the broadcast globals; only top-k
    # partials leave the batch
    def score(t: pa.Table) -> pa.Table:
        flat, par, dl = _tok(t)
        hit = pc.is_in(flat, value_set=term_arr)
        tt = pa.table({"p": par.filter(hit), "term": flat.filter(hit)})
        tf = (
            tt.group_by(["p", "term"], use_threads=False)
            .aggregate([([], "count_all")])
        )
        p = tf["p"].to_numpy(zero_copy_only=False).astype(np.int64)
        tf_n = tf["count_all"].to_numpy(zero_copy_only=False).astype(np.int64)
        idf = np.array(
            [idf_milli.get(x, 0) for x in tf["term"].to_pylist()], dtype=np.int64
        )
        dl_np = dl.to_numpy(zero_copy_only=False).astype(np.int64)[p]
        num = idf * tf_n * 22 * avgdl_milli
        den = 10 * tf_n * avgdl_milli + 3 * avgdl_milli + 9000 * dl_np
        comp = num // den
        scores = np.zeros(t.num_rows, dtype=np.int64)
        np.add.at(scores, p, comp)
        keep = scores > 0
        return pa.table(
            {
                "doc_id": pc.cast(t["doc_id"], pa.int64()).filter(pa.array(keep)),
                "bm25_scaled": pa.array(scores[keep]),
            }
        )

    scored = ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)
    return top_k(scored, by="bm25_scaled", k=k, tie_col="doc_id")


BM25_SQL = """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
), dl AS (
  SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY doc_id
), g AS (SELECT COUNT(*) AS n_docs FROM documents),
l AS (SELECT COUNT(*) AS n_tokens FROM tok),
q AS (SELECT unnest(['join','merge','spark']) AS term),
tf AS (
  SELECT doc_id, tok.term, COUNT(*) AS tf
  FROM tok JOIN q ON tok.term = q.term GROUP BY doc_id, tok.term
), df AS (
  SELECT term, COUNT(*) AS df FROM tf GROUP BY term
), avg AS (
  SELECT (1000 * l.n_tokens) // g.n_docs AS avgdl_milli FROM l, g
), comp AS (
  SELECT tf.doc_id,
         (((g.n_docs * 1000) // df.df) * tf.tf * 22 * avg.avgdl_milli)
           // (10 * tf.tf * avg.avgdl_milli + 3 * avg.avgdl_milli
               + 9000 * dl.dl) AS comp
  FROM tf
  JOIN df USING (term) JOIN dl USING (doc_id)
  CROSS JOIN g CROSS JOIN avg
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(SUM(comp) AS BIGINT) AS bm25_scaled
FROM comp GROUP BY doc_id
ORDER BY bm25_scaled DESC, doc_id LIMIT 10
"""


def heavy_hitters_users(sf_dir: str, k: int = 32):
    """Misra-Gries frequent-items sketch over events.user_id (rows-only:
    counts are guaranteed lower bounds, not exact — the bound est >=
    true - O(N/k) and the every-true-heavy-hitter-surfaces property are
    pytest-verified, like the HLL error floor). Bounded memory: no stage
    ever holds more than buckets x k counters whatever N is
    (functions/sketch.py:heavy_hitters)."""
    from datax_ray.functions.sketch import heavy_hitters

    return heavy_hitters(
        _read(sf_dir, "events", columns=["user_id"]), "user_id", k=k
    )


def funnel_signup_click_purchase(sf_dir: str):
    """Ordered-sequence funnel over the event stream: how many users
    completed signup -> (later) click -> (later) purchase, counting each
    step at its EARLIEST valid time (step i's timestamp = min ts of the
    step event strictly after step i-1's). The product-analytics twin of
    sessionize — same coarse user-hash co-location, one vectorized pass
    per bucket (sorted arrays + per-user minimum.at; no Python per user),
    then a 3-row fold."""
    from datax_ray.functions.relational import key_buckets, partial_agg

    num_buckets = _buckets_for(sf_dir, "events")
    ds = _read(sf_dir, "events", columns=["user_id", "event_type", "ts"])

    def add_grp(t: pa.Table) -> pa.Table:
        return t.append_column("_grp", key_buckets(t, ["user_id"], num_buckets))

    STEPS = ("signup", "click", "purchase")

    def per_bucket(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            t, sort_keys=[("user_id", "ascending"), ("ts", "ascending")]
        )
        t = t.take(idx)
        n = t.num_rows
        if n == 0:
            return pa.table(
                {"step": pa.array([], pa.int64()), "users": pa.array([], pa.int64())}
            )
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        ts = pc.cast(t["ts"], pa.int64()).to_numpy()
        typ = t["event_type"].to_numpy(zero_copy_only=False)
        seg = np.zeros(n, dtype=np.int64)
        if n > 1:
            seg[1:] = np.cumsum(uid[1:] != uid[:-1])
        n_users = int(seg[-1]) + 1
        INF = np.iinfo(np.int64).max
        prev = np.full(n_users, -np.iinfo(np.int64).max, dtype=np.int64)
        counts = []
        for step in STEPS:
            cur = np.full(n_users, INF, dtype=np.int64)
            sel = (typ == step) & (ts > prev[seg])
            np.minimum.at(cur, seg[sel], ts[sel])
            counts.append(int((cur < INF).sum()))
            prev = cur
        return pa.table(
            {
                "step": pa.array(np.arange(1, len(STEPS) + 1, dtype=np.int64)),
                "users": pa.array(np.asarray(counts, dtype=np.int64)),
            }
        )

    per = ds.map_batches(add_grp, batch_format="pyarrow", zero_copy_batch=True) \
        .groupby("_grp").map_groups(per_bucket, batch_format="pyarrow")
    return partial_agg(per, keys=["step"], sums={"users": "users"},
                       single_reduce=True)


FUNNEL3_SQL = """
WITH s1 AS (
  SELECT user_id, MIN(ts) AS t1 FROM events
  WHERE event_type = 'signup' GROUP BY user_id
), s2 AS (
  SELECT e.user_id, MIN(e.ts) AS t2 FROM events e JOIN s1 USING (user_id)
  WHERE e.event_type = 'click' AND e.ts > s1.t1 GROUP BY e.user_id
), s3 AS (
  SELECT e.user_id, MIN(e.ts) AS t3 FROM events e JOIN s2 USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY e.user_id
)
SELECT * FROM (
  SELECT 1 AS step, COUNT(*) AS users FROM s1
  UNION ALL SELECT 2, COUNT(*) FROM s2
  UNION ALL SELECT 3, COUNT(*) FROM s3
) ORDER BY step
"""


def corpus_drift_terms(sf_dir: str, k: int = 20):
    """Distribution-drift detector between two corpus slices — the
    data-quality primitive that answers "did the held-out slice's term
    distribution shift vs the training pool?" (source='src0' vs the rest).
    Per term: |share_ppm_heldout - share_ppm_rest| with ppm shares as
    INTEGER floor divisions, so both engines rank and hash identically.

    Scale shape: pass 1 is a one-row-per-batch totals combiner (token
    count per side); pass 2 is per-batch (term, side) count combiners into
    the standard coarse term-hash reduce (partial_agg), a scoring map
    against the two broadcast totals, and the top-k tree. The vocabulary
    never broadcasts; nothing materializes driver-side but 2 ints + k
    rows."""
    from datax_ray.functions.relational import partial_agg, top_k

    ds = _read(sf_dir, "documents", columns=["text", "source"])

    def _sides(t: pa.Table):
        toks = pc.split_pattern(pc.fill_null(t["text"], ""), " ")
        flat = pc.list_flatten(toks)
        par = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        held = pc.equal(t["source"], "src0").to_numpy(zero_copy_only=False)
        ha = held[par].astype(np.int64)
        return flat, ha

    def totals(t: pa.Table) -> pa.Table:
        _, ha = _sides(t)
        return pa.table(
            {"ta": [int(ha.sum())], "tb": [int(len(ha) - ha.sum())]}
        )

    tot = ds.map_batches(totals, batch_format="pyarrow").sum(["ta", "tb"])
    ta, tb = max(1, int(tot["sum(ta)"])), max(1, int(tot["sum(tb)"]))

    def counts(t: pa.Table) -> pa.Table:
        flat, ha = _sides(t)
        return pa.table(
            {
                "term": flat,
                "ca": pa.array(ha),
                "cb": pa.array(np.int64(1) - ha),
            }
        )

    agg = partial_agg(
        ds.map_batches(counts, batch_format="pyarrow", zero_copy_batch=True),
        keys=["term"],
        sums={"ca": "ca", "cb": "cb"},
        num_buckets=_buckets_for(sf_dir, "documents"),
    )

    def score(t: pa.Table) -> pa.Table:
        ca = t["ca"].to_numpy(zero_copy_only=False).astype(np.int64)
        cb = t["cb"].to_numpy(zero_copy_only=False).astype(np.int64)
        drift = np.abs((ca * 1_000_000) // ta - (cb * 1_000_000) // tb)
        return pa.table({"term": t["term"], "drift_ppm": pa.array(drift)})

    scored = agg.map_batches(score, batch_format="pyarrow")
    return top_k(scored, by="drift_ppm", k=k, tie_col="term")


DRIFT_SQL = """
WITH tok AS (
  SELECT CASE WHEN source = 'src0' THEN 1 ELSE 0 END AS held,
         unnest(string_split(text, ' ')) AS term
  FROM documents
), tot AS (
  SELECT SUM(held) AS ta, SUM(1 - held) AS tb FROM tok
), c AS (
  SELECT term, SUM(held) AS ca, SUM(1 - held) AS cb FROM tok GROUP BY term
)
SELECT term,
       CAST(abs((c.ca * 1000000) // tot.ta
                - (c.cb * 1000000) // tot.tb) AS BIGINT) AS drift_ppm
FROM c CROSS JOIN tot
ORDER BY drift_ppm DESC, term LIMIT 20
"""


# ----------------------------------------------------------------- text --


def dedup_exact_docs(sf_dir: str):
    return exact_dedup(
        _read(sf_dir, "documents", columns=["doc_id", "text"]),
        num_buckets=_buckets_for(sf_dir, "documents"),
    )


DEDUP_EXACT_SQL = "SELECT MIN(doc_id) AS doc_id, text FROM documents GROUP BY text"


def text_stats(sf_dir: str):
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def fn(t: pa.Table) -> pa.Table:
        t = add_quality_signals(t)
        return t.select(["doc_id", "n_chars_calc", "n_tokens", "n_periods", "n_upper"])

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


TEXT_STATS_SQL = """
SELECT doc_id,
       CAST(length(text) AS BIGINT) AS n_chars_calc,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
       CAST(length(text) - length(replace(text, '.', '')) AS BIGINT) AS n_periods,
       CAST(length(text) - length(regexp_replace(text, '[A-Z]', '', 'g')) AS BIGINT) AS n_upper
FROM documents
"""


def doc_fingerprints(sf_dir: str):
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def fn(t: pa.Table) -> pa.Table:
        return add_fingerprint(t).select(["doc_id", "fingerprint"])

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


FINGERPRINT_SQL = "SELECT doc_id, md5(text) AS fingerprint FROM documents"


def lang_id_docs(sf_dir: str):
    """Heuristic language ID (rows-only: not SQL-expressible)."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text", "lang"])
    out = ds.map_batches(LangId, batch_format="pyarrow", concurrency=(1, 4))
    return out.map_batches(
        lambda t: t.select(["doc_id", "lang", "lang_pred"]), batch_format="pyarrow"
    )


# --------------------------------------------------------------- events --


def events_sessionize(sf_dir: str):
    from datax_ray.functions.windows import sessionize

    out = sessionize(
        _read(sf_dir, "events", columns=["user_id", "ts", "event_id"]),
        gap_us=30 * 60 * 1_000_000,
        num_buckets=_buckets_for(sf_dir, "events"),
    )

    def cast_cols(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": t["user_id"],
                "session_id": pc.cast(t["session_id"], pa.int64()),
                "n_events": pc.cast(t["n_events"], pa.int64()),
                "t_start": pc.cast(t["t_start"], pa.timestamp("us")),
                "t_end": pc.cast(t["t_end"], pa.timestamp("us")),
            }
        )

    return out.map_batches(cast_cols, batch_format="pyarrow")


SESSIONIZE_SQL = """
WITH x AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL THEN 0
              WHEN ts - lag(ts) OVER w > INTERVAL 30 MINUTE THEN 1
              ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), y AS (
  SELECT user_id, ts,
         SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS session_id
  FROM x
)
SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
       COUNT(*) AS n_events, MIN(ts) AS t_start, MAX(ts) AS t_end
FROM y GROUP BY user_id, session_id
"""


def events_tumbling(sf_dir: str):
    ds = _read(sf_dir, "events", columns=["user_id", "ts", "value"])

    def prep(t: pa.Table) -> pa.Table:
        ts_us = pc.cast(t["ts"], pa.int64())
        hour = 3_600_000_000
        win = pc.multiply(pc.divide(ts_us, hour), hour)
        return pa.table(
            {
                "user_id": t["user_id"],
                "window_start": pc.cast(win, pa.timestamp("us")),
                "value_micros": _cents(t["value"], 1_000_000),
            }
        )

    return partial_agg(
        ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True),
        keys=["user_id", "window_start"],
        sums={"value_micros": "sum_value_micros"},
        counts="n_events",
    )


TUMBLING_SQL = """
SELECT user_id, time_bucket(INTERVAL 1 HOUR, ts) AS window_start,
       CAST(SUM(CAST(ROUND(value * 1000000) AS BIGINT)) AS BIGINT) AS sum_value_micros,
       COUNT(*) AS n_events
FROM events GROUP BY user_id, window_start
"""


def events_hopping(sf_dir: str):
    """Hopping/sliding window (1h window, 30min hop): each event counted in
    2 overlapping windows."""
    from datax_ray.functions.windows import hopping_window_counts

    ds = _read(sf_dir, "events", columns=["user_id", "ts", "value"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": t["user_id"],
                "ts": t["ts"],
                "value_micros": _cents(t["value"], 1_000_000),
            }
        )

    out = hopping_window_counts(
        ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True),
        value_col="value_micros",
        window_us=3_600_000_000,
        hop_us=1_800_000_000,
    )

    def rename(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": t["user_id"],
                "window_start": pc.cast(t["window_start"], pa.timestamp("us")),
                "sum_value_micros": pc.cast(t["sum_value"], pa.int64()),
                "n_events": pc.cast(t["n_events"], pa.int64()),
            }
        )

    return out.map_batches(rename, batch_format="pyarrow")


HOPPING_SQL = """
WITH h AS (SELECT unnest(range(2)) AS i),
x AS (
  SELECT e.user_id, e.value,
         make_timestamp((epoch_us(e.ts) // 1800000000 - h.i) * 1800000000) AS window_start
  FROM events e, h
)
SELECT user_id, window_start,
       CAST(SUM(CAST(ROUND(value * 1000000) AS BIGINT)) AS BIGINT) AS sum_value_micros,
       COUNT(*) AS n_events
FROM x GROUP BY user_id, window_start
"""


def window_user_running(sf_dir: str):
    """SQL window functions per key: row_number, lag-gap and running sum
    over each user's event stream ordered by (ts, event_id). Coarse
    key-hash buckets + one vectorized pass per bucket (functions/ordered.py)."""
    from datax_ray.functions.ordered import keyed_window

    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "ts", "value"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": t["event_id"],
                "user_id": t["user_id"],
                "ts": t["ts"],
                "value_micros": _cents(t["value"], 1_000_000),
            }
        )

    out = keyed_window(
        ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True),
        num_buckets=_buckets_for(sf_dir, "events"),
    )

    def rename(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": t["event_id"],
                "user_id": t["user_id"],
                "rn": pc.cast(t["rn"], pa.int64()),
                "gap_us": pc.cast(t["gap_us"], pa.int64()),
                "run_value_micros": pc.cast(t["run_value"], pa.int64()),
            }
        )

    return out.map_batches(rename, batch_format="pyarrow")


WINDOW_SQL = """
SELECT event_id, user_id,
       CAST(row_number() OVER w AS BIGINT) AS rn,
       CAST(COALESCE(epoch_us(ts) - lag(epoch_us(ts)) OVER w, -1) AS BIGINT) AS gap_us,
       CAST(SUM(CAST(ROUND(value * 1000000) AS BIGINT))
            OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS run_value_micros
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


def cdc_scd2_history(sf_dir: str):
    """SCD Type-2 history of the derived transcript change stream: one row
    per non-delete VERSION with [valid_from, valid_to) interval and
    is_current flag — the warehouse-history twin of the LWW merge (keep
    every superseded version instead of folding to the latest). Derivation
    runs inside map_batches (sources/derive.py:derive_changes); history
    assembly is the coarse-bucket window stage in functions/ordered.py."""
    from datax_ray.functions.ordered import scd2_history
    from datax_ray.sources.derive import derive_changes

    changes = _read(sf_dir, "events", columns=["event_id", "ts", "user_id"]).map_batches(
        derive_changes, batch_format="pyarrow", zero_copy_batch=True
    )
    out = scd2_history(changes, num_buckets=_buckets_for(sf_dir, "events"))

    def rename(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "conv_id": t["conv_id"],
                "turn_idx": pc.cast(t["turn_idx"], pa.int32()),
                "version": pc.cast(t["version"], pa.int64()),
                "role": t["role"],
                "text": t["text"],
                "valid_from": pc.cast(t["valid_from"], pa.timestamp("us")),
                "valid_to": pc.cast(t["valid_to"], pa.timestamp("us")),
                "is_current": t["is_current"],
            }
        )

    return out.map_batches(rename, batch_format="pyarrow")


SCD2_SQL = """
WITH c AS (
  SELECT event_id AS lsn, ts,
         CASE WHEN event_id % 10 = 0 THEN 'delete'
              WHEN event_id % 2 = 0 THEN 'insert' ELSE 'update' END AS op,
         'conv-' || CAST(user_id AS VARCHAR) AS conv_id,
         CAST(event_id % 25 AS INTEGER) AS turn_idx,
         CASE WHEN event_id % 10 = 0 THEN NULL
              WHEN event_id % 2 = 0 THEN 'user' ELSE 'assistant' END AS role,
         CASE WHEN event_id % 10 = 0 THEN NULL
              ELSE 'payload-' || CAST(event_id AS VARCHAR) END AS text
  FROM events
), w AS (
  SELECT *, CAST(row_number() OVER k AS BIGINT) AS version,
         lead(ts) OVER k AS valid_to
  FROM c WINDOW k AS (PARTITION BY conv_id, turn_idx ORDER BY ts, lsn)
)
SELECT conv_id, turn_idx, version, role, text,
       ts AS valid_from, valid_to,
       (valid_to IS NULL) AS is_current
FROM w WHERE op <> 'delete'
"""


def cdc_patch_upsert(sf_dir: str):
    """Column-level LWW merge of a sparse partial-update ("patch") change
    stream — Debezium partial payloads / Hudi PartialUpdateAvroPayload
    semantics: each event SETS only the columns it carries (non-null);
    the final row is, per column, the value from the highest-lsn event
    that set it. The per-column LWW register is associative+commutative
    (stages/merge.py:reduce_patch_partials), so the SAME kernel runs as
    within-batch combiner and per-bucket reducer — only per-key partials
    (value + winner-lsn per column) ever shuffle, O(distinct keys per
    batch), never the stream. Derivation: sources/derive.py:derive_patches
    (shared rule with PATCH_SQL)."""
    from datax_ray.sources.derive import derive_patches
    from datax_ray.stages.merge import (
        finalize_patches,
        reduce_patch_partials,
        to_patch_partials,
    )
    from datax_ray.stages.partitioning import part_ids_for

    PAYLOAD = ("role", "text", "tool")
    nb = _buckets_for(sf_dir, "events")
    ds = _read(sf_dir, "events", columns=["event_id", "user_id"])

    def combiner(t: pa.Table) -> pa.Table:
        part = to_patch_partials(derive_patches(t), PAYLOAD)
        part = reduce_patch_partials(part, PAYLOAD)
        # bucket on conv_id hash: every turn of a conv co-locates (a
        # key-exact superset — the per-bucket reduce is key-exact anyway)
        return part.append_column(
            "_pb", part_ids_for(part["conv_id"], part["turn_idx"], nb)
        )

    def per_bucket(t: pa.Table) -> pa.Table:
        out = finalize_patches(
            reduce_patch_partials(t.drop_columns(["_pb"]), PAYLOAD), PAYLOAD
        )
        return pa.table(
            {
                "conv_id": out["conv_id"],
                "turn_idx": pc.cast(out["turn_idx"], pa.int32()),
                "role": out["role"],
                "text": out["text"],
                "tool": out["tool"],
            }
        )

    return (
        ds.map_batches(combiner, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_pb")
        .map_groups(per_bucket, batch_format="pyarrow")
    )


PATCH_SQL = """
WITH p AS (
  SELECT event_id AS lsn,
         'conv-' || CAST(user_id AS VARCHAR) AS conv_id,
         CAST(event_id % 25 AS INTEGER) AS turn_idx,
         CASE WHEN event_id % 3 = 0 THEN
              (CASE WHEN event_id % 2 = 0 THEN 'user' ELSE 'assistant' END)
         END AS role,
         CASE WHEN event_id % 3 <> 0
              THEN 'payload-' || CAST(event_id AS VARCHAR) END AS text,
         CASE WHEN event_id % 5 = 0
              THEN 'tool-' || CAST(event_id % 4 AS VARCHAR) END AS tool
  FROM events
)
SELECT conv_id, turn_idx,
       arg_max(role, lsn) FILTER (WHERE role IS NOT NULL) AS role,
       arg_max(text, lsn) FILTER (WHERE text IS NOT NULL) AS text,
       arg_max(tool, lsn) FILTER (WHERE tool IS NOT NULL) AS tool
FROM p GROUP BY conv_id, turn_idx
"""


def rollup_order_stats(sf_dir: str):
    """Grouping sets (ROLLUP): order counts + exact cent-sums at three
    levels — (status, priority), (status), (). One pass: each batch emits
    combiner partials for all three levels (coarser levels derived from the
    finest partial, so the extra work per batch is O(distinct keys)), then
    one single-task reduce (the key space is statuses x priorities)."""
    SENT = "\x00ALL"  # sentinel for rolled-up key (pandas groupby drops real NULLs)
    ds = _read(
        sf_dir, "orders", columns=["o_orderstatus", "o_orderpriority", "o_totalprice"]
    )

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderstatus": t["o_orderstatus"],
                "o_orderpriority": t["o_orderpriority"],
                "price_cents": _cents(t["o_totalprice"]),
            }
        )

    import pandas as pd

    def levels(df: pd.DataFrame) -> pd.DataFrame:
        g0 = df.assign(n_orders=1).groupby(
            ["o_orderstatus", "o_orderpriority"], as_index=False
        ).agg(n_orders=("n_orders", "sum"), sum_price_cents=("price_cents", "sum"))
        g1 = g0.groupby("o_orderstatus", as_index=False)[
            ["n_orders", "sum_price_cents"]
        ].sum().assign(o_orderpriority=SENT)
        g2 = pd.DataFrame(
            {
                "o_orderstatus": [SENT],
                "o_orderpriority": [SENT],
                "n_orders": [g0["n_orders"].sum()],
                "sum_price_cents": [g0["sum_price_cents"].sum()],
            }
        )
        cols = ["o_orderstatus", "o_orderpriority", "n_orders", "sum_price_cents"]
        return pd.concat([g0[cols], g1[cols], g2[cols]], ignore_index=True)

    out = partial_agg(
        ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True).map_batches(
            levels, batch_format="pandas"
        ),
        keys=["o_orderstatus", "o_orderpriority"],
        sums={"n_orders": "n_orders", "sum_price_cents": "sum_price_cents"},
        single_reduce=True,
    )

    def unsentinel(df: pd.DataFrame) -> pd.DataFrame:
        for c in ("o_orderstatus", "o_orderpriority"):
            df[c] = df[c].where(df[c] != SENT, None)
        return df

    return out.map_batches(unsentinel, batch_format="pandas")


ROLLUP_SQL = """
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
       CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_cents
FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
"""


def doc_chunks(sf_dir: str, size: int = 512, stride: int = 384,
               max_chunks: int = 100_000):
    """Fixed-size overlapping document chunking (the LLM-training prep
    step): 512-char windows every 384 chars. Vectorized by looping over
    chunk SLOTS (a handful) with a whole-column utf8 slice per slot — never
    over rows; a batch's slot count adapts to its own longest doc.
    `max_chunks` caps the slot loop (38M chars/doc at the default stride) so
    one pathological giant document cannot degenerate the loop into
    millions of single-row column ops — clip such docs upstream."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def chunks(t: pa.Table) -> pa.Table:
        schema = pa.schema(
            [("doc_id", pa.int64()), ("chunk_idx", pa.int64()), ("chunk_text", pa.string())]
        )
        if t.num_rows == 0:
            return schema.empty_table()
        lens = pc.utf8_length(t["text"])
        max_len = pc.max(lens).as_py() or 0
        parts = []
        k = 0
        while k * stride < max_len and k < max_chunks:
            start = k * stride
            mask = pc.greater(lens, start)
            sub = t.filter(mask)
            if sub.num_rows:
                parts.append(
                    pa.table(
                        {
                            "doc_id": sub["doc_id"],
                            "chunk_idx": pa.array(
                                np.full(sub.num_rows, k, dtype=np.int64)
                            ),
                            "chunk_text": pc.utf8_slice_codeunits(
                                sub["text"], start=start, stop=start + size
                            ),
                        },
                        schema=schema,
                    )
                )
            k += 1
        return pa.concat_tables(parts) if parts else schema.empty_table()

    return ds.map_batches(chunks, batch_format="pyarrow", zero_copy_batch=True)


CHUNKS_SQL = """
WITH mx AS (
  SELECT CAST(CEIL(MAX(length(text)) / 384.0) AS BIGINT) AS nk FROM documents
), k AS (
  SELECT unnest(range((SELECT nk FROM mx))) AS i
)
SELECT d.doc_id, CAST(k.i AS BIGINT) AS chunk_idx,
       substr(d.text, CAST(k.i * 384 + 1 AS BIGINT), 512) AS chunk_text
FROM documents d, k
WHERE k.i * 384 < length(d.text)
"""


def except_open_orderkeys(sf_dir: str):
    """Set difference (EXCEPT) between two LARGE datasets: order keys that
    appear in lineitem but not among finished ('F') orders. Both sides
    union into one stream tagged with side-indicator columns, then a single
    combiner aggregation sums the indicators per key and a filter keeps
    left-only keys — a fully distributed set op (rows shuffled = distinct
    keys per batch, never the raw inputs; no driver keyset), the same plan
    EXCEPT/INTERSECT take at any scale."""
    left = _read(sf_dir, "lineitem", columns=["l_orderkey"])
    right = _read(sf_dir, "orders", columns=["o_orderkey", "o_orderstatus"])

    def tag_left(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "orderkey": pc.cast(t["l_orderkey"], pa.int64()),
                "l_n": pa.array(np.ones(t.num_rows, dtype=np.int64)),
                "r_n": pa.array(np.zeros(t.num_rows, dtype=np.int64)),
            }
        )

    def tag_right(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["o_orderstatus"], "F"))
        return pa.table(
            {
                "orderkey": pc.cast(t["o_orderkey"], pa.int64()),
                "l_n": pa.array(np.zeros(t.num_rows, dtype=np.int64)),
                "r_n": pa.array(np.ones(t.num_rows, dtype=np.int64)),
            }
        )

    both = left.map_batches(tag_left, batch_format="pyarrow").union(
        right.map_batches(tag_right, batch_format="pyarrow")
    )
    out = partial_agg(
        both,
        keys=["orderkey"],
        sums={"l_n": "l_n", "r_n": "r_n"},
        num_buckets=_buckets_for(sf_dir, "orders"),
    )

    def pick(t: pa.Table) -> pa.Table:
        keep = pc.and_(pc.greater(t["l_n"], 0), pc.equal(t["r_n"], 0))
        return t.filter(keep).select(["orderkey"])

    return out.map_batches(pick, batch_format="pyarrow")


SET_EXCEPT_SQL = """
SELECT DISTINCT l_orderkey AS orderkey FROM lineitem
EXCEPT
SELECT DISTINCT o_orderkey AS orderkey FROM orders WHERE o_orderstatus = 'F'
"""


def intersect_finished_orderkeys(sf_dir: str):
    """Set INTERSECTION of two large key sets (same side-indicator-union
    plan as except_open_orderkeys, opposite filter): order keys that appear
    in lineitem AND belong to a finished order."""
    left = _read(sf_dir, "lineitem", columns=["l_orderkey"])
    right = _read(sf_dir, "orders", columns=["o_orderkey", "o_orderstatus"])

    def tag_left(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "orderkey": pc.cast(t["l_orderkey"], pa.int64()),
                "l_n": pa.array(np.ones(t.num_rows, dtype=np.int64)),
                "r_n": pa.array(np.zeros(t.num_rows, dtype=np.int64)),
            }
        )

    def tag_right(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["o_orderstatus"], "F"))
        return pa.table(
            {
                "orderkey": pc.cast(t["o_orderkey"], pa.int64()),
                "l_n": pa.array(np.zeros(t.num_rows, dtype=np.int64)),
                "r_n": pa.array(np.ones(t.num_rows, dtype=np.int64)),
            }
        )

    both = left.map_batches(tag_left, batch_format="pyarrow").union(
        right.map_batches(tag_right, batch_format="pyarrow")
    )
    out = partial_agg(
        both,
        keys=["orderkey"],
        sums={"l_n": "l_n", "r_n": "r_n"},
        num_buckets=_buckets_for(sf_dir, "orders"),
    )

    def pick(t: pa.Table) -> pa.Table:
        keep = pc.and_(pc.greater(t["l_n"], 0), pc.greater(t["r_n"], 0))
        return t.filter(keep).select(["orderkey"])

    return out.map_batches(pick, batch_format="pyarrow")


SET_INTERSECT_SQL = """
SELECT DISTINCT l_orderkey AS orderkey FROM lineitem
INTERSECT
SELECT DISTINCT o_orderkey AS orderkey FROM orders WHERE o_orderstatus = 'F'
"""


def pivot_user_event_counts(sf_dir: str):
    """PIVOT: one wide row per user with a count column per event type —
    indicator-sum combiners (the pivot happens inside map_batches, so the
    shuffle moves one wide row per user per batch, never events)."""
    TYPES = ["click", "view", "purchase", "signup", "error"]
    ds = _read(sf_dir, "events", columns=["user_id", "event_type"])

    def widen(t: pa.Table) -> pa.Table:
        cols = {"user_id": t["user_id"]}
        for ty in TYPES:
            cols[f"n_{ty}"] = pc.cast(pc.equal(t["event_type"], ty), pa.int64())
        return pa.table(cols)

    return partial_agg(
        ds.map_batches(widen, batch_format="pyarrow", zero_copy_batch=True),
        keys=["user_id"],
        sums={f"n_{ty}": f"n_{ty}" for ty in TYPES},
        num_buckets=_buckets_for(sf_dir, "events"),
    )


PIVOT_SQL = """
SELECT user_id,
       SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS n_click,
       SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS n_view,
       SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS n_purchase,
       SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS n_signup,
       SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS n_error
FROM events GROUP BY user_id
"""


def quality_filter_docs(sf_dir: str):
    """Heuristic quality gate over documents (training-data curation):
    keep docs whose token count is in a sane band and whose mean token
    length (integer ratio n_chars < 6*n_tokens — exact arithmetic, no
    float division) looks like prose, not noise. Signals come from
    functions/text.py so the SQL oracle hashes identically."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def fn(t: pa.Table) -> pa.Table:
        t = add_quality_signals(t)
        keep = pc.and_(
            pc.and_(
                pc.greater_equal(t["n_tokens"], 20), pc.less_equal(t["n_tokens"], 5000)
            ),
            pc.less(t["n_chars_calc"], pc.multiply(t["n_tokens"], 6)),
        )
        return t.filter(keep).select(["doc_id", "n_tokens", "n_chars_calc"])

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


QUALITY_SQL = """
WITH s AS (
  SELECT doc_id,
         CAST(length(text) AS BIGINT) AS n_chars_calc,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents
)
SELECT doc_id, n_tokens, n_chars_calc FROM s
WHERE n_tokens BETWEEN 20 AND 5000 AND n_chars_calc < n_tokens * 6
"""


def ngram_dup_pairs(sf_dir: str):
    """Exact n-gram-Jaccard near-dup pairs, LSH-proposed (rows-only)."""
    from datax_ray.functions.dedup import ngram_jaccard_pairs

    return ngram_jaccard_pairs(
        _read(sf_dir, "documents", columns=["doc_id", "text"]),
        threshold=0.6,
        num_buckets=_buckets_for(sf_dir, "documents"),
        est_rows=parquet_rows(os.path.join(sf_dir, "documents.parquet")),
    )


def dedup_cluster_docs(sf_dir: str):
    """Near-dup CLUSTER assignment (rows-only: LSH-proposed pairs are
    approximate by design): ngram-Jaccard verified pairs → distributed
    min-label connected components → (doc_id, cluster_id). The step that
    turns pairwise dedup into keep-one-per-cluster curation; pytest checks
    it against a sequential union-find on the same pairs."""
    from datax_ray.functions.dedup import ngram_jaccard_pairs
    from datax_ray.functions.graph import connected_components

    pairs = ngram_jaccard_pairs(
        _read(sf_dir, "documents", columns=["doc_id", "text"]),
        threshold=0.6,
        num_buckets=_buckets_for(sf_dir, "documents"),
        est_rows=parquet_rows(os.path.join(sf_dir, "documents.parquet")),
    )
    out = connected_components(
        pairs, num_buckets=_buckets_for(sf_dir, "documents")
    )

    def cast_cols(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": pc.cast(t["doc_id"], pa.int64()),
                "cluster_id": pc.cast(t["cluster_id"], pa.int64()),
            }
        )

    return out.map_batches(cast_cols, batch_format="pyarrow")


def dedup_fuzzy_survivors(sf_dir: str):
    """End-to-end fuzzy-dedup curation (rows-only: LSH-proposed): keep ONE
    doc per near-dup cluster (the cluster's min doc_id) plus every
    unclustered doc — i.e. the corpus a training run would actually consume.
    Cluster losers anti-join away via the distributed semi_join path."""
    from datax_ray.functions.relational import semi_join

    clusters = dedup_cluster_docs(sf_dir)
    losers = clusters.map_batches(
        lambda t: t.filter(pc.not_equal(t["doc_id"], t["cluster_id"])).select(
            ["doc_id"]
        ),
        batch_format="pyarrow",
    )
    docs = _read(sf_dir, "documents", columns=["doc_id", "n_chars"])
    return semi_join(docs, losers, on="doc_id", anti=True)


def ngram_dup_pairs_exact(sf_dir: str):
    """EXACT all-pairs word-3-gram Jaccard >= 0.6 via distributed inverted
    index (functions/dedup.ngram_pairs_exact) — no LSH, so the result is
    deterministic and SQL-expressible: the DuckDB oracle rebuilds the same
    shingle sets and joins postings on shingle. This is the ground-truth
    pair set the approximate family (minhash/simhash LSH) is recall-floored
    against in tests."""
    from datax_ray.functions.dedup import ngram_pairs_exact

    return ngram_pairs_exact(
        _read(sf_dir, "documents", columns=["doc_id", "text"]),
        threshold=0.6,
        num_buckets=_buckets_for(sf_dir, "documents"),
    )


# Shingle CTEs mirror functions/dedup._shingles exactly: whitespace split
# (any run, no empties), word 3-grams, and the short-doc rule (fewer than 3
# tokens -> ONE shingle = the whole doc). Jaccard = |A∩B| / (|A|+|B|-|A∩B|)
# with integer counts divided as doubles — bit-identical to the numpy path.
NGRAM_SHINGLE_CTE = r"""
toks AS (
  SELECT doc_id, list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS w
  FROM documents
),
sh AS (
  SELECT DISTINCT doc_id, g FROM (
    SELECT doc_id,
      CASE WHEN len(w) >= 3 THEN w[i] || ' ' || w[i+1] || ' ' || w[i+2]
           ELSE array_to_string(w, ' ') END AS g
    FROM toks, UNNEST(range(1, CASE WHEN len(w) >= 3 THEN len(w)-1 ELSE 2 END)) AS t(i)
    WHERE len(w) >= 1
  )
)
"""

NGRAM_EXACT_SQL = (
    "WITH "
    + NGRAM_SHINGLE_CTE
    + """,
sizes AS (SELECT doc_id, count(*) n FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id doc_a, b.doc_id doc_b, count(*) c
  FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b, CAST(c AS DOUBLE) / (sa.n + sb.n - c) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = inter.doc_a
JOIN sizes sb ON sb.doc_id = inter.doc_b
WHERE CAST(c AS DOUBLE) / (sa.n + sb.n - c) >= 0.6
"""
)


def dedup_cluster_exact(sf_dir: str):
    """Near-dup cluster assignment over the EXACT pair set: exact inverted-
    index pairs → distributed min-label connected components →
    (doc_id, cluster_id = min doc of component). Unlike dedup_cluster_docs
    (LSH-proposed, rows-only check) this is fully deterministic, so the
    DuckDB oracle computes the same components with a recursive CTE
    transitive closure."""
    from datax_ray.functions.dedup import ngram_pairs_exact
    from datax_ray.functions.graph import connected_components

    pairs = ngram_pairs_exact(
        _read(sf_dir, "documents", columns=["doc_id", "text"]),
        threshold=0.6,
        num_buckets=_buckets_for(sf_dir, "documents"),
    )
    out = connected_components(pairs, num_buckets=_buckets_for(sf_dir, "documents"))

    def cast_cols(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": pc.cast(t["doc_id"], pa.int64()),
                "cluster_id": pc.cast(t["cluster_id"], pa.int64()),
            }
        )

    return out.map_batches(cast_cols, batch_format="pyarrow")


CLUSTER_EXACT_SQL = (
    "WITH RECURSIVE "
    + NGRAM_SHINGLE_CTE
    + """,
sizes AS (SELECT doc_id, count(*) n FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id doc_a, b.doc_id doc_b, count(*) c
  FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
pairs AS (
  SELECT doc_a, doc_b FROM inter
  JOIN sizes sa ON sa.doc_id = inter.doc_a
  JOIN sizes sb ON sb.doc_id = inter.doc_b
  WHERE CAST(c AS DOUBLE) / (sa.n + sb.n - c) >= 0.6
),
edges AS (SELECT doc_a a, doc_b b FROM pairs UNION SELECT doc_b, doc_a FROM pairs),
reach(node, r) AS (
  SELECT a, a FROM edges
  UNION
  SELECT e.b, reach.r FROM reach JOIN edges e ON e.a = reach.node
)
SELECT node AS doc_id, min(r) AS cluster_id FROM reach GROUP BY node
"""
)


def decontaminate_docs(sf_dir: str):
    """Benchmark decontamination (training-data curation): drop every
    training doc that shares ANY word-3-gram with the held-out benchmark
    set (here: source = 'src0'). The benchmark shingle-hash set is the
    small side — collected once (hashes only, never text) and broadcast
    via ray.put; membership inside map_batches is a vectorized
    np.searchsorted against the sorted array, so the training side streams
    with no shuffle at all."""
    import ray

    from datax_ray.functions.dedup import _shingles_batch

    bench = _read(sf_dir, "documents", columns=["text", "source"])

    def to_hashes(df: pd.DataFrame) -> pd.DataFrame:
        texts = df.loc[df["source"] == "src0", "text"]
        g, _ = _shingles_batch(texts.tolist(), 3)
        return pd.DataFrame({"g": np.unique(g)})

    parts = [
        b["g"].to_numpy()
        for b in bench.map_batches(to_hashes, batch_format="pandas").iter_batches(
            batch_format="pandas"
        )
    ]
    bench_set = np.unique(np.concatenate(parts)) if parts else np.empty(0, np.uint64)
    bench_ref = ray.put(bench_set)

    def clean(t: pa.Table) -> pa.Table:
        t = t.filter(pc.not_equal(t["source"], "src0"))
        bset = ray.get(bench_ref)
        keep = np.ones(t.num_rows, dtype=bool)
        if len(bset) and t.num_rows:
            # whole-batch shingling + ONE searchsorted membership probe
            sh, parent = _shingles_batch(t["text"].to_pylist(), 3)
            if len(sh):
                idx = np.searchsorted(bset, sh)
                idx[idx == len(bset)] = 0
                keep[parent[bset[idx] == sh]] = False
        return pa.table(
            {
                "doc_id": pc.cast(t["doc_id"], pa.int64()).filter(pa.array(keep)),
                "source": t["source"].filter(pa.array(keep)),
            }
        )

    train = _read(sf_dir, "documents", columns=["doc_id", "text", "source"])
    return train.map_batches(clean, batch_format="pyarrow", zero_copy_batch=True)


DECONTAMINATE_SQL = (
    "WITH "
    + NGRAM_SHINGLE_CTE
    + """,
bench AS (
  SELECT DISTINCT g FROM sh JOIN documents USING (doc_id) WHERE source = 'src0'
)
SELECT d.doc_id, d.source FROM documents d
WHERE d.source <> 'src0'
  AND NOT EXISTS (
    SELECT 1 FROM sh s JOIN bench b ON s.g = b.g WHERE s.doc_id = d.doc_id
  )
"""
)


def pack_docs_sequences(sf_dir: str):
    """Sequence packing (rows-only: bin assignment is order-dependent,
    not SQL-expressible): whitespace token counts → first-fit-decreasing
    bins of 256 tokens inside coarse hash buckets. Deterministic; pytest
    asserts the packing invariants (every doc once, fills respect the
    budget, waste bounded)."""
    from datax_ray.functions.packing import pack_sequences
    from datax_ray.functions.text import add_token_count

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    counted = ds.map_batches(
        lambda t: add_token_count(t).select(["doc_id", "n_tokens"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return pack_sequences(
        counted, budget=256, num_buckets=_buckets_for(sf_dir, "documents")
    )


# ----------------------------------------------------------- similarity --


def ann_cosine_topk(sf_dir: str):
    """Exact cosine top-10 to the vec_id=0 embedding, ranked on the cosine
    ROUNDED to 6 decimals (ties broken by vec_id) so both engines rank
    identically despite last-ulp float differences."""
    import pyarrow.parquet as pq

    from datax_ray.functions.similarity import knn_brute

    emb0 = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"), filters=[("vec_id", "=", 0)]
    )
    q = np.stack(emb0["embedding"].to_numpy(zero_copy_only=False)).astype(np.float64)
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    cand = knn_brute(ds, q, k=32).take_all()  # headroom before re-ranking
    rows = sorted(
        ((round(r["cosine"], 6), r["vec_id"]) for r in cand),
        key=lambda x: (-x[0], x[1]),
    )[:10]
    return pa.table(
        {
            "vec_id": pa.array([v for _, v in rows], pa.int64()),
            "cos_sim": pa.array([c for c, _ in rows], pa.float64()),
        }
    )


ANN_SQL = """
WITH q AS (SELECT embedding FROM embeddings WHERE vec_id = 0)
SELECT e.vec_id,
       ROUND(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                    CAST(q.embedding AS DOUBLE[])), 6) AS cos_sim
FROM embeddings e, q
ORDER BY cos_sim DESC, e.vec_id
LIMIT 10
"""


def label_centroids(sf_dir: str):
    """Vector AGGREGATE over an embedding column: per-label element-wise
    centroid. Per-batch numpy partial sums (one (label, sum_vec, n) row per
    label per batch — the combiner moves vectors, never rows), one
    single-task fold (labels are few), long-form (label, i, c) output with
    the round-to-6 trick so both engines hash identically despite
    summation-order float differences."""
    import pandas as pd

    ds = _read(sf_dir, "embeddings", columns=["label", "embedding"])

    def partial(t: pa.Table) -> pa.Table:
        labels = t["label"].to_numpy()
        vecs = np.stack(t["embedding"].to_numpy(zero_copy_only=False)).astype(
            np.float64
        )
        out_l, out_s, out_n = [], [], []
        for lab in np.unique(labels):
            m = labels == lab
            out_l.append(int(lab))
            out_s.append(vecs[m].sum(axis=0))
            out_n.append(int(m.sum()))
        return pa.table(
            {
                "label": pa.array(out_l, pa.int64()),
                "sum_vec": pa.array([s.tolist() for s in out_s], pa.list_(pa.float64())),
                "n": pa.array(out_n, pa.int64()),
            }
        )

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        labs, idxs, cs = [], [], []
        for lab, g in df.groupby("label", sort=True):
            s = np.sum(np.stack(g["sum_vec"].to_numpy()), axis=0)
            c = np.round(s / g["n"].sum(), 6)
            labs.extend([int(lab)] * len(c))
            idxs.extend(range(1, len(c) + 1))
            cs.extend(c.tolist())
        return pd.DataFrame(
            {
                "label": np.asarray(labs, dtype=np.int64),
                "i": np.asarray(idxs, dtype=np.int64),
                "c": np.asarray(cs, dtype=np.float64),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .repartition(1)
        .map_batches(fold, batch_format="pandas", batch_size=None)
    )


CENTROID_SQL = """
WITH u AS (
  SELECT label, unnest(embedding) AS v,
         generate_subscripts(embedding, 1) AS i
  FROM embeddings
)
SELECT CAST(label AS BIGINT) AS label, CAST(i AS BIGINT) AS i,
       ROUND(AVG(CAST(v AS DOUBLE)), 6) AS c
FROM u GROUP BY label, i
"""


def ann_ivf_topk(sf_dir: str):
    """IVF-bucketed approximate variant (rows-only: approximate by design),
    served from the PERSISTED incremental index (pipelines/vecindex.py):
    the quantizer fits from a distributed hash-priority sample (driver RSS
    independent of the embeddings size), inverted lists live as per-row-
    group parquet artifacts refreshed only when their source fragment's
    fingerprint changes, and the probe streams only the nprobe lists that
    survive row-group pruning."""
    import hashlib

    import pyarrow.parquet as pq

    from datax_ray.pipelines.vecindex import (
        refresh_vector_index,
        search_vector_index,
    )

    src = os.path.join(sf_dir, "embeddings.parquet")
    idx_dir = os.path.join(
        "/tmp/datax_vecidx", hashlib.md5(os.path.abspath(src).encode()).hexdigest()[:12]
    )
    refresh_vector_index(src, idx_dir, n_lists=16, sample_size=2048)
    # query vector: first row only — read one row group, never the table
    q = pq.ParquetFile(src).read_row_group(0, columns=["embedding"])
    query = np.asarray(q["embedding"][0].as_py(), dtype=np.float64)[None, :]
    return search_vector_index(idx_dir, query, k=10, nprobe=4)


def hll_registers_events(sf_dir: str):
    """HyperLogLog cardinality sketch over event_id, driver-verified at the
    REGISTER level: the (bucket, max_rho) table is deterministic given the
    fixed Knuth 32-bit hash, so DuckDB reproduces it bit-for-bit (HUGEINT
    product mod 2^32; bit length via format('{:b}')). The approximate
    estimate derived from these registers is pytest-bounded against the
    exact count (tests/test_sketch.py). Scale shape: per-batch MAX combiner
    emits <= 512 integer rows per batch — the shuffle never sees data rows
    (functions/sketch.py)."""
    from datax_ray.functions.sketch import hll_registers

    return hll_registers(_read(sf_dir, "events", columns=["event_id"]), "event_id", p=9)


HLL_SQL = """
WITH s0 AS (SELECT event_id % 4294967296 AS h FROM events),
s1 AS (SELECT xor(h, h >> 16) AS h FROM s0),
s2 AS (SELECT CAST(CAST(h AS HUGEINT) * 2246822507 % 4294967296 AS BIGINT) AS h FROM s1),
s3 AS (SELECT xor(h, h >> 13) AS h FROM s2),
s4 AS (SELECT CAST(CAST(h AS HUGEINT) * 3266489909 % 4294967296 AS BIGINT) AS h FROM s3),
hv AS (SELECT xor(h, h >> 16) AS hv FROM s4),
r AS (
  SELECT hv % 512 AS bucket,
         CASE WHEN hv // 512 = 0 THEN 24
              ELSE 24 - length(format('{:b}', hv // 512)) END AS rho
  FROM hv
)
SELECT CAST(bucket AS BIGINT) AS bucket, CAST(MAX(rho) AS BIGINT) AS max_rho
FROM r GROUP BY bucket ORDER BY bucket
"""


def kmeans_clusters_embeddings(sf_dir: str):
    """Distributed Lloyd's k-means over the embeddings table (rows-only:
    iterative, not SQL-expressible). Each iteration is one combiner pass —
    per-batch per-cluster (count, vector-sum) partials, O(k x dim) floats
    moved, rows never shuffle; seeding is hash-deterministic so the result
    is identical across block layouts (functions/similarity.py:kmeans_fit,
    Lloyd-monotonicity + sequential-reference pytest in tests/test_kmeans.py)."""
    from datax_ray.functions.similarity import kmeans_assign, kmeans_fit

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    centroids, _ = kmeans_fit(ds, k=8, iters=4)
    out = kmeans_assign(ds, centroids)

    def rounded(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "vec_id": t["vec_id"],
                "cluster": t["cluster"],
                "cosine_r4": pc.cast(
                    pc.round(pc.multiply(t["cosine"], 10_000)), pa.int64()
                ),
            }
        )

    return out.map_batches(rounded, batch_format="pyarrow")


def minhash_dup_pairs(sf_dir: str):
    """MinHash-LSH near-dup pairs over documents (rows-only)."""
    from datax_ray.functions.dedup import minhash_lsh_pairs

    return minhash_lsh_pairs(
        _read(sf_dir, "documents", columns=["doc_id", "text"]),
        threshold=0.6,
        shingle_k=3,
        num_buckets=_buckets_for(sf_dir, "documents"),
        est_rows=parquet_rows(os.path.join(sf_dir, "documents.parquet")),
    )


def simhash_dup_pairs(sf_dir: str):
    from datax_ray.functions.dedup import simhash_pairs

    return simhash_pairs(
        _read(sf_dir, "documents", columns=["doc_id", "text"]),
        max_hamming=3,
        num_buckets=_buckets_for(sf_dir, "documents"),
    )


def embedding_near_dups(sf_dir: str):
    """Embedding-cosine near-dup pairs. The driver testdata embeddings are
    near-orthogonal (max pairwise cosine ~0.51), so the threshold targets
    the top tail of the actual distribution; 8 hyperplanes keep LSH recall
    high at this moderate similarity (rows-only: approximate by design)."""
    from datax_ray.functions.dedup import embedding_dup_pairs

    return embedding_dup_pairs(
        _read(sf_dir, "embeddings", columns=["vec_id", "embedding"]),
        threshold=0.4,
        num_planes=8,
        num_buckets=_buckets_for(sf_dir, "embeddings"),
    )


def multimodal_features(sf_dir: str):
    """Actor-pool media feature extraction over synthetic binary payloads
    (decode stubbed; plumbing real — rows-only)."""
    from datax_ray.functions.multimodal import extract_features, synthesize_media_table

    n = 256 if "0.001" in sf_dir else 1024
    return extract_features(ray.data.from_arrow(synthesize_media_table(n)))


def multimodal_resize_pipeline(sf_dir: str):
    """Resize (aspect-preserving metadata math is real, pixels stubbed) then
    feature-extract — both actor pools (rows-only)."""
    from datax_ray.functions.multimodal import media_pipeline, synthesize_media_table

    n = 256 if "0.001" in sf_dir else 1024
    return media_pipeline(ray.data.from_arrow(synthesize_media_table(n)))


def multimodal_frame_sample(sf_dir: str):
    """Video frame sampling: one row per sampled frame (rows-only)."""
    from datax_ray.functions.multimodal import FrameSampleStub, synthesize_media_table

    n = 256 if "0.001" in sf_dir else 1024
    return ray.data.from_arrow(synthesize_media_table(n)).map_batches(
        FrameSampleStub,
        fn_constructor_kwargs=dict(every_ms=1000, max_frames=8),
        batch_format="pyarrow",
        batch_size=64,
        concurrency=(1, 4),
    )


def multimodal_scene_cuts(sf_dir: str):
    """Shot-boundary detection over the synthetic video column: per-video
    vectorized frame-delta on REAL decoded pixels, integer milli threshold
    (functions/multimodal.py:SceneCutDetector) — rows-only; determinism +
    planted-cut recall pytest in tests/test_multimodal.py's suite."""
    from datax_ray.functions.multimodal import SceneCutDetector, synthesize_media_table

    n = 256 if "0.001" in sf_dir else 1024
    return ray.data.from_arrow(synthesize_media_table(n)).map_batches(
        SceneCutDetector,
        fn_constructor_kwargs=dict(threshold_milli=80),
        batch_format="pyarrow",
        batch_size=64,
        concurrency=(1, 4),
    )


def user_event_path(sf_dir: str):
    """Ordered per-key string aggregation (SQL string_agg ... ORDER BY):
    each user's event-type sequence joined in (ts, event_id) order — the
    transcript-assembly shape an LLM-data pipeline uses to fold turn rows
    back into one training document per conversation. Coarse user-hash
    buckets co-locate a key's rows (scale rule: functions/_buckets.py);
    within a bucket one sort + groupby-join pass builds every path (the
    join per group is a C-level str.join over an already-sorted slice)."""
    import pandas as pd

    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "ts", "event_type"])
    num_buckets = _buckets_for(sf_dir, "events")

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        grp = pd.util.hash_array(df["user_id"].to_numpy(), categorize=False)
        return df.assign(_grp=(grp % num_buckets).astype("int32"))

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"], kind="stable")
        g = df.groupby("user_id", sort=False).agg(
            path=("event_type", ">".join), n_events=("event_type", "size")
        )
        return g.reset_index().astype({"n_events": "int64"})

    return (
        ds.map_batches(tag, batch_format="pandas")
        .groupby("_grp")
        .map_groups(per_bucket, batch_format="pandas")
    )


EVENT_PATH_SQL = """
SELECT user_id,
       string_agg(event_type, '>' ORDER BY ts, event_id) AS path,
       COUNT(*) AS n_events
FROM events GROUP BY user_id
"""


def orders_monthly_revenue(sf_dir: str):
    """Temporal rollup: revenue + order count per calendar month. The
    date_trunc happens inside map_batches (Arrow year/month kernels → one
    int64 yyyymm key) and the month key-space is tiny, so the combiner
    partials fold in a single reduce task — no shuffle execution at all."""
    ds = _read(sf_dir, "orders", columns=["o_orderdate", "o_totalprice"])

    def prep(t: pa.Table) -> pa.Table:
        yyyymm = pc.add(
            pc.multiply(pc.cast(pc.year(t["o_orderdate"]), pa.int64()), 100),
            pc.cast(pc.month(t["o_orderdate"]), pa.int64()),
        )
        return pa.table(
            {"yyyymm": yyyymm, "revenue_cents": _cents(t["o_totalprice"])}
        )

    return partial_agg(
        ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True),
        keys=["yyyymm"],
        sums={"revenue_cents": "revenue_cents"},
        counts="n_orders",
        single_reduce=True,  # key space = months, a few dozen rows
    )


MONTHLY_REVENUE_SQL = """
SELECT CAST(year(o_orderdate) * 100 + month(o_orderdate) AS BIGINT) AS yyyymm,
       SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS revenue_cents,
       COUNT(*) AS n_orders
FROM orders GROUP BY yyyymm
"""


def top_terms_global(sf_dir: str, k: int = 20):
    """Exact global heavy hitters: the k most frequent tokens across the
    corpus. Per-batch tokenize + count combiners (one row per distinct term
    per batch), a coarse term-hash shuffle of the partials, then the
    distributed top-k tree (per-bucket partial top-k → one tiny final sort
    over k·buckets rows). The vocabulary never broadcasts and no stage sees
    O(corpus) rows after the first combiner."""
    from datax_ray.functions.relational import top_k

    ds = _read(sf_dir, "documents", columns=["text"])

    def term_counts(t: pa.Table) -> pa.Table:
        flat, _ = _tokens_with_doc(t)
        return (
            pa.table({"term": flat})
            .group_by(["term"], use_threads=False)
            .aggregate([([], "count_all")])
            .rename_columns(["term", "cnt"])
        )

    counts = partial_agg(
        ds.map_batches(term_counts, batch_format="pyarrow", zero_copy_batch=True),
        keys=["term"],
        sums={"cnt": "cnt"},
        num_buckets=_buckets_for(sf_dir, "documents"),
    )

    def cast_out(t: pa.Table) -> pa.Table:
        return t.select(["term", "cnt"])

    return top_k(counts, by="cnt", k=k, tie_col="term").map_batches(
        cast_out, batch_format="pyarrow"
    )


TOP_TERMS_SQL = """
WITH tok AS (
  SELECT unnest(string_split(text, ' ')) AS term FROM documents
), counted AS (
  SELECT term, COUNT(*) AS cnt FROM tok GROUP BY term
)
SELECT term, cnt FROM counted ORDER BY cnt DESC, term LIMIT 20
"""


def union_distinct_orderkeys(sf_dir: str):
    """Set UNION (distinct) of two large key sets — completes the set-op
    family next to EXCEPT/INTERSECT: order keys appearing in lineitem OR
    orders. Both sides project to the key, pre-unique per batch (combiner),
    and one coarse-bucket aggregation dedups the survivors — shuffled rows
    are bounded by distinct keys per batch, never raw inputs."""
    left = _read(sf_dir, "lineitem", columns=["l_orderkey"])
    right = _read(sf_dir, "orders", columns=["o_orderkey"])

    def uniq_l(t: pa.Table) -> pa.Table:
        return pa.table(
            {"orderkey": pc.unique(pc.cast(t["l_orderkey"], pa.int64()))}
        )

    def uniq_r(t: pa.Table) -> pa.Table:
        return pa.table(
            {"orderkey": pc.unique(pc.cast(t["o_orderkey"], pa.int64()))}
        )

    both = left.map_batches(uniq_l, batch_format="pyarrow").union(
        right.map_batches(uniq_r, batch_format="pyarrow")
    )
    out = partial_agg(
        both,
        keys=["orderkey"],
        counts="n",
        num_buckets=_buckets_for(sf_dir, "orders"),
    )
    return out.map_batches(
        lambda t: t.select(["orderkey"]), batch_format="pyarrow"
    )


SET_UNION_SQL = """
SELECT l_orderkey AS orderkey FROM lineitem
UNION
SELECT o_orderkey AS orderkey FROM orders
"""


def approx_distinct_users(sf_dir: str):
    """HyperLogLog approximate COUNT(DISTINCT user_id) over events
    (functions/sketch.py): per-batch 2^12-register combiners, max-merged in
    one reduce — the shuffle is bounded by the register count at ANY input
    size, the sketch a 100 TB pipeline reaches for when the exact
    distinct-pair path (count_distinct_users_daily) would shuffle O(keys).
    Approximate by design (~1.6% standard error at p=12) → rows-only check;
    the error floor vs exact is pytest-verified (tests/test_functions.py)."""
    from datax_ray.functions.sketch import hll_count_distinct

    ds = _read(sf_dir, "events", columns=["user_id"])
    return hll_count_distinct(ds, "user_id", p=12)


def top_bigrams_global(sf_dir: str, k: int = 20):
    """Exact global top-k BIGRAMS — the n-gram statistics pass of an LM
    data pipeline. Per-batch: adjacent pairs from two zero-copy slices of
    the flattened token stream joined element-wise, doc boundaries masked
    (no pandas explode, no Python loop over docs), count partials; then
    the same combiner shuffle + top-k tree as top_terms_global."""
    from datax_ray.functions.relational import top_k

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def bigram_counts(t: pa.Table) -> pa.Table:
        # Adjacent pairs = two zero-copy slices of the flattened token
        # stream joined element-wise; doc-boundary positions masked out
        # (last token of a doc must not pair with the next doc's first).
        toks = pc.split_pattern(pc.fill_null(t["text"], ""), " ")
        flat = pc.list_flatten(toks)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        m = len(flat)
        if m < 2:
            return pa.table(
                {"bigram": pa.array([], pa.string()), "cnt": pa.array([], pa.int64())}
            )
        big = pc.binary_join_element_wise(
            flat.slice(0, m - 1), flat.slice(1, m - 1), " "
        )
        n = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        ends = np.cumsum(n) - 1
        valid = np.ones(m - 1, dtype=bool)
        valid[ends[ends < m - 1]] = False
        return (
            pa.table({"bigram": big.filter(pa.array(valid))})
            .group_by(["bigram"], use_threads=False)
            .aggregate([([], "count_all")])
            .rename_columns(["bigram", "cnt"])
        )

    counts = partial_agg(
        ds.map_batches(bigram_counts, batch_format="pyarrow", zero_copy_batch=True),
        keys=["bigram"],
        sums={"cnt": "cnt"},
        num_buckets=_buckets_for(sf_dir, "documents"),
    )

    def cast_out(t: pa.Table) -> pa.Table:
        return t.select(["bigram", "cnt"])

    return top_k(counts, by="cnt", k=k, tie_col="bigram").map_batches(
        cast_out, batch_format="pyarrow"
    )


TOP_BIGRAMS_SQL = """
WITH tok AS (
  SELECT doc_id,
         unnest(string_split(text, ' ')) AS term,
         generate_subscripts(string_split(text, ' '), 1) AS pos
  FROM documents
), pairs AS (
  SELECT term || ' ' || lead(term) OVER (PARTITION BY doc_id ORDER BY pos)
         AS bigram
  FROM tok
), counted AS (
  SELECT bigram, COUNT(*) AS cnt FROM pairs WHERE bigram IS NOT NULL
  GROUP BY bigram
)
SELECT bigram, cnt FROM counted ORDER BY cnt DESC, bigram LIMIT 20
"""


def docs_length_histogram(sf_dir: str):
    """Fixed-bin histogram of document lengths (100-char bins) — the
    length-distribution profile every curation run starts with. Binning is
    one Arrow kernel in map_batches; the bin key-space is tiny, so the
    combiner partials fold in a single reduce."""
    ds = _read(sf_dir, "documents", columns=["n_chars"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "bin_lo": pc.multiply(
                    pc.cast(
                        pc.floor(pc.divide(pc.cast(t["n_chars"], pa.float64()), 100.0)),
                        pa.int64(),
                    ),
                    100,
                )
            }
        )

    return partial_agg(
        ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True),
        keys=["bin_lo"],
        counts="n_docs",
        single_reduce=True,  # bins, not rows
    )


LENGTH_HIST_SQL = """
SELECT CAST((n_chars // 100) * 100 AS BIGINT) AS bin_lo,
       COUNT(*) AS n_docs
FROM documents GROUP BY bin_lo
"""


def star_join_order_region(sf_dir: str):
    """Star-schema enrichment: revenue per region name via THREE chained
    broadcast joins (orders → customer → nation → region). The dimension
    tables ship once per node via ray.put (never per batch); the fact
    stream stays Arrow end to end and only the joined key columns survive
    to the final combiner aggregation — the canonical 'broadcast the small
    sides' plan for a fact table too big to shuffle."""
    import pyarrow.parquet as pq

    cust = pq.read_table(
        os.path.join(sf_dir, "customer.parquet"), columns=["c_custkey", "c_nationkey"]
    ).rename_columns(["o_custkey", "c_nationkey"])  # align join-key names
    nation = pq.read_table(
        os.path.join(sf_dir, "nation.parquet"), columns=["n_nationkey", "n_regionkey"]
    )
    region = pq.read_table(
        os.path.join(sf_dir, "region.parquet"), columns=["r_regionkey", "r_name"]
    )

    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {"o_custkey": t["o_custkey"], "cents": _cents(t["o_totalprice"])}
        )

    ds = orders.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
    ds = broadcast_join(ds, cust, on="o_custkey")

    def rekey1(t: pa.Table) -> pa.Table:
        return pa.table({"n_nationkey": t["c_nationkey"], "cents": t["cents"]})

    ds = broadcast_join(
        ds.map_batches(rekey1, batch_format="pyarrow"), nation, on="n_nationkey"
    )

    def rekey2(t: pa.Table) -> pa.Table:
        return pa.table({"r_regionkey": t["n_regionkey"], "cents": t["cents"]})

    ds = broadcast_join(
        ds.map_batches(rekey2, batch_format="pyarrow"), region, on="r_regionkey"
    )

    return partial_agg(
        ds,
        keys=["r_name"],
        sums={"cents": "revenue_cents"},
        counts="n_orders",
        single_reduce=True,  # 5 regions
    )


STAR_JOIN_SQL = """
SELECT r_name,
       SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS revenue_cents,
       COUNT(*) AS n_orders
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY r_name
"""


def orders_above_customer_avg(sf_dir: str):
    """Correlated-subquery shape: orders priced above their OWN customer's
    average. Two passes over orders, no driver state: (1) per-customer
    (sum, count) combiners; (2) hash-partitioned join back to the fact
    stream and an INTEGER cross-multiplication filter
    (cents·n > sum_cents ⟺ price > avg, exact — no float division on
    either engine)."""
    from datax_ray.functions.relational import large_join

    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_totalprice"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderkey": t["o_orderkey"],
                "o_custkey": t["o_custkey"],
                "cents": _cents(t["o_totalprice"]),
            }
        )

    fact = orders.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
    stats = partial_agg(
        fact,
        keys=["o_custkey"],
        sums={"cents": "sum_cents"},
        counts="n_orders",
        num_buckets=_buckets_for(sf_dir, "orders"),
    )

    def rekey(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "cust": t["o_custkey"],
                "sum_cents": t["sum_cents"],
                "n": t["n_orders"],
            }
        )

    joined = large_join(
        fact, stats.map_batches(rekey, batch_format="pyarrow"),
        on="o_custkey", right_on="cust",
    )

    def pick(t: pa.Table) -> pa.Table:
        keep = pc.greater(
            pc.multiply(t["cents"], pc.cast(t["n"], pa.int64())),
            t["sum_cents"],
        )
        out = t.filter(keep)
        return pa.table(
            {"o_orderkey": out["o_orderkey"], "price_cents": out["cents"]}
        )

    return joined.map_batches(pick, batch_format="pyarrow")


ABOVE_AVG_SQL = """
WITH s AS (
  SELECT o_custkey,
         SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS sum_cents,
         COUNT(*) AS n
  FROM orders GROUP BY o_custkey
)
SELECT o_orderkey,
       CAST(ROUND(o_totalprice * 100) AS BIGINT) AS price_cents
FROM orders JOIN s USING (o_custkey)
WHERE CAST(ROUND(o_totalprice * 100) AS BIGINT) * n > sum_cents
"""


def events_funnel_users(sf_dir: str):
    """First-touch funnel: users whose FIRST view precedes their first
    click, which precedes their first purchase. One pass of per-(user,
    step) min-ts combiners (shuffle = O(users × steps), never events),
    then a vectorized per-user ordering check inside the same reduce
    buckets — the conversion-funnel shape of product analytics."""
    import pandas as pd

    STEPS = ["view", "click", "purchase"]
    ds = _read(sf_dir, "events", columns=["user_id", "event_type", "ts"])

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_in(t["event_type"], value_set=pa.array(STEPS)))
        return pa.table(
            {
                "user_id": t["user_id"],
                "event_type": t["event_type"],
                "neg_us": pc.negate_checked(pc.cast(t["ts"], pa.int64())),
            }
        )

    mins = partial_agg(
        ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True),
        keys=["user_id", "event_type"],
        maxs={"neg_us": "neg_us"},  # max(-ts) = min(ts), exact in int64 us
        num_buckets=_buckets_for(sf_dir, "events"),
    )

    def check(df: pd.DataFrame) -> pd.DataFrame:
        wide = df.pivot_table(
            index="user_id", columns="event_type", values="neg_us", aggfunc="max"
        )
        for s in STEPS:
            if s not in wide.columns:
                wide[s] = np.nan
        first = -wide[STEPS]  # back to min-ts microseconds
        ok = (
            first["view"].notna()
            & first["click"].notna()
            & first["purchase"].notna()
            & (first["view"] < first["click"])
            & (first["click"] < first["purchase"])
        )
        out = first[ok].reset_index()
        return pd.DataFrame(
            {
                "user_id": out["user_id"].astype("int64"),
                "first_view_us": out["view"].astype("int64"),
                "first_purchase_us": out["purchase"].astype("int64"),
            }
        )

    # mins is already bucketed by (user, step) hash; re-bucket by user so
    # one task sees all of a user's step rows (input already combiner-shrunk
    # to O(users × steps); bucket count still scales with input size).
    n_user_buckets = _buckets_for(sf_dir, "events")

    def rebucket(df: pd.DataFrame) -> pd.DataFrame:
        grp = pd.util.hash_array(df["user_id"].to_numpy(), categorize=False)
        return df.assign(_ugrp=(grp % n_user_buckets).astype("int32"))

    return (
        mins.map_batches(rebucket, batch_format="pandas")
        .groupby("_ugrp")
        .map_groups(check, batch_format="pandas")
    )


FUNNEL_SQL = """
WITH firsts AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'view' THEN epoch_us(ts) END) AS v,
         MIN(CASE WHEN event_type = 'click' THEN epoch_us(ts) END) AS c,
         MIN(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS p
  FROM events GROUP BY user_id
)
SELECT user_id, v AS first_view_us, p AS first_purchase_us
FROM firsts
WHERE v IS NOT NULL AND c IS NOT NULL AND p IS NOT NULL AND v < c AND c < p
"""


def retention_cohorts(sf_dir: str):
    """Cohort retention matrix: users grouped by FIRST active day, counted
    per day-offset of later activity. ONE-shuffle plan: per-batch distinct
    (user, day) pairs bucketed by hash(user_id) — ALL of a user's pairs
    land in its bucket, so the per-bucket map_groups computes the user's
    cohort (min day) AND the (cohort_day, offset) partial counts in the
    same vectorized pass; the final fold is one tiny task over the
    cohorts × offsets grid. The shuffle is bounded by distinct pairs —
    the raw event stream never moves, and no join stage exists."""
    from datax_ray.functions.relational import key_buckets

    ds = _read(sf_dir, "events", columns=["user_id", "ts"])
    num_buckets = _buckets_for(sf_dir, "events")

    def pairs(t: pa.Table) -> pa.Table:
        day = pc.cast(
            pc.divide(pc.cast(t["ts"], pa.int64()), 86_400_000_000), pa.int64()
        )
        g = (
            pa.table({"user_id": t["user_id"], "day": day})
            .group_by(["user_id", "day"], use_threads=False)
            .aggregate([])  # Arrow hash-dedup, no pandas conversion
        )
        return g.append_column("_grp", key_buckets(g, ["user_id"], num_buckets))

    def bucket(t: pa.Table) -> pa.Table:
        # Pairs may repeat across source batches — exact-dedup inside the
        # bucket, then cohort (segmented min via lexsort) + offset counts,
        # all vectorized.
        g = (
            t.drop_columns(["_grp"])
            .group_by(["user_id", "day"], use_threads=False)
            .aggregate([])
        )
        u = g["user_id"].to_numpy(zero_copy_only=False)
        d = g["day"].to_numpy(zero_copy_only=False)
        order = np.lexsort((d, u))
        u, d = u[order], d[order]
        new_run = np.ones(len(u), dtype=bool)
        new_run[1:] = u[1:] != u[:-1]
        run_id = np.cumsum(new_run) - 1
        cohort = d[np.flatnonzero(new_run)][run_id]  # first day per user
        return (
            pa.table(
                {
                    "cohort_day": pa.array(cohort, pa.int64()),
                    "day_offset": pa.array(d - cohort, pa.int64()),
                }
            )
            .group_by(["cohort_day", "day_offset"], use_threads=False)
            .aggregate([([], "count_all")])
            .rename_columns(["cohort_day", "day_offset", "n_users"])
        )

    partials = (
        ds.map_batches(pairs, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_grp")
        .map_groups(bucket, batch_format="pyarrow")
    )

    def final(t: pa.Table) -> pa.Table:
        return (
            t.group_by(["cohort_day", "day_offset"], use_threads=False)
            .aggregate([("n_users", "sum")])
            .rename_columns(["cohort_day", "day_offset", "n_users"])
        )

    # cohorts × offsets is a small grid — one-task fold, no second shuffle
    return partials.repartition(1).map_batches(
        final, batch_format="pyarrow", batch_size=None
    )


RETENTION_SQL = """
WITH pairs AS (
  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day FROM events
), cohorts AS (
  SELECT user_id, MIN(day) AS cohort_day FROM pairs GROUP BY user_id
)
SELECT CAST(c.cohort_day AS BIGINT) AS cohort_day,
       CAST(p.day - c.cohort_day AS BIGINT) AS day_offset,
       COUNT(*) AS n_users
FROM pairs p JOIN cohorts c USING (user_id)
GROUP BY cohort_day, day_offset
"""


def cms_registers_users(sf_dir: str):
    """Count-Min frequency sketch over events.user_id, driver-verified at
    the CELL level: the (cms_row, cms_col, cnt) table is deterministic
    given the fixed fmix32 row hashes, so DuckDB reproduces it bit-for-bit
    (CMS_SQL — HUGEINT product mod 2^32, one CTE per mixing step, cross
    join against a 4-row seed table). Point estimates from these cells are
    overestimate-guaranteed (est >= true; pytest-bounded error,
    tests/test_sketch.py). Scale shape: per-batch combiner emits
    <= depth*width integer cell rows, coarse-bucket SUM reduce — the
    shuffle never carries event rows (functions/sketch.py:cms_registers)."""
    from datax_ray.functions.sketch import cms_registers

    return cms_registers(
        _read(sf_dir, "events", columns=["user_id"]), "user_id",
        depth=4, width=1024,
    )


CMS_SQL = """
WITH seeds AS (SELECT * FROM (VALUES (0), (1), (2), (3)) t(j)),
s0 AS (SELECT j, (user_id + j * 2654435761) % 4294967296 AS h
       FROM events CROSS JOIN seeds),
s1 AS (SELECT j, xor(h, h >> 16) AS h FROM s0),
s2 AS (SELECT j, CAST(CAST(h AS HUGEINT) * 2246822507 % 4294967296 AS BIGINT) AS h FROM s1),
s3 AS (SELECT j, xor(h, h >> 13) AS h FROM s2),
s4 AS (SELECT j, CAST(CAST(h AS HUGEINT) * 3266489909 % 4294967296 AS BIGINT) AS h FROM s3),
hv AS (SELECT j, xor(h, h >> 16) AS hv FROM s4)
SELECT CAST(j AS BIGINT) AS cms_row, CAST(hv % 1024 AS BIGINT) AS cms_col,
       COUNT(*) AS cnt
FROM hv GROUP BY 1, 2 ORDER BY 1, 2
"""


def full_outer_daily_click_purchase(sf_dir: str):
    """FULL OUTER join of two grouped aggregates on a composite key: per
    (user_id, day) click counts vs purchase counts — both unmatched sides
    are real (days a user clicked but bought nothing, and vice versa).
    Plan: because each side is a keyed aggregate of the SAME input, the
    full outer join collapses to one pass — per-batch counts per (user,
    day, type) widen to conditionally-null n_clicks / n_purchases
    columns, then a single SUM combiner folds them: Arrow's sum skips
    nulls and returns null for an all-null group, which IS the
    unmatched-side semantics. One read + one sort-shuffle; the
    two-sided-aggregate + Dataset.join plan cost two reads, three
    exchanges and a hash-join actor pool. The general
    large_join(join_type="full_outer") path (true two-input full outer,
    composite keys) is equivalence-tested in tests/test_full_outer.py."""
    from datax_ray.functions.relational import partial_agg

    wanted = pa.array(["click", "purchase"])

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_in(t["event_type"], value_set=wanted))
        day = pc.multiply(
            pc.divide(pc.cast(t["ts"], pa.int64()), 86_400_000_000),
            86_400_000_000,
        )
        g = (
            pa.table(
                {
                    "user_id": t["user_id"],
                    "day_us": day,
                    "event_type": t["event_type"],
                }
            )
            .group_by(["user_id", "day_us", "event_type"], use_threads=False)
            .aggregate([([], "count_all")])
        )
        is_click = pc.equal(g["event_type"], "click")
        cnt = pc.cast(g["count_all"], pa.int64())
        return pa.table(
            {
                "user_id": g["user_id"],
                "day_us": g["day_us"],
                "n_clicks": pc.if_else(is_click, cnt, pa.nulls(g.num_rows, pa.int64())),
                "n_purchases": pc.if_else(is_click, pa.nulls(g.num_rows, pa.int64()), cnt),
            }
        )

    ds = _read(sf_dir, "events", columns=["ts", "user_id", "event_type"])
    return partial_agg(
        ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True),
        keys=["user_id", "day_us"],
        sums={"n_clicks": "n_clicks", "n_purchases": "n_purchases"},
    )


FULL_OUTER_DAILY_SQL = """
WITH c AS (
  SELECT user_id, epoch_us(ts) // 86400000000 * 86400000000 AS day_us,
         COUNT(*) AS n_clicks
  FROM events WHERE event_type = 'click' GROUP BY 1, 2
), p AS (
  SELECT user_id, epoch_us(ts) // 86400000000 * 86400000000 AS day_us,
         COUNT(*) AS n_purchases
  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
)
SELECT user_id, day_us, n_clicks, n_purchases
FROM c FULL OUTER JOIN p USING (user_id, day_us)
"""


def cube_orders_status_priority(sf_dir: str):
    """GROUP BY CUBE (status, priority): all four grouping sets with NULL
    markers for rolled-up levels. Scale shape: ONE combiner pass computes
    the finest cells distributed (partial_agg — decomposable SUM/COUNT, so
    partial-of-partial is exact); the three coarser sets re-aggregate from
    those |status| x |priority| cells in a single tiny task — the input is
    never re-read or re-shuffled per grouping set."""
    from datax_ray.functions.relational import partial_agg

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderstatus": t["o_orderstatus"],
                "o_orderpriority": t["o_orderpriority"],
                "revenue_cents": _cents(t["o_totalprice"]),
            }
        )

    finest = partial_agg(
        _read(
            sf_dir, "orders",
            columns=["o_orderstatus", "o_orderpriority", "o_totalprice"],
        ).map_batches(prep, batch_format="pyarrow", zero_copy_batch=True),
        keys=["o_orderstatus", "o_orderpriority"],
        sums={"revenue_cents": "revenue_cents"},
        counts="n_orders",
        single_reduce=True,  # |status| x |priority| cells — tiny key space
    )

    def cube(t: pa.Table) -> pa.Table:
        cols = ["o_orderstatus", "o_orderpriority", "n_orders", "revenue_cents"]
        outs = [t.select(cols)]
        for keys in (["o_orderstatus"], ["o_orderpriority"], []):
            if keys:
                g = t.group_by(keys, use_threads=False).aggregate(
                    [("n_orders", "sum"), ("revenue_cents", "sum")]
                )
                n, r = g["n_orders_sum"], g["revenue_cents_sum"]
                rows = g.num_rows
                part = {k: g[k] for k in keys}
            else:
                rows = 1
                n = pa.array([pc.sum(t["n_orders"]).as_py()], pa.int64())
                r = pa.array([pc.sum(t["revenue_cents"]).as_py()], pa.int64())
                part = {}
            for k in ("o_orderstatus", "o_orderpriority"):
                if k not in part:
                    part[k] = pa.nulls(rows, pa.string())
            part["n_orders"] = n
            part["revenue_cents"] = r
            outs.append(pa.table({c: part[c] for c in cols}))
        return pa.concat_tables(outs)

    return finest.repartition(1).map_batches(
        cube, batch_format="pyarrow", batch_size=None
    )


CUBE_SQL = """
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
       CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


def corr_stats_lineitem(sf_dir: str):
    """Integer sufficient statistics for quantity-vs-price correlation /
    covariance per return flag: (n, sum_q, sum_p_cents, sum_qq,
    sum_qp_cents) — everything downstream (mean, cov, Pearson r) derives
    from these five decomposable sums, so the distributed path is verified
    integer-exactly while the float division happens after the compare
    boundary. Scale shape: one combiner pass, 3-row output; int64-safe to
    ~10^11 rows at TPC-H value ranges (qty <= 50, price < 10^5 dollars)."""
    from datax_ray.functions.relational import partial_agg

    def prep(t: pa.Table) -> pa.Table:
        q = pc.cast(t["l_quantity"], pa.int64())  # integral by construction
        p = _cents(t["l_extendedprice"])
        return pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "sum_q": q,
                "sum_p_cents": p,
                "sum_qq": pc.multiply(q, q),
                "sum_qp_cents": pc.multiply(q, p),
            }
        )

    return partial_agg(
        _read(
            sf_dir, "lineitem",
            columns=["l_returnflag", "l_quantity", "l_extendedprice"],
        ).map_batches(prep, batch_format="pyarrow", zero_copy_batch=True),
        keys=["l_returnflag"],
        sums={c: c for c in ("sum_q", "sum_p_cents", "sum_qq", "sum_qp_cents")},
        counts="n",
        single_reduce=True,  # 3 return flags
    )


def profile_orders(sf_dir: str):
    """Data-catalog column profiling: per column, row count, null count
    and EXACT distinct count in ONE streaming pass. Counts are plain
    sums; distincts use the distinct-pair combiner (per-batch unique →
    only surviving (column, value) pairs shuffle, bucketed by value hash
    so each pair dedups exactly once) — the shuffle is bounded by
    Σ distinct values per column, never rows. Values canonicalize to
    strings only for DEDUP identity (Arrow's round-trip float repr is
    injective), not for output. At crawl scale swap the distinct stage
    for the HLL registers (functions/sketch.py) — same plan shape, the
    combiner emits ≤2^p rows instead."""
    from datax_ray.functions.relational import key_buckets, partial_agg

    COLS = [
        "o_orderkey", "o_custkey", "o_orderstatus",
        "o_totalprice", "o_orderdate", "o_orderpriority",
    ]
    num_buckets = _buckets_for(sf_dir, "orders")
    ds = _read(sf_dir, "orders", columns=COLS)

    def _vstr(col: pa.ChunkedArray) -> pa.Array:
        u = pc.unique(pc.drop_null(col.combine_chunks()))
        if pa.types.is_timestamp(u.type):
            u = u.cast(pa.int64())
        return pc.cast(u, pa.string())

    def partials(t: pa.Table) -> pa.Table:
        names, vals = [], []
        crows = {"col_name": [], "n": [], "n_nulls": []}
        for c in COLS:
            col = t[c]
            crows["col_name"].append(c)
            crows["n"].append(len(col))
            crows["n_nulls"].append(col.null_count)
            u = _vstr(col)
            names.extend([c] * len(u))
            vals.append(u)
        pairs = pa.table(
            {
                "col_name": pa.array(names, pa.string()),
                "v": pa.concat_arrays([v.combine_chunks() if isinstance(v, pa.ChunkedArray) else v for v in vals]),
            }
        )
        pairs = pairs.append_column(
            "_grp", key_buckets(pairs, ["v"], num_buckets)
        )
        counts = pa.table(
            {
                "col_name": pa.array(crows["col_name"], pa.string()),
                "v": pa.nulls(len(COLS), pa.string()),
                "_grp": pa.array([-1] * len(COLS), pa.int32()),
                "n": pa.array(crows["n"], pa.int64()),
                "n_nulls": pa.array(crows["n_nulls"], pa.int64()),
                "n_distinct": pa.array([0] * len(COLS), pa.int64()),
            }
        )
        pairs = pa.table(
            {
                "col_name": pairs["col_name"],
                "v": pairs["v"],
                "_grp": pc.cast(pairs["_grp"], pa.int32()),
                "n": pa.array(np.zeros(pairs.num_rows, np.int64), pa.int64()),
                "n_nulls": pa.array(np.zeros(pairs.num_rows, np.int64), pa.int64()),
                "n_distinct": pa.array(np.zeros(pairs.num_rows, np.int64), pa.int64()),
            }
        )
        return pa.concat_tables([counts, pairs])

    def per_bucket(g: pa.Table) -> pa.Table:
        grp = int(g["_grp"][0].as_py())
        if grp == -1:  # the count partials: just sum per column
            f = (
                g.group_by(["col_name"], use_threads=False)
                .aggregate([("n", "sum"), ("n_nulls", "sum")])
                .rename_columns(["col_name", "n", "n_nulls"])
            )
            return pa.table(
                {
                    "col_name": f["col_name"],
                    "n": f["n"],
                    "n_nulls": f["n_nulls"],
                    "n_distinct": pa.array(
                        np.zeros(f.num_rows, np.int64), pa.int64()
                    ),
                }
            )
        d = (
            g.select(["col_name", "v"])
            .group_by(["col_name", "v"], use_threads=False)
            .aggregate([])
            .group_by(["col_name"], use_threads=False)
            .aggregate([("v", "count")])
            .rename_columns(["col_name", "n_distinct"])
        )
        z = pa.array(np.zeros(d.num_rows, np.int64), pa.int64())
        return pa.table(
            {
                "col_name": d["col_name"],
                "n": z,
                "n_nulls": z,
                "n_distinct": pc.cast(d["n_distinct"], pa.int64()),
            }
        )

    partial_rows = (
        ds.map_batches(partials, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_grp")
        .map_groups(per_bucket, batch_format="pyarrow")
    )
    return partial_agg(
        partial_rows,
        keys=["col_name"],
        sums={"n": "n", "n_nulls": "n_nulls", "n_distinct": "n_distinct"},
        single_reduce=True,  # one row per column
    )


def revenue_share_nation(sf_dir: str):
    """Ratio-to-report window (SUM OVER (PARTITION BY region)): each
    nation's share of its region's order revenue in integer basis points
    — exact cents up, one floor division at the end. Plan: one combiner
    pass to per-custkey→nation cents (via two broadcast joins of the
    25/5-row dims), fold to O(nations) cells, compute shares in a single
    tiny task. Orders never shuffle; only nation cells do."""
    from datax_ray.functions.relational import partial_agg

    import pyarrow.parquet as pq

    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
    nation = pq.read_table(
        os.path.join(sf_dir, "nation.parquet"),
        columns=["n_nationkey", "n_regionkey", "n_name"],
    )

    # customer -> nation/region map is data-sized? No: nation is 25 rows;
    # customer is data-sized, so attach nation map-side to CUSTOMER, then
    # co-group orders with the (custkey -> nation) pairs by custkey hash.
    cust_n = broadcast_join(
        cust.map_batches(
            lambda t: t.rename_columns(["custkey", "n_nationkey"]),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ),
        nation,
        on="n_nationkey",
    )

    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])

    def order_cents(t: pa.Table) -> pa.Table:
        g = (
            pa.table(
                {"custkey": t["o_custkey"], "cents": _cents(t["o_totalprice"])}
            )
            .group_by(["custkey"], use_threads=False)
            .aggregate([("cents", "sum")])
            .rename_columns(["custkey", "cents"])
        )
        return g

    from datax_ray.functions.relational import key_buckets

    num_buckets = _buckets_for(sf_dir, "orders")

    def tag_orders(t: pa.Table) -> pa.Table:
        g = order_cents(t)
        return pa.table(
            {
                "custkey": g["custkey"],
                "cents": g["cents"],
                "n_name": pa.nulls(g.num_rows, pa.string()),
                "n_regionkey": pa.nulls(g.num_rows, pa.int64()),
                "_grp": key_buckets(g, ["custkey"], num_buckets),
            }
        )

    def tag_cust(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "custkey": t["custkey"],
                "cents": pa.nulls(t.num_rows, pa.int64()),
                "n_name": t["n_name"],
                "n_regionkey": pc.cast(t["n_regionkey"], pa.int64()),
                "_grp": key_buckets(t, ["custkey"], num_buckets),
            }
        )

    def per_bucket(g: pa.Table) -> pa.Table:
        is_dim = pc.is_valid(g["n_name"])
        d, o = g.filter(is_dim), g.filter(pc.invert(is_dim))
        if o.num_rows == 0 or d.num_rows == 0:
            return pa.schema(
                [("n_name", pa.string()), ("n_regionkey", pa.int64()),
                 ("cents", pa.int64())]
            ).empty_table()
        dk = d["custkey"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.argsort(dk)
        ok = o["custkey"].combine_chunks().to_numpy(zero_copy_only=False)
        pos = np.searchsorted(dk[order], ok)
        pos_c = np.minimum(pos, len(dk) - 1)
        hit = dk[order][pos_c] == ok
        o = o.filter(pa.array(hit))
        take = pa.array(order[pos_c[hit]], pa.int64())
        return (
            pa.table(
                {
                    "n_name": d["n_name"].combine_chunks().take(take),
                    "n_regionkey": d["n_regionkey"].combine_chunks().take(take),
                    "cents": o["cents"],
                }
            )
            .group_by(["n_name", "n_regionkey"], use_threads=False)
            .aggregate([("cents", "sum")])
            .rename_columns(["n_name", "n_regionkey", "cents"])
        )

    cells = partial_agg(
        orders.map_batches(tag_orders, batch_format="pyarrow", zero_copy_batch=True)
        .union(cust_n.map_batches(tag_cust, batch_format="pyarrow"))
        .groupby("_grp")
        .map_groups(per_bucket, batch_format="pyarrow"),
        keys=["n_name", "n_regionkey"],
        sums={"cents": "cents"},
        single_reduce=True,  # O(nations) cells
    )

    def shares(t: pa.Table) -> pa.Table:
        reg = t["n_regionkey"].combine_chunks().to_numpy(zero_copy_only=False)
        cents = t["cents"].combine_chunks().to_numpy(zero_copy_only=False)
        totals = {r: int(cents[reg == r].sum()) for r in np.unique(reg)}
        tot = np.array([totals[r] for r in reg], np.int64)
        return pa.table(
            {
                "n_name": t["n_name"],
                "region_cents": pa.array(tot, pa.int64()),
                "share_bp": pa.array(cents * 10_000 // tot, pa.int64()),
            }
        )

    return cells.map_batches(shares, batch_format="pyarrow")


REVENUE_SHARE_SQL = """
WITH n AS (
  SELECT n_name, n_regionkey,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM orders
  JOIN customer ON c_custkey = o_custkey
  JOIN nation ON n_nationkey = c_nationkey
  GROUP BY n_name, n_regionkey
)
SELECT n_name,
       CAST(SUM(cents) OVER (PARTITION BY n_regionkey) AS BIGINT) AS region_cents,
       CAST(cents * 10000 // SUM(cents) OVER (PARTITION BY n_regionkey) AS BIGINT)
         AS share_bp
FROM n
"""


def histogram_order_prices(sf_dir: str):
    """Equi-width value histogram (the profiling companion to
    profile_orders): order totals bucketed at $100 width, exact cents
    arithmetic. One combiner pass; the shuffle moves O(buckets) cells."""
    from datax_ray.functions.relational import partial_agg

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {"bucket_lo_cents": pc.multiply(
                pc.divide(_cents(t["o_totalprice"]), 10_000), 10_000
            )}
        )

    return partial_agg(
        _read(sf_dir, "orders", columns=["o_totalprice"]).map_batches(
            prep, batch_format="pyarrow", zero_copy_batch=True
        ),
        keys=["bucket_lo_cents"],
        counts="n_orders",
        single_reduce=True,
    )


def rollup_time_revenue(sf_dir: str):
    """Time-hierarchy rollup (day → ISO-week → 28-day period) computed
    from ONE combiner pass: order revenue aggregates to day cells once;
    the two coarser granularities fold from those cells in a single tiny
    task — the input is never re-read per granularity (same
    aggregate-once-derive-many shape as the CUBE operator). All period
    keys are integer epoch-day arithmetic, identical in SQL."""
    from datax_ray.functions.relational import partial_agg

    DAY = 86_400_000_000

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "day": pc.divide(pc.cast(t["o_orderdate"], pa.int64()), DAY),
                "cents": _cents(t["o_totalprice"]),
            }
        )

    days = partial_agg(
        _read(sf_dir, "orders", columns=["o_orderdate", "o_totalprice"]).map_batches(
            prep, batch_format="pyarrow", zero_copy_batch=True
        ),
        keys=["day"],
        sums={"cents": "cents"},
        single_reduce=True,  # O(days) cells
    )

    def fold(t: pa.Table) -> pa.Table:
        day = t["day"].combine_chunks().to_numpy(zero_copy_only=False)
        cents = t["cents"].combine_chunks().to_numpy(zero_copy_only=False)
        out = {"grain": [], "period_start_day": [], "cents": []}
        for grain, width, anchor in (("day", 1, 0), ("week", 7, 4), ("p28", 28, 4)):
            # anchor=4: 1970-01-01 was a Thursday; -4 starts weeks on Monday
            start = (day - anchor) // width * width + anchor
            for s in np.unique(start):
                out["grain"].append(grain)
                out["period_start_day"].append(int(s))
                out["cents"].append(int(cents[start == s].sum()))
        return pa.table(
            {
                "grain": pa.array(out["grain"], pa.string()),
                "period_start_day": pa.array(out["period_start_day"], pa.int64()),
                "cents": pa.array(out["cents"], pa.int64()),
            }
        )

    return days.map_batches(fold, batch_format="pyarrow", batch_size=None)


def mom_revenue_growth(sf_dir: str):
    """Month-over-month revenue growth in integer basis points — the KPI
    window (LAG over a calendar aggregate). One combiner pass to day
    cells; calendar-month fold + shifted growth division happen in a
    single tiny task over O(days) rows, so the calendar library never
    touches the data path."""
    import pandas as pd

    from datax_ray.functions.relational import partial_agg

    DAY = 86_400_000_000

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "day": pc.divide(pc.cast(t["o_orderdate"], pa.int64()), DAY),
                "cents": _cents(t["o_totalprice"]),
            }
        )

    days = partial_agg(
        _read(sf_dir, "orders", columns=["o_orderdate", "o_totalprice"]).map_batches(
            prep, batch_format="pyarrow", zero_copy_batch=True
        ),
        keys=["day"],
        sums={"cents": "cents"},
        single_reduce=True,
    )

    def fold(t: pa.Table) -> pa.Table:
        day = t["day"].combine_chunks().to_numpy(zero_copy_only=False)
        cents = t["cents"].combine_chunks().to_numpy(zero_copy_only=False)
        ts = pd.to_datetime(day * 86_400, unit="s")
        month_start = ts.to_period("M").start_time
        df = (
            pd.DataFrame({"m": month_start.asi8 // 1000, "cents": cents})
            .groupby("m", as_index=False)["cents"]
            .sum()
            .sort_values("m")
        )
        c = df["cents"].to_numpy().astype(np.int64)
        prev = np.r_[0, c[:-1]]
        d = c - prev
        # DuckDB's // truncates toward zero; numpy floors — match DuckDB
        growth = np.sign(d) * (np.abs(d) * 10_000 // np.maximum(prev, 1))
        out = pa.table(
            {
                "month_us": pa.array(df["m"].to_numpy(), pa.int64()),
                "cents": pa.array(c, pa.int64()),
                "growth_bp": pa.array(growth.astype(np.int64), pa.int64()),
            }
        )
        return out.filter(pa.array(prev > 0))  # first month has no prior

    return days.map_batches(fold, batch_format="pyarrow", batch_size=None)


def session_stats_events(sf_dir: str):
    """Per-SESSION statistics (the table behind engagement dashboards):
    30-minute-gap sessionization folded to one row per session — start,
    event count, duration. One user-hash exchange; sessions are
    contiguous runs after the per-bucket sort, so the fold is a
    run-length pass (the same kernel family as streaks/sessionize)."""
    from datax_ray.functions.relational import key_buckets

    GAP = 1_800_000_000
    num_buckets = _buckets_for(sf_dir, "events")

    def bucket(t: pa.Table) -> pa.Table:
        return t.append_column("_grp", key_buckets(t, ["user_id"], num_buckets))

    _OUT = pa.schema(
        [
            ("user_id", pa.int64()),
            ("session_start_us", pa.int64()),
            ("n_events", pa.int64()),
            ("duration_us", pa.int64()),
        ]
    )

    def per_bucket(g: pa.Table) -> pa.Table:
        g = g.sort_by(
            [
                ("user_id", "ascending"),
                ("ts", "ascending"),
                ("event_id", "ascending"),
            ]
        )
        if g.num_rows == 0:
            return _OUT.empty_table()
        uid = g["user_id"].combine_chunks().to_numpy(zero_copy_only=False)
        us = g["ts"].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
        brk = np.ones(len(uid), dtype=bool)
        brk[1:] = (uid[1:] != uid[:-1]) | (us[1:] - us[:-1] > GAP)
        starts = np.flatnonzero(brk)
        ends = np.r_[starts[1:], len(uid)]
        return pa.table(
            {
                "user_id": pa.array(uid[starts].astype(np.int64), pa.int64()),
                "session_start_us": pa.array(us[starts].astype(np.int64), pa.int64()),
                "n_events": pa.array((ends - starts).astype(np.int64), pa.int64()),
                "duration_us": pa.array(
                    (us[ends - 1] - us[starts]).astype(np.int64), pa.int64()
                ),
            }
        )

    return (
        _read(sf_dir, "events", columns=["event_id", "ts", "user_id"])
        .map_batches(bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_grp")
        .map_groups(per_bucket, batch_format="pyarrow")
    )


SESSION_STATS_SQL = """
WITH e AS (
  SELECT user_id, event_id, epoch_us(ts) AS us FROM events
), g AS (
  SELECT user_id, us, event_id,
         CASE WHEN LAG(us) OVER w IS NULL
                   OR us - LAG(us) OVER w > 1800000000
              THEN 1 ELSE 0 END AS brk
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
), s AS (
  SELECT user_id, us,
         SUM(brk) OVER (PARTITION BY user_id ORDER BY us, event_id
                        ROWS UNBOUNDED PRECEDING) AS sid
  FROM g
)
SELECT user_id, MIN(us) AS session_start_us,
       COUNT(*) AS n_events,
       CAST(MAX(us) - MIN(us) AS BIGINT) AS duration_us
FROM s GROUP BY user_id, sid
"""


MOM_SQL = """
WITH m AS (
  SELECT epoch_us(date_trunc('month', o_orderdate)) AS month_us,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM orders GROUP BY 1
), w AS (
  SELECT month_us, cents, LAG(cents) OVER (ORDER BY month_us) AS prev
  FROM m
)
SELECT month_us, cents,
       CAST((cents - prev) * 10000 // prev AS BIGINT) AS growth_bp
FROM w WHERE prev IS NOT NULL
"""


ROLLUP_TIME_SQL = """
WITH d AS (
  SELECT epoch_us(o_orderdate) // 86400000000 AS day,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM orders GROUP BY 1
)
SELECT 'day' AS grain, day AS period_start_day, cents FROM d
UNION ALL
SELECT 'week', (day - 4) // 7 * 7 + 4, CAST(SUM(cents) AS BIGINT)
FROM d GROUP BY 2
UNION ALL
SELECT 'p28', (day - 4) // 28 * 28 + 4, CAST(SUM(cents) AS BIGINT)
FROM d GROUP BY 2
"""


def user_growth_curve(sf_dir: str):
    """Cumulative-distinct growth curve: per day, how many users were
    seen for the FIRST time and the running total — COUNT(DISTINCT) OVER
    (ORDER BY day) without any distinct window machinery: a min-day
    combiner reduces the stream to one row per user, day counts fold to
    O(days) cells, and the cumsum is one tiny task."""
    from datax_ray.functions.relational import partial_agg

    DAY = 86_400_000_000

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": t["user_id"],
                "first_day": pc.divide(pc.cast(t["ts"], pa.int64()), DAY),
            }
        )

    first_seen = partial_agg(
        _read(sf_dir, "events", columns=["ts", "user_id"]).map_batches(
            prep, batch_format="pyarrow", zero_copy_batch=True
        ),
        keys=["user_id"],
        mins={"first_day": "first_day"},
    )

    day_counts = partial_agg(
        first_seen,
        keys=["first_day"],
        counts="new_users",
        single_reduce=True,  # O(days) cells
    )

    def cumsum(t: pa.Table) -> pa.Table:
        t = t.sort_by("first_day")
        n = t["new_users"].combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "day": t["first_day"],
                "new_users": pc.cast(t["new_users"], pa.int64()),
                "cum_users": pa.array(np.cumsum(n).astype(np.int64), pa.int64()),
            }
        )

    return day_counts.map_batches(cumsum, batch_format="pyarrow", batch_size=None)


def wau_trailing_7d(sf_dir: str):
    """Sliding-window DISTINCT count — trailing-7-day active users per
    day (the WAU dashboard metric, a COUNT(DISTINCT) OVER RANGE that SQL
    engines struggle to distribute). Plan: distinct (user, day) combiner
    first (shuffle is bounded by distinct pairs, never events), then each
    pair CONTRIBUTES to the 7 window-days it covers — a vectorized
    7-way repeat — and a second distinct-pair pass counts users per
    window day (a day appears iff its trailing week saw any activity;
    the oracle builds the identical day grid)."""
    from datax_ray.functions.relational import key_buckets, partial_agg

    DAY = 86_400_000_000
    num_buckets = _buckets_for(sf_dir, "events")

    def pairs(t: pa.Table) -> pa.Table:
        g = (
            pa.table(
                {
                    "user_id": t["user_id"],
                    "day": pc.divide(pc.cast(t["ts"], pa.int64()), DAY),
                }
            )
            .group_by(["user_id", "day"], use_threads=False)
            .aggregate([])
        )
        return g.append_column("_grp", key_buckets(g, ["user_id"], num_buckets))

    def explode_window(g: pa.Table) -> pa.Table:
        # per-bucket: dedup cross-batch pairs, then spread each over the
        # 7 trailing-window days it contributes to
        g = g.select(["user_id", "day"]).group_by(
            ["user_id", "day"], use_threads=False
        ).aggregate([])
        uid = g["user_id"].combine_chunks().to_numpy(zero_copy_only=False)
        day = g["day"].combine_chunks().to_numpy(zero_copy_only=False)
        uid7 = np.repeat(uid, 7)
        wday = np.repeat(day, 7) + np.tile(np.arange(7, dtype=day.dtype), len(day))
        h = (
            pa.table(
                {
                    "user_id": pa.array(uid7, pa.int64()),
                    "wday": pa.array(wday, pa.int64()),
                }
            )
            .group_by(["user_id", "wday"], use_threads=False)
            .aggregate([])
        )
        # bucket by user so a (user, wday) pair dedups exactly once
        return h.append_column("_g2", key_buckets(h, ["user_id"], num_buckets))

    def count_per_day(g: pa.Table) -> pa.Table:
        d = (
            g.select(["user_id", "wday"])
            .group_by(["user_id", "wday"], use_threads=False)
            .aggregate([])
            .group_by(["wday"], use_threads=False)
            .aggregate([("user_id", "count")])
            .rename_columns(["wday", "wau"])
        )
        return pa.table(
            {"day": d["wday"], "wau": pc.cast(d["wau"], pa.int64())}
        )

    per_bucket_counts = (
        _read(sf_dir, "events", columns=["ts", "user_id"])
        .map_batches(pairs, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_grp")
        .map_groups(explode_window, batch_format="pyarrow")
        .groupby("_g2")
        .map_groups(count_per_day, batch_format="pyarrow")
    )
    # partial day counts from different user-buckets sum exactly (buckets
    # partition users, so no (user, day) is counted twice)
    return partial_agg(
        per_bucket_counts,
        keys=["day"],
        sums={"wau": "wau"},
        single_reduce=True,  # O(days) cells
    )


def user_event_types_list(sf_dir: str):
    """Grouped DISTINCT ordered string aggregation: each user's sorted,
    comma-joined set of event types (the categorical-feature export a
    feature store emits). Distinct-pair combiner shrinks the stream
    before the one user-hash exchange; the join is a run-offset ListArray
    + one pc.binary_join per bucket — zero per-row Python."""
    from datax_ray.functions.relational import key_buckets

    num_buckets = _buckets_for(sf_dir, "events")

    def pairs(t: pa.Table) -> pa.Table:
        g = (
            t.select(["user_id", "event_type"])
            .group_by(["user_id", "event_type"], use_threads=False)
            .aggregate([])
        )
        return g.append_column("_grp", key_buckets(g, ["user_id"], num_buckets))

    _OUT = pa.schema(
        [("user_id", pa.int64()), ("n_types", pa.int64()), ("types", pa.string())]
    )

    def per_bucket(g: pa.Table) -> pa.Table:
        g = (
            g.select(["user_id", "event_type"])
            .group_by(["user_id", "event_type"], use_threads=False)
            .aggregate([])  # cross-batch distinct
            .sort_by([("user_id", "ascending"), ("event_type", "ascending")])
        )
        if g.num_rows == 0:
            return _OUT.empty_table()
        uid = g["user_id"].combine_chunks().to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(np.r_[True, uid[1:] != uid[:-1]])
        offsets = np.r_[starts, len(uid)].astype(np.int32)
        lists = pa.ListArray.from_arrays(
            pa.array(offsets, pa.int32()), g["event_type"].combine_chunks()
        )
        return pa.table(
            {
                "user_id": pa.array(uid[starts].astype(np.int64), pa.int64()),
                "n_types": pa.array(np.diff(offsets).astype(np.int64), pa.int64()),
                "types": pc.binary_join(lists, ","),
            }
        )

    return (
        _read(sf_dir, "events", columns=["user_id", "event_type"])
        .map_batches(pairs, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_grp")
        .map_groups(per_bucket, batch_format="pyarrow")
    )


def order_count_distribution(sf_dir: str):
    """Frequency-of-frequencies: how many customers placed exactly k
    orders (the engagement-distribution histogram; also TPC-H Q13's
    second half). Two combiner passes — per-custkey counts, then counts
    of counts — so the second shuffle moves O(distinct k) cells."""
    from datax_ray.functions.relational import partial_agg

    per_cust = partial_agg(
        _read(sf_dir, "orders", columns=["o_custkey"]),
        keys=["o_custkey"],
        counts="k",
    )
    return partial_agg(
        per_cust,
        keys=["k"],
        counts="n_customers",
        single_reduce=True,  # O(distinct k)
    )


ORDER_DIST_SQL = """
WITH c AS (SELECT o_custkey, COUNT(*) AS k FROM orders GROUP BY o_custkey)
SELECT k, COUNT(*) AS n_customers FROM c GROUP BY k
"""


TYPES_LIST_SQL = """
WITH d AS (SELECT DISTINCT user_id, event_type FROM events)
SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_types,
       string_agg(event_type, ',' ORDER BY event_type) AS types
FROM d GROUP BY user_id
"""


WAU_SQL = """
WITH p AS (
  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day FROM events
), w AS (
  SELECT DISTINCT user_id, day + off AS day
  FROM p, (SELECT UNNEST(range(7)) AS off)
)
SELECT day, COUNT(*) AS wau FROM w GROUP BY day
"""


GROWTH_SQL = """
WITH f AS (
  SELECT user_id, MIN(epoch_us(ts) // 86400000000) AS first_day
  FROM events GROUP BY user_id
), d AS (
  SELECT first_day AS day, COUNT(*) AS new_users FROM f GROUP BY 1
)
SELECT day, new_users,
       CAST(SUM(new_users) OVER (ORDER BY day) AS BIGINT) AS cum_users
FROM d
"""


HISTOGRAM_SQL = """
SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) // 10000 * 10000
         AS bucket_lo_cents,
       COUNT(*) AS n_orders
FROM orders GROUP BY 1
"""


def fk_integrity_audit(sf_dir: str):
    """Referential-integrity audit (the DQ gate a warehouse load runs):
    orphan counts for orders→customer and lineitem→orders, one summary
    row per relation. Child keys pre-shrink to per-batch DISTINCT values
    (combiner) before the distributed ANTI join — the exchange moves
    distinct keys, never child rows."""
    from datax_ray.functions.relational import semi_join

    def audit(child, col, parent, pcol, relation):
        def uniq(t: pa.Table) -> pa.Table:
            return pa.table({col: pc.unique(t[col])})

        kids = _read(sf_dir, child, columns=[col]).map_batches(
            uniq, batch_format="pyarrow", zero_copy_batch=True
        )
        par = _read(sf_dir, parent, columns=[pcol])
        orphans = semi_join(kids, par, on=col, right_on=pcol, anti=True)

        def count(t: pa.Table) -> pa.Table:
            return pa.table({"n": pa.array([t.num_rows], pa.int64())})

        n_orphan = sum(
            int(r["n"])
            for r in orphans.map_batches(count, batch_format="pyarrow").take_all()
        )  # O(orphan batches) tiny rows
        total = parquet_rows(os.path.join(sf_dir, f"{child}.parquet"))
        return {"relation": relation, "child_rows": total, "orphan_keys": n_orphan}

    rows = [
        audit("orders", "o_custkey", "customer", "c_custkey",
              "orders->customer"),
        audit("lineitem", "l_orderkey", "orders", "o_orderkey",
              "lineitem->orders"),
    ]
    return pa.table(
        {
            "relation": pa.array([r["relation"] for r in rows], pa.string()),
            "child_rows": pa.array([r["child_rows"] for r in rows], pa.int64()),
            "orphan_keys": pa.array([r["orphan_keys"] for r in rows], pa.int64()),
        }
    )


FK_AUDIT_SQL = """
SELECT 'orders->customer' AS relation,
       (SELECT COUNT(*) FROM orders) AS child_rows,
       CAST((SELECT COUNT(DISTINCT o_custkey) FROM orders
             WHERE o_custkey NOT IN (SELECT c_custkey FROM customer))
            AS BIGINT) AS orphan_keys
UNION ALL
SELECT 'lineitem->orders',
       (SELECT COUNT(*) FROM lineitem),
       CAST((SELECT COUNT(DISTINCT l_orderkey) FROM lineitem
             WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders))
            AS BIGINT)
"""


PROFILE_SQL = """
SELECT 'o_orderkey' AS col_name, COUNT(*) AS n,
       COUNT(*) - COUNT(o_orderkey) AS n_nulls,
       COUNT(DISTINCT o_orderkey) AS n_distinct FROM orders
UNION ALL SELECT 'o_custkey', COUNT(*), COUNT(*) - COUNT(o_custkey),
       COUNT(DISTINCT o_custkey) FROM orders
UNION ALL SELECT 'o_orderstatus', COUNT(*), COUNT(*) - COUNT(o_orderstatus),
       COUNT(DISTINCT o_orderstatus) FROM orders
UNION ALL SELECT 'o_totalprice', COUNT(*), COUNT(*) - COUNT(o_totalprice),
       COUNT(DISTINCT o_totalprice) FROM orders
UNION ALL SELECT 'o_orderdate', COUNT(*), COUNT(*) - COUNT(o_orderdate),
       COUNT(DISTINCT o_orderdate) FROM orders
UNION ALL SELECT 'o_orderpriority', COUNT(*), COUNT(*) - COUNT(o_orderpriority),
       COUNT(DISTINCT o_orderpriority) FROM orders
"""


def profit_by_nation(sf_dir: str):
    """TPC-H-Q9-shaped multi-join profit rollup: discounted revenue of
    PROMO-part line items, by supplier nation — one query exercising the
    whole join toolkit at its proper scale tiers: the data-sized part
    selection reaches lineitem through the BLOOM-prefiltered distributed
    semi-join (definite non-PROMO rows drop BEFORE any exchange), the
    data-sized supplier dimension attaches in a suppkey co-group (never
    broadcast), the 25-row nation table broadcasts, and revenue
    pre-aggregates per (suppkey) inside map_batches so the exchange moves
    partials. All integer: revenue_e4 = cents × (100 − discount_pct)."""
    from datax_ray.functions.relational import key_buckets, partial_agg, semi_join

    import pyarrow.parquet as pq

    est = parquet_rows(os.path.join(sf_dir, "part.parquet"))
    promo_parts = _read(sf_dir, "part", columns=["p_partkey", "p_type"]).filter(
        expr="p_type == 'PROMO'"
    )

    li = _read(
        sf_dir, "lineitem",
        columns=["l_partkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )
    promo_li = semi_join(
        li, promo_parts, on="l_partkey", right_on="p_partkey",
        bloom_bits=max(1 << 16, est * 10),
    )

    def per_supp(t: pa.Table) -> pa.Table:
        cents = _cents(t["l_extendedprice"])
        pct = pc.cast(pc.round(pc.multiply(t["l_discount"], 100)), pa.int64())
        rev = pc.multiply(cents, pc.subtract(100, pct))
        g = (
            pa.table({"suppkey": t["l_suppkey"], "revenue_e4": rev})
            .group_by(["suppkey"], use_threads=False)
            .aggregate([("revenue_e4", "sum")])
            .rename_columns(["suppkey", "revenue_e4"])
        )
        g = g.append_column(
            "s_nationkey", pa.nulls(g.num_rows, pa.int64())
        )
        return g.append_column("_grp", key_buckets(g, ["suppkey"], 64))

    nation = pq.read_table(
        os.path.join(sf_dir, "nation.parquet"), columns=["n_nationkey", "n_name"]
    )
    nation = nation.set_column(
        0, "n_nationkey", pc.cast(nation["n_nationkey"], pa.int64())
    )

    def supp_dim(t: pa.Table) -> pa.Table:
        d = pa.table(
            {
                "suppkey": t["s_suppkey"],
                "revenue_e4": pa.nulls(t.num_rows, pa.int64()),
                "s_nationkey": pc.cast(t["s_nationkey"], pa.int64()),
            }
        )
        return d.append_column("_grp", key_buckets(d, ["suppkey"], 64))

    def attach(g: pa.Table) -> pa.Table:
        is_dim = pc.is_valid(g["s_nationkey"])
        d, o = g.filter(is_dim), g.filter(pc.invert(is_dim))
        if d.num_rows == 0 or o.num_rows == 0:
            return pa.schema(
                [("n_nationkey", pa.int64()), ("revenue_e4", pa.int64())]
            ).empty_table()
        dk = d["suppkey"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.argsort(dk)
        ok = o["suppkey"].combine_chunks().to_numpy(zero_copy_only=False)
        pos = np.minimum(np.searchsorted(dk[order], ok), len(dk) - 1)
        hit = dk[order][pos] == ok
        o = o.filter(pa.array(hit))
        take = pa.array(order[pos[hit]], pa.int64())
        return (
            pa.table(
                {
                    "n_nationkey": d["s_nationkey"].combine_chunks().take(take),
                    "revenue_e4": o["revenue_e4"],
                }
            )
            .group_by(["n_nationkey"], use_threads=False)
            .aggregate([("revenue_e4", "sum")])
            .rename_columns(["n_nationkey", "revenue_e4"])
        )

    cells = partial_agg(
        promo_li.map_batches(per_supp, batch_format="pyarrow")
        .union(
            _read(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"]).map_batches(
                supp_dim, batch_format="pyarrow", zero_copy_batch=True
            )
        )
        .groupby("_grp")
        .map_groups(attach, batch_format="pyarrow"),
        keys=["n_nationkey"],
        sums={"revenue_e4": "revenue_e4"},
        single_reduce=True,  # O(nations)
    )
    return broadcast_join(cells, nation, on="n_nationkey").map_batches(
        lambda t: t.select(["n_name", "revenue_e4"]), batch_format="pyarrow"
    )


PROFIT_SQL = """
SELECT n_name,
       CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))) AS BIGINT)
         AS revenue_e4
FROM lineitem
JOIN part ON p_partkey = l_partkey AND p_type = 'PROMO'
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation ON n_nationkey = s_nationkey
GROUP BY n_name
"""


def trend_daily_events(sf_dir: str):
    """Per-type OLS trend of daily event volume — the drift monitor a
    pipeline SLO dashboard runs. The regression reduces to decomposable
    integer sums over (day, count) points: one combiner pass shrinks the
    stream to O(types × days) cells, then slope = (nΣxy − ΣxΣy) /
    (nΣxx − (Σx)²) is emitted as EXACT integer numerator/denominator (the
    float division happens after the compare boundary, like
    corr_stats_lineitem)."""
    from datax_ray.functions.relational import partial_agg

    DAY = 86_400_000_000

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": t["event_type"],
                "day": pc.divide(pc.cast(t["ts"], pa.int64()), DAY),
            }
        )

    cells = partial_agg(
        _read(sf_dir, "events", columns=["ts", "event_type"]).map_batches(
            prep, batch_format="pyarrow", zero_copy_batch=True
        ),
        keys=["event_type", "day"],
        counts="y",
        single_reduce=True,  # O(types x days) cells
    )

    def fold(g: pa.Table) -> pa.Table:
        x = g["day"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        y = g["y"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(x)
        sx, sy = int(x.sum()), int(y.sum())
        sxy = int((x * y).sum())
        sxx = int((x * x).sum())
        return pa.table(
            {
                "event_type": g["event_type"].slice(0, 1),
                "n_days": pa.array([n], pa.int64()),
                "slope_num": pa.array([n * sxy - sx * sy], pa.int64()),
                "slope_den": pa.array([n * sxx - sx * sx], pa.int64()),
            }
        )

    return cells.groupby("event_type").map_groups(fold, batch_format="pyarrow")


def heatmap_dow_hour(sf_dir: str):
    """Weekday × hour activity heatmap cells per event type (the usage-
    pattern rollup behind every ops dashboard). Pure integer epoch
    arithmetic on BOTH engines (dow: 1970-01-01 is a Thursday, hence the
    +4 offset; hour: µs // 3600e6 mod 24 — UTC, no locale/timezone
    surface), so cells hash bit-for-bit. One combiner pass; the shuffle
    moves O(types × 168) cells, never events."""
    from datax_ray.functions.relational import partial_agg

    HOUR, DAY = 3_600_000_000, 86_400_000_000

    def prep_np(t: pa.Table) -> pa.Table:
        us = pc.cast(t["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        days = us // DAY
        return pa.table(
            {
                "event_type": t["event_type"],
                "dow": pa.array((days + 4) % 7, pa.int64()),
                "hour": pa.array((us // HOUR) % 24, pa.int64()),
            }
        )

    return partial_agg(
        _read(sf_dir, "events", columns=["ts", "event_type"]).map_batches(
            prep_np, batch_format="pyarrow", zero_copy_batch=True
        ),
        keys=["event_type", "dow", "hour"],
        counts="n_events",
        single_reduce=True,  # O(types x 168) cells
    )


HEATMAP_SQL = """
SELECT event_type,
       (epoch_us(ts) // 86400000000 + 4) % 7 AS dow,
       (epoch_us(ts) // 3600000000) % 24 AS hour,
       COUNT(*) AS n_events
FROM events GROUP BY 1, 2, 3
"""


TREND_SQL = """
WITH d AS (
  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
         CAST(COUNT(*) AS BIGINT) AS y
  FROM events GROUP BY event_type, day
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_days,
       CAST(COUNT(*) * SUM(day * y) - SUM(day) * SUM(y) AS BIGINT) AS slope_num,
       CAST(COUNT(*) * SUM(day * day) - SUM(day) * SUM(day) AS BIGINT) AS slope_den
FROM d GROUP BY event_type
"""


CORR_STATS_SQL = """
SELECT l_returnflag,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_q,
       CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_p_cents,
       CAST(SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qq,
       CAST(SUM(CAST(l_quantity AS BIGINT) * CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_qp_cents,
       COUNT(*) AS n
FROM lineitem GROUP BY l_returnflag
"""


def rolling_daily_revenue_7d(sf_dir: str):
    """Trailing 7-row moving sum of daily revenue per order priority (the
    SQL window frame ROWS BETWEEN 6 PRECEDING AND CURRENT ROW). Scale
    shape: the combiner pre-aggregates to one (priority, day) cell per
    batch BEFORE any shuffle, so the keyed window stage sorts O(keys x
    days) cells, never order rows; the sliding sum is one cumsum minus its
    7-lagged self — vectorized, no per-row Python."""
    from datax_ray.functions.relational import partial_agg

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderpriority": t["o_orderpriority"],
                "day": pc.divide(pc.cast(t["o_orderdate"], pa.int64()), 86_400_000_000),
                "revenue_cents": _cents(t["o_totalprice"]),
            }
        )

    daily = partial_agg(
        _read(
            sf_dir, "orders",
            columns=["o_orderpriority", "o_orderdate", "o_totalprice"],
        ).map_batches(prep, batch_format="pyarrow", zero_copy_batch=True),
        keys=["o_orderpriority", "day"],
        sums={"revenue_cents": "revenue_cents"},
    )

    def window(t: pa.Table) -> pa.Table:
        t = t.sort_by([("day", "ascending")])
        rev = t["revenue_cents"].to_numpy(zero_copy_only=False)
        cum = np.cumsum(rev)
        roll = cum.copy()
        roll[7:] -= cum[:-7]
        return t.append_column("revenue_7d_cents", pa.array(roll, pa.int64()))

    return daily.groupby("o_orderpriority").map_groups(
        window, batch_format="pyarrow"
    )


ROLLING_7D_SQL = """
WITH daily AS (
  SELECT o_orderpriority,
         epoch_us(o_orderdate) // 86400000000 AS day,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
  FROM orders GROUP BY 1, 2
)
SELECT o_orderpriority, day, revenue_cents,
       CAST(SUM(revenue_cents) OVER (
         PARTITION BY o_orderpriority ORDER BY day
         ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT) AS revenue_7d_cents
FROM daily
"""


def rolling_range_30d_revenue(sf_dir: str):
    """RANGE-frame moving sum (RANGE BETWEEN 29 PRECEDING AND CURRENT ROW
    over the day value): unlike the ROWS frame of rolling_daily_revenue_7d,
    the window is a VALUE interval — gap days shrink it, so the two frames
    differ whenever a priority has no orders for a day. Same scale shape:
    combiner pre-aggregates to (priority, day) cells, then per key one
    cumsum + one searchsorted against the day timeline — vectorized, and
    order rows never shuffle."""
    from datax_ray.functions.relational import partial_agg

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderpriority": t["o_orderpriority"],
                "day": pc.divide(pc.cast(t["o_orderdate"], pa.int64()), 86_400_000_000),
                "revenue_cents": _cents(t["o_totalprice"]),
            }
        )

    daily = partial_agg(
        _read(
            sf_dir, "orders",
            columns=["o_orderpriority", "o_orderdate", "o_totalprice"],
        ).map_batches(prep, batch_format="pyarrow", zero_copy_batch=True),
        keys=["o_orderpriority", "day"],
        sums={"revenue_cents": "revenue_cents"},
    )

    def window(t: pa.Table) -> pa.Table:
        t = t.sort_by([("day", "ascending")])
        days = t["day"].to_numpy(zero_copy_only=False)
        rev = t["revenue_cents"].to_numpy(zero_copy_only=False)
        cum = np.cumsum(rev)
        left = np.searchsorted(days, days - 29, side="left")
        roll = cum - np.where(left > 0, cum[left - 1], 0)
        return t.append_column("revenue_30d_cents", pa.array(roll, pa.int64()))

    return daily.groupby("o_orderpriority").map_groups(
        window, batch_format="pyarrow"
    )


ROLLING_RANGE_SQL = """
WITH daily AS (
  SELECT o_orderpriority,
         epoch_us(o_orderdate) // 86400000000 AS day,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
  FROM orders GROUP BY 1, 2
)
SELECT o_orderpriority, day, revenue_cents,
       CAST(SUM(revenue_cents) OVER (
         PARTITION BY o_orderpriority ORDER BY day
         RANGE BETWEEN 29 PRECEDING AND CURRENT ROW) AS BIGINT) AS revenue_30d_cents
FROM daily
"""


def lag_delta_orders(sf_dir: str):
    """LAG window: each order's price delta vs the same customer's previous
    order (ordered by date, orderkey tiebreak; first order per customer is
    NULL). Scale shape: rows hash-bucket by customer (all of one
    customer's orders co-locate, many customers per bucket), one sort +
    one shifted subtraction per bucket — run-boundary rows masked to null
    via a vectorized key-change comparison, no per-customer Python."""
    num_buckets = _buckets_for(sf_dir, "orders")

    def bucket(t: pa.Table) -> pa.Table:
        from datax_ray.functions.relational import key_buckets

        return pa.table(
            {
                "o_orderkey": t["o_orderkey"],
                "o_custkey": t["o_custkey"],
                "price_cents": _cents(t["o_totalprice"]),
                "o_orderdate": t["o_orderdate"],
                "_grp": key_buckets(t, ["o_custkey"], num_buckets),
            }
        )

    def lag(t: pa.Table) -> pa.Table:
        t = t.sort_by(
            [("o_custkey", "ascending"), ("o_orderdate", "ascending"),
             ("o_orderkey", "ascending")]
        )
        ck = t["o_custkey"].to_numpy(zero_copy_only=False)
        p = t["price_cents"].to_numpy(zero_copy_only=False)
        delta = np.empty(len(p), dtype=np.int64)
        delta[1:] = p[1:] - p[:-1]
        new_run = np.ones(len(p), dtype=bool)
        new_run[1:] = ck[1:] != ck[:-1]
        return pa.table(
            {
                "o_orderkey": t["o_orderkey"],
                "o_custkey": t["o_custkey"],
                "delta_cents": pa.array(
                    np.ma.masked_array(delta, mask=new_run), pa.int64()
                ),
            }
        )

    return (
        _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"])
        .map_batches(bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_grp")
        .map_groups(lag, batch_format="pyarrow")
    )


LAG_DELTA_SQL = """
SELECT o_orderkey, o_custkey,
       CAST(ROUND(o_totalprice * 100) AS BIGINT)
       - LAG(CAST(ROUND(o_totalprice * 100) AS BIGINT)) OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ) AS delta_cents
FROM orders
"""


def quality_cutoff_docs(sf_dir: str):
    """Per-source quality gate: keep documents at or above their OWN
    source's 25th-percentile length — the curation pattern where a global
    cutoff would silently delete whole low-verbosity sources. Two stages:
    the (source, n_chars) histogram combiner (shuffle bounded by the value
    grid, never rows) folds to one exact quantile_disc cutoff per source;
    the cutoffs — O(|sources|) rows by construction — broadcast into a
    stateless filter map over the corpus. No join, no second shuffle."""
    from datax_ray.functions.relational import partial_agg

    hist = partial_agg(
        _read(sf_dir, "documents", columns=["source", "n_chars"]),
        keys=["source", "n_chars"],
        counts="n",
        single_reduce=True,  # |sources| x |distinct lengths| grid
    )

    def fold(t: pa.Table) -> pa.Table:
        t = t.sort_by([("source", "ascending"), ("n_chars", "ascending")])
        src = t["source"].to_numpy(zero_copy_only=False)
        val = t["n_chars"].to_numpy(zero_copy_only=False)
        cnt = t["n"].to_numpy(zero_copy_only=False)
        new_run = np.ones(len(src), dtype=bool)
        new_run[1:] = src[1:] != src[:-1]
        starts = np.flatnonzero(new_run)
        out_src, out_cut = [], []
        for i, s in enumerate(starts):
            e = starts[i + 1] if i + 1 < len(starts) else len(src)
            cum = np.cumsum(cnt[s:e])
            idx = max(0, int(np.ceil(0.25 * cum[-1])) - 1)
            out_src.append(src[s])
            out_cut.append(int(val[s:e][np.searchsorted(cum, idx + 1)]))
        return pa.table(
            {
                "source": pa.array(out_src, pa.string()),
                "p25": pa.array(out_cut, pa.int64()),
            }
        )

    cuts = hist.map_batches(fold, batch_format="pyarrow", batch_size=None).take_all()
    p25 = {r["source"]: r["p25"] for r in cuts}  # O(|sources|) driver rows

    def gate(t: pa.Table) -> pa.Table:
        import pandas as pd

        thr = (
            pd.Series(t["source"].to_numpy(zero_copy_only=False))
            .map(p25)
            .to_numpy(dtype=np.int64)
        )
        keep = t["n_chars"].to_numpy(zero_copy_only=False) >= thr
        return t.filter(pa.array(keep))

    return _read(sf_dir, "documents", columns=["doc_id", "source", "n_chars"]).map_batches(
        gate, batch_format="pyarrow", zero_copy_batch=True
    )


QUALITY_CUTOFF_SQL = """
WITH cut AS (
  SELECT source, quantile_disc(n_chars, 0.25) AS p25
  FROM documents GROUP BY source
)
SELECT d.doc_id, d.source, d.n_chars
FROM documents d JOIN cut USING (source)
WHERE d.n_chars >= cut.p25
"""


def dense_rank_cume_orders(sf_dir: str):
    """DENSE_RANK + CUME_DIST per customer — the remaining two SQL rank
    variants next to percent_rank (method=min) and NTILE. cume_dist is
    emitted as integer basis points via floor division (peers counted
    with a RANGE frame in the oracle), so the compare path stays
    float-free. Same per-key machinery: customer-hash buckets, one sort,
    then run-indexed formulas — dense rank counts value-runs since the
    partition start, cume counts through the current value-run's end —
    all vectorized, no per-customer Python."""
    num_buckets = _buckets_for(sf_dir, "orders")

    def bucket(t: pa.Table) -> pa.Table:
        from datax_ray.functions.relational import key_buckets

        return pa.table(
            {
                "o_custkey": t["o_custkey"],
                "o_orderkey": t["o_orderkey"],
                "price_cents": _cents(t["o_totalprice"]),
                "_grp": key_buckets(t, ["o_custkey"], num_buckets),
            }
        )

    def ranks(t: pa.Table) -> pa.Table:
        t = t.sort_by(
            [("o_custkey", "ascending"), ("price_cents", "ascending"),
             ("o_orderkey", "ascending")]
        )
        ck = t["o_custkey"].to_numpy(zero_copy_only=False)
        p = t["price_cents"].to_numpy(zero_copy_only=False)
        n = len(ck)
        new_ck = np.ones(n, dtype=bool)
        new_ck[1:] = ck[1:] != ck[:-1]
        new_pr = new_ck.copy()
        new_pr[1:] |= p[1:] != p[:-1]
        ck_starts = np.flatnonzero(new_ck)
        ck_run = np.cumsum(new_ck) - 1
        ck_start = ck_starts[ck_run]
        pr_run = np.cumsum(new_pr) - 1
        pr_starts = np.flatnonzero(new_pr)
        dense = pr_run - pr_run[ck_start] + 1
        run_ends = np.append(pr_starts[1:], n) - 1
        cnt_le = run_ends[pr_run] - ck_start + 1
        sizes = np.diff(np.append(ck_starts, n))
        cume_bp = cnt_le * 10_000 // sizes[ck_run]
        return pa.table(
            {
                "o_custkey": t["o_custkey"],
                "o_orderkey": t["o_orderkey"],
                "price_cents": t["price_cents"],
                "drnk": pa.array(dense.astype(np.int64)),
                "cume_bp": pa.array(cume_bp.astype(np.int64)),
            }
        )

    return (
        _read(sf_dir, "orders", columns=["o_custkey", "o_orderkey", "o_totalprice"])
        .map_batches(bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_grp")
        .map_groups(ranks, batch_format="pyarrow")
    )


DENSE_RANK_SQL = """
WITH c AS (
  SELECT o_custkey, o_orderkey,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS price_cents
  FROM orders
)
SELECT o_custkey, o_orderkey, price_cents,
       CAST(DENSE_RANK() OVER (
         PARTITION BY o_custkey ORDER BY price_cents) AS BIGINT) AS drnk,
       CAST(COUNT(*) OVER (
           PARTITION BY o_custkey ORDER BY price_cents
           RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) * 10000
         // COUNT(*) OVER (PARTITION BY o_custkey) AS BIGINT) AS cume_bp
FROM c
"""


def mad_order_price(sf_dir: str):
    """Per-group median absolute deviation — the robust dispersion cut a
    curation pipeline pairs with the median (outlier fences that heavy
    tails can't drag). BOTH medians fold from ONE (group, cents)
    histogram: the combiner shuffle moves O(groups x distinct cents)
    rows once; the deviation histogram is a value transform of the same
    counts, so no second pass over the data exists. quantile_disc index
    rule on both engines — integer-exact."""
    from datax_ray.functions.relational import partial_agg

    ds = _read(sf_dir, "orders", columns=["o_orderpriority", "o_totalprice"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderpriority": t["o_orderpriority"],
                "cents": _cents(t["o_totalprice"]),
            }
        )

    hist = partial_agg(
        ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True),
        keys=["o_orderpriority", "cents"],
        counts="n",
        single_reduce=True,  # histogram is bounded by the value grid
    )

    def _disc(vals: np.ndarray, cnts: np.ndarray) -> int:
        # quantile_disc(0.5): value at 0-based index ceil(n/2)-1 of the
        # expanded sorted multiset, located via the cumulative histogram
        order = np.argsort(vals, kind="stable")
        vals, cnts = vals[order], cnts[order]
        cum = np.cumsum(cnts)
        idx = max(0, int(np.ceil(0.5 * cum[-1])) - 1)
        return int(vals[np.searchsorted(cum, idx + 1)])

    def fold(t: pa.Table) -> pa.Table:
        prios, meds, mads = [], [], []
        for pr, vals, cnts in _cell_groups(t, "o_orderpriority", "cents"):
            med = _disc(vals, cnts)
            mad = _disc(np.abs(vals - med), cnts)
            prios.append(pr)
            meds.append(med)
            mads.append(mad)
        return pa.table(
            {
                "o_orderpriority": pa.array(prios, pa.string()),
                "p50_cents": pa.array(meds, pa.int64()),
                "mad_cents": pa.array(mads, pa.int64()),
            }
        )

    return hist.map_batches(fold, batch_format="pyarrow", batch_size=None)


MAD_SQL = """
WITH c AS (
  SELECT o_orderpriority, CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
), med AS (
  SELECT o_orderpriority, quantile_disc(cents, 0.5) AS p50_cents
  FROM c GROUP BY 1
)
SELECT c.o_orderpriority, ANY_VALUE(m.p50_cents) AS p50_cents,
       quantile_disc(abs(c.cents - m.p50_cents), 0.5) AS mad_cents
FROM c JOIN med m USING (o_orderpriority)
GROUP BY c.o_orderpriority
"""


def mode_event_type_per_user(sf_dir: str):
    """Grouped MODE with a deterministic tie-break (highest count, then
    smallest value — DuckDB's bare mode() leaves ties unspecified, so the
    oracle uses the same explicit ROW_NUMBER ordering). Scale shape: the
    combiner pre-counts (user, type) pairs per batch, then the existing
    top-N-per-key kernel keeps ONE row per user per batch and per bucket —
    the shuffle carries at most distinct-pairs rows, never events."""
    from datax_ray.functions.relational import partial_agg, top_n_per_key

    counts = partial_agg(
        _read(sf_dir, "events", columns=["user_id", "event_type"]),
        keys=["user_id", "event_type"],
        counts="cnt",
    )

    def neg(t: pa.Table) -> pa.Table:
        return t.append_column("neg_cnt", pc.negate_checked(t["cnt"]))

    top = top_n_per_key(
        counts.map_batches(neg, batch_format="pyarrow"),
        keys=["user_id"],
        order_cols=["neg_cnt", "event_type"],
        n=1,
        descending=False,  # neg_cnt asc == cnt desc; event_type asc tie-break
    )

    def rename(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": t["user_id"],
                "mode_event_type": t["event_type"],
                "cnt": t["cnt"],
            }
        )

    return top.map_batches(rename, batch_format="pyarrow")


MODE_SQL = """
WITH c AS (
  SELECT user_id, event_type, COUNT(*) AS cnt FROM events GROUP BY 1, 2
)
SELECT user_id, event_type AS mode_event_type, cnt
FROM c
QUALIFY ROW_NUMBER() OVER (
  PARTITION BY user_id ORDER BY cnt DESC, event_type) = 1
"""


def ntile_orders_by_price(sf_dir: str):
    """NTILE(4) quartile per customer ordered by (price, orderkey): the
    SQL-standard fill (first cnt%n tiles get the extra row). Same per-key
    window machinery as lag_delta_orders — customer-hash buckets, one sort
    + one vectorized run-indexed formula per bucket, no per-customer
    Python."""
    num_buckets = _buckets_for(sf_dir, "orders")
    N = 4

    def bucket(t: pa.Table) -> pa.Table:
        from datax_ray.functions.relational import key_buckets

        return pa.table(
            {
                "o_orderkey": t["o_orderkey"],
                "o_custkey": t["o_custkey"],
                "price_cents": _cents(t["o_totalprice"]),
                "_grp": key_buckets(t, ["o_custkey"], num_buckets),
            }
        )

    def ntile(t: pa.Table) -> pa.Table:
        t = t.sort_by(
            [("o_custkey", "ascending"), ("price_cents", "ascending"),
             ("o_orderkey", "ascending")]
        )
        ck = t["o_custkey"].to_numpy(zero_copy_only=False)
        n = len(ck)
        new_run = np.ones(n, dtype=bool)
        new_run[1:] = ck[1:] != ck[:-1]
        start_idx = np.flatnonzero(new_run)
        run_id = np.cumsum(new_run) - 1
        sizes = np.diff(np.append(start_idx, n))
        idx0 = np.arange(n) - start_idx[run_id]
        cnt = sizes[run_id]
        base, rem = cnt // N, cnt % N
        cut = rem * (base + 1)
        tile = np.where(
            idx0 < cut,
            idx0 // np.maximum(base + 1, 1),
            rem + (idx0 - cut) // np.maximum(base, 1),
        ) + 1
        return pa.table(
            {
                "o_orderkey": t["o_orderkey"],
                "o_custkey": t["o_custkey"],
                "price_cents": t["price_cents"],
                "tile": pa.array(tile.astype(np.int64)),
            }
        )

    return (
        _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_totalprice"])
        .map_batches(bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_grp")
        .map_groups(ntile, batch_format="pyarrow")
    )


NTILE_SQL = """
SELECT o_orderkey, o_custkey,
       CAST(ROUND(o_totalprice * 100) AS BIGINT) AS price_cents,
       CAST(NTILE(4) OVER (
         PARTITION BY o_custkey
         ORDER BY CAST(ROUND(o_totalprice * 100) AS BIGINT), o_orderkey
       ) AS BIGINT) AS tile
FROM orders
"""


def train_val_test_split_docs(sf_dir: str):
    """Deterministic 80/10/10 train-val-test split by content-independent
    hash of the document id — the standard leakage-safe split for a
    training corpus (same doc always lands in the same split, across
    machines and re-runs; no RNG state to coordinate). The fmix32 house
    hash makes the assignment DuckDB-reproducible, so the driver verifies
    every row's split label exactly. Embarrassingly parallel: one
    vectorized map, no shuffle."""
    from datax_ray.functions.sketch import _mix32

    def split(t: pa.Table) -> pa.Table:
        c = t["doc_id"]
        ids = (
            c.combine_chunks().to_numpy(zero_copy_only=False)
            if isinstance(c, pa.ChunkedArray)
            else c.to_numpy(zero_copy_only=False)
        )
        h = _mix32(ids) % np.uint64(100)
        lab = np.where(h < 80, "train", np.where(h < 90, "val", "test"))
        return pa.table(
            {"doc_id": t["doc_id"], "split": pa.array(lab, pa.string())}
        )

    return _read(sf_dir, "documents", columns=["doc_id"]).map_batches(
        split, batch_format="pyarrow", zero_copy_batch=True
    )


SPLIT_SQL = """
WITH s0 AS (SELECT doc_id, doc_id % 4294967296 AS h FROM documents),
s1 AS (SELECT doc_id, xor(h, h >> 16) AS h FROM s0),
s2 AS (SELECT doc_id, CAST(CAST(h AS HUGEINT) * 2246822507 % 4294967296 AS BIGINT) AS h FROM s1),
s3 AS (SELECT doc_id, xor(h, h >> 13) AS h FROM s2),
s4 AS (SELECT doc_id, CAST(CAST(h AS HUGEINT) * 3266489909 % 4294967296 AS BIGINT) AS h FROM s3),
hv AS (SELECT doc_id, xor(h, h >> 16) % 100 AS hv FROM s4)
SELECT doc_id,
       CASE WHEN hv < 80 THEN 'train' WHEN hv < 90 THEN 'val' ELSE 'test' END AS split
FROM hv
"""


def markov_event_transitions(sf_dir: str):
    """Event-sequence transition matrix: global counts of consecutive
    (prev_event_type -> event_type) pairs within each user's timeline
    (ordered by ts, event_id tiebreak) — the Markov-chain statistic
    behind session modeling and next-action prediction. Scale shape:
    users hash-bucket (a user's events co-locate, many users per
    bucket), ONE sort + shifted compare per bucket yields that bucket's
    pair counts via a vectorized Arrow group_by, then the |types|^2-grid
    partials fold in a single reduce — no per-user Python, and the
    second exchange moves only the tiny transition grid."""
    num_buckets = _buckets_for(sf_dir, "events")

    def bucket(t: pa.Table) -> pa.Table:
        from datax_ray.functions.relational import key_buckets

        return pa.table(
            {
                "user_id": t["user_id"],
                "ts": t["ts"],
                "event_id": t["event_id"],
                "event_type": t["event_type"],
                "_grp": key_buckets(t, ["user_id"], num_buckets),
            }
        )

    def transitions(t: pa.Table) -> pa.Table:
        t = t.sort_by(
            [("user_id", "ascending"), ("ts", "ascending"),
             ("event_id", "ascending")]
        )
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        same = uid[1:] == uid[:-1]
        et = t["event_type"].combine_chunks()
        g = (
            pa.table(
                {
                    "prev_type": et.slice(0, max(0, t.num_rows - 1)).filter(pa.array(same)),
                    "event_type": et.slice(1).filter(pa.array(same)),
                }
            )
            .group_by(["prev_type", "event_type"], use_threads=False)
            .aggregate([([], "count_all")])
        )
        return pa.table(
            {
                "prev_type": g["prev_type"],
                "event_type": g["event_type"],
                "n": pc.cast(g["count_all"], pa.int64()),
            }
        )

    partials = (
        _read(sf_dir, "events", columns=["event_id", "ts", "user_id", "event_type"])
        .map_batches(bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_grp")
        .map_groups(transitions, batch_format="pyarrow")
    )
    return partial_agg(
        partials, keys=["prev_type", "event_type"], sums={"n": "n"},
        single_reduce=True,  # |event_types|^2 grid
    )


MARKOV_SQL = """
WITH seq AS (
  SELECT event_type,
         LAG(event_type) OVER (
             PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
  FROM events
)
SELECT prev_type, event_type, COUNT(*) AS n
FROM seq WHERE prev_type IS NOT NULL
GROUP BY prev_type, event_type
"""


def gap_fill_daily_revenue(sf_dir: str):
    """Date-spine gap fill: daily revenue with MISSING days materialized
    as explicit zero rows between the global min and max order dates —
    the time-series regularization every downstream window/forecast
    stage assumes. The daily sums come from the usual combiner fold
    (shuffle bounded by |days|, never rows); the spine fill runs in one
    task on the O(|days|) reduced grid via a vectorized arange scatter,
    so no generate_series join and no driver materialization."""
    DAY_US = 86_400_000_000

    def prep(t: pa.Table) -> pa.Table:
        day = pc.multiply(
            pc.divide(pc.cast(t["o_orderdate"], pa.int64()), DAY_US), DAY_US
        )
        return pa.table(
            {"day_us": day, "revenue_cents": _cents(t["o_totalprice"])}
        )

    daily = partial_agg(
        _read(sf_dir, "orders", columns=["o_orderdate", "o_totalprice"]).map_batches(
            prep, batch_format="pyarrow", zero_copy_batch=True
        ),
        keys=["day_us"],
        sums={"revenue_cents": "revenue_cents"},
        single_reduce=True,  # O(|days|) grid
    )

    def fill(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"day_us": pa.array([], pa.int64()),
                 "revenue_cents": pa.array([], pa.int64())}
            )
        t = t.sort_by([("day_us", "ascending")])
        days = t["day_us"].to_numpy(zero_copy_only=False)
        rev = t["revenue_cents"].to_numpy(zero_copy_only=False)
        spine = np.arange(days[0], days[-1] + DAY_US, DAY_US, dtype=np.int64)
        out = np.zeros(len(spine), dtype=np.int64)
        out[(days - days[0]) // DAY_US] = rev
        return pa.table(
            {"day_us": pa.array(spine), "revenue_cents": pa.array(out)}
        )

    return daily.map_batches(fill, batch_format="pyarrow", batch_size=None)


GAP_FILL_SQL = """
WITH daily AS (
  SELECT epoch_us(o_orderdate) // 86400000000 * 86400000000 AS day_us,
         SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS revenue_cents
  FROM orders GROUP BY 1
), span AS (SELECT MIN(day_us) AS lo, MAX(day_us) AS hi FROM daily),
spine AS (
  SELECT UNNEST(generate_series(lo, hi, 86400000000)) AS day_us FROM span
)
SELECT s.day_us AS day_us, COALESCE(d.revenue_cents, 0) AS revenue_cents
FROM spine s LEFT JOIN daily d USING (day_us)
"""


def cdc_time_travel(sf_dir: str):
    """Time travel over retained manifests: replay the FIRST HALF of the
    change log (lsn < |events| // 2), record the committed epoch head,
    replay the second half on top (the resume path — new segments, same
    lake), then read the lake AS OF the mid-point epoch. The engine must
    reconstruct the exact pre-second-tranche state from that epoch's
    manifest record — layout, schema and fragment set — even though the
    current head has superseded or compacted those files. The oracle is
    the LWW fold restricted to the first tranche, with the cut expressed
    in SQL as a scalar subquery over the same events table (lsn =
    event_id = row index, so COUNT(*)//2 is the identical boundary)."""
    import shutil

    from datax_ray.pipelines.replay import ReplayConfig, replay
    from datax_ray.sinks.lake import final_table
    from datax_ray.sources.derive import ChangeDeriver
    from datax_ray.state.manifest import Manifest

    n = parquet_rows(os.path.join(sf_dir, "events.parquet"))
    cut = n // 2
    work = f"/tmp/datax_cdc_tt/{os.path.basename(os.path.normpath(sf_dir))}"
    shutil.rmtree(work, ignore_errors=True)

    def derive_tranche(lo_incl: int | None, hi_excl: int | None) -> int:
        mask_fn = (
            (lambda t: t.filter(pc.less(t["event_id"], hi_excl)))
            if hi_excl is not None
            else (lambda t: t.filter(pc.greater_equal(t["event_id"], lo_incl)))
        )
        lineage = (
            _read(sf_dir, "events", columns=["event_id", "ts", "user_id"])
            .map_batches(mask_fn, batch_format="pyarrow", zero_copy_batch=True)
            .map_batches(
                ChangeDeriver(f"{work}/changes"),
                batch_format="pyarrow",
                zero_copy_batch=True,
                batch_size=4096,
            )
            .count()
        )  # O(segments) lineage rows, never the events themselves
        return max(1, int(lineage))

    cfg_kw = dict(
        changes_dir=f"{work}/changes", lake_dir=f"{work}/lake", num_partitions=16
    )
    n_segs = derive_tranche(None, cut)
    replay(ReplayConfig(segments_per_epoch=max(2, -(-n_segs // 3)), **cfg_kw))
    head = Manifest(f"{work}/lake").committed_epoch()
    derive_tranche(cut, None)
    replay(ReplayConfig(segments_per_epoch=max(2, -(-n_segs // 3)), **cfg_kw))
    return final_table(f"{work}/lake", as_of_epoch=head)


CDC_TIME_TRAVEL_SQL = """
WITH c AS (
  SELECT event_id AS lsn, ts,
         CASE WHEN event_id % 10 = 0 THEN 'delete'
              WHEN event_id % 2 = 0 THEN 'insert' ELSE 'update' END AS op,
         'conv-' || CAST(user_id AS VARCHAR) AS conv_id,
         CAST(event_id % 25 AS INTEGER) AS turn_idx,
         CASE WHEN event_id % 10 = 0 THEN NULL
              WHEN event_id % 2 = 0 THEN 'user' ELSE 'assistant' END AS role,
         CASE WHEN event_id % 10 = 0 THEN NULL
              ELSE 'payload-' || CAST(event_id AS VARCHAR) END AS text,
         CASE WHEN event_id % 10 = 0 THEN NULL ELSE '' END AS tool
  FROM events
  WHERE event_id < (SELECT COUNT(*) // 2 FROM events)
), w AS (
  SELECT *, row_number() OVER (PARTITION BY conv_id, turn_idx
                               ORDER BY ts DESC, lsn DESC) AS rn
  FROM c
)
SELECT conv_id, turn_idx, role, text, tool, ts FROM w WHERE rn = 1 AND op <> 'delete'
"""


def copurchase_triangles(sf_dir: str):
    """Triangle census over the co-purchase graph: parts are vertices, an
    edge links two parts that ever appear in the same order, and each
    vertex's triangle count is the classic clustering/community signal.
    Edge build: per-order part pairs enumerate inside orderkey hash
    buckets (vectorized run-pair expansion, no per-order Python), then a
    distinct fold. Counting is functions/graph.triangle_counts — the
    degree-ordered wedge join, so the wedge fan-out stays O(sqrt(|E|))
    per vertex even under hot-part skew, and the closing-edge probe is a
    hash-bucket co-group, never a driver pair list."""
    from datax_ray.functions.graph import _run_pairs, triangle_counts

    num_buckets = _buckets_for(sf_dir, "lineitem")

    def bucket(t: pa.Table) -> pa.Table:
        from datax_ray.functions.relational import key_buckets

        return pa.table(
            {
                "l_orderkey": t["l_orderkey"],
                "l_partkey": t["l_partkey"],
                "_grp": key_buckets(t, ["l_orderkey"], num_buckets),
            }
        )

    def order_pairs(t: pa.Table) -> pa.Table:
        g = t.group_by(["l_orderkey", "l_partkey"], use_threads=False).aggregate([])
        g = g.sort_by(
            [("l_orderkey", "ascending"), ("l_partkey", "ascending")]
        )
        ok = g["l_orderkey"].to_numpy(zero_copy_only=False)
        pk = g["l_partkey"].to_numpy(zero_copy_only=False)
        i, j = _run_pairs(ok)
        return pa.table(
            {"u": pa.array(pk[i], pa.int64()), "v": pa.array(pk[j], pa.int64())}
        )

    edges = (
        _read(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])
        .map_batches(bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_grp")
        .map_groups(order_pairs, batch_format="pyarrow")
    )
    # materialized ONCE: triangle_counts consumes the edge list twice
    # (degree fold + orient) — without this the whole per-order pair
    # build re-executes per consumer
    distinct = (
        partial_agg(edges, keys=["u", "v"], counts="_n")
        .select_columns(["u", "v"])
        .materialize()
    )

    def rename(t: pa.Table) -> pa.Table:
        return pa.table({"part": t["node"], "n_triangles": t["n"]})

    return triangle_counts(distinct, num_buckets=num_buckets).map_batches(
        rename, batch_format="pyarrow", zero_copy_batch=True
    )


TRIANGLES_SQL = """
WITH e AS (
  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
), t AS (
  SELECT e1.u AS a, e1.v AS b, e2.v AS c
  FROM e e1
  JOIN e e2 ON e2.u = e1.v
  JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
)
SELECT part, COUNT(*) AS n_triangles
FROM (
  SELECT a AS part FROM t
  UNION ALL SELECT b FROM t
  UNION ALL SELECT c FROM t
)
GROUP BY part
"""


def cdc_txn_atomic_apply(sf_dir: str):
    """Transactional-boundary CDC apply: binlog events group into
    transactions of 8 consecutive LSNs (txn = lsn // 8), and a transaction
    containing any rollback marker (lsn % 13 == 3) is aborted — ALL of its
    events must be withheld from the lake, including otherwise-winning
    updates and deletes (the all-or-nothing atomicity a MySQL-binlog /
    Postgres-WAL tailer owes its consumers; SURVEY.md §2B-B1/B4). The
    aborted-txn set is data-sized, so it is neither broadcast nor joined:
    the rollback markers ARE rows of the same stream, so one txn-hash
    bucket co-group drops whole aborted transactions (vectorized
    sorted-isin per bucket — no Dataset.join actors, no second source
    scan), followed by the engine's usual two-level LWW fold (per-batch
    lww_reduce combiner AFTER the abort gate — a pre-abort combiner could
    discard a committed row superseded only by a later-aborted one — then
    one vectorized reduce per conv-hash bucket). Rewrote from a
    distributed ANTI join: 11.5 s → bucket co-group at sf0.1 (the hash
    join aggregator pool was the cost, BASELINE.md shuffle-strategy
    note)."""
    from datax_ray.functions.relational import key_buckets
    from datax_ray.sources.derive import derive_changes

    KEYS = ("conv_id", "turn_idx")
    ORDER = ("ts", "lsn")
    num_buckets = _buckets_for(sf_dir, "events")

    changes = _read(
        sf_dir, "events", columns=["event_id", "ts", "user_id"]
    ).map_batches(derive_changes, batch_format="pyarrow", zero_copy_batch=True)

    def with_txn(t: pa.Table) -> pa.Table:
        lsn = t["lsn"]
        txn = pc.divide(lsn, 8)  # lsn >= 0: trunc == floor
        t = t.drop_columns(["ddl"]).append_column("txn", txn)
        # txn-hash buckets for the abort co-group (NOT conv buckets yet)
        return t.append_column("_tgrp", key_buckets(t, ["txn"], num_buckets))

    def abort_gate(g: pa.Table) -> pa.Table:
        lsn = g["lsn"].combine_chunks().to_numpy(zero_copy_only=False)
        txn = g["txn"].combine_chunks().to_numpy(zero_copy_only=False)
        bad_txns = np.unique(txn[lsn % 13 == 3])
        keep = ~np.isin(txn, bad_txns, assume_unique=False)
        w = g.filter(pa.array(keep)).drop_columns(["txn", "_tgrp"])
        # committed rows shrink here before the conv exchange
        w = w.append_column("_grp", key_buckets(w, ["conv_id"], num_buckets))
        return lww_reduce(w, key_cols=KEYS, order_cols=ORDER)

    def per_bucket(g: pa.Table) -> pa.Table:
        w = lww_reduce(g, key_cols=KEYS, order_cols=ORDER)
        w = w.filter(pc.not_equal(w["op"], "delete"))
        return w.select(["conv_id", "turn_idx", "role", "text", "tool", "ts"])

    return (
        changes.map_batches(with_txn, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_tgrp")
        .map_groups(abort_gate, batch_format="pyarrow")
        .groupby("_grp")
        .map_groups(per_bucket, batch_format="pyarrow")
    )


CDC_TXN_SQL = """
WITH c AS (
  SELECT event_id AS lsn, ts,
         CASE WHEN event_id % 10 = 0 THEN 'delete'
              WHEN event_id % 2 = 0 THEN 'insert' ELSE 'update' END AS op,
         'conv-' || CAST(user_id AS VARCHAR) AS conv_id,
         CAST(event_id % 25 AS INTEGER) AS turn_idx,
         CASE WHEN event_id % 10 = 0 THEN NULL
              WHEN event_id % 2 = 0 THEN 'user' ELSE 'assistant' END AS role,
         CASE WHEN event_id % 10 = 0 THEN NULL
              ELSE 'payload-' || CAST(event_id AS VARCHAR) END AS text,
         CASE WHEN event_id % 10 = 0 THEN NULL ELSE '' END AS tool
  FROM events
), kept AS (
  SELECT * FROM c
  WHERE lsn // 8 NOT IN (SELECT DISTINCT lsn // 8 FROM c WHERE lsn % 13 = 3)
), w AS (
  SELECT *, row_number() OVER (PARTITION BY conv_id, turn_idx
                               ORDER BY ts DESC, lsn DESC) AS rn
  FROM kept
)
SELECT conv_id, turn_idx, role, text, tool, ts FROM w WHERE rn = 1 AND op <> 'delete'
"""


def _copurchase_edges(sf_dir: str):
    """DIRECTED distinct co-purchase edge list (u, v) — both orientations
    of every unordered part pair sharing an order — materialized once for
    the iterative graph queries (each iteration re-consumes the edges; an
    unmaterialized lineage would rebuild the pair expansion per pass).
    Same per-orderkey-bucket vectorized run-pair expansion as
    copurchase_triangles; the distinct fold is the usual combiner
    partial_agg, and the mirror map doubles rows only after dedup."""
    from datax_ray.functions.graph import _run_pairs
    from datax_ray.functions.relational import key_buckets

    num_buckets = _buckets_for(sf_dir, "lineitem")

    def bucket(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_orderkey": t["l_orderkey"],
                "l_partkey": t["l_partkey"],
                "_grp": key_buckets(t, ["l_orderkey"], num_buckets),
            }
        )

    def order_pairs(t: pa.Table) -> pa.Table:
        g = t.group_by(["l_orderkey", "l_partkey"], use_threads=False).aggregate([])
        g = g.sort_by([("l_orderkey", "ascending"), ("l_partkey", "ascending")])
        ok = g["l_orderkey"].to_numpy(zero_copy_only=False)
        pk = g["l_partkey"].to_numpy(zero_copy_only=False)
        i, j = _run_pairs(ok)
        return pa.table(
            {"u": pa.array(pk[i], pa.int64()), "v": pa.array(pk[j], pa.int64())}
        )

    def mirror(t: pa.Table) -> pa.Table:
        return pa.concat_tables(
            [t, pa.table({"u": t["v"], "v": t["u"]})]
        ).combine_chunks()

    undirected = (
        _read(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])
        .map_batches(bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_grp")
        .map_groups(order_pairs, batch_format="pyarrow")
    )
    return (
        partial_agg(undirected, keys=["u", "v"], counts="_n")
        .select_columns(["u", "v"])
        .map_batches(mirror, batch_format="pyarrow")
        .materialize()
    )


def pagerank_parts(sf_dir: str):
    """Integer-exact PageRank (3 unrolled iterations, damping 0.85) over
    the co-purchase part graph — the canonical iterative-propagation
    workload. The update is defined in integer arithmetic so both engines
    agree bit-for-bit with no float-order sensitivity: contrib(u) =
    pr(u) // outdeg(u) per out-edge, pr'(v) = 15000 + 85 * sum(contribs
    into v) // 100, pr0 = 100000. Ranks stay a DATASET across iterations
    (never a driver/broadcast table — at 100 TB the vertex set is
    data-sized): each pass is one hash-partitioned join of edges with
    ranks on the source, a combiner fold of contributions by target, and
    a join back to the degree table, i.e. the same co-partitioned
    exchanges every BSP/Pregel step costs. Every node of this graph has
    in-degree >= 1 (edges are mirrored), so the inner joins lose no one."""
    from datax_ray.functions.relational import large_join

    edges = _copurchase_edges(sf_dir)
    deg = partial_agg(edges, keys=["u"], counts="d").materialize()

    def init(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "u": t["u"],
                "d": t["d"],
                "pr": pa.array(np.full(t.num_rows, 100000, dtype=np.int64)),
            }
        )

    ranks = deg.map_batches(init, batch_format="pyarrow")

    def contrib(t: pa.Table) -> pa.Table:
        c = (
            t["pr"].to_numpy(zero_copy_only=False)
            // t["d"].to_numpy(zero_copy_only=False)
        )
        return pa.table({"u": t["v"], "c": pa.array(c, pa.int64())})

    def update(t: pa.Table) -> pa.Table:
        pr = 15000 + 85 * t["s"].to_numpy(zero_copy_only=False) // 100
        return pa.table({"u": t["u"], "d": t["d"], "pr": pa.array(pr, pa.int64())})

    for _ in range(3):
        contribs = large_join(edges, ranks, on="u").map_batches(
            contrib, batch_format="pyarrow"
        )
        sums = partial_agg(contribs, keys=["u"], sums={"c": "s"})
        ranks = large_join(sums, deg, on="u").map_batches(
            update, batch_format="pyarrow"
        )

    def rename(t: pa.Table) -> pa.Table:
        return pa.table({"part": t["u"], "pr": t["pr"]})

    return ranks.map_batches(rename, batch_format="pyarrow")


PAGERANK_SQL = """
WITH e AS (
  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
), deg AS (SELECT u, COUNT(*) AS d FROM e GROUP BY u),
r0 AS (SELECT u, CAST(100000 AS BIGINT) AS pr FROM deg),
r1 AS (SELECT e.v AS u, 15000 + 85 * CAST(SUM(r.pr // deg.d) AS BIGINT) // 100 AS pr
       FROM e JOIN r0 r ON r.u = e.u JOIN deg ON deg.u = e.u GROUP BY e.v),
r2 AS (SELECT e.v AS u, 15000 + 85 * CAST(SUM(r.pr // deg.d) AS BIGINT) // 100 AS pr
       FROM e JOIN r1 r ON r.u = e.u JOIN deg ON deg.u = e.u GROUP BY e.v),
r3 AS (SELECT e.v AS u, 15000 + 85 * CAST(SUM(r.pr // deg.d) AS BIGINT) // 100 AS pr
       FROM e JOIN r2 r ON r.u = e.u JOIN deg ON deg.u = e.u GROUP BY e.v)
SELECT u AS part, pr FROM r3
"""


def bfs_levels_parts(sf_dir: str):
    """Multi-source BFS hop levels (depth 3) over the co-purchase part
    graph: seeds are parts with partkey % 97 == 0 (level 0), and each
    later level is the distinct neighbor frontier minus everything
    already visited — the reachability/blast-radius primitive. Frontier
    expansion is one hash-partitioned join of the edge list with the
    (materialized, still-distributed) frontier per hop, a combiner
    distinct of the targets, then a distributed ANTI join against each
    smaller prior level (levels only shrink relative to the frontier
    fan-out; no driver visited-set — at 100 TB a visited bitmap on the
    driver is the classic BFS scale failure)."""
    from datax_ray.functions.relational import large_join, semi_join

    edges = _copurchase_edges(sf_dir)

    def seed_filter(t: pa.Table) -> pa.Table:
        u = t["u"]
        return pa.table(
            {"u": u.filter(pc.equal(pc.subtract(u, pc.multiply(pc.divide(u, 97), 97)), 0))}
        )

    nodes = partial_agg(edges, keys=["u"], counts="_n").select_columns(["u"])
    levels = [nodes.map_batches(
        seed_filter, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()]

    for _hop in range(3):
        neigh = large_join(edges, levels[-1], on="u").map_batches(
            lambda t: pa.table({"u": t["v"]}), batch_format="pyarrow"
        )
        cand = partial_agg(neigh, keys=["u"], counts="_n").select_columns(["u"])
        for prev in levels:
            cand = semi_join(cand, prev, on="u", anti=True)
        levels.append(cand.materialize())

    # drop exhausted (empty) levels before the union: their materialized
    # blocks are schema-less, the exact hazard class behind the round-2
    # tfidf failure (count() on a materialized dataset is free metadata)
    tagged = [
        lvl.map_batches(
            lambda t, k=k: pa.table(
                {"part": t["u"],
                 "level": pa.array(np.full(t.num_rows, k, dtype=np.int64))}
            ),
            batch_format="pyarrow",
        )
        for k, lvl in enumerate(levels)
        if k == 0 or lvl.count() > 0
    ]
    out = tagged[0]
    for t in tagged[1:]:
        out = out.union(t)
    return out


BFS_SQL = """
WITH e AS (
  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
), n0 AS (SELECT DISTINCT u FROM e WHERE u % 97 = 0),
n1 AS (
  SELECT DISTINCT e.v AS u FROM e JOIN n0 ON e.u = n0.u
  WHERE e.v NOT IN (SELECT u FROM n0)
), n2 AS (
  SELECT DISTINCT e.v AS u FROM e JOIN n1 ON e.u = n1.u
  WHERE e.v NOT IN (SELECT u FROM n0) AND e.v NOT IN (SELECT u FROM n1)
), n3 AS (
  SELECT DISTINCT e.v AS u FROM e JOIN n2 ON e.u = n2.u
  WHERE e.v NOT IN (SELECT u FROM n0) AND e.v NOT IN (SELECT u FROM n1)
    AND e.v NOT IN (SELECT u FROM n2)
)
SELECT u AS part, CAST(0 AS BIGINT) AS level FROM n0
UNION ALL SELECT u, CAST(1 AS BIGINT) FROM n1
UNION ALL SELECT u, CAST(2 AS BIGINT) FROM n2
UNION ALL SELECT u, CAST(3 AS BIGINT) FROM n3
"""


def cdc_replay_widen(sf_dir: str):
    """Type-widening schema evolution through the full engine,
    driver-verified: every event with event_id % 700 == 699 becomes an
    op='ddl' widen("turn_idx", int64) event. The tracker applies it at an
    epoch boundary (value-preserving, so WHEN it lands cannot change row
    content), later epochs write int64 turn_idx while earlier fragments
    still hold int32, and the merge-read must unify both generations to
    the current widened schema. Complements cdc_replay_ddl (add_column):
    together they cover the north rule's "widens/adds Arrow columns on
    DDL events". Oracle: same LWW fold with the ddl lsns excluded and
    turn_idx CAST to BIGINT."""
    from datax_ray.pipelines.replay import ReplayConfig, replay
    from datax_ray.sinks.lake import final_table

    work = f"/tmp/datax_cdc_widen/{os.path.basename(os.path.normpath(sf_dir))}"
    spe = _derive_changes(sf_dir, work, widen_mod=700)
    replay(
        ReplayConfig(
            changes_dir=f"{work}/changes",
            lake_dir=f"{work}/lake",
            num_partitions=16,
            segments_per_epoch=spe,
        )
    )
    return final_table(f"{work}/lake")


CDC_WIDEN_SQL = """
WITH c AS (
  SELECT event_id AS lsn, ts,
         CASE WHEN event_id % 10 = 0 THEN 'delete'
              WHEN event_id % 2 = 0 THEN 'insert' ELSE 'update' END AS op,
         'conv-' || CAST(user_id AS VARCHAR) AS conv_id,
         CAST(event_id % 25 AS BIGINT) AS turn_idx,
         CASE WHEN event_id % 10 = 0 THEN NULL
              WHEN event_id % 2 = 0 THEN 'user' ELSE 'assistant' END AS role,
         CASE WHEN event_id % 10 = 0 THEN NULL
              ELSE 'payload-' || CAST(event_id AS VARCHAR) END AS text,
         CASE WHEN event_id % 10 = 0 THEN NULL ELSE '' END AS tool
  FROM events
  WHERE event_id % 700 <> 699  -- the widen ddl events (schema-only)
), w AS (
  SELECT *, row_number() OVER (PARTITION BY conv_id, turn_idx
                               ORDER BY ts DESC, lsn DESC) AS rn
  FROM c
)
SELECT conv_id, turn_idx, role, text, tool, ts FROM w WHERE rn = 1 AND op <> 'delete'
"""


def cdc_enrich_dimension(sf_dir: str):
    """Dimension enrichment of the CDC state — the DataX
    reader -> transform (lookup) -> writer shape at Ray scale: fold the
    derived change stream to its LWW-final rows, then attach each
    conversation's nation name via its owning customer. The customer
    dimension is DATA-SIZED, so it is never broadcast or driver-held:
    dimension rows ride the SAME conv-hash exchange as the change stream
    (a union co-group — the dimension keys by the conv_id its custkey
    owns, so both sides of the lookup land in one bucket; attach is a
    vectorized searchsorted, no Dataset.join actor pool). The 25-row
    nation table is the textbook broadcast side and attaches map-side
    BEFORE the exchange, so dimension rows arrive pre-enriched. The LWW
    combiner still shrinks change batches first. Rewrote from
    large_join: 7.7 s → one exchange at sf0.1 (BASELINE.md
    shuffle-strategy note: the hash-join aggregator pool dominates at
    these partition counts)."""
    from datax_ray.functions.relational import key_buckets
    from datax_ray.sources.derive import derive_changes

    KEYS = ("conv_id", "turn_idx")
    ORDER = ("ts", "lsn")
    num_buckets = _buckets_for(sf_dir, "events")

    changes = _read(
        sf_dir, "events", columns=["event_id", "ts", "user_id"]
    ).map_batches(derive_changes, batch_format="pyarrow", zero_copy_batch=True)

    def combiner(t: pa.Table) -> pa.Table:
        t = t.drop_columns(["ddl"]).append_column(
            "_grp", key_buckets(t, ["conv_id"], num_buckets)
        )
        t = lww_reduce(t, key_cols=KEYS, order_cols=ORDER)
        return t.append_column(
            "nation", pa.nulls(t.num_rows, pa.string())
        )

    import pyarrow.parquet as pq

    nation = pq.read_table(
        os.path.join(sf_dir, "nation.parquet"), columns=["n_nationkey", "n_name"]
    ).rename_columns(["c_nationkey", "nation"])

    def dim_rows(t: pa.Table) -> pa.Table:
        # one dimension row per customer, keyed by the conv_id it owns;
        # nation (25 rows, broadcast) attaches here, before the exchange
        t = pa.table(
            {"c_custkey": t["c_custkey"], "c_nationkey": t["c_nationkey"]}
        ).join(nation, keys=["c_nationkey"])
        conv = pc.binary_join_element_wise(
            "conv-", pc.cast(t["c_custkey"], pa.string()), ""
        )
        n = t.num_rows
        d = pa.table(
            {
                "lsn": pa.array(np.full(n, -1, np.int64), pa.int64()),
                "ts": pa.nulls(n, pa.timestamp("us")),
                "op": pa.array(["dim"] * n, pa.string()),
                "conv_id": conv,
                "turn_idx": pa.nulls(n, pa.int32()),
                "role": pa.nulls(n, pa.string()),
                "text": pa.nulls(n, pa.string()),
                "tool": pa.nulls(n, pa.string()),
            }
        )
        d = d.append_column("_grp", key_buckets(d, ["conv_id"], num_buckets))
        return d.append_column("nation", t["nation"])

    dim = _read(sf_dir, "customer", columns=["c_custkey", "c_nationkey"]).map_batches(
        dim_rows, batch_format="pyarrow", zero_copy_batch=True
    )

    def per_bucket(g: pa.Table) -> pa.Table:
        is_dim = pc.equal(g["op"], "dim")
        d = g.filter(is_dim)
        w = lww_reduce(g.filter(pc.invert(is_dim)), key_cols=KEYS, order_cols=ORDER)
        w = w.filter(pc.not_equal(w["op"], "delete"))
        out_schema = pa.schema(
            [
                ("conv_id", pa.string()),
                ("turn_idx", pa.int32()),
                ("role", pa.string()),
                ("text", pa.string()),
                ("tool", pa.string()),
                ("ts", pa.timestamp("us")),
                ("nation", pa.string()),
            ]
        )
        if w.num_rows == 0 or d.num_rows == 0:
            return out_schema.empty_table()
        dk = d["conv_id"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.argsort(dk)
        dk_s = dk[order]
        wk = w["conv_id"].combine_chunks().to_numpy(zero_copy_only=False)
        pos = np.searchsorted(dk_s, wk)
        pos_c = np.minimum(pos, len(dk_s) - 1)
        hit = dk_s[pos_c] == wk  # inner-join semantics: drop ownerless convs
        w = w.filter(pa.array(hit))
        nat = d["nation"].combine_chunks().take(
            pa.array(order[pos_c[hit]], pa.int64())
        )
        return pa.table(
            {
                "conv_id": w["conv_id"],
                "turn_idx": w["turn_idx"],
                "role": w["role"],
                "text": w["text"],
                "tool": w["tool"],
                "ts": w["ts"],
                "nation": nat,
            }
        )

    return (
        changes.map_batches(combiner, batch_format="pyarrow")
        .union(dim)
        .groupby("_grp")
        .map_groups(per_bucket, batch_format="pyarrow")
    )


CDC_ENRICH_SQL = """
WITH c AS (
  SELECT event_id AS lsn, ts,
         CASE WHEN event_id % 10 = 0 THEN 'delete'
              WHEN event_id % 2 = 0 THEN 'insert' ELSE 'update' END AS op,
         'conv-' || CAST(user_id AS VARCHAR) AS conv_id,
         CAST(event_id % 25 AS INTEGER) AS turn_idx,
         CASE WHEN event_id % 10 = 0 THEN NULL
              WHEN event_id % 2 = 0 THEN 'user' ELSE 'assistant' END AS role,
         CASE WHEN event_id % 10 = 0 THEN NULL
              ELSE 'payload-' || CAST(event_id AS VARCHAR) END AS text,
         CASE WHEN event_id % 10 = 0 THEN NULL ELSE '' END AS tool
  FROM events
), w AS (
  SELECT *, row_number() OVER (PARTITION BY conv_id, turn_idx
                               ORDER BY ts DESC, lsn DESC) AS rn
  FROM c
), f AS (
  SELECT conv_id, turn_idx, role, text, tool, ts
  FROM w WHERE rn = 1 AND op <> 'delete'
)
SELECT f.conv_id, f.turn_idx, f.role, f.text, f.tool, f.ts, n.n_name AS nation
FROM f
JOIN customer cu ON cu.c_custkey = CAST(substr(f.conv_id, 6) AS BIGINT)
JOIN nation n ON n.n_nationkey = cu.c_nationkey
"""


def cdc_conv_quality_report(sf_dir: str):
    """Post-ingest conversation QA over the LWW-final transcript state —
    the transcripts-payload twin of a data-quality dashboard: per
    conversation, turn count, max turn index, the number of MISSING turn
    indexes (holes deletes punched into [0, max_turn]) and the number of
    role-alternation violations (adjacent surviving turns with the same
    role — user/user or assistant/assistant runs, the thing SFT training
    filters drop). One conv-hash bucket exchange: a bucket sorts its
    convs once, adjacency is a vectorized shifted compare (same-conv
    mask), and the per-conv counts fold in the same pass."""
    from datax_ray.functions.relational import key_buckets
    from datax_ray.sources.derive import derive_changes

    KEYS = ("conv_id", "turn_idx")
    ORDER = ("ts", "lsn")
    num_buckets = _buckets_for(sf_dir, "events")

    changes = _read(
        sf_dir, "events", columns=["event_id", "ts", "user_id"]
    ).map_batches(derive_changes, batch_format="pyarrow", zero_copy_batch=True)

    def combiner(t: pa.Table) -> pa.Table:
        t = t.drop_columns(["ddl"]).append_column(
            "_grp", key_buckets(t, ["conv_id"], num_buckets)
        )
        return lww_reduce(t, key_cols=KEYS, order_cols=ORDER)

    _OUT = pa.schema(
        [
            ("conv_id", pa.string()),
            ("n_turns", pa.int64()),
            ("max_turn", pa.int64()),
            ("n_gaps", pa.int64()),
            ("n_role_viol", pa.int64()),
        ]
    )

    def per_bucket(g: pa.Table) -> pa.Table:
        w = lww_reduce(g, key_cols=KEYS, order_cols=ORDER)
        w = w.filter(pc.not_equal(w["op"], "delete"))
        if w.num_rows == 0:  # a bucket can be all tombstones — stay typed
            return _OUT.empty_table()
        w = w.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
        conv = w["conv_id"].combine_chunks()
        cv = conv.to_numpy(zero_copy_only=False)
        role = w["role"].combine_chunks().to_numpy(zero_copy_only=False)
        same_conv = cv[1:] == cv[:-1]
        viol = same_conv & (role[1:] == role[:-1])
        # per-conv fold: adjacency rows attribute to the SECOND row's conv
        stats = (
            pa.table(
                {
                    "conv_id": conv,
                    "turn_idx": w["turn_idx"],
                    "_viol": pa.array(
                        np.concatenate(([False], viol)).astype(bool)
                    ),
                }
            )
            .group_by(["conv_id"], use_threads=False)
            .aggregate(
                [("turn_idx", "count"), ("turn_idx", "max"), ("_viol", "sum")]
            )
        )
        n = pc.cast(stats["turn_idx_count"], pa.int64())
        mx = pc.cast(stats["turn_idx_max"], pa.int64())
        return pa.table(
            {
                "conv_id": stats["conv_id"],
                "n_turns": n,
                "max_turn": mx,
                "n_gaps": pc.subtract(pc.add(mx, 1), n),
                "n_role_viol": pc.cast(
                    pc.fill_null(stats["_viol_sum"], 0), pa.int64()
                ),
            }
        )

    return (
        changes.map_batches(combiner, batch_format="pyarrow")
        .groupby("_grp")
        .map_groups(per_bucket, batch_format="pyarrow")
    )


CDC_CONV_QA_SQL = """
WITH c AS (
  SELECT event_id AS lsn, ts,
         CASE WHEN event_id % 10 = 0 THEN 'delete'
              WHEN event_id % 2 = 0 THEN 'insert' ELSE 'update' END AS op,
         'conv-' || CAST(user_id AS VARCHAR) AS conv_id,
         CAST(event_id % 25 AS INTEGER) AS turn_idx,
         CASE WHEN event_id % 10 = 0 THEN NULL
              WHEN event_id % 2 = 0 THEN 'user' ELSE 'assistant' END AS role
  FROM events
), w AS (
  SELECT *, row_number() OVER (PARTITION BY conv_id, turn_idx
                               ORDER BY ts DESC, lsn DESC) AS rn
  FROM c
), f AS (
  SELECT conv_id, turn_idx, role FROM w WHERE rn = 1 AND op <> 'delete'
), adj AS (
  SELECT conv_id, turn_idx, role,
         LAG(role) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS prev_role
  FROM f
)
SELECT conv_id,
       CAST(COUNT(*) AS BIGINT) AS n_turns,
       CAST(MAX(turn_idx) AS BIGINT) AS max_turn,
       CAST(MAX(turn_idx) + 1 - COUNT(*) AS BIGINT) AS n_gaps,
       CAST(SUM(CASE WHEN role = prev_role THEN 1 ELSE 0 END) AS BIGINT)
           AS n_role_viol
FROM adj
GROUP BY conv_id
"""


def gopher_repetition_docs(sf_dir: str):
    """Intra-document repetition quality signals (the Gopher-rule family a
    curation pipeline runs before training): per doc, total tokens, the
    count of the single most-frequent token, the number of bigram
    POSITIONS whose bigram occurs more than once in the doc, and an
    integer-arithmetic flag (top-token share > 10% OR duplicate-bigram
    share > 20%). One map_batches pass, zero shuffle: a doc's tokens never
    split across batches (same invariant the tokenize family relies on),
    so per-doc counts are exact after one Arrow hash-group per batch."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def fn(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(pc.fill_null(t["text"], ""), " ")
        flat = pc.list_flatten(toks)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        n = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
        rows = len(n)
        d = np.repeat(np.arange(rows, dtype=np.int64), n)
        tc = (
            pa.table({"d": pa.array(d), "term": flat})
            .group_by(["d", "term"], use_threads=False)
            .aggregate([([], "count_all")])
        )
        top = np.zeros(rows, np.int64)
        np.maximum.at(
            top,
            tc["d"].to_numpy(zero_copy_only=False),
            tc["count_all"].to_numpy(zero_copy_only=False),
        )
        dupb = np.zeros(rows, np.int64)
        m = len(flat)
        if m >= 2:
            big = pc.binary_join_element_wise(
                flat.slice(0, m - 1), flat.slice(1, m - 1), " "
            )
            ends = np.cumsum(n) - 1
            valid = np.ones(m - 1, dtype=bool)
            valid[ends[ends < m - 1]] = False
            # the filtered bigram stream is exactly n_i - 1 positions per
            # doc, in doc order — its doc index is a plain repeat
            db = np.repeat(np.arange(rows, dtype=np.int64), np.maximum(n - 1, 0))
            bc = (
                pa.table(
                    {"d": pa.array(db), "bigram": big.filter(pa.array(valid))}
                )
                .group_by(["d", "bigram"], use_threads=False)
                .aggregate([([], "count_all")])
            )
            c = bc["count_all"].to_numpy(zero_copy_only=False)
            dup = c > 1
            np.add.at(dupb, bc["d"].to_numpy(zero_copy_only=False)[dup], c[dup])
        flagged = (top * 10 > n) | (dupb * 5 > (n - 1))
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_tokens": pa.array(n, pa.int64()),
                "top_token_cnt": pa.array(top, pa.int64()),
                "dup_bigram_cnt": pa.array(dupb, pa.int64()),
                "flagged": pa.array(flagged.astype(np.int64), pa.int64()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


GOPHER_REPETITION_SQL = """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term,
         generate_subscripts(string_split(text, ' '), 1) AS pos
  FROM documents
), tc AS (
  SELECT doc_id, term, COUNT(*) AS c FROM tok GROUP BY 1, 2
), agg AS (
  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
         CAST(MAX(c) AS BIGINT) AS top_token_cnt
  FROM tc GROUP BY 1
), pairs AS (
  SELECT doc_id,
         term || ' ' || LEAD(term) OVER (PARTITION BY doc_id ORDER BY pos)
             AS bigram
  FROM tok
), bc AS (
  SELECT doc_id, bigram, COUNT(*) AS c FROM pairs
  WHERE bigram IS NOT NULL GROUP BY 1, 2
), dup AS (
  SELECT doc_id,
         CAST(COALESCE(SUM(CASE WHEN c > 1 THEN c END), 0) AS BIGINT) AS dup_bigram_cnt
  FROM bc GROUP BY 1
)
SELECT a.doc_id, a.n_tokens, a.top_token_cnt,
       COALESCE(d.dup_bigram_cnt, 0) AS dup_bigram_cnt,
       CAST(CASE WHEN a.top_token_cnt * 10 > a.n_tokens
                   OR COALESCE(d.dup_bigram_cnt, 0) * 5 > (a.n_tokens - 1)
            THEN 1 ELSE 0 END AS BIGINT) AS flagged
FROM agg a LEFT JOIN dup d USING (doc_id)
"""


def events_debounce_daily(sf_dir: str):
    """Burst debounce: keep an event iff it is the first of its
    (user_id, event_type) key or arrives >= 1 day after the PREVIOUS
    event of that key (LAG semantics, ties broken by event_id — matches
    the SQL window exactly; previous-KEPT debounce is a sequential chain
    SQL cannot express). The streaming-ingest dedup a rate-limited CDC
    feed applies. One user-hash bucket exchange; inside a bucket the gap
    test is a shifted vectorized compare over one sort."""
    from datax_ray.functions.relational import key_buckets

    num_buckets = _buckets_for(sf_dir, "events")
    ds = _read(sf_dir, "events", columns=["event_id", "ts", "user_id", "event_type"])

    def bucket(t: pa.Table) -> pa.Table:
        return t.append_column("_grp", key_buckets(t, ["user_id"], num_buckets))

    def per_bucket(g: pa.Table) -> pa.Table:
        g = g.sort_by(
            [
                ("user_id", "ascending"),
                ("event_type", "ascending"),
                ("ts", "ascending"),
                ("event_id", "ascending"),
            ]
        )
        uid = g["user_id"].combine_chunks().to_numpy(zero_copy_only=False)
        et = g["event_type"].combine_chunks().to_numpy(zero_copy_only=False)
        ts = g["ts"].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
        nrows = len(uid)
        keep = np.ones(nrows, dtype=bool)
        if nrows > 1:
            same = (uid[1:] == uid[:-1]) & (et[1:] == et[:-1])
            gap = ts[1:] - ts[:-1]
            keep[1:] = ~same | (gap >= 86_400_000_000)
        return g.filter(pa.array(keep)).select(
            ["event_id", "user_id", "event_type", "ts"]
        )

    return (
        ds.map_batches(bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_grp")
        .map_groups(per_bucket, batch_format="pyarrow")
    )


def user_activity_streaks(sf_dir: str):
    """Gap-islands: per user, runs of CONSECUTIVE active days (the
    engagement-streak / data-freshness primitive; SQL's classic
    row_number-difference trick). Scale shape: per-batch distinct
    (user, day) combiner shrinks the stream to active-day pairs BEFORE
    the one user-hash exchange; inside a bucket island detection is a
    shifted vectorized compare + run-length pass — rows never shuffle,
    only distinct day pairs do."""
    from datax_ray.functions.relational import key_buckets

    DAY = 86_400_000_000
    num_buckets = _buckets_for(sf_dir, "events")
    ds = _read(sf_dir, "events", columns=["ts", "user_id"])

    def day_pairs(t: pa.Table) -> pa.Table:
        day = pc.multiply(
            pc.divide(pc.cast(t["ts"], pa.int64()), DAY), DAY
        )
        g = (
            pa.table({"user_id": t["user_id"], "day_us": day})
            .group_by(["user_id", "day_us"], use_threads=False)
            .aggregate([])
        )
        return g.append_column("_grp", key_buckets(g, ["user_id"], num_buckets))

    def per_bucket(g: pa.Table) -> pa.Table:
        g = g.sort_by([("user_id", "ascending"), ("day_us", "ascending")])
        uid = g["user_id"].combine_chunks().to_numpy(zero_copy_only=False)
        day = g["day_us"].combine_chunks().to_numpy(zero_copy_only=False)
        n = len(uid)
        if n == 0:
            return pa.table(
                {
                    "user_id": pa.array([], pa.int64()),
                    "streak_start_us": pa.array([], pa.int64()),
                    "streak_days": pa.array([], pa.int64()),
                }
            )
        # cross-batch duplicates of one (user, day) collapse here
        dup = np.zeros(n, dtype=bool)
        dup[1:] = (uid[1:] == uid[:-1]) & (day[1:] == day[:-1])
        uid, day = uid[~dup], day[~dup]
        n = len(uid)
        new_island = np.ones(n, dtype=bool)
        new_island[1:] = (uid[1:] != uid[:-1]) | (day[1:] - day[:-1] != DAY)
        starts = np.flatnonzero(new_island)
        ends = np.r_[starts[1:], n]
        return pa.table(
            {
                "user_id": pa.array(uid[starts].astype(np.int64), pa.int64()),
                "streak_start_us": pa.array(day[starts].astype(np.int64), pa.int64()),
                "streak_days": pa.array((ends - starts).astype(np.int64), pa.int64()),
            }
        )

    return (
        ds.map_batches(day_pairs, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_grp")
        .map_groups(per_bucket, batch_format="pyarrow")
    )


def funnel_pattern_match(sf_dir: str):
    """MATCH_RECOGNIZE-style sequence pattern matching (Flink CEP / SQL
    row-pattern recognition): users whose event-type JOURNEY — first
    letters of event_type in (ts, event_id) order — contains
    signup → (clicks/views)* → purchase, i.e. RE2 's[cv]*p'. One
    user-hash exchange; inside a bucket the journey builds via the
    run-offset ListArray + binary_join trick (zero per-row Python) and
    ONE vectorized RE2 pass scores every user. Both engines run the same
    RE2 syntax, so the oracle (ordered string_agg + regexp_matches) is
    exact."""
    from datax_ray.functions.relational import key_buckets

    num_buckets = _buckets_for(sf_dir, "events")
    ds = _read(sf_dir, "events", columns=["event_id", "ts", "user_id", "event_type"])

    def bucket(t: pa.Table) -> pa.Table:
        return t.append_column("_grp", key_buckets(t, ["user_id"], num_buckets))

    _OUT = pa.schema([("user_id", pa.int64()), ("seq_len", pa.int64())])

    def per_bucket(g: pa.Table) -> pa.Table:
        g = g.sort_by(
            [
                ("user_id", "ascending"),
                ("ts", "ascending"),
                ("event_id", "ascending"),
            ]
        )
        if g.num_rows == 0:
            return _OUT.empty_table()
        uid = g["user_id"].combine_chunks().to_numpy(zero_copy_only=False)
        starts = np.concatenate(([True], uid[1:] != uid[:-1]))
        start_idx = np.nonzero(starts)[0]
        offsets = np.concatenate((start_idx, [len(uid)])).astype(np.int32)
        letters = pc.utf8_slice_codeunits(g["event_type"].combine_chunks(), 0, 1)
        lists = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), letters)
        journey = pc.binary_join(lists, "")
        hit = pc.match_substring_regex(journey, "s[cv]*p")
        out = pa.table(
            {
                "user_id": pa.array(uid[start_idx].astype(np.int64), pa.int64()),
                "seq_len": pa.array(np.diff(offsets).astype(np.int64), pa.int64()),
            }
        )
        return out.filter(hit)

    return (
        ds.map_batches(bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_grp")
        .map_groups(per_bucket, batch_format="pyarrow")
    )


def user_interarrival_median(sf_dir: str):
    """Per-user EXACT median inter-event gap (µs) — the cadence signal a
    bot-detection / engagement model keys on. Ordering and differencing
    need a user's rows co-located anyway, so the median computes in the
    SAME per-bucket pass as the diff: one user-hash exchange, then a
    lexsort over (user, gap) and quantile_disc's index rule
    (ceil(q·n)−1) applied per run — no second shuffle, no histogram
    needed because gaps live in bucket-local memory."""
    from datax_ray.functions.relational import key_buckets

    num_buckets = _buckets_for(sf_dir, "events")
    ds = _read(sf_dir, "events", columns=["event_id", "ts", "user_id"])

    def bucket(t: pa.Table) -> pa.Table:
        return t.append_column("_grp", key_buckets(t, ["user_id"], num_buckets))

    _OUT = pa.schema(
        [
            ("user_id", pa.int64()),
            ("median_gap_us", pa.int64()),
            ("n_gaps", pa.int64()),
        ]
    )

    def per_bucket(g: pa.Table) -> pa.Table:
        g = g.sort_by(
            [
                ("user_id", "ascending"),
                ("ts", "ascending"),
                ("event_id", "ascending"),
            ]
        )
        uid = g["user_id"].combine_chunks().to_numpy(zero_copy_only=False)
        ts = g["ts"].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
        if len(uid) < 2:
            return _OUT.empty_table()
        same = uid[1:] == uid[:-1]
        duid = uid[1:][same]
        gaps = (ts[1:] - ts[:-1])[same]
        if len(duid) == 0:
            return _OUT.empty_table()
        order = np.lexsort((gaps, duid))
        duid, gaps = duid[order], gaps[order]
        starts = np.flatnonzero(np.r_[True, duid[1:] != duid[:-1]])
        ends = np.r_[starts[1:], len(duid)]
        n = ends - starts
        med_idx = starts + np.maximum(0, np.ceil(0.5 * n).astype(np.int64) - 1)
        return pa.table(
            {
                "user_id": pa.array(duid[starts].astype(np.int64), pa.int64()),
                "median_gap_us": pa.array(gaps[med_idx].astype(np.int64), pa.int64()),
                "n_gaps": pa.array(n.astype(np.int64), pa.int64()),
            }
        )

    return (
        ds.map_batches(bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_grp")
        .map_groups(per_bucket, batch_format="pyarrow")
    )


INTERARRIVAL_SQL = """
WITH d AS (
  SELECT user_id,
         epoch_us(ts) - LAG(epoch_us(ts)) OVER (
             PARTITION BY user_id ORDER BY ts, event_id) AS gap
  FROM events
)
SELECT user_id, quantile_disc(gap, 0.5) AS median_gap_us,
       CAST(COUNT(gap) AS BIGINT) AS n_gaps
FROM d WHERE gap IS NOT NULL GROUP BY user_id
"""


FUNNEL_PATTERN_SQL = """
WITH j AS (
  SELECT user_id,
         string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id)
           AS journey,
         CAST(COUNT(*) AS BIGINT) AS seq_len
  FROM events GROUP BY user_id
)
SELECT user_id, seq_len FROM j WHERE regexp_matches(journey, 's[cv]*p')
"""


STREAKS_SQL = """
WITH d AS (
  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day FROM events
), g AS (
  SELECT user_id, day,
         day - row_number() OVER (PARTITION BY user_id ORDER BY day) AS grp
  FROM d
)
SELECT user_id, MIN(day) * 86400000000 AS streak_start_us,
       CAST(COUNT(*) AS BIGINT) AS streak_days
FROM g GROUP BY user_id, grp
"""


DEBOUNCE_SQL = """
WITH w AS (
  SELECT event_id, user_id, event_type, ts,
         epoch_us(ts) - epoch_us(LAG(ts) OVER (
             PARTITION BY user_id, event_type ORDER BY ts, event_id)) AS gap
  FROM events
)
SELECT event_id, user_id, event_type, ts FROM w
WHERE gap IS NULL OR gap >= 86400000000
"""


def fuzzy_match_parts(sf_dir: str):
    """Typo-tolerant entity resolution over part names: all unordered
    pairs of DISTINCT p_name values within Levenshtein distance 2.
    Candidates come from exact length blocking (dist <= k forces
    |len diff| <= k; each pair materializes once, in its max-length
    block), verification is the banded DP of functions/fuzzy.py —
    vectorized across the pair axis, O(len * (2k+1)) numpy steps per
    block. The quadratic-within-block step runs on DISTINCT names only;
    at corpus scale hot blocks subdivide by an extra signature (see
    functions/fuzzy.py docstring)."""
    from datax_ray.functions.fuzzy import fuzzy_pairs

    return fuzzy_pairs(_read(sf_dir, "part", columns=["p_name"]), "p_name", k=2)


FUZZY_PARTS_SQL = """
WITH names AS (SELECT DISTINCT p_name AS name FROM part)
SELECT a.name AS name_a, b.name AS name_b,
       CAST(levenshtein(a.name, b.name) AS BIGINT) AS dist
FROM names a JOIN names b ON a.name < b.name
WHERE levenshtein(a.name, b.name) <= 2
"""


def cdc_conv_transcript(sf_dir: str):
    """Conversation reconstruction over the LWW-final transcript state —
    the export step that turns a CDC-maintained turn table back into
    training documents: per conversation, the surviving turns' texts
    joined in turn order plus the turn count. One conv-hash bucket
    exchange (combiner LWW pre-reduce shrinks it first); inside a bucket
    one sort, then the per-conv join is a single pc.binary_join over a
    ListArray built from run offsets — no per-conv Python."""
    from datax_ray.functions.relational import key_buckets
    from datax_ray.sources.derive import derive_changes

    KEYS = ("conv_id", "turn_idx")
    ORDER = ("ts", "lsn")
    num_buckets = _buckets_for(sf_dir, "events")

    changes = _read(
        sf_dir, "events", columns=["event_id", "ts", "user_id"]
    ).map_batches(derive_changes, batch_format="pyarrow", zero_copy_batch=True)

    def combiner(t: pa.Table) -> pa.Table:
        t = t.drop_columns(["ddl"]).append_column(
            "_grp", key_buckets(t, ["conv_id"], num_buckets)
        )
        return lww_reduce(t, key_cols=KEYS, order_cols=ORDER)

    _OUT = pa.schema(
        [
            ("conv_id", pa.string()),
            ("n_turns", pa.int64()),
            ("transcript", pa.string()),
        ]
    )

    def per_bucket(g: pa.Table) -> pa.Table:
        w = lww_reduce(g, key_cols=KEYS, order_cols=ORDER)
        w = w.filter(pc.not_equal(w["op"], "delete"))
        if w.num_rows == 0:
            return _OUT.empty_table()
        w = w.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
        conv = w["conv_id"].combine_chunks()
        cv = conv.to_numpy(zero_copy_only=False)
        starts = np.concatenate(([True], cv[1:] != cv[:-1]))
        start_idx = np.nonzero(starts)[0]
        offsets = np.concatenate((start_idx, [len(cv)])).astype(np.int32)
        texts = pc.fill_null(w["text"].combine_chunks(), "")
        lists = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), texts)
        return pa.table(
            {
                "conv_id": conv.take(pa.array(start_idx)),
                "n_turns": pa.array(np.diff(offsets).astype(np.int64), pa.int64()),
                "transcript": pc.binary_join(lists, " "),
            }
        )

    return (
        changes.map_batches(combiner, batch_format="pyarrow")
        .groupby("_grp")
        .map_groups(per_bucket, batch_format="pyarrow")
    )


CDC_CONV_TRANSCRIPT_SQL = """
WITH c AS (
  SELECT event_id AS lsn, ts,
         CASE WHEN event_id % 10 = 0 THEN 'delete'
              WHEN event_id % 2 = 0 THEN 'insert' ELSE 'update' END AS op,
         'conv-' || CAST(user_id AS VARCHAR) AS conv_id,
         CAST(event_id % 25 AS INTEGER) AS turn_idx,
         CASE WHEN event_id % 10 = 0 THEN NULL
              ELSE 'payload-' || CAST(event_id AS VARCHAR) END AS text
  FROM events
), w AS (
  SELECT *, row_number() OVER (PARTITION BY conv_id, turn_idx
                               ORDER BY ts DESC, lsn DESC) AS rn
  FROM c
), f AS (
  SELECT conv_id, turn_idx, text FROM w WHERE rn = 1 AND op <> 'delete'
)
SELECT conv_id, CAST(COUNT(*) AS BIGINT) AS n_turns,
       string_agg(text, ' ' ORDER BY turn_idx) AS transcript
FROM f GROUP BY conv_id
"""


def outlier_events_mad(sf_dir: str):
    """Robust per-key outlier detection: events whose value sits more
    than 5 MADs from their event_type's median — the fence heavy-tailed
    telemetry needs where a mean/stddev rule gets dragged by the very
    outliers it hunts. Integer-exact end to end (cents grid, quantile_disc
    rule). Scale shape: the (type, cents) histogram combiner moves
    O(types x distinct cents) rows once; the O(|types|) fences broadcast
    into a stateless filter map — no join, no second shuffle (same shape
    as quality_cutoff_docs)."""
    from datax_ray.functions.relational import partial_agg

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {"event_type": t["event_type"], "cents": _cents(t["value"])}
        )

    hist = partial_agg(
        _read(sf_dir, "events", columns=["event_type", "value"]).map_batches(
            prep, batch_format="pyarrow", zero_copy_batch=True
        ),
        keys=["event_type", "cents"],
        counts="n",
        single_reduce=True,  # |types| x |distinct cents| grid
    )

    def _disc(vals: np.ndarray, cnts: np.ndarray) -> int:
        order = np.argsort(vals, kind="stable")
        vals, cnts = vals[order], cnts[order]
        cum = np.cumsum(cnts)
        idx = max(0, int(np.ceil(0.5 * cum[-1])) - 1)
        return int(vals[np.searchsorted(cum, idx + 1)])

    def fold(t: pa.Table) -> pa.Table:
        t = t.sort_by([("event_type", "ascending"), ("cents", "ascending")])
        et = t["event_type"].to_numpy(zero_copy_only=False)
        val = t["cents"].to_numpy(zero_copy_only=False)
        cnt = t["n"].to_numpy(zero_copy_only=False)
        new_run = np.ones(len(et), dtype=bool)
        new_run[1:] = et[1:] != et[:-1]
        starts = np.flatnonzero(new_run)
        types, meds, mads = [], [], []
        for i, s in enumerate(starts):
            e = starts[i + 1] if i + 1 < len(starts) else len(et)
            med = _disc(val[s:e], cnt[s:e])
            types.append(et[s])
            meds.append(med)
            mads.append(_disc(np.abs(val[s:e] - med), cnt[s:e]))
        return pa.table(
            {
                "event_type": pa.array(types, pa.string()),
                "med": pa.array(meds, pa.int64()),
                "mad": pa.array(mads, pa.int64()),
            }
        )

    fences = {
        r["event_type"]: (r["med"], r["mad"])
        for r in hist.map_batches(fold, batch_format="pyarrow", batch_size=None).take_all()
    }  # O(|event types|) driver rows

    def gate(t: pa.Table) -> pa.Table:
        cents = _cents(t["value"]).to_numpy(zero_copy_only=False)
        et = t["event_type"].to_numpy(zero_copy_only=False)
        s = pd.Series(et)
        medv = s.map({k: v[0] for k, v in fences.items()}).to_numpy(np.int64)
        madv = s.map({k: v[1] for k, v in fences.items()}).to_numpy(np.int64)
        keep = np.abs(cents - medv) > 5 * madv
        return pa.table(
            {
                "event_id": t["event_id"].filter(pa.array(keep)),
                "user_id": t["user_id"].filter(pa.array(keep)),
                "event_type": t["event_type"].filter(pa.array(keep)),
                "cents": pa.array(cents[keep], pa.int64()),
            }
        )

    return _read(
        sf_dir, "events", columns=["event_id", "user_id", "event_type", "value"]
    ).map_batches(gate, batch_format="pyarrow", zero_copy_batch=True)


OUTLIER_MAD_SQL = """
WITH c AS (
  SELECT event_id, user_id, event_type,
         CAST(ROUND(value * 100) AS BIGINT) AS cents
  FROM events
), med AS (
  SELECT event_type, quantile_disc(cents, 0.5) AS med FROM c GROUP BY 1
), fences AS (
  SELECT c.event_type, ANY_VALUE(med.med) AS med,
         quantile_disc(abs(c.cents - med.med), 0.5) AS mad
  FROM c JOIN med USING (event_type) GROUP BY 1
)
SELECT c.event_id, c.user_id, c.event_type, c.cents
FROM c JOIN fences f USING (event_type)
WHERE abs(c.cents - f.med) > 5 * f.mad
"""


def pmi_bigrams(sf_dir: str, k: int = 20, min_count: int = 3):
    """Collocation extraction: top-k bigrams by pointwise mutual
    information, integer-exact as lift_milli = (1000 * N * c_xy) //
    (c_x * c_y) (the log is monotone in the lift, so PMI ranking ==
    lift ranking; milli-scaled floor division keeps both engines
    bit-identical). NO join stage: unigram and bigram partials ride ONE
    unified stream into term-hash buckets keyed by x — a term's unigram
    partials land in the same bucket as every bigram starting with it, so
    c_x attaches with a bucket-local searchsorted; the bucket re-emits
    its folded unigram rows and the half-scored bigrams keyed by y, where
    the second exchange attaches c_y the same way. Two sort-shuffles
    total, vocabulary never broadcasts, zero hash-join actors (the former
    two-large_join plan spent ~7 s in join-actor CPU at sf0.1). N folds
    from a one-pass streaming sum of per-batch token counts. int64
    headroom: 1000 * N * c_xy needs N * c_xy < 9.2e15; past that, drop
    the milli scale or rank on log-space floats."""
    from datax_ray.functions.relational import key_buckets, top_k

    num_buckets = _buckets_for(sf_dir, "documents")
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    n_total = int(
        ds.map_batches(
            lambda t: pa.table(
                {
                    "n": pa.array(
                        [
                            int(
                                pc.sum(
                                    pc.list_value_length(
                                        pc.split_pattern(pc.fill_null(t["text"], ""), " ")
                                    )
                                ).as_py()
                                or 0
                            )
                        ],
                        pa.int64(),
                    )
                }
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ).sum("n")
    )

    _UNIFIED = pa.schema(
        [
            ("key", pa.string()),   # x (exchange 1) then y (exchange 2)
            ("other", pa.string()),  # the bigram's other token (null for uni rows)
            ("cnt", pa.int64()),
            ("cx", pa.int64()),      # attached in exchange 1 (null before)
            ("kind", pa.int8()),     # 0 = unigram row, 1 = bigram row
        ]
    )

    def partials(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(pc.fill_null(t["text"], ""), " ")
        flat = pc.list_flatten(toks)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        m = len(flat)
        uni = (
            pa.table({"key": flat})
            .group_by(["key"], use_threads=False)
            .aggregate([([], "count_all")])
            .rename_columns(["key", "cnt"])
        )
        parts = [
            pa.table(
                {
                    "key": uni["key"],
                    "other": pa.nulls(uni.num_rows, pa.string()),
                    "cnt": pc.cast(uni["cnt"], pa.int64()),
                    "cx": pa.nulls(uni.num_rows, pa.int64()),
                    "kind": pa.array(np.zeros(uni.num_rows, np.int8), pa.int8()),
                }
            )
        ]
        if m >= 2:
            n = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
            ends = np.cumsum(n) - 1
            valid = np.ones(m - 1, dtype=bool)
            valid[ends[ends < m - 1]] = False
            vmask = pa.array(valid)
            bg = (
                pa.table(
                    {
                        "key": flat.slice(0, m - 1).filter(vmask),
                        "other": flat.slice(1, m - 1).filter(vmask),
                    }
                )
                .group_by(["key", "other"], use_threads=False)
                .aggregate([([], "count_all")])
                .rename_columns(["key", "other", "cnt"])
            )
            parts.append(
                pa.table(
                    {
                        "key": bg["key"],
                        "other": bg["other"],
                        "cnt": pc.cast(bg["cnt"], pa.int64()),
                        "cx": pa.nulls(bg.num_rows, pa.int64()),
                        "kind": pa.array(np.ones(bg.num_rows, np.int8), pa.int8()),
                    }
                )
            )
        out = pa.concat_tables(parts).cast(_UNIFIED)
        return out.append_column("_grp", key_buckets(out, ["key"], num_buckets))

    def _attach(g: pa.Table):
        """Fold uni/bg partials in the bucket; return (uni_folded, bg_with
        this key's unigram count attached). All partials for a key are
        guaranteed local (same hash)."""
        g = g.drop_columns(["_grp"])
        uni = (
            g.filter(pc.equal(g["kind"], 0))
            .group_by(["key"], use_threads=False)
            .aggregate([("cnt", "sum")])
            .rename_columns(["key", "c"])
            .sort_by([("key", "ascending")])
        )
        bgp = g.filter(pc.equal(g["kind"], 1))
        if bgp.num_rows:
            bg = (
                bgp.select(["key", "other", "cnt"])
                .group_by(["key", "other"], use_threads=False)
                .aggregate([("cnt", "sum")])
                .rename_columns(["key", "other", "cxy"])
            )
            keys_sorted = uni["key"].combine_chunks().to_numpy(zero_copy_only=False)
            cvals = uni["c"].combine_chunks().to_numpy(zero_copy_only=False)
            pos = np.searchsorted(keys_sorted, bg["key"].to_numpy(zero_copy_only=False))
            attached = pa.array(cvals[pos], pa.int64())
        else:
            bg = None
            attached = None
        return uni, bg, attached

    def exchange1(g: pa.Table) -> pa.Table:
        uni, bg, cx = _attach(g)
        out = [
            pa.table(
                {
                    "key": uni["key"],
                    "other": pa.nulls(uni.num_rows, pa.string()),
                    "cnt": pc.cast(uni["c"], pa.int64()),
                    "cx": pa.nulls(uni.num_rows, pa.int64()),
                    "kind": pa.array(np.zeros(uni.num_rows, np.int8), pa.int8()),
                }
            )
        ]
        if bg is not None:
            keep = pc.greater_equal(bg["cxy"], min_count)
            bg2 = bg.append_column("cx_att", cx).filter(keep)
            # re-key by y for the second exchange; remember x in `other`
            out.append(
                pa.table(
                    {
                        "key": bg2["other"],
                        "other": bg2["key"],
                        "cnt": pc.cast(bg2["cxy"], pa.int64()),
                        "cx": bg2["cx_att"],
                        "kind": pa.array(np.ones(bg2.num_rows, np.int8), pa.int8()),
                    }
                )
            )
        res = pa.concat_tables(out).cast(_UNIFIED)
        return res.append_column("_grp", key_buckets(res, ["key"], num_buckets))

    _SCORED = pa.schema(
        [("bigram", pa.string()), ("cxy", pa.int64()), ("lift_milli", pa.int64())]
    )

    def exchange2(g: pa.Table) -> pa.Table:
        # uni rows arrive already globally folded (each term's partials
        # met in exactly one exchange-1 bucket); bg rows carry key=y,
        # other=x, cnt=cxy and the attached cx — no re-fold needed
        g = g.drop_columns(["_grp"])
        bgp = g.filter(pc.equal(g["kind"], 1))
        if bgp.num_rows == 0:
            return _SCORED.empty_table()
        uni = (
            g.filter(pc.equal(g["kind"], 0))
            .select(["key", "cnt"])
            .rename_columns(["key", "c"])
            .sort_by([("key", "ascending")])
        )
        keys_sorted = uni["key"].combine_chunks().to_numpy(zero_copy_only=False)
        cvals = uni["c"].combine_chunks().to_numpy(zero_copy_only=False)
        pos = np.searchsorted(keys_sorted, bgp["key"].to_numpy(zero_copy_only=False))
        cyv = cvals[pos].astype(np.int64)
        cxv = bgp["cx"].to_numpy(zero_copy_only=False).astype(np.int64)
        cxyv = bgp["cnt"].to_numpy(zero_copy_only=False).astype(np.int64)
        lift = (1000 * n_total * cxyv) // (cxv * cyv)
        return pa.table(
            {
                "bigram": pc.binary_join_element_wise(
                    bgp["other"], bgp["key"], " "
                ),
                "cxy": pa.array(cxyv, pa.int64()),
                "lift_milli": pa.array(lift, pa.int64()),
            }
        )

    scored = (
        ds.map_batches(partials, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_grp")
        .map_groups(exchange1, batch_format="pyarrow")
        .groupby("_grp")
        .map_groups(exchange2, batch_format="pyarrow")
    )
    return top_k(scored, by="lift_milli", k=k, tie_col="bigram").map_batches(
        lambda t: t.select(["bigram", "cxy", "lift_milli"]), batch_format="pyarrow"
    )


def lm_surprise_docs(sf_dir: str):
    """Bigram-LM document quality scoring — the CCNet / perplexity-filter
    step of a training-data pipeline (Wenzek et al. 2020 use a pruned LM;
    here the LM is the corpus's own Laplace-smoothed bigram model),
    integer-exact so the DuckDB oracle is bit-identical: per bigram
    occurrence, surprise_milli = (1000 * (c1 + V)) // (c12 + 1) — the
    milli-scaled inverse of the smoothed probability P(w2|w1) =
    (c12+1)/(c1+V) — and per document the mean over its bigrams (floor
    division; high surprise = improbable word sequences = low quality).

    Scale shape: V (distinct context tokens) folds from per-batch distinct
    partials (vocab-sized shuffle); then ONE unified w1-hash exchange
    carries both the bigram-count partials and the per-doc occurrence
    partials — every bigram with first token w1 lands in one bucket, so
    the context count c1 = sum of that bucket's c12 rows is derived
    IN-BUCKET (the vocabulary never broadcasts and never joins), c12/c1
    attach to occurrences with bucket-local searchsorted, and the bucket
    emits per-doc partial sums. A final doc_id-keyed fold is O(docs).
    Model state is never on the driver."""
    from datax_ray.functions.relational import key_buckets, partial_agg

    num_buckets = _buckets_for(sf_dir, "documents")
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def _bigram_arrays(t: pa.Table):
        """(w1, w2, doc_ids) flat arrays of in-doc adjacent token pairs."""
        toks = pc.split_pattern(pc.fill_null(t["text"], ""), " ")
        flat = pc.list_flatten(toks)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        m = len(flat)
        if m < 2:
            return None
        n = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        ends = np.cumsum(n) - 1
        valid = np.ones(m - 1, dtype=bool)
        valid[ends[ends < m - 1]] = False  # pairs straddling documents
        vmask = pa.array(valid)
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        occ_ids = pa.array(
            np.repeat(ids, np.maximum(n - 1, 0)).astype(np.int64)
        )
        return (
            flat.slice(0, m - 1).filter(vmask),
            flat.slice(1, m - 1).filter(vmask),
            occ_ids,
        )

    # pass 1 — V: distinct context tokens, folded from per-batch partials
    def ctx_partial(t: pa.Table) -> pa.Table:
        arrs = _bigram_arrays(t)
        if arrs is None:
            return pa.table({"w1": pa.array([], pa.string())})
        return pa.table({"w1": pc.unique(arrs[0])})

    vocab_size = partial_agg(
        ds.map_batches(ctx_partial, batch_format="pyarrow", zero_copy_batch=True),
        keys=["w1"],
        sums={},
        num_buckets=num_buckets,
    ).count()

    # pass 2 — unified stream: kind 0 = bigram-count partials (w1,w2,cnt),
    # kind 1 = per-doc occurrence partials (doc_id,w1,w2,cnt)
    _UNI = pa.schema(
        [
            ("w1", pa.string()),
            ("w2", pa.string()),
            ("doc_id", pa.int64()),
            ("cnt", pa.int64()),
            ("kind", pa.int8()),
        ]
    )

    def partials(t: pa.Table) -> pa.Table:
        arrs = _bigram_arrays(t)
        if arrs is None:
            out = _UNI.empty_table()
            return out.append_column("_grp", pa.array([], pa.int32()))
        w1, w2, occ_ids = arrs
        base = pa.table({"w1": w1, "w2": w2, "doc_id": occ_ids})
        bg = (
            base.select(["w1", "w2"])
            .group_by(["w1", "w2"], use_threads=False)
            .aggregate([([], "count_all")])
            .rename_columns(["w1", "w2", "cnt"])
        )
        occ = (
            base.group_by(["doc_id", "w1", "w2"], use_threads=False)
            .aggregate([([], "count_all")])
            .rename_columns(["doc_id", "w1", "w2", "cnt"])
        )
        out = pa.concat_tables(
            [
                pa.table(
                    {
                        "w1": bg["w1"],
                        "w2": bg["w2"],
                        "doc_id": pa.nulls(bg.num_rows, pa.int64()),
                        "cnt": pc.cast(bg["cnt"], pa.int64()),
                        "kind": pa.array(np.zeros(bg.num_rows, np.int8), pa.int8()),
                    }
                ),
                pa.table(
                    {
                        "w1": occ["w1"],
                        "w2": occ["w2"],
                        "doc_id": occ["doc_id"],
                        "cnt": pc.cast(occ["cnt"], pa.int64()),
                        "kind": pa.array(np.ones(occ.num_rows, np.int8), pa.int8()),
                    }
                ),
            ]
        ).cast(_UNI)
        return out.append_column("_grp", key_buckets(out, ["w1"], num_buckets))

    _DOC_PART = pa.schema(
        [("doc_id", pa.int64()), ("ssum", pa.int64()), ("nbg", pa.int64())]
    )

    def score_bucket(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["_grp"])
        occ = g.filter(pc.equal(g["kind"], 1))
        if occ.num_rows == 0:
            return _DOC_PART.empty_table()
        bg = (
            g.filter(pc.equal(g["kind"], 0))
            .select(["w1", "w2", "cnt"])
            .group_by(["w1", "w2"], use_threads=False)
            .aggregate([("cnt", "sum")])
            .rename_columns(["w1", "w2", "c12"])
        )
        # c1 = sum of c12 over the bucket-local rows with this first token
        ctx = (
            bg.select(["w1", "c12"])
            .group_by(["w1"], use_threads=False)
            .aggregate([("c12", "sum")])
            .rename_columns(["w1", "c1"])
            .sort_by([("w1", "ascending")])
        )
        pair_key = pc.binary_join_element_wise(bg["w1"], bg["w2"], "\x00")
        order = pc.sort_indices(pair_key)
        pk_sorted = pair_key.take(order).to_numpy(zero_copy_only=False)
        c12_sorted = (
            bg["c12"].take(order).to_numpy(zero_copy_only=False).astype(np.int64)
        )
        occ_key = pc.binary_join_element_wise(
            occ["w1"], occ["w2"], "\x00"
        ).to_numpy(zero_copy_only=False)
        c12v = c12_sorted[np.searchsorted(pk_sorted, occ_key)]
        ctx_terms = ctx["w1"].combine_chunks().to_numpy(zero_copy_only=False)
        c1_sorted = ctx["c1"].combine_chunks().to_numpy(zero_copy_only=False)
        c1v = c1_sorted[
            np.searchsorted(ctx_terms, occ["w1"].to_numpy(zero_copy_only=False))
        ].astype(np.int64)
        occ_n = occ["cnt"].to_numpy(zero_copy_only=False).astype(np.int64)
        surprise = (1000 * (c1v + vocab_size)) // (c12v + 1)
        part = pa.table(
            {
                "doc_id": occ["doc_id"],
                "ssum": pa.array(surprise * occ_n, pa.int64()),
                "nbg": pa.array(occ_n, pa.int64()),
            }
        )
        return (
            part.group_by(["doc_id"], use_threads=False)
            .aggregate([("ssum", "sum"), ("nbg", "sum")])
            .rename_columns(["doc_id", "ssum", "nbg"])
        )

    per_doc = partial_agg(
        ds.map_batches(partials, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_grp")
        .map_groups(score_bucket, batch_format="pyarrow"),
        keys=["doc_id"],
        sums={"ssum": "ssum", "nbg": "nbg"},
        num_buckets=num_buckets,
    )

    def finish(t: pa.Table) -> pa.Table:
        ss = t["ssum"].to_numpy(zero_copy_only=False).astype(np.int64)
        nb = t["nbg"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_bigrams": pa.array(nb, pa.int64()),
                "avg_surprise_milli": pa.array(ss // nb, pa.int64()),
            }
        )

    return per_doc.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


LM_SURPRISE_SQL = """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term,
         generate_subscripts(string_split(text, ' '), 1) AS pos
  FROM documents
), pairs AS (
  SELECT doc_id, term AS w1,
         LEAD(term) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
  FROM tok
), occ AS (
  SELECT doc_id, w1, w2 FROM pairs WHERE w2 IS NOT NULL
), bg AS (
  SELECT w1, w2, COUNT(*) AS c12 FROM occ GROUP BY 1, 2
), ctx AS (
  SELECT w1, SUM(c12) AS c1 FROM bg GROUP BY 1
), v AS (
  SELECT COUNT(*) AS vsz FROM ctx
)
SELECT o.doc_id, COUNT(*) AS n_bigrams,
       SUM((1000 * (ctx.c1 + (SELECT vsz FROM v))) // (bg.c12 + 1))
         // COUNT(*) AS avg_surprise_milli
FROM occ o
JOIN bg ON o.w1 = bg.w1 AND o.w2 = bg.w2
JOIN ctx ON o.w1 = ctx.w1
GROUP BY 1
"""


PMI_BIGRAMS_SQL = """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term,
         generate_subscripts(string_split(text, ' '), 1) AS pos
  FROM documents
), uni AS (
  SELECT term, COUNT(*) AS c FROM tok GROUP BY 1
), n AS (
  SELECT COUNT(*) AS total FROM tok
), pairs AS (
  SELECT doc_id, term AS x,
         LEAD(term) OVER (PARTITION BY doc_id ORDER BY pos) AS y
  FROM tok
), bg AS (
  SELECT x, y, COUNT(*) AS cxy FROM pairs WHERE y IS NOT NULL
  GROUP BY 1, 2 HAVING COUNT(*) >= 3
)
SELECT bg.x || ' ' || bg.y AS bigram, bg.cxy,
       (1000 * (SELECT total FROM n) * bg.cxy) // (ux.c * uy.c) AS lift_milli
FROM bg JOIN uni ux ON bg.x = ux.term JOIN uni uy ON bg.y = uy.term
ORDER BY lift_milli DESC, bigram LIMIT 20
"""


def substring_dup_docs(sf_dir: str, L: int = 30):
    """Exact substring-duplication scan: per document, the number of its
    DISTINCT L-char windows that also appear in at least one OTHER
    document — the character-level exact-dup primitive of training-data
    dedup (the approach of suffix-array dedup literature, expressed as a
    window-bucket shuffle instead of a global suffix array). Pipeline:
    (1) one map extracts every in-doc window as a zero-copy
    sliding_window_view over the batch's concatenated UTF-8 buffer
    (doc-boundary starts masked vectorized — no per-doc Python) and
    dedups (doc, win) within the batch (docs never split across batches,
    so that dedup is globally exact); (2) windows shuffle into win-hash
    buckets where a run-length pass finds windows held by >= 2 docs and
    emits per-doc partial counts; (3) a doc-key combiner folds the
    partials. At 100 TB the (win, doc) exchange carries ~L x corpus
    bytes — the scale variant ships a only u64 rolling hash + doc_id and
    verifies inside the bucket; exact strings are kept here because the
    oracle compares exact windows."""
    from datax_ray.functions.relational import key_buckets, partial_agg

    num_buckets = _buckets_for(sf_dir, "documents")
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    _PAIRS = pa.schema([("doc_id", pa.int64()), ("win", pa.binary())])

    def windows(t: pa.Table) -> pa.Table:
        arr = pc.fill_null(t["text"], "")
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        n = len(arr)
        offs_raw = np.frombuffer(arr.buffers()[1], np.int32)
        offs = offs_raw[arr.offset : arr.offset + n + 1].astype(np.int64)
        data = arr.buffers()[2]
        if data is None or offs[-1] - offs[0] < L:
            return _PAIRS.empty_table()
        buf = np.frombuffer(data, np.uint8, count=int(offs[-1]))
        positions = np.arange(offs[0], offs[-1] - L + 1)
        doc_per_pos = np.searchsorted(offs, positions, side="right") - 1
        valid = positions + L <= offs[doc_per_pos + 1]
        if not valid.any():
            return _PAIRS.empty_table()
        sw = np.lib.stride_tricks.sliding_window_view(buf, L)
        mat = np.ascontiguousarray(sw[positions[valid]])
        wins = pa.Array.from_buffers(
            pa.binary(L), mat.shape[0], [None, pa.py_buffer(mat.tobytes())]
        ).cast(pa.binary())
        ids = t["doc_id"].combine_chunks() if isinstance(
            t["doc_id"], pa.ChunkedArray
        ) else t["doc_id"]
        pairs = pa.table(
            {
                "doc_id": ids.take(pa.array(doc_per_pos[valid])),
                "win": wins,
            }
        )
        # distinct (doc, win) inside the batch == globally distinct
        return pairs.group_by(["doc_id", "win"], use_threads=False).aggregate([])

    def bucket(t: pa.Table) -> pa.Table:
        return t.append_column("_grp", key_buckets(t, ["win"], num_buckets))

    _PART = pa.schema([("doc_id", pa.int64()), ("cnt", pa.int64())])

    def per_bucket(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _PART.empty_table()
        g = g.sort_by([("win", "ascending")])
        w = g["win"].combine_chunks()
        wv = w.to_numpy(zero_copy_only=False)
        new_run = np.ones(len(wv), dtype=bool)
        new_run[1:] = wv[1:] != wv[:-1]
        run_id = np.cumsum(new_run) - 1
        run_len = np.bincount(run_id)
        dup_rows = run_len[run_id] >= 2  # rows are distinct (doc, win) pairs
        if not dup_rows.any():
            return _PART.empty_table()
        docs = g["doc_id"].combine_chunks().to_numpy(zero_copy_only=False)[dup_rows]
        return (
            pa.table({"doc_id": pa.array(docs, pa.int64())})
            .group_by(["doc_id"], use_threads=False)
            .aggregate([([], "count_all")])
            .rename_columns(["doc_id", "cnt"])
        )

    pairs = ds.map_batches(windows, batch_format="pyarrow", zero_copy_batch=True)
    partials = (
        pairs.map_batches(bucket, batch_format="pyarrow")
        .groupby("_grp")
        .map_groups(per_bucket, batch_format="pyarrow")
    )
    return partial_agg(
        partials, keys=["doc_id"], sums={"cnt": "n_dup_windows"}, single_reduce=True
    )


SUBSTRING_DUP_SQL = """
WITH w AS (
  SELECT DISTINCT doc_id, substr(text, CAST(i AS INT), 30) AS win
  FROM documents, unnest(range(1, length(text) - 28)) AS t(i)
  WHERE length(text) >= 30
), d AS (
  SELECT win FROM w GROUP BY 1 HAVING COUNT(*) >= 2
)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_dup_windows
FROM w WHERE win IN (SELECT win FROM d)
GROUP BY doc_id
"""


def cdc_snapshot_diff(sf_dir: str):
    """Epoch-over-epoch lake diff — the audit surface for "what did this
    ingest tranche change": replay the first half of the change log,
    record the committed epoch head, replay the second half on top, then
    classify every (conv_id, turn_idx) key as added / removed / changed
    between the AS-OF-head state and the current state. The diff itself
    is one hash-partitioned FULL OUTER large_join on the composite key
    (both sides are manifest reads, column-pruned to the compare set) —
    no driver materialization of either snapshot. The oracle expresses
    both states as LWW folds of the same derivation split at the same
    lsn cut."""
    import shutil

    from datax_ray.functions.relational import large_join
    from datax_ray.pipelines.replay import ReplayConfig, replay
    from datax_ray.sinks.lake import read_lake
    from datax_ray.sources.derive import ChangeDeriver
    from datax_ray.state.manifest import Manifest

    n = parquet_rows(os.path.join(sf_dir, "events.parquet"))
    cut = n // 2
    work = f"/tmp/datax_cdc_diff/{os.path.basename(os.path.normpath(sf_dir))}"
    shutil.rmtree(work, ignore_errors=True)

    def derive_tranche(lo_incl: int | None, hi_excl: int | None) -> int:
        mask_fn = (
            (lambda t: t.filter(pc.less(t["event_id"], hi_excl)))
            if hi_excl is not None
            else (lambda t: t.filter(pc.greater_equal(t["event_id"], lo_incl)))
        )
        lineage = (
            _read(sf_dir, "events", columns=["event_id", "ts", "user_id"])
            .map_batches(mask_fn, batch_format="pyarrow", zero_copy_batch=True)
            .map_batches(
                ChangeDeriver(f"{work}/changes"),
                batch_format="pyarrow",
                zero_copy_batch=True,
                batch_size=4096,
            )
            .count()
        )
        return max(1, int(lineage))

    cfg_kw = dict(
        changes_dir=f"{work}/changes", lake_dir=f"{work}/lake", num_partitions=16
    )
    n_segs = derive_tranche(None, cut)
    replay(ReplayConfig(segments_per_epoch=max(2, -(-n_segs // 3)), **cfg_kw))
    head = Manifest(f"{work}/lake").committed_epoch()
    derive_tranche(cut, None)
    replay(ReplayConfig(segments_per_epoch=max(2, -(-n_segs // 3)), **cfg_kw))

    def prep(prefix: str):
        def fn(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "conv_id": t["conv_id"],
                    "turn_idx": pc.cast(t["turn_idx"], pa.int64()),
                    f"{prefix}_text": t["text"],
                    f"{prefix}_ts": t["ts"],
                }
            )

        return fn

    old = read_lake(f"{work}/lake", as_of_epoch=head).map_batches(
        prep("o"), batch_format="pyarrow"
    )
    new = read_lake(f"{work}/lake").map_batches(prep("n"), batch_format="pyarrow")
    j = large_join(old, new, on=("conv_id", "turn_idx"), join_type="full_outer")

    def classify(t: pa.Table) -> pa.Table:
        o_has = pc.is_valid(t["o_ts"])
        n_has = pc.is_valid(t["n_ts"])
        same = pc.and_kleene(
            pc.equal(t["o_text"], t["n_text"]), pc.equal(t["o_ts"], t["n_ts"])
        )
        change = pc.if_else(
            pc.invert(o_has),
            "added",
            pc.if_else(
                pc.invert(n_has),
                "removed",
                pc.if_else(pc.fill_null(same, False), "unchanged", "changed"),
            ),
        )
        out = pa.table(
            {
                "conv_id": t["conv_id"],
                "turn_idx": t["turn_idx"],
                "change": change,
            }
        )
        return out.filter(pc.not_equal(out["change"], "unchanged"))

    return j.map_batches(classify, batch_format="pyarrow")


CDC_SNAPSHOT_DIFF_SQL = """
WITH c AS (
  SELECT event_id AS lsn, ts,
         CASE WHEN event_id % 10 = 0 THEN 'delete'
              WHEN event_id % 2 = 0 THEN 'insert' ELSE 'update' END AS op,
         'conv-' || CAST(user_id AS VARCHAR) AS conv_id,
         CAST(event_id % 25 AS BIGINT) AS turn_idx,
         CASE WHEN event_id % 10 = 0 THEN NULL
              ELSE 'payload-' || CAST(event_id AS VARCHAR) END AS text
  FROM events
), wo AS (
  SELECT *, row_number() OVER (PARTITION BY conv_id, turn_idx
                               ORDER BY ts DESC, lsn DESC) AS rn
  FROM c WHERE lsn < (SELECT COUNT(*) // 2 FROM events)
), so AS (
  SELECT conv_id, turn_idx, text, ts FROM wo WHERE rn = 1 AND op <> 'delete'
), wn AS (
  SELECT *, row_number() OVER (PARTITION BY conv_id, turn_idx
                               ORDER BY ts DESC, lsn DESC) AS rn
  FROM c
), sn AS (
  SELECT conv_id, turn_idx, text, ts FROM wn WHERE rn = 1 AND op <> 'delete'
), d AS (
  SELECT COALESCE(o.conv_id, n.conv_id) AS conv_id,
         COALESCE(o.turn_idx, n.turn_idx) AS turn_idx,
         CASE WHEN o.conv_id IS NULL THEN 'added'
              WHEN n.conv_id IS NULL THEN 'removed'
              WHEN o.text = n.text AND o.ts = n.ts THEN 'unchanged'
              ELSE 'changed' END AS change
  FROM so o FULL OUTER JOIN sn n
    ON o.conv_id = n.conv_id AND o.turn_idx = n.turn_idx
)
SELECT conv_id, turn_idx, change FROM d WHERE change <> 'unchanged'
"""


def cdc_restore_rollback(sf_dir: str):
    """RESTORE end to end (pipelines/replay.py:restore_lake — the Delta
    rollback verb): replay the first half of the derived log, TAG the
    head, replay the second half on top, then restore to the tag. The
    final lake must equal the LWW fold of the FIRST tranche alone — the
    rewind is exact, the discarded tranche leaves zero residue, and the
    restore epoch reconstructed the old state purely by manifest
    reference (no data bytes moved). Oracle: CDC_REPLAY_SQL at the same
    lsn < COUNT/2 cut."""
    import shutil

    from datax_ray.pipelines.replay import ReplayConfig, replay, restore_lake
    from datax_ray.sinks.lake import final_table
    from datax_ray.sources.derive import ChangeDeriver
    from datax_ray.state.manifest import Manifest

    n = parquet_rows(os.path.join(sf_dir, "events.parquet"))
    cut = n // 2
    work = f"/tmp/datax_cdc_restore/{os.path.basename(os.path.normpath(sf_dir))}"
    shutil.rmtree(work, ignore_errors=True)

    def derive_tranche(lo_incl: int | None, hi_excl: int | None) -> int:
        mask_fn = (
            (lambda t: t.filter(pc.less(t["event_id"], hi_excl)))
            if hi_excl is not None
            else (lambda t: t.filter(pc.greater_equal(t["event_id"], lo_incl)))
        )
        segs = (
            _read(sf_dir, "events", columns=["event_id", "ts", "user_id"])
            .map_batches(mask_fn, batch_format="pyarrow", zero_copy_batch=True)
            .map_batches(
                ChangeDeriver(f"{work}/changes"),
                batch_format="pyarrow",
                zero_copy_batch=True,
                batch_size=4096,
            )
            .count()
        )
        return max(1, int(segs))

    cfg_kw = dict(
        changes_dir=f"{work}/changes", lake_dir=f"{work}/lake", num_partitions=16
    )
    n_segs = derive_tranche(None, cut)
    spe = max(2, -(-n_segs // 3))
    replay(ReplayConfig(segments_per_epoch=spe, **cfg_kw))
    Manifest(f"{work}/lake").set_tag("pre-incident")
    derive_tranche(cut, None)
    replay(ReplayConfig(segments_per_epoch=spe, **cfg_kw))
    restore_lake(f"{work}/lake", to_tag="pre-incident")
    return final_table(f"{work}/lake")


CDC_RESTORE_SQL = CDC_REPLAY_SQL.replace(
    "FROM events",
    "FROM events WHERE event_id < (SELECT COUNT(*) // 2 FROM events)",
)


def cdc_cluster_optimize(sf_dir: str):
    """ts-clustering compaction through the full engine (compact
    --cluster-ts, the OPTIMIZE-ZORDER analog): replay the derived log,
    rewrite every base sorted by (ts, conv_id, turn_idx) — tight monotone
    row-group ts statistics for min-ts row-group skipping — and read the
    final state back through the clustered layout. Clustering is a pure
    LAYOUT change, so the oracle is CDC_REPLAY_SQL verbatim: the driver
    hash-verifies that the rewrite moved no values."""
    import shutil

    from datax_ray.pipelines.replay import ReplayConfig, compact_lake, replay
    from datax_ray.sinks.lake import final_table

    work = f"/tmp/datax_cdc_cluster/{os.path.basename(os.path.normpath(sf_dir))}"
    spe = _derive_changes(sf_dir, work)
    replay(
        ReplayConfig(
            changes_dir=f"{work}/changes",
            lake_dir=f"{work}/lake",
            num_partitions=16,
            segments_per_epoch=spe,
        )
    )
    compact_lake(
        ReplayConfig(changes_dir="", lake_dir=f"{work}/lake"), cluster_ts=True
    )
    return final_table(f"{work}/lake")


def cdc_wap_publish(sf_dir: str):
    """Write-audit-publish through the full engine (replay --stage →
    audit → publish): the derived log lands as ONE STAGED epoch (invisible
    to committed readers — asserted in-harness), the staged read point
    audits it, and publish promotes it atomically. The published lake must
    hash-equal the plain LWW fold — staging/publishing is commit-protocol
    plumbing, not a data transform."""
    import shutil

    from datax_ray.pipelines.replay import ReplayConfig, replay
    from datax_ray.sinks.lake import final_table
    from datax_ray.state.manifest import Manifest

    work = f"/tmp/datax_cdc_wap/{os.path.basename(os.path.normpath(sf_dir))}"
    _derive_changes(sf_dir, work)
    cfg = ReplayConfig(
        changes_dir=f"{work}/changes",
        lake_dir=f"{work}/lake",
        num_partitions=16,
    )
    replay(cfg, stage=True)
    m = Manifest(f"{work}/lake")
    assert m.committed_epoch() == -1, "staged epoch leaked into the chain"
    staged_rows = final_table(f"{work}/lake", as_of_epoch="staged").num_rows
    m.publish_staged()
    out = final_table(f"{work}/lake")
    assert out.num_rows == staged_rows, "published state != audited state"
    return out


def cdc_autoddl_replay(sf_dir: str):
    """AUTOMATIC schema evolution end to end (replay --auto-ddl): the
    derived segments carry an UNDECLARED `sentiment` payload column —
    no op='ddl' event anywhere — and the replay evolves the lake schema
    from parquet footers alone (sources/changelog.py:scan_schema_drift),
    then lands the column's values through the normal normalize → LWW
    path. Oracle: the LWW fold plus sentiment computed by the same
    derivation rule ('s' || event_id % 7)."""
    import shutil

    from datax_ray.pipelines.replay import ReplayConfig, replay
    from datax_ray.sinks.lake import final_table

    work = f"/tmp/datax_cdc_autoddl/{os.path.basename(os.path.normpath(sf_dir))}"
    spe = _derive_changes(sf_dir, work, extra_col_mod=7)
    replay(
        ReplayConfig(
            changes_dir=f"{work}/changes",
            lake_dir=f"{work}/lake",
            num_partitions=16,
            segments_per_epoch=spe,
            auto_ddl=True,
        )
    )
    return final_table(f"{work}/lake")


CDC_AUTODDL_SQL = """
WITH c AS (
  SELECT event_id AS lsn, ts,
         CASE WHEN event_id % 10 = 0 THEN 'delete'
              WHEN event_id % 2 = 0 THEN 'insert' ELSE 'update' END AS op,
         'conv-' || CAST(user_id AS VARCHAR) AS conv_id,
         CAST(event_id % 25 AS INTEGER) AS turn_idx,
         CASE WHEN event_id % 10 = 0 THEN NULL
              WHEN event_id % 2 = 0 THEN 'user' ELSE 'assistant' END AS role,
         CASE WHEN event_id % 10 = 0 THEN NULL
              ELSE 'payload-' || CAST(event_id AS VARCHAR) END AS text,
         CASE WHEN event_id % 10 = 0 THEN NULL ELSE '' END AS tool,
         CASE WHEN event_id % 10 = 0 THEN NULL
              ELSE 's' || CAST(event_id % 7 AS VARCHAR) END AS sentiment
  FROM events
), w AS (
  SELECT *, row_number() OVER (PARTITION BY conv_id, turn_idx
                               ORDER BY ts DESC, lsn DESC) AS rn
  FROM c
)
SELECT conv_id, turn_idx, role, text, tool, ts, sentiment
FROM w WHERE rn = 1 AND op <> 'delete'
"""


def assoc_rules_parts(sf_dir: str, k: int = 50, min_support: int = 2):
    """Market-basket association rules over order baskets: directed part
    pairs x→y ranked by integer confidence_milli = (1000 * c_xy) // c_x
    (c_xy = orders containing both, c_x = orders containing x), top-k with
    a deterministic rule-string tie-break. Scale shape: baskets dedup in
    an (order, part) combiner; pair explosion runs inside order-hash
    buckets with a fully vectorized per-run index construction (pair
    count per order is m² - m — bounded by basket size, never corpus);
    antecedent counts attach via one hash-partitioned join; the top-k
    tree folds partials. No driver state beyond the k result rows."""
    from datax_ray.functions.relational import (
        key_buckets,
        large_join,
        partial_agg,
        top_k,
    )

    num_buckets = _buckets_for(sf_dir, "lineitem")
    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])

    baskets = partial_agg(
        li, keys=["l_orderkey", "l_partkey"], counts="_c"
    ).drop_columns(["_c"])

    cx = partial_agg(baskets, keys=["l_partkey"], counts="cx").map_batches(
        lambda t: pa.table({"x": t["l_partkey"], "cx": t["cx"]}),
        batch_format="pyarrow",
    )

    def bucket(t: pa.Table) -> pa.Table:
        return t.append_column("_grp", key_buckets(t, ["l_orderkey"], num_buckets))

    _PAIRS = pa.schema([("x", pa.int64()), ("y", pa.int64()), ("cnt", pa.int64())])

    def pairs_per_bucket(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _PAIRS.empty_table()
        g = g.sort_by([("l_orderkey", "ascending")])
        ok = g["l_orderkey"].combine_chunks().to_numpy(zero_copy_only=False)
        pk = g["l_partkey"].combine_chunks().to_numpy(zero_copy_only=False)
        new_run = np.ones(len(ok), dtype=bool)
        new_run[1:] = ok[1:] != ok[:-1]
        starts = np.flatnonzero(new_run)
        m = np.diff(np.concatenate((starts, [len(ok)])))
        mm = m * m
        total = int(mm.sum())
        if total == 0:
            return _PAIRS.empty_table()
        # vectorized all-pairs index construction per run: for pair p in
        # run j, a = start_j + local // m_j, b = start_j + local % m_j
        base = np.repeat(np.cumsum(mm) - mm, mm)
        m_pair = np.repeat(m, mm)
        start_pair = np.repeat(starts, mm)
        local = np.arange(total) - base
        a = start_pair + local // m_pair
        b = start_pair + local % m_pair
        keep = a != b
        x = pk[a[keep]]
        y = pk[b[keep]]
        return (
            pa.table({"x": pa.array(x, pa.int64()), "y": pa.array(y, pa.int64())})
            .group_by(["x", "y"], use_threads=False)
            .aggregate([([], "count_all")])
            .rename_columns(["x", "y", "cnt"])
        )

    pair_counts = partial_agg(
        baskets.map_batches(bucket, batch_format="pyarrow")
        .groupby("_grp")
        .map_groups(pairs_per_bucket, batch_format="pyarrow"),
        keys=["x", "y"],
        sums={"cnt": "cxy"},
    ).map_batches(
        lambda t: t.filter(pc.greater_equal(t["cxy"], min_support)),
        batch_format="pyarrow",
    )

    j = large_join(pair_counts, cx, on="x")

    def score(t: pa.Table) -> pa.Table:
        cxy = t["cxy"].to_numpy(zero_copy_only=False).astype(np.int64)
        cxv = t["cx"].to_numpy(zero_copy_only=False).astype(np.int64)
        conf = (1000 * cxy) // cxv
        rule = pc.binary_join_element_wise(
            pc.cast(t["x"], pa.string()), pc.cast(t["y"], pa.string()), "->"
        )
        return pa.table(
            {
                "rule": rule,
                "cxy": pa.array(cxy, pa.int64()),
                "conf_milli": pa.array(conf, pa.int64()),
            }
        )

    return top_k(
        j.map_batches(score, batch_format="pyarrow"),
        by="conf_milli",
        k=k,
        tie_col="rule",
    ).map_batches(
        lambda t: t.select(["rule", "cxy", "conf_milli"]), batch_format="pyarrow"
    )


ASSOC_RULES_SQL = """
WITH b AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
), px AS (
  SELECT l_partkey, COUNT(*) AS cx FROM b GROUP BY 1
), pairs AS (
  SELECT a.l_partkey AS x, c.l_partkey AS y, COUNT(*) AS cxy
  FROM b a JOIN b c ON a.l_orderkey = c.l_orderkey
                   AND a.l_partkey <> c.l_partkey
  GROUP BY 1, 2 HAVING COUNT(*) >= 2
)
SELECT CAST(pairs.x AS VARCHAR) || '->' || CAST(pairs.y AS VARCHAR) AS rule,
       pairs.cxy, (1000 * pairs.cxy) // px.cx AS conf_milli
FROM pairs JOIN px ON pairs.x = px.l_partkey
ORDER BY conf_milli DESC, rule LIMIT 50
"""


def weighted_sample_docs(sf_dir: str, k: int = 64):
    """Deterministic weighted sampling: k documents drawn with priority
    fmix32(doc_id) // n_chars — longer docs get proportionally smaller
    priorities, the k smallest win. RNG-free and machine-independent (the
    house fmix32 chain, same as the CMS sketch), so distributed re-runs,
    resumes and the SQL oracle all pick the identical sample — the
    property a curation pipeline needs for reproducible subset builds.
    One vectorized map + the distributed top-k tree (k rows per batch
    reach the final reduce); no shuffle of the corpus."""
    from datax_ray.functions.relational import top_k

    ds = _read(sf_dir, "documents", columns=["doc_id", "n_chars"])
    M32 = np.uint64(4294967296)

    def prio(t: pa.Table) -> pa.Table:
        h = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64) % M32
        h ^= h >> np.uint64(16)
        h = (h * np.uint64(2246822507)) % M32
        h ^= h >> np.uint64(13)
        h = (h * np.uint64(3266489909)) % M32
        h ^= h >> np.uint64(16)
        w = t["n_chars"].to_numpy(zero_copy_only=False).astype(np.uint64)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_chars": t["n_chars"],
                "priority": pa.array((h // w).astype(np.int64), pa.int64()),
            }
        )

    return top_k(
        ds.map_batches(prio, batch_format="pyarrow", zero_copy_batch=True),
        by="priority",
        k=k,
        tie_col="doc_id",
        descending=False,
    ).map_batches(
        lambda t: t.select(["doc_id", "n_chars", "priority"]), batch_format="pyarrow"
    )


WEIGHTED_SAMPLE_SQL = """
WITH s0 AS (
  SELECT doc_id, n_chars, doc_id % 4294967296 AS h FROM documents
), s1 AS (SELECT doc_id, n_chars, xor(h, h >> 16) AS h FROM s0),
s2 AS (SELECT doc_id, n_chars,
              CAST(CAST(h AS HUGEINT) * 2246822507 % 4294967296 AS BIGINT) AS h
       FROM s1),
s3 AS (SELECT doc_id, n_chars, xor(h, h >> 13) AS h FROM s2),
s4 AS (SELECT doc_id, n_chars,
              CAST(CAST(h AS HUGEINT) * 3266489909 % 4294967296 AS BIGINT) AS h
       FROM s3),
hv AS (SELECT doc_id, n_chars, xor(h, h >> 16) AS h FROM s4)
SELECT doc_id, n_chars, h // n_chars AS priority
FROM hv ORDER BY priority, doc_id LIMIT 64
"""


def skyline_customers(sf_dir: str):
    """Pareto skyline over per-customer (total spend, recency): customers
    not strictly dominated on BOTH axes — the multi-objective shortlist a
    single weighted score flattens wrong. Dominance prune is vectorized:
    sort (spend desc, last desc), a point is dominated iff the exclusive
    prefix-max of `last` over strictly-higher-spend rows reaches it, or an
    equal-spend row has strictly later `last` (both via run masks +
    cumulative max — no pairwise loop). Local prunes are SAFE partial
    filters (dominated-in-batch ⇒ dominated-globally), so each batch sends
    only its own skyline candidates to one final merge task."""
    from datax_ray.functions.relational import partial_agg

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_custkey": t["o_custkey"],
                "cents": _cents(t["o_totalprice"]),
                "last_us": pc.cast(t["o_orderdate"], pa.int64()),
            }
        )

    per_cust = partial_agg(
        _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice", "o_orderdate"])
        .map_batches(prep, batch_format="pyarrow", zero_copy_batch=True),
        keys=["o_custkey"],
        sums={"cents": "spend_cents"},
        maxs={"last_us": "last_us"},
    )

    def prune(t: pa.Table) -> pa.Table:
        if t.num_rows <= 1:
            return t
        t = t.sort_by([("spend_cents", "descending"), ("last_us", "descending")])
        spend = t["spend_cents"].combine_chunks().to_numpy(zero_copy_only=False)
        last = t["last_us"].combine_chunks().to_numpy(zero_copy_only=False)
        n = len(spend)
        new_run = np.ones(n, dtype=bool)
        new_run[1:] = spend[1:] != spend[:-1]
        run_start = np.maximum.accumulate(np.where(new_run, np.arange(n), 0))
        # max last among rows with STRICTLY higher spend = prefix max up
        # to the start of this row's equal-spend run
        cmax = np.maximum.accumulate(last)
        strict_max = np.full(n, np.iinfo(np.int64).min, np.int64)
        nz = run_start > 0
        strict_max[nz] = cmax[run_start[nz] - 1]
        # equal-spend rows sort last-desc, so the run head holds the max
        run_max_last = last[run_start]
        dominated = (strict_max >= last) | (run_max_last > last)
        return t.filter(pa.array(~dominated))

    return (
        per_cust.map_batches(prune, batch_format="pyarrow")
        .repartition(1)
        .map_batches(prune, batch_format="pyarrow", batch_size=None)
        .map_batches(
            lambda t: t.select(["o_custkey", "spend_cents", "last_us"]),
            batch_format="pyarrow",
        )
    )


SKYLINE_SQL = """
WITH s AS (
  SELECT o_custkey,
         SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS spend_cents,
         MAX(epoch_us(o_orderdate)) AS last_us
  FROM orders GROUP BY 1
)
SELECT a.o_custkey, a.spend_cents, a.last_us
FROM s a
WHERE NOT EXISTS (
  SELECT 1 FROM s b
  WHERE (b.spend_cents >= a.spend_cents AND b.last_us > a.last_us)
     OR (b.spend_cents > a.spend_cents AND b.last_us >= a.last_us))
"""


def _textsource_fixture(sf_dir: str, fmt: str) -> str:
    """Deterministic CSV/JSONL copies of the events table (the DataX
    txtfilereader test corpus): written once per sf under /tmp, pipe
    delimiter (event payloads never contain '|'), microsecond timestamps,
    shortest-round-trip float repr so doubles survive the text loop
    bit-identically."""
    import json as _json

    out_dir = f"/tmp/datax_textsrc/{os.path.basename(os.path.normpath(sf_dir))}"
    path = os.path.join(out_dir, f"events.{fmt}")
    if os.path.exists(path):
        return path
    os.makedirs(out_dir, exist_ok=True)
    import pyarrow.parquet as pq

    df = pq.read_table(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "ts", "user_id", "event_type", "value"],
    ).to_pandas()
    tmp = f"{path}.tmp.{os.getpid()}"
    if fmt == "csv":
        df.to_csv(tmp, index=False, sep="|", date_format="%Y-%m-%d %H:%M:%S.%f")
    else:
        with open(tmp, "w") as f:
            for r in df.itertuples(index=False):
                f.write(
                    _json.dumps(
                        {
                            "event_id": int(r.event_id),
                            "ts": r.ts.strftime("%Y-%m-%d %H:%M:%S.%f"),
                            "user_id": int(r.user_id),
                            "event_type": r.event_type,
                            "value": float(r.value),
                        }
                    )
                    + "\n"
                )
    os.replace(tmp, path)
    return path


_EVENTS_TEXT_SPEC = [
    {"name": "event_id", "type": "long"},
    {"name": "ts", "type": "date"},
    {"name": "user_id", "type": "long"},
    {"name": "event_type", "type": "string"},
    {"name": "value", "type": "double"},
]

_EVENTS_TEXT_SQL = """
SELECT event_id, ts, user_id, event_type, value FROM events
"""


def csv_source_events(sf_dir: str):
    """DataX txtfilereader analog end to end: the events table serialized
    to pipe-delimited text, read back through the csv_source connector
    (sources/textsource.py — column spec, 6-type conversion matrix,
    dirty-record routing) and compared against the parquet original. The
    oracle is the original table itself, so every typed value — int64,
    microsecond timestamp, shortest-repr double — must survive the text
    round trip bit-identically."""
    from datax_ray.sources.textsource import csv_source

    path = _textsource_fixture(sf_dir, "csv")
    return csv_source(
        path,
        _EVENTS_TEXT_SPEC,
        delimiter="|",
        skip_header="event_id|ts|user_id|event_type|value",
    )


def jsonl_source_events(sf_dir: str):
    """JSON-lines twin of csv_source_events (same spec, same oracle)."""
    from datax_ray.sources.textsource import jsonl_source

    path = _textsource_fixture(sf_dir, "jsonl")
    return jsonl_source(path, _EVENTS_TEXT_SPEC)


def orc_source_events(sf_dir: str):
    """DataX hdfsreader/hdfswriter ORC mode end to end (SURVEY §2A rows
    2/7): a job-runner sync writes the events table as an atomically-
    committed ORC directory (two-phase manifest, content-hash parts), then
    the stripe-split ORC reader (sources/orcsource.py — one Ray task per
    stripe range, column projection pushed into the ORC layer, O(files)
    footer-only planning) streams it back. ORC's logical timestamp is
    nanoseconds; the connector casts back to the engine's canonical
    microsecond Date per the DataX type matrix. Oracle = the original
    parquet table, so every typed value must survive the ORC round trip."""
    from datax_ray.pipelines.job import run_job
    from datax_ray.sinks.datasink import AtomicDirDatasink
    from datax_ray.sources.orcsource import read_orc

    cols = ["event_id", "ts", "user_id", "event_type", "value"]
    out = f"/tmp/datax_orcsrc/{os.path.basename(os.path.normpath(sf_dir))}"
    if not os.path.exists(os.path.join(out, AtomicDirDatasink.MANIFEST)):
        run_job(
            {
                "job": {
                    "content": [
                        {
                            "reader": {
                                "name": "parquetreader",
                                "parameter": {
                                    "path": os.path.join(sf_dir, "events.parquet"),
                                    "column": cols,
                                },
                            },
                            "writer": {
                                "name": "orcwriter",
                                "parameter": {"path": out, "writeMode": "truncate"},
                            },
                        }
                    ]
                }
            }
        )
    import json as _json

    with open(os.path.join(out, AtomicDirDatasink.MANIFEST)) as f:
        paths = [os.path.join(out, r["file"]) for r in _json.load(f)["files"]]

    def us_ts(t: pa.Table) -> pa.Table:
        i = t.schema.get_field_index("ts")
        return t.set_column(i, "ts", pc.cast(t["ts"], pa.timestamp("us")))

    return read_orc(paths, columns=cols).map_batches(us_ts, batch_format="pyarrow")


def hll_daily_users(sf_dir: str, p: int = 9):
    """KEYED HyperLogLog: per-day distinct-user sketch registers — the
    windowed form of hll_registers_events that a daily-active-users
    dashboard folds (registers of different days union by max, so
    arbitrary date ranges combine WITHOUT re-scanning events; that union
    rule is what makes the sketch a lake artifact rather than a query).
    Register-level oracle: the (day, bucket, max_rho) table is
    deterministic under the fixed fmix32 chain, so DuckDB reproduces
    every cell. Scale shape: per-batch (day, bucket) MAX partials bound
    the shuffle at days x 2^p integer rows, never events."""
    from datax_ray.functions.relational import partial_agg

    m = np.uint64(1 << p)
    M32 = np.uint64(4294967296)
    top = 32 - p  # rho range: 1..top+1; all-zero tail scores top+1

    def partial(t: pa.Table) -> pa.Table:
        h = t["user_id"].to_numpy(zero_copy_only=False).astype(np.uint64) % M32
        h ^= h >> np.uint64(16)
        h = (h * np.uint64(2246822507)) % M32
        h ^= h >> np.uint64(13)
        h = (h * np.uint64(3266489909)) % M32
        h ^= h >> np.uint64(16)
        bucket = (h % m).astype(np.int64)
        w = (h // m).astype(np.int64)
        nbits = np.zeros(len(w), np.int64)
        nz = w > 0
        nbits[nz] = np.floor(np.log2(w[nz])).astype(np.int64) + 1
        rho = np.where(w == 0, top + 1, top + 1 - nbits)
        day = pc.multiply(
            pc.divide(pc.cast(t["ts"], pa.int64()), 86_400_000_000),
            86_400_000_000,
        )
        g = (
            pa.table(
                {
                    "day_us": day,
                    "bucket": pa.array(bucket, pa.int64()),
                    "rho": pa.array(rho, pa.int64()),
                }
            )
            .group_by(["day_us", "bucket"], use_threads=False)
            .aggregate([("rho", "max")])
            .rename_columns(["day_us", "bucket", "rho"])
        )
        return g

    return partial_agg(
        _read(sf_dir, "events", columns=["ts", "user_id"]).map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True
        ),
        keys=["day_us", "bucket"],
        maxs={"rho": "max_rho"},
    )


HLL_DAILY_SQL = """
WITH s0 AS (
  SELECT epoch_us(ts) // 86400000000 * 86400000000 AS day_us,
         user_id % 4294967296 AS h
  FROM events
), s1 AS (SELECT day_us, xor(h, h >> 16) AS h FROM s0),
s2 AS (SELECT day_us,
              CAST(CAST(h AS HUGEINT) * 2246822507 % 4294967296 AS BIGINT) AS h
       FROM s1),
s3 AS (SELECT day_us, xor(h, h >> 13) AS h FROM s2),
s4 AS (SELECT day_us,
              CAST(CAST(h AS HUGEINT) * 3266489909 % 4294967296 AS BIGINT) AS h
       FROM s3),
hv AS (SELECT day_us, xor(h, h >> 16) AS hv FROM s4),
r AS (
  SELECT day_us, hv % 512 AS bucket,
         CASE WHEN hv // 512 = 0 THEN 24
              ELSE 24 - length(format('{:b}', hv // 512)) END AS rho
  FROM hv
)
SELECT day_us, CAST(bucket AS BIGINT) AS bucket, CAST(MAX(rho) AS BIGINT) AS max_rho
FROM r GROUP BY day_us, bucket
"""


def cdc_hll_conv_mv(sf_dir: str):
    """Incremental HLL sketch MV over the CDC lake (pipelines/sketchmv.py):
    derive the standard change log, replay it, refresh the per-range
    register artifacts (manifest-fingerprint skip — untouched ranges cost
    zero storage reads), and fold them by register MAX. Registers derive
    from each range's LIVE merge-read state, so LWW losers / deletes can
    never inflate the sketch — the oracle computes the identical fmix32
    registers over the LWW-final conversations (cell-level verification,
    like hll_registers_events)."""
    from datax_ray.pipelines.replay import ReplayConfig, replay
    from datax_ray.pipelines.sketchmv import read_sketch, refresh_sketch

    work = f"/tmp/datax_cdc_hllmv/{os.path.basename(os.path.normpath(sf_dir))}"
    spe = _derive_changes(sf_dir, work)
    replay(
        ReplayConfig(
            changes_dir=f"{work}/changes",
            lake_dir=f"{work}/lake",
            num_partitions=16,
            segments_per_epoch=spe,
        )
    )
    refresh_sketch(f"{work}/lake", f"{work}/sketch")
    return read_sketch(f"{work}/sketch")


CDC_HLL_MV_SQL = """
WITH c AS (
  SELECT event_id AS lsn, ts,
         CASE WHEN event_id % 10 = 0 THEN 'delete'
              WHEN event_id % 2 = 0 THEN 'insert' ELSE 'update' END AS op,
         'conv-' || CAST(user_id AS VARCHAR) AS conv_id,
         CAST(event_id % 25 AS INTEGER) AS turn_idx
  FROM events
), w AS (
  SELECT *, row_number() OVER (PARTITION BY conv_id, turn_idx
                               ORDER BY ts DESC, lsn DESC) AS rn
  FROM c
), live AS (
  SELECT DISTINCT CAST(substr(conv_id, 6) AS BIGINT) % 4294967296 AS h
  FROM w WHERE rn = 1 AND op <> 'delete'
), s1 AS (SELECT xor(h, h >> 16) AS h FROM live),
s2 AS (SELECT CAST(CAST(h AS HUGEINT) * 2246822507 % 4294967296 AS BIGINT) AS h FROM s1),
s3 AS (SELECT xor(h, h >> 13) AS h FROM s2),
s4 AS (SELECT CAST(CAST(h AS HUGEINT) * 3266489909 % 4294967296 AS BIGINT) AS h FROM s3),
hv AS (SELECT xor(h, h >> 16) AS hv FROM s4),
r AS (
  SELECT hv % 512 AS bucket,
         CASE WHEN hv // 512 = 0 THEN 24
              ELSE 24 - length(format('{:b}', hv // 512)) END AS rho
  FROM hv
)
SELECT CAST(bucket AS BIGINT) AS bucket, CAST(MAX(rho) AS BIGINT) AS max_rho
FROM r GROUP BY bucket
"""


def _fmix32_np(vals: np.ndarray) -> np.ndarray:
    """The house fmix32 avalanche chain (same constants as the CMS sketch /
    weighted-sample oracles) vectorized over a uint64 array already reduced
    mod 2^32. Deterministic and DuckDB-reproducible in HUGEINT."""
    M32 = np.uint64(4294967296)
    h = vals % M32
    with np.errstate(over="ignore"):
        h ^= h >> np.uint64(16)
        h = (h * np.uint64(2246822507)) % M32
        h ^= h >> np.uint64(13)
        h = (h * np.uint64(3266489909)) % M32
        h ^= h >> np.uint64(16)
    return h


def kmv_distinct_users(sf_dir: str, k: int = 64):
    """KMV (k-minimum-values) distinct-count sketch over events.user_id —
    the fifth sketch family member next to HLL / Misra-Gries / Count-Min /
    quantile. Each batch contributes its k smallest DISTINCT fmix32 hashes
    (a safe partial: the global k smallest are a subset of the union of
    per-batch k smallest), so at most k rows per batch reach the one final
    fold — the corpus never shuffles. The estimate (k-1)*2^32 // h_k is
    pure integer arithmetic on the fixed hash chain, so the oracle verifies
    every kept hash AND the estimate bit-for-bit; when fewer than k
    distinct hashes exist the sketch IS the exact distinct set."""

    def kpartial(t: pa.Table) -> pa.Table:
        u = np.unique(t["user_id"].to_numpy(zero_copy_only=False).astype(np.uint64))
        h = np.unique(_fmix32_np(u))[:k]
        return pa.table({"h": pa.array(h.astype(np.int64), pa.int64())})

    def final(t: pa.Table) -> pa.Table:
        h = np.unique(t["h"].to_numpy(zero_copy_only=False))[:k]
        n = len(h)
        est = int(n) if n < k else (k - 1) * 4294967296 // int(h[-1])
        return pa.table(
            {
                "rank": pa.array(np.arange(1, n + 1, dtype=np.int64)),
                "h": pa.array(h, pa.int64()),
                "est_distinct": pa.array(np.full(n, est, dtype=np.int64)),
            }
        )

    return (
        _read(sf_dir, "events", columns=["user_id"])
        .map_batches(kpartial, batch_format="pyarrow", zero_copy_batch=True)
        .repartition(1)
        .map_batches(final, batch_format="pyarrow", batch_size=None)
    )


KMV_SQL = """
WITH u AS (SELECT DISTINCT user_id % 4294967296 AS h FROM events),
s1 AS (SELECT xor(h, h >> 16) AS h FROM u),
s2 AS (SELECT CAST(CAST(h AS HUGEINT) * 2246822507 % 4294967296 AS BIGINT) AS h FROM s1),
s3 AS (SELECT xor(h, h >> 13) AS h FROM s2),
s4 AS (SELECT CAST(CAST(h AS HUGEINT) * 3266489909 % 4294967296 AS BIGINT) AS h FROM s3),
hv AS (SELECT DISTINCT xor(h, h >> 16) AS h FROM s4),
k AS (SELECT h, row_number() OVER (ORDER BY h) AS rank FROM hv ORDER BY h LIMIT 64),
s AS (SELECT COUNT(*) AS n, MAX(h) AS hk FROM k)
SELECT k.rank, k.h,
       CAST(CASE WHEN s.n < 64 THEN s.n
                 ELSE 63 * 4294967296 // s.hk END AS BIGINT) AS est_distinct
FROM k, s
"""


def user_first_last_event(sf_dir: str):
    """Per-user first and last event type under (ts, event_id) order plus
    the event count — the entry/exit-point profile (FIRST_VALUE/LAST_VALUE
    window semantics). One user-hash exchange; each bucket sorts once and
    reads run heads/tails with a vectorized boundary mask — no per-user
    Python, many users per bucket."""
    from datax_ray.functions.relational import key_buckets

    num_buckets = _buckets_for(sf_dir, "events")

    def bucket(t: pa.Table) -> pa.Table:
        return t.append_column("_grp", key_buckets(t, ["user_id"], num_buckets))

    def fold(t: pa.Table) -> pa.Table:
        t = t.sort_by(
            [("user_id", "ascending"), ("ts", "ascending"), ("event_id", "ascending")]
        )
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        n = len(uid)
        new_run = np.ones(n, dtype=bool)
        new_run[1:] = uid[1:] != uid[:-1]
        starts = np.flatnonzero(new_run)
        ends = np.r_[starts[1:], n] - 1
        et = t["event_type"]
        return pa.table(
            {
                "user_id": t["user_id"].take(pa.array(starts)),
                "first_type": et.take(pa.array(starts)),
                "last_type": et.take(pa.array(ends)),
                "n_events": pa.array(np.diff(np.r_[starts, n]).astype(np.int64)),
            }
        )

    return (
        _read(sf_dir, "events", columns=["event_id", "ts", "user_id", "event_type"])
        .map_batches(bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_grp")
        .map_groups(lambda t: fold(t.drop_columns(["_grp"])), batch_format="pyarrow")
    )


FIRST_LAST_SQL = """
WITH w AS (
  SELECT user_id,
         FIRST_VALUE(event_type) OVER (PARTITION BY user_id
             ORDER BY ts, event_id) AS first_type,
         LAST_VALUE(event_type) OVER (PARTITION BY user_id
             ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_type
  FROM events
)
SELECT user_id, MIN(first_type) AS first_type, MIN(last_type) AS last_type,
       COUNT(*) AS n_events
FROM w GROUP BY user_id
"""


def late_events_audit(sf_dir: str):
    """Out-of-order-arrival audit — the CDC operational metric: per user,
    how many events ARRIVED (event_id order = log order) with an event time
    older than the running maximum already seen, and the worst lateness in
    microseconds. This is what sizes a watermark/grace window before
    anyone trusts event-time aggregates. One user-hash exchange; the
    running max is a segmented cummax (vectorized, run boundaries masked),
    late counts fold per run with add/maximum.reduceat."""
    from datax_ray.functions.relational import key_buckets

    num_buckets = _buckets_for(sf_dir, "events")

    def bucket(t: pa.Table) -> pa.Table:
        return t.append_column("_grp", key_buckets(t, ["user_id"], num_buckets))

    def fold(t: pa.Table) -> pa.Table:
        t = t.sort_by([("user_id", "ascending"), ("event_id", "ascending")])
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        ts = pc.cast(t["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        n = len(uid)
        new_run = np.ones(n, dtype=bool)
        new_run[1:] = uid[1:] != uid[:-1]
        starts = np.flatnonzero(new_run)
        # segmented inclusive cummax (pandas C kernel), shifted one row so
        # each event compares against the max of STRICTLY EARLIER arrivals
        cm = pd.Series(ts).groupby(np.cumsum(new_run)).cummax().to_numpy()
        prev = np.empty(n, dtype=np.int64)
        prev[1:] = cm[:-1]
        late = (~new_run) & (ts < prev)
        amt = np.where(late, prev - ts, 0)
        return pa.table(
            {
                "user_id": t["user_id"].take(pa.array(starts)),
                "n_late": pa.array(
                    np.add.reduceat(late.astype(np.int64), starts), pa.int64()
                ),
                "max_late_us": pa.array(np.maximum.reduceat(amt, starts), pa.int64()),
            }
        )

    return (
        _read(sf_dir, "events", columns=["event_id", "ts", "user_id"])
        .map_batches(bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_grp")
        .map_groups(lambda t: fold(t.drop_columns(["_grp"])), batch_format="pyarrow")
    )


LATE_EVENTS_SQL = """
WITH w AS (
  SELECT user_id, ts,
         MAX(ts) OVER (PARTITION BY user_id ORDER BY event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max
  FROM events
)
SELECT user_id,
       COUNT(*) FILTER (WHERE ts < prev_max) AS n_late,
       COALESCE(MAX(CASE WHEN ts < prev_max
                         THEN epoch_us(prev_max) - epoch_us(ts) END), 0) AS max_late_us
FROM w GROUP BY user_id
"""


def gini_event_mix_users(sf_dir: str):
    """Per-user categorical diversity of event types as a Gini impurity in
    integer basis points: 10000 - (10000 * Σc_i²) // n² — the
    concentration profile a curation pipeline uses to spot one-note
    sources/users (entropy needs logs; Gini stays integer-exact, so the
    oracle hashes bit-for-bit; exact up to ~3e7 events per user before the
    int64 cross term would saturate — use the HUGEINT path beyond). Two
    combiner passes: (user, type) counts, then per-user Σc / Σc² — the
    shuffle is bounded by distinct pairs, never events."""
    counts = partial_agg(
        _read(sf_dir, "events", columns=["user_id", "event_type"]),
        keys=["user_id", "event_type"],
        counts="c",
    )

    def square(t: pa.Table) -> pa.Table:
        c = t["c"].to_numpy(zero_copy_only=False)
        return pa.table(
            {"user_id": t["user_id"], "c": t["c"],
             "c2": pa.array(c * c, pa.int64())}
        )

    per_user = partial_agg(
        counts.map_batches(square, batch_format="pyarrow"),
        keys=["user_id"],
        sums={"c": "n_events", "c2": "ss"},
    )

    def gini(t: pa.Table) -> pa.Table:
        n = t["n_events"].to_numpy(zero_copy_only=False)
        ss = t["ss"].to_numpy(zero_copy_only=False)
        bp = 10000 - (10000 * ss) // (n * n)
        return pa.table(
            {
                "user_id": t["user_id"],
                "n_events": t["n_events"],
                "gini_bp": pa.array(bp, pa.int64()),
            }
        )

    return per_user.map_batches(gini, batch_format="pyarrow")


GINI_SQL = """
WITH c AS (
  SELECT user_id, event_type, COUNT(*) AS c FROM events GROUP BY 1, 2
), u AS (
  SELECT user_id, SUM(c) AS n, SUM(c * c) AS ss FROM c GROUP BY 1
)
SELECT user_id, CAST(n AS BIGINT) AS n_events,
       CAST(10000 - (10000 * ss) // (n * n) AS BIGINT) AS gini_bp
FROM u
"""


def winsorize_order_prices(sf_dir: str):
    """Winsorization — clamp each order's price into its OWN status group's
    [p05, p95] band (the outlier treatment that keeps rows instead of
    deleting them, robust where a global clip drags small groups). Exact
    per-group cutoffs fold from ONE (status, cents) histogram combiner
    (shuffle bounded by the value grid, never rows; quantile_disc index
    rule shared with the oracle), then the O(groups) cutoffs broadcast
    into a stateless clamp map — no join, no second shuffle."""
    from datax_ray.functions.relational import partial_agg

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {"o_orderstatus": t["o_orderstatus"], "cents": _cents(t["o_totalprice"])}
        )

    hist = partial_agg(
        _read(sf_dir, "orders", columns=["o_orderstatus", "o_totalprice"])
        .map_batches(prep, batch_format="pyarrow", zero_copy_batch=True),
        keys=["o_orderstatus", "cents"],
        counts="n",
        single_reduce=True,
    )

    def fold(t: pa.Table) -> pa.Table:
        t = t.sort_by([("o_orderstatus", "ascending"), ("cents", "ascending")])
        st = t["o_orderstatus"].to_numpy(zero_copy_only=False)
        val = t["cents"].to_numpy(zero_copy_only=False)
        cnt = t["n"].to_numpy(zero_copy_only=False)
        new_run = np.ones(len(st), dtype=bool)
        new_run[1:] = st[1:] != st[:-1]
        starts = np.flatnonzero(new_run)
        out_st, out_lo, out_hi = [], [], []
        for i, s in enumerate(starts):
            e = starts[i + 1] if i + 1 < len(starts) else len(st)
            cum = np.cumsum(cnt[s:e])
            n = int(cum[-1])
            lo_i = max(0, int(np.ceil(0.05 * n)) - 1)
            hi_i = max(0, int(np.ceil(0.95 * n)) - 1)
            out_st.append(st[s])
            out_lo.append(int(val[s:e][np.searchsorted(cum, lo_i + 1)]))
            out_hi.append(int(val[s:e][np.searchsorted(cum, hi_i + 1)]))
        return pa.table(
            {
                "o_orderstatus": pa.array(out_st, pa.string()),
                "lo": pa.array(out_lo, pa.int64()),
                "hi": pa.array(out_hi, pa.int64()),
            }
        )

    cuts = hist.map_batches(fold, batch_format="pyarrow", batch_size=None).take_all()
    band = {r["o_orderstatus"]: (r["lo"], r["hi"]) for r in cuts}  # O(groups)

    def clamp(t: pa.Table) -> pa.Table:
        st = pd.Series(t["o_orderstatus"].to_numpy(zero_copy_only=False))
        lo = st.map({k: v[0] for k, v in band.items()}).to_numpy(dtype=np.int64)
        hi = st.map({k: v[1] for k, v in band.items()}).to_numpy(dtype=np.int64)
        cents = _cents(t["o_totalprice"]).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "o_orderkey": t["o_orderkey"],
                "o_orderstatus": t["o_orderstatus"],
                "clamped_cents": pa.array(np.clip(cents, lo, hi), pa.int64()),
            }
        )

    return _read(
        sf_dir, "orders", columns=["o_orderkey", "o_orderstatus", "o_totalprice"]
    ).map_batches(clamp, batch_format="pyarrow", zero_copy_batch=True)


WINSORIZE_SQL = """
WITH cut AS (
  SELECT o_orderstatus,
         quantile_disc(CAST(ROUND(o_totalprice * 100) AS BIGINT), 0.05) AS lo,
         quantile_disc(CAST(ROUND(o_totalprice * 100) AS BIGINT), 0.95) AS hi
  FROM orders GROUP BY o_orderstatus
)
SELECT o.o_orderkey, o.o_orderstatus,
       LEAST(GREATEST(CAST(ROUND(o.o_totalprice * 100) AS BIGINT), cut.lo),
             cut.hi) AS clamped_cents
FROM orders o JOIN cut USING (o_orderstatus)
"""


def dod_retention_users(sf_dir: str):
    """Day-over-day retention: per calendar day, how many distinct users
    were active AND came back the next day — the operational retention
    curve (distinct from the cohort matrix, which anchors on first touch).
    Distinct (user, day) pairs via the per-batch combiner, ONE user-hash
    exchange (all of a user's days co-locate), a sorted shifted-compare
    marks next-day returns, then per-day partials fold in one tiny task —
    the shuffle is bounded by distinct pairs, never events."""
    from datax_ray.functions.relational import key_buckets, partial_agg

    num_buckets = _buckets_for(sf_dir, "events")
    DAY = 86_400_000_000

    def pairs(t: pa.Table) -> pa.Table:
        day = pc.cast(t["ts"], pa.int64()).to_numpy(zero_copy_only=False) // DAY
        tb = pa.table({"user_id": t["user_id"], "day": pa.array(day, pa.int64())})
        tb = tb.group_by(["user_id", "day"], use_threads=False).aggregate([])
        return tb.append_column("_grp", key_buckets(tb, ["user_id"], num_buckets))

    def fold(t: pa.Table) -> pa.Table:
        t = t.drop_columns(["_grp"]).group_by(
            ["user_id", "day"], use_threads=False
        ).aggregate([])
        t = t.sort_by([("user_id", "ascending"), ("day", "ascending")])
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        day = t["day"].to_numpy(zero_copy_only=False)
        n = len(uid)
        ret = np.zeros(n, dtype=np.int64)
        if n > 1:
            ret[:-1] = (uid[1:] == uid[:-1]) & (day[1:] - day[:-1] == 1)
        cells = pa.table(
            {
                "day": t["day"],
                "act": pa.array(np.ones(n, dtype=np.int64)),
                "ret": pa.array(ret),
            }
        )
        g = cells.group_by(["day"], use_threads=False).aggregate(
            [("act", "sum"), ("ret", "sum")]
        )
        return g.rename_columns(["day", "act", "ret"])

    partials = (
        _read(sf_dir, "events", columns=["ts", "user_id"])
        .map_batches(pairs, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_grp")
        .map_groups(fold, batch_format="pyarrow")
    )
    return partial_agg(
        partials,
        keys=["day"],
        sums={"act": "n_active", "ret": "n_retained_next"},
        single_reduce=True,  # O(days) cells
    )


DOD_RETENTION_SQL = """
WITH act AS (
  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day FROM events
)
SELECT a.day, COUNT(*) AS n_active, COUNT(b.user_id) AS n_retained_next
FROM act a LEFT JOIN act b ON b.user_id = a.user_id AND b.day = a.day + 1
GROUP BY a.day
"""


def scd2_asof_snapshot(sf_dir: str):
    """Temporal AS-OF-TIMESTAMP snapshot reconstructed from the SCD2
    version history: the state of every (conv_id, turn_idx) key at probe
    time T = midpoint of the event-time range — the warehouse pattern for
    'what did the dimension look like at T' without replaying the log.
    Keys whose version at T was a delete return nothing (the delete closes
    its predecessor's interval and carries no row itself). Two passes:
    an O(1) min/max ts fold picks T, then the interval filter
    valid_from <= T < valid_to runs inside the SCD2 assembly's buckets —
    no extra exchange beyond the history build itself."""
    from datax_ray.functions.ordered import scd2_history
    from datax_ray.sources.derive import derive_changes

    ts_ds = _read(sf_dir, "events", columns=["ts"])

    def mm(t: pa.Table) -> pa.Table:
        v = pc.cast(t["ts"], pa.int64())
        return pa.table(
            {"lo": pa.array([pc.min(v).as_py()], pa.int64()),
             "hi": pa.array([pc.max(v).as_py()], pa.int64())}
        )

    bounds = (
        ts_ds.map_batches(mm, batch_format="pyarrow", zero_copy_batch=True)
        .repartition(1)
        .map_batches(
            lambda t: pa.table(
                {"lo": pa.array([pc.min(t["lo"]).as_py()], pa.int64()),
                 "hi": pa.array([pc.max(t["hi"]).as_py()], pa.int64())}
            ),
            batch_format="pyarrow",
            batch_size=None,
        )
        .take_all()[0]
    )  # O(1) driver rows
    t_us = (int(bounds["lo"]) + int(bounds["hi"])) // 2

    changes = _read(sf_dir, "events", columns=["event_id", "ts", "user_id"]).map_batches(
        derive_changes, batch_format="pyarrow", zero_copy_batch=True
    )
    hist = scd2_history(changes, num_buckets=_buckets_for(sf_dir, "events"))

    def asof(t: pa.Table) -> pa.Table:
        vf = pc.cast(t["valid_from"], pa.int64())
        vt = pc.cast(t["valid_to"], pa.int64())
        keep = pc.and_kleene(
            pc.less_equal(vf, t_us),
            pc.coalesce(pc.greater(vt, t_us), pa.scalar(True)),
        )
        t = t.filter(pc.fill_null(keep, False))
        return pa.table(
            {
                "conv_id": t["conv_id"],
                "turn_idx": pc.cast(t["turn_idx"], pa.int32()),
                "version": pc.cast(t["version"], pa.int64()),
                "role": t["role"],
                "text": t["text"],
            }
        )

    return hist.map_batches(asof, batch_format="pyarrow")


SCD2_ASOF_SQL = """
WITH c AS (
  SELECT event_id AS lsn, ts,
         CASE WHEN event_id % 10 = 0 THEN 'delete'
              WHEN event_id % 2 = 0 THEN 'insert' ELSE 'update' END AS op,
         'conv-' || CAST(user_id AS VARCHAR) AS conv_id,
         CAST(event_id % 25 AS INTEGER) AS turn_idx,
         CASE WHEN event_id % 10 = 0 THEN NULL
              WHEN event_id % 2 = 0 THEN 'user' ELSE 'assistant' END AS role,
         CASE WHEN event_id % 10 = 0 THEN NULL
              ELSE 'payload-' || CAST(event_id AS VARCHAR) END AS text
  FROM events
), w AS (
  SELECT *, CAST(row_number() OVER k AS BIGINT) AS version,
         lead(ts) OVER k AS valid_to
  FROM c WINDOW k AS (PARTITION BY conv_id, turn_idx ORDER BY ts, lsn)
), b AS (
  SELECT (epoch_us(MIN(ts)) + epoch_us(MAX(ts))) // 2 AS t FROM events
)
SELECT conv_id, turn_idx, version, role, text
FROM w, b
WHERE op <> 'delete' AND epoch_us(ts) <= b.t
  AND (valid_to IS NULL OR epoch_us(valid_to) > b.t)
"""


def conversion_within_window(sf_dir: str):
    """Time-bounded conversion: for every user who clicked, did a purchase
    land within ONE HOUR after their FIRST click — the attribution-window
    semantics an unbounded funnel gets wrong (a purchase next week is not
    a conversion). One user-hash exchange; each bucket sorts once and
    computes, per user run, the min click ts and the min purchase ts
    inside (click, click+1h] with two reduceat passes — no join, no
    per-user Python."""
    from datax_ray.functions.relational import key_buckets

    num_buckets = _buckets_for(sf_dir, "events")
    HOUR = 3_600_000_000

    def bucket(t: pa.Table) -> pa.Table:
        keep = pc.is_in(t["event_type"], value_set=pa.array(["click", "purchase"]))
        t = t.filter(keep)
        tb = pa.table(
            {
                "user_id": t["user_id"],
                "ts_us": pc.cast(t["ts"], pa.int64()),
                "is_click": pc.equal(t["event_type"], "click"),
            }
        )
        return tb.append_column("_grp", key_buckets(tb, ["user_id"], num_buckets))

    def fold(t: pa.Table) -> pa.Table:
        t = t.drop_columns(["_grp"]).sort_by(
            [("user_id", "ascending"), ("ts_us", "ascending")]
        )
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        ts = t["ts_us"].to_numpy(zero_copy_only=False)
        clk = t["is_click"].to_numpy(zero_copy_only=False)
        n = len(uid)
        if n == 0:
            return pa.table(
                {
                    "user_id": pa.array([], pa.int64()),
                    "click_us": pa.array([], pa.int64()),
                    "purchase_us": pa.array([], pa.int64()),
                }
            )
        new_run = np.ones(n, dtype=bool)
        new_run[1:] = uid[1:] != uid[:-1]
        starts = np.flatnonzero(new_run)
        BIG = np.iinfo(np.int64).max
        # min click ts per run (BIG where the run has no click)
        first_click = np.minimum.reduceat(np.where(clk, ts, BIG), starts)
        has_click = first_click != BIG
        # min purchase ts inside (click, click+1h] per run: broadcast each
        # run's click back to its rows, mask, reduce again
        run_id = np.cumsum(new_run) - 1
        click_of_row = first_click[run_id]
        in_win = (~clk) & (ts > click_of_row) & (ts <= click_of_row + HOUR)
        purch = np.minimum.reduceat(np.where(in_win, ts, BIG), starts)
        out_uid = uid[starts][has_click]
        out_click = first_click[has_click]
        out_purch = purch[has_click].astype(object)
        out_purch[purch[has_click] == BIG] = None
        return pa.table(
            {
                "user_id": pa.array(out_uid, pa.int64()),
                "click_us": pa.array(out_click, pa.int64()),
                "purchase_us": pa.array(list(out_purch), pa.int64()),
            }
        )

    return (
        _read(sf_dir, "events", columns=["ts", "user_id", "event_type"])
        .map_batches(bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_grp")
        .map_groups(fold, batch_format="pyarrow")
    )


CONVERSION_WINDOW_SQL = """
WITH c AS (
  SELECT user_id, MIN(ts) AS click FROM events
  WHERE event_type = 'click' GROUP BY user_id
), p AS (
  SELECT e.user_id, MIN(e.ts) AS purch
  FROM events e JOIN c ON c.user_id = e.user_id
  WHERE e.event_type = 'purchase'
    AND e.ts > c.click AND e.ts <= c.click + INTERVAL 1 HOUR
  GROUP BY e.user_id
)
SELECT c.user_id, epoch_us(c.click) AS click_us, epoch_us(p.purch) AS purchase_us
FROM c LEFT JOIN p USING (user_id)
"""


def cdc_conv_context_pairs(sf_dir: str, k: int = 3):
    """Training-example extraction over the LWW-final transcript state:
    for every surviving turn with at least one surviving predecessor in
    its conversation, emit (conv_id, turn_idx, context, target) where
    `context` joins the texts of the up-to-k immediately PRECEDING
    surviving turns in turn order — the sliding context-window export a
    chat-model data pipeline runs right after CDC maintenance. Scale
    shape = cdc_conv_transcript: combiner LWW pre-reduce, ONE conv-hash
    bucket exchange; inside a bucket the OVERLAPPING windows are built
    vectorized — per-row window spans from a run-start prefix-max, one
    np.repeat+arange gather, one run-offset ListArray, one
    pc.binary_join. No per-conv or per-window Python."""
    from datax_ray.functions.relational import key_buckets
    from datax_ray.sources.derive import derive_changes

    KEYS = ("conv_id", "turn_idx")
    ORDER = ("ts", "lsn")
    num_buckets = _buckets_for(sf_dir, "events")

    changes = _read(
        sf_dir, "events", columns=["event_id", "ts", "user_id"]
    ).map_batches(derive_changes, batch_format="pyarrow", zero_copy_batch=True)

    def combiner(t: pa.Table) -> pa.Table:
        t = t.drop_columns(["ddl"]).append_column(
            "_grp", key_buckets(t, ["conv_id"], num_buckets)
        )
        return lww_reduce(t, key_cols=KEYS, order_cols=ORDER)

    _OUT = pa.schema(
        [
            ("conv_id", pa.string()),
            ("turn_idx", pa.int32()),
            ("context", pa.string()),
            ("target", pa.string()),
        ]
    )

    def per_bucket(g: pa.Table) -> pa.Table:
        w = lww_reduce(g, key_cols=KEYS, order_cols=ORDER)
        w = w.filter(pc.not_equal(w["op"], "delete"))
        if w.num_rows == 0:
            return _OUT.empty_table()
        w = w.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
        n = w.num_rows
        conv = w["conv_id"].combine_chunks()
        cv = conv.to_numpy(zero_copy_only=False)
        starts = np.concatenate(([True], cv[1:] != cv[:-1]))
        run_start = np.maximum.accumulate(np.where(starts, np.arange(n), 0))
        i = np.arange(n)
        lo = np.maximum(run_start, i - k)
        lens = i - lo  # 0 for a conversation's first surviving turn
        keep = lens > 0
        if not keep.any():
            return _OUT.empty_table()
        lo_k, lens_k = lo[keep], lens[keep]
        total = int(lens_k.sum())
        startcum = np.concatenate(([0], np.cumsum(lens_k)[:-1]))
        intra = np.arange(total) - np.repeat(startcum, lens_k)
        gather = np.repeat(lo_k, lens_k) + intra
        texts = pc.fill_null(w["text"].combine_chunks(), "")
        offsets = np.concatenate(([0], np.cumsum(lens_k))).astype(np.int32)
        lists = pa.ListArray.from_arrays(
            pa.array(offsets, pa.int32()), texts.take(pa.array(gather))
        )
        keep_idx = pa.array(i[keep])
        return pa.table(
            {
                "conv_id": conv.take(keep_idx),
                "turn_idx": w["turn_idx"].combine_chunks().take(keep_idx),
                "context": pc.binary_join(lists, " "),
                "target": texts.take(keep_idx),
            }
        )

    return (
        changes.map_batches(combiner, batch_format="pyarrow")
        .groupby("_grp")
        .map_groups(per_bucket, batch_format="pyarrow")
    )


CDC_CONV_CONTEXT_PAIRS_SQL = """
WITH c AS (
  SELECT event_id AS lsn, ts,
         CASE WHEN event_id % 10 = 0 THEN 'delete'
              WHEN event_id % 2 = 0 THEN 'insert' ELSE 'update' END AS op,
         'conv-' || CAST(user_id AS VARCHAR) AS conv_id,
         CAST(event_id % 25 AS INTEGER) AS turn_idx,
         CASE WHEN event_id % 10 = 0 THEN NULL
              ELSE 'payload-' || CAST(event_id AS VARCHAR) END AS text
  FROM events
), w AS (
  SELECT *, row_number() OVER (PARTITION BY conv_id, turn_idx
                               ORDER BY ts DESC, lsn DESC) AS rn
  FROM c
), f AS (
  SELECT conv_id, turn_idx, text FROM w WHERE rn = 1 AND op <> 'delete'
)
SELECT conv_id, turn_idx,
       string_agg(text, ' ') OVER (
         PARTITION BY conv_id ORDER BY turn_idx
         ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING) AS context,
       text AS target
FROM f
QUALIFY context IS NOT NULL
"""


_US_60D = 60 * 86400 * 1_000_000  # late-shipment threshold in µs


def orders_exists_late_ship(sf_dir: str):
    """TPC-H Q4 shape (EXISTS with a cross-table correlated predicate):
    orders per priority where ANY line shipped > 60 days after the order
    date. EXISTS(any late line) == max(l_shipdate) late, and max is a
    safe partial — so the lineitem stream collapses to one
    (orderkey, max_ship) cell per key via the combiner BEFORE the single
    orderkey-hash co-group exchange with orders; per bucket the compare
    is one searchsorted attach, and only O(priorities) cells leave."""
    from datax_ray.functions.relational import key_buckets

    num_buckets = _buckets_for(sf_dir, "lineitem")

    max_ship = partial_agg(
        _read(sf_dir, "lineitem", columns=["l_orderkey", "l_shipdate"]).map_batches(
            lambda t: pa.table(
                {
                    "orderkey": t["l_orderkey"],
                    "ship_us": pc.cast(t["l_shipdate"], pa.int64()),
                }
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ),
        keys=["orderkey"],
        maxs={"ship_us": "max_ship_us"},
        num_buckets=num_buckets,
    )

    orders = _read(
        sf_dir, "orders", columns=["o_orderkey", "o_orderdate", "o_orderpriority"]
    )

    def tag_orders(t: pa.Table) -> pa.Table:
        g = pa.table(
            {
                "orderkey": t["o_orderkey"],
                "max_ship_us": pa.nulls(t.num_rows, pa.int64()),
                "order_us": pc.cast(t["o_orderdate"], pa.int64()),
                "priority": t["o_orderpriority"],
            }
        )
        return g.append_column("_grp", key_buckets(g, ["orderkey"], num_buckets))

    def tag_ship(t: pa.Table) -> pa.Table:
        g = pa.table(
            {
                "orderkey": t["orderkey"],
                "max_ship_us": t["max_ship_us"],
                "order_us": pa.nulls(t.num_rows, pa.int64()),
                "priority": pa.nulls(t.num_rows, pa.string()),
            }
        )
        return g.append_column("_grp", key_buckets(g, ["orderkey"], num_buckets))

    _CELL = pa.schema([("o_orderpriority", pa.string()), ("n_orders", pa.int64())])

    def per_bucket(g: pa.Table) -> pa.Table:
        is_ship = pc.is_valid(g["max_ship_us"])
        s, o = g.filter(is_ship), g.filter(pc.invert(is_ship))
        if s.num_rows == 0 or o.num_rows == 0:
            return _CELL.empty_table()
        sk = s["orderkey"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.argsort(sk)
        ok = o["orderkey"].combine_chunks().to_numpy(zero_copy_only=False)
        pos = np.searchsorted(sk[order], ok)
        pos_c = np.minimum(pos, len(sk) - 1)
        hit = sk[order][pos_c] == ok
        ship = s["max_ship_us"].combine_chunks().to_numpy(zero_copy_only=False)
        odate = o["order_us"].combine_chunks().to_numpy(zero_copy_only=False)
        late = hit & (ship[order][pos_c] > odate + _US_60D)
        kept = o.filter(pa.array(late))
        return (
            pa.table({"o_orderpriority": kept["priority"]})
            .group_by(["o_orderpriority"], use_threads=False)
            .aggregate([([], "count_all")])
            .rename_columns(["o_orderpriority", "n_orders"])
        )

    return partial_agg(
        max_ship.map_batches(tag_ship, batch_format="pyarrow")
        .union(orders.map_batches(tag_orders, batch_format="pyarrow",
                                  zero_copy_batch=True))
        .groupby("_grp")
        .map_groups(per_bucket, batch_format="pyarrow"),
        keys=["o_orderpriority"],
        sums={"n_orders": "n_orders"},
        single_reduce=True,  # O(priorities) cells
    )


ORDERS_EXISTS_LATE_SHIP_SQL = """
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders
FROM orders
WHERE EXISTS (
  SELECT 1 FROM lineitem
  WHERE l_orderkey = o_orderkey
    AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
GROUP BY o_orderpriority
"""


def suppliers_blamed_alone(sf_dir: str, k: int = 10):
    """TPC-H Q21 shape (semi + anti self-join on the same relation):
    suppliers who were the ONLY late shipper on a multi-supplier order —
    'late' = that supplier's last line shipped > 60 days after the order
    date. Plan: the lineitem stream collapses to (orderkey, suppkey,
    max_ship) cells via the combiner (max is a safe partial); ONE
    orderkey-hash co-group attaches the order date and evaluates both
    the EXISTS (>=2 suppliers) and NOT EXISTS (no other late supplier)
    predicates inside the bucket with run-length numpy over the sorted
    pairs; only blamed (suppkey) rows leave, folded to O(suppliers)
    cells and a deterministic top-k."""
    from datax_ray.functions.relational import key_buckets

    num_buckets = _buckets_for(sf_dir, "lineitem")

    pair_ship = partial_agg(
        _read(
            sf_dir, "lineitem", columns=["l_orderkey", "l_suppkey", "l_shipdate"]
        ).map_batches(
            lambda t: pa.table(
                {
                    "orderkey": t["l_orderkey"],
                    "suppkey": t["l_suppkey"],
                    "ship_us": pc.cast(t["l_shipdate"], pa.int64()),
                }
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ),
        keys=["orderkey", "suppkey"],
        maxs={"ship_us": "max_ship_us"},
        num_buckets=num_buckets,
    )

    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_orderdate"])

    def tag_orders(t: pa.Table) -> pa.Table:
        g = pa.table(
            {
                "orderkey": t["o_orderkey"],
                "suppkey": pa.nulls(t.num_rows, pa.int64()),
                "max_ship_us": pa.nulls(t.num_rows, pa.int64()),
                "order_us": pc.cast(t["o_orderdate"], pa.int64()),
            }
        )
        return g.append_column("_grp", key_buckets(g, ["orderkey"], num_buckets))

    def tag_pairs(t: pa.Table) -> pa.Table:
        g = pa.table(
            {
                "orderkey": t["orderkey"],
                "suppkey": t["suppkey"],
                "max_ship_us": t["max_ship_us"],
                "order_us": pa.nulls(t.num_rows, pa.int64()),
            }
        )
        return g.append_column("_grp", key_buckets(g, ["orderkey"], num_buckets))

    _CELL = pa.schema([("suppkey", pa.int64()), ("n_blamed", pa.int64())])

    def per_bucket(g: pa.Table) -> pa.Table:
        is_pair = pc.is_valid(g["suppkey"])
        p, o = g.filter(is_pair), g.filter(pc.invert(is_pair))
        if p.num_rows == 0 or o.num_rows == 0:
            return _CELL.empty_table()
        p = p.sort_by([("orderkey", "ascending")])
        pk = p["orderkey"].combine_chunks().to_numpy(zero_copy_only=False)
        okeys = o["orderkey"].combine_chunks().to_numpy(zero_copy_only=False)
        oorder = np.argsort(okeys)
        pos = np.searchsorted(okeys[oorder], pk)
        pos_c = np.minimum(pos, len(okeys) - 1)
        hit = okeys[oorder][pos_c] == pk
        odate = o["order_us"].combine_chunks().to_numpy(zero_copy_only=False)
        ship = p["max_ship_us"].combine_chunks().to_numpy(zero_copy_only=False)
        late = hit & (ship > odate[oorder][pos_c] + _US_60D)
        # run-length per orderkey over the sorted pairs: suppliers per
        # order and late suppliers per order (pairs are already distinct
        # per (orderkey, suppkey) from the combiner)
        n = len(pk)
        starts = np.concatenate(([True], pk[1:] != pk[:-1]))
        run_id = np.cumsum(starts) - 1
        n_runs = int(run_id[-1]) + 1 if n else 0
        n_supp = np.bincount(run_id, minlength=n_runs)
        n_late = np.bincount(run_id, weights=late.astype(np.int64),
                             minlength=n_runs).astype(np.int64)
        blamed = late & (n_late[run_id] == 1) & (n_supp[run_id] >= 2)
        kept = p.filter(pa.array(blamed))
        return (
            pa.table({"suppkey": kept["suppkey"]})
            .group_by(["suppkey"], use_threads=False)
            .aggregate([([], "count_all")])
            .rename_columns(["suppkey", "n_blamed"])
        )

    cells = partial_agg(
        pair_ship.map_batches(tag_pairs, batch_format="pyarrow")
        .union(orders.map_batches(tag_orders, batch_format="pyarrow",
                                  zero_copy_batch=True))
        .groupby("_grp")
        .map_groups(per_bucket, batch_format="pyarrow"),
        keys=["suppkey"],
        sums={"n_blamed": "n_blamed"},
    )
    return top_k(cells, by="n_blamed", k=k, tie_col="suppkey")


SUPPLIERS_BLAMED_ALONE_SQL = """
WITH ls AS (
  SELECT l_orderkey AS ok, l_suppkey AS suppkey, MAX(l_shipdate) AS ms
  FROM lineitem GROUP BY 1, 2
), j AS (
  SELECT ok, suppkey, (ms > o_orderdate + INTERVAL 60 DAY) AS late
  FROM ls JOIN orders ON o_orderkey = ok
), agg AS (
  SELECT ok, SUM(CASE WHEN late THEN 1 ELSE 0 END) AS n_late,
         COUNT(*) AS n_supp
  FROM j GROUP BY ok
)
SELECT suppkey, CAST(COUNT(*) AS BIGINT) AS n_blamed
FROM j JOIN agg USING (ok)
WHERE late AND n_late = 1 AND n_supp >= 2
GROUP BY suppkey
ORDER BY n_blamed DESC, suppkey ASC
LIMIT 10
"""


def semdedup_docs(sf_dir: str):
    """SemDeDup semantic deduplication over the embeddings table
    (functions/similarity.py:semdedup): k-means partition of the
    embedding space + within-cluster greedy cosine dedup at 0.95 —
    the embedding-space complement of the exact/MinHash/SimHash text
    dedup family. k scales with table size so per-cluster Gram matrices
    stay worker-sized. Deterministic (hash seeding + keep-lowest-id), so
    survivors are stable across runs and layouts; not SQL-expressible
    (iterative k-means), covered by the sequential-reference pytest."""
    from datax_ray.functions.similarity import semdedup

    rows = parquet_rows(os.path.join(sf_dir, "embeddings.parquet"))
    k = max(4, min(64, rows // 64))
    return semdedup(
        _read(sf_dir, "embeddings", columns=["vec_id", "embedding"]),
        k=k, iters=4, threshold_milli=950,
    )


def concurrent_events_peak(sf_dir: str):
    """Max concurrent intervals per event_type — the interval sweep-line
    family (meeting-room / peak-occupancy analytics), absent from every
    window operator so far because it needs a GLOBAL ordered scan, not a
    per-key window. Each event spans [ts, ts + (1 + event_id % 5) min)
    (deterministic synthetic duration); peak = max running sum of +1/-1
    boundary deltas ordered by (ts, delta) so an end frees its slot before
    a same-instant start. Runs on functions/ordered.py:sweep_peak — the
    distributed two-level scan (per-cell local scan -> O(cells) fold),
    never a single-node global sort."""
    from datax_ray.functions.ordered import sweep_peak

    ds = _read(sf_dir, "events", columns=["event_id", "ts", "event_type"])

    def points(t: pa.Table) -> pa.Table:
        ts = pc.cast(t["ts"], pa.int64())
        eid = t["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        dur = pa.array((1 + eid % 5) * 60_000_000, pa.int64())
        te = pc.add(ts, dur)
        n = t.num_rows
        return pa.table(
            {
                "event_type": pa.concat_arrays(
                    [
                        t["event_type"].combine_chunks().cast(pa.string()),
                        t["event_type"].combine_chunks().cast(pa.string()),
                    ]
                ),
                "p": pa.concat_arrays([pc.cast(ts, pa.int64()).combine_chunks(),
                                       pc.cast(te, pa.int64()).combine_chunks()]),
                "delta": pa.concat_arrays(
                    [
                        pa.array(np.ones(n, np.int64)),
                        pa.array(-np.ones(n, np.int64)),
                    ]
                ),
            }
        )

    pts = ds.map_batches(points, batch_format="pyarrow", zero_copy_batch=True)
    return sweep_peak(
        pts, key_col="event_type", ts_col="p", delta_col="delta",
        out_col="peak_concurrency",
    )


CONCURRENT_PEAK_SQL = """
WITH iv AS (
  SELECT event_type, ts AS s,
         ts + (1 + event_id % 5) * INTERVAL 1 MINUTE AS e
  FROM events
), pts AS (
  SELECT event_type, s AS p, 1 AS delta FROM iv
  UNION ALL
  SELECT event_type, e AS p, -1 AS delta FROM iv
), run AS (
  SELECT event_type,
         SUM(delta) OVER (PARTITION BY event_type ORDER BY p, delta
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c
  FROM pts
)
SELECT event_type, MAX(c) AS peak_concurrency FROM run GROUP BY 1
"""


def embedding_gram_milli(sf_dir: str):
    """Distributed Gram matrix of the embedding column — the sufficient
    statistic for PCA / whitening / linear probes over a 100-TB embedding
    store (compute X^T X once, eigendecompose the d x d result anywhere).
    Integer-exact: vectors quantize to milli units with TRUNC (unambiguous
    in both engines, unlike round-half modes), so each (i, j) upper-
    triangle entry is an exact int64 sum of products. Per batch ONE numpy
    matmul emits d(d+1)/2 partial rows — the combiner moves O(d^2) rows
    per batch regardless of batch size — then a (i, j)-keyed fold. int64
    headroom: |q| <= ~2000 milli => ~4e6 per term, ~2.3e12 rows before
    overflow; rescale the quantization for corpora past that."""
    from datax_ray.functions.relational import partial_agg

    ds = _read(sf_dir, "embeddings", columns=["embedding"])

    def partial(t: pa.Table) -> pa.Table:
        vecs = np.stack(t["embedding"].to_numpy(zero_copy_only=False)).astype(
            np.float64
        )
        q = np.trunc(vecs * 1000.0).astype(np.int64)
        gram = q.T @ q  # d x d, exact int64
        d = gram.shape[0]
        iu, ju = np.triu_indices(d)
        return pa.table(
            {
                "i": pa.array((iu + 1).astype(np.int64)),
                "j": pa.array((ju + 1).astype(np.int64)),
                "gram": pa.array(gram[iu, ju]),
            }
        )

    return partial_agg(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        keys=["i", "j"],
        sums={"gram": "gram"},
        num_buckets=max(2, _buckets_for(sf_dir, "embeddings") // 4),
    )


EMBEDDING_GRAM_SQL = """
WITH e AS (
  SELECT vec_id,
         generate_subscripts(embedding, 1) AS i,
         CAST(TRUNC(CAST(unnest(embedding) AS DOUBLE) * 1000) AS BIGINT) AS q
  FROM embeddings
)
SELECT a.i AS i, b.i AS j, SUM(a.q * b.q) AS gram
FROM e a JOIN e b ON a.vec_id = b.vec_id AND b.i >= a.i
GROUP BY 1, 2
"""


def hll_union_click_purchase(sf_dir: str):
    """HLL sketch SET OPERATION, driver-verified exactly: build one
    register sketch per event_type in a single grouped pass (<= groups x
    512 rows shuffle), then MERGE the 'click' and 'purchase' sketches by
    per-bucket max. The oracle sketches the unioned stream directly —
    equality is the HLL merge property (union sketch == register max), so
    a hash-exact pass proves the merge kernel, not just the estimate.
    The inclusion-exclusion overlap estimate derived from these registers
    is error-bounded in tests/test_sketch_setops.py."""
    from datax_ray.functions.sketch import hll_merge_registers, hll_registers_grouped

    ds = _read(sf_dir, "events", columns=["user_id", "event_type"]).map_batches(
        lambda t: t.filter(
            pc.is_in(t["event_type"], pa.array(["click", "purchase"]))
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    grouped = hll_registers_grouped(ds, "user_id", "event_type", p=9)
    per_type = grouped.to_arrow_refs()
    tabs = [t for t in ray.get(per_type) if t.num_rows]
    merged = hll_merge_registers(
        [pa.concat_tables(tabs)] if tabs else [pa.table(
            {"bucket": pa.array([], pa.int64()), "max_rho": pa.array([], pa.int64())}
        )]
    )
    return ray.data.from_arrow(merged)


HLL_UNION_SQL = """
WITH src AS (
  SELECT user_id FROM events WHERE event_type IN ('click', 'purchase')
),
s0 AS (SELECT user_id % 4294967296 AS h FROM src),
s1 AS (SELECT xor(h, h >> 16) AS h FROM s0),
s2 AS (SELECT CAST(CAST(h AS HUGEINT) * 2246822507 % 4294967296 AS BIGINT) AS h FROM s1),
s3 AS (SELECT xor(h, h >> 13) AS h FROM s2),
s4 AS (SELECT CAST(CAST(h AS HUGEINT) * 3266489909 % 4294967296 AS BIGINT) AS h FROM s3),
hv AS (SELECT xor(h, h >> 16) AS hv FROM s4),
r AS (
  SELECT hv % 512 AS bucket,
         CASE WHEN hv // 512 = 0 THEN 24
              ELSE 24 - length(format('{:b}', hv // 512)) END AS rho
  FROM hv
)
SELECT CAST(bucket AS BIGINT) AS bucket, CAST(MAX(rho) AS BIGINT) AS max_rho
FROM r GROUP BY bucket ORDER BY bucket
"""


def bpe_merges_docs(sf_dir: str):
    """Distributed BPE tokenizer training over the documents corpus
    (functions/bpe.py): learn the top merge table — each iteration is one
    per-batch pair-count combiner pass + a vocabulary-sized fold; the
    corpus never materializes, driver state is the tiny merge list.
    Deterministic (count-desc, pair-lex tie-break), asserted equal to the
    textbook sequential reference by tests/test_bpe.py. Not
    SQL-expressible (iterative argmax-and-reencode), so rows-only at the
    driver."""
    from datax_ray.functions.bpe import bpe_train

    ds = _read(sf_dir, "documents", columns=["text"])
    table = bpe_train(
        ds, n_merges=12, min_count=2,
        num_buckets=max(2, _buckets_for(sf_dir, "documents") // 4),
    )
    return ray.data.from_arrow(table)


def pca_project_embeddings(sf_dir: str, k: int = 2):
    """Distributed PCA of the embedding column: the d x d second-moment
    and d first-moment statistics fold as EXACT trunc-milli int64 combiner
    sums (same quantization as embedding_gram_milli — so the fitted basis
    is bit-identical under any block layout or cluster size), the driver
    eigendecomposes the tiny d x d covariance (sign-fixed: each
    component's largest-|.| coordinate is made positive), and one
    stateless map projects every vector onto the top-k components.
    O(d^2) driver rows; the embeddings themselves never leave the
    workers. Rows-only at the driver (eigendecomposition is not SQL);
    determinism + variance-ordering are pytest-asserted."""
    from datax_ray.functions.relational import partial_agg

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def stat_partial(t: pa.Table) -> pa.Table:
        vecs = np.stack(t["embedding"].to_numpy(zero_copy_only=False)).astype(
            np.float64
        )
        q = np.trunc(vecs * 1000.0).astype(np.int64)
        d = q.shape[1]
        gram = q.T @ q
        iu, ju = np.triu_indices(d)
        sums = q.sum(axis=0)
        return pa.table(
            {
                "i": pa.array(
                    np.concatenate([iu, np.arange(d), [-1]]).astype(np.int64)
                ),
                "j": pa.array(
                    np.concatenate([ju, np.full(d, -1), [-1]]).astype(np.int64)
                ),
                "v": pa.array(
                    np.concatenate([gram[iu, ju], sums, [q.shape[0]]]).astype(
                        np.int64
                    )
                ),
            }
        )

    stats = partial_agg(
        ds.map_batches(stat_partial, batch_format="pyarrow", zero_copy_batch=True),
        keys=["i", "j"],
        sums={"v": "v"},
        num_buckets=4,
    ).take_all()  # O(d^2) rows — driver state bounded by dim, not data
    n = next(r["v"] for r in stats if r["i"] == -1)
    d = max(r["i"] for r in stats) + 1
    gram = np.zeros((d, d))
    mean = np.zeros(d)
    for r in stats:
        if r["i"] == -1:
            continue
        if r["j"] == -1:
            mean[r["i"]] = r["v"]
        else:
            gram[r["i"], r["j"]] = r["v"]
            gram[r["j"], r["i"]] = r["v"]
    mean /= n
    cov = gram / n - np.outer(mean, mean)
    eigval, eigvec = np.linalg.eigh(cov)
    comps = eigvec[:, np.argsort(eigval)[::-1][:k]].T.copy()
    for c in comps:  # sign convention: largest-|.| coordinate positive
        if c[np.argmax(np.abs(c))] < 0:
            c *= -1
    comps_ref = ray.put((comps, mean))

    def project(t: pa.Table) -> pa.Table:
        cmps, mu = ray.get(comps_ref)
        vecs = np.stack(t["embedding"].to_numpy(zero_copy_only=False)).astype(
            np.float64
        )
        q = np.trunc(vecs * 1000.0)
        proj = (q - mu) @ cmps.T  # milli-scale input => milli-scale output
        cols = {"vec_id": pc.cast(t["vec_id"], pa.int64())}
        for ci in range(cmps.shape[0]):
            cols[f"pc{ci + 1}_milli"] = pa.array(
                np.trunc(proj[:, ci]).astype(np.int64)
            )
        return pa.table(cols)

    return ds.map_batches(project, batch_format="pyarrow", zero_copy_batch=True)


def grouping_sets_orders(sf_dir: str):
    """GROUPING SETS ((status), (priority), ()) — the generalization that
    completes the cube/rollup family: three aggregation levels in ONE
    corpus pass (each batch emits pre-aggregated partials for every set,
    tagged by `gset`), one (gset, key)-keyed fold. Versus running three
    group-bys, the input is read and combined once. Integer-exact cents."""
    from datax_ray.functions.relational import partial_agg

    ds = _read(
        sf_dir, "orders",
        columns=["o_orderstatus", "o_orderpriority", "o_totalprice"],
    )

    def partials(t: pa.Table) -> pa.Table:
        cents = _cents(t["o_totalprice"])
        base = pa.table(
            {
                "status": pc.cast(t["o_orderstatus"], pa.string()),
                "priority": pc.cast(t["o_orderpriority"], pa.string()),
                "cents": cents,
            }
        )
        by_status = (
            base.group_by(["status"], use_threads=False)
            .aggregate([("cents", "sum"), ([], "count_all")])
            .rename_columns(["status", "sum_cents", "n"])
        )
        by_prio = (
            base.group_by(["priority"], use_threads=False)
            .aggregate([("cents", "sum"), ([], "count_all")])
            .rename_columns(["priority", "sum_cents", "n"])
        )
        total_c = pc.sum(cents).as_py() or 0
        parts = [
            pa.table(
                {
                    "gset": pa.array(
                        np.zeros(by_status.num_rows, np.int64)
                    ),
                    "status": by_status["status"],
                    "priority": pa.nulls(by_status.num_rows, pa.string()),
                    "sum_cents": pc.cast(by_status["sum_cents"], pa.int64()),
                    "n": pc.cast(by_status["n"], pa.int64()),
                }
            ),
            pa.table(
                {
                    "gset": pa.array(np.ones(by_prio.num_rows, np.int64)),
                    "status": pa.nulls(by_prio.num_rows, pa.string()),
                    "priority": by_prio["priority"],
                    "sum_cents": pc.cast(by_prio["sum_cents"], pa.int64()),
                    "n": pc.cast(by_prio["n"], pa.int64()),
                }
            ),
            pa.table(
                {
                    "gset": pa.array([2], pa.int64()),
                    "status": pa.nulls(1, pa.string()),
                    "priority": pa.nulls(1, pa.string()),
                    "sum_cents": pa.array([int(total_c)], pa.int64()),
                    "n": pa.array([t.num_rows], pa.int64()),
                }
            ),
        ]
        return pa.concat_tables(parts)

    return partial_agg(
        ds.map_batches(partials, batch_format="pyarrow", zero_copy_batch=True),
        keys=["gset", "status", "priority"],
        sums={"sum_cents": "sum_cents", "n": "n"},
        num_buckets=4,
    )


GROUPING_SETS_SQL = """
SELECT 0 AS gset, o_orderstatus AS status, NULL AS priority,
       CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS sum_cents,
       COUNT(*) AS n
FROM orders GROUP BY o_orderstatus
UNION ALL
SELECT 1, NULL, o_orderpriority,
       CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT),
       COUNT(*)
FROM orders GROUP BY o_orderpriority
UNION ALL
SELECT 2, NULL, NULL,
       CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT),
       COUNT(*)
FROM orders
"""


def attribution_last_touch(sf_dir: str):
    """Last-touch attribution: for every purchase, the SAME user's most
    recent prior click — the self-as-of window an analytics pipeline runs
    on every conversion table. Per user-hash bucket: one sort by (user,
    ts, id), then the segmented forward-fill trick — a GLOBAL
    maximum.accumulate over click row indices (indices are globally
    increasing, so any in-segment click beats every earlier segment's)
    clipped at each user's segment start. No per-user Python, one
    exchange."""
    from datax_ray.functions.relational import key_buckets

    num_buckets = _buckets_for(sf_dir, "events")
    ds = _read(sf_dir, "events", columns=["event_id", "ts", "user_id", "event_type"])

    def add_grp(t: pa.Table) -> pa.Table:
        t = t.filter(
            pc.is_in(t["event_type"], pa.array(["click", "purchase"]))
        )
        return t.append_column("_grp", key_buckets(t, ["user_id"], num_buckets))

    _OUT = pa.schema(
        [
            ("event_id", pa.int64()),
            ("user_id", pa.int64()),
            ("last_click_ts", pa.timestamp("us")),
        ]
    )

    def per_bucket(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _OUT.empty_table()
        idx = pc.sort_indices(
            t,
            sort_keys=[("user_id", "ascending"), ("ts", "ascending"),
                       ("event_id", "ascending")],
        )
        t = t.take(idx)
        n = t.num_rows
        user = t["user_id"].to_numpy(zero_copy_only=False)
        ts = pc.cast(t["ts"], pa.int64()).to_numpy()
        is_click = pc.equal(t["event_type"], "click").to_numpy(
            zero_copy_only=False
        )
        is_buy = pc.equal(t["event_type"], "purchase").to_numpy(
            zero_copy_only=False
        )
        idx_n = np.arange(n, dtype=np.int64)
        first = np.ones(n, dtype=bool)
        first[1:] = user[1:] != user[:-1]
        starts = idx_n[first]
        seg_start = np.repeat(starts, np.diff(np.r_[starts, n]))
        last_click = np.maximum.accumulate(np.where(is_click, idx_n, -1))
        valid = is_buy & (last_click >= seg_start)
        sel = np.flatnonzero(valid)
        return pa.table(
            {
                "event_id": pc.cast(t["event_id"], pa.int64()).take(
                    pa.array(sel)
                ),
                "user_id": pc.cast(t["user_id"], pa.int64()).take(
                    pa.array(sel)
                ),
                "last_click_ts": pc.cast(
                    pa.array(ts[last_click[sel]]), pa.timestamp("us")
                ),
            }
        ).cast(_OUT)

    return (
        ds.map_batches(add_grp, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_grp")
        .map_groups(per_bucket, batch_format="pyarrow")
    )


def hard_negatives_embeddings(sf_dir: str):
    """Contrastive hard-negative mining over the embeddings table
    (functions/similarity.py:hard_negatives): per vector, the most
    cosine-similar OTHER-label vector via multi-probe k-means partition —
    the training-pair generator of embedding fine-tuning. Rows-only
    (argmax over cosine is not practical SQL); recall floor vs the exact
    brute-force reference is pytest-asserted (tests/test_hardneg.py)."""
    from datax_ray.functions.similarity import hard_negatives

    rows = parquet_rows(os.path.join(sf_dir, "embeddings.parquet"))
    k = max(4, min(32, rows // 128))
    return hard_negatives(
        _read(sf_dir, "embeddings", columns=["vec_id", "embedding", "label"]),
        k=k, iters=4, probes=2,
    )


def events_ewma_alerts(sf_dir: str):
    """EWMA control chart over daily event volumes per type — the
    streaming anomaly monitor an ingest pipeline runs on its own feed.
    Integer-exact recursion (e_t = (300*x_t*1000 + 700*e_{t-1}) // 1000,
    alert when |x_t*1000 - e_{t-1}| > e_{t-1}//2), so the DuckDB oracle
    (a recursive CTE) is bit-identical. Scale shape: ONE distributed
    count combiner collapses the stream to (types x days) rows; the
    inherently-sequential EWMA scan then runs per type over that tiny
    series (O(days) integer steps — sequential by definition, not a
    vectorization miss)."""
    from datax_ray.functions.relational import partial_agg

    ds = _read(sf_dir, "events", columns=["ts", "event_type"])

    def day_counts(t: pa.Table) -> pa.Table:
        day = pc.cast(
            pc.divide(pc.cast(t["ts"], pa.int64()), 86_400_000_000),
            pa.int32(),
        )
        return (
            pa.table(
                {"event_type": pc.cast(t["event_type"], pa.string()), "day32": day}
            )
            .group_by(["event_type", "day32"], use_threads=False)
            .aggregate([([], "count_all")])
            .rename_columns(["event_type", "day32", "cnt"])
        )

    counts = partial_agg(
        ds.map_batches(day_counts, batch_format="pyarrow", zero_copy_batch=True),
        keys=["event_type", "day32"],
        sums={"cnt": "cnt"},
        num_buckets=4,
    )

    _OUT = pa.schema(
        [
            ("event_type", pa.string()),
            ("day", pa.date32()),
            ("cnt", pa.int64()),
            ("ewma_milli", pa.int64()),
            ("alert", pa.bool_()),
        ]
    )

    def scan(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _OUT.empty_table()
        g = g.sort_by([("event_type", "ascending"), ("day32", "ascending")])
        et = g["event_type"].to_pylist()
        days = g["day32"].to_numpy(zero_copy_only=False)
        cnts = g["cnt"].to_numpy(zero_copy_only=False).astype(np.int64)
        out_e, out_a = np.zeros(len(et), np.int64), np.zeros(len(et), bool)
        prev_key, e = None, 0
        for i, k in enumerate(et):
            x = int(cnts[i]) * 1000
            if k != prev_key:
                e, prev_key, alert = x, k, False
            else:
                alert = abs(x - e) > e // 2
                e = (300 * x + 700 * e) // 1000
            out_e[i], out_a[i] = e, alert
        return pa.table(
            {
                "event_type": g["event_type"],
                "day": pc.cast(g["day32"], pa.date32()),
                "cnt": pa.array(cnts, pa.int64()),
                "ewma_milli": pa.array(out_e, pa.int64()),
                "alert": pa.array(out_a, pa.bool_()),
            }
        ).cast(_OUT)

    return counts.groupby("event_type").map_groups(scan, batch_format="pyarrow")


EWMA_ALERTS_SQL = """
WITH RECURSIVE d AS (
  SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS cnt
  FROM events GROUP BY 1, 2
), s AS (
  SELECT event_type, day, cnt,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS rn
  FROM d
), r AS (
  SELECT event_type, day, cnt, rn,
         CAST(cnt * 1000 AS BIGINT) AS ewma_milli, FALSE AS alert
  FROM s WHERE rn = 1
  UNION ALL
  SELECT s.event_type, s.day, s.cnt, s.rn,
         CAST((300 * s.cnt * 1000 + 700 * r.ewma_milli) // 1000 AS BIGINT),
         ABS(s.cnt * 1000 - r.ewma_milli) > r.ewma_milli // 2
  FROM s JOIN r ON s.event_type = r.event_type AND s.rn = r.rn + 1
)
SELECT event_type, day, cnt, ewma_milli, alert FROM r
"""


ATTRIBUTION_SQL = """
WITH w AS (
  SELECT event_id, user_id, ts, event_type,
         MAX(CASE WHEN event_type = 'click' THEN ts END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS last_click_ts
  FROM events WHERE event_type IN ('click', 'purchase')
)
SELECT event_id, user_id, last_click_ts
FROM w WHERE event_type = 'purchase' AND last_click_ts IS NOT NULL
"""


def source_quota_sample_docs(sf_dir: str, quota: int = 20):
    """Per-source quota sampling (domain capping): keep at most `quota`
    documents per source, chosen by the deterministic fmix32(doc_id)
    priority (smallest first, doc_id tie-break) — the curation step that
    stops one over-crawled domain from dominating the training mixture
    (C4 / RefinedWeb both cap per-host contributions). RNG-free, so
    re-runs, resumes and the SQL oracle pick the identical subset. Rides
    the combiner-bounded top_n_per_key plan: each batch forwards at most
    quota rows per source, so the shuffle moves O(sources × quota), never
    the corpus."""
    from datax_ray.functions.relational import top_n_per_key

    ds = _read(sf_dir, "documents", columns=["doc_id", "source"])

    def prio(t: pa.Table) -> pa.Table:
        h = _fmix32_np(
            t["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        )
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "source": t["source"],
                "priority": pa.array(h.astype(np.int64), pa.int64()),
            }
        )

    return top_n_per_key(
        ds.map_batches(prio, batch_format="pyarrow", zero_copy_batch=True),
        keys=["source"],
        order_cols=["priority", "doc_id"],
        n=quota,
        descending=False,
    ).map_batches(
        lambda t: t.select(["doc_id", "source", "priority"]),
        batch_format="pyarrow",
    )


SOURCE_QUOTA_SQL = """
WITH s0 AS (
  SELECT doc_id, source, doc_id % 4294967296 AS h FROM documents
), s1 AS (SELECT doc_id, source, xor(h, h >> 16) AS h FROM s0),
s2 AS (SELECT doc_id, source,
              CAST(CAST(h AS HUGEINT) * 2246822507 % 4294967296 AS BIGINT) AS h
       FROM s1),
s3 AS (SELECT doc_id, source, xor(h, h >> 13) AS h FROM s2),
s4 AS (SELECT doc_id, source,
              CAST(CAST(h AS HUGEINT) * 3266489909 % 4294967296 AS BIGINT) AS h
       FROM s3),
hv AS (SELECT doc_id, source, xor(h, h >> 16) AS priority FROM s4)
SELECT doc_id, source, priority FROM hv
QUALIFY row_number() OVER (PARTITION BY source ORDER BY priority, doc_id) <= 20
"""


def lang_mixture_rates(sf_dir: str):
    """Language-mixture rebalancing rates: per language, document and
    whitespace-token totals plus the integer milli-rate
    (1000 · min-lang-tokens) // lang-tokens that downsamples every
    language to the smallest one's token budget — the multilingual
    balancing step before corpus sampling. ONE combiner pass collapses
    the corpus to O(langs) cells (token counts fold as decomposable sums);
    the min and the rates are a single tiny reduce over those cells —
    nothing re-reads or re-shuffles the corpus."""
    from datax_ray.functions.relational import partial_agg

    ds = _read(sf_dir, "documents", columns=["lang", "text"])

    def toks(t: pa.Table) -> pa.Table:
        n = pc.list_value_length(
            pc.split_pattern(pc.fill_null(t["text"], ""), " ")
        )
        return pa.table({"lang": t["lang"], "n_tok": pc.cast(n, pa.int64())})

    cells = partial_agg(
        ds.map_batches(toks, batch_format="pyarrow", zero_copy_batch=True),
        keys=["lang"],
        sums={"n_tok": "n_tokens"},
        counts="n_docs",
        single_reduce=True,
    )

    def rates(t: pa.Table) -> pa.Table:
        tok = t["n_tokens"].to_numpy(zero_copy_only=False).astype(np.int64)
        mn = tok.min() if len(tok) else 0
        return pa.table(
            {
                "lang": t["lang"],
                "n_docs": t["n_docs"],
                "n_tokens": t["n_tokens"],
                "milli_rate": pa.array(
                    (1000 * mn) // np.maximum(tok, 1), pa.int64()
                ),
            }
        )

    return cells.map_batches(rates, batch_format="pyarrow")


LANG_MIXTURE_SQL = """
WITH cells AS (
  SELECT lang,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
  FROM documents GROUP BY lang
)
SELECT lang, n_docs, n_tokens,
       (1000 * MIN(n_tokens) OVER ()) // n_tokens AS milli_rate
FROM cells
"""


def mixture_sample_docs(sf_dir: str):
    """The rebalanced-corpus SAMPLER that lang_mixture_rates plans:
    keep a document iff fmix32(doc_id) mod 1000 < its language's
    milli-rate — every language downsampled to the smallest one's token
    budget, deterministically (RNG-free: re-runs, resumes and the SQL
    oracle keep the identical subset). Pass 1 folds per-lang token totals
    to O(langs) cells (combiner, single reduce — the only driver state is
    that tiny dict); pass 2 is a stateless vectorized filter map. Nothing
    ever shuffles the corpus."""
    from datax_ray.functions.relational import partial_agg

    ds = _read(sf_dir, "documents", columns=["doc_id", "lang", "text"])

    def toks(t: pa.Table) -> pa.Table:
        n = pc.list_value_length(
            pc.split_pattern(pc.fill_null(t["text"], ""), " ")
        )
        return pa.table({"lang": t["lang"], "n_tok": pc.cast(n, pa.int64())})

    cells = partial_agg(
        ds.map_batches(toks, batch_format="pyarrow", zero_copy_batch=True),
        keys=["lang"],
        sums={"n_tok": "n_tokens"},
        single_reduce=True,
    ).take_all()  # O(langs) rows
    toks_by_lang = {r["lang"]: int(r["n_tokens"]) for r in cells}
    mn = min(toks_by_lang.values()) if toks_by_lang else 0
    rates = {
        lang: (1000 * mn) // max(tot, 1) for lang, tot in toks_by_lang.items()
    }

    def keep(t: pa.Table) -> pa.Table:
        h = _fmix32_np(
            t["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        ).astype(np.int64) % 1000
        langs = t["lang"].to_numpy(zero_copy_only=False)
        lim = np.array([rates.get(l, 0) for l in langs], np.int64)
        return pa.table(
            {"doc_id": t["doc_id"], "lang": t["lang"]}
        ).filter(pa.array(h < lim))

    return ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)


MIXTURE_SAMPLE_SQL = """
WITH cells AS (
  SELECT lang,
         CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
  FROM documents GROUP BY lang
), rates AS (
  SELECT lang, (1000 * MIN(n_tokens) OVER ()) // n_tokens AS milli_rate
  FROM cells
), s0 AS (
  SELECT doc_id, lang, doc_id % 4294967296 AS h FROM documents
), s1 AS (SELECT doc_id, lang, xor(h, h >> 16) AS h FROM s0),
s2 AS (SELECT doc_id, lang,
              CAST(CAST(h AS HUGEINT) * 2246822507 % 4294967296 AS BIGINT) AS h
       FROM s1),
s3 AS (SELECT doc_id, lang, xor(h, h >> 13) AS h FROM s2),
s4 AS (SELECT doc_id, lang,
              CAST(CAST(h AS HUGEINT) * 3266489909 % 4294967296 AS BIGINT) AS h
       FROM s3),
hv AS (SELECT doc_id, lang, xor(h, h >> 16) % 1000 AS h FROM s4)
SELECT hv.doc_id, hv.lang
FROM hv JOIN rates USING (lang)
WHERE hv.h < rates.milli_rate
"""


def pii_span_stats(sf_dir: str):
    """Pre-masking PII-span audit: per event_type, how many digit-run
    spans (the dx_mask '[0-9]+' target) the payload carries — total
    spans, rows with at least one, and integer milli-spans-per-row. The
    measurement step an operator runs BEFORE pinning a redaction chain
    on an egress sync. One vectorized RE2 pass per batch (count via
    split-minus-one on the same pattern both engines compile), combiner
    to O(types) cells."""
    from datax_ray.functions.relational import partial_agg

    ds = _read(sf_dir, "events", columns=["event_type", "props"])

    def spans(t: pa.Table) -> pa.Table:
        # span count == len(split_pattern(s, '[0-9]+')) - 1 for non-null s
        parts = pc.split_pattern_regex(pc.fill_null(t["props"], ""), "[0-9]+")
        n = pc.subtract(pc.list_value_length(parts), 1)
        n = pc.if_else(pc.is_null(t["props"]), pa.scalar(0, pa.int64()),
                       pc.cast(n, pa.int64()))
        has = pc.cast(pc.greater(n, 0), pa.int64())
        return pa.table(
            {"event_type": t["event_type"], "n_spans": n, "has_span": has}
        )

    cells = partial_agg(
        ds.map_batches(spans, batch_format="pyarrow", zero_copy_batch=True),
        keys=["event_type"],
        sums={"n_spans": "total_spans", "has_span": "rows_with_spans"},
        counts="n_rows",
        single_reduce=True,
    )

    def rates(t: pa.Table) -> pa.Table:
        tot = t["total_spans"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = t["n_rows"].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column(
            "milli_spans_per_row",
            pa.array((1000 * tot) // np.maximum(n, 1), pa.int64()),
        )

    return cells.map_batches(rates, batch_format="pyarrow")


PII_SPAN_SQL = """
SELECT event_type,
       CAST(SUM(len(regexp_extract_all(props, '[0-9]+'))) AS BIGINT)
           AS total_spans,
       CAST(SUM(CASE WHEN len(regexp_extract_all(props, '[0-9]+')) > 0
                THEN 1 ELSE 0 END) AS BIGINT) AS rows_with_spans,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       (1000 * CAST(SUM(len(regexp_extract_all(props, '[0-9]+'))) AS BIGINT))
           // COUNT(*) AS milli_spans_per_row
FROM events
GROUP BY event_type
"""


def median_cont_order_price(sf_dir: str):
    """Per-status INTERPOLATED median (percentile_cont 0.5 — the
    SQL-standard continuous rule, distinct from D46's quantile_disc): kept
    integer-exact by reporting HALF-cents = lower-middle + upper-middle of
    the expanded multiset (odd n: 2× the middle), so the oracle compare
    has no float surface. Same ONE-histogram plan as the MAD query: the
    combiner moves O(statuses × distinct cents) rows, both middles come
    from two cumulative-histogram lookups — the corpus never re-reads."""
    from datax_ray.functions.relational import partial_agg

    ds = _read(sf_dir, "orders", columns=["o_orderstatus", "o_totalprice"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {"o_orderstatus": t["o_orderstatus"], "cents": _cents(t["o_totalprice"])}
        )

    hist = partial_agg(
        ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True),
        keys=["o_orderstatus", "cents"],
        counts="n",
        single_reduce=True,
    )

    def fold(t: pa.Table) -> pa.Table:
        sts, meds, ns = [], [], []
        for st, vals, cnts in _cell_groups(t, "o_orderstatus", "cents"):
            cum = np.cumsum(cnts)
            n = int(cum[-1])
            lo = int(vals[np.searchsorted(cum, (n - 1) // 2 + 1)])
            hi = int(vals[np.searchsorted(cum, n // 2 + 1)])
            sts.append(st)
            meds.append(lo + hi)
            ns.append(n)
        return pa.table(
            {
                "o_orderstatus": pa.array(sts, pa.string()),
                "median_halfcents": pa.array(meds, pa.int64()),
                "n_orders": pa.array(ns, pa.int64()),
            }
        )

    return hist.map_batches(fold, batch_format="pyarrow", batch_size=None)


MEDIAN_CONT_SQL = """
SELECT o_orderstatus,
       CAST(round(2 * percentile_cont(0.5) WITHIN GROUP (
            ORDER BY CAST(round(o_totalprice * 100) AS BIGINT))) AS BIGINT)
           AS median_halfcents,
       CAST(COUNT(*) AS BIGINT) AS n_orders
FROM orders GROUP BY o_orderstatus
"""


_PIVOT_TYPES = ("click", "error", "purchase", "signup", "view")


def pivot_daily_event_counts(sf_dir: str):
    """PIVOT: one row per day, one count column per event type (the
    wide-format report shape). One distributed combiner pass collapses
    the stream to O(days × types) (day, type, n) cells; the pivot itself
    is a vectorized scatter inside the per-day-bucket fold — no
    row-per-cell Python and nothing ever re-reads the events."""
    from datax_ray.functions.relational import partial_agg

    ds = _read(sf_dir, "events", columns=["ts", "event_type"])

    def prep(t: pa.Table) -> pa.Table:
        day = pc.cast(pc.floor(pc.divide(pc.cast(t["ts"], pa.int64()),
                                         86_400_000_000)), pa.int64())
        return pa.table({"day": day, "event_type": t["event_type"]})

    cells = partial_agg(
        ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True),
        keys=["day", "event_type"],
        counts="n",
        single_reduce=True,
    )

    def pivot(t: pa.Table) -> pa.Table:
        days = t["day"].to_numpy(zero_copy_only=False)
        uniq = np.unique(days)
        pos = np.searchsorted(uniq, days)
        out = {"day": pa.array(uniq, pa.int64())}
        types = t["event_type"].to_numpy(zero_copy_only=False)
        n = t["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        for et in _PIVOT_TYPES:
            col = np.zeros(len(uniq), np.int64)
            m = types == et
            np.add.at(col, pos[m], n[m])
            out[f"n_{et}"] = pa.array(col, pa.int64())
        return pa.table(out)

    return cells.map_batches(pivot, batch_format="pyarrow", batch_size=None)


PIVOT_DAILY_SQL = """
SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
       CAST(COALESCE(SUM(CASE WHEN event_type = 'click' THEN 1 END), 0)
            AS BIGINT) AS n_click,
       CAST(COALESCE(SUM(CASE WHEN event_type = 'error' THEN 1 END), 0)
            AS BIGINT) AS n_error,
       CAST(COALESCE(SUM(CASE WHEN event_type = 'purchase' THEN 1 END), 0)
            AS BIGINT) AS n_purchase,
       CAST(COALESCE(SUM(CASE WHEN event_type = 'signup' THEN 1 END), 0)
            AS BIGINT) AS n_signup,
       CAST(COALESCE(SUM(CASE WHEN event_type = 'view' THEN 1 END), 0)
            AS BIGINT) AS n_view
FROM events GROUP BY 1
"""


# ---------------------------------------------------------------- registry --


# --------------------------------------------------- check-twin queries --
# Driver-checkable oracles for the approximate family (round-4; r3 review
# item 8). Each emits only values the DuckDB oracle reproduces EXACTLY,
# while the approximate structure is verified INSIDE the pipeline: a
# violated sketch/packing/recall bound flips a boolean (or raises), so the
# driver's value-hash compare turns red. This upgrades the family from
# pytest-only floors to rows the per-round driver sample can land on.


def heavy_hitters_exact_check(sf_dir: str, k: int = 4096):
    """Exact heavy hitters (count*k > N) computed distributed, emitted as
    the oracle-comparable result — with the Misra-Gries sketch's coverage
    guarantee (every true heavy hitter surfaces) ASSERTED in-pipeline
    against the same input. A guarantee violation raises, turning the
    driver row red; the emitted rows themselves are exact. k=4096 keeps
    the threshold N/k below the near-uniform fixture's per-user counts at
    every sf (the emitted set stays <= k-1 rows by pigeonhole, so the
    driver fold is bounded at any input size)."""
    from datax_ray.functions.relational import partial_agg
    from datax_ray.functions.sketch import heavy_hitters

    ds = _read(sf_dir, "events", columns=["user_id"])
    n_total = ds.count()  # parquet metadata, no scan
    counts = partial_agg(ds, keys=["user_id"], counts="cnt")

    def only_heavy(t: pa.Table) -> pa.Table:
        keep = pc.greater(
            pc.multiply(pc.cast(t["cnt"], pa.int64()), k), n_total
        )
        return t.filter(keep)

    heavy = counts.map_batches(only_heavy, batch_format="pyarrow").take_all()
    # <= k rows by the frequent-items bound — driver-safe at any scale
    surfaced = {
        r["user_id"]
        for r in heavy_hitters(ds, "user_id", k=k).take_all()
    }
    missing = [r["user_id"] for r in heavy if r["user_id"] not in surfaced]
    if missing:
        raise AssertionError(
            f"Misra-Gries coverage violated: true heavy hitters absent "
            f"from the sketch output: {missing[:5]}"
        )
    heavy = sorted(heavy, key=lambda r: r["user_id"])
    return pa.table(
        {
            "user_id": pa.array([r["user_id"] for r in heavy], pa.int64()),
            "cnt": pa.array([int(r["cnt"]) for r in heavy], pa.int64()),
        }
    )


HEAVY_EXACT_SQL = """
WITH c AS (SELECT user_id, COUNT(*) AS cnt FROM events GROUP BY user_id)
SELECT user_id, CAST(cnt AS BIGINT) AS cnt
FROM c WHERE cnt * 4096 > (SELECT COUNT(*) FROM events)
"""


def approx_distinct_check(sf_dir: str):
    """HLL estimate vs the exact distributed distinct count: emits the
    EXACT count (oracle-comparable) plus a boolean asserting the sketch
    landed within 5% — the error bound the driver can see."""
    from datax_ray.functions.relational import partial_agg
    from datax_ray.functions.sketch import hll_count_distinct

    ds = _read(sf_dir, "events", columns=["user_id"])
    est = hll_count_distinct(ds, "user_id")["approx_distinct"][0].as_py()
    exact = partial_agg(ds, keys=["user_id"], counts="c").count()
    ok = abs(int(est) - exact) <= max(1, int(0.05 * exact))
    return pa.table(
        {
            "exact_n": pa.array([exact], pa.int64()),
            "hll_ok": pa.array([bool(ok)]),
        }
    )


APPROX_DISTINCT_CHECK_SQL = """
SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_n, TRUE AS hll_ok
FROM events
"""


def pack_docs_invariants(sf_dir: str):
    """Sequence packing's SQL-checkable invariants: every doc packed
    exactly once (n_docs) and the token mass conserved (total_tokens) —
    both reproducible by the oracle from `documents` alone — plus a
    distributed bins_ok sweep (no multi-doc bin over budget, no doc
    duplicated). Bin ASSIGNMENT stays order-dependent and rows-only
    (pack_docs_sequences); this twin makes its conservation laws a
    driver-red-able row."""
    from datax_ray.functions.packing import pack_sequences
    from datax_ray.functions.relational import partial_agg
    from datax_ray.functions.text import add_token_count

    budget = 256
    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    with_counts = docs.map_batches(
        lambda t: add_token_count(t).select(["doc_id", "n_tokens"]),
        batch_format="pyarrow",
    )
    packed = pack_sequences(with_counts, budget=budget).materialize()
    n_docs = packed.count()

    dup_docs = (
        partial_agg(packed.select_columns(["doc_id"]), keys=["doc_id"], counts="c")
        .map_batches(
            lambda t: t.filter(pc.greater(t["c"], 1)), batch_format="pyarrow"
        )
        .count()
    )
    bins = partial_agg(
        packed, keys=["bin_id"], sums={"n_tokens": "fill"}, counts="n"
    )

    def over_budget(t: pa.Table) -> pa.Table:
        bad = pc.and_(
            pc.greater(t["fill"], budget), pc.greater(t["n"], 1)
        )
        return t.filter(bad)

    n_bad_bins = bins.map_batches(over_budget, batch_format="pyarrow").count()

    def tok_partial(t: pa.Table) -> pa.Table:
        return pa.table(
            {"s": pa.array([pc.sum(t["n_tokens"]).as_py() or 0], pa.int64())}
        )

    # O(batches) one-int rows reach the driver — a fold, not the data
    total = sum(
        r["s"]
        for r in packed.map_batches(
            tok_partial, batch_format="pyarrow"
        ).take_all()
    )
    return pa.table(
        {
            "n_docs": pa.array([n_docs], pa.int64()),
            "total_tokens": pa.array([int(total)], pa.int64()),
            "bins_ok": pa.array([dup_docs == 0 and n_bad_bins == 0]),
        }
    )


PACK_INVARIANTS_SQL = """
SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1)
            AS BIGINT) AS total_tokens,
       TRUE AS bins_ok
FROM documents
"""


def lang_id_accuracy(sf_dir: str):
    """Language-ID discrimination floor as a driver row: accuracy over
    the four languages the n-gram heuristic models (en/fr/de/es) must
    beat 0.30 — comfortably above the 0.25 four-way chance floor on this
    synthetic corpus (measured 0.42-0.47 at sf0.001-0.01), while the
    per-doc predictions stay rows-only (lang_id_docs)."""
    from datax_ray.functions.text import LangId

    ds = _read(sf_dir, "documents", columns=["doc_id", "text", "lang"])
    out = ds.map_batches(LangId, batch_format="pyarrow", concurrency=(1, 4))

    def score(t: pa.Table) -> pa.Table:
        m = pc.is_in(t["lang"], value_set=pa.array(["en", "fr", "de", "es"]))
        s = t.filter(m)
        hit = pc.sum(
            pc.cast(pc.equal(s["lang"], s["lang_pred"]), pa.int64())
        ).as_py() or 0
        return pa.table(
            {
                "n": pa.array([s.num_rows], pa.int64()),
                "hit": pa.array([int(hit)], pa.int64()),
            }
        )

    parts = out.map_batches(score, batch_format="pyarrow").take_all()
    n = sum(r["n"] for r in parts)
    hit = sum(r["hit"] for r in parts)
    ok = n > 0 and hit / n >= 0.30
    return pa.table(
        {
            "n_docs_scored": pa.array([n], pa.int64()),
            "acc_ok": pa.array([bool(ok)]),
        }
    )


LANG_ID_ACC_SQL = """
SELECT CAST(COUNT(*) AS BIGINT) AS n_docs_scored, TRUE AS acc_ok
FROM documents WHERE lang IN ('en', 'fr', 'de', 'es')
"""


def ann_ivf_recall_check(sf_dir: str):
    """IVF ANN recall vs the exact brute-force top-10 for the same query,
    as a driver row: probing ALL lists makes IVF exhaustive, so recall
    must be >= 0.9 (1.0 modulo cosine ties at the k boundary). n_hits is
    the exact result size the oracle reproduces."""
    import hashlib

    import pyarrow.parquet as pq

    from datax_ray.functions.similarity import knn_brute
    from datax_ray.pipelines.vecindex import (
        refresh_vector_index,
        search_vector_index,
    )

    src = os.path.join(sf_dir, "embeddings.parquet")
    idx_dir = os.path.join(
        "/tmp/datax_vecidx",
        hashlib.md5(os.path.abspath(src).encode()).hexdigest()[:12],
    )
    refresh_vector_index(src, idx_dir, n_lists=16, sample_size=2048)
    emb0 = pq.read_table(src, filters=[("vec_id", "=", 0)])
    q = np.stack(
        emb0["embedding"].to_numpy(zero_copy_only=False)
    ).astype(np.float64)
    ivf = search_vector_index(idx_dir, q, k=10, nprobe=16).take_all()
    exact = knn_brute(
        _read(sf_dir, "embeddings", columns=["vec_id", "embedding"]), q, k=10
    ).take_all()
    got = {r["vec_id"] for r in ivf}
    want = {r["vec_id"] for r in exact}
    recall = len(got & want) / max(1, len(want))
    return pa.table(
        {
            "n_hits": pa.array([len(want)], pa.int64()),
            "recall_ok": pa.array([recall >= 0.9]),
        }
    )


ANN_IVF_CHECK_SQL = """
SELECT CAST(LEAST(10, COUNT(*)) AS BIGINT) AS n_hits, TRUE AS recall_ok
FROM embeddings
"""


def kmeans_inertia_check(sf_dir: str):
    """Lloyd's monotonicity as a driver row: the distributed k-means'
    inertia history must be non-increasing (the algorithm's defining
    invariant), emitted with the exact input size the oracle reproduces."""
    from datax_ray.functions.similarity import kmeans_fit

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    n_vecs = ds.count()
    _, hist = kmeans_fit(ds, k=8, iters=4)
    mono = all(hist[i + 1] <= hist[i] + 1e-9 for i in range(len(hist) - 1))
    return pa.table(
        {
            "n_vecs": pa.array([n_vecs], pa.int64()),
            "inertia_monotone_ok": pa.array([bool(mono)]),
        }
    )


KMEANS_CHECK_SQL = """
SELECT CAST(COUNT(*) AS BIGINT) AS n_vecs, TRUE AS inertia_monotone_ok
FROM embeddings
"""


def _planted_dup_setup(sf_dir: str, suffix: str | None):
    """Shared planting for the approx-dedup check twins: odd doc_ids < 400
    take the text of doc_id-1 (optionally with `suffix` appended — a small
    token edit for a known-high Jaccard instead of exact equality). The
    donor slice is ≤200 rows (BOUNDED constant at any sf — broadcast via
    ray.put, never a join), so the corpus stays distributed. Returns
    (planted_corpus_ds, planted_pair_set)."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def low_slice(t: pa.Table) -> pa.Table:
        return t.filter(pc.less(t["doc_id"], 400))

    low = {
        int(r["doc_id"]): r["text"]
        for r in ds.map_batches(low_slice, batch_format="pyarrow").take_all()
    }  # ≤400 rows by construction
    donors = {i: tx for i, tx in low.items() if i % 2 == 0}
    planted = {
        (i - 1, i) for i in low if i % 2 == 1 and (i - 1) in donors
    }
    ref = ray.put(donors)

    def plant(t: pa.Table) -> pa.Table:
        d = ray.get(ref)
        ids = t["doc_id"].to_pylist()
        texts = t["text"].to_pylist()
        out = []
        for i, tx in zip(ids, texts):
            if i % 2 == 1 and i < 400 and (i - 1) in d:
                base = d[i - 1]
                out.append(base if suffix is None else base + suffix)
            else:
                out.append(tx)
        return pa.table(
            {"doc_id": pa.array(ids, pa.int64()),
             "text": pa.array(out, pa.string())}
        )

    return ds.map_batches(plant, batch_format="pyarrow"), planted


def _pair_recall(pairs_ds, planted: set) -> float:
    """Fraction of planted (a, b) pairs present in the pair stream —
    counted distributed (per-batch membership fold, O(batches) driver
    rows), never by collecting the pair set."""
    ref = ray.put(frozenset(planted))

    def matched(t: pa.Table) -> pa.Table:
        want = ray.get(ref)
        n = sum(
            1
            for a, b in zip(t["doc_a"].to_pylist(), t["doc_b"].to_pylist())
            if (a, b) in want
        )
        return pa.table({"n": pa.array([n], pa.int64())})

    hits = sum(
        int(r["n"])
        for r in pairs_ds.map_batches(matched, batch_format="pyarrow").take_all()
    )
    return hits / max(1, len(planted))


def simhash_pigeonhole_check(sf_dir: str):
    """SimHash band-pigeonhole guarantee as a driver row: planted EXACT
    duplicates have hamming 0 ≤ max_hamming, and splitting the 64-bit
    hash into max_hamming+1 bands guarantees at least one identical band
    per qualifying pair — so the banded scan must propose and verify ALL
    planted pairs (recall exactly 1.0, not a floor). n_planted is
    SQL-derivable from the same mod rule."""
    from datax_ray.functions.dedup import simhash_pairs

    corpus, planted = _planted_dup_setup(sf_dir, suffix=None)
    pairs = simhash_pairs(
        corpus, max_hamming=3, num_buckets=_buckets_for(sf_dir, "documents")
    )
    recall = _pair_recall(pairs, planted)
    return pa.table(
        {
            "n_planted": pa.array([len(planted)], pa.int64()),
            "recall_ok": pa.array([recall >= 1.0]),
        }
    )


def minhash_recall_check(sf_dir: str):
    """MinHash-LSH recall floor as a driver row: planted near-duplicates
    (donor text + a two-token suffix → shingle Jaccard far above the 0.6
    threshold) must be recovered at ≥0.9 — at J≈0.95 each 4-row band
    collides with p≈0.81, so 16 bands miss a pair with p≈2e-12; the floor
    leaves margin for short-document quantization."""
    from datax_ray.functions.dedup import minhash_lsh_pairs

    corpus, planted = _planted_dup_setup(sf_dir, suffix=" zzalpha zzbeta")
    pairs = minhash_lsh_pairs(
        corpus,
        threshold=0.6,
        shingle_k=3,
        num_buckets=_buckets_for(sf_dir, "documents"),
        est_rows=parquet_rows(os.path.join(sf_dir, "documents.parquet")),
    )
    recall = _pair_recall(pairs, planted)
    return pa.table(
        {
            "n_planted": pa.array([len(planted)], pa.int64()),
            "recall_ok": pa.array([recall >= 0.9]),
        }
    )


PLANTED_DUP_CHECK_SQL = """
SELECT CAST(COUNT(*) AS BIGINT) AS n_planted, TRUE AS recall_ok
FROM documents a JOIN documents b ON a.doc_id = b.doc_id + 1
WHERE a.doc_id % 2 = 1 AND a.doc_id < 400
"""


def scene_cut_recall_check(sf_dir: str):
    """Shot-boundary recall AND precision as a driver row: synthesize
    videos with HARD planted cuts (frames 3 and 6 jump to an independent
    random image; all other frames repeat exactly, so the frame delta is
    0 off-cut and ~333 milli at cuts — clear margin around the 200
    threshold). The detector must find exactly the planted set. Video
    count anchors to the documents table so the oracle is SQL-derivable."""
    from datax_ray.functions.multimodal import (
        MEDIA_SCHEMA,
        SceneCutDetector,
        encode_ppmv,
    )

    n = min(256, parquet_rows(os.path.join(sf_dir, "documents.parquet")))
    plant_frames = (3, 6)

    def build(t: pa.Table) -> pa.Table:
        ids, payloads = [], []
        for mid in t["media_id"].to_pylist():
            rng = np.random.default_rng(1000 + mid)
            h = w = 24
            cur = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
            frames = []
            for j in range(8):
                if j in plant_frames:
                    cur = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
                frames.append(cur)
            ids.append(mid)
            payloads.append(encode_ppmv(np.stack(frames), 100))
        k = len(ids)
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "kind": pa.array(["video"] * k, pa.string()),
                "payload": pa.array(payloads, pa.binary()),
                "width": pa.array([24] * k, pa.int32()),
                "height": pa.array([24] * k, pa.int32()),
                "duration_ms": pa.array([800] * k, pa.int32()),
            },
            schema=MEDIA_SCHEMA,
        )

    cuts = (
        ray.data.from_items([{"media_id": i} for i in range(n)])
        .map_batches(build, batch_format="pyarrow")
        .map_batches(
            SceneCutDetector,
            fn_constructor_kwargs=dict(threshold_milli=200),
            batch_format="pyarrow",
            batch_size=64,
            concurrency=(1, 4),
        )
        .take_all()
    )  # ≤ 2n bounded rows
    planted = {(i, f) for i in range(n) for f in plant_frames}
    found = {(int(r["media_id"]), int(r["cut_frame"])) for r in cuts}
    return pa.table(
        {
            "n_videos": pa.array([n], pa.int64()),
            "planted_cuts": pa.array([len(planted)], pa.int64()),
            "recall_ok": pa.array([planted <= found]),
            "precision_ok": pa.array([found <= planted]),
        }
    )


SCENE_CUT_CHECK_SQL = """
SELECT CAST(LEAST(256, COUNT(*)) AS BIGINT) AS n_videos,
       CAST(LEAST(256, COUNT(*)) * 2 AS BIGINT) AS planted_cuts,
       TRUE AS recall_ok, TRUE AS precision_ok
FROM documents
"""


def embedding_neardup_recall_check(sf_dir: str):
    """Embedding-LSH near-dup recall as a driver row: odd vec_ids < 200
    take an EXACT COPY of vec_id-1's embedding (cosine 1.0 — every
    hyperplane agrees, so the pair collides in every LSH bucket and must
    be emitted: recall exactly 1.0, not a floor). Donor slice is ≤200
    vectors, broadcast — the table stays distributed."""
    from datax_ray.functions.dedup import embedding_dup_pairs

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def low_slice(t: pa.Table) -> pa.Table:
        return t.filter(pc.less(t["vec_id"], 200))

    low = {
        int(r["vec_id"]): r["embedding"]
        for r in ds.map_batches(low_slice, batch_format="pyarrow").take_all()
    }
    donors = {i: v for i, v in low.items() if i % 2 == 0}
    planted = {(i - 1, i) for i in low if i % 2 == 1 and (i - 1) in donors}
    ref = ray.put(donors)

    def plant(t: pa.Table) -> pa.Table:
        d = ray.get(ref)
        ids = t["vec_id"].to_pylist()
        vecs = t["embedding"].to_pylist()
        out = [
            list(d[i - 1]) if (i % 2 == 1 and i < 200 and (i - 1) in d)
            else v
            for i, v in zip(ids, vecs)
        ]
        return pa.table(
            {"vec_id": pa.array(ids, pa.int64()), "embedding": pa.array(out)}
        )

    pairs = embedding_dup_pairs(
        ds.map_batches(plant, batch_format="pyarrow"),
        threshold=0.9,
        num_planes=8,
        num_buckets=_buckets_for(sf_dir, "embeddings"),
    )

    ref_p = ray.put(frozenset(planted))

    def matched(t: pa.Table) -> pa.Table:
        want = ray.get(ref_p)
        n = sum(
            1
            for a, b in zip(t["doc_a"].to_pylist(), t["doc_b"].to_pylist())
            if (a, b) in want
        )
        return pa.table({"n": pa.array([n], pa.int64())})

    hits = sum(
        int(r["n"])
        for r in pairs.map_batches(matched, batch_format="pyarrow").take_all()
    )
    recall = hits / max(1, len(planted))
    return pa.table(
        {
            "n_planted": pa.array([len(planted)], pa.int64()),
            "recall_ok": pa.array([recall >= 1.0]),
        }
    )


EMB_NEARDUP_CHECK_SQL = """
SELECT CAST(COUNT(*) AS BIGINT) AS n_planted, TRUE AS recall_ok
FROM embeddings a JOIN embeddings b ON a.vec_id = b.vec_id + 1
WHERE a.vec_id % 2 = 1 AND a.vec_id < 200
"""


QUERIES = {
    "cdc_lww_upsert": cdc_lww_upsert,
    "cdc_replay_final": cdc_replay_final,
    "cdc_multisource_replay": cdc_multisource_replay,
    "cdc_replay_dirty_routed": cdc_replay_dirty_routed,
    "cdc_redrive_repair": cdc_redrive_repair,
    "cdc_replay_expectations": cdc_replay_expectations,
    "cdc_point_lookup": cdc_point_lookup,
    "cdc_time_slice": cdc_time_slice,
    "cdc_replicate_lake": cdc_replicate_lake,
    "cdc_purge_forget": cdc_purge_forget,
    "cdc_repartition_migrate": cdc_repartition_migrate,
    "cdc_text_search": cdc_text_search,
    "cdc_dup_texts": cdc_dup_texts,
    "cdc_neardup_texts": cdc_neardup_texts,
    "cdc_feed_additive_stats": cdc_feed_additive_stats,
    "cdc_sql_mirror": cdc_sql_mirror,
    "cdc_kv_mirror": cdc_kv_mirror,
    "cdc_objstore_replay": cdc_objstore_replay,
    "cdc_change_feed_rebuild": cdc_change_feed_rebuild,
    "cdc_replay_ddl": cdc_replay_ddl,
    "cdc_mv_conv_stats": cdc_mv_conv_stats,
    "cdc_mv_additive_stats": cdc_mv_additive_stats,
    "cdc_hist_mv": cdc_hist_mv,
    "cdc_cms_mv": cdc_cms_mv,
    "cdc_window_mv": cdc_window_mv,
    "cdc_envelope_roundtrip": cdc_envelope_roundtrip,
    "cdc_stream_roundtrip": cdc_stream_roundtrip,
    "cdc_broker_roundtrip": cdc_broker_roundtrip,
    "cdc_backfill_scrub": cdc_backfill_scrub,
    "cdc_merge_into": cdc_merge_into,
    "cdc_branch_merge": cdc_branch_merge,
    "cdc_merge_delete": cdc_merge_delete,
    "cdc_session_mv": cdc_session_mv,
    "cdc_hopping_mv": cdc_hopping_mv,
    "cdc_join_mv": cdc_join_mv,
    "cdc_asof_mv": cdc_asof_mv,
    "cdc_hll_conv_mv": cdc_hll_conv_mv,
    "cdc_bootstrap_replay": cdc_bootstrap_replay,
    "dx_substr": dx_substr,
    "dx_pad": dx_pad,
    "dx_replace": dx_replace,
    "dx_mask_pii": dx_mask_pii,
    "dx_filter": dx_filter,
    "json_extract_props": json_extract_props,
    "agg_pricing_summary": agg_pricing_summary,
    "join_orders_by_nation": join_orders_by_nation,
    "sort_topk_orders": sort_topk_orders,
    "agg_global_extremes": agg_global_extremes,
    "distinct_event_types": distinct_event_types,
    "count_distinct_users_daily": count_distinct_users_daily,
    "semi_join_urgent_customers": semi_join_urgent_customers,
    "anti_join_quiet_customers": anti_join_quiet_customers,
    "join_lineitem_orders_large": join_lineitem_orders_large,
    "left_join_customer_orders": left_join_customer_orders,
    "sql_source_events": sql_source_events,
    "asof_join_latest_order": asof_join_latest_order,
    "sample_events_hash": sample_events_hash,
    "sample_events_stratified": sample_events_stratified,
    "token_count_bpe": token_count_bpe,
    "tfidf_top_terms": tfidf_top_terms,
    "bm25_topk_docs": bm25_topk_docs,
    "corpus_drift_terms": corpus_drift_terms,
    "funnel_signup_click_purchase": funnel_signup_click_purchase,
    "heavy_hitters_users": heavy_hitters_users,
    "scrub_pii_docs": scrub_pii_docs,
    "range_join_event_burst": range_join_event_burst,
    "quantile_sketch_order_price": quantile_sketch_order_price,
    "grouped_median_order_price": grouped_median_order_price,
    "grouped_percentiles_order_price": grouped_percentiles_order_price,
    "latest_order_per_customer": latest_order_per_customer,
    "top3_orders_per_customer": top3_orders_per_customer,
    "unpivot_part_measures": unpivot_part_measures,
    "percent_rank_orders": percent_rank_orders,
    "term_postings_lookup": term_postings_lookup,
    "sample2_orders_per_customer": sample2_orders_per_customer,
    "dedup_exact_docs": dedup_exact_docs,
    "text_stats": text_stats,
    "doc_fingerprints": doc_fingerprints,
    "lang_id_docs": lang_id_docs,
    "events_sessionize": events_sessionize,
    "events_tumbling": events_tumbling,
    "events_hopping": events_hopping,
    "window_user_running": window_user_running,
    "cdc_scd2_history": cdc_scd2_history,
    "cdc_patch_upsert": cdc_patch_upsert,
    "rollup_order_stats": rollup_order_stats,
    "doc_chunks": doc_chunks,
    "except_open_orderkeys": except_open_orderkeys,
    "intersect_finished_orderkeys": intersect_finished_orderkeys,
    "pivot_user_event_counts": pivot_user_event_counts,
    "quality_filter_docs": quality_filter_docs,
    "ngram_dup_pairs": ngram_dup_pairs,
    "ngram_dup_pairs_exact": ngram_dup_pairs_exact,
    "dedup_cluster_docs": dedup_cluster_docs,
    "dedup_cluster_exact": dedup_cluster_exact,
    "decontaminate_docs": decontaminate_docs,
    "dedup_fuzzy_survivors": dedup_fuzzy_survivors,
    "pack_docs_sequences": pack_docs_sequences,
    "ann_cosine_topk": ann_cosine_topk,
    "label_centroids": label_centroids,
    "ann_ivf_topk": ann_ivf_topk,
    "kmeans_clusters_embeddings": kmeans_clusters_embeddings,
    "hll_registers_events": hll_registers_events,
    "minhash_dup_pairs": minhash_dup_pairs,
    "simhash_dup_pairs": simhash_dup_pairs,
    "embedding_near_dups": embedding_near_dups,
    "multimodal_features": multimodal_features,
    "multimodal_resize_pipeline": multimodal_resize_pipeline,
    "multimodal_frame_sample": multimodal_frame_sample,
    "user_event_path": user_event_path,
    "orders_monthly_revenue": orders_monthly_revenue,
    "top_terms_global": top_terms_global,
    "union_distinct_orderkeys": union_distinct_orderkeys,
    "approx_distinct_users": approx_distinct_users,
    "heavy_hitters_exact_check": heavy_hitters_exact_check,
    "approx_distinct_check": approx_distinct_check,
    "pack_docs_invariants": pack_docs_invariants,
    "lang_id_accuracy": lang_id_accuracy,
    "ann_ivf_recall_check": ann_ivf_recall_check,
    "kmeans_inertia_check": kmeans_inertia_check,
    "simhash_pigeonhole_check": simhash_pigeonhole_check,
    "minhash_recall_check": minhash_recall_check,
    "scene_cut_recall_check": scene_cut_recall_check,
    "embedding_neardup_recall_check": embedding_neardup_recall_check,
    "top_bigrams_global": top_bigrams_global,
    "docs_length_histogram": docs_length_histogram,
    "star_join_order_region": star_join_order_region,
    "orders_above_customer_avg": orders_above_customer_avg,
    "events_funnel_users": events_funnel_users,
    "retention_cohorts": retention_cohorts,
    "cms_registers_users": cms_registers_users,
    "full_outer_daily_click_purchase": full_outer_daily_click_purchase,
    "cube_orders_status_priority": cube_orders_status_priority,
    "corr_stats_lineitem": corr_stats_lineitem,
    "trend_daily_events": trend_daily_events,
    "heatmap_dow_hour": heatmap_dow_hour,
    "profit_by_nation": profit_by_nation,
    "profile_orders": profile_orders,
    "revenue_share_nation": revenue_share_nation,
    "histogram_order_prices": histogram_order_prices,
    "rollup_time_revenue": rollup_time_revenue,
    "user_growth_curve": user_growth_curve,
    "wau_trailing_7d": wau_trailing_7d,
    "user_event_types_list": user_event_types_list,
    "order_count_distribution": order_count_distribution,
    "mom_revenue_growth": mom_revenue_growth,
    "session_stats_events": session_stats_events,
    "fk_integrity_audit": fk_integrity_audit,
    "rolling_daily_revenue_7d": rolling_daily_revenue_7d,
    "rolling_range_30d_revenue": rolling_range_30d_revenue,
    "lag_delta_orders": lag_delta_orders,
    "mode_event_type_per_user": mode_event_type_per_user,
    "ntile_orders_by_price": ntile_orders_by_price,
    "train_val_test_split_docs": train_val_test_split_docs,
    "mad_order_price": mad_order_price,
    "dense_rank_cume_orders": dense_rank_cume_orders,
    "quality_cutoff_docs": quality_cutoff_docs,
    "markov_event_transitions": markov_event_transitions,
    "gap_fill_daily_revenue": gap_fill_daily_revenue,
    "cdc_time_travel": cdc_time_travel,
    "copurchase_triangles": copurchase_triangles,
    "cdc_txn_atomic_apply": cdc_txn_atomic_apply,
    "pagerank_parts": pagerank_parts,
    "bfs_levels_parts": bfs_levels_parts,
    "cdc_replay_widen": cdc_replay_widen,
    "cdc_enrich_dimension": cdc_enrich_dimension,
    "cdc_conv_quality_report": cdc_conv_quality_report,
    "cdc_conv_transcript": cdc_conv_transcript,
    "cdc_conv_context_pairs": cdc_conv_context_pairs,
    "orders_exists_late_ship": orders_exists_late_ship,
    "suppliers_blamed_alone": suppliers_blamed_alone,
    "semdedup_docs": semdedup_docs,
    "lm_surprise_docs": lm_surprise_docs,
    "concurrent_events_peak": concurrent_events_peak,
    "embedding_gram_milli": embedding_gram_milli,
    "bpe_merges_docs": bpe_merges_docs,
    "pca_project_embeddings": pca_project_embeddings,
    "hll_union_click_purchase": hll_union_click_purchase,
    "multimodal_scene_cuts": multimodal_scene_cuts,
    "grouping_sets_orders": grouping_sets_orders,
    "attribution_last_touch": attribution_last_touch,
    "events_ewma_alerts": events_ewma_alerts,
    "hard_negatives_embeddings": hard_negatives_embeddings,
    "gopher_repetition_docs": gopher_repetition_docs,
    "events_debounce_daily": events_debounce_daily,
    "user_activity_streaks": user_activity_streaks,
    "funnel_pattern_match": funnel_pattern_match,
    "user_interarrival_median": user_interarrival_median,
    "fuzzy_match_parts": fuzzy_match_parts,
    "outlier_events_mad": outlier_events_mad,
    "pmi_bigrams": pmi_bigrams,
    "substring_dup_docs": substring_dup_docs,
    "cdc_snapshot_diff": cdc_snapshot_diff,
    "cdc_restore_rollback": cdc_restore_rollback,
    "cdc_cluster_optimize": cdc_cluster_optimize,
    "cdc_autoddl_replay": cdc_autoddl_replay,
    "cdc_wap_publish": cdc_wap_publish,
    "assoc_rules_parts": assoc_rules_parts,
    "weighted_sample_docs": weighted_sample_docs,
    "source_quota_sample_docs": source_quota_sample_docs,
    "lang_mixture_rates": lang_mixture_rates,
    "mixture_sample_docs": mixture_sample_docs,
    "pii_span_stats": pii_span_stats,
    "median_cont_order_price": median_cont_order_price,
    "pivot_daily_event_counts": pivot_daily_event_counts,
    "cdc_replay_drop": cdc_replay_drop,
    "cdc_lake_constraints": cdc_lake_constraints,
    "cdc_replay_rename": cdc_replay_rename,
    "kmv_distinct_users": kmv_distinct_users,
    "user_first_last_event": user_first_last_event,
    "late_events_audit": late_events_audit,
    "gini_event_mix_users": gini_event_mix_users,
    "winsorize_order_prices": winsorize_order_prices,
    "dod_retention_users": dod_retention_users,
    "scd2_asof_snapshot": scd2_asof_snapshot,
    "conversion_within_window": conversion_within_window,
    "skyline_customers": skyline_customers,
    "csv_source_events": csv_source_events,
    "jsonl_source_events": jsonl_source_events,
    "orc_source_events": orc_source_events,
    "hll_daily_users": hll_daily_users,
}

ORACLE_SQL = {
    "heavy_hitters_exact_check": HEAVY_EXACT_SQL,
    "approx_distinct_check": APPROX_DISTINCT_CHECK_SQL,
    "pack_docs_invariants": PACK_INVARIANTS_SQL,
    "lang_id_accuracy": LANG_ID_ACC_SQL,
    "ann_ivf_recall_check": ANN_IVF_CHECK_SQL,
    "kmeans_inertia_check": KMEANS_CHECK_SQL,
    "simhash_pigeonhole_check": PLANTED_DUP_CHECK_SQL,
    "minhash_recall_check": PLANTED_DUP_CHECK_SQL,
    "scene_cut_recall_check": SCENE_CUT_CHECK_SQL,
    "embedding_neardup_recall_check": EMB_NEARDUP_CHECK_SQL,
    "cdc_lww_upsert": CDC_LWW_SQL,
    "cdc_replay_final": CDC_REPLAY_SQL,
    "cdc_multisource_replay": CDC_REPLAY_SQL,
    "cdc_replay_dirty_routed": CDC_DIRTY_SQL,
    "cdc_redrive_repair": CDC_REPLAY_SQL,
    "hll_registers_events": HLL_SQL,
    "cdc_replay_expectations": CDC_EXPECT_SQL,
    "cdc_point_lookup": CDC_LOOKUP_SQL,
    "cdc_time_slice": CDC_SLICE_SQL,
    "cdc_replicate_lake": CDC_REPLAY_SQL,
    "cdc_purge_forget": CDC_PURGE_SQL,
    "cdc_repartition_migrate": CDC_REPLAY_SQL,
    "cdc_text_search": CDC_SEARCH_SQL,
    "cdc_dup_texts": CDC_DUP_SQL,
    "cdc_neardup_texts": _neardup_sql(_NEARDUP_MOD),
    "cdc_feed_additive_stats": CDC_ADDITIVE_SQL,
    "cdc_sql_mirror": CDC_MIRROR_SQL,
    "cdc_kv_mirror": CDC_MIRROR_SQL,
    "cdc_objstore_replay": CDC_REPLAY_SQL,
    "cdc_change_feed_rebuild": CDC_FEED_SQL,
    "cdc_replay_ddl": CDC_DDL_SQL,
    "cdc_mv_conv_stats": CDC_MV_SQL,
    "cdc_mv_additive_stats": CDC_MV_ADD_SQL,
    "cdc_hist_mv": CDC_HIST_MV_SQL,
    "cdc_cms_mv": CDC_CMS_MV_SQL,
    "cdc_window_mv": CDC_WINDOW_MV_SQL,
    "cdc_envelope_roundtrip": CDC_ENVELOPE_RT_SQL,
    "cdc_stream_roundtrip": CDC_ENVELOPE_RT_SQL,
    "cdc_broker_roundtrip": CDC_ENVELOPE_RT_SQL,
    "cdc_backfill_scrub": CDC_BACKFILL_SQL,
    "cdc_merge_into": CDC_MERGE_SQL,
    "cdc_branch_merge": CDC_REPLAY_SQL,
    "cdc_merge_delete": CDC_MERGE_DELETE_SQL,
    "cdc_session_mv": CDC_SESSION_MV_SQL,
    "cdc_hopping_mv": CDC_HOPPING_MV_SQL,
    "cdc_join_mv": CDC_JOIN_MV_SQL,
    "cdc_asof_mv": CDC_ASOF_MV_SQL,
    "cdc_hll_conv_mv": CDC_HLL_MV_SQL,
    "cdc_bootstrap_replay": CDC_BOOTSTRAP_SQL,
    "dx_substr": DX_SUBSTR_SQL,
    "dx_pad": DX_PAD_SQL,
    "dx_replace": DX_REPLACE_SQL,
    "dx_mask_pii": DX_MASK_SQL,
    "dx_filter": DX_FILTER_SQL,
    "json_extract_props": JSON_EXTRACT_SQL,
    "agg_pricing_summary": AGG_PRICING_SQL,
    "join_orders_by_nation": JOIN_NATION_SQL,
    "sort_topk_orders": SORT_TOPK_SQL,
    "agg_global_extremes": GLOBAL_EXTREMES_SQL,
    "distinct_event_types": DISTINCT_TYPES_SQL,
    "count_distinct_users_daily": COUNT_DISTINCT_SQL,
    "semi_join_urgent_customers": SEMI_JOIN_SQL,
    "anti_join_quiet_customers": ANTI_JOIN_SQL,
    "join_lineitem_orders_large": JOIN_LARGE_SQL,
    "left_join_customer_orders": LEFT_JOIN_SQL,
    "sql_source_events": SQL_SOURCE_SQL,
    "asof_join_latest_order": ASOF_JOIN_SQL,
    "sample_events_hash": SAMPLE_SQL,
    "sample_events_stratified": SAMPLE_STRAT_SQL,
    "token_count_bpe": TOKEN_BPE_SQL,
    "tfidf_top_terms": TFIDF_SQL,
    "bm25_topk_docs": BM25_SQL,
    "corpus_drift_terms": DRIFT_SQL,
    "funnel_signup_click_purchase": FUNNEL3_SQL,
    "scrub_pii_docs": SCRUB_SQL,
    "range_join_event_burst": RANGE_JOIN_SQL,
    "quantile_sketch_order_price": QUANTILE_SQL,
    "grouped_median_order_price": GROUPED_MEDIAN_SQL,
    "grouped_percentiles_order_price": GROUPED_PERCENTILES_SQL,
    "latest_order_per_customer": LATEST_ORDER_SQL,
    "top3_orders_per_customer": TOP3_ORDERS_SQL,
    "unpivot_part_measures": UNPIVOT_SQL,
    "percent_rank_orders": PERCENT_RANK_SQL,
    "term_postings_lookup": TERM_POSTINGS_SQL,
    "sample2_orders_per_customer": SAMPLE2_SQL,
    "dedup_exact_docs": DEDUP_EXACT_SQL,
    "text_stats": TEXT_STATS_SQL,
    "doc_fingerprints": FINGERPRINT_SQL,
    "events_sessionize": SESSIONIZE_SQL,
    "events_tumbling": TUMBLING_SQL,
    "events_hopping": HOPPING_SQL,
    "window_user_running": WINDOW_SQL,
    "cdc_scd2_history": SCD2_SQL,
    "cdc_patch_upsert": PATCH_SQL,
    "rollup_order_stats": ROLLUP_SQL,
    "doc_chunks": CHUNKS_SQL,
    "except_open_orderkeys": SET_EXCEPT_SQL,
    "intersect_finished_orderkeys": SET_INTERSECT_SQL,
    "pivot_user_event_counts": PIVOT_SQL,
    "quality_filter_docs": QUALITY_SQL,
    "ngram_dup_pairs_exact": NGRAM_EXACT_SQL,
    "dedup_cluster_exact": CLUSTER_EXACT_SQL,
    "decontaminate_docs": DECONTAMINATE_SQL,
    "ann_cosine_topk": ANN_SQL,
    "label_centroids": CENTROID_SQL,
    "user_event_path": EVENT_PATH_SQL,
    "orders_monthly_revenue": MONTHLY_REVENUE_SQL,
    "top_terms_global": TOP_TERMS_SQL,
    "union_distinct_orderkeys": SET_UNION_SQL,
    "top_bigrams_global": TOP_BIGRAMS_SQL,
    "docs_length_histogram": LENGTH_HIST_SQL,
    "star_join_order_region": STAR_JOIN_SQL,
    "orders_above_customer_avg": ABOVE_AVG_SQL,
    "events_funnel_users": FUNNEL_SQL,
    "retention_cohorts": RETENTION_SQL,
    "cms_registers_users": CMS_SQL,
    "full_outer_daily_click_purchase": FULL_OUTER_DAILY_SQL,
    "cube_orders_status_priority": CUBE_SQL,
    "corr_stats_lineitem": CORR_STATS_SQL,
    "trend_daily_events": TREND_SQL,
    "heatmap_dow_hour": HEATMAP_SQL,
    "profit_by_nation": PROFIT_SQL,
    "profile_orders": PROFILE_SQL,
    "revenue_share_nation": REVENUE_SHARE_SQL,
    "histogram_order_prices": HISTOGRAM_SQL,
    "rollup_time_revenue": ROLLUP_TIME_SQL,
    "user_growth_curve": GROWTH_SQL,
    "wau_trailing_7d": WAU_SQL,
    "user_event_types_list": TYPES_LIST_SQL,
    "order_count_distribution": ORDER_DIST_SQL,
    "mom_revenue_growth": MOM_SQL,
    "session_stats_events": SESSION_STATS_SQL,
    "fk_integrity_audit": FK_AUDIT_SQL,
    "rolling_daily_revenue_7d": ROLLING_7D_SQL,
    "rolling_range_30d_revenue": ROLLING_RANGE_SQL,
    "lag_delta_orders": LAG_DELTA_SQL,
    "mode_event_type_per_user": MODE_SQL,
    "ntile_orders_by_price": NTILE_SQL,
    "train_val_test_split_docs": SPLIT_SQL,
    "mad_order_price": MAD_SQL,
    "dense_rank_cume_orders": DENSE_RANK_SQL,
    "quality_cutoff_docs": QUALITY_CUTOFF_SQL,
    "markov_event_transitions": MARKOV_SQL,
    "gap_fill_daily_revenue": GAP_FILL_SQL,
    "cdc_time_travel": CDC_TIME_TRAVEL_SQL,
    "copurchase_triangles": TRIANGLES_SQL,
    "cdc_txn_atomic_apply": CDC_TXN_SQL,
    "pagerank_parts": PAGERANK_SQL,
    "bfs_levels_parts": BFS_SQL,
    "cdc_replay_widen": CDC_WIDEN_SQL,
    "cdc_enrich_dimension": CDC_ENRICH_SQL,
    "cdc_conv_quality_report": CDC_CONV_QA_SQL,
    "cdc_conv_transcript": CDC_CONV_TRANSCRIPT_SQL,
    "cdc_conv_context_pairs": CDC_CONV_CONTEXT_PAIRS_SQL,
    "orders_exists_late_ship": ORDERS_EXISTS_LATE_SHIP_SQL,
    "suppliers_blamed_alone": SUPPLIERS_BLAMED_ALONE_SQL,
    "gopher_repetition_docs": GOPHER_REPETITION_SQL,
    "events_debounce_daily": DEBOUNCE_SQL,
    "user_activity_streaks": STREAKS_SQL,
    "funnel_pattern_match": FUNNEL_PATTERN_SQL,
    "user_interarrival_median": INTERARRIVAL_SQL,
    "fuzzy_match_parts": FUZZY_PARTS_SQL,
    "outlier_events_mad": OUTLIER_MAD_SQL,
    "pmi_bigrams": PMI_BIGRAMS_SQL,
    "lm_surprise_docs": LM_SURPRISE_SQL,
    "concurrent_events_peak": CONCURRENT_PEAK_SQL,
    "embedding_gram_milli": EMBEDDING_GRAM_SQL,
    "hll_union_click_purchase": HLL_UNION_SQL,
    "grouping_sets_orders": GROUPING_SETS_SQL,
    "attribution_last_touch": ATTRIBUTION_SQL,
    "events_ewma_alerts": EWMA_ALERTS_SQL,
    "substring_dup_docs": SUBSTRING_DUP_SQL,
    "cdc_snapshot_diff": CDC_SNAPSHOT_DIFF_SQL,
    "cdc_restore_rollback": CDC_RESTORE_SQL,
    "cdc_cluster_optimize": CDC_REPLAY_SQL,
    "cdc_autoddl_replay": CDC_AUTODDL_SQL,
    "cdc_wap_publish": CDC_REPLAY_SQL,
    "assoc_rules_parts": ASSOC_RULES_SQL,
    "weighted_sample_docs": WEIGHTED_SAMPLE_SQL,
    "source_quota_sample_docs": SOURCE_QUOTA_SQL,
    "lang_mixture_rates": LANG_MIXTURE_SQL,
    "mixture_sample_docs": MIXTURE_SAMPLE_SQL,
    "pii_span_stats": PII_SPAN_SQL,
    "median_cont_order_price": MEDIAN_CONT_SQL,
    "pivot_daily_event_counts": PIVOT_DAILY_SQL,
    "cdc_replay_drop": CDC_DROP_SQL,
    "cdc_lake_constraints": CDC_EXPECT_SQL,
    "cdc_replay_rename": CDC_RENAME_SQL,
    "kmv_distinct_users": KMV_SQL,
    "user_first_last_event": FIRST_LAST_SQL,
    "late_events_audit": LATE_EVENTS_SQL,
    "gini_event_mix_users": GINI_SQL,
    "winsorize_order_prices": WINSORIZE_SQL,
    "dod_retention_users": DOD_RETENTION_SQL,
    "scd2_asof_snapshot": SCD2_ASOF_SQL,
    "conversion_within_window": CONVERSION_WINDOW_SQL,
    "skyline_customers": SKYLINE_SQL,
    "csv_source_events": _EVENTS_TEXT_SQL,
    "jsonl_source_events": _EVENTS_TEXT_SQL,
    "orc_source_events": _EVENTS_TEXT_SQL,
    "hll_daily_users": HLL_DAILY_SQL,
}
