"""CLI entry points (SURVEY.md §3.2) — the only place in the library that
may own a Ray session.

    python -m datax_ray gen     --out DIR --events N [--convs N] [--seed S] [knobs]
    python -m datax_ray replay  --changes DIR --lake DIR [--partitions P] ...
    python -m datax_ray verify  --changes DIR --lake DIR
    python -m datax_ray show    --lake DIR
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _ensure_ray(num_cpus: int | None):
    """Own the Ray session: local by default; under `ray job submit` (or
    any RAY_ADDRESS pointing at a cluster) attach to the running cluster —
    the same CLI verbs then fan their map_batches work across the nodes."""
    import ray

    if ray.is_initialized():
        return
    addr = os.environ.get("RAY_ADDRESS", "local")
    kwargs = dict(
        ignore_reinit_error=True, logging_level="ERROR",
        log_to_driver=False, namespace="datax",
    )
    if addr == "local":
        kwargs["address"] = "local"
        kwargs["include_dashboard"] = False
        if num_cpus:
            kwargs["num_cpus"] = num_cpus
    # non-local: attach to the cluster; per-process cpu caps don't apply
    ray.init(**kwargs)


def _parse_sources(specs: list[str] | None) -> dict[str, str] | None:
    """--source NAME=DIR (repeatable) → {name: dir} for multi-source
    replication verbs (replay/tail/verify)."""
    if not specs:
        return None
    out: dict[str, str] = {}
    for spec in specs:
        name, _, d = spec.partition("=")
        if not name or not d:
            raise SystemExit(f"--source expects NAME=DIR, got {spec!r}")
        out[name] = d
    return out


def main(argv=None):
    p = argparse.ArgumentParser(prog="datax_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    g = sub.add_parser("gen", help="generate a synthetic change log")
    g.add_argument("--out", required=True)
    g.add_argument("--events", type=int, default=60_000)
    g.add_argument("--convs", type=int, default=1_000)
    g.add_argument("--seed", type=int, default=42)
    g.add_argument("--seg-rows", type=int, default=10_000)
    g.add_argument("--out-of-order", type=float, default=0.05)
    g.add_argument("--dup", type=float, default=0.01)
    g.add_argument("--corrupt", type=float, default=0.0)
    g.add_argument("--zipf", type=float, default=0.0)
    g.add_argument("--ddl", action="store_true")

    r = sub.add_parser("replay", help="replay uncommitted change segments into the lake")
    r.add_argument("--changes", default=None,
                   help="single-source change-log dir (exclusive with --source)")
    r.add_argument("--source", action="append", default=None, metavar="NAME=DIR",
                   help="multi-source replication: repeatable NAME=DIR "
                   "producer logs, each with its own lsn space (glsn-"
                   "remapped into the lake's pinned slot map)")
    r.add_argument("--lake", required=True)
    r.add_argument("--partitions", type=int, default=64)
    r.add_argument("--segments-per-epoch", type=int, default=None)
    r.add_argument("--salt-turn-width", type=int, default=None)
    r.add_argument("--error-limit-rows", type=int, default=None)
    r.add_argument("--error-limit-pct", type=float, default=None)
    r.add_argument("--batch-size", type=int, default=65536)
    r.add_argument("--transformers", default=None,
                   help="JSON file with a DataX-style transformer spec "
                   "list applied to valid change rows before the write")
    r.add_argument("--expectations", default=None,
                   help="JSON file with ingest expectations (CHECK "
                   "constraints); violating rows dead-letter and count "
                   "against errorLimit")
    r.add_argument("--stage", action="store_true",
                   help="write-audit-publish: land ALL pending segments as "
                   "ONE STAGED epoch, invisible to committed readers until "
                   "`publish` (audit it with verify --staged / lookup "
                   "--staged); `publish --abort` drops it")
    r.add_argument("--auto-ddl", action="store_true",
                   help="automatic schema evolution: fold new/widened "
                   "payload columns detected from parquet segment footers "
                   "as synthetic add_column/widen DDL (gated by the lake's "
                   "schema policy like stream DDL)")
    r.add_argument("--num-cpus", type=int, default=None)
    r.add_argument("--dry-run", action="store_true",
                   help="print the epoch plan (pending segments + footer "
                   "row estimates, per source) without writing anything — "
                   "no Ray session needed")

    df = sub.add_parser(
        "diff",
        help="epoch-to-epoch change summary: per-change-type row counts, "
        "net live-row delta and event-time span of epochs (from, to] — "
        "O(changed ranges) via the preimage feed, never O(lake)",
    )
    df.add_argument("--lake", required=True)
    df.add_argument("--from-epoch", type=int, required=True)
    df.add_argument("--to-epoch", type=int, default=None,
                    help="default: the committed head")
    df.add_argument("--num-cpus", type=int, default=None)

    b = sub.add_parser("bootstrap", help="full-load a transcripts snapshot into an empty lake (epoch 0)")
    b.add_argument("--src", default=None, help="transcripts parquet file/dir")
    b.add_argument("--sql", default=None,
                   help="sqlite db path: bootstrap from a SQL table instead "
                   "of parquet (DataX JDBC-full-sync -> lake; range-split "
                   "parallel read via --split-pk)")
    b.add_argument("--table", default="transcripts")
    b.add_argument("--split-pk", default="rowid")
    b.add_argument("--sql-splits", type=int, default=16)
    b.add_argument("--lake", required=True)
    b.add_argument("--partitions", type=int, default=64)
    b.add_argument("--salt-turn-width", type=int, default=None)
    b.add_argument("--num-cpus", type=int, default=None)

    v = sub.add_parser("verify", help="compare lake state against the sequential oracle")
    v.add_argument("--changes", default=None,
                   help="single-source change-log dir (exclusive with --source)")
    v.add_argument("--source", action="append", default=None, metavar="NAME=DIR",
                   help="multi-source lake: the producer logs it was "
                   "replayed from; the oracle folds their union under the "
                   "lake's pinned glsn remap")
    v.add_argument("--lake", required=True)
    v.add_argument("--base", default=None, help="transcripts snapshot the lake was bootstrapped from")
    v.add_argument("--sample-convs", type=int, default=None,
                   help="spot-verify only N deterministically-chosen "
                   "conversations: the oracle folds just their change rows "
                   "(O(sample) memory) and the lake side point-reads their "
                   "ranges via manifest hash-routing — the scale-practical "
                   "audit of a huge lake, never an O(lake) read")
    v.add_argument("--staged", action="store_true",
                   help="audit the STAGED (write-audit-publish) state "
                   "instead of the committed head — the WAP audit step "
                   "before `publish`")
    v.add_argument("--num-cpus", type=int, default=None)

    pub = sub.add_parser(
        "publish",
        help="write-audit-publish step 2: atomically promote the staged "
        "epoch (replay --stage) into the committed chain, or --abort it "
        "(fragments orphan, segments re-apply exactly-once later)",
    )
    pub.add_argument("--lake", required=True)
    pub.add_argument("--abort", action="store_true")

    stt = sub.add_parser(
        "status",
        help="operational staleness report: committed head, fragment "
        "pressure, per-artifact lag, consumer offsets, dead-letter "
        "backlog — manifest metadata only, no Ray session, no storage "
        "reads",
    )
    stt.add_argument("--lake", required=True)

    c = sub.add_parser("compact", help="force-compact all ranges with pending fragments")
    c.add_argument("--lake", required=True)
    c.add_argument("--min-frags", type=int, default=None,
                   help="size-tiered policy: compact ONLY ranges with at "
                   "least this many pending fragments (manifest-only "
                   "check — cold ranges pay nothing)")
    c.add_argument("--cluster-ts", action="store_true",
                   help="OPTIMIZE-ZORDER analog for the time dimension: "
                   "rewrite EVERY base sorted by ts so min-ts reads skip "
                   "row groups via parquet statistics (point lookups keep "
                   "file-level Bloom pruning but lose conv_id row-group "
                   "stats — pick the clustering dimension per workload)")
    c.add_argument("--num-cpus", type=int, default=None)

    e = sub.add_parser("export", help="materialize the lake to a parquet/orc/csv/jsonl sink")
    e.add_argument("--lake", required=True)
    e.add_argument("--out", required=True)
    e.add_argument("--format", default="parquet",
                   choices=["parquet", "orc", "csv", "jsonl"])
    e.add_argument("--as-of-epoch", type=int, default=None,
                   help="export the lake AS OF this committed epoch (time travel)")
    e.add_argument("--partition-by", action="append", default=None,
                   help="Hive-style partitioned layout out/<col>=<val>/... "
                   "(repeatable; the odpswriter partition-spec analog)")
    e.add_argument("--incremental", action="store_true",
                   help="exactly-once incremental sync: rewrite only ranges "
                   "whose committed file set changed since the last export "
                   "(per-range dirs + _export_state.json fingerprints)")
    e.add_argument("--transformers", default=None,
                   help="JSON file with a dx_* chain applied to every batch "
                   "before the write (PII-scrubbed egress view; the lake "
                   "itself is untouched). With --incremental the chain spec "
                   "folds into the range fingerprints, so changing it "
                   "rewrites the whole sync")
    e.add_argument("--partition-spec", action="append", default=None,
                   help="k=v (repeatable): odpswriter partition-spec load — "
                   "write ONLY the matching rows into exactly that Hive "
                   "partition, truncating it first unless --append")
    e.add_argument("--append", action="store_true",
                   help="with --partition-spec: writeMode=append (keep "
                   "existing part files) instead of truncate")
    e.add_argument("--overwrite", default="all", choices=["all", "dynamic"],
                   help="with --partition-by: 'dynamic' truncates only the "
                   "partitions that receive rows this run")
    e.add_argument("--num-cpus", type=int, default=None)

    tl = sub.add_parser("tail", help="continuously poll the change dir and replay new segments")
    tl.add_argument("--changes", default=None,
                    help="single-source change-log dir (exclusive with --source)")
    tl.add_argument("--source", action="append", default=None, metavar="NAME=DIR",
                    help="multi-source replication: repeatable NAME=DIR "
                    "producer logs to tail into one lake")
    tl.add_argument("--lake", required=True)
    tl.add_argument("--partitions", type=int, default=64)
    tl.add_argument("--segments-per-epoch", type=int, default=4)
    tl.add_argument("--salt-turn-width", type=int, default=None)
    tl.add_argument("--interval", type=float, default=2.0, help="poll interval seconds")
    tl.add_argument("--max-polls", type=int, default=None)
    tl.add_argument("--idle-exit", type=int, default=None,
                    help="stop after this many consecutive empty polls")
    tl.add_argument("--refresh-mv", default=None, metavar="DIR",
                    help="refresh the stats MV here after every epoch")
    tl.add_argument("--refresh-index", default=None, metavar="DIR",
                    help="refresh the inverted text index here after every epoch")
    tl.add_argument("--refresh-sketch", default=None, metavar="DIR",
                    help="refresh the HLL sketch MV here after every epoch")
    tl.add_argument("--sync", action="store_true",
                    help="after every epoch, refresh EVERY registered "
                    "artifact (see `register`) — streaming pipelines keep "
                    "all downstream views warm automatically")
    tl.add_argument("--num-cpus", type=int, default=None)

    cs = sub.add_parser(
        "consume",
        help="tail a streaming envelope transport (TCP socket or file "
        "broker) into the lake: spool -> convert -> replay, exactly-once",
    )
    cs.add_argument("--addr", default=None, metavar="HOST:PORT",
                    help="socket transport: envelope stream server "
                    "(resume handshake; exclusive with --broker)")
    cs.add_argument("--broker", default=None, metavar="DIR",
                    help="file-broker topic dir (FileBroker layout; "
                    "exclusive with --addr)")
    cs.add_argument("--partition", type=int, default=0,
                    help="broker partition to consume (one consumer per "
                    "partition; replay partitions as --source NAME=DIR "
                    "multi-source for a keyed topic)")
    cs.add_argument("--spool", required=True,
                    help="durable window spool dir (the progress truth)")
    cs.add_argument("--changes", required=True,
                    help="converted change-log segment dir")
    cs.add_argument("--lake", default=None,
                    help="replay converted segments here (omit = spool + "
                    "convert only)")
    cs.add_argument("--partitions", type=int, default=64)
    cs.add_argument("--epoch-records", type=int, default=None,
                    help="pipelined mode: records accumulated per commit "
                    "epoch (the latency/throughput knob; default = commit "
                    "whatever is pending)")
    cs.add_argument("--pipelined", action="store_true",
                    help="background spooler thread: the transport is "
                    "drained DURING replay (stream_tail)")
    cs.add_argument("--batch-records", type=int, default=2000,
                    help="records per durable spool window")
    cs.add_argument("--num-cpus", type=int, default=None)

    mvp = sub.add_parser("mv", help="refresh the per-conversation stats materialized view")
    mvp.add_argument("--lake", required=True)
    mvp.add_argument("--mv", required=True, help="MV output directory")
    mvp.add_argument("--num-cpus", type=int, default=None)

    mva = sub.add_parser(
        "mvadd",
        help="fold the preimage change feed into the ADDITIVE per-conv MV "
        "(O(changed rows) refresh — no lake range re-reads); --rebuild "
        "recomputes from the live lake after vacuumed history",
    )
    mva.add_argument("--lake", required=True)
    mva.add_argument("--mv", required=True, help="view directory")
    mva.add_argument("--rebuild", action="store_true")
    mva.add_argument("--num-cpus", type=int, default=None)

    mvh = sub.add_parser(
        "mvhist",
        help="fold the preimage change feed into the ADDITIVE grouped "
        "text-length HISTOGRAM MV (O(changed rows) refresh; updates "
        "transfer mass across (group, bucket) cells exactly); "
        "--quantiles prints per-group approximate percentiles from the "
        "folded cells; --rebuild recomputes from the live lake",
    )
    mvh.add_argument("--lake", required=True)
    mvh.add_argument("--mv", required=True, help="view directory")
    mvh.add_argument("--group-col", default=None,
                     help="grouping column (pinned at creation; default role)")
    mvh.add_argument("--bucket-width", type=int, default=None,
                     help="histogram bucket width in chars (pinned; default 64)")
    mvh.add_argument("--quantiles", default=None,
                     help="comma-separated quantiles to print, e.g. 0.5,0.95")
    mvh.add_argument("--rebuild", action="store_true")
    mvh.add_argument("--num-cpus", type=int, default=None)

    cms = sub.add_parser(
        "cmsmv",
        help="fold the preimage change feed into the TURNSTILE Count-Min "
        "register MV (constant 32 KiB state, delete-capable): approximate "
        "live-turn counts per conversation at any key cardinality; "
        "--query prints overestimate-guaranteed point estimates",
    )
    cms.add_argument("--lake", required=True)
    cms.add_argument("--mv", required=True, help="view directory")
    cms.add_argument("--depth", type=int, default=None,
                     help="CMS hash rows (pinned at creation; default 4)")
    cms.add_argument("--width", type=int, default=None,
                     help="CMS columns per row (pinned; default 1024)")
    cms.add_argument("--query", action="append", default=None, metavar="CONV_ID",
                     help="point-estimate live turns for this conv (repeatable)")
    cms.add_argument("--rebuild", action="store_true")
    cms.add_argument("--num-cpus", type=int, default=None)

    mvw = sub.add_parser(
        "mvwindow",
        help="fold the preimage feed into the event-time TUMBLING-WINDOW "
        "aggregate MV with watermark + allowed-lateness freeze; late "
        "deltas divert to a side output instead of mutating frozen "
        "windows; --rebuild recomputes from the live lake (all on-time)",
    )
    mvw.add_argument("--lake", required=True)
    mvw.add_argument("--mv", required=True, help="view directory")
    mvw.add_argument("--window", type=int, default=3600,
                     help="tumbling window size, seconds")
    mvw.add_argument("--lateness", type=float, default=None,
                     help="allowed lateness, seconds (default: no freezing)")
    mvw.add_argument("--hop", type=int, default=None,
                     help="hop size, seconds (< window makes the windows "
                     "HOPPING; window must be a multiple)")
    mvw.add_argument("--rebuild", action="store_true")
    mvw.add_argument("--admit-late", action="store_true",
                     help="correction pass: fold the diverted late deltas "
                     "into their frozen windows and clear the side output "
                     "(watermark untouched)")
    mvw.add_argument("--num-cpus", type=int, default=None)

    fo = sub.add_parser(
        "feedout",
        help="export the change feed as Debezium-style before/after "
        "ENVELOPE files (op c/u/d + full pre/post images) for external "
        "CDC consumers — exactly-once incremental, one window per run",
    )
    fo.add_argument("--lake", required=True)
    fo.add_argument("--out", required=True, help="envelope output directory")
    fo.add_argument("--format", default="jsonl", choices=["jsonl", "parquet"])
    fo.add_argument("--num-cpus", type=int, default=None)

    bf = sub.add_parser(
        "backfill",
        help="bulk UPDATE: apply a dx_* transformer chain to the lake's "
        "LIVE rows retroactively (PII scrub, normalization), committed as "
        "one epoch of dominating rewrites; only rows the chain actually "
        "changes rewrite, so an idempotent chain converges to a no-op; "
        "keys and event-time are immutable",
    )
    bf.add_argument("--lake", required=True)
    bf.add_argument("--transformers", required=True,
                    help="JSON file with the spec list (same format as "
                    "replay --transformers)")
    bf.add_argument("--where", default=None, metavar="COL=VALUE",
                    help="post-merge equality filter, e.g. role=tool")
    bf.add_argument("--conv", action="append", default=None,
                    help="restrict to these conv_ids (repeatable; prunes "
                    "the range plan)")
    bf.add_argument("--num-cpus", type=int, default=None)

    mg = sub.add_parser(
        "merge",
        help="MERGE INTO: fold a keyed source snapshot (parquet) into the "
        "lake — WHEN MATCHED update (source payload wins, stored "
        "event-time kept, dominating synthetic lsn) or delete, WHEN NOT "
        "MATCHED insert; per-clause [col, op, value] conditions; "
        "value-unchanged rows skip, so re-running the same merge "
        "converges to a no-op",
    )
    mg.add_argument("--lake", required=True)
    mg.add_argument("--source", default=None,
                    help="parquet file/dir keyed on (conv_id, turn_idx); "
                    "payload columns may be a subset; `ts` required for "
                    "inserts")
    mg.add_argument("--sql", default=None,
                    help="read the source from a SQL DB instead (sqlite "
                    "path; splitPk-range parallel read)")
    mg.add_argument("--table", default="transcripts",
                    help="SQL table name (with --sql)")
    mg.add_argument("--split-pk", default="rowid",
                    help="splitPk column for range planning (with --sql)")
    mg.add_argument("--columns", default=None,
                    help="comma-separated column list (with --sql; "
                    "default: all columns of the table)")
    mg.add_argument("--when-matched", default="update",
                    choices=["update", "delete", "skip"])
    mg.add_argument("--when-not-matched", default="insert",
                    choices=["insert", "skip"])
    mg.add_argument("--matched-cond", default=None,
                    help='JSON AND-ed triples, e.g. \'[["turn_idx","<",5],'
                    '["src_text","not_like","%%7"]]\' (bare col = target, '
                    "src_<col> = source)")
    mg.add_argument("--not-matched-cond", default=None,
                    help="JSON AND-ed triples over the source row")
    mg.add_argument("--dry-run", action="store_true",
                    help="full plan incl. conditions and expectation "
                    "checks, no writes: counts report what WOULD change")
    mg.add_argument("--num-cpus", type=int, default=None)

    ei = sub.add_parser(
        "envingest",
        help="consume a Debezium-style envelope stream (this engine's "
        "feedout, or any foreign CDC producer) into change-log segments; "
        "with --lake also replays them — the interop ingest loop",
    )
    ei.add_argument("--env", required=True, help="envelope directory (jsonl)")
    ei.add_argument("--changes", required=True, help="segment output dir")
    ei.add_argument("--lake", default=None, help="also replay into this lake")
    ei.add_argument("--partitions", type=int, default=16)
    ei.add_argument("--num-cpus", type=int, default=None)

    reg = sub.add_parser(
        "register",
        help="register a derived artifact (MV / index / sketch / export) "
        "against the lake so `sync` refreshes it; --delete removes; "
        "--list shows the registry",
    )
    reg.add_argument("--lake", required=True)
    reg.add_argument("--name", default=None, help="artifact name")
    reg.add_argument("--kind", default=None,
                     help="mv|mvadd|mvsession|mvwindow|index|dedup|neardup|"
                     "colindex|sketch|export")
    reg.add_argument("--dir", default=None, help="artifact directory")
    reg.add_argument("--param", action="append", default=[],
                     help="k=v refresher param (repeatable), e.g. gap_s=1800")
    reg.add_argument("--delete", action="store_true")
    reg.add_argument("--list", action="store_true")

    syn = sub.add_parser(
        "sync",
        help="refresh EVERY registered artifact to the lake's committed "
        "head in one command (each refresher is incremental + idempotent, "
        "so sync is too; per-artifact errors don't block the rest)",
    )
    syn.add_argument("--lake", required=True)
    syn.add_argument("--only", action="append", default=None,
                     help="sync only this artifact (repeatable)")
    syn.add_argument("--num-cpus", type=int, default=None)

    mvs = sub.add_parser(
        "mvsession",
        help="refresh the gap-based SESSION-window view (delta-keyed: "
        "only changed conversations re-sessionize via manifest-pruned "
        "point reads; session merge/split handled by per-conv recompute); "
        "--rebuild re-sessionizes everything (allows a new --gap)",
    )
    mvs.add_argument("--lake", required=True)
    mvs.add_argument("--mv", required=True, help="view directory")
    mvs.add_argument("--gap", type=float, default=None,
                     help="session gap, seconds (omitted -> reuse the "
                     "view's stored gap; 1800 for a fresh view)")
    mvs.add_argument("--rebuild", action="store_true")
    mvs.add_argument("--num-cpus", type=int, default=None)

    mvaf = sub.add_parser(
        "mvasof",
        help="refresh the AS-OF JOIN view between two CDC lakes (per left "
        "turn, the right row with the greatest ts at-or-before it; "
        "delta-keyed: only changed conversations on EITHER side "
        "recompute); --rebuild recomputes from two streaming passes",
    )
    mvaf.add_argument("--left", required=True, help="left (event) lake")
    mvaf.add_argument("--right", required=True, help="right (enrichment) lake")
    mvaf.add_argument("--mv", required=True, help="view directory")
    mvaf.add_argument("--rebuild", action="store_true")
    mvaf.add_argument("--num-cpus", type=int, default=None)

    mvj = sub.add_parser(
        "mvjoin",
        help="refresh the JOIN view between two CDC lakes (delta-keyed: "
        "only changed conv_ids re-join, untouched buckets keep their "
        "files); --rebuild re-derives from one streaming join after "
        "vacuumed history",
    )
    mvj.add_argument("--left", required=True, help="left (transcript) lake")
    mvj.add_argument("--right", required=True, help="right (dimension) lake")
    mvj.add_argument("--mv", required=True, help="view directory")
    mvj.add_argument("--rebuild", action="store_true")
    mvj.add_argument("--num-cpus", type=int, default=None)

    vac = sub.add_parser(
        "vacuum",
        help="drop time-travel history: --keep-epochs N (count-based) or "
        "--older-than SECONDS (time-based, Delta RETAIN-style; head and "
        "tagged epochs always survive)",
    )
    vac.add_argument("--lake", required=True)
    vac.add_argument("--keep-epochs", type=int, default=1)
    vac.add_argument("--older-than", type=float, default=None,
                     help="retain records committed within this many seconds")

    rd = sub.add_parser(
        "redrive",
        help="repair-and-reingest pending dead-letter rows as a new epoch "
        "(exactly-once: consumed dl files are tracked in the manifest)",
    )
    rd.add_argument("--lake", required=True)
    rd.add_argument("--transformers", default=None,
                    help="JSON file with a dx_*/udf fix spec list applied "
                    "to the dirty rows BEFORE re-validation (may modify "
                    "routing columns — that is how a corrupt key is fixed)")
    rd.add_argument("--expectations", default=None,
                    help="JSON file with ingest expectations re-checked on "
                    "the redriven rows")
    rd.add_argument("--batch-size", type=int, default=65536)
    rd.add_argument("--num-cpus", type=int, default=None)

    jb = sub.add_parser("job", help="run a DataX-style JSON job config (reader → transformers → writer)")
    jb.add_argument("config", help="path to the job JSON file")
    jb.add_argument("--num-cpus", type=int, default=None)

    fd = sub.add_parser("feed", help="change data feed: committed change rows of epochs (from, to]")
    fd.add_argument("--lake", required=True)
    fd.add_argument("--from-epoch", type=int, default=-1)
    fd.add_argument("--to-epoch", type=int, default=None)
    fd.add_argument("--out", default=None, help="write the feed as parquet here (else just count)")
    fd.add_argument("--preimages", action="store_true",
                    help="Delta-CDF-style rows: insert / update_preimage "
                    "/ update_postimage / delete (old values on pre/delete "
                    "rows) — enables additive downstream aggregation")
    fd.add_argument("--consumer", default=None,
                    help="named durable offset (Kafka-consumer-group "
                    "analog): read since this consumer's last acknowledged "
                    "epoch and acknowledge the new head after delivery "
                    "(at-least-once)")
    fd.add_argument("--num-cpus", type=int, default=None)

    mr = sub.add_parser("mirror", help="exactly-once incremental mirror of the lake into a SQL table")
    mr.add_argument("--lake", required=True)
    mr.add_argument("--db", required=True, help="sqlite database path (stands in for the JDBC endpoint)")
    mr.add_argument("--table", default="lake_mirror")
    mr.add_argument("--concurrency", type=int, default=4)
    mr.add_argument("--num-cpus", type=int, default=None)

    rp = sub.add_parser(
        "replicate",
        help="lake->lake incremental replication: apply the source's change "
        "feed to a destination lake, whole catch-up window as one dst epoch "
        "(or --per-epoch to mirror source epochs 1:1), exactly-once "
        "(resumable, idempotent, O(changed bytes)/sync)",
    )
    rp.add_argument("--src", required=True)
    rp.add_argument("--dst", required=True)
    rp.add_argument("--partitions", type=int, default=16, help="dst layout (first sync only)")
    rp.add_argument("--frag-ranges", type=int, default=8)
    rp.add_argument("--salt-turn-width", type=int, default=None)
    rp.add_argument(
        "--per-epoch",
        action="store_true",
        help="one dst epoch per src epoch (per-epoch time travel on the "
        "replica) instead of one coalesced catch-up epoch",
    )
    rp.add_argument("--num-cpus", type=int, default=None)

    lk = sub.add_parser("lookup", help="keyed point lookup: live rows for specific conv_ids")
    lk.add_argument("--lake", required=True)
    lk.add_argument("--conv", action="append", default=None, help="conv_id (repeatable)")
    lk.add_argument(
        "--min-ts",
        default=None,
        help="time-slice: only rows with event-time >= this ISO timestamp; "
        "files wholly below it are pruned from the plan via manifest stats",
    )
    lk.add_argument(
        "--where",
        action="append",
        default=None,
        help="col=value equality filter applied post-merge inside read "
        "tasks (repeatable; value 'null' matches SQL NULL)",
    )
    lk.add_argument("--as-of-epoch", type=int, default=None)
    lk.add_argument("--as-of-tag", default=None,
                    help="read AS OF a named savepoint (see `tag`)")
    lk.add_argument("--staged", action="store_true",
                    help="read the STAGED (write-audit-publish) state — "
                    "the audit view before `publish`")
    lk.add_argument(
        "--value-idx",
        default=None,
        help="value-index dir (see `colindex`): prunes ranges whose live "
        "value set cannot satisfy the --where predicate on the indexed "
        "column; stale/unindexed ranges are never pruned",
    )
    lk.add_argument("--explain", action="store_true",
                    help="print the read PLAN only — per-tier pruning "
                    "counts (hash routing / Bloom / ts stats / value "
                    "index), files and estimated rows — no data reads")
    lk.add_argument(
        "--limit", type=int, default=1000,
        help="max rows printed (default 1000; the JSON carries the TRUE "
        "total row count). A broad predicate on a big lake would "
        "otherwise materialize the whole result on the driver; pass "
        "--limit 0 to explicitly dump everything",
    )
    lk.add_argument("--num-cpus", type=int, default=None)

    ci = sub.add_parser(
        "colindex",
        help="refresh the per-range distinct-VALUE index over one payload "
        "column (predicate pruning for lookup --where; incremental by "
        "manifest fingerprint)",
    )
    ci.add_argument("--lake", required=True)
    ci.add_argument("--idx", required=True, help="index directory")
    ci.add_argument("--column", required=True)
    ci.add_argument("--num-cpus", type=int, default=None)

    st = sub.add_parser(
        "sqltail",
        help="DataX WHERE-clause incremental sync: poll an append-only SQL "
        "log table for rows with pk > the lake's LSN watermark and replay "
        "them (lsn = pk, so exactly-once needs no extra bookkeeping)",
    )
    st.add_argument("--db", required=True, help="sqlite database file")
    st.add_argument("--table", required=True)
    st.add_argument("--lake", required=True)
    st.add_argument("--pk", default="id")
    st.add_argument("--partitions", type=int, default=16)
    st.add_argument("--num-splits", type=int, default=8)
    st.add_argument("--max-polls", type=int, default=1)
    st.add_argument("--interval", type=float, default=2.0)
    st.add_argument("--num-cpus", type=int, default=None)

    tg = sub.add_parser(
        "tag",
        help="named savepoints: tag a committed epoch; tagged epochs "
        "survive vacuum (durable time-travel anchors)",
    )
    tg.add_argument("--lake", required=True)
    tg.add_argument("--name", default=None)
    tg.add_argument("--epoch", type=int, default=None,
                    help="epoch to tag (default: latest committed)")
    tg.add_argument("--delete", action="store_true")
    tg.add_argument("--list", action="store_true")

    rs = sub.add_parser(
        "restore",
        help="Delta-style RESTORE: rewind visible state to a retained "
        "epoch (one data-free commit, zero data bytes moved); the ingest "
        "watermark stays at head so discarded changes stay discarded",
    )
    rs.add_argument("--lake", required=True)
    rs.add_argument("--to-epoch", type=int, default=None)
    rs.add_argument("--to-tag", default=None)

    pg = sub.add_parser(
        "purge",
        help="right-to-be-forgotten: tombstone all rows of conv_ids; "
        "--hard compacts affected ranges and vacuums history so the "
        "payload bytes are physically removed",
    )
    pg.add_argument("--lake", required=True)
    pg.add_argument("--conv", action="append", required=True, help="conv_id (repeatable)")
    pg.add_argument("--hard", action="store_true")
    pg.add_argument("--keep-epochs", type=int, default=1)
    pg.add_argument("--num-cpus", type=int, default=None)

    rt = sub.add_parser(
        "retention",
        help="age-based TTL: tombstone every live row with event time "
        "before --before (ISO timestamp); --hard compacts + vacuums so "
        "the payload bytes are physically removed",
    )
    rt.add_argument("--lake", required=True)
    rt.add_argument("--before", required=True,
                    help="ISO timestamp cutoff (rows with ts < cutoff go)")
    rt.add_argument("--hard", action="store_true")
    rt.add_argument("--keep-epochs", type=int, default=1)
    rt.add_argument("--num-cpus", type=int, default=None)

    ix = sub.add_parser(
        "index",
        help="refresh the incremental inverted text index (only ranges "
        "whose committed file set changed are re-tokenized)",
    )
    ix.add_argument("--lake", required=True)
    ix.add_argument("--idx", required=True)
    ix.add_argument("--num-cpus", type=int, default=None)

    se = sub.add_parser(
        "search",
        help="probe the inverted index: rows containing any/all terms",
    )
    se.add_argument("--idx", required=True)
    se.add_argument("--term", action="append", required=True, help="repeatable")
    se.add_argument("--all", action="store_true",
                    help="require ALL terms in the same turn")
    se.add_argument("--limit", type=int, default=50)
    se.add_argument("--num-cpus", type=int, default=None)

    dd = sub.add_parser(
        "dedupscan",
        help="refresh the incremental duplicate-content index (per-range "
        "hash postings, manifest-fingerprint skip) and report duplicate "
        "turn groups in the live lake state",
    )
    dd.add_argument("--lake", required=True)
    dd.add_argument("--idx", required=True)
    dd.add_argument("--min-count", type=int, default=2)
    dd.add_argument("--near", action="store_true",
                    help="NEAR-duplicates: word-3-gram shingle postings, "
                    "exact all-pairs Jaccard over the index (emission is "
                    "sum df(g)^2 — bounded-df corpora only; stop-word-"
                    "heavy text needs the LSH operator path)")
    dd.add_argument("--threshold", type=float, default=0.5,
                    help="Jaccard threshold for --near")
    dd.add_argument("--limit", type=int, default=20)
    dd.add_argument("--num-cpus", type=int, default=None)

    sk = sub.add_parser(
        "sketch",
        help="refresh the incremental HLL register MV over the lake "
        "(per-range artifacts, manifest-fingerprint skip) and print the "
        "distinct-conversation estimate",
    )
    sk.add_argument("--lake", required=True)
    sk.add_argument("--idx", required=True, help="sketch artifact dir")
    sk.add_argument("--p", type=int, default=None,
                    help="register precision (2^p buckets); omitted -> "
                    "reuse the sketch's stored p (9 for a fresh one)")
    sk.add_argument("--num-cpus", type=int, default=None)

    vx = sub.add_parser(
        "vecindex",
        help="refresh the incremental IVF vector index over an embeddings "
        "parquet source (only fragments whose fingerprint changed are "
        "re-assigned; the quantizer fits once from a distributed sample)",
    )
    vx.add_argument("--src", required=True, help="embeddings parquet file/dir")
    vx.add_argument("--idx", required=True)
    vx.add_argument("--lists", type=int, default=16)
    vx.add_argument("--sample", type=int, default=2048)
    vx.add_argument("--vec-col", default="embedding")
    vx.add_argument("--id-col", default="vec_id")
    vx.add_argument("--num-cpus", type=int, default=None)

    vs = sub.add_parser(
        "vecsearch",
        help="approximate cosine top-k against the persisted IVF index "
        "(probes nprobe lists; row-group pruning skips the rest)",
    )
    vs.add_argument("--idx", required=True)
    vs.add_argument("--query-src", required=True,
                    help="parquet file holding the query vector(s)")
    vs.add_argument("--query-id", type=int, action="append", default=None,
                    help="vec_id(s) in --query-src to use as queries "
                    "(repeatable; default: first row)")
    vs.add_argument("--k", type=int, default=10)
    vs.add_argument("--nprobe", type=int, default=4)
    vs.add_argument("--vec-col", default="embedding")
    vs.add_argument("--id-col", default="vec_id")
    vs.add_argument("--num-cpus", type=int, default=None)

    rp = sub.add_parser(
        "repartition",
        help="migrate the lake to a new partition/salt layout in one "
        "atomic epoch (rows re-routed via storage, no in-memory shuffle); "
        "subsequent replays adopt the new layout automatically",
    )
    rp.add_argument("--lake", required=True)
    rp.add_argument("--partitions", type=int, required=True)
    rp.add_argument("--frag-ranges", type=int, default=None)
    rp.add_argument("--salt-turn-width", type=int, default=None,
                    help="omit to drop any existing salt")
    rp.add_argument("--no-compact", action="store_true")
    rp.add_argument("--num-cpus", type=int, default=None)

    cl = sub.add_parser(
        "clone",
        help="branch the lake at an epoch into a new directory "
        "(hardlinks — O(metadata), copy-on-write at file granularity)",
    )
    cl.add_argument("--src", required=True)
    cl.add_argument("--dst", required=True)
    cl.add_argument("--as-of-epoch", type=int, default=None)
    cl.add_argument("--copy", action="store_true",
                    help="physical copy instead of hardlinks")

    mbk = sub.add_parser(
        "mergeback",
        help="merge a cloned branch's divergence back into its parent: "
        "branch winners for every key its post-branch-point feed touched "
        "upsert as one dominating epoch; value-equal keys skip (re-runs "
        "converge); keys changed on BOTH sides since the branch point "
        "resolve per --on-conflict",
    )
    mbk.add_argument("--parent", required=True)
    mbk.add_argument("--branch", required=True)
    mbk.add_argument("--on-conflict", default="branch",
                     choices=["branch", "parent", "abort"])
    mbk.add_argument("--dry-run", action="store_true",
                     help="full plan incl. conflict detection, no writes: "
                     "`applied` reports what WOULD merge")
    mbk.add_argument("--list-conflicts", type=int, default=0, metavar="N",
                     help="include up to N conflicting keys in the result")
    mbk.add_argument("--num-cpus", type=int, default=None)

    fk = sub.add_parser(
        "fsck",
        help="check lake invariants: manifest chain, referenced files, "
        "orphans, row accounting; --deep re-hashes fragment bytes",
    )
    fk.add_argument("--lake", required=True)
    fk.add_argument("--deep", action="store_true")
    fk.add_argument("--num-cpus", type=int, default=None)

    al = sub.add_parser(
        "alter",
        help="set/clear LAKE-LEVEL ingest expectations (persisted table "
        "CHECK constraints, enforced by every subsequent replay)",
    )
    al.add_argument("--lake", required=True)
    al.add_argument("--expectations", default=None,
                    help="JSON file with the constraint spec to persist")
    al.add_argument("--clear-expectations", action="store_true")
    al.add_argument("--schema-policy", default=None,
                    help="pin a DDL-compatibility policy on the lake: "
                    "'additive' (add_column only) or 'compatible' "
                    "(add_column + widen); later replays abort loudly on "
                    "forbidden DDL verbs before writing anything")
    al.add_argument("--clear-schema-policy", action="store_true")
    al.add_argument("--clear-cluster-by", action="store_true",
                    help="stop ts-clustering future compactions "
                    "(set via `compact --cluster-ts`)")

    s = sub.add_parser("show", help="print the committed manifest summary")
    s.add_argument("--lake", required=True)

    hi = sub.add_parser(
        "history",
        help="one JSON line per committed epoch: segments, rows written, "
        "lsn watermark, operation kind (replay/compact/purge/migration/...)",
    )
    hi.add_argument("--lake", required=True)

    a = p.parse_args(argv)

    if a.cmd == "gen":
        from datax_ray.fixtures.generator import gen_changes_dir

        paths = gen_changes_dir(
            a.out,
            n_events=a.events,
            n_convs=a.convs,
            seed=a.seed,
            seg_rows=a.seg_rows,
            out_of_order_frac=a.out_of_order,
            dup_frac=a.dup,
            corrupt_frac=a.corrupt,
            hot_key_zipf_s=a.zipf,
            with_ddl=a.ddl,
        )
        print(json.dumps({"segments": len(paths), "out": a.out}))
        return 0

    if a.cmd == "replay" and a.dry_run:
        # plan-only: manifest metadata + parquet footers, no Ray session
        import pyarrow.parquet as _pq

        from datax_ray.sources.changelog import plan_epochs, plan_epochs_multi
        from datax_ray.state.manifest import Manifest

        def _rows(paths):
            n = 0
            for p in paths:
                if p.endswith(".parquet"):
                    n += _pq.ParquetFile(p).metadata.num_rows
            return n

        m = Manifest(a.lake)
        srcs = _parse_sources(a.source)
        if srcs:
            epochs = plan_epochs_multi(srcs, m, a.segments_per_epoch)
            plan = [
                {
                    "epoch": m.committed_epoch() + 1 + i,
                    "per_source": {
                        name: {"segments": len(paths), "rows_est": _rows(paths)}
                        for name, paths in ep.items()
                    },
                }
                for i, ep in enumerate(epochs)
            ]
        else:
            epochs = plan_epochs(a.changes, m, a.segments_per_epoch)
            plan = [
                {
                    "epoch": m.committed_epoch() + 1 + i,
                    "segments": len(segs),
                    "rows_est": _rows(segs),
                }
                for i, segs in enumerate(epochs)
            ]
        print(json.dumps({
            "lake": a.lake,
            "committed_epoch": m.committed_epoch(),
            "pending_epochs": len(plan),
            "plan": plan,
        }))
        return 0

    if a.cmd == "diff":
        _ensure_ray(a.num_cpus)
        import ray

        from datax_ray.pipelines.feed import change_feed_summary

        print(json.dumps(change_feed_summary(
            a.lake, a.from_epoch, a.to_epoch
        )))
        ray.shutdown()
        return 0

    if a.cmd == "replay":
        _ensure_ray(a.num_cpus)
        import ray

        from datax_ray.pipelines.replay import ReplayConfig, replay

        reports = replay(
            ReplayConfig(
                changes_dir=a.changes,
                sources=_parse_sources(a.source),
                lake_dir=a.lake,
                num_partitions=a.partitions,
                segments_per_epoch=a.segments_per_epoch,
                salt_turn_width=a.salt_turn_width,
                error_limit_rows=a.error_limit_rows,
                error_limit_pct=a.error_limit_pct,
                batch_size=a.batch_size,
                transformers=(
                    json.load(open(a.transformers)) if a.transformers else None
                ),
                expectations=(
                    json.load(open(a.expectations)) if a.expectations else None
                ),
                auto_ddl=a.auto_ddl,
            ),
            stage=a.stage,
        )
        for rep in reports:
            print(
                json.dumps(
                    {
                        "epoch": rep.epoch,
                        "segments": len(rep.segments),
                        "events_in": rep.events_in,
                        "rows_out": rep.rows_out,
                        "dirty_rows": rep.dirty_rows,
                        "wall_s": round(rep.wall_s, 3),
                        "events_per_s": round(rep.events_in / max(rep.wall_s, 1e-9)),
                        **({"staged": True} if a.stage else {}),
                    }
                )
            )
        if not reports:
            print(json.dumps({"status": "up-to-date (all segments committed)"}))
        ray.shutdown()
        return 0

    if a.cmd == "consume":
        if (a.addr is None) == (a.broker is None):
            print(json.dumps(
                {"error": "pass exactly one of --addr or --broker"}))
            return 2
        _ensure_ray(a.num_cpus)
        import ray

        from datax_ray.pipelines.replay import ReplayConfig
        from datax_ray.sources.stream import (
            FileBrokerConsumer,
            SocketConsumer,
            stream_ingest,
            stream_tail,
        )

        if a.addr is not None:
            host, _, port = a.addr.rpartition(":")
            source = SocketConsumer((host or "127.0.0.1", int(port)))
        else:
            source = FileBrokerConsumer(a.broker, partition=a.partition)
        cfg = None
        if a.lake:
            cfg = ReplayConfig(
                changes_dir=a.changes, lake_dir=a.lake,
                num_partitions=a.partitions, segments_per_epoch=10**9,
            )
        if a.pipelined:
            if cfg is None:
                print(json.dumps({"error": "--pipelined needs --lake"}))
                return 2
            out = stream_tail(
                source, a.spool, a.changes, cfg,
                batch_records=a.batch_records,
                epoch_records=a.epoch_records,
            )
        else:
            out = stream_ingest(
                source, a.spool, a.changes, replay_cfg=cfg,
                batch_records=a.batch_records,
            )
            source.close()
        print(json.dumps(out))
        ray.shutdown()
        return 0

    if a.cmd == "tail":
        _ensure_ray(a.num_cpus)
        import ray

        from datax_ray.pipelines.replay import ReplayConfig, tail

        def _emit(rep):
            print(
                json.dumps(
                    {
                        "epoch": rep.epoch,
                        "segments": len(rep.segments),
                        "events_in": rep.events_in,
                        "rows_out": rep.rows_out,
                        "dirty_rows": rep.dirty_rows,
                        "wall_s": round(rep.wall_s, 3),
                    }
                ),
                flush=True,
            )
            # keep incremental artifacts warm: each refresh is
            # fingerprint-skipped, so only this epoch's changed ranges pay
            if a.refresh_mv:
                from datax_ray.pipelines.mv import refresh_mv

                refresh_mv(a.lake, a.refresh_mv)
            if a.refresh_index:
                from datax_ray.pipelines.index import refresh_index

                refresh_index(a.lake, a.refresh_index)
            if a.refresh_sketch:
                from datax_ray.pipelines.sketchmv import refresh_sketch

                refresh_sketch(a.lake, a.refresh_sketch)
            if a.sync:
                from datax_ray.pipelines.registry import sync_artifacts

                s = sync_artifacts(a.lake)
                print(json.dumps({"sync": {
                    "synced": s["synced"], "failed": s["failed"]}}),
                    flush=True)

        reports = tail(
            ReplayConfig(
                changes_dir=a.changes,
                sources=_parse_sources(a.source),
                lake_dir=a.lake,
                num_partitions=a.partitions,
                segments_per_epoch=a.segments_per_epoch,
                salt_turn_width=a.salt_turn_width,
            ),
            poll_interval_s=a.interval,
            max_polls=a.max_polls,
            idle_exit=a.idle_exit,
            on_epoch=_emit,
        )
        print(json.dumps({"status": "tail-exit", "epochs": len(reports)}))
        ray.shutdown()
        return 0

    if a.cmd == "bootstrap":
        _ensure_ray(a.num_cpus)
        import ray

        from datax_ray.pipelines.bootstrap import bootstrap
        from datax_ray.pipelines.replay import ReplayConfig

        if bool(a.src) == bool(a.sql):
            raise SystemExit("bootstrap: pass exactly one of --src / --sql")
        src_ds = None
        label = None
        if a.sql:
            import functools
            import sqlite3

            import pyarrow as _pa

            from datax_ray.schemas import LAKE_SCHEMA
            from datax_ray.sources.sqlsource import read_sql_table

            cols = [f.name for f in LAKE_SCHEMA if not f.name.startswith("_")]
            src_ds = read_sql_table(
                functools.partial(
                    sqlite3.connect, a.sql, 30.0, check_same_thread=False
                ),
                a.table,
                columns=cols,
                split_pk=a.split_pk,
                num_splits=a.sql_splits,
                schema=_pa.schema([
                    (f.name, f.type) for f in LAKE_SCHEMA
                    if not f.name.startswith("_")
                ]),
            )
            label = f"{os.path.basename(a.sql)}:{a.table}"
        rep = bootstrap(
            a.src,
            ReplayConfig(
                changes_dir="",
                lake_dir=a.lake,
                num_partitions=a.partitions,
                salt_turn_width=a.salt_turn_width,
            ),
            src_ds=src_ds,
            src_label=label,
        )
        print(json.dumps({
            "epoch": rep.epoch, "rows_in": rep.events_in, "rows_out": rep.rows_out,
            "dirty_rows": rep.dirty_rows, "wall_s": round(rep.wall_s, 3),
        }))
        ray.shutdown()
        return 0

    if a.cmd == "verify":
        _ensure_ray(a.num_cpus)
        import pyarrow.dataset as pads
        import pyarrow.parquet as _pq
        import ray

        from datax_ray.oracle import sequential_replay
        from datax_ray.sinks.lake import final_table
        from datax_ray.sources.changelog import list_segments

        srcs = _parse_sources(a.source)
        if bool(a.changes) == bool(srcs):
            raise SystemExit("verify needs exactly one of --changes / --source")
        if srcs:
            # multi-source lake: oracle folds the union of the producer
            # logs under the lake's pinned glsn remap (replay.py design)
            import pyarrow as _pa
            import pyarrow.compute as _pc

            from datax_ray.state.manifest import Manifest

            ms = Manifest(a.lake).committed_properties().get("multisource") or {}
            slots = int(ms.get("slots", 64))
            smap = ms.get("sources") or {}
            parts = []
            for i, name in enumerate(sorted(srcs)):
                t = pads.dataset(list_segments(srcs[name])).to_table()
                slot = int(smap.get(name, {}).get("slot", i))
                glsn = _pc.add(
                    _pc.multiply_checked(_pc.cast(t["lsn"], "int64"), slots),
                    slot,
                )
                t = t.set_column(t.schema.get_field_index("lsn"), "lsn", glsn)
                parts.append(t)
            changes = _pa.concat_tables(parts, promote_options="default")
        else:
            changes = pads.dataset(list_segments(a.changes)).to_table()
        base = _pq.read_table(a.base) if a.base else None
        if a.sample_convs is not None:
            from datax_ray.oracle import sampled_verify

            out = sampled_verify(changes, a.lake, a.sample_convs, base=base)
            print(json.dumps(out))
            ray.shutdown()
            return 0 if out["match"] else 1
        oracle = sequential_replay(changes, base=base)
        ours = final_table(a.lake, as_of_epoch="staged" if a.staged else None)
        ok = ours.schema.equals(oracle.schema) and ours.equals(oracle)
        print(json.dumps({"match": bool(ok), "rows": ours.num_rows, "oracle_rows": oracle.num_rows}))
        ray.shutdown()
        return 0 if ok else 1

    if a.cmd == "publish":
        from datax_ray.state.manifest import Manifest

        m = Manifest(a.lake)
        if a.abort:
            rec = m.abort_staged()
            print(json.dumps({
                "aborted": rec is not None,
                "epoch": rec["epoch"] if rec else None,
            }))
            return 0
        rec = m.publish_staged()
        print(json.dumps({"published_epoch": rec["epoch"],
                          "segments": len(rec.get("segments", []))}))
        return 0

    if a.cmd == "status":
        from datax_ray.pipelines.status import lake_status

        print(json.dumps(lake_status(a.lake), indent=1))
        return 0

    if a.cmd == "compact":
        _ensure_ray(a.num_cpus)
        import ray

        from datax_ray.pipelines.replay import ReplayConfig, compact_lake

        only = None
        if a.min_frags is not None:
            from datax_ray.state.manifest import Manifest

            ranges = Manifest(a.lake).current_ranges()
            only = {
                rid for rid, rec in ranges.items()
                if len(rec.get("frags", [])) >= a.min_frags
            }
        out = compact_lake(
            ReplayConfig(changes_dir="", lake_dir=a.lake), only_rids=only,
            cluster_ts=a.cluster_ts,
        )
        print(json.dumps(out))
        ray.shutdown()
        return 0

    if a.cmd == "export":
        _ensure_ray(a.num_cpus)
        import ray

        from datax_ray.sinks.export import export_lake, export_lake_incremental

        if a.incremental:
            if a.partition_by or a.as_of_epoch is not None:
                raise SystemExit(
                    "--incremental is exclusive with --partition-by/--as-of-epoch"
                )
            out = export_lake_incremental(
                a.lake, a.out, fmt=a.format,
                transformers=(
                    json.load(open(a.transformers)) if a.transformers else None
                ),
            )
            print(json.dumps(out))
            ray.shutdown()
            return 0
        xf = json.load(open(a.transformers)) if a.transformers else None
        if a.partition_spec:
            from datax_ray.sinks.export import export_partition

            spec = dict(kv.split("=", 1) for kv in a.partition_spec)
            rows = export_partition(
                a.lake, a.out, spec, fmt=a.format,
                as_of_epoch=a.as_of_epoch, truncate=not a.append,
                transformers=xf,
            )
        else:
            rows = export_lake(a.lake, a.out, fmt=a.format,
                               as_of_epoch=a.as_of_epoch,
                               partition_by=a.partition_by,
                               transformers=xf, overwrite=a.overwrite)
        print(json.dumps({"rows": rows, "out": a.out, "format": a.format,
                          "partition_by": a.partition_by}))
        ray.shutdown()
        return 0

    if a.cmd == "vacuum":
        from datax_ray.state.manifest import Manifest

        out = Manifest(a.lake).vacuum(
            keep_epochs=a.keep_epochs, older_than_s=a.older_than
        )
        print(json.dumps(out))
        return 0

    if a.cmd == "redrive":
        _ensure_ray(a.num_cpus)
        import ray

        from datax_ray.pipelines.redrive import redrive
        from datax_ray.pipelines.replay import ReplayConfig

        out = redrive(
            ReplayConfig(
                changes_dir="",  # redrive reads the lake's own dl dir
                lake_dir=a.lake,
                batch_size=a.batch_size,
                expectations=(
                    json.load(open(a.expectations)) if a.expectations else None
                ),
            ),
            fix_transformers=(
                json.load(open(a.transformers)) if a.transformers else None
            ),
        )
        print(json.dumps(out))
        ray.shutdown()
        return 0

    if a.cmd == "mv":
        _ensure_ray(a.num_cpus)
        import ray

        from datax_ray.pipelines.mv import refresh_mv

        out = refresh_mv(a.lake, a.mv)
        print(json.dumps(out))
        ray.shutdown()
        return 0

    if a.cmd == "mvadd":
        _ensure_ray(a.num_cpus)
        from datax_ray.pipelines.mvadd import refresh_mv_additive

        print(json.dumps(refresh_mv_additive(a.lake, a.mv, rebuild=a.rebuild)))
        return 0

    if a.cmd == "cmsmv":
        _ensure_ray(a.num_cpus)
        from datax_ray.pipelines.cmsmv import cms_mv_estimate, refresh_cms_mv

        out = refresh_cms_mv(
            a.lake, a.mv, depth=a.depth, width=a.width, rebuild=a.rebuild
        )
        if a.query:
            est = cms_mv_estimate(a.mv, a.query)
            out["estimates"] = dict(
                zip(est["conv_id"].to_pylist(), est["est_turns"].to_pylist())
            )
        print(json.dumps(out))
        return 0

    if a.cmd == "mvhist":
        _ensure_ray(a.num_cpus)
        from datax_ray.pipelines.mvhist import hist_quantiles, refresh_mv_hist

        out = refresh_mv_hist(
            a.lake, a.mv, group_col=a.group_col,
            bucket_width=a.bucket_width, rebuild=a.rebuild,
        )
        if a.quantiles:
            qs = [float(x) for x in a.quantiles.split(",") if x]
            out["quantiles"] = [
                dict(zip(("group_val", "q", "value"), row))
                for row in zip(*(c.to_pylist() for c in hist_quantiles(a.mv, qs).columns))
            ]
        print(json.dumps(out))
        return 0

    if a.cmd == "feedout":
        _ensure_ray(a.num_cpus)
        from datax_ray.sinks.feedout import export_change_feed_envelopes

        print(json.dumps(export_change_feed_envelopes(
            a.lake, a.out, fmt=a.format
        )))
        return 0

    if a.cmd == "backfill":
        _ensure_ray(a.num_cpus)
        from datax_ray.pipelines.backfill import backfill

        with open(a.transformers) as f:
            specs = json.load(f)
        where = None
        if a.where:
            k, _, v = a.where.partition("=")
            where = {k: (None if v == "null" else v)}
        print(json.dumps(backfill(a.lake, specs, where=where,
                                  conv_ids=a.conv)))
        return 0

    if a.cmd == "merge":
        if bool(a.source) == bool(a.sql):
            raise SystemExit("merge needs exactly one of --source / --sql")
        _ensure_ray(a.num_cpus)
        from datax_ray.pipelines.mergeinto import merge_into

        source = a.source
        if a.sql:
            import functools
            import sqlite3

            from datax_ray.sources.sqlsource import check_identifier, read_sql_table

            check_identifier(a.table, "table name")
            factory = functools.partial(
                sqlite3.connect, a.sql, 30.0, check_same_thread=False
            )
            if a.columns:
                cols = [c.strip() for c in a.columns.split(",")]
            else:
                conn = factory()
                try:
                    cur = conn.execute(f"SELECT * FROM {a.table} LIMIT 0")
                    cols = [d[0] for d in cur.description]
                finally:
                    conn.close()
            source = read_sql_table(
                factory, a.table, columns=cols, split_pk=a.split_pk
            )

        print(json.dumps(merge_into(
            a.lake, source,
            when_matched=a.when_matched,
            when_not_matched=a.when_not_matched,
            matched_cond=json.loads(a.matched_cond) if a.matched_cond else None,
            not_matched_cond=(
                json.loads(a.not_matched_cond) if a.not_matched_cond else None
            ),
            dry_run=a.dry_run,
        )))
        return 0

    if a.cmd == "envingest":
        from datax_ray.sources.envelope import envelopes_to_segments

        out = envelopes_to_segments(a.env, a.changes)
        if a.lake:
            _ensure_ray(a.num_cpus)
            from datax_ray.pipelines.replay import ReplayConfig, replay

            from dataclasses import asdict

            out["replay"] = [
                {k: v for k, v in asdict(r).items() if k != "segments"}
                for r in replay(ReplayConfig(
                    changes_dir=a.changes, lake_dir=a.lake,
                    num_partitions=a.partitions,
                ))
            ]
        print(json.dumps(out))
        return 0

    if a.cmd == "register":
        from datax_ray.pipelines.registry import (
            list_artifacts,
            register_artifact,
            unregister_artifact,
        )

        if a.list:
            print(json.dumps(list_artifacts(a.lake), indent=1))
            return 0
        if not a.name:
            print("register: --name is required", file=sys.stderr)
            return 2
        if a.delete:
            print(json.dumps(unregister_artifact(a.lake, a.name)))
            return 0
        if not a.kind or not a.dir:
            print("register: --kind and --dir are required", file=sys.stderr)
            return 2
        params = {}
        for kv in a.param:
            k, _, v = kv.partition("=")
            try:
                params[k] = json.loads(v)
            except json.JSONDecodeError:
                params[k] = v
        print(json.dumps(register_artifact(a.lake, a.name, a.kind, a.dir,
                                           params)))
        return 0

    if a.cmd == "sync":
        _ensure_ray(a.num_cpus)
        from datax_ray.pipelines.registry import sync_artifacts

        out = sync_artifacts(a.lake, only=a.only)
        print(json.dumps(out))
        return 0 if out["failed"] == 0 else 1

    if a.cmd == "mvsession":
        _ensure_ray(a.num_cpus)
        from datax_ray.pipelines.mvsession import refresh_mv_session

        print(json.dumps(refresh_mv_session(
            a.lake, a.mv, gap_s=a.gap, rebuild=a.rebuild,
        )))
        return 0

    if a.cmd == "mvwindow":
        _ensure_ray(a.num_cpus)
        from datax_ray.pipelines.mvwindow import admit_late_events, refresh_mv_window

        if a.admit_late:
            print(json.dumps(admit_late_events(a.mv)))
            return 0
        print(json.dumps(refresh_mv_window(
            a.lake, a.mv, window_s=a.window, lateness_s=a.lateness,
            hop_s=a.hop, rebuild=a.rebuild,
        )))
        return 0

    if a.cmd == "mvasof":
        _ensure_ray(a.num_cpus)
        from datax_ray.pipelines.mvasof import refresh_mv_asof

        print(json.dumps(refresh_mv_asof(
            a.left, a.right, a.mv, rebuild=a.rebuild
        )))
        return 0

    if a.cmd == "mvjoin":
        _ensure_ray(a.num_cpus)
        from datax_ray.pipelines.mvjoin import refresh_mv_join

        print(json.dumps(
            refresh_mv_join(a.left, a.right, a.mv, rebuild=a.rebuild)
        ))
        return 0

    if a.cmd == "colindex":
        _ensure_ray(a.num_cpus)
        import ray

        from datax_ray.pipelines.colindex import refresh_value_index

        print(json.dumps(refresh_value_index(a.lake, a.idx, a.column)))
        ray.shutdown()
        return 0

    if a.cmd == "job":
        _ensure_ray(a.num_cpus)
        import ray

        from datax_ray.pipelines.job import run_job

        out = run_job(a.config)
        print(json.dumps(out))
        ray.shutdown()
        return 0

    if a.cmd == "feed":
        _ensure_ray(a.num_cpus)
        import ray

        from datax_ray.pipelines.feed import (
            plan_change_feed,
            read_change_feed,
            read_change_feed_preimages,
        )

        from_epoch, to_epoch = a.from_epoch, a.to_epoch
        if a.consumer:
            from datax_ray.pipelines.feed import consumer_offset
            from datax_ray.state.manifest import Manifest as _M

            from_epoch = consumer_offset(a.lake, a.consumer)
            if to_epoch is None:
                to_epoch = _M(a.lake).committed_epoch()
        if a.preimages:
            from datax_ray.pipelines.feed import plan_feed_preimages

            pplan = plan_feed_preimages(a.lake, from_epoch, to_epoch)
            plan = [
                {"epoch": p["epoch"], "file": f}
                for p in pplan
                for f in json.loads(p["new_files"])
            ]
            ds = read_change_feed_preimages(a.lake, from_epoch, to_epoch)
        else:
            plan = plan_change_feed(a.lake, from_epoch, to_epoch)
            ds = read_change_feed(a.lake, from_epoch, to_epoch)
        if a.out:
            ds.write_parquet(a.out)
        rows = ds.count() if not a.out else None
        if a.consumer and to_epoch is not None and to_epoch > from_epoch:
            # acknowledge AFTER the delivery effect (out file / count) —
            # at-least-once: a crash above re-delivers the same epochs
            from datax_ray.pipelines.feed import commit_consumer

            commit_consumer(a.lake, a.consumer, to_epoch)
        print(
            json.dumps(
                {
                    "files": len(plan),
                    "epochs": sorted({p["epoch"] for p in plan}),
                    **({"consumer": a.consumer,
                        "from_epoch": from_epoch,
                        "to_epoch": to_epoch} if a.consumer else {}),
                    **({"rows": rows} if rows is not None else {"out": a.out}),
                }
            )
        )
        ray.shutdown()
        return 0

    if a.cmd == "mirror":
        _ensure_ray(a.num_cpus)
        import functools
        import sqlite3

        import ray

        from datax_ray.pipelines.mirror import mirror_to_sql

        stats = mirror_to_sql(
            a.lake,
            functools.partial(sqlite3.connect, a.db, 30.0, check_same_thread=False),
            a.table,
            concurrency=a.concurrency,
        )
        print(json.dumps(stats))
        ray.shutdown()
        return 0

    if a.cmd == "purge":
        _ensure_ray(a.num_cpus)
        from datax_ray.pipelines.purge import purge

        print(json.dumps(purge(
            a.lake, a.conv, hard=a.hard, keep_epochs=a.keep_epochs
        )))
        return 0

    if a.cmd == "retention":
        _ensure_ray(a.num_cpus)
        import pandas as _pd

        from datax_ray.pipelines.purge import retention

        cutoff_us = int(_pd.Timestamp(a.before).value // 1000)
        print(json.dumps(retention(
            a.lake, cutoff_us, hard=a.hard, keep_epochs=a.keep_epochs
        )))
        return 0

    if a.cmd == "clone":
        from datax_ray.pipelines.clone import clone_lake

        print(json.dumps(clone_lake(
            a.src, a.dst, as_of_epoch=a.as_of_epoch, copy=a.copy
        )))
        return 0

    if a.cmd == "mergeback":
        _ensure_ray(a.num_cpus)
        from datax_ray.pipelines.mergeback import merge_back

        print(json.dumps(merge_back(
            a.parent, a.branch, on_conflict=a.on_conflict, dry_run=a.dry_run,
            list_conflicts=a.list_conflicts,
        )))
        return 0

    if a.cmd == "fsck":
        if a.deep:
            _ensure_ray(a.num_cpus)
        from datax_ray.pipelines.fsck import fsck

        rep = fsck(a.lake, deep=a.deep)
        print(json.dumps(rep))
        return 0 if rep["ok"] else 1

    if a.cmd == "index":
        _ensure_ray(a.num_cpus)
        from datax_ray.pipelines.index import refresh_index

        print(json.dumps(refresh_index(a.lake, a.idx)))
        return 0

    if a.cmd == "search":
        _ensure_ray(a.num_cpus)
        from datax_ray.pipelines.index import search_index

        ds = search_index(a.idx, a.term, mode="all" if a.all else "any")
        total = ds.count()
        rows = ds.limit(a.limit).take_all()
        print(json.dumps({"hits": total, "shown": len(rows), "rows": rows}))
        return 0

    if a.cmd == "dedupscan":
        _ensure_ray(a.num_cpus)
        if a.near:
            from datax_ray.pipelines.dedupscan import (
                near_duplicate_pairs,
                refresh_neardup_index,
            )

            stats = refresh_neardup_index(a.lake, a.idx)
            pairs = near_duplicate_pairs(a.idx, threshold=a.threshold)
            total = pairs.count()
            rows = pairs.sort(
                ["jacc_milli", "conv_a", "turn_a"],
                descending=[True, False, False],
            ).limit(a.limit).take_all()
            print(json.dumps({**stats, "pair_rows": total, "shown": rows}))
            return 0
        from datax_ray.pipelines.dedupscan import (
            duplicate_groups,
            refresh_dedup_index,
        )

        stats = refresh_dedup_index(a.lake, a.idx)
        groups = duplicate_groups(a.idx, min_count=a.min_count)
        total = groups.count()
        rows = groups.sort(
            ["grp_size", "conv_id", "turn_idx"], descending=[True, False, False]
        ).limit(a.limit).take_all()
        print(json.dumps({**stats, "dup_rows": total, "shown": rows}))
        return 0

    if a.cmd == "sketch":
        _ensure_ray(a.num_cpus)
        import pyarrow as pa

        from datax_ray.pipelines.sketchmv import (
            estimate_distinct,
            read_sketch,
            refresh_sketch,
        )

        stats = refresh_sketch(a.lake, a.idx, p=a.p)
        from datax_ray.pipelines.sketchmv import _load_state as _sk_state

        eff_p = int(_sk_state(a.idx).get("_p", a.p or 9))
        regs = pa.Table.from_pylist(read_sketch(a.idx).take_all())
        est = estimate_distinct(regs, p=eff_p) if regs.num_rows else 0.0
        print(json.dumps({**stats, "registers": regs.num_rows,
                          "distinct_convs_est": round(est, 1)}))
        return 0

    if a.cmd == "vecindex":
        _ensure_ray(a.num_cpus)
        from datax_ray.pipelines.vecindex import refresh_vector_index

        print(json.dumps(refresh_vector_index(
            a.src, a.idx, n_lists=a.lists, sample_size=a.sample,
            vec_col=a.vec_col, id_col=a.id_col,
        )))
        return 0

    if a.cmd == "vecsearch":
        _ensure_ray(a.num_cpus)
        import numpy as np
        import pyarrow.dataset as pads

        from datax_ray.pipelines.vecindex import search_vector_index

        dset = pads.dataset(a.query_src)
        if a.query_id:
            t = dset.to_table(
                columns=[a.id_col, a.vec_col],
                filter=pads.field(a.id_col).isin(a.query_id),
            )
        else:
            t = dset.head(1, columns=[a.id_col, a.vec_col])
        queries = np.asarray(t[a.vec_col].to_pylist(), dtype=np.float64)
        rows = search_vector_index(
            a.idx, queries, k=a.k, nprobe=a.nprobe
        ).take_all()
        qids = t[a.id_col].to_pylist()
        for r in rows:
            r["query_vec_id"] = qids[r.pop("query_id")]
        print(json.dumps({"hits": len(rows), "rows": rows}))
        return 0

    if a.cmd == "repartition":
        _ensure_ray(a.num_cpus)
        from datax_ray.pipelines.repartition import repartition_lake

        print(json.dumps(repartition_lake(
            a.lake,
            a.partitions,
            frag_ranges=a.frag_ranges,
            salt_turn_width=a.salt_turn_width,
            compact=not a.no_compact,
        )))
        return 0

    if a.cmd == "replicate":
        _ensure_ray(a.num_cpus)
        import ray

        from datax_ray.pipelines.replicate import replicate

        stats = replicate(
            a.src,
            a.dst,
            num_partitions=a.partitions,
            frag_ranges=a.frag_ranges,
            salt_turn_width=a.salt_turn_width,
            per_epoch=a.per_epoch,
        )
        print(json.dumps(stats))
        ray.shutdown()
        return 0

    if a.cmd == "lookup":
        _ensure_ray(a.num_cpus)
        import ray

        from datax_ray.sinks.lake import LakeDatasource, read_lake

        if a.as_of_tag is not None:
            from datax_ray.state.manifest import Manifest as _M

            a.as_of_epoch = _M(a.lake).resolve_tag(a.as_of_tag)
        if a.staged:
            a.as_of_epoch = "staged"
        if (a.conv is None and a.min_ts is None and a.where is None
                and not a.explain):
            print(json.dumps({"error": "pass --conv, --min-ts and/or --where"}))
            return 2
        where = None
        if a.where:
            where = {}
            for spec in a.where:
                col, _, val = spec.partition("=")
                where[col] = None if val == "null" else val
        src = LakeDatasource(
            a.lake, as_of_epoch=a.as_of_epoch, conv_ids=a.conv, min_ts=a.min_ts,
            where=where, where_index_dir=a.value_idx,
        )
        if a.explain:
            # the PLAN only — which pruning tier dropped what — without
            # reading a single data byte
            print(json.dumps(src._explain, indent=1))
            ray.shutdown()
            return 0
        rows, total = [], 0
        if src._parts:
            ds = read_lake(
                a.lake, as_of_epoch=a.as_of_epoch, conv_ids=a.conv, min_ts=a.min_ts,
                where=where, where_index_dir=a.value_idx,
            ).sort(["conv_id", "turn_idx"])
            # bounded driver materialization: only --limit rows cross to
            # the driver (--limit 0 = explicit full dump); the true total
            # is a distributed count
            if a.limit and a.limit > 0:
                total = ds.count()
                t = ds.limit(a.limit).take_all()
            else:
                t = ds.take_all()
                total = len(t)
            rows = [
                {k: (v.isoformat() if hasattr(v, "isoformat") else v) for k, v in r.items()}
                for r in t
            ]
        print(json.dumps({"ranges_read": len(src._parts), "rows": rows,
                          "total_rows": total, "shown": len(rows)}))
        ray.shutdown()
        return 0

    if a.cmd == "history":
        from datax_ray.state.manifest import Manifest

        m = Manifest(a.lake)
        for e, p in m._epoch_files():
            rec = json.load(open(p))
            metrics = rec.get("metrics") or {}
            if "purge" in metrics:
                kind = "purge"
            elif "alter" in metrics:
                kind = "alter"
            elif "repartition" in metrics:
                kind = "migration"
            elif "restore" in metrics:
                kind = "restore"
            elif "cluster" in metrics:
                kind = "cluster"
            elif "branch" in metrics:
                kind = "branch-point"
            elif "merge" in metrics:
                kind = "merge"
            elif "mergeback" in metrics:
                kind = "merge-back"
            elif "backfill" in metrics:
                kind = "backfill"
            elif rec.get("segments"):
                kind = "replay"
            else:
                kind = "compact"
            lineage = rec.get("lineage") or []
            print(json.dumps({
                "epoch": e,
                "kind": kind,
                "segments": len(rec.get("segments", [])),
                "files_written": len(lineage),
                "rows_written": sum(int(r.get("rows", 0)) for r in lineage),
                "lsn_hi": rec.get("lsn_hi"),
            }))
        return 0

    if a.cmd == "sqltail":
        _ensure_ray(a.num_cpus)
        import sqlite3 as _sqlite3
        import time as _time

        import ray

        from datax_ray.sources.sqlsource import sql_tail

        db = a.db
        for i in range(a.max_polls):
            out = sql_tail(
                lambda: _sqlite3.connect(db),
                a.table,
                a.lake,
                pk=a.pk,
                num_splits=a.num_splits,
                num_partitions=a.partitions,
            )
            print(json.dumps(out))
            if i + 1 < a.max_polls:
                _time.sleep(a.interval)
        ray.shutdown()
        return 0

    if a.cmd == "tag":
        from datax_ray.state.manifest import Manifest

        m = Manifest(a.lake)
        if a.list or (a.name is None and not a.delete):
            print(json.dumps({"tags": m.tags()}))
            return 0
        if a.name is None:
            print(json.dumps({"error": "--delete requires --name"}))
            return 2
        if a.delete:
            print(json.dumps({"deleted": m.delete_tag(a.name), "name": a.name}))
            return 0
        epoch = m.set_tag(a.name, a.epoch)
        print(json.dumps({"name": a.name, "epoch": epoch}))
        return 0

    if a.cmd == "restore":
        from datax_ray.pipelines.replay import restore_lake

        print(json.dumps(restore_lake(a.lake, to_epoch=a.to_epoch,
                                      to_tag=a.to_tag)))
        return 0

    if a.cmd == "alter":
        from datax_ray.pipelines.replay import alter_lake

        out = alter_lake(
            a.lake,
            expectations=(
                json.load(open(a.expectations)) if a.expectations else None
            ),
            clear_expectations=a.clear_expectations,
            schema_policy=a.schema_policy,
            clear_schema_policy=a.clear_schema_policy,
            clear_cluster_by=a.clear_cluster_by,
        )
        print(json.dumps(out))
        return 0

    if a.cmd == "show":
        from datax_ray.state.manifest import Manifest

        rec = Manifest(a.lake).latest()
        if rec is None:
            print(json.dumps({"committed_epoch": None}))
        else:
            print(
                json.dumps(
                    {
                        "committed_epoch": rec["epoch"],
                        "lsn_hi": rec["lsn_hi"],
                        "segments": rec["segments"],
                        "partitions": len(rec["partitions"]),
                        "ranges_with_frags": sum(
                            1 for v in rec.get("ranges", {}).values() if v.get("frags")
                        ),
                        "rows": sum(v["rows"] for v in rec["partitions"].values())
                        + sum(v.get("rows", 0) for v in rec.get("ranges", {}).values()),
                        "schema": rec["schema"],
                        "properties": rec.get("properties") or {},
                        "metrics": rec.get("metrics", {}),
                    },
                    indent=1,
                )
            )
        return 0


if __name__ == "__main__":
    sys.exit(main())
