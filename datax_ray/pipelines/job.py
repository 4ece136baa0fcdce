"""DataX-style JSON job runner — the reference's actual user surface.

Upstream DataX's one entry point is `python datax.py job.json`: a JSON
config with `job.content[0].{reader,transformer,writer}` and
`job.setting.{speed,errorLimit}` (SURVEY.md §3.1; the connector families
are the ones named in /root/reference/README.md:2). This module re-expresses
that contract over Ray Data: the reader builds a streaming `Dataset`, the
transformer list compiles to ONE fused Arrow `map_batches` stage
(functions/transformers.py), and the writer is a per-batch sink stage with
content-hash filenames (idempotent under Ray task retry) — the whole job is
a single lazy pipeline, so backpressure/pipelining come from the streaming
executor exactly where DataX hand-built a bounded channel queue.

Readers: parquetreader / orcreader (stripe-split, column-pruned) /
csvreader / jsonlreader (path [+ columns]),
sqlitereader (the sandbox's JDBC stand-in — splitPk range planning via
sources/sqlsource.py), streamreader (DataX's synthetic test reader:
deterministic seeded columns, constant or hash-random per global row id).
Writers: parquetwriter / orcwriter / csvwriter / jsonlwriter (writeMode
truncate|append|nonConflict — hdfswriter's modes), sqlitewriter (writeMode
insert|replace + preSql/postSql hooks — rdbms writer contract),
streamwriter (count-only).

`setting.speed.record` applies the global token-bucket records/s cap
(state/ratelimit.py). `setting.errorLimit.{record,percentage}` bounds dirty
records: a reader-declared `casts` map routes per-row conversion failures
to a dead-letter parquet dir and the job aborts past the limit — DataX's
TaskPluginCollector semantics (SURVEY.md §2A row 17).
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import sqlite3
import time

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from datax_ray.functions.transformers import compile_transformers


class DirtyLimitExceeded(RuntimeError):
    pass


# ----------------------------------------------------------------- readers --


def _stream_reader(param: dict) -> ray.data.Dataset:
    """DataX streamreader: `count` synthetic rows from a `column` spec list
    [{"name", "type": long|double|string|bool, "value": const} or
    {..., "random": [lo, hi]}]. Random values are HASH-derived from the
    global row id + column index + seed — deterministic under any
    partitioning, no RNG state crosses tasks."""
    count = int(param["count"])
    columns = param["column"]
    seed = int(param.get("seed", 0))

    def build(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch["id"].to_numpy()
        out: dict[str, np.ndarray | list] = {}
        for ci, spec in enumerate(columns):
            name, typ = spec["name"], spec.get("type", "string")
            if "random" in spec:
                lo, hi = int(spec["random"][0]), int(spec["random"][1])
                h = pd.util.hash_array(
                    ids * np.int64(1000003) + np.int64(ci * 7919 + seed),
                    categorize=False,
                )
                vals = (h % np.uint64(max(1, hi - lo))).astype(np.int64) + lo
            else:
                vals = None
            if typ == "long":
                out[name] = vals if vals is not None else np.full(
                    len(ids), int(spec["value"]), np.int64
                )
            elif typ == "double":
                out[name] = (
                    vals.astype(np.float64)
                    if vals is not None
                    else np.full(len(ids), float(spec["value"]), np.float64)
                )
            elif typ == "bool":
                out[name] = (
                    (vals % 2 == 0)
                    if vals is not None
                    else np.full(len(ids), bool(spec["value"]))
                )
            else:  # string
                out[name] = (
                    [f"{spec.get('prefix', 'v')}-{v}" for v in vals]
                    if vals is not None
                    else [str(spec["value"])] * len(ids)
                )
        return pd.DataFrame(out)

    return ray.data.range(count).map_batches(build, batch_format="pandas")


def build_reader(cfg: dict) -> ray.data.Dataset:
    name, param = cfg["name"], cfg.get("parameter", {})
    if name == "parquetreader":
        return ray.data.read_parquet(param["path"], columns=param.get("column"))
    if name == "orcreader":
        from datax_ray.sources.orcsource import read_orc

        return read_orc(param["path"], columns=param.get("column"))
    if name == "csvreader":
        return ray.data.read_csv(param["path"])
    if name == "jsonlreader":
        return ray.data.read_json(param["path"])
    if name == "sqlitereader":
        from datax_ray.sources.sqlsource import read_sql_table

        db = param["db"]
        return read_sql_table(
            lambda: sqlite3.connect(db),
            table=param["table"],
            columns=param["column"],
            split_pk=param["splitPk"],
            num_splits=int(param.get("numSplits", 16)),
            where=param.get("where"),
        )
    if name == "streamreader":
        return _stream_reader(param)
    if name == "envelopereader":
        # a Debezium-style envelope export (sinks/feedout.py — ours or a
        # foreign producer's published set) as a row stream: envelope
        # dir -> anything jobs (audits, counts, re-shipping)
        from datax_ray.sinks.feedout import read_envelopes

        return read_envelopes(param["path"])
    if name == "lakereader":
        # the CDC lake as a first-class DataX endpoint: committed live
        # rows (optionally AS OF an epoch / filtered), streamed one
        # merge-read task per range — lake -> anything jobs
        from datax_ray.sinks.lake import read_lake

        ds = read_lake(
            param["lake"],
            as_of_epoch=param.get("asOfEpoch"),
            conv_ids=param.get("convIds"),
            min_ts=param.get("minTs"),
            where=param.get("where"),
        )
        if param.get("column"):
            ds = ds.select_columns(param["column"])
        return ds
    raise ValueError(f"unknown reader: {name!r}")


# ------------------------------------------------------- dirty-record casts --

def _to_long(s: pd.Series) -> pd.Series:
    """Strict long cast: non-numeric AND fractional values become null
    (dirty), instead of astype('Int64') raising on e.g. '3.7' and killing
    the job before dirty routing can run (DataX: a failed conversion is a
    dirty record, never an abort)."""
    num = pd.to_numeric(s, errors="coerce")
    num = num.where(num.isna() | (num % 1 == 0))
    return num.astype("Int64")


_COERCE = {
    "long": _to_long,
    "double": lambda s: pd.to_numeric(s, errors="coerce").astype("Float64"),
    "date": lambda s: pd.to_datetime(s, errors="coerce", format="mixed"),
}


class CastStage:
    """Per-row type conversion with DataX dirty-record routing: rows where
    a declared cast fails (non-null in, null out) spill to a content-hash
    dead-letter parquet (idempotent under retry) with the failing column as
    `reason`, and are dropped from the good stream."""

    def __init__(self, casts: dict[str, str], deadletter_dir: str | None):
        self.__name__ = "CastStage"
        self.casts = casts
        self.deadletter_dir = deadletter_dir

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        bad = np.zeros(len(df), dtype=bool)
        reason = np.full(len(df), "", dtype=object)
        # Keep the ORIGINAL values of cast columns: a dead-letter record
        # must preserve the offending input (DataX TaskPluginCollector
        # semantics), not the nulled-out coercion result.
        originals = {col: df[col].copy() for col in self.casts}
        for col, typ in self.casts.items():
            coerced = _COERCE[typ](df[col])
            failed = coerced.isna().to_numpy() & df[col].notna().to_numpy()
            reason[failed & ~bad] = f"cast_failed:{col}:{typ}"
            bad |= failed
            df[col] = coerced
        if bad.any() and self.deadletter_dir:
            dirty = df[bad].assign(**{c: s[bad] for c, s in originals.items()})
            dirty = dirty.assign(reason=reason[bad])
            os.makedirs(self.deadletter_dir, exist_ok=True)
            blob = dirty.to_csv(index=False).encode()
            name = hashlib.sha1(blob).hexdigest()[:16]
            path = os.path.join(self.deadletter_dir, f"dl-{name}.csv")
            tmp = path + ".tmp"
            with open(tmp, "wb") as f:
                f.write(blob)
            os.replace(tmp, path)
        return df[~bad]


# ----------------------------------------------------------------- writers --


# File output goes through the two-phase-commit AtomicDirDatasink
# (sinks/datasink.py): per-task part names (no cross-task content-hash
# collapse), serialize_table shared (one place owns the byte formats),
# and an atomic manifest — a crashed job leaves no manifest behind.


def run_writer(ds: ray.data.Dataset, cfg: dict) -> int:
    name, param = cfg["name"], cfg.get("parameter", {})
    if name in ("parquetwriter", "orcwriter", "csvwriter", "jsonlwriter"):
        out_dir, mode = param["path"], param.get("writeMode", "truncate")
        if mode == "truncate" and os.path.isdir(out_dir):
            shutil.rmtree(out_dir)
        elif mode == "nonConflict" and os.path.isdir(out_dir) and os.listdir(out_dir):
            raise FileExistsError(
                f"writeMode=nonConflict but {out_dir} is not empty"
            )
        os.makedirs(out_dir, exist_ok=True)
        fmt = name.removesuffix("writer")
        from datax_ray.sinks.datasink import AtomicDirDatasink

        sink = AtomicDirDatasink(out_dir, fmt, append=(mode == "append"))
        prior_rows = sum(r["rows"] for r in sink._prior_files)
        ds.write_datasink(sink)
        with open(os.path.join(out_dir, sink.MANIFEST)) as f:
            return int(json.load(f)["rows"]) - prior_rows  # THIS job's rows
    if name == "sqlitewriter":
        from datax_ray.sources.sqlsource import write_sql_table

        db = param["db"]
        conn = sqlite3.connect(db)
        try:
            for sql in param.get("preSql", []):
                conn.execute(sql)
            conn.commit()
        finally:
            conn.close()
        rows = write_sql_table(
            ds,
            lambda: sqlite3.connect(db),
            table=param["table"],
            columns=param["column"],
            mode=param.get("writeMode", "insert"),
        )
        conn = sqlite3.connect(db)
        try:
            for sql in param.get("postSql", []):
                conn.execute(sql)
            conn.commit()
        finally:
            conn.close()
        return rows
    if name == "lakewriter":
        # anything -> lake jobs: full-load the (transcripts-shaped) row
        # stream as the lake's epoch 0 through the bootstrap path.
        # writeMode truncate = replace the lake; nonConflict = only an
        # empty/absent lake. Incremental appends are CHANGE STREAMS and
        # belong to `replay`/`tail` (ordering + exactly-once need the
        # (ts, lsn) contract a bare row stream doesn't carry) — pointing
        # users there is the honest contract, not a silent re-numbering.
        from datax_ray.pipelines.bootstrap import bootstrap
        from datax_ray.pipelines.replay import ReplayConfig

        lake, mode = param["lake"], param.get("writeMode", "nonConflict")
        if mode == "append":
            raise ValueError(
                "lakewriter cannot append bare rows: incremental ingest is "
                "a change stream — use `replay`/`tail` (or derive change "
                "events with op/ts/lsn) instead"
            )
        if mode == "truncate" and os.path.isdir(lake):
            shutil.rmtree(lake)
        elif mode == "nonConflict" and os.path.isdir(lake) and os.listdir(lake):
            raise FileExistsError(f"writeMode=nonConflict but {lake} is not empty")
        rep = bootstrap(
            None,
            ReplayConfig(
                changes_dir="",
                lake_dir=lake,
                num_partitions=int(param.get("numPartitions", 16)),
                metrics=False,
            ),
            src_ds=ds,
            src_label="job:lakewriter",
        )
        return rep.rows_out
    if name == "streamwriter":
        return int(
            sum(
                r["rows"]
                for r in ds.map_batches(
                    lambda t: pa.table({"rows": pa.array([t.num_rows], pa.int64())}),
                    batch_format="pyarrow",
                ).take_all()
            )
        )
    raise ValueError(f"unknown writer: {name!r}")


# --------------------------------------------------------------- transforms --


def _flatten_transformer(spec: dict) -> dict:
    """Accept both DataX's nested {"name", "parameter": {...}} and this
    repo's flat {"name", ...} transformer spec shapes."""
    if "parameter" in spec:
        return {"name": spec["name"], **spec["parameter"]}
    return spec


class RateStage:
    """`job.setting.speed.{record,byte}` — one token-bucket RPC per batch
    against a shared named limiter actor per unit (state/ratelimit.py).
    Both caps may be active; the batch sleeps the max of the two waits
    (DataX applies whichever limit binds first)."""

    def __init__(self, records_per_s: float | None, bytes_per_s: float | None = None):
        self.__name__ = "RateStage"
        from datax_ray.state.ratelimit import RATE_ACTOR_NAME, get_rate_limiter

        self._rec = get_rate_limiter(records_per_s) if records_per_s else None
        self._byt = (
            get_rate_limiter(bytes_per_s, name=RATE_ACTOR_NAME + "_bytes")
            if bytes_per_s
            else None
        )

    def __call__(self, t: pa.Table) -> pa.Table:
        import ray as _ray

        waits = []
        if self._rec is not None:
            waits.append(self._rec.acquire.remote(t.num_rows))
        if self._byt is not None:
            waits.append(self._byt.acquire.remote(t.nbytes))
        wait = max(_ray.get(waits), default=0.0)
        if wait > 0:
            time.sleep(wait)
        return t


# -------------------------------------------------------------------- runner --


def run_job(cfg: dict | str, job_dir: str | None = None) -> dict:
    """Execute a DataX-shaped job config end to end; returns a summary dict
    {records, dirty_records, elapsed_s, records_per_s, deadletter_dir}.

    `job.content` is a LIST, as in DataX: every entry is an independent
    reader→transformer→writer pipe. Entries run back to back on the
    driver — unlike DataX's channel threads, each entry here is already a
    fully parallel Ray pipeline saturating the cluster, so interleaving
    entries buys nothing (and Ray Data execution off the main thread trips
    lazy filesystem imports). The summary totals all entries and carries
    per-entry rows under "contents" when there is more than one;
    errorLimit applies to the job-wide totals, matching DataX's job-scoped
    accounting."""
    if isinstance(cfg, str):
        with open(cfg) as f:
            cfg = json.load(f)
    entries = cfg["job"]["content"]
    setting = cfg["job"].get("setting", {})

    t0 = time.perf_counter()
    summaries = [
        _run_content(c, setting, job_dir, i) for i, c in enumerate(entries)
    ]

    records = sum(s["records"] for s in summaries)
    dirty_total = sum(s["dirty_records"] for s in summaries)
    limit = setting.get("errorLimit", {})
    if limit:
        max_rec = limit.get("record")
        max_pct = limit.get("percentage")
        total = records + dirty_total
        if max_rec is not None and dirty_total > max_rec:
            raise DirtyLimitExceeded(
                f"dirty records {dirty_total} > errorLimit.record {max_rec}"
            )
        if max_pct is not None and total and dirty_total / total > max_pct:
            raise DirtyLimitExceeded(
                f"dirty fraction {dirty_total / total:.4f} > "
                f"errorLimit.percentage {max_pct}"
            )
    elapsed = time.perf_counter() - t0
    out = {
        "records": records,
        "dirty_records": dirty_total,
        "elapsed_s": round(elapsed, 3),
        "records_per_s": round(records / max(elapsed, 1e-9), 1),
        "deadletter_dir": summaries[0]["deadletter_dir"],
    }
    if len(summaries) > 1:
        out["contents"] = summaries
    return out


def _run_content(content: dict, setting: dict, job_dir: str | None, idx: int) -> dict:
    """One reader→transformer→writer pipe (one job.content entry)."""
    reader_cfg = content["reader"]
    writer_cfg = content["writer"]
    if job_dir is None:
        out_path = writer_cfg.get("parameter", {}).get("path")
        job_dir = (out_path + "_job") if out_path else "/tmp/datax_job"
    deadletter = os.path.join(
        job_dir, "deadletter" if idx == 0 else f"deadletter-c{idx}"
    )

    t0 = time.perf_counter()
    ds = build_reader(reader_cfg)

    casts = reader_cfg.get("parameter", {}).get("casts")
    dirty_total = 0
    if casts:
        # Clear a previous run's dead-letter files so the dirty count below
        # reflects THIS run (content-hash names make re-spill idempotent).
        shutil.rmtree(deadletter, ignore_errors=True)
        ds = ds.map_batches(CastStage(casts, deadletter), batch_format="pandas")

    specs = [_flatten_transformer(s) for s in content.get("transformer", [])]
    if specs:
        fused = compile_transformers(specs)
        ds = ds.map_batches(fused, batch_format="pyarrow", zero_copy_batch=True)

    speed = setting.get("speed", {})
    if speed.get("record") or speed.get("byte"):
        ds = ds.map_batches(
            RateStage(speed.get("record"), speed.get("byte")),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )

    records = run_writer(ds, writer_cfg)

    if casts and os.path.isdir(deadletter):
        dirty_total = sum(
            len(pd.read_csv(os.path.join(deadletter, f)))
            for f in os.listdir(deadletter)
            if f.endswith(".csv")
        )
    elapsed = time.perf_counter() - t0
    return {
        "records": records,
        "dirty_records": dirty_total,
        "elapsed_s": round(elapsed, 3),
        "records_per_s": round(records / max(elapsed, 1e-9), 1),
        "deadletter_dir": deadletter if casts else None,
    }
