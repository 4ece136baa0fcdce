"""Event-time WINDOWED aggregate materialized view with watermark +
allowed-lateness freeze and a late-event side output — the streaming-window
member of the MV family (mv.py recompute / mvadd.py additive fold /
mvjoin.py join / sketchmv.py sketch):

View contents: per (window_start, role) over tumbling event-time windows of
`window_s` seconds on `ts`: n_turns (live rows whose final ts falls in the
window) and sum_chars. Maintained by folding the Delta-CDF preimage feed
(feed.py:read_change_feed_preimages) — every delta is ±1 turn / ±len(text)
at ITS OWN row's window, so an update whose ts moved windows transfers mass
between windows exactly (−pre at the old window, +post at the new one).

Watermark semantics (Flink/Beam allowed-lateness, made deterministic and
refresh-batching-invariant):
  * wm_after(e) = max over epochs e' ≤ e of max(ts of e's feed rows)
                  − lateness_s       (a prefix-max over per-epoch maxima)
  * a delta from epoch e is ON TIME iff its window's END is strictly after
    wm_after(e−1) — i.e. every delta is judged against the watermark as of
    the END of the PREVIOUS epoch, never against rows of its own epoch.
  * ON-TIME deltas fold into the view; LATE deltas leave the view untouched
    (the window is FROZEN at its as-of-freeze value) and are diverted to a
    side output under `<mv_dir>/late-*.parquet` carrying
    (conv_id, ts, window_start, sign, chars, _lsn, _epoch, _change_type).

Because wm_after depends only on per-epoch feed maxima — fixed by the
lake's committed lineage, not by when refreshes run — refresh(A→C) produces
the SAME view and the SAME late-row multiset as refresh(A→B)+refresh(B→C)
for any B (pytest-verified). `lateness_s=None` disables freezing entirely;
the fold of the complete delta history then equals the tumbling-window
aggregate of the final LWW state (each live row nets +1 at its final
window; deleted/moved rows cancel), which is the DuckDB-oracle contract of
the `cdc_window_mv` catalog query.

Storage/publish protocol is mvadd's: window-bucket files
`w=NNNN-e=EEEEEE.parquet` (bucket = (window_start // window) % N_BUCKETS —
contiguous windows spread round-robin) + late files
`late-b=NNNN-e=EEEEEE.parquet`, all named by the TARGET epoch and derived
deterministically from (old file content + order-independent delta sums),
so a crashed refresh retries to identical bytes; ONE atomic full-object
put of `_mvwindow_state.json` publishes (state/fs.py storage contract —
the view directory may live on an object store). Untouched buckets keep
their old generation file — zero reads, zero writes.

Availability is bounded by manifest retention like any feed consumer; past
it, `rebuild=True` recomputes the view from one streaming pass of the live
lake (everything counted on-time, watermark re-anchored to the live max
ts − lateness, late output cleared — freeze history is not recoverable
from a snapshot, which is the honest Delta/Hudi behavior too).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

_STATE = "_mvwindow_state.json"
N_BUCKETS = 32
_NEG_INF = -(1 << 62)

_VIEW_SCHEMA = pa.schema(
    [
        ("window_start", pa.timestamp("us")),
        ("role", pa.string()),
        ("n_turns", pa.int64()),
        ("sum_chars", pa.int64()),
    ]
)

_LATE_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("ts", pa.timestamp("us")),
        ("window_start", pa.timestamp("us")),
        ("role", pa.string()),
        ("sign", pa.int64()),
        ("chars", pa.int64()),
        ("_lsn", pa.int64()),
        ("_epoch", pa.int32()),
        ("_change_type", pa.string()),
    ]
)


def _load_state(d: str) -> dict:
    from datax_ray.state.fs import fs_for, read_json

    p = os.path.join(d, _STATE)
    return read_json(p) if fs_for(p).exists(p) else {}


def _save_state(d: str, state: dict) -> None:
    # ONE atomic full-object put is the publish point (state/fs.py
    # storage contract — the view directory may live on an object store)
    from datax_ray.state.fs import fs_for, json_bytes

    p = os.path.join(d, _STATE)
    fs_for(p).put(p, json_bytes(state))


def _sweep_stale(mv_dir: str, live_rels: set[str]) -> None:
    """Drop generation / side-output files the published state no longer
    references — store scan through the contract, delete is idempotent."""
    from datax_ray.state.fs import fs_for

    fs = fs_for(mv_dir)
    live = {os.path.join(mv_dir, f) for f in live_rels}
    for p in fs.list_prefix(mv_dir):
        name = os.path.basename(p)
        if (
            (name.startswith("w=") or name.startswith("late-"))
            and name.endswith(".parquet")
            and p not in live
        ):
            fs.delete(p)


def _role_col(t: pa.Table) -> pa.ChunkedArray | pa.Array:
    # rename_column DDL can turn `role` into `speaker`; the view keeps
    # aggregating the same payload under its original key name.
    for c in ("role", "speaker"):
        if c in t.column_names:
            return t[c]
    return pa.nulls(t.num_rows, pa.string())


class _Tagger:
    """Feed rows → signed per-(bucket, window, role) partials, split into
    on-time (`_late`=false, pre-aggregated combiner output) and late
    (`_late`=true, one row per late delta) — both shrink before any
    exchange. wm_by_epoch maps epoch → wm_after(epoch−1), precomputed on
    the driver from O(epochs) per-epoch maxima."""

    def __init__(self, window_us: int, wm_lo: int, wm_used: list[int],
                 hop_us: int | None = None):
        self.__name__ = "_Tagger"
        self.window_us = window_us
        self.hop_us = hop_us or window_us
        self.wm_lo = wm_lo  # first epoch covered by wm_used
        self.wm_used = np.asarray(wm_used, dtype=np.int64)

    def __call__(self, t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _tag_schema().empty_table()
        if self.hop_us != self.window_us:
            # HOPPING: each delta belongs to window/hop overlapping
            # windows — explode the batch once (np.repeat + arange), then
            # the tumbling path below runs unchanged on window starts
            k = self.window_us // self.hop_us
            ts0 = pc.cast(t["ts"], pa.int64()).to_numpy(zero_copy_only=False)
            null0 = pc.is_null(t["ts"]).to_numpy(zero_copy_only=False)
            # null-ts rows keep ONE copy (they go straight to late)
            reps = np.where(null0, 1, k).astype(np.int64)
            idx = np.repeat(np.arange(t.num_rows), reps)
            off = (np.arange(len(idx)) -
                   np.repeat(np.cumsum(reps) - reps, reps))
            t = t.take(pa.array(idx))
            anchor = (np.where(null0, 0, ts0)[idx] // self.hop_us
                      ) * self.hop_us
            wstart_h = anchor - off * self.hop_us
            return self._tag(t, wstart_h)
        ts_f0 = pc.cast(t["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        null0 = pc.is_null(t["ts"]).to_numpy(zero_copy_only=False)
        wstart_t = (np.where(null0, 0, ts_f0) // self.window_us) * self.window_us
        return self._tag(t, wstart_t)

    def _tag(self, t: pa.Table, wstart: np.ndarray) -> pa.Table:
        ts = pc.cast(t["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        # null ts cannot be windowed — treat as late (never mutates view)
        null_ts = pc.is_null(t["ts"]).to_numpy(zero_copy_only=False)
        epoch = pc.cast(t["_epoch"], pa.int64()).to_numpy(zero_copy_only=False)
        wm = self.wm_used[np.clip(epoch - self.wm_lo, 0, len(self.wm_used) - 1)]
        late = null_ts | (wstart + self.window_us <= wm)

        ct = t["_change_type"]
        pos = pc.is_in(ct, value_set=pa.array(["insert", "update_postimage"]))
        sign = np.where(pos.to_numpy(zero_copy_only=False), 1, -1).astype(np.int64)
        chars = (
            pc.cast(pc.fill_null(pc.utf8_length(t["text"]), 0), pa.int64())
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )

        on = pa.table(
            {
                "window_start": pa.array(wstart[~late], pa.int64()),
                "role": _role_col(t).combine_chunks().filter(pa.array(~late)),
                "dn": pa.array(sign[~late], pa.int64()),
                "dchars": pa.array((sign * chars)[~late], pa.int64()),
            }
        )
        g = (
            on.group_by(["window_start", "role"], use_threads=False)
            .aggregate([("dn", "sum"), ("dchars", "sum")])
            .rename_columns(["window_start", "role", "dn", "dchars"])
        )
        out_on = pa.table(
            {
                "_b": pc.cast(
                    pc.bit_wise_and(
                        pc.divide(g["window_start"], self.hop_us),
                        N_BUCKETS - 1,
                    ),
                    pa.int32(),
                ),
                "_late": pa.array(np.zeros(g.num_rows, bool)),
                "window_start": g["window_start"],
                "role": g["role"],
                "dn": g["dn"],
                "dchars": g["dchars"],
                "conv_id": pa.nulls(g.num_rows, pa.string()),
                "ts": pa.nulls(g.num_rows, pa.int64()),
                "_lsn": pa.nulls(g.num_rows, pa.int64()),
                "_epoch": pa.nulls(g.num_rows, pa.int32()),
                "_change_type": pa.nulls(g.num_rows, pa.string()),
            }
        )
        nlate = int(late.sum())
        lmask = pa.array(late)
        out_late = pa.table(
            {
                "_b": pc.cast(
                    pc.bit_wise_and(
                        pa.array(wstart[late] // self.hop_us),
                        N_BUCKETS - 1,
                    ),
                    pa.int32(),
                ),
                "_late": pa.array(np.ones(nlate, bool)),
                "window_start": pa.array(
                    np.where(null_ts[late], np.int64(_NEG_INF), wstart[late]),
                    pa.int64(),
                ),
                "role": _role_col(t).combine_chunks().filter(lmask),
                "dn": pa.array(sign[late], pa.int64()),
                "dchars": pa.array((sign * chars)[late], pa.int64()),
                "conv_id": t["conv_id"].combine_chunks().filter(lmask),
                "ts": pa.array(ts[late], pa.int64(), mask=null_ts[late]),
                "_lsn": pc.cast(t["_lsn"], pa.int64()).combine_chunks().filter(lmask),
                "_epoch": pc.cast(t["_epoch"], pa.int32()).combine_chunks().filter(lmask),
                "_change_type": ct.combine_chunks().filter(lmask),
            }
        )
        return pa.concat_tables([out_on, out_late])


def _tag_schema() -> pa.Schema:
    return pa.schema(
        [
            ("_b", pa.int32()),
            ("_late", pa.bool_()),
            ("window_start", pa.int64()),
            ("role", pa.string()),
            ("dn", pa.int64()),
            ("dchars", pa.int64()),
            ("conv_id", pa.string()),
            ("ts", pa.int64()),
            ("_lsn", pa.int64()),
            ("_epoch", pa.int32()),
            ("_change_type", pa.string()),
        ]
    )


class _WindowBucketFolder:
    """map_groups over one bucket's tagged rows: fold on-time partials into
    the old bucket file and write the late rows' side-output file — both at
    deterministic target-epoch names, so a retried task rewrites identical
    bytes. Emits one lineage row per bucket."""

    def __init__(self, mv_dir: str, old_files: dict, to_epoch: int,
                 suffix: str = ""):
        self.__name__ = "_WindowBucketFolder"
        self.mv_dir = mv_dir
        self.old_files = old_files
        self.to_epoch = to_epoch
        self.suffix = suffix  # "-l" for late-admission generations: keeps
        # them distinct from the same epoch's refresh generation, so the
        # old files stay intact until the ONE atomic state publish

    def __call__(self, g: pa.Table) -> pa.Table:
        import pyarrow.parquet as pq

        b = int(g["_b"][0].as_py())
        late_mask = g["_late"].combine_chunks()
        on = g.filter(pc.invert(late_mask))
        late = g.filter(late_mask)

        from datax_ray.state.fs import open_parquet, put_parquet

        view_rel = ""
        if on.num_rows:
            old_rel = self.old_files.get(str(b))
            if old_rel:
                old = pq.read_table(
                    open_parquet(os.path.join(self.mv_dir, old_rel))
                )
            else:
                old = _VIEW_SCHEMA.empty_table()
            merged = (
                pa.concat_tables(
                    [
                        old,
                        pa.table(
                            {
                                "window_start": pc.cast(
                                    on["window_start"], pa.timestamp("us")
                                ),
                                "role": on["role"],
                                "n_turns": on["dn"],
                                "sum_chars": on["dchars"],
                            }
                        ),
                    ]
                )
                .group_by(["window_start", "role"], use_threads=False)
                .aggregate([("n_turns", "sum"), ("sum_chars", "sum")])
                .rename_columns(["window_start", "role", "n_turns", "sum_chars"])
            )
            merged = merged.filter(
                pc.or_(
                    pc.not_equal(merged["n_turns"], 0),
                    pc.not_equal(merged["sum_chars"], 0),
                )
            ).sort_by([("window_start", "ascending"), ("role", "ascending")])
            view_rel = f"w={b:04d}-e={self.to_epoch:06d}{self.suffix}.parquet"
            put_parquet(merged, os.path.join(self.mv_dir, view_rel),
                        compression="zstd", compression_level=1)
            n_view = merged.num_rows
        else:
            n_view = -1  # bucket untouched: keep old generation

        late_rel = ""
        if late.num_rows:
            lt = pa.table(
                {
                    "conv_id": late["conv_id"],
                    "ts": pc.cast(late["ts"], pa.timestamp("us")),
                    "window_start": pc.cast(
                        pc.if_else(
                            pc.equal(late["window_start"], _NEG_INF),
                            pa.nulls(late.num_rows, pa.int64()),
                            late["window_start"],
                        ),
                        pa.timestamp("us"),
                    ),
                    "role": late["role"],
                    "sign": late["dn"],
                    "chars": pc.multiply(late["dn"], late["dchars"]),
                    "_lsn": late["_lsn"],
                    "_epoch": late["_epoch"],
                    "_change_type": late["_change_type"],
                }
            ).sort_by([("_lsn", "ascending"), ("_change_type", "ascending")])
            # chars column stores |dchars| (sign folded out) for readability
            late_rel = f"late-b={b:04d}-e={self.to_epoch:06d}{self.suffix}.parquet"
            put_parquet(lt, os.path.join(self.mv_dir, late_rel),
                        compression="zstd", compression_level=1)

        return pa.table(
            {
                "bucket": pa.array([b], pa.int64()),
                "file": pa.array([view_rel], pa.string()),
                "late_file": pa.array([late_rel], pa.string()),
                "cells": pa.array([n_view], pa.int64()),
                "late_rows": pa.array([late.num_rows], pa.int64()),
            }
        )


def _epoch_maxima(feed: ray.data.Dataset) -> dict[int, int]:
    """Per-epoch max event ts of the feed — O(epochs × blocks) tiny rows."""

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"_epoch": pa.array([], pa.int32()), "mx": pa.array([], pa.int64())}
            )
        g = (
            pa.table(
                {"_epoch": t["_epoch"], "mx": pc.cast(t["ts"], pa.int64())}
            )
            .group_by(["_epoch"], use_threads=False)
            .aggregate([("mx", "max")])
            .rename_columns(["_epoch", "mx"])
        )
        return g

    out: dict[int, int] = {}
    for r in feed.map_batches(partial, batch_format="pyarrow").take_all():
        e = int(r["_epoch"])
        if r["mx"] is not None:
            out[e] = max(out.get(e, _NEG_INF), int(r["mx"]))
    return out


def refresh_mv_window(
    lake_dir: str,
    mv_dir: str,
    window_s: int | None = None,
    lateness_s: float | None = None,
    hop_s: int | None = None,
    rebuild: bool = False,
) -> dict:
    """Fold the preimage feed since the last applied epoch into the
    windowed view under the watermark rule. hop_s < window_s makes the
    windows HOPPING (each delta folds into window_s/hop_s overlapping
    windows; window_s must be a multiple of hop_s); default is tumbling.
    window_s/lateness_s/hop_s are pinned at view creation; later calls
    must match (or omit → reuse stored). Returns {"applied_from",
    "applied_to", "buckets_touched", "cells", "late_rows",
    "watermark_us"}."""
    from datax_ray.pipelines.feed import read_change_feed_preimages
    from datax_ray.state.manifest import Manifest

    m = Manifest(lake_dir)
    committed = m.committed_epoch()
    if committed < 0:
        raise ValueError(f"no committed lake at {lake_dir}")
    state = _load_state(mv_dir)
    if state:
        if window_s is not None and window_s != state["window_s"]:
            raise ValueError(
                f"view was created with window_s={state['window_s']}; "
                f"got {window_s} — windows cannot be re-keyed incrementally"
            )
        stored_late = state.get("lateness_s")
        if lateness_s is not None and lateness_s != stored_late:
            raise ValueError(
                f"view was created with lateness_s={stored_late}; got {lateness_s}"
            )
        lateness_s = stored_late
        stored_hop = state.get("hop_s")
        if hop_s is not None and hop_s != stored_hop:
            raise ValueError(
                f"view was created with hop_s={stored_hop}; got {hop_s}"
            )
        hop_s = stored_hop
        window_s = state["window_s"]  # omitted -> reuse stored
    if window_s is None:
        window_s = 3600
    if hop_s is not None and (hop_s <= 0 or window_s % hop_s):
        raise ValueError(
            f"window_s ({window_s}) must be a positive multiple of hop_s "
            f"({hop_s})"
        )
    applied = int(state.get("applied_epoch", -1))

    if rebuild:
        return _rebuild(lake_dir, mv_dir, committed, window_s, lateness_s,
                        hop_s)
    if applied >= committed:
        return {
            "applied_from": applied,
            "applied_to": applied,
            "buckets_touched": 0,
            "cells": int(state.get("cells", 0)),
            "late_rows": int(state.get("late_rows", 0)),
            "watermark_us": state.get("watermark_us"),
        }
    if applied >= 0 and m.at_epoch(applied) is None:
        raise ValueError(
            f"epochs since {applied} were vacuumed — windowed refresh "
            "cannot replay them; run with rebuild=True"
        )

    window_us = int(window_s * 1_000_000)
    lateness_us = None if lateness_s is None else int(lateness_s * 1_000_000)

    feed = read_change_feed_preimages(lake_dir, applied, committed)
    if lateness_us is not None:
        # the watermark pass reads the feed once before the fold does —
        # materialize so the preimage merge-reads run once, not twice
        feed = feed.materialize()

    # wm_used[e - (applied+1)] = watermark a delta of epoch e is judged by
    # (= wm_after(e−1)); prefix-max over per-epoch feed maxima.
    stored_wm = state.get("watermark_us")
    wm_running = _NEG_INF if stored_wm is None else int(stored_wm)
    wm_used: list[int] = []
    if lateness_us is None:
        wm_used = [_NEG_INF] * (committed - applied)
        wm_running = _NEG_INF
    else:
        maxima = _epoch_maxima(feed)
        for e in range(applied + 1, committed + 1):
            wm_used.append(wm_running)
            if e in maxima:
                wm_running = max(wm_running, maxima[e] - lateness_us)

    hop_us = None if hop_s is None else int(hop_s * 1_000_000)
    tagged = feed.map_batches(
        _Tagger(window_us, applied + 1, wm_used, hop_us),
        batch_format="pyarrow",
    )
    old_files = dict(state.get("buckets", {}))
    lineage = (
        tagged.groupby("_b")
        .map_groups(
            _WindowBucketFolder(mv_dir, old_files, committed),
            batch_format="pyarrow",
        )
        .take_all()
    )  # O(touched buckets) tiny rows

    new_files = dict(old_files)
    bucket_cells = dict(state.get("bucket_cells", {}))
    late_files = list(state.get("late_files", []))
    touched = 0
    new_late = 0
    for r in lineage:
        b = str(int(r["bucket"]))
        if r["file"]:
            new_files[b] = r["file"]
            bucket_cells[b] = int(r["cells"])
            touched += 1
        if r["late_file"]:
            late_files.append(r["late_file"])
            new_late += int(r["late_rows"])
    cells = sum(bucket_cells.get(b, 0) for b in new_files)

    _save_state(
        mv_dir,
        {
            "applied_epoch": committed,
            "window_s": window_s,
            "lateness_s": lateness_s,
            "hop_s": hop_s,
            "watermark_us": None if wm_running == _NEG_INF else wm_running,
            "buckets": new_files,
            "bucket_cells": bucket_cells,
            "late_files": late_files,
            "cells": cells,
            "late_rows": int(state.get("late_rows", 0)) + new_late,
        },
    )
    _sweep_stale(mv_dir, set(new_files.values()) | set(late_files))
    return {
        "applied_from": applied,
        "applied_to": committed,
        "buckets_touched": touched,
        "cells": cells,
        "late_rows": int(state.get("late_rows", 0)) + new_late,
        "watermark_us": None if wm_running == _NEG_INF else wm_running,
    }


def _rebuild(
    lake_dir: str,
    mv_dir: str,
    committed: int,
    window_s: int,
    lateness_s: float | None,
    hop_s: int | None = None,
) -> dict:
    """One streaming pass of the LIVE lake: every row on-time, watermark
    re-anchored, late side output cleared (freeze history is gone)."""
    from datax_ray.sinks.lake import read_lake

    window_us = int(window_s * 1_000_000)
    hop_us = window_us if hop_s is None else int(hop_s * 1_000_000)
    k_hops = window_us // hop_us

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "window_start": pa.array([], pa.int64()),
                    "role": pa.array([], pa.string()),
                    "n_turns": pa.array([], pa.int64()),
                    "sum_chars": pa.array([], pa.int64()),
                    "mx": pa.array([], pa.int64()),
                }
            )
        # null event-times cannot be windowed; the incremental path
        # diverts them to the late side output, and a rebuild clears that
        # output — so they are excluded here too (documented behavior)
        t = t.filter(pc.is_valid(t["ts"]))
        if t.num_rows == 0:
            return partial(t.slice(0, 0))
        if k_hops > 1:  # hopping: explode each live row into its windows
            idx = np.repeat(np.arange(t.num_rows), k_hops)
            t = t.take(pa.array(idx))
            ts_np = pc.cast(t["ts"], pa.int64()).to_numpy(zero_copy_only=False)
            off = np.tile(np.arange(k_hops, dtype=np.int64), t.num_rows // k_hops)
            w_np = (ts_np // hop_us) * hop_us - off * hop_us
            ts = pc.cast(t["ts"], pa.int64())
            w = pa.array(w_np)
        else:
            ts = pc.cast(t["ts"], pa.int64())
            ts_np = ts.to_numpy(zero_copy_only=False)
            # numpy floor division: negative (pre-epoch) timestamps land
            # in the SAME window as the incremental fold (arrow's divide
            # truncates toward zero and would disagree at ts < 0)
            w = pa.array((ts_np // window_us) * window_us)
        d = pa.table(
            {
                "window_start": w,
                "role": _role_col(t),
                "n_turns": pa.array(np.ones(t.num_rows, np.int64)),
                "sum_chars": pc.cast(
                    pc.fill_null(pc.utf8_length(t["text"]), 0), pa.int64()
                ),
            }
        )
        g = (
            d.group_by(["window_start", "role"], use_threads=False)
            .aggregate([("n_turns", "sum"), ("sum_chars", "sum")])
            .rename_columns(["window_start", "role", "n_turns", "sum_chars"])
        )
        mx_v = pc.max(ts).as_py()
        return g.append_column(
            "mx",
            pa.array([_NEG_INF if mx_v is None else mx_v] * g.num_rows,
                     pa.int64()),
        )

    def fold(g: pa.Table) -> pa.Table:
        b = int(
            (g["window_start"][0].as_py() // hop_us) % N_BUCKETS
        )
        merged = (
            g.group_by(["window_start", "role"], use_threads=False)
            .aggregate([("n_turns", "sum"), ("sum_chars", "sum"), ("mx", "max")])
            .rename_columns(
                ["window_start", "role", "n_turns", "sum_chars", "mx"]
            )
        )
        out = pa.table(
            {
                "window_start": pc.cast(merged["window_start"], pa.timestamp("us")),
                "role": merged["role"],
                "n_turns": merged["n_turns"],
                "sum_chars": merged["sum_chars"],
            }
        ).sort_by([("window_start", "ascending"), ("role", "ascending")])
        from datax_ray.state.fs import put_parquet

        rel = f"w={b:04d}-e={committed:06d}.parquet"
        put_parquet(out, os.path.join(mv_dir, rel),
                    compression="zstd", compression_level=1)
        return pa.table(
            {
                "bucket": pa.array([b], pa.int64()),
                "file": pa.array([rel], pa.string()),
                "cells": pa.array([out.num_rows], pa.int64()),
                "mx": pa.array([int(pc.max(merged["mx"]).as_py() or _NEG_INF)]),
            }
        )

    def bucketed(t: pa.Table) -> pa.Table:
        return t.append_column(
            "_b",
            pc.cast(
                pc.bit_wise_and(pc.divide(t["window_start"], hop_us), N_BUCKETS - 1),
                pa.int32(),
            ),
        )

    lineage = (
        read_lake(lake_dir)
        .map_batches(partial, batch_format="pyarrow")
        .map_batches(bucketed, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(fold, batch_format="pyarrow")
        .take_all()
    )
    files = {str(int(r["bucket"])): r["file"] for r in lineage}
    bucket_cells = {str(int(r["bucket"])): int(r["cells"]) for r in lineage}
    mx = max((int(r["mx"]) for r in lineage), default=_NEG_INF)
    lateness_us = None if lateness_s is None else int(lateness_s * 1_000_000)
    wm = None if (lateness_us is None or mx == _NEG_INF) else mx - lateness_us
    _save_state(
        mv_dir,
        {
            "applied_epoch": committed,
            "window_s": window_s,
            "lateness_s": lateness_s,
            "hop_s": hop_s,
            "watermark_us": wm,
            "buckets": files,
            "bucket_cells": bucket_cells,
            "late_files": [],
            "cells": sum(bucket_cells.values()),
            "late_rows": 0,
        },
    )
    _sweep_stale(mv_dir, set(files.values()))
    return {
        "applied_from": -1,
        "applied_to": committed,
        "buckets_touched": len(files),
        "cells": sum(bucket_cells.values()),
        "late_rows": 0,
        "watermark_us": wm,
    }


def admit_late_events(mv_dir: str) -> dict:
    """CORRECTION pass (Flink's fired-again-on-late-data shape, made a
    deliberate verb): fold every diverted late delta into its frozen
    window, so the view becomes equal to the no-freeze fold of everything
    seen so far — then clear the side output. The watermark is untouched;
    future epochs keep freezing by the same rule. Unfoldable rows (null
    event-time) stay in the side output. Deterministic and crash-safe:
    admission generations carry a `-l` name suffix so the refresh
    generation of the same epoch survives until the atomic state publish;
    a second admit with an empty side output is a no-op. Returns
    {"admitted", "cells", "late_rows"}."""
    state = _load_state(mv_dir)
    if not state:
        raise ValueError(f"no windowed view at {mv_dir}")
    late_files = list(state.get("late_files", []))
    if not late_files:
        return {
            "admitted": 0,
            "cells": int(state.get("cells", 0)),
            "late_rows": int(state.get("late_rows", 0)),
        }
    window_s = state["window_s"]
    hop_us = int((state.get("hop_s") or window_s) * 1_000_000)
    applied = int(state.get("applied_epoch", 0))

    def to_partials(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _tag_schema().empty_table()
        if "role" not in t.column_names:
            # side-output files written before role was recorded: their
            # deltas fold under a null role cell (still conserved totals)
            t = t.append_column("role", pa.nulls(t.num_rows, pa.string()))
        has_w = pc.is_valid(t["window_start"])
        f = t.filter(has_w)
        u = t.filter(pc.invert(has_w))
        w = pc.cast(f["window_start"], pa.int64())
        g = (
            pa.table(
                {
                    "window_start": w,
                    "role": f["role"],
                    "dn": f["sign"],
                    "dchars": pc.multiply(f["sign"], f["chars"]),
                }
            )
            .group_by(["window_start", "role"], use_threads=False)
            .aggregate([("dn", "sum"), ("dchars", "sum")])
            .rename_columns(["window_start", "role", "dn", "dchars"])
        )
        out_on = pa.table(
            {
                "_b": pc.cast(
                    pc.bit_wise_and(
                        pc.divide(g["window_start"], hop_us), N_BUCKETS - 1
                    ),
                    pa.int32(),
                ),
                "_late": pa.array(np.zeros(g.num_rows, bool)),
                "window_start": g["window_start"],
                "role": g["role"],
                "dn": g["dn"],
                "dchars": g["dchars"],
                "conv_id": pa.nulls(g.num_rows, pa.string()),
                "ts": pa.nulls(g.num_rows, pa.int64()),
                "_lsn": pa.nulls(g.num_rows, pa.int64()),
                "_epoch": pa.nulls(g.num_rows, pa.int32()),
                "_change_type": pa.nulls(g.num_rows, pa.string()),
            }
        )
        out_u = pa.table(
            {
                "_b": pa.array(np.zeros(u.num_rows, np.int32)),
                "_late": pa.array(np.ones(u.num_rows, bool)),
                "window_start": pa.array(
                    np.full(u.num_rows, _NEG_INF, np.int64)
                ),
                "role": u["role"],
                "dn": u["sign"],
                "dchars": pc.multiply(u["sign"], u["chars"]),
                "conv_id": u["conv_id"],
                "ts": pc.cast(u["ts"], pa.int64()),
                "_lsn": u["_lsn"],
                "_epoch": u["_epoch"],
                "_change_type": u["_change_type"],
            }
        )
        return pa.concat_tables([out_on, out_u])

    from datax_ray.state.fs import read_parquet_dataset

    old_files = dict(state.get("buckets", {}))
    lineage = (
        read_parquet_dataset(
            [os.path.join(mv_dir, f) for f in late_files], _LATE_SCHEMA
        )
        .map_batches(to_partials, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(
            _WindowBucketFolder(mv_dir, old_files, applied, suffix="-l"),
            batch_format="pyarrow",
        )
        .take_all()
    )
    new_files = dict(old_files)
    bucket_cells = dict(state.get("bucket_cells", {}))
    residual_files: list[str] = []
    residual = 0
    for r in lineage:
        b = str(int(r["bucket"]))
        if r["file"]:
            new_files[b] = r["file"]
            bucket_cells[b] = int(r["cells"])
        if r["late_file"]:
            residual_files.append(r["late_file"])
            residual += int(r["late_rows"])
    cells = sum(bucket_cells.get(b, 0) for b in new_files)
    admitted = int(state.get("late_rows", 0)) - residual
    _save_state(
        mv_dir,
        {
            **state,
            "buckets": new_files,
            "bucket_cells": bucket_cells,
            "late_files": residual_files,
            "cells": cells,
            "late_rows": residual,
        },
    )
    _sweep_stale(mv_dir, set(new_files.values()) | set(residual_files))
    return {"admitted": admitted, "cells": cells, "late_rows": residual}


def read_mv_window(mv_dir: str) -> ray.data.Dataset:
    """The published view as a Dataset (window_start, role, n_turns,
    sum_chars) — reads only the state-referenced generation files."""
    from datax_ray.state.fs import read_parquet_dataset

    state = _load_state(mv_dir)
    files = [os.path.join(mv_dir, f) for f in state.get("buckets", {}).values()]
    return read_parquet_dataset(files, _VIEW_SCHEMA)


def read_mv_window_late(mv_dir: str) -> ray.data.Dataset:
    """The late-event side output (every delta the watermark froze out)."""
    from datax_ray.state.fs import read_parquet_dataset

    state = _load_state(mv_dir)
    files = [os.path.join(mv_dir, f) for f in state.get("late_files", [])]
    return read_parquet_dataset(files, _LATE_SCHEMA)
