"""Derived-artifact REGISTRY + one-command `sync` — the operational glue
over the incremental-artifact family (recompute/additive/join/session/
window MVs, text & dedup & near-dup & value indexes, HLL sketch,
incremental file export):

A lake accumulates derived artifacts over its life; each knows how to
refresh itself incrementally (manifest fingerprints, feed folds, delta
keys), but keeping N of them fresh after every epoch means N ad-hoc CLI
calls. The registry records each artifact's (kind, dir, params) next to
the lake's manifest (`_manifest/artifacts.json`, atomic replace, same
durability story as consumer offsets), and `sync` brings EVERY registered
artifact up to the committed head in one command — each refresher is
already idempotent and incremental, so sync is too: a second sync is all
no-ops, and a crashed sync simply re-runs (per-artifact two-phase publish
protocols make partial progress safe).

Refreshers run sequentially on the driver — each one is itself a parallel
Ray Data job, so serializing at the artifact level keeps cluster resources
focused instead of oversubscribed; `sync` returns per-artifact stats plus
an overall ok flag (one failing artifact doesn't block the rest — its
error is reported and the next artifact proceeds).

Registered kinds and their refreshers:
    mv        pipelines/mv.py:refresh_mv
    mvadd     pipelines/mvadd.py:refresh_mv_additive
    mvsession pipelines/mvsession.py:refresh_mv_session   (params: gap_s)
    mvwindow  pipelines/mvwindow.py:refresh_mv_window     (params: window_s,
                                                           lateness_s, hop_s)
    index     pipelines/index.py:refresh_index
    dedup     pipelines/dedupscan.py:refresh_dedup_index
    neardup   pipelines/dedupscan.py:refresh_neardup_index (params: shingle_k)
    colindex  pipelines/colindex.py:refresh_value_index    (params: column)
    sketch    pipelines/sketchmv.py:refresh_sketch         (params: p)
    export    sinks/export.py:export_lake_incremental      (params: fmt, transformers)
    feedout   sinks/feedout.py:export_change_feed_envelopes (params: fmt)
    mvjoin    pipelines/mvjoin.py:refresh_mv_join           (params: right_lake)
    mvasof    pipelines/mvasof.py:refresh_mv_asof           (params: right_lake)
"""

from __future__ import annotations

import json
import os

from datax_ray.state.fs import canon_path

_REG = "artifacts.json"


def _reg_path(lake_dir: str) -> str:
    return os.path.join(lake_dir, "_manifest", _REG)


def _load(lake_dir: str) -> dict:
    from datax_ray.state.fs import fs_for

    path = _reg_path(lake_dir)
    try:
        return json.loads(fs_for(path).get(path))
    except FileNotFoundError:
        return {"artifacts": {}}


def _save(lake_dir: str, reg: dict) -> None:
    from datax_ray.state.fs import fs_for

    path = _reg_path(lake_dir)
    fs_for(path).put(path, json.dumps(reg, indent=1).encode())


def _dispatch(kind: str):
    """kind -> (refresher(lake_dir, artifact_dir, **params), allowed params)."""
    if kind == "mv":
        from datax_ray.pipelines.mv import refresh_mv

        return refresh_mv, set()
    if kind == "mvadd":
        from datax_ray.pipelines.mvadd import refresh_mv_additive

        return refresh_mv_additive, set()
    if kind == "mvsession":
        from datax_ray.pipelines.mvsession import refresh_mv_session

        return refresh_mv_session, {"gap_s"}
    if kind == "mvwindow":
        from datax_ray.pipelines.mvwindow import refresh_mv_window

        return refresh_mv_window, {"window_s", "lateness_s", "hop_s"}
    if kind == "mvhist":
        from datax_ray.pipelines.mvhist import refresh_mv_hist

        return refresh_mv_hist, {"group_col", "bucket_width"}
    if kind == "cmsmv":
        from datax_ray.pipelines.cmsmv import refresh_cms_mv

        return refresh_cms_mv, {"depth", "width"}
    if kind == "index":
        from datax_ray.pipelines.index import refresh_index

        return refresh_index, set()
    if kind == "dedup":
        from datax_ray.pipelines.dedupscan import refresh_dedup_index

        return refresh_dedup_index, set()
    if kind == "neardup":
        from datax_ray.pipelines.dedupscan import refresh_neardup_index

        return refresh_neardup_index, {"shingle_k"}
    if kind == "colindex":
        from datax_ray.pipelines.colindex import refresh_value_index

        return refresh_value_index, {"column"}
    if kind == "sketch":
        from datax_ray.pipelines.sketchmv import refresh_sketch

        return refresh_sketch, {"p"}
    if kind == "export":
        from datax_ray.sinks.export import export_lake_incremental

        return export_lake_incremental, {"fmt", "transformers"}
    if kind == "feedout":
        from datax_ray.sinks.feedout import export_change_feed_envelopes

        return export_change_feed_envelopes, {"fmt"}
    if kind == "mvjoin":
        from datax_ray.pipelines.mvjoin import refresh_mv_join

        def _join(lake_dir, mv_dir, right_lake):
            return refresh_mv_join(lake_dir, right_lake, mv_dir)

        return _join, {"right_lake"}
    if kind == "mvasof":
        from datax_ray.pipelines.mvasof import refresh_mv_asof

        def _asof(lake_dir, mv_dir, right_lake):
            return refresh_mv_asof(lake_dir, right_lake, mv_dir)

        return _asof, {"right_lake"}
    raise ValueError(
        f"unknown artifact kind {kind!r} — expected one of mv/mvadd/"
        "mvhist/cmsmv/mvsession/mvwindow/mvjoin/mvasof/index/dedup/"
        "neardup/colindex/sketch/export/feedout"
    )


def register_artifact(
    lake_dir: str, name: str, kind: str, artifact_dir: str,
    params: dict | None = None,
) -> dict:
    """Add (or replace) a named artifact. Validates kind and params
    eagerly; the artifact refreshes on the next `sync`."""
    params = dict(params or {})
    _, allowed = _dispatch(kind)  # raises on unknown kind
    bad = set(params) - allowed
    if bad:
        raise ValueError(
            f"kind {kind!r} does not accept params {sorted(bad)} "
            f"(allowed: {sorted(allowed) or 'none'})"
        )
    reg = _load(lake_dir)
    reg["artifacts"][name] = {
        "kind": kind,
        # canon_path, not abspath: artifact dirs may be obj://, s3://
        # URLs (abspath would mangle the scheme into a cwd-relative path)
        "dir": canon_path(artifact_dir),
        "params": params,
    }
    _save(lake_dir, reg)
    return {"registered": name, "kind": kind, "total": len(reg["artifacts"])}


def unregister_artifact(lake_dir: str, name: str) -> dict:
    reg = _load(lake_dir)
    found = reg["artifacts"].pop(name, None) is not None
    if found:
        _save(lake_dir, reg)
    return {"unregistered": name, "found": found,
            "total": len(reg["artifacts"])}


def list_artifacts(lake_dir: str) -> dict:
    return _load(lake_dir)["artifacts"]


def sync_artifacts(lake_dir: str, only: list[str] | None = None) -> dict:
    """Refresh every registered artifact (or the `only` subset) to the
    lake's committed head. Returns {"synced": N, "failed": M,
    "results": {name: stats-or-error}} — errors are caught per artifact
    so one broken view cannot block the others."""
    arts = _load(lake_dir)["artifacts"]
    if only is not None:
        missing = [n for n in only if n not in arts]
        if missing:
            raise ValueError(f"not registered: {missing}")
        arts = {n: arts[n] for n in only}
    results: dict[str, dict] = {}
    failed = 0
    for name in sorted(arts):
        a = arts[name]
        fn, _ = _dispatch(a["kind"])
        try:
            results[name] = {"ok": True, **fn(lake_dir, a["dir"], **a["params"])}
        except Exception as e:  # keep syncing the rest
            failed += 1
            results[name] = {"ok": False, "error": f"{type(e).__name__}: {e}"}
    return {"synced": len(results) - failed, "failed": failed,
            "results": results}
