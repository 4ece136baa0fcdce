"""One-call operational STATUS report for a lake — the `kubectl get`-style
staleness view an operator reads before anything else: committed head and
watermark, range/fragment pressure (what `compact --min-frags` would act
on), registered artifacts with their applied epochs vs the head (how far
each derived view lags), named feed-consumer offsets, and pending
dead-letter backlog (what `redrive` would pick up).

Everything is manifest/state-file metadata — NO storage reads, no Ray
session needed: a status probe on a 100 TB lake costs O(ranges +
artifacts) driver work and can run from a cron/monitoring box that only
sees the manifest directory.
"""

from __future__ import annotations

import json
import os

# artifact kind -> (state filename, [keys whose values are applied epochs])
_KIND_STATE = {
    "mv": ("_mv_state.json", ["applied_epoch"]),
    "mvadd": ("_mvadd_state.json", ["applied_epoch"]),
    "mvhist": ("_mvhist_state.json", ["applied_epoch"]),
    "cmsmv": ("_cmsmv_state.json", ["applied_epoch"]),
    "mvsession": ("_mvsession_state.json", ["applied_epoch"]),
    "mvwindow": ("_mvwindow_state.json", ["applied_epoch"]),
    "mvjoin": ("_mvjoin_state.json", ["applied_left"]),
    "mvasof": ("_mvasof_state.json", ["applied_left"]),
    "feedout": ("_feedout_state.json", ["exported_epoch"]),
    "export": ("_export_state.json", []),
    "index": ("_index_state.json", []),
    "dedup": ("_dedup_state.json", []),
    "neardup": ("_neardup_state.json", []),
    "colindex": ("_colindex_state.json", []),
    "sketch": ("_sketch_state.json", []),
}


def lake_status(lake_dir: str) -> dict:
    from datax_ray.pipelines.registry import list_artifacts
    from datax_ray.state.manifest import Manifest

    m = Manifest(lake_dir)
    committed = m.committed_epoch()
    out: dict = {"lake": lake_dir, "committed_epoch": committed}
    staged = m.staged_record()
    if staged is not None:
        # a pending write-audit-publish epoch: visible only to --staged
        # audit reads until `publish` (or dropped by `publish --abort`) —
        # reported even on a never-committed lake (a staged FIRST epoch)
        out["staged_epoch"] = {
            "epoch": staged["epoch"],
            "segments": len(staged.get("segments", [])),
            "publishable": staged["epoch"] == committed + 1,
        }
    if committed < 0:
        return out
    out["lsn_hi"] = m.committed_lsn_hi()
    ms = m.committed_properties().get("multisource")
    if ms:
        # multi-source replication: per-producer watermarks (SOURCE lsn
        # space) + pinned slots — the per-source replication-lag view
        out["multisource"] = {
            "slots": ms.get("slots"),
            "sources": {
                name: {"slot": rec.get("slot"), "lsn_hi": rec.get("lsn_hi")}
                for name, rec in (ms.get("sources") or {}).items()
            },
        }
    layout = m.committed_layout() or {}
    out["layout"] = {
        k: layout.get(k)
        for k in ("num_partitions", "frag_ranges", "salt_turn_width")
    }

    cursors = m.committed_properties().get("mergeback_cursors") or {}
    if cursors:
        # branch-sync view: how far each merged branch has advanced past
        # its last sync (lag in epochs; null when the branch is gone)
        branches = {}
        for bdir, cur in cursors.items():
            rec = {"synced_through": cur.get("epoch"),
                   "branch_point": cur.get("branch_point")}
            try:
                head = Manifest(bdir).committed_epoch()
                rec["branch_head"] = head
                rec["behind"] = max(0, head - int(cur.get("epoch", -1)))
            except Exception:
                rec["branch_head"] = None
            branches[bdir] = rec
        out["merged_branches"] = branches

    ranges = m.current_ranges()
    frag_counts = [len(rec.get("frags", [])) for rec in ranges.values()]
    out["ranges"] = {
        "total": len(ranges),
        "with_fragments": sum(1 for c in frag_counts if c),
        "max_fragments": max(frag_counts, default=0),
        "total_fragments": sum(frag_counts),
    }

    # retained history (time-travel window) from the manifest dir alone
    epochs = [e for e, _ in m._epoch_files()]
    out["retained_epochs"] = {
        "oldest": epochs[0] if epochs else None,
        "count": len(epochs),
    }
    tags = getattr(m, "tags", None)
    if callable(tags):
        try:
            out["tags"] = tags()
        except Exception:
            pass

    arts = {}
    for name, a in list_artifacts(lake_dir).items():
        rec: dict = {"kind": a["kind"], "dir": a["dir"]}
        spec = _KIND_STATE.get(a["kind"])
        if spec:
            fname, keys = spec
            try:
                with open(os.path.join(a["dir"], fname)) as f:
                    st = json.load(f)
            except FileNotFoundError:
                rec["state"] = "never refreshed"
                arts[name] = rec
                continue
            if keys:
                applied = min(
                    (int(st.get(k, -1)) for k in keys), default=-1
                )
                rec["applied_epoch"] = applied
                rec["behind"] = max(0, committed - applied)
                # two-lake views: the right side lags against the RIGHT
                # lake's own head, not this lake's
                right_lake = a.get("params", {}).get("right_lake")
                if right_lake and "applied_right" in st:
                    r_head = Manifest(right_lake).committed_epoch()
                    rec["applied_right"] = int(st["applied_right"])
                    rec["right_behind"] = max(
                        0, r_head - int(st["applied_right"])
                    )
                    rec["behind"] = max(
                        rec["behind"], rec["right_behind"]
                    )
            else:
                rec["state"] = "fingerprint-based (fresh after last sync)"
        arts[name] = rec
    out["artifacts"] = arts

    from datax_ray.state.fs import fs_for as _ff

    consumers = {}
    _cdir = os.path.join(lake_dir, "_manifest", "consumers")
    for p in _ff(lake_dir).list_prefix(_cdir):
        if not p.endswith(".json"):
            continue
        st = json.loads(_ff(p).get(p))
        name = os.path.basename(p)[:-5]
        acked = int(st.get("epoch", -1))
        consumers[name] = {"acked_epoch": acked,
                           "behind": max(0, committed - acked)}
    out["consumers"] = consumers

    from datax_ray.pipelines.redrive import pending_deadletters

    out["deadletter"] = {"pending_files": len(pending_deadletters(lake_dir, m))}
    return out
