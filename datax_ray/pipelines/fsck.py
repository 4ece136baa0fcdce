"""Lake fsck — invariant checker for the manifest + data files.

An exactly-once lake is only as trustworthy as its invariants are
checkable. `fsck` verifies, without touching row data unless asked:

  manifest chain   epochs parse, lsn_hi never regresses, schema of every
                   retained record parses, layout fields are sane;
  reference check  every file a retained manifest references exists on
                   disk (a missing file = unreadable epoch — the one
                   corruption vacuum/commit can never cause on their own,
                   so it signals external interference);
  orphan scan      data files on disk referenced by NO retained record —
                   expected transients (crashed pre-commit writers leave
                   content-hash files; vacuum reclaims them), listed so
                   operators can distinguish them from leaks;
  accounting       per-range/per-partition `rows` in the latest manifest
                   vs the parquet FOOTER totals of its files — a
                   metadata-only read (no column data is decompressed).

`deep=True` additionally re-hashes fragment file bytes against their
content-hash filenames (bit-rot / tamper detection) as a distributed map
over files — O(lake bytes) but embarrassingly parallel; light mode is
O(files) footer reads and runs on the driver because at any scale the
MANIFEST is driver-sized (it must be: commit is a driver step).
"""

from __future__ import annotations

import hashlib
import json
import os

import pyarrow.parquet as pq

from datax_ray.schemas import schema_from_json
from datax_ray.state.manifest import Manifest


def fsck(lake_dir: str, deep: bool = False) -> dict:
    from datax_ray.state.fs import fs_for

    fs = fs_for(lake_dir)
    m = Manifest(lake_dir)
    files = m._epoch_files()
    report: dict = {
        "epochs": len(files),
        "errors": [],
        "orphan_files": [],
        "checked_files": 0,
    }
    if not files:
        report["errors"].append("no committed epochs")
        return report

    # 1. manifest chain
    prev_lsn = -1
    referenced: set[str] = set()
    for e, p in files:
        try:
            rec = json.loads(fs.get(p))
        except (OSError, json.JSONDecodeError) as exc:
            report["errors"].append(f"epoch {e}: unreadable manifest ({exc})")
            continue
        if rec.get("epoch") != e:
            report["errors"].append(
                f"epoch {e}: filename/record mismatch ({rec.get('epoch')})"
            )
        try:
            schema_from_json(rec["schema"])
        except Exception as exc:  # noqa: BLE001 — any parse failure is the finding
            report["errors"].append(f"epoch {e}: schema unparseable ({exc})")
        lsn = int(rec.get("lsn_hi", -1))
        if lsn < prev_lsn:
            report["errors"].append(
                f"epoch {e}: lsn_hi regressed {prev_lsn} -> {lsn}"
            )
        prev_lsn = lsn
        layout = rec.get("layout") or {}
        if int(layout.get("num_partitions", 1) or 1) < 1:
            report["errors"].append(f"epoch {e}: bad layout {layout}")
        for v in rec.get("partitions", {}).values():
            if v.get("base"):
                referenced.add(v["base"])
        for v in rec.get("ranges", {}).values():
            referenced.update(v.get("frags", []))

    # 2. every referenced file exists
    for rel in sorted(referenced):
        if not fs.exists(os.path.join(lake_dir, rel)):
            report["errors"].append(f"missing referenced file: {rel}")

    # 3. orphans (vacuum candidates, not errors)
    on_disk = {
        os.path.relpath(p, lake_dir)
        for p in fs.list_prefix(lake_dir)
        if p.endswith(".parquet")
        and os.path.relpath(p, lake_dir).split(os.sep, 1)[0][:2] in ("p=", "r=")
    }
    report["orphan_files"] = sorted(on_disk - referenced)

    # 4. latest-record accounting vs parquet footers (metadata-only)
    latest = m.latest() or {}
    for pid, v in latest.get("partitions", {}).items():
        rel = v.get("base")
        if not rel or not fs.exists(os.path.join(lake_dir, rel)):
            continue
        try:
            n = pq.read_metadata(fs.open_input(os.path.join(lake_dir, rel))).num_rows
        except Exception as exc:  # noqa: BLE001 — corrupt footer IS the finding
            report["errors"].append(f"unreadable parquet footer: {rel} ({exc})")
            continue
        report["checked_files"] += 1
        if int(v.get("rows", -1)) != n:
            report["errors"].append(
                f"partition {pid}: manifest rows {v.get('rows')} != footer {n} ({rel})"
            )
    for rid, v in latest.get("ranges", {}).items():
        total = 0
        ok = True
        for rel in v.get("frags", []):
            path = os.path.join(lake_dir, rel)
            if not fs.exists(path):
                ok = False
                continue
            try:
                total += pq.read_metadata(fs.open_input(path)).num_rows
            except Exception as exc:  # noqa: BLE001
                report["errors"].append(
                    f"unreadable parquet footer: {rel} ({exc})"
                )
                ok = False
                continue
            report["checked_files"] += 1
        if ok and int(v.get("rows", -1)) != total:
            report["errors"].append(
                f"range {rid}: manifest rows {v.get('rows')} != footer sum {total}"
            )

    # 5. deep: fragment bytes vs content-hash filename (distributed)
    if deep:
        import pyarrow as pa

        import ray.data

        frag_rels = sorted(
            rel for rel in referenced if os.path.basename(rel).startswith("e=")
        )

        def check(batch: pa.Table) -> pa.Table:
            rels, oks = [], []
            from datax_ray.state.fs import fs_for as _ff

            for rel in batch["rel"].to_pylist():
                path = os.path.join(lake_dir, rel)
                if not _ff(path).exists(path):
                    continue  # already reported as missing in step 2
                digest = hashlib.sha1(_ff(path).get(path)).hexdigest()[:16]
                want = os.path.basename(rel).split("-", 1)[1].split(".")[0]
                rels.append(rel)
                oks.append(digest == want)
            return pa.table({
                "rel": pa.array(rels, pa.string()),
                "ok": pa.array(oks, pa.bool_()),
            })

        if frag_rels:
            out = (
                ray.data.from_items(
                    [{"rel": r} for r in frag_rels],
                    override_num_blocks=min(len(frag_rels), 64),
                )
                .map_batches(check, batch_format="pyarrow", batch_size=None)
                .take_all()
            )
            for r in out:
                if not r["ok"]:
                    report["errors"].append(
                        f"content-hash mismatch: {r['rel']}"
                    )
            # count only files actually hashed (missing ones were skipped)
            report["checked_files"] += len(out)

    report["ok"] = not report["errors"]
    return report
