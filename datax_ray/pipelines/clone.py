"""Lake branching — O(metadata) clone of a committed epoch.

Because every data file is immutable and content-/epoch-addressed, and
every writer in the engine creates NEW objects (atomic full-object put —
nothing ever mutates a committed file in place), a "branch" of the lake is
just:

  1. SERVER-SIDE-COPY every file the chosen epoch's record references into
     the destination under the same relative paths (state/fs.py `copy`:
     hardlink on POSIX — CoW, zero data bytes; S3 CopyObject / HDFS cp on
     shared storage — no bytes through the client; a plain byte copy with
     --copy or across backends). Cost: O(files) metadata operations.
  2. Write ONE synthetic branch-point manifest record at the source's
     epoch number: the chosen record, with `segments` replaced by the
     UNION of all segments committed up to that epoch — the branch has a
     single record, and replay's already-committed-segment skip reads the
     cumulative set across records, so the union preserves exactly-once
     on the branch. The record lands via the same exclusive conditional
     create as every commit (put_if_absent), so cloning onto a dirty
     destination cannot clobber it.

The branch is then a fully independent lake: replay/tail continue ingest
on it, purge/repartition/vacuum restructure it — none of it can touch the
source, because removals drop only the branch's name for a shared object
and every write is a new object. The inverse holds too; the two lakes
share bytes until either side rewrites or vacuums them (copy-on-write at
file granularity).

Deliberate limits (documented, asserted in tests): time travel and the
change feed on a branch start AT the branch point (only one record
exists), exactly like history past `vacuum`; dead-letter files are copied
too so purge --hard scrubs stay branch-local (rewrites are new objects).
"""

from __future__ import annotations

import os

from datax_ray.state.fs import canon_path, fs_for, json_bytes, read_json
from datax_ray.state.manifest import Manifest


def _copy_file(src: str, dst: str, copy: bool) -> str:
    sfs, dfs = fs_for(src), fs_for(dst)
    if sfs is dfs and not copy:
        return sfs.copy(src, dst)  # server-side (link/CopyObject)
    dfs.put(dst, sfs.get(src))  # cross-backend or forced byte copy
    return "copied"


def clone_lake(
    src_dir: str,
    dst_dir: str,
    as_of_epoch: int | None = None,
    copy: bool = False,
) -> dict:
    """Branch `src_dir`'s state AS OF `as_of_epoch` (default: head) into
    `dst_dir` (must not already be a lake). Returns link/copy counts."""
    m = Manifest(src_dir)
    rec = m.at_epoch(as_of_epoch)
    if rec is None:
        raise ValueError(
            f"no committed epoch {'<= ' + str(as_of_epoch) if as_of_epoch is not None else ''} "
            f"at {src_dir}"
        )
    if Manifest(dst_dir).committed_epoch() >= 0:
        raise ValueError(f"destination {dst_dir} is already a committed lake")
    epoch = int(rec["epoch"])

    # Cumulative segment set up to the branch point (exactly-once on the
    # branch: its single record must carry everything already applied).
    segs: set[str] = set()
    for e, p in m._epoch_files():
        if e > epoch:
            continue
        segs.update(read_json(p)["segments"])

    files: set[str] = set()
    for v in rec.get("partitions", {}).values():
        if v.get("base"):
            files.add(v["base"])
    for v in rec.get("ranges", {}).values():
        files.update(v.get("frags", []))

    linked = copied = 0
    for rel in sorted(files):
        how = _copy_file(
            os.path.join(src_dir, rel), os.path.join(dst_dir, rel), copy
        )
        linked += how == "linked"
        copied += how == "copied"

    # Dead-letter files ride along (purge --hard must be able to scrub
    # them branch-locally; every rewrite is a new object, so the source's
    # dead letters are never touched through the shared bytes).
    sfs = fs_for(src_dir)
    dl_root = os.path.join(src_dir, "_deadletter")
    dl = 0
    for s in sfs.list_prefix(dl_root):
        rel = os.path.relpath(s, src_dir)
        how = _copy_file(s, os.path.join(dst_dir, rel), copy)
        dl += 1
        linked += how == "linked"
        copied += how == "copied"

    branch_rec = dict(rec)
    branch_rec["segments"] = sorted(segs)
    branch_rec["metrics"] = {
        **(rec.get("metrics") or {}),
        "branch": {"from": canon_path(src_dir), "at_epoch": epoch},
    }
    final = os.path.join(dst_dir, "_manifest", f"epoch={epoch:06d}.json")
    if not fs_for(dst_dir).put_if_absent(final, json_bytes(branch_rec)):
        raise ValueError(f"destination {dst_dir} is already a committed lake")

    return {
        "epoch": epoch,
        "files": len(files),
        "deadletter_files": dl,
        "linked": linked,
        "copied": copied,
    }
