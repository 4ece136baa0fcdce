"""Lake branching — O(metadata) clone of a committed epoch.

Because every data file is immutable and content-/epoch-addressed, and
every writer in the engine creates NEW inodes (tmp + os.replace — nothing
ever mutates a committed file in place), a "branch" of the lake is just:

  1. HARDLINK every file the chosen epoch's record references into the
     destination under the same relative paths (os.link; falls back to a
     copy across filesystems or with --copy). Cost: O(files) directory
     entries, zero data bytes.
  2. Write ONE synthetic branch-point manifest record at the source's
     epoch number: the chosen record, with `segments` replaced by the
     UNION of all segments committed up to that epoch — the branch has a
     single record, and replay's already-committed-segment skip reads the
     cumulative set across records, so the union preserves exactly-once
     on the branch.

The branch is then a fully independent lake: replay/tail continue ingest
on it, purge/repartition/vacuum restructure it — none of it can touch the
source, because removals are unlink (drops one link) and every write is a
new inode. The inverse holds too; the two lakes share bytes until either
side rewrites or vacuums them (copy-on-write at file granularity).

Deliberate limits (documented, asserted in tests): time travel and the
change feed on a branch start AT the branch point (only one record
exists), exactly like history past `vacuum`; dead-letter files are linked
too so purge --hard scrubs stay branch-local (os.replace = new inode).
"""

from __future__ import annotations

import json
import os
import shutil

from datax_ray.state.manifest import Manifest


def _link_or_copy(src: str, dst: str, copy: bool) -> str:
    os.makedirs(os.path.dirname(dst), exist_ok=True)
    if not copy:
        try:
            os.link(src, dst)
            return "linked"
        except OSError:
            pass  # cross-device / fs without hardlinks -> copy
    shutil.copy2(src, dst)
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
        with open(p) as f:
            segs.update(json.load(f)["segments"])

    files: set[str] = set()
    for v in rec.get("partitions", {}).values():
        if v.get("base"):
            files.add(v["base"])
    for v in rec.get("ranges", {}).values():
        files.update(v.get("frags", []))

    linked = copied = 0
    for rel in sorted(files):
        how = _link_or_copy(
            os.path.join(src_dir, rel), os.path.join(dst_dir, rel), copy
        )
        linked += how == "linked"
        copied += how == "copied"

    # Dead-letter files ride along (purge --hard must be able to scrub
    # them branch-locally; os.replace rewrites are new inodes, so the
    # source's dead letters are never touched through the link).
    dl_root = os.path.join(src_dir, "_deadletter")
    dl = 0
    if os.path.isdir(dl_root):
        for root, _, names in os.walk(dl_root):
            for name in names:
                s = os.path.join(root, name)
                rel = os.path.relpath(s, src_dir)
                how = _link_or_copy(s, os.path.join(dst_dir, rel), copy)
                dl += 1
                linked += how == "linked"
                copied += how == "copied"

    branch_rec = dict(rec)
    branch_rec["segments"] = sorted(segs)
    branch_rec["metrics"] = {
        **(rec.get("metrics") or {}),
        "branch": {"from": os.path.abspath(src_dir), "at_epoch": epoch},
    }
    mdir = os.path.join(dst_dir, "_manifest")
    os.makedirs(mdir, exist_ok=True)
    final = os.path.join(mdir, f"epoch={epoch:06d}.json")
    tmp = final + ".tmp"
    with open(tmp, "w") as f:
        json.dump(branch_rec, f, indent=1, sort_keys=True)
        f.flush()
        os.fsync(f.fileno())
    os.rename(tmp, final)

    return {
        "epoch": epoch,
        "files": len(files),
        "deadletter_files": dl,
        "linked": linked,
        "copied": copied,
    }
