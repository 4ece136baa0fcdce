"""Exactly-once lake manifest (SURVEY.md §2B-B5/B7/B8).

The manifest directory `<lake>/_manifest/epoch=NNNNNN.json` is the ONLY
durable engine state. Each record carries the FULL partition→file map
(entries for untouched partitions copied forward), the committed LSN
watermark, consumed segments, the evolved schema, lineage rows and metrics.

Commit is two-phase: stage files are written first with deterministic names
(idempotent under Ray's at-least-once task retries), then the manifest JSON
is published with the storage layer's ATOMIC CONDITIONAL CREATE
(state/fs.py `put_if_absent`): the epoch object either appears whole or the
commit loses to a concurrent writer with a loud ConcurrentCommitError —
never a torn or silently clobbered record. On POSIX that primitive is
tmp + os.link; on an object store it is the conditional PUT
(S3 `If-None-Match: *`, GCS `ifGenerationMatch=0`) — no rename, no link,
no append anywhere in this protocol, so the lake deploys unchanged on
shared object storage (the round-3 review's top gap).

Files not referenced by a committed manifest are orphans from failed epochs
and are ignored (and later overwritten byte-identically on re-run).

This generalizes DataX hdfswriter's temp-then-rename write and mirrors its
channel-statistics/lineage reporting (SURVEY.md §2A rows 7, 16).
"""

from __future__ import annotations

import os
import re

import pyarrow as pa

from datax_ray.schemas import schema_from_json, schema_to_json
from datax_ray.state.fs import fs_for, json_bytes, read_json

_EPOCH_RE = re.compile(r"epoch=(\d{6})\.json$")


class ConcurrentCommitError(RuntimeError):
    """Two writers raced to commit the same epoch; the loser gets this
    instead of silently clobbering the winner's record."""


class Manifest:
    def __init__(self, lake_dir: str):
        self.lake_dir = lake_dir
        self.dir = os.path.join(lake_dir, "_manifest")
        self.fs = fs_for(lake_dir)

    # -- read side ---------------------------------------------------------

    def _epoch_files(self) -> list[tuple[int, str]]:
        out = []
        for p in self.fs.list_prefix(self.dir):
            m = _EPOCH_RE.search(os.path.basename(p))
            if m and os.path.dirname(p) == self.dir:
                out.append((int(m.group(1)), p))
        return sorted(out)

    def committed_epoch(self) -> int:
        files = self._epoch_files()
        return files[-1][0] if files else -1

    def latest(self) -> dict | None:
        files = self._epoch_files()
        return read_json(files[-1][1]) if files else None

    def at_epoch(self, epoch: int | str | None) -> dict | None:
        """The committed record AS OF `epoch` (largest committed epoch <=
        epoch) — the time-travel read point. Every epoch's manifest is
        retained (until `vacuum`), and data files are content-hash/epoch
        named and never overwritten, so any retained epoch reconstructs
        that exact lake state. None = latest. The sentinel "staged" reads
        the write-audit-publish record (`stage`) — the ONE read point that
        sees unpublished state, for auditing before `publish_staged`."""
        if epoch == "staged":
            rec = self.staged_record()
            if rec is None:
                raise ValueError("no staged epoch on this lake")
            return rec
        if epoch is None:
            return self.latest()
        files = [(e, p) for e, p in self._epoch_files() if e <= epoch]
        return read_json(files[-1][1]) if files else None

    def committed_segments(self) -> set[str]:
        segs: set[str] = set()
        for _, p in self._epoch_files():
            segs.update(read_json(p)["segments"])
        return segs

    def committed_lsn_hi(self) -> int:
        rec = self.latest()
        return rec["lsn_hi"] if rec else -1

    def committed_schema(self, epoch: int | None = None) -> pa.Schema | None:
        rec = self.at_epoch(epoch)
        return schema_from_json(rec["schema"]) if rec else None

    def current_partitions(self, epoch: int | None = None) -> dict[int, dict]:
        """part_id -> {"base": relpath|None, "rows": n, "lsn_hi": int}.
        `rows` counts stored rows (incl. tombstones) — informational."""
        rec = self.at_epoch(epoch)
        if not rec:
            return {}
        return {int(k): v for k, v in rec.get("partitions", {}).items()}

    def current_ranges(self, epoch: int | None = None) -> dict[int, dict]:
        """range_id -> {"frags": [relpath], "rows": n, "lsn_hi": int,
        "epochs": [int]} — fragment files accumulated since the range's
        last compaction, and which epochs contributed."""
        rec = self.at_epoch(epoch)
        if not rec:
            return {}
        return {int(k): v for k, v in rec.get("ranges", {}).items()}

    def committed_layout(self, epoch: int | None = None) -> dict | None:
        """{"num_partitions": P, "frag_ranges": R} — frozen at epoch 0."""
        rec = self.at_epoch(epoch)
        return rec.get("layout") if rec else None

    def committed_properties(self, epoch: int | None = None) -> dict:
        """Lake-level table properties (e.g. persisted ingest expectations —
        Delta-style table CHECK constraints). Set via `alter_lake`, carried
        forward by every commit, {} on pre-upgrade manifests."""
        rec = self.at_epoch(epoch)
        return dict(rec.get("properties") or {}) if rec else {}

    def committed_turn_bounds(
        self, epoch: int | None = None
    ) -> tuple[int | None, int | None]:
        """Global (min, max) turn_idx ever committed as of `epoch` —
        (None, None) on pre-upgrade manifests (readers then skip
        salted-layout pruning, the old behavior)."""
        rec = self.at_epoch(epoch) or {}
        return rec.get("turn_lo"), rec.get("turn_hi")

    def current_files(self) -> list[str]:
        """All committed data files (partition bases + range fragments)."""
        out = []
        for v in self.current_partitions().values():
            if v.get("base"):
                out.append(os.path.join(self.lake_dir, v["base"]))
        for v in self.current_ranges().values():
            out.extend(os.path.join(self.lake_dir, f) for f in v.get("frags", []))
        return out

    # -- tags (named savepoints, Iceberg-style) ----------------------------

    def _tags_path(self) -> str:
        return os.path.join(self.dir, "tags.json")

    def tags(self) -> dict[str, int]:
        """{name: epoch} named savepoints. Metadata only — creating or
        deleting a tag commits no epoch."""
        p = self._tags_path()
        if not self.fs.exists(p):
            return {}
        return {k: int(v) for k, v in read_json(p).items()}

    def _write_tags(self, tags: dict[str, int]) -> None:
        # atomic PUT (last-writer-wins, same semantics as the old
        # os.replace) — tags are advisory metadata, not the commit chain
        self.fs.put(self._tags_path(), json_bytes(tags))

    def set_tag(self, name: str, epoch: int | None = None) -> int:
        """Tag a committed epoch (default: the latest) with a stable name.
        Tagged epochs SURVIVE vacuum — the retention contract that makes a
        tag a durable savepoint rather than a comment."""
        target = self.committed_epoch() if epoch is None else int(epoch)
        if target < 0 or target > self.committed_epoch():
            raise ValueError(f"epoch {epoch} is not committed")
        tags = self.tags()
        tags[name] = target
        self._write_tags(tags)
        return target

    def delete_tag(self, name: str) -> bool:
        tags = self.tags()
        if name not in tags:
            return False
        del tags[name]
        self._write_tags(tags)
        return True

    def resolve_tag(self, name: str) -> int:
        tags = self.tags()
        if name not in tags:
            raise ValueError(f"unknown tag {name!r} (have: {sorted(tags)})")
        return tags[name]

    # -- retention ---------------------------------------------------------

    def vacuum(self, keep_epochs: int = 1, older_than_s: float | None = None) -> dict:
        """Drop time-travel history: retain the newest `keep_epochs`
        manifest records PLUS every tagged epoch's record, and delete (a)
        other manifest files and (b) any data file under p=*/r=* not
        referenced by a retained record. `older_than_s` switches to
        TIME-BASED retention (the Delta `VACUUM ... RETAIN` policy): keep
        every record committed within the last `older_than_s` seconds —
        the newest record is always kept regardless of age, and tagged
        epochs stay pinned either way (pre-upgrade records without a
        committed_at stamp count as old). Offline operation — do not run
        concurrently with replay/compact (they only ADD files, but a
        reader pinned to a dropped epoch would lose its files).
        Dead-letter files are never touched."""
        files = self._epoch_files()
        if older_than_s is not None:
            import time as _time

            cutoff = _time.time() - older_than_s
            keep = []
            for e, p in files:
                at = read_json(p).get("committed_at")
                if at is not None and at >= cutoff:
                    keep.append((e, p))
            if files and (not keep or keep[-1] != files[-1]):
                keep.append(files[-1])  # the head is never dropped
            keep = sorted(set(keep))
        else:
            keep = files[-keep_epochs:] if keep_epochs > 0 else files
        # tagged epochs are pinned: resolve each tag to the record that
        # serves it (largest committed epoch <= tag target, same rule as
        # at_epoch) and retain that manifest file too
        pinned: set[int] = set()
        for target in self.tags().values():
            serving = [e for e, _ in files if e <= target]
            if serving:
                pinned.add(serving[-1])
        keep = sorted(
            {(e, p) for e, p in keep} | {(e, p) for e, p in files if e in pinned}
        )
        drop = [(e, p) for e, p in files if (e, p) not in set(keep)]
        referenced: set[str] = set()
        recs = [read_json(p) for _, p in keep]
        staged = self.staged_record()
        if staged is not None:
            # a staged (write-audit-publish) epoch's fresh fragments are
            # referenced ONLY by the staged record — they must survive
            # vacuum or publish would promote dangling references
            recs.append(staged)
        for rec in recs:
            for v in rec.get("partitions", {}).values():
                if v.get("base"):
                    referenced.add(v["base"])
            for v in rec.get("ranges", {}).values():
                referenced.update(v.get("frags", []))
        removed = 0
        for path in self.fs.list_prefix(self.lake_dir):
            rel = os.path.relpath(path, self.lake_dir)
            top = rel.split(os.sep, 1)[0]
            if not (top.startswith("p=") or top.startswith("r=")):
                continue
            if not rel.endswith(".parquet"):
                continue
            if rel not in referenced:
                self.fs.delete(path)
                removed += 1
        for _, p in drop:
            self.fs.delete(p)
        return {
            "manifests_removed": len(drop),
            "files_removed": removed,
            "epochs_kept": [e for e, _ in keep],
        }

    # -- write side --------------------------------------------------------

    def _build_record(
        self,
        epoch: int,
        *,
        segments: list[str],
        lsn_hi: int,
        schema: pa.Schema,
        partitions: dict[int, dict],
        ranges: dict[int, dict] | None = None,
        layout: dict | None = None,
        lineage: list[dict],
        metrics: dict,
        properties: dict | None = None,
    ) -> dict:
        # Fold global turn_idx bounds: previous record's bounds + this
        # epoch's lineage rows (every fragment/base writer records
        # per-file turn_lo/turn_hi via stages/delta.py). Monotone-widening
        # data property, independent of layout — salted point lookups use
        # it to enumerate the salt values that can exist (lake.py).
        prev = self.latest() or {}
        los = [prev.get("turn_lo")] + [r.get("turn_lo") for r in lineage]
        his = [prev.get("turn_hi")] + [r.get("turn_hi") for r in lineage]
        los = [v for v in los if v is not None]
        his = [v for v in his if v is not None]
        import time as _time

        rec = {
            "epoch": epoch,
            "committed_at": _time.time(),  # drives time-based retention
            "turn_lo": min(los) if los else None,
            "turn_hi": max(his) if his else None,
            "segments": sorted(os.path.basename(s) for s in segments),
            "lsn_hi": int(lsn_hi),
            "schema": schema_to_json(schema),
            "partitions": {str(k): v for k, v in partitions.items()},
            "ranges": {str(k): v for k, v in (ranges or {}).items()},
            "layout": layout,
            # table properties carry forward unless a commit (alter_lake)
            # explicitly replaces them — so constraints survive every
            # replay/compact/purge/migration epoch without each caller
            # having to thread them through
            "properties": properties if properties is not None
            else prev.get("properties"),
            "lineage": lineage,
            "metrics": metrics,
        }
        return rec

    def commit(self, epoch: int, **kw) -> dict:
        rec = self._build_record(epoch, **kw)
        final = os.path.join(self.dir, f"epoch={epoch:06d}.json")
        # Atomic AND exclusive commit point: the storage layer's
        # conditional create (POSIX: tmp+link; object store: conditional
        # PUT) fails if the epoch is already committed, so two drivers
        # racing the same lake get one winner and one loud
        # ConcurrentCommitError — never a silently overwritten record
        # (the loser's fragments are orphaned content-hash files; its
        # segments stay uncommitted and re-apply idempotently on the
        # next replay).
        if not self.fs.put_if_absent(final, json_bytes(rec)):
            raise ConcurrentCommitError(
                f"epoch {epoch} already committed at {final} — another "
                f"writer is active on this lake"
            )
        return rec

    # -- write-audit-publish (Iceberg WAP) ----------------------------------

    def _staged_path(self) -> str:
        return os.path.join(self.dir, "staged.json")

    def staged_record(self) -> dict | None:
        """The staged (written-but-unpublished) epoch record, or None. At
        most one epoch can be staged at a time."""
        p = self._staged_path()
        return read_json(p) if self.fs.exists(p) else None

    def stage(self, epoch: int, **kw) -> dict:
        """Write-audit-publish step 1: durably STAGE an epoch record
        without publishing it. The record is a full manifest record (same
        builder as commit), so the staged state is readable via
        `at_epoch("staged")` for auditing, but no committed reader, feed
        or artifact can see it. Exclusive like commit: a second stage
        while one is pending raises (publish or abort first)."""
        rec = self._build_record(epoch, **kw)
        final = self._staged_path()
        if not self.fs.put_if_absent(final, json_bytes(rec)):
            raise ConcurrentCommitError(
                f"an epoch is already staged at {final} — publish or abort "
                "it before staging another"
            )
        return rec

    def publish_staged(self) -> dict:
        """WAP step 2a: atomically promote the staged record into the
        committed epoch chain. Refuses if nothing is staged, or if the
        committed head MOVED since staging (another writer won the epoch —
        the staged state was audited against a stale base; abort and
        re-stage). Promotion is the same conditional-create commit point,
        so even a publish racing a concurrent commit has exactly one
        winner. A crash between promote and the staged-record cleanup
        leaves a stale staged.json whose epoch no longer follows the head
        — the next publish refuses and abort_staged clears it, exactly as
        before."""
        rec = self.staged_record()
        if rec is None:
            raise ValueError("nothing is staged on this lake")
        epoch = int(rec["epoch"])
        if epoch != self.committed_epoch() + 1:
            raise ConcurrentCommitError(
                f"staged epoch {epoch} no longer follows the committed head "
                f"{self.committed_epoch()} — another writer committed since "
                "staging; abort the stale staged epoch and re-stage"
            )
        final = os.path.join(self.dir, f"epoch={epoch:06d}.json")
        if not self.fs.put_if_absent(final, json_bytes(rec)):
            raise ConcurrentCommitError(
                f"epoch {epoch} already committed — abort the stale staged "
                "epoch and re-stage"
            )
        self.fs.delete(self._staged_path())
        return rec

    def abort_staged(self) -> dict | None:
        """WAP step 2b: drop the staged record. Its fragments become
        invisible orphans (content-hash named — a later re-stage rewrites
        identical bytes; vacuum removes them otherwise) and its segments
        stay uncommitted, so the next replay re-applies them exactly-once."""
        rec = self.staged_record()
        if rec is not None:
            self.fs.delete(self._staged_path())
        return rec
