"""Exactly-once lake manifest (SURVEY.md §2B-B5/B7/B8).

The manifest directory `<lake>/_manifest/epoch=NNNNNN.json` is the ONLY
durable engine state. Each record carries the FULL partition→file map
(entries for untouched partitions copied forward), the committed LSN
watermark, consumed segments, the evolved schema, lineage rows and metrics.

Commit is two-phase: stage files are written first with deterministic names
(idempotent under Ray's at-least-once task retries), then the manifest JSON
is written to a temp file and os.rename'd into place — rename is atomic on
POSIX, so readers see either the old or the new epoch, never a torn one.
Files not referenced by a committed manifest are orphans from failed epochs
and are ignored (and later overwritten byte-identically on re-run).

This generalizes DataX hdfswriter's temp-then-rename write and mirrors its
channel-statistics/lineage reporting (SURVEY.md §2A rows 7, 16).
"""

from __future__ import annotations

import glob
import json
import os
import re

import pyarrow as pa

from datax_ray.schemas import schema_from_json, schema_to_json

_EPOCH_RE = re.compile(r"epoch=(\d{6})\.json$")


class ConcurrentCommitError(RuntimeError):
    """Two writers raced to commit the same epoch; the loser gets this
    instead of silently clobbering the winner's record."""


class Manifest:
    def __init__(self, lake_dir: str):
        self.lake_dir = lake_dir
        self.dir = os.path.join(lake_dir, "_manifest")

    # -- read side ---------------------------------------------------------

    def _epoch_files(self) -> list[tuple[int, str]]:
        out = []
        for p in glob.glob(os.path.join(self.dir, "epoch=*.json")):
            m = _EPOCH_RE.search(p)
            if m:
                out.append((int(m.group(1)), p))
        return sorted(out)

    def committed_epoch(self) -> int:
        files = self._epoch_files()
        return files[-1][0] if files else -1

    def latest(self) -> dict | None:
        files = self._epoch_files()
        if not files:
            return None
        with open(files[-1][1]) as f:
            return json.load(f)

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
        if not files:
            return None
        with open(files[-1][1]) as f:
            return json.load(f)

    def committed_segments(self) -> set[str]:
        segs: set[str] = set()
        for _, p in self._epoch_files():
            with open(p) as f:
                segs.update(json.load(f)["segments"])
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
        if not os.path.exists(p):
            return {}
        with open(p) as f:
            return {k: int(v) for k, v in json.load(f).items()}

    def _write_tags(self, tags: dict[str, int]) -> None:
        os.makedirs(self.dir, exist_ok=True)
        import threading

        tmp = self._tags_path() + f".tmp.{os.getpid()}.{threading.get_ident()}"
        with open(tmp, "w") as f:
            json.dump(tags, f, indent=1, sort_keys=True)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, self._tags_path())

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
                with open(p) as f:
                    at = json.load(f).get("committed_at")
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
        recs = []
        for _, p in keep:
            with open(p) as f:
                recs.append(json.load(f))
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
        for pattern in ("p=*", "r=*"):
            for path in glob.glob(os.path.join(self.lake_dir, pattern, "*.parquet")):
                rel = os.path.relpath(path, self.lake_dir)
                if rel not in referenced:
                    os.remove(path)
                    removed += 1
        for _, p in drop:
            os.remove(p)
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
        os.makedirs(self.dir, exist_ok=True)
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
        # pid AND thread id: two driver THREADS racing the same epoch
        # (concurrent replays of one lake) share a pid — a shared tmp name
        # would let one thread unlink the other's staged file mid-commit
        import threading

        tmp = final + f".tmp.{os.getpid()}.{threading.get_ident()}"
        with open(tmp, "w") as f:
            json.dump(rec, f, indent=1, sort_keys=True)
            f.flush()
            os.fsync(f.fileno())
        # Atomic AND exclusive commit point: os.link fails with EEXIST if
        # the epoch is already committed, so two drivers racing the same
        # lake get one winner and one loud ConcurrentCommitError — never a
        # silently overwritten record (the loser's fragments are orphaned
        # content-hash files; its segments stay uncommitted and re-apply
        # idempotently on the next replay).
        try:
            os.link(tmp, final)
        except FileExistsError as exc:
            os.remove(tmp)
            raise ConcurrentCommitError(
                f"epoch {epoch} already committed at {final} — another "
                f"writer is active on this lake"
            ) from exc
        os.remove(tmp)
        return rec

    # -- write-audit-publish (Iceberg WAP) ----------------------------------

    def _staged_path(self) -> str:
        return os.path.join(self.dir, "staged.json")

    def staged_record(self) -> dict | None:
        """The staged (written-but-unpublished) epoch record, or None. At
        most one epoch can be staged at a time."""
        p = self._staged_path()
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return json.load(f)

    def stage(self, epoch: int, **kw) -> dict:
        """Write-audit-publish step 1: durably STAGE an epoch record
        without publishing it. The record is a full manifest record (same
        builder as commit), so the staged state is readable via
        `at_epoch("staged")` for auditing, but no committed reader, feed
        or artifact can see it. Exclusive like commit: a second stage
        while one is pending raises (publish or abort first)."""
        rec = self._build_record(epoch, **kw)
        final = self._staged_path()
        import threading

        tmp = final + f".tmp.{os.getpid()}.{threading.get_ident()}"
        with open(tmp, "w") as f:
            json.dump(rec, f, indent=1, sort_keys=True)
            f.flush()
            os.fsync(f.fileno())
        try:
            os.link(tmp, final)
        except FileExistsError as exc:
            os.remove(tmp)
            raise ConcurrentCommitError(
                f"an epoch is already staged at {final} — publish or abort "
                "it before staging another"
            ) from exc
        os.remove(tmp)
        return rec

    def publish_staged(self) -> dict:
        """WAP step 2a: atomically promote the staged record into the
        committed epoch chain. Refuses if nothing is staged, or if the
        committed head MOVED since staging (another writer won the epoch —
        the staged state was audited against a stale base; abort and
        re-stage). The link is the same exclusive os.link commit point, so
        even a publish racing a concurrent commit has exactly one winner."""
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
        try:
            os.link(self._staged_path(), final)
        except FileExistsError as exc:
            raise ConcurrentCommitError(
                f"epoch {epoch} already committed — abort the stale staged "
                "epoch and re-stage"
            ) from exc
        os.remove(self._staged_path())
        return rec

    def abort_staged(self) -> dict | None:
        """WAP step 2b: drop the staged record. Its fragments become
        invisible orphans (content-hash named — a later re-stage rewrites
        identical bytes; vacuum removes them otherwise) and its segments
        stay uncommitted, so the next replay re-applies them exactly-once."""
        rec = self.staged_record()
        if rec is not None:
            os.remove(self._staged_path())
        return rec
