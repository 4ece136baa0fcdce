"""Streaming transport source — a NETWORK CDC consumer for the envelope
interop loop (round-3 review, "What's missing" #3: the engine ingested
Debezium-style envelopes only from files; real deployments tail a broker).

Shape: newline-delimited JSON envelope records over a TCP socket, with a
Kafka-consumer-style resume handshake:

    client -> {"resume_from": <next_seq>}\\n
    server -> one JSON envelope per line, each with a strictly-increasing
              integer `_seq`; {"eof": true} ends a bounded stream.

The consumer SPOOLS records into `env-stream-e{lo}-{hi}.jsonl` window
files (the exact shape `sources/envelope.py:envelopes_to_segments`
ingests — name order == seq order == stream order, the converter's
identity contract), then the normal envingest → replay machinery lands
them exactly-once.

Delivery semantics — at-least-once transport, exactly-once lake:
  * The spool directory LISTING is the source of truth for progress:
    next_seq = max(hi)+1 over spooled windows. A crash between "window
    file durable" and anything else loses nothing — the next connect
    resumes exactly after the last durable window, so no seq is ever
    spooled twice and the converter (file-name keyed, idempotent) never
    double-converts. Redelivered records below next_seq are dropped at
    the socket.
  * Window files are written with the atomic full-object put
    (state/fs.py) — a torn write is invisible.
  * Downstream, segment conversion and replay keep their own
    exactly-once bookkeeping (envingest state, manifest watermark), so
    the full chain re-runs idempotently from any crash point.

No external broker exists in the sandbox, so the module also ships the
reference `EnvelopeStreamServer` (a ~60-line threading TCP server with
the same handshake) — tests drive the consumer against it over localhost
including mid-stream disconnects; a real Kafka/Debezium bridge replaces
the server, not the consumer.

THE CONSUMER SEAM (round-4 review #8): the spool loop is written against
a minimal Kafka-shaped `Consumer` protocol — seek(offset) / poll(max) /
ack(offset) / close(), plus an `eof` flag for bounded streams — not
against the socket. Two in-repo implementations prove the seam:

  * `SocketConsumer` — the TCP resume-handshake transport above;
  * `FileBrokerConsumer` — a file-backed partitioned topic
    (`FileBroker`), one consumer per partition, offsets =
    partition-local positions, exactly a Kafka topic on shared storage.

A real Kafka client maps 1:1 (seek → Consumer.seek, poll → poll(),
ack → commitSync, eof → end-offset watermark) and drops in without
touching the spool/convert/replay chain. Both implementations run the
full envelope round-trip in tests/test_stream.py.
"""

from __future__ import annotations

import json
import os
import re
import socket
import threading
import time

from datax_ray.state.fs import fs_for

_WINDOW_RE = re.compile(r"^env-stream-e(\d{12})-(\d{12})\.jsonl$")


def _spooled_next_seq(spool_dir: str) -> int:
    """Progress = the spool listing (crash-proof; no separate state file
    to fall out of sync with the durable windows)."""
    hi = -1
    for p in fs_for(spool_dir).list_prefix(spool_dir):
        m = _WINDOW_RE.match(os.path.basename(p))
        if m:
            hi = max(hi, int(m.group(2)))
    return hi + 1


class SocketConsumer:
    """The TCP resume-handshake transport behind the Consumer protocol.
    poll() retries dropped connections internally (bounded budget) and
    returns [] only at a bounded stream's end or when the budget is
    spent; redelivered records pass through — the spool loop dedups by
    expected seq. ack() is a no-op: the spool LISTING is the progress
    truth (module docstring), the same reason a Kafka client would
    commitSync here purely as an optimization."""

    def __init__(self, addr: tuple[str, int], *, max_reconnects: int = 5,
                 idle_timeout_s: float = 10.0):
        self.addr = addr
        self.eof = False
        self._pos = 0
        self._budget = max_reconnects
        self._attempts = 0
        self._timeout = idle_timeout_s
        self._sock = None
        self._reader = None

    def seek(self, offset: int) -> None:
        self._pos = offset
        self._disconnect()

    def ack(self, offset: int) -> None:
        pass  # progress truth is the durable spool listing

    def close(self) -> None:
        self._disconnect()

    def _disconnect(self) -> None:
        if self._sock is not None:
            try:
                self._sock.close()
            except OSError:
                pass
        self._sock = None
        self._reader = None

    def _connect(self) -> None:
        self._sock = socket.create_connection(self.addr, timeout=self._timeout)
        self._sock.sendall(
            (json.dumps({"resume_from": self._pos}) + "\n").encode()
        )
        self._reader = self._sock.makefile("r", encoding="utf-8")

    def poll(self, max_records: int) -> list[tuple[int, dict]]:
        out: list[tuple[int, dict]] = []
        while not out and not self.eof and self._budget >= 0:
            try:
                if self._reader is None:
                    self._connect()
                for line in self._reader:
                    line = line.strip()
                    if not line:
                        continue
                    rec = json.loads(line)
                    if rec.get("eof"):
                        self.eof = True
                        break
                    seq = int(rec.pop("_seq"))
                    if seq >= self._pos:
                        self._pos = seq + 1
                    out.append((seq, rec))
                    if len(out) >= max_records:
                        return out
                if not self.eof:  # server closed without eof: bounded retry
                    self._disconnect()
                    self._budget -= 1
                    self._attempts += 1
                    time.sleep(min(0.1 * self._attempts, 1.0))
            except (ConnectionError, socket.timeout, OSError):
                self._disconnect()
                self._budget -= 1
                self._attempts += 1
                time.sleep(min(0.1 * self._attempts, 1.0))
        return out


def stream_consume(
    source,
    spool_dir: str,
    *,
    batch_records: int = 2000,
    max_reconnects: int = 5,
    idle_timeout_s: float = 10.0,
) -> dict:
    """Consume an envelope stream into spooled window files until the
    source signals eof (or runs dry within its retry budget). `source` is
    a `(host, port)` tuple (wrapped in a SocketConsumer) or any object
    speaking the Consumer protocol (seek/poll/ack/close + `eof`).
    Returns {"records", "windows", "next_seq"}. Safe to re-run any time:
    resumes after the last durable window."""
    own = isinstance(source, tuple)
    consumer = (
        SocketConsumer(source, max_reconnects=max_reconnects,
                       idle_timeout_s=idle_timeout_s)
        if own else source
    )
    next_seq = _spooled_next_seq(spool_dir)
    buf: list[str] = []
    buf_lo = next_seq
    windows = 0
    records = 0
    fs = fs_for(spool_dir)

    def flush():
        nonlocal buf, buf_lo, windows, next_seq
        if not buf:
            return
        hi = buf_lo + len(buf) - 1
        rel = f"env-stream-e{buf_lo:012d}-{hi:012d}.jsonl"
        fs.put(os.path.join(spool_dir, rel),
               ("\n".join(buf) + "\n").encode())
        windows += 1
        next_seq = hi + 1
        buf = []
        buf_lo = next_seq

    try:
        consumer.seek(next_seq)
        while not consumer.eof:
            polled = consumer.poll(batch_records)
            if not polled:
                break  # bounded stream end / retry budget spent
            for seq, rec in polled:
                expected = next_seq + len(buf)
                if seq < expected:
                    continue  # at-least-once redelivery: drop
                if seq > expected:
                    raise RuntimeError(
                        f"stream gap: expected seq {expected}, got {seq} — "
                        "the consumer must deliver contiguously from seek()"
                    )
                buf.append(json.dumps(rec, sort_keys=True))
                records += 1
                if len(buf) >= batch_records:
                    flush()
                    consumer.ack(next_seq)
        flush()
        consumer.ack(next_seq)
    finally:
        if own:
            consumer.close()
    return {"records": records, "windows": windows, "next_seq": next_seq}


def stream_ingest(
    source,
    spool_dir: str,
    changes_dir: str,
    replay_cfg=None,
    **consume_kw,
) -> dict:
    """One poll of the full chain: consumer → spooled windows → change-log
    segments → (optionally) replay into the lake. `source` is a
    `(host, port)` tuple or any Consumer-protocol object. Each stage is
    independently idempotent, so this composes into a polling loop the
    same way `tail` does."""
    from datax_ray.sources.envelope import envelopes_to_segments

    got = stream_consume(source, spool_dir, **consume_kw)
    conv = envelopes_to_segments(spool_dir, changes_dir)
    out = {**got, "converted_files": conv.get("converted_files"),
           "converted_rows": conv.get("rows")}
    if replay_cfg is not None:
        from datax_ray.pipelines.replay import replay

        reports = replay(replay_cfg)
        out["epochs"] = len(reports) if isinstance(reports, list) else 0
    return out


def stream_tail(
    source,
    spool_dir: str,
    changes_dir: str,
    replay_cfg,
    *,
    batch_records: int = 2000,
    epoch_records: int | None = None,
    on_epoch=None,
    max_epochs: int | None = None,
) -> dict:
    """PIPELINED continuous tailing: a background spooler thread keeps
    draining the consumer into durable window files while the foreground
    loop converts + replays whatever has landed — so the socket/broker is
    read DURING replay instead of between replays (the synchronous
    stream_ingest loop leaves the transport idle for the whole commit,
    which caps its throughput at the commit rate and back-pressures the
    producer; measured in bench.py --latency).

    `epoch_records` bounds how many records the foreground waits to
    accumulate before committing an epoch (None = commit whatever is
    pending each iteration — lowest latency). Crash-safety is unchanged:
    the spool listing stays the progress truth, windows are atomic puts,
    and convert/replay keep their own exactly-once bookkeeping; killing
    this loop anywhere resumes exactly (the same contract as
    stream_consume, just concurrent).

    Runs until the consumer signals eof and everything spooled is
    committed (or `max_epochs` epochs landed). `on_epoch(reports,
    spooled_hi)` fires after each commit — the latency bench's hook.
    Returns {"records", "windows", "epochs"}."""
    from datax_ray.pipelines.replay import replay
    from datax_ray.sources.envelope import envelopes_to_segments

    result: dict = {}
    err: list = []
    done = threading.Event()

    def spooler():
        try:
            result.update(
                stream_consume(source, spool_dir, batch_records=batch_records)
            )
        except BaseException as e:  # surfaced to the foreground loop
            err.append(e)
        finally:
            done.set()

    t = threading.Thread(target=spooler, daemon=True)
    t.start()
    epochs = 0
    unreplayed = 0
    try:
        while True:
            if err:
                raise err[0]
            # read the finished flag BEFORE converting: if it was already
            # set, this convert sees every window the spooler wrote
            finished = done.is_set()
            conv = envelopes_to_segments(spool_dir, changes_dir)
            unreplayed += int(conv.get("rows") or 0)
            if unreplayed and (
                finished
                or epoch_records is None
                or unreplayed >= epoch_records
            ):
                reports = replay(replay_cfg)
                if reports:
                    epochs += len(reports)
                    if on_epoch:
                        on_epoch(reports, _spooled_next_seq(spool_dir))
                unreplayed = 0
                if max_epochs is not None and epochs >= max_epochs:
                    break
            elif finished:
                break  # spooler done, nothing converted, nothing pending
            else:
                time.sleep(0.05)
    finally:
        done.wait(timeout=60)
        t.join(timeout=60)
    return {**result, "epochs": epochs}


class EnvelopeStreamServer:
    """Reference broker for tests/demos: serves a fixed record list over
    TCP with the resume handshake, optionally dropping the connection
    every `drop_every` records to exercise reconnect/redelivery. A real
    deployment replaces this class with a Kafka/Debezium bridge speaking
    the same three-line protocol."""

    def __init__(self, records: list[dict], host: str = "127.0.0.1",
                 port: int = 0, drop_every: int | None = None,
                 redeliver: int = 0):
        self._records = records
        self._drop_every = drop_every
        self._redeliver = redeliver
        self._srv = socket.create_server((host, port))
        self.addr = self._srv.getsockname()
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._serve, daemon=True)

    def __enter__(self):
        self._thread.start()
        return self

    def __exit__(self, *exc):
        self._stop.set()
        try:
            self._srv.close()
        except OSError:
            pass
        self._thread.join(timeout=5)

    def _serve(self):
        self._srv.settimeout(0.2)
        while not self._stop.is_set():
            try:
                conn, _ = self._srv.accept()
            except socket.timeout:
                continue
            except OSError:
                return
            try:
                with conn:
                    f = conn.makefile("r", encoding="utf-8")
                    start = int(json.loads(f.readline())["resume_from"])
                    # at-least-once flavor: optionally re-send a few
                    # already-acknowledged records before the resume point
                    start = max(0, start - self._redeliver)
                    sent = 0
                    for seq in range(start, len(self._records)):
                        conn.sendall(
                            (json.dumps({**self._records[seq], "_seq": seq})
                             + "\n").encode()
                        )
                        sent += 1
                        if self._drop_every and sent >= self._drop_every:
                            raise ConnectionResetError  # simulate broker drop
                    conn.sendall(b'{"eof": true}\n')
            except (ConnectionError, BrokenPipeError, ValueError, OSError):
                continue


class FileBroker:
    """File-backed partitioned topic — the in-repo second transport
    behind the Consumer seam (a Kafka topic on shared storage). Layout
    under <broker_dir>, all I/O through the state/fs.py contract so the
    topic may live on an object store next to the lake:

        p=NNN/log-<lo>-<hi>.jsonl   append-only publish batches; a
                                    record's offset is its partition-
                                    local position (line order within
                                    name-ordered log objects)
        p=NNN/_end.json             bounded-topic end marker (seal())

    publish() routes each record to hash(key)%partitions when a key
    function is given (per-key order preserved — Kafka's contract),
    else round-robin. Appends are new immutable objects, never
    in-place mutation."""

    def __init__(self, broker_dir: str, partitions: int = 1):
        self.dir = broker_dir
        self.partitions = int(partitions)
        self._fs = fs_for(broker_dir)

    def _pdir(self, p: int) -> str:
        return os.path.join(self.dir, f"p={p:03d}")

    def _log_files(self, p: int) -> list[str]:
        return [
            f for f in self._fs.list_prefix(self._pdir(p))
            if os.path.basename(f).startswith("log-")
            and f.endswith(".jsonl")
        ]

    def end_offset(self, p: int) -> int:
        """Records published so far to partition p (next offset)."""
        hi = 0
        for f in self._log_files(p):
            name = os.path.basename(f)
            hi = max(hi, int(name[:-6].split("-")[2]) + 1)
        return hi

    def publish(self, records: list[dict], key=None) -> dict:
        """Append `records` across partitions; returns per-partition
        counts. Routing is stable in record order per partition."""
        routed: dict[int, list[dict]] = {}
        for i, rec in enumerate(records):
            p = (
                hash_key(str(key(rec))) % self.partitions
                if key is not None else i % self.partitions
            )
            routed.setdefault(p, []).append(rec)
        out = {}
        for p, recs in sorted(routed.items()):
            lo = self.end_offset(p)
            hi = lo + len(recs) - 1
            body = "\n".join(
                json.dumps(r, sort_keys=True) for r in recs
            ) + "\n"
            self._fs.put(
                os.path.join(self._pdir(p), f"log-{lo:012d}-{hi:012d}.jsonl"),
                body.encode(),
            )
            out[p] = len(recs)
        return out

    def seal(self) -> None:
        """Mark the topic bounded: consumers see eof at the end offset."""
        for p in range(self.partitions):
            self._fs.put(
                os.path.join(self._pdir(p), "_end.json"),
                json.dumps({"end": self.end_offset(p)}).encode(),
            )


def hash_key(s: str) -> int:
    """Stable cross-process key hash (builtin hash() is salted)."""
    import zlib

    return zlib.crc32(s.encode())


class FileBrokerConsumer:
    """One partition's consumer over a FileBroker — the second Consumer
    implementation proving the seam. Offsets are partition-local; poll()
    reads name-ordered log objects from the current position; eof flips
    when a sealed topic's end marker is reached. ack() is a no-op for
    the same reason as SocketConsumer's (spool listing = progress)."""

    def __init__(self, broker_dir: str, partition: int = 0):
        self._broker = FileBroker(broker_dir)
        self._p = int(partition)
        self._pos = 0
        self.eof = False

    def seek(self, offset: int) -> None:
        self._pos = int(offset)
        self.eof = False

    def ack(self, offset: int) -> None:
        pass

    def close(self) -> None:
        pass

    def _sealed_end(self) -> int | None:
        path = os.path.join(self._broker._pdir(self._p), "_end.json")
        fs = self._broker._fs
        if not fs.exists(path):
            return None
        return int(json.loads(fs.get(path))["end"])

    def poll(self, max_records: int) -> list[tuple[int, dict]]:
        out: list[tuple[int, dict]] = []
        off = 0
        for f in self._broker._log_files(self._p):
            name = os.path.basename(f)
            lo, hi = (int(x) for x in name[:-6].split("-")[1:3])
            if hi < self._pos:
                off = hi + 1
                continue
            for line in self._broker._fs.get(f).decode().splitlines():
                if not line.strip():
                    continue
                if lo >= self._pos and len(out) < max_records:
                    out.append((lo, json.loads(line)))
                lo += 1
            off = lo
            if len(out) >= max_records:
                break
        if out:
            self._pos = out[-1][0] + 1
        end = self._sealed_end()
        if end is not None and self._pos >= end and len(out) < max_records:
            self.eof = True
        return out
