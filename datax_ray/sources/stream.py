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


def stream_consume(
    addr: tuple[str, int],
    spool_dir: str,
    *,
    batch_records: int = 2000,
    max_reconnects: int = 5,
    idle_timeout_s: float = 10.0,
) -> dict:
    """Consume the envelope stream at `addr` into spooled window files
    until the server signals eof (or closes with no more to say within
    the reconnect budget). Returns {"records", "windows", "next_seq"}.
    Safe to re-run any time: resumes after the last durable window."""
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

    eof = False
    reconnects = 0
    while not eof and reconnects <= max_reconnects:
        try:
            with socket.create_connection(addr, timeout=idle_timeout_s) as s:
                s.sendall((json.dumps({"resume_from": next_seq + len(buf)})
                           + "\n").encode())
                f = s.makefile("r", encoding="utf-8")
                for line in f:
                    line = line.strip()
                    if not line:
                        continue
                    rec = json.loads(line)
                    if rec.get("eof"):
                        eof = True
                        break
                    seq = int(rec.pop("_seq"))
                    if seq < next_seq + len(buf):
                        continue  # at-least-once redelivery: drop
                    if seq > next_seq + len(buf):
                        raise RuntimeError(
                            f"stream gap: expected seq {next_seq + len(buf)}, "
                            f"got {seq} — server must deliver contiguously "
                            "from resume_from"
                        )
                    buf.append(json.dumps(rec, sort_keys=True))
                    records += 1
                    if len(buf) >= batch_records:
                        flush()
        except (ConnectionError, socket.timeout, OSError):
            reconnects += 1
            time.sleep(min(0.1 * reconnects, 1.0))
            continue
        if not eof:
            reconnects += 1  # server closed without eof: bounded retry
    flush()
    return {"records": records, "windows": windows, "next_seq": next_seq}


def stream_ingest(
    addr: tuple[str, int],
    spool_dir: str,
    changes_dir: str,
    replay_cfg=None,
    **consume_kw,
) -> dict:
    """One poll of the full chain: socket → spooled windows → change-log
    segments → (optionally) replay into the lake. Each stage is
    independently idempotent, so this composes into a polling loop the
    same way `tail` does."""
    from datax_ray.sources.envelope import envelopes_to_segments

    got = stream_consume(addr, spool_dir, **consume_kw)
    conv = envelopes_to_segments(spool_dir, changes_dir)
    out = {**got, "converted_files": conv.get("converted_files"),
           "converted_rows": conv.get("rows")}
    if replay_cfg is not None:
        from datax_ray.pipelines.replay import replay

        reports = replay(replay_cfg)
        out["epochs"] = len(reports) if isinstance(reports, list) else 0
    return out


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
