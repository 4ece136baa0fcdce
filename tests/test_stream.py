"""Socket streaming CDC source (sources/stream.py): envelope records over
TCP with resume handshake → spooled windows → segments → replay equals
the file-based round-trip; mid-stream broker drops and at-least-once
redelivery neither lose nor duplicate; re-polling is idempotent."""

import glob
import json
import os

import pyarrow.compute as pc
import pytest

from datax_ray.fixtures.generator import gen_changes, write_segments
from datax_ray.pipelines.replay import ReplayConfig, replay
from datax_ray.sinks.feedout import export_change_feed_envelopes
from datax_ray.sinks.lake import final_table
from datax_ray.sources.stream import (
    EnvelopeStreamServer,
    stream_consume,
    stream_ingest,
)


def _core(t):
    import pyarrow as pa

    cols = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    return (
        t.select(cols)
        .set_column(1, "turn_idx", pc.cast(t["turn_idx"], pa.int64()))
        .sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
        .to_pandas()
        .reset_index(drop=True)
    )


@pytest.fixture()
def envelope_records(tmp_path, ray_session):
    """A source lake exported to envelopes, flattened to stream order."""
    changes = gen_changes(3000, 40, seed=83, p_delete=0.15,
                          out_of_order_frac=0.1)
    chg = str(tmp_path / "chg")
    src = str(tmp_path / "src_lake")
    write_segments(changes, chg, seg_rows=1000)
    replay(ReplayConfig(changes_dir=chg, lake_dir=src, num_partitions=8,
                        segments_per_epoch=2))
    env = str(tmp_path / "env")
    export_change_feed_envelopes(src, env, fmt="jsonl")

    def window_key(p):
        name = os.path.basename(p)
        return (name.split("-e")[-1], name)

    records = []
    for p in sorted(glob.glob(os.path.join(env, "env-*.jsonl")),
                    key=window_key):
        with open(p) as f:
            records.extend(json.loads(line) for line in f if line.strip())
    return records, src


def _ingest(records, tmp_path, name, **server_kw):
    spool = str(tmp_path / f"{name}_spool")
    chg = str(tmp_path / f"{name}_chg")
    lake = str(tmp_path / f"{name}_lake")
    cfg = ReplayConfig(changes_dir=chg, lake_dir=lake, num_partitions=8)
    with EnvelopeStreamServer(records, **server_kw) as srv:
        out = stream_ingest(srv.addr, spool, chg, replay_cfg=cfg,
                            batch_records=500)
    return out, lake


def test_stream_ingest_equals_source(envelope_records, tmp_path):
    records, src = envelope_records
    out, lake = _ingest(records, tmp_path, "clean")
    assert out["records"] == len(records)
    assert _core(final_table(lake)).equals(_core(final_table(src)))


def test_broker_drops_and_redelivery(envelope_records, tmp_path):
    """The server drops the connection every 700 records AND re-sends 50
    already-delivered records on each reconnect (at-least-once broker):
    the consumer must neither lose nor duplicate — final state identical."""
    records, src = envelope_records
    out, lake = _ingest(records, tmp_path, "drops",
                        drop_every=700, redeliver=50)
    assert out["records"] == len(records)
    assert _core(final_table(lake)).equals(_core(final_table(src)))


def test_repoll_idempotent_and_incremental(envelope_records, tmp_path):
    records, src = envelope_records
    spool = str(tmp_path / "p_spool")
    chg = str(tmp_path / "p_chg")
    lake = str(tmp_path / "p_lake")
    cfg = ReplayConfig(changes_dir=chg, lake_dir=lake, num_partitions=8)
    half = len(records) // 2
    with EnvelopeStreamServer(records[:half]) as srv:
        out1 = stream_ingest(srv.addr, spool, chg, replay_cfg=cfg)
    assert out1["records"] == half
    # re-poll with the full stream: only the delta transfers and spools
    with EnvelopeStreamServer(records) as srv:
        out2 = stream_ingest(srv.addr, spool, chg, replay_cfg=cfg)
    assert out2["records"] == len(records) - half
    assert out2["next_seq"] == len(records)
    assert _core(final_table(lake)).equals(_core(final_table(src)))
    # and an up-to-date poll moves nothing
    with EnvelopeStreamServer(records) as srv:
        out3 = stream_ingest(srv.addr, spool, chg, replay_cfg=cfg)
    assert out3["records"] == 0 and out3["windows"] == 0
    assert _core(final_table(lake)).equals(_core(final_table(src)))


def test_filebroker_roundtrip_through_consumer_seam(envelope_records, tmp_path):
    """The SECOND Consumer implementation (file-backed topic) through the
    SAME spool loop: publish → consume → convert → replay equals the
    source lake, and an incremental publish delivers only the delta —
    proving stream_consume is transport-agnostic (VERDICT r4 #8)."""
    from datax_ray.sources.stream import FileBroker, FileBrokerConsumer

    records, src = envelope_records
    broker = str(tmp_path / "broker")
    spool = str(tmp_path / "fb_spool")
    chg = str(tmp_path / "fb_chg")
    lake = str(tmp_path / "fb_lake")
    cfg = ReplayConfig(changes_dir=chg, lake_dir=lake, num_partitions=8)

    b = FileBroker(broker, partitions=1)
    half = len(records) // 2
    b.publish(records[:half])
    out1 = stream_ingest(FileBrokerConsumer(broker), spool, chg,
                         replay_cfg=cfg, batch_records=500)
    assert out1["records"] == half

    b.publish(records[half:])
    b.seal()
    out2 = stream_ingest(FileBrokerConsumer(broker), spool, chg,
                         replay_cfg=cfg, batch_records=500)
    assert out2["records"] == len(records) - half
    assert out2["next_seq"] == len(records)
    assert _core(final_table(lake)).equals(_core(final_table(src)))

    # sealed + drained: a re-poll moves nothing
    out3 = stream_ingest(FileBrokerConsumer(broker), spool, chg,
                         replay_cfg=cfg)
    assert out3["records"] == 0 and out3["windows"] == 0


def test_filebroker_partitioned_multisource(envelope_records, tmp_path):
    """A 2-partition topic keyed by conv_id (Kafka's per-key order
    contract), one consumer per partition, each partition replayed as its
    own SOURCE via multi-source replication — the merged lake equals the
    single-stream source lake."""
    from datax_ray.sources.stream import FileBroker, FileBrokerConsumer

    records, src = envelope_records
    broker = str(tmp_path / "broker2")
    b = FileBroker(broker, partitions=2)
    def key(rec):
        # delete envelopes carry after=None — route by whichever image
        # holds the conv_id
        for side in ("after", "before"):
            img = rec.get(side)
            if isinstance(img, dict) and img.get("conv_id"):
                return img["conv_id"]
        return rec.get("conv_id", "")

    b.publish(records, key=key)
    b.seal()

    from datax_ray.sources.envelope import envelopes_to_segments

    sources = {}
    total = 0
    for p in range(2):
        spool = str(tmp_path / f"mp_spool{p}")
        chg = str(tmp_path / f"mp_chg{p}")
        got = __import__("datax_ray.sources.stream", fromlist=["x"]
                         ).stream_consume(
            FileBrokerConsumer(broker, partition=p), spool,
            batch_records=500,
        )
        total += got["records"]
        envelopes_to_segments(spool, chg)
        sources[f"p{p}"] = chg
    assert total == len(records)

    lake = str(tmp_path / "mp_lake")
    replay(ReplayConfig(sources=sources, lake_dir=lake, num_partitions=8))
    assert _core(final_table(lake)).equals(_core(final_table(src)))


def test_stream_tail_pipelined(envelope_records, tmp_path):
    """stream_tail (pipelined: background spooler + foreground
    convert/replay) lands the same final state as the synchronous loop,
    over BOTH transports — with drops+redelivery on the socket path."""
    from datax_ray.sources.stream import (
        FileBroker,
        FileBrokerConsumer,
        SocketConsumer,
        stream_tail,
    )

    records, src = envelope_records

    spool = str(tmp_path / "pt_spool")
    chg = str(tmp_path / "pt_chg")
    lake = str(tmp_path / "pt_lake")
    cfg = ReplayConfig(changes_dir=chg, lake_dir=lake, num_partitions=8,
                       segments_per_epoch=10**9)
    with EnvelopeStreamServer(records, drop_every=700, redeliver=50) as srv:
        out = stream_tail(SocketConsumer(srv.addr), spool, chg, cfg,
                          batch_records=400, epoch_records=800)
    assert out["records"] == len(records)
    assert out["epochs"] >= 1
    assert _core(final_table(lake)).equals(_core(final_table(src)))

    broker = str(tmp_path / "pt_broker")
    b = FileBroker(broker, partitions=1)
    b.publish(records)
    b.seal()
    spool2 = str(tmp_path / "pt_spool2")
    chg2 = str(tmp_path / "pt_chg2")
    lake2 = str(tmp_path / "pt_lake2")
    cfg2 = ReplayConfig(changes_dir=chg2, lake_dir=lake2, num_partitions=8,
                        segments_per_epoch=10**9)
    out2 = stream_tail(FileBrokerConsumer(broker), spool2, chg2, cfg2,
                       batch_records=500, epoch_records=1000)
    assert out2["records"] == len(records)
    assert _core(final_table(lake2)).equals(_core(final_table(src)))


def test_consume_cli_verb(envelope_records, tmp_path):
    """`datax_ray consume` drives the full transport→lake chain from the
    command line (broker transport, pipelined): final state equals the
    source lake; a second invocation on the sealed topic is a no-op."""
    import subprocess
    import sys

    from datax_ray.sources.stream import FileBroker

    records, src = envelope_records
    broker = str(tmp_path / "cli_broker")
    b = FileBroker(broker, partitions=1)
    b.publish(records)
    b.seal()

    args = [sys.executable, "-m", "datax_ray", "consume",
            "--broker", broker,
            "--spool", str(tmp_path / "cli_spool"),
            "--changes", str(tmp_path / "cli_chg"),
            "--lake", str(tmp_path / "cli_lake"),
            "--pipelined", "--epoch-records", "1000",
            "--num-cpus", "4"]
    env = {**os.environ, "RAY_ADDRESS": "local"}
    out = subprocess.run(args, capture_output=True, text=True, env=env,
                         timeout=240)
    assert out.returncode == 0, out.stderr[-2000:]
    got = json.loads(out.stdout.strip().splitlines()[-1])
    assert got["records"] == len(records) and got["epochs"] >= 1

    lake = str(tmp_path / "cli_lake")
    assert _core(final_table(lake)).equals(_core(final_table(src)))

    out2 = subprocess.run(args, capture_output=True, text=True, env=env,
                          timeout=240)
    got2 = json.loads(out2.stdout.strip().splitlines()[-1])
    assert got2["records"] == 0


def test_broker_and_spool_on_objstore(envelope_records, tmp_path):
    """The file broker's topic AND the consumer's spool both live on the
    object store (all I/O through state/fs.py): publish → consume →
    convert → replay equals the source lake — the 'Kafka topic on shared
    storage' claim, proven on the strict obj:// emulator."""
    from datax_ray.sources.stream import FileBroker, FileBrokerConsumer

    records, src = envelope_records
    broker = "obj://" + str(tmp_path / "obj_broker")
    spool = "obj://" + str(tmp_path / "obj_spool")
    chg = str(tmp_path / "obj_chg")
    lake = str(tmp_path / "obj_lake")
    cfg = ReplayConfig(changes_dir=chg, lake_dir=lake, num_partitions=8)

    b = FileBroker(broker, partitions=1)
    b.publish(records)
    b.seal()
    out = stream_ingest(FileBrokerConsumer(broker), spool, chg,
                        replay_cfg=cfg, batch_records=500)
    assert out["records"] == len(records)
    assert _core(final_table(lake)).equals(_core(final_table(src)))
