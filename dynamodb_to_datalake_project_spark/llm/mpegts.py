"""MPEG transport stream (ISO/IEC 13818-1) packet walk — demux-only,
completing the container family in `llm.multimodal`/`llm.ebml` (AVI,
MP4, fMP4, WebM, Ogg, MP3): the broadcast/HLS-legacy upload shape.

What is real here: 188-byte sync-locked packets, PAT → PMT program
resolution with genuine MPEG-2 section CRC-32s (poly 0x04C11DB7, init
0xFFFFFFFF, unreflected) RECOMPUTED on read, per-PID 4-bit continuity
counters validated with wraparound, PES start-code parsing, and
adaptation-field stuffing so every packet is exactly 188 bytes — the
mechanics every TS demuxer implements. ES payloads are opaque
(H.264/AAC decode honestly needs third-party codecs).

Reference parity: none — north-star multimodal-ingest tooling
(SURVEY.md §2.8).
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from dynamodb_to_datalake_project_spark.catalog import query
from dynamodb_to_datalake_project_spark.lake import load_table

TS_PACKET = 188
_PAYLOAD = TS_PACKET - 4


def _crc_table():
    tbl = []
    for i in range(256):
        r = i << 24
        for _ in range(8):
            r = ((r << 1) ^ 0x04C11DB7 if r & 0x80000000 else r << 1) & 0xFFFFFFFF
        tbl.append(r)
    return tuple(tbl)


_CRC = _crc_table()


def mpeg_crc32(data: bytes) -> int:
    """MPEG-2 PSI CRC-32: same polynomial as Ogg's, but init all-ones
    (and still unreflected, no final xor)."""
    crc = 0xFFFFFFFF
    for b in data:
        crc = ((crc << 8) & 0xFFFFFFFF) ^ _CRC[((crc >> 24) & 0xFF) ^ b]
    return crc


def _ts_packet(pid: int, pusi: bool, cc: int, payload: bytes) -> bytes:
    """One 188-byte packet; short payloads are padded with a REAL
    adaptation field (length + flags + 0xFF stuffing), the spec's
    mechanism — not trailing garbage."""
    room = _PAYLOAD
    af = b""
    if len(payload) < room:
        pad = room - len(payload)
        # adaptation field: length byte + (flags byte + stuffing)
        af = bytes([pad - 1]) + (bytes([0x00]) + b"\xff" * (pad - 2) if pad >= 2 else b"")
        afc = 0x30  # adaptation + payload
    else:
        afc = 0x10  # payload only
    hdr = struct.pack(
        ">BHB",
        0x47,
        (0x4000 if pusi else 0) | pid,
        afc | (cc & 0xF),
    )
    pkt = hdr + af + payload
    assert len(pkt) == TS_PACKET, len(pkt)
    return pkt


def _psi_section(table_id: int, body: bytes) -> bytes:
    """PSI section with a real CRC: header + body + CRC32 over both.

    `section_length` counts every byte AFTER the length field itself:
    the body (which already carries the 5 post-length header bytes —
    tsid/program, version, section_number, last_section_number) plus
    the 4 CRC bytes (ISO 13818-1 §2.4.4.3/.8)."""
    sec_len = len(body) + 4
    head = struct.pack(">BH", table_id, 0xB000 | sec_len)
    # transport_stream_id/program_number + version/current_next +
    # section_number + last_section_number
    sec = head + body
    return sec + struct.pack(">I", mpeg_crc32(sec))


def encode_mpegts(streams: "list[dict]", tsid: int = 1) -> bytes:
    """REAL transport-stream mux: PAT (program 1 → PMT PID 0x1000),
    PMT declaring each stream's type + elementary PID, then each
    stream's PES packets (00 00 01 start code, stream_id, 9-byte
    header) split across 188-byte packets with PUSI on the first and
    adaptation-field stuffing on the last. `streams`: dicts with pid,
    stream_type, stream_id, and pes = list of payload bytes. Per-PID
    continuity counters are genuine (4-bit, wrapping)."""
    pat_body = struct.pack(">HBBB", tsid, 0xC1, 0, 0) + struct.pack(
        ">HH", 1, 0xE000 | 0x1000
    )
    pat = _psi_section(0x00, pat_body)
    pmt_streams = b"".join(
        struct.pack(">BHH", s["stream_type"], 0xE000 | s["pid"], 0xF000)
        for s in streams
    )
    pmt_body = (
        struct.pack(">HBBB", 1, 0xC1, 0, 0)
        + struct.pack(">HH", 0xE000 | streams[0]["pid"], 0xF000)
        + pmt_streams
    )
    pmt = _psi_section(0x02, pmt_body)

    cc: dict[int, int] = {}
    out = bytearray()

    def emit(pid: int, pusi: bool, payload: bytes) -> None:
        c = cc.get(pid, 0)
        out.extend(_ts_packet(pid, pusi, c, payload))
        cc[pid] = (c + 1) & 0xF

    # PSI sections are preceded by a pointer_field byte
    emit(0x0000, True, b"\x00" + pat)
    emit(0x1000, True, b"\x00" + pmt)
    for s in streams:
        for payload in s["pes"]:
            pes = (
                b"\x00\x00\x01"
                + bytes([s["stream_id"]])
                + struct.pack(">H", 3 + len(payload))
                + b"\x80\x00\x00"  # flags + header_data_length 0
                + payload
            )
            first = True
            for i in range(0, len(pes), _PAYLOAD):
                emit(s["pid"], first, pes[i : i + _PAYLOAD])
                first = False
    return bytes(out)


def parse_mpegts(payload: bytes) -> dict:
    """REAL TS demux: sync-locked 188-byte walk, per-PID continuity
    validation (4-bit wraparound), PAT → PMT program resolution with
    both section CRCs RECOMPUTED and verified, adaptation-field
    skipping, and PES reassembly accounting per elementary stream.
    Raises on lost sync, continuity gaps, CRC mismatches, undeclared
    PIDs, or malformed PES start codes — corrupt-upload quarantine
    with zero codec work.

    Returns one dict per PMT-declared stream: pid, stream_type,
    TS-packet and PES counts, ES byte total (PES payloads net of the
    9-byte headers), and the first payload byte of every PES."""
    if len(payload) % TS_PACKET:
        raise ValueError("ts: stream length is not a multiple of 188")
    pat_pmt: dict[int, int] = {}  # program -> PMT pid
    streams: dict[int, dict] = {}
    cc_state: dict[int, int] = {}
    pending: dict[int, dict] = {}  # pid -> open PES accounting

    def section(buf: bytes, expect_tid: int) -> bytes:
        ptr = buf[0]
        sec = buf[1 + ptr :]
        tid = sec[0]
        if tid != expect_tid:
            raise ValueError(f"ts: expected table 0x{expect_tid:02X}, got 0x{tid:02X}")
        (sl,) = struct.unpack_from(">H", sec, 1)
        sl &= 0x0FFF
        if 3 + sl > len(sec):
            raise ValueError(
                f"ts: section_length {sl} on table 0x{tid:02X} overruns the "
                "packet payload"
            )
        body = sec[: 3 + sl]
        if mpeg_crc32(body[:-4]) != struct.unpack(">I", body[-4:])[0]:
            raise ValueError(f"ts: PSI CRC mismatch on table 0x{tid:02X}")
        return body[3:-4]

    for off in range(0, len(payload), TS_PACKET):
        pkt = payload[off : off + TS_PACKET]
        if pkt[0] != 0x47:
            raise ValueError(f"ts: lost sync at offset {off}")
        pid = struct.unpack_from(">H", pkt, 1)[0] & 0x1FFF
        pusi = bool(pkt[1] & 0x40)
        afc = (pkt[3] >> 4) & 0x3
        cc = pkt[3] & 0xF
        if pid in cc_state and (cc_state[pid] + 1) & 0xF != cc:
            raise ValueError(f"ts: continuity gap on PID 0x{pid:X}")
        cc_state[pid] = cc
        body = pkt[4:]
        if afc & 0x2:  # adaptation field present
            body = body[1 + body[0] :]
        if not afc & 0x1:
            continue  # no payload
        if pid == 0x0000:
            b = section(body, 0x00)
            for i in range(5, len(b), 4):
                prog, ppid = struct.unpack_from(">HH", b, i)
                if prog != 0:
                    pat_pmt[prog] = ppid & 0x1FFF
        elif pid in pat_pmt.values():
            b = section(body, 0x02)
            # after the 5 generic PSI bytes: PCR PID (2) then
            # program_info_length (2); stream entries follow the
            # program descriptors
            i = 9 + (struct.unpack_from(">H", b, 7)[0] & 0x0FFF)
            while i + 5 <= len(b):
                stype, epid, eil = struct.unpack_from(">BHH", b, i)
                streams[epid & 0x1FFF] = {
                    "pid": epid & 0x1FFF,
                    "stream_type": stype,
                    "ts_packets": 0,
                    "n_pes": 0,
                    "es_bytes": 0,
                    "first_byte_sum": 0,
                }
                i += 5 + (eil & 0x0FFF)
        else:
            if pid not in streams:
                raise ValueError(f"ts: packet on undeclared PID 0x{pid:X}")
            st = streams[pid]
            st["ts_packets"] += 1
            if pusi:
                if len(body) < 9:
                    raise ValueError(
                        f"ts: PUSI packet on PID 0x{pid:X} too short for a "
                        "PES header"
                    )
                if body[:3] != b"\x00\x00\x01":
                    raise ValueError(
                        f"ts: PUSI packet on PID 0x{pid:X} lacks a PES start code"
                    )
                hdl = body[8]
                data = body[9 + hdl :]
                st["n_pes"] += 1
                if data:
                    st["first_byte_sum"] += data[0]
                st["es_bytes"] += len(data)
            else:
                st["es_bytes"] += len(body)
    return {
        "programs": pat_pmt,
        "streams": sorted(streams.values(), key=lambda s: s["pid"]),
    }


TS_STATS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("pid", T.LongType()),
        T.StructField("stream_type", T.LongType()),
        T.StructField("n_pes", T.LongType()),
        T.StructField("ts_packets", T.LongType()),
        T.StructField("es_bytes", T.LongType()),
        T.StructField("first_byte_sum", T.LongType()),
    ]
)


def mpegts_stats(docs: DataFrame) -> DataFrame:
    """Synthesize a REAL two-program-stream TS per document (H.264 +
    AAC declarations, PES counts/sizes from integer formulas; ES
    payloads opaque), demux it with `parse_mpegts` — which re-verifies
    every PSI CRC and continuity counter — one row per elementary
    stream. Arrow `mapInPandas`, map-only."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        out: dict[str, list] = {f.name: [] for f in TS_STATS_SCHEMA.fields}
        for pdf in batches:
            for doc_id in pdf["doc_id"]:
                did = int(doc_id)

                def pes_list(npes, base, mul):
                    return [
                        bytes([(did * mul + j * 31) % 256])
                        + bytes([(did + j) % 256])
                        * (base + (did * 7 + j * 13) % 300)
                        for j in range(npes)
                    ]

                nv, na = 2 + did % 3, 3 + did % 4
                payload = encode_mpegts(
                    [
                        {
                            "pid": 0x100,
                            "stream_type": 0x1B,  # H.264
                            "stream_id": 0xE0,
                            "pes": pes_list(nv, 199, 3),
                        },
                        {
                            "pid": 0x101,
                            "stream_type": 0x0F,  # AAC
                            "stream_id": 0xC0,
                            "pes": pes_list(na, 49, 11),
                        },
                    ]
                )
                d = parse_mpegts(payload)
                for s in d["streams"]:
                    out["doc_id"].append(did)
                    out["pid"].append(s["pid"])
                    out["stream_type"].append(s["stream_type"])
                    out["n_pes"].append(s["n_pes"])
                    out["ts_packets"].append(s["ts_packets"])
                    out["es_bytes"].append(s["es_bytes"])
                    out["first_byte_sum"].append(s["first_byte_sum"])
        yield pd.DataFrame(out)

    spark = docs.sparkSession
    par = int(spark.conf.get("spark.sql.shuffle.partitions"))
    return docs.select("doc_id").repartition(par).mapInPandas(op, TS_STATS_SCHEMA)


@query(
    "multimodal_mpegts_stats",
    oracle="""
    WITH t AS (
      SELECT doc_id, 2 + doc_id % 3 AS nv, 3 + doc_id % 4 AS na
      FROM documents
    ), vp AS (
      SELECT doc_id, u.j, 200 + (doc_id * 7 + u.j * 13) % 300 AS sz,
             (doc_id * 3 + u.j * 31) % 256 AS fb
      FROM t, LATERAL (SELECT unnest(range(0, nv)) AS j) u
    ), v AS (
      SELECT doc_id, CAST(256 AS BIGINT) AS pid,
             CAST(27 AS BIGINT) AS stream_type,
             CAST(COUNT(*) AS BIGINT) AS n_pes,
             CAST(SUM((9 + sz + 183) // 184) AS BIGINT) AS ts_packets,
             CAST(SUM(sz) AS BIGINT) AS es_bytes,
             CAST(SUM(fb) AS BIGINT) AS first_byte_sum
      FROM vp GROUP BY doc_id
    ), ap AS (
      SELECT doc_id, u.j, 50 + (doc_id * 7 + u.j * 13) % 300 AS sz,
             (doc_id * 11 + u.j * 31) % 256 AS fb
      FROM t, LATERAL (SELECT unnest(range(0, na)) AS j) u
    ), a AS (
      SELECT doc_id, CAST(257 AS BIGINT) AS pid,
             CAST(15 AS BIGINT) AS stream_type,
             CAST(COUNT(*) AS BIGINT) AS n_pes,
             CAST(SUM((9 + sz + 183) // 184) AS BIGINT) AS ts_packets,
             CAST(SUM(sz) AS BIGINT) AS es_bytes,
             CAST(SUM(fb) AS BIGINT) AS first_byte_sum
      FROM ap GROUP BY doc_id
    )
    SELECT * FROM v UNION ALL SELECT * FROM a
    """,
)
def q_multimodal_mpegts_stats(spark, sf_dir):
    """REAL MPEG-TS demux over the documents table: mux a valid
    two-stream transport stream per document (PAT→PMT with real PSI
    CRCs, PES packetization across 188-byte cells with adaptation
    stuffing; H.264/AAC payloads opaque), walk it back with CRC and
    continuity verification, one row per elementary stream. The
    DuckDB oracle recomputes PES counts, the ceil-divide TS packet
    math, ES byte totals, and per-PES first-byte checksums from the
    same formulas with no parser."""
    docs = load_table(spark, sf_dir, "documents")
    return mpegts_stats(docs)
