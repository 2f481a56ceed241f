"""Multimodal columns: opaque `binary` payloads + typed metadata, with
feature extraction over `mapInPandas`.

The Spark-side plumbing is real and tested: binary column construction,
metadata structs, Arrow-batched `mapInPandas` with an explicit output
schema, and partition-parallel execution. Four codecs are REAL with
zero third-party deps — RIFF/WAVE 16-bit PCM (`encode_wav`/
`decode_wav`), 24-bit BI_RGB BMP (`encode_bmp`/`decode_bmp`, plus a
genuine nearest-neighbor `resize_image`), 8-bit truecolor PNG
(`encode_png`/`decode_png`: chunk framing + CRC32, zlib deflate, all
five scanline filters incl. sequential Paeth defiltering), and GIF
(`encode_gif`/`decode_gif`: hand-rolled variable-width LZW with the
early-change convention, palette handling, interlace, extension
skip) — the WAV/BMP paths are exercised end-to-end by catalog
queries whose DuckDB oracles recompute every sample/pixel from first
principles; the PNG/GIF paths by golden-byte tests (spec-built PNG
bytes; the canonical wild-encoder 1x1 GIF) plus round-trips through
every filter/width-growth/dictionary-overflow path. Formats that
require third-party codecs (jpeg/webp/mp3/ogg) stay
clearly-marked stubs (NotImplementedError); the generic
feature-extraction step uses a deterministic fake feature
(`(n_bytes * 7 + first_byte) % 997`) whose value a SQL oracle can
also compute — proving the Arrow round-trip bit-for-bit.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dynamodb_to_datalake_project_spark.catalog import query
from dynamodb_to_datalake_project_spark.lake import load_table

#: canonical multimodal record shape: opaque payload + typed metadata
MULTIMODAL_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("n_bytes", T.LongType()),
                    T.StructField("checksum", T.StringType()),
                    T.StructField("mime", T.StringType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("checksum", T.StringType()),
        T.StructField("fake_feature", T.LongType()),
    ]
)


def encode_bmp_array(px: "object", width: int, height: int) -> bytes:
    """REAL codec (stdlib `struct` + numpy packing): encode an
    (h, w, 3) uint8 RGB array as a 24-bit uncompressed BI_RGB Windows
    BMP. The container stores rows BOTTOM-UP, channels as BGR, and
    pads each row to a 4-byte boundary — all three transformations are
    performed here (as vectorized slices: `[::-1, :, ::-1]` + padded
    row buffer) and reversed in decode, so a round-trip exercises
    genuine container logic, not a memcpy. Per-pixel work is numpy,
    so the payload path scales with rows/sec, not Python-loop speed."""
    import struct

    import numpy as np

    arr = np.asarray(px, dtype=np.uint8).reshape(height, width, 3)
    row_size = (width * 3 + 3) // 4 * 4
    image_size = row_size * height
    off = 54
    header = struct.pack("<2sIHHI", b"BM", off + image_size, 0, 0, off)
    info = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, image_size, 2835, 2835, 0, 0
    )
    rows = np.zeros((height, row_size), dtype=np.uint8)
    rows[:, : width * 3] = arr[::-1, :, ::-1].reshape(height, width * 3)
    return header + info + rows.tobytes()


def encode_bmp(
    pixels: "list[tuple[int, int, int]]", width: int, height: int
) -> bytes:
    """Row-major top-down RGB pixel-tuple API over `encode_bmp_array`."""
    return encode_bmp_array(pixels, width, height)


def decode_bmp_array(payload: bytes) -> dict:
    """REAL codec (stdlib `struct` + numpy unpacking): parse a 24-bit
    BI_RGB BMP payload — file header, info header, bottom-up padded
    BGR rows — back to a row-major top-down (h, w, 3) uint8 RGB array
    plus typed dimensions. Handles both bottom-up (height > 0) and
    top-down (height < 0) row orders per the BITMAPINFOHEADER
    contract."""
    import struct

    import numpy as np

    magic, _file_size, _, _, off = struct.unpack_from("<2sIHHI", payload, 0)
    if magic != b"BM":
        raise ValueError("not a BMP payload")
    _hdr, width, height, _planes, bpp, comp, *_ = struct.unpack_from(
        "<IiiHHI", payload, 14
    )
    if bpp != 24 or comp != 0:
        raise NotImplementedError("only 24-bit BI_RGB decode implemented")
    row_size = (width * 3 + 3) // 4 * 4
    bottom_up = height > 0
    h = abs(height)
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=row_size * h, offset=off
    ).reshape(h, row_size)
    px = rows[:, : width * 3].reshape(h, width, 3)[:, :, ::-1]  # BGR -> RGB
    if bottom_up:
        px = px[::-1]
    return {"width": width, "height": h, "px": px}


def decode_bmp(payload: bytes) -> dict:
    """Pixel-tuple API over `decode_bmp_array` (the array form is the
    hot path inside Arrow batches; this one feeds tests and ad-hoc
    use)."""
    d = decode_bmp_array(payload)
    pixels = [tuple(int(c) for c in p) for row in d["px"] for p in row]
    return {"width": d["width"], "height": d["height"], "pixels": pixels}


PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    import struct
    import zlib

    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def encode_png(
    px: "object", width: int, height: int, filter_type: int = 0
) -> bytes:
    """REAL codec (stdlib `zlib` + `struct`): encode an (h, w, 3)
    uint8 RGB array as an 8-bit truecolor non-interlaced PNG.
    Implements the full chunk framing (length/type/data/CRC32) and all
    five scanline filters of the spec (0 None, 1 Sub, 2 Up,
    3 Average, 4 Paeth) — `filter_type` selects which one every row
    uses, so tests can exercise each defilter path in `decode_png`
    against genuinely filtered + deflate-compressed bytes. Filter
    arithmetic is vectorized per row (the sequential left-neighbor
    dependency only exists on DECODE)."""
    import struct
    import zlib

    import numpy as np

    arr = np.asarray(px, dtype=np.uint8).reshape(height, width, 3)
    rows = arr.reshape(height, width * 3).astype(np.int64)
    zeros3 = np.zeros(3, dtype=np.int64)
    raw = bytearray()
    prev = np.zeros(width * 3, dtype=np.int64)
    for y in range(height):
        row = rows[y]
        left = np.concatenate([zeros3, row[:-3]]) if width else row
        if filter_type == 0:
            filt = row
        elif filter_type == 1:  # Sub
            filt = (row - left) % 256
        elif filter_type == 2:  # Up
            filt = (row - prev) % 256
        elif filter_type == 3:  # Average
            filt = (row - (left + prev) // 2) % 256
        elif filter_type == 4:  # Paeth
            ul = np.concatenate([zeros3, prev[:-3]])
            p = left + prev - ul
            pa, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - ul)
            pred = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, ul)
            )
            filt = (row - pred) % 256
        else:
            raise ValueError(f"unknown PNG filter {filter_type}")
        raw.append(filter_type)
        raw += filt.astype(np.uint8).tobytes()
        prev = row
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    return (
        PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _png_chunk(b"IEND", b"")
    )


def decode_png_array(payload: bytes) -> dict:
    """REAL codec (stdlib `zlib` + `struct`): parse an 8-bit truecolor
    non-interlaced PNG — chunk walk with CRC verification, inflate of
    the concatenated IDAT stream, and full scanline DEFILTERING (None/
    Sub/Up/Average/Paeth; Sub/Average/Paeth reconstruct sequentially
    along the row exactly as the spec's recursive definition requires)
    — back to a row-major (h, w, 3) uint8 RGB array. Palette/alpha/
    16-bit/interlaced PNGs raise NotImplementedError (honest subset,
    like the 24-bit-only BMP leg)."""
    import struct
    import zlib

    import numpy as np

    if payload[:8] != PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, width, height, idat = 8, None, None, bytearray()
    while pos < len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack_from(">I", payload, pos + 8 + length)
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {ctype!r} CRC mismatch")
        if ctype == b"IHDR":
            width, height, bits, color, comp, filt, ilace = struct.unpack(
                ">IIBBBBB", data
            )
            if (bits, color, comp, filt, ilace) != (8, 2, 0, 0, 0):
                raise NotImplementedError(
                    "only 8-bit truecolor non-interlaced PNG decode implemented"
                )
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if width is None:
        raise ValueError("PNG payload has no IHDR chunk")
    raw = zlib.decompress(bytes(idat))
    stride = width * 3
    if len(raw) != height * (stride + 1):
        raise ValueError("PNG data length mismatch")
    out = np.zeros((height, stride), dtype=np.int64)
    prev = np.zeros(stride, dtype=np.int64)
    for y in range(height):
        base = y * (stride + 1)
        ft = raw[base]
        cur = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=base + 1
        ).astype(np.int64)
        if ft == 0:
            rec = cur
        elif ft == 2:  # Up — no intra-row dependency, vectorized
            rec = (cur + prev) % 256
        elif ft in (1, 3, 4):  # left-dependent: sequential per spec
            rec = np.zeros(stride, dtype=np.int64)
            for i in range(stride):
                a = rec[i - 3] if i >= 3 else 0  # reconstructed left
                b = prev[i]
                if ft == 1:
                    pred = a
                elif ft == 3:
                    pred = (a + b) // 2
                else:
                    c = prev[i - 3] if i >= 3 else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                rec[i] = (cur[i] + pred) % 256
        else:
            raise ValueError(f"unknown PNG filter {ft}")
        out[y] = rec
        prev = rec
    return {
        "width": width,
        "height": height,
        "px": out.astype(np.uint8).reshape(height, width, 3),
    }


def decode_png(payload: bytes) -> dict:
    """Pixel-tuple API over `decode_png_array` (mirrors `decode_bmp`)."""
    d = decode_png_array(payload)
    pixels = [tuple(int(c) for c in p) for row in d["px"] for p in row]
    return {"width": d["width"], "height": d["height"], "pixels": pixels}


def _lzw_decode(data: bytes, min_code_size: int) -> "list[int]":
    """GIF-variant LZW decode (spec appendix F): LSB-first variable-
    width codes starting at min_code_size+1 bits, CLEAR resets the
    table, width grows when the table reaches 2^width (capped at 12
    bits / 4096 entries)."""
    clear = 1 << min_code_size
    end = clear + 1
    base = [[i] for i in range(clear)] + [None, None]
    table = list(base)
    width = min_code_size + 1
    out: list[int] = []
    prev: "list[int] | None" = None
    bitpos, total = 0, len(data) * 8
    while True:
        if bitpos + width > total:
            break
        code = 0
        for i in range(width):
            code |= ((data[(bitpos + i) >> 3] >> ((bitpos + i) & 7)) & 1) << i
        bitpos += width
        if code == clear:
            table = list(base)
            width = min_code_size + 1
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            entry = table[code]
            if entry is None:
                raise ValueError("corrupt LZW stream (bad first code)")
        elif code < len(table) and table[code] is not None:
            entry = table[code]
        elif code == len(table):
            entry = prev + [prev[0]]  # the KwKwK case
        else:
            raise ValueError("corrupt LZW stream (code beyond table)")
        out.extend(entry)
        if prev is not None and len(table) < 4096:
            table.append(prev + [entry[0]])
        # early-change width growth: the DECODER's table lags the
        # encoder's by exactly one entry (the KwKwK lag), so it must
        # widen when len+1 — the encoder's next_code at this position
        # — reaches 2^width. This is the convention real-world
        # encoders/giflib use.
        if len(table) + 1 == (1 << width) and width < 12:
            width += 1
        prev = entry
    return out


def _lzw_encode(indices: "list[int]", min_code_size: int) -> bytes:
    """GIF-variant LZW encode, the exact inverse of `_lzw_decode`
    (same width-growth points, CLEAR emitted at start and on table
    overflow)."""
    clear = 1 << min_code_size
    end = clear + 1
    bits: list[tuple[int, int]] = []  # (code, width)

    def fresh():
        return {(i,): i for i in range(clear)}, end + 1, min_code_size + 1

    table, next_code, width = fresh()
    bits.append((clear, width))
    buf: tuple[int, ...] = ()
    for px in indices:
        cand = buf + (int(px),)
        if cand in table:
            buf = cand
            continue
        bits.append((table[buf], width))
        if next_code < 4096:
            table[cand] = next_code
            next_code += 1
            if next_code - 1 == (1 << width) - 1 and width < 12:
                width += 1
        else:
            bits.append((clear, width))
            table, next_code, width = fresh()
        buf = (int(px),)
    if buf:
        bits.append((table[buf], width))
    bits.append((end, width))
    # pack LSB-first
    acc = bytearray()
    cur, ncur = 0, 0
    for code, w in bits:
        cur |= code << ncur
        ncur += w
        while ncur >= 8:
            acc.append(cur & 0xFF)
            cur >>= 8
            ncur -= 8
    if ncur:
        acc.append(cur & 0xFF)
    return bytes(acc)


def encode_gif(px: "object", width: int, height: int) -> bytes:
    """REAL codec (pure spec logic, zero deps): encode an (h, w, 3)
    uint8 RGB array as a GIF89a — palette built from the image's
    distinct colors (≤256 required; GIF is an indexed format), indices
    compressed with the real variable-width LZW (`_lzw_encode`), data
    emitted in ≤255-byte sub-blocks."""
    import struct

    import numpy as np

    arr = np.asarray(px, dtype=np.uint8).reshape(height, width, 3)
    flat = arr.reshape(-1, 3)
    colors, inverse = np.unique(flat, axis=0, return_inverse=True)
    if len(colors) > 256:
        raise ValueError("GIF is indexed: more than 256 distinct colors")
    gct_bits = max(1, int(len(colors) - 1).bit_length())  # table size 2^n
    table = np.zeros((1 << gct_bits, 3), dtype=np.uint8)
    table[: len(colors)] = colors
    min_code = max(2, gct_bits)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", width, height, 0x80 | (gct_bits - 1), 0, 0)
    out += table.tobytes()
    out += struct.pack("<BHHHHB", 0x2C, 0, 0, width, height, 0)  # no LCT
    out.append(min_code)
    data = _lzw_encode([int(i) for i in inverse], min_code)
    for i in range(0, len(data), 255):
        blk = data[i : i + 255]
        out.append(len(blk))
        out += blk
    out += b"\x00\x3b"  # block terminator + trailer
    return bytes(out)


def decode_gif_array(payload: bytes) -> dict:
    """REAL codec (pure spec logic, zero deps): parse a GIF87a/89a —
    logical screen descriptor, global/local color tables, extension
    skip, first image descriptor, variable-width LZW decompression
    (`_lzw_decode`), interlace reordering — to a row-major (h, w, 3)
    uint8 RGB array. Animated GIFs decode their FIRST frame."""
    import struct

    import numpy as np

    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    _, _, packed, _, _ = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(payload, np.uint8, n * 3, pos).reshape(n, 3)
        pos += n * 3
    while pos < len(payload):
        block = payload[pos]
        if block == 0x21:  # extension: label + sub-blocks until 0
            pos += 2
            while payload[pos]:
                pos += payload[pos] + 1
            pos += 1
        elif block == 0x2C:  # image descriptor
            _, _, w, h, ipacked = struct.unpack_from("<HHHHB", payload, pos + 1)
            pos += 10
            ct = gct
            if ipacked & 0x80:
                n = 2 << (ipacked & 0x07)
                ct = np.frombuffer(payload, np.uint8, n * 3, pos).reshape(n, 3)
                pos += n * 3
            if ct is None:
                raise ValueError("GIF image has no color table")
            min_code = payload[pos]
            pos += 1
            data = bytearray()
            while payload[pos]:
                ln = payload[pos]
                data += payload[pos + 1 : pos + 1 + ln]
                pos += ln + 1
            idx = _lzw_decode(bytes(data), min_code)
            if len(idx) < w * h:
                raise ValueError("GIF pixel data truncated")
            grid = np.asarray(idx[: w * h], dtype=np.int64).reshape(h, w)
            if ipacked & 0x40:  # interlaced: reorder the 4 passes
                order = [y for y in range(0, h, 8)]
                order += [y for y in range(4, h, 8)]
                order += [y for y in range(2, h, 4)]
                order += [y for y in range(1, h, 2)]
                un = np.empty_like(grid)
                un[np.asarray(order)] = grid
                grid = un
            return {"width": w, "height": h, "px": ct[grid]}
        elif block == 0x3B:  # trailer
            break
        else:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
    raise ValueError("GIF payload has no image block")


def decode_gif(payload: bytes) -> dict:
    """Pixel-tuple API over `decode_gif_array` (mirrors `decode_bmp`)."""
    d = decode_gif_array(payload)
    pixels = [tuple(int(c) for c in p) for row in d["px"] for p in row]
    return {"width": d["width"], "height": d["height"], "pixels": pixels}


def decode_image(payload: bytes) -> "object":
    """Image decode: BMP, PNG and GIF payloads are decoded for real via
    the stdlib parsers (struct + zlib + hand-rolled GIF-LZW); formats
    needing third-party codecs (jpeg/webp) stay honestly stubbed."""
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    if payload[:8] == PNG_SIG:
        return decode_png(payload)
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        return decode_gif(payload)
    raise NotImplementedError(
        "only BMP, PNG and GIF decode available in this environment"
    )


def encode_wav(
    samples: "list[int]", sample_rate: int = 16_000, n_channels: int = 1
) -> bytes:
    """REAL codec (stdlib `wave` + `struct`): encode 16-bit signed PCM
    samples as a RIFF/WAVE payload. Used to synthesize genuine audio
    payloads for the decode path below."""
    import io
    import struct
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(n_channels)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(struct.pack(f"<{len(samples)}h", *samples))
    return buf.getvalue()


def decode_wav(payload: bytes) -> dict:
    """REAL codec (stdlib `wave` + `struct`): parse a RIFF/WAVE payload
    — header fields AND the PCM frames — into typed features. This is
    the honest-decode leg of `decode_audio`: no third-party libs, runs
    end-to-end in this container, and is exercised by the
    `multimodal_wav_stats` catalog query whose oracle recomputes every
    stat from first principles."""
    import io
    import struct
    import wave

    with wave.open(io.BytesIO(payload), "rb") as w:
        n_channels = w.getnchannels()
        sample_rate = w.getframerate()
        sampwidth = w.getsampwidth()
        n_frames = w.getnframes()
        frames = w.readframes(n_frames)
    if sampwidth != 2:
        raise NotImplementedError("only 16-bit PCM decode implemented")
    samples = struct.unpack(f"<{n_frames * n_channels}h", frames)
    return {
        "n_channels": n_channels,
        "sample_rate": sample_rate,
        "n_samples": n_frames * n_channels,
        "sum_abs": sum(abs(s) for s in samples),
        "peak": max((abs(s) for s in samples), default=0),
    }


def decode_audio(payload: bytes) -> "object":
    """Audio decode: RIFF/WAVE payloads are decoded for real via the
    stdlib parser (`decode_wav`); other containers (mp3/ogg/flac) need
    codecs not present in this container and stay honestly stubbed."""
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return decode_wav(payload)
    raise NotImplementedError("only WAV decode available in this environment")


def to_binary_docs(docs: DataFrame, mime: str = "text/plain") -> DataFrame:
    """Wrap a text corpus as multimodal records (payload = UTF-8 bytes,
    metadata derived JVM-side)."""
    payload = F.encode(F.col("text"), "UTF-8")
    return docs.select(
        "doc_id",
        payload.alias("payload"),
        F.struct(
            F.length(payload).cast("long").alias("n_bytes"),
            F.md5(payload).alias("checksum"),
            F.lit(mime).alias("mime"),
        ).alias("meta"),
    )


def extract_features(binary_docs: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    `mapInPandas` processes whole Arrow record batches per partition —
    the shape a real decode (image resize, audio frame-sample) plugs
    into. The fake feature is deterministic so tests/oracles can verify
    the full binary round-trip.
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": payloads.map(len),
                    "checksum": payloads.map(lambda b: hashlib.md5(b).hexdigest()),
                    "fake_feature": payloads.map(
                        lambda b: (len(b) * 7 + (b[0] if len(b) else 0)) % 997
                    ),
                }
            )

    return binary_docs.mapInPandas(op, FEATURE_SCHEMA)


@query(
    "multimodal_features",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           md5(text) AS checksum,
           CAST((octet_length(encode(text)) * 7 + ascii(substr(text, 1, 1))) % 997
                AS BIGINT) AS fake_feature
    FROM documents
    """,
)
def q_multimodal_features(spark, sf_dir):
    """documents → binary payload + metadata → mapInPandas feature
    extraction; the SQL oracle recomputes every feature from the text,
    so a single flipped byte anywhere in the Arrow round-trip fails."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return extract_features(to_binary_docs(docs))


WAV_STATS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_channels", T.LongType()),
        T.StructField("sample_rate", T.LongType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("n_payload_bytes", T.LongType()),
        T.StructField("sum_abs", T.LongType()),
        T.StructField("peak", T.LongType()),
    ]
)


def wav_roundtrip_stats(docs: DataFrame, max_samples: int = 256) -> DataFrame:
    """Synthesize a REAL 16-bit PCM WAV payload per document
    (deterministic samples derived from doc_id), then decode it with
    the stdlib WAV parser and emit the decoded features — the full
    encode → binary payload → decode → features path with an actual
    codec, in Arrow batches.

    Samples are sample[i] = ((doc_id*131 + i*7919) % 65536) - 32768
    over n = min(n_chars, max_samples) — a pure function of
    (doc_id, n_chars), so an independent SQL oracle can recompute the
    decoded stats without running the codec: agreement proves the
    header fields, frame count, payload size, AND every PCM sample
    survived the WAV container bit-for-bit."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        out: dict[str, list] = {k.name: [] for k in WAV_STATS_SCHEMA.fields}
        for pdf in batches:
            for doc_id, n_chars in zip(pdf["doc_id"], pdf["n_chars"]):
                # NULL n_chars arrives as None/NaN — treat as an empty
                # payload (0 samples), mirroring the oracle's coalesce
                n = 0 if pd.isna(n_chars) else min(int(n_chars), max_samples)
                samples = [
                    ((int(doc_id) * 131 + i * 7919) % 65536) - 32768
                    for i in range(n)
                ]
                payload = encode_wav(samples)
                feat = decode_wav(payload)
                out["doc_id"].append(int(doc_id))
                out["n_channels"].append(feat["n_channels"])
                out["sample_rate"].append(feat["sample_rate"])
                out["n_samples"].append(feat["n_samples"])
                out["n_payload_bytes"].append(len(payload))
                out["sum_abs"].append(feat["sum_abs"])
                out["peak"].append(feat["peak"])
        yield pd.DataFrame(out)

    return docs.select("doc_id", "n_chars").mapInPandas(op, WAV_STATS_SCHEMA)


@query(
    "multimodal_wav_stats",
    oracle="""
    WITH t AS (
      SELECT doc_id, least(coalesce(n_chars, 0), 256) AS n FROM documents
    ), s AS (
      SELECT doc_id, n,
             list_transform(range(0, n),
               i -> abs(((doc_id * 131 + i * 7919) % 65536) - 32768)) AS a
      FROM t
    )
    SELECT doc_id,
           CAST(1 AS BIGINT) AS n_channels,
           CAST(16000 AS BIGINT) AS sample_rate,
           CAST(n AS BIGINT) AS n_samples,
           CAST(44 + 2 * n AS BIGINT) AS n_payload_bytes,
           CAST(coalesce(list_sum(a), 0) AS BIGINT) AS sum_abs,
           CAST(coalesce(list_max(a), 0) AS BIGINT) AS peak
    FROM s
    """,
)
def q_multimodal_wav_stats(spark, sf_dir):
    """WAV encode → decode round trip over the documents table with
    the stdlib PCM codec; the oracle recomputes header fields, the
    44-byte-header payload size, and exact sample statistics from
    first principles — a flipped byte anywhere in the container or
    the PCM frames fails the hash."""
    docs = load_table(spark, sf_dir, "documents")
    return wav_roundtrip_stats(docs)


IMAGE_STATS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("n_pixels", T.LongType()),
        T.StructField("n_payload_bytes", T.LongType()),
        T.StructField("sum_rgb", T.LongType()),
        T.StructField("peak", T.LongType()),
        T.StructField("n_resized_bytes", T.LongType()),
        T.StructField("resized_sum", T.LongType()),
    ]
)


def bmp_roundtrip_stats(docs: DataFrame, max_chars: int = 126) -> DataFrame:
    """Synthesize a REAL 24-bit BMP payload per document (deterministic
    7×H pixel grid derived from doc_id), decode it with the stdlib BMP
    parser, nearest-neighbor resize it to 3×2, decode THAT, and emit
    typed features of both — the full encode → binary → decode →
    transform → re-encode → decode chain with an actual codec, in
    Arrow batches.

    Width is 7 ON PURPOSE: 7×3 = 21 bytes/row pads to 24, so the BMP
    row-padding logic is exercised on every row. Pixel (p, channel c)
    value = (doc_id*131 + p*7919 + c*104729) % 256 over H = n//7 + 1
    rows with n = min(n_chars, max_chars) — a pure function of
    (doc_id, n_chars), so an independent SQL oracle recomputes the
    dimensions, padded payload size, exact channel statistics, AND the
    resized image's pixels without running the codec: agreement proves
    headers, bottom-up row order, BGR packing, padding, and the
    nearest-neighbor index math all survived bit-for-bit."""

    import numpy as np

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        out: dict[str, list] = {f.name: [] for f in IMAGE_STATS_SCHEMA.fields}
        for pdf in batches:
            for doc_id, n_chars in zip(pdf["doc_id"], pdf["n_chars"]):
                did = int(doc_id)
                # clamp BOTH ends: NULL and negative n_chars (corrupt
                # metadata) degrade to the minimal 7x1 image, mirroring
                # the oracle's greatest(0, least(...)) — never a
                # negative height crashing the Arrow batch
                n = 0 if pd.isna(n_chars) else max(0, min(int(n_chars), max_chars))
                h = n // 7 + 1
                # deterministic pixel grid as one vectorized expression
                p = np.arange(7 * h, dtype=np.int64)[:, None]
                c = np.arange(3, dtype=np.int64)[None, :]
                px = ((did * 131 + p * 7919 + c * 104729) % 256).reshape(h, 7, 3)
                payload = encode_bmp_array(px, 7, h)
                img = decode_bmp_array(payload)
                flat = img["px"].astype(np.int64)
                resized = resize_image(payload, 3, 2)
                rflat = decode_bmp_array(resized)["px"].astype(np.int64)
                out["doc_id"].append(did)
                out["width"].append(img["width"])
                out["height"].append(img["height"])
                out["n_pixels"].append(img["width"] * img["height"])
                out["n_payload_bytes"].append(len(payload))
                out["sum_rgb"].append(int(flat.sum()))
                out["peak"].append(int(flat.max()))
                out["n_resized_bytes"].append(len(resized))
                out["resized_sum"].append(int(rflat.sum()))
        yield pd.DataFrame(out)

    return docs.select("doc_id", "n_chars").mapInPandas(op, IMAGE_STATS_SCHEMA)


@query(
    "multimodal_image_stats",
    oracle="""
    WITH t AS (
      SELECT doc_id, greatest(0, least(coalesce(n_chars, 0), 126)) // 7 + 1 AS h
      FROM documents
    ), px AS (
      SELECT doc_id, h,
             list_transform(range(0, 7 * h * 3),
               i -> (doc_id * 131 + (i // 3) * 7919 + (i % 3) * 104729) % 256) AS v,
             list_transform(range(0, 18),
               i -> (doc_id * 131
                     + ((i // 9) * h // 2 * 7 + ((i // 3) % 3) * 7 // 3) * 7919
                     + (i % 3) * 104729) % 256) AS rv
      FROM t
    )
    SELECT doc_id,
           CAST(7 AS BIGINT) AS width,
           CAST(h AS BIGINT) AS height,
           CAST(7 * h AS BIGINT) AS n_pixels,
           CAST(54 + 24 * h AS BIGINT) AS n_payload_bytes,
           CAST(list_sum(v) AS BIGINT) AS sum_rgb,
           CAST(list_max(v) AS BIGINT) AS peak,
           CAST(78 AS BIGINT) AS n_resized_bytes,
           CAST(list_sum(rv) AS BIGINT) AS resized_sum
    FROM px
    """,
)
def q_multimodal_image_stats(spark, sf_dir):
    """BMP encode → decode → nearest-neighbor resize → decode over the
    documents table with the stdlib codec; the oracle recomputes the
    dimensions, the padded payload size (7px rows: 21 data bytes → 24),
    exact per-channel pixel statistics, and the resized 3×2 image's
    pixels via the same src = dst*src_dim//dst_dim index math — a
    flipped byte anywhere in the container, row order, BGR packing,
    padding, or resampling fails the hash."""
    docs = load_table(spark, sf_dir, "documents")
    return bmp_roundtrip_stats(docs)


def resize_image(payload: bytes, width: int, height: int) -> bytes:
    """REAL resize for BMP and PNG payloads: decode → nearest-neighbor
    sample (src = dst * src_dim // dst_dim, as a vectorized
    fancy-index) → re-encode IN THE SAME FORMAT. Binary in → binary
    out, the contract a `mapInPandas` pipeline stage plugs into; for
    formats without a stdlib codec the decode raises the honest
    stub."""
    import numpy as np

    if payload[:2] == b"BM":
        d, enc = decode_bmp_array(payload), encode_bmp_array
    elif payload[:8] == PNG_SIG:
        d, enc = decode_png_array(payload), encode_png
    elif payload[:6] in (b"GIF87a", b"GIF89a"):
        d, enc = decode_gif_array(payload), encode_gif
    else:
        decode_image(payload)  # raises the format-specific stub
        raise AssertionError("unreachable")
    sw, sh, px = d["width"], d["height"], d["px"]
    ys = np.arange(height) * sh // height
    xs = np.arange(width) * sw // width
    return enc(px[ys][:, xs], width, height)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.LongType()),
        T.StructField("n_frame_bytes", T.LongType()),
        T.StructField("frame_md5", T.StringType()),
    ]
)


def frame_sample(
    binary_docs: DataFrame, frame_chars: int = 64, every: int = 2
) -> DataFrame:
    """1:N frame sampling over binary payloads — the video-frame batch
    shape (one input record → several output rows), as opposed to
    `extract_features`' 1:1 shape. Deterministic fake framing: the
    payload decodes to text and "frames" are fixed 64-char windows,
    every 2nd one sampled — so a SQL oracle can recompute every frame
    checksum and byte length, proving the Arrow 1:N round-trip exactly.
    A real video pipeline swaps the window slicing for codec frame
    extraction (`decode_image`/`resize_image` stubs); partitioning,
    output schema, and batch mechanics stay identical."""
    import hashlib as _hashlib

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "doc_id": [], "frame_idx": [], "n_frame_bytes": [], "frame_md5": []
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                s = bytes(payload).decode("utf-8")
                nframes = (len(s) + frame_chars - 1) // frame_chars
                for i in range(0, nframes, every):
                    b = s[i * frame_chars : (i + 1) * frame_chars].encode("utf-8")
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(i)
                    out["n_frame_bytes"].append(len(b))
                    out["frame_md5"].append(_hashlib.md5(b).hexdigest())
            yield pd.DataFrame(out)

    return binary_docs.mapInPandas(op, FRAME_SCHEMA)


@query(
    "multimodal_frame_sample",
    oracle="""
    WITH t AS (
      SELECT doc_id, text, length(text) AS n FROM documents WHERE length(text) >= 1
    )
    SELECT doc_id,
           CAST(u.i AS BIGINT) AS frame_idx,
           CAST(octet_length(encode(substring(text, u.i * 64 + 1, 64))) AS BIGINT)
             AS n_frame_bytes,
           md5(substring(text, u.i * 64 + 1, 64)) AS frame_md5
    FROM t, LATERAL (
      SELECT unnest(range(0, CAST(ceil(n / 64.0) AS BIGINT), 2)) AS i
    ) u
    """,
)
def q_multimodal_frame_sample(spark, sf_dir):
    """documents → binary payload → 1:N frame sampling; the oracle
    recomputes every sampled frame's md5 and byte count from the text,
    so any drift in the Arrow 1:N expansion (frame boundaries, count,
    bytes) fails the hash."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return frame_sample(to_binary_docs(docs))
