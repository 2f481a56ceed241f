"""Multimodal columns: opaque `binary` payloads + typed metadata, with
feature extraction over `mapInPandas`.

The Spark-side plumbing is real and tested: binary column construction,
metadata structs, Arrow-batched `mapInPandas` with an explicit output
schema, and partition-parallel execution. The actual image/audio codecs
are NOT in this container, so `decode_image`/`decode_audio` are
clearly-marked stubs (NotImplementedError) and the pipeline's
feature-extraction step uses a deterministic fake feature
(`(n_bytes * 7 + first_byte) % 997`) whose value a SQL oracle can also
compute — proving the Arrow round-trip bit-for-bit.
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


def decode_image(payload: bytes) -> "object":
    """STUB: image decode requires PIL/opencv, not present in this
    container. The Spark plumbing around it (binary column →
    mapInPandas → feature columns) is real; swap this body for the
    codec in a full environment."""
    raise NotImplementedError("image codecs not available in this environment")


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


def resize_image(payload: bytes, width: int, height: int) -> bytes:
    """STUB: image resize requires PIL/opencv, not present in this
    container. Signature + call-site plumbing (binary in → binary out
    inside `mapInPandas`) are the real contract; swap the body for the
    codec in a full environment."""
    raise NotImplementedError("image codecs not available in this environment")


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
