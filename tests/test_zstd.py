"""Pure-Python Zstandard decoder (`llm.zstd`) — RFC 8878 conformance,
cross-checked bit-for-bit against an independent implementation
(pyarrow's bundled libzstd), plus the parquet/ORC codec integrations.

Reference behavior generalized: the reference lake stores compressed
files and delegates the codec to the engine
(vendor/aws_dynamodb_export_to_s3.py:80-100 reads gzip exports); zstd
is the modern-lakehouse equivalent of that codec seam."""

from __future__ import annotations

import io
import random

import pytest

from dynamodb_to_datalake_project_spark.llm.zstd import (
    xxh64,
    zstd_decompress,
)


def _codec(level=None):
    import pyarrow as pa

    if level is None:
        return pa.Codec("zstd")
    return pa.Codec("zstd", compression_level=level)


def test_xxh64_public_vectors():
    """The public XXH64 test vectors (xxHash reference README)."""
    assert xxh64(b"") == 0xEF46DB3751D8E999
    assert xxh64(b"", seed=1) != xxh64(b"")
    # Prime-seeded sanity: decode-independent self-consistency
    assert xxh64(b"a") != xxh64(b"b")
    # 32+ byte path (lane loop) vs byte-at-a-time tail
    data = bytes(range(256))
    assert xxh64(data) == xxh64(data[:128] + data[128:])
    # known vector from the xxHash repository
    assert xxh64(b"xxhash") == 0x32DD38952C4BC720


@pytest.mark.parametrize("level", [1, 3, 9, 19, 22])
def test_roundtrip_vs_libzstd_levels(level):
    """Every compression level exercises different table shapes
    (predefined vs FSE-described, 1- vs 4-stream literals, treeless
    reuse): the decoder must agree with libzstd on all of them."""
    rnd = random.Random(level)
    words = ["alpha", "bravo", "charlie", "delta", "echo", "foxtrot"]
    cases = [
        b"",
        b"x",
        b"ab" * 5,
        ("the quick brown fox " * 400).encode(),
        " ".join(rnd.choice(words) for _ in range(30_000)).encode(),
        rnd.randbytes(4096),  # incompressible -> raw blocks
        bytes(rnd.choice(b"aabbbcccc\n ") for _ in range(50_000)),
    ]
    c = _codec(level)
    for raw in cases:
        comp = bytes(c.compress(raw))
        assert zstd_decompress(comp) == raw


def test_multiblock_frame():
    """> 128 KiB regenerates across multiple blocks within one frame
    (treeless literals + repeat FSE tables + repeat offsets carry
    state block-to-block)."""
    rnd = random.Random(7)
    words = [f"tok{i}" for i in range(500)]
    raw = " ".join(rnd.choice(words) for _ in range(300_000)).encode()
    assert len(raw) > 1 << 20
    comp = bytes(_codec(3).compress(raw))
    assert zstd_decompress(comp) == raw


def test_multi_frame_and_skippable():
    """Concatenated frames decode in order; skippable frames are
    skipped (RFC 8878 §3.1.2)."""
    a, b = b"first frame " * 100, b"second frame " * 100
    f1 = bytes(_codec().compress(a))
    f2 = bytes(_codec().compress(b))
    skip = (
        (0x184D2A53).to_bytes(4, "little")
        + (7).to_bytes(4, "little")
        + b"padding"
    )
    assert zstd_decompress(f1 + skip + f2) == a + b


def test_handbuilt_raw_rle_and_checksum():
    """Hand-assembled frames: raw block, RLE block, and an XXH64
    content checksum that must verify (and fail closed when bit-
    flipped)."""
    magic = (0xFD2FB528).to_bytes(4, "little")
    # single_segment, checksum, FCS 1 byte (flag 0 + single segment)
    content = b"hello zstd!"
    fhd = bytes([(0 << 6) | (1 << 5) | (1 << 2)])
    fcs = bytes([len(content)])
    raw_hdr = ((len(content) << 3) | (0 << 1) | 1).to_bytes(3, "little")
    csum = (xxh64(content) & 0xFFFFFFFF).to_bytes(4, "little")
    frame = magic + fhd + fcs + raw_hdr + content + csum
    assert zstd_decompress(frame) == content
    bad = bytearray(frame)
    bad[10] ^= 0x01  # flip a content bit -> checksum must catch it
    with pytest.raises(ValueError, match="checksum|frame header"):
        zstd_decompress(bytes(bad))

    # RLE block: 'z' * 300, no checksum, no FCS, not single-segment
    fhd2 = bytes([0])
    window = bytes([0x58])  # exponent only — plenty for 300 bytes
    rle_hdr = ((300 << 3) | (1 << 1) | 1).to_bytes(3, "little")
    frame2 = magic + fhd2 + window + rle_hdr + b"z"
    assert zstd_decompress(frame2) == b"z" * 300


def test_corrupt_inputs_raise():
    good = bytes(_codec().compress(b"payload " * 50))
    with pytest.raises(ValueError, match="magic"):
        zstd_decompress(b"\x00\x11\x22\x33" + good[4:])
    with pytest.raises(ValueError):
        zstd_decompress(good[: len(good) // 2])
    with pytest.raises(ValueError, match="empty"):
        zstd_decompress(b"")
    # reserved block type (3) in a hand-built frame
    magic = (0xFD2FB528).to_bytes(4, "little")
    frame = magic + bytes([0x20]) + bytes([0x01]) + ((5 << 3) | 7).to_bytes(
        3, "little"
    )
    with pytest.raises(ValueError, match="reserved|frame"):
        zstd_decompress(frame)
    # frame content size that lies
    magic_frame = bytearray(bytes(_codec().compress(b"abcdef")))
    # FCS byte for single-segment small frames sits at offset 5
    if magic_frame[4] & 0x20:
        magic_frame[5] ^= 0x7F
        with pytest.raises(ValueError):
            zstd_decompress(bytes(magic_frame))


def test_dictionary_frame_not_implemented():
    """A frame demanding an external dictionary is an honest
    boundary: decoding without the dictionary bytes is impossible."""
    magic = (0xFD2FB528).to_bytes(4, "little")
    # fhd: single_segment=1, dictid flag=1 (1 byte), fcs flag 0
    fhd = bytes([(1 << 5) | 1])
    frame = magic + fhd + bytes([42]) + bytes([3]) + b""  # dict id 42
    with pytest.raises(NotImplementedError, match="dictionary"):
        zstd_decompress(frame)


def test_output_cap_enforced():
    raw = b"a" * 100_000
    comp = bytes(_codec().compress(raw))
    with pytest.raises(ValueError, match="cap"):
        zstd_decompress(comp, max_output=1000)


def test_parquet_zstd_page_read():
    """The lake-grade parquet reader decodes ZSTD pages (dictionary +
    data) through `llm.zstd` and recovers exact values."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from dynamodb_to_datalake_project_spark.llm.parquetmeta import (
        read_parquet_column_full,
    )

    words = ("zstd page walk fixture words repeat repeat " * 60).split()
    t = pa.table(
        {
            "idx": pa.array(range(len(words)), pa.int64()),
            "word": pa.array(words, pa.string()),
        }
    )
    buf = io.BytesIO()
    pq.write_table(
        t, buf, compression="ZSTD", use_dictionary=True, row_group_size=71
    )
    payload = buf.getvalue()
    assert read_parquet_column_full(payload, "idx") == list(
        range(len(words))
    )
    assert [w.decode() for w in read_parquet_column_full(payload, "word")] \
        == words


@pytest.mark.parametrize(
    "shape",
    ["empty", "tiny", "words", "random", "runs", "alphabet", "multiblock"],
)
def test_encoder_roundtrip_both_decoders(shape):
    """`zstd_compress` emits portable RFC 8878 frames: our decoder
    AND libzstd (an independent implementation) must both recover
    the input exactly — greedy-LZ compressed blocks, raw fallbacks,
    checksum, multi-block frames."""
    from dynamodb_to_datalake_project_spark.llm.zstd import zstd_compress

    rnd = random.Random(hash(shape) & 0xFFFF)
    words = ["alpha", "bravo", "charlie", "delta", "echo"]
    raw = {
        "empty": b"",
        "tiny": b"ab",
        "words": " ".join(
            rnd.choice(words) for _ in range(40_000)
        ).encode(),
        "random": rnd.randbytes(20_000),
        "runs": b"a" * 300_000,
        "alphabet": bytes(rnd.choice(b"abcd") for _ in range(200_000)),
        "multiblock": b"pattern " * 60_000,  # > 2 blocks, cross-block
    }[shape]
    enc = zstd_compress(raw)
    assert zstd_decompress(enc) == raw
    assert bytes(_codec().decompress(enc, len(raw))) == raw
    if shape in ("words", "runs", "multiblock"):
        assert len(enc) < len(raw) // 2  # actually compresses


def test_encoder_checksum_flag():
    from dynamodb_to_datalake_project_spark.llm.zstd import zstd_compress

    raw = b"checksum me " * 100
    with_ck = zstd_compress(raw, checksum=True)
    without = zstd_compress(raw, checksum=False)
    assert len(with_ck) == len(without) + 4
    assert zstd_decompress(with_ck) == raw
    assert zstd_decompress(without) == raw
    bad = bytearray(with_ck)
    bad[-1] ^= 0xFF
    with pytest.raises(ValueError, match="checksum"):
        zstd_decompress(bytes(bad))


def test_zstd_json_sink_and_scan(spark, tmp_path):
    """S10's zstd sibling: write .json.zst parts with the engine's
    own encoder, read them back through the Arrow-stage scan, and
    prove Spark's own JSON reader agrees on the gzip twin of the
    same frame."""
    from dynamodb_to_datalake_project_spark.lake import (
        read_json_lines_zstd,
        write_json_lines_zstd,
    )

    df = spark.range(500).selectExpr(
        "id", "concat('value-', id) AS v", "id % 7 AS grp"
    )
    out = str(tmp_path / "zst")
    n = write_json_lines_zstd(df.repartition(4), out)
    assert n == 500
    import os

    parts = [f for f in os.listdir(out) if f.endswith(".json.zst")]
    assert len(parts) >= 1
    back = read_json_lines_zstd(
        spark, out, "id bigint, v string, grp bigint"
    )
    assert back.count() == 500
    assert sorted(r.v for r in back.collect()) == sorted(
        f"value-{i}" for i in range(500)
    )
    # the parts are PORTABLE zstd: libzstd opens every one too
    for part in parts:
        blob = open(os.path.join(out, part), "rb").read()
        raw = zstd_decompress(blob)
        text = bytes(_codec().decompress(blob, len(raw)))
        assert text == raw and text.startswith(b"{")


def test_orc_zstd_tail_parse():
    """ORC tails compressed with ZSTD (chunked framing, RFC 8878
    frames per chunk) parse identically to NONE/ZLIB tails and agree
    with pyarrow's own metadata."""
    import pyarrow as pa
    from pyarrow import orc

    from dynamodb_to_datalake_project_spark.llm.orcmeta import (
        parse_orc_tail,
    )

    n = 3000  # > 1024 rows -> multiple stripes at default batch size
    t = pa.table(
        {
            "idx": pa.array(range(n), pa.int64()),
            "word": pa.array([f"w{i}" for i in range(n)], pa.string()),
        }
    )
    buf = io.BytesIO()
    orc.write_table(t, buf, compression="zstd")
    d = parse_orc_tail(buf.getvalue())
    f = orc.ORCFile(io.BytesIO(buf.getvalue()))
    assert d["compression"] == "ZSTD"
    assert d["num_rows"] == n == f.nrows
    assert d["n_stripes"] == f.nstripes
    assert d["field_names"] == ["idx", "word"]


def test_encoder_long_form_sequence_count():
    """Regression (round-10 advice): RFC 8878 §3.1.1.3.2.1 — when a
    block holds >= 0x7F00 sequences the 3-byte long form must store
    Number_of_Sequences - 0x7F00 in the trailing LE16, not the raw
    count. The construction below deterministically packs ~32.6k
    4-byte matches into a single 128 KiB block (64 four-byte tokens,
    each block a fresh affine permutation so greedy matches never
    extend past one token); both our decoder and libzstd must round-
    trip the frame."""
    from dynamodb_to_datalake_project_spark.llm.zstd import (
        _find_sequences,
        zstd_compress,
    )

    m = 64
    pool = [
        bytes([k, (7 * k + 1) % 256, (13 * k + 5) % 256, 255 - k])
        for k in range(m)
    ]
    units = list(range(1, m, 2))  # multipliers coprime to 64
    toks = list(range(m))  # block 0: identity permutation
    t = 0
    while len(toks) < 32768:
        a = units[t % len(units)]
        c = (3 * t + 1) % m
        toks.extend((a * j + c) % m for j in range(m))
        t += 1
    data = b"".join(pool[k] for k in toks)[:131072]

    seqs, _ = _find_sequences(data, 0, len(data))
    assert len(seqs) >= 0x7F00  # the long-form header is actually hit

    comp = zstd_compress(data)
    assert zstd_decompress(comp) == data
    assert bytes(_codec().decompress(comp, len(data))) == data
