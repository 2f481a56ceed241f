"""Property-based hardening for the zero-dep codec family: random
inputs through zstd (both directions, libzstd as the independent
check), portable roaring, the RFC 4180 parser, Morton interleaving,
and encoding detection. Complements the example-based suites — these
run hypothesis' shrinking search for structural edge cases."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from dynamodb_to_datalake_project_spark.llm.zstd import (
    zstd_compress,
    zstd_decompress,
)


@settings(max_examples=60, deadline=None)
@given(st.binary(min_size=0, max_size=4000))
def test_zstd_roundtrip_random_bytes(raw):
    enc = zstd_compress(raw)
    assert zstd_decompress(enc) == raw
    import pyarrow as pa

    assert bytes(pa.Codec("zstd").decompress(enc, len(raw))) == raw


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.sampled_from([b"ab", b"cat ", b"the quick ", b"\x00\xff", b"z"]),
        min_size=0,
        max_size=2000,
    )
)
def test_zstd_roundtrip_repetitive(parts):
    raw = b"".join(parts)
    enc = zstd_compress(raw)
    assert zstd_decompress(enc) == raw
    import pyarrow as pa

    assert bytes(pa.Codec("zstd").decompress(enc, len(raw))) == raw


@settings(max_examples=40, deadline=None)
@given(st.binary(min_size=1, max_size=2000))
def test_zstd_decoder_rejects_or_roundtrips_mutations(raw):
    """Mutated frames must either raise ValueError/
    NotImplementedError or decode to SOMETHING — never crash with an
    unexpected exception type. (Checksummed frames catch nearly all
    corruption; headers caught structurally.)"""
    enc = bytearray(zstd_compress(raw))
    enc[len(enc) // 2] ^= 0x41
    try:
        zstd_decompress(bytes(enc))
    except (ValueError, NotImplementedError):
        pass


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.integers(min_value=0, max_value=(1 << 32) - 1),
        min_size=0,
        max_size=3000,
    )
)
def test_roaring_roundtrip_random(vals):
    from dynamodb_to_datalake_project_spark.llm.roaring import (
        roaring_deserialize,
        roaring_serialize,
    )

    assert roaring_deserialize(roaring_serialize(vals)) == sorted(set(vals))


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=(1 << 31)),
            st.integers(min_value=1, max_value=6000),
        ),
        min_size=0,
        max_size=8,
    )
)
def test_roaring_roundtrip_runs(runs):
    """Run-heavy sets force run/bitmap container transitions."""
    from dynamodb_to_datalake_project_spark.llm.roaring import (
        roaring_deserialize,
        roaring_serialize,
    )

    vals = set()
    for start, length in runs:
        vals.update(range(start, min(start + length, 1 << 32)))
    assert roaring_deserialize(roaring_serialize(vals)) == sorted(vals)


_CSV_CELL = st.text(
    alphabet=st.characters(
        codec="ascii", exclude_characters="\x00"
    ),
    max_size=12,
)


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.lists(_CSV_CELL, min_size=1, max_size=5),
        min_size=1,
        max_size=10,
    ),
    st.sampled_from([",", ";", "\t", "|"]),
)
def test_csv_write_parse_roundtrip(rows, delim):
    """Any cell grid, quoted defensively, survives the RFC 4180
    parser under every dialect."""
    from dynamodb_to_datalake_project_spark.llm.ingest import (
        parse_csv_rfc4180,
    )

    def q(cell: str) -> str:
        return '"' + cell.replace('"', '""') + '"'

    text = "\r\n".join(delim.join(q(c) for c in r) for r in rows) + "\r\n"
    assert parse_csv_rfc4180(text, delim=delim) == rows


@settings(max_examples=60, deadline=None)
@given(st.text(max_size=300))
def test_encoding_detection_total_on_utf8(text):
    """Any unicode text encoded as UTF-8 (no BOM) is detected and
    decoded back exactly (NUL-free guard mirrors real text)."""
    from dynamodb_to_datalake_project_spark.llm.ingest import (
        detect_encoding,
    )

    raw = text.replace("\x00", "").encode("utf-8")
    d = detect_encoding(raw)
    if b"\x00" not in raw and not any(
        raw.startswith(b) for b in (b"\xef\xbb\xbf", b"\xff\xfe", b"\xfe\xff")
    ):
        assert d["encoding"] == "utf-8"
        assert d["text"] == text.replace("\x00", "")


@settings(max_examples=100, deadline=None)
@given(
    st.integers(min_value=0, max_value=65535),
    st.integers(min_value=0, max_value=65535),
)
def test_morton_bijective(x, y):
    """Interleave then de-interleave recovers both coordinates —
    checked against the bit-by-bit definition (no Spark needed)."""
    z = 0
    for i in range(16):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    rx = ry = 0
    for i in range(16):
        rx |= ((z >> (2 * i)) & 1) << i
        ry |= ((z >> (2 * i + 1)) & 1) << i
    assert (rx, ry) == (x, y)


@settings(max_examples=80, deadline=None)
@given(
    st.lists(
        st.integers(min_value=-(1 << 62), max_value=(1 << 62) - 1),
        min_size=0,
        max_size=700,
    )
)
def test_delta_binary_packed_roundtrip_random(vals):
    """Round-10 write side: DELTA_BINARY_PACKED encode must be read
    back exactly by the round-9 decoder for any int64 sequence
    (multi-block, negative min-deltas, padded trailing miniblocks)."""
    from dynamodb_to_datalake_project_spark.llm.parquetmeta import (
        _delta_binary_packed,
    )
    from dynamodb_to_datalake_project_spark.llm.parquetwrite import (
        delta_binary_packed_encode,
    )

    enc = delta_binary_packed_encode(vals)
    got, end = _delta_binary_packed(enc, 0, len(vals))
    assert got == vals
    assert end == len(enc)  # self-delimiting: exact extent


@settings(max_examples=60, deadline=None)
@given(
    st.lists(st.binary(min_size=0, max_size=40), min_size=0, max_size=300)
)
def test_delta_byte_array_roundtrip_random(vals):
    """Front-coded strings: any byte-string sequence (shared or no
    prefixes, empties, repeats) must round-trip through the write
    encoder and the round-9 decoder."""
    from dynamodb_to_datalake_project_spark.llm.parquetmeta import (
        _delta_byte_array,
    )
    from dynamodb_to_datalake_project_spark.llm.parquetwrite import (
        delta_byte_array_encode,
    )

    enc = delta_byte_array_encode(vals)
    got, end = _delta_byte_array(enc, 0, len(vals))
    assert got == vals
    assert end == len(enc)


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.lists(
            st.integers(min_value=0, max_value=(1 << 32) - 1),
            min_size=0,
            max_size=400,
        ),
        min_size=0,
        max_size=4,
    )
)
def test_roaring64_bucket_roundtrip_random(buckets):
    """roaring64 with cursor-delimited embedded bitmaps (round-10
    fix): random per-bucket value sets round-trip, including the
    container-choice variety inside each bucket."""
    from dynamodb_to_datalake_project_spark.llm.roaring import (
        roaring64_deserialize,
        roaring64_serialize,
    )

    vals = sorted(
        {(hi << 32) | v for hi, vs in enumerate(buckets) for v in vs}
    )
    assert roaring64_deserialize(roaring64_serialize(vals)) == vals


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.floats(
            min_value=-1e6, max_value=1e6,
            allow_nan=False, allow_infinity=False,
        ),
        min_size=0,
        max_size=4000,
    ),
    st.sampled_from([8, 32, 128]),
)
def test_kll_invariants_random(data, k):
    """Round-10 KLL compactor invariants under random inputs and
    capacities: exact weight conservation, bounded state, and every
    quantile read within the accumulated deterministic rank bound."""
    import bisect
    import math

    from dynamodb_to_datalake_project_spark.llm.sketch import (
        kll_build_values,
    )

    items, bound = kll_build_values(data, k=k)
    n = len(data)
    assert sum(w for _, w in items) == n
    if n:
        levels = max(w for _, w in items).bit_length()
        assert len(items) <= max(k, 4) * (levels + 1)
    exact = sorted(data)
    srt = sorted(items)
    for q in (0.1, 0.5, 0.9):
        if not n:
            break
        rank = math.ceil(q * n)
        cum = 0
        est = srt[-1][0]
        for v, w in srt:
            cum += w
            if cum >= rank:
                est = v
                break
        r = bisect.bisect_right(exact, est)
        lo = bisect.bisect_left(exact, est)
        # est's rank interval [lo, r] must be within bound of target
        assert lo - bound - 1 <= rank <= r + bound + 1
