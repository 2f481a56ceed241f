"""ORC VALUE reading (`llm.orcmeta.read_orc_column`) — RLEv2 spec
vectors, a pyarrow cross-check across every sub-encoding the writer
can emit, PRESENT-stream nulls, all three chunked codecs
(NONE/ZLIB/ZSTD), and corrupt rejects.

Reference write pattern audited: glue_jobs/initial_load.py:163-179
(columnar lake files the engine must open by hand)."""

from __future__ import annotations

import io
import random

import pytest

from dynamodb_to_datalake_project_spark.llm.orcmeta import (
    read_orc_column,
    rlev2_decode,
)


def test_rlev2_spec_vectors():
    """The worked examples from the public ORC v1 specification."""
    # short repeat: 10000 repeated 5 times
    assert rlev2_decode(bytes([0x0A, 0x27, 0x10]), signed=False) == [10000] * 5
    # direct: [23713, 43806, 57005, 48879] at 16 bits
    assert rlev2_decode(
        bytes([0x5E, 0x03, 0x5C, 0xA1, 0xAB, 0x1E, 0xDE, 0xAD, 0xBE, 0xEF]),
        signed=False,
    ) == [23713, 43806, 57005, 48879]
    # delta: the primes 2..29 (base 2, delta base +1, 4-bit deltas)
    assert rlev2_decode(
        bytes([0xC6, 0x09, 0x02, 0x02, 0x22, 0x42, 0x42, 0x46]),
        signed=False,
    ) == [2, 3, 5, 7, 11, 13, 17, 19, 23, 29]


def test_rlev2_truncation_raises():
    with pytest.raises(ValueError):
        rlev2_decode(bytes([0x0A, 0x27]), signed=False)  # short-repeat cut
    with pytest.raises(ValueError):
        rlev2_decode(bytes([0x5E, 0x03, 0x5C]), signed=False)  # direct cut


def _fixture_table(n=5000, seed=1):
    import pyarrow as pa

    rnd = random.Random(seed)
    outliers = [rnd.randrange(0, 100) for _ in range(n)]
    for i in range(0, n, 997):
        outliers[i] = 10**12 + i  # forces patched-base runs
    negout = [rnd.randrange(-100, 100) for _ in range(n)]
    for i in range(0, n, 777):
        negout[i] = -(10**11) - i  # negative patched-base base
    cols = {
        "idx": list(range(n)),  # delta runs
        "rep": [7] * n,  # short repeat
        "small": [rnd.randrange(0, 50) for _ in range(n)],  # direct
        "out": outliers,
        "negout": negout,
        "big": [rnd.randrange(-(2**62), 2**62) for _ in range(n)],
        "nl": [i if i % 7 else None for i in range(n)],  # PRESENT
    }
    words = [f"w{rnd.randrange(0, 40)}" for _ in range(n)]
    nullstr = [f"s{i}" if i % 3 else None for i in range(n)]
    t = pa.table(
        {
            **{k: pa.array(v, pa.int64()) for k, v in cols.items()},
            "word": pa.array(words, pa.string()),
            "ns": pa.array(nullstr, pa.string()),
        }
    )
    return t, cols, words, nullstr


@pytest.mark.parametrize("comp", [None, "zlib", "zstd"])
def test_read_orc_column_vs_pyarrow(comp):
    """Every RLEv2 sub-encoding + strings + nulls, decoded from real
    pyarrow-written multi-stripe files under each chunked codec, must
    equal the source columns exactly."""
    from pyarrow import orc

    t, cols, words, nullstr = _fixture_table()
    buf = io.BytesIO()
    if comp:
        orc.write_table(t, buf, compression=comp)
    else:
        orc.write_table(t, buf)
    p = buf.getvalue()
    for name, want in cols.items():
        assert read_orc_column(p, name) == want, name
    assert [w.decode() for w in read_orc_column(p, "word")] == words
    assert [
        x.decode() if x is not None else None
        for x in read_orc_column(p, "ns")
    ] == nullstr


def test_read_orc_column_boundaries():
    import pyarrow as pa
    from pyarrow import orc

    t = pa.table({"a": pa.array([1, 2, 3], pa.int64()),
                  "d": pa.array([1.5, 2.5, 3.5], pa.float64())})
    buf = io.BytesIO()
    orc.write_table(t, buf)
    p = buf.getvalue()
    assert read_orc_column(p, "a") == [1, 2, 3]
    with pytest.raises(ValueError, match="no column"):
        read_orc_column(p, "zz")
    with pytest.raises(NotImplementedError, match="DOUBLE"):
        read_orc_column(p, "d")
    with pytest.raises(ValueError):
        read_orc_column(p[: len(p) // 2] + p[len(p) // 2 :][::-1], "a")


def test_orc_value_scan_stats_spark(spark):
    """The catalog operator end-to-end on the real documents table:
    in-op asserts prove value equality; the emitted surface matches
    the word formula (same shape the DuckDB oracle re-derives)."""
    from dynamodb_to_datalake_project_spark.lake import load_table
    from dynamodb_to_datalake_project_spark.llm.orcmeta import (
        orc_value_scan_stats,
    )

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").limit(30)
    rows = orc_value_scan_stats(docs).collect()
    assert len(rows) == 30
    by_id = {r.doc_id: r for r in rows}
    src = {r.doc_id: r.text for r in docs.collect()}
    for did, text in src.items():
        words = [w for w in text.split(" ") if w]
        r = by_id[did]
        assert r.n_values == len(words)
        assert r.sum_idx == len(words) * (len(words) - 1) // 2
        assert r.word_bytes == sum(len(w.encode()) for w in words)


def test_read_orc_column_with_bloom_filters():
    """Round-10 advice fix: BLOOM_FILTER_UTF8 (stream kind 8) lives
    in the stripe's index region like ROW_INDEX/BLOOM_FILTER, so it
    must not advance the data-region cursor. A file written with
    bloom filters on both a string and an int column must decode
    byte-identically to one written without."""
    from pyarrow import orc

    t, cols, words, nullstr = _fixture_table()
    buf = io.BytesIO()
    ncols = len(t.column_names)  # pyarrow wants field indices here
    orc.write_table(
        t, buf, bloom_filter_columns=list(range(ncols)),
        compression="zlib",
    )
    p = buf.getvalue()
    for name, want in cols.items():
        assert read_orc_column(p, name) == want, name
    assert [w.decode() for w in read_orc_column(p, "word")] == words
    assert [
        x.decode() if x is not None else None
        for x in read_orc_column(p, "ns")
    ] == nullstr
