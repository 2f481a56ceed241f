"""FLAC codec — REAL, zero third-party deps (lossless audio).

Decoder implements the public FLAC format (RFC 9639 / the xiph.org
format document): `fLaC` marker + metadata block walk (STREAMINFO
required), frame sync with CRC-8-verified headers (UTF-8-coded frame
numbers, all block-size/sample-rate/sample-size code forms), CONSTANT /
VERBATIM / FIXED (orders 0-4) / LPC (orders 1-32, quantized
coefficients + shift) subframes, wasted-bits, Rice-coded residuals
(both 4- and 5-bit parameter methods, partition orders, raw-bits
escape), all four channel assignments (independent, left/side,
right/side, mid/side — side channels carry one extra bit), frame
CRC-16, and the STREAMINFO MD5 check over the decoded samples.

Encoder emits valid fixed-blocksize streams: per-subframe choice of
CONSTANT or the best FIXED predictor (order 0-2 by residual magnitude),
single-partition Rice residuals with an estimated parameter, correct
CRCs and the genuine MD5 — so any spec-conforming decoder recovers the
samples exactly. FLAC is lossless, which is what lets the
`multimodal_flac_stats` catalog query carry a full DuckDB hash-match
oracle (multimodal.py).

Like llm/webp.py, nothing here is a port — the reference repo has no
media codecs; this is the audio leg of the multimodal binary-column
story (images: BMP/PNG/GIF/JPEG/WebP-lossless; audio: WAV/FLAC; only
formats genuinely requiring third-party DSP libraries — mp3/ogg and
lossy WebP — stay honest stubs).
"""

from __future__ import annotations

import hashlib
import struct

_FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}

_BLOCK_SIZE_TABLE = {1: 192, **{n: 576 << (n - 2) for n in range(2, 6)},
                     **{n: 256 << (n - 8) for n in range(8, 16)}}

_SAMPLE_RATE_TABLE = {
    1: 88_200, 2: 176_400, 3: 192_000, 4: 8_000, 5: 16_000, 6: 22_050,
    7: 24_000, 8: 32_000, 9: 44_100, 10: 48_000, 11: 96_000,
}

_SAMPLE_SIZE_TABLE = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}


def _crc_table(poly: int, width: int) -> "list[int]":
    top, mask = 1 << (width - 1), (1 << width) - 1
    tbl = []
    for b in range(256):
        crc = b << (width - 8)
        for _ in range(8):
            crc = ((crc << 1) ^ poly) & mask if crc & top else (crc << 1) & mask
        tbl.append(crc)
    return tbl


#: table-driven CRCs (identical values to the former per-bit loops —
#: the table entry IS the 8-bit-unrolled loop for that input byte)
_CRC8_TABLE = _crc_table(0x07, 8)
_CRC16_TABLE = _crc_table(0x8005, 16)


def _crc8(data: bytes) -> int:
    """CRC-8, polynomial x^8 + x^2 + x + 1 (0x07), init 0."""
    crc, tbl = 0, _CRC8_TABLE
    for b in data:
        crc = tbl[crc ^ b]
    return crc


def _crc16(data: bytes) -> int:
    """CRC-16, polynomial x^16 + x^15 + x^2 + 1 (0x8005), init 0."""
    crc, tbl = 0, _CRC16_TABLE
    for b in data:
        crc = ((crc << 8) & 0xFFFF) ^ tbl[(crc >> 8) ^ b]
    return crc


def _pcm_bytes_le(samples: "list[int]", nbytes: int) -> bytes:
    """Little-endian two's-complement PCM byte stream — numpy fast
    path for the common 1/2-byte widths, exact per-value fallback
    otherwise (identical bytes: int8/int16 casts ARE v & mask in
    two's complement)."""
    if nbytes in (1, 2):
        import numpy as np

        dt = "<i1" if nbytes == 1 else "<i2"
        return np.asarray(samples, np.int64).astype(dt).tobytes()
    mask = (1 << (8 * nbytes)) - 1
    return b"".join((v & mask).to_bytes(nbytes, "little") for v in samples)


def _utf8_number_encode(n: int) -> bytes:
    """FLAC's UTF-8-style coding of frame/sample numbers."""
    if n < 0x80:
        return bytes([n])
    for count, first_max in ((2, 11), (3, 16), (4, 21), (5, 26), (6, 31), (7, 36)):
        if n < (1 << first_max):
            out = bytearray(count)
            for i in range(count - 1, 0, -1):
                out[i] = 0x80 | (n & 0x3F)
                n >>= 6
            out[0] = (0xFF << (8 - count) & 0xFF) | n
            return bytes(out)
    raise ValueError("frame number too large for UTF-8 coding")


class _Reader:
    """MSB-first bit reader (FLAC bit order is the opposite of VP8L's)."""

    def __init__(self, data: bytes, pos: int = 0):
        self.d = data
        self.pos = pos  # byte position
        self.bit = 0  # bits consumed within d[pos]

    def read(self, n: int) -> int:
        # all n bits in one int.from_bytes + shift (the former per-bit
        # loop paid ~5 Python ops per BIT); same bytes touched, same
        # truncation condition, identical value by MSB-first order
        if n == 0:
            return 0
        need = self.bit + n
        nby = (need + 7) >> 3
        chunk = self.d[self.pos : self.pos + nby]
        if len(chunk) < nby:
            raise ValueError("truncated FLAC bitstream")
        v = (int.from_bytes(chunk, "big") >> (nby * 8 - need)) & (
            (1 << n) - 1
        )
        self.pos += need >> 3
        self.bit = need & 7
        return v

    def signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v >> (n - 1) else v

    def unary(self) -> int:
        # scan whole bytes for the terminating 1-bit instead of
        # reading bit-by-bit; value and end position are identical
        d, pos, bit, q = self.d, self.pos, self.bit, 0
        nd = len(d)
        while True:
            if pos >= nd:
                raise ValueError("truncated FLAC bitstream")
            cur = d[pos] & (0xFF >> bit)
            if cur:
                hb = cur.bit_length()  # 1..8; the 1-bit is at 8-hb
                q += (8 - hb) - bit
                bit = 9 - hb
                if bit == 8:
                    bit = 0
                    pos += 1
                break
            q += 8 - bit
            bit = 0
            pos += 1
            if q > 1 << 24:
                raise ValueError("corrupt Rice quotient")
        if q > 1 << 24:
            raise ValueError("corrupt Rice quotient")
        self.pos, self.bit = pos, bit
        return q

    def align(self) -> None:
        if self.bit:
            self.bit = 0
            self.pos += 1

    def utf8_number(self) -> int:
        b0 = self.read(8)
        if b0 < 0x80:
            return b0
        count = 0
        while (b0 << count) & 0x80:
            count += 1
        if count < 2 or count > 7:
            raise ValueError("bad UTF-8-coded frame number")
        n = b0 & (0x7F >> count)
        for _ in range(count - 1):
            b = self.read(8)
            if b & 0xC0 != 0x80:
                raise ValueError("bad UTF-8-coded frame number")
            n = (n << 6) | (b & 0x3F)
        return n


class _Writer:
    """MSB-first bit writer. Bits accumulate in an int and flush to
    `out` whole bytes at a time (the former per-bit appender paid ~5
    Python ops per BIT); `out` always holds every completed byte, so
    the encoder's byte-aligned CRC reads over `out` see identical
    bytes."""

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.bit = 0  # bits pending in acc (0..7 after write())

    def write(self, v: int, n: int) -> None:
        acc = (self.acc << n) | (v & ((1 << n) - 1))
        nb = self.bit + n
        if nb >= 8:
            flush = nb & ~7
            nb -= flush
            self.out += (acc >> nb).to_bytes(flush >> 3, "big")
            acc &= (1 << nb) - 1
        self.acc = acc
        self.bit = nb

    def signed(self, v: int, n: int) -> None:
        self.write(v & ((1 << n) - 1), n)

    def unary(self, q: int) -> None:
        self.write(1, q + 1)

    def align(self) -> None:
        if self.bit:
            self.write(0, 8 - self.bit)


# ---------------------------------------------------------------------------
# decode


def _read_residual(r: _Reader, block_size: int, order: int) -> "list[int]":
    method = r.read(2)
    if method > 1:
        raise ValueError("reserved FLAC residual method")
    plen = 4 + method  # Rice parameter width; all-ones = escape
    escape = (1 << plen) - 1
    porder = r.read(4)
    n_parts = 1 << porder
    if block_size % n_parts:
        raise ValueError("partition order does not divide the block size")
    res: "list[int]" = []
    for part in range(n_parts):
        n = (block_size >> porder) - (order if part == 0 else 0)
        if n < 0:
            raise ValueError("predictor order exceeds the first partition")
        param = r.read(plen)
        if param == escape:
            raw = r.read(5)
            for _ in range(n):
                res.append(r.signed(raw) if raw else 0)
        else:
            for _ in range(n):
                q = r.unary()
                u = (q << param) | r.read(param)
                res.append((u >> 1) ^ -(u & 1))  # un-zigzag
    return res


def _read_subframe(r: _Reader, block_size: int, bps: int) -> "list[int]":
    if r.read(1):
        raise ValueError("subframe padding bit set")
    ftype = r.read(6)
    wasted = 0
    if r.read(1):  # wasted-bits flag: unary count - 1
        wasted = r.unary() + 1
        bps -= wasted
    if ftype == 0:  # CONSTANT
        v = r.signed(bps)
        out = [v] * block_size
    elif ftype == 1:  # VERBATIM
        out = [r.signed(bps) for _ in range(block_size)]
    elif 8 <= ftype <= 12:  # FIXED, order 0-4
        order = ftype - 8
        out = [r.signed(bps) for _ in range(order)]
        res = _read_residual(r, block_size, order)
        # order-specialized reconstruction (the generic genexpr-sum
        # paid 2 calls per SAMPLE; the coefficient algebra is
        # identical — _FIXED_COEFS[order] written out)
        if order == 0:
            out = res if not out else out + res
        elif order == 1:
            a = out[-1]
            for e in res:
                a += e
                out.append(a)
        elif order == 2:
            a, b = out[-1], out[-2]
            for e in res:
                a, b = e + 2 * a - b, a
                out.append(a)
        else:
            coefs = _FIXED_COEFS[order]
            for e in res:
                pred = sum(c * out[-1 - j] for j, c in enumerate(coefs))
                out.append(e + pred)
    elif ftype >= 32:  # LPC, order 1-32
        order = ftype - 31
        out = [r.signed(bps) for _ in range(order)]
        precision = r.read(4) + 1
        if precision == 16:
            raise ValueError("invalid LPC precision")
        shift = r.signed(5)
        if shift < 0:
            raise ValueError("negative LPC shift")
        coefs = [r.signed(precision) for _ in range(order)]
        res = _read_residual(r, block_size, order)
        for e in res:
            pred = sum(c * out[-1 - j] for j, c in enumerate(coefs)) >> shift
            out.append(e + pred)
    else:
        raise ValueError(f"reserved FLAC subframe type {ftype}")
    if wasted:
        out = [v << wasted for v in out]
    return out


def decode_flac_samples(payload: bytes) -> dict:
    """Full FLAC decode to interleaved samples + stream metadata.
    Verifies every frame-header CRC-8, every frame CRC-16, and the
    STREAMINFO MD5 (when present) over the decoded audio."""
    if payload[:4] != b"fLaC":
        raise ValueError("not a FLAC payload")
    pos, info = 4, None
    while True:
        if pos + 4 > len(payload):
            raise ValueError("truncated FLAC metadata")
        last, btype = payload[pos] >> 7, payload[pos] & 0x7F
        (length,) = struct.unpack(">I", b"\x00" + payload[pos + 1 : pos + 4])
        block = payload[pos + 4 : pos + 4 + length]
        if len(block) != length:
            raise ValueError("truncated FLAC metadata block")
        if btype == 0:
            if length != 34:
                raise ValueError("bad STREAMINFO length")
            r = _Reader(block)
            r.read(16); r.read(16); r.read(24); r.read(24)
            sample_rate = r.read(20)
            n_channels = r.read(3) + 1
            bps = r.read(5) + 1
            total = r.read(36)
            md5 = block[18:34]
            info = (sample_rate, n_channels, bps, total, md5)
        pos += 4 + length
        if last:
            break
    if info is None:
        raise ValueError("FLAC payload has no STREAMINFO")
    sample_rate, n_channels, bps, total, md5 = info
    channels: "list[list[int]]" = [[] for _ in range(n_channels)]
    decoded = 0
    while decoded < total:
        frame_start = pos
        r = _Reader(payload, pos)
        sync = r.read(14)
        if sync != 0b11111111111110:
            raise ValueError("lost FLAC frame sync")
        if r.read(1):
            raise ValueError("reserved frame-header bit set")
        r.read(1)  # blocking strategy (number semantics only)
        bs_code = r.read(4)
        sr_code = r.read(4)
        ch_code = r.read(4)
        ss_code = r.read(3)
        if r.read(1):
            raise ValueError("reserved frame-header bit set")
        r.utf8_number()
        if bs_code == 0:
            raise ValueError("reserved block size code")
        elif bs_code == 6:
            block_size = r.read(8) + 1
        elif bs_code == 7:
            block_size = r.read(16) + 1
        else:
            block_size = _BLOCK_SIZE_TABLE[bs_code]
        if sr_code == 0:
            pass
        elif sr_code in _SAMPLE_RATE_TABLE:
            pass  # informational; STREAMINFO governs
        elif sr_code == 12:
            r.read(8)
        elif sr_code in (13, 14):
            r.read(16)
        else:
            raise ValueError("invalid sample rate code")
        header_end = r.pos + (1 if r.bit else 0)
        if _crc8(payload[frame_start:header_end]) != r.read(8):
            raise ValueError("FLAC frame header CRC-8 mismatch")
        if ch_code < 8:
            if ch_code + 1 != n_channels:
                raise ValueError("frame/STREAMINFO channel mismatch")
            assign = "independent"
        elif ch_code in (8, 9, 10):
            if n_channels != 2:
                raise ValueError("stereo decorrelation in non-stereo stream")
            assign = {8: "left_side", 9: "right_side", 10: "mid_side"}[ch_code]
        else:
            raise ValueError("reserved channel assignment")
        if ss_code != 0 and _SAMPLE_SIZE_TABLE.get(ss_code) != bps:
            raise ValueError("frame/STREAMINFO sample size mismatch")
        subs = []
        for ch in range(n_channels):
            extra = (
                1
                if (assign == "left_side" and ch == 1)
                or (assign == "right_side" and ch == 0)
                or (assign == "mid_side" and ch == 1)
                else 0
            )
            subs.append(_read_subframe(r, block_size, bps + extra))
        r.align()
        crc16_read = r.read(16)
        if _crc16(payload[frame_start : r.pos - 2]) != crc16_read:
            raise ValueError("FLAC frame CRC-16 mismatch")
        if assign == "left_side":
            subs = [subs[0], [l - s for l, s in zip(subs[0], subs[1])]]
        elif assign == "right_side":
            subs = [[rr + s for s, rr in zip(subs[0], subs[1])], subs[1]]
        elif assign == "mid_side":
            left = [
                ((m << 1 | (s & 1)) + s) >> 1 for m, s in zip(subs[0], subs[1])
            ]
            subs = [left, [l - s for l, s in zip(left, subs[1])]]
        for ch in range(n_channels):
            channels[ch].extend(subs[ch])
        decoded += block_size
        pos = r.pos
    if decoded != total:
        raise ValueError("FLAC frame sizes disagree with STREAMINFO total")
    if n_channels == 1:
        interleaved = channels[0]
    else:
        interleaved = [v for tup in zip(*channels) for v in tup]
    if md5 != b"\x00" * 16:
        nbytes = (bps + 7) // 8
        raw = _pcm_bytes_le(interleaved, nbytes)
        if hashlib.md5(raw).digest() != md5:
            raise ValueError("FLAC MD5 mismatch: decoded audio is damaged")
    return {
        "sample_rate": sample_rate,
        "n_channels": n_channels,
        "bits_per_sample": bps,
        "samples": interleaved,
    }


def decode_flac(payload: bytes) -> dict:
    """Stats API over `decode_flac_samples`, mirroring decode_wav."""
    d = decode_flac_samples(payload)
    samples = d["samples"]
    return {
        "n_channels": d["n_channels"],
        "sample_rate": d["sample_rate"],
        "n_samples": len(samples),
        "sum_abs": sum(abs(s) for s in samples),
        "peak": max((abs(s) for s in samples), default=0),
    }


# ---------------------------------------------------------------------------
# encode


def _best_fixed_order(sub: "list[int]") -> int:
    """Cheapest FIXED predictor (order 0-2) by total residual magnitude
    — the standard first-pass heuristic."""
    best, best_cost = 0, sum(abs(v) for v in sub)
    prev = sub
    for order in (1, 2):
        if len(sub) <= order:
            break
        prev = [b - a for a, b in zip(prev, prev[1:])]
        cost = sum(abs(v) for v in prev) + (1 << 14) * order
        if cost < best_cost:
            best, best_cost = order, cost
    return best


def _write_residual(w: _Writer, res: "list[int]") -> None:
    """Single-partition Rice residual with an estimated parameter."""
    w.write(0, 2)  # method: 4-bit Rice parameters
    w.write(0, 4)  # partition order 0
    # zigzag: v >= 0 -> 2v, v < 0 -> -2v-1 ((v<<1) ^ (v>>63) with the
    # arithmetic shift supplying the all-ones mask for negatives)
    total = sum((v << 1) ^ (v >> 63) for v in res) or 1
    k = 0
    while (len(res) << (k + 1)) < total and k < 14:
        k += 1
    w.write(k, 4)
    # one write per sample: the unary quotient (q zeros + a 1) and the
    # k low bits pack into a single ((q+1)+k)-bit value whose bit
    # pattern is exactly unary(q) followed by write(low, k)
    kmask = (1 << k) - 1
    for v in res:
        u = (v << 1) ^ (v >> 63)
        w.write((1 << k) | (u & kmask), (u >> k) + 1 + k)


def _write_subframe(w: _Writer, sub: "list[int]", bps: int) -> None:
    if all(v == sub[0] for v in sub):
        w.write(0, 1); w.write(0, 6); w.write(0, 1)
        w.signed(sub[0], bps)
        return
    order = _best_fixed_order(sub)
    w.write(0, 1)
    w.write(8 + order, 6)  # FIXED
    w.write(0, 1)  # no wasted bits
    for v in sub[:order]:
        w.signed(v, bps)
    coefs = _FIXED_COEFS[order]
    res = [
        sub[i] - sum(c * sub[i - 1 - j] for j, c in enumerate(coefs))
        for i in range(order, len(sub))
    ]
    _write_residual(w, res)


def encode_flac(
    samples: "list[int]",
    sample_rate: int = 16_000,
    n_channels: int = 1,
    bits_per_sample: int = 16,
    block_size: int = 4096,
) -> bytes:
    """REAL FLAC encode: interleaved signed PCM -> fixed-blocksize
    stream (CONSTANT / best-FIXED subframes, single-partition Rice,
    genuine CRCs and MD5). Lossless by construction."""
    if bits_per_sample != 16:
        raise NotImplementedError("encoder emits 16-bit streams only")
    if len(samples) % n_channels:
        raise ValueError("sample count must be a multiple of n_channels")
    total = len(samples) // n_channels
    lo, hi = -(1 << (bits_per_sample - 1)), (1 << (bits_per_sample - 1)) - 1
    if any(v < lo or v > hi for v in samples):
        raise ValueError("sample out of range for bits_per_sample")
    nbytes = (bits_per_sample + 7) // 8
    md5 = hashlib.md5(_pcm_bytes_le(samples, nbytes)).digest()
    si = _Writer()
    si.write(block_size, 16); si.write(block_size, 16)
    si.write(0, 24); si.write(0, 24)  # frame sizes unknown
    si.write(sample_rate, 20)
    si.write(n_channels - 1, 3)
    si.write(bits_per_sample - 1, 5)
    si.write(total, 36)
    out = bytearray(b"fLaC")
    out += bytes([0x80]) + (34).to_bytes(3, "big") + bytes(si.out) + md5
    channels = [samples[ch::n_channels] for ch in range(n_channels)]
    frame_no = 0
    for start in range(0, total, block_size):
        n = min(block_size, total - start)
        w = _Writer()
        w.write(0b11111111111110, 14)
        w.write(0, 1)  # reserved
        w.write(0, 1)  # fixed-blocksize strategy
        w.write(7, 4)  # block size: 16 bits at header end
        w.write(0, 4)  # sample rate: from STREAMINFO
        w.write(n_channels - 1, 4)  # independent channels
        w.write(4, 3)  # sample size: 16 bit (validated below)
        w.write(0, 1)  # reserved
        for b in _utf8_number_encode(frame_no):
            w.write(b, 8)
        w.write(n - 1, 16)
        w.align()
        w.write(_crc8(bytes(w.out)), 8)
        for ch in range(n_channels):
            _write_subframe(w, channels[ch][start : start + n], bits_per_sample)
        w.align()
        w.write(_crc16(bytes(w.out)), 16)
        out += w.out
        frame_no += 1
    return bytes(out)
