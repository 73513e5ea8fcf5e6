"""Baseline JPEG codec (ITU T.81 sequential DCT, grayscale), pure
stdlib + numpy — the real decoder that replaces the round-1..7 sha-stub
seam (r7 verdict task 8).

The reference has no image path at all; this is north-star surface for
the multimodal column family. Scope is the honest baseline subset:

- one 8-bit component (luma), 1x1 sampling, no restart markers,
- standard Annex-K luminance quantization + Huffman tables,
- spec-complete marker stream (SOI/DQT/SOF0/DHT/SOS/EOI) with entropy
  byte stuffing — the emitted files open in any image viewer.

Both directions are implemented from the spec: the encoder runs
level-shift -> 8x8 forward DCT (orthonormal matrix form, exactly the
T.81 FDCT) -> quantization -> zigzag -> DC-difference / AC run-length
-> canonical Huffman; the decoder parses and validates the marker
stream, rebuilds the Huffman tables from BITS/HUFFVAL, entropy-decodes
with byte unstuffing, dequantizes, inverse-zigzags, and reconstructs
pixels through the matching IDCT. Nothing is faked: a corrupt stream,
wrong table, or filter error raises instead of returning pixels.

JPEG is LOSSY, so unlike the PNG/PPM/WAV paths the decoded plane cannot
be oracle-recomputed in SQL. The registry query therefore ships the
MEASUREMENT (the conversion proven on the sketch audits): exact header
fields + source-pixel statistics (both SQL-recomputable from the
synthesis formula) plus in-engine reconstruction-error bounds as
boolean flags the oracle pins to TRUE.
"""

from __future__ import annotations

import struct

import numpy as np

# ITU T.81 Annex K.1 — luminance quantization table (quality 50), natural
# (row-major) order.
QTABLE = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.int32,
)

# zigzag scan: ZIGZAG[i] = natural (row-major) index of the i-th zigzag
# position (T.81 Figure 5).
ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# Annex K.3.1 — luminance DC: BITS (counts of codes per length 1..16) and
# HUFFVAL (symbols in code order).
DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_VALS = list(range(12))

# Annex K.3.2 — luminance AC.
AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8-point DCT-II matrix T: T[u,x] = c(u) cos((2x+1)uπ/16)
    with c(0)=sqrt(1/8), c(u>0)=1/2. F = T f T^T is exactly the T.81 FDCT
    (including the 1/4·α(u)α(v) scaling), and f = T^T F T inverts it."""
    u = np.arange(8).reshape(8, 1)
    x = np.arange(8).reshape(1, 8)
    t = np.cos((2 * x + 1) * u * np.pi / 16) * 0.5
    t[0, :] = np.sqrt(1.0 / 8.0)
    return t


_T = _dct_matrix()


def _build_huffman(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) via the canonical T.81 assignment."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _build_decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol, the inverse of _build_huffman."""
    return {(ln, code): sym for sym, (code, ln) in _build_huffman(bits, vals).items()}


_DC_ENC = _build_huffman(DC_BITS, DC_VALS)
_AC_ENC = _build_huffman(AC_BITS, AC_VALS)


class _BitWriter:
    """MSB-first bit accumulator with JPEG entropy byte stuffing."""

    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, value: int, nbits: int) -> None:
        if nbits == 0:
            return
        self.acc = (self.acc << nbits) | (value & ((1 << nbits) - 1))
        self.nbits += nbits
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:  # entropy byte stuffing
                self.buf.append(0x00)
            self.nbits -= 8
            self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.put((1 << pad) - 1, pad)  # pad with 1-bits per spec
        return bytes(self.buf)


def _magnitude(v: int) -> tuple[int, int]:
    """JPEG magnitude coding: category (bit size) and the appended bits
    (one's complement for negatives)."""
    if v == 0:
        return 0, 0
    s = int(abs(v)).bit_length()
    bits = v if v > 0 else v + (1 << s) - 1
    return s, bits


def jpeg_encode_gray8(width: int, height: int, gray: bytes) -> bytes:
    """Encode an 8-bit grayscale plane as a baseline sequential JPEG."""
    if len(gray) != width * height:
        raise ValueError("gray plane has wrong length")
    img = np.frombuffer(gray, dtype=np.uint8).reshape(height, width)
    # pad to 8x8 multiples by edge replication (spec leaves padding free)
    ph = (height + 7) // 8 * 8
    pw = (width + 7) // 8 * 8
    padded = np.empty((ph, pw), dtype=np.float64)
    padded[:height, :width] = img
    if pw > width:
        padded[:height, width:] = img[:, -1:]
    if ph > height:
        padded[height:, :] = padded[height - 1 : height, :]

    writer = _BitWriter()
    prev_dc = 0
    for by in range(0, ph, 8):
        for bx in range(0, pw, 8):
            block = padded[by : by + 8, bx : bx + 8] - 128.0
            coeffs = _T @ block @ _T.T
            q = np.round(coeffs / QTABLE).astype(np.int64)
            zz = q.reshape(64)[ZIGZAG]
            # DC difference
            s, bits = _magnitude(int(zz[0]) - prev_dc)
            prev_dc = int(zz[0])
            code, ln = _DC_ENC[s]
            writer.put(code, ln)
            writer.put(bits, s)
            # AC run-length
            run = 0
            (nz,) = np.nonzero(zz[1:])
            last_nz = int(nz[-1]) + 1 if len(nz) else 0
            for k in range(1, last_nz + 1):
                v = int(zz[k])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    code, ln = _AC_ENC[0xF0]  # ZRL
                    writer.put(code, ln)
                    run -= 16
                s, bits = _magnitude(v)
                code, ln = _AC_ENC[(run << 4) | s]
                writer.put(code, ln)
                writer.put(bits, s)
                run = 0
            if last_nz < 63:
                code, ln = _AC_ENC[0x00]  # EOB
                writer.put(code, ln)
    scan = writer.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    qz = QTABLE.reshape(64)[ZIGZAG].astype(np.uint8).tobytes()
    dqt = seg(0xFFDB, b"\x00" + qz)
    sof0 = seg(0xFFC0, struct.pack(">BHHB", 8, height, width, 1) + b"\x01\x11\x00")
    dht_dc = seg(0xFFC4, b"\x00" + bytes(DC_BITS) + bytes(DC_VALS))
    dht_ac = seg(0xFFC4, b"\x10" + bytes(AC_BITS) + bytes(AC_VALS))
    sos = seg(0xFFDA, b"\x01\x01\x00\x00\x3f\x00")
    return b"\xff\xd8" + dqt + sof0 + dht_dc + dht_ac + sos + scan + b"\xff\xd9"


class _BitReader:
    """MSB-first bit reader over the entropy-coded segment, undoing byte
    stuffing and stopping at any non-stuffing marker."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt != 0x00:
                raise ValueError(f"unexpected marker 0xFF{nxt:02X} inside scan")
            self.pos += 2
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def bits(self, n: int) -> int:
        while self.nbits < n:
            self._fill()
        v = (self.acc >> (self.nbits - n)) & ((1 << n) - 1)
        self.nbits -= n
        self.acc &= (1 << self.nbits) - 1
        return v

    def huffman(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.bits(1)
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in scan")


def _extend(v: int, s: int) -> int:
    """T.81 EXTEND: map s appended bits back to the signed value."""
    if s == 0:
        return 0
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def jpeg_decode_gray8(raw: bytes) -> tuple[int, int, bytes]:
    """Decode a baseline grayscale JPEG produced by any spec-compliant
    encoder within this module's scope (one 8-bit component, 1x1 sampling,
    no restart intervals). Returns (width, height, gray_plane). Raises on
    anything it cannot prove it parsed correctly."""
    if raw[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    dc_tbl: dict[tuple[int, int], int] | None = None
    ac_tbl: dict[tuple[int, int], int] | None = None
    width = height = 0
    comp_q = 0
    while pos + 4 <= len(raw):
        if raw[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}, got {raw[pos]:#x}")
        marker = raw[pos + 1]
        if marker == 0xFF:  # 0xFF fill bytes before a marker are legal padding
            pos += 1
            continue
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            # TEM/RSTn are STANDALONE (no length field); legal in baseline
            # streams but outside this decoder's scope — parsing them as
            # length-prefixed would desync the walk, so refuse explicitly
            # (mirrors the DRI rejection below)
            raise NotImplementedError(
                f"standalone marker 0xFF{marker:02X} (TEM/RSTn) unsupported"
            )
        if marker in (0xD8, 0xD9):
            raise ValueError(f"unexpected SOI/EOI marker before SOS at {pos}")
        (ln,) = struct.unpack(">H", raw[pos + 2 : pos + 4])
        payload = raw[pos + 4 : pos + 2 + ln]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(payload):
                pq, tq = payload[p] >> 4, payload[p] & 0x0F
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables unsupported")
                zz = np.frombuffer(payload[p + 1 : p + 65], dtype=np.uint8)
                nat = np.zeros(64, dtype=np.int32)
                nat[ZIGZAG] = zz
                qtables[tq] = nat.reshape(8, 8)
                p += 65
        elif marker == 0xC0:  # SOF0 baseline
            prec, height, width, ncomp = struct.unpack(">BHHB", payload[:6])
            if prec != 8 or ncomp != 1:
                raise NotImplementedError(
                    f"decoder handles 8-bit single-component JPEG only "
                    f"(got precision={prec} components={ncomp})"
                )
            if payload[7] != 0x11:
                raise NotImplementedError("subsampled JPEG unsupported")
            comp_q = payload[8]
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7):
            raise NotImplementedError("non-baseline JPEG (progressive/etc.)")
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(payload):
                tc, th = payload[p] >> 4, payload[p] & 0x0F
                bits = list(payload[p + 1 : p + 17])
                nvals = sum(bits)
                vals = list(payload[p + 17 : p + 17 + nvals])
                tbl = _build_decode_table(bits, vals)
                if tc == 0 and th == 0:
                    dc_tbl = tbl
                elif tc == 1 and th == 0:
                    ac_tbl = tbl
                p += 17 + nvals
        elif marker == 0xDD:
            raise NotImplementedError("restart intervals unsupported")
        elif marker == 0xDA:  # SOS — entropy data follows
            pos += 2 + ln
            break
        pos += 2 + ln
    else:
        raise ValueError("JPEG missing SOS")
    if not width or not height:
        raise ValueError("JPEG missing SOF0")
    if dc_tbl is None or ac_tbl is None:
        raise ValueError("JPEG missing Huffman tables")
    qt = qtables.get(comp_q)
    if qt is None:
        raise ValueError("JPEG missing quantization table")

    ph = (height + 7) // 8 * 8
    pw = (width + 7) // 8 * 8
    plane = np.zeros((ph, pw), dtype=np.float64)
    reader = _BitReader(raw, pos)
    prev_dc = 0
    for by in range(0, ph, 8):
        for bx in range(0, pw, 8):
            zz = np.zeros(64, dtype=np.int64)
            s = reader.huffman(dc_tbl)
            prev_dc += _extend(reader.bits(s), s)
            zz[0] = prev_dc
            k = 1
            while k < 64:
                rs = reader.huffman(ac_tbl)
                run, size = rs >> 4, rs & 0x0F
                if size == 0:
                    if run == 15:  # ZRL
                        k += 16
                        continue
                    break  # EOB
                k += run
                if k > 63:
                    raise ValueError("AC run overruns block")
                zz[k] = _extend(reader.bits(size), size)
                k += 1
            coeffs = np.zeros(64, dtype=np.float64)
            coeffs[ZIGZAG] = zz * qt.reshape(64)[ZIGZAG]
            block = _T.T @ coeffs.reshape(8, 8) @ _T + 128.0
            plane[by : by + 8, bx : bx + 8] = block
    # trailing EOI check (bit padding may leave us mid-byte)
    tail = raw[reader.pos :]
    if b"\xff\xd9" not in tail[:4]:
        raise ValueError("JPEG missing EOI after scan")
    out = np.clip(np.round(plane[:height, :width]), 0, 255).astype(np.uint8)
    return width, height, out.tobytes()


# --- color (YCbCr 4:2:0) baseline path ---------------------------------
# The common real-world JPEG form: 3 components, chroma subsampled 2x2,
# interleaved 16x16 MCUs, separate luma/chroma quantization and Huffman
# tables (Annex K.2 / K.3.3). The grayscale path above stays untouched —
# these functions share only the primitive layers (_BitWriter/_BitReader,
# _magnitude/_extend, ZIGZAG, the DCT matrix).

CHROMA_QTABLE = np.array(
    [
        [17, 18, 24, 47, 99, 99, 99, 99],
        [18, 21, 26, 66, 99, 99, 99, 99],
        [24, 26, 56, 99, 99, 99, 99, 99],
        [47, 66, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
    ],
    dtype=np.int32,
)

# Annex K.3.3 — chrominance DC/AC tables.
DC_C_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_C_VALS = list(range(12))
AC_C_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_C_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

_DC_C_ENC = _build_huffman(DC_C_BITS, DC_C_VALS)
_AC_C_ENC = _build_huffman(AC_C_BITS, AC_C_VALS)


def _rgb_to_ycbcr(rgb: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """JFIF full-range BT.601 forward transform (float planes)."""
    r = rgb[..., 0].astype(np.float64)
    g = rgb[..., 1].astype(np.float64)
    b = rgb[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    return y, cb, cr


def _ycbcr_to_rgb(y: np.ndarray, cb: np.ndarray, cr: np.ndarray) -> np.ndarray:
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.stack(
        [np.clip(np.round(c), 0, 255).astype(np.uint8) for c in (r, g, b)], axis=-1
    )


def _pad_to(plane: np.ndarray, mh: int, mw: int) -> np.ndarray:
    """Edge-replicate a float plane up to multiples of (mh, mw)."""
    h, w = plane.shape
    ph = (h + mh - 1) // mh * mh
    pw = (w + mw - 1) // mw * mw
    out = np.empty((ph, pw), dtype=np.float64)
    out[:h, :w] = plane
    if pw > w:
        out[:h, w:] = plane[:, -1:]
    if ph > h:
        out[h:, :] = out[h - 1 : h, :]
    return out


def _encode_block(
    writer: _BitWriter,
    block: np.ndarray,
    qtable: np.ndarray,
    dc_enc: dict,
    ac_enc: dict,
    prev_dc: int,
) -> int:
    """FDCT + quantize + entropy-code one 8x8 block; returns its DC."""
    coeffs = _T @ (block - 128.0) @ _T.T
    zz = np.round(coeffs / qtable).astype(np.int64).reshape(64)[ZIGZAG]
    s, bits = _magnitude(int(zz[0]) - prev_dc)
    code, ln = dc_enc[s]
    writer.put(code, ln)
    writer.put(bits, s)
    run = 0
    (nz,) = np.nonzero(zz[1:])
    last_nz = int(nz[-1]) + 1 if len(nz) else 0
    for k in range(1, last_nz + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_enc[0xF0]
            writer.put(code, ln)
            run -= 16
        s, bits = _magnitude(v)
        code, ln = ac_enc[(run << 4) | s]
        writer.put(code, ln)
        writer.put(bits, s)
        run = 0
    if last_nz < 63:
        code, ln = ac_enc[0x00]
        writer.put(code, ln)
    return int(zz[0])


def _decode_block(
    reader: _BitReader,
    dc_tbl: dict,
    ac_tbl: dict,
    qtable: np.ndarray,
    prev_dc: int,
) -> tuple[np.ndarray, int]:
    """Entropy-decode + dequantize + IDCT one 8x8 block."""
    zz = np.zeros(64, dtype=np.int64)
    s = reader.huffman(dc_tbl)
    dc = prev_dc + _extend(reader.bits(s), s)
    zz[0] = dc
    k = 1
    while k < 64:
        rs = reader.huffman(ac_tbl)
        run, size = rs >> 4, rs & 0x0F
        if size == 0:
            if run == 15:
                k += 16
                continue
            break
        k += run
        if k > 63:
            raise ValueError("AC run overruns block")
        zz[k] = _extend(reader.bits(size), size)
        k += 1
    coeffs = np.zeros(64, dtype=np.float64)
    coeffs[ZIGZAG] = zz * qtable.reshape(64)[ZIGZAG]
    return (_T.T @ coeffs.reshape(8, 8) @ _T + 128.0), dc


def jpeg_encode_color420(width: int, height: int, rgb: bytes) -> bytes:
    """Encode an interleaved RGB plane as baseline YCbCr 4:2:0 JPEG —
    16x16 MCUs of (4 Y, 1 Cb, 1 Cr) blocks, chroma from 2x2 box
    averaging, Annex-K luma + chroma tables."""
    if len(rgb) != width * height * 3:
        raise ValueError("rgb plane has wrong length")
    img = np.frombuffer(rgb, dtype=np.uint8).reshape(height, width, 3)
    y, cb, cr = _rgb_to_ycbcr(img)
    yp = _pad_to(y, 16, 16)
    cbp = _pad_to(cb, 16, 16)
    crp = _pad_to(cr, 16, 16)
    # 4:2:0 chroma: 2x2 box mean at half resolution
    cbs = cbp.reshape(cbp.shape[0] // 2, 2, cbp.shape[1] // 2, 2).mean(axis=(1, 3))
    crs = crp.reshape(crp.shape[0] // 2, 2, crp.shape[1] // 2, 2).mean(axis=(1, 3))

    writer = _BitWriter()
    dc_y = dc_cb = dc_cr = 0
    for my in range(0, yp.shape[0], 16):
        for mx in range(0, yp.shape[1], 16):
            for by, bx in ((0, 0), (0, 8), (8, 0), (8, 8)):
                dc_y = _encode_block(
                    writer,
                    yp[my + by : my + by + 8, mx + bx : mx + bx + 8],
                    QTABLE, _DC_ENC, _AC_ENC, dc_y,
                )
            cy, cx = my // 2, mx // 2
            dc_cb = _encode_block(
                writer, cbs[cy : cy + 8, cx : cx + 8],
                CHROMA_QTABLE, _DC_C_ENC, _AC_C_ENC, dc_cb,
            )
            dc_cr = _encode_block(
                writer, crs[cy : cy + 8, cx : cx + 8],
                CHROMA_QTABLE, _DC_C_ENC, _AC_C_ENC, dc_cr,
            )
    scan = writer.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    qy = QTABLE.reshape(64)[ZIGZAG].astype(np.uint8).tobytes()
    qc = CHROMA_QTABLE.reshape(64)[ZIGZAG].astype(np.uint8).tobytes()
    dqt = seg(0xFFDB, b"\x00" + qy) + seg(0xFFDB, b"\x01" + qc)
    sof0 = seg(
        0xFFC0,
        struct.pack(">BHHB", 8, height, width, 3)
        + b"\x01\x22\x00"  # Y: 2x2 sampling, qtable 0
        + b"\x02\x11\x01"  # Cb: 1x1, qtable 1
        + b"\x03\x11\x01",  # Cr: 1x1, qtable 1
    )
    dht = (
        seg(0xFFC4, b"\x00" + bytes(DC_BITS) + bytes(DC_VALS))
        + seg(0xFFC4, b"\x10" + bytes(AC_BITS) + bytes(AC_VALS))
        + seg(0xFFC4, b"\x01" + bytes(DC_C_BITS) + bytes(DC_C_VALS))
        + seg(0xFFC4, b"\x11" + bytes(AC_C_BITS) + bytes(AC_C_VALS))
    )
    sos = seg(0xFFDA, b"\x03\x01\x00\x02\x11\x03\x11\x00\x3f\x00")
    return b"\xff\xd8" + dqt + sof0 + dht + sos + scan + b"\xff\xd9"


def jpeg_decode_color420(raw: bytes) -> tuple[int, int, bytes]:
    """Decode a baseline YCbCr 4:2:0 JPEG within this module's scope
    (3 components, (2,2)/(1,1)/(1,1) sampling, no restarts). Returns
    (width, height, interleaved RGB). Raises on anything unproven."""
    if raw[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    width = height = 0
    comps: list[tuple[int, int, int]] = []  # (id, sampling, tq)
    scan_tables: dict[int, tuple[int, int]] = {}  # comp id -> (td, ta)
    while pos + 4 <= len(raw):
        if raw[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        marker = raw[pos + 1]
        if marker == 0xFF:  # fill bytes: legal padding before a marker
            pos += 1
            continue
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            raise NotImplementedError(
                f"standalone marker 0xFF{marker:02X} (TEM/RSTn) unsupported"
            )
        if marker in (0xD8, 0xD9):
            raise ValueError(f"unexpected SOI/EOI marker before SOS at {pos}")
        (ln,) = struct.unpack(">H", raw[pos + 2 : pos + 4])
        payload = raw[pos + 4 : pos + 2 + ln]
        if marker == 0xDB:
            p = 0
            while p < len(payload):
                pq, tq = payload[p] >> 4, payload[p] & 0x0F
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables unsupported")
                zz = np.frombuffer(payload[p + 1 : p + 65], dtype=np.uint8)
                nat = np.zeros(64, dtype=np.int32)
                nat[ZIGZAG] = zz
                qtables[tq] = nat.reshape(8, 8)
                p += 65
        elif marker == 0xC0:
            prec, height, width, ncomp = struct.unpack(">BHHB", payload[:6])
            if prec != 8 or ncomp != 3:
                raise NotImplementedError("color decoder expects 3x 8-bit components")
            for i in range(3):
                cid, samp, tq = payload[6 + 3 * i : 9 + 3 * i]
                comps.append((cid, samp, tq))
            if [c[1] for c in comps] != [0x22, 0x11, 0x11]:
                raise NotImplementedError("only 4:2:0 sampling supported")
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7):
            raise NotImplementedError("non-baseline JPEG")
        elif marker == 0xC4:
            p = 0
            while p < len(payload):
                tc, th = payload[p] >> 4, payload[p] & 0x0F
                bits = list(payload[p + 1 : p + 17])
                nvals = sum(bits)
                vals = list(payload[p + 17 : p + 17 + nvals])
                huff[(tc, th)] = _build_decode_table(bits, vals)
                p += 17 + nvals
        elif marker == 0xDD:
            raise NotImplementedError("restart intervals unsupported")
        elif marker == 0xDA:
            ns = payload[0]
            if ns != 3:
                raise NotImplementedError("expected 3-component scan")
            for i in range(ns):
                cid = payload[1 + 2 * i]
                tt = payload[2 + 2 * i]
                scan_tables[cid] = (tt >> 4, tt & 0x0F)
            pos += 2 + ln
            break
        pos += 2 + ln
    else:
        raise ValueError("JPEG missing SOS")
    if not comps or not width:
        raise ValueError("JPEG missing SOF0")

    mw = (width + 15) // 16
    mh = (height + 15) // 16
    yp = np.zeros((mh * 16, mw * 16), dtype=np.float64)
    cbp = np.zeros((mh * 8, mw * 8), dtype=np.float64)
    crp = np.zeros((mh * 8, mw * 8), dtype=np.float64)
    reader = _BitReader(raw, pos)
    dcs = {cid: 0 for cid, _, _ in comps}
    (yid, _, ytq), (cbid, _, cbtq), (crid, _, crtq) = comps
    for my in range(mh):
        for mx in range(mw):
            for by, bx in ((0, 0), (0, 8), (8, 0), (8, 8)):
                td, ta = scan_tables[yid]
                block, dcs[yid] = _decode_block(
                    reader, huff[(0, td)], huff[(1, ta)], qtables[ytq], dcs[yid]
                )
                yp[
                    my * 16 + by : my * 16 + by + 8,
                    mx * 16 + bx : mx * 16 + bx + 8,
                ] = block
            for cid, tq, plane in ((cbid, cbtq, cbp), (crid, crtq, crp)):
                td, ta = scan_tables[cid]
                block, dcs[cid] = _decode_block(
                    reader, huff[(0, td)], huff[(1, ta)], qtables[tq], dcs[cid]
                )
                plane[
                    my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8
                ] = block
    tail = raw[reader.pos :]
    if b"\xff\xd9" not in tail[:4]:
        raise ValueError("JPEG missing EOI after scan")
    # nearest-neighbor chroma upsample (mirrors the encoder's box mean)
    cb_full = np.repeat(np.repeat(cbp, 2, axis=0), 2, axis=1)
    cr_full = np.repeat(np.repeat(crp, 2, axis=0), 2, axis=1)
    rgb = _ycbcr_to_rgb(yp, cb_full, cr_full)[:height, :width]
    return width, height, rgb.tobytes()
