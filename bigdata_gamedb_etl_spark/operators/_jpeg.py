"""Pure-Python baseline JPEG codec (ITU-T T.81 sequential DCT, 8-bit).

Decoder for the multimodal real tier (`multimodal.decode_pixels`):
baseline (SOF0) grayscale and YCbCr JPEGs, arbitrary 4:4:4 / 4:2:2 /
4:2:0 sampling, restart markers, byte stuffing — the common JFIF
profile.  Progressive (SOF2), arithmetic coding, 12-bit precision and
hierarchical modes raise NotImplementedError and route callers to the
deterministic fallback tier, same contract as the PPM/BMP/PNG parsers.

Encoder (`encode_baseline`) exists for FIXTURES: the container has no
codec library to generate test JPEGs, so tests build them here and
decode-back through an arithmetic path that is NOT a mirror of the
encoder (encoder = forward DCT + spec Annex K Huffman tables; decoder
= general Huffman tree walk + IDCT; flat-field fixtures additionally
pin absolute pixel values that are hand-computable from the DC
quantizer alone, so a symmetric encode/decode bug cannot cancel out).

Everything here is public-spec content: marker layout and entropy
coding per ITU-T T.81, the example quantization/Huffman tables from
its Annex K, and the JFIF YCbCr<->RGB matrix.  numpy does the DCT
as two 8x8 matmuls; payloads that reach this path are fixture-sized
(corpus payloads are text blobs and fail the SOI check), so the
per-block Python loop is not a hot path.
"""

from __future__ import annotations

import struct

import numpy as np

# -- spec constants --------------------------------------------------------

#: zigzag scan order (T.81 Figure 5): ZIGZAG[k] = raster index of the
#: k-th coefficient in scan order.
ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

#: Annex K.1 example quantization tables (quality ~50 reference).
STD_QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)
STD_QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)

#: Annex K.3 example Huffman tables as (bits[1..16], values).
STD_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
STD_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
STD_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
STD_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)

#: orthonormal DCT-II basis: A[u, x] = c(u)/2 * cos((2x+1)u*pi/16);
#: forward DCT of block b is A @ b @ A.T, inverse is A.T @ X @ A.
_A = np.zeros((8, 8))
for _u in range(8):
    _c = np.sqrt(0.125) if _u == 0 else 0.5
    for _x in range(8):
        _A[_u, _x] = _c * np.cos((2 * _x + 1) * _u * np.pi / 16.0)
del _u, _c, _x


def _idct2(block):
    return _A.T @ block @ _A


def _dct2(block):
    return _A @ block @ _A.T


# -- Huffman ---------------------------------------------------------------

def _build_decode_table(bits, values):
    """Canonical Huffman (T.81 Annex C): map (length, code) -> symbol."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = values[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _build_encode_table(bits, values):
    """symbol -> (code, length) for the encoder."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00
    de-stuffing; RSTn markers are consumed by `restart()`."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.buf = 0
        self.nbits = 0

    def _fill(self):
        d = self.data
        if self.pos >= len(d):
            raise ValueError("JPEG entropy data truncated")
        b = d[self.pos]
        self.pos += 1
        if b == 0xFF:
            nxt = d[self.pos] if self.pos < len(d) else None
            if nxt == 0x00:
                self.pos += 1  # stuffed literal FF
            else:
                # a real marker inside entropy data (premature EOI /
                # unexpected RST): back up and fail the read
                self.pos -= 1
                raise ValueError("marker inside entropy-coded segment")
        # keep only the live (unconsumed) bits: without the mask, buf
        # grows by 8 bits per entropy byte for the whole scan and every
        # shift in read_bit costs O(stream size) — O(n²) overall.
        self.buf = ((self.buf << 8) | b) & ((1 << (self.nbits + 8)) - 1)
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.buf >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode_symbol(self, table) -> int:
        length = 0
        code = 0
        while length < 16:
            code = (code << 1) | self.read_bit()
            length += 1
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in JPEG stream")

    def restart(self):
        """Byte-align and consume an RSTn marker."""
        self.buf = 0
        self.nbits = 0
        d = self.data
        while self.pos + 1 < len(d) and d[self.pos] == 0xFF and d[self.pos + 1] == 0xFF:
            self.pos += 1  # fill bytes
        if not (
            self.pos + 1 < len(d)
            and d[self.pos] == 0xFF
            and 0xD0 <= d[self.pos + 1] <= 0xD7
        ):
            raise ValueError("expected restart marker")
        self.pos += 2


def _extend(value: int, size: int) -> int:
    """T.81 F.12 sign extension of a `size`-bit magnitude code."""
    if size == 0:
        return 0
    if value < (1 << (size - 1)):
        return value - (1 << size) + 1
    return value


# -- decoder ---------------------------------------------------------------

def decode_pixels(data: bytes):
    """Decode a baseline JPEG to an (h, w, 3) uint8 RGB array
    (grayscale replicated across channels).  Raises ValueError for
    malformed input and NotImplementedError for non-baseline modes;
    any residual parse error on adversarial bytes (short reads,
    bad offsets) is normalized to ValueError so the batch decode
    tier's fallback catch stays two exception classes wide."""
    try:
        return _decode_impl(data)
    except (IndexError, KeyError, OverflowError, struct.error) as exc:
        raise ValueError(f"malformed JPEG: {exc}") from exc


def _decode_impl(data: bytes):
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    quant: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None
    restart_interval = 0

    while True:
        if pos + 4 > len(data):
            raise ValueError("JPEG truncated before SOS")
        if data[pos] != 0xFF:
            raise ValueError("JPEG marker desync")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD8:  # stray SOI
            continue
        if marker == 0xD9:
            raise ValueError("JPEG EOI before SOS")
        if marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                      0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"non-baseline JPEG (SOF{marker - 0xC0}) unsupported"
            )
        (seglen,) = struct.unpack_from(">H", data, pos)
        if pos + seglen > len(data) or seglen < 2:
            raise ValueError("JPEG segment truncated")
        seg = data[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0x0F
                p += 1
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables unsupported")
                tbl = np.zeros(64, dtype=np.int64)
                tbl[ZIGZAG] = np.frombuffer(seg[p : p + 64], dtype=np.uint8)
                quant[tq] = tbl.reshape(8, 8)
                p += 64
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0x0F
                bits = list(seg[p + 1 : p + 17])
                n = sum(bits)
                values = list(seg[p + 17 : p + 17 + n])
                (huff_dc if tc == 0 else huff_ac)[th] = _build_decode_table(
                    bits, values
                )
                p += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            precision = seg[0]
            if precision != 8:
                raise NotImplementedError("12-bit JPEG unsupported")
            h, w = struct.unpack_from(">HH", seg, 1)
            # plausibility cap mirrors the PPM/PNG decoders: a header
            # alone must not be able to drive the per-component plane
            # allocation (ValueError routes to the fallback tier;
            # MemoryError would kill the whole mapInPandas task).
            if not (0 < h <= 1 << 14 and 0 < w <= 1 << 14):
                raise ValueError("implausible JPEG dimensions")
            ncomp = seg[5]
            if ncomp not in (1, 3):
                raise NotImplementedError(f"{ncomp}-component JPEG unsupported")
            comps = []
            for i in range(ncomp):
                cid = seg[6 + 3 * i]
                hv = seg[7 + 3 * i]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0x0F,
                     "tq": seg[8 + 3 * i]}
                )
            frame = {"h": h, "w": w, "comps": comps}
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            ns = seg[0]
            sel = {}
            for i in range(ns):
                cs = seg[1 + 2 * i]
                td_ta = seg[2 + 2 * i]
                sel[cs] = (td_ta >> 4, td_ta & 0x0F)
            pos += seglen
            return _decode_scan(
                data, pos, frame, sel, quant, huff_dc, huff_ac,
                restart_interval,
            )
        # APPn / COM / anything else: skip
        pos += seglen


def _decode_scan(data, pos, frame, sel, quant, huff_dc, huff_ac, dri):
    comps = frame["comps"]
    h, w = frame["h"], frame["w"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if hmax < 1 or vmax < 1 or hmax > 4 or vmax > 4:
        raise ValueError("invalid sampling factors")
    # per-component check too: a 0 nibble on a NON-max component passes
    # the max() checks above but divides by zero at the upsample step
    # (vmax // c['v']) — ZeroDivisionError would escape the decode
    # tier's (NotImplementedError, ValueError) fallback contract
    if any(c["h"] < 1 or c["v"] < 1 for c in comps):
        raise ValueError("zero component sampling factor")
    if set(sel) != {c["id"] for c in comps}:
        # a scan covering a component subset is a sequential
        # NON-interleaved multi-scan file — route to the fallback tier
        # via the decode contract instead of a KeyError below
        raise NotImplementedError(
            "multi-scan (non-interleaved) baseline JPEG unsupported"
        )
    if len(comps) == 1:
        # T.81 A.2: a single-component scan is NON-interleaved — the
        # MCU is ONE data unit and blocks cover the component's
        # full-resolution grid in raster order, whatever sampling
        # factors the SOF declares (libjpeg writes 2x2 luma for
        # grayscale).  Forcing 1x1 factors makes the generic
        # interleaved loop below coincide exactly with that layout;
        # restart intervals still count one data unit per MCU, as the
        # spec requires for non-interleaved scans.
        comps = [dict(comps[0], h=1, v=1)]
        hmax = vmax = 1
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))

    planes = []
    for c in comps:
        planes.append(
            np.zeros((mcus_y * c["v"] * 8, mcus_x * c["h"] * 8), dtype=np.float64)
        )

    reader = _BitReader(data, pos)
    preds = [0] * len(comps)
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if dri and mcu_count and mcu_count % dri == 0:
                reader.restart()
                preds = [0] * len(comps)
            for ci, c in enumerate(comps):
                td, ta = sel[c["id"]]
                q = quant.get(c["tq"])
                if q is None:
                    raise ValueError("JPEG references undefined quant table")
                dctab, actab = huff_dc.get(td), huff_ac.get(ta)
                if dctab is None or actab is None:
                    raise ValueError("JPEG references undefined Huffman table")
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        zz = np.zeros(64, dtype=np.int64)
                        t = reader.decode_symbol(dctab)
                        if t > 15:
                            raise ValueError("invalid JPEG DC magnitude")
                        diff = _extend(reader.read_bits(t), t)
                        preds[ci] += diff
                        zz[0] = preds[ci]
                        k = 1
                        while k < 64:
                            rs = reader.decode_symbol(actab)
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:  # ZRL
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("JPEG AC index overflow")
                            zz[k] = _extend(reader.read_bits(s), s)
                            k += 1
                        block = np.zeros(64, dtype=np.float64)
                        block[ZIGZAG] = zz
                        px = _idct2(block.reshape(8, 8) * q) + 128.0
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = px
            mcu_count += 1

    # upsample to full resolution and crop
    full = []
    for ci, c in enumerate(comps):
        p = planes[ci]
        p = np.repeat(np.repeat(p, vmax // c["v"], axis=0), hmax // c["h"], axis=1)
        full.append(p[:h, :w])

    if len(full) == 1:
        g = np.clip(np.rint(full[0]), 0, 255).astype(np.uint8)
        return np.stack([g, g, g], axis=2)
    y, cb, cr = full
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.rint(rgb), 0, 255).astype(np.uint8)


# -- encoder (fixture generation) ------------------------------------------

def _jfif_headers(h, w, ncomp, luma_hv):
    """SOI..SOS header bytes shared by the 4:4:4 and 4:2:0 encoders."""
    out = bytearray(b"\xff\xd8")
    out += (
        b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00"
        + struct.pack(">HHBB", 1, 1, 0, 0)
    )

    def dqt(tid, tbl):
        zz = tbl.reshape(64)[ZIGZAG]
        return (
            b"\xff\xdb" + struct.pack(">HB", 67, tid)
            + bytes(int(v) for v in zz)
        )

    out += dqt(0, STD_QUANT_LUMA.reshape(8, 8))
    if ncomp == 3:
        out += dqt(1, STD_QUANT_CHROMA.reshape(8, 8))

    sof = struct.pack(">HBHHB", 8 + 3 * ncomp, 8, h, w, ncomp)
    for i in range(ncomp):
        sof += bytes([i + 1, luma_hv if i == 0 else 0x11, 0 if i == 0 else 1])
    out += b"\xff\xc0" + sof

    def dht(tc, th, bits, values):
        payload = bytes([tc << 4 | th]) + bytes(bits) + bytes(values)
        return b"\xff\xc4" + struct.pack(">H", 2 + len(payload)) + payload

    out += dht(0, 0, *STD_DC_LUMA) + dht(1, 0, *STD_AC_LUMA)
    if ncomp == 3:
        out += dht(0, 1, *STD_DC_CHROMA) + dht(1, 1, *STD_AC_CHROMA)

    sos = struct.pack(">HB", 6 + 2 * ncomp, ncomp)
    for i in range(ncomp):
        sos += bytes([i + 1, 0x00 if i == 0 else 0x11])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + sos
    return out


def _quant_block(plane, y0, x0, qtab):
    block = plane[y0 : y0 + 8, x0 : x0 + 8] - 128.0
    q = np.rint(_dct2(block) / qtab).astype(np.int64)
    return q.reshape(64)[ZIGZAG]


def _encode_420(px) -> bytes:
    """4:2:0 three-component encode: 16x16 interleaved MCUs of four
    luma blocks + one 2x2-box-averaged block per chroma plane."""
    if px.ndim != 3:
        raise ValueError("4:2:0 encode requires an RGB image")
    h, w = px.shape[0], px.shape[1]
    r, g, b = px[:, :, 0], px[:, :, 1], px[:, :, 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b

    ph, pw = -(-h // 16) * 16, -(-w // 16) * 16
    planes = []
    for p in (y, cb, cr):
        pp = np.empty((ph, pw))
        pp[:h, :w] = p
        pp[h:, :w] = p[-1:, :]
        pp[:, w:] = pp[:, w - 1 : w]
        planes.append(pp)
    yf = planes[0]
    # 2x2 box average for the chroma planes
    sub = [
        p.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
        for p in planes[1:]
    ]

    ql = STD_QUANT_LUMA.reshape(8, 8)
    qc = STD_QUANT_CHROMA.reshape(8, 8)
    dc_enc = [_build_encode_table(*STD_DC_LUMA),
              _build_encode_table(*STD_DC_CHROMA)]
    ac_enc = [_build_encode_table(*STD_AC_LUMA),
              _build_encode_table(*STD_AC_CHROMA)]

    bw = _BitWriter()
    preds = [0, 0, 0]
    for my in range(ph // 16):
        for mx in range(pw // 16):
            for by in range(2):
                for bx in range(2):
                    zz = _quant_block(
                        yf, my * 16 + by * 8, mx * 16 + bx * 8, ql
                    )
                    preds[0] = _emit_block(bw, zz, preds[0], dc_enc[0], ac_enc[0])
            for ci, p in enumerate(sub):
                zz = _quant_block(p, my * 8, mx * 8, qc)
                preds[ci + 1] = _emit_block(
                    bw, zz, preds[ci + 1], dc_enc[1], ac_enc[1]
                )
    bw.flush()
    return bytes(_jfif_headers(h, w, 3, 0x22) + bw.out + b"\xff\xd9")


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)

    def flush(self):
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)


def _csize(v: int) -> int:
    return 0 if v == 0 else int(abs(v)).bit_length()


def _emit_block(bw, zz, pred, dc_tab, ac_tab):
    diff = int(zz[0]) - pred
    t = _csize(diff)
    code, length = dc_tab[t]
    bw.write(code, length)
    if t:
        bw.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
    run = 0
    last_nz = 0
    for k in range(63, 0, -1):
        if zz[k]:
            last_nz = k
            break
    for k in range(1, last_nz + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_tab[0xF0]
            bw.write(code, length)
            run -= 16
        s = _csize(v)
        code, length = ac_tab[(run << 4) | s]
        bw.write(code, length)
        bw.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz < 63:
        code, length = ac_tab[0x00]
        bw.write(code, length)
    return int(zz[0])


def encode_baseline(px, subsample: bool = False) -> bytes:
    """Encode an (h, w) grayscale or (h, w, 3) RGB uint8 array as a
    baseline JFIF JPEG with the Annex K tables — 4:4:4 by default,
    4:2:0 (2x2-box-averaged chroma, interleaved 16x16 MCUs) with
    subsample=True so fixtures exercise the decoder's upsampling path.
    Fixture-quality only (no rate tuning) — production encodes belong
    to a real codec library."""
    if subsample:
        return _encode_420(np.asarray(px, dtype=np.float64))
    px = np.asarray(px, dtype=np.float64)
    gray = px.ndim == 2
    h, w = px.shape[0], px.shape[1]
    if gray:
        planes = [px]
    else:
        r, g, b = px[:, :, 0], px[:, :, 1], px[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
        planes = [y, cb, cr]

    # pad to 8x8 multiples by edge replication
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    padded = []
    for p in planes:
        pp = np.empty((ph, pw))
        pp[:h, :w] = p
        pp[h:, :w] = p[-1:, :]
        pp[:, w:] = pp[:, w - 1 : w]
        padded.append(pp)

    qtabs = [STD_QUANT_LUMA.reshape(8, 8)]
    if not gray:
        qtabs.append(STD_QUANT_CHROMA.reshape(8, 8))

    dc_enc = [_build_encode_table(*STD_DC_LUMA)]
    ac_enc = [_build_encode_table(*STD_AC_LUMA)]
    if not gray:
        dc_enc.append(_build_encode_table(*STD_DC_CHROMA))
        ac_enc.append(_build_encode_table(*STD_AC_CHROMA))

    bw = _BitWriter()
    preds = [0] * len(planes)
    zz_flat = ZIGZAG
    for by in range(ph // 8):
        for bx in range(pw // 8):
            for ci, p in enumerate(padded):
                ti = 0 if ci == 0 else 1
                block = p[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0
                coef = _dct2(block)
                q = np.rint(coef / qtabs[ti]).astype(np.int64)
                zz = q.reshape(64)[zz_flat]
                preds[ci] = _emit_block(
                    bw, zz, preds[ci], dc_enc[ti], ac_enc[ti]
                )
    bw.flush()
    ncomp = 1 if gray else 3
    return bytes(_jfif_headers(h, w, ncomp, 0x11) + bw.out + b"\xff\xd9")
