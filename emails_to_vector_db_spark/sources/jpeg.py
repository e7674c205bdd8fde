"""Baseline JPEG (SOF0) codec, stdlib + numpy only — closes the last
stubbed codec in the media lane (sources/multimodal.py::decode_image
previously raised NotImplementedError for entropy-coded images).

Decoder: a REAL baseline-sequential JPEG decoder — marker walk, DQT /
SOF0 / DHT / SOS parsing, canonical Huffman tables rebuilt from the
stream's own DHT segments (so it decodes any 4:4:4 baseline file, not
just this encoder's output), byte-destuffed entropy decode, dequantize,
inverse zigzag, orthonormal 8×8 IDCT, YCbCr→RGB. Progressive (SOF2),
subsampled, or restart-interval streams raise loudly rather than
mis-decode.

Encoder: valid baseline 4:4:4 JPEG used as the decoder's adversarial
test harness (the PNG-codec pattern, multimodal.py:153): Annex-K
quantization tables, but UNIFORM-LENGTH canonical Huffman tables (4-bit
DC / 8-bit AC codes over the full symbol alphabets — Kraft-valid, so
the file is spec-conformant; compression is deliberately traded for a
typo-proof table definition). Everything here is public JPEG/JFIF spec
(ITU T.81) knowledge.
"""

from __future__ import annotations

import struct

import numpy as np

# Annex K.1/K.2 quantization tables (row-major 8×8)
QUANT_LUMA = np.array(
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
    dtype=np.float64,
)
QUANT_CHROMA = np.array(
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
    dtype=np.float64,
)


def _zigzag() -> np.ndarray:
    """The 64-entry zigzag scan as flat indices into a row-major 8×8
    block, generated (antidiagonal walk) instead of transcribed."""
    order = []
    for s in range(15):
        if s % 2 == 0:  # even antidiagonal: row decreasing
            rows = range(min(s, 7), max(0, s - 7) - 1, -1)
        else:  # odd: row increasing
            rows = range(max(0, s - 7), min(s, 7) + 1)
        for r in rows:
            c = s - r
            order.append(r * 8 + c)
    return np.array(order, dtype=np.int64)


ZIGZAG = _zigzag()
UNZIGZAG = np.argsort(ZIGZAG)


def _dct_matrix() -> np.ndarray:
    c = np.zeros((8, 8))
    for i in range(8):
        for j in range(8):
            c[i, j] = (1 / np.sqrt(8) if i == 0 else 0.5) * np.cos(
                (2 * j + 1) * i * np.pi / 16
            )
    return c


_C = _dct_matrix()

# Encoder Huffman alphabets: DC size symbols 0..11 at 4 bits each
# (12·2⁻⁴ = 0.75 ≤ 1), AC symbols EOB/ZRL/(run,size) at 8 bits each
# (162·2⁻⁸ ≈ 0.63 ≤ 1). Canonical codes assigned in listed order.
_DC_SYMBOLS = list(range(12))
_AC_SYMBOLS = sorted(
    [0x00, 0xF0]
    + [(r << 4) | s for r in range(16) for s in range(1, 11)]
)
_DC_BITS = [0] * 16
_DC_BITS[3] = 12  # all DC codes 4 bits long (index 3 = length 4)
_AC_BITS = [0] * 16
_AC_BITS[7] = 162  # all AC codes 8 bits long


def _canonical_codes(bits: list[int], symbols: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per the T.81 canonical construction."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[symbols[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


_DC_CODES = _canonical_codes(_DC_BITS, _DC_SYMBOLS)
_AC_CODES = _canonical_codes(_AC_BITS, _AC_SYMBOLS)


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            byte = (self.acc >> (self.n - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:
                self.buf.append(0x00)  # byte stuffing
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self) -> bytes:
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)  # pad with 1s per spec
        return bytes(self.buf)


def _magnitude(v: int) -> tuple[int, int]:
    """(size, bits) with the one's-complement negative convention."""
    if v == 0:
        return 0, 0
    size = int(v).bit_length() if v > 0 else int(-v).bit_length()
    bits = v if v > 0 else v + (1 << size) - 1
    return size, bits


def _rgb_to_ycbcr(img: np.ndarray) -> np.ndarray:
    r, g, b = (img[..., i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    return np.clip(
        np.round(np.stack([y, cb, cr], axis=-1)), 0, 255
    )


def _ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y, cb, cr = (ycc[..., i] for i in range(3))
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(
        np.round(np.stack([r, g, b], axis=-1)), 0, 255
    ).astype(np.uint8)


def encode_jpeg(img: np.ndarray) -> bytes:
    """HxWx3 uint8 RGB → baseline 4:4:4 JFIF-style JPEG."""
    assert img.ndim == 3 and img.shape[2] == 3 and img.dtype == np.uint8
    h, w, _ = img.shape
    ycc = _rgb_to_ycbcr(img)
    # edge-replicate pad to 8x8 multiples
    ph, pw = -h % 8, -w % 8
    ycc = np.pad(ycc, ((0, ph), (0, pw), (0, 0)), mode="edge")

    out2 = bytearray(b"\xff\xd8")  # SOI
    # DQT: marker, length(67), PqTq byte, 64 bytes in zigzag order
    for tq, q in ((0, QUANT_LUMA), (1, QUANT_CHROMA)):
        zz = q.reshape(-1)[ZIGZAG].astype(np.uint8).tobytes()
        out2 += b"\xff\xdb" + struct.pack(">HB", 67, tq) + zz
    # SOF0: baseline, 3 components, 1x1 sampling (4:4:4)
    out2 += b"\xff\xc0" + struct.pack(">HBHHB", 17, 8, h, w, 3)
    for cid, tq in ((1, 0), (2, 1), (3, 1)):
        out2 += struct.pack(">BBB", cid, 0x11, tq)
    # DHT: DC table 0, AC table 0 (shared by all components)
    for tcth, bits, syms in (
        (0x00, _DC_BITS, _DC_SYMBOLS),
        (0x10, _AC_BITS, _AC_SYMBOLS),
    ):
        out2 += b"\xff\xc4" + struct.pack(
            ">HB", 2 + 1 + 16 + len(syms), tcth
        )
        out2 += bytes(bits) + bytes(syms)
    # SOS
    out2 += b"\xff\xda" + struct.pack(">HB", 6 + 2 * 3, 3)
    for cid in (1, 2, 3):
        out2 += struct.pack(">BB", cid, 0x00)
    out2 += struct.pack(">BBB", 0, 63, 0)

    bw = _BitWriter()
    quants = (QUANT_LUMA, QUANT_CHROMA, QUANT_CHROMA)
    dc_pred = [0, 0, 0]
    hh, ww = ycc.shape[0], ycc.shape[1]
    for by in range(0, hh, 8):
        for bx in range(0, ww, 8):
            for comp in range(3):
                block = ycc[by : by + 8, bx : bx + 8, comp] - 128.0
                coef = _C @ block @ _C.T
                q = np.round(coef / quants[comp]).astype(np.int64)
                zz = q.reshape(-1)[ZIGZAG]
                diff = int(zz[0]) - dc_pred[comp]
                dc_pred[comp] = int(zz[0])
                size, bits_v = _magnitude(diff)
                code, length = _DC_CODES[size]
                bw.write(code, length)
                if size:
                    bw.write(bits_v, size)
                run = 0
                last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
                for k in range(1, 64):
                    v = int(zz[k])
                    if v == 0:
                        if k > last_nz:
                            code, length = _AC_CODES[0x00]  # EOB
                            bw.write(code, length)
                            break
                        run += 1
                        if run == 16:
                            code, length = _AC_CODES[0xF0]  # ZRL
                            bw.write(code, length)
                            run = 0
                        continue
                    size, bits_v = _magnitude(v)
                    code, length = _AC_CODES[(run << 4) | size]
                    bw.write(code, length)
                    bw.write(bits_v, size)
                    run = 0
    out2 += bw.flush()
    out2 += b"\xff\xd9"  # EOI
    return bytes(out2)


class _BitReader:
    """Entropy-segment bit reader with 0xFF00 destuffing."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def _fill(self) -> None:
        if self.pos >= len(self.data):
            raise ValueError("truncated JPEG entropy stream")
        b = self.data[self.pos]
        if b == 0xFF:
            if self.pos + 1 >= len(self.data):
                raise ValueError("truncated JPEG entropy stream")
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif nxt == 0xD9:  # EOI — pad with 1s (spec-legal tail)
                self.acc = (self.acc << 8) | 0xFF
                self.n += 8
                return
            else:
                raise ValueError(
                    f"unexpected marker 0xFF{nxt:02X} in entropy data "
                    "(restart intervals unsupported)"
                )
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.n += 8

    def bits(self, k: int) -> int:
        while self.n < k:
            self._fill()
        v = (self.acc >> (self.n - k)) & ((1 << k) - 1)
        self.n -= k
        return v

    def bit(self) -> int:
        return self.bits(1)


def _decode_table(bits: bytes, syms: bytes) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol from a DHT segment's canonical spec."""
    out: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[(length, code)] = syms[k]
            code += 1
            k += 1
        code <<= 1
    return out


def _read_symbol(br: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in entropy stream")


def _extend(bits_v: int, size: int) -> int:
    if size == 0:
        return 0
    if bits_v < (1 << (size - 1)):
        return bits_v - (1 << size) + 1
    return bits_v


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline 4:4:4 JPEG → HxWx3 uint8 RGB."""
    if not payload.startswith(b"\xff\xd8"):
        raise ValueError("not a JPEG payload")
    pos = 2
    quant: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    h = w = None
    comps: list[tuple[int, int]] = []  # (component id, quant table id)
    scan_tables: list[tuple[int, int]] = []
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"marker expected at {pos}")
        # T.81 B.1.1.2: markers may be preceded by any number of 0xFF
        # fill bytes — skip the run so the marker id is the first
        # non-0xFF byte.
        while pos + 1 < len(payload) and payload[pos + 1] == 0xFF:
            pos += 1
        marker = payload[pos + 1]
        if marker == 0xD9:
            break
        (seglen,) = struct.unpack_from(">H", payload, pos + 2)
        seg = payload[pos + 4 : pos + 2 + seglen]
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                tbl = np.zeros(64)
                tbl[ZIGZAG] = np.frombuffer(seg, np.uint8, 64, p + 1)
                quant[tq] = tbl.reshape(8, 8)
                p += 65
        elif marker == 0xC0:  # SOF0 baseline
            _, h, w, nc = struct.unpack_from(">BHHB", seg, 0)
            if nc != 3:
                raise ValueError("only 3-component JPEG supported")
            for i in range(nc):
                cid, samp, tq = struct.unpack_from(
                    ">BBB", seg, 6 + 3 * i
                )
                if samp != 0x11:
                    raise ValueError(
                        "chroma subsampling unsupported (4:4:4 only)"
                    )
                comps.append((cid, tq))
        elif marker in (0xC1, 0xC2, 0xC3):
            raise ValueError("only baseline sequential (SOF0) supported")
        elif marker == 0xC4:  # DHT (possibly several tables)
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0x0F
                bits = seg[p + 1 : p + 17]
                n = sum(bits)
                syms = seg[p + 17 : p + 17 + n]
                tbl = _decode_table(bits, syms)
                (huff_dc if tc == 0 else huff_ac)[th] = tbl
                p += 17 + n
        elif marker == 0xDD:
            raise ValueError("restart intervals unsupported")
        elif marker == 0xDA:  # SOS — entropy data follows
            ns = seg[0]
            for i in range(ns):
                _cid, tt = seg[1 + 2 * i], seg[2 + 2 * i]
                scan_tables.append((tt >> 4, tt & 0x0F))
            pos = pos + 2 + seglen
            break
        pos += 2 + seglen
    if h is None or not scan_tables:
        raise ValueError("JPEG missing SOF0/SOS")

    br = _BitReader(payload, pos)
    bh, bw_ = (h + 7) // 8, (w + 7) // 8
    planes = np.zeros((3, bh * 8, bw_ * 8))
    dc_pred = [0, 0, 0]
    for by in range(bh):
        for bx in range(bw_):
            for ci, (cid, tq) in enumerate(comps):
                dct_t, act_t = scan_tables[ci]
                zz = np.zeros(64, dtype=np.int64)
                size = _read_symbol(br, huff_dc[dct_t])
                diff = _extend(br.bits(size), size) if size else 0
                dc_pred[ci] += diff
                zz[0] = dc_pred[ci]
                k = 1
                while k < 64:
                    sym = _read_symbol(br, huff_ac[act_t])
                    if sym == 0x00:  # EOB
                        break
                    if sym == 0xF0:  # ZRL
                        k += 16
                        continue
                    run, size = sym >> 4, sym & 0x0F
                    k += run
                    if k > 63:
                        raise ValueError("AC run overflows block")
                    zz[k] = _extend(br.bits(size), size)
                    k += 1
                coef = (zz[UNZIGZAG].reshape(8, 8)) * quant[tq]
                block = _C.T @ coef @ _C + 128.0
                planes[
                    ci, by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8
                ] = block
    ycc = np.stack(
        [planes[0][:h, :w], planes[1][:h, :w], planes[2][:h, :w]], axis=-1
    )
    return _ycbcr_to_rgb(np.clip(ycc, 0, 255))
