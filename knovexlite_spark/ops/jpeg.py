"""Pure-stdlib/NumPy baseline JPEG codec (ITU-T T.81).

Closes the last compressed-image seam in the multimodal tier: with this
module the "builtin" decoder handles PGM, PNG and baseline sequential
JPEG with no third-party codec.  Scope:

- decode: baseline DCT sequential (SOF0), 8-bit precision, 1-component
  grayscale or 3-component YCbCr at ANY legal baseline sampling
  factors with full-resolution luma — 4:4:4, 4:2:0, 4:2:2, 4:4:0
  (round-6 ask #2: 4:2:0 is the shape of most crawl images).  The
  generic interleaved-MCU walk (T.81 A.2.3) decodes each component's
  Hi x Vi data units per MCU; because the contract is the LUMA plane
  (uint8 [h, w], the same grayscale-projection contract as the
  PNG/PGM decoders) and Y is full-resolution in all these layouts,
  the subsampled chroma units are entropy-decoded only to keep the
  stream in sync — no chroma IDCT, no upsampling code at all.
  Huffman tables are read from the stream (any legal DHT, not just
  Annex K), restart intervals (DRI/RSTn) are honored.
  Progressive (SOF2), arithmetic coding, subsampled LUMA (a component
  0 with non-maximal factors), 16-bit quant tables and 12-bit
  precision raise NotImplementedError loudly.
- encode (``jpeg_payload``): grayscale, RGB 4:4:4, or RGB 4:2:0
  (``subsampling="420"`` — 2x2 box-averaged chroma, the real-world
  layout, exercising the decoder's MCU interleave) baseline with the
  spec's Annex K example Huffman tables and an all-ones quantization
  table, so the only LUMA loss is FDCT coefficient rounding — a
  roundtrip is within a PROVABLE ±3 counts per pixel (bound derived
  in tests/test_jpeg.py; empirically 1-2 — pinned by tests; chroma
  subsampling does not touch the bound because Y is never
  subsampled), which lets the multimodal gate wrap real document
  bytes in a REAL JPEG and verdict-check the decode against the raw
  bytes.

The DCT is the exact orthonormal 8x8 DCT-II as a NumPy matrix product
(M @ B @ M.T), not a fast factorization — flops are irrelevant next to
the Python bit-I/O, and exactness keeps the roundtrip bound tight.

Reference parity: the reference engine delegates image decode to its
bundled codec library (SURVEY.md §2 multimodal row); this is the
Spark-executor-friendly, dependency-free equivalent.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------- tables

# zigzag scan order, generated (not transcribed) to avoid typo risk:
# walk diagonals of the 8x8 grid, alternating direction.
def _zigzag_order() -> np.ndarray:
    order = []
    for s in range(15):
        diag = [(i, s - i) for i in range(8) if 0 <= s - i < 8]
        if s % 2 == 0:
            diag.reverse()
        order.extend(diag)
    idx = np.empty(64, dtype=np.int64)
    for k, (r, c) in enumerate(order):
        idx[k] = r * 8 + c
    return idx


_ZIGZAG = _zigzag_order()  # zigzag position k -> raster index

# Annex K example Huffman tables (public ITU-T T.81 tables K.3-K.6):
# (bits[1..16] counts, symbol values in code order)
_DC_LUM_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUM_VALS = list(range(12))
_AC_LUM_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_LUM_VALS = [
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
    """Orthonormal 8-point DCT-II matrix: M[u, x] = c(u)/2 *
    cos((2x+1) u pi / 16), c(0)=1/sqrt(2) else 1."""
    u = np.arange(8)[:, None].astype(np.float64)
    x = np.arange(8)[None, :].astype(np.float64)
    m = 0.5 * np.cos((2 * x + 1) * u * np.pi / 16)
    m[0, :] *= 1 / np.sqrt(2)
    return m


_DCT = _dct_matrix()


def _canonical_codes(bits: list[int], vals: list[int]):
    """JPEG canonical Huffman assignment (T.81 C.2): symbols in `vals`
    order get consecutive codes per length.  Returns
    {(length, code): symbol} for decode and {symbol: (code, length)}
    for encode."""
    decode: dict[tuple[int, int], int] = {}
    encode: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            sym = vals[k]
            decode[(length, code)] = sym
            encode[sym] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return decode, encode


# ---------------------------------------------------------------- decode


class _BitReader:
    """MSB-first entropy-coded-segment reader with 0xFF00 unstuffing.
    Stops at any real marker (0xFF followed by non-zero, non-RST)."""

    def __init__(self, buf: bytes, pos: int):
        self.buf = buf
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        b = self.buf[self.pos]
        if b == 0xFF:
            nxt = self.buf[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:  # RSTn handled by caller via sync()
                raise _RestartMarker(nxt)
            else:
                raise ValueError(
                    f"marker 0xFF{nxt:02X} inside entropy-coded segment"
                )
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def sync_restart(self) -> None:
        """Byte-align and consume the RSTn marker we stopped at."""
        self.acc = 0
        self.nbits = 0
        assert self.buf[self.pos] == 0xFF and 0xD0 <= self.buf[self.pos + 1] <= 0xD7
        self.pos += 2


class _RestartMarker(Exception):
    def __init__(self, marker: int):
        self.marker = marker


def _huff_decode(br: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code (no match within 16 bits)")


def _extend(v: int, s: int) -> int:
    """T.81 F.2.2.1 EXTEND: map s received bits to a signed value."""
    return v if s == 0 or v >= (1 << (s - 1)) else v - (1 << s) + 1


def _decode_block(
    br: _BitReader,
    dc_tab: dict[tuple[int, int], int],
    ac_tab: dict[tuple[int, int], int],
    pred: int,
    quant: np.ndarray,
) -> tuple[np.ndarray, int]:
    zz = np.zeros(64, dtype=np.float64)
    s = _huff_decode(br, dc_tab)
    if s > 11:
        raise ValueError(f"DC category {s} out of range")
    diff = _extend(br.receive(s), s) if s else 0
    pred += diff
    zz[0] = pred
    k = 1
    while k < 64:
        rs = _huff_decode(br, ac_tab)
        r, size = rs >> 4, rs & 0x0F
        if size == 0:
            if r == 15:  # ZRL: 16 zeros
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise ValueError("AC run overflows block")
        zz[k] = _extend(br.receive(size), size)
        k += 1
    coef = np.zeros(64, dtype=np.float64)
    coef[_ZIGZAG] = zz * quant
    block = _DCT.T @ coef.reshape(8, 8) @ _DCT
    return block, pred


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Decode a baseline JPEG; returns the luma plane as uint8 [h, w].

    Grayscale returns the single component; YCbCr 4:4:4 returns Y
    (chroma components are entropy-decoded to keep the stream in sync
    but their IDCT output is discarded)."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    quant: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict[tuple[int, int], int]] = {}
    huff_ac: dict[int, dict[tuple[int, int], int]] = {}
    frame = None  # (h, w, [(comp_id, dc_sel, ac_sel, quant_sel)])
    restart_interval = 0
    n = len(payload)
    while pos < n:
        if payload[pos] != 0xFF:
            raise ValueError(f"expected marker at byte {pos}")
        # spec B.1.1.2: any number of 0xFF fill bytes may precede a marker
        while payload[pos + 1] == 0xFF:
            pos += 1
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue  # standalone markers
        (seglen,) = struct.unpack(">H", payload[pos : pos + 2])
        seg = payload[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0x0F
                if pq != 0:
                    raise NotImplementedError("16-bit quantization tables")
                quant[tq] = np.frombuffer(
                    seg[p + 1 : p + 65], dtype=np.uint8
                ).astype(np.float64)
                p += 65
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0x0F
                bits = list(seg[p + 1 : p + 17])
                nv = sum(bits)
                vals = list(seg[p + 17 : p + 17 + nv])
                table, _ = _canonical_codes(bits, vals)
                (huff_dc if tc == 0 else huff_ac)[th] = table
                p += 17 + nv
        elif marker == 0xC0:  # SOF0 baseline
            precision = seg[0]
            if precision != 8:
                raise NotImplementedError(f"{precision}-bit precision")
            h, w = struct.unpack(">HH", seg[1:5])
            ncomp = seg[5]
            comps = []
            for c in range(ncomp):
                cid, samp, tq = seg[6 + 3 * c : 9 + 3 * c]
                hi, vi = samp >> 4, samp & 0x0F
                if not (1 <= hi <= 4 and 1 <= vi <= 4):
                    raise ValueError(f"illegal sampling factors {hi}x{vi}")
                comps.append([cid, None, None, tq, hi, vi])
            if ncomp not in (1, 3):
                raise NotImplementedError(f"{ncomp}-component JPEG")
            # the luma-plane contract needs component 0 at FULL
            # resolution — true for 4:4:4 / 4:2:0 / 4:2:2 / 4:4:0
            # (chroma subsampled, Y maximal); a subsampled Y would
            # need upsampling, which is out of scope
            if any(c[4] > comps[0][4] or c[5] > comps[0][5] for c in comps):
                raise NotImplementedError(
                    "subsampled luma (component 0 has non-maximal "
                    "sampling factors)"
                )
            frame = (h, w, comps)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"non-baseline frame type SOF{marker & 0x0F} "
                "(progressive/arithmetic/lossless)"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF0")
            ns = seg[0]
            h, w, comps = frame
            sel = {c[0]: c for c in comps}
            order = []
            for c in range(ns):
                cid, tabs = seg[1 + 2 * c], seg[2 + 2 * c]
                sel[cid][1] = tabs >> 4
                sel[cid][2] = tabs & 0x0F
                order.append(sel[cid])
            if len(order) != len(comps):
                raise NotImplementedError("multi-scan (non-interleaved) JPEG")
            return _decode_scan(
                payload, pos + seglen, h, w, order,
                quant, huff_dc, huff_ac, restart_interval,
            )
        # APPn/COM and anything else: skip
        pos += seglen
    raise ValueError("no SOS marker found")


def _decode_scan(buf, pos, h, w, comps, quant, huff_dc, huff_ac, dri):
    """Generic interleaved-MCU scan walk (T.81 A.2.3): per MCU, each
    component contributes Hi x Vi data units in row-major order.  Only
    luma units are placed (chroma units are entropy-decoded purely for
    stream sync — their IDCT output is never needed under the
    luma-plane contract).  A single-component scan is by definition
    non-interleaved: MCU = one data unit and the declared sampling
    factors are ignored (T.81 A.2.2)."""
    if len(comps) == 1:
        hmax = vmax = 1
        grid = [(1, 1)]
    else:
        hmax = max(c[4] for c in comps)
        vmax = max(c[5] for c in comps)
        grid = [(c[4], c[5]) for c in comps]
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    luma = np.zeros((mcuy * vmax * 8, mcux * hmax * 8), dtype=np.float64)
    br = _BitReader(buf, pos)
    preds = [0] * len(comps)
    mcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if dri and mcu and mcu % dri == 0:
                br.sync_restart()
                preds = [0] * len(comps)
            for ci, (cid, dc_sel, ac_sel, tq, *_s) in enumerate(comps):
                hi, vi = grid[ci]
                for v in range(vi):
                    for hh in range(hi):
                        try:
                            block, preds[ci] = _decode_block(
                                br,
                                huff_dc[dc_sel],
                                huff_ac[ac_sel],
                                preds[ci],
                                quant[tq],
                            )
                        except _RestartMarker:
                            raise ValueError(
                                "restart marker mid-MCU (corrupt stream "
                                "or bad DRI)"
                            ) from None
                        if ci == 0:  # luma only; chroma decoded for sync
                            y0 = (my * vi + v) * 8
                            x0 = (mx * hi + hh) * 8
                            luma[y0 : y0 + 8, x0 : x0 + 8] = block
            mcu += 1
    out = np.clip(np.round(luma + 128.0), 0, 255).astype(np.uint8)
    return out[:h, :w]


# ---------------------------------------------------------------- encode


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-fill per spec


def _encode_block(bw_, coefs, pred, dc_enc, ac_enc):
    zz = coefs[_ZIGZAG]
    diff = int(zz[0]) - pred
    pred = int(zz[0])
    s = int(diff).bit_length() if diff != 0 else 0
    code, length = dc_enc[s]
    bw_.write(code, length)
    if s:
        bw_.write(diff if diff > 0 else diff + (1 << s) - 1, s)
    run = 0
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    for k in range(1, 64):
        v = int(zz[k])
        if k > last_nz:
            break
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_enc[0xF0]  # ZRL
            bw_.write(code, length)
            run -= 16
        s = abs(v).bit_length()
        code, length = ac_enc[(run << 4) | s]
        bw_.write(code, length)
        bw_.write(v if v > 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz < 63:
        code, length = ac_enc[0x00]  # EOB
        bw_.write(code, length)
    return pred


def _edge_tile(plane: np.ndarray, y0: int, x0: int) -> np.ndarray:
    """8x8 tile at (y0, x0), edge-replicated past the plane boundary
    (replication keeps boundary blocks smooth, so their FDCT stays
    within the roundtrip rounding bound)."""
    h, w = plane.shape
    ys = np.clip(np.arange(y0, y0 + 8), 0, h - 1)
    xs = np.clip(np.arange(x0, x0 + 8), 0, w - 1)
    return plane[np.ix_(ys, xs)]


def _box2(plane: np.ndarray) -> np.ndarray:
    """2x2 box-average downsample with edge replication for odd dims —
    the standard 4:2:0 chroma reduction."""
    if plane.shape[0] % 2:
        plane = np.vstack([plane, plane[-1:]])
    if plane.shape[1] % 2:
        plane = np.hstack([plane, plane[:, -1:]])
    return plane.reshape(
        plane.shape[0] // 2, 2, plane.shape[1] // 2, 2
    ).mean(axis=(1, 3))


def jpeg_payload(
    px: np.ndarray, restart_interval: int = 0, subsampling: str = "444"
) -> bytes:
    """Encode uint8 [h, w] (grayscale) or [h, w, 3] (RGB, written as
    YCbCr) as a baseline JPEG with unit quantization — near lossless
    on the LUMA plane: roundtrip error is FDCT rounding only (provably
    <= 3 counts, empirically 1-2 — tests/test_jpeg.py).

    ``subsampling``: "444" (every component full resolution) or "420"
    (color only — Y at 2x2 sampling factors, Cb/Cr 2x2-box-averaged to
    half resolution; the layout of most real crawl images, exercising
    the decoder's interleaved-MCU walk).  Y is never subsampled, so
    the luma roundtrip bound is identical in both modes.
    ``restart_interval`` > 0 emits a DRI segment and RSTn markers every
    that many MCUs (exercises the decoder's restart resync path)."""
    px = np.asarray(px)
    color = px.ndim == 3
    if color and px.shape[2] != 3:
        raise ValueError(f"expected [h,w] or [h,w,3], got {px.shape}")
    if subsampling not in ("444", "420"):
        raise ValueError(f"unknown subsampling {subsampling!r}")
    h, w = px.shape[:2]
    if color:
        r, g, b = (px[..., i].astype(np.float64) for i in range(3))
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
            0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
        ]
    else:
        planes = [px.astype(np.float64)]
    sub420 = color and subsampling == "420"
    if sub420:
        planes = [planes[0], _box2(planes[1]), _box2(planes[2])]
        samps = [(2, 2), (1, 1), (1, 1)]
    else:
        samps = [(1, 1)] * len(planes)

    out = bytearray(b"\xff\xd8")  # SOI
    # APP0/JFIF
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" + struct.pack(
        ">HHBB", 1, 1, 0, 0
    )
    # DQT: table 0, all ones (zigzag order of ones is ones)
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + b"\x01" * 64
    # SOF0
    ncomp = 3 if color else 1
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * ncomp, 8, h, w, ncomp)
    for cid in range(1, ncomp + 1):
        hi, vi = samps[cid - 1]
        out += struct.pack("BBB", cid, (hi << 4) | vi, 0)
    # DHT: Annex K luminance DC + AC (used for every component)
    for tc_th, bits, vals in (
        (0x00, _DC_LUM_BITS, _DC_LUM_VALS),
        (0x10, _AC_LUM_BITS, _AC_LUM_VALS),
    ):
        out += b"\xff\xc4" + struct.pack(">HB", 3 + 16 + len(vals), tc_th)
        out += bytes(bits) + bytes(vals)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    # SOS
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * ncomp, ncomp)
    for cid in range(1, ncomp + 1):
        out += struct.pack("BB", cid, 0x00)
    out += b"\x00\x3f\x00"  # Ss=0 Se=63 AhAl=0

    _, dc_enc = _canonical_codes(_DC_LUM_BITS, _DC_LUM_VALS)
    _, ac_enc = _canonical_codes(_AC_LUM_BITS, _AC_LUM_VALS)
    hmax = max(s[0] for s in samps)
    vmax = max(s[1] for s in samps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    writer = _BitWriter()
    preds = [0] * ncomp
    mcu = 0
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu and mcu % restart_interval == 0:
                writer.flush()
                writer.out += bytes([0xFF, 0xD0 + (rst % 8)])
                rst += 1
                preds = [0] * ncomp
            mcu += 1
            for ci, plane in enumerate(planes):
                hi, vi = samps[ci]
                for v in range(vi):
                    for hh in range(hi):
                        blk = _edge_tile(plane, (my * vi + v) * 8, (mx * hi + hh) * 8)
                        coefs = np.round(_DCT @ (blk - 128.0) @ _DCT.T).astype(np.int64)
                        preds[ci] = _encode_block(
                            writer, coefs.ravel(), preds[ci], dc_enc, ac_enc
                        )
    writer.flush()
    out += writer.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)
