"""Pure-stdlib/NumPy baseline JPEG codec (ITU-T T.81).

Closes the last compressed-image seam in the multimodal tier: with this
module the "builtin" decoder handles PGM, PNG and baseline sequential
JPEG with no third-party codec.  Scope:

- decode: baseline DCT sequential (SOF0), EXTENDED sequential (SOF1,
  8- or 12-bit precision with 16-bit quant tables — round-8 ask #3)
  AND progressive (SOF2, round-7 ask #2 — most large crawl JPEGs);
  1-component grayscale, 3-component YCbCr, or 4-COMPONENT Adobe
  CMYK/YCCK (APP14 transform 0/2, the print-pipeline/scanned-document
  slice of crawl imagery — stored samples follow the Photoshop
  inverted convention and composite to RGB as R = C'·K'/255, then the
  standard luma/YCbCr contracts apply); sampling at ANY legal factors
  with full-resolution luma — 4:4:4, 4:2:0, 4:2:2, 4:4:0
  (4:2:0 is the shape of most crawl images).  The generic
  interleaved-MCU walk (T.81 A.2.3) decodes each component's Hi x Vi
  data units per MCU; the default contract is the LUMA plane (uint8
  [h, w], the same grayscale-projection contract as the PNG/PGM
  decoders).  ``luma_only=False`` (baseline color only) additionally
  dequantizes + IDCTs the already-entropy-decoded chroma blocks and
  returns full-resolution YCbCr [h, w, 3] (chroma nearest-upsampled),
  feeding the color-statistics features (round-7 ask #5).
  Progressive decode (T.81 Annex G): DC scans (interleaved or
  single-component) and LUMA AC scans are decoded through both
  spectral selection and successive approximation (first + refinement
  passes, EOB-run batching); CHROMA AC scans — each a single-
  component scan whose entropy segment is delimited by the next
  marker — are skipped wholesale without entropy decoding, so the
  luma contract pays zero chroma cost.
  Huffman tables are read from the stream (any legal DHT, not just
  Annex K), restart intervals (DRI/RSTn) are honored.  HIERARCHICAL
  (DHP) sequences decode in grayscale AND 3-component YCbCr (round 8):
  a non-differential base frame, EXP reference expansions with the
  J.1 (a+b+1)>>1 filter, and SOF5 differential frames added onto the
  per-component references (DC prediction 0 per block in differential
  frames; interleaved one block per component per MCU).
  Hierarchical sequences decode 1- OR 3-component (YCbCr) frames
  (round 8), all components 1x1, per-component references.
  Arithmetic coding, differential modes beyond SOF5, subsampled
  hierarchical components, subsampled LUMA (a component 0 with
  non-maximal factors), 4-component frames WITHOUT an APP14 marker
  (channel semantics undefined) and progressive 4-component/12-bit
  raise NotImplementedError loudly.
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
    max_dc: int = 11,
) -> tuple[np.ndarray, int]:
    zz = np.zeros(64, dtype=np.float64)
    s = _huff_decode(br, dc_tab)
    if s > max_dc:  # 11 for 8-bit; 15 for 12-bit extended (T.81 F.1.2.1.2)
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


def _next_marker(buf: bytes, p: int) -> int:
    """First position >= p of a REAL marker (0xFF followed by anything
    but 0x00 stuffing or RSTn) — entropy-coded segments contain no
    other 0xFF pairs, so this delimits a scan without decoding it."""
    n = len(buf)
    while p < n - 1:
        if buf[p] == 0xFF and buf[p + 1] != 0x00 and not (
            0xD0 <= buf[p + 1] <= 0xD7
        ):
            return p
        p += 1
    return n


def decode_jpeg(payload: bytes, luma_only: bool = True) -> np.ndarray:
    """Decode a baseline (SOF0) or progressive (SOF2) JPEG.

    ``luma_only=True`` (default): returns the luma plane as uint8
    [h, w] — grayscale returns the single component; color returns Y
    (baseline chroma is entropy-decoded only for stream sync;
    progressive chroma AC scans are skipped without decoding at all).
    ``luma_only=False`` (baseline only): returns full-resolution YCbCr
    uint8 [h, w, 3] — the already-entropy-decoded chroma blocks are
    dequantized + IDCT'd and nearest-upsampled to full resolution
    (grayscale returns neutral chroma = 128)."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    quant: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict[tuple[int, int], int]] = {}
    huff_ac: dict[int, dict[tuple[int, int], int]] = {}
    frame = None  # (h, w, [(comp_id, dc_sel, ac_sel, quant_sel, hi, vi)])
    progressive = False
    prog = None  # _ProgressiveState
    lossless = 0  # SOF3 precision when set
    restart_interval = 0
    sample_precision = 8  # SOF precision (8 baseline, 12 via SOF1)
    adobe_transform = None  # APP14 color transform (0 CMYK/1 YCbCr/2 YCCK)
    hierarchical = False  # DHP seen: frames accumulate into hier_ref
    differential = False  # current frame is SOF5 (differential sequential)
    hier_ref = None  # uint8 reference plane across hierarchical frames
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
                if pq == 0:
                    quant[tq] = np.frombuffer(
                        seg[p + 1 : p + 65], dtype=np.uint8
                    ).astype(np.float64)
                    p += 65
                else:  # pq=1: 16-bit big-endian entries (12-bit frames)
                    quant[tq] = np.frombuffer(
                        seg[p + 1 : p + 129], dtype=">u2"
                    ).astype(np.float64)
                    p += 129
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
        elif marker in (0xC0, 0xC1, 0xC2):
            # SOF0 baseline / SOF1 extended sequential / SOF2 progressive
            progressive = marker == 0xC2
            precision = seg[0]
            if marker == 0xC1:
                # extended sequential (Huffman): same scan structure as
                # baseline, 8- or 12-bit samples (T.81 table B.2)
                if precision not in (8, 12):
                    raise NotImplementedError(
                        f"{precision}-bit extended-sequential precision "
                        "(8/12 supported)"
                    )
            elif precision != 8:
                raise NotImplementedError(
                    f"{precision}-bit precision (baseline/progressive are "
                    "8-bit by spec; 12-bit arrives as SOF1)"
                )
            sample_precision = precision
            h, w = struct.unpack(">HH", seg[1:5])
            ncomp = seg[5]
            comps = []
            for c in range(ncomp):
                cid, samp, tq = seg[6 + 3 * c : 9 + 3 * c]
                hi, vi = samp >> 4, samp & 0x0F
                if not (1 <= hi <= 4 and 1 <= vi <= 4):
                    raise ValueError(f"illegal sampling factors {hi}x{vi}")
                comps.append([cid, None, None, tq, hi, vi])
            if ncomp not in (1, 3, 4):
                raise NotImplementedError(f"{ncomp}-component JPEG")
            if ncomp == 4 and progressive:
                raise NotImplementedError("progressive 4-component JPEG")
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
            if progressive:
                if not luma_only:
                    raise NotImplementedError(
                        "luma_only=False on progressive JPEG (chroma AC "
                        "scans are skipped by design; use baseline for "
                        "color statistics)"
                    )
                prog = _ProgressiveState(h, w, comps)
        elif marker == 0xEE:  # APP14 (Adobe color-transform marker)
            if seg[:5] == b"Adobe" and len(seg) >= 12:
                adobe_transform = seg[11]
        elif marker == 0xC3:  # SOF3 lossless sequential (Huffman)
            precision = seg[0]
            if not (2 <= precision <= 16):
                raise NotImplementedError(
                    f"{precision}-bit lossless precision (T.81 allows 2-16)"
                )
            sample_precision = precision
            h, w = struct.unpack(">HH", seg[1:5])
            ncomp = seg[5]
            if ncomp not in (1, 3):
                raise NotImplementedError(
                    f"{ncomp}-component lossless JPEG"
                )
            comps = []
            for c in range(ncomp):
                cid, samp, tq = seg[6 + 3 * c : 9 + 3 * c]
                if samp != 0x11:
                    raise NotImplementedError(
                        "subsampled lossless components (1x1 only)"
                    )
                comps.append([cid, None, None, tq, 1, 1])
            frame = (h, w, comps)
            lossless = precision
        elif marker == 0xDE:  # DHP — hierarchical progression header
            h, w = struct.unpack(">HH", seg[1:5])
            if seg[5] not in (1, 3):
                raise NotImplementedError(
                    f"{seg[5]}-component hierarchical JPEG (grayscale or "
                    "YCbCr)"
                )
            hierarchical = True
        elif marker == 0xDF:  # EXP — expand the references by 2 per axis
            if hier_ref is None:
                raise ValueError("EXP before any hierarchical frame")
            ehv = seg[0]
            for cid in list(hier_ref):
                p = hier_ref[cid]
                if ehv >> 4:
                    p = _hier_upsample(p, axis=1)
                if ehv & 0x0F:
                    p = _hier_upsample(p, axis=0)
                hier_ref[cid] = p
        elif marker == 0xC5:  # SOF5 — differential sequential DCT
            if not hierarchical:
                raise NotImplementedError(
                    "differential frame (SOF5) outside a hierarchical "
                    "(DHP) sequence"
                )
            if seg[0] != 8 or seg[5] not in (1, 3):
                raise NotImplementedError(
                    "hierarchical frames support 8-bit 1/3-component only"
                )
            h, w = struct.unpack(">HH", seg[1:5])
            comps = []
            for c in range(seg[5]):
                cid, samp, tq = seg[6 + 3 * c : 9 + 3 * c]
                if samp != 0x11:
                    raise NotImplementedError(
                        "subsampled components in hierarchical frames"
                    )
                comps.append([cid, None, None, tq, 1, 1])
            frame = (h, w, comps)
            differential = True
        elif marker in (0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            # DESCOPE (round 10, measured decision not open TODO):
            # arithmetic-coded frames (SOF9-SOFF) are a deliberate
            # non-goal for a crawl-corpus decoder.  Prevalence in real
            # web data is effectively zero, for structural reasons all
            # on the public record: (a) the QM-coder was patent-
            # encumbered (IBM/Mitsubishi/Lucent) until the 2010s, so
            # (b) libjpeg — the encoder behind virtually every
            # web-facing JPEG pipeline — shipped without arithmetic
            # support until v8 (2010) and has never emitted it by
            # default, and (c) no mainstream browser (Chromium,
            # Firefox, WebKit — all libjpeg-turbo-based) decodes it,
            # so content authors cannot ship it and crawls cannot
            # accumulate it: a format no browser renders self-selects
            # out of the web.  Common Crawl's own mime/format tables
            # list image/jpeg with no arithmetic subtype breakdown for
            # the same reason.  The remaining differential
            # non-hierarchical modes (SOF5-SOF7 outside a DHP
            # sequence) are spec corners with no known encoder in the
            # wild.  The raise below is the loud, test-pinned seam;
            # revisit only if a measured crawl sample ever surfaces
            # nonzero SOF9+ counts.
            raise NotImplementedError(
                f"non-baseline frame type SOF{marker & 0x0F} "
                "(arithmetic, or a differential mode beyond SOF5) — "
                "descoped; see the prevalence note above this raise"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            h, w, comps = frame
            sel = {c[0]: c for c in comps}
            order = []
            for c in range(ns):
                cid, tabs = seg[1 + 2 * c], seg[2 + 2 * c]
                sel[cid][1] = tabs >> 4
                sel[cid][2] = tabs & 0x0F
                order.append(sel[cid])
            if hierarchical:
                if restart_interval:
                    raise NotImplementedError(
                        "restart intervals in hierarchical scans"
                    )
                if len(order) not in (1, 3) or lossless or progressive:
                    raise NotImplementedError(
                        "hierarchical frames support sequential 1/3-"
                        "component scans only"
                    )
                # the SOF5 parser enforces 1x1, but a NON-differential
                # SOF0/SOF1 base frame inside a DHP sequence takes the
                # generic parse path above, which admits subsampling —
                # _decode_scan_hier assumes one data unit per component
                # per MCU, so a subsampled base frame must raise here,
                # not desync the entropy read into silent garbage
                if any(c[4] != 1 or c[5] != 1 for c in comps):
                    raise NotImplementedError(
                        "subsampled components in hierarchical frames"
                    )
                hier_ref = _decode_scan_hier(
                    payload, pos + seglen, h, w, order, quant,
                    huff_dc, huff_ac, differential, hier_ref,
                )
                differential = False
                pos = _next_marker(payload, pos + seglen)
                continue
            if lossless:
                ss, se, ahal = seg[1 + 2 * ns : 4 + 2 * ns]
                if restart_interval:
                    raise NotImplementedError(
                        "restart intervals in lossless scans"
                    )
                planes = _decode_lossless_scan(
                    payload, pos + seglen, h, w, order,
                    huff_dc, ss, ahal & 0x0F, lossless,
                )
                if len(planes) == 1:
                    luma = planes[0]
                    if luma_only:
                        return luma
                    chroma = np.full((h, w), 128, dtype=np.uint8)
                    return np.stack([luma, chroma, chroma], axis=-1)
                # 3-component lossless carries RGB (no YCbCr transform
                # in the lossless process): convert so the decoder's
                # contracts stay uniform — luma_only returns the ITU-R
                # 601 projection, luma_only=False returns YCbCr like
                # every other color path
                r_, g_, b_ = (p.astype(np.float64) for p in planes)
                y_ = 0.299 * r_ + 0.587 * g_ + 0.114 * b_
                if luma_only:
                    return np.clip(np.round(y_), 0, 255).astype(np.uint8)
                cb = -0.168736 * r_ - 0.331264 * g_ + 0.5 * b_ + 128.0
                cr = 0.5 * r_ - 0.418688 * g_ - 0.081312 * b_ + 128.0
                return np.stack(
                    [
                        np.clip(np.round(p), 0, 255).astype(np.uint8)
                        for p in (y_, cb, cr)
                    ],
                    axis=-1,
                )
            if progressive:
                ss, se, ahal = seg[1 + 2 * ns : 4 + 2 * ns]
                pos = prog.decode_scan(
                    payload, pos + seglen, order, ss, se,
                    ahal >> 4, ahal & 0x0F, huff_dc, huff_ac,
                    restart_interval,
                )
                continue
            if len(order) != len(comps):
                raise NotImplementedError(
                    "multi-scan (non-interleaved) sequential JPEG"
                )
            if len(comps) == 4:
                if adobe_transform is None:
                    raise NotImplementedError(
                        "4-component JPEG without an Adobe APP14 marker "
                        "(channel semantics unknown — bare CMYK vs YCCK)"
                    )
                if adobe_transform not in (0, 2):
                    raise ValueError(
                        f"APP14 transform {adobe_transform} is illegal for "
                        "4 components (0=CMYK or 2=YCCK)"
                    )
            return _decode_scan(
                payload, pos + seglen, h, w, order,
                quant, huff_dc, huff_ac, restart_interval, luma_only,
                sample_precision, adobe_transform,
            )
        # APPn/COM and anything else: skip
        pos += seglen
    if hier_ref is not None:
        cids = sorted(hier_ref)
        luma = hier_ref[cids[0]]
        if luma_only:
            return luma
        if len(cids) == 1:
            chroma = np.full(luma.shape, 128, dtype=np.uint8)
            return np.stack([luma, chroma, chroma], axis=-1)
        return np.stack([hier_ref[c] for c in cids[:3]], axis=-1)
    if prog is not None:
        return prog.reconstruct(quant)
    raise ValueError("no SOS marker found")


def _decode_scan(buf, pos, h, w, comps, quant, huff_dc, huff_ac, dri,
                 luma_only=True, precision=8, adobe=None):
    """Generic interleaved-MCU scan walk (T.81 A.2.3): per MCU, each
    component contributes Hi x Vi data units in row-major order.  With
    ``luma_only`` (default) only luma units are placed (chroma units
    are entropy-decoded purely for stream sync — their IDCT output is
    never needed under the luma-plane contract); ``luma_only=False``
    also places the chroma blocks into their subsampled planes and
    nearest-upsamples them to full resolution, returning YCbCr
    [h, w, 3].  A single-component scan is by definition
    non-interleaved: MCU = one data unit and the declared sampling
    factors are ignored (T.81 A.2.2).

    ``precision`` 12 (SOF1): level shift 2048, clip to 0..4095, then
    scale to the uint8 contract via >> 4 (exactly representable, no
    rescale rounding).  4-COMPONENT frames (Adobe CMYK/YCCK — APP14
    ``adobe`` transform 0 or 2) always decode every component: the
    stored samples follow the Photoshop convention (255 = no ink,
    i.e. inverted CMYK); YCCK first inverts the YCbCr transform on
    the first three channels, then both forms composite to RGB as
    R = C'·K'/255 (ink-free fraction times black-free fraction) and
    the standard contracts apply to that RGB."""
    if len(comps) == 1:
        hmax = vmax = 1
        grid = [(1, 1)]
    else:
        hmax = max(c[4] for c in comps)
        vmax = max(c[5] for c in comps)
        grid = [(c[4], c[5]) for c in comps]
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    planes = [
        np.zeros((mcuy * vi * 8, mcux * hi * 8), dtype=np.float64)
        for hi, vi in grid
    ]
    ncomp = len(comps)
    # the CMYK luma composite needs ALL components; 1/3-component luma
    # keeps only component 0
    keep = ncomp if (ncomp == 4 or not luma_only) else 1
    level = 1 << (precision - 1)
    maxval = (1 << precision) - 1
    shift = precision - 8
    max_dc = 11 if precision == 8 else 15
    br = _BitReader(buf, pos)
    preds = [0] * ncomp
    mcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if dri and mcu and mcu % dri == 0:
                br.sync_restart()
                preds = [0] * ncomp
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
                                max_dc,
                            )
                        except _RestartMarker:
                            raise ValueError(
                                "restart marker mid-MCU (corrupt stream "
                                "or bad DRI)"
                            ) from None
                        if ci < keep:
                            y0 = (my * vi + v) * 8
                            x0 = (mx * hi + hh) * 8
                            planes[ci][y0 : y0 + 8, x0 : x0 + 8] = block
            mcu += 1

    def _to8(plane):
        p = np.clip(np.round(plane + level), 0, maxval)
        if shift:
            p = np.floor(p / (1 << shift))
        return p.astype(np.uint8)

    def _upsample(ci):
        hi, vi = grid[ci]
        if vmax % vi or hmax % hi:
            # legal but exotic: e.g. Hmax=3 with chroma Hi=2 needs a
            # 1.5x fractional upsample the integer repeat cannot do
            raise NotImplementedError(
                f"non-integer chroma upsampling factors "
                f"({hmax}x{vmax} max vs {hi}x{vi} chroma)"
            )
        p = _to8(planes[ci])
        p = np.repeat(np.repeat(p, vmax // vi, axis=0), hmax // hi, axis=1)
        return p[:h, :w]

    if ncomp == 4:
        ch = [_upsample(ci).astype(np.float64) for ci in range(4)]
        if adobe == 2:  # YCCK: invert YCbCr on the first three channels
            y_, cb, cr = ch[0], ch[1], ch[2]
            c_ = y_ + 1.402 * (cr - 128.0)
            m_ = y_ - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
            yy = y_ + 1.772 * (cb - 128.0)
            ch = [np.clip(v, 0, 255) for v in (c_, m_, yy)] + [ch[3]]
        k_ = ch[3]
        rgb = [v * k_ / 255.0 for v in ch[:3]]
        y_ = 0.299 * rgb[0] + 0.587 * rgb[1] + 0.114 * rgb[2]
        if luma_only:
            return np.clip(np.round(y_), 0, 255).astype(np.uint8)
        cb = -0.168736 * rgb[0] - 0.331264 * rgb[1] + 0.5 * rgb[2] + 128.0
        cr = 0.5 * rgb[0] - 0.418688 * rgb[1] - 0.081312 * rgb[2] + 128.0
        return np.stack(
            [np.clip(np.round(p), 0, 255).astype(np.uint8) for p in (y_, cb, cr)],
            axis=-1,
        )

    luma = _to8(planes[0])[:h, :w]
    if luma_only:
        return luma
    if ncomp == 1:
        chroma = np.full((h, w), 128, dtype=np.uint8)
        return np.stack([luma, chroma, chroma], axis=-1)
    return np.stack([luma, _upsample(1), _upsample(2)], axis=-1)


def _hier_upsample(plane: np.ndarray, axis: int) -> np.ndarray:
    """T.81 J.1 reference-expansion filter along one axis: even output
    samples copy the input, odd outputs are the rounded mean of the
    two neighbors ((a + b + 1) >> 1), the last odd sample replicating
    its left neighbor."""
    p = plane.astype(np.int64)
    if axis == 1:
        nxt = np.concatenate([p[:, 1:], p[:, -1:]], axis=1)
        odd = (p + nxt + 1) >> 1
        out = np.empty((p.shape[0], p.shape[1] * 2), dtype=np.int64)
        out[:, 0::2] = p
        out[:, 1::2] = odd
    else:
        nxt = np.concatenate([p[1:], p[-1:]], axis=0)
        odd = (p + nxt + 1) >> 1
        out = np.empty((p.shape[0] * 2, p.shape[1]), dtype=np.int64)
        out[0::2] = p
        out[1::2] = odd
    return out.astype(np.uint8)


def _decode_scan_hier(buf, pos, h, w, comps, quant, huff_dc, huff_ac,
                      differential, refs):
    """One hierarchical frame's sequential scan — 1 or 3 components,
    all 1x1 (interleaved one block per component per MCU).  A
    NON-differential frame decodes like baseline (per-component DPCM
    DC chains, +128 level shift); a DIFFERENTIAL (SOF5) frame codes
    the spatial difference against each component's expanded
    reference: no level shift, and the DC prediction is 0 for every
    block (differential frames carry no DC DPCM chain — T.81 F.2's
    stated convention for differential coding).  ``refs`` is the
    per-component-id reference dict; returns it updated with the
    reconstructed uint8 plane per component."""
    mcux = (w + 7) // 8
    mcuy = (h + 7) // 8
    planes = {
        c[0]: np.zeros((mcuy * 8, mcux * 8), dtype=np.float64) for c in comps
    }
    br = _BitReader(buf, pos)
    preds = {c[0]: 0 for c in comps}
    for my in range(mcuy):
        for mx in range(mcux):
            for cid, dc_sel, ac_sel, tq, *_s in comps:
                if differential:
                    preds[cid] = 0
                block, preds[cid] = _decode_block(
                    br, huff_dc[dc_sel], huff_ac[ac_sel], preds[cid],
                    quant[tq],
                )
                planes[cid][my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8] = block
    out = dict(refs or {})
    for cid, plane in planes.items():
        if differential:
            if not refs or cid not in refs:
                raise ValueError(
                    "differential frame with no reference decoded"
                )
            base = refs[cid][:h, :w].astype(np.float64)
            out[cid] = np.clip(
                np.round(base + plane[:h, :w]), 0, 255
            ).astype(np.uint8)
        else:
            out[cid] = np.clip(
                np.round(plane + 128.0), 0, 255
            ).astype(np.uint8)[:h, :w]
    return out


def _lossless_pred(out, y, x, predictor):
    """T.81 H.1.2.1 prediction: a = left, b = above, c = upper-left;
    the first line predicts with a (after the very first sample), the
    first column with b — regardless of the selected predictor."""
    if y == 0:
        return int(out[0, x - 1])
    if x == 0:
        return int(out[y - 1, 0])
    a = int(out[y, x - 1])
    b = int(out[y - 1, x])
    c = int(out[y - 1, x - 1])
    if predictor == 1:
        return a
    if predictor == 2:
        return b
    if predictor == 3:
        return c
    if predictor == 4:
        return a + b - c
    if predictor == 5:
        return a + ((b - c) >> 1)
    if predictor == 6:
        return b + ((a - c) >> 1)
    return (a + b) >> 1  # predictor 7


def _decode_lossless_scan(buf, pos, h, w, comps, huff_dc, predictor, al,
                          precision):
    """T.81 Annex H lossless sequential (process 14, Huffman): each
    sample is a DC-style Huffman-coded difference from its predictor;
    reconstruction is EXACT (mod-2^16 arithmetic).  All-1x1 scan
    components decode interleaved — one sample per component per MCU,
    MCUs in raster order, per-component predictor state.  Precision
    2-16 (round 8: 12/16-bit lossless is the DNG/TIFF-EP/DICOM slice);
    the point transform Al scales back first, then precisions above 8
    map to the uint8 contract via the exact >> (P-8).  Returns one
    [h, w] uint8 plane per component."""
    if not (1 <= predictor <= 7):
        raise ValueError(f"illegal lossless predictor {predictor}")
    tabs = [huff_dc[c[1]] for c in comps]
    br = _BitReader(buf, pos)
    nc = len(comps)
    outs = [np.zeros((h, w), dtype=np.int64) for _ in range(nc)]
    default = 1 << (precision - 1 - al)
    for y in range(h):
        for x in range(w):
            for ci in range(nc):
                s = _huff_decode(br, tabs[ci])
                if s == 16:  # the 32768 special category (P=16 streams)
                    diff = 32768
                elif s:
                    diff = _extend(br.receive(s), s)
                else:
                    diff = 0
                pred = default if (y == 0 and x == 0) else _lossless_pred(
                    outs[ci], y, x, predictor
                )
                outs[ci][y, x] = (pred + diff) & 0xFFFF
    down = max(0, precision - 8)
    return [
        np.clip((o << al) >> down, 0, 255).astype(np.uint8) for o in outs
    ]


def jpeg_payload_lossless(
    px: np.ndarray,
    predictor: int = 1,
    point_transform: int = 0,
    precision: int = 8,
) -> bytes:
    """Encode [h, w] grayscale or [h, w, 3] RGB as a LOSSLESS (SOF3)
    JPEG — Huffman predictive coding, T.81 Annex H process 14 (color
    components encode RGB directly, interleaved one sample per
    component; the lossless process has no YCbCr transform).  With
    ``point_transform=0`` the roundtrip is BIT-EXACT (the only member
    of the codec family with zero loss); Al > 0 drops the Al low bits
    (decode returns sample << Al).  ``predictor`` selects H.1.2.1
    formulas 1-7.

    ``precision`` 2-16 (round 8: 12/16-bit lossless is the
    DNG/TIFF-EP/DICOM layout): samples must be integers in
    [0, 2^P - 1].  At 8 bits diffs span categories <= 9 and the Annex
    K DC table is written; above 8 the stream carries the full-range
    table (categories 0..16) and differences are coded mod 2^16 with
    the -32768 -> category-16-no-bits special, exactly mirroring the
    decoder's (pred + diff) & 0xFFFF reconstruction."""
    px = np.asarray(px)
    if px.ndim == 2:
        planes = [px]
    elif px.ndim == 3 and px.shape[2] == 3:
        planes = [px[..., i] for i in range(3)]
    else:
        raise ValueError(
            f"lossless encoder takes [h,w] or [h,w,3], got {px.shape}"
        )
    if not (1 <= predictor <= 7):
        raise ValueError(f"illegal lossless predictor {predictor}")
    if not (2 <= precision <= 16):
        raise ValueError(f"lossless precision must be 2-16, got {precision}")
    maxval = (1 << precision) - 1
    if any(
        int(p.max(initial=0)) > maxval or int(p.min(initial=0)) < 0
        for p in planes
    ):
        raise ValueError(f"samples exceed {precision}-bit range 0..{maxval}")
    h, w = planes[0].shape
    nc = len(planes)
    samples = [p.astype(np.int64) >> point_transform for p in planes]
    if precision <= 8:
        dc_bits, dc_vals = _DC_LUM_BITS, _DC_LUM_VALS
    else:
        dc_bits, dc_vals = _DC16_BITS, _DC16_VALS
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" + struct.pack(
        ">HHBB", 1, 1, 0, 0
    )
    out += b"\xff\xc3" + struct.pack(">HBHHB", 8 + 3 * nc, precision, h, w, nc)
    for cid in range(1, nc + 1):
        out += struct.pack("BBB", cid, 0x11, 0)
    out += b"\xff\xc4" + struct.pack(">HB", 3 + 16 + len(dc_vals), 0x00)
    out += bytes(dc_bits) + bytes(dc_vals)
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * nc, nc)
    for cid in range(1, nc + 1):
        out += struct.pack("BB", cid, 0x00)
    out += struct.pack("BBB", predictor, 0, point_transform)
    _, dc_enc = _canonical_codes(dc_bits, dc_vals)
    bw = _BitWriter()
    default = 1 << (precision - 1 - point_transform)
    for y in range(h):
        for x in range(w):
            for ci in range(nc):
                pred = default if (y == 0 and x == 0) else _lossless_pred(
                    samples[ci], y, x, predictor
                )
                # mod-2^16 fold keeps categories <= 16 at any precision
                diff = ((int(samples[ci][y, x]) - pred + 32768) & 0xFFFF) - 32768
                if diff == -32768:
                    code, ln = dc_enc[16]  # category 16: no magnitude bits
                    bw.write(code, ln)
                    continue
                s = abs(diff).bit_length()
                code, ln = dc_enc[s]
                bw.write(code, ln)
                if s:
                    _emit_signed(bw, diff, s)
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)


class _ProgressiveState:
    """Accumulates the LUMA coefficient grid across progressive scans
    (T.81 Annex G decode): DC scans (interleaved or single-component)
    with successive approximation, luma AC scans with spectral
    selection + successive approximation + EOB-run batching; chroma AC
    scans are skipped wholesale via marker search (their entropy
    segments are self-delimiting), paying zero decode cost."""

    def __init__(self, h, w, comps):
        self.h, self.w, self.comps = h, w, comps
        self.hmax = max(c[4] for c in comps)
        self.vmax = max(c[5] for c in comps)
        self.mcux = (w + 8 * self.hmax - 1) // (8 * self.hmax)
        self.mcuy = (h + 8 * self.vmax - 1) // (8 * self.vmax)
        # luma coef grid padded to the MCU grid (interleaved DC scans
        # cover the padding blocks); stored in ZIGZAG order, dequant at
        # reconstruct
        hi, vi = comps[0][4], comps[0][5]
        self.gh = self.mcuy * vi
        self.gw = self.mcux * hi
        self.coef = np.zeros((self.gh, self.gw, 64), dtype=np.int32)
        # non-interleaved luma scans cover only ceil(samples/8) blocks
        self.nh = (h + 7) // 8
        self.nw = (w + 7) // 8
        self.preds = [0] * len(comps)

    def decode_scan(self, buf, pos, order, ss, se, ah, al,
                    huff_dc, huff_ac, dri):
        """Decode (or skip) one scan; returns the stream position of
        the next marker."""
        if ss == 0:  # DC scan (Se must be 0)
            if se != 0:
                raise ValueError("progressive DC scan with Se != 0")
            self._dc_scan(buf, pos, order, ah, al, huff_dc, dri)
        else:
            if len(order) != 1:
                raise ValueError("progressive AC scan with >1 component")
            if order[0][0] != self.comps[0][0]:
                # chroma AC scan: skip to the next marker, zero decode
                return _next_marker(buf, pos)
            self._ac_scan(buf, pos, order[0], ss, se, ah, al, huff_ac, dri)
        return _next_marker(buf, pos)

    # -- DC scans ----------------------------------------------------
    def _dc_scan(self, buf, pos, order, ah, al, huff_dc, dri):
        br = _BitReader(buf, pos)
        interleaved = len(order) > 1
        if ah == 0:
            self.preds = [0] * len(self.comps)
        if interleaved:
            mcu = 0
            for my in range(self.mcuy):
                for mx in range(self.mcux):
                    if dri and mcu and mcu % dri == 0:
                        br.sync_restart()
                        self.preds = [0] * len(self.comps)
                    for comp in order:
                        ci = self.comps.index(comp)
                        hi, vi = comp[4], comp[5]
                        for v in range(vi):
                            for hh in range(hi):
                                self._dc_unit(
                                    br, comp, ci, my * vi + v, mx * hi + hh,
                                    ah, al, huff_dc,
                                )
                    mcu += 1
        else:
            comp = order[0]
            ci = self.comps.index(comp)
            hi, vi = comp[4], comp[5]
            cw = -(-self.w * hi // (8 * self.hmax))  # ceil blocks
            ch = -(-self.h * vi // (8 * self.vmax))
            unit = 0
            for by in range(ch):
                for bx in range(cw):
                    if dri and unit and unit % dri == 0:
                        br.sync_restart()
                        self.preds = [0] * len(self.comps)
                    self._dc_unit(br, comp, ci, by, bx, ah, al, huff_dc)
                    unit += 1

    def _dc_unit(self, br, comp, ci, by, bx, ah, al, huff_dc):
        is_luma = ci == 0
        if ah == 0:  # first DC pass: magnitude at precision Al
            s = _huff_decode(br, huff_dc[comp[1]])
            if s > 11:
                raise ValueError(f"DC category {s} out of range")
            diff = _extend(br.receive(s), s) if s else 0
            self.preds[ci] += diff
            if is_luma:
                self.coef[by, bx, 0] = self.preds[ci] << al
        else:  # refinement: one bit per unit
            bit = br.read_bit()
            if is_luma and bit:
                self.coef[by, bx, 0] |= 1 << al

    # -- luma AC scans -----------------------------------------------
    def _ac_scan(self, buf, pos, comp, ss, se, ah, al, huff_ac, dri):
        br = _BitReader(buf, pos)
        tab = huff_ac[comp[2]]
        eobrun = 0
        unit = 0
        for by in range(self.nh):
            for bx in range(self.nw):
                if dri and unit and unit % dri == 0:
                    br.sync_restart()
                    eobrun = 0
                blk = self.coef[by, bx]
                if ah == 0:
                    eobrun = self._ac_first(br, tab, blk, ss, se, al, eobrun)
                else:
                    eobrun = self._ac_refine(br, tab, blk, ss, se, al, eobrun)
                unit += 1

    @staticmethod
    def _ac_first(br, tab, blk, ss, se, al, eobrun):
        """First pass of a band (Ah=0): values at precision Al with
        EOB-run batching (T.81 G.1.2.2 / F.2.4.2 analogue)."""
        if eobrun > 0:
            return eobrun - 1
        k = ss
        while k <= se:
            rs = _huff_decode(br, tab)
            r, s = rs >> 4, rs & 0x0F
            if s == 0:
                if r < 15:  # EOBn: run of (1<<r) + extra blocks
                    eobrun = (1 << r) - 1
                    if r:
                        eobrun += br.receive(r)
                    break
                k += 16  # ZRL
                continue
            k += r
            if k > se:
                raise ValueError("AC run overflows band")
            blk[k] = _extend(br.receive(s), s) << al
            k += 1
        return eobrun

    @staticmethod
    def _ac_refine(br, tab, blk, ss, se, al, eobrun):
        """Refinement pass (Ah=Al+1): correction bits for history-
        nonzero coefficients interleaved with newly-nonzero +-1<<Al
        insertions (T.81 G.1.2.3 decode semantics)."""
        p1 = 1 << al
        m1 = -p1
        k = ss
        if eobrun == 0:
            while k <= se:
                rs = _huff_decode(br, tab)
                r, s = rs >> 4, rs & 0x0F
                val = 0
                if s == 0:
                    if r < 15:  # EOBn
                        eobrun = 1 << r
                        if r:
                            eobrun += br.receive(r)
                        break
                    # r == 15: run of 16 zero-history coefficients
                else:
                    if s != 1:
                        raise ValueError(
                            "refinement scan magnitude category != 1"
                        )
                    val = p1 if br.read_bit() else m1
                while k <= se:
                    c = int(blk[k])
                    if c != 0:
                        if br.read_bit() and (c & p1) == 0:
                            blk[k] = c + (p1 if c >= 0 else m1)
                    else:
                        if r == 0:
                            if val:
                                blk[k] = val
                            k += 1
                            break
                        r -= 1
                    k += 1
                else:
                    break
        if eobrun > 0:
            # EOB tail: the current block still receives correction
            # bits for its remaining history-nonzero coefficients
            while k <= se:
                c = int(blk[k])
                if c != 0:
                    if br.read_bit() and (c & p1) == 0:
                        blk[k] = c + (p1 if c >= 0 else m1)
                k += 1
            eobrun -= 1
        return eobrun

    # -- final IDCT --------------------------------------------------
    def reconstruct(self, quant):
        q = quant[self.comps[0][3]]
        zz = self.coef.reshape(-1, 64).astype(np.float64) * q[None, :]
        raster = np.zeros_like(zz)
        raster[:, _ZIGZAG] = zz
        blocks = raster.reshape(-1, 8, 8)
        # IDCT all blocks in one einsum: M.T @ B @ M
        px = np.einsum("ur,nuv,vc->nrc", _DCT, blocks, _DCT)
        out = (
            px.reshape(self.gh, self.gw, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(self.gh * 8, self.gw * 8)
        )
        out = np.clip(np.round(out + 128.0), 0, 255).astype(np.uint8)
        return out[: self.h, : self.w]


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


def jpeg_payload_cmyk(
    stored: np.ndarray, transform: int = 0, restart_interval: int = 0
) -> bytes:
    """Encode uint8 [h, w, 4] ADOBE-STORED CMYK samples (Photoshop
    convention: 255 = no ink, i.e. inverted CMYK) as a 4-component
    baseline JPEG with an APP14 Adobe marker.  ``transform`` 0 writes
    the four stored planes directly (Adobe 'Unknown' = CMYK);
    ``transform`` 2 (YCCK) forward-transforms the first three stored
    planes through YCbCr exactly as Photoshop does, leaving K alone.
    All components 1x1 (the overwhelmingly common CMYK layout), unit
    quantization, Annex K Huffman — the same near-lossless roundtrip
    envelope as ``jpeg_payload``."""
    stored = np.asarray(stored)
    if stored.ndim != 3 or stored.shape[2] != 4:
        raise ValueError(f"expected [h,w,4] stored CMYK, got {stored.shape}")
    if transform not in (0, 2):
        raise ValueError(f"transform must be 0 (CMYK) or 2 (YCCK), got {transform}")
    h, w = stored.shape[:2]
    ch = [stored[..., i].astype(np.float64) for i in range(4)]
    if transform == 2:
        c_, m_, y_ = ch[0], ch[1], ch[2]
        ch = [
            0.299 * c_ + 0.587 * m_ + 0.114 * y_,
            -0.168736 * c_ - 0.331264 * m_ + 0.5 * y_ + 128.0,
            0.5 * c_ - 0.418688 * m_ - 0.081312 * y_ + 128.0,
            ch[3],
        ]

    out = bytearray(b"\xff\xd8")  # SOI
    # APP14 Adobe: version 100, flags 0/0, transform byte (no JFIF —
    # Adobe CMYK files carry APP14, not APP0)
    out += b"\xff\xee" + struct.pack(">H", 14) + b"Adobe" + struct.pack(
        ">HHHB", 100, 0, 0, transform
    )
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + b"\x01" * 64
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * 4, 8, h, w, 4)
    for cid in range(1, 5):
        out += struct.pack("BBB", cid, 0x11, 0)
    for tc_th, bits, vals in (
        (0x00, _DC_LUM_BITS, _DC_LUM_VALS),
        (0x10, _AC_LUM_BITS, _AC_LUM_VALS),
    ):
        out += b"\xff\xc4" + struct.pack(">HB", 3 + 16 + len(vals), tc_th)
        out += bytes(bits) + bytes(vals)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * 4, 4)
    for cid in range(1, 5):
        out += struct.pack("BB", cid, 0x00)
    out += b"\x00\x3f\x00"

    _, dc_enc = _canonical_codes(_DC_LUM_BITS, _DC_LUM_VALS)
    _, ac_enc = _canonical_codes(_AC_LUM_BITS, _AC_LUM_VALS)
    mcux = (w + 7) // 8
    mcuy = (h + 7) // 8
    writer = _BitWriter()
    preds = [0] * 4
    mcu = 0
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu and mcu % restart_interval == 0:
                writer.flush()
                writer.out += bytes([0xFF, 0xD0 + (rst % 8)])
                rst += 1
                preds = [0] * 4
            mcu += 1
            for ci, plane in enumerate(ch):
                blk = _edge_tile(plane, my * 8, mx * 8)
                coefs = np.round(_DCT @ (blk - 128.0) @ _DCT.T).astype(np.int64)
                preds[ci] = _encode_block(
                    writer, coefs.ravel(), preds[ci], dc_enc, ac_enc
                )
    writer.flush()
    out += writer.out
    out += b"\xff\xd9"
    return bytes(out)


# 12-bit Huffman tables (written into the stream, so any spec decoder
# reads them): DC categories 0..15 all at length 5 (16 codes < 31, the
# all-ones code stays unused); AC all 255 possible (run<<4|size) bytes
# 0..254 at length 9 plus 0xFF at length 10 (canonical code 510 — not
# all-ones).  Annex K tables only reach DC category 11 / AC size 10,
# which 12-bit coefficients exceed.
_DC12_BITS = [0, 0, 0, 0, 16] + [0] * 11
_DC12_VALS = list(range(16))
# Lossless high-precision DC table: categories 0..16 (16 = the
# "+32768, no magnitude bits" special of mod-2^16 difference coding)
_DC16_BITS = [0, 0, 0, 0, 17] + [0] * 11
_DC16_VALS = list(range(17))
_AC12_BITS = [0] * 16
_AC12_BITS[8] = 255
_AC12_BITS[9] = 1
_AC12_VALS = list(range(256))


def jpeg_payload12(px12: np.ndarray, restart_interval: int = 0) -> bytes:
    """Encode uint16 [h, w] 12-bit grayscale (values 0..4095) as an
    EXTENDED SEQUENTIAL (SOF1) 12-bit JPEG: 16-bit unit quantization
    table (pq=1), full-range Huffman tables (DC categories to 15, AC
    sizes to 15), level shift 2048.  With unit quantization the
    roundtrip error is FDCT rounding only — the same <= 3-count bound
    as the 8-bit encoder, but in 12-bit counts, so the decoder's
    uint8 (>> 4) output is within 1 count of ``px12 >> 4``."""
    px12 = np.asarray(px12)
    if px12.ndim != 2:
        raise ValueError(f"expected [h,w] 12-bit samples, got {px12.shape}")
    if int(px12.max(initial=0)) > 4095 or int(px12.min(initial=0)) < 0:
        raise ValueError("12-bit samples must be in 0..4095")
    h, w = px12.shape
    out = bytearray(b"\xff\xd8")
    # DQT pq=1: 16-bit entries, all ones
    out += b"\xff\xdb" + struct.pack(">H", 131) + b"\x10" + b"\x00\x01" * 64
    out += b"\xff\xc1" + struct.pack(">HBHHB", 8 + 3, 12, h, w, 1)
    out += struct.pack("BBB", 1, 0x11, 0)
    for tc_th, bits, vals in (
        (0x00, _DC12_BITS, _DC12_VALS),
        (0x10, _AC12_BITS, _AC12_VALS),
    ):
        out += b"\xff\xc4" + struct.pack(">HB", 3 + 16 + len(vals), tc_th)
        out += bytes(bits) + bytes(vals)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    out += b"\xff\xda" + struct.pack(">HB", 8, 1) + struct.pack("BB", 1, 0x00)
    out += b"\x00\x3f\x00"

    _, dc_enc = _canonical_codes(_DC12_BITS, _DC12_VALS)
    _, ac_enc = _canonical_codes(_AC12_BITS, _AC12_VALS)
    plane = px12.astype(np.float64)
    mcux = (w + 7) // 8
    mcuy = (h + 7) // 8
    writer = _BitWriter()
    pred = 0
    mcu = 0
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu and mcu % restart_interval == 0:
                writer.flush()
                writer.out += bytes([0xFF, 0xD0 + (rst % 8)])
                rst += 1
                pred = 0
            mcu += 1
            blk = _edge_tile(plane, my * 8, mx * 8)
            coefs = np.round(_DCT @ (blk - 2048.0) @ _DCT.T).astype(np.int64)
            pred = _encode_block(writer, coefs.ravel(), pred, dc_enc, ac_enc)
    writer.flush()
    out += writer.out
    out += b"\xff\xd9"
    return bytes(out)


def jpeg_payload_hierarchical(px: np.ndarray, levels: int = 2) -> bytes:
    """Encode uint8 [h, w] grayscale OR [h, w, 3] YCbCr planes as a
    HIERARCHICAL (DHP) JPEG: a reduced-resolution non-differential
    SOF0 frame followed by ``levels - 1`` EXP + differential (SOF5)
    frames, each coding the spatial difference against the
    spec-filter-expanded references.  3-component frames interleave
    one block per component per MCU (all 1x1); the channels are
    treated as already-YCbCr (the decoder's luma_only=False contract),
    matching the color conventions of the rest of the codec family.

    CLOSED-LOOP: each level's differences are computed against the
    decoder's own reconstruction of the previous level (the encoder
    replays round(DCT)/IDCT per tile), so the only final-image error
    is the last difference frame's FDCT rounding — the same <= 3-count
    envelope as the baseline encoder.  Uses the full-range stream-
    written Huffman tables (difference DCT coefficients reach size 11,
    which Annex K's AC table cannot code).  Dimensions must be
    divisible by 2^(levels-1) (the reduction is a 2x2 box mean; the
    EXP filter doubles exactly)."""
    px = np.asarray(px)
    if px.ndim == 2:
        chans = [px]
    elif px.ndim == 3 and px.shape[2] == 3:
        chans = [px[..., i] for i in range(3)]
    else:
        raise ValueError(
            f"expected [h,w] grayscale or [h,w,3] YCbCr, got {px.shape}"
        )
    if levels < 2:
        raise ValueError("hierarchical encoding needs levels >= 2")
    h, w = chans[0].shape
    nc = len(chans)
    f = 1 << (levels - 1)
    if h % f or w % f:
        raise ValueError(
            f"dims {h}x{w} not divisible by 2^(levels-1)={f}"
        )

    def reduce(p):
        return p.reshape(p.shape[0] // 2, 2, p.shape[1] // 2, 2).mean((1, 3))

    pyramids = []
    for ch in chans:
        pyr = [ch.astype(np.float64)]
        for _ in range(levels - 1):
            pyr.append(reduce(pyr[-1]))
        pyr.reverse()  # smallest first
        pyramids.append(pyr)

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + b"\x01" * 64
    for tc_th, bits, vals in (
        (0x00, _DC12_BITS, _DC12_VALS),
        (0x10, _AC12_BITS, _AC12_VALS),
    ):
        out += b"\xff\xc4" + struct.pack(">HB", 3 + 16 + len(vals), tc_th)
        out += bytes(bits) + bytes(vals)
    # DHP: full-resolution dims, all components (same syntax as SOF)
    out += b"\xff\xde" + struct.pack(">HBHHB", 8 + 3 * nc, 8, h, w, nc)
    for cid in range(1, nc + 1):
        out += struct.pack("BBB", cid, 0x11, 0)
    _, dc_enc = _canonical_codes(_DC12_BITS, _DC12_VALS)
    _, ac_enc = _canonical_codes(_AC12_BITS, _AC12_VALS)

    def frame_headers(marker, ph, pw):
        b = bytearray()
        b += marker + struct.pack(">HBHHB", 8 + 3 * nc, 8, ph, pw, nc)
        for cid in range(1, nc + 1):
            b += struct.pack("BBB", cid, 0x11, 0)
        b += b"\xff\xda" + struct.pack(">HB", 6 + 2 * nc, nc)
        for cid in range(1, nc + 1):
            b += struct.pack("BB", cid, 0x00)
        b += b"\x00\x3f\x00"
        return bytes(b)

    def encode_frame(planes, differential):
        """Interleave one block per component per MCU; return each
        component's DECODER reconstruction (closed loop)."""
        ph, pw = planes[0].shape
        mcux = (pw + 7) // 8
        mcuy = (ph + 7) // 8
        recs = [
            np.zeros((mcuy * 8, mcux * 8), dtype=np.float64)
            for _ in planes
        ]
        writer = _BitWriter()
        preds = [0] * len(planes)
        shift = 0.0 if differential else 128.0
        for my in range(mcuy):
            for mx in range(mcux):
                for ci, plane in enumerate(planes):
                    blk = _edge_tile(plane, my * 8, mx * 8)
                    coefs = np.round(
                        _DCT @ (blk - shift) @ _DCT.T
                    ).astype(np.int64)
                    if differential:
                        _encode_block(writer, coefs.ravel(), 0, dc_enc, ac_enc)
                    else:
                        preds[ci] = _encode_block(
                            writer, coefs.ravel(), preds[ci], dc_enc, ac_enc
                        )
                    recs[ci][my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8] = (
                        _DCT.T @ coefs.astype(np.float64) @ _DCT + shift
                    )
        writer.flush()
        return [r[:ph, :pw] for r in recs], writer.out

    refs = None
    for li in range(levels):
        planes = [pyr[li] for pyr in pyramids]
        ph, pw = planes[0].shape
        if li == 0:
            out += frame_headers(b"\xff\xc0", ph, pw)
            recs, data = encode_frame(planes, differential=False)
            refs = [
                np.clip(np.round(r), 0, 255).astype(np.uint8) for r in recs
            ]
            out += data
        else:
            out += b"\xff\xdf" + struct.pack(">HB", 3, 0x11)  # EXP 1,1
            refs = [
                _hier_upsample(_hier_upsample(r, axis=1), axis=0)
                for r in refs
            ]
            out += frame_headers(b"\xff\xc5", ph, pw)
            diffs = [
                p - r[:ph, :pw].astype(np.float64)
                for p, r in zip(planes, refs)
            ]
            recs, data = encode_frame(diffs, differential=True)
            refs = [
                np.clip(
                    np.round(r[:ph, :pw].astype(np.float64) + rec), 0, 255
                ).astype(np.uint8)
                for r, rec in zip(refs, recs)
            ]
            out += data
    out += b"\xff\xd9"
    return bytes(out)


# ------------------------------------------------------- progressive encode

# Flat custom Huffman tables for progressive scans (written into the
# stream's DHT, so any spec decoder reads them): all symbols at one
# code length — DC categories 0..11 at length 4, and for AC every
# (run<<4|size) magnitude symbol, every EOBn (run 0..14) and ZRL at
# length 8 (176 symbols < 255, so the all-ones code stays unused).
# Unlike the Annex K baseline tables these include the EOBn symbols,
# letting the encoder emit real multi-block EOB runs — which is what
# exercises the decoder's EOBRUN batching on gate data.
_PROG_DC_BITS = [0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_PROG_DC_VALS = list(range(12))
_PROG_AC_VALS = (
    [(r << 4) | s for r in range(16) for s in range(1, 11)]
    + [r << 4 for r in range(15)]  # EOB0..EOB14
    + [0xF0]  # ZRL
)
_PROG_AC_BITS = [0] * 16
_PROG_AC_BITS[7] = len(_PROG_AC_VALS)


def _emit_signed(bw: _BitWriter, v: int, s: int) -> None:
    """The s magnitude bits following a size-s symbol (T.81 F.1.2.2)."""
    bw.write(v if v > 0 else v + (1 << s) - 1, s)


class _ProgEncState:
    """Cross-block EOB-run + buffered-correction-bit state for one AC
    scan (mirrors the decoder's EOBRUN semantics: a flush emits the
    EOBn symbol, its extra bits, then every buffered correction bit in
    FIFO order — exactly where the decoder's block tails read them)."""

    def __init__(self, bw: _BitWriter, ac_enc):
        self.bw = bw
        self.ac_enc = ac_enc
        self.eobrun = 0
        self.bits: list[int] = []

    def flush(self) -> None:
        if self.eobrun > 0:
            nb = self.eobrun.bit_length() - 1
            code, ln = self.ac_enc[nb << 4]
            self.bw.write(code, ln)
            if nb:
                self.bw.write(self.eobrun - (1 << nb), nb)
            self.eobrun = 0
        for b in self.bits:
            self.bw.write(b, 1)
        self.bits = []

    def end_block(self, pending_bits: list[int]) -> None:
        self.eobrun += 1
        self.bits.extend(pending_bits)
        if self.eobrun == 0x7FFF:
            self.flush()


def _enc_ac_first(st: _ProgEncState, band: np.ndarray, al: int) -> None:
    """First pass of a band: values at precision Al, EOB-run batched."""
    bw, ac_enc = st.bw, st.ac_enc
    r = 0
    wrote = False
    for v in band:
        v = int(v)
        mag = abs(v) >> al
        if mag == 0:
            r += 1
            continue
        st.flush()
        while r > 15:
            code, ln = ac_enc[0xF0]
            bw.write(code, ln)
            r -= 16
        s = mag.bit_length()
        code, ln = ac_enc[(r << 4) | s]
        bw.write(code, ln)
        _emit_signed(bw, mag if v > 0 else -mag, s)
        r = 0
        wrote = True
    if r > 0 or not wrote:
        st.end_block([])


def _enc_ac_refine(st: _ProgEncState, band: np.ndarray, al: int) -> None:
    """Refinement pass: correction bits for history-nonzero
    coefficients, run-length-coded +-1<<Al insertions for newly-nonzero
    ones (T.81 G.1.2.3 encode side, libjpeg-equivalent structure)."""
    bw, ac_enc = st.bw, st.ac_enc
    vals = [int(v) for v in band]
    absv = [abs(v) >> al for v in vals]
    eob_idx = -1  # last newly-nonzero index
    for i, t in enumerate(absv):
        if t == 1:
            eob_idx = i
    r = 0
    pending: list[int] = []
    for i, t in enumerate(absv):
        if t == 0:
            r += 1
            continue
        # Emit pending ZRLs on reaching ANY nonzero coefficient (not
        # only newly-nonzero ones): a history-nonzero coefficient after
        # a >15 zero-history run must see its correction bit buffered
        # AFTER the ZRL that covers the run, or the decoder desyncs
        # (libjpeg's encode_mcu_AC_refine ordering).  Runs with no
        # newly-nonzero coefficient ahead fold into the EOB run.
        while r > 15 and i <= eob_idx:
            st.flush()
            code, ln = ac_enc[0xF0]
            bw.write(code, ln)
            r -= 16
            for b in pending:
                bw.write(b, 1)
            pending = []
        if t > 1:
            # history-nonzero: buffer its correction bit (bit Al of
            # the magnitude); the zero-run count is unaffected
            pending.append(t & 1)
            continue
        # newly-nonzero at this precision
        st.flush()
        code, ln = ac_enc[(r << 4) | 1]
        bw.write(code, ln)
        bw.write(1 if vals[i] > 0 else 0, 1)
        for b in pending:
            bw.write(b, 1)
        pending = []
        r = 0
    if r > 0 or pending:
        st.end_block(pending)


def jpeg_payload_progressive(
    px: np.ndarray, subsampling: str = "444"
) -> bytes:
    """Encode uint8 [h, w] (grayscale) or [h, w, 3] (RGB as YCbCr,
    optionally 4:2:0) as a PROGRESSIVE (SOF2) JPEG with unit
    quantization, using a scan script that exercises every decoder
    path: an interleaved DC first scan at Al=1, luma AC spectral bands
    (1-5, then 6-63) at Al=1, full chroma AC scans (which the decoder
    skips wholesale), a luma AC refinement scan (Ah=1 -> Al=0) and a
    DC refinement scan.  Because the final precision is Al=0
    everywhere, the decoded coefficients are bit-exact with the
    baseline encoder's, so the luma roundtrip bound (<= 3 counts) is
    identical."""
    px = np.asarray(px)
    color = px.ndim == 3
    if color and px.shape[2] != 3:
        raise ValueError(f"expected [h,w] or [h,w,3], got {px.shape}")
    if subsampling not in ("444", "420"):
        raise ValueError(f"unknown subsampling {subsampling!r}")
    h, w = px.shape[:2]
    if color:
        r_, g_, b_ = (px[..., i].astype(np.float64) for i in range(3))
        planes = [
            0.299 * r_ + 0.587 * g_ + 0.114 * b_,
            -0.168736 * r_ - 0.331264 * g_ + 0.5 * b_ + 128.0,
            0.5 * r_ - 0.418688 * g_ - 0.081312 * b_ + 128.0,
        ]
    else:
        planes = [px.astype(np.float64)]
    if color and subsampling == "420":
        planes = [planes[0], _box2(planes[1]), _box2(planes[2])]
        samps = [(2, 2), (1, 1), (1, 1)]
    else:
        samps = [(1, 1)] * len(planes)
    ncomp = len(planes)
    hmax = max(s[0] for s in samps)
    vmax = max(s[1] for s in samps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)

    # per-component zigzag coefficient grids over the PADDED MCU grid
    # (interleaved DC scans cover padding; AC scans cover only the
    # non-interleaved ceil(samples/8) prefix, like the decoder)
    grids = []
    nidims = []  # non-interleaved (bh, bw) per component
    for ci, plane in enumerate(planes):
        hi, vi = samps[ci]
        gh, gw = mcuy * vi, mcux * hi
        g = np.zeros((gh, gw, 64), dtype=np.int64)
        for by in range(gh):
            for bx in range(gw):
                blk = _edge_tile(plane, by * 8, bx * 8)
                coefs = np.round(_DCT @ (blk - 128.0) @ _DCT.T).astype(np.int64)
                g[by, bx] = coefs.ravel()[_ZIGZAG]
        grids.append(g)
        cw = -(-w * hi // (8 * hmax))
        ch = -(-h * vi // (8 * vmax))
        nidims.append((ch, cw))

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" + struct.pack(
        ">HHBB", 1, 1, 0, 0
    )
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + b"\x01" * 64
    out += b"\xff\xc2" + struct.pack(">HBHHB", 8 + 3 * ncomp, 8, h, w, ncomp)
    for cid in range(1, ncomp + 1):
        hi, vi = samps[cid - 1]
        out += struct.pack("BBB", cid, (hi << 4) | vi, 0)
    for tc_th, bits, vals in (
        (0x00, _PROG_DC_BITS, _PROG_DC_VALS),
        (0x10, _PROG_AC_BITS, _PROG_AC_VALS),
    ):
        out += b"\xff\xc4" + struct.pack(">HB", 3 + 16 + len(vals), tc_th)
        out += bytes(bits) + bytes(vals)

    _, dc_enc = _canonical_codes(_PROG_DC_BITS, _PROG_DC_VALS)
    _, ac_enc = _canonical_codes(_PROG_AC_BITS, _PROG_AC_VALS)

    def sos_header(cis, ss, se, ah, al) -> bytes:
        hdr = struct.pack(">HB", 6 + 2 * len(cis), len(cis))
        for ci in cis:
            hdr += struct.pack("BB", ci + 1, 0x00)
        hdr += struct.pack("BBB", ss, se, (ah << 4) | al)
        return b"\xff\xda" + hdr

    def dc_scan(ah, al) -> bytes:
        bw = _BitWriter()
        preds = [0] * ncomp
        for my in range(mcuy):
            for mx in range(mcux):
                for ci in range(ncomp):
                    hi, vi = samps[ci]
                    for v in range(vi):
                        for hh in range(hi):
                            dc = int(grids[ci][my * vi + v, mx * hi + hh, 0])
                            if ah == 0:
                                val = dc >> al
                                diff = val - preds[ci]
                                preds[ci] = val
                                s = abs(diff).bit_length()
                                code, ln = dc_enc[s]
                                bw.write(code, ln)
                                if s:
                                    _emit_signed(bw, diff, s)
                            else:
                                bw.write((dc >> al) & 1, 1)
        bw.flush()
        return bytes(bw.out)

    def ac_scan(ci, ss, se, ah, al) -> bytes:
        bw = _BitWriter()
        st = _ProgEncState(bw, ac_enc)
        ch, cw = nidims[ci]
        for by in range(ch):
            for bx in range(cw):
                band = grids[ci][by, bx, ss : se + 1]
                if ah == 0:
                    _enc_ac_first(st, band, al)
                else:
                    _enc_ac_refine(st, band, al)
        st.flush()
        bw.flush()
        return bytes(bw.out)

    all_cis = list(range(ncomp))
    out += sos_header(all_cis, 0, 0, 0, 1) + dc_scan(0, 1)
    out += sos_header([0], 1, 5, 0, 1) + ac_scan(0, 1, 5, 0, 1)
    for ci in range(1, ncomp):  # chroma AC: full band, single pass
        out += sos_header([ci], 1, 63, 0, 0) + ac_scan(ci, 1, 63, 0, 0)
    out += sos_header([0], 6, 63, 0, 1) + ac_scan(0, 6, 63, 0, 1)
    out += sos_header([0], 1, 63, 1, 0) + ac_scan(0, 1, 63, 1, 0)
    out += sos_header(all_cis, 0, 0, 1, 0) + dc_scan(1, 0)
    out += b"\xff\xd9"
    return bytes(out)
