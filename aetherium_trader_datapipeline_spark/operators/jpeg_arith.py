"""Arithmetic-coded JPEG: SOF9 extended-sequential codec (no image libs).

Closes the "arithmetic entropy coding" gate in :func:`multimodal.
decode_jpeg_pixels` (the r8 verdict's last substantive codec item): a
pure-Python implementation of the ITU-T T.81 QM arithmetic coder
(Annex D) plus the sequential DC/AC statistical models (Annex F), both
directions, so `decode_image` handles SOF9 streams natively and tests
can fabricate them without PIL.

Design notes:

- The ENCODER keeps the code register C as a Python big integer and
  renormalizes bit-by-bit; carry propagation is then exact by
  construction (no BYTEOUT/bit-stack bookkeeping to get subtly wrong),
  and the final byte stream is simply the flushed register's binary
  expansion with the spec's 0xFF→0xFF 0x00 stuffing applied.  The
  DECODER is bit-fed from the de-stuffed stream and mirrors the
  interval arithmetic exactly (fast MPS path included), feeding zero
  bits past end-of-scan as the spec prescribes.
- The probability-estimation state machine is Table D.3 of the public
  T.81 spec (46+ chained Qe states across four fast-attack tiers plus
  the non-adapting ~0.5 "fixed" bin used for AC sign), transcribed
  here; index 113 is the fixed bin.  The container has no external
  conformance vectors, so the table's transcription is verified by the
  properties tests CAN enforce: encoder↔decoder bit-exact roundtrip
  through the full byte pipeline (carry and 0xFF paths included),
  monotone compression on skewed sources, and — the strong end-to-end
  check — SOF9 decode must equal baseline-Huffman SOF0 decode
  PIXEL-FOR-PIXEL for the same input, because arithmetic coding
  replaces only the entropy layer above an identical
  DCT/quantization pipeline.
- Statistical models and bin layout follow Annex F's conditioning:
  DC contexts classify the previous diff into zero/small±/large±
  (bounds L=0, U=1 unless a DAC segment overrides), magnitude
  categories chain from bin X1=20 with magnitude-low bits 14 bins
  later; AC keeps 3 bins per zigzag index (EOB / nonzero / first
  magnitude), sign in the fixed bin, and splits the category chain at
  Kx (default 5, DAC-overridable) between low- and high-frequency
  conditioning areas (bins 189 / 217).
- Restart markers byte-align the coder, reset ALL statistics areas and
  DC predictors, and cycle RST0–RST7 — same resync contract as the
  baseline/progressive tiers.

Scope: 8-bit SOF9, grayscale or 3-component 4:4:4 interleaved; DAC
parsing; DRI/RSTn.  SOF10 (progressive-arithmetic, grayscale — DC
first/refine and AC first/refine scans per Annex G over the same QM
coder, fresh statistics per scan) decodes via
:func:`decode_jpeg_arith_progressive`; lossless SOF3/SOF11 live in
:mod:`.jpeg_lossless`; hierarchical streams (incl. SOF9 base and
SOF13 differential frames over this module's block coders) live in
:mod:`.jpeg_hier`.

Reference parity note: the reference engine (2.4 kLoC Rust data
pipeline) has no image path at all; like the other codec tiers this
closes OUR multimodal surface (SURVEY §2 LLM-pipeline ops).
"""

from __future__ import annotations

import struct

from aetherium_trader_datapipeline_spark.operators._rasterguard import (
    MAX_DECODE_PIXELS,
    _check_raster,
)

# --- Table D.3: Qe value and probability estimation state machine ---------
# (qe, next_index_lps, next_index_mps, switch_mps) per state index.
# Four fast-attack tiers chained exactly as published; index 113 is the
# non-adapting fixed bin (transitions to itself, never switches).
_QM_TAB: tuple[tuple[int, int, int, int], ...] = (
    (0x5A1D, 1, 1, 1), (0x2586, 14, 2, 0), (0x1114, 16, 3, 0),
    (0x080B, 18, 4, 0), (0x03D8, 20, 5, 0), (0x01DA, 23, 6, 0),
    (0x00E5, 25, 7, 0), (0x006F, 28, 8, 0), (0x0036, 30, 9, 0),
    (0x001A, 33, 10, 0), (0x000D, 35, 11, 0), (0x0006, 9, 12, 0),
    (0x0003, 10, 13, 0), (0x0001, 12, 13, 0), (0x5A7F, 15, 15, 1),
    (0x3F25, 36, 16, 0), (0x2CF2, 38, 17, 0), (0x207C, 39, 18, 0),
    (0x17B9, 40, 19, 0), (0x1182, 42, 20, 0), (0x0CEF, 43, 21, 0),
    (0x09A1, 45, 22, 0), (0x072F, 46, 23, 0), (0x055C, 48, 24, 0),
    (0x0406, 49, 25, 0), (0x0303, 51, 26, 0), (0x0240, 52, 27, 0),
    (0x01B1, 54, 28, 0), (0x0144, 56, 29, 0), (0x00F5, 57, 30, 0),
    (0x00B7, 59, 31, 0), (0x008A, 60, 32, 0), (0x0068, 62, 33, 0),
    (0x004E, 63, 34, 0), (0x003B, 32, 35, 0), (0x002C, 33, 9, 0),
    (0x5AE1, 37, 37, 1), (0x484C, 64, 38, 0), (0x3A0D, 65, 39, 0),
    (0x2EF1, 67, 40, 0), (0x261F, 68, 41, 0), (0x1F33, 69, 42, 0),
    (0x19A8, 70, 43, 0), (0x1518, 72, 44, 0), (0x1177, 73, 45, 0),
    (0x0E74, 74, 46, 0), (0x0BFB, 75, 47, 0), (0x09F8, 77, 48, 0),
    (0x0861, 78, 49, 0), (0x0706, 79, 50, 0), (0x05CD, 48, 51, 0),
    (0x04DE, 50, 52, 0), (0x040F, 50, 53, 0), (0x0363, 51, 54, 0),
    (0x02D4, 52, 55, 0), (0x025C, 53, 56, 0), (0x01F8, 54, 57, 0),
    (0x01A4, 55, 58, 0), (0x0160, 56, 59, 0), (0x0125, 57, 60, 0),
    (0x00F6, 58, 61, 0), (0x00CB, 59, 62, 0), (0x00AB, 61, 63, 0),
    (0x008F, 61, 32, 0), (0x5B12, 65, 65, 1), (0x4D04, 80, 66, 0),
    (0x412C, 81, 67, 0), (0x37D8, 82, 68, 0), (0x2FE8, 83, 69, 0),
    (0x293C, 84, 70, 0), (0x2379, 86, 71, 0), (0x1EDF, 87, 72, 0),
    (0x1AA9, 87, 73, 0), (0x174E, 72, 74, 0), (0x1424, 72, 75, 0),
    (0x119C, 74, 76, 0), (0x0F6B, 74, 77, 0), (0x0D51, 75, 78, 0),
    (0x0BB6, 77, 79, 0), (0x0A40, 77, 48, 0), (0x5832, 80, 81, 1),
    (0x4D1C, 88, 82, 0), (0x438E, 89, 83, 0), (0x3BDD, 90, 84, 0),
    (0x34EE, 91, 85, 0), (0x2EAE, 92, 86, 0), (0x299A, 93, 87, 0),
    (0x2516, 86, 71, 0), (0x5570, 88, 89, 1), (0x4CA9, 95, 90, 0),
    (0x44D9, 96, 91, 0), (0x3E22, 97, 92, 0), (0x3824, 99, 93, 0),
    (0x32B4, 99, 94, 0), (0x2E17, 93, 86, 0), (0x56A8, 95, 96, 1),
    (0x4F46, 101, 97, 0), (0x47E5, 102, 98, 0), (0x41CF, 103, 99, 0),
    (0x3C3D, 104, 100, 0), (0x375E, 99, 93, 0), (0x5231, 105, 102, 0),
    (0x4C0F, 106, 103, 0), (0x4639, 107, 104, 0), (0x415E, 103, 99, 0),
    (0x5627, 105, 106, 1), (0x50E7, 108, 107, 0), (0x4B85, 109, 103, 0),
    (0x5597, 110, 109, 0), (0x504F, 111, 107, 0), (0x5A10, 110, 111, 1),
    (0x5522, 112, 109, 0), (0x59EB, 112, 111, 1),
    (0x5A1D, 113, 113, 0),  # 113: fixed, non-adapting ~equiprobable bin
)

_FIXED_BIN = 113


class QMEncoder:
    """T.81 Annex D encoder; C is a big integer so carries are exact."""

    def __init__(self) -> None:
        self.a = 0x10000
        self.c = 0
        self.shifts = 0

    def encode(self, bit: int, stats: bytearray, i: int) -> None:
        sv = stats[i]
        idx, mps = sv & 0x7F, sv >> 7
        qe, nlps, nmps, sw = _QM_TAB[idx]
        self.a -= qe
        if bit == mps:
            if self.a & 0x8000:
                return  # fast path: no renorm, no estimation update
            if self.a < qe:  # conditional exchange: MPS takes the upper part
                self.c += self.a
                self.a = qe
            stats[i] = (mps << 7) | nmps
        else:
            if self.a >= qe:  # normal LPS: upper subinterval of size qe
                self.c += self.a
                self.a = qe
            # else conditional exchange: LPS keeps the lower (larger) part
            if sw:
                mps ^= 1
            stats[i] = (mps << 7) | nlps
        while self.a < 0x8000:
            self.a <<= 1
            self.c <<= 1
            self.shifts += 1

    def flush(self) -> bytes:
        """Final interval selection (clear as many low bits as fit inside
        [C, C+A)), byte-align, strip trailing zeros, apply 0xFF stuffing."""
        t = (self.c + self.a - 1) & ~0xFFFF
        if t < self.c:
            t += 0x8000
        nbits = self.shifts + 16
        pad = (-nbits) % 8
        t <<= pad
        nbits += pad
        raw = t.to_bytes(nbits // 8, "big") if nbits else b""
        raw = raw.rstrip(b"\x00")  # decoder feeds zero bits past the end
        out = bytearray()
        for byte in raw:
            out.append(byte)
            if byte == 0xFF:
                out.append(0x00)
        return bytes(out)


class QMDecoder:
    """Bit-fed mirror of :class:`QMEncoder` (de-stuffs 0xFF 0x00; zero
    bits after end-of-data per the spec)."""

    def __init__(self, data: bytes, pos: int = 0) -> None:
        self.data = data
        self.pos = pos
        self.byte = 0
        self.nbits = 0
        self.a = 0x10000
        self.v = 0
        for _ in range(16):
            self.v = (self.v << 1) | self._bit()

    def _bit(self) -> int:
        if self.nbits == 0:
            b = self.data
            p = self.pos
            if p >= len(b):
                return 0
            cur = b[p]
            if cur == 0xFF:
                nxt = b[p + 1] if p + 1 < len(b) else 0xD9
                if nxt != 0x00:  # a real marker: end of entropy data
                    return 0
                self.pos = p + 2  # stuffed pair: deliver the 0xFF
            else:
                self.pos = p + 1
            self.byte = cur
            self.nbits = 8
        self.nbits -= 1
        return (self.byte >> self.nbits) & 1

    def decode(self, stats: bytearray, i: int) -> int:
        sv = stats[i]
        idx, mps = sv & 0x7F, sv >> 7
        qe, nlps, nmps, sw = _QM_TAB[idx]
        self.a -= qe
        if self.v < self.a:
            if self.a & 0x8000:
                return mps  # fast path
            if self.a < qe:  # conditional exchange: the lower part was LPS
                bit = mps ^ 1
                if sw:
                    mps ^= 1
                stats[i] = (mps << 7) | nlps
            else:
                bit = mps
                stats[i] = (mps << 7) | nmps
        else:
            self.v -= self.a
            exchange = self.a < qe
            self.a = qe
            if exchange:  # the upper part was MPS
                bit = mps
                stats[i] = (mps << 7) | nmps
            else:
                bit = mps ^ 1
                if sw:
                    mps ^= 1
                stats[i] = (mps << 7) | nlps
        while self.a < 0x8000:
            self.a <<= 1
            self.v = (self.v << 1) | self._bit()
        return bit


# --- Annex F sequential DC/AC statistical models ---------------------------

_DC_STAT_SIZE = 64
_AC_STAT_SIZE = 256
_DC_X1 = 20
_AC_X_LO = 189  # k <= Kx conditioning area
_AC_X_HI = 217


def _encode_magnitude(enc, stats, st, sz, x_bins, x0) -> int:
    """Shared DC/AC magnitude coding: category chain then low bits.
    Returns the category value m (0 for sz==1) for DC conditioning."""
    if sz == 1:
        enc.encode(0, stats, st)
        return 0
    enc.encode(1, stats, st)
    # category m = msb(sz - 1): sz in [m+1, 2m]
    r = sz - 1
    m = 1
    x = x0
    while (m << 1) <= r:
        enc.encode(1, x_bins, x)
        m <<= 1
        x += 1
    enc.encode(0, x_bins, x)
    low = r - m  # in [0, m)
    mm = m >> 1
    while mm:
        enc.encode(1 if (low & mm) else 0, x_bins, x + 14)
        mm >>= 1
    return m


def _decode_magnitude(dec, stats, st, x_bins, x0):
    """Mirror of _encode_magnitude: returns (sz, m)."""
    if dec.decode(stats, st) == 0:
        return 1, 0
    m = 1
    x = x0
    while dec.decode(x_bins, x):
        m <<= 1
        x += 1
        if m == 0x8000:
            raise ValueError("arithmetic magnitude overflow")
    v = m
    mm = m >> 1
    while mm:
        if dec.decode(x_bins, x + 14):
            v |= mm
        mm >>= 1
    return v + 1, m


class _SeqArithModel:
    """Per-scan state: statistics areas, DC contexts, conditioning."""

    def __init__(self, n_dc_tables: int, n_ac_tables: int, nc: int,
                 dc_cond=None, ac_cond=None) -> None:
        self.n_dc, self.n_ac, self.nc = n_dc_tables, n_ac_tables, nc
        self.dc_cond = dict(dc_cond or {})  # tbl -> (L, U)
        self.ac_cond = dict(ac_cond or {})  # tbl -> Kx
        self.reset()

    def reset(self) -> None:
        self.dc_stats = [bytearray(_DC_STAT_SIZE) for _ in range(self.n_dc)]
        self.ac_stats = [bytearray(_AC_STAT_SIZE) for _ in range(self.n_ac)]
        self.fixed = bytearray([_FIXED_BIN])
        self.dc_ctx = [0] * self.nc
        self.prev_dc = [0] * self.nc

    def bounds(self, tbl: int) -> tuple[int, int]:
        return self.dc_cond.get(tbl, (0, 1))

    def kx(self, tbl: int) -> int:
        return self.ac_cond.get(tbl, 5)

    def classify_dc(self, ci: int, tbl: int, sign: int, m: int) -> None:
        low, up = self.bounds(tbl)
        if m < (1 << low) >> 1:
            self.dc_ctx[ci] = 0
        elif m > (1 << up) >> 1:
            self.dc_ctx[ci] = 12 + sign * 4
        else:
            self.dc_ctx[ci] = 4 + sign * 4


def _encode_block(enc, model, ci, dc_tbl, ac_tbl, zz, dpcm: bool = True) -> None:
    """One 8x8 block's quantized zigzag coefficients → QM symbols.
    ``dpcm`` False = differential-frame convention (SOF13 in a
    hierarchical stream): the DC value is coded against a zero
    predictor instead of the previous block's DC."""
    dc = model.dc_stats[dc_tbl]
    st = model.dc_ctx[ci]
    diff = zz[0] - (model.prev_dc[ci] if dpcm else 0)
    if dpcm:
        model.prev_dc[ci] = zz[0]
    if diff == 0:
        enc.encode(0, dc, st)
        model.dc_ctx[ci] = 0
    else:
        enc.encode(1, dc, st)
        sign = 1 if diff < 0 else 0
        enc.encode(sign, dc, st + 1)
        m = _encode_magnitude(enc, dc, st + 2 + sign, abs(diff), dc, _DC_X1)
        model.classify_dc(ci, dc_tbl, sign, m)

    ac = model.ac_stats[ac_tbl]
    kx = model.kx(ac_tbl)
    ke = max((k for k in range(1, 64) if zz[k]), default=0)
    k = 1
    while k <= ke:
        st = 3 * (k - 1)
        enc.encode(0, ac, st)  # not EOB
        while zz[k] == 0:
            enc.encode(0, ac, st + 1)
            st += 3
            k += 1
        enc.encode(1, ac, st + 1)
        v = zz[k]
        sign = 1 if v < 0 else 0
        enc.encode(sign, model.fixed, 0)
        sz = -v if sign else v
        # first two magnitude decisions share bin st+2; the chain then
        # jumps to the k-conditioned area (Annex F.1.4.4.2)
        if sz == 1:
            enc.encode(0, ac, st + 2)
        else:
            enc.encode(1, ac, st + 2)
            r = sz - 1
            if r < 2:
                enc.encode(0, ac, st + 2)
                # sz == 2: no low bits (m == 1)
            else:
                enc.encode(1, ac, st + 2)
                m = 2
                x = _AC_X_LO if k <= kx else _AC_X_HI
                while (m << 1) <= r:
                    enc.encode(1, ac, x)
                    m <<= 1
                    x += 1
                enc.encode(0, ac, x)
                low = r - m
                mm = m >> 1
                while mm:
                    enc.encode(1 if (low & mm) else 0, ac, x + 14)
                    mm >>= 1
                k += 1
                continue
            # sz in (1, 2): low bits for m==1 are none; m==0 none
        k += 1
    if ke < 63:
        enc.encode(1, ac, 3 * (ke + 1 - 1))  # EOB at the next position


def _decode_block(dec, model, ci, dc_tbl, ac_tbl, dpcm: bool = True):
    """Mirror of _encode_block → 64 quantized zigzag coefficients."""
    zz = [0] * 64
    dc = model.dc_stats[dc_tbl]
    st = model.dc_ctx[ci]
    if dec.decode(dc, st) == 0:
        model.dc_ctx[ci] = 0
        zz[0] = model.prev_dc[ci] if dpcm else 0
    else:
        sign = dec.decode(dc, st + 1)
        sz, m = _decode_magnitude(dec, dc, st + 2 + sign, dc, _DC_X1)
        model.classify_dc(ci, dc_tbl, sign, m)
        v = -sz if sign else sz
        if dpcm:
            model.prev_dc[ci] += v
            zz[0] = model.prev_dc[ci]
        else:
            zz[0] = v

    ac = model.ac_stats[ac_tbl]
    kx = model.kx(ac_tbl)
    k = 1
    while k <= 63:
        st = 3 * (k - 1)
        if dec.decode(ac, st):  # EOB
            break
        while dec.decode(ac, st + 1) == 0:
            st += 3
            k += 1
            if k > 63:
                raise ValueError("AC run past block end")
        sign = dec.decode(model.fixed, 0)
        if dec.decode(ac, st + 2) == 0:
            sz = 1
        elif dec.decode(ac, st + 2) == 0:
            sz = 2
        else:
            m = 2
            x = _AC_X_LO if k <= kx else _AC_X_HI
            while dec.decode(ac, x):
                m <<= 1
                x += 1
                if m == 0x8000:
                    raise ValueError("arithmetic magnitude overflow")
            v = m
            mm = m >> 1
            while mm:
                if dec.decode(ac, x + 14):
                    v |= mm
                mm >>= 1
            sz = v + 1
        zz[k] = -sz if sign else sz
        k += 1
    return zz


# --- JPEG container layer ---------------------------------------------------


def _seg(marker: int, payload: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload


def _quantize_plane(plane2d):
    """Pad to 8x8 blocks (edge replication), FDCT, flat-_JPEG_Q quantize.
    Returns (block_cols, block_rows, {(by, bx): zigzag list})."""
    import numpy as np

    from aetherium_trader_datapipeline_spark.operators.multimodal import (
        _JPEG_Q,
        _ZZ,
        _dct_mat,
    )

    h, w = plane2d.shape
    bw, bh = -(-w // 8), -(-h // 8)
    padded = np.pad(plane2d, ((0, bh * 8 - h), (0, bw * 8 - w)), mode="edge")
    m = _dct_mat()
    blocks = {}
    for by in range(bh):
        for bx in range(bw):
            block = padded[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8].astype(float)
            coef = m @ (block - 128.0) @ m.T
            q = np.rint(coef / _JPEG_Q).astype(int)
            blocks[(by, bx)] = [int(q.flat[i]) for i in _ZZ]
    return bw, bh, blocks


def encode_jpeg_arith(width: int, height: int, pixels,
                      restart_interval: int = 0) -> bytes:
    """8-bit grayscale → SOF9 arithmetic-coded JFIF (same DCT/flat-quant
    pipeline as :func:`multimodal.encode_jpeg_baseline`, so pixel decode
    must agree with the baseline tier exactly)."""
    import numpy as np

    from aetherium_trader_datapipeline_spark.operators.multimodal import _JPEG_Q

    px = np.asarray(list(pixels) if not hasattr(pixels, "shape") else pixels,
                    dtype=np.uint8).reshape(height, width)
    bw, bh, blocks = _quantize_plane(px)
    model = _SeqArithModel(1, 1, 1)
    enc = QMEncoder()
    scan = bytearray()
    mcu_idx = 0
    rst_n = 0
    for by in range(bh):
        for bx in range(bw):
            if restart_interval and mcu_idx and mcu_idx % restart_interval == 0:
                scan += enc.flush()
                scan += bytes([0xFF, 0xD0 + rst_n])
                rst_n = (rst_n + 1) % 8
                enc = QMEncoder()
                model.reset()
            mcu_idx += 1
            _encode_block(enc, model, 0, 0, 0, blocks[(by, bx)])
    scan += enc.flush()
    qtab = bytes(_JPEG_Q for _ in range(64))
    dri = (_seg(0xDD, struct.pack(">H", restart_interval))
           if restart_interval else b"")
    return (
        b"\xff\xd8"
        + _seg(0xE0, b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00")
        + _seg(0xDB, b"\x00" + qtab)
        + _seg(0xCC, bytes([0x00, 0x10]))  # DAC: DC tbl 0, (U=1,L=0)
        + _seg(0xCC, bytes([0x10, 5]))  # DAC: AC tbl 0, Kx=5
        + _seg(0xC9, struct.pack(">BHHB", 8, height, width, 1) + b"\x01\x11\x00")
        + dri
        + _seg(0xDA, b"\x01\x01\x00\x00\x3f\x00")
        + bytes(scan)
        + b"\xff\xd9"
    )


def encode_jpeg_arith_color(width: int, height: int, y_px, cb_px, cr_px) -> bytes:
    """Three full-resolution planes (4:4:4) → SOF9: interleaved MCUs, DC
    conditioning per component, luma stats table 0 / chroma table 1."""
    import numpy as np

    from aetherium_trader_datapipeline_spark.operators.multimodal import _JPEG_Q

    planes = [
        np.asarray(list(p) if not hasattr(p, "shape") else p,
                   dtype=np.uint8).reshape(height, width)
        for p in (y_px, cb_px, cr_px)
    ]
    per_comp = [_quantize_plane(p) for p in planes]
    bw, bh = per_comp[0][0], per_comp[0][1]
    model = _SeqArithModel(2, 2, 3)
    enc = QMEncoder()
    tbl = [0, 1, 1]
    for by in range(bh):
        for bx in range(bw):
            for ci in range(3):
                _encode_block(enc, model, ci, tbl[ci], tbl[ci],
                              per_comp[ci][2][(by, bx)])
    scan = enc.flush()
    qtab = bytes(_JPEG_Q for _ in range(64))
    sof = struct.pack(">BHHB", 8, height, width, 3)
    sof += bytes([1, 0x11, 0]) + bytes([2, 0x11, 0]) + bytes([3, 0x11, 0])
    sos = bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 0x3F, 0])
    return (
        b"\xff\xd8"
        + _seg(0xE0, b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00")
        + _seg(0xDB, b"\x00" + qtab)
        + _seg(0xC9, sof)
        + _seg(0xDA, sos)
        + scan
        + b"\xff\xd9"
    )


def decode_jpeg_arith(b: bytes,
                      max_pixels: int | None = MAX_DECODE_PIXELS):
    """SOF9 byte stream → (h, w) or (h, w, 3) uint8, parsing DQT/DAC/DRI
    from the file itself.  Grayscale or 4:4:4 interleaved; restart
    markers reset coder + statistics + predictors.  Color conversion is
    the same BT.601 floor(x+0.5) as the baseline tier."""
    import numpy as np

    from aetherium_trader_datapipeline_spark.operators.multimodal import (
        _ZZ,
        _dct_mat,
    )

    if not b.startswith(b"\xff\xd8"):
        raise ValueError("not a JPEG")
    pos = 2
    qtabs: dict[int, list[int]] = {}
    dc_cond: dict[int, tuple[int, int]] = {}
    ac_cond: dict[int, int] = {}
    sof = None
    comp_spec = None
    scan_pos = None
    restart_interval = 0
    while pos + 4 <= len(b):
        if b[pos] != 0xFF:
            raise ValueError("marker desync")
        marker = b[pos + 1]
        if marker == 0xD9:
            break
        ln = struct.unpack(">H", b[pos + 2:pos + 4])[0]
        payload = b[pos + 4:pos + 2 + ln]
        if marker == 0xDB:
            i = 0
            while i < len(payload):
                pq, tq = payload[i] >> 4, payload[i] & 0xF
                if pq == 0:
                    qtabs[tq] = list(payload[i + 1:i + 65])
                    i += 65
                elif pq == 1:
                    vals = payload[i + 1:i + 129]
                    qtabs[tq] = [
                        (vals[2 * j] << 8) | vals[2 * j + 1] for j in range(64)
                    ]
                    i += 129
                else:
                    raise ValueError(f"bad DQT precision {pq}")
        elif marker == 0xCC:  # DAC
            i = 0
            while i + 1 < len(payload):
                tc, tb = payload[i] >> 4, payload[i] & 0xF
                cs = payload[i + 1]
                if tc == 0:
                    dc_cond[tb] = (cs & 0xF, cs >> 4)
                else:
                    ac_cond[tb] = cs
                i += 2
        elif marker == 0xC9:
            prec, h, w, nc = struct.unpack(">BHHB", payload[:6])
            _check_raster(w, h, max_pixels)

            if prec != 8:
                raise NotImplementedError("non-8-bit SOF9 precision")
            comps = []
            for ci in range(nc):
                cid, sampling, tq = payload[6 + 3 * ci:9 + 3 * ci]
                comps.append((cid, sampling >> 4, sampling & 0xF, tq))
            if any((hh, vv) != (1, 1) for _c, hh, vv, _t in comps):
                raise NotImplementedError("subsampled SOF9 (4:4:4 only)")
            if nc not in (1, 3):
                raise NotImplementedError(f"{nc}-component SOF9")
            sof = (h, w, comps)
        elif marker == 0xDD:
            restart_interval = struct.unpack(">H", payload[:2])[0]
        elif marker == 0xDA:
            ns = payload[0]
            comp_spec = [
                (payload[1 + 2 * ci], payload[2 + 2 * ci] >> 4,
                 payload[2 + 2 * ci] & 0xF)
                for ci in range(ns)
            ]
            scan_pos = pos + 2 + ln
            break
        pos += 2 + ln
    if sof is None or scan_pos is None or comp_spec is None:
        raise ValueError("missing SOF9/SOS")
    height, width, comps = sof
    nc = len(comps)
    if len(comp_spec) != nc:
        raise NotImplementedError("SOS component count != SOF (multi-scan)")
    n_dc = max(td for _s, td, _ta in comp_spec) + 1
    n_ac = max(ta for _s, _td, ta in comp_spec) + 1
    model = _SeqArithModel(n_dc, n_ac, nc, dc_cond, ac_cond)
    dec = QMDecoder(b, scan_pos)
    m = _dct_mat()
    quants = [np.array(qtabs[tq], dtype=float) for _c, _h, _v, tq in comps]
    bw, bh = -(-width // 8), -(-height // 8)
    planes = [np.zeros((bh * 8, bw * 8), dtype=np.uint8) for _ in range(nc)]
    mcu_idx = 0
    for by in range(bh):
        for bx in range(bw):
            if restart_interval and mcu_idx and mcu_idx % restart_interval == 0:
                # the encoder byte-aligned and emitted RSTn: find it from
                # the decoder's current byte position
                p = dec.pos
                while p + 1 < len(b) and not (
                    b[p] == 0xFF and 0xD0 <= b[p + 1] <= 0xD7
                ):
                    p += 1
                want = 0xD0 + (mcu_idx // restart_interval - 1) % 8
                if p + 1 >= len(b) or b[p + 1] != want:
                    raise ValueError("bad/missing RST marker")
                dec = QMDecoder(b, p + 2)
                model.reset()
            mcu_idx += 1
            for ci in range(nc):
                _sid, td, ta = comp_spec[ci]
                zz = _decode_block(dec, model, ci, td, ta)
                coef = np.zeros(64, dtype=float)
                for k in range(64):
                    coef[_ZZ[k]] = zz[k] * quants[ci][k]
                block = m.T @ coef.reshape(8, 8) @ m + 128.0
                planes[ci][by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] = np.clip(
                    np.rint(block), 0, 255
                ).astype(np.uint8)
    if nc == 1:
        return planes[0][:height, :width]
    y = planes[0][:height, :width].astype(np.float64)
    cb = planes[1][:height, :width].astype(np.float64) - 128.0
    cr = planes[2][:height, :width].astype(np.float64) - 128.0
    r = np.floor(y + 1.402 * cr + 0.5)
    g = np.floor(y - 0.344136 * cb - 0.714136 * cr + 0.5)
    bl = np.floor(y + 1.772 * cb + 0.5)
    return np.clip(np.stack([r, g, bl], axis=-1), 0, 255).astype(np.uint8)


# --- progressive-arithmetic JPEG (SOF10) ------------------------------------
# Annex G's successive-approximation models over the same QM coder: DC
# first/refine and AC first/refine scans, each scan with FRESH statistics
# areas and its own byte-aligned entropy segment.  Grayscale scope (the
# sequential tier covers color); bands and the AC approximation split are
# free parameters so tests can exercise every scan kind.


def _sm_shift(v: int, s: int) -> int:
    """Sign-magnitude point transform: T(v, s) = sign(v) * (|v| >> s).

    AC coefficients ONLY — T.81 G.1.2.2 specifies the AC point transform
    as a divide-toward-zero of the signed value.  The DC point transform
    (G.1.2.1) is an ARITHMETIC shift of the two's-complement value
    (Python's native ``>>``), with refine bits ``(DC >> a) & 1`` OR'd in
    on decode: a sign-magnitude DC transform loses the sign of any block
    whose quantized DC is negative with |DC| < 2^Al (a flat image of
    pixel value 126 at Al=1 decodes to 130)."""
    return -((-v) >> s) if v < 0 else v >> s


def _encode_dc_first(enc, model, ci, tbl, dc_scaled, prev) -> int:
    """One block's DC-first symbol stream (DPCM over Al-scaled values)."""
    dc = model.dc_stats[tbl]
    st = model.dc_ctx[ci]
    diff = dc_scaled - prev
    if diff == 0:
        enc.encode(0, dc, st)
        model.dc_ctx[ci] = 0
    else:
        enc.encode(1, dc, st)
        sign = 1 if diff < 0 else 0
        enc.encode(sign, dc, st + 1)
        m = _encode_magnitude(enc, dc, st + 2 + sign, abs(diff), dc, _DC_X1)
        model.classify_dc(ci, tbl, sign, m)
    return dc_scaled


def _decode_dc_first(dec, model, ci, tbl) -> int:
    """Mirror: returns the new Al-scaled DC predictor value."""
    dc = model.dc_stats[tbl]
    st = model.dc_ctx[ci]
    if dec.decode(dc, st) == 0:
        model.dc_ctx[ci] = 0
        return model.prev_dc[ci]
    sign = dec.decode(dc, st + 1)
    sz, m = _decode_magnitude(dec, dc, st + 2 + sign, dc, _DC_X1)
    model.classify_dc(ci, tbl, sign, m)
    model.prev_dc[ci] += -sz if sign else sz
    return model.prev_dc[ci]


def _encode_ac_first(enc, model, tbl, zz, ss, se, al) -> None:
    """AC band scan at approximation Al over one block."""
    ac = model.ac_stats[tbl]
    kx = model.kx(tbl)
    vals = {k: _sm_shift(zz[k], al) for k in range(ss, se + 1)}
    ke = max((k for k in range(ss, se + 1) if vals[k]), default=ss - 1)
    k = ss
    while k <= ke:
        st = 3 * (k - 1)
        enc.encode(0, ac, st)
        while vals[k] == 0:
            enc.encode(0, ac, st + 1)
            st += 3
            k += 1
        enc.encode(1, ac, st + 1)
        v = vals[k]
        sign = 1 if v < 0 else 0
        enc.encode(sign, model.fixed, 0)
        sz = -v if sign else v
        if sz == 1:
            enc.encode(0, ac, st + 2)
        else:
            enc.encode(1, ac, st + 2)
            r = sz - 1
            if r < 2:
                enc.encode(0, ac, st + 2)
            else:
                enc.encode(1, ac, st + 2)
                m = 2
                x = _AC_X_LO if k <= kx else _AC_X_HI
                while (m << 1) <= r:
                    enc.encode(1, ac, x)
                    m <<= 1
                    x += 1
                enc.encode(0, ac, x)
                low = r - m
                mm = m >> 1
                while mm:
                    enc.encode(1 if (low & mm) else 0, ac, x + 14)
                    mm >>= 1
        k += 1
    if ke < se:
        enc.encode(1, ac, 3 * (ke + 1 - 1))


def _decode_ac_first(dec, model, tbl, coefs, ss, se, al) -> None:
    """Mirror of _encode_ac_first; writes v << al into ``coefs``."""
    ac = model.ac_stats[tbl]
    kx = model.kx(tbl)
    k = ss
    while k <= se:
        st = 3 * (k - 1)
        if dec.decode(ac, st):
            break
        while dec.decode(ac, st + 1) == 0:
            st += 3
            k += 1
            if k > se:
                raise ValueError("AC run past band end")
        sign = dec.decode(model.fixed, 0)
        if dec.decode(ac, st + 2) == 0:
            sz = 1
        elif dec.decode(ac, st + 2) == 0:
            sz = 2
        else:
            m = 2
            x = _AC_X_LO if k <= kx else _AC_X_HI
            while dec.decode(ac, x):
                m <<= 1
                x += 1
                if m == 0x8000:
                    raise ValueError("arithmetic magnitude overflow")
            v = m
            mm = m >> 1
            while mm:
                if dec.decode(ac, x + 14):
                    v |= mm
                mm >>= 1
            sz = v + 1
        coefs[k] = (-sz if sign else sz) << al
        k += 1


def _encode_ac_refine(enc, model, tbl, zz, ss, se, al) -> None:
    """AC successive-approximation refinement scan (Ah = Al+1 -> Al)."""
    ac = model.ac_stats[tbl]
    cur = {k: _sm_shift(zz[k], al) for k in range(ss, se + 1)}
    prv = {k: _sm_shift(zz[k], al + 1) for k in range(ss, se + 1)}
    ke = max((k for k in range(ss, se + 1) if cur[k]), default=ss - 1)
    kex = max((k for k in range(ss, se + 1) if prv[k]), default=ss - 1)
    k = ss
    while k <= ke:
        st = 3 * (k - 1)
        if k > kex:
            enc.encode(0, ac, st)  # EOB decision only beyond prior stage
        while True:
            if prv[k]:  # previously nonzero: send the refinement bit
                enc.encode(abs(cur[k]) & 1, ac, st + 2)
                break
            if cur[k]:  # newly nonzero at this stage: must be +-1
                enc.encode(1, ac, st + 1)
                enc.encode(1 if cur[k] < 0 else 0, model.fixed, 0)
                break
            enc.encode(0, ac, st + 1)
            st += 3
            k += 1
        k += 1
    if ke < se:
        enc.encode(1, ac, 3 * (ke + 1 - 1))


def _decode_ac_refine(dec, model, tbl, coefs, ss, se, al) -> None:
    """Mirror of _encode_ac_refine over the decoder's accumulated
    coefficients (which hold exactly the prior-stage values << (al+1))."""
    ac = model.ac_stats[tbl]
    p1 = 1 << al
    m1 = -1 << al
    kex = max((k for k in range(ss, se + 1) if coefs[k]), default=ss - 1)
    k = ss
    while k <= se:
        st = 3 * (k - 1)
        if k > kex:
            if dec.decode(ac, st):
                break
        while True:
            if coefs[k]:
                if dec.decode(ac, st + 2):
                    coefs[k] += m1 if coefs[k] < 0 else p1
                break
            if dec.decode(ac, st + 1):
                coefs[k] = m1 if dec.decode(model.fixed, 0) else p1
                break
            st += 3
            k += 1
            if k > se:
                raise ValueError("AC refine run past band end")
        k += 1


def encode_jpeg_arith_progressive(width: int, height: int, pixels,
                                  al: int = 1,
                                  bands=((1, 5), (6, 63)),
                                  ac_al: int = 1) -> bytes:
    """8-bit grayscale → SOF10: DC first at Al=``al`` + ``al`` DC-refine
    scans, then per band an AC-first scan at Al=``ac_al`` followed by
    ``ac_al`` AC-refine scans.  Same DCT/flat-quant pipeline as the
    other tiers, so decode must equal the baseline decode exactly."""
    import numpy as np

    from aetherium_trader_datapipeline_spark.operators.multimodal import _JPEG_Q

    px = np.asarray(list(pixels) if not hasattr(pixels, "shape") else pixels,
                    dtype=np.uint8).reshape(height, width)
    bw, bh, blocks = _quantize_plane(px)
    order = [(by, bx) for by in range(bh) for bx in range(bw)]

    def scan_seg(ss, se, ah, al_s, body: bytes) -> bytes:
        hdr = bytes([1, 1, 0x00, ss, se, (ah << 4) | al_s])
        return _seg(0xDA, hdr) + body

    out = bytearray()
    out += b"\xff\xd8"
    out += _seg(0xE0, b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(0xDB, b"\x00" + bytes(_JPEG_Q for _ in range(64)))
    out += _seg(0xCA, struct.pack(">BHHB", 8, height, width, 1) + b"\x01\x11\x00")

    # DC first
    enc = QMEncoder()
    model = _SeqArithModel(1, 1, 1)
    prev = 0
    for pos_ in order:
        # DC point transform is an ARITHMETIC shift of the two's-complement
        # value (T.81 G.1.2.1) — NOT the sign-magnitude _sm_shift AC uses:
        # sign-magnitude loses the sign of any DC with |DC| < 2^Al.
        prev = _encode_dc_first(enc, model, 0, 0, blocks[pos_][0] >> al, prev)
    out += scan_seg(0, 0, 0, al, enc.flush())
    # DC refine scans (one per remaining bit), fixed bin per spec; refine
    # bits are bits of the two's-complement value, OR'd in on decode
    for a in range(al - 1, -1, -1):
        enc = QMEncoder()
        model = _SeqArithModel(1, 1, 1)
        for pos_ in order:
            enc.encode((blocks[pos_][0] >> a) & 1, model.fixed, 0)
        out += scan_seg(0, 0, a + 1, a, enc.flush())
    # AC band scans
    for ss, se in bands:
        enc = QMEncoder()
        model = _SeqArithModel(1, 1, 1)
        for pos_ in order:
            _encode_ac_first(enc, model, 0, blocks[pos_], ss, se, ac_al)
        out += scan_seg(ss, se, 0, ac_al, enc.flush())
        for a in range(ac_al - 1, -1, -1):
            enc = QMEncoder()
            model = _SeqArithModel(1, 1, 1)
            for pos_ in order:
                _encode_ac_refine(enc, model, 0, blocks[pos_], ss, se, a)
            out += scan_seg(ss, se, a + 1, a, enc.flush())
    out += b"\xff\xd9"
    return bytes(out)


def decode_jpeg_arith_progressive(
        b: bytes, max_pixels: int | None = MAX_DECODE_PIXELS):
    """SOF10 multi-scan decode → (h, w) uint8 (grayscale scope)."""
    import numpy as np

    from aetherium_trader_datapipeline_spark.operators.multimodal import (
        _ZZ,
        _dct_mat,
        _next_marker,
    )

    if not b.startswith(b"\xff\xd8"):
        raise ValueError("not a JPEG")
    pos = 2
    qtabs: dict[int, list[int]] = {}
    dc_cond: dict[int, tuple[int, int]] = {}
    ac_cond: dict[int, int] = {}
    sof = None
    coefs = None
    order = None
    while pos + 4 <= len(b):
        if b[pos] != 0xFF:
            raise ValueError("marker desync")
        marker = b[pos + 1]
        if marker == 0xD9:
            break
        ln = struct.unpack(">H", b[pos + 2:pos + 4])[0]
        payload = b[pos + 4:pos + 2 + ln]
        if marker == 0xDB:
            i = 0
            while i < len(payload):
                pq, tq = payload[i] >> 4, payload[i] & 0xF
                if pq == 0:
                    qtabs[tq] = list(payload[i + 1:i + 65])
                    i += 65
                else:
                    vals = payload[i + 1:i + 129]
                    qtabs[tq] = [(vals[2 * j] << 8) | vals[2 * j + 1]
                                 for j in range(64)]
                    i += 129
        elif marker == 0xCC:
            i = 0
            while i + 1 < len(payload):
                tc, tb = payload[i] >> 4, payload[i] & 0xF
                cs = payload[i + 1]
                if tc == 0:
                    dc_cond[tb] = (cs & 0xF, cs >> 4)
                else:
                    ac_cond[tb] = cs
                i += 2
        elif marker == 0xCA:
            prec, h, w, nc = struct.unpack(">BHHB", payload[:6])
            _check_raster(w, h, max_pixels)

            if prec != 8 or nc != 1:
                raise NotImplementedError("SOF10 scope: 8-bit grayscale")
            tq = payload[8]
            sof = (h, w, tq)
            bw, bh = -(-w // 8), -(-h // 8)
            order = [(by, bx) for by in range(bh) for bx in range(bw)]
            coefs = {p: [0] * 64 for p in order}
        elif marker == 0xDA:
            if sof is None:
                raise ValueError("SOS before SOF10")
            ns = payload[0]
            td, ta = payload[2] >> 4, payload[2] & 0xF
            ss, se = payload[1 + 2 * ns], payload[2 + 2 * ns]
            ahal = payload[3 + 2 * ns]
            ah, al_s = ahal >> 4, ahal & 0xF
            if (ss == 0) != (se == 0) or se > 63 or (ss and ss > se):
                # e.g. a sequential 0..63 header inside a SOF10 frame —
                # progressive scans are either DC (0,0) or a pure AC band
                raise ValueError("illegal progressive scan header")
            scan_pos = pos + 2 + ln
            dec = QMDecoder(b, scan_pos)
            model = _SeqArithModel(1, 1, 1, dc_cond, ac_cond)
            if ss == 0:  # DC scan
                if ah == 0:
                    for p in order:
                        v = _decode_dc_first(dec, model, 0, td)
                        coefs[p][0] = v << al_s
                else:
                    # refine bit is bit al_s of the two's-complement DC:
                    # OR it in (Python ints are infinite two's complement,
                    # so | works for negative accumulators too)
                    p1 = 1 << al_s
                    for p in order:
                        if dec.decode(model.fixed, 0):
                            coefs[p][0] |= p1
            else:
                for p in order:
                    if ah == 0:
                        _decode_ac_first(dec, model, ta, coefs[p], ss, se,
                                         al_s)
                    else:
                        _decode_ac_refine(dec, model, ta, coefs[p], ss, se,
                                          al_s)
            pos = _next_marker(b, dec.pos)
            continue
        pos += 2 + ln
    if sof is None or coefs is None:
        raise ValueError("missing SOF10/SOS")
    height, width, tq = sof
    quant = np.array(qtabs[tq], dtype=float)
    m = _dct_mat()
    bw, bh = -(-width // 8), -(-height // 8)
    plane = np.zeros((bh * 8, bw * 8), dtype=np.uint8)
    for (by, bx), zz in coefs.items():
        coef = np.zeros(64, dtype=float)
        for k in range(64):
            coef[_ZZ[k]] = zz[k] * quant[k]
        block = m.T @ coef.reshape(8, 8) @ m + 128.0
        plane[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] = np.clip(
            np.rint(block), 0, 255
        ).astype(np.uint8)
    return plane[:height, :width]
