"""Hierarchical JPEG (Annex J): DHP + EXP + differential frames.

The last JPEG mode family the repo gated: a hierarchical stream is a
PYRAMID — a DHP segment declaring the final dimensions, a
non-differential first frame (here SOF0 at half resolution), then
differential frames that refine a REFERENCE image: an EXP segment
doubles the reference via the spec's (a+b+1)>>1 interpolation, and each
differential frame (here SOF5 — differential sequential Huffman) codes
the RESIDUAL original-minus-reference with no level shift and DC
predicted from zero, added back on decode.

Scope: 8-bit grayscale, two levels (half-res base + one expanded
full-res differential), flat quantization per frame (step 16 base /
step 2 residual — the orthonormal DCT bounds residual coefficients by
8·255/2 < 2^10, inside the canonical tables' category range).  The
byte stream is a fully-formed interchange file: SOI, DHP, tables,
SOF0 frame, EXP, tables, SOF5 frame, EOI.

Test contract: hierarchical refinement must (a) reconstruct within the
residual stage's quantization error of the ORIGINAL (max |err| <= 3 on
arbitrary content — two rounding stages of step-2 flat quant), which is
far tighter than the base frame alone on sharp content, and (b) the
decoder's base-only and refined outputs are both produced by the same
marker walk the other tiers use.

Reference parity note: the reference engine has no image path; this
completes OUR multimodal decode matrix — with this module (including
the SOF9/SOF13 arithmetic frame pair below) every frame type of T.81
the repo's encoders can fabricate decodes natively; only differential
progressive/lossless frames (SOF6/7/14/15) stay gated, and those are
emitted by no known codec.
"""

from __future__ import annotations

import struct

from aetherium_trader_datapipeline_spark.operators._rasterguard import (
    MAX_DECODE_PIXELS,
    _check_raster,
)


def _seg(marker: int, payload: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload


def _expand2x(ref):
    """T.81 J.1.1.2 expansion: out[2i] = v[i], out[2i+1] =
    (v[i] + v[i+1] + 1) >> 1 (edge replicated) — horizontal then
    vertical.  Operates on int arrays (reference may hold residual
    sums outside [0, 255] mid-pyramid)."""
    import numpy as np

    def exp1(a):  # along axis 1
        left = a
        right = np.concatenate([a[:, 1:], a[:, -1:]], axis=1)
        odd = (left + right + 1) >> 1
        out = np.empty((a.shape[0], a.shape[1] * 2), dtype=a.dtype)
        out[:, 0::2] = left
        out[:, 1::2] = odd
        return out

    r = exp1(ref.astype("int64"))
    return exp1(r.T).T


def _box_down2(px):
    """Encoder-side downsample (not standardized by the spec): 2x2 mean
    with edge padding to even dims."""
    import numpy as np

    h, w = px.shape
    p = np.pad(px.astype("int64"), ((0, h % 2), (0, w % 2)), mode="edge")
    return (p[0::2, 0::2] + p[0::2, 1::2] + p[1::2, 0::2] + p[1::2, 1::2] + 2) >> 2


def _encode_frame_gray(plane, q_step: int, level_shift: bool,
                       dpcm_dc: bool) -> bytes:
    """One grayscale frame's entropy scan (no markers): FDCT / flat
    quant / zigzag / canonical Huffman.  ``dpcm_dc`` False = differential
    frame convention (DC predicted from zero every block)."""
    import numpy as np

    from aetherium_trader_datapipeline_spark.operators.multimodal import (
        _AC_BITS,
        _AC_VALS,
        _BitWriter,
        _DC_BITS,
        _DC_VALS,
        _ZZ,
        _canonical_codes,
        _category,
        _dct_mat,
    )

    h, w = plane.shape
    bw, bh = -(-w // 8), -(-h // 8)
    padded = np.pad(plane, ((0, bh * 8 - h), (0, bw * 8 - w)), mode="edge")
    m = _dct_mat()
    dc_codes = _canonical_codes(_DC_BITS, _DC_VALS)
    ac_codes = _canonical_codes(_AC_BITS, _AC_VALS)
    wtr = _BitWriter()
    prev_dc = 0
    for by in range(bh):
        for bx in range(bw):
            block = padded[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8].astype(float)
            if level_shift:
                block = block - 128.0
            coef = m @ block @ m.T
            q = np.rint(coef / q_step).astype(int)
            zz = [int(q.flat[i]) for i in _ZZ]
            diff = zz[0] - (prev_dc if dpcm_dc else 0)
            if dpcm_dc:
                prev_dc = zz[0]
            s = _category(diff)
            code, length = dc_codes[s]
            wtr.write(code, length)
            if s:
                wtr.write(diff if diff > 0 else diff + (1 << s) - 1, s)
            run = 0
            last_nz = max((i for i in range(1, 64) if zz[i]), default=0)
            for i in range(1, last_nz + 1):
                v = zz[i]
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    code, length = ac_codes[0xF0]
                    wtr.write(code, length)
                    run -= 16
                s = _category(v)
                code, length = ac_codes[(run << 4) | s]
                wtr.write(code, length)
                wtr.write(v if v > 0 else v + (1 << s) - 1, s)
                run = 0
            if last_nz < 63:
                code, length = ac_codes[0x00]
                wtr.write(code, length)
    return wtr.flush()


def _decode_frame_gray(b: bytes, scan_pos: int, h: int, w: int, q_step: int,
                       level_shift: bool, dpcm_dc: bool,
                       dc_tab, ac_tab):
    """Mirror of _encode_frame_gray → (int64 plane, next_pos)."""
    import numpy as np

    from aetherium_trader_datapipeline_spark.operators.multimodal import (
        _BitReader,
        _decode_huffman,
        _extend,
        _dct_mat,
        _next_marker,
        _ZZ,
    )

    bw, bh = -(-w // 8), -(-h // 8)
    m = _dct_mat()
    out = np.zeros((bh * 8, bw * 8), dtype=np.int64)
    reader = _BitReader(b, scan_pos)
    prev_dc = 0
    for by in range(bh):
        for bx in range(bw):
            zz = np.zeros(64, dtype=float)
            s = _decode_huffman(reader, dc_tab)
            diff = _extend(reader.read_bits(s), s) if s else 0
            if dpcm_dc:
                prev_dc += diff
                zz[0] = prev_dc
            else:
                zz[0] = diff
            i = 1
            while i < 64:
                sym = _decode_huffman(reader, ac_tab)
                if sym == 0x00:
                    break
                if sym == 0xF0:
                    i += 16
                    continue
                run, size = sym >> 4, sym & 0xF
                i += run
                if i > 63:
                    raise ValueError("AC run past block end")
                zz[i] = _extend(reader.read_bits(size), size)
                i += 1
            coef = np.zeros(64, dtype=float)
            for k in range(64):
                coef[_ZZ[k]] = zz[k] * q_step
            block = m.T @ coef.reshape(8, 8) @ m
            if level_shift:
                block = block + 128.0
            out[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] = np.rint(block).astype(
                np.int64
            )
    return out[:h, :w], _next_marker(b, reader.pos)


_BASE_Q = 16
_DIFF_Q = 2


def encode_jpeg_hierarchical(width: int, height: int, pixels) -> bytes:
    """8-bit grayscale → two-level hierarchical stream (DHP, half-res
    SOF0 base, EXP, full-res SOF5 differential).  The encoder simulates
    the decoder's base reconstruction so the residual it codes is
    exactly what the decoder will correct."""
    import numpy as np

    from aetherium_trader_datapipeline_spark.operators.multimodal import (
        _AC_BITS,
        _AC_VALS,
        _DC_BITS,
        _DC_VALS,
    )

    px = np.asarray(list(pixels) if not hasattr(pixels, "shape") else pixels,
                    dtype=np.uint8).reshape(height, width)
    half = _box_down2(px)
    hh, hw = half.shape

    base_scan = _encode_frame_gray(half, _BASE_Q, True, True)

    # simulate the decoder's base reconstruction (round-trip the scan
    # through our own frame decoder for bit-exact agreement)
    def tab(bits, vals):
        table = {}
        code, k = 0, 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                table[(length, code)] = vals[k]
                code += 1
                k += 1
            code <<= 1
        return table

    dc_tab, ac_tab = tab(_DC_BITS, _DC_VALS), tab(_AC_BITS, _AC_VALS)
    base_recon, _ = _decode_frame_gray(
        base_scan + b"\xff\xd9", 0, hh, hw, _BASE_Q, True, True, dc_tab, ac_tab
    )
    base_recon = np.clip(base_recon, 0, 255)  # spec clamps reference frames
    ref = _expand2x(base_recon)[:height, :width]
    resid = px.astype(np.int64) - ref

    diff_scan = _encode_frame_gray(resid, _DIFF_Q, False, False)

    qtab = bytes([_BASE_Q] * 64)
    qtab2 = bytes([_DIFF_Q] * 64)
    return (
        b"\xff\xd8"
        + _seg(0xDE, struct.pack(">BHHB", 8, height, width, 1) + b"\x01\x11\x00")
        + _seg(0xDB, b"\x00" + qtab)
        + _seg(0xC4, b"\x00" + bytes(_DC_BITS) + bytes(_DC_VALS))
        + _seg(0xC4, b"\x10" + bytes(_AC_BITS) + bytes(_AC_VALS))
        + _seg(0xC0, struct.pack(">BHHB", 8, hh, hw, 1) + b"\x01\x11\x00")
        + _seg(0xDA, b"\x01\x01\x00\x00\x3f\x00")
        + base_scan
        + _seg(0xDF, b"\x11")  # EXP: expand reference 2x horizontally+vertically
        + _seg(0xDB, b"\x01" + qtab2)
        + _seg(0xC5, struct.pack(">BHHB", 8, height, width, 1) + b"\x01\x11\x01")
        + _seg(0xDA, b"\x01\x01\x00\x00\x3f\x00")
        + diff_scan
        + b"\xff\xd9"
    )


def decode_jpeg_hierarchical(
        b: bytes, max_pixels: int | None = MAX_DECODE_PIXELS):
    """Hierarchical stream → (h, w) uint8: walks DHP / frames / EXP,
    maintaining the reference image across frames."""
    import numpy as np

    if not b.startswith(b"\xff\xd8"):
        raise ValueError("not a JPEG")
    pos = 2
    qtabs: dict[int, int] = {}  # flat step per table id (scope: flat tables)
    htabs: dict[tuple[int, int], dict] = {}
    final = None  # (h, w) from DHP
    ref = None
    pending_exp = False
    cur_frame = None  # (marker, h, w, tq)
    while pos + 4 <= len(b):
        if b[pos] != 0xFF:
            raise ValueError("marker desync")
        marker = b[pos + 1]
        if marker == 0xD9:
            break
        ln = struct.unpack(">H", b[pos + 2:pos + 4])[0]
        payload = b[pos + 4:pos + 2 + ln]
        if marker == 0xDE:  # DHP: final dimensions
            _prec, h, w, _nc = struct.unpack(">BHHB", payload[:6])
            final = (h, w)
        elif marker == 0xDB:
            i = 0
            while i < len(payload):
                pq, tq = payload[i] >> 4, payload[i] & 0xF
                vals = list(payload[i + 1:i + 65])
                if pq != 0:
                    raise NotImplementedError("16-bit DQT in hierarchical")
                if len(set(vals)) != 1:
                    raise NotImplementedError(
                        "non-flat quant in hierarchical scope"
                    )
                qtabs[tq] = vals[0]
                i += 65
        elif marker == 0xC4:
            i = 0
            while i < len(payload):
                tc, th = payload[i] >> 4, payload[i] & 0xF
                bits = list(payload[i + 1:i + 17])
                nval = sum(bits)
                vals = list(payload[i + 17:i + 17 + nval])
                table = {}
                code, k = 0, 0
                for length in range(1, 17):
                    for _ in range(bits[length - 1]):
                        table[(length, code)] = vals[k]
                        code += 1
                        k += 1
                    code <<= 1
                htabs[(tc, th)] = table
                i += 17 + nval
        elif marker == 0xDF:  # EXP
            # payload[0] = (Eh << 4) | Ev.  Scope: expand-2x both ways —
            # a foreign stream with Eh != Ev must fail loudly, not
            # silently mis-expand the reference frame (B.3.3).
            if not payload:
                raise ValueError("EXP segment missing Eh/Ev payload byte")
            eh, ev = payload[0] >> 4, payload[0] & 0xF
            if (eh, ev) != (1, 1):
                raise NotImplementedError(
                    f"hierarchical scope: EXP expand-2x only, got Eh={eh} Ev={ev}"
                )
            pending_exp = True
        elif marker in (0xC0, 0xC5, 0xC9, 0xCD):
            prec, h, w, nc = struct.unpack(">BHHB", payload[:6])
            if prec != 8 or nc != 1:
                raise NotImplementedError("hierarchical scope: 8-bit gray")
            # per-frame raster cap: the top-level guard only sees the
            # (small) BASE frame's SOF, but EXP doubling lets a crafted
            # stream declare arbitrarily larger differential frames
            # further in — bound every frame's allocation here
            _check_raster(w, h, max_pixels)
            tq = payload[8]
            cur_frame = (marker, h, w, tq)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC6, 0xC7,
                        0xCA, 0xCB, 0xCE, 0xCF):
            raise NotImplementedError(
                "hierarchical scope: SOF0/SOF9 base + SOF5/SOF13 differential"
            )
        elif marker == 0xDA:
            if cur_frame is None:
                raise ValueError("SOS before SOF in hierarchical stream")
            fmarker, h, w, tq = cur_frame
            td, ta = payload[2] >> 4, payload[2] & 0xF
            differential = fmarker in (0xC5, 0xCD)
            arith = fmarker in (0xC9, 0xCD)
            if pending_exp:
                if ref is None:
                    raise ValueError("EXP before any reference frame")
                ref = _expand2x(ref)[:h, :w]
                pending_exp = False
            if arith:
                plane, pos = _decode_frame_gray_arith(
                    b, pos + 2 + ln, h, w, qtabs[tq], not differential,
                    not differential
                )
            else:
                plane, pos = _decode_frame_gray(
                    b, pos + 2 + ln, h, w, qtabs[tq], not differential,
                    not differential, htabs[(0, td)], htabs[(1, ta)]
                )
            if differential:
                if ref is None:
                    raise ValueError("differential frame without reference")
                if ref.shape != plane.shape:
                    raise ValueError("differential frame/reference mismatch")
                ref = ref + plane
            else:
                ref = np.clip(plane, 0, 255)  # clamp reference components
            cur_frame = None
            continue
        pos += 2 + ln
    if ref is None:
        raise ValueError("no frames decoded")
    if final is not None:
        ref = ref[:final[0], :final[1]]
    return np.clip(ref, 0, 255).astype(np.uint8)


# --- arithmetic-coded frames inside hierarchical streams --------------------
# SOF9 as the non-differential base + SOF13 (differential sequential
# arithmetic) as the refinement — the dpcm=False convention in
# .jpeg_arith codes each block's DC against a zero predictor, which is
# exactly the differential-frame rule.  With these, every T.81 frame
# type the tests can fabricate decodes natively.


def _encode_frame_gray_arith(plane, q_step: int, level_shift: bool,
                             dpcm: bool) -> bytes:
    import numpy as np

    from aetherium_trader_datapipeline_spark.operators.jpeg_arith import (
        QMEncoder,
        _encode_block,
        _SeqArithModel,
    )
    from aetherium_trader_datapipeline_spark.operators.multimodal import (
        _ZZ,
        _dct_mat,
    )

    h, w = plane.shape
    bw, bh = -(-w // 8), -(-h // 8)
    padded = np.pad(plane, ((0, bh * 8 - h), (0, bw * 8 - w)), mode="edge")
    m = _dct_mat()
    enc = QMEncoder()
    model = _SeqArithModel(1, 1, 1)
    for by in range(bh):
        for bx in range(bw):
            block = padded[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8].astype(float)
            if level_shift:
                block = block - 128.0
            coef = m @ block @ m.T
            q = np.rint(coef / q_step).astype(int)
            zz = [int(q.flat[i]) for i in _ZZ]
            _encode_block(enc, model, 0, 0, 0, zz, dpcm=dpcm)
    return enc.flush()


def _decode_frame_gray_arith(b: bytes, scan_pos: int, h: int, w: int,
                             q_step: int, level_shift: bool, dpcm: bool):
    import numpy as np

    from aetherium_trader_datapipeline_spark.operators.jpeg_arith import (
        QMDecoder,
        _decode_block,
        _SeqArithModel,
    )
    from aetherium_trader_datapipeline_spark.operators.multimodal import (
        _ZZ,
        _dct_mat,
        _next_marker,
    )

    bw, bh = -(-w // 8), -(-h // 8)
    m = _dct_mat()
    out = np.zeros((bh * 8, bw * 8), dtype=np.int64)
    dec = QMDecoder(b, scan_pos)
    model = _SeqArithModel(1, 1, 1)
    for by in range(bh):
        for bx in range(bw):
            zz = _decode_block(dec, model, 0, 0, 0, dpcm=dpcm)
            coef = np.zeros(64, dtype=float)
            for k in range(64):
                coef[_ZZ[k]] = zz[k] * q_step
            block = m.T @ coef.reshape(8, 8) @ m
            if level_shift:
                block = block + 128.0
            out[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] = np.rint(block).astype(
                np.int64
            )
    return out[:h, :w], _next_marker(b, dec.pos)


def encode_jpeg_hierarchical_arith(width: int, height: int, pixels) -> bytes:
    """Two-level hierarchical stream with ARITHMETIC entropy coding:
    DHP, half-res SOF9 base, EXP, full-res SOF13 differential."""
    import numpy as np

    px = np.asarray(list(pixels) if not hasattr(pixels, "shape") else pixels,
                    dtype=np.uint8).reshape(height, width)
    half = _box_down2(px)
    hh, hw = half.shape
    base_scan = _encode_frame_gray_arith(half, _BASE_Q, True, True)
    base_recon, _ = _decode_frame_gray_arith(
        base_scan + b"\xff\xd9", 0, hh, hw, _BASE_Q, True, True
    )
    base_recon = np.clip(base_recon, 0, 255)
    ref = _expand2x(base_recon)[:height, :width]
    resid = px.astype(np.int64) - ref
    diff_scan = _encode_frame_gray_arith(resid, _DIFF_Q, False, False)
    return (
        b"\xff\xd8"
        + _seg(0xDE, struct.pack(">BHHB", 8, height, width, 1) + b"\x01\x11\x00")
        + _seg(0xDB, b"\x00" + bytes([_BASE_Q] * 64))
        + _seg(0xC9, struct.pack(">BHHB", 8, hh, hw, 1) + b"\x01\x11\x00")
        + _seg(0xDA, b"\x01\x01\x00\x00\x3f\x00")
        + base_scan
        + _seg(0xDF, b"\x11")
        + _seg(0xDB, b"\x01" + bytes([_DIFF_Q] * 64))
        + _seg(0xCD, struct.pack(">BHHB", 8, height, width, 1) + b"\x01\x11\x01")
        + _seg(0xDA, b"\x01\x01\x00\x00\x3f\x00")
        + diff_scan
        + b"\xff\xd9"
    )
