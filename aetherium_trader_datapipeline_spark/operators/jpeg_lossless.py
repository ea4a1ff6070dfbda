"""Lossless JPEG codecs (SOF3 Huffman + SOF11 arithmetic) — T.81 Annex H.

Closes the "lossless mode" slice of the JPEG gate in
:func:`multimodal.decode_jpeg_pixels`: the original 1992 lossless
process — spatial DPCM with the seven standard predictors, Huffman
coding of the difference CATEGORY (the same SSSS scheme sequential DC
uses, extended to SSSS=16) followed by the category's raw offset bits,
arithmetic modulo 2^16, optional point transform Pt, 2–16 bit
precision, grayscale or N independent 1:1-sampled components
interleaved sample-by-sample.

Prediction context per T.81 H.1.2.1: a = left, b = above, c =
above-left; selector 1..7 maps to (a, b, c, a+b-c, a+(b-c)>>1,
b+(a-c)>>1, (a+b)>>1).  Boundary rules: the very first sample (and the
first sample after a restart marker) predicts 2^(P-1-Pt); the rest of
the first line uses a; the first column of later lines uses b.

Because the process is LOSSLESS, the tests' contract is exact
roundtrip at every precision/predictor/point-transform combination —
no fixture trickery needed.  The Huffman tables this encoder emits are
deliberately simple fixed-length canonical tables (17 symbols at 5
bits), same trade as the baseline tier: less compression, fully valid
interchange.

Reference parity note: the reference engine has no image path; this
closes OUR multimodal surface (SURVEY §2 LLM-pipeline ops).
"""

from __future__ import annotations

import struct

from aetherium_trader_datapipeline_spark.operators._rasterguard import (
    MAX_DECODE_PIXELS,
    _check_raster,
)

_LL_BITS = [0, 0, 0, 0, 17] + [0] * 11  # 17 symbols (0..16), all 5-bit
_LL_VALS = list(range(17))


def _predict(a: int, b: int, c: int, sel: int) -> int:
    if sel == 1:
        return a
    if sel == 2:
        return b
    if sel == 3:
        return c
    if sel == 4:
        return a + b - c
    if sel == 5:
        return a + ((b - c) >> 1)
    if sel == 6:
        return b + ((a - c) >> 1)
    if sel == 7:
        return (a + b) >> 1
    raise ValueError(f"bad predictor selector {sel}")


def encode_jpeg_lossless(width: int, height: int, samples, precision: int = 8,
                         predictor: int = 1, point_transform: int = 0,
                         ncomp: int = 1) -> bytes:
    """Row-major ``samples`` (len = w*h*ncomp, interleaved when ncomp>1,
    each in [0, 2^precision)) → SOF3 byte stream."""
    from aetherium_trader_datapipeline_spark.operators.multimodal import (
        _BitWriter,
        _canonical_codes,
        _category,
    )

    if not (2 <= precision <= 16):
        raise ValueError("precision must be 2..16")
    if not (1 <= predictor <= 7):
        raise ValueError("predictor must be 1..7")
    flat = list(samples)
    if len(flat) != width * height * ncomp:
        raise ValueError("sample count != w*h*ncomp")
    pt = point_transform
    px = [
        [
            [flat[(y * width + x) * ncomp + ci] >> pt for x in range(width)]
            for y in range(height)
        ]
        for ci in range(ncomp)
    ]
    codes = _canonical_codes(_LL_BITS, _LL_VALS)
    wtr = _BitWriter()
    default = 1 << (precision - pt - 1)
    for y in range(height):
        for x in range(width):
            for ci in range(ncomp):
                p = px[ci]
                if y == 0 and x == 0:
                    pred = default
                elif y == 0:
                    pred = p[0][x - 1]
                elif x == 0:
                    pred = p[y - 1][0]
                else:
                    pred = _predict(p[y][x - 1], p[y - 1][x],
                                    p[y - 1][x - 1], predictor)
                diff = (p[y][x] - pred) & 0xFFFF
                if diff >= 0x8000:
                    diff -= 0x10000  # interpret mod-2^16 as signed
                if diff == -32768:
                    code, length = codes[16]  # SSSS=16: no appended bits
                    wtr.write(code, length)
                    continue
                s = _category(diff)
                code, length = codes[s]
                wtr.write(code, length)
                if s:
                    wtr.write(diff if diff > 0 else diff + (1 << s) - 1, s)
    scan = wtr.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    sof = struct.pack(">BHHB", precision, height, width, ncomp)
    for ci in range(ncomp):
        sof += bytes([ci + 1, 0x11, 0])  # 1:1 sampling; Tq unused in SOF3
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00])  # every component uses DC table 0
    sos += bytes([predictor, 0, point_transform])  # Ss=sel, Se=0, Ah<<4|Al
    return (
        b"\xff\xd8"
        + seg(0xC4, b"\x00" + bytes(_LL_BITS) + bytes(_LL_VALS))
        + seg(0xC3, sof)
        + seg(0xDA, sos)
        + bytes(scan)
        + b"\xff\xd9"
    )


def decode_jpeg_lossless(b: bytes,
                         max_pixels: int | None = MAX_DECODE_PIXELS):
    """SOF3 byte stream → int32 array (h, w) or (h, w, ncomp) of
    RECONSTRUCTED samples (point-transformed domain scaled back by
    << Pt, as the spec's reconstruction leaves them)."""
    import numpy as np

    from aetherium_trader_datapipeline_spark.operators.multimodal import (
        _BitReader,
        _decode_huffman,
        _extend,
    )

    if not b.startswith(b"\xff\xd8"):
        raise ValueError("not a JPEG")
    pos = 2
    htabs: dict[int, dict[tuple[int, int], int]] = {}
    sof = None
    scan = None
    while pos + 4 <= len(b):
        if b[pos] != 0xFF:
            raise ValueError("marker desync")
        marker = b[pos + 1]
        if marker == 0xD9:
            break
        ln = struct.unpack(">H", b[pos + 2:pos + 4])[0]
        payload = b[pos + 4:pos + 2 + ln]
        if marker == 0xC4:
            i = 0
            while i < len(payload):
                tc, th = payload[i] >> 4, payload[i] & 0xF
                bits = list(payload[i + 1:i + 17])
                nval = sum(bits)
                vals = list(payload[i + 17:i + 17 + nval])
                table: dict[tuple[int, int], int] = {}
                code, k = 0, 0
                for length in range(1, 17):
                    for _ in range(bits[length - 1]):
                        table[(length, code)] = vals[k]
                        code += 1
                        k += 1
                    code <<= 1
                if tc == 0:
                    htabs[th] = table
                i += 17 + nval
        elif marker == 0xC3:
            prec, h, w, nc = struct.unpack(">BHHB", payload[:6])
            _check_raster(w, h, max_pixels)

            comps = []
            for ci in range(nc):
                cid, sampling, _tq = payload[6 + 3 * ci:9 + 3 * ci]
                comps.append((cid, sampling >> 4, sampling & 0xF))
            if any((hh, vv) != (1, 1) for _c, hh, vv in comps):
                raise NotImplementedError("subsampled lossless JPEG")
            sof = (prec, h, w, comps)
        elif marker == 0xDA:
            ns = payload[0]
            spec = [(payload[1 + 2 * ci], payload[2 + 2 * ci] >> 4)
                    for ci in range(ns)]
            sel = payload[1 + 2 * ns]
            pt = payload[3 + 2 * ns] & 0xF
            scan = (spec, sel, pt, pos + 2 + ln)
            break
        pos += 2 + ln
    if sof is None or scan is None:
        raise ValueError("missing SOF3/SOS")
    prec, height, width, comps = sof
    spec, sel, pt, scan_pos = scan
    if len(spec) != len(comps):
        raise NotImplementedError("lossless multi-scan")
    nc = len(comps)
    tabs = [htabs[td] for _sid, td in spec]
    reader = _BitReader(b, scan_pos)
    out = np.zeros((nc, height, width), dtype=np.int32)
    default = 1 << (prec - pt - 1)
    mask = 0xFFFF
    for y in range(height):
        for x in range(width):
            for ci in range(nc):
                s = _decode_huffman(reader, tabs[ci])
                if s == 16:
                    diff = 32768
                else:
                    diff = _extend(reader.read_bits(s), s) if s else 0
                p = out[ci]
                if y == 0 and x == 0:
                    pred = default
                elif y == 0:
                    pred = int(p[0, x - 1])
                elif x == 0:
                    pred = int(p[y - 1, 0])
                else:
                    pred = _predict(int(p[y, x - 1]), int(p[y - 1, x]),
                                    int(p[y - 1, x - 1]), sel)
                # T.81 H.2.1: reconstruction is modulo 2^16 ONLY — no
                # further truncation to prec-pt bits (a foreign stream
                # whose pred+diff legitimately wraps at 16 bits would
                # otherwise decode wrong; our own encoder never emits
                # out-of-range samples, so this is parity, not behavior).
                p[y, x] = (pred + diff) & mask
    out <<= pt  # reconstruction scales the point transform back up
    if nc == 1:
        return out[0]
    return np.moveaxis(out, 0, -1)


# --- arithmetic-coded lossless (SOF11) --------------------------------------
# T.81 Annex H.1.2.3 over the QM coder from .jpeg_arith: the same DPCM
# prediction layer as SOF3, entropy-coded with a two-dimensional context
# — the coded differences at the LEFT (Da) and ABOVE (Db) neighbors are
# each classified 5 ways with the default DC conditioning bounds
# (L=0, U=1: zero / ±small |d|<=2 / ±large), giving 25 context groups of
# (zero, sign, mag>1|+, mag>1|-) bins; magnitude category chains live in
# one of two shared areas selected by whether |Db| is small or large,
# with the magnitude-low bins 14 positions later (same tree shape the
# sequential DC model uses).  No external SOF11 conformance vectors
# exist in this container; the verifiable contract is exact roundtrip
# (lossless!) across predictors/precisions plus compression sanity, and
# the classification thresholds are exactly the spec's defaults.


def _cls5(d: int) -> int:
    """5-way default classification (L=0, U=1): 0 zero, 1 +small,
    2 -small, 3 +large, 4 -large."""
    if d == 0:
        return 0
    if 0 < d <= 2:
        return 1
    if -2 <= d < 0:
        return 2
    return 3 if d > 0 else 4


def encode_jpeg_lossless_arith(width: int, height: int, samples,
                               precision: int = 8, predictor: int = 1,
                               point_transform: int = 0) -> bytes:
    """Grayscale SOF11 byte stream (arithmetic lossless)."""
    from aetherium_trader_datapipeline_spark.operators.jpeg_arith import (
        QMEncoder,
        _encode_magnitude,
    )

    if not (2 <= precision <= 16):
        raise ValueError("precision must be 2..16")
    flat = list(samples)
    if len(flat) != width * height:
        raise ValueError("sample count != w*h")
    pt = point_transform
    px = [[flat[y * width + x] >> pt for x in range(width)]
          for y in range(height)]
    diffs = [[0] * width for _ in range(height)]  # signed coded diffs
    ctx = bytearray(25 * 4)
    xbins = bytearray(64)  # two 32-wide areas: |Db| small / large
    enc = QMEncoder()
    default = 1 << (precision - pt - 1)
    for y in range(height):
        for x in range(width):
            if y == 0 and x == 0:
                pred = default
            elif y == 0:
                pred = px[0][x - 1]
            elif x == 0:
                pred = px[y - 1][0]
            else:
                pred = _predict(px[y][x - 1], px[y - 1][x],
                                px[y - 1][x - 1], predictor)
            diff = (px[y][x] - pred) & 0xFFFF
            if diff >= 0x8000:
                diff -= 0x10000
            da = diffs[y][x - 1] if x else 0
            db = diffs[y - 1][x] if y else 0
            diffs[y][x] = diff
            base = (_cls5(da) * 5 + _cls5(db)) * 4
            if diff == 0:
                enc.encode(0, ctx, base)
                continue
            enc.encode(1, ctx, base)
            sign = 1 if diff < 0 else 0
            enc.encode(sign, ctx, base + 1)
            x0 = 0 if abs(db) <= 2 else 32
            _encode_magnitude(enc, ctx, base + 2 + sign, abs(diff),
                              xbins, x0)
    scan = enc.flush()
    sof = struct.pack(">BHHB", precision, height, width, 1) + bytes([1, 0x11, 0])
    sos = bytes([1, 1, 0x00, predictor, 0, point_transform])

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    return (b"\xff\xd8" + seg(0xCB, sof) + seg(0xDA, sos) + scan + b"\xff\xd9")


def decode_jpeg_lossless_arith(
        b: bytes, max_pixels: int | None = MAX_DECODE_PIXELS):
    """SOF11 byte stream → (h, w) int32 reconstructed samples."""
    import numpy as np

    from aetherium_trader_datapipeline_spark.operators.jpeg_arith import (
        QMDecoder,
        _decode_magnitude,
    )

    if not b.startswith(b"\xff\xd8"):
        raise ValueError("not a JPEG")
    pos = 2
    sof = None
    scan = None
    while pos + 4 <= len(b):
        if b[pos] != 0xFF:
            raise ValueError("marker desync")
        marker = b[pos + 1]
        if marker == 0xD9:
            break
        ln = struct.unpack(">H", b[pos + 2:pos + 4])[0]
        payload = b[pos + 4:pos + 2 + ln]
        if marker == 0xCB:
            prec, h, w, nc = struct.unpack(">BHHB", payload[:6])
            _check_raster(w, h, max_pixels)

            if nc != 1:
                raise NotImplementedError("SOF11 scope: single component")
            sof = (prec, h, w)
        elif marker == 0xDA:
            ns = payload[0]
            sel = payload[1 + 2 * ns]
            pt = payload[3 + 2 * ns] & 0xF
            scan = (sel, pt, pos + 2 + ln)
            break
        pos += 2 + ln
    if sof is None or scan is None:
        raise ValueError("missing SOF11/SOS")
    prec, height, width = sof
    sel, pt, scan_pos = scan
    dec = QMDecoder(b, scan_pos)
    ctx = bytearray(25 * 4)
    xbins = bytearray(64)
    out = np.zeros((height, width), dtype=np.int32)
    diffs = np.zeros((height, width), dtype=np.int64)
    default = 1 << (prec - pt - 1)
    for y in range(height):
        for x in range(width):
            da = int(diffs[y, x - 1]) if x else 0
            db = int(diffs[y - 1, x]) if y else 0
            base = (_cls5(da) * 5 + _cls5(db)) * 4
            if dec.decode(ctx, base) == 0:
                diff = 0
            else:
                sign = dec.decode(ctx, base + 1)
                x0 = 0 if abs(db) <= 2 else 32
                sz, _m = _decode_magnitude(dec, ctx, base + 2 + sign,
                                           xbins, x0)
                diff = -sz if sign else sz
            diffs[y, x] = diff
            if y == 0 and x == 0:
                pred = default
            elif y == 0:
                pred = int(out[0, x - 1])
            elif x == 0:
                pred = int(out[y - 1, 0])
            else:
                pred = _predict(int(out[y, x - 1]), int(out[y - 1, x]),
                                int(out[y - 1, x - 1]), sel)
            # modulo 2^16 only, per T.81 H.2.1 (see the Huffman variant)
            out[y, x] = (pred + diff) & 0xFFFF
    return out << pt
