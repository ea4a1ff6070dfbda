from __future__ import annotations

import pytest


@pytest.fixture()
def blobs(spark):
    rows = [(1, bytes([10, 20, 30, 40])), (2, bytes(range(60))), (3, b"")]
    return spark.createDataFrame(rows, "media_id LONG, blob BINARY")


def test_extract_image_meta(spark, blobs):
    from aetherium_trader_datapipeline_spark.operators.multimodal import extract_image_meta

    out = {r.media_id: r for r in extract_image_meta(blobs).collect()}
    assert out[1].n_bytes == 4 and out[1].width == 11 and out[1].height == 41
    assert out[3].format == "empty"
    # deterministic: second run identical
    again = {r.media_id: r for r in extract_image_meta(blobs).collect()}
    assert {k: (v.width, v.height, v.format) for k, v in out.items()} == {
        k: (v.width, v.height, v.format) for k, v in again.items()
    }


def test_parse_image_header_real_bytes():
    """Real container bytes → real decoded dimensions, no image libs."""
    from aetherium_trader_datapipeline_spark.operators.multimodal import (
        encode_jpeg,
        encode_png,
        parse_image_header,
    )

    assert parse_image_header(encode_png(31, 7)) == (31, 7, "png")
    assert parse_image_header(encode_jpeg(640, 480)) == (640, 480, "jpeg")
    gif = b"GIF89a" + (13).to_bytes(2, "little") + (9).to_bytes(2, "little") + b"\x00" * 4
    assert parse_image_header(gif) == (13, 9, "gif")
    # BMP height is signed little-endian; -6 (top-down layout) reads as 6
    import struct

    bmp = b"BM" + b"\x00" * 16 + struct.pack("<ii", 24, -6)
    assert parse_image_header(bmp) == (24, 6, "bmp")
    assert parse_image_header(b"not an image") is None
    assert parse_image_header(b"") is None


def test_png_roundtrip_decodable_by_arrow():
    """encode_png output is a VALID png: PIL-free cross-check — the zlib
    IDAT inflates to exactly height*(1+3*width) filtered bytes and CRCs
    verify."""
    import struct
    import zlib

    from aetherium_trader_datapipeline_spark.operators.multimodal import encode_png

    blob = encode_png(5, 3)
    assert blob[:8] == b"\x89PNG\r\n\x1a\n"
    pos, chunks = 8, {}
    while pos < len(blob):
        (ln,) = struct.unpack(">I", blob[pos : pos + 4])
        tag = blob[pos + 4 : pos + 8]
        payload = blob[pos + 8 : pos + 8 + ln]
        (crc,) = struct.unpack(">I", blob[pos + 8 + ln : pos + 12 + ln])
        assert crc == zlib.crc32(tag + payload) & 0xFFFFFFFF
        chunks[tag] = payload
        pos += 12 + ln
    assert set(chunks) == {b"IHDR", b"IDAT", b"IEND"}
    assert len(zlib.decompress(chunks[b"IDAT"])) == 3 * (1 + 3 * 5)


def test_extract_image_meta_header_decoder(spark):
    from aetherium_trader_datapipeline_spark.operators.multimodal import (
        encode_jpeg,
        encode_png,
        extract_image_meta,
    )

    rows = [
        (1, encode_png(10, 20)),
        (2, encode_jpeg(33, 44)),
        (3, b"\x00garbage"),
    ]
    df = spark.createDataFrame(rows, "media_id LONG, blob BINARY")
    out = {r.media_id: r for r in extract_image_meta(df, decoder="header").collect()}
    assert (out[1].width, out[1].height, out[1].format) == (10, 20, "png")
    assert (out[2].width, out[2].height, out[2].format) == (33, 44, "jpeg")
    assert out[3].format == "unknown"
    assert out[1].n_bytes == len(rows[0][1])


def test_decode_image_stub_raises(spark):
    from aetherium_trader_datapipeline_spark.operators.multimodal import decode_image, _HAS_PIL

    if _HAS_PIL:
        pytest.skip("PIL present; stub not active")
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG")


def test_frame_sample_plan(spark):
    from aetherium_trader_datapipeline_spark.operators.multimodal import frame_sample_plan

    vids = spark.createDataFrame([(1, 3.0), (2, 0.2)], "vid LONG, duration_s DOUBLE")
    out = frame_sample_plan(vids, fps=2.0).collect()
    per_vid = {}
    for r in out:
        per_vid.setdefault(r.vid, []).append(r.frame_idx)
    assert sorted(per_vid[1]) == [0, 1, 2, 3, 4, 5]  # 3s @ 2fps
    assert sorted(per_vid[2]) == [0]  # short clip → at least 1 frame


def test_embed_blobs_feeds_similarity(spark, blobs):
    """The fake embeddings flow through the real similarity operator —
    proving the multimodal → vector-ops plumbing end-to-end."""
    from aetherium_trader_datapipeline_spark.operators.multimodal import embed_blobs
    from aetherium_trader_datapipeline_spark.operators.similarity import pairwise_cosine_topk

    emb = embed_blobs(blobs, dim=8).select("media_id", "embedding")
    top = pairwise_cosine_topk(emb, "media_id", "embedding", k=3).collect()
    assert len(top) == 3
    assert all(-1.0 <= r.sim <= 1.0 for r in top)


def test_jpeg_fill_bytes_before_marker():
    """JPEG permits 0xFF padding before any marker; the walk must skip it."""
    from aetherium_trader_datapipeline_spark.operators.multimodal import (
        encode_jpeg,
        parse_image_header,
    )

    blob = encode_jpeg(33, 44)
    # inject two fill bytes before the first segment after SOI
    padded = blob[:2] + b"\xff\xff" + blob[2:]
    assert parse_image_header(padded) == (33, 44, "jpeg")


def test_wav_roundtrip_and_chunk_walk():
    """encode_wav produces a chunk-ordered RIFF container the parser must
    walk (LIST/INFO sits between fmt and data); corrupt/foreign bytes
    return None instead of raising."""
    from aetherium_trader_datapipeline_spark.operators.multimodal import (
        encode_wav,
        parse_wav_header,
    )

    assert parse_wav_header(encode_wav(44100, 2, 480)) == (44100, 2, 16, 480)
    assert parse_wav_header(encode_wav(8000, 1, 7, bits=8)) == (8000, 1, 8, 7)
    assert parse_wav_header(b"RIFFxxxxWAVE") is None  # no chunks at all
    assert parse_wav_header(b"\x89PNG\r\n\x1a\n") is None
    assert parse_wav_header(b"") is None


def test_png_pixel_roundtrip_all_filters():
    """encode(cycle_filters=True) filters row r with type r%5, so a
    successful pixel-exact roundtrip requires every spec predictor
    (None/Sub/Up/Average/Paeth) to be inverted correctly."""
    import numpy as np

    from aetherium_trader_datapipeline_spark.operators.multimodal import (
        decode_png_pixels,
        encode_png,
    )

    rng = np.random.RandomState(7)
    w, h = 9, 11  # >= 5 rows → all filter types appear
    px = rng.randint(0, 256, size=3 * w * h, dtype=np.uint8).tobytes()
    out = decode_png_pixels(encode_png(w, h, pixels=px, cycle_filters=True))
    assert out.shape == (h, w, 3)
    assert out.tobytes() == px
    # plain filter-0 path too
    out0 = decode_png_pixels(encode_png(w, h, pixels=px))
    assert out0.tobytes() == px


def test_png_decoder_rejects_unsupported():
    import struct
    import zlib

    import pytest as _pytest

    from aetherium_trader_datapipeline_spark.operators.multimodal import (
        _PNG_MAGIC,
        decode_png_pixels,
    )

    def chunk(tag, payload):
        return (
            struct.pack(">I", len(payload)) + tag + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
        )

    # every LEGAL (depth, color, interlace) combo decodes as of r8; a
    # spec-ILLEGAL combo (depth 4 truecolor — depths 1/2/4 are only
    # valid for color types 0 and 3) still gates loudly instead of
    # producing silent garbage
    ihdr_bad = struct.pack(">IIBBBBB", 2, 2, 4, 2, 0, 0, 0)
    blob = _PNG_MAGIC + chunk(b"IHDR", ihdr_bad) + chunk(b"IEND", b"")
    with _pytest.raises(NotImplementedError):
        decode_png_pixels(blob)
    with _pytest.raises(ValueError):
        decode_png_pixels(b"GIF89a\x01\x00\x01\x00")


def test_png16_interlaced_roundtrip():
    """16-bit Adam7 PNG (the last r7 codec gate): every pass filtered
    bytewise with bpp=2, samples reassembled pixel-exact as uint16."""
    import numpy as np

    from aetherium_trader_datapipeline_spark.operators.multimodal import (
        decode_png_pixels,
        encode_png16_interlaced,
    )

    rng = np.random.RandomState(11)
    w, h = 13, 9  # odd dims exercise ragged Adam7 passes
    vals = rng.randint(0, 65536, size=w * h, dtype=np.uint16)
    out = decode_png_pixels(encode_png16_interlaced(w, h, vals.tolist()))
    assert out.shape == (h, w, 1) and out.dtype == np.uint16
    assert out.reshape(h, w).tolist() == vals.reshape(h, w).tolist()


def test_png_subbyte_gray_roundtrips():
    """Depths 1/2/4 grayscale, non-interlaced AND Adam7: packed-byte
    filters (bpp=1) + big-endian bit unpack give back raw samples."""
    import numpy as np

    from aetherium_trader_datapipeline_spark.operators.multimodal import (
        decode_png_pixels,
        encode_png_subbyte,
    )

    rng = np.random.RandomState(3)
    for depth in (1, 2, 4):
        for w, h in ((17, 6), (8, 8), (3, 11)):  # ragged + exact-byte rows
            vals = rng.randint(0, 1 << depth, size=w * h)
            for interlaced in (False, True):
                blob = encode_png_subbyte(
                    w, h, vals.tolist(), depth, interlaced=interlaced
                )
                out = decode_png_pixels(blob)
                assert out.shape == (h, w, 1), (depth, w, h, interlaced)
                assert out.reshape(h, w).tolist() == vals.reshape(
                    h, w
                ).tolist(), (depth, w, h, interlaced)


def test_png_subbyte_palette_roundtrip():
    """Depth-4 indexed PNG: sub-byte indices map through PLTE to RGB."""
    import numpy as np

    from aetherium_trader_datapipeline_spark.operators.multimodal import (
        decode_png_pixels,
        encode_png_subbyte,
    )

    rng = np.random.RandomState(5)
    w, h = 10, 7
    palette = [(i * 16, 255 - i * 16, (i * 37) % 256) for i in range(16)]
    idx = rng.randint(0, 16, size=w * h)
    for interlaced in (False, True):
        out = decode_png_pixels(
            encode_png_subbyte(
                w, h, idx.tolist(), 4, palette=palette, interlaced=interlaced
            )
        )
        assert out.shape == (h, w, 3)
        expect = np.array(palette, dtype=np.uint8)[idx.reshape(h, w)]
        assert out.tolist() == expect.tolist(), interlaced


def test_paeth_predictor_spec_cases():
    """Hand-checked PaethPredictor cases from the spec definition (nearest
    of left/above/upper-left to p = a + b - c, ties a > b > c)."""
    from aetherium_trader_datapipeline_spark.operators.multimodal import _paeth

    assert _paeth(0, 0, 0) == 0
    assert _paeth(10, 20, 30) == 10   # p=0: |p-a|=10 |p-b|=20 |p-c|=30 → a
    assert _paeth(30, 20, 10) == 30   # p=40: pa=10 pb=20 pc=30 → a
    assert _paeth(5, 40, 5) == 40     # p=40: pa=35 pb=0 pc=35 → b
    assert _paeth(100, 100, 0) == 100  # p=200: pa=pb=100 → tie → a
    assert _paeth(0, 100, 100) == 0   # p=0: pa=0 → a


def test_wav_sample_decode_roundtrip():
    import numpy as np

    from aetherium_trader_datapipeline_spark.operators.multimodal import (
        decode_wav_samples,
        encode_wav,
    )

    samples = [((i * 911) % 65536) - 32768 for i in range(30 * 2)]
    arr = decode_wav_samples(encode_wav(16000, 2, 30, samples=samples))
    assert arr.shape == (30, 2)
    assert arr.flatten().tolist() == samples
    # silence defaults, 8-bit path
    arr8 = decode_wav_samples(encode_wav(8000, 1, 5, bits=8))
    assert arr8.shape == (5, 1) and arr8.dtype == np.uint8


def test_jpeg_baseline_roundtrip_block_constant_exact():
    """Block-constant even-valued tiles survive the full FDCT→quantize→
    Huffman→decode pipeline bit-exact (DC divides the flat-16 step; AC is
    float noise that rounds away) — including partial edge blocks."""
    import numpy as np

    from aetherium_trader_datapipeline_spark.operators.multimodal import (
        decode_jpeg_pixels,
        encode_jpeg_baseline,
    )

    for d in (0, 7, 42, 123):
        w = 8 * (1 + d % 3) + d % 5  # non-multiples of 8 included
        h = 8 * (1 + d % 2) + d % 3
        px = np.fromfunction(
            lambda y, x: ((d * 37 + (x // 8) * 23 + (y // 8) * 41) % 128) * 2,
            (h, w),
        ).astype(np.uint8)
        out = decode_jpeg_pixels(encode_jpeg_baseline(w, h, px))
        assert out.shape == (h, w)
        assert (out == px).all()


def test_jpeg_baseline_lossy_content_bounded_error():
    """General content is lossy but bounded: with a flat quantization step
    of 16 the per-coefficient error is <=8, so reconstructed pixels stay
    within a small band of the original (and DC/mean is near-exact)."""
    import numpy as np

    from aetherium_trader_datapipeline_spark.operators.multimodal import (
        decode_jpeg_pixels,
        encode_jpeg_baseline,
    )

    h, w = 24, 40
    grad = np.fromfunction(lambda y, x: (2 * x + 3 * y) % 256, (h, w)).astype(np.uint8)
    out = decode_jpeg_pixels(encode_jpeg_baseline(w, h, grad))
    assert int(np.abs(out.astype(int) - grad.astype(int)).max()) <= 8

    rng = np.random.default_rng(7)
    noise = rng.integers(0, 256, (16, 16), dtype=np.uint8)
    out = decode_jpeg_pixels(encode_jpeg_baseline(16, 16, noise))
    assert int(np.abs(out.astype(int) - noise.astype(int)).max()) <= 48
    assert abs(float(out.mean()) - float(noise.mean())) < 4


def test_jpeg_decoder_rejects_unsupported():
    """Unsupported frame types and restart intervals must fail loudly,
    not decode garbage.  A baseline file whose SOF marker is flipped to
    SOF2 is now routed to the progressive decoder (r6) and rejected as
    MALFORMED (its 0..63 scan header is illegal under SOF2) rather than
    unimplemented."""
    import struct

    import pytest as _pytest

    from aetherium_trader_datapipeline_spark.operators.multimodal import (
        decode_jpeg_pixels,
        encode_jpeg_baseline,
    )

    blob = bytearray(encode_jpeg_baseline(8, 8, bytes(64)))
    sof = blob.index(b"\xff\xc0")
    flipped = bytes(blob[:sof+1]) + b"\xc2" + bytes(blob[sof+2:])
    with _pytest.raises(ValueError):
        decode_jpeg_pixels(flipped)

    # DRI became a supported feature late r6: a declared interval that
    # never reaches a restart boundary (8 MCUs declared, 1 present)
    # decodes unchanged rather than raising
    dri = b"\xff\xdd" + struct.pack(">H", 4) + struct.pack(">H", 8)
    with_dri = bytes(blob[:sof]) + dri + bytes(blob[sof:])
    assert decode_jpeg_pixels(with_dri).shape == (8, 8)

    with _pytest.raises(ValueError):
        decode_jpeg_pixels(b"\x89PNG not a jpeg")


def test_decode_image_routes_baseline_jpeg():
    """decode_image dispatches JPEG magic to the native baseline decoder."""
    import numpy as np

    from aetherium_trader_datapipeline_spark.operators.multimodal import (
        decode_image,
        encode_jpeg_baseline,
    )

    px = np.full((8, 16), 100, dtype=np.uint8)  # even constant
    out = decode_image(encode_jpeg_baseline(16, 8, px))
    assert out.shape == (8, 16)
    assert (out == px).all()


def test_gif_lzw_roundtrip_exact():
    """LZW is lossless: arbitrary index images round-trip bit-exact,
    including sizes whose bit stream crosses sub-block and code-width
    boundaries."""
    import numpy as np

    from aetherium_trader_datapipeline_spark.operators.multimodal import (
        decode_gif_pixels,
        encode_gif,
    )

    for d in (0, 7, 42, 199):
        w, h = 5 + d % 9, 4 + d % 7
        idx = bytes((d * 31 + x * 7 + y * 13) % 256 for y in range(h) for x in range(w))
        rgb = decode_gif_pixels(encode_gif(w, h, idx))
        want = np.frombuffer(idx, dtype=np.uint8).reshape(h, w)
        assert rgb.shape == (h, w, 3)
        assert (rgb == want[:, :, None]).all()


def test_gif_lzw_dictionary_reset_path():
    """A 200x200 high-entropy image overflows the 4096-entry LZW table,
    forcing mid-stream CLEAR codes — the reset path must stay in lockstep
    between encoder and decoder."""
    import numpy as np

    from aetherium_trader_datapipeline_spark.operators.multimodal import (
        decode_gif_pixels,
        encode_gif,
    )

    rng = np.random.default_rng(3)
    idx = rng.integers(0, 256, 200 * 200, dtype=np.uint8).tobytes()
    rgb = decode_gif_pixels(encode_gif(200, 200, idx))
    want = np.frombuffer(idx, dtype=np.uint8).reshape(200, 200)
    assert (rgb == want[:, :, None]).all()


def test_gif_custom_palette_and_rejects():
    import numpy as np
    import pytest as _pytest

    from aetherium_trader_datapipeline_spark.operators.multimodal import (
        decode_gif_pixels,
        encode_gif,
    )

    pal = [((i * 3) % 256, (i * 5) % 256, (i * 7) % 256) for i in range(256)]
    rgb = decode_gif_pixels(encode_gif(16, 16, bytes(range(256)), palette=pal))
    assert all(tuple(rgb[i // 16, i % 16]) == pal[i] for i in range(256))

    # Flipping the interlace flag on a sequentially-stored stream must be
    # HONORED (r6: interlace is decoded, not rejected): the decoder
    # scatters stored rows through the 4-pass table, i.e. stored row k
    # lands at source row _gif_interlace_rows(h)[k].
    from aetherium_trader_datapipeline_spark.operators.multimodal import (
        _gif_interlace_rows,
    )

    idx4 = bytes(range(16))  # row y holds values 4y..4y+3
    blob = bytearray(encode_gif(4, 4, idx4))
    desc = 13 + 768  # header+screen descriptor, then the 256-entry GCT
    assert blob[desc] == 0x2C
    interlaced = bytes(blob[: desc + 9]) + b"\x40" + bytes(blob[desc + 10 :])
    out = decode_gif_pixels(interlaced)[:, :, 0]
    expect = np.empty((4, 4), dtype=np.uint8)
    seq = np.frombuffer(idx4, dtype=np.uint8).reshape(4, 4)
    expect[np.array(_gif_interlace_rows(4)), :] = seq
    assert (out == expect).all()
    with _pytest.raises(ValueError):
        decode_gif_pixels(b"\xff\xd8 not a gif")


def test_decode_image_routes_gif():
    import numpy as np

    from aetherium_trader_datapipeline_spark.operators.multimodal import (
        decode_image,
        encode_gif,
    )

    idx = bytes([9] * 12)
    out = decode_image(encode_gif(4, 3, idx))
    assert out.shape == (3, 4, 3)
    assert (out == 9).all()


def test_box_downsample_exact_floor_means():
    import numpy as np

    from aetherium_trader_datapipeline_spark.operators.multimodal import box_downsample

    # 4x3 RGB with known values; 2x2 blocks truncate the odd bottom row
    px = np.arange(4 * 3 * 3, dtype=np.uint8).reshape(3, 4, 3)
    out = box_downsample(px, 2)
    assert out.shape == (1, 2, 3)
    for ox in range(2):
        for c in range(3):
            want = (
                int(px[0, 2 * ox, c]) + int(px[0, 2 * ox + 1, c])
                + int(px[1, 2 * ox, c]) + int(px[1, 2 * ox + 1, c])
            ) // 4
            assert out[0, ox, c] == want


def test_box_downsample_grayscale_and_degenerate():
    import numpy as np

    from aetherium_trader_datapipeline_spark.operators.multimodal import box_downsample

    g = np.array([[10, 20], [30, 41]], dtype=np.uint8)
    out = box_downsample(g, 2)
    assert out.shape == (1, 1, 1)
    assert out[0, 0, 0] == (10 + 20 + 30 + 41) // 4  # floor, not round
    tiny = np.ones((1, 1), dtype=np.uint8)
    assert box_downsample(tiny, 2).size == 0


def test_image_resize_stats_via_png_roundtrip(spark):
    import pandas as pd

    from aetherium_trader_datapipeline_spark.operators.multimodal import (
        box_downsample,
        decode_png_pixels,
        encode_png,
        image_resize_stats,
    )

    w, h = 5, 4
    px = bytes((x * 11 + y * 29 + c * 3) % 256 for y in range(h) for x in range(w) for c in range(3))
    blob = encode_png(w, h, pixels=px, cycle_filters=True)
    expected = box_downsample(decode_png_pixels(blob), 2)
    df = spark.createDataFrame(pd.DataFrame({"img_id": [1], "blob": [blob]}))
    row = image_resize_stats(df, "blob", factor=2).collect()[0]
    assert (row.out_width, row.out_height, row.channels) == (2, 2, 3)
    assert row.px_sum == int(expected.sum())
    assert row.px_min == int(expected.min())
    assert row.px_max == int(expected.max())


def test_jpeg_color_roundtrip_block_constant_exact():
    """YCbCr 4:4:4 interleaved-MCU encode → decode: block-constant even
    planes survive the DCT pipeline bit-exact, so the RGB output equals
    the BT.601 closed form (floor(x+0.5) convention) — the x382 oracle's
    exactness argument, pinned here over random dims."""
    import numpy as np

    from aetherium_trader_datapipeline_spark.operators.multimodal import (
        decode_jpeg_pixels,
        encode_jpeg_color,
    )

    rng = np.random.default_rng(7)
    for trial in range(4):
        w = int(rng.integers(8, 30))
        h = int(rng.integers(8, 25))

        def plane(seed):
            t = np.zeros((h, w), dtype=np.uint8)
            for by in range(-(-h // 8)):
                for bx in range(-(-w // 8)):
                    t[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                        (seed * 37 + bx * 23 + by * 41) % 128
                    ) * 2
            return t[:h, :w]

        Y, Cb, Cr = plane(trial + 1), plane(trial + 11), plane(trial + 23)
        rgb = decode_jpeg_pixels(
            encode_jpeg_color(w, h, Y.flatten(), Cb.flatten(), Cr.flatten())
        )
        assert rgb.shape == (h, w, 3)
        y = Y.astype(np.float64)
        cb = Cb.astype(np.float64) - 128.0
        cr = Cr.astype(np.float64) - 128.0
        exp = np.clip(
            np.stack(
                [
                    np.floor(y + 1.402 * cr + 0.5),
                    np.floor(y - 0.344136 * cb - 0.714136 * cr + 0.5),
                    np.floor(y + 1.772 * cb + 0.5),
                ],
                axis=-1,
            ),
            0,
            255,
        ).astype(np.uint8)
        assert (rgb == exp).all()


def test_jpeg_color_rejects_unsupported_sampling():
    """Exotic factor sets stay PIL-gated — 4:2:0/4:2:2/4:4:0 became
    supported layouts in late r6, so the rejection test targets a
    factor set that remains out of scope."""
    import pytest as _pytest

    from aetherium_trader_datapipeline_spark.operators.multimodal import (
        decode_jpeg_pixels,
        encode_jpeg_color,
    )

    blob = bytearray(encode_jpeg_color(8, 8, bytes(64), bytes(64), bytes(64)))
    sof = blob.index(b"\xff\xc0")
    # component 1's sampling byte sits 8 bytes past the SOF0 marker's
    # 6-byte prec/h/w/nc header (marker+len = 4, +6 header, +1 comp id)
    blob[sof + 4 + 6 + 1] = 0x41  # 4x1 — beyond every supported set
    with _pytest.raises(NotImplementedError):
        decode_jpeg_pixels(bytes(blob))


def test_gif_interlaced_roundtrip_all_pass_shapes():
    """Interlaced encode → decode equals non-interlaced decode for every
    height 1..17 (partial-pass edge cases: h=1 only pass 1, h=2 passes
    1+4, h=3 passes 1+3+4, h>=5 all four) and a 40-row all-pass case."""
    import numpy as np

    from aetherium_trader_datapipeline_spark.operators.multimodal import (
        _gif_interlace_rows,
        decode_gif_pixels,
        encode_gif,
    )

    for h in list(range(1, 18)) + [40]:
        w = 5 + h % 9
        idx = bytes((x * 7 + y * 13) % 256 for y in range(h) for x in range(w))
        rgb_i = decode_gif_pixels(encode_gif(w, h, idx, interlace=True))
        rgb_n = decode_gif_pixels(encode_gif(w, h, idx))
        assert (rgb_i == rgb_n).all(), h
        assert bytes(rgb_i[:, :, 0].flatten()) == idx, h
        # the pass table is a permutation of 0..h-1
        assert sorted(_gif_interlace_rows(h)) == list(range(h))


def test_jpeg_progressive_equals_baseline_decode():
    """Progressive (SOF2 spectral-selection) and baseline layouts carry
    IDENTICAL quantized coefficients, so their decodes must agree bit for
    bit on arbitrary lossy content — the strongest equivalence check the
    format offers (it exercises DC scans, AC band scans, ZRL, and
    EOB-run coding on real data)."""
    import numpy as np

    from aetherium_trader_datapipeline_spark.operators.multimodal import (
        decode_jpeg_pixels,
        encode_jpeg_baseline,
        encode_jpeg_progressive,
    )

    rng = np.random.default_rng(3)
    for trial in range(4):
        w = int(rng.integers(8, 40))
        h = int(rng.integers(8, 33))
        px = (
            (np.fromfunction(lambda y, x: x * 3 + y * 5, (h, w))
             + rng.integers(0, 60, (h, w))) % 256
        ).astype(np.uint8)
        base = decode_jpeg_pixels(encode_jpeg_baseline(w, h, px.flatten()))
        prog = decode_jpeg_pixels(encode_jpeg_progressive(w, h, px.flatten()))
        assert base.shape == prog.shape == (h, w)
        assert (base == prog).all()
    # band partitioning is a free variable: one-scan and many-scan
    # variants must all decode identically
    px = bytes((((x // 8) * 23 + (y // 8) * 41) % 128) * 2
               for y in range(13) for x in range(21))
    want = np.frombuffer(px, np.uint8)
    for bands in [(64,), (2, 4, 8, 16, 32, 64), (10,)]:
        out = decode_jpeg_pixels(encode_jpeg_progressive(21, 13, px, bands=bands))
        assert (out.flatten() == want).all(), bands


def test_jpeg_progressive_sa_flip_decodes_coarser():
    """Successive approximation became a SUPPORTED path late r6: marking
    an Al=0 DC scan as Al=1 is legal (the decoder left-shifts the
    point-transformed values), so the flipped file decodes — at doubled
    DC magnitude, clamped — rather than raising. A 4-component SOF2
    stays gated."""
    import struct

    import pytest as _pytest

    from aetherium_trader_datapipeline_spark.operators.multimodal import (
        decode_jpeg_pixels,
        encode_jpeg_progressive,
    )

    blob = bytearray(encode_jpeg_progressive(8, 8, bytes([100] * 64)))
    out = decode_jpeg_pixels(bytes(blob))
    assert out.shape == (8, 8) and int(out[0, 0]) == 100
    sos = blob.index(b"\xff\xda")  # first SOS: ...\x01\x01\x00\x00\x00\x00
    blob[sos + 4 + 5] = 0x01  # claim Al=1 on the DC scan
    coarse = decode_jpeg_pixels(bytes(blob))
    # DC (100-128)*... doubled shift: (q<<1) dequant → darker than 100
    assert coarse.shape == (8, 8) and int(coarse[0, 0]) != 100

    sof2 = blob.index(b"\xff\xc2")
    bad = bytearray(blob)
    bad[sof2 + 2 : sof2 + 4] = struct.pack(">H", 8 + 3 * 4)
    bad[sof2 + 9] = 4  # 4 components
    with _pytest.raises(NotImplementedError):
        decode_jpeg_pixels(bytes(bad[: sof2 + 10]) + b"\x01\x11\x00" * 4
                           + bytes(bad[sof2 + 13 :]))


def test_jpeg_420_roundtrip_mcu_constant_exact():
    """4:2:0: Y constant per 8x8 block, chroma per 16x16 MCU tile — the
    box-mean downsample and replication upsample are both exact, so the
    RGB output equals the BT.601 closed form. Y varying FINER than
    chroma is what catches MCU block-order or upsample-alignment bugs."""
    import numpy as np

    from aetherium_trader_datapipeline_spark.operators.multimodal import (
        decode_jpeg_pixels,
        encode_jpeg_420,
    )

    rng = np.random.default_rng(5)
    for trial in range(4):
        w = int(rng.integers(16, 50))
        h = int(rng.integers(16, 40))

        def plane(seed, tile):
            t = np.zeros((h, w), dtype=np.uint8)
            for my in range(-(-h // tile)):
                for mx in range(-(-w // tile)):
                    t[my * tile : (my + 1) * tile, mx * tile : (mx + 1) * tile] = (
                        (seed * 37 + mx * 23 + my * 41) % 128
                    ) * 2
            return t[:h, :w]

        Y = plane(trial + 1, 8)
        Cb, Cr = plane(trial + 11, 16), plane(trial + 23, 16)
        rgb = decode_jpeg_pixels(
            encode_jpeg_420(w, h, Y.flatten(), Cb.flatten(), Cr.flatten())
        )
        y = Y.astype(np.float64)
        cb = Cb.astype(np.float64) - 128.0
        cr = Cr.astype(np.float64) - 128.0
        exp = np.clip(
            np.stack(
                [
                    np.floor(y + 1.402 * cr + 0.5),
                    np.floor(y - 0.344136 * cb - 0.714136 * cr + 0.5),
                    np.floor(y + 1.772 * cb + 0.5),
                ],
                axis=-1,
            ),
            0,
            255,
        ).astype(np.uint8)
        assert (rgb == exp).all()


def test_jpeg_420_vs_444_bounded_on_gradients():
    """On smooth content the subsampled decode must stay close to the
    4:4:4 decode (chroma detail loss is bounded, not catastrophic)."""
    import numpy as np

    from aetherium_trader_datapipeline_spark.operators.multimodal import (
        decode_jpeg_pixels,
        encode_jpeg_420,
        encode_jpeg_color,
    )

    w, h = 32, 24
    Y = np.fromfunction(lambda y, x: (x * 2 + y * 3) % 256, (h, w)).astype(np.uint8)
    Cb = np.fromfunction(lambda y, x: (x * 4) % 256, (h, w)).astype(np.uint8)
    Cr = np.full((h, w), 130, np.uint8)
    r420 = decode_jpeg_pixels(
        encode_jpeg_420(w, h, Y.flatten(), Cb.flatten(), Cr.flatten())
    )
    r444 = decode_jpeg_pixels(
        encode_jpeg_color(w, h, Y.flatten(), Cb.flatten(), Cr.flatten())
    )
    assert np.abs(r420.astype(int) - r444.astype(int)).max() < 30


def test_jpeg_subsampled_all_factor_sets_exact():
    """4:2:2 (Y 2x1) and 4:4:0 (Y 1x2) joined 4:2:0 late r6 — each
    factor set round-trips exactly on fixtures whose chroma is constant
    per sampling tile while Y varies per 8x8 block."""
    import numpy as np

    from aetherium_trader_datapipeline_spark.operators.multimodal import (
        decode_jpeg_pixels,
        encode_jpeg_subsampled,
    )

    for factors, th, tw in [((2, 1), 8, 16), ((1, 2), 16, 8)]:
        w, h = 35, 21

        def plane(seed, tile_h, tile_w):
            t = np.zeros((h, w), dtype=np.uint8)
            for my in range(-(-h // tile_h)):
                for mx in range(-(-w // tile_w)):
                    t[my * tile_h : (my + 1) * tile_h,
                      mx * tile_w : (mx + 1) * tile_w] = (
                        (seed * 37 + mx * 23 + my * 41) % 128
                    ) * 2
            return t[:h, :w]

        Y = plane(1, 8, 8)
        Cb, Cr = plane(11, th, tw), plane(23, th, tw)
        rgb = decode_jpeg_pixels(
            encode_jpeg_subsampled(w, h, Y.flatten(), Cb.flatten(),
                                   Cr.flatten(), factors)
        )
        y = Y.astype(np.float64)
        cb = Cb.astype(np.float64) - 128.0
        cr = Cr.astype(np.float64) - 128.0
        exp = np.clip(
            np.stack(
                [
                    np.floor(y + 1.402 * cr + 0.5),
                    np.floor(y - 0.344136 * cb - 0.714136 * cr + 0.5),
                    np.floor(y + 1.772 * cb + 0.5),
                ],
                axis=-1,
            ),
            0, 255,
        ).astype(np.uint8)
        assert (rgb == exp).all(), factors


def test_jpeg_decoder_rejects_exotic_sampling():
    """Factor sets beyond 4:4:4 / 4:2:0 / 4:2:2 / 4:4:0 (e.g. 3x1)
    stay PIL-gated."""
    import pytest as _pytest

    from aetherium_trader_datapipeline_spark.operators.multimodal import (
        decode_jpeg_pixels,
        encode_jpeg_420,
    )

    blob = bytearray(encode_jpeg_420(16, 16, bytes(256), bytes(256), bytes(256)))
    sof = blob.index(b"\xff\xc0")
    blob[sof + 4 + 6 + 1] = 0x31  # Y sampling 3x1
    with _pytest.raises(NotImplementedError):
        decode_jpeg_pixels(bytes(blob))


def test_jpeg_progressive_color_equals_baseline_color():
    """Progressive color (interleaved DC scan + per-component AC band
    scans) and baseline 4:4:4 color carry identical coefficients — the
    decodes must agree bit for bit on random lossy content."""
    import numpy as np

    from aetherium_trader_datapipeline_spark.operators.multimodal import (
        decode_jpeg_pixels,
        encode_jpeg_color,
        encode_jpeg_progressive_color,
    )

    rng = np.random.default_rng(9)
    for trial in range(3):
        w = int(rng.integers(8, 40))
        h = int(rng.integers(8, 33))
        Y = rng.integers(0, 256, (h, w)).astype(np.uint8)
        Cb = rng.integers(0, 256, (h, w)).astype(np.uint8)
        Cr = rng.integers(0, 256, (h, w)).astype(np.uint8)
        base = decode_jpeg_pixels(
            encode_jpeg_color(w, h, Y.flatten(), Cb.flatten(), Cr.flatten())
        )
        prog = decode_jpeg_pixels(
            encode_jpeg_progressive_color(
                w, h, Y.flatten(), Cb.flatten(), Cr.flatten()
            )
        )
        assert base.shape == prog.shape == (h, w, 3)
        assert (base == prog).all()


def test_jpeg_successive_approximation_equals_baseline():
    """The SA scan script (DC/AC first at Al=1 + refinement scans down
    to Al=0) carries the same coefficients as baseline once fully
    refined — decodes must agree bit for bit on random lossy content.
    This exercises the G.1.2.3 refinement protocol: correction bits on
    already-significant coefficients, run-coded newly-significant
    values, ZRL-with-pending-bits, and per-block EOB tails."""
    import numpy as np

    from aetherium_trader_datapipeline_spark.operators.multimodal import (
        decode_jpeg_pixels,
        encode_jpeg_baseline,
        encode_jpeg_progressive_sa,
    )

    rng = np.random.default_rng(11)
    for trial in range(4):
        w = int(rng.integers(8, 40))
        h = int(rng.integers(8, 33))
        px = (
            (np.fromfunction(lambda y, x: x * 3 + y * 5, (h, w))
             + rng.integers(0, 80, (h, w))) % 256
        ).astype(np.uint8)
        base = decode_jpeg_pixels(encode_jpeg_baseline(w, h, px.flatten()))
        sa = decode_jpeg_pixels(encode_jpeg_progressive_sa(w, h, px.flatten()))
        assert base.shape == sa.shape == (h, w)
        assert (base == sa).all()


def test_jpeg_progressive_subsampled_equals_baseline_subsampled():
    """The r8 closure of the 'subsampled progressive' residual: a
    progressive 4:2:0/4:2:2/4:4:0 file must decode pixel-identically to
    the BASELINE subsampled file of the same planes (same quant table,
    same chroma prep, same coefficients — only the scan script differs).
    Also exercises restart intervals in every progressive scan type:
    ri=3 splits the interleaved DC scan at MCU boundaries and each AC
    scan at block boundaries, and must change nothing."""
    import numpy as np

    from aetherium_trader_datapipeline_spark.operators.multimodal import (
        decode_jpeg_pixels,
        encode_jpeg_progressive_subsampled,
        encode_jpeg_subsampled,
    )

    rng = np.random.RandomState(23)
    for factors in ((2, 2), (2, 1), (1, 2)):
        for w, h in ((21, 13), (16, 16), (9, 18)):
            y = rng.randint(0, 256, size=w * h, dtype=np.uint8)
            cb = rng.randint(0, 256, size=w * h, dtype=np.uint8)
            cr = rng.randint(0, 256, size=w * h, dtype=np.uint8)
            base = decode_jpeg_pixels(
                encode_jpeg_subsampled(w, h, y, cb, cr, factors=factors)
            )
            prog = decode_jpeg_pixels(
                encode_jpeg_progressive_subsampled(
                    w, h, y, cb, cr, factors=factors
                )
            )
            assert prog.shape == (h, w, 3)
            assert (prog == base).all(), (factors, w, h)
            rst = decode_jpeg_pixels(
                encode_jpeg_progressive_subsampled(
                    w, h, y, cb, cr, factors=factors, restart_interval=3
                )
            )
            assert (rst == base).all(), ("restart", factors, w, h)


def test_jpeg_16bit_quant_table_decodes():
    """Pq=1 DQT (16-bit big-endian entries, spec B.2.4.1): rewriting a
    baseline file's 8-bit quant table as the identical 16-bit table must
    decode to the identical pixels — the table parse is the only
    difference."""
    import struct

    import numpy as np

    from aetherium_trader_datapipeline_spark.operators.multimodal import (
        decode_jpeg_pixels,
        encode_jpeg_baseline,
        encode_jpeg_progressive,
    )

    def widen_dqt(blob: bytes) -> bytes:
        # find the DQT segment (FFDB), re-emit its 64 one-byte entries as
        # 16-bit big-endian with Pq=1
        i = blob.index(b"\xff\xdb")
        (ln,) = struct.unpack(">H", blob[i + 2 : i + 4])
        payload = blob[i + 4 : i + 2 + ln]
        pq_tq, entries = payload[0], payload[1:65]
        assert pq_tq >> 4 == 0 and len(entries) == 64
        wide = bytes([0x10 | (pq_tq & 0xF)]) + b"".join(
            struct.pack(">H", e) for e in entries
        )
        seg = b"\xff\xdb" + struct.pack(">H", len(wide) + 2) + wide
        return blob[:i] + seg + blob[i + 2 + ln :]

    rng = np.random.RandomState(31)
    px = rng.randint(0, 256, size=24 * 16, dtype=np.uint8)
    base = encode_jpeg_baseline(24, 16, px)
    assert (decode_jpeg_pixels(widen_dqt(base))
            == decode_jpeg_pixels(base)).all()
    prog = encode_jpeg_progressive(24, 16, px)
    assert (decode_jpeg_pixels(widen_dqt(prog))
            == decode_jpeg_pixels(prog)).all()


def test_jpeg_restart_intervals_roundtrip():
    """DRI + RSTn resync (late r6): a scan split into byte-aligned
    restart chunks with cycling RST0-7 markers and DC-predictor resets
    must decode identically to the unsegmented scan."""
    import numpy as np

    from aetherium_trader_datapipeline_spark.operators.multimodal import (
        decode_jpeg_pixels,
        encode_jpeg_baseline,
    )

    rng = np.random.default_rng(13)
    for trial in range(3):
        w = int(rng.integers(8, 60))
        h = int(rng.integers(8, 40))
        ri = int(rng.integers(1, 7))
        px = (
            (np.fromfunction(lambda y, x: x * 3 + y * 5, (h, w))
             + rng.integers(0, 80, (h, w))) % 256
        ).astype(np.uint8)
        plain = decode_jpeg_pixels(encode_jpeg_baseline(w, h, px.flatten()))
        rst = decode_jpeg_pixels(
            encode_jpeg_baseline(w, h, px.flatten(), restart_interval=ri)
        )
        assert (plain == rst).all(), (trial, ri)
    # a corrupted restart marker fails loudly, not silently
    import pytest as _pytest

    blob = bytearray(encode_jpeg_baseline(32, 8, bytes(256), restart_interval=1))
    i = blob.index(b"\xff\xd0")
    blob[i + 1] = 0xD5  # wrong RST index
    with _pytest.raises(ValueError):
        decode_jpeg_pixels(bytes(blob))


def test_png_palette_roundtrip_and_plte_validation():
    """Indexed (color type 3) PNG (r6): filtered index scanlines + PLTE
    mapping must reproduce the RGB raster exactly; a palette index past
    the PLTE length fails loudly."""
    import numpy as np
    import pytest as _pytest

    from aetherium_trader_datapipeline_spark.operators.multimodal import (
        decode_png_pixels,
        encode_png_palette,
    )

    pal = [((i * 3) % 256, (i * 5 + 7) % 256, (i * 7 + 13) % 256)
           for i in range(256)]
    for w, h in [(1, 1), (4, 3), (7, 9), (16, 5)]:
        idx = [(11 * x + 5 * y) % 256 for y in range(h) for x in range(w)]
        arr = decode_png_pixels(encode_png_palette(w, h, idx, pal))
        exp = np.array(
            [[pal[(11 * x + 5 * y) % 256] for x in range(w)]
             for y in range(h)],
            dtype=np.uint8,
        )
        assert arr.shape == (h, w, 3)
        assert (arr == exp).all(), (w, h)

    # short palette + out-of-range index must raise, not wrap
    short = pal[:16]
    blob = encode_png_palette(3, 2, [0, 5, 15, 1, 2, 3], short)
    assert decode_png_pixels(blob).shape == (2, 3, 3)
    bad = encode_png_palette(3, 2, [0, 5, 16, 1, 2, 3], short)
    with _pytest.raises(ValueError):
        decode_png_pixels(bad)


def test_png_adam7_interlaced_equals_sequential():
    """Adam7 de-interlace (r6): every pass shape — including widths and
    heights where some passes are empty — must scatter back to the same
    raster the sequential encoding decodes to, with filters cycled so
    all five predictors run inside every pass."""
    from aetherium_trader_datapipeline_spark.operators.multimodal import (
        decode_png_pixels,
        encode_png,
        encode_png_interlaced,
    )

    for w, h in [(1, 1), (2, 2), (3, 5), (5, 1), (1, 9), (8, 8),
                 (11, 13), (17, 10)]:
        px = bytes(
            ((x * 7 + y * 13 + c * 17) % 256)
            for y in range(h) for x in range(w) for c in range(3)
        )
        seq = decode_png_pixels(encode_png(w, h, pixels=px,
                                           cycle_filters=True))
        lace = decode_png_pixels(encode_png_interlaced(w, h, px))
        assert seq.shape == lace.shape == (h, w, 3)
        assert (seq == lace).all(), (w, h)


def test_png_16bit_roundtrip_all_filters():
    """16-bit grayscale PNG (r6, closes the last PNG scope note): filters
    run bytewise with bpp=2; cycled filters across sizes must reproduce
    the uint16 raster exactly. (16-bit interlace became a SUPPORTED tier
    in r8 — test_png16_interlaced_roundtrip covers it; a truncated
    interlaced stream must still fail loudly, not return garbage.)"""
    import numpy as np
    import pytest as _pytest

    from aetherium_trader_datapipeline_spark.operators.multimodal import (
        decode_png_pixels,
        encode_png16,
    )

    for w, h in [(1, 1), (2, 7), (5, 3), (16, 9), (33, 4)]:
        vals = [((x * 257 + y * 4099 + 7) * 131) % 65536
                for y in range(h) for x in range(w)]
        arr = decode_png_pixels(encode_png16(w, h, vals))
        exp = np.array(vals, dtype=np.uint16).reshape(h, w, 1)
        assert arr.dtype == np.uint16
        assert (arr == exp).all(), (w, h)

    # malformed (wrong-length) interlaced stream fails loudly
    import struct
    import zlib

    from aetherium_trader_datapipeline_spark.operators.multimodal import (
        _png_chunk,
        _PNG_MAGIC,
    )

    ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 0, 0, 0, 1)
    blob = (_PNG_MAGIC + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(b"\x00" * 20))
            + _png_chunk(b"IEND", b""))
    with _pytest.raises(ValueError):
        decode_png_pixels(blob)


# -- arithmetic-coded JPEG (SOF9, r9) ----------------------------------------


def test_qm_coder_roundtrip_random_contexts():
    """QM encoder/decoder must be bit-exact through the full byte
    pipeline on random multi-context bit streams — skewed and balanced
    sources, long runs (exercises the fast MPS path, renorm, conditional
    exchange, carry propagation and 0xFF stuffing)."""
    import random

    from aetherium_trader_datapipeline_spark.operators.jpeg_arith import (
        QMDecoder,
        QMEncoder,
    )

    rng = random.Random(91)
    for trial in range(8):
        n_ctx = rng.randint(1, 6)
        bias = [rng.choice([0.02, 0.2, 0.5, 0.9, 0.98]) for _ in range(n_ctx)]
        seq = [
            (rng.randrange(n_ctx),)
            for _ in range(rng.randint(1, 3000))
        ]
        seq = [(c[0], 1 if rng.random() < bias[c[0]] else 0) for c in seq]
        enc = QMEncoder()
        stats = bytearray(n_ctx)
        for ctx, bit in seq:
            enc.encode(bit, stats, ctx)
        data = enc.flush()
        dec = QMDecoder(data, 0)
        stats2 = bytearray(n_ctx)
        got = [dec.decode(stats2, ctx) for ctx, _bit in seq]
        assert got == [b for _c, b in seq], f"trial {trial}"


def test_qm_coder_compresses_skewed_source():
    """A 99%-ones source must compress far below 1 bit/symbol (the
    adaptive estimator is actually adapting, not just round-tripping)."""
    import random

    from aetherium_trader_datapipeline_spark.operators.jpeg_arith import (
        QMEncoder,
    )

    rng = random.Random(7)
    bits = [1 if rng.random() < 0.99 else 0 for _ in range(20000)]
    enc = QMEncoder()
    stats = bytearray(1)
    for b in bits:
        enc.encode(b, stats, 0)
    assert len(enc.flush()) * 8 < 0.25 * len(bits)


def test_jpeg_arith_equals_baseline_decode():
    """SOF9 and SOF0 carry IDENTICAL quantized coefficients (same DCT +
    flat quant), so arithmetic decode must agree with baseline Huffman
    decode pixel-for-pixel on arbitrary lossy content — the strongest
    equivalence check available without external conformance vectors."""
    import numpy as np

    from aetherium_trader_datapipeline_spark.operators.jpeg_arith import (
        encode_jpeg_arith,
    )
    from aetherium_trader_datapipeline_spark.operators.multimodal import (
        decode_jpeg_pixels,
        encode_jpeg_baseline,
    )

    rng = np.random.default_rng(9)
    for trial in range(4):
        w = int(rng.integers(8, 40))
        h = int(rng.integers(8, 33))
        px = (
            (np.fromfunction(lambda y, x: x * 7 + y * 3, (h, w))
             + rng.integers(0, 80, (h, w))) % 256
        ).astype(np.uint8)
        base = decode_jpeg_pixels(encode_jpeg_baseline(w, h, px.flatten()))
        arit = decode_jpeg_pixels(encode_jpeg_arith(w, h, px.flatten()))
        assert arit.shape == (h, w)
        assert (base == arit).all(), f"trial {trial}"


def test_jpeg_arith_color_equals_baseline_color():
    """4:4:4 SOF9 color must equal the baseline color tier's decode
    exactly (same planes, same BT.601 conversion)."""
    import numpy as np

    from aetherium_trader_datapipeline_spark.operators.jpeg_arith import (
        encode_jpeg_arith_color,
    )
    from aetherium_trader_datapipeline_spark.operators.multimodal import (
        decode_jpeg_pixels,
        encode_jpeg_color,
    )

    rng = np.random.default_rng(21)
    w, h = 19, 14
    y = rng.integers(0, 256, h * w).astype(np.uint8)
    cb = rng.integers(64, 192, h * w).astype(np.uint8)
    cr = rng.integers(64, 192, h * w).astype(np.uint8)
    base = decode_jpeg_pixels(encode_jpeg_color(w, h, y, cb, cr))
    arit = decode_jpeg_pixels(encode_jpeg_arith_color(w, h, y, cb, cr))
    assert arit.shape == (h, w, 3)
    assert (base == arit).all()


def test_jpeg_arith_restart_intervals():
    """DRI/RSTn: coder flushes + realigns, statistics and DC predictors
    reset; decode must equal the no-restart decode exactly."""
    import numpy as np

    from aetherium_trader_datapipeline_spark.operators.jpeg_arith import (
        encode_jpeg_arith,
    )
    from aetherium_trader_datapipeline_spark.operators.multimodal import (
        decode_jpeg_pixels,
    )

    rng = np.random.default_rng(33)
    w, h = 40, 24  # 5x3 = 15 MCUs
    px = rng.integers(0, 256, (h, w)).astype(np.uint8)
    plain = decode_jpeg_pixels(encode_jpeg_arith(w, h, px.flatten()))
    for ri in (1, 2, 4, 7):
        rst = decode_jpeg_pixels(
            encode_jpeg_arith(w, h, px.flatten(), restart_interval=ri)
        )
        assert (plain == rst).all(), f"restart_interval={ri}"


def test_decode_image_routes_arith_jpeg():
    """decode_image dispatches SOF9 streams to the native QM decoder;
    block-constant fixtures decode exactly (flat quant, DC only)."""
    import numpy as np

    from aetherium_trader_datapipeline_spark.operators.jpeg_arith import (
        encode_jpeg_arith,
    )
    from aetherium_trader_datapipeline_spark.operators.multimodal import (
        decode_image,
    )

    px = np.repeat(
        np.repeat(np.arange(6, dtype=np.uint8).reshape(2, 3) * 40, 8, 0), 8, 1
    )
    out = decode_image(encode_jpeg_arith(24, 16, px.flatten()))
    assert out.shape == (16, 24)
    assert (out == px).all()


def test_jpeg_arith_flipped_sof10_rejected_as_malformed():
    """A sequential SOF9 file whose marker is flipped to SOF10 routes to
    the progressive-arithmetic decoder (r9) and is rejected as MALFORMED
    (its 0..63 scan header is illegal under SOF10) — same contract as
    the r6 SOF0→SOF2 flip."""
    import pytest as _pytest

    from aetherium_trader_datapipeline_spark.operators.jpeg_arith import (
        encode_jpeg_arith,
    )
    from aetherium_trader_datapipeline_spark.operators.multimodal import (
        decode_jpeg_pixels,
    )

    blob = bytearray(encode_jpeg_arith(8, 8, bytes(64)))
    sof = blob.index(b"\xff\xc9")
    flipped = bytes(blob[:sof + 1]) + b"\xca" + bytes(blob[sof + 2:])
    with _pytest.raises(ValueError):
        decode_jpeg_pixels(flipped)


# -- lossless JPEG (SOF3, r9) ------------------------------------------------


def test_jpeg_lossless_roundtrip_all_predictors():
    """SOF3 is LOSSLESS: every predictor must reproduce arbitrary 8-bit
    content bit-exactly."""
    import numpy as np

    from aetherium_trader_datapipeline_spark.operators.jpeg_lossless import (
        decode_jpeg_lossless,
        encode_jpeg_lossless,
    )

    rng = np.random.default_rng(3)
    w, h = 23, 11
    px = rng.integers(0, 256, h * w).astype(int).tolist()
    want = np.array(px, dtype=np.int32).reshape(h, w)
    for sel in range(1, 8):
        got = decode_jpeg_lossless(
            encode_jpeg_lossless(w, h, px, predictor=sel)
        )
        assert got.shape == (h, w)
        assert (got == want).all(), f"predictor {sel}"


def test_jpeg_lossless_precisions_and_point_transform():
    """2..16-bit samples roundtrip exactly; a point transform Pt drops
    the low Pt bits and reconstruction scales back up (<< Pt)."""
    import numpy as np

    from aetherium_trader_datapipeline_spark.operators.jpeg_lossless import (
        decode_jpeg_lossless,
        encode_jpeg_lossless,
    )

    rng = np.random.default_rng(5)
    for prec in (2, 4, 8, 12, 16):
        w, h = 9, 7
        px = rng.integers(0, 1 << prec, h * w).astype(int).tolist()
        got = decode_jpeg_lossless(
            encode_jpeg_lossless(w, h, px, precision=prec, predictor=4)
        )
        assert (got == np.array(px, dtype=np.int32).reshape(h, w)).all(), prec
    # point transform: lossy by exactly the low bits
    px = rng.integers(0, 256, 9 * 7).astype(int).tolist()
    got = decode_jpeg_lossless(
        encode_jpeg_lossless(9, 7, px, predictor=7, point_transform=2)
    )
    want = (np.array(px, dtype=np.int32).reshape(7, 9) >> 2) << 2
    assert (got == want).all()


def test_jpeg_lossless_color_and_dispatch():
    """3 interleaved 1:1 components (e.g. raw RGB — lossless JPEG has no
    color transform) roundtrip exactly, and decode_image routes SOF3."""
    import numpy as np

    from aetherium_trader_datapipeline_spark.operators.jpeg_lossless import (
        encode_jpeg_lossless,
    )
    from aetherium_trader_datapipeline_spark.operators.multimodal import (
        decode_image,
    )

    rng = np.random.default_rng(8)
    w, h = 12, 5
    px = rng.integers(0, 256, h * w * 3).astype(int).tolist()
    got = decode_image(encode_jpeg_lossless(w, h, px, ncomp=3, predictor=5))
    assert got.shape == (h, w, 3)
    want = np.array(px, dtype=np.int32).reshape(h, w, 3)
    assert (got == want).all()


def test_jpeg_lossless_sawtooth_extreme_diffs():
    """Alternating 0 / max samples produce the extreme difference
    categories (including big negatives) — the SSSS=15/16 edge area."""
    import numpy as np

    from aetherium_trader_datapipeline_spark.operators.jpeg_lossless import (
        decode_jpeg_lossless,
        encode_jpeg_lossless,
    )

    w, h = 16, 3
    px = [0 if (i % 2) else 65535 for i in range(w * h)]
    got = decode_jpeg_lossless(
        encode_jpeg_lossless(w, h, px, precision=16, predictor=1)
    )
    assert (got == np.array(px, dtype=np.int32).reshape(h, w)).all()


# -- progressive-arithmetic JPEG (SOF10, r9) ---------------------------------


def test_jpeg_arith_progressive_equals_baseline():
    """SOF10 carries IDENTICAL quantized coefficients, so its decode
    must equal baseline Huffman decode pixel-for-pixel — across band
    splits and DC/AC successive-approximation depths (exercises all
    four scan kinds: DC first/refine, AC first/refine)."""
    import numpy as np

    from aetherium_trader_datapipeline_spark.operators.jpeg_arith import (
        encode_jpeg_arith_progressive,
    )
    from aetherium_trader_datapipeline_spark.operators.multimodal import (
        decode_jpeg_pixels,
        encode_jpeg_baseline,
    )

    rng = np.random.default_rng(17)
    for trial, (al, bands, ac_al) in enumerate([
        (0, ((1, 63),), 0),            # single full band, no SA
        (1, ((1, 5), (6, 63)), 1),     # default split + 1-bit SA both
        (2, ((1, 2), (3, 20), (21, 63)), 2),  # deep SA, 3 bands
    ]):
        w = int(rng.integers(8, 40))
        h = int(rng.integers(8, 33))
        px = (
            (np.fromfunction(lambda y, x: x * 5 + y * 11, (h, w))
             + rng.integers(0, 90, (h, w))) % 256
        ).astype(np.uint8)
        base = decode_jpeg_pixels(encode_jpeg_baseline(w, h, px.flatten()))
        prog = decode_jpeg_pixels(
            encode_jpeg_arith_progressive(w, h, px.flatten(), al=al,
                                          bands=bands, ac_al=ac_al)
        )
        assert prog.shape == (h, w)
        assert (base == prog).all(), f"trial {trial}"


def test_jpeg_arith_progressive_small_negative_dc():
    """Regression (r10): flat images just below 128 quantize to a small
    NEGATIVE DC (|DC| < 2^Al).  A sign-magnitude DC point transform
    zeroes the first scan AND loses the sign in the refine bits — a flat
    126 at al=1 decoded to 130.  T.81 G.1.2.1 uses an arithmetic
    (two's-complement) shift; decode must equal baseline exactly for
    every flat level and SA depth."""
    import numpy as np

    from aetherium_trader_datapipeline_spark.operators.jpeg_arith import (
        encode_jpeg_arith_progressive,
    )
    from aetherium_trader_datapipeline_spark.operators.multimodal import (
        decode_jpeg_pixels,
        encode_jpeg_baseline,
    )

    for level in (112, 120, 126, 127, 128, 129, 136):
        for al in (1, 2, 3):
            px = np.full((8, 8), level, dtype=np.uint8)
            base = decode_jpeg_pixels(encode_jpeg_baseline(8, 8, px.flatten()))
            prog = decode_jpeg_pixels(
                encode_jpeg_arith_progressive(8, 8, px.flatten(), al=al)
            )
            assert (base == prog).all(), (level, al, int(base[0, 0]),
                                          int(prog[0, 0]))


def test_decode_image_routes_sof10():
    """decode_image dispatches SOF10; block-constant content is exact."""
    import numpy as np

    from aetherium_trader_datapipeline_spark.operators.jpeg_arith import (
        encode_jpeg_arith_progressive,
    )
    from aetherium_trader_datapipeline_spark.operators.multimodal import (
        decode_image,
    )

    px = np.repeat(
        np.repeat(np.arange(4, dtype=np.uint8).reshape(2, 2) * 60, 8, 0), 8, 1
    )
    out = decode_image(
        encode_jpeg_arith_progressive(16, 16, px.flatten(), al=1)
    )
    assert out.shape == (16, 16)
    assert (out == px).all()


# -- arithmetic lossless JPEG (SOF11, r9) ------------------------------------


def test_jpeg_lossless_arith_roundtrip():
    """SOF11 is lossless: exact roundtrip across predictors and
    precisions (the QM coder + Annex H 5x5 Da/Db conditioning)."""
    import numpy as np

    from aetherium_trader_datapipeline_spark.operators.jpeg_lossless import (
        decode_jpeg_lossless_arith,
        encode_jpeg_lossless_arith,
    )

    rng = np.random.default_rng(11)
    for prec, sel in [(8, 1), (8, 4), (8, 7), (4, 2), (12, 5), (16, 6)]:
        w, h = 17, 9
        px = rng.integers(0, 1 << prec, h * w).astype(int).tolist()
        got = decode_jpeg_lossless_arith(
            encode_jpeg_lossless_arith(w, h, px, precision=prec,
                                       predictor=sel)
        )
        assert (got == np.array(px, dtype=np.int32).reshape(h, w)).all(), (
            prec, sel)


def test_jpeg_lossless_arith_compresses_smooth_content():
    """Smooth gradients (tiny diffs, heavy zero/small contexts) must
    compress well below 1 byte/sample — the conditioning is doing work —
    and decode_image must route SOF11."""
    import numpy as np

    from aetherium_trader_datapipeline_spark.operators.jpeg_lossless import (
        encode_jpeg_lossless_arith,
    )
    from aetherium_trader_datapipeline_spark.operators.multimodal import (
        decode_image,
    )

    w, h = 64, 64
    px = [((x + y) // 4) % 256 for y in range(h) for x in range(w)]
    blob = encode_jpeg_lossless_arith(w, h, px, predictor=4)
    assert len(blob) < w * h // 2, len(blob)
    got = decode_image(blob)
    assert (got.flatten() == np.array(px, dtype=np.int32)).all()


# -- hierarchical JPEG (DHP/EXP/SOF5, r9) ------------------------------------


def test_jpeg_hierarchical_refines_to_quant_error():
    """Two-level hierarchical decode must land within the residual
    stage's quantization error of the ORIGINAL (max |err| <= 3) on
    arbitrary content — and be strictly better than the base frame
    alone on sharp content."""
    import numpy as np

    from aetherium_trader_datapipeline_spark.operators.jpeg_hier import (
        decode_jpeg_hierarchical,
        encode_jpeg_hierarchical,
    )

    rng = np.random.default_rng(19)
    for w, h in [(32, 24), (17, 9), (40, 33)]:
        px = rng.integers(0, 256, (h, w)).astype(np.uint8)
        out = decode_jpeg_hierarchical(
            encode_jpeg_hierarchical(w, h, px.flatten())
        )
        assert out.shape == (h, w)
        err = np.abs(out.astype(int) - px.astype(int)).max()
        assert err <= 3, (w, h, err)


def test_jpeg_hierarchical_dispatch_and_structure():
    """decode_image routes DHP streams; the stream really is two frames
    (SOF0 base + SOF5 differential after an EXP)."""
    import numpy as np

    from aetherium_trader_datapipeline_spark.operators.jpeg_hier import (
        encode_jpeg_hierarchical,
    )
    from aetherium_trader_datapipeline_spark.operators.multimodal import (
        decode_image,
    )

    px = np.repeat(
        np.repeat(np.arange(4, dtype=np.uint8).reshape(2, 2) * 50 + 20, 16, 0),
        16, 1,
    )
    blob = encode_jpeg_hierarchical(32, 32, px.flatten())
    assert b"\xff\xde" in blob and b"\xff\xdf" in blob  # DHP + EXP
    assert b"\xff\xc0" in blob and b"\xff\xc5" in blob  # base + differential
    out = decode_image(blob)
    assert out.shape == (32, 32)
    assert np.abs(out.astype(int) - px.astype(int)).max() <= 3


def test_jpeg_bare_differential_frame_rejected():
    """A differential SOF5 outside a hierarchical stream (no DHP before
    it) must fail loudly, not decode garbage.  (Stripping DHP from a
    hierarchical stream is NOT such a case: the prefix up to the first
    SOS is then a self-contained baseline image and decodes as one.)"""
    import pytest as _pytest

    from aetherium_trader_datapipeline_spark.operators.multimodal import (
        decode_jpeg_pixels,
        encode_jpeg_baseline,
    )

    blob = bytearray(encode_jpeg_baseline(8, 8, bytes(64)))
    sof = blob.index(b"\xff\xc0")
    flipped = bytes(blob[:sof + 1]) + b"\xc5" + bytes(blob[sof + 2:])
    with _pytest.raises(NotImplementedError):
        decode_jpeg_pixels(flipped)


def test_jpeg_hierarchical_arithmetic_frames():
    """SOF9 base + SOF13 differential (arithmetic hierarchical): same
    <= 3 reconstruction bound, routed through decode_image."""
    import numpy as np

    from aetherium_trader_datapipeline_spark.operators.jpeg_hier import (
        encode_jpeg_hierarchical_arith,
    )
    from aetherium_trader_datapipeline_spark.operators.multimodal import (
        decode_image,
    )

    rng = np.random.default_rng(23)
    px = rng.integers(0, 256, (24, 31)).astype(np.uint8)
    blob = encode_jpeg_hierarchical_arith(31, 24, px.flatten())
    assert b"\xff\xc9" in blob and b"\xff\xcd" in blob  # SOF9 + SOF13
    out = decode_image(blob)
    assert out.shape == (24, 31)
    assert np.abs(out.astype(int) - px.astype(int)).max() <= 3


def test_jpeg_hierarchical_exp_anisotropic_rejected():
    """EXP's Eh/Ev payload must be honored: an expand that is not 2x in
    BOTH directions is outside scope and must fail loudly rather than
    silently mis-expand the reference frame (r10, T.81 B.3.3)."""
    import numpy as np
    import pytest

    from aetherium_trader_datapipeline_spark.operators.jpeg_hier import (
        decode_jpeg_hierarchical,
        encode_jpeg_hierarchical,
    )

    px = np.full((32, 32), 90, dtype=np.uint8)
    blob = bytearray(encode_jpeg_hierarchical(32, 32, px.flatten()))
    i = blob.find(b"\xff\xdf")          # EXP marker; payload byte follows
    assert i >= 0 and blob[i + 4] == 0x11
    blob[i + 4] = 0x10                  # Eh=1, Ev=0: horizontal-only
    with pytest.raises(NotImplementedError, match="Eh=1 Ev=0"):
        decode_jpeg_hierarchical(bytes(blob))


def test_try_decode_image_survives_systematic_corruption():
    """Corruption fuzz (r10): for every container the engine decodes
    natively, truncate at every prefix length and flip a byte at every
    offset — try_decode_image must NEVER raise (one bad blob must not
    kill a 10^9-blob mapInPandas task) and must return pixels identical
    to the strict decoder whenever it claims success on the pristine
    blob."""
    import numpy as np

    from aetherium_trader_datapipeline_spark.operators.jpeg_arith import (
        encode_jpeg_arith,
    )
    from aetherium_trader_datapipeline_spark.operators.multimodal import (
        decode_image,
        encode_gif,
        encode_jpeg_baseline,
        encode_png,
        try_decode_image,
    )

    from aetherium_trader_datapipeline_spark.operators.jpeg_arith import (
        encode_jpeg_arith_progressive,
    )
    from aetherium_trader_datapipeline_spark.operators.jpeg_hier import (
        encode_jpeg_hierarchical,
    )
    from aetherium_trader_datapipeline_spark.operators.jpeg_lossless import (
        encode_jpeg_lossless,
    )

    rng = np.random.default_rng(10)
    px = rng.integers(0, 256, (16, 16), dtype=np.uint8)
    rgb = rng.integers(0, 256, 16 * 16 * 3, dtype=np.uint8)
    blobs = {
        "png": encode_png(16, 16, rgb),
        "jpeg": encode_jpeg_baseline(16, 16, px.flatten()),
        "jpeg_arith": encode_jpeg_arith(16, 16, px.flatten()),
        "jpeg_prog_arith": encode_jpeg_arith_progressive(16, 16, px.flatten(), al=1),
        "jpeg_lossless": encode_jpeg_lossless(
            16, 16, [int(v) for v in px.flatten()]
        ),
        "jpeg_hier": encode_jpeg_hierarchical(
            16, 16, [int(v) for v in px.flatten()]
        ),
        "gif": encode_gif(16, 16, px.flatten()),
    }
    for name, blob in blobs.items():
        ok, err = try_decode_image(blob)
        assert err is None and (ok == decode_image(blob)).all(), name
        # every truncation point
        for cut in range(len(blob)):
            out, err = try_decode_image(blob[:cut])  # must not raise
            assert (out is None) == (err is not None), (name, cut)
        # a byte flip at every offset
        for off in range(len(blob)):
            mut = bytearray(blob)
            mut[off] ^= 0x5A
            out, err = try_decode_image(bytes(mut))
            assert (out is None) == (err is not None), (name, off)
    # non-image garbage
    for junk in (b"", b"\x00" * 40, b"not an image at all", bytes(range(256))):
        out, err = try_decode_image(junk)
        assert out is None and err


def test_try_decode_wav_survives_systematic_corruption():
    """WAV analogue of the image corruption fuzz: every truncation and
    byte flip must yield (samples, None) or (None, err), never a raise;
    pristine round-trip must match the strict decoder."""
    import numpy as np

    from aetherium_trader_datapipeline_spark.operators.multimodal import (
        decode_wav_samples,
        encode_wav,
        try_decode_wav,
    )

    rng = np.random.default_rng(11)
    vals = [int(v) for v in rng.integers(-30000, 30000, 64)]
    blob = encode_wav(8000, 2, 32, bits=16, samples=vals)
    ok, err = try_decode_wav(blob)
    assert err is None and (ok == decode_wav_samples(blob)).all()
    for cut in range(len(blob)):
        out, err = try_decode_wav(blob[:cut])
        assert (out is None) == (err is not None), cut
    for off in range(len(blob)):
        mut = bytearray(blob)
        mut[off] ^= 0x5A
        out, err = try_decode_wav(bytes(mut))
        assert (out is None) == (err is not None), off


def test_decode_image_decompression_bomb_guard():
    """A corrupt or adversarial header declaring a huge raster must be
    rejected BEFORE allocation (r10): the h*w numpy allocation would
    otherwise OOM the worker — a failure mode try_decode_image's except
    clause cannot catch. Small real images are unaffected; max_pixels=None
    opts trusted inputs out."""
    import numpy as np
    import pytest

    from aetherium_trader_datapipeline_spark.operators.multimodal import (
        decode_image,
        encode_gif,
        encode_jpeg_baseline,
        encode_png,
        try_decode_image,
    )

    rng = np.random.default_rng(12)
    px = rng.integers(0, 256, (8, 8), dtype=np.uint8)
    bombs = {}
    # PNG: IHDR width/height at offsets 16/20 (big-endian)
    b = bytearray(encode_png(8, 8, rng.integers(0, 256, 8 * 8 * 3, dtype=np.uint8)))
    b[16:20] = (65535).to_bytes(4, "big")
    b[20:24] = (65535).to_bytes(4, "big")
    bombs["png"] = bytes(b)
    # JPEG: SOF0 height/width live 5/7 bytes into the segment
    b = bytearray(encode_jpeg_baseline(8, 8, px.flatten()))
    i = b.find(b"\xff\xc0")
    b[i + 5 : i + 7] = (65500).to_bytes(2, "big")
    b[i + 7 : i + 9] = (65500).to_bytes(2, "big")
    bombs["jpeg"] = bytes(b)
    # GIF: the IMAGE DESCRIPTOR dims (not the logical screen) size the
    # LZW output and palette gather — the r10 review showed a
    # logical-screen-only check is bypassable, so the bomb mutates the
    # descriptor at 13 + 768 (GCT) + 5
    b = bytearray(encode_gif(8, 8, px.flatten()))
    desc = 13 + 768
    assert b[desc] == 0x2C
    b[desc + 5 : desc + 7] = (65535).to_bytes(2, "little")
    b[desc + 7 : desc + 9] = (65535).to_bytes(2, "little")
    bombs["gif"] = bytes(b)

    for name, blob in bombs.items():
        with pytest.raises(ValueError, match="decompression-bomb"):
            decode_image(blob)
        out, err = try_decode_image(blob)
        assert out is None and "decompression-bomb" in err, name

    # small real images still decode; the cap itself is overridable
    ok = decode_image(encode_gif(8, 8, px.flatten()))
    assert ok.shape[:2] == (8, 8)


def test_decompression_bomb_guard_bypasses_closed():
    """r10 review regressions: the cap must bind at each decoder's OWN
    dimension parse — (a) a JPEG hiding a huge SECOND SOF behind a tiny
    first one (the decoder honors the last SOF), (b) a GIF whose tiny
    logical screen vouched for a huge image descriptor."""
    import struct

    import numpy as np
    import pytest

    from aetherium_trader_datapipeline_spark.operators.multimodal import (
        decode_image,
        decode_jpeg_pixels,
        encode_jpeg_baseline,
        parse_image_header,
    )

    rng = np.random.default_rng(16)
    px = rng.integers(0, 256, (8, 8), dtype=np.uint8)
    good = encode_jpeg_baseline(8, 8, px.flatten())
    i = good.find(b"\xff\xc0")
    seg_len = int.from_bytes(good[i + 2 : i + 4], "big")
    small_sof = good[i : i + 2 + seg_len]
    huge_sof = bytearray(small_sof)
    huge_sof[5:7] = struct.pack(">H", 60000)
    huge_sof[7:9] = struct.pack(">H", 60000)
    # tiny SOF first, huge SOF after: a header-level parser reports 8x8
    blob = good[: i + 2 + seg_len] + bytes(huge_sof) + good[i + 2 + seg_len :]
    assert parse_image_header(blob)[:2] == (8, 8)
    with pytest.raises(ValueError, match="decompression-bomb"):
        decode_jpeg_pixels(blob)
    with pytest.raises(ValueError, match="decompression-bomb"):
        decode_image(blob)


def test_png_idat_inflate_bound():
    """Second bomb vector (r10): tiny declared dims (passes the header
    guard) but an IDAT that inflates far past the raster — deflate
    amplifies ~1000x, so the inflate must be bounded by the declared
    size, not materialized then checked."""
    import struct
    import zlib

    import numpy as np
    import pytest

    from aetherium_trader_datapipeline_spark.operators.multimodal import (
        decode_png_pixels,
        encode_png,
        try_decode_image,
    )

    def chunk(tag, payload):
        return (
            struct.pack(">I", len(payload)) + tag + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
        )

    # valid 8x8 RGB header, IDAT inflating to 10 MB instead of 200 B
    rng = np.random.default_rng(13)
    good = encode_png(8, 8, rng.integers(0, 256, 8 * 8 * 3, dtype=np.uint8))
    ihdr_end = good.find(b"IDAT") - 4
    bomb = (
        good[:ihdr_end]
        + chunk(b"IDAT", zlib.compress(bytes(10_000_000), 9))
        + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="inflates past"):
        decode_png_pixels(bomb)
    out, err = try_decode_image(bomb)
    assert out is None and "inflates past" in err
    # the bound must not disturb valid decodes (incl. interlaced — its
    # expected size is a per-pass sum)
    assert decode_png_pixels(good).shape == (8, 8, 3)


def test_gif_lzw_output_bound():
    """GIF analogue of the IDAT inflate bound: an LZW stream that keeps
    emitting past w*h indices must fail DURING decode, not after
    materializing the oversized output."""
    import numpy as np
    import pytest

    from aetherium_trader_datapipeline_spark.operators.multimodal import (
        decode_gif_pixels,
        encode_gif,
        try_decode_image,
    )

    rng = np.random.default_rng(14)
    px = rng.integers(0, 256, (4, 4), dtype=np.uint8)
    big = encode_gif(64, 64, rng.integers(0, 256, 64 * 64, dtype=np.uint8))
    small = encode_gif(4, 4, px.flatten())
    # graft the 64x64 image's LZW payload under a 4x4 descriptor: find
    # the image descriptors (0x2C after the 13-byte header + 768-byte GCT)
    desc = 13 + 768
    assert small[desc] == 0x2C and big[desc] == 0x2C
    bomb = small[: desc + 10] + big[desc + 10 :]
    with pytest.raises(ValueError, match="more than 16 indices"):
        decode_gif_pixels(bomb)
    out, err = try_decode_image(bomb)
    assert out is None and "more than 16" in err
    # valid streams unaffected
    assert decode_gif_pixels(small).shape == (4, 4, 3)


def test_jpeg_hier_frame_size_cap():
    """A crafted hierarchical stream can declare a huge DIFFERENTIAL
    frame after EXP doublings even though the base SOF (all the
    dispatch-level guard sees) is tiny — every frame's SOF must be
    capped individually."""
    import struct

    import numpy as np
    import pytest

    from aetherium_trader_datapipeline_spark.operators.jpeg_hier import (
        decode_jpeg_hierarchical,
        encode_jpeg_hierarchical,
    )

    px = np.full((32, 32), 77, dtype=np.uint8)
    blob = bytearray(encode_jpeg_hierarchical(32, 32, px.flatten()))
    i = blob.find(b"\xff\xc5")  # the differential frame's SOF5
    assert i > 0
    # SOF payload: len(2) prec(1) h(2) w(2) — blow the dims to 60000^2
    blob[i + 5 : i + 7] = struct.pack(">H", 60000)
    blob[i + 7 : i + 9] = struct.pack(">H", 60000)
    with pytest.raises(ValueError, match="decompression-bomb"):
        decode_jpeg_hierarchical(bytes(blob))


def test_try_decode_image_corruption_variant_formats():
    """Second fuzz wave (r10): the variant encode paths route through
    DIFFERENT decode branches (16-bit/palette/Adam7 PNG, 4:2:0 color and
    Huffman-progressive JPEG, interlaced GIF) — same contract: every
    truncation and byte flip yields (pixels, None) or (None, err), never
    a raise."""
    import numpy as np

    from aetherium_trader_datapipeline_spark.operators.multimodal import (
        decode_image,
        encode_gif,
        encode_jpeg_420,
        encode_jpeg_progressive,
        encode_png16,
        encode_png_interlaced,
        encode_png_palette,
        try_decode_image,
    )

    rng = np.random.default_rng(15)
    g = rng.integers(0, 256, 12 * 12, dtype=np.uint8)
    rgb = rng.integers(0, 256, 12 * 12 * 3, dtype=np.uint8)
    pal = [(i, 255 - i, i ^ 0x55) for i in range(256)]
    blobs = {
        "png16": encode_png16(12, 12, [int(v) * 257 for v in g]),
        "png_palette": encode_png_palette(12, 12, g, pal),
        "png_adam7": encode_png_interlaced(12, 12, rgb),
        "jpeg_420": encode_jpeg_420(16, 16,
                                    rng.integers(0, 256, 16 * 16, dtype=np.uint8),
                                    rng.integers(0, 256, 16 * 16, dtype=np.uint8),
                                    rng.integers(0, 256, 16 * 16, dtype=np.uint8)),
        "jpeg_prog_huff": encode_jpeg_progressive(16, 16,
                                                  rng.integers(0, 256, 256,
                                                               dtype=np.uint8)),
        "gif_interlaced": encode_gif(12, 12, g[: 12 * 12], interlace=True),
    }
    for name, blob in blobs.items():
        ok, err = try_decode_image(blob)
        assert err is None and (ok == decode_image(blob)).all(), (name, err)
        for cut in range(len(blob)):
            out, err = try_decode_image(blob[:cut])
            assert (out is None) == (err is not None), (name, cut)
        for off in range(len(blob)):
            mut = bytearray(blob)
            mut[off] ^= 0xA5
            out, err = try_decode_image(bytes(mut))
            assert (out is None) == (err is not None), (name, off)


def test_png_truncated_idat_trailer_rejected():
    """r10 review regression: the bounded inflate must keep the one-shot
    zlib.decompress completeness contract — a deflate stream cut inside
    its adler32 trailer is CORRUPT and must be tagged, not silently
    decoded as a good image; trailing garbage after a complete stream
    stays accepted (one-shot parity)."""
    import struct
    import zlib

    import numpy as np
    import pytest

    from aetherium_trader_datapipeline_spark.operators.multimodal import (
        decode_png_pixels,
        encode_png,
        try_decode_image,
    )

    def chunk(tag, payload):
        return (
            struct.pack(">I", len(payload)) + tag + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
        )

    rng = np.random.default_rng(17)
    good = encode_png(8, 8, rng.integers(0, 256, 8 * 8 * 3, dtype=np.uint8))
    i = good.find(b"IDAT") - 4
    ln = int.from_bytes(good[i : i + 4], "big")
    idat = good[i + 8 : i + 8 + ln]
    tail = good[i + 12 + ln :]

    cut = good[:i] + chunk(b"IDAT", idat[:-2]) + tail  # inside adler32
    with pytest.raises(ValueError, match="truncated IDAT"):
        decode_png_pixels(cut)
    out, err = try_decode_image(cut)
    assert out is None and "truncated IDAT" in err

    padded = good[:i] + chunk(b"IDAT", idat + b"\x00garbage") + tail
    assert decode_png_pixels(padded).shape == (8, 8, 3)  # one-shot parity


def test_decode_image_max_pixels_none_opt_out():
    """max_pixels=None must thread through to every decoder (r10 review:
    the opt-out went untested after the cap moved into the decoders).
    A GIF whose LOGICAL SCREEN is huge but whose image descriptor is 8x8
    is safe to decode and exercises the threading; a tightened cap must
    conversely reject a normal small image, proving the parameter (not a
    module constant) is what binds."""
    import numpy as np
    import pytest

    from aetherium_trader_datapipeline_spark.operators.multimodal import (
        decode_image,
        encode_gif,
    )

    rng = np.random.default_rng(18)
    px = rng.integers(0, 256, (8, 8), dtype=np.uint8)
    blob = bytearray(encode_gif(8, 8, px.flatten()))
    blob[6:8] = (65535).to_bytes(2, "little")   # logical screen only
    blob[8:10] = (65535).to_bytes(2, "little")
    out = decode_image(bytes(blob), max_pixels=None)
    assert out.shape[:2] == (8, 8)
    out = decode_image(bytes(blob))  # descriptor 8x8 passes default cap
    assert out.shape[:2] == (8, 8)
    with pytest.raises(ValueError, match="decompression-bomb"):
        decode_image(bytes(blob), max_pixels=16)  # 8*8 > 16: param binds


def test_fused_synth_stats_equals_two_pass(spark):
    """r13: image_pixel_stats_synth / audio_waveform_stats_synth (one
    MapInPandas, blob never leaves the worker) must be row-identical to
    the original make_blobs-mapInPandas → *_stats two-pass pipeline."""
    from aetherium_trader_datapipeline_spark.operators.multimodal import (
        audio_waveform_stats,
        audio_waveform_stats_synth,
        encode_png,
        encode_wav,
        image_pixel_stats,
        image_pixel_stats_synth,
    )

    ids = spark.createDataFrame([(d,) for d in range(1, 24)], "doc_id LONG")

    def png_blob(d: int) -> bytes:
        w, h = 4 + d % 5, 3 + d % 4
        px = bytes(
            (d * 31 + x * 7 + y * 13 + c * 17) % 256
            for y in range(h)
            for x in range(w)
            for c in range(3)
        )
        return encode_png(w, h, pixels=px, cycle_filters=True)

    def wav_blob(d: int) -> bytes:
        n = 50 + d % 20
        samples = [(d * 7 + j * 11) % 65536 - 32768 for j in range(n * 2)]
        return encode_wav(8000, 2, n, samples=samples)

    import pandas as pd

    def two_pass(stats_op, make):
        def mk(batches):
            for pdf in batches:
                out = pdf.copy()
                out["blob"] = [make(int(d)) for d in pdf["doc_id"].tolist()]
                yield out

        withb = ids.mapInPandas(mk, "doc_id bigint, blob binary")
        return stats_op(withb, "blob")

    for stats_op, synth_op, make in [
        (image_pixel_stats, image_pixel_stats_synth, png_blob),
        (audio_waveform_stats, audio_waveform_stats_synth, wav_blob),
    ]:
        old = two_pass(stats_op, make).orderBy("doc_id")
        new = synth_op(ids, make).orderBy("doc_id")
        assert old.schema == new.schema
        assert old.collect() == new.collect()


def test_fused_resize_synth_equals_two_pass(spark):
    """r13: image_resize_stats_synth must match the two-pass
    make_blobs → image_resize_stats pipeline row for row."""
    from aetherium_trader_datapipeline_spark.operators.multimodal import (
        encode_png,
        image_resize_stats,
        image_resize_stats_synth,
    )

    ids = spark.createDataFrame([(d,) for d in range(1, 24)], "doc_id LONG")

    def png_blob(d: int) -> bytes:
        w, h = 4 + d % 5, 3 + d % 4
        px = bytes(
            (d * 31 + x * 7 + y * 13 + c * 17) % 256
            for y in range(h)
            for x in range(w)
            for c in range(3)
        )
        return encode_png(w, h, pixels=px, cycle_filters=True)

    def mk(batches):
        for pdf in batches:
            out = pdf.copy()
            out["blob"] = [png_blob(int(d)) for d in pdf["doc_id"].tolist()]
            yield out

    withb = ids.mapInPandas(mk, "doc_id bigint, blob binary")
    old = image_resize_stats(withb, "blob", factor=2).orderBy("doc_id")
    new = image_resize_stats_synth(ids, png_blob, factor=2).orderBy("doc_id")
    assert old.schema == new.schema
    assert old.collect() == new.collect()
