"""Baseline JPEG codec (kernels/jpeg.py): roundtrip fidelity, format
edge cases, and the error discipline the multimodal operators rely on."""

import struct

import numpy as np
import pytest

from autoscan_spark.kernels.jpeg import decode_jpeg, encode_jpeg


def _smooth(h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    ramp = (xx * 255 / max(w - 1, 1) + yy * 128 / max(h - 1, 1)) / 1.5
    return np.stack([ramp, 255 - ramp, ramp / 2], axis=-1).astype(np.uint8)


def _psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 99.0 if mse == 0 else 10 * np.log10(255.0**2 / mse)


def test_roundtrip_smooth_high_quality():
    img = _smooth(48, 64)
    dec = decode_jpeg(encode_jpeg(img, quality=95))
    assert dec.shape == img.shape and dec.dtype == np.uint8
    assert _psnr(img, dec) > 38


def test_roundtrip_odd_sizes_and_gray():
    img = _smooth(13, 17)
    assert decode_jpeg(encode_jpeg(img, 85)).shape == (13, 17, 3)
    g = _smooth(21, 9)[..., 0]
    dg = decode_jpeg(encode_jpeg(g, 90))
    assert dg.shape == (21, 9)
    assert _psnr(g, dg) > 35


def test_quality_monotone_size():
    img = _smooth(32, 32) + np.random.RandomState(3).randint(
        0, 20, (32, 32, 3)
    ).astype(np.uint8)
    sizes = [len(encode_jpeg(img, q)) for q in (10, 50, 95)]
    assert sizes[0] < sizes[1] < sizes[2]


def test_deterministic_bytes():
    img = _smooth(24, 24)
    assert encode_jpeg(img, 80) == encode_jpeg(img, 80)


def test_restart_markers_roundtrip():
    """DRI + RSTn every 2 MCUs: predictors reset, decoder resyncs on the
    byte-aligned markers — output identical to the no-restart encode."""
    img = _smooth(32, 48)  # 4×6 MCUs at 4:4:4
    plain = decode_jpeg(encode_jpeg(img, 85))
    rst = encode_jpeg(img, 85, restart_interval=2)
    assert b"\xff\xdd" in rst  # DRI present
    assert any(bytes([0xFF, 0xD0 + i]) in rst for i in range(8))
    assert np.array_equal(decode_jpeg(rst), plain)


def test_byte_stuffing_survives():
    """Find an image whose entropy stream contains stuffed 0xFF bytes and
    confirm the decoder unstuffs (roundtrip still accurate)."""
    rng = np.random.RandomState(7)
    for _ in range(20):
        img = rng.randint(0, 256, (16, 16, 3)).astype(np.uint8)
        enc = encode_jpeg(img, 95)
        body = enc[2:-2]
        if b"\xff\x00" in body:
            decode_jpeg(enc)  # must not raise / desync
            return
    pytest.fail("no stuffed byte produced in 20 random images")


def test_rejects_garbage_and_truncation():
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"\x00" * 32)
    enc = encode_jpeg(_smooth(16, 16), 85)
    with pytest.raises(ValueError):
        decode_jpeg(enc[:20])  # truncated in headers
    # truncated entropy data decodes zeros past the end rather than raising
    # mid-scan only if SOS was reached; cutting before SOS must raise
    sos = enc.index(b"\xff\xda")
    with pytest.raises(ValueError):
        decode_jpeg(enc[:sos])


def test_fuzzed_corruption_never_escapes_value_error():
    """Random byte-level corruption of a valid stream must always surface
    as ValueError/NotImplementedError (kernel error contract) — never
    struct.error/IndexError, which would fail a Spark task opaquely —
    or decode to SOME image (JPEG tolerates many entropy-bit flips)."""
    rng = np.random.RandomState(5)
    enc = bytearray(encode_jpeg(_smooth(16, 16), 85))
    for _ in range(300):
        mut = bytearray(enc)
        for _ in range(rng.randint(1, 4)):
            mut[rng.randint(2, len(mut))] = rng.randint(0, 256)
        try:
            out = decode_jpeg(bytes(mut))
            assert isinstance(out, np.ndarray)
        except (ValueError, NotImplementedError):
            pass  # the documented failure modes


def test_rejects_progressive():
    enc = bytearray(encode_jpeg(_smooth(16, 16), 85))
    i = enc.index(b"\xff\xc0")
    enc[i + 1] = 0xC2  # masquerade as progressive SOF2
    with pytest.raises(NotImplementedError, match="baseline"):
        decode_jpeg(bytes(enc))


def test_decoder_handles_420_subsampled_stream():
    """The decoder supports sampling factors the encoder doesn't emit:
    hand-build a 16×16 4:2:0 stream (one MCU: 4 Y blocks + 1 Cb + 1 Cr at
    half resolution) out of the module's own primitives and check the
    decoded image against the expected chroma-upsampled reconstruction."""
    from autoscan_spark.kernels import jpeg as J

    img = _smooth(16, 16)
    ycc = J.rgb_to_ycbcr(img)
    y = ycc[..., 0]
    # box-average chroma to 8×8 (the classic 4:2:0 downsample)
    cb = ycc[..., 1].reshape(8, 2, 8, 2).mean(axis=(1, 3))
    cr = ycc[..., 2].reshape(8, 2, 8, 2).mean(axis=(1, 3))

    qluma = J._scaled_quant(J.QUANT_LUMA, 95)
    qchroma = J._scaled_quant(J.QUANT_CHROMA, 95)
    dc_codes = [
        J._canonical_codes(J.DC_LUMA_BITS, J.DC_LUMA_VALS),
        J._canonical_codes(J.DC_CHROMA_BITS, J.DC_CHROMA_VALS),
    ]
    ac_codes = [
        J._canonical_codes(J.AC_LUMA_BITS, J.AC_LUMA_VALS),
        J._canonical_codes(J.AC_CHROMA_BITS, J.AC_CHROMA_VALS),
    ]

    def quantize(block, qtab):
        coeffs = J._T @ (block - 128.0) @ J._T.T
        qraster = np.empty(64)
        qraster[J.ZIGZAG] = qtab
        return np.round(coeffs / qraster.reshape(8, 8)).astype(np.int64).reshape(
            64
        )[J.ZIGZAG]

    writer = J._BitWriter()
    preds = {0: 0, 1: 0, 2: 0}

    def emit(zz, comp, tsel):
        diff = int(zz[0]) - preds[comp]
        preds[comp] = int(zz[0])
        s, extra = J._magnitude(diff)
        code, ln = dc_codes[tsel][s]
        writer.write(code, ln)
        if s:
            writer.write(extra, s)
        run = 0
        nz = np.nonzero(zz[1:])[0]
        last = nz[-1] + 1 if len(nz) else 0
        for k in range(1, last + 1):
            v = int(zz[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, ln = ac_codes[tsel][0xF0]
                writer.write(code, ln)
                run -= 16
            s, extra = J._magnitude(v)
            code, ln = ac_codes[tsel][(run << 4) | s]
            writer.write(code, ln)
            writer.write(extra, s)
            run = 0
        if last < 63:
            code, ln = ac_codes[tsel][0x00]
            writer.write(code, ln)

    # one 4:2:0 MCU: Y blocks in raster order, then Cb, then Cr
    for by in range(2):
        for bx in range(2):
            emit(
                quantize(y[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8], qluma),
                0,
                0,
            )
    emit(quantize(cb, qchroma), 1, 1)
    emit(quantize(cr, qchroma), 2, 1)
    writer.flush()

    out = bytearray(b"\xff\xd8")
    for tid, qt in ((0, qluma), (1, qchroma)):
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tid]) + bytes(
            int(x) for x in qt
        )
    out += b"\xff\xc0" + struct.pack(">HBHHB", 17, 8, 16, 16, 3)
    out += bytes([1, 0x22, 0])  # Y: h=2, v=2
    out += bytes([2, 0x11, 1])  # Cb: h=1, v=1
    out += bytes([3, 0x11, 1])  # Cr
    for tclass, tid, bits, vals in (
        (0, 0, J.DC_LUMA_BITS, J.DC_LUMA_VALS),
        (1, 0, J.AC_LUMA_BITS, J.AC_LUMA_VALS),
        (0, 1, J.DC_CHROMA_BITS, J.DC_CHROMA_VALS),
        (1, 1, J.AC_CHROMA_BITS, J.AC_CHROMA_VALS),
    ):
        payload = bytes(bits) + bytes(vals)
        out += b"\xff\xc4" + struct.pack(">H", 3 + len(payload)) + bytes(
            [(tclass << 4) | tid]
        ) + payload
    out += b"\xff\xda" + struct.pack(">HB", 12, 3)
    out += bytes([1, 0x00, 2, 0x11, 3, 0x11]) + b"\x00\x3f\x00"
    out += writer.out + b"\xff\xd9"

    dec = decode_jpeg(bytes(out))
    assert dec.shape == (16, 16, 3)
    # expected reconstruction: chroma np.repeat-upsampled from 8×8
    up = np.stack(
        [
            y,
            np.repeat(np.repeat(cb, 2, axis=0), 2, axis=1),
            np.repeat(np.repeat(cr, 2, axis=0), 2, axis=1),
        ],
        axis=-1,
    )
    want = J.ycbcr_to_rgb(up)
    assert _psnr(want, dec) > 35


def test_decode_image_dispatches_jpeg(spark):
    from autoscan_spark.operators.multimodal import decode_image

    img = _smooth(20, 20)
    out = decode_image(encode_jpeg(img, 92))
    assert out.shape == (20, 20, 3)
    assert _psnr(img, out) > 35


def test_mjpg_avi_end_to_end():
    """Real MJPG video: JPEG-encoded frames in a RIFF/AVI container decode
    end to end with no dependencies (container parse + frame decode)."""
    from autoscan_spark.operators.multimodal import encode_avi, parse_avi
    from autoscan_spark.operators.multimodal import decode_image

    frames = [_smooth(16, 24) + i for i in range(4)]
    payload = encode_avi(
        [encode_jpeg(f, 90) for f in frames], fps=5, width=24, height=16,
        codec=b"MJPG",
    )
    meta, raw = parse_avi(payload)
    assert meta["codec"] == "MJPG" and meta["n_frames"] == 4
    for f, r in zip(frames, raw):
        dec = decode_image(r)
        assert dec.shape == (16, 24, 3)
        assert _psnr(f, dec) > 30
