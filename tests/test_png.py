"""PNG codec tests (kernels.png): lossless roundtrip across every color
shape and scanline filter, palette/tRNS expansion, corrupt-stream error
discipline, and honest capability gates — the same contract test_jpeg.py
pins for the JPEG codec."""

import struct
import zlib

import numpy as np
import pytest

from autoscan_spark.kernels.png import (
    _SIGNATURE,
    _chunk,
    decode_png,
    encode_png,
)


def _rand(shape, seed=0):
    return np.random.default_rng(seed).integers(0, 256, shape, dtype=np.uint8)


@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
@pytest.mark.parametrize(
    "shape", [(13, 17), (13, 17, 2), (13, 17, 3), (13, 17, 4)]
)
def test_roundtrip_all_shapes_and_filters(shape, filter_type):
    """PNG is lossless: every color shape × every scanline filter must
    decode back bit-identical (exercises the None/Sub/Up/Average/Paeth
    unfilter paths independently)."""
    arr = _rand(shape, seed=len(shape) * 10 + filter_type)
    out = decode_png(encode_png(arr, filter_type=filter_type))
    assert out.shape == arr.shape
    assert np.array_equal(out, arr)


def test_roundtrip_edge_dimensions():
    for shape in [(1, 1), (1, 1, 3), (1, 64, 4), (64, 1), (2, 3, 2)]:
        arr = _rand(shape, seed=9)
        assert np.array_equal(decode_png(encode_png(arr, filter_type=4)), arr)


@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
@pytest.mark.parametrize(
    "shape", [(13, 17), (13, 17, 2), (13, 17, 3), (13, 17, 4)]
)
def test_adam7_roundtrip_all_shapes_and_filters(shape, filter_type):
    """Adam7 is a reordering, not a transform: interlaced encode must
    decode back bit-identical through the de-interlace scatter, with
    every sub-image exercising the chosen unfilter path."""
    arr = _rand(shape, seed=100 + len(shape) * 10 + filter_type)
    out = decode_png(encode_png(arr, filter_type=filter_type, interlace=True))
    assert out.shape == arr.shape
    assert np.array_equal(out, arr)


def test_adam7_edge_dimensions_skip_empty_passes():
    # images smaller than the pass grid produce EMPTY passes (no bytes at
    # all, per spec) — 1x1 uses only pass 1; 3x2 skips passes 2 and 4 etc.
    for shape in [(1, 1), (1, 1, 3), (3, 2, 4), (2, 3), (8, 8, 3), (9, 5)]:
        arr = _rand(shape, seed=11)
        assert np.array_equal(
            decode_png(encode_png(arr, filter_type=3, interlace=True)), arr
        ), shape


def test_adam7_pass_grid_matches_spec():
    """Pin the pass geometry against the 8x8 pass-number matrix printed in
    the PNG spec (§8.2) — a roundtrip test alone cannot catch a
    wrong-but-self-consistent pass table (the encoder and decoder would
    agree with each other and disagree with every other PNG reader)."""
    from autoscan_spark.kernels.png import _ADAM7

    spec = [
        [1, 6, 4, 6, 2, 6, 4, 6],
        [7, 7, 7, 7, 7, 7, 7, 7],
        [5, 6, 5, 6, 5, 6, 5, 6],
        [7, 7, 7, 7, 7, 7, 7, 7],
        [3, 6, 4, 6, 3, 6, 4, 6],
        [7, 7, 7, 7, 7, 7, 7, 7],
        [5, 6, 5, 6, 5, 6, 5, 6],
        [7, 7, 7, 7, 7, 7, 7, 7],
    ]
    grid = np.zeros((8, 8), dtype=int)
    for n, (x0, y0, xs, ys) in enumerate(_ADAM7, start=1):
        grid[y0::ys, x0::xs] = n
    assert grid.tolist() == spec


def test_adam7_equals_noninterlaced_decode():
    arr = _rand((32, 24, 3), seed=12)
    a = decode_png(encode_png(arr, filter_type=2, interlace=True))
    b = decode_png(encode_png(arr, filter_type=2, interlace=False))
    assert np.array_equal(a, b)


def test_adam7_trailing_bytes_raise():
    arr = _rand((8, 8), seed=13)
    png = encode_png(arr, filter_type=0, interlace=True)
    # splice one extra byte into the inflated stream and rebuild the IDAT
    body_start = png.index(b"IDAT") + 4
    # decode, append a byte, re-encode the IDAT chunk
    raw = zlib.decompress(png[body_start : png.index(b"IEND") - 8])
    bad_idat = _chunk(b"IDAT", zlib.compress(raw + b"\x00"))
    head = png[: png.index(b"IDAT") - 4]
    with pytest.raises(ValueError, match="trailing bytes"):
        decode_png(head + bad_idat + _chunk(b"IEND", b""))


def _palette_png(idx, pal, trns=None):
    lines = b"".join(b"\x00" + idx[y].tobytes() for y in range(idx.shape[0]))
    chunks = [
        _chunk(b"IHDR", struct.pack(
            ">IIBBBBB", idx.shape[1], idx.shape[0], 8, 3, 0, 0, 0)),
        _chunk(b"PLTE", pal.tobytes()),
    ]
    if trns is not None:
        chunks.append(_chunk(b"tRNS", trns))
    chunks += [_chunk(b"IDAT", zlib.compress(lines)), _chunk(b"IEND", b"")]
    return _SIGNATURE + b"".join(chunks)


def test_palette_expands_to_rgb():
    pal = _rand((7, 3), seed=1)
    idx = np.random.default_rng(2).integers(0, 7, (9, 11), dtype=np.uint8)
    assert np.array_equal(decode_png(_palette_png(idx, pal)), pal[idx])


def test_palette_trns_expands_to_rgba():
    pal = _rand((5, 3), seed=3)
    idx = np.random.default_rng(4).integers(0, 5, (6, 8), dtype=np.uint8)
    out = decode_png(_palette_png(idx, pal, trns=bytes([0, 128, 255])))
    assert out.shape == (6, 8, 4)
    assert np.array_equal(out[..., :3], pal[idx])
    alpha = np.array([0, 128, 255, 255, 255], dtype=np.uint8)
    assert np.array_equal(out[..., 3], alpha[idx])


def test_palette_index_out_of_range_raises():
    pal = _rand((4, 3), seed=5)
    idx = np.full((2, 2), 9, dtype=np.uint8)
    with pytest.raises(ValueError, match="palette index"):
        decode_png(_palette_png(idx, pal))


def test_corrupt_streams_raise_valueerror():
    good = encode_png(_rand((8, 8, 3), seed=6), filter_type=4)
    with pytest.raises(ValueError, match="not a PNG"):
        decode_png(b"nope" + good)
    # flip a CRC byte
    bad = bytearray(good)
    bad[-5] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(bad))
    # truncate mid-chunk
    with pytest.raises(ValueError, match="truncated|IEND"):
        decode_png(good[:-20])
    # corrupt an IDAT body byte but fix the chunk CRC, so the failure
    # surfaces from the zlib stream (or the unfiltered pixel check), not
    # the CRC gate
    i = good.index(b"IDAT")
    (ln,) = struct.unpack(">I", good[i - 4 : i])
    bad = bytearray(good)
    bad[i + 8] ^= 0x55
    data = bytes(bad[i + 4 : i + 4 + ln])
    bad[i + 4 + ln : i + 8 + ln] = struct.pack(
        ">I", zlib.crc32(b"IDAT" + data) & 0xFFFFFFFF
    )
    with pytest.raises(ValueError, match="inflate|pixel data|filter"):
        decode_png(bytes(bad))
    # inflated pixel data too short for the advertised dimensions
    short = (
        _SIGNATURE
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", 8, 8, 8, 2, 0, 0, 0))
        + _chunk(b"IDAT", zlib.compress(b"\x00" * 10))
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="pixel data"):
        decode_png(short)
    # unknown filter type byte
    rows = b"\x07" + b"\x00" * 6
    badfilter = (
        _SIGNATURE
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 1, 8, 2, 0, 0, 0))
        + _chunk(b"IDAT", zlib.compress(rows))
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="filter type"):
        decode_png(badfilter)


def test_capability_gates():
    def ihdr(depth, interlace, color=2):
        return _chunk(
            b"IHDR", struct.pack(">IIBBBBB", 4, 4, depth, color, 0, 0, interlace)
        )

    tail = _chunk(b"IDAT", zlib.compress(b"")) + _chunk(b"IEND", b"")
    # Adam7 decodes since r6 — an EMPTY interlaced stream is now a
    # corruption error (first pass truncated), not a capability gate
    with pytest.raises(ValueError, match="Adam7 pass truncated"):
        decode_png(_SIGNATURE + ihdr(8, 1) + tail)
    # 16-bit decodes since late r6 — an empty stream is a size error
    with pytest.raises(ValueError, match="pixel data"):
        decode_png(_SIGNATURE + ihdr(16, 0) + tail)
    # illegal depth/color combos (spec table 11.1) are corruption errors:
    # 4-bit RGB and 16-bit palette don't exist
    with pytest.raises(ValueError, match="illegal PNG depth/color"):
        decode_png(_SIGNATURE + ihdr(4, 0, color=2) + tail)
    with pytest.raises(ValueError, match="illegal PNG depth/color"):
        decode_png(_SIGNATURE + ihdr(16, 0, color=3) + tail)
    with pytest.raises(ValueError, match="zero-dimension"):
        decode_png(
            _SIGNATURE
            + _chunk(b"IHDR", struct.pack(">IIBBBBB", 0, 4, 8, 2, 0, 0, 0))
            + tail
        )


@pytest.mark.parametrize("interlace", [False, True])
@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
@pytest.mark.parametrize(
    "shape", [(13, 17), (13, 17, 2), (13, 17, 3), (13, 17, 4), (1, 1)]
)
def test_16bit_roundtrip(shape, filter_type, interlace):
    """16-bit channels: byte-wise filters + big-endian sample recombine
    must roundtrip bit-exact for every color shape, filter, and
    interlace mode; dtype must come back uint16."""
    arr = np.random.default_rng(sum(shape) + filter_type).integers(
        0, 65536, shape, dtype=np.uint16
    )
    out = decode_png(
        encode_png(arr, filter_type=filter_type, interlace=interlace)
    )
    assert out.dtype == np.uint16
    assert np.array_equal(out, arr)


@pytest.mark.parametrize("interlace", [False, True])
@pytest.mark.parametrize("depth", [1, 2, 4])
def test_packed_gray_roundtrip(depth, interlace):
    """1/2/4-bit packed gray: MSB-first unpack + the exact 255/(2^d-1)
    scale; odd width exercises scanline bit padding, and Adam7 packs
    each pass independently."""
    arr = np.random.default_rng(depth).integers(
        0, 1 << depth, (11, 23), dtype=np.uint8
    )
    for ft in (0, 1, 2, 3, 4):
        out = decode_png(
            encode_png(arr, filter_type=ft, interlace=interlace, depth=depth)
        )
        assert np.array_equal(out, arr * (255 // ((1 << depth) - 1))), (
            depth, ft, interlace,
        )


@pytest.mark.parametrize("depth", [1, 2, 4, 8])
def test_packed_palette_roundtrip(depth):
    """Sub-byte palette indices expand through PLTE exactly."""
    rng = np.random.default_rng(depth + 20)
    pal = rng.integers(0, 256, (min(1 << depth, 16), 3), dtype=np.uint8)
    arr = rng.integers(0, len(pal), (9, 14), dtype=np.uint8)
    for interlace in (False, True):
        out = decode_png(
            encode_png(
                arr, filter_type=4, interlace=interlace,
                depth=depth, palette=pal.tobytes(),
            )
        )
        assert np.array_equal(out, pal[arr]), (depth, interlace)


def test_encode_rejects_out_of_range_packed_samples():
    with pytest.raises(ValueError, match="out of range"):
        encode_png(np.full((4, 4), 4, dtype=np.uint8), depth=2)
    with pytest.raises(ValueError, match="gray array"):
        encode_png(np.zeros((4, 4, 3), np.uint8), depth=4)


def test_decode_image_dispatches_png():
    from autoscan_spark.operators.multimodal import decode_image

    arr = _rand((6, 7, 3), seed=7)
    assert np.array_equal(decode_image(encode_png(arr, filter_type=3)), arr)


def test_png_payloads_flow_through_media_features(spark):
    """Corpus-level: synthesize_media now emits PNG images (cycling all
    five scanline filters); media_features must real-decode them and the
    feature vectors must equal the PPM-path vectors for the same pixels —
    i.e. the PNG rows are decoded, not hashed."""
    from autoscan_spark.operators.multimodal import (
        decode_image,
        extract_features,
        synthesize_media,
    )

    media = synthesize_media(spark, 108, seed=1).cache()
    imgs = media.filter("kind = 'image'").collect()
    formats = {r["meta"]["format"] for r in imgs}
    # depth-matrix corpus: 8-bit RGB, 16-bit gray, 4-bit packed gray PNGs
    assert formats == {"ppm", "png", "png16", "png4"}
    feats = {
        r["media_id"]: r["features"]
        for r in extract_features(media.filter("kind = 'image'")).collect()
    }
    for r in imgs:
        arr = decode_image(bytes(r["payload"]))
        h, w = r["meta"]["height"], r["meta"]["width"]
        fmt = r["meta"]["format"]
        if fmt in ("ppm", "png"):
            assert arr.shape == (h, w, 3)
        else:  # gray variants decode 2-D; png16 comes back uint16
            assert arr.shape == (h, w)
            assert arr.dtype == (np.uint16 if fmt == "png16" else np.uint8)
        from autoscan_spark.operators.multimodal import _bucket_means

        want = ",".join(str(v) for v in _bucket_means(arr))
        assert feats[r["media_id"]] == want
