"""Multimodal tests: real PPM/BMP/WAV decode, schema, batch shapes, fan-out,
and the honest gate on compressed formats."""

import struct

import numpy as np
import pytest

from autoscan_spark.operators.multimodal import (
    FEATURE_DIM,
    decode_audio,
    decode_image,
    encode_ppm,
    encode_wav_pcm16,
    extract_features,
    resize_images,
    sample_frames,
    synthesize_media,
)


@pytest.fixture(scope="module")
def media(spark):
    df = synthesize_media(spark, 30, seed=1).cache()
    df.count()
    return df


# ---------------- pure decoders (no Spark) ----------------


def test_ppm_roundtrip():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (17, 23, 3), dtype=np.uint8)
    assert np.array_equal(decode_image(encode_ppm(img)), img)


def test_ppm_with_comment_header():
    img = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    payload = b"P6\n# a comment\n3 2\n255\n" + img.tobytes()
    assert np.array_equal(decode_image(payload), img)


def test_bmp_decode_bottom_up_with_padding():
    """Hand-built 3x2 24-bit BMP (row stride padded to 12 bytes, bottom-up):
    decode must flip rows and convert BGR→RGB."""
    rgb = np.array(
        [[[255, 0, 0], [0, 255, 0], [0, 0, 255]],
         [[10, 20, 30], [40, 50, 60], [70, 80, 90]]],
        dtype=np.uint8,
    )
    rows = []
    for r in rgb[::-1]:  # bottom-up
        row = r[:, ::-1].tobytes()  # RGB→BGR
        rows.append(row + b"\x00" * (12 - len(row)))
    pixel_data = b"".join(rows)
    header = struct.pack("<2sIHHI", b"BM", 54 + len(pixel_data), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, 3, 2, 1, 24, 0, len(pixel_data),
                       2835, 2835, 0, 0)
    assert np.array_equal(decode_image(header + info + pixel_data), rgb)


def test_wav_roundtrip():
    wave = (np.sin(np.linspace(0, 20, 1600)) * 20000).astype(np.int16)
    samples, rate = decode_audio(encode_wav_pcm16(wave, 8000))
    assert rate == 8000
    assert np.array_equal(samples, wave)


def test_compressed_decode_gated_without_pil():
    try:
        import PIL  # noqa: F401

        pytest.skip("decoder present; gate not active")
    except ImportError:
        pass
    webp_magic = b"RIFF\x00\x00\x00\x00WEBP" + b"\x00" * 16
    with pytest.raises(NotImplementedError, match="requires PIL"):
        decode_image(webp_magic)


# ---------------- distributed plumbing ----------------


def test_media_schema_and_determinism(spark, media):
    assert media.count() == 30
    kinds = {r["kind"] for r in media.select("kind").distinct().collect()}
    assert kinds == {"image", "audio", "video"}
    again = synthesize_media(spark, 30, seed=1)
    a = {r["media_id"]: bytes(r["payload"]) for r in media.collect()}
    b = {r["media_id"]: bytes(r["payload"]) for r in again.collect()}
    assert a == b
    img = media.filter("kind = 'image'").first()
    assert img["meta"]["format"] == "ppm"
    # payload really is a decodable image of the advertised size
    arr = decode_image(bytes(img["payload"]))
    assert arr.shape == (img["meta"]["height"], img["meta"]["width"], 3)
    aud = media.filter("kind = 'audio'").first()
    samples, rate = decode_audio(bytes(aud["payload"]))
    assert rate == aud["meta"]["sample_rate"]
    assert len(samples) == rate * aud["meta"]["duration_ms"] // 1000


def test_extract_features_real_decode(spark, media):
    feats = {r["media_id"]: r for r in extract_features(media).collect()}
    assert len(feats) == 30
    for r in feats.values():
        vec = [float(x) for x in r["features"].split(",")]
        assert len(vec) == FEATURE_DIM
    # image features are bucket means of REAL pixels: recompute one locally
    img = media.filter("kind = 'image'").first()
    arr = decode_image(bytes(img["payload"])).astype(np.float64).ravel()
    want = [round(float(c.mean()), 6) for c in np.array_split(arr, FEATURE_DIM)]
    got = [float(x) for x in feats[img["media_id"]]["features"].split(",")]
    assert got == pytest.approx(want)


def test_resize_images_real_pixels(spark, media):
    out = {r["media_id"]: r for r in resize_images(media, out_w=8, out_h=8).collect()}
    n_images = media.filter("kind = 'image'").count()
    assert len(out) == n_images
    img = media.filter("kind = 'image'").first()
    resized = decode_image(bytes(out[img["media_id"]]["payload_out"]))
    assert resized.shape == (8, 8, 3)
    # nearest-neighbor of the real source pixels
    src = decode_image(bytes(img["payload"]))
    h, w = src.shape[:2]
    ys = (np.arange(8) * h // 8)[:, None]
    xs = (np.arange(8) * w // 8)[None, :]
    assert np.array_equal(resized, src[ys, xs])


def test_sample_frames_fanout(spark, media):
    frames = sample_frames(media, every_ms=1000)
    rows = frames.collect()
    n_videos = media.filter("kind = 'video'").count()
    assert len(rows) >= n_videos  # ≥1 frame per video
    per = {}
    for r in rows:
        per.setdefault(r["media_id"], []).append(r["frame_idx"])
    for idxs in per.values():
        assert sorted(idxs) == list(range(len(idxs)))  # contiguous frame idx


# ---------------- AVI container (real parse, real frames) ----------------


def test_avi_roundtrip_pure():
    from autoscan_spark.operators.multimodal import encode_avi, parse_avi

    frames = [encode_ppm(np.full((4, 6, 3), i, dtype=np.uint8)) for i in range(5)]
    payload = encode_avi(frames, fps=2, width=6, height=4, codec=b"PPM ")
    meta, got = parse_avi(payload)
    assert meta == {"n_frames": 5, "fps": 2, "width": 6, "height": 4, "codec": "PPM "}
    assert got == frames  # byte-exact frame payloads back out
    # every parsed frame decodes to the original pixels
    for i, f in enumerate(got):
        assert np.array_equal(decode_image(f), np.full((4, 6, 3), i, dtype=np.uint8))


def test_avi_rejects_garbage():
    from autoscan_spark.operators.multimodal import parse_avi

    with pytest.raises(ValueError, match="not a RIFF/AVI"):
        parse_avi(b"\x00" * 64)
    # truncated chunk inside a valid RIFF header must raise, not mis-slice
    from autoscan_spark.operators.multimodal import encode_avi

    ok = encode_avi([b"x" * 10], fps=1, width=2, height=2)
    with pytest.raises(ValueError, match="truncated"):
        parse_avi(ok[:-6])


def test_avi_deeply_nested_lists_no_recursion_error():
    """An adversarially nested untrusted payload (50k LIST levels) must
    parse iteratively — Python recursion would RecursionError around
    depth ~1000, failing the whole task inside a pandas UDF. Frames inside
    the nesting still come out in order."""
    from autoscan_spark.operators.multimodal import parse_avi

    body = b"00dc" + struct.pack("<I", 4) + b"data"
    for _ in range(50_000):
        inner = b"list" + body  # 4-byte list type + contents
        body = b"LIST" + struct.pack("<I", len(inner)) + inner
    payload = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"AVI " + body
    meta, frames = parse_avi(payload)
    assert frames == [b"data"]
    assert meta == {}


def test_sample_frames_are_real_avi_frames(spark, media):
    """Synthetic video rows are PPM-in-AVI: sampled frames must be the
    container's own decodable frames, not hashes."""
    from autoscan_spark.operators.multimodal import parse_avi

    vid = media.filter("kind = 'video'").first()
    meta, all_frames = parse_avi(bytes(vid["payload"]))
    assert meta["codec"] == "PPM " and meta["fps"] == 4
    out = {
        r["frame_idx"]: bytes(r["frame"])
        for r in sample_frames(media, every_ms=1000).collect()
        if r["media_id"] == vid["media_id"]
    }
    # every_ms=1000 at 4 fps → every 4th container frame, byte-exact
    assert out == {i: all_frames[fi] for i, fi in enumerate(range(0, len(all_frames), 4))}
    arr = decode_image(out[0])
    assert arr.shape == (meta["height"], meta["width"], 3)


def test_video_features_use_real_frame_pixels(spark, media):
    from autoscan_spark.operators.multimodal import parse_avi

    vid = media.filter("kind = 'video'").first()
    _, frames = parse_avi(bytes(vid["payload"]))
    pix = np.concatenate([decode_image(f).ravel() for f in frames]).astype(np.float64)
    want = [round(float(c.mean()), 6) for c in np.array_split(pix, FEATURE_DIM)]
    feats = {r["media_id"]: r["features"] for r in extract_features(media).collect()}
    got = [float(x) for x in feats[vid["media_id"]].split(",")]
    assert got == pytest.approx(want)


def test_g711_wav_decode_roundtrip():
    """µ-law/A-law WAV (format tags 7/6) decode through the G.711 tables;
    silence codes map to 0 and extremes to the standard ±32124/±32256."""
    import numpy as np

    from autoscan_spark.operators.multimodal import (
        _ALAW_TO_PCM,
        _ULAW_TO_PCM,
        decode_audio,
        encode_wav_g711,
    )

    codes = np.arange(256, dtype=np.uint8)
    for law, table in (("ulaw", _ULAW_TO_PCM), ("alaw", _ALAW_TO_PCM)):
        samples, rate = decode_audio(encode_wav_g711(codes, 8000, law))
        assert rate == 8000
        assert np.array_equal(samples, table)
    # spec anchor points: both µ-law zeros decode to 0; magnitudes peak
    # at 32124 (µ) / 32256 (A)
    assert _ULAW_TO_PCM[0xFF] == 0 and _ULAW_TO_PCM[0x7F] == 0
    assert int(np.abs(_ULAW_TO_PCM).max()) == 32124
    assert int(np.abs(_ALAW_TO_PCM).max()) == 32256
    assert _ALAW_TO_PCM[0x55] == -8 and _ALAW_TO_PCM[0xD5] == 8


def test_g711_tables_match_stdlib_audioop():
    """Differential vs an independent reference implementation (stdlib
    audioop, present through Python 3.12; skip where removed)."""
    import numpy as np

    audioop = pytest.importorskip("audioop")
    from autoscan_spark.operators.multimodal import _ALAW_TO_PCM, _ULAW_TO_PCM

    codes = bytes(range(256))
    assert np.array_equal(
        np.frombuffer(audioop.ulaw2lin(codes, 2), dtype="<i2"), _ULAW_TO_PCM
    )
    assert np.array_equal(
        np.frombuffer(audioop.alaw2lin(codes, 2), dtype="<i2"), _ALAW_TO_PCM
    )


def test_wav_unknown_format_still_gates():
    import numpy as np
    import struct as _struct

    from autoscan_spark.operators.multimodal import decode_audio

    # IEEE-float WAV (tag 3) remains an honest NotImplementedError
    data = b"\x00" * 8
    hdr = _struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(data), b"WAVE",
        b"fmt ", 16, 3, 1, 8000, 32000, 4, 32,
        b"data", len(data),
    )
    with pytest.raises(NotImplementedError, match="format tag 3"):
        decode_audio(hdr + data)


def test_g711_audio_flows_through_media_features(spark, media):
    """Corpus-level: synthesize_media cycles PCM-16 / µ-law / A-law WAV;
    media feature vectors for the companded rows must equal bucket means
    of the TABLE-EXPANDED samples — i.e. G.711 rows are decoded, not
    hashed."""
    from autoscan_spark.operators.multimodal import (
        _bucket_means,
        decode_audio,
        extract_features,
    )

    auds = media.filter("kind = 'audio'").collect()
    formats = {r["meta"]["format"] for r in auds}
    assert formats == {"wav", "wav-ulaw", "wav-alaw"}
    feats = {
        r["media_id"]: r["features"]
        for r in extract_features(media.filter("kind = 'audio'")).collect()
    }
    for r in auds:
        samples, rate = decode_audio(bytes(r["payload"]))
        assert rate == r["meta"]["sample_rate"]
        want = ",".join(str(v) for v in _bucket_means(samples))
        assert feats[r["media_id"]] == want
        if r["meta"]["format"] != "wav":
            # companded 8-bit codes halve the byte size vs PCM-16 for
            # the same duration — sanity that the wire really is G.711
            assert len(bytes(r["payload"])) < 50 + samples.size * 2


def test_codec_single_byte_mutation_error_discipline():
    """Every single-byte corruption of a valid payload must either still
    decode or raise ValueError/NotImplementedError — never leak an
    IndexError/struct.error/OverflowError from parser internals. This is
    the per-row error contract the mapInPandas operators rely on to turn
    corrupt corpus rows into status columns instead of task failures.
    (PNG's per-chunk CRC makes every mutation a clean ValueError; JPEG
    has no integrity check so many mutations still decode — both fine.)"""
    import numpy as np

    from autoscan_spark.kernels.jpeg import decode_jpeg, encode_jpeg
    from autoscan_spark.kernels.png import decode_png, encode_png
    from autoscan_spark.operators.multimodal import (
        decode_audio,
        decode_image,
        encode_avi,
        encode_ppm,
        encode_wav_g711,
        parse_avi,
    )

    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (6, 7, 3), dtype=np.uint8)

    def sweep(payload: bytes, decode):
        allowed = 0
        for i in range(len(payload)):
            mutated = (
                payload[:i]
                + bytes([(payload[i] + 1) % 256])
                + payload[i + 1:]
            )
            try:
                decode(mutated)
            except (ValueError, NotImplementedError):
                pass
            allowed += 1
        assert allowed == len(payload)

    sweep(encode_png(img, filter_type=2), decode_png)
    sweep(encode_jpeg(img, quality=90), decode_jpeg)
    sweep(
        encode_wav_g711(np.arange(64, dtype=np.uint8), 8000, "ulaw"),
        decode_audio,
    )

    def avi_decode(payload):
        _meta, frames = parse_avi(payload)
        for f in frames:
            decode_image(f)

    sweep(encode_avi([encode_ppm(img)], 4, 7, 6, codec=b"PPM "), avi_decode)
