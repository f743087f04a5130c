import numpy as np
import pandas as pd
import pytest

from mpds_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    decode_features,
    fake_audio_decoder,
    fake_image_decoder,
    image_stats_extractor,
    resize_image,
    sample_frames,
)


def _media_pdf(n=6, seed=71):
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        h, w = int(rng.integers(6, 16)), int(rng.integers(6, 16))
        payload = rng.integers(0, 256, h * w, dtype=np.uint8).tobytes()
        rows.append(
            (
                i,
                "image",
                bytearray(payload),
                {"width": w, "height": h, "sample_rate": None,
                 "n_frames": None, "codec": "fake"},
            )
        )
    return pd.DataFrame(rows, columns=["media_id", "kind", "payload", "meta"])


def _media_df(spark, pdf):
    from mpds_spark.operators.multimodal import MEDIA_SCHEMA

    return spark.createDataFrame(pdf, MEDIA_SCHEMA)


def test_decode_features_matches_direct(spark):
    pdf = _media_pdf()
    df = _media_df(spark, pdf)
    out = (
        decode_features(df, image_stats_extractor, decoder=fake_image_decoder)
        .orderBy("media_id")
        .toPandas()
    )
    assert len(out) == len(pdf)
    for _, row in out.iterrows():
        src = pdf[pdf.media_id == row.media_id].iloc[0]
        img = fake_image_decoder(bytes(src.payload), src.meta)
        exp = image_stats_extractor(img)
        np.testing.assert_allclose(np.asarray(row.features, float), exp, rtol=1e-12)
    # payload passes through unchanged
    assert bytes(out.payload.iloc[0]) == bytes(pdf.payload.iloc[0])


def test_decode_without_decoder_raises(spark):
    df = _media_df(spark, _media_pdf(n=2))
    with pytest.raises(Exception, match="NotImplementedError|decoding"):
        decode_features(df, image_stats_extractor).collect()


def test_resize_shape(spark):
    df = _media_df(spark, _media_pdf())
    out = (
        resize_image(df, 4, 5, decoder=fake_image_decoder)
        .orderBy("media_id")
        .toPandas()
    )
    assert all(len(p) == 20 for p in out.pixels)


def test_sample_frames_udtf_shape(spark):
    rng = np.random.default_rng(73)
    rows = []
    for i in range(3):
        n_frames = int(rng.integers(7, 12))
        payload = rng.integers(0, 256, n_frames * 4, dtype=np.uint8).tobytes()
        rows.append(
            (
                i,
                "video",
                bytearray(payload),
                {"width": 2, "height": 2, "sample_rate": None,
                 "n_frames": n_frames, "codec": "fake"},
            )
        )
    pdf = pd.DataFrame(rows, columns=["media_id", "kind", "payload", "meta"])
    df = _media_df(spark, pdf)

    def video_decoder(payload, meta):
        raw = np.frombuffer(payload, dtype=np.uint8).astype(float)
        return raw.reshape(int(meta["n_frames"]), 4)

    out = sample_frames(df, every_n=3, decoder=video_decoder).toPandas()
    exp_rows = sum(len(range(0, int(r[3]["n_frames"]), 3)) for r in rows)
    assert len(out) == exp_rows
    assert set(out.columns) == {"media_id", "frame_no", "frame"}
    assert (out.frame_no % 3 == 0).all()


def _wav_bytes(sig, framerate=16000, width=2, channels=1):
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(width)
        w.setframerate(framerate)
        if width == 2:
            w.writeframes((np.asarray(sig) * 32767).astype("<i2").tobytes())
        else:
            w.writeframes(
                ((np.asarray(sig) * 127) + 128).clip(0, 255).astype("u1").tobytes()
            )
    return buf.getvalue()


def _ppm_bytes(img_u8):
    h, w = img_u8.shape[:2]
    return b"P6\n# test comment\n%d %d\n255\n" % (w, h) + img_u8.tobytes()


def _bmp_bytes(img_u8):
    """Minimal 24-bit uncompressed BMP (bottom-up) from an (h,w,3) RGB array."""
    import struct

    h, w = img_u8.shape[:2]
    row_bytes = (w * 3 + 3) // 4 * 4
    raster = bytearray()
    for r in range(h - 1, -1, -1):  # bottom-up
        row = img_u8[r].tobytes()
        raster += row + b"\x00" * (row_bytes - len(row))
    header = struct.pack(
        "<2sIHHI", b"BM", 54 + len(raster), 0, 0, 54
    ) + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(raster), 0, 0, 0, 0)
    return bytes(header) + bytes(raster)


def test_real_wav_decode_end_to_end(spark):
    """Verdict r1 item 8: real bytes through the default decoder (no fake)."""
    t = np.arange(800) / 16000.0
    sig = 0.5 * np.sin(2 * np.pi * 440 * t)
    pdf = pd.DataFrame(
        {
            "media_id": [1],
            "kind": ["audio"],
            "payload": [_wav_bytes(sig)],
            "meta": [
                {"width": 0, "height": 0, "sample_rate": 16000,
                 "n_frames": 0, "codec": "pcm_s16le"}
            ],
        }
    )
    df = spark.createDataFrame(pdf, MEDIA_SCHEMA)
    out = decode_features(
        df, lambda x: np.array([x.mean(), x.std(), float(len(x))])
    ).toPandas()
    feats = np.asarray(out.features.iloc[0], float)
    assert feats[2] == 800
    assert abs(feats[0]) < 1e-3  # sine mean ~ 0
    assert abs(feats[1] - 0.5 / np.sqrt(2)) < 1e-3  # sine rms


def test_real_ppm_and_bmp_decode(spark):
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, size=(6, 9, 3), dtype=np.uint8)
    gray = img.astype(np.float64).mean(axis=2) / 255.0
    pdf = pd.DataFrame(
        {
            "media_id": [1, 2],
            "kind": ["image", "image"],
            "payload": [_ppm_bytes(img), _bmp_bytes(img)],
            "meta": [
                {"width": 9, "height": 6, "sample_rate": 0,
                 "n_frames": 0, "codec": c}
                for c in ("ppm", "bmp")
            ],
        }
    )
    df = spark.createDataFrame(pdf, MEDIA_SCHEMA)
    out = resize_image(df, 6, 9).orderBy("media_id").toPandas()
    # identity resize: both formats decode to the same grayscale image
    for i in range(2):
        got = np.asarray(out.pixels.iloc[i], float).reshape(6, 9)
        np.testing.assert_allclose(got, gray, atol=1e-12)


def test_raw_video_frames_real_bytes(spark):
    rng = np.random.default_rng(11)
    video = rng.integers(0, 256, size=(10, 4 * 3), dtype=np.uint8)
    pdf = pd.DataFrame(
        {
            "media_id": [7],
            "kind": ["video"],
            "payload": [video.tobytes()],
            "meta": [
                {"width": 3, "height": 4, "sample_rate": 0,
                 "n_frames": 10, "codec": "rawvideo"}
            ],
        }
    )
    df = spark.createDataFrame(pdf, MEDIA_SCHEMA)
    out = sample_frames(df, every_n=3).orderBy("frame_no").toPandas()
    assert out.frame_no.tolist() == [0, 3, 6, 9]
    np.testing.assert_allclose(
        np.asarray(out.frame.iloc[1], float), video[3] / 255.0, atol=1e-12
    )


def test_ppm_truncated_header_raises():
    from mpds_spark.operators.multimodal import ppm_image_decoder

    for bad in (b"P6 12", b"P6\n#comment with no newline", b"P6 3 2"):
        with pytest.raises(ValueError, match="truncated"):
            ppm_image_decoder(bad, None)


def test_rawvideo_magic_collision_routes_by_meta():
    """default_decoder must honor meta.codec='rawvideo' even when the frame
    bytes begin with an image/audio magic (b'BM' here)."""
    from mpds_spark.operators.multimodal import default_decoder

    frame = np.full((2, 4), 0, dtype=np.uint8)
    payload = (b"BM" + frame.tobytes()[2:])  # first two luma pixels = 66,77
    meta = {"width": 4, "height": 2, "sample_rate": 0,
            "n_frames": 1, "codec": "rawvideo"}
    out = default_decoder(payload, meta)
    assert out.shape == (1, 8)
    assert out[0, 0] == 66 / 255.0 and out[0, 1] == 77 / 255.0


def test_encoder_decoder_roundtrips_exact():
    """Sink-side encoders are exact inverses of the stdlib decoders:
    encode_wav_pcm16 -> wav_audio_decoder recovers s/32768 bit-for-bit,
    encode_bmp24 -> bmp_image_decoder recovers mean(channels)/255
    (bottom-up storage + row padding round-trip)."""
    import numpy as np

    from mpds_spark.operators.multimodal import (
        bmp_image_decoder,
        encode_bmp24,
        encode_wav_pcm16,
        wav_audio_decoder,
    )

    rng = np.random.default_rng(7)
    s = rng.integers(-32768, 32768, 777).astype("<i2")
    x = wav_audio_decoder(encode_wav_pcm16(s, 16000), None)
    assert np.array_equal(x, s.astype(np.float64) / 32768.0)

    # width 22 -> 66 raster bytes/row -> 2 pad bytes: exercises padding
    px = rng.integers(0, 256, (15, 22, 3)).astype(np.uint8)
    img = bmp_image_decoder(encode_bmp24(px), None)
    assert np.array_equal(img, px.astype(np.float64).mean(axis=2) / 255.0)
