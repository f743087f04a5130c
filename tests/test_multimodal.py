import numpy as np
import pandas as pd
import pytest

from mpds_spark.operators.multimodal import (
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
