"""Multimodal plumbing: real pure-numpy codecs (BMP / WAV / VID0),
decode-derived metadata, histogram features, frame sampling."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from grappolo_spark.functions import multimodal as MM


# --- pure codec roundtrips (no Spark) --------------------------------------

def test_bmp_roundtrip():
    src = b"hello multimodal world" * 3
    payload = MM.encode_bmp(7, 5, src)
    img = MM.decode_image(payload)
    assert img.shape == (5, 7, 3)
    # bottom-up storage: decoded row 0 is the LAST encoded row
    flat = MM._cycle_bytes(src, 7 * 5 * 3).reshape(5, 21)
    assert (img[-1].reshape(-1) == flat[0]).all()
    assert (img[0].reshape(-1) == flat[-1]).all()
    # row padding: width 7 -> row size 24 (not 21)
    assert len(payload) == 54 + 24 * 5


def test_wav_roundtrip():
    payload = MM.encode_wav(100, b"abc")
    samples, rate = MM.decode_audio(payload)
    assert rate == MM.WAV_SAMPLE_RATE
    assert samples.shape == (100,)
    expected = (MM._cycle_bytes(b"abc", 100).astype(np.int16) - 64) * 256
    assert (samples == expected).all()


def test_vid0_roundtrip():
    payload = MM.encode_vid0(3, 2, 4, b"frames!")
    vid = MM.decode_video(payload)
    assert vid.shape == (4, 2, 3, 3)
    assert (vid.reshape(-1) == MM._cycle_bytes(b"frames!", 4 * 2 * 3 * 3)).all()


def test_decoders_reject_garbage():
    with pytest.raises(ValueError):
        MM.decode_image(b"JUNKJUNKJUNKJUNKJUNK" * 10)
    with pytest.raises(ValueError):
        MM.decode_audio(b"RIFFxxxxJUNK" + b"\0" * 50)
    with pytest.raises(ValueError):
        MM.decode_video(b"NOPE" + b"\0" * 20)


# --- Spark pipeline --------------------------------------------------------

@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, f"document body {i} " + "x" * (i % 37)) for i in range(30)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_metadata_matches_synthesis_rules(spark, docs):
    meta = {r["doc_id"]: r for r in MM.extract_metadata(MM.attach_media(docs)).collect()}
    for i in range(30):
        n = len(f"document body {i} " + "x" * (i % 37))
        r = meta[i]
        if i % 3 == 0:
            w, h = 4 + n % 13, 4 + i % 11
            assert (r["width"], r["height"], r["n_frames"]) == (w, h, 1)
            assert r["n_bytes"] == 54 + ((3 * w + 3) // 4) * 4 * h
        elif i % 3 == 1:
            ns = 32 + (n * 3) % 241
            assert (r["width"], r["height"], r["n_frames"]) == (ns, 1, 1)
            assert r["n_bytes"] == 44 + 2 * ns
        else:
            w, h, f = 2 + i % 7, 2 + n % 5, 1 + i % 12
            assert (r["width"], r["height"], r["n_frames"]) == (w, h, f)
            assert r["n_bytes"] == 10 + f * w * h * 3


def test_features_are_real_decoded_histograms(spark, docs):
    media = MM.attach_media(docs)
    feats = {r["doc_id"]: np.array(r["feature"]) for r in MM.extract_features(media).collect()}
    assert len(feats) == 30
    for i, f in feats.items():
        assert f.shape == (MM.FEATURE_DIM,)
        assert abs(f.sum() - 1.0) < 1e-5
    # spot-check one image doc against a local decode
    text = "document body 0 ".encode()
    payload = MM._synth_payload(0, "image", text)
    vals = MM.decode_image(payload).reshape(-1)
    exp = MM._feature_histogram(vals)
    assert np.allclose(feats[0], exp, atol=1e-6)


def test_resize_nearest_neighbor_exact():
    # 4x2 image with a recognizable byte ramp; upscale to 8x4
    src = bytes(range(4 * 2 * 3))
    payload = MM.encode_bmp(4, 2, src)
    img = MM.decode_image(payload)
    ys = (np.arange(4) * 2) // 4
    xs = (np.arange(8) * 4) // 8
    want = img[np.ix_(ys, xs)]
    # NN upscale duplicates each source pixel 2x in both axes
    assert (want[0, 0] == want[1, 1]).all()
    rt = MM.decode_image(MM.encode_bmp(8, 4, want[::-1].tobytes()))
    assert rt.shape == (4, 8, 3) and (rt == want).all()


def test_resize_images_pipeline(spark, docs):
    out = {
        r["doc_id"]: r
        for r in MM.resize_images(MM.attach_media(docs), out_w=8, out_h=8).collect()
    }
    n_images = sum(1 for i in range(30) if i % 3 == 0)
    assert len(out) == n_images
    for i in range(0, 30, 3):
        text = f"document body {i} " + "x" * (i % 37)
        img = MM.decode_image(MM._synth_payload(i, "image", text.encode()))
        h, w = img.shape[:2]
        ys = (np.arange(8) * h) // 8
        xs = (np.arange(8) * w) // 8
        want = img[np.ix_(ys, xs)]
        r = out[i]
        assert (r["width"], r["height"]) == (8, 8)
        got = MM.decode_image(bytes(r["payload"]))
        assert (got == want).all()


def test_feature_counts_mode_exact(spark, docs):
    """normalize=False yields exact int64 bin counts: counts/sum equals
    the normalized float32 path, and counts sum to the decoded content
    size from the synthesis rules."""
    media = MM.attach_media(docs).localCheckpoint(eager=True)
    counts = {
        r["doc_id"]: np.array(r["feature"], dtype=np.int64)
        for r in MM.extract_features(media, normalize=False).collect()
    }
    norm = {
        r["doc_id"]: np.array(r["feature"])
        for r in MM.extract_features(media).collect()
    }
    assert len(counts) == 30
    for i in range(30):
        n = len(f"document body {i} " + "x" * (i % 37))
        if i % 3 == 0:
            total = 3 * (4 + n % 13) * (4 + i % 11)
        elif i % 3 == 1:
            total = 32 + (n * 3) % 241
        else:
            total = (1 + i % 12) * (2 + i % 7) * (2 + n % 5) * 3
        assert counts[i].sum() == total
        assert np.allclose(counts[i] / total, norm[i], atol=1e-6)


def test_frame_sample_indices(spark, docs):
    out = MM.frame_sample(MM.attach_media(docs), every_n=5).collect()
    got = {}
    for r in out:
        got.setdefault(r["doc_id"], []).append(r["frame_idx"])
    for i in range(30):
        if i % 3 == 2:
            nf = 1 + i % 12
            assert sorted(got[i]) == list(range(0, nf, 5))
        else:
            assert i not in got
