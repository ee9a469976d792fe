"""Baseline JPEG codec tests (operators.jpeg): spec-level checks of the
DCT and entropy layers, lossy round-trip bounds, and the Spark
mapInPandas decode/resize stages over real JPEG payloads."""

from __future__ import annotations

import numpy as np
import pytest

from nyc_government_hiring_audit_data_platform_spark.operators import jpeg as J
from nyc_government_hiring_audit_data_platform_spark.operators import multimodal as MM


def _psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 10 * np.log10(255.0**2 / max(mse, 1e-12))


def _gradient(h: int, w: int) -> np.ndarray:
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [
            (xx * 255 // max(1, w - 1)).astype(np.uint8),
            (yy * 255 // max(1, h - 1)).astype(np.uint8),
            ((xx + yy) * 127 // max(1, h + w - 2)).astype(np.uint8),
        ],
        axis=-1,
    )


def test_dct_matches_spec_definition():
    """The matrix-form DCT must equal the T.81 FDCT O(N^4) definition
    (F(u,v) = 1/4 C(u) C(v) sum f cos cos) to float precision."""
    rng = np.random.default_rng(3)
    blk = rng.uniform(-128, 127, (8, 8))
    ref = np.zeros((8, 8))
    for u in range(8):
        for v in range(8):
            cu = 1 / np.sqrt(2) if u == 0 else 1.0
            cv = 1 / np.sqrt(2) if v == 0 else 1.0
            s = sum(
                blk[x, y]
                * np.cos((2 * x + 1) * u * np.pi / 16)
                * np.cos((2 * y + 1) * v * np.pi / 16)
                for x in range(8)
                for y in range(8)
            )
            ref[u, v] = 0.25 * cu * cv * s
    assert np.abs(J.dct2(blk) - ref).max() < 1e-9
    assert np.abs(J.idct2(J.dct2(blk)) - blk).max() < 1e-9


def test_uniform_image_roundtrips_exactly():
    """A uniform image is DC-only; quantization of a single DC value
    round-trips within the IDCT rounding (exact here)."""
    img = np.full((24, 40), 130, dtype=np.uint8)
    assert np.abs(
        J.decode_jpeg(J.encode_jpeg(img, quality=90)).astype(int) - 130
    ).max() <= 1


def test_rgb_roundtrip_psnr_444_and_420():
    img = _gradient(40, 56)
    d444 = J.decode_jpeg(J.encode_jpeg(img, quality=90))
    assert d444.shape == img.shape
    assert _psnr(d444, img) > 35
    d420 = J.decode_jpeg(J.encode_jpeg(img, quality=90, subsample=True))
    assert d420.shape == img.shape
    assert _psnr(d420, img) > 30  # chroma subsampling loses a little


def test_odd_dimensions_and_grayscale():
    for shape in [(9, 13), (8, 8), (17, 31), (1, 1), (7, 64)]:
        g = (np.arange(shape[0] * shape[1]).reshape(shape) % 251).astype(np.uint8)
        d = J.decode_jpeg(J.encode_jpeg(g, quality=95))
        assert d.shape == shape
        assert _psnr(d, g) > 30


def test_restart_markers_do_not_change_output():
    """DRI/RSTn is a bitstream-layout feature: decoded pixels must be
    IDENTICAL with and without restart intervals."""
    img = _gradient(48, 64)
    base = J.decode_jpeg(J.encode_jpeg(img, quality=85))
    for ri in (1, 2, 5):
        for sub in (False, True):
            got = J.decode_jpeg(
                J.encode_jpeg(img, quality=85, subsample=sub, restart_interval=ri)
            )
            ref = J.decode_jpeg(J.encode_jpeg(img, quality=85, subsample=sub))
            assert np.array_equal(got, ref), (ri, sub)
    assert base.shape == img.shape


def test_byte_stuffing_roundtrip():
    """Noise at high quality forces 0xFF bytes into the entropy stream;
    stuffing/unstuffing must be transparent."""
    rng = np.random.default_rng(11)
    noise = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8).astype(np.uint8)
    enc = J.encode_jpeg(noise, quality=95)
    assert b"\xff\x00" in enc[100:]
    assert _psnr(J.decode_jpeg(enc), noise) > 25


def test_quality_monotone_in_size():
    img = _gradient(64, 64)
    sizes = [len(J.encode_jpeg(img, quality=q)) for q in (30, 60, 90)]
    assert sizes == sorted(sizes)


def test_decoder_rejects_non_baseline():
    img = _gradient(16, 16)
    enc = bytearray(J.encode_jpeg(img))
    with pytest.raises(ValueError, match="SOI"):
        J.decode_jpeg(b"\x00\x00" + bytes(enc))
    # flip SOF0 (FFC0) to SOF2 (FFC2, progressive)
    idx = bytes(enc).find(b"\xff\xc0")
    enc[idx + 1] = 0xC2
    with pytest.raises(ValueError, match="baseline only"):
        J.decode_jpeg(bytes(enc))


def test_jpeg_features_and_resize_end_to_end(spark):
    """decoder='codec' decodes real baseline-JPEG payloads in the
    mapInPandas stages: reported means track the raster, and resize
    re-encodes genuinely resampled JPEGs with matching metadata."""
    media = MM.make_jpeg_media_fixture(spark, 10)
    expected = {
        r["media_id"]: float(J.decode_jpeg(bytes(r["payload"])).mean())
        for r in media.collect()
    }
    feats = {
        r["media_id"]: r
        for r in MM.extract_features(media, decoder="codec").collect()
    }
    for mid, want in expected.items():
        assert abs(feats[mid]["mean_byte"] - want) < 1e-9
    out = MM.resize_images(media, max_side=24, decoder="codec").collect()
    assert len(out) == 10
    for r in out:
        arr = J.decode_jpeg(bytes(r["payload"]))
        assert max(arr.shape[:2]) <= 24
        assert (r["height"], r["width"]) == arr.shape[:2]


# -- Y4M video codec ---------------------------------------------------------


def test_y4m_roundtrip_c444_near_exact():
    """C444 carries full-resolution chroma: the only loss is the
    RGB<->YCbCr integer rounding (within +/-2 per channel)."""
    rng = np.random.default_rng(5)
    frames = rng.integers(0, 256, (3, 12, 16, 3), dtype=np.uint8).astype(np.uint8)
    dec, fps = MM.decode_y4m(MM.encode_y4m(frames, fps=30))
    assert fps == 30 and dec.shape == frames.shape
    assert np.abs(dec.astype(int) - frames.astype(int)).max() <= 2


def test_y4m_c420_shape_and_luma():
    yy, xx = np.mgrid[0:16, 0:24]
    frame = np.stack([xx * 10 % 256, yy * 10 % 256, (xx + yy) % 256], -1).astype(np.uint8)
    frames = np.stack([frame, frame])
    dec, _ = MM.decode_y4m(MM.encode_y4m(frames, subsample=True))
    assert dec.shape == frames.shape
    # luma is full-res in 4:2:0 - gray content must round-trip closely
    gray = frames.mean(axis=-1)
    dgray = dec.astype(float).mean(axis=-1)
    assert np.abs(gray - dgray).max() < 16


def test_y4m_rejects_foreign_bytes():
    with pytest.raises(ValueError, match="YUV4MPEG2"):
        MM.decode_y4m(b"RIFF....WEBP")


def test_y4m_frame_sampling_end_to_end(spark):
    """decoder='codec' explodes Y4M videos into REAL sampled frames:
    indices follow every_nth over the true frame count, and each frame
    payload is a decodable PPM raster of the advertised size."""
    media = MM.make_y4m_media_fixture(spark, 6)
    meta = {r["media_id"]: r for r in media.collect()}
    out = MM.sample_frames(media, every_nth=2, decoder="codec").collect()
    assert len(out) > 0
    seen: dict[int, list[int]] = {}
    for r in out:
        seen.setdefault(r["media_id"], []).append(r["frame_idx"])
        arr = MM.decode_ppm(bytes(r["frame"]))
        m = meta[r["media_id"]]
        assert arr.shape == (m["height"], m["width"], 3)
    for mid, idxs in seen.items():
        n_frames = meta[mid]["duration_ms"] // 40
        assert sorted(idxs) == list(range(0, n_frames, 2))


def test_truncated_jpeg_fails_cleanly():
    """Cutting the entropy stream must surface as a ValueError, never a
    bare IndexError from the bit reader."""
    img = _gradient(32, 32)
    enc = J.encode_jpeg(img, quality=85)
    sos = enc.find(b"\xff\xda")
    for cut in (sos + 20, len(enc) - 8):
        with pytest.raises(ValueError, match="JPEG"):
            J.decode_jpeg(enc[:cut])


def test_y4m_odd_dimension_c420_decodes():
    """Externally produced odd-dimension 4:2:0 streams (chroma planes
    are ceil(h/2) x ceil(w/2)) must decode; our encoder refuses to
    produce them, so build the stream by hand."""
    h, w = 11, 13
    ch, cw = (h + 1) // 2, (w + 1) // 2
    y = (np.arange(h * w) % 256).astype(np.uint8)
    cb = np.full(ch * cw, 128, np.uint8)
    cr = np.full(ch * cw, 128, np.uint8)
    data = (
        f"YUV4MPEG2 W{w} H{h} F25:1 Ip A1:1 C420jpeg\n".encode()
        + b"FRAME\n" + y.tobytes() + cb.tobytes() + cr.tobytes()
    )
    frames, fps = MM.decode_y4m(data)
    assert frames.shape == (1, h, w, 3) and fps == 25
    # neutral chroma: output equals luma in all channels (within rounding)
    assert np.abs(frames[0, :, :, 1].astype(int) - y.reshape(h, w).astype(int)).max() <= 1


def test_y4m_encoder_rejects_odd_c420():
    frames = np.zeros((1, 11, 13, 3), dtype=np.uint8)
    with pytest.raises(ValueError, match="even"):
        MM.encode_y4m(frames, subsample=True)


# -- property-based round-trip bounds (hypothesis) ---------------------------

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=15, deadline=None)
@given(
    h=st.integers(1, 40),
    w=st.integers(1, 40),
    seed=st.integers(0, 2**31 - 1),
    gray=st.booleans(),
    sub=st.booleans(),
    ri=st.sampled_from([0, 3]),
)
def test_jpeg_random_roundtrip_property(h, w, seed, gray, sub, ri):
    """Any uint8 image of any dimensions encodes to a decodable stream
    whose raster comes back at the right shape with bounded error (high
    quality => PSNR floor; uniform-ish content is near-exact)."""
    rng = np.random.default_rng(seed)
    shape = (h, w) if gray else (h, w, 3)
    img = rng.integers(0, 256, shape, dtype=np.uint8).astype(np.uint8)
    enc = J.encode_jpeg(img, quality=95, subsample=(sub and not gray), restart_interval=ri)
    dec = J.decode_jpeg(enc)
    assert dec.shape == img.shape
    if sub and not gray:
        # 4:2:0 legitimately averages away the chroma of tiny noise
        # images; the spec guarantee is the FULL-RES luma channel
        luma = lambda a: (  # noqa: E731
            0.299 * a[..., 0] + 0.587 * a[..., 1] + 0.114 * a[..., 2]
        )
        assert _psnr(luma(dec.astype(float)), luma(img.astype(float))) > 25
    else:
        assert _psnr(dec, img) > 25


@settings(max_examples=10, deadline=None)
@given(
    n=st.integers(1, 4),
    h=st.integers(2, 24).map(lambda v: v * 2),
    w=st.integers(2, 24).map(lambda v: v * 2),
    seed=st.integers(0, 2**31 - 1),
    sub=st.booleans(),
)
def test_y4m_random_roundtrip_property(n, h, w, seed, sub):
    rng = np.random.default_rng(seed)
    frames = rng.integers(0, 256, (n, h, w, 3), dtype=np.uint8).astype(np.uint8)
    dec, fps = MM.decode_y4m(MM.encode_y4m(frames, fps=24, subsample=sub))
    assert dec.shape == frames.shape and fps == 24
    if not sub:
        assert np.abs(dec.astype(int) - frames.astype(int)).max() <= 2
    else:
        # luma-preserving even under chroma decimation of noise
        assert _psnr(dec.mean(axis=-1), frames.astype(float).mean(axis=-1)) > 20
