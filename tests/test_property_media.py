"""Property tests for the media codecs (hypothesis): lossless round-trips
must hold for ARBITRARY pixel/sample content, not just the fixture images
the unit tests use — codec bugs live in carry/edge/padding paths that
random content finds (round 4's two JPEG entropy-layer spec bugs were both
found by fuzz, not fixtures)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings, strategies as st

from x5_ner_spark.core import media as M

dims = st.tuples(st.integers(1, 24), st.integers(1, 24))


def _img(h: int, w: int, seed: int) -> np.ndarray:
    return np.random.RandomState(seed).randint(0, 256, (h, w, 3)).astype(np.uint8)


@settings(max_examples=100, deadline=None)
@given(dims, st.integers(0, 2**31 - 1))
def test_ppm_roundtrip_any_image(dim, seed):
    img = _img(*dim, seed)
    assert (M.decode_ppm(M.encode_ppm(img)) == img).all()


@settings(max_examples=100, deadline=None)
@given(dims, st.integers(0, 2**31 - 1), st.integers(0, 4))
def test_png_roundtrip_any_image_any_filter(dim, seed, ftype):
    img = _img(*dim, seed)
    assert (M.decode_png(M.encode_png(img, filter_type=ftype)) == img).all()


@settings(max_examples=100, deadline=None)
@given(dims, st.integers(0, 2**31 - 1), st.booleans())
def test_gif_lattice_roundtrip_any_image(dim, seed, interlaced):
    # palette-lattice pixels round-trip losslessly by construction
    lattice = np.array([0, 85, 170, 255], dtype=np.uint8)
    h, w = dim
    img = lattice[np.random.RandomState(seed).randint(0, 4, (h, w, 3))]
    got = M.decode_gif(M.encode_gif(img, n_colors=64, interlaced=interlaced))
    assert (got == img).all()


@settings(max_examples=60, deadline=None)
@given(st.integers(1, 2000), st.integers(0, 2**31 - 1),
       st.sampled_from([8000, 16000, 44100]))
def test_wav_16bit_roundtrip_any_samples(n, seed, rate):
    import io
    import wave

    raw = np.random.RandomState(seed).randint(-32768, 32768, n).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(raw.tobytes())
    samples, got_rate = M.decode_wav(buf.getvalue())
    assert got_rate == rate
    assert np.allclose(samples, raw.astype(np.float64) / 32768.0)


@settings(max_examples=40, deadline=None)
@given(st.integers(1, 6), st.integers(0, 2**31 - 1), st.integers(1, 30))
def test_mjpeg_sample_table_any_frame_count(n_frames, seed, fps):
    """Container geometry must be exact for ANY frame count / fps: sizes,
    monotone offsets into mdat, and stts timestamps at the declared rate."""
    rng = np.random.RandomState(seed)
    frames = [rng.randint(0, 256, (16, 16, 3)).astype(np.uint8) for _ in range(n_frames)]
    payload = M.encode_mjpeg(frames, fps=fps)
    t = M.mp4_sample_table(payload)[0]
    assert len(t["sizes"]) == n_frames
    assert (np.diff(t["offsets"]) > 0).all() if n_frames > 1 else True
    delta = (1000 // fps) / 1000.0
    assert np.allclose(t["times_s"], np.arange(n_frames) * delta)
    # every sample slice is a decodable JPEG of the right geometry
    for i in range(n_frames):
        assert M.decode_video_frame(payload, i).shape == (16, 16, 3)
