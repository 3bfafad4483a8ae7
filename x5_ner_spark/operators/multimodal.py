"""Multimodal columns: opaque binary payloads + typed metadata, processed
with Arrow-batched mapInPandas.

DECODE (rounds 3-4): genuinely REAL for every still-image/audio format the
engine claims — PPM/uncompressed BMP, PNG (stdlib zlib inflate + spec
unfiltering), GIF (variable-width LZW incl. interlacing), JPEG baseline AND
progressive (full T.81 in core/jpeg.py: file-declared DQT/DHT, 4:2:0,
restart markers, spectral selection + successive approximation), and PCM
WAV audio — stdlib+numpy only (core/media.py), producing content features
(8×8 grayscale thumbnail; duration/RMS/ZCR/FFT-band energies). Round 5
added Motion-JPEG video: the real ISO-BMFF sample table maps frames to
byte ranges that core/jpeg.py decodes natively (whole-file path below;
sampled-frame path in extract_frame_features). The remaining
NotImplementedError boundaries are exactly two: INTER-CODED video codecs
(avc1/hev1/... — a true external-library boundary; production plugs a
decoder via core/media.register_video_codec, which these operators
snapshot at plan-build time so driver registrations reach executors) and
unrecognized magic bytes (the final raise in _real_decode below).
``decode=fake`` remains the
deterministic hash stub for tests that don't care about content. The
Spark-side plumbing — schema, batch iteration, partition sizing — is what
matters at 100 TB: payload bytes never enter a shuffle; features are
extracted in one pass and the binary column is dropped immediately after.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, mime string, width int, "
    "height int, duration_s double"
)
FEATURE_SCHEMA = "media_id long, kind string, n_bytes long, feature array<float>"


def _fake_feature(payload: bytes | None, dim: int = 16) -> list[float]:
    """Deterministic stand-in for a decoded-content embedding: md5-seeded
    pseudo-features. Swapping in a real decoder changes ONLY this function."""
    if not payload:
        return [0.0] * dim
    h = hashlib.md5(bytes(payload)).digest()
    rng = np.frombuffer((h * ((dim * 4) // len(h) + 1))[: dim * 4], dtype="<u4")
    return (rng.astype("float64") / 2**32).astype("float32").tolist()


def _media_codecs() -> dict:
    """Driver-side snapshot of core.media's video-codec registry (built-ins
    + register_video_codec entries), captured at plan-build time so the
    closure carries registrations to executor workers."""
    from ..core import media as M

    return M.video_codec_registry()


def _video_frame_rows(
    payload: bytes, every_s: float, codecs: dict | None = None
) -> list[tuple[int, float, list[float]]]:
    """Pure per-video sampled-frame extraction: ONE sample-table parse,
    then per-frame (offset, size) slices via decode_video_frame_from_table —
    never re-walking the box tree per frame. Returns
    [(frame_idx, frame_ts_s, feature)]; factored out of the Spark closure so
    the parse-once property is directly testable."""
    from ..core import media as M

    track = M.video_track(payload)
    times = track["times_s"]
    dur = float(times[-1]) if len(times) else 0.0
    n_ticks = max(int(dur / every_s) + 1, 1)
    picked = sorted(
        {int(np.abs(times - k * every_s).argmin()) for k in range(n_ticks)}
    )
    return [
        (
            idx,
            float(times[idx]),
            M.image_feature(
                M.decode_video_frame_from_table(payload, track, idx, codecs)
            ),
        )
        for idx in picked
    ]


def _real_decode(
    payload: bytes, kind: str, mime: str = "", codecs: dict | None = None
) -> list[float]:
    """Real decode + content feature for library-free formats; the payload's
    magic bytes decide (mime is advisory). Output length varies by modality
    — image 64, audio 11 — callers treat it as an opaque vector."""
    from ..core import media as M

    if payload is None:
        return []
    payload = bytes(payload)
    if payload.startswith(b"P6"):
        return M.image_feature(M.decode_ppm(payload))
    if payload.startswith(b"BM"):
        return M.image_feature(M.decode_bmp(payload))
    if payload.startswith(b"\x89PNG\r\n\x1a\n"):
        # REAL compressed-image decode: stdlib zlib inflate + spec
        # unfiltering (core/media.py decode_png) — no codec plug needed
        return M.image_feature(M.decode_png(payload))
    if payload.startswith(b"\xff\xd8"):
        # REAL JPEG decode (core/jpeg.py) — baseline AND progressive
        # (SOF0/SOF2): DQT/DHT-declared tables, 4:2:0, restart markers,
        # spectral selection + successive approximation
        from ..core.jpeg import decode_jpeg

        return M.image_feature(decode_jpeg(payload))
    if payload.startswith((b"GIF87a", b"GIF89a")):
        # real LZW decode incl. interlacing (core/media.py decode_gif)
        return M.image_feature(M.decode_gif(payload))
    if payload.startswith(b"RIFF") and payload[8:12] == b"WAVE":
        return M.audio_feature(*M.decode_wav(payload))
    if payload[4:8] == b"ftyp":
        # ISO-BMFF video: container geometry (sample table) is parsed for
        # real; an MJPEG track's first frame decodes natively via
        # core/jpeg.py. Codecs without a registry entry raise
        # NotImplementedError — the plug boundary (register_video_codec).
        return M.image_feature(
            M.decode_video_frame_from_table(payload, M.video_track(payload), 0, codecs)
        )
    raise NotImplementedError(
        f"decode for {mime or kind!r} requires an external codec, not "
        "available in this container; plug the codec in here "
        "(signature: bytes, kind -> ndarray). "
        "PPM/BMP/PNG/GIF/JPEG/WAV/MJPEG-in-MP4 decode natively."
    )


def extract_features(
    media: DataFrame,
    decode: str = "fake",
    batch_rows: int = 256,
    on_error: str = "raise",
) -> DataFrame:
    """media(MEDIA_SCHEMA) → FEATURE_SCHEMA via mapInPandas. Binary payloads
    stay inside the scan partition — only the small feature vector survives.

    ``on_error``: at corpus scale malformed payloads are GUARANTEED, and one
    bad row must not fail the Spark task (and with it the stage's retries).
    ``"null"`` catches per-row decode failures and emits feature=NULL plus
    an ``error`` column (exception type + message) for triage/lineage;
    ``"raise"`` (default) keeps strict fail-fast semantics for tests."""
    if on_error not in ("raise", "null"):
        raise ValueError(f"on_error must be 'raise' or 'null', got {on_error!r}")
    schema = FEATURE_SCHEMA if on_error == "raise" else FEATURE_SCHEMA + ", error string"
    codecs = _media_codecs() if decode == "real" else None

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for lo in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[lo : lo + batch_rows]
                feats: list = []
                errors: list = []
                for payload, kind, mime in zip(
                    chunk["payload"], chunk["kind"], chunk["mime"]
                ):
                    try:
                        if decode == "real":
                            feats.append(
                                _real_decode(payload, kind, mime or "", codecs)
                            )
                        else:
                            feats.append(_fake_feature(payload))
                        errors.append(None)
                    except Exception as e:  # noqa: BLE001 — row-level policy
                        if on_error == "raise":
                            raise
                        feats.append(None)
                        errors.append(f"{type(e).__name__}: {e}"[:200])
                out = {
                    "media_id": chunk["media_id"],
                    "kind": chunk["kind"],
                    "n_bytes": [len(p) if p is not None else 0 for p in chunk["payload"]],
                    "feature": feats,
                }
                if on_error == "null":
                    out["error"] = errors
                yield pd.DataFrame(out)

    return media.mapInPandas(gen, schema=schema)


FRAME_FEATURE_SCHEMA = (
    "media_id long, frame_idx int, frame_ts_s double, feature array<float>"
)


def extract_frame_features(
    media: DataFrame,
    every_s: float = 1.0,
    batch_rows: int = 64,
    on_error: str = "raise",
) -> DataFrame:
    """Video rows → one feature row per sampled frame, decoded INSIDE the
    scan partition (payload bytes never enter a shuffle — joining
    frame_sample_plan back to the payload would shuffle the binary column,
    the exact anti-pattern). Per video: parse the ISO-BMFF sample table
    (core/media.mp4_sample_table), pick the frame nearest each ``every_s``
    tick from the REAL stts timestamps, decode each via core/jpeg.py
    (MJPEG), and emit the 64-dim image feature. Inter-coded codecs hit
    decode_video_frame's NotImplementedError — with ``on_error="null"``
    that becomes one NULL-feature row per video (frame_idx -1) with the
    error recorded, the corpus-scale triage semantics extract_features
    established."""
    if on_error not in ("raise", "null"):
        raise ValueError(f"on_error must be 'raise' or 'null', got {on_error!r}")
    schema = (
        FRAME_FEATURE_SCHEMA
        if on_error == "raise"
        else FRAME_FEATURE_SCHEMA + ", error string"
    )

    # plan-build-time snapshot: driver-side register_video_codec() entries
    # ride the closure (cloudpickle) to executors, where the module-level
    # table only has the built-ins
    codecs = _media_codecs()

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for lo in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[lo : lo + batch_rows]
                rows: list[tuple] = []
                for media_id, payload in zip(chunk["media_id"], chunk["payload"]):
                    try:
                        for idx, ts, feat in _video_frame_rows(
                            bytes(payload), every_s, codecs
                        ):
                            rows.append((media_id, idx, ts, feat, None))
                    except Exception as e:  # noqa: BLE001 — row-level policy
                        if on_error == "raise":
                            raise
                        rows.append(
                            (media_id, -1, None, None, f"{type(e).__name__}: {e}"[:200])
                        )
                cols = ["media_id", "frame_idx", "frame_ts_s", "feature", "error"]
                out = pd.DataFrame(rows, columns=cols)
                if on_error == "raise":
                    out = out.drop(columns=["error"])
                yield out

    return media.filter(media.kind == "video").mapInPandas(gen, schema=schema)


def frame_sample_plan(media: DataFrame, every_s: float = 1.0) -> DataFrame:
    """Video frame-sampling plumbing: one output row per planned frame
    timestamp (sequence over duration) — metadata-only fan-out (the decode
    itself lives in extract_frame_features, payload-side); the fan-out and
    partitioning are real."""
    from pyspark.sql import functions as F

    n = (F.col("duration_s") / every_s).cast("int")
    return (
        media.filter(F.col("kind") == "video")
        .withColumn("frame_idx", F.explode(F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)))))
        .select(
            "media_id",
            "frame_idx",
            (F.col("frame_idx") * every_s).alias("frame_ts_s"),
        )
    )
