#!/usr/bin/env python
"""Media-decode path measurement (VERDICT r4 next #1) — the one operator
family that had zero throughput evidence.

Two parts:

* ``--kernels`` (default): single-core decode+feature throughput per format
  (payloads/s and MB/s, CPU ``process_time``) for every native decoder:
  PPM, BMP, PNG, GIF, JPEG baseline, JPEG progressive, WAV, and an
  MJPEG-in-MP4 sampled frame. These numbers ARE the documented pure-Python
  ceiling: at 100 TB you plug libjpeg-turbo-class codecs into
  operators/multimodal._real_decode — the plug point, per-row error policy
  and Spark plumbing are the load-bearing parts, and these measurements
  state exactly what production must replace.

* ``--soak N`` (default 100_000): N mixed/corrupted payloads through
  ``extract_features(decode="real", on_error="null")`` on local Spark.
  Payloads are materialized to parquet first (generation off the clock,
  bench convention) and streamed from storage — never collected to the
  driver. Reports wall time, rows/s, the error-accounting histogram
  (exception type counts — corrupt rows MUST become error rows, not task
  deaths), and python-worker RSS high-water before/after a second identical
  pass (memory flatness: decode state must not accumulate across batches).

Usage: python tools/media_bench.py [--kernels] [--soak N] [--json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from x5_ner_spark.core import media as M
from x5_ner_spark.core.jpeg import (
    decode_jpeg,
    encode_jpeg,
    encode_jpeg_progressive,
)

IMG_SIDE = 64  # web-thumbnail-ish; scales linearly in pixels


def _test_image(side: int = IMG_SIDE, seed: int = 5) -> np.ndarray:
    y, x = np.mgrid[0:side, 0:side]
    base = np.stack([(x * 3) % 256, (y * 5) % 256, ((x + y) * 2) % 256], axis=2)
    noise = np.random.RandomState(seed).randint(0, 32, size=base.shape)
    return ((base + noise) % 256).astype(np.uint8)


def _gif_image(side: int = IMG_SIDE) -> np.ndarray:
    lattice = np.array([0, 85, 170, 255], dtype=np.uint8)
    return lattice[np.random.RandomState(7).randint(0, 4, size=(side, side, 3))]


def _wav_payload(seconds: float = 1.0, rate: int = 8000) -> bytes:
    import io
    import wave

    t = np.arange(int(rate * seconds)) / rate
    samples = (0.5 * np.sin(2 * np.pi * 440 * t) * 32767).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(samples.tobytes())
    return buf.getvalue()


def build_payloads() -> dict[str, tuple[bytes, str]]:
    """format -> (payload, decode expression)."""
    img = _test_image()
    gimg = _gif_image()
    return {
        "ppm": (M.encode_ppm(img), "ppm"),
        "bmp": (_bmp_payload(img), "bmp"),
        "png": (M.encode_png(img, filter_type=4), "png"),
        "gif": (M.encode_gif(gimg, n_colors=64), "gif"),
        "jpeg_baseline": (encode_jpeg(img, subsampling="4:2:0"), "jpeg"),
        "jpeg_progressive": (encode_jpeg_progressive(img), "jpeg"),
        "wav_1s_8k": (_wav_payload(), "wav"),
        "mjpeg_frame": (M.encode_mjpeg([img] * 3, fps=4), "mjpeg"),
    }


def _bmp_payload(img: np.ndarray) -> bytes:
    """Minimal 24-bit uncompressed BMP writer (bench fixture only)."""
    import struct

    h, w, _ = img.shape
    row = w * 3
    pad = (4 - row % 4) % 4
    body = bytearray()
    for r in range(h - 1, -1, -1):
        body += img[r, :, ::-1].tobytes() + b"\x00" * pad
    off = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", off + len(body), 0, 0, off)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    return bytes(header) + info + bytes(body)


def _decode_once(fmt: str, payload: bytes) -> None:
    if fmt == "ppm":
        M.image_feature(M.decode_ppm(payload))
    elif fmt == "bmp":
        M.image_feature(M.decode_bmp(payload))
    elif fmt == "png":
        M.image_feature(M.decode_png(payload))
    elif fmt == "gif":
        M.image_feature(M.decode_gif(payload))
    elif fmt == "jpeg":
        M.image_feature(decode_jpeg(payload))
    elif fmt == "wav":
        M.audio_feature(*M.decode_wav(payload))
    elif fmt == "mjpeg":
        M.image_feature(M.decode_video_frame(payload, 1))
    else:
        raise ValueError(fmt)


def run_kernels(min_seconds: float = 1.0) -> dict:
    out: dict[str, dict] = {}
    for name, (payload, fmt) in build_payloads().items():
        _decode_once(fmt, payload)  # warm (imports, table builds)
        n, spent = 0, 0.0
        t0 = time.process_time()
        while spent < min_seconds:
            _decode_once(fmt, payload)
            n += 1
            spent = time.process_time() - t0
        out[name] = {
            "bytes": len(payload),
            "payloads_per_s_core": round(n / spent, 1),
            "mb_per_s_core": round(n * len(payload) / spent / 1e6, 3),
        }
    return out


# --------------------------------------------------------------------- soak

CORRUPT_KINDS = (
    "png_garbage", "jpeg_truncated", "gif_garbage", "mp4_empty", "unknown_magic",
)


def _soak_payload(i: int, templates: dict[str, bytes]) -> tuple[bytes, str]:
    """Deterministic mixed corpus: ~20% decodable across all formats, ~80%
    corrupted in format-specific ways (right magic, broken body — the
    decoder-internals crash surface)."""
    r = i % 100
    if r < 8:
        return templates["ppm"], "ok"
    if r < 12:
        return templates["bmp"], "ok"
    if r < 15:
        return templates["png"], "ok"
    if r < 17:
        return templates["gif"], "ok"
    if r < 18:
        return templates["jpeg_baseline"], "ok"
    if r < 20:
        return templates["wav_1s_8k"], "ok"
    k = CORRUPT_KINDS[r % len(CORRUPT_KINDS)]
    if k == "png_garbage":
        return b"\x89PNG\r\n\x1a\n" + bytes([(i * 7 + j) % 256 for j in range(40)]), k
    if k == "jpeg_truncated":
        return templates["jpeg_baseline"][: 20 + (i % 60)], k
    if k == "gif_garbage":
        return b"GIF89a" + bytes([(i * 13 + j) % 256 for j in range(30)]), k
    if k == "mp4_empty":
        return b"\x00\x00\x00\x18ftypisom" + b"\x00" * (i % 16), k
    return bytes([i % 256]) * 24, k


def _python_worker_rss_mb() -> float:
    """Max RSS (MB) over live pyspark daemon/worker processes (local mode)."""
    best = 0.0
    for pid in os.listdir("/proc"):
        if not pid.isdigit():
            continue
        try:
            with open(f"/proc/{pid}/cmdline", "rb") as f:
                cmd = f.read().decode("utf-8", "replace")
            if "pyspark.daemon" not in cmd and "pyspark.worker" not in cmd:
                continue
            with open(f"/proc/{pid}/status") as f:
                for line in f:
                    if line.startswith("VmRSS:"):
                        best = max(best, int(line.split()[1]) / 1024.0)
                        break
        except OSError:
            continue
    return round(best, 1)


def run_soak(n_rows: int, cpus: str = "8") -> dict:
    import tempfile

    from pyspark.sql import functions as F

    from x5_ner_spark.operators.multimodal import extract_features
    from x5_ner_spark.session import get_spark

    spark = get_spark(master=f"local[{cpus}]", app_name="media-soak")
    templates = {k: v for k, (v, _) in build_payloads().items()}

    # generation OFF the clock: materialize to parquet, stream from storage
    path = os.path.join(tempfile.gettempdir(), f"media_soak_{n_rows}")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        import pandas as pd

        def gen(batches):
            for pdf in batches:
                ids = pdf["id"].tolist()
                rows = []
                for i in ids:
                    payload, kind = _soak_payload(i, templates)
                    rows.append((i, "image", payload, kind, None, None, None))
                yield pd.DataFrame(
                    rows,
                    columns=[
                        "media_id", "kind", "payload", "mime",
                        "width", "height", "duration_s",
                    ],
                )

        (
            spark.range(n_rows, numPartitions=32)
            .mapInPandas(
                gen,
                schema="media_id long, kind string, payload binary, mime string, "
                "width int, height int, duration_s double",
            )
            .write.mode("overwrite")
            .parquet(path)
        )

    media = spark.read.parquet(path)

    def one_pass() -> tuple[float, dict]:
        t0 = time.time()
        feats = extract_features(media, decode="real", on_error="null")
        hist = {
            r["etype"]: r["n"]
            for r in feats.groupBy(
                F.coalesce(F.split(F.col("error"), ":").getItem(0), F.lit("OK")).alias(
                    "etype"
                )
            )
            .agg(F.count("*").alias("n"))
            .collect()
        }
        return time.time() - t0, hist

    wall1, hist1 = one_pass()
    rss1 = _python_worker_rss_mb()
    wall2, hist2 = one_pass()
    rss2 = _python_worker_rss_mb()
    assert hist1 == hist2, (hist1, hist2)
    ok = hist1.get("OK", 0)
    return {
        "rows": n_rows,
        "cpus": int(cpus),
        "wall_s_pass1": round(wall1, 2),
        "wall_s_pass2": round(wall2, 2),
        "rows_per_s": round(n_rows / min(wall1, wall2), 1),
        "ok_rows": ok,
        "error_rows": n_rows - ok,
        "error_histogram": hist1,
        "worker_rss_mb_after_pass1": rss1,
        "worker_rss_mb_after_pass2": rss2,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--kernels", action="store_true")
    ap.add_argument("--soak", type=int, nargs="?", const=100_000, default=None)
    ap.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "8"))
    args = ap.parse_args()
    if not args.kernels and args.soak is None:
        args.kernels = True
        args.soak = 100_000
    out: dict = {}
    if args.kernels:
        out["kernels_single_core"] = run_kernels()
    if args.soak is not None:
        out["soak"] = run_soak(args.soak, cpus=args.cpus)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
