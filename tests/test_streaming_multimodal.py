"""Structured Streaming pipeline + multimodal operator tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from x5_ner_spark.operators import multimodal
from x5_ner_spark.pipeline.fixtures import pages_df
from x5_ner_spark.streaming import stream_pipeline


def test_stream_triples_match_batch(spark, tmp_path):
    """Streaming over the same pages must emit exactly the batch triple set
    (same stage functions, availableNow trigger)."""
    pages_path = str(tmp_path / "pages")
    pages = pages_df(spark, 80)
    pages.write.mode("overwrite").parquet(pages_path)

    from x5_ner_spark.pipeline import extract, mentions, triples

    batch_pages = spark.read.parquet(pages_path)
    men = mentions.run(extract.run(batch_pages).select("url", "text"), None, spark, balance=False)
    batch = {(r.subj, r.pred, r.obj) for r in triples.run(men).collect()}

    got_tbl = stream_pipeline.run_stream_to_memory(
        spark, pages_path, table_name="t_stream_triples", timeout_s=120
    )
    got = {(r.subj, r.pred, r.obj) for r in got_tbl.collect()}
    assert got == batch
    assert len(got) > 0


def test_windowed_mention_counts_plan_is_streaming(spark, tmp_path):
    pages_path = str(tmp_path / "pages2")
    pages_df(spark, 20).write.mode("overwrite").parquet(pages_path)
    tr = stream_pipeline.stream_triples(stream_pipeline.stream_pages(spark, pages_path))
    agg = stream_pipeline.windowed_mention_counts(tr)
    assert agg.isStreaming
    q = (
        agg.writeStream.format("memory").queryName("t_windowed")
        .outputMode("complete").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    rows = spark.table("t_windowed").collect()
    assert sum(r["n_mentions"] for r in rows) > 0
    assert {"window_start", "pred", "n_mentions"} == set(spark.table("t_windowed").columns)


@pytest.fixture(scope="module")
def media_df(spark):
    rows = [
        (1, "image", b"\x89PNG fake bytes", "image/png", 64, 64, None),
        (2, "audio", b"RIFF fake wav", "audio/wav", None, None, 2.5),
        (3, "video", b"\x00\x00ftyp fake mp4", "video/mp4", 320, 240, 3.2),
        (4, "image", None, "image/png", 0, 0, None),
    ]
    return spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)


def test_multimodal_features_deterministic(spark, media_df):
    f1 = {r["media_id"]: r["feature"] for r in multimodal.extract_features(media_df).collect()}
    f2 = {r["media_id"]: r["feature"] for r in multimodal.extract_features(media_df).collect()}
    assert f1 == f2
    assert len(f1[1]) == 16
    assert f1[4] == [0.0] * 16  # null payload → zero vector
    assert f1[1] != f1[2]


def test_multimodal_real_decode_is_stubbed(spark, media_df):
    with pytest.raises(Exception) as ei:
        multimodal.extract_features(media_df, decode="real").collect()
    assert "NotImplementedError" in str(ei.value) or isinstance(
        ei.value, NotImplementedError
    )


def test_frame_sample_plan(spark, media_df):
    frames = multimodal.frame_sample_plan(media_df, every_s=1.0).collect()
    # 3.2s video → frames at 0,1,2 (sequence 0..max(n-1,0)=2)
    assert [(r["frame_idx"], r["frame_ts_s"]) for r in frames] == [(0, 0.0), (1, 1.0), (2, 2.0)]


def test_stateful_domain_counts(spark, tmp_path):
    """applyInPandasWithState accumulates across micro-batches; final state
    equals the batch aggregate. Two Trigger.Once lifecycles over one
    checkpoint — NOT availableNow: the operator arms processing-time idle
    timers, and any armed timer keeps availableNow scheduling empty batches
    until the awaitTermination timeout (the silent-120s-hang + leaked-query
    pattern fixed across the stream suite in r8). Each run is one batch;
    accumulation across the restart exercises exactly the cross-batch state
    path."""
    from x5_ner_spark.pipeline import extract, mentions
    from x5_ner_spark.streaming import stateful, stream_pipeline

    pages_path = str(tmp_path / "pages3")
    out_path = str(tmp_path / "state_out")
    ck = str(tmp_path / "state_ck")
    all_pages = pages_df(spark, 60)

    def run_once():
        stream = stream_pipeline.stream_pages(
            spark, pages_path, max_files_per_trigger=1
        )
        men = mentions.run(extract.run(stream).select("url", "text"), None,
                           balance=False)
        out = stateful.domain_mention_state(men)

        def sink(df, _epoch):
            df.write.mode("append").parquet(out_path)

        q = (
            out.writeStream.foreachBatch(sink)
            .option("checkpointLocation", ck)
            .outputMode("update").trigger(once=True).start()
        )
        assert q.awaitTermination(120), "query did not terminate"

    all_pages.filter(F.crc32("url") % 2 == 0).write.mode("append").parquet(pages_path)
    run_once()
    all_pages.filter(F.crc32("url") % 2 == 1).write.mode("append").parquet(pages_path)
    run_once()

    # last update per domain = cumulative total
    got = (
        spark.read.parquet(out_path)
        .groupBy("domain")
        .agg(F.max("n_pages").alias("n_pages"), F.max("n_mentions").alias("n_mentions"))
        .collect()
    )
    got_map = {r["domain"]: (r["n_pages"], r["n_mentions"]) for r in got}

    batch_pages = spark.read.parquet(pages_path)
    bm = mentions.run(extract.run(batch_pages).select("url", "text"), None, spark, balance=False)
    want = {
        r["domain"]: (r["n_pages"], r["n_mentions"])
        for r in bm.select(
            F.regexp_extract("url", r"https?://([^/]+)/", 1).alias("domain"),
            F.size("spans").alias("n_spans"),
        )
        .groupBy("domain")
        .agg(F.count(F.lit(1)).alias("n_pages"), F.sum("n_spans").alias("n_mentions"))
        .collect()
    }
    assert got_map == want and len(want) > 0


def test_stateful_update_timeout_eviction():
    """_update with a timed-out state must emit the final tally and remove
    the entry (processing-time idle eviction, bounded state)."""
    import pandas as pd

    from x5_ner_spark.streaming import stateful

    class FakeState:
        def __init__(self, value):
            self._v = value
            self.exists = value is not None
            self.hasTimedOut = True
            self.removed = False

        @property
        def get(self):
            return self._v

        def remove(self):
            self.removed = True

        def update(self, v):  # pragma: no cover - must not be called
            raise AssertionError("timed-out path must not update state")

    st = FakeState((7, 42))
    out = list(stateful._update(("shop.example",), iter([]), st))
    assert st.removed
    assert len(out) == 1
    row = out[0].iloc[0]
    assert (row["domain"], row["n_pages"], row["n_mentions"]) == ("shop.example", 7, 42)

    # live path still accumulates and arms the timeout
    class LiveState(FakeState):
        def __init__(self, value):
            super().__init__(value)
            self.hasTimedOut = False
            self.updated = None
            self.timeout_ms = None

        def update(self, v):
            self.updated = v

        def setTimeoutDuration(self, ms):
            self.timeout_ms = ms

    st2 = LiveState((1, 2))
    pdf = pd.DataFrame({"n_spans": [3, 4]})
    out2 = list(stateful._update(("d",), iter([pdf]), st2))
    assert st2.updated == (3, 9) and st2.timeout_ms == stateful.IDLE_TIMEOUT_MS
    assert out2[0].iloc[0]["n_mentions"] == 9


def test_stream_decision_log_matches_batch(spark, tmp_path):
    """Streaming decision log ≡ batch decision log over the same pages."""
    from pyspark.sql import functions as F

    from x5_ner_spark.functions.columns import portable_hash32
    from x5_ner_spark.operators.decision_log import decision_log
    from x5_ner_spark.pipeline import extract
    from x5_ner_spark.pipeline.fixtures import pages_df
    from x5_ner_spark.streaming import stream_pipeline as sp

    pages = pages_df(spark, 60, sentences=2)
    pdir = str(tmp_path / "pages")
    pages.write.parquet(pdir)

    batch_docs = extract.run(spark.read.parquet(pdir)).select(
        portable_hash32(F.col("url")).alias("doc_id"), "text"
    )
    want = sorted(tuple(r) for r in decision_log(batch_docs).collect())

    out = sp.stream_decision_log(sp.stream_pages(spark, pdir))
    q = (
        out.writeStream.format("memory").queryName("dlog_stream")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(60)
    got = sorted(tuple(r) for r in spark.sql("SELECT * FROM dlog_stream").collect())
    assert got == want and len(got) > 0


def test_stream_triples_and_log_matches_batch(spark, tmp_path):
    """The one-pass triples+log fused stage composes onto a stream and is
    row-identical to the batch run over the same pages."""
    from x5_ner_spark.pipeline.fixtures import pages_df
    from x5_ner_spark.pipeline.fused import fused_triples_and_log
    from x5_ner_spark.streaming import stream_pipeline

    pdir = str(tmp_path / "pages_tl")
    pages = pages_df(spark, 40, sentences=2)
    pages.write.mode("overwrite").parquet(pdir)

    lex = frozenset({"барни", "santa"})
    want = sorted(tuple(r) for r in fused_triples_and_log(
        spark.read.parquet(pdir), lex).collect())

    stream = stream_pipeline.stream_pages(spark, pdir)
    out = stream_pipeline.stream_triples_and_log(stream, lex)
    q = (
        out.writeStream.format("memory").queryName("tl_stream")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(60)
    got = sorted(tuple(r) for r in spark.table("tl_stream").collect())
    assert got == want and len(want) > 50


def _tiny_bmp(arr):
    """uint8 (h, w, 3) RGB → minimal 24-bit bottom-up BMP bytes."""
    import struct

    h, w, _ = arr.shape
    stride = ((w * 3 + 3) // 4) * 4
    img = bytearray()
    for r in range(h - 1, -1, -1):
        row = bytearray()
        for c in range(w):
            rr, gg, bb = arr[r, c]
            row += bytes((bb, gg, rr))
        row += b"\x00" * (stride - len(row))
        img += row
    off = 14 + 40
    hdr = b"BM" + struct.pack("<IHHI", off + len(img), 0, 0, off)
    hdr += struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(img), 2835, 2835, 0, 0)
    return bytes(hdr + img)


def _tiny_wav(samples, rate=8000):
    import io
    import wave

    import numpy as np

    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes((np.asarray(samples) * 32767).astype("<i2").tobytes())
    return buf.getvalue()


def test_real_decoders_roundtrip_and_features():
    import numpy as np

    from x5_ner_spark.core import media as M

    rng = np.random.RandomState(4)
    arr = rng.randint(0, 256, size=(10, 7, 3), dtype=np.uint8)
    assert np.array_equal(M.decode_ppm(M.encode_ppm(arr)), arr)
    assert np.array_equal(M.decode_bmp(_tiny_bmp(arr)), arr)

    f = M.image_feature(arr)
    assert len(f) == 64 and all(0.0 <= v <= 1.0 for v in f)
    # a uniform white image → all-ones thumbnail
    white = np.full((16, 16, 3), 255, dtype=np.uint8)
    assert all(abs(v - 1.0) < 1e-6 for v in M.image_feature(white))

    t = np.sin(2 * np.pi * 440 * np.arange(8000) / 8000)
    x, rate = M.decode_wav(_tiny_wav(t))
    assert rate == 8000 and abs(len(x) - 8000) <= 1
    af = M.audio_feature(x, rate)
    assert len(af) == 11
    assert abs(af[0] - 1.0) < 1e-3            # duration ≈ 1 s
    assert abs(af[1] - 0.7071) < 0.01         # sine RMS ≈ 1/√2
    # 440 Hz sits in band 0 of 8 bands over 0..4000 Hz → dominant energy
    assert af[3] == max(af[3:])


def test_real_decode_spark_path(spark):
    import numpy as np

    from x5_ner_spark.core import media as M
    from x5_ner_spark.operators import multimodal

    rng = np.random.RandomState(9)
    arr = rng.randint(0, 256, size=(12, 9, 3), dtype=np.uint8)
    wav = _tiny_wav(np.sin(2 * np.pi * 200 * np.arange(4000) / 8000))
    rows = [
        (1, "image", M.encode_ppm(arr), "image/x-portable-pixmap", 9, 12, None),
        (2, "image", _tiny_bmp(arr), "image/bmp", 9, 12, None),
        (3, "audio", wav, "audio/wav", 0, 0, 0.5),
    ]
    media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    out = {r["media_id"]: r["feature"]
           for r in multimodal.extract_features(media, decode="real").collect()}
    want_img = M.image_feature(arr)
    assert [round(v, 6) for v in out[1]] == [round(v, 6) for v in want_img]
    assert [round(v, 6) for v in out[2]] == [round(v, 6) for v in want_img]
    assert len(out[3]) == 11 and abs(out[3][0] - 0.5) < 1e-3


def test_png_roundtrip_every_filter_type():
    """decode_png reconstructs exactly under each spec filter (0-4); all
    five filtered encodings of the same image decode identically."""
    import numpy as np

    from x5_ner_spark.core import media as M

    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, size=(13, 9, 3), dtype=np.uint8)
    decoded = [M.decode_png(M.encode_png(img, filter_type=f)) for f in range(5)]
    for d in decoded:
        assert d.shape == img.shape
        assert (d == img).all()


def test_png_filter_math_hand_vectors():
    """Independent hand-worked reconstructions (spec §9 equations), so a
    shared encoder/decoder misreading cannot cancel out."""
    import numpy as np

    from x5_ner_spark.core.media import _png_unfilter

    prev = np.array([10, 20, 30, 40, 50, 60], dtype=np.int32)  # 2 px RGB
    cur = np.array([5, 6, 7, 8, 9, 10], dtype=np.uint8)
    # Sub (bpp=3): out[i] = cur[i] + out[i-3]
    assert _png_unfilter(1, cur, prev, 3).tolist() == [5, 6, 7, 13, 15, 17]
    # Up: out[i] = cur[i] + prev[i]
    assert _png_unfilter(2, cur, prev, 3).tolist() == [15, 26, 37, 48, 59, 70]
    # Average: out[i] = cur[i] + floor((a + prev[i]) / 2); a=0 for i<3
    #   i0: 5+10//2=10 -> 5+5=10; i1: 6+20//2=16; i2: 7+15=22
    #   i3: 8+(10+40)//2=33; i4: 9+(16+50)//2=42; i5: 10+(22+60)//2=51
    assert _png_unfilter(3, cur, prev, 3).tolist() == [10, 16, 22, 33, 42, 51]
    # Paeth: i<3 -> a=c=0, p=b -> predictor=b
    #   i0: 5+10=15; i1: 6+20=26; i2: 7+30=37
    #   i3: a=15,b=40,c=10 -> p=45; pa=30,pb=5,pc=35 -> b -> 8+40=48
    #   i4: a=26,b=50,c=20 -> p=56; pa=30,pb=6,pc=36 -> b -> 9+50=59
    #   i5: a=37,b=60,c=30 -> p=67; pa=30,pb=7,pc=37 -> b -> 10+60=70
    assert _png_unfilter(4, cur, prev, 3).tolist() == [15, 26, 37, 48, 59, 70]


def test_png_gray_palette_alpha_paths():
    """Raw chunk construction for color types 0/3/6 (filter 0 rows)."""
    import struct
    import zlib

    import numpy as np

    from x5_ner_spark.core.media import _PNG_SIG, decode_png

    def chunk(tag, data):
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))

    def png(ctype, w, h, raw_rows, plte=b""):
        ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
        body = b"".join(b"\x00" + r for r in raw_rows)
        out = _PNG_SIG + chunk(b"IHDR", ihdr)
        if plte:
            out += chunk(b"PLTE", plte)
        return out + chunk(b"IDAT", zlib.compress(body)) + chunk(b"IEND", b"")

    # grayscale 2x2 -> replicated channels
    g = decode_png(png(0, 2, 2, [bytes([0, 255]), bytes([17, 34])]))
    assert g[0, 1].tolist() == [255, 255, 255] and g[1, 0].tolist() == [17, 17, 17]

    # palette: index 1 -> (9, 8, 7)
    p = decode_png(png(3, 2, 1, [bytes([1, 0])], plte=bytes([1, 2, 3, 9, 8, 7])))
    assert p[0, 0].tolist() == [9, 8, 7] and p[0, 1].tolist() == [1, 2, 3]

    # RGBA composited over white: half-transparent black -> 128ish
    row = bytes([0, 0, 0, 128, 10, 20, 30, 255])
    a = decode_png(png(6, 2, 1, [row]))
    assert a[0, 1].tolist() == [10, 20, 30]
    assert all(126 <= v <= 129 for v in a[0, 0].tolist())


def test_png_through_extract_features(spark):
    """PNG payload flows through the real-decode mapInPandas path and its
    feature equals the decoded-pixel feature computed locally."""
    import numpy as np

    from x5_ner_spark.core import media as M
    from x5_ner_spark.operators.multimodal import MEDIA_SCHEMA, extract_features

    rng = np.random.RandomState(7)
    img = rng.randint(0, 256, size=(16, 16, 3), dtype=np.uint8)
    payload = M.encode_png(img, filter_type=4)
    df = spark.createDataFrame(
        [(1, "image", bytearray(payload), "image/png", 16, 16, None)],
        MEDIA_SCHEMA,
    )
    row = extract_features(df, decode="real").collect()[0]
    assert row["n_bytes"] == len(payload)
    want = M.image_feature(img)
    assert np.allclose(np.array(row["feature"]), np.array(want), atol=1e-6)


def test_mp4_box_tree_metadata():
    """ISO-BMFF struct walk: brand, v0/v1 mvhd duration, track handlers,
    mdat size — built from raw boxes (no codec involved)."""
    import struct

    from x5_ner_spark.core.media import parse_mp4_meta

    def box(tag, body):
        return struct.pack(">I", 8 + len(body)) + tag + body

    # v0 mvhd: timescale 1000, duration 7500 -> 7.5 s
    mvhd0 = box(b"mvhd", bytes(4) + struct.pack(">IIII", 0, 0, 1000, 7500) + bytes(80))
    hdlr_v = box(b"hdlr", bytes(8) + b"vide" + bytes(12))
    hdlr_s = box(b"hdlr", bytes(8) + b"soun" + bytes(12))
    moov = box(b"moov", mvhd0
               + box(b"trak", box(b"mdia", hdlr_v))
               + box(b"trak", box(b"mdia", hdlr_s)))
    payload = box(b"ftyp", b"isom" + bytes(8)) + moov + box(b"mdat", b"\x00" * 321)
    meta = parse_mp4_meta(payload)
    assert meta["brand"] == "isom"
    assert meta["duration_s"] == 7.5
    assert meta["tracks"] == ["vide", "soun"]
    assert meta["mdat_bytes"] == 321

    # v1 mvhd (64-bit times): timescale 600, duration 1200 -> 2.0 s
    mvhd1 = box(b"mvhd", bytes([1]) + bytes(3)
                + struct.pack(">QQIQ", 0, 0, 600, 1200) + bytes(80))
    meta1 = parse_mp4_meta(box(b"moov", mvhd1))
    assert meta1["duration_s"] == 2.0


def test_png_roundtrip_random_sizes():
    """Property sweep: exact round-trip across sizes (incl. 1-pixel rows/
    cols) and filter types."""
    import numpy as np

    from x5_ner_spark.core import media as M

    rng = np.random.RandomState(11)
    for h, w in ((1, 1), (1, 7), (5, 1), (3, 4), (17, 2)):
        img = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
        for f in range(5):
            assert (M.decode_png(M.encode_png(img, filter_type=f)) == img).all()


def test_gif_lzw_roundtrip_and_interlace():
    """Real LZW both ways: palette-lattice images round-trip losslessly,
    interlaced row order reconstructs, sub-blocks split at 255 bytes, and
    the dictionary-reset path engages on long inputs."""
    import numpy as np

    from x5_ner_spark.core.media import decode_gif, encode_gif

    rng = np.random.RandomState(5)
    # palette-lattice image (64-color cube -> 4 levels/channel: 0,85,170,255)
    lattice = np.array([0, 85, 170, 255], dtype=np.uint8)
    img = lattice[rng.randint(0, 4, size=(23, 17, 3))]
    for interlaced in (False, True):
        out = decode_gif(encode_gif(img, n_colors=64, interlaced=interlaced))
        assert out.shape == img.shape
        assert (out == img).all(), interlaced

    # large repetitive image: LZW dictionary grows deep and resets
    big = lattice[rng.randint(0, 2, size=(80, 120, 3))]
    data = encode_gif(big, n_colors=64)
    assert (decode_gif(data) == big).all()
    assert len(data) < big.size  # it actually compressed

    # KwKwK case: aaa... runs produce the code==next_code branch
    run = np.zeros((4, 40, 3), dtype=np.uint8)
    assert (decode_gif(encode_gif(run, n_colors=8)) == run).all()


def test_gif_through_extract_features(spark):
    import numpy as np

    from x5_ner_spark.core import media as M
    from x5_ner_spark.operators.multimodal import MEDIA_SCHEMA, extract_features

    lattice = np.array([0, 85, 170, 255], dtype=np.uint8)
    img = lattice[np.random.RandomState(9).randint(0, 4, size=(16, 16, 3))]
    payload = M.encode_gif(img)
    df = spark.createDataFrame(
        [(1, "image", bytearray(payload), "image/gif", 16, 16, None)],
        MEDIA_SCHEMA,
    )
    row = extract_features(df, decode="real").collect()[0]
    assert np.allclose(np.array(row["feature"]),
                       np.array(M.image_feature(img)), atol=1e-6)


def test_extract_features_on_error_null_survives_corrupt_payloads(spark):
    """At corpus scale malformed media is guaranteed; on_error='null' must
    keep the task alive — corrupt rows get feature=NULL + an error string,
    good rows still decode."""
    import numpy as np

    from x5_ner_spark.core import media as M
    from x5_ner_spark.operators.multimodal import MEDIA_SCHEMA, extract_features

    good = M.encode_ppm(np.full((4, 4, 3), 7, dtype=np.uint8))
    rows = [
        (1, "image", bytearray(good), "image/ppm", 4, 4, None),
        # right magic, garbage body — decoder internals must not leak as
        # task-killing IndexErrors
        (2, "image", bytearray(b"\x89PNG\r\n\x1a\n" + b"\x01" * 20), "image/png", 0, 0, None),
        (3, "image", bytearray(b"\xff\xd8\xff" + b"\x02" * 30), "image/jpeg", 0, 0, None),
        (4, "image", bytearray(b"GIF89a" + b"\x03" * 10), "image/gif", 0, 0, None),
        (5, "video", bytearray(b"\x00\x00\x00\x18ftypisom"), "video/mp4", 0, 0, None),
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r["media_id"]: r for r in
           extract_features(df, decode="real", on_error="null").collect()}
    assert got[1]["feature"] is not None and got[1]["error"] is None
    for mid in (2, 3, 4, 5):
        assert got[mid]["feature"] is None, mid
        assert got[mid]["error"], mid

    # strict mode still fails fast
    import pytest as _pytest
    with _pytest.raises(Exception):
        extract_features(df, decode="real", on_error="raise").collect()


def test_media_soak_error_accounting(spark):
    """Scaled-down replica of tools/media_bench.py --soak (the 100k run is
    recorded in BENCH/BASELINE.md): a deterministic 5k mixed corpus — ~20%
    decodable across all native formats, ~80% corrupted with correct magic
    bytes — through extract_features(decode='real', on_error='null'). Every
    input row must come out exactly once (no task deaths, no drops), the
    OK/error split must match the generator's construction exactly, and
    every error row must carry a typed error string."""
    import importlib.util
    import os as _os

    spec = importlib.util.spec_from_file_location(
        "media_bench",
        _os.path.join(_os.path.dirname(_os.path.dirname(__file__)), "tools", "media_bench.py"),
    )
    mb = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mb)

    n = 5000
    templates = {k: v for k, (v, _) in mb.build_payloads().items()}
    rows = []
    for i in range(n):
        payload, kind = mb._soak_payload(i, templates)
        rows.append((i, "image", bytearray(payload), kind, None, None, None))
    df = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA).repartition(8)
    got = multimodal.extract_features(df, decode="real", on_error="null").collect()
    assert len(got) == n
    ok = [r for r in got if r["error"] is None]
    bad = [r for r in got if r["error"] is not None]
    # generator construction: 20 decodable per 100 ids
    assert len(ok) == n * 20 // 100
    assert all(r["feature"] is not None for r in ok)
    assert all(r["feature"] is None and ":" in r["error"] for r in bad)
    # corrupt rows fail as *typed* decode errors, never as raw Index/KeyErrors
    # escaping a decoder's bounds math into something un-triageable
    etypes = {r["error"].split(":")[0] for r in bad}
    assert etypes, etypes


def test_stream_frame_and_media_features_match_batch(spark, tmp_path):
    """Stream ≡ batch over a MIXED-CODEC media fixture (VERDICT r5 #8):
    an MJPEG video (real sampled-frame decodes), an avc1 video (error row
    under on_error='null'), a still image and a WAV — frame features and
    whole-file features both row-identical between the streaming and batch
    plans over the same parquet."""
    import numpy as np

    from x5_ner_spark.core import media as M
    from x5_ner_spark.streaming import stream_pipeline as sp

    y, x = np.mgrid[0:48, 0:64]
    frames = [
        np.stack([(x * 3 + k * 17) % 256, (y * 5) % 256, ((x + y) * 2) % 256],
                 axis=2).astype(np.uint8)
        for k in range(9)
    ]
    good = M.encode_mjpeg(frames, fps=4)
    bad = bytearray(M.encode_mjpeg(frames[:2]))
    i = bad.find(b"jpeg", bad.find(b"stsd"))
    bad[i : i + 4] = b"avc1"
    arr = np.random.RandomState(3).randint(0, 256, size=(12, 9, 3), dtype=np.uint8)
    wav = _tiny_wav(np.sin(2 * np.pi * 300 * np.arange(4000) / 8000))
    rows = [
        (1, "video", bytearray(good), "video/mp4", 64, 48, 2.0),
        (2, "video", bytes(bad), "video/mp4", 64, 48, 0.5),
        (3, "image", M.encode_ppm(arr), "image/x-portable-pixmap", 9, 12, None),
        (4, "audio", wav, "audio/wav", 0, 0, 0.5),
    ]
    from x5_ner_spark.operators import multimodal

    mdir = str(tmp_path / "media")
    spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA).write.parquet(mdir)
    batch_media = spark.read.parquet(mdir)

    want_frames = sorted(
        tuple(r) for r in multimodal.extract_frame_features(
            batch_media, every_s=1.0, on_error="null").collect()
    )
    want_feats = sorted(
        tuple(r) for r in multimodal.extract_features(
            batch_media, decode="real", on_error="null").collect()
    )

    stream = sp.stream_media(spark, mdir, max_files_per_trigger=1)
    qf = (
        sp.stream_frame_features(stream, every_s=1.0)
        .writeStream.format("memory").queryName("frames_stream")
        .outputMode("append").trigger(availableNow=True).start()
    )
    qf.awaitTermination(120)
    got_frames = sorted(tuple(r) for r in spark.table("frames_stream").collect())
    assert got_frames == want_frames
    # the MJPEG video yielded real sampled frames (ticks 0s,1s,2s → 0,4,8)
    assert [r[1] for r in got_frames if r[0] == 1] == [0, 4, 8]
    # the avc1 video degraded to one error row naming the codec
    (err_row,) = [r for r in got_frames if r[0] == 2]
    assert err_row[1] == -1 and "avc1" in err_row[4]

    qm = (
        sp.stream_media_features(sp.stream_media(spark, mdir))
        .writeStream.format("memory").queryName("media_feat_stream")
        .outputMode("append").trigger(availableNow=True).start()
    )
    qm.awaitTermination(120)
    got_feats = sorted(tuple(r) for r in spark.table("media_feat_stream").collect())
    assert got_feats == want_feats and len(got_feats) == 4
