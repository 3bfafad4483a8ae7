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
    equals the batch aggregate."""
    from x5_ner_spark.pipeline import extract, mentions
    from x5_ner_spark.streaming import stateful, stream_pipeline

    pages_path = str(tmp_path / "pages3")
    pages_df(spark, 60).write.mode("overwrite").parquet(pages_path)

    stream = stream_pipeline.stream_pages(spark, pages_path, max_files_per_trigger=1)
    men = mentions.run(extract.run(stream).select("url", "text"), None, balance=False)
    out = stateful.domain_mention_state(men)
    q = (
        out.writeStream.format("memory").queryName("t_state")
        .outputMode("update").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    # last update per domain = cumulative total
    got = (
        spark.table("t_state")
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
