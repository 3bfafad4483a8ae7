"""Property-based invariants for the quality-classifier featurization
(hypothesis): the native Column expression and the python twin must agree
for ANY unicode text, and the sparse gradient kernel must equal the dense
one for any bucket-set structure. Golden cases can't cover these."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from x5_ner_spark.operators import quality_train as qt

# valid non-surrogate unicode incl. the split char, digits, cyrillic, CJK,
# combining marks, zero-width chars — everything a web crawl throws at it
text_st = st.text(
    alphabet=st.characters(
        codec="utf-8", exclude_categories=("Cs",), include_characters=" "
    ),
    min_size=0,
    max_size=80,
)


def _twin(text: str, dim: int, ngrams: int) -> set[int]:
    toks = [w for w in (text or "").lower().split(" ") if w]
    buckets = {qt.hash_bucket(t, dim) for t in toks}
    if ngrams >= 2:
        buckets |= {
            qt.hash_bucket(f"{a} {b}", dim) for a, b in zip(toks, toks[1:])
        }
    return buckets


@pytest.mark.parametrize("ngrams", [1, 2])
@given(texts=st.lists(text_st, min_size=1, max_size=20))
@settings(max_examples=6, deadline=None)
def test_bucket_set_col_twin_property(spark, ngrams, texts):
    df = spark.createDataFrame([(t,) for t in texts], ["text"])
    rows = df.select(
        "text", qt.bucket_set_col("text", 512, ngrams=ngrams).alias("bk")
    ).collect()
    assert len(rows) == len(texts)
    for r in rows:
        want = _twin(r["text"], 512, ngrams)
        got = set(r["bk"])
        assert got == want, (r["text"], sorted(got), sorted(want))
        # the Column must also emit no duplicates (presence semantics)
        assert len(r["bk"]) == len(got)


bucket_row_st = st.lists(st.integers(0, 31), min_size=0, max_size=10).map(
    lambda xs: sorted(set(xs))
)


@given(
    sets=st.lists(bucket_row_st, min_size=1, max_size=30),
    seed=st.integers(0, 2**31 - 1),
)
@settings(max_examples=100, deadline=None)
def test_sparse_equals_dense_grads_property(sets, seed):
    rng = np.random.RandomState(seed)
    n, dim = len(sets), 32
    y = (rng.rand(n) > 0.5).astype(np.float64)
    w = rng.randn(dim)
    b = float(rng.randn())
    x = np.zeros((n, dim))
    for i, s in enumerate(sets):
        x[i, list(s)] = 1.0
    loss_d, gw_d, gb_d = qt._loss_and_grads(w, b, x, y)
    lens = np.fromiter((len(s) for s in sets), dtype=np.int64, count=n)
    flat = (
        np.concatenate([np.asarray(s, dtype=np.int64) for s in sets if s])
        if any(sets)
        else np.empty(0, dtype=np.int64)
    )
    loss_s, gw_s, gb_s = qt._sparse_loss_and_grads(w, b, flat, lens, y)
    assert loss_s == pytest.approx(loss_d, rel=1e-12, abs=1e-12)
    assert gb_s == pytest.approx(gb_d, rel=1e-12, abs=1e-12)
    np.testing.assert_allclose(gw_s, gw_d, rtol=1e-12, atol=1e-14)
