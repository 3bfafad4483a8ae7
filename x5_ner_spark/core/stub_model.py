"""Deterministic stand-in for the transformer token classifier.

The reference's mention detector is an XLM-R(+CRF) checkpoint
(/root/reference/ner/infer.py:140-189). Shipping model weights is out of
scope for this sandbox (SURVEY.md §7.4 item 6), so the engine's inference
stage is parameterized by a ``prob_fn``; this module provides the pinned
deterministic default used by both the Spark UDF and the pytest oracle:
per-word class probabilities derived from md5 of the normalized token plus
transparent heuristic biases. Swapping in a real checkpoint only changes
``prob_fn`` inside the same iterator pandas UDF (operators/mention_detect.py).
"""

from __future__ import annotations

import hashlib
import math

from .cascade import STOPWORDS, TYPE_HINTS
from .spans import BIO_TAGS
from .textnorm import is_pure_latin, norm_token_simple

_N = len(BIO_TAGS)
_IDX = {t: i for i, t in enumerate(BIO_TAGS)}


def _hash_floats(key: str, n: int) -> list[float]:
    """n floats in [0, 1), deterministic in (key, i)."""
    out = []
    for i in range(n):
        h = hashlib.md5(f"{key}\x00{i}".encode("utf-8")).digest()
        out.append(int.from_bytes(h[:8], "big") / 2**64)
    return out


def word_probabilities(token: str, position: int = 0) -> list[float]:
    """Softmax over 9 BIO classes; pure function of (token text, position).

    Heuristic logit shape (documented, frozen):
    - TYPE_HINTS member           → strong B-TYPE (I-TYPE if position > 0)
    - stopword / digits-only      → strong O
    - pure-Latin, length ≥ 3      → strong B-BRAND
    - otherwise                   → mild O prior + hash noise
    """
    tok = norm_token_simple(token)
    base = _hash_floats(tok, _N)
    logits = [b * 0.5 for b in base]  # small deterministic noise
    logits[_IDX["O"]] += 1.0
    if not tok or tok.isdigit() or tok in STOPWORDS:
        logits[_IDX["O"]] += 3.0
    elif tok in TYPE_HINTS:
        tgt = "I-TYPE" if position > 0 else "B-TYPE"
        logits[_IDX[tgt]] += 4.0
    elif is_pure_latin(tok) and len(tok) >= 3:
        logits[_IDX["B-BRAND"]] += 3.5
    m = max(logits)
    exps = [math.exp(x - m) for x in logits]
    z = sum(exps)
    return [x / z for x in exps]
