"""Deterministic HTML → text extraction (the per-row byte-identity invariant).

BASELINE.json pins "byte-identical extracted text per url": the extractor is
ONE pure function, used both by the pandas/pytest oracle and by the Arrow UDF
in pipeline/extract.py, so the invariant holds by construction. The reference
repo has no HTML stage (its input is already plain queries — SURVEY.md §1.4);
this behavior is therefore pinned HERE as the spec:

1. drop <script>/<style>/<!-- comments --> including content;
2. block-level tags (p, div, br, li, tr, h1-h6, title, ...) → '\n',
   all other tags → '' (inline);
3. decode HTML entities (html.unescape);
4. collapse runs of spaces/tabs to one space, strip each line,
   collapse 2+ newlines to one, strip the whole result.
"""

from __future__ import annotations

import html as _html
import re

_RE_DROP = re.compile(
    r"<(script|style)\b[^>]*>.*?</\1\s*>|<!--.*?-->",
    re.IGNORECASE | re.DOTALL,
)
_BLOCK_TAGS = (
    "p|div|br|li|ul|ol|tr|td|th|table|h[1-6]|title|head|body|html|section|"
    "article|header|footer|blockquote|pre|hr|nav|aside|form"
)
_RE_BLOCK = re.compile(rf"</?(?:{_BLOCK_TAGS})\b[^>]*/?>", re.IGNORECASE)
_RE_TAG = re.compile(r"<[^>]+>")
_RE_SPACES = re.compile(r"[ \t\r\f\v]+")
_RE_NL_SPACE = re.compile(r" ?\n ?")
_RE_MULTI_NL = re.compile(r"\n{2,}")


def extract_text(html_bytes: bytes | str | None) -> str:
    """Pure, pinned HTML-to-text extraction. bytes are decoded utf-8/replace."""
    if html_bytes is None:
        return ""
    if isinstance(html_bytes, (bytes, bytearray)):
        raw = bytes(html_bytes).decode("utf-8", errors="replace")
    else:
        raw = html_bytes
    s = _RE_DROP.sub("", raw)
    s = _RE_BLOCK.sub("\n", s)
    s = _RE_TAG.sub("", s)
    s = _html.unescape(s)
    s = _RE_SPACES.sub(" ", s)
    s = _RE_NL_SPACE.sub("\n", s)
    s = _RE_MULTI_NL.sub("\n", s)
    return s.strip()
