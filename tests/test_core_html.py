"""Pinned HTML→text extraction behavior (the byte-identity invariant's spec)."""

from __future__ import annotations

from x5_ner_spark.core.html_text import extract_text


def test_basic_block_structure():
    html = b"<html><head><title>T</title></head><body><p>a</p><p>b</p></body></html>"
    assert extract_text(html) == "T\na\nb"


def test_script_style_comments_dropped():
    html = "<body><script>var x=1;</script><style>.a{}</style><!-- hi --><p>ok</p></body>"
    assert extract_text(html) == "ok"


def test_entities_and_whitespace():
    html = "<p>a &amp; b&nbsp;c</p>\n\n<p>  d   e  </p>"
    assert extract_text(html) == "a & b\xa0c\nd e"


def test_inline_tags_no_break():
    assert extract_text("<p><b>мо</b>локо 3,2%</p>") == "молоко 3,2%"


def test_bytes_and_str_and_none_agree():
    s = "<p>молоко</p>"
    assert extract_text(s) == extract_text(s.encode()) == "молоко"
    assert extract_text(None) == ""
    assert extract_text(b"") == ""


def test_deterministic_byte_identity():
    html = ("<div>Сок  &quot;Добрый&quot;<br>1 л</div>" * 3).encode()
    assert extract_text(html) == extract_text(html)
    assert extract_text(html) == 'Сок "Добрый"\n1 л\nСок "Добрый"\n1 л\nСок "Добрый"\n1 л'
