"""Structured Streaming surface (SURVEY.md §2.13).

The reference's only online path is a one-query-at-a-time FastAPI endpoint
(service/app.py:37-45); our batch stages are pure plan functions, so the
streaming engine REUSES them unchanged: readStream → the same
extract/mentions/triples transformations → writeStream (append). Stateful
variants (windowed mention counts with watermarks) live here too.
"""
