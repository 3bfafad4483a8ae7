"""Readers / writers (SURVEY.md §2.1)."""
