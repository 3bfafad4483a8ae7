"""DataFrame-level operators. Native Column expressions wherever exact;
Arrow-vectorized pandas UDFs only for offset-bearing regex / sequential
span policies / model inference (SURVEY.md §2.13 contract: no per-row
Python outside Arrow batches)."""
