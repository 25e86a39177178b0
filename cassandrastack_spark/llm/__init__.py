"""LLM-data-pipeline operators (the north-star extension set): dedup,
similarity search, text analysis, multimodal column plumbing — each
designed as distributed DataFrame compositions that survive a 100 TB
corpus (bucket-joins instead of cross-joins, Arrow-batched Pandas UDFs
only where expressions can't do the math)."""
