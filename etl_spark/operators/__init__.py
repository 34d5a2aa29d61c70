"""DataFrame operators: CDC materialization, as-of lookups, dedup,
similarity search, text analysis, multimodal plumbing."""
