"""Reusable distributed operators (geo joins, dedup, similarity,
relational helpers, text analysis, multimodal plumbing)."""
