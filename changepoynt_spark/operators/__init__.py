"""Spark-side operators: scoring, rollups, window ops, dedup, similarity,
text analysis, multimodal plumbing."""
