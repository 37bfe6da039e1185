"""Structured Streaming variants of the rollup layer."""
