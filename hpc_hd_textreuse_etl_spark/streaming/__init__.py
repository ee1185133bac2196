"""Structured Streaming surface (additive — the reference is pure batch;
SURVEY §2.11 verified no readStream/writeStream anywhere)."""
