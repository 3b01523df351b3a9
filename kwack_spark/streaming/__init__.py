"""Structured Streaming ingest (beyond-parity, SURVEY.md §2.C).

The reference is batch-snapshot only; Structured Streaming makes the same
decode pipeline continuous.
"""
