"""Structured Streaming jobs: incremental parse/tokenize, watermarked
windowed aggregation, stateful sessionization."""
