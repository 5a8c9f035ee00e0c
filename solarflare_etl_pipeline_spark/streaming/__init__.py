"""Structured Streaming operators: event-time windows, watermark dedup, custom state."""
