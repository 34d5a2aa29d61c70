"""Structured Streaming pipeline: sources → foreachBatch → sinks."""
