"""Streaming: incremental ingestion of pages via Structured Streaming."""
