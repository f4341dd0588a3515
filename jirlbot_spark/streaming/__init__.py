"""Structured Streaming wrapper around the batch crawl loop."""
