"""Structured Streaming surface.

The reference is strictly batch (SURVEY §2.9) — its "incremental" mode
re-reads the last N daily partitions.  This package is the documented
extension: the same event schema consumed as a stream, with watermarked
tumbling-window rollups and a custom stateful operator."""
