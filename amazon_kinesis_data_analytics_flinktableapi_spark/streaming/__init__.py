"""Structured Streaming layer: watermarks, the reference pipeline, windowed
aggregations, stateful ops, and the file-replay test harness."""
