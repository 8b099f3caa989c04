"""Cross-cutting utilities: visualization, profiling."""
