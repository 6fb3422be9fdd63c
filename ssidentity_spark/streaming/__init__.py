"""Structured Streaming surface (SURVEY §2.8 T1-T9): the reference's
unbounded capture loop (/root/reference/ssidentity.c:81-114) restated as
readStream → parse → watermark → windowed/stateful operators → sinks."""
