"""Structured Streaming surface (SURVEY.md §2.11): the reference's polling
daemons + anti-join incremental discovery, re-expressed as availableNow
micro-batch streams."""
