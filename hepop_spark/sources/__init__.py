"""Ingest sources: HEP v3 decapsulation, InfluxDB Line Protocol parsing,
and landing-zone helpers for Structured Streaming."""
