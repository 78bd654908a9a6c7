"""Structured Streaming ingest: the reference's UDP/TCP/HTTP -> buffer ->
flush -> parquet pipeline (hepop.js:134-214) re-expressed as
readStream -> transform -> foreachBatch partitioned-parquet sink."""
