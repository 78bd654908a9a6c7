"""Composed operators beyond plain SQL: multimodal binary-column pipelines
and LSH-bucketed similarity search (the 100 TB scale paths for the judged
brute-force baselines in queries/llm.py)."""
