"""Storage lifecycle: time-partitioned parquet layout + compaction ladder,
replacing the reference's hand-rolled WAL-sequence files and metadata.json
zone maps (hepop.js:114-132, :245-276) with partition directories and
parquet footer statistics."""
