"""Ray Data pipelines: tokens-table construction, partition-parallel stripe
encoding with lineage/resume, and decode/verify paths."""
