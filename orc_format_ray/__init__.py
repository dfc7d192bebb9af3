"""orc_format_ray — a Ray-Data-native per-column lightweight-compression engine.

Built from scratch (NOT a port) with the query/data-processing capabilities of
the reference `blkerby/orc-format` ORC writer (/root/reference), re-expressed
Ray-Data-first: `ray.data.Dataset` pipelines, zero-copy Arrow batches, actor
pools for stateful encoder stages, explicit skew-aware partitioning, and
per-partition lineage manifests for checkpoint/resume.
"""

__version__ = "0.1.0"
