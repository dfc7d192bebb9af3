"""Large-scale training-data operations over Ray Data: text analysis,
deduplication (exact / MinHash-LSH / SimHash / n-gram Jaccard / embedding),
similarity search (brute-force + IVF/PQ ANN), clustering (k-means, PCA,
diversity capping), z-order layout, corpus profiling, reshaping aggregates
(pivot / rollup / grouped quantiles), ingest ETL (JSON extraction, snapshot
diff), BPE tokenizer training/encoding, event analytics (windows, funnel,
cohort retention), mergeable sketches (HLL, Misra-Gries), sampling/packing,
multimodal column plumbing, SQL analytic window functions + per-event
sessionization (pinned-block prefix sums), CDC upsert merge, CUBE grouping
sets, exact per-group COUNT DISTINCT, full-text search (sharded inverted
index + bit-exact BM25), a KLL quantile sketch, regex field
extraction, streaming semi/anti joins, interval-overlap joins, bucketed
layouts with zero-shuffle joins, n-gram decontamination, trigram-LM quality
scoring, PSI drift, robust/OLS/z-score group statistics, quantile transforms,
table checksums, time rollups, and spelling-variant mining."""
