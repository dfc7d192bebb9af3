"""Large-scale training-data operations over Ray Data: text analysis,
deduplication (exact / MinHash-LSH / SimHash / n-gram Jaccard / embedding),
similarity search (brute-force + IVF ANN), and multimodal column plumbing."""
