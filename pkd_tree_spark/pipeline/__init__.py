"""Training-data pipeline operators over the driver's documents/embeddings
tables: text analysis, deduplication (exact / n-gram Jaccard / MinHash-LSH /
SimHash / embedding near-dup), similarity search (brute-force + LSH ANN),
and multimodal (binary media columns with a stubbed decode).

These extend the spatial engine with the operations a large-scale
training-data pipeline needs; every deterministic operator has a DuckDB
oracle in pkd_tree_spark.oracle_pipeline. Floating-point is avoided in all
checked outputs: embeddings are fixed-point-quantized so dot products are
exact int64 (the same determinism discipline as the spatial engine's
quantized coordinates).
"""
