"""Large-scale training-data pipeline operators over the engine's
tables: text analysis, deduplication (exact / MinHash-LSH / SimHash /
n-gram Jaccard), embedding similarity search, and multimodal column
plumbing. All hot paths are JVM-side built-ins; Python appears only as
Arrow-batched ``mapInPandas`` where built-ins cannot express the
semantics (multimodal decode)."""
