"""Extension operators beyond the reference surface (SURVEY §2-D):
deduplication (exact / MinHash-LSH / SimHash / n-gram Jaccard /
embedding-cosine), similarity search, text analysis, multimodal columns,
event sessionization + as-of join.

Design: each operator is a declarative SQL plan generated per dialect
(`spark` → executed by Catalyst; `duck` → the driver's oracle), so both
sides provably compute identical semantics, including hashing. Catalyst
gets a fully-optimizable plan: shuffles only on the documented keys,
dimension sides broadcastable, no Python in any hot path.
"""
