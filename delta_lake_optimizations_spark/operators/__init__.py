"""LLM-training-data-pipeline operators (SURVEY.md §2.9, north-star scope).

Deduplication (exact / MinHash-LSH / SimHash / n-gram Jaccard /
embedding-cosine), similarity search (brute-force + LSH ANN), text
analysis (language-ID, quality scoring, token counting, fingerprinting),
and multimodal binary-column plumbing.
"""
