"""Large-scale training-data pipeline operators (BASELINE.json north
star): deduplication (exact / MinHash+LSH / SimHash / n-gram Jaccard /
embedding-cosine), similarity search (brute-force + bucketed ANN),
multimodal binary-column plumbing, and the text-analysis functions in
``functions/text.py``.
"""
