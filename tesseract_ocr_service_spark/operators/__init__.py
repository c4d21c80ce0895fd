"""Spark-level operators: the extraction pipeline plus the large-scale
training-data operations (dedup, similarity search, text analysis,
multimodal plumbing)."""
