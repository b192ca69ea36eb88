"""Training-data pipeline functions beyond the reference surface:
text analysis, deduplication, similarity search, multimodal plumbing."""
