"""Scale extensions beyond the NSDb operator surface: deduplication,
similarity search, text analysis, multimodal plumbing — the operations a
large-scale training-data pipeline needs (BASELINE north star)."""
