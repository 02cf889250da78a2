"""Query engine: segment reader, BM25 scoring, block-max WAND top-k."""
