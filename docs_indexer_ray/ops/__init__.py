"""Large-scale training-data operators: dedup, similarity, text stats."""
