"""Ray Data stages: batch-transform callables and shuffle helpers."""
