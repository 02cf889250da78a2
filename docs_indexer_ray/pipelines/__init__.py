"""Assembled pipelines: pages → docs → index → query."""
