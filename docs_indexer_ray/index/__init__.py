"""Inverted-index build: postings shuffle, segment encode, manifest."""
