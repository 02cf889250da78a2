from .export import read_manifest, write_corpus_shards

__all__ = ["write_corpus_shards", "read_manifest"]
