"""Independent in-memory BM25 oracle for conformance tests.

Plain Python dicts, no shared code with the engine's index/scoring path
(only the analyzer is shared — analyzer identity is itself pinned by
its own golden tests).  Mirrors what the OpenSearch backend computed
for the reference: single-shard exact global statistics
(``/root/reference/common.py:6``), Lucene BM25 with k1=1.2, b=0.75,
ties broken by ascending doc id.  SURVEY §5's "query-conformance
oracle".
"""

from __future__ import annotations

import math

from ..functions.analyzer import Analyzer

__all__ = ["MemoryBM25"]


class MemoryBM25:
    def __init__(self, chain: str = "english", k1: float = 1.2, b: float = 0.75):
        self.analyzer = Analyzer(chain)
        self.k1, self.b = k1, b
        self.postings: dict[str, dict[int, int]] = {}
        self.dl: dict[int, int] = {}

    def add(self, doc_id: int, text: str) -> None:
        toks = self.analyzer(text or "")
        self.dl[doc_id] = len(toks)
        for t in toks:
            self.postings.setdefault(t, {}).setdefault(doc_id, 0)
            self.postings[t][doc_id] += 1

    @property
    def n_docs(self) -> int:
        return len(self.dl)

    @property
    def avgdl(self) -> float:
        docs_with = [v for v in self.dl.values() if v > 0]
        total = sum(self.dl.values())
        return total / len(docs_with) if docs_with else 1.0

    def search(self, query: str, k: int = 10) -> list[tuple[int, float]]:
        terms = self.analyzer(query)
        n, avgdl = self.n_docs, self.avgdl
        scores: dict[int, float] = {}
        for t in terms:
            plist = self.postings.get(t)
            if not plist:
                continue
            idf = math.log(1.0 + (n - len(plist) + 0.5) / (len(plist) + 0.5))
            for doc, tf in plist.items():
                dl = self.dl[doc]
                scores[doc] = scores.get(doc, 0.0) + idf * tf / (
                    tf + self.k1 * (1 - self.b + self.b * dl / avgdl)
                )
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        return ranked[:k]
