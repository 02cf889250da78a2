"""Reciprocal Rank Fusion (query/hybrid.py) — the fusion rule's
contract, independent of the retrieval legs."""


def test_rrf_fuse_known_values():
    from docs_indexer_ray.query.hybrid import rrf_fuse

    lex = [(5, 9.0), (3, 8.0), (7, 7.0)]
    sem = [(3, 0.9), (9, 0.8), (5, 0.7)]
    fused = rrf_fuse([lex, sem], k=4, c=60)
    # doc 3: 1/62 + 1/61; doc 5: 1/61 + 1/63; doc 7: 1/63; doc 9: 1/62
    want = {
        3: 1 / 62 + 1 / 61,
        5: 1 / 61 + 1 / 63,
        7: 1 / 63,
        9: 1 / 62,
    }
    assert dict(fused) == want
    # order: rrf desc, doc asc — 3 > 5 > 9 > 7
    assert [d for d, _ in fused] == [3, 5, 9, 7]


def test_rrf_fuse_window_ties_and_k():
    from docs_indexer_ray.query.hybrid import rrf_fuse

    # window caps each leg's contribution depth
    lex = [(1, 0.0), (2, 0.0), (3, 0.0)]
    sem = [(4, 0.0), (5, 0.0), (6, 0.0)]
    fused = rrf_fuse([lex, sem], k=10, c=60, window=2)
    assert {d for d, _ in fused} == {1, 2, 4, 5}
    # docs at the same rank in different legs tie on score → doc asc
    assert [d for d, _ in fused] == [1, 4, 2, 5]
    # k caps the output
    assert len(rrf_fuse([lex, sem], k=3, c=60)) == 3
    # scores from the legs are ignored (rank fusion): scaling them
    # changes nothing
    scaled = [(d, s * 1e6) for d, s in lex]
    assert rrf_fuse([scaled, sem], k=10) == rrf_fuse([lex, sem], k=10)
    assert rrf_fuse([], k=5) == []
    assert rrf_fuse([[]], k=5) == []
