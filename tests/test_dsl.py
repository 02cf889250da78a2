"""OpenSearch JSON query DSL (query/dsl.py): lowering onto the
query_string AST, equivalence with the mini-language on every backend,
and the POST /_search body interface."""

import json
import urllib.error
import urllib.parse
import urllib.request

import pytest


@pytest.fixture(scope="module")
def built(ray_session, tmp_path_factory):
    import ray.data

    from docs_indexer_ray.index.build import build_index
    from docs_indexer_ray.query.reader import IndexReader
    from docs_indexer_ray.synth import rich_pages_table

    root = str(tmp_path_factory.mktemp("dslidx") / "idx")
    build_index(
        ray.data.from_arrow(rich_pages_table(90, dup_every=0)),
        root,
        fingerprint="dsl",
        num_parts=4,
        chain="simple",
        field="body",
        store_positions=True,
    )
    return IndexReader(root)


def _an():
    from docs_indexer_ray.functions.analyzer import Analyzer

    return Analyzer("simple")


def test_dsl_lowering_shapes():
    from docs_indexer_ray.query.dsl import DslError, dsl_to_node
    from docs_indexer_ray.query.qstring import (
        _Bool,
        _Fuzzy,
        _Phrase,
        _Term,
        _Wildcard,
    )

    an = _an()
    # match OR (default) / AND / single-token / fuzziness / boost
    n = dsl_to_node({"match": {"body": "node pools"}}, an)
    assert isinstance(n, _Bool) and [t.term for t in n.should] == ["node", "pools"]
    n = dsl_to_node(
        {"match": {"body": {"query": "node pools", "operator": "and"}}}, an
    )
    assert isinstance(n, _Bool) and len(n.must) == 2 and not n.should
    n = dsl_to_node({"match": {"body": {"query": "node", "boost": 2.0}}}, an)
    assert isinstance(n, _Term) and n.boost == 2.0
    n = dsl_to_node(
        {"match": {"body": {"query": "node pools", "fuzziness": 1}}}, an
    )
    assert all(isinstance(c, _Fuzzy) and c.max_edits == 1 for c in n.should)
    # match_phrase with slop; single-token phrase degrades to a term
    n = dsl_to_node(
        {"match_phrase": {"body": {"query": "node pools", "slop": 2}}}, an
    )
    assert isinstance(n, _Phrase) and n.slop == 2
    assert isinstance(dsl_to_node({"match_phrase": {"body": "node"}}, an), _Term)
    # term is NOT analyzed (keyword semantics), only lowercased
    n = dsl_to_node({"term": {"body": {"value": "Nodes"}}}, an)
    assert isinstance(n, _Term) and n.term == "nodes"  # no stemming/analysis
    # terms → should-of-terms
    n = dsl_to_node({"terms": {"body": ["a", "B"]}}, an)
    assert [t.term for t in n.should] == ["a", "b"]
    # fuzzy AUTO / int; wildcard; prefix appends *
    assert dsl_to_node({"fuzzy": {"body": {"value": "noode"}}}, an).max_edits is None
    assert dsl_to_node(
        {"fuzzy": {"body": {"value": "noode", "fuzziness": 2}}}, an
    ).max_edits == 2
    assert dsl_to_node({"wildcard": {"body": "nod*"}}, an).pattern == "nod*"
    w = dsl_to_node({"prefix": {"body": "nod"}}, an)
    assert isinstance(w, _Wildcard) and w.pattern == "nod*"
    # bool: filter lowers to must; nesting; empty bool → None
    n = dsl_to_node(
        {"bool": {
            "must": {"match": {"body": "node"}},
            "filter": [{"term": {"body": "pools"}}],
            "must_not": [{"match": {"body": "quota"}}],
            "should": [{"match_phrase": {"body": "node pools"}}],
        }},
        an,
    )
    assert len(n.must) == 2 and len(n.must_not) == 1 and len(n.should) == 1
    assert dsl_to_node({"bool": {"must": []}}, an) is None
    # embedded query_string
    n = dsl_to_node({"query_string": {"query": "+node -quota"}}, an)
    assert isinstance(n, _Bool)
    # range: stored-field predicate leaf (gte/gt/lte/lt, boost)
    from docs_indexer_ray.query.qstring import _Range

    n = dsl_to_node(
        {"range": {"warc_ts": {"gte": "2025-01-01T00:00:00",
                               "lt": "2025-06-01T00:00:00", "boost": 2.0}}},
        an,
    )
    assert isinstance(n, _Range) and n.col == "warc_ts" and n.boost == 2.0
    assert sorted(op for op, _ in n.bounds) == ["<", ">="]
    with pytest.raises(DslError):
        dsl_to_node({"range": {"warc_ts": {"eq": 3}}}, an)
    with pytest.raises(DslError):
        dsl_to_node({"range": {"warc_ts": "2025"}}, an)
    # errors: unsupported clause / malformed shapes
    with pytest.raises(DslError):
        dsl_to_node({"regexp": {"body": "n.*"}}, an)
    with pytest.raises(DslError):
        dsl_to_node({"match": {"a": "x", "b": "y"}}, an)
    with pytest.raises(DslError):
        dsl_to_node({"bool": {"nope": []}}, an)
    with pytest.raises(DslError):
        dsl_to_node({"match": {"body": {"boost": 2.0}}}, an)  # no 'query'


DSL_VS_QS = [
    ({"match": {"body": "node pools quota"}}, "node pools quota"),
    (
        {"match": {"body": {"query": "node pools", "operator": "and"}}},
        "node AND pools",
    ),
    ({"match_phrase": {"body": "node pools"}}, '"node pools"'),
    (
        {"match_phrase": {"body": {"query": "node pools", "slop": 1}}},
        '"node pools"~1',
    ),
    ({"fuzzy": {"body": {"value": "noode", "fuzziness": 1}}}, "noode~1"),
    ({"wildcard": {"body": "nod*"}}, "nod*"),
    (
        {"bool": {
            "must": [{"match": {"body": "node"}}],
            "must_not": [{"match": {"body": "quota"}}],
            "should": [{"match_phrase": {"body": "node pools"}}],
        }},
        '+node -quota "node pools"',
    ),
    (
        {"query_string": {"query": '(node OR quota) AND NOT namespace'}},
        "(node OR quota) AND NOT namespace",
    ),
]


def test_dsl_ranking_equals_query_string(built):
    """Each DSL body ranks identically to its query_string spelling —
    same AST, same evaluation."""
    from docs_indexer_ray.query.qstring import query_string_topk

    for dsl, qs in DSL_VS_QS:
        got = query_string_topk(built, dsl, k=12)
        want = query_string_topk(built, qs, k=12)
        assert got == want, (dsl, qs)


def test_dsl_on_the_sharded_fleet(built, ray_session):
    """A DSL dict rides to the shard actors like a string: fleet
    results ≡ local for rank, count and facets."""
    import os

    from docs_indexer_ray.query.qstring import query_string_topk
    from docs_indexer_ray.query.served import ShardedQueryService

    root = os.path.dirname(built.index_dir)
    svc = ShardedQueryService(root, n_shards=3, chain=built.chain)
    try:
        for dsl, qs in DSL_VS_QS:
            assert svc.query_string(dsl, k=12) == query_string_topk(
                built, qs, k=12
            ), (dsl, qs)
        dsl = DSL_VS_QS[0][0]
        assert svc.count(dsl, syntax=True) == svc.count(
            DSL_VS_QS[0][1], syntax=True
        )
    finally:
        svc.shutdown()


def test_dsl_range_filter_local_and_sharded(built, ray_session):
    """``range`` over the stored ``warc_ts`` column: bool(must match +
    filter range) ranks exactly the BM25 order restricted to the
    allowed window — on the local reader AND the fleet (each shard
    builds only ITS slice of the mask via reader.stored_mask)."""
    import datetime as _dt
    import os

    import pyarrow.dataset as pads

    from docs_indexer_ray.query.bm25 import score_topk
    from docs_indexer_ray.query.qstring import query_string_topk
    from docs_indexer_ray.query.served import ShardedQueryService

    docs = pads.dataset(
        os.path.join(built.index_dir, "docs"), partitioning="hive"
    ).to_table(columns=["doc_id", "warc_ts"])
    ts = sorted(docs["warc_ts"].to_pylist())
    lo_cut, hi_cut = ts[len(ts) // 4], ts[3 * len(ts) // 4]
    allowed = {
        int(d)
        for d, t in zip(docs["doc_id"].to_pylist(), docs["warc_ts"].to_pylist())
        if lo_cut <= t < hi_cut
    }
    assert 0 < len(allowed) < docs.num_rows

    # independent reference: full BM25 ranking filtered by the window
    full = score_topk(built, ["node"], k=built.n_docs)
    want_ids = [d for d, _ in full if d in allowed][:12]

    dsl = {"bool": {
        "must": [{"match": {"body": "node"}}],
        "filter": [{"range": {"warc_ts": {
            "gte": lo_cut.isoformat(), "lt": hi_cut.isoformat()}}}],
    }}
    got = query_string_topk(built, dsl, k=12)
    assert [d for d, _ in got] == want_ids
    # the filter clause scores a constant +1.0 on every hit (filter ≡
    # must here — documented); order is unchanged by a constant
    assert all(s > 1.0 for _, s in got)

    root = os.path.dirname(built.index_dir)
    svc = ShardedQueryService(root, n_shards=3, chain=built.chain)
    try:
        assert [d for d, _ in svc.query_string(dsl, k=12)] == want_ids
        assert svc.count(dsl, syntax=True) == len(
            {d for d, _ in full} & allowed
        )
        # memoized mask: second query reuses each shard's slice
        assert [d for d, _ in svc.query_string(dsl, k=12)] == want_ids
    finally:
        svc.shutdown()

    # a pure range query matches the window with constant scores
    got = query_string_topk(
        built,
        {"range": {"warc_ts": {"gte": lo_cut.isoformat(),
                               "lt": hi_cut.isoformat()}}},
        k=len(allowed) + 5,
    )
    assert {d for d, _ in got} == allowed
    assert all(s == 1.0 for _, s in got)
    assert isinstance(lo_cut, _dt.datetime)


def _req(port: int, path: str, body: dict | None = None, **params):
    url = f"http://127.0.0.1:{port}{path}"
    if params:
        url += "?" + urllib.parse.urlencode(params)
    data = json.dumps(body).encode() if body is not None else None
    try:
        with urllib.request.urlopen(url, data=data) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_http_post_search_dsl(built, ray_session):
    """POST /_search with a JSON body on both backends: DSL query ≡
    the GET query_string spelling; size/from/search_after/_source/
    highlight/aggs map through; aggs keyed by agg NAME; bad DSL → 400."""
    import os

    from docs_indexer_ray.serve_http import SearchServer

    root = os.path.dirname(built.index_dir)
    for backend, kw in (("local", {}), ("sharded", {"n_shards": 3})):
        srv = SearchServer(root, backend=backend, **kw).start()
        try:
            body = {
                "query": {"bool": {
                    "must": [{"match": {"body": "node"}}],
                    "should": [{"match_phrase": {"body": "node pools"}}],
                }},
                "size": 5,
                "_source": ["url"],
                "highlight": {"fields": {"body": {}}},
                "aggs": {"by_lang": {"terms": {"field": "lang", "size": 3}}},
            }
            code, post = _req(srv.port, "/_search", body=body)
            assert code == 200, post
            code, get = _req(
                srv.port, "/_search", q='+node "node pools"', syntax=1,
                k=5, fields="url", highlight="body", agg_terms="lang",
                agg_size=3,
            )
            assert post["hits"] == get["hits"]
            # aggs re-keyed by the agg name, values identical
            assert post["aggregations"]["by_lang"] == \
                get["aggregations"]["lang"]

            # body pagination: from/size slice, search_after continues
            big = _req(srv.port, "/_search",
                       body={"query": body["query"], "size": 9})[1]
            ids = [h["_id"] for h in big["hits"]["hits"]]
            p2 = _req(srv.port, "/_search",
                      body={"query": body["query"], "size": 3, "from": 3})[1]
            assert [h["_id"] for h in p2["hits"]["hits"]] == ids[3:6]
            cur = big["hits"]["hits"][5]["sort"]
            p3 = _req(srv.port, "/_search",
                      body={"query": body["query"], "size": 3,
                            "search_after": cur})[1]
            assert [h["_id"] for h in p3["hits"]["hits"]] == ids[6:9]

            # _msearch accepts DSL lines
            nd = json.dumps({"query": body["query"], "k": 3,
                             "fields": ["url"]}) + "\n"
            req = urllib.request.Request(
                f"http://127.0.0.1:{srv.port}/_msearch",
                data=nd.encode(), method="POST",
            )
            with urllib.request.urlopen(req) as r:
                ms = json.loads(r.read())
            assert [h["_id"] for h in ms["responses"][0]["hits"]["hits"]] \
                == ids[:3]

            code, err = _req(srv.port, "/_search",
                             body={"query": {"regexp": {"body": "n.*"}}})
            assert code == 400 and err["error"]["type"] == "DslError"
        finally:
            srv.stop()
