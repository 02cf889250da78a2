"""Regression pins for the round-3 serving-surface review batch:
multi-agg bodies, the DSL/parser 400-totality contract (TypeError /
AttributeError / RecursionError never escape as 500s), sort-spec
_id tie-breaks, rank_eval k=0, scroll highlight carry-over, string
highlight tags, and the one-eval /_search total."""

import json
import urllib.error
import urllib.parse
import urllib.request

import pytest


@pytest.fixture(scope="module")
def root(ray_session, tmp_path_factory):
    import ray.data

    from docs_indexer_ray.index.build import build_index
    from docs_indexer_ray.synth import rich_pages_table

    root = str(tmp_path_factory.mktemp("r3bidx") / "idx")
    build_index(
        ray.data.from_arrow(rich_pages_table(90, dup_every=0)),
        root,
        fingerprint="r3b",
        num_parts=4,
        chain="simple",
        field="body",
    )
    return root


@pytest.fixture(scope="module")
def srv(root, ray_session):
    from docs_indexer_ray.serve_http import SearchServer

    server = SearchServer(root, backend="local").start()
    yield server
    server.stop()


def _req(port, path, body=None, method=None, raw=None, **params):
    url = f"http://127.0.0.1:{port}{path}"
    if params:
        url += "?" + urllib.parse.urlencode(params)
    data = raw if raw is not None else (
        json.dumps(body).encode() if body is not None else None
    )
    req = urllib.request.Request(url, data=data, method=method)
    try:
        with urllib.request.urlopen(req) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_multiple_named_aggs_no_collision(srv):
    # two terms aggs + a stats agg on one of the SAME fields: all three
    # come back, keyed by NAME (slot-per-kind used to silently drop /
    # overwrite all but the last)
    code, out = _req(srv.port, "/_search", method="POST", body={
        "query": {"match": {"body": "node"}},
        "size": 0,
        "aggs": {
            "by_lang": {"terms": {"field": "lang"}},
            "by_crumb": {"terms": {"field": "breadcrumb_1", "size": 3}},
            "ts_stats": {"stats": {"field": "warc_ts"}},
        },
    })
    assert code == 200, out
    aggs = out["aggregations"]
    assert set(aggs) == {"by_lang", "by_crumb", "ts_stats"}
    assert aggs["by_lang"]["buckets"] and aggs["by_crumb"]["buckets"]
    assert len(aggs["by_crumb"]["buckets"]) <= 3
    assert aggs["ts_stats"]["count"] > 0 and "avg" in aggs["ts_stats"]

    # the single-agg POST shape matches the GET shorthand bit-exactly
    code, one = _req(srv.port, "/_search", method="POST", body={
        "query": {"match": {"body": "node"}}, "size": 0,
        "aggs": {"l": {"terms": {"field": "lang"}}},
    })
    code, get = _req(srv.port, "/_search", q="node", size=0,
                     agg_terms="lang")
    assert one["aggregations"]["l"] == get["aggregations"]["lang"]


@pytest.mark.parametrize("query", [
    {"ids": {"values": [[1]]}},                      # int([1]) TypeError
    {"bool": {"must": [], "boost": []}},             # float([]) TypeError
    {"query_string": {"query": "x", "default_operator": 1}},  # .lower()
    {"span_first": {"match": {"span_term": {"f": "x"}}, "end": None}},
    {"match": {"body": {"query": "x", "boost": {}}}},
    {"fuzzy": {"body": {"value": "x", "fuzziness": []}}},
])
def test_malformed_clause_values_are_400s(srv, query):
    code, out = _req(srv.port, "/_search", method="POST",
                     body={"query": query})
    assert code == 400, (query, out)
    # and _validate/query reports them as invalid instead of erroring
    code, out = _req(srv.port, "/_validate/query", method="POST",
                     body={"query": query})
    assert code == 200 and out["valid"] is False, (query, out)


def test_deep_nesting_is_400_never_500(srv):
    # qstring parser: 500 unbalanced parens → QueryStringError 400
    code, out = _req(srv.port, "/_search", q="(" * 500 + "x", syntax="1")
    assert code == 400, out
    # DSL: 2000-deep bool body — json.loads or the lowering hits the
    # recursion guard; either way the contract is 400
    raw = (b'{"query":' + b'{"bool":{"must":' * 2000
           + b'{"match_all":{}}' + b"}}" * 2000 + b"}")
    code, out = _req(srv.port, "/_search", method="POST", raw=raw)
    assert code == 400, out
    # a deep-but-sane body actually runs
    depth = 30
    q = {"match": {"body": "node"}}
    for _ in range(depth):
        q = {"bool": {"must": q}}
    code, out = _req(srv.port, "/_search", method="POST", body={"query": q})
    assert code == 200 and out["hits"]["hits"], out


def test_simple_query_string_total_on_deep_parens():
    from docs_indexer_ray.query.simpleqs import parse_simple_query_string

    analyzer = lambda s: [t for t in s.lower().split() if t]  # noqa: E731
    # 1000 unclosed groups: TOTAL contract — no RecursionError; the
    # inner word still parses
    node = parse_simple_query_string("(" * 1000 + "hello", analyzer)
    from docs_indexer_ray.query.qstring import _Term

    assert isinstance(node, _Term) and node.term == "hello"
    # balanced but beyond the cap: still total, still finds the word
    node = parse_simple_query_string("(" * 200 + "hello" + ")" * 200, analyzer)
    assert isinstance(node, _Term) and node.term == "hello"


def test_sort_spec_with_dict_id_tiebreak(srv):
    # the canonical OpenSearch ladder [{"warc_ts": "desc"}, {"_id":
    # "asc"}] — the dict-form tie-break is redundant (doc-asc is
    # implicit) and must be IGNORED, not refused
    code, out = _req(srv.port, "/_search", method="POST", body={
        "query": {"match": {"body": "node"}},
        "sort": [{"warc_ts": "desc"}, {"_id": "asc"}],
        "size": 5,
    })
    assert code == 200, out
    keys = [h["sort"][0] for h in out["hits"]["hits"]]
    assert keys == sorted(keys, reverse=True) and len(keys) == 5
    # a REAL two-field ladder is still refused loudly
    code, out = _req(srv.port, "/_search", method="POST", body={
        "query": {"match": {"body": "node"}},
        "sort": [{"warc_ts": "desc"}, {"lang": "asc"}],
    })
    assert code == 400, out


def test_rank_eval_k_zero_is_400(srv):
    code, out = _req(srv.port, "/_rank_eval", method="POST", body={
        "requests": [{"id": "q1", "request": {"query": "node"},
                      "ratings": []}],
        "metric": {"precision": {"k": 0}},
    })
    assert code == 400, out


def test_scroll_preserves_highlight_options(srv):
    code, page = _req(
        srv.port, "/_search", q="node", size=3, scroll="1m",
        highlight="body", hl_pre="<b>", hl_post="</b>", hl_width="80",
    )
    assert code == 200, page

    def _snips(p):
        return [h["highlight"]["body"][0] for h in p["hits"]["hits"]]

    assert all("<b>" in s for s in _snips(page))
    code, page2 = _req(srv.port, "/_search/scroll",
                       body={"scroll_id": page["_scroll_id"]})
    assert code == 200 and page2["hits"]["hits"], page2
    # page 2 keeps the custom tags (used to revert to <em>)
    assert all("<b>" in s and "<em>" not in s for s in _snips(page2))


def test_string_highlight_tags_accepted(srv):
    # OpenSearch sends tag LISTS; a bare string must be taken whole,
    # not indexed to its first character
    code, out = _req(srv.port, "/_search", method="POST", body={
        "query": {"match": {"body": "node"}},
        "highlight": {"fields": {"body": {}},
                      "pre_tags": "<b>", "post_tags": "</b>"},
        "size": 3,
    })
    assert code == 200, out
    snips = [h["highlight"]["body"][0] for h in out["hits"]["hits"]]
    assert snips and all("<b>" in s and "</b>" in s for s in snips)


def test_search_total_matches_count_one_eval(srv):
    # /_search total.value (now from the SAME evaluation as the hits)
    # must equal /_count for every query mode
    for params in (
        {"q": "node"},                                   # match-any
        {"q": "node AND pools", "syntax": "1"},          # query_string
        {"q": "node", "sort": "warc_ts:desc"},           # field sort
    ):
        code, s = _req(srv.port, "/_search", size=3, **params)
        assert code == 200, s
        code, c = _req(srv.port, "/_count",
                       **{k: v for k, v in params.items() if k != "sort"})
        assert s["hits"]["total"]["value"] == c["count"], params
