"""REST completeness round: stateless scroll, _mget, _field_caps,
_validate/query (serve_http.py)."""

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

    root = str(tmp_path_factory.mktemp("restidx") / "idx")
    build_index(
        ray.data.from_arrow(rich_pages_table(90, dup_every=0)),
        root,
        fingerprint="rest",
        num_parts=4,
        chain="simple",
        field="body",
    )
    return root


def _req(port, path, body=None, method=None, **params):
    url = f"http://127.0.0.1:{port}{path}"
    if params:
        url += "?" + urllib.parse.urlencode(params)
    data = json.dumps(body).encode() if body is not None else None
    req = urllib.request.Request(url, data=data, method=method)
    try:
        with urllib.request.urlopen(req) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_scroll_walk_and_invalidation(root, ray_session):
    from docs_indexer_ray.serve_http import SearchServer

    for backend, kw in (("local", {}), ("sharded", {"n_shards": 3})):
        srv = SearchServer(root, backend=backend, **kw).start()
        try:
            # the reference ranking in one unpaged request
            code, big = _req(srv.port, "/_search", q="node", size=500)
            want = [h["_id"] for h in big["hits"]["hits"]]
            assert len(want) > 14

            # scroll through in pages of 7 — ids concatenate exactly
            code, page = _req(srv.port, "/_search", q="node", size=7,
                              scroll="1m")
            assert code == 200 and "_scroll_id" in page
            seen = [h["_id"] for h in page["hits"]["hits"]]
            sid = page["_scroll_id"]
            while True:
                code, page = _req(srv.port, "/_search/scroll",
                                  body={"scroll_id": sid})
                assert code == 200, page
                hits = page["hits"]["hits"]
                if not hits:
                    break
                seen += [h["_id"] for h in hits]
                sid = page["_scroll_id"]
            assert seen == want
            # the terminal page keeps returning empty (stable id)
            code, again = _req(srv.port, "/_search/scroll",
                               body={"scroll_id": sid})
            assert code == 200 and again["hits"]["hits"] == []

            # SORTED scroll: field order pages concatenate too
            code, page = _req(srv.port, "/_search", q="node", size=9,
                              scroll="1m", sort="warc_ts:desc")
            ssorted = [h["_id"] for h in page["hits"]["hits"]]
            sid = page["_scroll_id"]
            while True:
                code, page = _req(srv.port, "/_search/scroll",
                                  body={"scroll_id": sid})
                hits = page["hits"]["hits"]
                if not hits:
                    break
                ssorted += [h["_id"] for h in hits]
                sid = page["_scroll_id"]
            code, ref = _req(srv.port, "/_search", q="node", size=500,
                             sort="warc_ts:desc")
            assert ssorted == [h["_id"] for h in ref["hits"]["hits"]]

            # malformed id → 400; id from BEFORE a write → context gone
            code, err = _req(srv.port, "/_search/scroll",
                             body={"scroll_id": "not-base64!!"})
            assert code == 400
            code, live = _req(srv.port, "/_search", q="node", size=3,
                              scroll="1m")
            nd = (
                json.dumps({"index": {}}) + "\n"
                + json.dumps({
                    "url": f"https://docs.test/new-scroll-page-{backend}/",
                    "text": "node scroll invalidation page",
                }) + "\n"
            )
            req = urllib.request.Request(
                f"http://127.0.0.1:{srv.port}/_bulk",
                data=nd.encode(), method="POST",
            )
            with urllib.request.urlopen(req) as r:
                assert json.loads(r.read())["errors"] is False
            code, err = _req(srv.port, "/_search/scroll",
                             body={"scroll_id": live["_scroll_id"]})
            assert code == 400
            assert "search_context_missing" in err["error"]["reason"]

            # scroll + from are mutually exclusive
            code, err = _req(srv.port, "/_search", q="node", size=3,
                             scroll="1m", **{"from": "2"})
            assert code == 400
        finally:
            srv.stop()


def test_mget_field_caps_validate(root, ray_session):
    from docs_indexer_ray.serve_http import SearchServer

    srv = SearchServer(root, backend="local").start()
    try:
        code, r = _req(srv.port, "/_mget",
                       body={"ids": [5, 2, 999999, 5],
                             "_source": ["url", "warc_ts"]})
        assert code == 200
        assert [d["_id"] for d in r["docs"]] == [5, 2, 999999, 5]
        assert [d["found"] for d in r["docs"]] == [True, True, False, True]
        assert r["docs"][0]["_source"]["url"].startswith("http")
        assert "T" in r["docs"][0]["_source"]["warc_ts"]  # ISO timestamp
        # duplicate ids fetch once, answer twice
        assert r["docs"][0]["_source"] == r["docs"][3]["_source"]
        code, err = _req(srv.port, "/_mget", body={"ids": []})
        assert code == 400

        code, fc = _req(srv.port, "/_field_caps")
        assert code == 200
        assert fc["fields"]["body"]["text"]["searchable"] is True
        assert fc["fields"]["body"]["text"]["aggregatable"] is False
        assert fc["fields"]["warc_ts"]["date"]["aggregatable"] is True

        code, v = _req(srv.port, "/_validate/query",
                       body={"query": {"match": {"body": "node pools"}}})
        assert code == 200 and v == {"valid": True}
        code, v = _req(srv.port, "/_validate/query",
                       body={"query": {"span_term": {"body": "x"}}})
        assert code == 200 and v["valid"] is False
        assert v["error"]["type"] == "DslError"
        code, v = _req(srv.port, "/_validate/query",
                       body={"query": {"query_string": {"query": "(a OR"}}})
        assert code == 200 and v["valid"] is False
        code, err = _req(srv.port, "/_validate/query", body={})
        assert code == 400
    finally:
        srv.stop()
