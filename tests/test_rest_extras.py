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
                       body={"query": {"intervals": {"body": "x"}}})
        assert code == 200 and v["valid"] is False
        assert v["error"]["type"] == "DslError"
        code, v = _req(srv.port, "/_validate/query",
                       body={"query": {"query_string": {"query": "(a OR"}}})
        assert code == 200 and v["valid"] is False
        code, err = _req(srv.port, "/_validate/query", body={})
        assert code == 400
    finally:
        srv.stop()


def test_extra_aggregations_both_backends(root, ray_session):
    """Body-only aggs (date_histogram / histogram / range / cardinality
    / percentiles): identical across backends, and every number checked
    against a brute-force pass over the raw docs store."""
    import datetime as dt
    import math
    import os

    import numpy as np
    import pyarrow.dataset as pads

    from docs_indexer_ray.serve_http import SearchServer

    body = {
        "query": {"match": {"body": "node"}},
        "size": 0,
        "aggs": {
            "per_minute": {"date_histogram": {"field": "warc_ts",
                                              "fixed_interval": "60s"}},
            "per_month": {"date_histogram": {"field": "warc_ts",
                                             "calendar_interval": "month"}},
            "ts_hist": {"histogram": {"field": "doc_id", "interval": 16}},
            "bands": {"range": {"field": "doc_id",
                                "ranges": [{"to": 30},
                                           {"from": 30, "to": 60},
                                           {"from": 60}]}},
            "n_urls": {"cardinality": {"field": "url"}},
            "id_pcts": {"percentiles": {"field": "doc_id",
                                        "percents": [25, 50, 75]}},
        },
    }
    results = {}
    for backend, kw in (("local", {}), ("sharded", {"n_shards": 3})):
        srv = SearchServer(root, backend=backend, **kw).start()
        try:
            code, r = _req(srv.port, "/_search", body=body)
            assert code == 200, r
            results[backend] = r["aggregations"]
        finally:
            srv.stop()
    assert results["local"] == results["sharded"]
    aggs = results["local"]

    # brute force over the raw docs store
    from docs_indexer_ray.functions.analyzer import Analyzer
    from docs_indexer_ray.query.facets import match_doc_ids
    from docs_indexer_ray.query.reader import IndexReader

    reader = IndexReader(root)
    matched = set(
        int(d) for d in match_doc_ids(reader, Analyzer(reader.chain)(["node"][0]))
    )
    docs = pads.dataset(
        os.path.join(reader.index_dir, "docs"), partitioning="hive"
    ).to_table(columns=["doc_id", "warc_ts", "url"])
    rows = [
        (int(d), t, u)
        for d, t, u in zip(docs["doc_id"].to_pylist(),
                           docs["warc_ts"].to_pylist(),
                           docs["url"].to_pylist())
        if int(d) in matched
    ]
    assert rows

    # date_histogram: minute buckets, epoch-ms keys, ISO key_as_string
    want_dh = {}
    for _, t, _ in rows:
        b = int(t.timestamp() // 60) * 60
        want_dh[b] = want_dh.get(b, 0) + 1
    got_dh = {b["key"] // 1000: b["doc_count"]
              for b in aggs["per_minute"]["buckets"]}
    assert got_dh == want_dh
    first = aggs["per_minute"]["buckets"][0]
    assert first["key_as_string"] == dt.datetime.utcfromtimestamp(
        first["key"] // 1000
    ).isoformat()
    assert [b["key"] for b in aggs["per_minute"]["buckets"]] == sorted(
        b["key"] for b in aggs["per_minute"]["buckets"]
    )

    # calendar date_histogram: month buckets keyed by the CIVIL month
    # start (date_trunc semantics), not an epoch division
    want_m = {}
    for _, t, _ in rows:
        start = dt.datetime(t.year, t.month, 1, tzinfo=dt.timezone.utc)
        b = int(start.timestamp())
        want_m[b] = want_m.get(b, 0) + 1
    got_m = {b["key"] // 1000: b["doc_count"]
             for b in aggs["per_month"]["buckets"]}
    assert got_m == want_m
    mfirst = aggs["per_month"]["buckets"][0]
    assert mfirst["key_as_string"].endswith("-01T00:00:00")

    # histogram on doc_id, interval 16 (lower-edge keys)
    want_h = {}
    for d, _, _ in rows:
        k = (d // 16) * 16
        want_h[k] = want_h.get(k, 0) + 1
    assert {int(b["key"]): b["doc_count"]
            for b in aggs["ts_hist"]["buckets"]} == want_h

    # range: explicit bands, open edges omitted from the echo
    b0, b1, b2 = aggs["bands"]["buckets"]
    assert "from" not in b0 and b0["to"] == 30.0
    assert b1 == {"doc_count": sum(1 for d, _, _ in rows if 30 <= d < 60),
                  "from": 30.0, "to": 60.0}
    assert b0["doc_count"] == sum(1 for d, _, _ in rows if d < 30)
    assert "to" not in b2
    assert b2["doc_count"] == sum(1 for d, _, _ in rows if d >= 60)

    # cardinality (exact) + percentiles (quantile_cont rule)
    assert aggs["n_urls"]["value"] == len({u for _, _, u in rows})
    ids = np.sort(np.array([d for d, _, _ in rows], float))
    for pct in (25, 50, 75):
        want = float(np.quantile(ids, pct / 100.0, method="linear"))
        assert math.isclose(aggs["id_pcts"]["values"][f"{float(pct)}"],
                            want, rel_tol=0, abs_tol=1e-9)

    # unknown interval specs still refuse loudly (calendar month /
    # quarter / year are SUPPORTED now — asserted above)
    bad = {"query": {"match": {"body": "node"}},
           "aggs": {"m": {"date_histogram": {"field": "warc_ts",
                                             "calendar_interval": "fortnight"}}}}
    srv = SearchServer(root, backend="local").start()
    try:
        code, err = _req(srv.port, "/_search", body=bad)
        assert code == 400 and "fixed-width" in err["error"]["reason"]
    finally:
        srv.stop()


def test_pipeline_aggs_envelope_both_backends(root, ray_session):
    """date_histogram + sum metric + parent pipelines (cumulative_sum
    / derivative / serial_diff) and sibling *_bucket aggs through
    /_search bodies: identical across backends, every value checked
    against a brute-force pass; sibling-before-parent body order
    works; malformed buckets_path 400s."""
    import os

    import pyarrow.dataset as pads

    from docs_indexer_ray.serve_http import SearchServer

    body = {
        "query": {"match": {"body": "node"}},
        "size": 0,
        "aggs": {
            # sibling FIRST — order must not matter
            "avg_m": {"avg_bucket": {"buckets_path": "per_min>ids"}},
            "max_m": {"max_bucket": {"buckets_path": "per_min>ids"}},
            "stats_m": {"stats_bucket": {"buckets_path": "per_min>ids"}},
            "pcts_m": {"percentiles_bucket": {"buckets_path": "per_min>ids",
                                              "percents": [50.0, 90.0]}},
            "ext_m": {"extended_stats_bucket": {"buckets_path": "per_min>ids"}},
            "per_min": {
                "date_histogram": {"field": "warc_ts",
                                   "fixed_interval": "60s"},
                "aggs": {
                    "ids": {"sum": {"field": "doc_id"}},
                    "cum": {"cumulative_sum": {"buckets_path": "ids"}},
                    "rate": {"derivative": {"buckets_path": "ids"}},
                    "sdiff": {"serial_diff": {"buckets_path": "ids",
                                              "lag": 2}},
                    "mov": {"moving_fn": {
                        "buckets_path": "ids", "window": 3,
                        "script": "MovingFunctions.unweightedAvg(values)",
                    }},
                },
            },
        },
    }
    results = {}
    for backend, kw in (("local", {}), ("sharded", {"n_shards": 3})):
        srv = SearchServer(root, backend=backend, **kw).start()
        try:
            code, r = _req(srv.port, "/_search", body=body)
            assert code == 200, r
            results[backend] = r["aggregations"]
        finally:
            srv.stop()
    assert results["local"] == results["sharded"]
    aggs = results["local"]

    # brute force: matched docs' (minute bucket, doc_id)
    from docs_indexer_ray.functions.analyzer import Analyzer
    from docs_indexer_ray.query.facets import match_doc_ids
    from docs_indexer_ray.query.reader import IndexReader

    reader = IndexReader(root)
    matched = set(
        int(d) for d in match_doc_ids(reader, Analyzer(reader.chain)("node"))
    )
    docs = pads.dataset(
        os.path.join(reader.index_dir, "docs"), partitioning="hive"
    ).to_table(columns=["doc_id", "warc_ts"])
    import datetime as _dtz

    per = {}
    for d, t in zip(docs["doc_id"].to_pylist(), docs["warc_ts"].to_pylist()):
        if int(d) in matched:
            ep = t.replace(tzinfo=_dtz.timezone.utc).timestamp()
            b = int(ep // 60) * 60
            n, s = per.get(b, (0, 0))
            per[b] = (n + 1, s + int(d))
    want = [(k, per[k]) for k in sorted(per)]
    got = aggs["per_min"]["buckets"]
    assert [g["key"] // 1000 for g in got] == [k for k, _ in want]
    assert [g["doc_count"] for g in got] == [n for _, (n, _) in want]
    sums = [float(s) for _, (_, s) in want]
    assert [g["ids"]["value"] for g in got] == sums
    # parent pipelines
    cum = 0.0
    for i, g in enumerate(got):
        cum += sums[i]
        assert g["cum"]["value"] == cum
        if i == 0:
            assert "rate" not in g
        else:
            assert g["rate"]["value"] == sums[i] - sums[i - 1]
        if i < 2:
            assert "sdiff" not in g
        else:
            assert g["sdiff"]["value"] == sums[i] - sums[i - 2]
        lo_i = max(0, i - 2)
        assert g["mov"]["value"] == sum(sums[lo_i:i + 1]) / (i - lo_i + 1)
    # siblings
    assert aggs["avg_m"]["value"] == sum(sums) / len(sums)
    mx = max(sums)
    assert aggs["max_m"]["value"] == mx
    assert aggs["max_m"]["keys"] == [
        g["key_as_string"] for g, s in zip(got, sums) if s == mx
    ]
    assert aggs["stats_m"] == {
        "count": len(sums), "min": min(sums), "max": mx,
        "sum": sum(sums), "avg": sum(sums) / len(sums),
    }
    import numpy as np

    med = float(np.quantile(np.sort(np.array(sums)), 0.5, method="linear"))
    assert abs(aggs["pcts_m"]["values"]["50.0"] - med) < 1e-9
    n_b, s_b = len(sums), sum(sums)
    ss = sum(x * x for x in sums)
    assert aggs["ext_m"]["count"] == n_b
    assert abs(aggs["ext_m"]["variance"] - (ss / n_b - (s_b / n_b) ** 2)) < 1e-6

    # malformed buckets_path → clean 400
    bad = {"query": {"match": {"body": "node"}},
           "aggs": {"a": {"avg_bucket": {"buckets_path": "nope"}}}}
    srv = SearchServer(root, backend="local").start()
    try:
        code, err = _req(srv.port, "/_search", body=bad)
        assert code == 400 and "parent>metric" in err["error"]["reason"]
        bad2 = {"query": {"match": {"body": "node"}},
                "aggs": {"a": {"avg_bucket": {"buckets_path": "x>ids"}}}}
        code, err = _req(srv.port, "/_search", body=bad2)
        assert code == 400 and "not a bucket aggregation" in err["error"]["reason"]
    finally:
        srv.stop()


def test_highlight_options_and_suggest_body(root, ray_session):
    """highlight pre/post tags + fragment_size map through both
    backends; a body 'suggest' rides the search response (the
    /_suggest machinery, OpenSearch envelope)."""
    from docs_indexer_ray.serve_http import SearchServer

    for backend, kw in (("local", {}), ("sharded", {"n_shards": 3})):
        srv = SearchServer(root, backend=backend, **kw).start()
        try:
            body = {
                "query": {"match": {"body": "node"}},
                "size": 2,
                "highlight": {"fields": {"body": {"fragment_size": 60}},
                              "pre_tags": ["<b>"], "post_tags": ["</b>"]},
            }
            code, r = _req(srv.port, "/_search", body=body)
            assert code == 200, r
            snip = r["hits"]["hits"][0]["highlight"]["body"][0]
            assert "<b>" in snip and "</b>" in snip and "<em>" not in snip
            # fragment_size bounds the UNMARKED text length
            bare = snip.replace("<b>", "").replace("</b>", "")
            assert len(bare) <= 60 + 20  # width + boundary slack
            # default tags unchanged
            code, r2 = _req(srv.port, "/_search",
                            body={"query": body["query"], "size": 1,
                                  "highlight": {"fields": {"body": {}}}})
            assert "<em>" in r2["hits"]["hits"][0]["highlight"]["body"][0]
        finally:
            srv.stop()

    srv = SearchServer(root, backend="local").start()
    try:
        body = {"query": {"match": {"body": "node"}}, "size": 1,
                "suggest": {"fix": {"text": "nodde",
                                    "term": {"field": "body", "size": 2}}}}
        code, r = _req(srv.port, "/_search", body=body)
        assert code == 200, r
        opts = r["suggest"]["fix"][0]["options"]
        assert opts and opts[0]["text"] == "node"
        code, err = _req(srv.port, "/_search",
                         body={"query": body["query"],
                               "suggest": {"bad": {"term": {}}}})
        assert code == 400
    finally:
        srv.stop()


def test_nested_terms_stats_agg(root, ray_session):
    """terms bucket + stats sub-agg through /_search bodies: identical
    across backends and equal to a brute-force per-bucket fold."""
    import os

    import pyarrow.dataset as pads

    from docs_indexer_ray.serve_http import SearchServer

    body = {
        "query": {"match": {"body": "node"}},
        "size": 0,
        "aggs": {"by_lang": {
            "terms": {"field": "lang", "size": 5},
            "aggs": {"ids": {"stats": {"field": "doc_id"}}},
        }},
    }
    results = {}
    for backend, kw in (("local", {}), ("sharded", {"n_shards": 3})):
        srv = SearchServer(root, backend=backend, **kw).start()
        try:
            code, r = _req(srv.port, "/_search", body=body)
            assert code == 200, r
            results[backend] = r["aggregations"]["by_lang"]["buckets"]
        finally:
            srv.stop()
    assert results["local"] == results["sharded"]
    buckets = results["local"]
    assert buckets

    from docs_indexer_ray.functions.analyzer import Analyzer
    from docs_indexer_ray.query.facets import match_doc_ids
    from docs_indexer_ray.query.reader import IndexReader

    reader = IndexReader(root)
    matched = set(
        int(d) for d in match_doc_ids(reader, Analyzer(reader.chain)("node"))
    )
    docs = pads.dataset(
        os.path.join(reader.index_dir, "docs"), partitioning="hive"
    ).to_table(columns=["doc_id", "lang"])
    per = {}
    for d, lg in zip(docs["doc_id"].to_pylist(), docs["lang"].to_pylist()):
        if int(d) in matched:
            per.setdefault(lg, []).append(int(d))
    for b in buckets:
        ids = per[b["key"]]
        assert b["doc_count"] == len(ids)
        s = b["ids"]
        assert s["min"] == min(ids) and s["max"] == max(ids)
        assert s["sum"] == float(sum(ids))
        assert s["avg"] == sum(ids) / len(ids)
    assert {b["key"] for b in buckets} == set(per)

    # single-metric sub-aggs (avg/sum/min/max) lower onto the same
    # terms_stats partial; the renderer projects {value: …}
    for metric, fold in (("avg", lambda x: sum(x) / len(x)),
                         ("sum", lambda x: float(sum(x))),
                         ("min", lambda x: float(min(x))),
                         ("max", lambda x: float(max(x)))):
        mb = {
            "query": {"match": {"body": "node"}},
            "size": 0,
            "aggs": {"by_lang": {
                "terms": {"field": "lang", "size": 5},
                "aggs": {"m": {metric: {"field": "doc_id"}}},
            }},
        }
        srv = SearchServer(root, backend="local").start()
        try:
            code, r = _req(srv.port, "/_search", body=mb)
            assert code == 200, r
            for b in r["aggregations"]["by_lang"]["buckets"]:
                assert b["m"] == {"value": fold(per[b["key"]])}, (metric, b)
        finally:
            srv.stop()


def test_terms_top_hits_agg(root, ray_session):
    """terms → top_hits sub-agg: per bucket the k best docs by one
    sort field (doc-id tie-break in the sort direction), identical
    across backends and equal to a brute-force per-bucket sort."""
    import os

    import pyarrow.dataset as pads

    from docs_indexer_ray.serve_http import SearchServer

    body = {
        "query": {"match": {"body": "node"}},
        "size": 0,
        "aggs": {"by_lang": {
            "terms": {"field": "lang", "size": 5},
            "aggs": {"newest": {"top_hits": {
                "size": 2,
                "sort": [{"warc_ts": {"order": "desc"}}],
            }}},
        }},
    }
    results = {}
    for backend, kw in (("local", {}), ("sharded", {"n_shards": 3})):
        srv = SearchServer(root, backend=backend, **kw).start()
        try:
            code, r = _req(srv.port, "/_search", body=body)
            assert code == 200, r
            results[backend] = r["aggregations"]["by_lang"]["buckets"]
        finally:
            srv.stop()
    assert results["local"] == results["sharded"]
    buckets = results["local"]
    assert buckets

    from docs_indexer_ray.functions.analyzer import Analyzer
    from docs_indexer_ray.query.facets import match_doc_ids
    from docs_indexer_ray.query.reader import IndexReader

    reader = IndexReader(root)
    matched = set(
        int(d) for d in match_doc_ids(reader, Analyzer(reader.chain)("node"))
    )
    docs = pads.dataset(
        os.path.join(reader.index_dir, "docs"), partitioning="hive"
    ).to_table(columns=["doc_id", "lang", "warc_ts"])
    per = {}
    for d, lg, ts in zip(docs["doc_id"].to_pylist(), docs["lang"].to_pylist(),
                         docs["warc_ts"].to_pylist()):
        if int(d) in matched:
            per.setdefault(lg, []).append((ts, int(d)))
    for b in buckets:
        want = sorted(per[b["key"]], reverse=True)[:2]
        got = b["newest"]["hits"]["hits"]
        assert [int(h["_id"]) for h in got] == [d for _, d in want], b["key"]
        assert [h["sort"][0] for h in got] == [t.isoformat() for t, _ in want]
        assert b["newest"]["hits"]["total"] == {
            "value": b["doc_count"], "relation": "eq",
        }
    assert {b["key"] for b in buckets} == set(per)

    # default sort (_doc pseudo-field, no stored column) → doc-id asc
    srv = SearchServer(root, backend="local").start()
    try:
        code, r = _req(srv.port, "/_search", body={
            "query": {"match": {"body": "node"}},
            "size": 0,
            "aggs": {"by_lang": {
                "terms": {"field": "lang", "size": 5},
                "aggs": {"first": {"top_hits": {"size": 2}}},
            }},
        })
        assert code == 200, r
        for b in r["aggregations"]["by_lang"]["buckets"]:
            ids = sorted(d for _, d in per[b["key"]])[:2]
            assert [int(h["_id"]) for h in b["first"]["hits"]["hits"]] == ids
    finally:
        srv.stop()


def test_date_range_agg_both_backends(root, ray_session):
    """date_range: explicit ISO-bounded [from, to) bands over the
    date field — identical across backends, brute-force counts, ISO
    echo of the closed edges, zero-count bands kept."""
    import datetime as dt
    import os

    import pyarrow.dataset as pads

    from docs_indexer_ray.serve_http import SearchServer

    # find the corpus's ts span to build meaningful bands
    docs = pads.dataset(
        os.path.join(
            __import__("docs_indexer_ray.query.reader", fromlist=["IndexReader"])
            .IndexReader(root).index_dir,
            "docs",
        ),
        partitioning="hive",
    ).to_table(columns=["doc_id", "warc_ts"])
    tss = sorted(docs["warc_ts"].to_pylist())
    mid = tss[len(tss) // 2].isoformat()
    early = tss[0].isoformat()
    body = {
        "query": {"match": {"body": "node"}},
        "size": 0,
        "aggs": {"eras": {"date_range": {
            "field": "warc_ts",
            "ranges": [
                {"to": mid},
                {"from": mid},
                {"from": early, "to": mid},
                {"to": early},  # zero or tiny band — kept either way
            ],
        }}},
    }
    results = {}
    for backend, kw in (("local", {}), ("sharded", {"n_shards": 3})):
        srv = SearchServer(root, backend=backend, **kw).start()
        try:
            code, r = _req(srv.port, "/_search", body=body)
            assert code == 200, r
            results[backend] = r["aggregations"]["eras"]["buckets"]
        finally:
            srv.stop()
    assert results["local"] == results["sharded"]
    buckets = results["local"]
    assert len(buckets) == 4

    from docs_indexer_ray.functions.analyzer import Analyzer
    from docs_indexer_ray.query.facets import match_doc_ids
    from docs_indexer_ray.query.reader import IndexReader

    reader = IndexReader(root)
    matched = set(
        int(d) for d in match_doc_ids(reader, Analyzer(reader.chain)("node"))
    )
    mts = [
        t
        for d, t in zip(docs["doc_id"].to_pylist(), docs["warc_ts"].to_pylist())
        if int(d) in matched
    ]
    mid_dt = dt.datetime.fromisoformat(mid)
    early_dt = dt.datetime.fromisoformat(early)
    want = [
        sum(1 for t in mts if t < mid_dt),
        sum(1 for t in mts if t >= mid_dt),
        sum(1 for t in mts if early_dt <= t < mid_dt),
        sum(1 for t in mts if t < early_dt),
    ]
    assert [b["doc_count"] for b in buckets] == want
    assert "from" not in buckets[0] and buckets[0]["to_as_string"] == mid
    assert buckets[1]["from_as_string"] == mid and "to" not in buckets[1]
    assert buckets[2]["from_as_string"] == early
    assert buckets[3]["doc_count"] == 0


def test_missing_and_histogram_metric_aggs(root, ray_session):
    """missing agg (two-count lowering) and histogram + sum metric
    parent, both backends, brute-forced."""
    import os

    import pyarrow.dataset as pads

    from docs_indexer_ray.serve_http import SearchServer

    body = {
        "query": {"match": {"body": "node"}},
        "size": 0,
        "aggs": {
            "no_lang": {"missing": {"field": "lang"}},
            "no_ghost": {"missing": {"field": "ghost_col"}},
            "hist": {"histogram": {"field": "doc_id", "interval": 16},
                     "aggs": {"ids": {"sum": {"field": "doc_id"}}}},
        },
    }
    results = {}
    for backend, kw in (("local", {}), ("sharded", {"n_shards": 3})):
        srv = SearchServer(root, backend=backend, **kw).start()
        try:
            code, r = _req(srv.port, "/_search", body=body)
            assert code == 200, r
            results[backend] = r["aggregations"]
        finally:
            srv.stop()
    assert results["local"] == results["sharded"]
    aggs = results["local"]

    from docs_indexer_ray.functions.analyzer import Analyzer
    from docs_indexer_ray.query.facets import match_doc_ids
    from docs_indexer_ray.query.reader import IndexReader

    reader = IndexReader(root)
    matched = set(
        int(d) for d in match_doc_ids(reader, Analyzer(reader.chain)("node"))
    )
    # every doc has lang → 0 missing; an unmapped column → ALL missing
    assert aggs["no_lang"]["doc_count"] == 0
    assert aggs["no_ghost"]["doc_count"] == len(matched)
    # histogram + sum metric: doc counts AND per-bucket id sums
    per = {}
    for d in sorted(matched):
        k = (d // 16) * 16
        n, s = per.get(k, (0, 0))
        per[k] = (n + 1, s + d)
    got = {int(b["key"]): (b["doc_count"], b["ids"]["value"])
           for b in aggs["hist"]["buckets"]}
    assert got == {k: (n, float(s)) for k, (n, s) in per.items()}


def test_value_count_rare_adjacency_composite_aggs(root, ray_session):
    """The four long-tail envelope aggs — value_count, rare_terms,
    adjacency_matrix, composite (one terms source with after_key
    paging) — both backends, brute-forced."""
    import os

    import pyarrow.dataset as pads

    from docs_indexer_ray.serve_http import SearchServer

    body = {
        "query": {"match": {"body": "node"}},
        "size": 0,
        "aggs": {
            "n_langs": {"value_count": {"field": "lang"}},
            "rare": {"rare_terms": {"field": "lang", "max_doc_count": 1000}},
            "adj": {"adjacency_matrix": {"filters": {
                "early": {"range": {"doc_id": {"lt": 30}}},
                "node": {"match": {"body": "node"}},
            }}},
            "page1": {"composite": {
                "size": 2,
                "sources": [{"lg": {"terms": {"field": "lang"}}}],
            }},
        },
    }
    results = {}
    for backend, kw in (("local", {}), ("sharded", {"n_shards": 3})):
        srv = SearchServer(root, backend=backend, **kw).start()
        try:
            code, r = _req(srv.port, "/_search", body=body)
            assert code == 200, r
            results[backend] = r["aggregations"]
        finally:
            srv.stop()
    assert results["local"] == results["sharded"]
    aggs = results["local"]

    from docs_indexer_ray.functions.analyzer import Analyzer
    from docs_indexer_ray.query.facets import match_doc_ids
    from docs_indexer_ray.query.reader import IndexReader

    reader = IndexReader(root)
    matched = set(
        int(d) for d in match_doc_ids(reader, Analyzer(reader.chain)("node"))
    )
    docs = pads.dataset(
        os.path.join(reader.index_dir, "docs"), partitioning="hive"
    ).to_table(columns=["doc_id", "lang"])
    langs = {
        int(d): lg
        for d, lg in zip(docs["doc_id"].to_pylist(), docs["lang"].to_pylist())
    }
    # value_count: every matched doc has a lang
    assert aggs["n_langs"]["value"] == len(matched)
    # rare_terms: count ASC then value asc, tail filter
    per = {}
    for d in matched:
        per[langs[d]] = per.get(langs[d], 0) + 1
    want = sorted(((n, v) for v, n in per.items() if n <= 1000))
    assert [(b["doc_count"], b["key"]) for b in aggs["rare"]["buckets"]] == want
    # adjacency_matrix: singles + the pairwise intersection
    early = {d for d in matched if d < 30}
    by_key = {b["key"]: b["doc_count"] for b in aggs["adj"]["buckets"]}
    assert by_key["early"] == len(early)
    assert by_key["node"] == len(matched)
    assert by_key.get("early&node", 0) == len(early)
    # extended_stats + percentile_ranks fold the exact value histogram
    srv = SearchServer(root, backend="local").start()
    try:
        code, r = _req(srv.port, "/_search", body={
            "query": {"match": {"body": "node"}}, "size": 0,
            "aggs": {
                "es": {"extended_stats": {"field": "doc_id"}},
                "pr": {"percentile_ranks": {"field": "doc_id",
                                            "values": [10, 45]}},
            },
        })
        assert code == 200, r
        import numpy as np

        ids = np.array(sorted(matched), float)
        es = r["aggregations"]["es"]
        assert es["count"] == len(ids) and es["min"] == ids.min()
        assert abs(es["variance"] - ids.var()) < 1e-6
        pr = r["aggregations"]["pr"]
        for x in (10.0, 45.0):
            assert abs(
                pr["values"][f"{x}"] - 100.0 * (ids <= x).sum() / len(ids)
            ) < 1e-9
    finally:
        srv.stop()

    # composite: key-ascending pages chained by after_key cover all keys
    seen = []
    after = None
    srv = SearchServer(root, backend="local").start()
    try:
        while True:
            comp = {"size": 2, "sources": [{"lg": {"terms": {"field": "lang"}}}]}
            if after is not None:
                comp["after"] = {"lg": after}
            code, r = _req(srv.port, "/_search", body={
                "query": {"match": {"body": "node"}}, "size": 0,
                "aggs": {"pg": {"composite": comp}},
            })
            assert code == 200, r
            pg = r["aggregations"]["pg"]
            seen += [(b["key"]["lg"], b["doc_count"]) for b in pg["buckets"]]
            if "after_key" not in pg:
                break
            after = pg["after_key"]["lg"]
    finally:
        srv.stop()
    assert seen == sorted((v, n) for v, n in per.items())


def test_pipeline_agg_edges(root, ray_session):
    """Edge semantics pinned: a 'meta' key beside a pipeline sub-agg
    parses; a sibling over a derivative metric gap-skips its empty
    first bucket; histogram parents refuse sub-aggs loudly."""
    from docs_indexer_ray.serve_http import SearchServer

    srv = SearchServer(root, backend="local").start()
    try:
        body = {
            "query": {"match": {"body": "node"}},
            "size": 0,
            "aggs": {
                "avg_rate": {"avg_bucket": {"buckets_path": "per_min>rate"}},
                "per_min": {
                    "date_histogram": {"field": "warc_ts",
                                       "fixed_interval": "60s"},
                    "aggs": {
                        "ids": {"sum": {"field": "doc_id"}},
                        "rate": {"meta": {"x": 1},
                                 "derivative": {"buckets_path": "ids"}},
                    },
                },
            },
        }
        code, r = _req(srv.port, "/_search", body=body)
        assert code == 200, r
        got = r["aggregations"]["per_min"]["buckets"]
        assert "rate" not in got[0] and all("rate" in g for g in got[1:])
        rates = [g["rate"]["value"] for g in got[1:]]
        if rates:  # sibling averaged over the PRESENT values only
            assert r["aggregations"]["avg_rate"]["value"] == sum(rates) / len(rates)

        # histogram parent + NON-sum sub-agg → loud 400, never a
        # silent drop (sum metrics are supported — see
        # test_missing_and_histogram_metric_aggs)
        code, err = _req(srv.port, "/_search", body={
            "query": {"match": {"body": "node"}},
            "aggs": {"h": {"histogram": {"field": "doc_id", "interval": 16},
                           "aggs": {"x": {"avg": {"field": "doc_id"}}}}},
        })
        assert code == 400 and "must be sum" in err["error"]["reason"]
    finally:
        srv.stop()


def test_aggs_envelope_fuzz_never_500s(root, ray_session):
    """The aggregation compiler's 400 contract, fuzzed: any
    JSON-shaped aggs body either computes (200) or refuses cleanly
    (400) — no exception class escapes as a 500 (the DSL fuzz's
    guarantee, extended to the agg surface)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from docs_indexer_ray.serve_http import SearchServer

    keys = st.sampled_from([
        "terms", "stats", "date_histogram", "histogram", "range",
        "date_range", "cardinality", "percentiles", "filters",
        "significant_terms", "missing", "top_hits", "sum", "avg",
        "value_count", "rare_terms", "adjacency_matrix", "composite",
        "sources", "max_doc_count", "after",
        "cumulative_sum", "derivative", "serial_diff", "moving_fn",
        "avg_bucket", "max_bucket", "stats_bucket",
        "percentiles_bucket", "extended_stats_bucket", "aggs",
        "field", "interval", "fixed_interval", "calendar_interval",
        "ranges", "from", "to", "size", "sort", "buckets_path",
        "lag", "window", "script", "percents", "meta", "x",
    ])
    scalars = st.one_of(
        st.none(), st.booleans(), st.integers(-3, 60),
        st.sampled_from([
            "warc_ts", "lang", "doc_id", "60s", "month", "fortnight",
            "per>ids", "ids", "2025-01-01T00:00:00", "", "1h",
            # round-5 robustness alphabet: non-ASCII numerals (isdigit-
            # True but int()-hostile or Nd), zero widths, BOM/noncharacter
            "²", "٢", "０", "0", "0s", "﻿", "￿", "1²h",
        ]),
        # overflow alphabet: JSON 1e999 → inf; 2^70 overflows C long;
        # 1e19 overflows the int64 bucket key
        st.sampled_from([1e999, -1e999, 2 ** 70, 1e19, 0.0, -0.5]),
    )
    json_obj = st.recursive(
        scalars,
        lambda inner: st.one_of(
            st.lists(inner, max_size=2),
            st.dictionaries(keys, inner, max_size=3),
        ),
        max_leaves=10,
    )

    srv = SearchServer(root, backend="local").start()
    try:
        @settings(max_examples=80, deadline=None)
        @given(st.dictionaries(keys, json_obj, min_size=1, max_size=2))
        def probe(aggs):
            code, r = _req(srv.port, "/_search", body={
                "query": {"match": {"body": "node"}},
                "size": 0,
                "aggs": aggs,
            })
            assert code in (200, 400), (code, aggs, r)

        probe()
    finally:
        srv.stop()


def test_search_body_fuzz_never_500s(root, ray_session):
    """The whole /_search body surface (sort / suggest / highlight /
    from / size / _source / scroll riders around a fixed valid query)
    under the same 200-or-400 contract."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from docs_indexer_ray.serve_http import SearchServer

    keys = st.sampled_from([
        "sort", "suggest", "highlight", "from", "size", "_source",
        "search_after", "collapse", "rescore", "min_score", "fields",
        "text", "term", "order", "warc_ts", "doc_id", "x",
    ])
    scalars = st.one_of(
        st.none(), st.booleans(), st.integers(-3, 30),
        st.sampled_from(["warc_ts:desc", "nope", "asc", "node", "", "url"]),
    )
    json_obj = st.recursive(
        scalars,
        lambda inner: st.one_of(
            st.lists(inner, max_size=2),
            st.dictionaries(keys, inner, max_size=2),
        ),
        max_leaves=8,
    )

    srv = SearchServer(root, backend="local").start()
    try:
        @settings(max_examples=60, deadline=None)
        @given(st.dictionaries(keys, json_obj, min_size=1, max_size=3))
        def probe(extra):
            body = {"query": {"match": {"body": "node"}}, **extra}
            code, r = _req(srv.port, "/_search", body=body)
            assert code in (200, 400, 404), (code, extra, r)

        probe()
    finally:
        srv.stop()


def test_get_params_fuzz_never_500s(root, ray_session):
    """GET /_search (and /_count, /_analyze) with random query params
    under the 200-or-400 contract — the param-string parse surface."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from docs_indexer_ray.serve_http import SearchServer

    pkeys = st.sampled_from([
        "q", "size", "from", "k", "sort", "fields", "agg_terms",
        "agg_stats", "agg_size", "highlight", "hl_width", "scroll",
        "syntax", "collapse", "min_score", "x",
    ])
    pvals = st.sampled_from([
        "node", "3", "-1", "0", "nope:desc", "warc_ts:desc", "", "1m",
        "true", "url,title", "lang", "1e9", "NaN", "*", '"a b"',
        "²", "٢", "０", "0s", "﻿", "node~²", "~٣", "9" * 40,
    ])

    srv = SearchServer(root, backend="local").start()
    try:
        @settings(max_examples=80, deadline=None)
        @given(st.dictionaries(pkeys, pvals, min_size=1, max_size=4))
        def probe(params):
            code, r = _req(srv.port, "/_search", **params)
            assert code in (200, 400, 404), (code, params, r)
            code, r = _req(srv.port, "/_count", **params)
            assert code in (200, 400, 404), (code, params, r)

        probe()
    finally:
        srv.stop()


def test_rest_self_heals_after_shard_actor_death(root, ray_session):
    """A /_search whose fan-out hits a killed shard actor revives the
    fleet once and answers identically — the REST layer's one-retry
    self-heal over ShardedQueryService.revive()."""
    import ray

    from docs_indexer_ray.serve_http import SearchServer

    srv = SearchServer(root, backend="sharded", n_shards=3).start()
    try:
        code, before = _req(srv.port, "/_search", q="node", size=5)
        assert code == 200
        ray.kill(srv._svc._groups[1][0])
        # cache-missing spelling so the dead actor is actually hit
        code, after = _req(srv.port, "/_search", q="node", size=6)
        assert code == 200, after
        assert [h["_id"] for h in after["hits"]["hits"]][:5] == [
            h["_id"] for h in before["hits"]["hits"]
        ]
    finally:
        srv.stop()


def test_rank_eval_and_cat_indices(root, ray_session):
    """POST /_rank_eval: per-request precision/MRR/DCG/NDCG against
    graded ratings through the REAL backend; /_cat/indices reports the
    served index's counts."""
    import math

    from docs_indexer_ray.serve_http import SearchServer

    for backend, kw in (("local", {}), ("sharded", {"n_shards": 3})):
        srv = SearchServer(root, backend=backend, **kw).start()
        try:
            # ground truth: the backend's own top-3 for 'node pools'
            code, top = _req(srv.port, "/_search", q="node pools", size=3,
                             syntax=1)
            ids = [h["_id"] for h in top["hits"]["hits"]]
            body = {
                "requests": [
                    {"id": "good", "request": {
                        "query": {"match": {"body": "node pools"}}},
                     "ratings": [{"_id": i, "rating": 1} for i in ids]},
                    {"id": "bad", "request": {
                        "query": {"match": {"body": "quota"}}},
                     "ratings": [{"_id": ids[0], "rating": 1}]},
                ],
                "metric": {"precision": {"k": 3}},
            }
            code, r = _req(srv.port, "/_rank_eval", body=body)
            assert code == 200, r
            good = r["details"]["good"]
            assert good["precision"] == 1.0  # its own top-3, all rated
            assert good["mrr"] == 1.0 and good["ndcg"] == 1.0
            assert good["unrated_docs"] == []
            bad = r["details"]["bad"]
            assert bad["precision"] < 1.0
            assert math.isclose(
                r["metric_score"],
                (good["precision"] + bad["precision"]) / 2,
            )
            # dcg + normalize → ndcg as the headline metric
            body["metric"] = {"dcg": {"k": 3, "normalize": True}}
            code, r2 = _req(srv.port, "/_rank_eval", body=body)
            assert r2["details"]["good"]["metric_score"] == 1.0
            code, err = _req(srv.port, "/_rank_eval",
                             body={"requests": [],
                                   "metric": {"precision": {}}})
            assert code == 400
            code, err = _req(srv.port, "/_rank_eval",
                             body={"requests": [{"id": "x"}],
                                   "metric": {"recall": {}}})
            assert code == 400

            code, cat = _req(srv.port, "/_cat/indices")
            assert code == 200
            row = cat["indices"][0]
            assert row["docs.count"] > 0 and row["docs.deleted"] == 0
            assert row["store.size_bytes"] > 0 and row["health"] == "green"
        finally:
            srv.stop()


def test_explain_tree_for_dsl_queries(root, ray_session):
    """/_explain with syntax/DSL bodies returns the per-clause
    explanation tree: the root value equals the doc's real score, bool
    children carry occur roles, and a prohibited clause explains a
    non-match."""
    import math

    from docs_indexer_ray.serve_http import SearchServer

    srv = SearchServer(root, backend="local").start()
    try:
        code, top = _req(srv.port, "/_search", q='node pools', size=1,
                         syntax=1)
        doc = top["hits"]["hits"][0]["_id"]
        score = top["hits"]["hits"][0]["_score"]

        body = {"query": {"bool": {
            "must": [{"match": {"body": "node"}}],
            "should": [{"match": {"body": "pools"}}],
            "must_not": [{"term": {"body": "zzznope"}}],
        }}, "id": doc}
        code, r = _req(srv.port, "/_explain", body=body)
        assert code == 200, r
        tree = r["explanation"]
        assert r["matched"] is True and tree["description"] == "bool"
        roles = [d["occur"] for d in tree["details"]]
        assert roles == ["must", "should", "must_not"]
        assert tree["details"][0]["matched"] is True
        assert tree["details"][2]["matched"] is False  # prohibited absent
        # the tree's root value is the doc's real (unquantized) score:
        # quantized it equals the /_search score
        assert math.isclose(round(tree["value"], 9), score, abs_tol=1e-9)
        # children sum to the parent for a pure-sum bool
        kids = sum(d["value"] for d in tree["details"])
        assert math.isclose(kids, tree["value"], rel_tol=1e-12)

        # GET spelling with the query_string language
        code, r2 = _req(srv.port, "/_explain", id=doc,
                        q='+node pools^2', syntax=1)
        assert code == 200 and r2["explanation"]["details"]
        # the plain per-term path is unchanged
        code, r3 = _req(srv.port, "/_explain", id=doc, q="node pools")
        assert code == 200 and "details" in r3["explanation"]
        assert all("tf" in d for d in r3["explanation"]["details"])
    finally:
        srv.stop()


def test_significant_terms_agg(root, ray_session):
    """`{"aggs": {n: {"significant_terms": …}}}` on a search body runs
    the JLH kernel over the query's match set — pinned to the direct
    library call, on BOTH backends; wrong-field refused."""
    from docs_indexer_ray.functions.analyzer import Analyzer
    from docs_indexer_ray.query.facets import match_doc_ids
    from docs_indexer_ray.query.reader import IndexReader
    from docs_indexer_ray.query.significant import significant_terms
    from docs_indexer_ray.serve_http import SearchServer

    reader = IndexReader(root)
    matched = match_doc_ids(reader, Analyzer("simple")("node"))
    want = significant_terms(reader, matched, k=5).to_pylist()
    assert want, "fixture query must match"

    body = {
        "query": {"match": {"body": "node"}},
        "size": 0,
        "aggs": {"sig": {"significant_terms": {"field": "body",
                                               "size": 5}}},
    }
    for backend in ("local", "sharded"):
        srv = SearchServer(root, backend=backend, n_shards=3).start()
        try:
            code, out = _req(srv.port, "/_search", body=body)
            assert code == 200, out
            sig = out["aggregations"]["sig"]
            assert sig["doc_count"] == len(matched)
            assert sig["buckets"] == [
                {"key": r["term"], "doc_count": r["fg_df"],
                 "bg_count": r["bg_df"], "score": r["score"]}
                for r in want
            ]
            # significance is postings-space: non-indexed field refused
            code, _ = _req(srv.port, "/_search", body={
                "query": {"match": {"body": "node"}},
                "aggs": {"s": {"significant_terms": {"field": "title"}}},
            })
            assert code == 400
        finally:
            srv.stop()


def test_count_and_analyze_post_bodies(root, ray_session):
    """POST /_count {"query": <DSL>} and POST /_analyze {"text",
    "analyzer"} — the OpenSearch body forms."""
    from docs_indexer_ray.serve_http import SearchServer

    srv = SearchServer(root, backend="local").start()
    try:
        code, via_get = _req(srv.port, "/_count", q="node")
        code2, via_post = _req(srv.port, "/_count", body={
            "query": {"match": {"body": "node"}}})
        assert code == code2 == 200
        assert via_post["count"] == via_get["count"] > 0
        # bool body counts too; malformed query → 400
        code, out = _req(srv.port, "/_count", body={
            "query": {"bool": {"must": [{"match": {"body": "node"}}],
                               "must_not": [{"match": {"body": "quota"}}]}}})
        assert code == 200 and 0 < out["count"] <= via_get["count"]
        code, _ = _req(srv.port, "/_count", body={"query": "scalar"})
        assert code == 400

        # _analyze body: explicit chain override + list text
        code, out = _req(srv.port, "/_analyze", body={
            "text": "Node's pools", "analyzer": "english"})
        assert code == 200
        assert [t["token"] for t in out["tokens"]] == ["node", "pool"]
        code, out = _req(srv.port, "/_analyze", body={
            "text": ["alpha beta", "gamma"]})
        assert [(t["token"], t["position"]) for t in out["tokens"]] == [
            ("alpha", 0), ("beta", 1), ("gamma", 2)]
        code, _ = _req(srv.port, "/_analyze", body={
            "text": "x", "analyzer": "nochain"})
        assert code == 400
        code, _ = _req(srv.port, "/_analyze", body={})
        assert code == 400
    finally:
        srv.stop()


def test_root_banner_health_and_head(root, ray_session):
    """`GET /` version banner, `GET /_cluster/health` green status and
    HEAD liveness pings — the requests every OpenSearch client issues
    before its first real call."""
    from docs_indexer_ray.serve_http import SearchServer

    srv = SearchServer(root, backend="local").start()
    try:
        code, out = _req(srv.port, "/")
        assert code == 200 and out["version"]["number"]
        assert out["version"]["distribution"] == "docs-indexer-ray"
        code, h = _req(srv.port, "/_cluster/health")
        assert code == 200 and h["status"] == "green"
        # other tests in this module bulk-append to the shared fixture
        # — compare against the live reader, not a hard-coded size
        from docs_indexer_ray.query.reader import IndexReader

        assert h["docs"]["count"] == IndexReader(root).match_all_count() >= 90
        req = urllib.request.Request(
            f"http://127.0.0.1:{srv.port}/", method="HEAD")
        with urllib.request.urlopen(req) as r:
            assert r.status == 200 and r.read() == b""
        req = urllib.request.Request(
            f"http://127.0.0.1:{srv.port}/nope", method="HEAD")
        try:
            urllib.request.urlopen(req)
            raise AssertionError("HEAD /nope must 404")
        except urllib.error.HTTPError as e:
            assert e.code == 404
    finally:
        srv.stop()


def test_filters_aggregation(root, ray_session):
    """`{"aggs": {n: {"filters": {"filters": {...}}}}}`: one bucket per
    named sub-query counting docs in the main query's scope — pinned
    to intersection counts, both backends."""
    from docs_indexer_ray.serve_http import SearchServer

    body = {
        "query": {"match": {"body": "node"}},
        "size": 0,
        "aggs": {"by_kind": {"filters": {"filters": {
            "pools": {"match": {"body": "pools"}},
            "recent": {"range": {"warc_ts": {"gte": "2025-01-01T00:00:40"}}},
            "never": {"match": {"body": "zzzznope"}},
        }}}},
    }
    for backend in ("local", "sharded"):
        srv = SearchServer(root, backend=backend, n_shards=3).start()
        try:
            code, out = _req(srv.port, "/_search", body=body)
            assert code == 200, out
            total = out["hits"]["total"]["value"]
            b = out["aggregations"]["by_kind"]["buckets"]
            assert set(b) == {"pools", "recent", "never"}
            assert b["never"]["doc_count"] == 0
            assert 0 < b["pools"]["doc_count"] <= total
            assert 0 < b["recent"]["doc_count"] <= total
            # pin to explicit intersection counts via /_count
            for name, sub in body["aggs"]["by_kind"]["filters"]["filters"].items():
                code, c = _req(srv.port, "/_count", body={"query": {
                    "bool": {"must": [body["query"], sub]}}})
                assert b[name]["doc_count"] == c["count"], name
            # malformed shapes
            code, _ = _req(srv.port, "/_search", body={
                "query": {"match_all": {}},
                "aggs": {"x": {"filters": {"filters": {}}}}})
            assert code == 400
            code, _ = _req(srv.port, "/_search", body={
                "query": {"match_all": {}},
                "aggs": {"x": {"filters": {"filters": {"a": "scalar"}}}}})
            assert code == 400
        finally:
            srv.stop()
