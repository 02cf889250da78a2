#!/usr/bin/env bash
# End-to-end quickstart: synthesize a crawl, build the index, query it
# from the CLI, serve it over REST, bulk-index new docs, snapshot and
# roll back.  Everything runs single-node; the same commands submit to
# a cluster via `ray job submit -- python -m docs_indexer_ray.cli …`.
set -euo pipefail
WORK="$(mktemp -d)"
PORT="${PORT:-19280}"
echo "working dir: $WORK"

# 1. a Common-Crawl-shaped pages table (url, warc_ts, html, text, lang)
python - <<EOF
import pyarrow.parquet as pq
from docs_indexer_ray.synth import rich_pages_table
pq.write_table(rich_pages_table(200, dup_every=0), "$WORK/pages.parquet")
EOF

# 2. build the inverted index (positions on, for phrases/highlighting)
python -m docs_indexer_ray.cli build \
  --input "$WORK/pages.parquet" --out "$WORK/idx" \
  --fingerprint demo --store-positions

# 3. query from the CLI: BM25, assembled search, phrase, aggregation
python -m docs_indexer_ray.cli query  --index "$WORK/idx" --q "node pools" -k 3
python -m docs_indexer_ray.cli search --index "$WORK/idx" \
  --q '+node -quota "node pools"' --syntax --highlight body -k 3
python -m docs_indexer_ray.cli phrase --index "$WORK/idx" --q "node pools" -k 3
python -m docs_indexer_ray.cli agg    --index "$WORK/idx" --q "node pools" \
  --kind terms --field lang

# 4. serve over REST (sharded fleet) and exercise the API
python -m docs_indexer_ray.cli serve --index "$WORK/idx" --port "$PORT" --shards 4 &
SRV=$!
sleep 10
curl -s "http://127.0.0.1:$PORT/_search?q=node+pools&k=2&highlight=body&agg_terms=lang"; echo
curl -s "http://127.0.0.1:$PORT/_count?q=node+AND+pools&syntax=1"; echo
# round-3 surface: the JSON query DSL, field sort, scroll, aggs, explain
curl -s -X POST "http://127.0.0.1:$PORT/_search" -d '{
  "query": {"bool": {"must": [{"match": {"body": "node"}}],
                     "should": [{"match_phrase": {"body": "node pools"}}]}},
  "size": 2, "sort": [{"warc_ts": "desc"}],
  "aggs": {"langs": {"terms": {"field": "lang"}},
           "ages": {"date_histogram": {"field": "warc_ts", "fixed_interval": "1h"}}}}'; echo
# round-4 surface: calendar intervals, pipeline aggs, top_hits, date_range
curl -s -X POST "http://127.0.0.1:$PORT/_search" -d '{
  "query": {"match": {"body": "node"}}, "size": 0,
  "aggs": {
    "monthly": {"date_histogram": {"field": "warc_ts", "calendar_interval": "month"},
                "aggs": {"ids": {"sum": {"field": "doc_id"}},
                          "cum": {"cumulative_sum": {"buckets_path": "ids"}}}},
    "newest_per_lang": {"terms": {"field": "lang", "size": 3},
                        "aggs": {"top": {"top_hits": {"size": 2,
                                  "sort": [{"warc_ts": {"order": "desc"}}]}}}}}}' \
  | head -c 400; echo
SCROLL=$(curl -s "http://127.0.0.1:$PORT/_search?q=node&size=3&scroll=1m" | python -c 'import sys, json; print(json.load(sys.stdin)["_scroll_id"])')
curl -s -X POST "http://127.0.0.1:$PORT/_search/scroll" -d "{\"scroll_id\": \"$SCROLL\"}" | head -c 200; echo
curl -s -X POST "http://127.0.0.1:$PORT/_explain?id=0" -d '{"query": {"match": {"body": "node pools"}}}'; echo
curl -s "http://127.0.0.1:$PORT/_cat/indices"; echo
curl -s -X POST "http://127.0.0.1:$PORT/_snapshot?dir=$WORK/snaps&name=s1" -d ''; echo
printf '{"index": {}}\n{"url": "https://docs.test/new/1/", "html": "<html><body><p>fresh bulk doc</p></body></html>", "warc_ts": 1800000000000000}\n' \
  | curl -s -X POST --data-binary @- "http://127.0.0.1:$PORT/_bulk"; echo
curl -s "http://127.0.0.1:$PORT/_count?q=fresh"; echo
curl -s -X POST "http://127.0.0.1:$PORT/_delete_by_query?q=fresh" -d ''; echo
curl -s -X POST "http://127.0.0.1:$PORT/_restore?snapshot=$WORK/snaps/s1&force=1" -d ''; echo
kill "$SRV" 2>/dev/null; wait "$SRV" 2>/dev/null || true
echo "quickstart OK (artifacts under $WORK)"
