"""Training-data operators vs independent Python oracles.

Each Ray op (dedup family, ANN, text stats, multimodal stub) is
checked against a direct, non-distributed reimplementation on the same
deterministic input.
"""

from __future__ import annotations

import hashlib
import itertools
import re

import numpy as np
import pyarrow as pa
import pytest

from docs_indexer_ray.ops.ann import embedding_dup_pairs, knn_cosine, knn_lsh
from docs_indexer_ray.ops.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)
from docs_indexer_ray.ops.multimodal import ImageDecodeStub, decode_images, synth_media_table
from docs_indexer_ray.ops.textstats import (
    STOP10,
    fingerprint,
    lang_id,
    quality_score,
    token_count,
    winnow_fingerprint_batch,
)

_TOK = re.compile(r"[a-z0-9]+")

VOCAB = "table scan merge slow fast key value batch stream the a of to row".split()


def _mk_docs(n=40, dup_every=5) -> pa.Table:
    """Deterministic word-salad docs; every ``dup_every``-th doc has an
    exact copy at id+1000."""
    rs = np.random.RandomState(7)
    ids, texts = [], []
    for i in range(n):
        words = [VOCAB[j] for j in rs.randint(0, len(VOCAB), 30 + (i % 17))]
        ids.append(i)
        texts.append(" ".join(words))
    for i in range(0, n, dup_every):
        ids.append(1000 + i)
        texts.append(texts[i])
    return pa.table({"doc_id": pa.array(ids, pa.int64()), "text": pa.array(texts)})


@pytest.fixture(scope="module")
def docs_ds(ray_session):
    import ray.data

    return ray.data.from_arrow(_mk_docs())


@pytest.fixture(scope="module")
def docs_tbl():
    return _mk_docs()


def _rows(ds):
    return ds.to_pandas()


# ---- textstats ------------------------------------------------------------

def test_token_count_and_quality(docs_ds, docs_tbl):
    got = _rows(token_count(docs_ds)).set_index("doc_id")["n_tokens"].to_dict()
    q = _rows(quality_score(docs_ds)).set_index("doc_id")
    for did, text in zip(docs_tbl["doc_id"].to_pylist(), docs_tbl["text"].to_pylist()):
        toks = _TOK.findall(text.lower())
        assert got[did] == len(toks)
        assert q.loc[did, "n_tokens"] == len(toks)
        assert q.loc[did, "n_chars"] == len(text)
        assert q.loc[did, "stop_ratio"] == sum(w in STOP10 for w in toks) / len(toks)
        assert q.loc[did, "mean_token_len"] == sum(map(len, toks)) / len(toks)


def test_lang_id(docs_ds):
    preds = _rows(lang_id(docs_ds))["pred_lang"]
    assert set(preds) <= {"en", "und"}
    assert (preds == "en").any()  # the vocab contains 'the'/'a'/'of'/'to'


def test_fingerprint_md5_and_winnow(docs_ds, docs_tbl):
    fp = _rows(fingerprint(docs_ds)).set_index("doc_id")
    texts = dict(zip(docs_tbl["doc_id"].to_pylist(), docs_tbl["text"].to_pylist()))
    for did, text in texts.items():
        assert fp.loc[did, "md5"] == hashlib.md5(text.encode()).hexdigest()
    # identical docs → identical winnow sketches
    for i in range(0, 40, 5):
        assert list(fp.loc[i, "winnow"]) == list(fp.loc[1000 + i, "winnow"])
    # sketch is much smaller than the gram count (winnowing compresses)
    assert (fp["n_winnow"] > 0).all()


def test_fnv_batch_matches_scalar():
    from docs_indexer_ray.ops.textstats import _fnv1a64, _fnv1a64_batch

    strs = ["", "a", "table scan merge", "ünïcode ✓", "x" * 100]
    got = _fnv1a64_batch(strs)
    for s, h in zip(strs, got):
        assert int(h) == int(_fnv1a64(s))


def test_winnow_shift_overlap():
    base = "table scan merge slow fast key value batch stream row " * 5
    shifted = "prefix words here " + base
    s1, s2 = winnow_fingerprint_batch([base, shifted])
    inter = set(s1) & set(s2)
    assert len(inter) / len(set(s1)) > 0.5  # winnowing survives shifts


# ---- dedup ----------------------------------------------------------------

def test_exact_dedup(docs_ds, docs_tbl):
    kept = _rows(exact_dedup(docs_ds))
    texts = dict(zip(docs_tbl["doc_id"].to_pylist(), docs_tbl["text"].to_pylist()))
    by_md5 = {}
    for did, text in texts.items():
        by_md5.setdefault(hashlib.md5(text.encode()).hexdigest(), []).append(did)
    want = {md5: min(ids) for md5, ids in by_md5.items()}
    assert dict(zip(kept["md5"], kept["doc_id"])) == want


def _py_jaccard_pairs(texts: dict[int, str], n=3, threshold=0.5):
    grams = {
        did: {
            " ".join(toks[i : i + n])
            for toks in [_TOK.findall(t.lower())]
            for i in range(len(toks) - n + 1)
        }
        for did, t in texts.items()
    }
    out = {}
    for a, b in itertools.combinations(sorted(grams), 2):
        ga, gb = grams[a], grams[b]
        if not ga or not gb:
            continue
        inter = len(ga & gb)
        if inter:
            jac = inter / (len(ga) + len(gb) - inter)
            if jac >= threshold:
                out[(a, b)] = jac
    return out


def test_ngram_jaccard_exact_vs_bruteforce(docs_ds, docs_tbl):
    got = _rows(ngram_jaccard_pairs(docs_ds, n=3, threshold=0.5))
    texts = dict(zip(docs_tbl["doc_id"].to_pylist(), docs_tbl["text"].to_pylist()))
    want = _py_jaccard_pairs(texts)
    got_pairs = {(a, b): j for a, b, j in zip(got["a"], got["b"], got["jaccard"])}
    assert got_pairs == pytest.approx(want)


def test_ngram_jaccard_capped_exact_recount(docs_ds, docs_tbl):
    """With a candidate-generation cap, surviving pairs still report
    exact inter/jaccard (hot grams recounted in the verify pass)."""
    got = _rows(ngram_jaccard_pairs(docs_ds, n=3, threshold=0.5, hot_gram_cap=4))
    texts = dict(zip(docs_tbl["doc_id"].to_pylist(), docs_tbl["text"].to_pylist()))
    want = _py_jaccard_pairs(texts)
    got_pairs = {(a, b): j for a, b, j in zip(got["a"], got["b"], got["jaccard"])}
    # capped discovery may only MISS pairs (never invent or distort)
    for pair, jac in got_pairs.items():
        assert pair in want
        assert jac == pytest.approx(want[pair])
    # the planted exact copies share every gram, incl. non-hot ones →
    # they must survive a cap of 4 on this 40-doc corpus
    for i in range(0, 40, 5):
        assert (i, 1000 + i) in got_pairs


def test_ngram_hot_gram_cap_bounds_emission(ray_session):
    """A planted hot gram (shared by every doc) emits NO candidate
    pairs under the cap; pairs connected by any cool gram survive with
    exact jaccard (the semi-join recount counts hot grams too)."""
    import ray.data

    hot = "alpha beta gamma"  # one 3-gram shared by all docs
    ids, texts = [], []
    for i in range(30):
        # unique filler so unrelated docs share ONLY the hot gram
        filler = " ".join(f"w{i}x{j}" for j in range(12))
        ids.append(i)
        texts.append(f"{hot} {filler}")
    # planted near-dups: exact copies → share cool grams too
    for i in range(0, 30, 10):
        ids.append(1000 + i)
        texts.append(texts[i])
    ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(ids, pa.int64()), "text": pa.array(texts)})
    )
    got = _rows(ngram_jaccard_pairs(ds, n=3, threshold=0.5, hot_gram_cap=5))
    pairs = {(a, b): j for a, b, j in zip(got["a"], got["b"], got["jaccard"])}
    # exact copies found, with jaccard == 1.0 (hot gram included in the
    # recount — inter counts ALL shared grams)
    for i in range(0, 30, 10):
        assert pairs[(i, 1000 + i)] == pytest.approx(1.0)
    # docs sharing only the hot gram never pair up
    for (a, b) in pairs:
        assert b == 1000 + a


def test_ngram_auto_cap_exact_at_small_scale(docs_ds, docs_tbl):
    """hot_gram_cap='auto' == exact mode below the corpus threshold."""
    got = _rows(ngram_jaccard_pairs(docs_ds, n=3, threshold=0.5, hot_gram_cap="auto"))
    want = _rows(ngram_jaccard_pairs(docs_ds, n=3, threshold=0.5, hot_gram_cap=None))
    assert sorted(zip(got["a"], got["b"], got["jaccard"])) == sorted(
        zip(want["a"], want["b"], want["jaccard"])
    )


def test_simhash_kernel_matches_definition(docs_tbl):
    """The vectorized batch kernel == the definitional per-doc loop."""
    import zlib

    from docs_indexer_ray.ops.dedup import _SimHasher, _tokens

    got = _SimHasher("doc_id")(docs_tbl)["simhash"].to_pylist()
    for text, g in zip(docs_tbl["text"].to_pylist(), got):
        acc = np.zeros(64, np.int64)
        counts: dict[str, int] = {}
        for tok in _tokens(text):
            counts[tok] = counts.get(tok, 0) + 1
        for tok, cnt in counts.items():
            h = zlib.crc32(tok.encode()) | (zlib.adler32(tok.encode()) << 32)
            bits = (np.uint64(h) >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
            acc += np.where(bits.astype(bool), cnt, -cnt)
        want = int(np.packbits((acc > 0)[::-1]).view(">u8")[0])
        assert int(g) == want


def test_minhash_finds_planted_dups(docs_ds):
    got = _rows(minhash_lsh_pairs(docs_ds, threshold=0.9))
    pairs = set(zip(got["a"], got["b"]))
    for i in range(0, 40, 5):
        assert (i, 1000 + i) in pairs
    est = dict(zip(zip(got["a"], got["b"]), got["est_jaccard"]))
    for i in range(0, 40, 5):
        assert est[(i, 1000 + i)] == 1.0


def test_simhash_finds_planted_dups(docs_ds):
    got = _rows(simhash_pairs(docs_ds, max_hamming=3))
    pairs = set(zip(got["a"], got["b"]))
    ham = dict(zip(zip(got["a"], got["b"]), got["hamming"]))
    for i in range(0, 40, 5):
        assert (i, 1000 + i) in pairs
        assert ham[(i, 1000 + i)] == 0


# ---- ANN ------------------------------------------------------------------

def _mk_vectors(n=60, dim=16):
    rs = np.random.RandomState(3)
    m = rs.normal(size=(n, dim))
    ids = np.arange(n, dtype=np.int64)
    return ids, m


@pytest.fixture(scope="module")
def vec_ds(ray_session):
    import ray.data

    ids, m = _mk_vectors()
    return ray.data.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(ids),
                "embedding": pa.array([r.tolist() for r in m], pa.list_(pa.float32())),
            }
        )
    )


def test_knn_cosine_vs_numpy(vec_ds):
    ids, m = _mk_vectors()
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    q = np.array(
        pa.table({"e": pa.array([r.tolist() for r in m[:4]], pa.list_(pa.float32()))})[
            "e"
        ].to_pylist(),
        np.float64,
    )  # float32 round-trip exactly as the dataset column stores them
    got = _rows(knn_cosine(vec_ds, q, ids[:4], k=5))
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    sims = qn @ np.array(
        pa.table({"e": pa.array([r.tolist() for r in m], pa.list_(pa.float32()))})[
            "e"
        ].to_pylist(),
        np.float64,
    ).T / np.linalg.norm(m.astype(np.float32).astype(np.float64), axis=1)
    for qi in range(4):
        row = sims[qi].copy()
        row[qi] = -np.inf
        order = sorted(range(len(row)), key=lambda j: (-row[j], j))[:5]
        sub = got[got["query_id"] == qi].sort_values("rank")
        assert sub["neighbor_id"].tolist() == order


def test_knn_lsh_subset_and_self_bucket(vec_ds):
    ids, m = _mk_vectors()
    q = m[:4].astype(np.float32).astype(np.float64)
    got = _rows(knn_lsh(vec_ds, q, ids[:4], k=5, n_planes=4))
    # approximate: results must be valid ids with ranks 1..k, and the
    # bucket always contains the query itself → ≥... at least 1 result/query
    assert set(got["query_id"]) == {0, 1, 2, 3}
    for qi, sub in got.groupby("query_id"):
        assert sub["rank"].tolist() == list(range(1, len(sub) + 1))


def test_embedding_dup_pairs_planted(ray_session):
    import ray.data

    ids, m = _mk_vectors(30)
    ids2 = np.concatenate([ids, ids[::6] + 1000])
    m2 = np.vstack([m, m[::6]])
    ds = ray.data.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(ids2),
                "embedding": pa.array([r.tolist() for r in m2], pa.list_(pa.float32())),
            }
        )
    )
    got = _rows(embedding_dup_pairs(ds, threshold=0.95))
    pairs = set(zip(got["a"], got["b"]))
    for i in ids[::6]:
        assert (i, i + 1000) in pairs


# ---- multimodal stub ------------------------------------------------------

def test_mm_decode_stub_honest_and_fake(ray_session):
    import ray.data

    with pytest.raises(NotImplementedError):
        ImageDecodeStub(fake=False)(synth_media_table(2))

    ds = ray.data.from_arrow(synth_media_table(16))
    out = _rows(decode_images(ds, fake=True))
    assert len(out) == 16
    assert (out["channels"] == 3).all()
    # deterministic: second run identical
    out2 = _rows(decode_images(ds, fake=True))
    assert out.sort_values("media_id").reset_index(drop=True).equals(
        out2.sort_values("media_id").reset_index(drop=True)
    )


def test_mm_resize_embed_frames_stubs(ray_session):
    import ray.data

    from docs_indexer_ray.ops.multimodal import (
        FrameSampleStub,
        ImageEmbedStub,
        ImageResizeStub,
        embed_images,
        resize_images,
        sample_frames,
        synth_media_table,
    )

    media = synth_media_table(16)
    vids = synth_media_table(12, kind="video")

    # honest by default: every stub refuses without fake=True
    for stub in (ImageResizeStub(), ImageEmbedStub(), FrameSampleStub()):
        with pytest.raises(NotImplementedError):
            stub(media)

    # resize: payload size tracks target dims; deterministic
    out = _rows(resize_images(ray.data.from_arrow(media), width=32, height=32, fake=True))
    assert len(out) == 16 and (out["width"] == 32).all()
    assert {len(p) for p in out["payload"]} == {32 * 32 * 3 // 64}

    # embed: unit vectors, dim as requested, deterministic across runs
    e1 = _rows(embed_images(ray.data.from_arrow(media), dim=8, fake=True))
    e2 = _rows(embed_images(ray.data.from_arrow(media), dim=8, fake=True))
    assert all(len(v) == 8 for v in e1["embedding"])
    m1 = np.stack(e1.sort_values("media_id")["embedding"].to_numpy())
    m2 = np.stack(e2.sort_values("media_id")["embedding"].to_numpy())
    assert (m1 == m2).all()
    assert np.allclose(np.linalg.norm(m1, axis=1), 1.0, atol=1e-5)

    # frame sampling: row -> ceil(n_frames / every_n) rows, frames 0,4,8…
    fr = _rows(sample_frames(ray.data.from_arrow(vids), every_n=4, fake=True))
    n_frames = {int(m): p[7] for m, p in zip(vids["media_id"].to_pylist(), vids["payload"].to_pylist())}
    for mid, sub in fr.groupby("media_id"):
        expect = -(-n_frames[int(mid)] // 4)
        assert len(sub) == expect
        assert sorted(sub["frame"]) == list(range(0, n_frames[int(mid)], 4))


def test_sample_by_hash_deterministic_and_exact(docs_ds, docs_tbl):
    import hashlib as _h

    from docs_indexer_ray.ops.sample import hash_prefixes, sample_by_hash

    assert hash_prefixes(1 / 16) == {"0"}
    assert hash_prefixes(3 / 16) == {"0", "1", "2"}
    assert len(hash_prefixes(10 / 256, bits=2)) == 10
    with pytest.raises(ValueError):
        hash_prefixes(1 / 256)  # not representable with 1 hex digit

    got = _rows(sample_by_hash(docs_ds, key="text", rate=4 / 16))
    want = {
        did
        for did, t in zip(docs_tbl["doc_id"].to_pylist(), docs_tbl["text"].to_pylist())
        if _h.md5(t.encode()).hexdigest()[0] in "0123"
    }
    assert set(got["doc_id"]) == want
    # rerun → identical selection
    got2 = _rows(sample_by_hash(docs_ds, key="text", rate=4 / 16))
    assert sorted(got2["doc_id"]) == sorted(got["doc_id"])


def test_hll_sketch_accuracy_and_invariance(ray_session):
    import ray.data

    from docs_indexer_ray.ops.sketch import HLL, approx_distinct

    # scalar-FNV cross-check of the vectorized position-wise hash
    from docs_indexer_ray.ops.sketch import _fnv1a_str

    def fnv_scalar(s: str) -> int:
        h = 0xCBF29CE484222325
        for byte in s.encode("utf-8"):
            h = ((h ^ byte) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
        return h

    vals = ["", "a", "abc", "ünïcode", "x" * 100]
    assert _fnv1a_str(vals).tolist() == [fnv_scalar(v) for v in vals]

    # direct accuracy: 60k distinct int keys at p=14 → ±~0.8% σ
    true_n = 60_000
    sk = HLL(p=14)
    sk.add_hashes(
        __import__("docs_indexer_ray.ops.sketch", fromlist=["_splitmix64"])._splitmix64(
            np.arange(true_n, dtype=np.int64).view(np.uint64)
        )
    )
    assert abs(sk.estimate() - true_n) / true_n < 0.04

    # merge(A) ∪ merge(B) ≡ sketch(A+B); idempotent self-merge
    a, b = HLL(12), HLL(12)
    ha = np.arange(0, 5000, dtype=np.int64)
    hb = np.arange(2500, 9000, dtype=np.int64)
    from docs_indexer_ray.ops.sketch import _splitmix64

    a.add_hashes(_splitmix64(ha.view(np.uint64)))
    b.add_hashes(_splitmix64(hb.view(np.uint64)))
    ab = HLL(12).add_hashes(
        _splitmix64(np.concatenate([ha, hb]).view(np.uint64))
    )
    merged = a.merge(b)
    assert np.array_equal(merged.registers, ab.registers)
    assert np.array_equal(merged.merge(ab).registers, ab.registers)

    # small-range exactness: linear counting kicks in
    tiny = HLL(14).add_hashes(_splitmix64(np.arange(300, dtype=np.int64).view(np.uint64)))
    assert abs(tiny.estimate() - 300) <= 6

    # Ray path: parallelism-invariant (same estimate at any split)
    n = 20_000
    t = pa.table({"k": pa.array([f"key-{i % 7000}" for i in range(n)], pa.string())})
    est4 = approx_distinct(ray.data.from_arrow(t).repartition(4), "k")
    est13 = approx_distinct(ray.data.from_arrow(t).repartition(13), "k")
    assert est4 == est13
    assert abs(est4 - 7000) / 7000 < 0.04

    # int column path
    ti = pa.table({"k": pa.array(np.arange(9000, dtype=np.int64) % 4000, pa.int64())})
    esti = approx_distinct(ray.data.from_arrow(ti).repartition(5), "k")
    assert abs(esti - 4000) / 4000 < 0.04

    with pytest.raises(ValueError):
        HLL(3)
    with pytest.raises(ValueError):
        HLL(12).merge(HLL(13))

    # nulls ignored (SQL count(DISTINCT) semantics) and "" distinct from null
    tn = pa.table({"k": pa.array(["a", None, "", "a", None], pa.string())})
    assert approx_distinct(ray.data.from_arrow(tn), "k") == 2


def test_tdigest_accuracy_merge_and_edges():
    from docs_indexer_ray.ops.sketch import TDigest

    rng = np.random.default_rng(7)
    x = rng.lognormal(3, 1.5, 100_000)
    td = TDigest(200)
    for chunk in np.array_split(x, 23):  # merge path, like block partials
        td.merge(TDigest(200).add(chunk))
    assert len(td.means) < 3 * 200  # compressed, constant-size state
    for q, tol in [(0.25, 0.02), (0.5, 0.02), (0.75, 0.02), (0.95, 0.03), (0.99, 0.05)]:
        true = float(np.quantile(x, q))
        est = td.quantile(q)
        assert abs(est - true) / true < tol, (q, true, est)

    # min/max ends are exact-ish (weight-1 extreme centroids)
    assert td.quantile(0.0) == pytest.approx(x.min(), rel=1e-9)
    assert td.quantile(1.0) == pytest.approx(x.max(), rel=1e-9)

    # row round-trip preserves the digest exactly
    rt = TDigest.from_row(td.to_row())
    assert np.array_equal(rt.means, td.means) and np.array_equal(
        rt.weights, td.weights
    )

    # edges: empty, singleton, NaN dropped, bad params
    assert TDigest().quantile(0.5) is None
    assert TDigest().add(np.array([42.0])).quantile(0.9) == 42.0
    assert TDigest().add(np.array([np.nan, 7.0])).quantile(0.5) == 7.0
    with pytest.raises(ValueError):
        TDigest(5)
    with pytest.raises(ValueError):
        TDigest(100).merge(TDigest(200))


def test_connected_components_and_canonical(ray_session):
    import ray.data

    from docs_indexer_ray.ops.components import canonical_docs, connected_components

    # chain (diameter 3), triangle, isolated edge — mixed topologies
    pairs = pa.table(
        {
            "a": pa.array([0, 1, 2, 10, 10, 11, 20], pa.int64()),
            "b": pa.array([1, 2, 3, 11, 12, 12, 21], pa.int64()),
        }
    )
    t = connected_components(ray.data.from_arrow(pairs).repartition(3)).sort_by(
        "node"
    )
    got = dict(zip(t["node"].to_pylist(), t["component"].to_pylist()))
    assert got == {0: 0, 1: 0, 2: 0, 3: 0, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}

    # the distributed hash-to-min rounds agree with the driver fold
    cc_d = connected_components(
        ray.data.from_arrow(pairs), num_buckets=2, mode="distributed"
    )
    parts = [ray.get(r) for r in cc_d.to_arrow_refs()]
    td = pa.concat_tables([p for p in parts if p.num_rows]).sort_by("node")
    assert td.equals(t)

    # canonical filter: keep cluster minima + untouched docs
    docs = pa.table({"doc_id": pa.array(list(range(25)), pa.int64())})
    kept = canonical_docs(ray.data.from_arrow(docs).repartition(4), t)
    k = sorted(
        pa.concat_tables(
            [p for p in (ray.get(r) for r in kept.to_arrow_refs()) if p.num_rows]
        )["doc_id"].to_pylist()
    )
    clustered = set(got)
    want = sorted(
        d for d in range(25) if d not in clustered or got[d] == d
    )
    assert k == want

    # long path with ADVERSARIAL (shuffled) ids: pointer jumping +
    # both-direction scatter still converge
    n = 64
    rs = np.random.RandomState(3)
    perm = rs.permutation(10_000)[:n]
    path = pa.table(
        {
            "a": pa.array(perm[:-1], pa.int64()),
            "b": pa.array(perm[1:], pa.int64()),
        }
    )
    t2 = connected_components(ray.data.from_arrow(path).repartition(7))
    assert set(t2["component"].to_pylist()) == {int(perm.min())}
    assert t2.num_rows == n

    # backstop fires when no rounds are allowed
    with pytest.raises(RuntimeError, match="converge"):
        connected_components(ray.data.from_arrow(path), max_iter=0)
    with pytest.raises(ValueError, match="mode"):
        connected_components(ray.data.from_arrow(path), mode="nope")


def test_connected_components_auto_switch_boundary(ray_session, caplog):
    """``mode="auto"`` picks driver at/below the edge budget and
    distributed above it — and the two sides of the boundary label a
    planted edge set IDENTICALLY (same clusters, same canonical
    minima), so the switch is invisible to callers beyond the
    table-vs-Dataset return type."""
    import logging

    import ray
    import ray.data

    from docs_indexer_ray.ops.components import connected_components

    # two chains + an isolated edge: 7 edges
    pairs = pa.table(
        {
            "a": pa.array([3, 4, 5, 40, 41, 42, 90], pa.int64()),
            "b": pa.array([4, 5, 6, 41, 42, 43, 91], pa.int64()),
        }
    )
    want = {3: 3, 4: 3, 5: 3, 6: 3, 40: 40, 41: 40, 42: 40, 43: 40, 90: 90, 91: 90}

    with caplog.at_level(logging.INFO, "docs_indexer_ray.ops.components"):
        # budget ≥ edges → driver fold, returns an Arrow table
        t_drv = connected_components(
            ray.data.from_arrow(pairs).repartition(3), driver_edge_budget=7
        )
        assert isinstance(t_drv, pa.Table)
        # budget < edges → hash-to-min rounds, returns a Dataset
        ds_dist = connected_components(
            ray.data.from_arrow(pairs).repartition(3),
            driver_edge_budget=6,
            num_buckets=2,
        )
        assert not isinstance(ds_dist, pa.Table)
    assert "auto mode: 7 edges → driver" in caplog.text
    assert "auto mode: 7 edges → distributed" in caplog.text

    parts = [p for p in (ray.get(r) for r in ds_dist.to_arrow_refs()) if p.num_rows]
    t_dist = pa.concat_tables(parts).sort_by("node")
    assert t_dist.equals(t_drv.sort_by("node"))
    got = dict(zip(t_drv["node"].to_pylist(), t_drv["component"].to_pylist()))
    assert got == want


def test_connected_components_drops_null_edges(ray_session):
    """A null endpoint must be dropped, not float-cast to INT64_MIN —
    the pseudo-node would win every min fold and mislabel its whole
    cluster (canonical_docs would then delete every real member)."""
    import ray.data

    from docs_indexer_ray.ops.components import connected_components

    pairs = pa.table(
        {
            "a": pa.array([5, None, 7], pa.int64()),
            "b": pa.array([6, 6, None], pa.int64()),
        }
    )
    for mode in ("driver", "distributed"):
        t = connected_components(ray.data.from_arrow(pairs), mode=mode)
        if mode == "distributed":
            import ray as _ray

            parts = [p for p in (_ray.get(r) for r in t.to_arrow_refs()) if p.num_rows]
            t = pa.concat_tables(parts)
        got = dict(zip(t["node"].to_pylist(), t["component"].to_pylist()))
        assert got == {5: 5, 6: 5}, (mode, got)


def test_redact_pii_and_normalize_whitespace(ray_session):
    import ray.data

    from docs_indexer_ray.ops.textclean import normalize_whitespace, redact_pii

    t = pa.table(
        {
            "text": pa.array(
                [
                    "mail a.b+c@sub.ex.co and 192.168.0.1 call +44 20 7946 0958 ok",
                    "no pii here",
                    None,
                    "two mails x@y.io z@w.org, ip 8.8.8.8",
                    "short digits 12345 stay",
                ],
                pa.string(),
            )
        }
    )
    out = pa.concat_tables(
        [ray.get(r) for r in redact_pii(ray.data.from_arrow(t), "text").to_arrow_refs()]
    )
    got = out["text"].to_pylist()
    assert got[0] == "mail <EMAIL> and <IP> call <PHONE> ok"
    assert got[1] == "no pii here"
    assert got[2] is None
    assert got[3] == "two mails <EMAIL> <EMAIL>, ip <IP>"
    assert got[4] == "short digits 12345 stay"

    t2 = pa.table({"text": pa.array(["  a \t b\n\nc  ", None], pa.string())})
    ws = pa.concat_tables(
        [
            ray.get(r)
            for r in normalize_whitespace(ray.data.from_arrow(t2), "text").to_arrow_refs()
        ]
    )
    assert ws["text"].to_pylist() == ["a b c", None]


def test_stratified_sample_by_hash(ray_session):
    import hashlib

    import ray.data

    from docs_indexer_ray.ops.sample import stratified_sample_by_hash

    n = 800
    t = pa.table(
        {
            "k": pa.array([f"key-{i}" for i in range(n)], pa.string()),
            "g": pa.array(["a", "b", "c", "d"][0:2] * (n // 2), pa.string()),
        }
    )
    ds = ray.data.from_arrow(t).repartition(5)
    out = stratified_sample_by_hash(
        ds, key="k", group_col="g", rates={"a": 4 / 16, "b": 1 / 16}
    )
    got = pa.concat_tables([ray.get(r) for r in out.to_arrow_refs()])
    rows = set(zip(got["k"].to_pylist(), got["g"].to_pylist()))

    def hx(v):
        return hashlib.md5(v.encode()).hexdigest()[0]

    want = {
        (f"key-{i}", g)
        for i, g in zip(range(n), ["a", "b"] * (n // 2))
        if (g == "a" and hx(f"key-{i}") in "0123")
        or (g == "b" and hx(f"key-{i}") in "0")
    }
    assert rows == want
    # nested property: the 1/16 'b' subset is inside the 4/16 'a' rule's set
    b_keys = {k for k, g in rows if g == "b"}
    assert all(hx(k) == "0" for k in b_keys)
    # unknown groups drop by default; default_rate admits them
    t2 = pa.table({"k": pa.array(["x"] * 8), "g": pa.array(["zz"] * 8)})
    none = stratified_sample_by_hash(
        ray.data.from_arrow(t2), "k", "g", {"a": 0.5}
    )
    assert sum(len(ray.get(r)) for r in none.to_arrow_refs()) == 0
    # invariance across partitionings
    out13 = stratified_sample_by_hash(
        ray.data.from_arrow(t).repartition(13), "k", "g", {"a": 4 / 16, "b": 1 / 16}
    )
    got13 = pa.concat_tables([ray.get(r) for r in out13.to_arrow_refs()])
    assert set(zip(got13["k"].to_pylist(), got13["g"].to_pylist())) == rows


def test_bloom_filter_no_false_negatives_and_ray_path(ray_session):
    import ray.data

    from docs_indexer_ray.ops.sketch import (
        BloomFilter,
        bloom_from_dataset,
        filter_unseen,
    )

    # direct: never a false negative; FP rate in the envelope
    bf = BloomFilter.sized(5_000, 0.01)
    seen = pa.array([f"u{i}" for i in range(5_000)], pa.string())
    bf.add_column(seen)
    assert bf.contains_column(seen).all()
    fresh = pa.array([f"new{i}" for i in range(50_000)], pa.string())
    assert bf.contains_column(fresh).mean() < 0.03

    # distributed build ≡ direct build (OR-merge is lossless)
    ds = ray.data.from_arrow(pa.table({"url": seen})).repartition(7)
    bf2 = bloom_from_dataset(ds, "url", capacity=5_000, fp_rate=0.01)
    assert np.array_equal(bf.bits, bf2.bits)

    # admission filter: every admitted row is genuinely new, every
    # dropped-new row is a (rare) false positive
    probe = pa.table(
        {"url": pa.array([f"u{i}" for i in range(100)] + [f"x{i}" for i in range(900)])}
    )
    out = filter_unseen(ray.data.from_arrow(probe).repartition(3), "url", bf2)
    admitted = set(
        pa.concat_tables([ray.get(r) for r in out.to_arrow_refs()])["url"].to_pylist()
    )
    assert not any(u.startswith("u") for u in admitted)  # no seen url re-admitted
    assert len(admitted) >= 850  # ≥ 94% of the 900 new survive at 1% fp

    # nulls test False (never "seen")
    withnull = pa.array(["u1", None, "zz"], pa.string())
    got = bf.contains_column(withnull)
    assert got.tolist()[0] is np.True_ or got.tolist()[0] == True  # noqa: E712
    assert not got[1]

    with pytest.raises(ValueError):
        BloomFilter(7, 3)
    with pytest.raises(ValueError):
        BloomFilter(64, 3).merge(BloomFilter(128, 3))


def test_cardinality_approx_matches_exact_within_error(ray_session):
    import ray.data

    from docs_indexer_ray.query.facets import cardinality

    n = 10_000
    docs = pa.table(
        {
            "doc_id": pa.array(np.arange(n), pa.int64()),
            "v": pa.array([f"v{i % 900}" for i in range(n)], pa.string()),
        }
    )
    ds = ray.data.from_arrow(docs).repartition(6)
    matched = np.arange(0, n, 2, dtype=np.int64)
    exact = cardinality(ds, matched, "v")["n_unique"][0].as_py()
    approx = cardinality(ds, matched, "v", approx=True)["n_unique"][0].as_py()
    assert abs(approx - exact) / exact < 0.05
    assert (
        cardinality(ds, np.empty(0, np.int64), "v", approx=True)["n_unique"][0].as_py()
        == 0
    )


def test_gopher_quality_rules(ray_session):
    """Planted docs exercise every Gopher rule branch: a clean doc
    passes; heavy 2-gram repetition, duplicated 5-grams, digit soup,
    stopword-free text and a too-short doc each fail their rule."""
    import ray.data

    from docs_indexer_ray.ops.textstats import gopher_quality

    clean = (
        "the quick brown fox jumps over a lazy dog and then runs far "
        "away to find some fresh water in the old green valley where "
        "many small birds sing songs for hours during warm summer days"
    )
    rep2 = "spam ham " * 40  # one dominant bigram
    # duplicated 5-gram: the same 5-word run appears 4x amid filler
    run = "alpha beta gamma delta epsilon "
    filler = (
        "one more word here and the other words continue along the path "
    )
    dup5 = (run + filler) * 4
    digits = " ".join(str(i) for i in range(40)) + " the of and to in"
    nostop = "word " * 10 + " ".join(f"tok{i}" for i in range(30))
    short = "the cat sat on a mat"

    tbl = pa.table(
        {
            "doc_id": pa.array(range(6), pa.int64()),
            "text": pa.array([clean, rep2, dup5, digits, nostop, short]),
        }
    )
    out = (
        gopher_quality(ray.data.from_arrow(tbl), min_words=20)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert out.loc[0, "passes"] == 1
    assert out.loc[1, "passes"] == 0 and out.loc[1, "top2gram_frac"] > 0.2
    assert out.loc[2, "passes"] == 0 and out.loc[2, "dup5gram_frac"] > 0.15
    assert out.loc[3, "passes"] == 0 and out.loc[3, "alpha_frac"] < 0.8
    assert out.loc[4, "passes"] == 0 and out.loc[4, "n_stop_distinct"] < 2
    assert out.loc[5, "passes"] == 0 and out.loc[5, "n_words"] < 20
    # ratio sanity: dup5 coverage of doc 2 counts every repeated run
    assert 0.0 <= out["dup5gram_frac"].max() <= 1.0


def test_pack_sequences_semantics(ray_session):
    """Packing digest: EOS per doc (even empty), short final chunk,
    bucket independence (stream restarts per bucket), vocab-rank ids."""
    import ray.data

    from docs_indexer_ray.ops.pack import collect_vocab, pack_sequences

    tbl = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 100], pa.int64()),
            "text": pa.array(["b a c", "", "a a a a", "c b"]),
        }
    )
    ds = ray.data.from_arrow(tbl)
    vocab = collect_vocab(ds, text_col="text")
    assert vocab.tolist() == ["a", "b", "c"]  # ids a=0 b=1 c=2, EOS=3

    out = (
        pack_sequences(ray.data.from_arrow(tbl), vocab, seq_len=4, bucket_size=100)
        .to_pandas()
        .sort_values(["bucket", "seq"], ignore_index=True)
    )
    # bucket 0 stream: b a c EOS | EOS | a a a a EOS -> [1,0,2,3, 3,0,0,0, 0,3]
    b0 = out[out.bucket == 0]
    assert b0["n_tokens"].tolist() == [4, 4, 2]
    assert b0["sum_ids"].tolist() == [6, 3, 3]
    assert b0["first_id"].tolist() == [1, 3, 0]
    assert b0["last_id"].tolist() == [3, 0, 3]
    # bucket 1 restarts: c b EOS -> one short sequence
    b1 = out[out.bucket == 1]
    assert b1["n_tokens"].tolist() == [3]
    assert b1["sum_ids"].tolist() == [2 + 1 + 3]
    # partition invariance: same digests from a many-block dataset
    out2 = (
        pack_sequences(
            ray.data.from_arrow(tbl).repartition(4), vocab, seq_len=4, bucket_size=100
        )
        .to_pandas()
        .sort_values(["bucket", "seq"], ignore_index=True)
    )
    assert out.equals(out2)


def test_pack_ids_materializes_the_digested_stream(ray_session):
    """pack_ids returns the REAL id arrays; their per-sequence digest
    must equal pack_sequences' digest-only kernel, and the arrays
    themselves must equal the scalar concatenate-and-slice reference.
    Also composes with bpe_encode output."""
    import ray.data

    from docs_indexer_ray.ops.pack import (
        collect_vocab,
        pack_ids,
        pack_sequences,
        tokenize_to_ids,
    )

    tbl = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 100], pa.int64()),
            "text": pa.array(["b a c", "", "a a a a", "c b"]),
        }
    )
    vocab = collect_vocab(ray.data.from_arrow(tbl), text_col="text")
    eos = len(vocab)

    for parts in (1, 4):
        ds = ray.data.from_arrow(tbl).repartition(parts)
        enc = tokenize_to_ids(ds, vocab)
        packed = (
            pack_ids(enc, seq_len=4, eos_id=eos, bucket_size=100)
            .to_pandas()
            .sort_values(["bucket", "seq"], ignore_index=True)
        )
        # scalar reference: concatenate per bucket in doc order, slice
        want = {
            0: [1, 0, 2, eos, eos, 0, 0, 0, 0, eos],  # docs 0,1,2
            1: [2, 1, eos],  # doc 100
        }
        for bucket, stream in want.items():
            rows = packed[packed.bucket == bucket]
            got = [x for ids in rows["input_ids"] for x in ids]
            assert got == stream, bucket
            assert all(len(ids) <= 4 for ids in rows["input_ids"])
            assert rows["n_tokens"].tolist() == [
                len(ids) for ids in rows["input_ids"]
            ]

        # digest of the real arrays == the digest-only kernel
        dig = (
            pack_sequences(ds, vocab, seq_len=4, bucket_size=100)
            .to_pandas()
            .sort_values(["bucket", "seq"], ignore_index=True)
        )
        assert packed["bucket"].tolist() == dig["bucket"].tolist()
        assert packed["seq"].tolist() == dig["seq"].tolist()
        assert packed["n_tokens"].tolist() == dig["n_tokens"].tolist()
        assert [
            sum(ids) for ids in packed["input_ids"]
        ] == dig["sum_ids"].tolist()
        assert [ids[0] for ids in packed["input_ids"]] == dig["first_id"].tolist()
        assert [ids[-1] for ids in packed["input_ids"]] == dig["last_id"].tolist()

    # composes with trained-BPE ids (eos = |vocab|+2, clear of unk)
    from docs_indexer_ray.ops.bpe import bpe_encode, bpe_vocab, train_bpe, word_counts

    ds = ray.data.from_arrow(tbl)
    wc = word_counts(ds)
    merges = train_bpe(wc, n_merges=5)
    bvocab = bpe_vocab(wc, merges)
    enc = bpe_encode(ds, merges, bvocab, concurrency=1)
    packed = pack_ids(enc, seq_len=8, eos_id=len(bvocab) + 2).to_pandas()
    n_ids = enc.to_pandas()["n_tokens"].sum()
    assert packed["n_tokens"].sum() == n_ids + 4  # one EOS per doc


def test_canonicalize_urls_rules(ray_session):
    """URL canon chain: each rule and the things it must NOT touch."""
    import ray.data

    from docs_indexer_ray.ops.textclean import canonicalize_urls

    cases = [
        ("https://www.ex.com:443/a/?utm_source=x#f", "https://ex.com/a"),
        ("http://ex.com:80/", "http://ex.com/"),            # root slash kept
        ("https://ex.com/p?id=3&utm_b=1", "https://ex.com/p?id=3"),
        ("https://ex.com/p?utm_a=1&id=3", "https://ex.com/p?id=3"),
        ("https://ex.com/p?a=1&b=2", "https://ex.com/p?a=1&b=2"),  # kept
        ("https://ex.com:8443/p", "https://ex.com:8443/p"),  # non-default port kept
        ("https://sub.www.ex.com/p", "https://sub.www.ex.com/p"),  # only LEADING www.
        ("https://ex.com/CasePath/", "https://ex.com/CasePath"),   # case kept
        # param names merely ENDING in 'ref' are not tracking params
        ("http://ex.com/r?href=target&x=1", "http://ex.com/r?href=target&x=1"),
        ("http://ex.com/p?pref=blue&x=1", "http://ex.com/p?pref=blue&x=1"),
        # ':80' in a PATH is content; :443 is NOT http's default port
        ("http://ex.com/path:80/more", "http://ex.com/path:80/more"),
        ("http://ex.com:443/x", "http://ex.com:443/x"),
        # consecutive tracking params collapse in one pass
        ("https://ex.com/p?utm_a=1&utm_b=2&x=1", "https://ex.com/p?x=1"),
        ("https://ex.com/p?utm_a=1&utm_b=2", "https://ex.com/p"),
    ]
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(cases)), pa.int64()),
            "url": pa.array([c[0] for c in cases]),
        }
    )
    out = (
        canonicalize_urls(ray.data.from_arrow(tbl))
        .to_pandas()
        .sort_values("doc_id")["url_canon"]
        .tolist()
    )
    assert out == [c[1] for c in cases]


def test_decontamination_flags(ray_session):
    """GPT-3 dirty-n-gram rule: planted eval overlap flags the doc,
    repeated dirty grams count per occurrence, short docs never flag."""
    import ray.data

    from docs_indexer_ray.ops.decontaminate import flag_contaminated, ngram_set

    eval_texts = ["the quick brown fox jumps over the lazy dog"]
    grams = ngram_set(eval_texts, n=4)
    assert "the quick brown fox" in grams and len(grams) == 6

    corpus = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
            "text": pa.array(
                [
                    "intro text the quick brown fox jumps here",  # one dirty 4-gram run
                    "fox jumps over the lazy dog fox jumps over the lazy dog",  # repeats
                    "totally clean document with no overlap at all",
                    "the quick brown",  # shorter than n: never dirty
                ]
            ),
        }
    )
    out = (
        flag_contaminated(ray.data.from_arrow(corpus), grams, n=4)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert out.loc[0, "contaminated"] == 1 and out.loc[0, "n_hits"] == 2
    assert out.loc[1, "contaminated"] == 1 and out.loc[1, "n_hits"] > 2
    assert out.loc[2, "contaminated"] == 0 and out.loc[2, "n_hits"] == 0
    assert out.loc[3, "contaminated"] == 0


def test_temperature_resample_rates(ray_session):
    """α-temperature rates: α=1 ≡ plain out_frac everywhere; α=0.5
    gives rare groups a strictly higher keep-rate; α=0 equalizes
    target COUNTS (rate ∝ 1/n); rates snap to the 256-slot grid and
    the sampled subset is parallelism-invariant."""
    import ray.data

    from docs_indexer_ray.ops.sample import temperature_resample

    rows = 6 * ["big"] * 50 + ["rare"] * 60  # 300 big / 60 rare
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(rows)), pa.int64()),
            "grp": pa.array(rows),
            "text": pa.array([f"doc {i} text" for i in range(len(rows))]),
        }
    )
    ds = ray.data.from_arrow(tbl)

    _, r_flat = temperature_resample(ds, "grp", alpha=1.0, out_frac=0.5)
    assert r_flat["big"] == r_flat["rare"] == 0.5

    _, r_half = temperature_resample(ds, "grp", alpha=0.5, out_frac=0.5)
    assert r_half["rare"] > r_half["big"]
    assert all(abs(v * 256 - round(v * 256)) < 1e-12 for v in r_half.values())

    _, r_zero = temperature_resample(ds, "grp", alpha=0.0, out_frac=0.2)
    # equal target counts (out_frac low enough that nothing clamps):
    # n_s * r_s ≈ const within slot granularity
    assert max(r_zero.values()) < 1.0
    assert abs(300 * r_zero["big"] - 60 * r_zero["rare"]) <= (300 + 60) / 256

    s1, _ = temperature_resample(ds, "grp", alpha=0.5, out_frac=0.5)
    s2, _ = temperature_resample(ds.repartition(7), "grp", alpha=0.5, out_frac=0.5)
    a = sorted(s1.to_pandas()["doc_id"])
    b = sorted(s2.to_pandas()["doc_id"])
    assert a == b and len(a) > 0


def test_percolate_semantics(ray_session):
    """Reverse search: conjunctive containment, multi-query overlap,
    empty-doc immunity, candidate pre-filter correctness."""
    import ray.data

    from docs_indexer_ray.query.percolate import percolate

    docs = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
            "text": pa.array(
                [
                    "alpha beta gamma",
                    "alpha only here",
                    "",
                    "beta alpha beta",  # order/repeats don't matter
                ]
            ),
        }
    )
    stored = {10: ["alpha", "beta"], 20: ["alpha"], 30: ["zeta"]}
    out = (
        percolate(ray.data.from_arrow(docs), stored)
        .to_pandas()
        .sort_values(["doc_id", "query_id"], ignore_index=True)
    )
    got = list(map(tuple, out.to_numpy()))
    assert got == [(0, 10), (0, 20), (1, 20), (3, 10), (3, 20)]


def test_pca_fit_transform(ray_session):
    """Distributed PCA: matches a single-process numpy reference,
    eigenvalues descending, orthonormal basis, optimal reconstruction,
    partition-invariant to ~1e-8, composes with kNN."""
    import ray.data

    from docs_indexer_ray.ops.pca import fit_pca, transform_pca

    rng = np.random.RandomState(7)
    # anisotropic cloud: two dominant directions in 8-d
    base = rng.randn(400, 8) * np.array([5.0, 3.0, 1, 1, 0.5, 0.5, 0.2, 0.1])
    q, _ = np.linalg.qr(rng.randn(8, 8))
    x = base @ q + rng.randn(8) * 2
    tbl = pa.table(
        {
            "vec_id": pa.array(range(400), pa.int64()),
            "embedding": pa.array([row.tolist() for row in x.astype(np.float32)],
                                   pa.list_(pa.float32())),
        }
    )
    xf = np.array(tbl["embedding"].to_pylist(), np.float64)

    ds = ray.data.from_arrow(tbl)
    mean, comps, ev = fit_pca(ds, k=3)

    # numpy reference on the same float32-rounded data
    mu_ref = xf.mean(axis=0)
    cov_ref = np.cov(xf, rowvar=False)
    w_ref = np.sort(np.linalg.eigvalsh(cov_ref))[::-1][:3]
    assert np.allclose(mean, mu_ref, atol=1e-8)
    assert np.allclose(ev, w_ref, rtol=1e-8)
    assert ev[0] >= ev[1] >= ev[2] > 0
    assert np.allclose(comps @ comps.T, np.eye(3), atol=1e-10)

    out = transform_pca(ds, mean, comps).to_pandas().sort_values("vec_id")
    y = np.array(out["pca"].tolist(), np.float64)
    assert y.shape == (400, 3)
    # projected variance per axis tracks the eigenvalues
    assert np.allclose(y.var(axis=0, ddof=1), ev, rtol=1e-3)
    # PCA reconstruction beats any random 3-d basis
    recon = y @ comps + mean
    err_pca = ((xf - recon) ** 2).sum()
    rb, _ = np.linalg.qr(rng.randn(8, 3))
    yr = (xf - mu_ref) @ rb
    err_rand = ((xf - (yr @ rb.T + mu_ref)) ** 2).sum()
    assert err_pca < err_rand * 0.9

    # partition invariance (moment folds commute to ~ulp)
    mean2, comps2, ev2 = fit_pca(ray.data.from_arrow(tbl).repartition(7), k=3)
    assert np.allclose(mean2, mean, atol=1e-9)
    assert np.allclose(np.abs(comps2 @ comps.T), np.eye(3), atol=1e-6)
    assert np.allclose(ev2, ev, rtol=1e-8)


def test_pagerank_power_iteration():
    """pagerank over a small planted graph matches a dense numpy
    power iteration bit-for-bit in structure (1e-12), handles dangling
    nodes, sums to 1, and is partition-invariant to quantization."""
    import ray.data

    from docs_indexer_ray.ops.pagerank import pagerank

    n = 60
    src = np.arange(n - 10, dtype=np.int64)  # last 10 nodes dangling
    dst1 = (src * src + 3) % n
    dst2 = (7 * src + 3) % n
    edges = pa.table(
        {
            "src": pa.array(np.concatenate([src, src])),
            "dst": pa.array(np.concatenate([dst1, dst2])),
        }
    )
    out = pagerank(ray.data.from_arrow(edges), n_nodes=n, iterations=12)
    r = out["rank"].to_numpy(zero_copy_only=False)

    # dense numpy reference with the same dangling redistribution
    d = 0.85
    outdeg = np.zeros(n)
    np.add.at(outdeg, np.concatenate([src, src]), 1.0)
    ref = np.full(n, 1.0 / n)
    for _ in range(12):
        contrib = np.zeros(n)
        w = ref[np.concatenate([src, src])] / outdeg[np.concatenate([src, src])]
        np.add.at(contrib, np.concatenate([dst1, dst2]), w)
        dangling = ref[outdeg == 0].sum()
        ref = (1 - d) / n + d * (contrib + dangling / n)
    assert np.allclose(r, ref, atol=1e-12)
    assert abs(r.sum() - 1.0) < 1e-9
    # dangling nodes still hold the base + redistributed mass
    assert (r[-10:] > 0).all()

    # partition invariance (shuffle order only moves ~1e-15)
    out2 = pagerank(
        ray.data.from_arrow(edges).repartition(5), n_nodes=n, iterations=12
    )
    r2 = out2["rank"].to_numpy(zero_copy_only=False)
    assert np.allclose(r2, r, atol=1e-12)


def test_pagerank_join_mode_matches_broadcast():
    """mode="join" (rank vector never on the driver; edges⋈ranks →
    groupby → node left-join per round) agrees with the broadcast
    mode to shuffle-order noise, dangling nodes included."""
    import ray.data

    from docs_indexer_ray.ops.pagerank import pagerank

    n = 60
    src = np.arange(n - 10, dtype=np.int64)  # last 10 nodes dangling
    edges = pa.table(
        {
            "src": pa.array(np.concatenate([src, src])),
            "dst": pa.array(
                np.concatenate([(src * src + 3) % n, (7 * src + 3) % n])
            ),
        }
    )
    bcast = pagerank(ray.data.from_arrow(edges), n_nodes=n, iterations=6)
    joined = pagerank(
        ray.data.from_arrow(edges).repartition(4),
        n_nodes=n,
        iterations=6,
        mode="join",
        num_buckets=8,
    )
    assert joined["node"].to_pylist() == bcast["node"].to_pylist()
    a = joined["rank"].to_numpy(zero_copy_only=False)
    b = bcast["rank"].to_numpy(zero_copy_only=False)
    assert np.allclose(a, b, atol=1e-12)
    assert abs(a.sum() - 1.0) < 1e-9


def test_line_filter_rules_and_edges():
    """line_filter drops short/boilerplate lines, keeps order, applies
    the integer keep-fraction, and survives edge inputs (empty text,
    all lines dropped, terminal-punct opt-in)."""
    import ray.data

    from docs_indexer_ray.ops.textclean import line_filter

    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
            "text": pa.array(
                [
                    "All rights reserved.\ngood words in this line\nok",
                    "",
                    "Sentence one ends here.\nno punct line words",
                    "one two three four.",
                ]
            ),
        }
    )
    ds = ray.data.from_arrow(t)
    out = {
        r["doc_id"]: r
        for r in pa.concat_tables(
            [
                x
                for x in (
                    __import__("ray").get(b)
                    for b in line_filter(ds).to_arrow_refs()
                )
                if x.num_rows
            ]
        ).to_pylist()
    }
    # doc 0: boilerplate + good + short -> 1/3 kept, doc dropped
    assert (out[0]["n_lines"], out[0]["n_kept"], out[0]["kept"]) == (3, 1, False)
    assert out[0]["cleaned"] == "good words in this line"
    # doc 1: empty text = one empty line, dropped
    assert (out[1]["n_lines"], out[1]["n_kept"], out[1]["cleaned"]) == (1, 0, "")
    # doc 2: both lines >=3 words, no boilerplate -> kept
    assert (out[2]["n_kept"], out[2]["kept"]) == (2, True)
    assert out[2]["cleaned"] == "Sentence one ends here.\nno punct line words"

    # terminal-punct opt-in (C4 rule): doc 2's second line now drops
    out2 = {
        r["doc_id"]: r
        for r in pa.concat_tables(
            [
                x
                for x in (
                    __import__("ray").get(b)
                    for b in line_filter(
                        ds, require_terminal_punct=True
                    ).to_arrow_refs()
                )
                if x.num_rows
            ]
        ).to_pylist()
    }
    assert out2[2]["n_kept"] == 1
    assert out2[2]["cleaned"] == "Sentence one ends here."
    assert out2[3]["kept"] is True


def test_budget_select_prefix_and_block_skip():
    """budget_select keeps exactly the greedy top-score prefix, stops
    at the boundary (inclusive-cost rule), is deterministic on score
    ties (id asc), and returns empty on a zero budget."""
    import ray
    import ray.data

    from docs_indexer_ray.ops.select import budget_select

    t = pa.table(
        {
            "doc_id": pa.array(np.arange(10, dtype=np.int64)),
            "score": pa.array([0.9, 0.5, 0.9, 0.1, 0.7, 0.5, 0.3, 0.2, 0.8, 0.6]),
            "n_tokens": pa.array([10, 10, 10, 10, 10, 10, 10, 10, 10, 10], pa.int64()),
        }
    )
    ds = ray.data.from_arrow(t).repartition(4)
    out = budget_select(ds, budget=45, score_col="score", cost_col="n_tokens")
    # sorted order: 0(.9) 2(.9 tie->id) 8(.8) 4(.7) 9(.6) ... 4 docs of
    # cost 10 fit a 45 budget (5th would reach 50 > 45)
    assert sorted(out["doc_id"].to_pylist()) == [0, 2, 4, 8]
    assert max(out["cum_cost"].to_pylist()) == 40

    # exact boundary is kept (inclusive rule)
    out2 = budget_select(ds, budget=50, score_col="score", cost_col="n_tokens")
    assert sorted(out2["doc_id"].to_pylist()) == [0, 2, 4, 8, 9]
    assert max(out2["cum_cost"].to_pylist()) == 50

    # zero budget -> empty, stable schema
    out3 = budget_select(ds, budget=0, score_col="score", cost_col="n_tokens")
    assert out3.num_rows == 0
    assert out3.column_names == ["doc_id", "score", "n_tokens", "cum_cost"]

    # parallelism invariance
    out4 = budget_select(
        ray.data.from_arrow(t).repartition(1), budget=45,
        score_col="score", cost_col="n_tokens",
    )
    assert sorted(out4["doc_id"].to_pylist()) == sorted(out["doc_id"].to_pylist())


def test_extract_links_parser_edges_and_pagerank_composition():
    """links_of_html handles entities, nested inline markup, hrefless
    anchors, implicit anchor close and unclosed trailing anchors; the
    link table feeds pagerank (crawl-graph composition)."""
    import ray.data

    from docs_indexer_ray.ops.links import extract_links, links_of_html
    from docs_indexer_ray.ops.pagerank import pagerank

    html = (
        '<a href="/a">A &amp; B</a>'
        "<a>no href</a>"
        '<a href="/b">outer <a href="/c">implicit close</a>'
        '<a href="/d">trailing unclosed'
    )
    got = links_of_html(html)
    assert got == [
        ("/a", "A & B"),
        ("/b", "outer"),
        ("/c", "implicit close"),
        ("/d", "trailing unclosed"),
    ]
    assert links_of_html("") == [] and links_of_html(None) == []

    # composition: extract links from 6 planted pages -> dense int
    # edges -> pagerank; the linked-to hub must outrank the others
    n = 6
    pages = pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "html": pa.array(
                [f'<a href="/p0">hub</a><a href="/p{(i + 1) % n}">next</a>' for i in range(n)]
            ),
        }
    )
    links = extract_links(ray.data.from_arrow(pages), concurrency=(1, 2))

    def to_edges(t: pa.Table) -> pa.Table:
        dst = [int(h[2:]) for h in t["href"].to_pylist()]
        return pa.table({"src": t["src"], "dst": pa.array(dst, pa.int64())})

    ranks = pagerank(
        links.map_batches(to_edges, batch_format="pyarrow"), n_nodes=n, iterations=8
    )
    r = ranks["rank"].to_numpy(zero_copy_only=False)
    assert r.argmax() == 0  # every page links the hub
    assert abs(r.sum() - 1.0) < 1e-9


def test_chunk_documents_windows_and_edges():
    """chunk_documents: overlap arithmetic, short trailing windows,
    empty/whitespace-only docs emit nothing, disjoint mode, and the
    stride>window rejection."""
    import pytest as _pytest
    import ray
    import ray.data

    from docs_indexer_ray.ops.chunk import chunk_documents

    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": pa.array(["a b c d e f g", "", "   "]),
        }
    )
    out = pa.concat_tables(
        [
            x
            for x in (
                ray.get(b)
                for b in chunk_documents(
                    ray.data.from_arrow(t), window=4, stride=2
                ).to_arrow_refs()
            )
            if x.num_rows
        ]
    ).sort_by([("doc_id", "ascending"), ("chunk_idx", "ascending")])
    rows = out.to_pylist()
    # doc 0: 7 tokens, starts 0/2/4/6 -> windows 4,4,3,1
    assert [r["doc_id"] for r in rows] == [0, 0, 0, 0]
    assert [r["chunk_text"] for r in rows] == [
        "a b c d", "c d e f", "e f g", "g",
    ]
    assert [r["n_tokens"] for r in rows] == [4, 4, 3, 1]
    assert [r["start_tok"] for r in rows] == [0, 2, 4, 6]

    # disjoint mode (stride == window) reconstructs the doc exactly
    out2 = pa.concat_tables(
        [
            x
            for x in (
                ray.get(b)
                for b in chunk_documents(
                    ray.data.from_arrow(t), window=3, stride=3
                ).to_arrow_refs()
            )
            if x.num_rows
        ]
    ).sort_by([("doc_id", "ascending"), ("chunk_idx", "ascending")])
    assert " ".join(out2["chunk_text"].to_pylist()) == "a b c d e f g"

    with _pytest.raises(ValueError):
        chunk_documents(ray.data.from_arrow(t), window=4, stride=5)


def test_seeded_shuffle_deterministic_and_seed_sensitive():
    """seeded_shuffle: same seed -> same order at any parallelism;
    different seed -> different order; it's a permutation."""
    import ray
    import ray.data

    from docs_indexer_ray.ops.sample import seeded_shuffle

    t = pa.table({"doc_id": pa.array(np.arange(100, dtype=np.int64))})

    def order(ds, seed):
        out = pa.concat_tables(
            [
                x
                for x in (
                    ray.get(b) for b in seeded_shuffle(ds, seed).to_arrow_refs()
                )
                if x.num_rows
            ]
        )
        return out["doc_id"].to_pylist()

    a = order(ray.data.from_arrow(t).repartition(7), seed=1)
    b = order(ray.data.from_arrow(t).repartition(2), seed=1)
    c = order(ray.data.from_arrow(t).repartition(7), seed=2)
    assert a == b  # parallelism-invariant
    assert a != c  # seed-sensitive
    assert sorted(a) == list(range(100)) == sorted(c)  # permutations
    assert a != list(range(100))  # actually shuffled


def test_jsonl_source_roundtrip_extras_and_errors():
    """read_jsonl: gz round trip, extras preservation (sorted-key
    JSON), loud failure on a missing required key, blank-line skip."""
    import gzip
    import json

    import pytest as _pytest
    import ray
    import ray.data

    from docs_indexer_ray.sources.jsonl import read_jsonl, write_jsonl_shards

    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": pa.array(["alpha", "beta", "gamma"]),
            "tag": pa.array(["x", "y", "z"]),
        }
    )
    out_dir = "/tmp/dixr_jsonl_test"
    import shutil

    shutil.rmtree(out_dir, ignore_errors=True)
    paths = write_jsonl_shards(t, out_dir, n_shards=2)
    got = pa.concat_tables(
        [
            x
            for x in (
                ray.get(b)
                for b in read_jsonl(paths, required=("doc_id", "text")).to_arrow_refs()
            )
            if x.num_rows
        ]
    ).sort_by("doc_id")
    assert got["doc_id"].to_pylist() == [0, 1, 2]
    assert got["text"].to_pylist() == ["alpha", "beta", "gamma"]
    # extra producer key survives as sorted-key JSON
    assert [json.loads(e)["tag"] for e in got["extras"].to_pylist()] == ["x", "y", "z"]

    # blank lines skip; missing required key raises loudly
    bad = out_dir + "/bad.jsonl.gz"
    with gzip.open(bad, "wb") as f:
        f.write(b'{"doc_id": 7, "text": "ok"}\n\n{"doc_id": 8}\n')
    ds = read_jsonl([bad], required=("doc_id", "text"))
    with _pytest.raises(Exception, match="missing required key"):
        ray.get(ds.to_arrow_refs())


def test_dedup_lines_corpus_wide_keep_first():
    """dedup_lines: cross-doc duplicate keeps only the global-first
    (doc, ord) occurrence; within-doc repeats drop too; unique lines
    and empty docs untouched; rebuild preserves order."""
    import ray
    import ray.data

    from docs_indexer_ray.ops.dedup import dedup_lines

    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": pa.array(
                [
                    "shared line\nunique zero\nshared line",  # within-doc repeat
                    "shared line\nunique one",                  # cross-doc dup
                    "",
                ]
            ),
        }
    )
    out = pa.concat_tables(
        [
            x
            for x in (
                ray.get(b)
                for b in dedup_lines(
                    ray.data.from_arrow(t).repartition(3)
                ).to_arrow_refs()
            )
            if x.num_rows
        ]
    ).sort_by("doc_id")
    rows = {r["doc_id"]: r for r in out.to_pylist()}
    assert rows[0]["cleaned"] == "shared line\nunique zero"  # 2nd repeat dropped
    assert (rows[0]["n_lines"], rows[0]["n_kept"]) == (3, 2)
    assert rows[1]["cleaned"] == "unique one"  # lost the cross-doc dup
    assert (rows[1]["n_lines"], rows[1]["n_kept"]) == (2, 1)
    # the empty doc is ONE empty line, globally unique -> kept
    # (same contract as the SQL oracle's rn=1 rule)
    assert rows[2]["cleaned"] == "" and rows[2]["n_kept"] == 1


def test_bigram_lm_train_and_score():
    """train_bigram_lm counts match a Counter reference; scoring a
    HELD-OUT doc handles OOV tokens (zero context -> 1/V) and matches
    a plain-Python replay of the smoothed bigram model."""
    import math

    import ray.data

    from docs_indexer_ray.ops.lm import perplexity_scores, train_bigram_lm

    train = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": pa.array(
                [
                    "the cat sat on the mat",
                    "the cat ate the fish",
                    "a dog sat",
                ]
            ),
        }
    )
    model = train_bigram_lm(ray.data.from_arrow(train).repartition(3))
    vocab = set(model["vocab"].tolist())
    assert vocab == {"the", "cat", "sat", "on", "mat", "ate", "fish", "a", "dog"}
    V = model["V"]
    assert V == 9

    # Counter reference over the same corpus
    from collections import Counter

    toks = [t.split() for t in train["text"].to_pylist()]
    big = Counter(p for d in toks for p in zip(d, d[1:]))
    ctx = Counter(p[0] for d in toks for p in zip(d, d[1:]))

    # score a held-out doc with one OOV token ("zebra")
    held = pa.table(
        {"doc_id": pa.array([7], pa.int64()), "text": pa.array(["the zebra sat on the mat"])}
    )
    out = perplexity_scores(
        ray.data.from_arrow(held), model, concurrency=1
    ).take_all()
    assert len(out) == 1 and out[0]["n_bigrams"] == 5

    def p(w1, w2):
        return (big.get((w1, w2), 0) + 1.0) / (ctx.get(w1, 0) + V)

    pairs = list(zip("the zebra sat on the mat".split(), "zebra sat on the mat".split()))
    ref = sum(-math.log(p(a, b)) for a, b in pairs) / 5
    assert abs(out[0]["avg_nll"] - round(ref, 9)) < 1e-12
    assert abs(out[0]["ppl"] - round(math.exp(ref), 6)) < 1e-9

    # a one-token doc produces no row
    one = pa.table({"doc_id": pa.array([9], pa.int64()), "text": pa.array(["hello"])})
    assert perplexity_scores(ray.data.from_arrow(one), model, concurrency=1).count() == 0


# ---- exact substring dedup (Lee et al. 2021) -------------------------------


def _brute_masked(tbl: pa.Table, L: int) -> set[tuple[int, int]]:
    """Reference: every (doc, pos) whose L-gram occurs ≥2× in the
    corpus, minus each gram's global-first occurrence."""
    occ: dict[str, list[tuple[int, int]]] = {}
    for did, txt in zip(tbl["doc_id"].to_pylist(), tbl["text"].to_pylist()):
        for i in range(len(txt) - L + 1):
            occ.setdefault(txt[i : i + L], []).append((did, i))
    out = set()
    for ps in occ.values():
        if len(ps) >= 2:
            out.update(sorted(ps)[1:])
    return out


def test_substring_masked_positions_vs_bruteforce(docs_ds, docs_tbl):
    from docs_indexer_ray.ops.substr import masked_positions

    L = 20
    got = masked_positions(docs_ds, gram_len=L, num_parts=8).to_pandas()
    got_set = set(zip(got["doc_id"], got["pos"]))
    assert got_set == _brute_masked(docs_tbl, L)
    # verify_exact path returns the identical set (no collisions here)
    gv = masked_positions(
        docs_ds, gram_len=L, num_parts=8, verify_exact=True
    ).to_pandas()
    assert set(zip(gv["doc_id"], gv["pos"])) == got_set


def test_substring_dedup_stats_interval_union(docs_ds, docs_tbl):
    from docs_indexer_ray.ops.substr import substring_dedup_stats

    L = 20
    stats = substring_dedup_stats(docs_ds, gram_len=L).to_pandas()
    masked = _brute_masked(docs_tbl, L)
    # reference interval union per doc
    by_doc: dict[int, set[int]] = {}
    for d, p in masked:
        by_doc.setdefault(d, set()).update(range(p, p + L))
    lens = {
        d: len(t)
        for d, t in zip(docs_tbl["doc_id"].to_pylist(), docs_tbl["text"].to_pylist())
    }
    want = {
        d: (len(cov), lens[d] - len(cov)) for d, cov in by_doc.items()
    }
    got = {
        int(r.doc_id): (int(r.masked_chars), int(r.kept_chars))
        for r in stats.itertuples()
    }
    assert got == want
    # every planted full copy is ~fully masked (first copy untouched)
    dup_ids = [d for d in lens if d >= 1000]
    for d in dup_ids:
        assert got[d][0] == lens[d], d


def test_substring_dedup_cuts_text(ray_session):
    import ray.data

    from docs_indexer_ray.ops.substr import substring_dedup

    L = 10
    uniq1 = "the quick brown fox jumps over the lazy dog tonight"
    dup = "0123456789abcdefghij"  # 20 chars, shared by docs 1 and 2
    tbl = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(
                [uniq1 + dup, dup + "zyxwvutsrqponmlkjihg", "no dupes here at all"]
            ),
        }
    )
    out = (
        substring_dedup(ray.data.from_arrow(tbl), gram_len=L, num_parts=4)
        .to_pandas()
        .set_index("doc_id")["text"]
        .to_dict()
    )
    # doc 1 holds the global-first occurrence of every dup gram → intact
    assert out[1] == uniq1 + dup
    # doc 2's leading copy of `dup` is fully masked, the rest survives
    assert out[2] == "zyxwvutsrqponmlkjihg"
    assert out[3] == "no dupes here at all"


# ---- BPE tokenizer training -------------------------------------------------


def _naive_bpe(word_counts: dict[str, int], n_merges: int):
    """From-scratch reference: recount ALL pair frequencies each
    iteration (no incremental index), same tie-break."""
    words = {w: [*w, "</w>"] for w in word_counts}
    merges = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for w, sym in words.items():
            c = word_counts[w]
            for p in zip(sym[:-1], sym[1:]):
                pairs[p] = pairs.get(p, 0) + c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        joined = best[0] + best[1]
        for w, sym in words.items():
            out, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and (sym[i], sym[i + 1]) == best:
                    out.append(joined)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            words[w] = out
    return merges


def test_bpe_train_matches_naive_reference(docs_ds, docs_tbl):
    from collections import Counter

    from docs_indexer_ray.ops.bpe import train_bpe, word_counts

    wc = word_counts(docs_ds)
    # the distributed word count must equal a flat recount
    flat = Counter(
        w for t in docs_tbl["text"].to_pylist() for w in re.findall(r"[a-z0-9]+", t.lower())
    )
    assert dict(zip(wc["word"].to_pylist(), wc["n"].to_pylist())) == dict(flat)
    got = train_bpe(wc, n_merges=40)
    assert got == _naive_bpe(dict(flat), 40)
    assert len(got) == 40


def test_bpe_encode_roundtrip(ray_session):
    import ray.data

    from docs_indexer_ray.ops.bpe import (
        _encode_word,
        bpe_encode_counts,
        train_bpe,
        word_counts,
    )

    tbl = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": pa.array(["low lower lowest", "newer newest new", "wide wider widest"]),
        }
    )
    ds = ray.data.from_arrow(tbl)
    merges = train_bpe(word_counts(ds), n_merges=30)
    rank = {p: i for i, p in enumerate(merges)}
    # encoding concatenated == the original word (merges never cross words)
    for w in ["low", "lowest", "wider", "unseenword"]:
        syms = _encode_word(w, rank)
        assert "".join(syms).replace("</w>", "") == w
    out = bpe_encode_counts(ds, merges, concurrency=1).to_pandas().set_index("doc_id")
    # every doc has 3 words; trained merges compress vs raw chars+eow
    for did, row in out.iterrows():
        assert row.n_words == 3
        raw_len = sum(
            len(w) + 1 for w in tbl["text"][did].as_py().split()
        )
        assert 3 <= row.n_bpe_tokens <= raw_len


def test_bpe_encode_ids_matches_scalar_reference(ray_session):
    import re as _re

    import ray.data

    from docs_indexer_ray.ops.bpe import (
        _encode_word,
        bpe_encode,
        bpe_vocab,
        train_bpe,
        word_counts,
    )

    tbl = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
            "text": pa.array(
                [
                    "low lower lowest",
                    "newer newest new",
                    "",  # empty doc -> empty id list
                    "wide wider widest … unknown-χαρ",  # chars outside training
                ]
            ),
        }
    )
    train = ray.data.from_arrow(tbl.slice(0, 2))  # train on docs 0-1 only
    wc = word_counts(train)
    merges = train_bpe(wc, n_merges=25)
    vocab = bpe_vocab(wc, merges)
    rank = {p: i for i, p in enumerate(merges)}
    unk = len(vocab)

    # vocab is deterministic and complete over training symbols
    assert bpe_vocab(wc, merges) == vocab
    for w in wc["word"].to_pylist():
        assert all(s in vocab for s in _encode_word(w, rank)), w

    def scalar_ids(text):
        out = []
        for w in _re.findall(r"[a-z0-9]+", (text or "").lower()):
            out += [vocab.get(s, unk) for s in _encode_word(w, rank)]
        return out

    for parts in (1, 3):
        ds = ray.data.from_arrow(tbl).repartition(parts)
        got = (
            bpe_encode(ds, merges, vocab, concurrency=1)
            .to_pandas()
            .sort_values("doc_id")
            .set_index("doc_id")
        )
        for did in range(4):
            want = scalar_ids(tbl["text"][did].as_py())
            assert list(got.loc[did, "token_ids"]) == want, did
            assert got.loc[did, "n_tokens"] == len(want)
    # the unknown char really maps to the reserved unk id
    assert unk in scalar_ids(tbl["text"][3].as_py())


def test_heavy_hitters_bounds_and_exact_mode(ray_session):
    import collections

    import ray.data

    from docs_indexer_ray.ops.sketch import heavy_hitters

    rng = np.random.default_rng(7)
    items = []
    for i in range(1, 200):  # Zipf-ish: item i appears ~3000/i times
        items += [f"w{i:03d}"] * (3000 // i)
    rng.shuffle(items)
    t = pa.table({"v": pa.array(items, pa.string())})
    true = collections.Counter(items)
    exact_top = sorted(true.items(), key=lambda kv: (-kv[1], kv[0]))[:10]

    for nparts in (2, 16):
        ds = ray.data.from_arrow(t).repartition(nparts)

        # m above every block's distinct count -> thr 0 everywhere,
        # lo == hi == exact count, guaranteed, any partitioning
        r = heavy_hitters(ds, "v", k=10, m=500)
        assert (
            list(zip(r["item"].to_pylist(), r["lo"].to_pylist())) == exact_top
        )
        assert r["lo"].to_pylist() == r["hi"].to_pylist()
        assert all(r["guaranteed"].to_pylist())

        # bounded mode: true count always inside [lo, hi]; a true
        # guarantee flag means the set IS the exact top-k
        r2 = heavy_hitters(ds, "v", k=10, m=12)
        its = r2["item"].to_pylist()
        for it, lo, hi in zip(its, r2["lo"].to_pylist(), r2["hi"].to_pylist()):
            assert lo <= true[it] <= hi
        if r2["guaranteed"][0].as_py():
            assert set(its) == {k for k, _ in exact_top}

    # empty dataset -> typed empty table
    empty = heavy_hitters(
        ray.data.from_arrow(pa.table({"v": pa.array([], pa.string())})), "v"
    )
    assert empty.num_rows == 0 and empty.column_names == [
        "item", "lo", "hi", "guaranteed",
    ]


def test_degenerate_ops_inputs_never_crash(ray_session):
    """Empty/null/degenerate inputs hit well-defined answers, not
    pa.concat_tables([]) / lexsort crashes: pagerank with no edges,
    heavy_hitters over nulls and over int columns, bigram LM on a
    token-free corpus, ppl_buckets on a corpus the 1/16 sample
    misses, t-digest percentiles at a non-default delta."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from docs_indexer_ray.ops.lm import ppl_buckets, train_bigram_lm
    from docs_indexer_ray.ops.pagerank import pagerank
    from docs_indexer_ray.ops.sketch import heavy_hitters

    # pagerank, zero edges: uniform ranks (all dangling)
    edges = ray.data.from_arrow(
        pa.table({"src": pa.array([], pa.int64()),
                  "dst": pa.array([], pa.int64())})
    )
    pr = pagerank(edges, n_nodes=4, iterations=3)
    assert pr.num_rows == 4
    r = pr["rank"].to_numpy()
    assert np.allclose(r, 0.25) and abs(float(r.sum()) - 1.0) < 1e-12

    # heavy_hitters: nulls ignored, int columns keep their type
    t = pa.table({"s": pa.array(["a", None, "a", "b", None], pa.string()),
                  "i": pa.array([7, 7, None, 9, 7], pa.int64())})
    ds = ray.data.from_arrow(t)
    hs = heavy_hitters(ds, "s", k=2)
    assert hs["item"].to_pylist() == ["a", "b"]
    assert hs["lo"].to_pylist() == [2, 1]
    hi = heavy_hitters(ds, "i", k=2)
    assert hi.schema.field("item").type == pa.int64()
    assert hi["item"].to_pylist() == [7, 9]

    # bigram LM over a corpus with zero [a-z0-9] tokens → empty model,
    # and scoring with it buckets nothing
    docs = ray.data.from_arrow(
        pa.table({"doc_id": pa.array([0, 1], pa.int64()),
                  "text": pa.array(["!!! ???", ""], pa.string())})
    )
    model = train_bigram_lm(docs, text_col="text")
    assert model["V"] == 0
    out = ppl_buckets(docs, model, text_col="text", id_col="doc_id")
    assert out.num_rows == 0

    # percentiles approx path at delta != 200 (from_row must carry it)
    from docs_indexer_ray.query.facets import percentiles

    vals = pa.table({"doc_id": pa.array(range(200), pa.int64()),
                     "v": pa.array([float(i) for i in range(200)])})
    p = percentiles(ray.data.from_arrow(vals),
                    np.arange(200, dtype=np.int64), "v",
                    qs=(50,), approx=True, delta=100)
    assert abs(p["value"][0].as_py() - 99.5) < 5.0


def test_pack_sequences_oov_maps_to_unk(ray_session):
    """A token absent from the vocab must map to unk = len(vocab)+1,
    never a neighbor's id and never the EOS id (searchsorted insertion
    points are lookups only after a membership check)."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from docs_indexer_ray.ops.pack import pack_sequences

    vocab = np.array(["alpha", "beta"], dtype=object)  # eos=2, unk=3
    tbl = pa.table({
        "doc_id": pa.array([0], pa.int64()),
        # 'zulu' sorts past the vocab → old code gave it id 2 == EOS
        "text": pa.array(["alpha zulu beta"], pa.string()),
    })
    out = pack_sequences(
        ray.data.from_arrow(tbl), vocab, seq_len=10, bucket_size=10
    ).to_pandas()
    # stream is [0, 3, 1, eos=2] → one sequence of 4 tokens
    assert int(out["n_tokens"].iloc[0]) == 4
    assert int(out["sum_ids"].iloc[0]) == 0 + 3 + 1 + 2
    assert int(out["first_id"].iloc[0]) == 0
    assert int(out["last_id"].iloc[0]) == 2


def test_substr_doc_id_packing_guard(ray_session):
    """doc ids outside the 39-bit packing budget fail loudly instead
    of wrapping the shift negative and corrupting the dedup order."""
    import pyarrow as pa
    import ray.data

    from docs_indexer_ray.ops.substr import substring_dedup_stats

    bad = pa.table({
        "doc_id": pa.array([1 << 40], pa.int64()),
        "text": pa.array(["hello world hello world hello world hello"],
                         pa.string()),
    })
    with pytest.raises(Exception, match="packing"):  # ValueError, Ray-wrapped
        substring_dedup_stats(ray.data.from_arrow(bad), gram_len=5)


def test_batch5_degenerate_and_guard_edges(ray_session):
    """canonical_docs with zero pairs keeps everything; broadcast_join
    rejects right/outer (per-batch join can't decide global
    unmatched); sessionize works on string keys; minhash excludes
    shingle-free docs and a hot-bucket star keeps clusters connected;
    knn partials survive empty blocks; dedup_lines rejects ids outside
    the 32-bit packing budget."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from docs_indexer_ray.ops.components import canonical_docs
    from docs_indexer_ray.ops.join import broadcast_join
    from docs_indexer_ray.ops.windows import sessionize

    docs = pa.table({"doc_id": pa.array([0, 1, 2], pa.int64()),
                     "text": pa.array(["a", "b", "c"], pa.string())})
    empty_comps = pa.table({"node": pa.array([], pa.int64()),
                            "component": pa.array([], pa.int64())})
    kept = canonical_docs(ray.data.from_arrow(docs), empty_comps).take_all()
    assert len(kept) == 3  # nothing dropped, no IndexError

    with pytest.raises(ValueError, match="inner"):
        broadcast_join(ray.data.from_arrow(docs), docs, on="doc_id", how="outer")

    ev = pa.table({
        "user_id": pa.array(["alice", "alice", "bob"], pa.string()),
        "ts": pa.array([0, 10_000_000_000, 5], pa.int64()).cast(pa.timestamp("us")),
        "event_id": pa.array([1, 2, 3], pa.int64()),
    })
    sess = sessionize(ray.data.from_arrow(ev), timeout_s=60, key="user_id")
    st = sess if isinstance(sess, pa.Table) else pa.concat_tables(
        [pa.Table.from_pandas(b) for b in sess.to_pandas().groupby(level=0)]
    ) if False else sess
    sdf = st.to_pandas() if hasattr(st, "to_pandas") else st
    assert len(sdf) == 3  # alice has 2 sessions (gap), bob 1


def test_minhash_skips_empty_docs_and_star_caps_bucket(ray_session):
    import pyarrow as pa
    import ray.data

    from docs_indexer_ray.ops.components import connected_components
    from docs_indexer_ray.ops.dedup import minhash_lsh_pairs

    dup = "the quick brown fox jumps over the lazy dog " * 6
    texts = [""] * 8 + [dup + f"tail {i % 2}" for i in range(6)] + [
        "completely different content about kubernetes clusters and nodes"
    ]
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    pairs = minhash_lsh_pairs(ray.data.from_arrow(t), threshold=0.3)
    pdf = pairs.to_pandas() if hasattr(pairs, "to_pandas") else pairs
    ids_in_pairs = set(pdf["a"]) | set(pdf["b"])
    assert not (ids_in_pairs & set(range(8)))  # no empty-doc pairs
    assert {8, 9, 10, 11, 12, 13} <= ids_in_pairs  # real dups found

    # star cap: with a tiny cap the dup cluster stays CONNECTED
    capped = minhash_lsh_pairs(ray.data.from_arrow(t), threshold=0.3,
                               hot_bucket_cap=2)
    cdf = capped.to_pandas() if hasattr(capped, "to_pandas") else capped
    comps = connected_components(
        ray.data.from_arrow(pa.table({
            "a": pa.array(cdf["a"], pa.int64()),
            "b": pa.array(cdf["b"], pa.int64()),
        }))
    )
    comp_of = dict(zip(comps["node"].to_pylist(), comps["component"].to_pylist()))
    labels = {comp_of[d] for d in (8, 9, 10, 11, 12, 13)}
    assert len(labels) == 1  # one cluster despite the cap


def test_knn_partials_survive_empty_blocks(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from docs_indexer_ray.ops.ann import knn_cosine

    rng = np.random.default_rng(7)
    emb = rng.normal(size=(20, 8))
    t = pa.table({
        "vec_id": pa.array(range(20), pa.int64()),
        "embedding": pa.array([list(map(float, r)) for r in emb]),
    })
    empty = t.slice(0, 0)
    ds = ray.data.from_arrow([t, empty, empty])  # includes empty blocks
    out = knn_cosine(ds, emb[:2], np.array([0, 1]), k=3)
    odf = out.to_pandas() if hasattr(out, "to_pandas") else out
    assert set(odf["query_id"]) == {0, 1}
    assert (odf[odf["rank"] == 1].sort_values("query_id")["neighbor_id"]
            .tolist() != [0, 1])  # exclude_self honored


def test_dedup_lines_rejects_oversized_ids(ray_session):
    import pyarrow as pa
    import ray.data

    from docs_indexer_ray.ops.dedup import dedup_lines

    t = pa.table({"doc_id": pa.array([1 << 33], pa.int64()),
                  "text": pa.array(["a\nb"], pa.string())})
    with pytest.raises(Exception, match="packed"):
        out = dedup_lines(ray.data.from_arrow(t))
        (out.to_pandas() if hasattr(out, "to_pandas") else out)


def test_degenerate_input_edges_seventh_batch(ray_session):
    """Edges from the ops review: empty-block PCA partials, null
    labels/keys, null line_filter text, empty fit corpora."""
    import ray.data

    import pytest as _pytest

    from docs_indexer_ray.ops.dsir import fit_dsir
    from docs_indexer_ray.ops.pca import fit_pca
    from docs_indexer_ray.ops.sample import sample_by_hash
    from docs_indexer_ray.ops.textcat import fit_textcat
    from docs_indexer_ray.ops.textclean import line_filter

    # PCA: a block that filters to empty must not poison the moment fold
    emb = pa.table(
        {
            "doc_id": pa.array(range(8), pa.int64()),
            "embedding": pa.array(
                [[float(i), float(i % 3), 1.0] for i in range(8)],
                pa.list_(pa.float32()),
            ),
        }
    )
    ds = ray.data.from_arrow(emb).repartition(4).filter(
        lambda r: r["doc_id"] < 4  # upper blocks become empty
    )
    mean, comps, ev = fit_pca(ds, k=2)
    assert comps.shape == (2, 3) and len(ev) == 2

    # textcat: null labels dropped, not crashed; all-null corpus raises
    t = pa.table(
        {
            "doc_id": pa.array([0, 1], pa.int64()),
            "lang": pa.array(["en", None], pa.string()),
            "text": pa.array(["hello world text", "junk row"], pa.string()),
        }
    )
    m = fit_textcat(ray.data.from_arrow(t), k=10)
    assert set(m["profiles"]) == {"en"}
    with _pytest.raises(ValueError, match="no trainable"):
        fit_textcat(ray.data.from_arrow(t.slice(1, 1)).filter(lambda r: False))

    # dsir: token-free target corpus raises loudly
    empty_target = pa.table({"text": pa.array(["!!!", "…"], pa.string())})
    docs = pa.table({"doc_id": pa.array([0], pa.int64()),
                     "text": pa.array(["real text here"], pa.string())})
    with _pytest.raises(ValueError, match="no features"):
        fit_dsir(ray.data.from_arrow(empty_target), ray.data.from_arrow(docs))

    # sample: null keys always dropped (md5(NULL) IS NULL)
    st = pa.table({"doc_id": pa.array(range(4), pa.int64()),
                   "text": pa.array(["a", None, "b", None], pa.string())})
    kept = sample_by_hash(ray.data.from_arrow(st), key="text", rate=1.0).to_pandas()
    assert kept["doc_id"].tolist() == [0, 2]

    # line_filter: null text behaves like '' → kept=False
    lt = pa.table({"doc_id": pa.array([0, 1], pa.int64()),
                   "text": pa.array([None, "one good sentence here.\nanother good line here."],
                                    pa.string())})
    out = line_filter(ray.data.from_arrow(lt)).to_pandas().sort_values("doc_id")
    assert out["kept"].tolist() == [False, True]
    assert out["n_lines"].tolist()[0] == 1


def test_filter_companions_match_flag_ops(docs_ds, docs_tbl, ray_session):
    """The curation row filters must keep EXACTLY the rows their
    flag/metrics counterparts mark as keepers: exact_dedup_apply ≡
    exact_dedup's keepers, gopher_filter ≡ gopher_quality passes=1,
    filter_clean ≡ flag_contaminated contaminated=0 — all columns
    passed through."""
    from docs_indexer_ray.ops.decontaminate import (
        filter_clean,
        flag_contaminated,
        ngram_set,
    )
    from docs_indexer_ray.ops.dedup import exact_dedup, exact_dedup_apply
    from docs_indexer_ray.ops.textstats import gopher_filter, gopher_quality

    # exact dedup: row filter ≡ keeper ids
    keepers = set(_rows(exact_dedup(docs_ds))["doc_id"])
    applied = _rows(exact_dedup_apply(docs_ds))
    assert set(applied["doc_id"]) == keepers
    assert list(applied.columns) == ["doc_id", "text"]
    # kept rows carry their original text
    texts = dict(zip(docs_tbl["doc_id"].to_pylist(), docs_tbl["text"].to_pylist()))
    assert all(texts[d] == t for d, t in zip(applied["doc_id"], applied["text"]))

    # gopher: row filter ≡ passes=1 (min_words=20 so both sides split)
    metrics = _rows(gopher_quality(docs_ds, min_words=20))
    want_pass = set(metrics[metrics["passes"] == 1]["doc_id"])
    got_pass = set(_rows(gopher_filter(docs_ds, min_words=20))["doc_id"])
    assert got_pass == want_pass
    assert 0 < len(want_pass)

    # decontamination: row filter ≡ contaminated=0
    eval_texts = [texts[0], texts[7]]
    grams = ngram_set(eval_texts, n=8)
    flags = _rows(flag_contaminated(docs_ds, grams, n=8))
    want_clean = set(flags[flags["contaminated"] == 0]["doc_id"])
    got_clean = set(_rows(filter_clean(docs_ds, grams, n=8))["doc_id"])
    assert got_clean == want_clean
    # doc 0, its exact copy (id 1000) and doc 7 must be dropped
    assert {0, 7, 1000} & got_clean == set()


def test_export_shards_roundtrip_resume_jsonl(ray_session, tmp_path):
    """Training-shard export: union of shards == corpus, within-shard
    order is the seeded-shuffle order, shard assignment is the md5
    value rule, resume skips existing files, jsonl format round-trips,
    and columns prune the payload."""
    import hashlib
    import json
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data

    from docs_indexer_ray.ops.export import export_shards

    n = 200
    src = pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "text": pa.array([f"doc {i}" for i in range(n)], pa.string()),
        "lang": pa.array(["en"] * n, pa.string()),
    })
    ds = ray.data.from_arrow(src)
    out = str(tmp_path / "shards")
    mf = export_shards(ds, out, n_shards=4, seed=7, columns=["text"])
    assert mf["shard"].to_pylist() == [0, 1, 2, 3]
    assert sum(mf["n_rows"].to_pylist()) == n
    got_ids = []
    for row in mf.to_pylist():
        t = pq.read_table(row["path"])
        assert t.column_names == ["doc_id", "text"]  # lang pruned
        ids = t["doc_id"].to_pylist()
        hs = [hashlib.md5(f"7:{v}".encode()).hexdigest() for v in ids]
        assert hs == sorted(hs)  # seeded-shuffle order within shard
        assert all(int(h[:8], 16) % 4 == row["shard"] for h in hs)
        assert ids[0] == row["first_key"] and ids[-1] == row["last_key"]
        got_ids += ids
    assert sorted(got_ids) == list(range(n))

    # resume: delete ONE shard file; re-export rewrites only that one
    victim = mf.to_pylist()[2]["path"]
    os.remove(victim)
    mtimes = {r["path"]: os.path.getmtime(r["path"])
              for r in mf.to_pylist() if r["path"] != victim}
    mf2 = export_shards(ds, out, n_shards=4, seed=7, columns=["text"])
    assert mf2["skipped"].to_pylist() == [True, True, False, True]
    for p, m in mtimes.items():
        assert os.path.getmtime(p) == m  # untouched
    assert pq.read_table(victim).num_rows == mf.to_pylist()[2]["n_rows"]

    # jsonl format round-trips the same rows
    out2 = str(tmp_path / "shards_jsonl")
    mfj = export_shards(ds, out2, n_shards=2, seed=7, fmt="jsonl")
    rows = []
    for r in mfj.to_pylist():
        with open(r["path"]) as f:
            rows += [json.loads(ln) for ln in f]
    assert sorted(x["doc_id"] for x in rows) == list(range(n))
    assert all(set(x) == {"doc_id", "text", "lang"} for x in rows)

    import pytest as _pytest

    with _pytest.raises(ValueError):
        export_shards(ds, out, n_shards=0)
    with _pytest.raises(ValueError):
        export_shards(ds, out, n_shards=2, fmt="csv")


def test_export_shards_backfills_empty_shards(ray_session, tmp_path):
    """A shard the hash never hit still gets its (empty) file and
    manifest row — loaders enumerate 0..n_shards-1."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data

    from docs_indexer_ray.ops.export import export_shards

    src = pa.table({"doc_id": pa.array(range(10), pa.int64()),
                    "text": pa.array([f"d{i}" for i in range(10)])})
    out = str(tmp_path / "sparse")
    mf = export_shards(ray.data.from_arrow(src), out, n_shards=64, seed=3)
    assert mf["shard"].to_pylist() == list(range(64))
    assert sum(mf["n_rows"].to_pylist()) == 10
    for r in mf.to_pylist():
        assert os.path.exists(r["path"]), r
        t = pq.read_table(r["path"])
        assert t.num_rows == r["n_rows"]
        assert t.column_names == ["doc_id", "text"]  # schema even when empty
    # resume over the sparse export skips everything, empties included
    mf2 = export_shards(ray.data.from_arrow(src), out, n_shards=64, seed=3)
    assert all(mf2["skipped"].to_pylist())
