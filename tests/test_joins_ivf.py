"""Join operators and the IVF ANN variant vs exact references."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from docs_indexer_ray.ops.ann import knn_cosine, knn_ivf, train_ivf_centroids
from docs_indexer_ray.ops.join import broadcast_join, hash_join


def test_broadcast_join(ray_session):
    import ray.data

    left = pa.table(
        {"k": pa.array([1, 2, 3, 2, 9], pa.int64()), "v": pa.array([10, 20, 30, 21, 90])}
    )
    small = pd.DataFrame({"k": [1, 2, 3], "w": ["a", "b", "c"]})
    out = broadcast_join(ray.data.from_arrow(left), small, on="k").to_pandas()
    out = out.sort_values(["k", "v"], ignore_index=True)
    assert out["k"].tolist() == [1, 2, 2, 3]  # k=9 dropped (inner)
    assert out["w"].tolist() == ["a", "b", "b", "c"]


def test_hash_join_matches_pandas(ray_session):
    import ray.data

    rs = np.random.RandomState(11)
    left = pd.DataFrame(
        {"key": rs.randint(0, 50, 400).astype(np.int64), "x": rs.randint(0, 9, 400)}
    )
    right = pd.DataFrame(
        {"key": np.arange(0, 60, 2, dtype=np.int64), "y": np.arange(30)}
    )
    got = (
        hash_join(
            ray.data.from_pandas(left), ray.data.from_pandas(right), on="key",
            num_buckets=7,
        )
        .to_pandas()
        .sort_values(["key", "x", "y"], ignore_index=True)[["key", "x", "y"]]
    )
    want = left.merge(right, on="key").sort_values(
        ["key", "x", "y"], ignore_index=True
    )
    pd.testing.assert_frame_equal(got, want.astype(got.dtypes.to_dict()))


def _vectors(n=80, dim=12):
    rs = np.random.RandomState(5)
    m = rs.normal(size=(n, dim))
    return np.arange(n, dtype=np.int64), m


@pytest.fixture(scope="module")
def vec_ds2(ray_session):
    import ray.data

    ids, m = _vectors()
    return ray.data.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(ids),
                "embedding": pa.array([r.tolist() for r in m], pa.list_(pa.float32())),
            }
        )
    )


def test_ivf_centroids_deterministic():
    _, m = _vectors()
    c1 = train_ivf_centroids(m, 8)
    c2 = train_ivf_centroids(m, 8)
    assert np.array_equal(c1, c2)
    assert np.allclose(np.linalg.norm(c1, axis=1), 1.0)


def test_knn_ivf_recall_vs_exact(vec_ds2):
    ids, m = _vectors()
    q = m[:4].astype(np.float32).astype(np.float64)
    exact = knn_cosine(vec_ds2, q, ids[:4], k=5).to_pandas()
    # probing every cell ⇒ identical to exact
    full = knn_ivf(
        vec_ds2, q, ids[:4], k=5, n_centroids=8, n_probe=8, train_sample=80
    ).to_pandas()
    for qi in range(4):
        e = exact[exact["query_id"] == qi].sort_values("rank")["neighbor_id"].tolist()
        f = full[full["query_id"] == qi].sort_values("rank")["neighbor_id"].tolist()
        assert e == f, qi

    # fewer probes ⇒ valid ranks, decent recall of the exact top-5
    approx = knn_ivf(
        vec_ds2, q, ids[:4], k=5, n_centroids=8, n_probe=3, train_sample=80
    ).to_pandas()
    hits = 0
    for qi in range(4):
        e = set(exact[exact["query_id"] == qi]["neighbor_id"])
        a = set(approx[approx["query_id"] == qi]["neighbor_id"])
        hits += len(e & a)
    assert hits >= 10  # ≥50% recall on random data with 3/8 probes


def test_hash_join_string_keys(ray_session):
    import pyarrow as pa
    import ray.data

    from docs_indexer_ray.ops.join import hash_join

    left = ray.data.from_arrow(
        pa.table({"k": pa.array(["a", "b", "c", "a"]), "v": pa.array([1, 2, 3, 4])})
    )
    right = ray.data.from_arrow(
        pa.table({"k": pa.array(["a", "b", "d"]), "w": pa.array([10, 20, 40])})
    )
    got = hash_join(left, right, on="k", num_buckets=4).to_pandas()
    got = got.sort_values(["k", "v"]).reset_index(drop=True)
    assert got["k"].tolist() == ["a", "a", "b"]
    assert got["v"].tolist() == [1, 4, 2]
    assert got["w"].tolist() == [10, 10, 20]


def test_asof_join_matches_global_merge_asof(ray_session):
    import pandas as pd
    import ray.data

    from docs_indexer_ray.ops.join import asof_join

    rs = np.random.RandomState(5)
    left = pd.DataFrame(
        {
            "key": rs.randint(0, 20, 500).astype(np.int64),
            "lt": rs.randint(0, 10_000, 500).astype(np.int64),
            "ev": np.arange(500, dtype=np.int64),
        }
    )
    # unique right side per (key, rt)
    right = (
        pd.DataFrame(
            {
                "key": rs.randint(0, 20, 300).astype(np.int64),
                "rt": rs.randint(0, 10_000, 300).astype(np.int64),
            }
        )
        .drop_duplicates(["key", "rt"])
        .reset_index(drop=True)
    )
    right["val"] = np.arange(len(right), dtype=np.int64)

    for direction in ("backward", "forward"):
        got = (
            pa.concat_tables(
                [
                    ray.get(r)
                    for r in asof_join(
                        ray.data.from_pandas(left).repartition(5),
                        ray.data.from_pandas(right).repartition(3),
                        on="key",
                        left_ts="lt",
                        right_ts="rt",
                        num_buckets=7,
                        direction=direction,
                    ).to_arrow_refs()
                ],
                promote_options="permissive",
            )
            .to_pandas()
            .sort_values("ev", ignore_index=True)
        )
        want = pd.merge_asof(
            left.sort_values("lt", kind="mergesort"),
            right.sort_values("rt", kind="mergesort"),
            left_on="lt",
            right_on="rt",
            by="key",
            direction=direction,
        ).sort_values("ev", ignore_index=True)
        pd.testing.assert_frame_equal(
            got[["ev", "key", "lt", "rt", "val"]], want[["ev", "key", "lt", "rt", "val"]]
        )

    # duplicate right (key, rt) is rejected loudly
    dup = pd.concat([right, right.iloc[:1]], ignore_index=True)
    with pytest.raises(Exception, match="not unique"):
        pa.concat_tables(
            [
                ray.get(r)
                for r in asof_join(
                    ray.data.from_pandas(left),
                    ray.data.from_pandas(dup),
                    on="key",
                    left_ts="lt",
                    right_ts="rt",
                ).to_arrow_refs()
            ]
        )

    with pytest.raises(ValueError, match="direction"):
        asof_join(
            ray.data.from_pandas(left),
            ray.data.from_pandas(right),
            on="key",
            left_ts="lt",
            right_ts="rt",
            direction="sideways",
        )


def test_range_join_overlapping_bands(ray_session):
    import numpy as np
    import pyarrow as pa
    import pytest
    import ray.data

    from docs_indexer_ray.ops.join import range_join

    vals = np.array([5.0, 30.0, 80.0, 120.0, 999999.0, -3.0])
    rows = pa.table(
        {"rid": pa.array(np.arange(6), pa.int64()), "v": pa.array(vals)}
    )
    bands = pa.table(
        {
            "band": pa.array(["low", "mid", "high"]),
            "lo": pa.array([0.0, 25.0, 75.0]),
            "hi": pa.array([50.0, 100.0, 1000.0]),
        }
    )

    def brute():
        out = []
        for rid, v in zip(range(6), vals):
            for band, lo, hi in zip(
                bands["band"].to_pylist(),
                bands["lo"].to_pylist(),
                bands["hi"].to_pylist(),
            ):
                if lo <= v < hi:
                    out.append((rid, band))
        return sorted(out)

    for parts in (1, 3):
        ds = ray.data.from_arrow(rows).repartition(parts)
        got = range_join(ds, bands, on="v").to_pandas()
        pairs = sorted(zip(got["rid"], got["band"]))
        assert pairs == brute()
    # row 1 (30.0) is in BOTH low and mid (overlap); rows -3 and 1e6 drop
    assert (1, "low") in brute() and (1, "mid") in brute()
    assert all(r != 5 and r != 4 for r, _ in brute())

    # column collision refuses loudly
    clash = pa.table({"v": pa.array([1.0]), "lo": pa.array([0.0]), "hi": pa.array([2.0])})
    with pytest.raises(Exception, match="collision"):
        range_join(ray.data.from_arrow(rows), clash, on="v").to_pandas()


def test_asof_join_preserves_64bit_values_with_unmatched_rows(ray_session):
    """An unmatched left row must not float64-convert the right int
    columns — 64-bit values above 2^53 previously came back rounded."""
    import pyarrow as pa
    import ray.data

    from docs_indexer_ray.ops.join import asof_join

    big = (1 << 62) + 1
    left = pa.table({
        "k": pa.array([1, 1], pa.int64()),
        "ts": pa.array([5, 50], pa.int64()),
    })
    right = pa.table({
        "k": pa.array([1], pa.int64()),
        "rts": pa.array([10], pa.int64()),
        "big_id": pa.array([big], pa.int64()),
    })
    out = asof_join(
        ray.data.from_arrow(left), ray.data.from_arrow(right),
        on="k", left_ts="ts", right_ts="rts", direction="backward",
    )
    # assert on ARROW values: pandas would float-convert the nullable
    # int64 column and hide exactly the corruption this test pins
    from docs_indexer_ray.collect import tables_of

    tbl = pa.concat_tables(tables_of(out)).sort_by("ts")
    vals = tbl["big_id"].to_pylist()
    assert vals[0] is None  # ts=5 has no backward match
    assert vals[1] == big  # bit-exact, not 4611686018427387904


def test_pq_exact_when_codebook_covers_corpus(vec_ds2):
    """ks ≥ n with a full training sample makes every point its own
    centroid — zero quantization error, so ADC ranking must equal the
    exact cosine ranking (the PQ correctness degenerate case)."""
    from docs_indexer_ray.ops.pq import knn_pq, pq_encode, train_pq

    ids, m = _vectors()
    cb = train_pq(vec_ds2, m=4, ks=128, train_sample=200)
    assert cb.shape == (4, 80, 3)  # ks clamped to the sample size
    codes = pq_encode(vec_ds2, cb)
    q = m[:4]
    exact = knn_cosine(vec_ds2, q, ids[:4], k=5).to_pandas()
    got = knn_pq(codes, cb, q, ids[:4], k=5).to_pandas()
    for qi in range(4):
        e = exact[exact["query_id"] == qi].sort_values("rank")["neighbor_id"].tolist()
        g = got[got["query_id"] == qi].sort_values("rank")["neighbor_id"].tolist()
        assert e == g, qi


def test_knn_pq_recall_vs_exact(vec_ds2):
    """Realistic compression (16 centroids per 3-dim subspace) must
    keep decent recall of the exact top-5 on random data."""
    from docs_indexer_ray.ops.pq import knn_pq, pq_encode, train_pq

    ids, m = _vectors()
    cb = train_pq(vec_ds2, m=4, ks=16, train_sample=80)
    codes = pq_encode(vec_ds2, cb)
    q = m[:4]
    exact = knn_cosine(vec_ds2, q, ids[:4], k=5).to_pandas()
    approx = knn_pq(codes, cb, q, ids[:4], k=5).to_pandas()
    hits = 0
    for qi in range(4):
        e = set(exact[exact["query_id"] == qi]["neighbor_id"])
        a = set(approx[approx["query_id"] == qi]["neighbor_id"])
        hits += len(e & a)
    assert hits >= 10  # ≥50% recall at 4 B/vector vs 48 B float32


def test_pq_encode_fixed_width_and_partition_invariant(ray_session):
    """Codes are fixed_size_binary(m) built from the batch buffer, and
    training + encoding are value properties — identical at any block
    count."""
    import ray.data

    from docs_indexer_ray.ops.pq import pq_encode, train_pq

    ids, m = _vectors()
    tbl = pa.table(
        {
            "vec_id": pa.array(ids),
            "embedding": pa.array([r.tolist() for r in m], pa.list_(pa.float32())),
        }
    )
    outs = []
    for blocks in (1, 7):
        ds = ray.data.from_arrow(tbl).repartition(blocks)
        cb = train_pq(ds, m=3, ks=8, train_sample=40)
        enc = pq_encode(ds, cb).to_pandas().sort_values("vec_id", ignore_index=True)
        outs.append((cb, enc))
    assert np.array_equal(outs[0][0], outs[1][0])
    assert outs[0][1].equals(outs[1][1])
    import pandas as pd  # codes round width

    assert all(len(c) == 3 for c in outs[0][1]["codes"])


def test_knn_pq_refine_improves_recall(vec_ds2):
    """The FAISS-style refine stage (exact re-rank of the ADC
    shortlist) must reproduce the exact top-k whenever the shortlist
    contains it — with a shortlist as large as the corpus, refined PQ
    IS exact kNN regardless of quantization coarseness."""
    from docs_indexer_ray.ops.pq import knn_pq, pq_encode, train_pq

    ids, m = _vectors()
    cb = train_pq(vec_ds2, m=4, ks=8, train_sample=80)  # very coarse
    codes = pq_encode(vec_ds2, cb)
    q = m[:4]
    exact = knn_cosine(vec_ds2, q, ids[:4], k=5).to_pandas()
    refined = knn_pq(
        codes, cb, q, ids[:4], k=5, refine_ds=vec_ds2, refine_factor=16
    ).to_pandas()
    for qi in range(4):
        e = exact[exact["query_id"] == qi].sort_values("rank")["neighbor_id"].tolist()
        g = refined[refined["query_id"] == qi].sort_values("rank")["neighbor_id"].tolist()
        assert e == g, qi


def test_knn_ivfpq_exact_degenerate_and_recall(vec_ds2):
    """IVF-PQ: probing every cell with ks ≥ corpus (zero residual
    quantization error) must reproduce the exact cosine ranking —
    score decomposes as q·coarse[cell] + q·residual exactly.  At
    realistic settings with the refine stage, recall stays high."""
    from docs_indexer_ray.ops.pq import ivfpq_encode, knn_ivfpq, train_ivfpq

    ids, m = _vectors()
    q = m[:4]
    exact = knn_cosine(vec_ds2, q, ids[:4], k=5).to_pandas()

    coarse, cb = train_ivfpq(vec_ds2, n_centroids=8, m=4, ks=128, train_sample=200)
    codes = ivfpq_encode(vec_ds2, coarse, cb)
    full = knn_ivfpq(codes, coarse, cb, q, ids[:4], k=5, n_probe=8).to_pandas()
    for qi in range(4):
        e = exact[exact["query_id"] == qi].sort_values("rank")["neighbor_id"].tolist()
        g = full[full["query_id"] == qi].sort_values("rank")["neighbor_id"].tolist()
        assert e == g, qi

    coarse2, cb2 = train_ivfpq(vec_ds2, n_centroids=8, m=4, ks=16, train_sample=80)
    codes2 = ivfpq_encode(vec_ds2, coarse2, cb2)
    approx = knn_ivfpq(
        codes2, coarse2, cb2, q, ids[:4], k=5, n_probe=4,
        refine_ds=vec_ds2, refine_factor=4,
    ).to_pandas()
    hits = 0
    for qi in range(4):
        e = set(exact[exact["query_id"] == qi]["neighbor_id"])
        a = set(approx[approx["query_id"] == qi]["neighbor_id"])
        hits += len(e & a)
    assert hits >= 10  # ≥50% recall probing half the cells, 4 B codes


def test_fit_kmeans_matches_numpy_reference(vec_ds2):
    """The distributed Lloyd loop (per-block constant-size moment
    partials, driver fold) must track a single-process numpy Lloyd
    from the identical init — and be partition-invariant up to float
    fold order."""
    import ray.data

    from docs_indexer_ray.ops.ann import _normalize
    from docs_indexer_ray.ops.cluster import assign_clusters, fit_kmeans

    ids, m = _vectors()
    x = _normalize(m)
    # reference: the engine's own init (iters=0), same iteration rule
    ref = fit_kmeans(vec_ds2, n_clusters=8, iters=0, train_sample=80)
    for _ in range(5):
        a = (x @ ref.T).argmax(axis=1)
        for c in range(8):
            mem = x[a == c]
            if len(mem):
                v = mem.sum(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    ref[c] = v / n

    got = fit_kmeans(vec_ds2, n_clusters=8, iters=5, train_sample=80)
    assert np.allclose(got, ref, atol=1e-9)

    # partition invariance (up to fold order) + assignment equality
    tbl = pa.table(
        {
            "vec_id": pa.array(ids),
            "embedding": pa.array([r.tolist() for r in m], pa.list_(pa.float32())),
        }
    )
    ds7 = ray.data.from_arrow(tbl).repartition(7)
    got7 = fit_kmeans(ds7, n_clusters=8, iters=5, train_sample=80)
    assert np.allclose(got, got7, atol=1e-9)

    asg = assign_clusters(vec_ds2, got).to_pandas().sort_values("vec_id")
    want = (x @ got.T).argmax(axis=1)
    assert asg["cluster"].tolist() == want.tolist()
    assert np.allclose(asg["sim"], (x @ got.T).max(axis=1), atol=1e-12)


def test_pq_rejects_ks_beyond_uint8(vec_ds2):
    """ks > 256 would silently wrap the uint8 codes — must refuse."""
    from docs_indexer_ray.ops.pq import train_ivfpq, train_pq

    with pytest.raises(ValueError, match="uint8"):
        train_pq(vec_ds2, m=4, ks=257, train_sample=80)
    with pytest.raises(ValueError, match="uint8"):
        train_ivfpq(vec_ds2, n_centroids=4, m=4, ks=300, train_sample=80)
