"""IVF index family: k-means quantizer, bucketized probe scan, store
integration. Exactness gate: at nprobe = all buckets IVF must equal the
flat scan (scanned rows get exact scores — coverage is the only
approximation)."""

import numpy as np
import pytest

import jax.numpy as jnp

from tpu_vector_db.index.ivf import IVFIndex
from tpu_vector_db.ops import distance as D
from tpu_vector_db.ops import kmeans
from tpu_vector_db.ops.ivf_scan import (ivf_probe_topk_pallas,
                                        ivf_probe_topk_xla)
from tpu_vector_db.ops.scan import flat_scan_topk


@pytest.fixture
def rng():
    return np.random.default_rng(42)


def clustered(rng, n, d, centers=16, spread=0.08):
    mu = rng.standard_normal((centers, d)).astype(np.float32)
    pick = rng.integers(0, centers, n)
    x = mu[pick] + spread * rng.standard_normal((n, d)).astype(np.float32)
    return x.astype(np.float32)


class TestKMeans:
    def test_recovers_clusters(self, rng):
        # over-provisioned C (like auto_clusters ~ 2*sqrt(N) in production):
        # at C == true centers Lloyd can merge two clusters from a bad init
        x = clustered(rng, 4000, 32, centers=8, spread=0.02)
        db = D.pad_dim(D.l2_normalize(jnp.asarray(x)))
        cents, counts = kmeans.train_kmeans(db, 4000, 16, metric="cosine",
                                            iters=15)
        counts = np.asarray(counts)
        assert counts.sum() == 4000
        # every row should be very close to its assigned centroid
        assign = np.asarray(kmeans.assign_clusters(
            db, jnp.int32(4000), cents, metric="cosine"))[:4000]
        sim = np.einsum("nd,nd->n", np.asarray(db),
                        np.asarray(cents)[assign])
        assert sim.mean() > 0.95

    def test_euclidean_metric(self, rng):
        x = clustered(rng, 2000, 16, centers=4, spread=0.05)
        db = D.pad_dim(jnp.asarray(x))
        cents, counts = kmeans.train_kmeans(db, 2000, 4, metric="euclidean",
                                            iters=10)
        assert np.asarray(counts).sum() == 2000

    @pytest.mark.parametrize("n", [129, 257, 1001])
    def test_non_divisible_block_counts(self, rng, n):
        """Row counts that don't divide into the block layout must not
        drop tail rows from training or crash assignment (review finding:
        ShardedIVF passes raw per-shard counts like 140001)."""
        x = clustered(rng, n, 16, centers=4, spread=0.02)
        db = D.pad_dim(D.l2_normalize(jnp.asarray(x)))
        cents, counts = kmeans.train_kmeans(
            db, n, 4, metric="cosine", iters=8, block_rows=64)
        assert int(np.asarray(counts).sum()) == n  # no dropped tail rows
        assign = np.asarray(kmeans.assign_clusters(
            db, jnp.int32(n), cents, metric="cosine", block_rows=64))
        assert assign.shape == (n,)
        # clamped-overlap reconstruction must match an unblocked assign
        ref = np.asarray(kmeans.assign_clusters(
            db, jnp.int32(n), cents, metric="cosine", block_rows=n))
        np.testing.assert_array_equal(assign, ref)


class TestIVFIndex:
    def _build(self, rng, n=5000, d=32, metric="cosine", **kw):
        x = clustered(rng, n, d)
        dbj = jnp.asarray(x, jnp.float32)
        if metric == "cosine":
            dbj = D.l2_normalize(dbj)
        db = D.pad_dim(dbj)
        sq = (jnp.sum(db.astype(jnp.float32) ** 2, -1)
              if metric == "euclidean" else None)
        idx = IVFIndex(dim=d, metric=metric, **kw)
        idx.build(db, n, sqnorms=sq)
        return idx, db, sq, n

    @pytest.mark.parametrize("metric", ["cosine", "euclidean"])
    def test_full_probe_equals_flat(self, rng, metric):
        idx, db, sq, n = self._build(rng, metric=metric, n_clusters=16)
        nb = idx._ids.shape[0]
        q = db[:4].astype(jnp.float32)
        ids, keys = idx.search(q, db, n, k=10, nprobe=nb, sqnorms=sq)
        rvals, ridx = flat_scan_topk(q, db, jnp.int32(n), 10, metric=metric,
                                     db_normalized=True, db_sqnorms=sq)
        np.testing.assert_allclose(keys, np.asarray(rvals), atol=1e-4)
        np.testing.assert_array_equal(ids, np.asarray(ridx))

    def test_partial_probe_recall(self, rng):
        idx, db, sq, n = self._build(rng, n_clusters=32)
        q = db[100:164].astype(jnp.float32)
        ids, _ = idx.search(q, db, n, k=10, nprobe=8)
        _, ridx = flat_scan_topk(q, db, jnp.int32(n), 10, metric="cosine",
                                 db_normalized=True)
        ridx = np.asarray(ridx)
        hits = sum(len(set(ids[i]) & set(ridx[i])) for i in range(64))
        assert hits / (64 * 10) > 0.9

    def test_incremental_add(self, rng):
        x = clustered(rng, 3000, 32)
        db_full = D.pad_dim(D.l2_normalize(jnp.asarray(x, jnp.float32)))
        idx = IVFIndex(dim=32, metric="cosine", n_clusters=16)
        idx.build(db_full, 2000)
        # materialize the device copy, then extend in place
        idx.search(db_full[:1], db_full, 2000, k=5)
        idx.add(db_full, 2000, 3000)
        assert idx.size == 3000
        ids, keys = idx.search(db_full[2500:2501], db_full, 3000, k=1,
                               nprobe=idx._ids.shape[0])
        assert ids[0][0] == 2500  # new row findable with exact self-score

    def test_add_allocates_spill_buckets(self, rng):
        x = clustered(rng, 600, 16, centers=2)
        db = D.pad_dim(D.l2_normalize(jnp.asarray(x, jnp.float32)))
        idx = IVFIndex(dim=16, metric="cosine", n_clusters=2,
                       bucket_rows=256)
        idx.build(db, 300)
        nb0 = idx._ids.shape[0]
        idx.add(db, 300, 600)
        assert idx._ids.shape[0] >= nb0
        live = (idx._ids >= 0).sum()
        assert live == 600

    def test_streaming_placement_invariants(self, rng):
        """O(batch) placement (ivf.py:_place_rows): many small adds with
        forced spills must keep every row live exactly once, keep _free
        consistent with the id table, and stay exact under full probe."""
        n_total, d = 4000, 16
        x = clustered(rng, n_total, d, centers=6)
        db = D.pad_dim(D.l2_normalize(jnp.asarray(x, jnp.float32)))
        idx = IVFIndex(dim=d, metric="cosine", n_clusters=8, bucket_rows=64)
        idx.build(db, 500)
        pos = 500
        for step in [1, 7, 64, 128, 300, 1000, 999, 1001]:
            idx.add(db, pos, pos + step)
            pos += step
        assert pos == n_total and idx.size == n_total
        live = idx._ids[idx._ids >= 0]
        assert len(live) == n_total
        assert len(np.unique(live)) == n_total          # each row once
        per_bucket_live = (idx._ids >= 0).sum(axis=1)
        np.testing.assert_array_equal(
            idx._free, idx._ids.shape[1] - per_bucket_live)
        # live slots are a prefix of each bucket (kernel fill contract)
        first_dead = np.argmax(idx._ids < 0, axis=1)
        full = (idx._ids >= 0).all(axis=1)
        np.testing.assert_array_equal(
            np.where(full, idx._ids.shape[1], first_dead), per_bucket_live)
        # every bucket's rows belong to the bucket's cluster assignment
        nb = idx._ids.shape[0]
        q = db[np.asarray([3, 777, 3999])].astype(jnp.float32)
        ids, keys = idx.search(q, db, n_total, k=10, nprobe=nb)
        rvals, ridx = flat_scan_topk(q, db, jnp.int32(n_total), 10,
                                     metric="cosine", db_normalized=True)
        np.testing.assert_allclose(keys, np.asarray(rvals), atol=1e-4)
        np.testing.assert_array_equal(ids, np.asarray(ridx))

    def test_persistence_roundtrip(self, rng, tmp_path):
        idx, db, sq, n = self._build(rng, n_clusters=16)
        q = db[:3].astype(jnp.float32)
        ids0, keys0 = idx.search(q, db, n, k=5)
        idx.save(tmp_path)
        idx2 = IVFIndex(dim=32, metric="cosine")
        assert idx2.load(tmp_path)
        assert idx2.size == n
        ids1, keys1 = idx2.search(q, db, n, k=5)
        np.testing.assert_array_equal(ids0, ids1)
        np.testing.assert_allclose(keys0, keys1, atol=1e-5)

    def test_stats(self, rng):
        idx, db, sq, n = self._build(rng, n_clusters=16)
        s = idx.get_stats()
        assert s["type"] == "ivf" and s["nodes"] == n
        assert 0 < s["fill_ratio"] <= 1


class TestProbeKernelParity:
    """Interpret-mode Pallas kernel vs the XLA fallback."""

    def test_kernel_matches_xla(self, rng):
        nb, bc, d, qn, k = 8, 256, 128, 3, 10
        buckets = rng.standard_normal((nb, bc, d)).astype(np.float32)
        ids = np.arange(nb * bc, dtype=np.int32).reshape(nb, bc)
        ids[2, 100:] = -1  # dead tail slots (buckets fill front-to-back)
        fills = (ids >= 0).sum(1).astype(np.int32)
        sel = np.stack([rng.permutation(nb)[:4] for _ in range(qn)])
        q = rng.standard_normal((qn, d)).astype(np.float32)
        bj = jnp.asarray(buckets)
        qj = jnp.asarray(q)
        bj = bj / jnp.linalg.norm(bj, axis=-1, keepdims=True)
        qj = qj / jnp.linalg.norm(qj, axis=-1, keepdims=True)
        a_v, a_i = ivf_probe_topk_pallas(
            qj, bj, jnp.asarray(ids), jnp.asarray(fills), jnp.asarray(sel),
            k, interpret=True)
        b_v, b_i = ivf_probe_topk_xla(
            qj, bj, jnp.asarray(ids), jnp.asarray(sel), k, metric="cosine")
        np.testing.assert_allclose(np.asarray(a_v), np.asarray(b_v),
                                   atol=1e-4)
        np.testing.assert_array_equal(np.asarray(a_i), np.asarray(b_i))
        # dead slots never surface
        assert not np.isin(ids[2, 100:], np.asarray(a_i)).any()

    def test_xla_euclidean_matches_bruteforce(self, rng):
        nb, bc, d, k = 4, 128, 32, 5
        buckets = rng.standard_normal((nb, bc, d)).astype(np.float32)
        ids = np.arange(nb * bc, dtype=np.int32).reshape(nb, bc)
        sel = np.array([[0, 2, 3]], dtype=np.int32)
        q = rng.standard_normal((1, d)).astype(np.float32)
        sq = jnp.sum(jnp.asarray(buckets) ** 2, -1)
        vals, got = ivf_probe_topk_xla(
            jnp.asarray(q), jnp.asarray(buckets), jnp.asarray(ids),
            jnp.asarray(sel), k, metric="euclidean", bucket_sqnorms=sq)
        flat = buckets[sel[0]].reshape(-1, d)
        flat_ids = ids[sel[0]].reshape(-1)
        dist = ((flat - q[0]) ** 2).sum(-1)
        want = flat_ids[np.argsort(dist)[:k]]
        np.testing.assert_array_equal(np.asarray(got)[0], want)
        np.testing.assert_allclose(np.asarray(vals)[0],
                                   -np.sort(dist)[:k], rtol=1e-4)


class TestStoreIVF:
    def test_store_end_to_end(self, rng, tmp_path):
        from tpu_vector_db.store.vector_store import create_vector_store
        store = create_vector_store(
            tmp_path / "s", dimension=32, metric="cosine", enable_ann=True,
            ann_params={"index_type": "ivf", "n_clusters": 16, "nprobe": 16,
                        "self_check": False})
        x = clustered(rng, 2000, 32)
        store.add_vectors(x, [{"i": i} for i in range(2000)])
        assert store.get_stats()["index_type"] == "ivf"
        idx, scores, meta = store.query(x[7], k=3)
        assert idx[0] == 7 and scores[0] > 0.99
        # filtered query oversamples then post-filters
        idx, scores, meta = store.query(x[7], k=2,
                                        filter_metadata={"i": 7})
        assert idx == [7]

    def test_store_reload_keeps_ivf(self, rng, tmp_path):
        from tpu_vector_db.store.vector_store import (TPUVectorStore,
                                                      create_vector_store)
        p = tmp_path / "s2"
        store = create_vector_store(
            p, dimension=16, metric="cosine", enable_ann=True,
            ann_params={"index_type": "ivf", "n_clusters": 8,
                        "self_check": False})
        x = clustered(rng, 500, 16)
        store.add_vectors(x)
        store.flush()
        s2 = TPUVectorStore(p)
        assert s2.get_stats()["index_type"] == "ivf"
        idx, scores, _ = s2.query(x[3], k=1)
        assert idx[0] == 3


def test_ivf_large_k_routes_to_flat(tmp_store_path, rng):
    """k > 32 on an IVF store routes to the exact big-k engine (the IVF
    XLA probe fallback measured 70x slower at batch; store routing guard
    in vector_store.py batch_query)."""
    from tpu_vector_db.store import TPUVectorStore, VectorStoreConfig
    x = rng.standard_normal((600, 32)).astype(np.float32)
    s = TPUVectorStore(tmp_store_path, VectorStoreConfig(
        dimension=32, metric="cosine", enable_ann=True,
        ann_params={"index_type": "ivf", "min_rows": 0, "nprobe": 8,
                    "n_clusters": 4, "bucket_rows": 64,
                    "self_check": False}))
    s.add_vectors(x)
    calls = {"n": 0}
    orig = s._ann_batch_query

    def spy(*a, **kw):
        calls["n"] += 1
        return orig(*a, **kw)

    s._ann_batch_query = spy
    ids, scores, _ = s.query(x[3], k=40)
    assert ids[0] == 3 and len(ids) == 40
    assert calls["n"] == 0, "large-k must bypass the IVF probe path"
    ids, _, _ = s.query(x[3], k=10)
    assert calls["n"] == 1 and ids[0] == 3
