"""Sharding tests on the virtual 8-device CPU mesh.

The invariant SURVEY.md §4 prescribes: sharded local-top-k + ICI merge must
EQUAL the single-device flat top-k (same indices, same scores).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpu_vector_db.ops import distance as D
from tpu_vector_db.ops.scan import flat_scan_topk
from tpu_vector_db.parallel import ShardedVectorStore, make_device_mesh
from tpu_vector_db.parallel.sharded_scan import make_sharded_query_fn
from tpu_vector_db.store import TPUVectorStore, VectorStoreConfig


@pytest.fixture(scope="module")
def mesh():
    assert jax.device_count() >= 8, "conftest must provide 8 CPU devices"
    return make_device_mesh(8)


class TestShardedScan:
    @pytest.mark.parametrize("metric", ["cosine", "euclidean", "dot_product"])
    def test_sharded_equals_flat(self, mesh, rng, metric):
        n_dev, block, d, q_n, k = 8, 64, 32, 5, 10
        n = 3000
        cap = ((n + block * n_dev - 1) // (block * n_dev)) * block * n_dev
        db = np.zeros((cap, d), np.float32)
        db[:n] = rng.standard_normal((n, d))
        q = rng.standard_normal((q_n, d), dtype=np.float32)

        dbj = jnp.asarray(db)
        if metric == "cosine":
            dbj = D.l2_normalize(dbj)
        sq = jnp.sum(jnp.asarray(db) ** 2, axis=-1) if metric == "euclidean" else None

        ref_keys, ref_idx = flat_scan_topk(
            jnp.asarray(q), dbj, jnp.int32(n), k, metric=metric,
            db_normalized=True, db_sqnorms=sq, block_rows=block)

        fn, _ = make_sharded_query_fn(
            mesh, k, metric=metric, db_normalized=True,
            with_sqnorms=(sq is not None), block_rows=block)
        from tpu_vector_db.parallel.mesh import row_sharding, replicated
        db_sh = jax.device_put(dbj, row_sharding(mesh))
        qr = jax.device_put(jnp.asarray(q), replicated(mesh))
        args = (qr, db_sh, jnp.int32(n)) + ((jax.device_put(
            sq, jax.sharding.NamedSharding(
                mesh, jax.sharding.PartitionSpec("shard"))),) if sq is not None else ())
        keys, idx = fn(*args)

        np.testing.assert_allclose(np.asarray(keys), np.asarray(ref_keys),
                                   atol=1e-4)
        # ties can permute equal-score indices; check score-equivalence
        assert np.allclose(np.asarray(keys), np.asarray(ref_keys), atol=1e-4)
        np.testing.assert_array_equal(np.asarray(idx), np.asarray(ref_idx))


class TestShardedStore:
    def test_store_equivalence(self, tmp_path, rng):
        d, n = 24, 500
        vecs = rng.standard_normal((n, d)).astype(np.float32)
        meta = [{"i": i, "grp": i % 4} for i in range(n)]

        cfg = dict(dimension=d, block_rows=64, initial_capacity=64,
                   persist_mode="off")
        flat = TPUVectorStore(tmp_path / "flat", VectorStoreConfig(**cfg))
        shard = ShardedVectorStore(tmp_path / "shard",
                                   VectorStoreConfig(**cfg),
                                   mesh=make_device_mesh(8))
        flat.add_vectors(vecs, meta)
        shard.add_vectors(vecs, meta)

        q = rng.standard_normal((6, d)).astype(np.float32)
        rf = flat.batch_query(q, k=7)
        rs = shard.batch_query(q, k=7)
        for (i1, s1, m1), (i2, s2, m2) in zip(rf, rs):
            assert i1 == i2
            np.testing.assert_allclose(s1, s2, atol=1e-4)
            assert m1 == m2

    def test_sharded_filter(self, tmp_path, rng):
        d = 16
        shard = ShardedVectorStore(
            tmp_path / "s", VectorStoreConfig(
                dimension=d, block_rows=64, initial_capacity=64,
                persist_mode="off"),
            mesh=make_device_mesh(8))
        vecs = rng.standard_normal((300, d)).astype(np.float32)
        shard.add_vectors(vecs, [{"grp": i % 3} for i in range(300)])
        idx, _, meta = shard.query(vecs[0], k=5, filter_metadata={"grp": 2})
        assert len(idx) == 5
        assert all(m["grp"] == 2 for m in meta)

    def test_sharded_incremental_add(self, tmp_path, rng):
        d = 16
        shard = ShardedVectorStore(
            tmp_path / "s", VectorStoreConfig(
                dimension=d, block_rows=64, initial_capacity=64,
                persist_mode="off"),
            mesh=make_device_mesh(8))
        all_v = []
        for _ in range(4):
            v = rng.standard_normal((200, d)).astype(np.float32)
            shard.add_vectors(v)
            all_v.append(v)
        flatv = np.concatenate(all_v)
        idx, scores, _ = shard.query(flatv[555], k=1)
        assert idx == [555] and scores[0] > 0.999
        stats = shard.get_stats()
        assert stats["sharded"] and stats["n_devices"] == 8

    @pytest.mark.parametrize("metric", ["cosine", "euclidean"])
    def test_inplace_append_no_replacement(self, tmp_path, rng, metric,
                                           monkeypatch):
        """Adds within capacity must NOT re-create/re-ship the sharded
        buffer (round-1 finding #4): only the first add (allocation) and
        capacity growth may call _reset_device."""
        d = 16
        shard = ShardedVectorStore(
            tmp_path / "ip", VectorStoreConfig(
                dimension=d, metric=metric, block_rows=64,
                initial_capacity=64, persist_mode="off"),
            mesh=make_device_mesh(8))
        resets = []
        orig = ShardedVectorStore._reset_device
        monkeypatch.setattr(
            ShardedVectorStore, "_reset_device",
            lambda self, cap: (resets.append(cap), orig(self, cap))[1])
        v0 = rng.standard_normal((64, d)).astype(np.float32)
        shard.add_vectors(v0)          # allocation
        allocs_after_first = len(resets)
        db_before = shard._db
        chunks = [rng.standard_normal((40, d)).astype(np.float32)
                  for _ in range(4)]
        for c in chunks:
            shard.add_vectors(c)       # all fit in the 512-row capacity
        assert len(resets) == allocs_after_first, (
            "in-capacity adds re-created the device buffer")
        assert shard._db.sharding == db_before.sharding
        # correctness: every appended row is its own nearest neighbor
        allv = np.concatenate([v0] + chunks)
        for probe in (70, 130, 223):
            idx, scores, _ = shard.query(allv[probe], k=1)
            assert idx == [probe], (probe, idx)
        # and equals an unsharded store on the same data
        flat = TPUVectorStore(
            tmp_path / "flat",
            VectorStoreConfig(dimension=d, metric=metric, block_rows=64,
                              persist_mode="off"))
        flat.add_vectors(allv)
        q = rng.standard_normal((3, d)).astype(np.float32)
        got = shard.batch_query(q, k=5)
        want = flat.batch_query(q, k=5)
        for g, w in zip(got, want):
            assert g[0] == w[0]
            np.testing.assert_allclose(g[1], w[1], atol=1e-3)


class TestServingMesh2D:
    def test_replica_shard_mesh_equals_flat(self, rng):
        from tpu_vector_db.parallel.mesh import make_serving_mesh, SHARD_AXIS
        from tpu_vector_db.parallel.sharded_scan import make_serving_query_fn
        from jax.sharding import NamedSharding, PartitionSpec as P

        mesh = make_serving_mesh(2, 4)
        n_dev_shard, block, d, k = 4, 64, 32, 5
        n = 1500
        cap = ((n + block * n_dev_shard - 1) //
               (block * n_dev_shard)) * block * n_dev_shard
        db = np.zeros((cap, d), np.float32)
        db[:n] = rng.standard_normal((n, d))
        queries = rng.standard_normal((8, d)).astype(np.float32)  # 4 per group

        dbj = D.l2_normalize(jnp.asarray(db))
        ref_keys, ref_idx = flat_scan_topk(
            jnp.asarray(queries), dbj, jnp.int32(n), k,
            metric="cosine", db_normalized=True, block_rows=block)

        fn = make_serving_query_fn(mesh, k, block_rows=block)
        db_sh = jax.device_put(dbj, NamedSharding(mesh, P(SHARD_AXIS, None)))
        q_sh = jax.device_put(jnp.asarray(queries),
                              NamedSharding(mesh, P("replica", None)))
        keys, idx = fn(q_sh, db_sh, jnp.int32(n))
        np.testing.assert_array_equal(np.asarray(idx), np.asarray(ref_idx))
        np.testing.assert_allclose(np.asarray(keys), np.asarray(ref_keys),
                                   atol=1e-4)


class TestShardedANN:
    def test_sharded_ann_recall_and_merge(self, tmp_path, rng):
        from tpu_vector_db.index import native
        if not native.available():
            pytest.skip("no native builder")
        d, n = 32, 4000
        # clustered data (the regime ANN serves)
        centers = rng.standard_normal((50, d)).astype(np.float32) * 3
        vecs = (centers[rng.integers(0, 50, n)] +
                rng.standard_normal((n, d))).astype(np.float32)
        cfg = VectorStoreConfig(
            dimension=d, block_rows=128, initial_capacity=128,
            persist_mode="off", enable_ann=True,
            ann_params={"index_type": "beam_graph", "M": 8, "ef_construction": 64, "ef_search": 64})
        store = ShardedVectorStore(tmp_path / "sann", cfg,
                                   mesh=make_device_mesh(8))
        store.add_vectors(vecs, [{"g": i % 3} for i in range(n)])
        assert store._ann is not None and store._ann.built

        queries = (centers[rng.integers(0, 50, 20)] +
                   rng.standard_normal((20, d))).astype(np.float32)
        hits = total = 0
        for q in queries:
            ann_ids, ann_scores, _ = store.query(q, k=5)
            exact_ids, _, _ = store.query(q, k=5, use_ann=False)
            hits += len(set(ann_ids) & set(exact_ids))
            total += len(exact_ids)
            assert len(ann_ids) == 5
            assert all(ann_scores[i] >= ann_scores[i + 1]
                       for i in range(len(ann_scores) - 1))
        assert hits / total >= 0.9, f"sharded ANN recall {hits/total:.3f}"

        # filtered path oversamples + post-checks
        idx, _, meta = store.query(queries[0], k=5,
                                   filter_metadata={"g": 1})
        assert all(m["g"] == 1 for m in meta)

    def test_sharded_ann_self_query(self, tmp_path, rng):
        from tpu_vector_db.index import native
        if not native.available():
            pytest.skip("no native builder")
        d = 16
        cfg = VectorStoreConfig(
            dimension=d, block_rows=64, initial_capacity=64,
            persist_mode="off", enable_ann=True,
            ann_params={"index_type": "beam_graph", "M": 8, "ef_construction": 64, "ef_search": 64})
        store = ShardedVectorStore(tmp_path / "s2", cfg,
                                   mesh=make_device_mesh(8))
        vecs = rng.standard_normal((900, d)).astype(np.float32)
        store.add_vectors(vecs)
        # self-queries across different shards must find themselves
        for probe in (3, 450, 890):
            idx, scores, _ = store.query(vecs[probe], k=1)
            assert idx == [probe] and scores[0] > 0.999

    def test_sharded_ann_incremental_extend(self, tmp_path, rng,
                                            monkeypatch):
        """In-capacity adds must EXTEND per-shard subgraphs (native
        extend_graph), not rebuild them (round-1 finding #4)."""
        from tpu_vector_db.index import native
        from tpu_vector_db.parallel.sharded_ann import ShardedBeamGraph
        if not native.available():
            pytest.skip("no native builder")
        d = 16
        cfg = VectorStoreConfig(
            dimension=d, block_rows=64, initial_capacity=64,
            persist_mode="off", enable_ann=True,
            ann_params={"index_type": "beam_graph", "M": 8, "ef_construction": 64, "ef_search": 64,
                        "self_check": False})
        store = ShardedVectorStore(tmp_path / "inc", cfg,
                                   mesh=make_device_mesh(8))
        builds, adds = [], []
        orig_build = ShardedBeamGraph.build
        orig_add = ShardedBeamGraph.add
        monkeypatch.setattr(
            ShardedBeamGraph, "build",
            lambda self, *a, **k: (builds.append(1),
                                   orig_build(self, *a, **k))[1])
        monkeypatch.setattr(
            ShardedBeamGraph, "add",
            lambda self, *a, **k: (adds.append(1),
                                   orig_add(self, *a, **k))[1])
        vecs = rng.standard_normal((1600, d)).astype(np.float32)
        store.add_vectors(vecs[:256])    # initial build (capacity 512)
        base_builds = len(builds)
        cap = store._cap
        assert cap >= 512
        # top up within the current capacity: every add must be an extend
        added = 256
        while added + 128 <= cap:
            store.add_vectors(vecs[added: added + 128])
            added += 128
        assert len(builds) == base_builds, "in-capacity add rebuilt the ANN"
        assert len(adds) >= 1
        assert store._ann.size == added
        # the extended graph still finds new rows (exact self-match via ANN)
        for probe in (added - 5, added - 100, 40):
            idx, scores, _ = store.query(vecs[probe], k=1)
            assert idx == [probe], (probe, idx)


class TestShardedIVF:
    """parallel/sharded_ivf.py: per-shard quantizers + ICI merge."""

    def _mk_data(self, rng, n, d, centers=16):
        mu = rng.standard_normal((centers, d)).astype(np.float32) * 3
        x = (mu[rng.integers(0, centers, n)]
             + 0.2 * rng.standard_normal((n, d))).astype(np.float32)
        return x

    def test_full_probe_equals_flat(self, mesh, rng):
        """nprobe >= all buckets makes the probe scan exhaustive: the
        merged sharded-IVF top-k must equal the exact sharded scan."""
        from tpu_vector_db.parallel.sharded_ivf import ShardedIVF
        n, d, k, cap = 600, 24, 10, 1024
        x = self._mk_data(rng, n, d)
        ivf = ShardedIVF(dim=d, metric="cosine", mesh=mesh, nprobe=512,
                         n_clusters=4, bucket_rows=64,
                         storage_dtype=jnp.float32)
        ivf.build(x, n, cap)
        q = x[:7] / np.linalg.norm(x[:7], axis=1, keepdims=True)
        qj = jnp.asarray(D.pad_dim(jnp.asarray(q)))
        fn = ivf.make_search_fn(k, nprobe=ivf._nb_pad, with_sqnorms=False)
        keys, gids = fn(qj, *ivf.search_args())
        keys, gids = np.asarray(keys), np.asarray(gids)

        xn = x / np.linalg.norm(x, axis=1, keepdims=True)
        exact = np.argsort(-(q @ xn.T), axis=1)[:, :k]
        for i in range(len(q)):
            assert set(gids[i]) == set(exact[i]), (
                f"query {i}: {sorted(gids[i])} != {sorted(exact[i])}")

    def test_auto_kind_agrees_with_built_index(self, tmp_path, rng):
        """index_type='auto' on a sharded store must resolve to 'ivf'
        everywhere: _refresh_ann builds ShardedIVF even below the
        single-chip flat crossover, so _ann_kind (query k-routing) and
        get_stats()['index_type'] must say 'ivf' too."""
        d = 24
        x = self._mk_data(rng, 300, d)
        store = ShardedVectorStore(
            tmp_path / "sauto",
            VectorStoreConfig(dimension=d, metric="cosine",
                              enable_ann=True,
                              ann_params={"min_rows": 0, "nprobe": 64,
                                          "n_clusters": 4,
                                          "bucket_rows": 64,
                                          "self_check": False}),
            mesh=make_device_mesh(8))
        store.add_vectors(x)
        from tpu_vector_db.parallel.sharded_ivf import ShardedIVF
        assert isinstance(store._ann, ShardedIVF)
        assert store._ann_kind == "ivf"
        assert store.get_stats()["index_type"] == "ivf"

    def test_store_integration_and_incremental(self, tmp_path, rng):
        n, d = 500, 24
        x = self._mk_data(rng, n, d)
        store = ShardedVectorStore(
            tmp_path / "sivf",
            VectorStoreConfig(dimension=d, metric="cosine",
                              enable_ann=True,
                              ann_params={"index_type": "ivf",
                                          "min_rows": 0, "nprobe": 64,
                                          "n_clusters": 4,
                                          "bucket_rows": 64,
                                          "self_check": False}),
            mesh=make_device_mesh(8))
        store.add_vectors(x[:400])
        from tpu_vector_db.parallel.sharded_ivf import ShardedIVF
        assert isinstance(store._ann, ShardedIVF)
        ids, scores, _ = store.query(x[5], k=3)
        assert ids[0] == 5 and scores[0] > 0.99

        # incremental add extends in place (no rebuild of the quantizers)
        subs_before = store._ann._subs
        r = store._ann  # same object must survive the add
        store.add_vectors(x[400:])
        assert store._ann is r and store._ann._subs is subs_before
        assert store._ann.size == n
        ids, _, _ = store.query(x[450], k=3)
        assert 450 in list(ids)


def test_sharded_int8_storage(tmp_path, rng):
    """int8 capacity mode works through the sharded scan + merge."""
    x = rng.standard_normal((400, 32)).astype(np.float32)
    store = ShardedVectorStore(
        tmp_path / "i8s",
        VectorStoreConfig(dimension=32, metric="cosine",
                          storage_dtype="int8", persist_mode="off"),
        mesh=make_device_mesh(8))
    store.add_vectors(x)
    ids, scores, _ = store.query(x[9], k=3)
    assert ids[0] == 9 and 0.99 < scores[0] <= 1.0


class TestShardedAnnPersistence:
    """Sharded indexes persist and reload without rebuilding (round-2:
    previously every restart re-ran k-means / the native graph build)."""

    def test_sharded_ivf_reload(self, tmp_path, rng):
        x = rng.standard_normal((400, 24)).astype(np.float32)
        cfg = VectorStoreConfig(
            dimension=24, metric="cosine", enable_ann=True,
            ann_params={"index_type": "ivf", "min_rows": 0, "nprobe": 64,
                        "n_clusters": 4, "bucket_rows": 64,
                        "self_check": False})
        s = ShardedVectorStore(tmp_path / "pivf", cfg,
                               mesh=make_device_mesh(8))
        s.add_vectors(x)
        ids0, _, _ = s.query(x[5], k=3)
        s.flush()

        s2 = ShardedVectorStore(tmp_path / "pivf", cfg,
                                mesh=make_device_mesh(8))
        from tpu_vector_db.parallel.sharded_ivf import ShardedIVF
        assert isinstance(s2._ann, ShardedIVF)
        assert s2._ann.build_time_s == 0.0, "reload must not rebuild"
        ids1, _, _ = s2.query(x[5], k=3)
        assert list(ids0) == list(ids1)

    def test_sharded_graph_reload(self, tmp_path, rng):
        from tpu_vector_db.index import native
        if not native.available():
            pytest.skip("native builder unavailable")
        x = rng.standard_normal((400, 24)).astype(np.float32)
        cfg = VectorStoreConfig(
            dimension=24, metric="cosine", enable_ann=True,
            ann_params={"min_rows": 0, "index_type": "beam_graph", "M": 4, "ef_construction": 32,
                        "self_check": False})
        s = ShardedVectorStore(tmp_path / "pg", cfg,
                               mesh=make_device_mesh(8))
        s.add_vectors(x)
        ids0, _, _ = s.query(x[5], k=3)
        s.flush()

        s2 = ShardedVectorStore(tmp_path / "pg", cfg,
                                mesh=make_device_mesh(8))
        from tpu_vector_db.parallel.sharded_ann import ShardedBeamGraph
        assert isinstance(s2._ann, ShardedBeamGraph)
        assert s2._ann.build_time_s == 0.0, "reload must not rebuild"
        ids1, _, _ = s2.query(x[5], k=3)
        assert list(ids0) == list(ids1)


def test_sharded_ivf_spill_buckets_searchable(tmp_path, rng):
    """Incremental adds that SPILL into new buckets must be probe-visible
    (dev bucket_cluster used to stay -1 for them — review finding)."""
    from tpu_vector_db.parallel.sharded_ivf import ShardedIVF
    d = 16
    base = rng.standard_normal((1, d)).astype(np.float32) * 3
    x = np.concatenate([base + 0.05 * rng.standard_normal((96, d))
                        .astype(np.float32)])  # ONE tight cluster
    extra = (base + 0.05 * rng.standard_normal((32, d))
             .astype(np.float32))
    host = np.concatenate([x, extra])
    mesh = make_device_mesh(8)
    # capacity 1024 -> 128 rows/shard; all 160 rows land in shards 0-1;
    # bucket_rows=32 so shard 0's single cluster needs spill buckets
    ivf = ShardedIVF(dim=d, metric="cosine", mesh=mesh, nprobe=4,
                     n_clusters=1, bucket_rows=32,
                     storage_dtype=jnp.float32)
    ivf.build(host[:96], 96, 1024)
    r = ivf.add(host, 96, 128)  # stays inside shard 0: scatter path
    assert not r["reassembled"], "test needs the scatter path"
    qn = extra[:8] / np.linalg.norm(extra[:8], axis=1, keepdims=True)
    qj = jnp.asarray(D.pad_dim(jnp.asarray(qn)))
    fn = ivf.make_search_fn(10, nprobe=ivf._nb_pad, with_sqnorms=False)
    _, gids = fn(qj, *ivf.search_args())
    found = set(np.asarray(gids).ravel().tolist())
    new_found = [g for g in range(96, 128) if g in found]
    assert new_found, "spilled rows must be findable after add"


def test_sharded_graph_reload_then_extend(tmp_path, rng):
    """A reloaded sharded graph must accept incremental adds (the load
    path restores the host arrays the native extender works on)."""
    from tpu_vector_db.index import native
    if not native.available():
        pytest.skip("native builder unavailable")
    x = rng.standard_normal((500, 24)).astype(np.float32)
    cfg = VectorStoreConfig(
        dimension=24, metric="cosine", enable_ann=True,
        ann_params={"min_rows": 0, "index_type": "beam_graph", "M": 4, "ef_construction": 32,
                    "self_check": False})
    s = ShardedVectorStore(tmp_path / "pge", cfg,
                           mesh=make_device_mesh(8))
    s.add_vectors(x[:400])
    s.flush()
    s2 = ShardedVectorStore(tmp_path / "pge", cfg,
                            mesh=make_device_mesh(8))
    assert s2._ann.build_time_s == 0.0
    s2.add_vectors(x[400:])            # extend the RELOADED subgraphs
    assert s2._ann.size == 500
    ids, _, _ = s2.query(x[450], k=3)
    assert 450 in list(ids)


class TestShardedInt4:
    """int4 capacity mode through the sharded scan (uint8-packed rows +
    per-row scales, both row-sharded; 2x int8's rows per chip across the
    mesh — a v5e-8 slice holds 256M x 768D)."""

    def test_sharded_matches_single(self, tmp_path, rng):
        x = rng.standard_normal((500, 256)).astype(np.float32)
        cfg = dict(dimension=256, metric="cosine", storage_dtype="int4",
                   persist_mode="off")
        sh = ShardedVectorStore(tmp_path / "i4s", VectorStoreConfig(**cfg),
                                mesh=make_device_mesh(8))
        sh.add_vectors(x)
        single = TPUVectorStore(tmp_path / "i4one", VectorStoreConfig(**cfg))
        single.add_vectors(x)
        for i in (3, 99, 250):
            ids_s, sc_s, _ = sh.query(x[i], k=5)
            ids_1, sc_1, _ = single.query(x[i], k=5)
            assert ids_s[0] == i
            # identical quantized rows -> identical keys either path
            np.testing.assert_allclose(sc_s, sc_1, atol=2e-2)

    def test_sharded_int4_inplace_append(self, tmp_path, rng):
        store = ShardedVectorStore(
            tmp_path / "i4a",
            VectorStoreConfig(dimension=256, metric="cosine",
                              storage_dtype="int4", persist_mode="off",
                              block_rows=64, initial_capacity=4096),
            mesh=make_device_mesh(8))
        a = rng.standard_normal((300, 256)).astype(np.float32)
        b = rng.standard_normal((200, 256)).astype(np.float32)
        store.add_vectors(a)
        store.add_vectors(b)  # fits capacity -> exercises _append_in_place
        assert store.vector_count == 500
        ids, sc, _ = store.query(b[17], k=1)
        assert ids[0] == 300 + 17 and sc[0] > 0.97

    def test_sharded_int4_filtered(self, tmp_path, rng):
        store = ShardedVectorStore(
            tmp_path / "i4f",
            VectorStoreConfig(dimension=256, metric="cosine",
                              storage_dtype="int4", persist_mode="off"),
            mesh=make_device_mesh(8))
        x = rng.standard_normal((300, 256)).astype(np.float32)
        store.add_vectors(x, [{"par": i % 3} for i in range(300)])
        ids, _, metas = store.query(x[12], k=4, filter_metadata={"par": 0})
        assert ids[0] == 12
        assert all(m["par"] == 0 for m in metas)


def test_sharded_delete_vectors(tmp_path, rng):
    """Tombstones on a sharded store: masked out of the sharded exact
    scan and post-filtered out of sharded ANN results."""
    from tpu_vector_db.parallel.mesh import make_device_mesh
    from tpu_vector_db.parallel.sharded_store import ShardedVectorStore
    from tpu_vector_db.store.config import VectorStoreConfig
    d, n = 32, 400
    x = rng.standard_normal((n, d)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    store = ShardedVectorStore(
        tmp_path / "sdel",
        VectorStoreConfig(dimension=d, metric="cosine", enable_ann=True,
                          ann_params={"min_rows": 0, "nprobe": 64,
                                      "n_clusters": 2, "bucket_rows": 64,
                                      "self_check": False}),
        mesh=make_device_mesh(8))
    store.add_vectors(x, [{"i": i} for i in range(n)])
    ids0, _, _ = store.query(x[5], k=3)
    assert ids0[0] == 5
    store.delete_vectors([5])
    assert len(store) == n - 1
    ids, _, _ = store.query(x[5], k=5)
    assert 5 not in ids and len(ids) == 5
    # exact path (no ANN) also masks
    ids, _, _ = store.batch_query(x[5:6], k=5, use_ann=False)[0]
    assert 5 not in ids
