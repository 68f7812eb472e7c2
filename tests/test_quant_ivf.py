"""Gather-layout IVF over the quantized capacity modes (int8/int4).

The capacity modes exist because the rows barely fit one chip, so the
bucketized IVF row copy cannot — index/ivf.py switches to a GATHER layout
(device holds only the id table + centroids; probes gather rows from the
store's flat matrix via ops/ivf_scan.ivf_probe_topk_gather). These tests
pin: kernel-level full-probe == exact scan on the same quantized rows,
k-means on quantized inputs, store-level auto routing / recall /
incremental add / persistence, and the sharded guard (quantized sharded
stores serve the exact per-shard sweep).

Reference contrast: the reference serves at most ~10M f32 rows and routes
ANN through hnswlib (performance/hnsw_index.py); it has no quantized
storage tier at all (its 4-bit registry is model weights, not vectors).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from tpu_vector_db.ops import kmeans
from tpu_vector_db.ops.ivf_scan import ivf_probe_topk_gather
from tpu_vector_db.ops.quant4 import pack_int4, unpack_int4
from tpu_vector_db.ops.scan import flat_scan_topk
from tpu_vector_db.store.config import VectorStoreConfig
from tpu_vector_db.store.vector_store import TPUVectorStore


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def unit_rows(rng, n, d):
    x = rng.normal(size=(n, d)).astype(np.float32)
    return x / np.linalg.norm(x, axis=1, keepdims=True)


def to_int8(x):
    return jnp.clip(jnp.round(jnp.asarray(x) * 127.0), -127, 127
                    ).astype(jnp.int8)


class TestKmeansQuantized:
    def test_int8_trains_unit_centroids(self, rng):
        x = unit_rows(rng, 2048, 64)
        cents, counts = kmeans.train_kmeans(
            to_int8(x), 2048, 16, metric="cosine", iters=4)
        norms = np.linalg.norm(np.asarray(cents), axis=1)
        np.testing.assert_allclose(norms, 1.0, atol=1e-5)
        assert float(np.asarray(counts).sum()) == 2048

    def test_int4_assign_matches_f32_assign(self, rng):
        x = unit_rows(rng, 1024, 64)
        packed, scales = pack_int4(jnp.asarray(x))
        deq = np.asarray(unpack_int4(packed, scales))
        cents, _ = kmeans.train_kmeans(
            packed, 1024, 8, metric="cosine", iters=3, db_scales=scales)
        a_q = np.asarray(kmeans.assign_clusters(
            packed, jnp.int32(1024), cents, db_scales=scales))[:1024]
        a_f = np.asarray(kmeans.assign_clusters(
            jnp.asarray(deq), jnp.int32(1024), cents))[:1024]
        # same centroids, same (dequantized) rows: assignments agree up to
        # bf16-vs-f32 rounding on near-tied rows — any disagreeing row's
        # two centroid scores must be within bf16 eps of each other
        diff = np.where(a_q != a_f)[0]
        assert len(diff) < 0.02 * len(a_q), len(diff)
        cn = np.asarray(cents)
        for i in diff:
            s_q = float(deq[i] @ cn[a_q[i]])
            s_f = float(deq[i] @ cn[a_f[i]])
            assert abs(s_q - s_f) < 0.01, (i, s_q, s_f)


class TestGatherProbeKernel:
    def _full_probe_ids(self, n, bc):
        """Bucket table covering rows 0..n-1 in order, plus a ragged tail."""
        nb = -(-n // bc)
        ids = np.full((nb, bc), -1, np.int32)
        flat = np.arange(n, dtype=np.int32)
        ids.reshape(-1)[:n] = flat
        return jnp.asarray(ids)

    def test_int8_full_probe_equals_exact(self, rng):
        n, d, q_n, k = 1000, 64, 5, 10
        x = unit_rows(rng, n, d)
        db8 = to_int8(x)
        q = jnp.asarray(unit_rows(rng, q_n, d))
        ids = self._full_probe_ids(n, 128)
        nb = ids.shape[0]
        sel = jnp.tile(jnp.arange(nb, dtype=jnp.int32)[None, :], (q_n, 1))
        keys, gids = ivf_probe_topk_gather(q, db8, ids, sel, k)
        ek, ei = flat_scan_topk(q, db8, jnp.int32(n), n, metric="cosine",
                                db_normalized=True)
        # full probe must reproduce the exact top-k KEYS (ids may tie-swap)
        topk_exact = np.sort(np.asarray(ek), axis=1)[:, ::-1][:, :k]
        np.testing.assert_allclose(
            np.sort(np.asarray(keys), axis=1)[:, ::-1], topk_exact,
            rtol=5e-3, atol=1e-3)  # gather path scores in bf16 (like the
        # TPU flat engine); the CPU XLA reference scores in f32

    def test_int4_full_probe_matches_dequant_ground_truth(self, rng):
        n, d, q_n, k = 600, 128, 4, 8
        x = unit_rows(rng, n, d)
        packed, scales = pack_int4(jnp.asarray(x))
        deq = np.asarray(unpack_int4(packed, scales))
        q = unit_rows(rng, q_n, d)
        ids = self._full_probe_ids(n, 64)
        nb = ids.shape[0]
        sel = jnp.tile(jnp.arange(nb, dtype=jnp.int32)[None, :], (q_n, 1))
        keys, gids = ivf_probe_topk_gather(
            jnp.asarray(q), packed, ids, sel, k, db_scales=scales)
        keys = np.asarray(keys)
        gids = np.asarray(gids)
        gt = q @ deq.T                              # true dequantized scores
        order = np.argsort(-gt, axis=1)[:, :k]
        # bf16 query rounding (the same convention as the fused TPU
        # quant4 kernel) bounds parity at ~1e-3 on unit-scale scores
        np.testing.assert_allclose(
            np.sort(keys, axis=1),
            np.sort(np.take_along_axis(gt, order, axis=1), axis=1),
            atol=2e-3)
        # every returned id's true score matches its returned key
        sel_scores = np.take_along_axis(gt, gids, axis=1)
        np.testing.assert_allclose(keys, sel_scores, atol=2e-3)

    def test_euclidean_rejected(self, rng):
        with pytest.raises(ValueError, match="cosine"):
            ivf_probe_topk_gather(
                jnp.zeros((1, 8)), jnp.zeros((4, 8), jnp.int8),
                jnp.zeros((1, 4), jnp.int32), jnp.zeros((1, 1), jnp.int32),
                2, metric="euclidean")


ANN_PARAMS = {"auto_flat_rows": 1000, "min_rows": 0, "n_clusters": 8,
              "nprobe": 8, "bucket_rows": 512, "self_check": True}


class TestQuantizedStoreIVF:
    @pytest.mark.parametrize("dtype", ["int8", "int4"])
    def test_auto_builds_gather_ivf_and_serves(self, tmp_path, rng, dtype):
        d = 64
        x = unit_rows(rng, 3000, d)
        store = TPUVectorStore(
            tmp_path / f"q_{dtype}",
            VectorStoreConfig(dimension=d, metric="cosine",
                              storage_dtype=dtype, enable_ann=True,
                              ann_params=dict(ANN_PARAMS)))
        store.add_vectors(x, [{"i": i} for i in range(3000)])
        assert store._ann_kind == "ivf"
        st = store._ann.get_stats()
        assert st["layout"] == "gather"
        # full coverage (nprobe=8 of 8 clusters) -> score parity vs exact
        ids, scores, _ = store.query(x[42], k=5)
        assert ids[0] == 42 or scores[0] >= 0.98
        assert scores[0] > 0.9
        # exact-engine comparison on the same store (force flat)
        exact = store.batch_query(x[:8], k=5, use_ann=False)
        annr = store.batch_query(x[:8], k=5)
        for (ei, es, _), (ai, asc, _) in zip(exact, annr):
            np.testing.assert_allclose(np.asarray(asc), np.asarray(es),
                                       atol=6e-3)  # bf16 scoring eps

    def test_int8_incremental_add_and_reload(self, tmp_path, rng):
        d = 64
        x = unit_rows(rng, 2500, d)
        path = tmp_path / "q_inc"
        store = TPUVectorStore(
            path, VectorStoreConfig(dimension=d, metric="cosine",
                                    storage_dtype="int8", enable_ann=True,
                                    ann_params=dict(ANN_PARAMS)))
        store.add_vectors(x[:2000], [{} for _ in range(2000)])
        assert store._ann_kind == "ivf"
        size0 = store._ann.size
        store.add_vectors(x[2000:], [{} for _ in range(500)])
        assert store._ann.size == 2500 and size0 == 2000
        ids, scores, _ = store.query(x[2345], k=3)
        assert scores[0] > 0.9
        store.flush()
        store2 = TPUVectorStore(path)
        assert store2._ann is not None and store2._ann.size == 2500
        ids2, scores2, _ = store2.query(x[2345], k=3)
        np.testing.assert_allclose(scores2[0], scores[0], atol=1e-3)

    def test_filtered_ann_query(self, tmp_path, rng):
        d = 64
        x = unit_rows(rng, 2000, d)
        store = TPUVectorStore(
            tmp_path / "q_filt",
            VectorStoreConfig(dimension=d, metric="cosine",
                              storage_dtype="int8", enable_ann=True,
                              ann_params=dict(ANN_PARAMS)))
        store.add_vectors(x, [{"par": i % 2} for i in range(2000)])
        ids, scores, md = store.query(x[10], k=5,
                                      filter_metadata={"par": 0})
        assert len(ids) > 0
        assert all(m["par"] == 0 for m in md)

    def test_quantize_unit_rows_roundtrip(self, rng):
        """The shared quantizer's int4 path must roundtrip within the
        nibble step and keep dequantized rows unit-norm; int8 must be the
        fixed x127 scale."""
        from tpu_vector_db.ops.quant4 import quantize_unit_rows
        x = unit_rows(rng, 64, 128)
        q8, s8 = quantize_unit_rows(jnp.asarray(x), "int8")
        assert s8 is None and q8.dtype == jnp.int8
        np.testing.assert_allclose(np.asarray(q8, np.float32) / 127.0, x,
                                   atol=0.5 / 127.0)
        p4, s4 = quantize_unit_rows(jnp.asarray(x), "int4")
        deq = np.asarray(unpack_int4(p4, s4))
        np.testing.assert_allclose(np.linalg.norm(deq, axis=1), 1.0,
                                   atol=1e-5)
        cos = np.sum(deq * x, axis=1)
        assert cos.min() > 0.98, cos.min()
        with pytest.raises(ValueError):
            quantize_unit_rows(jnp.asarray(x), "bfloat16")

    def test_sharded_quant_reload_skips_rebuild(self, tmp_path, rng):
        from tpu_vector_db.parallel.mesh import make_device_mesh
        from tpu_vector_db.parallel.sharded_ivf import ShardedIVF
        from tpu_vector_db.parallel.sharded_store import ShardedVectorStore
        d, n = 64, 500
        x = unit_rows(rng, n, d)
        path = tmp_path / "q_shard_reload"
        cfg = VectorStoreConfig(dimension=d, metric="cosine",
                                storage_dtype="int8", enable_ann=True,
                                ann_params={**ANN_PARAMS, "n_clusters": 2,
                                            "nprobe": 64,
                                            "bucket_rows": 64})
        mesh = make_device_mesh(8)
        store = ShardedVectorStore(path, cfg, mesh=mesh)
        store.add_vectors(x)
        want = store.query(x[17], k=3)
        store.flush()
        store2 = ShardedVectorStore(path, mesh=mesh)
        assert isinstance(store2._ann, ShardedIVF)
        assert store2._ann.quant == "int8"
        assert store2._ann._dev["buckets"] is None
        assert store2._ann.size == n
        got = store2.query(x[17], k=3)
        assert got[0][0] == want[0][0]
        np.testing.assert_allclose(got[1][0], want[1][0], atol=1e-3)

    def test_bf16_gather_layout_knob(self, tmp_path, rng):
        """ivf_layout='gather' keeps bf16 IVF memory at the id table
        (no bucketized row copy) and still matches the exact engine on a
        full probe."""
        d = 64
        x = unit_rows(rng, 2000, d)
        store = TPUVectorStore(
            tmp_path / "bf16_gather",
            VectorStoreConfig(dimension=d, metric="cosine",
                              storage_dtype="bfloat16", enable_ann=True,
                              ann_params={**ANN_PARAMS,
                                          "ivf_layout": "gather"}))
        store.add_vectors(x, [{} for _ in range(2000)])
        assert store._ann_kind == "ivf"
        ids, scores, _ = store.query(x[99], k=5)
        st = store._ann.get_stats()
        assert st["layout"] == "gather"
        exact = store.batch_query(x[:6], k=5, use_ann=False)
        annr = store.batch_query(x[:6], k=5)
        for (ei, es, _), (ai, asc, _) in zip(exact, annr):
            np.testing.assert_allclose(np.asarray(asc), np.asarray(es),
                                       atol=6e-3)

    def test_bucketized_override_on_quantized_warns_to_gather(
            self, tmp_path, rng):
        d = 64
        x = unit_rows(rng, 1500, d)
        store = TPUVectorStore(
            tmp_path / "q_forced",
            VectorStoreConfig(dimension=d, metric="cosine",
                              storage_dtype="int8", enable_ann=True,
                              ann_params={**ANN_PARAMS,
                                          "ivf_layout": "bucketized"}))
        store.add_vectors(x, [{} for _ in range(1500)])
        store.query(x[3], k=3)
        assert store._ann.get_stats()["layout"] == "gather"

    def test_beam_graph_on_quantized_rejected(self):
        with pytest.raises(ValueError, match="auto|flat|ivf"):
            VectorStoreConfig(dimension=16, storage_dtype="int8",
                              enable_ann=True,
                              ann_params={"index_type": "beam_graph"})

    @pytest.mark.parametrize("dtype", ["int8", "int4"])
    def test_sharded_quantized_gather_ivf(self, tmp_path, rng, dtype):
        """Sharded quantized store builds a gather-mode ShardedIVF: probes
        gather rows from the sharded flat matrix inside shard_map; a
        full-probe query must match the exact sharded sweep."""
        from tpu_vector_db.parallel.mesh import make_device_mesh
        from tpu_vector_db.parallel.sharded_ivf import ShardedIVF
        from tpu_vector_db.parallel.sharded_store import ShardedVectorStore
        d = 64
        n = 600
        x = unit_rows(rng, n, d)
        store = ShardedVectorStore(
            tmp_path / f"q_shard_{dtype}",
            VectorStoreConfig(dimension=d, metric="cosine",
                              storage_dtype=dtype, enable_ann=True,
                              ann_params={**ANN_PARAMS, "n_clusters": 2,
                                          "nprobe": 64, "bucket_rows": 64}),
            mesh=make_device_mesh(8))
        store.add_vectors(x, [{"g": i % 2} for i in range(n)])
        assert isinstance(store._ann, ShardedIVF)
        assert store._ann.quant == dtype
        assert store._ann._dev["buckets"] is None    # gather mode
        assert store._ann_kind == "ivf"
        # full probe (nprobe >= all local buckets) == exact sharded sweep
        exact = store.batch_query(x[:6], k=5, use_ann=False)
        annr = store.batch_query(x[:6], k=5)
        for (ei, es, _), (ai, asc, _) in zip(exact, annr):
            np.testing.assert_allclose(np.asarray(asc), np.asarray(es),
                                       atol=6e-3)
        # incremental add extends in place and stays searchable
        more = unit_rows(rng, 40, d)
        store.add_vectors(more, [{"g": 0} for _ in range(40)])
        ids, scores, _ = store.query(more[7], k=3)
        assert ids[0] == n + 7 and scores[0] > 0.95
        # filtered query through the ANN oversample path
        ids, scores, md = store.query(x[4], k=3, filter_metadata={"g": 0})
        assert md and all(m["g"] == 0 for m in md)


class TestCoreReviewRegressions:
    def test_clear_resets_recall_guard(self, tmp_path, rng):
        """A latched low-recall verdict must not outlive clear(): the old
        state silently routed the REPOPULATED store to the exact scan
        until it doubled past the stale checkpoint (review finding)."""
        d = 32
        store = TPUVectorStore(
            tmp_path / "guard",
            VectorStoreConfig(dimension=d, metric="cosine",
                              enable_ann=True,
                              ann_params=dict(ANN_PARAMS)))
        store.add_vectors(unit_rows(rng, 1500, d))
        store._ann_low_recall = True          # simulate a tripped guard
        store._ann_checked_at = 1500
        store.clear()
        assert store._ann_low_recall is False
        assert store._ann_checked_at == 0
        assert store._ann_recall_estimate is None

    def test_single_chip_ivf_sidecar_not_loaded_by_sharded(self, tmp_path,
                                                           rng):
        """Reopening a single-chip store directory as a ShardedVectorStore
        must build the SHARDED index, not load the single-chip ann_ivf.npz
        (whose object lacks make_search_fn -> AttributeError per query,
        review finding)."""
        from tpu_vector_db.parallel.mesh import make_device_mesh
        from tpu_vector_db.parallel.sharded_ivf import ShardedIVF
        from tpu_vector_db.parallel.sharded_store import ShardedVectorStore
        d = 32
        path = tmp_path / "migrate"
        x = unit_rows(rng, 1500, d)
        single = TPUVectorStore(
            path, VectorStoreConfig(dimension=d, metric="cosine",
                                    enable_ann=True,
                                    ann_params=dict(ANN_PARAMS)))
        single.add_vectors(x)
        assert single._ann_kind == "ivf"
        single.flush()
        assert (path / "ann_ivf.npz").exists()

        sharded = ShardedVectorStore(path, mesh=make_device_mesh(8))
        assert isinstance(sharded._ann, ShardedIVF)
        ids, scores, _ = sharded.query(x[9], k=3)
        assert ids[0] == 9 and scores[0] > 0.98


class TestRerank:
    def test_int4_rerank_recovers_f32_ordering(self, tmp_path, rng):
        """rerank=True must return the EXACT f32 top-k ordering on a
        quantized store (the quantized engine's ~0.005 score noise and
        int8's 1/127 grid reorder near-ties)."""
        d = 64
        x = unit_rows(rng, 4000, d)
        store = TPUVectorStore(
            tmp_path / "rr",
            VectorStoreConfig(dimension=d, metric="cosine",
                              storage_dtype="int4", enable_ann=True,
                              # random low-d data: score gaps (~1e-3) are
                              # far inside the int4 noise, so exact id
                              # recovery needs a deep oversample
                              ann_params={**ANN_PARAMS,
                                          "rerank_oversample": 32}))
        store.add_vectors(x, [{"i": i} for i in range(4000)])
        q = unit_rows(rng, 4, d)
        gt = q @ x.T
        out = store.batch_query(q, k=5, rerank=True)
        for qi, (ids, scores, metas) in enumerate(out):
            want = np.argsort(-gt[qi])[:5]
            assert list(ids) == want.tolist(), (qi, ids, want)
            np.testing.assert_allclose(scores, gt[qi][want], atol=1e-5)
            assert [m["i"] for m in metas] == want.tolist()
        # scores are exact f32 cosine, strictly sorted
        for ids, scores, _ in out:
            assert all(scores[i] >= scores[i + 1]
                       for i in range(len(scores) - 1))

    def test_rerank_with_filter(self, tmp_path, rng):
        d = 64
        x = unit_rows(rng, 2000, d)
        store = TPUVectorStore(
            tmp_path / "rrf",
            VectorStoreConfig(dimension=d, metric="cosine",
                              storage_dtype="int8", enable_ann=True,
                              ann_params=dict(ANN_PARAMS)))
        store.add_vectors(x, [{"g": i % 2} for i in range(2000)])
        ids, scores, metas = store.query(x[8], k=5,
                                         filter_metadata={"g": 0},
                                         rerank=True)
        assert all(m["g"] == 0 for m in metas)
        assert ids[0] == 8 and scores[0] > 0.999

    def test_rerank_noop_on_unquantized(self, tmp_path, rng):
        d = 32
        x = unit_rows(rng, 500, d)
        store = TPUVectorStore(
            tmp_path / "rrn",
            VectorStoreConfig(dimension=d, metric="cosine"))
        store.add_vectors(x)
        a = store.batch_query(x[:3], k=4)
        b = store.batch_query(x[:3], k=4, rerank=True)
        for (ia, sa, _), (ib, sb, _) in zip(a, b):
            assert list(ia) == list(ib)
            np.testing.assert_allclose(sa, sb)
