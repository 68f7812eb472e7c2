"""Store behavior tests: lifecycle, persistence, filters, batch query.

Mirrors the behavioral spec in the reference's integration test
(tests/test_integration.py:46-173: add -> count -> self-query top-1 sim>0.999
-> filtered query -> cleanup) plus the gaps SURVEY.md §4 flagged (persistence
round-trip, capacity growth, score conventions, batch_query which the
reference never implemented).
"""

import numpy as np
import pytest

from tpu_vector_db.store import TPUVectorStore, VectorStoreConfig


def make_store(path, n=0, d=32, metric="cosine", rng=None, **kw):
    cfg = VectorStoreConfig(dimension=d, metric=metric,
                            persist_mode=kw.pop("persist_mode", "lazy"), **kw)
    store = TPUVectorStore(path, cfg)
    vecs = None
    if n:
        vecs = rng.standard_normal((n, d)).astype(np.float32)
        store.add_vectors(vecs, [{"id": f"doc_{i}", "cat": i % 3}
                                 for i in range(n)])
    return store, vecs


class TestLifecycle:
    def test_add_count_query(self, tmp_store_path, rng):
        store, vecs = make_store(tmp_store_path, n=100, rng=rng)
        assert len(store) == 100
        idx, scores, meta = store.query(vecs[7], k=3)
        assert len(idx) == 3
        assert idx[0] == 7
        assert scores[0] > 0.999          # self-query similarity ~ 1.0
        assert meta[0]["id"] == "doc_7"

    def test_query_returns_exactly_k(self, tmp_store_path, rng):
        store, vecs = make_store(tmp_store_path, n=50, rng=rng)
        for k in (1, 5, 50):
            idx, scores, meta = store.query(vecs[0], k=k)
            assert len(idx) == len(scores) == len(meta) == k

    def test_k_clamped_to_count(self, tmp_store_path, rng):
        store, vecs = make_store(tmp_store_path, n=3, rng=rng)
        idx, _, _ = store.query(vecs[0], k=10)
        assert len(idx) == 3

    def test_empty_store_query(self, tmp_store_path, rng):
        store, _ = make_store(tmp_store_path)
        idx, scores, meta = store.query(rng.standard_normal(32), k=5)
        assert idx == [] and scores == [] and meta == []

    def test_dimension_mismatch_raises(self, tmp_store_path, rng):
        store, _ = make_store(tmp_store_path)
        with pytest.raises(ValueError):
            store.add_vectors(rng.standard_normal((2, 7)))

    def test_nan_rejected(self, tmp_store_path):
        store, _ = make_store(tmp_store_path)
        bad = np.full((1, 32), np.nan, np.float32)
        with pytest.raises(ValueError):
            store.add_vectors(bad)

    def test_clear(self, tmp_store_path, rng):
        store, _ = make_store(tmp_store_path, n=10, rng=rng)
        store.clear()
        assert len(store) == 0
        assert store.query(rng.standard_normal(32), k=2) == ([], [], [])


class TestGrowth:
    def test_capacity_growth_preserves_results(self, tmp_store_path, rng):
        store, _ = make_store(tmp_store_path, d=16, block_rows=64,
                              initial_capacity=64, rng=rng)
        all_vecs = []
        for _ in range(5):  # force several capacity doublings
            batch = rng.standard_normal((50, 16)).astype(np.float32)
            store.add_vectors(batch)
            all_vecs.append(batch)
        flat = np.concatenate(all_vecs)
        assert len(store) == 250
        probe = flat[123]
        idx, scores, _ = store.query(probe, k=1)
        assert idx[0] == 123 and scores[0] > 0.999

    def test_incremental_equals_bulk(self, tmp_store_path, tmp_path, rng):
        vecs = rng.standard_normal((200, 24)).astype(np.float32)
        inc, _ = make_store(tmp_store_path, d=24, block_rows=64,
                            initial_capacity=64, rng=rng)
        for i in range(0, 200, 37):
            inc.add_vectors(vecs[i:i + 37])
        bulk, _ = make_store(tmp_path / "bulk", d=24, rng=rng)
        bulk.add_vectors(vecs)
        q = rng.standard_normal((4, 24)).astype(np.float32)
        r1 = inc.batch_query(q, k=5)
        r2 = bulk.batch_query(q, k=5)
        for (i1, s1, _), (i2, s2, _) in zip(r1, r2):
            assert i1 == i2
            np.testing.assert_allclose(s1, s2, atol=1e-4)


class TestMetrics:
    @pytest.mark.parametrize("metric", ["cosine", "euclidean", "dot_product"])
    def test_ordering_matches_numpy(self, tmp_store_path, rng, metric):
        d = 24
        store, vecs = make_store(tmp_store_path, n=80, d=d, metric=metric, rng=rng)
        q = rng.standard_normal(d).astype(np.float32)
        idx, scores, _ = store.query(q, k=5)
        if metric == "cosine":
            ref = (q / np.linalg.norm(q)) @ (vecs / np.linalg.norm(
                vecs, axis=1, keepdims=True)).T
            want = np.argsort(-ref)[:5]
        elif metric == "dot_product":
            ref = vecs @ q
            want = np.argsort(-ref)[:5]
        else:
            ref = np.linalg.norm(vecs - q, axis=1)
            want = np.argsort(ref)[:5]
        assert idx == want.tolist()
        np.testing.assert_allclose(scores, ref[want], rtol=1e-3, atol=1e-3)


class TestFilters:
    def test_exact_match_filter(self, tmp_store_path, rng):
        store, vecs = make_store(tmp_store_path, n=60, rng=rng)
        idx, _, meta = store.query(vecs[0], k=10, filter_metadata={"cat": 1})
        assert all(m["cat"] == 1 for m in meta)
        assert all(i % 3 == 1 for i in idx)

    def test_filter_no_match(self, tmp_store_path, rng):
        store, vecs = make_store(tmp_store_path, n=10, rng=rng)
        idx, scores, meta = store.query(vecs[0], k=5,
                                        filter_metadata={"cat": 99})
        assert idx == []

    def test_multi_key_filter_is_conjunction(self, tmp_store_path, rng):
        store, vecs = make_store(tmp_store_path, n=30, rng=rng)
        idx, _, meta = store.query(
            vecs[4], k=5, filter_metadata={"cat": 1, "id": "doc_4"})
        assert idx == [4]


class TestBatchQuery:
    def test_batch_matches_single(self, tmp_store_path, rng):
        store, vecs = make_store(tmp_store_path, n=100, rng=rng)
        q = rng.standard_normal((8, 32)).astype(np.float32)
        batch = store.batch_query(q, k=4)
        for i in range(8):
            single = store.query(q[i], k=4)
            assert batch[i][0] == single[0]
            np.testing.assert_allclose(batch[i][1], single[1], atol=1e-5)


class TestPersistence:
    def test_roundtrip(self, tmp_store_path, rng):
        store, vecs = make_store(tmp_store_path, n=40, rng=rng,
                                 persist_mode="sync")
        q = vecs[11]
        before = store.query(q, k=3)
        del store
        reloaded = TPUVectorStore(tmp_store_path,
                                  VectorStoreConfig(dimension=32))
        assert len(reloaded) == 40
        after = reloaded.query(q, k=3)
        assert before[0] == after[0]
        np.testing.assert_allclose(before[1], after[1], atol=1e-5)
        assert before[2] == after[2]

    def test_lazy_flush(self, tmp_store_path, rng):
        store, _ = make_store(tmp_store_path, n=10, rng=rng,
                              persist_mode="lazy")
        store.flush()
        reloaded = TPUVectorStore(tmp_store_path,
                                  VectorStoreConfig(dimension=32))
        assert len(reloaded) == 10

    def test_corrupt_vectors_falls_back_empty(self, tmp_store_path, rng):
        store, _ = make_store(tmp_store_path, n=5, rng=rng, persist_mode="sync")
        (tmp_store_path / "vectors.npz").write_bytes(b"garbage")
        reloaded = TPUVectorStore(tmp_store_path,
                                  VectorStoreConfig(dimension=32))
        assert len(reloaded) == 0


class TestCrashConsistency:
    """Torn-write recovery (VERDICT r2 item 10): a writer killed mid-_save
    must leave a store that reopens to the last committed state; partial
    tmp files and stale/corrupt ANN sidecars must never poison a load."""

    def test_partial_tmp_files_ignored(self, tmp_store_path, rng):
        store, vecs = make_store(tmp_store_path, n=30, rng=rng,
                                 persist_mode="sync")
        del store
        for name in ("vectors.npz.tmp", "metadata.jsonl.tmp",
                     "manifest.json.tmp"):
            (tmp_store_path / name).write_bytes(b"\x00half-written\x00")
        reloaded = TPUVectorStore(tmp_store_path)
        assert len(reloaded) == 30
        ids, scores, meta = reloaded.query(vecs[7], k=1)
        assert ids[0] == 7 and meta[0]["id"] == "doc_7"

    def test_vectors_ahead_of_manifest_trims_to_committed(
            self, tmp_store_path, rng):
        """Crash window between the vectors.npz replace and the manifest
        replace: vectors holds uncommitted rows. The loader serves the
        manifest's committed prefix (persistence.py load_store)."""
        from tpu_vector_db.utils.fs import atomic_save_npz
        store, vecs = make_store(tmp_store_path, n=50, rng=rng,
                                 persist_mode="sync")
        del store
        extra = rng.standard_normal((20, 32)).astype(np.float32)
        torn = np.concatenate([vecs, extra]).astype(np.float32)
        atomic_save_npz(tmp_store_path / "vectors.npz", vectors=torn)
        reloaded = TPUVectorStore(tmp_store_path)
        assert len(reloaded) == 50          # uncommitted tail dropped
        ids, _, meta = reloaded.query(vecs[49], k=1)
        assert ids[0] == 49 and meta[0]["id"] == "doc_49"

    def test_writer_killed_mid_save(self, tmp_store_path, rng, monkeypatch):
        """Simulate the process dying inside _save after vectors.npz lands
        but before the manifest commit: the next open serves the previous
        committed add, with metadata aligned."""
        import tpu_vector_db.store.persistence as P
        store, vecs = make_store(tmp_store_path, n=40, rng=rng,
                                 persist_mode="sync")

        real_write = P.atomic_write_bytes

        def dying_write(path, data):
            if str(path).endswith("manifest.json"):
                raise OSError("simulated crash before manifest commit")
            real_write(path, data)

        monkeypatch.setattr(P, "atomic_write_bytes", dying_write)
        extra = rng.standard_normal((15, 32)).astype(np.float32)
        with pytest.raises(OSError):
            store.add_vectors(extra, [{"id": f"new_{i}"} for i in range(15)])
        monkeypatch.undo()

        reloaded = TPUVectorStore(tmp_store_path)
        assert len(reloaded) == 40
        ids, _, meta = reloaded.query(vecs[3], k=1)
        assert ids[0] == 3 and meta[0]["id"] == "doc_3"
        # and the store keeps working after recovery
        reloaded.add_vectors(extra, [{"id": f"new_{i}"} for i in range(15)])
        assert len(reloaded) == 55

    def test_corrupt_ivf_sidecar_rebuilds(self, tmp_path, rng):
        p = tmp_path / "ivfcrash"
        cfg = VectorStoreConfig(
            dimension=32, enable_ann=True, persist_mode="sync",
            ann_params={"index_type": "ivf", "n_clusters": 8, "nprobe": 8,
                        "self_check": False})
        store = TPUVectorStore(p, cfg)
        x = rng.standard_normal((600, 32)).astype(np.float32)
        store.add_vectors(x)
        del store
        (p / "ann_ivf.npz").write_bytes(b"torn sidecar bytes")
        reloaded = TPUVectorStore(p)
        assert reloaded.get_stats()["index_type"] == "ivf"  # rebuilt
        ids, scores, _ = reloaded.query(x[123], k=1)
        assert ids[0] == 123 and scores[0] > 0.99


class TestOps:
    def test_stats(self, tmp_store_path, rng):
        store, _ = make_store(tmp_store_path, n=20, rng=rng)
        s = store.get_stats()
        assert s["vector_count"] == 20
        assert s["dimension"] == 32
        assert s["metric"] == "cosine"
        assert s["index_type"] == "flat"
        assert s["memory_usage_mb"] > 0

    def test_optimize_and_warmup(self, tmp_store_path, rng):
        store, vecs = make_store(tmp_store_path, n=20, rng=rng)
        assert store.warmup()["warmed"]
        out = store.optimize()
        assert out["optimized"]
        idx, _, _ = store.query(vecs[3], k=1)
        assert idx == [3]

    def test_bfloat16_storage(self, tmp_store_path, rng):
        store, vecs = make_store(tmp_store_path, n=64, rng=rng,
                                 storage_dtype="bfloat16")
        idx, scores, _ = store.query(vecs[9], k=1)
        assert idx == [9]
        assert scores[0] > 0.99   # bf16 tolerance


class TestInt8Storage:
    """storage_dtype='int8': 4x capacity vs f32 for the exact cosine
    engine (fixed-127 quantizer on unit-norm rows, store/config.py)."""

    def test_query_quality_and_scale(self, tmp_path, rng):
        x = rng.standard_normal((500, 48)).astype(np.float32)
        s8 = TPUVectorStore(tmp_path / "i8", VectorStoreConfig(
            dimension=48, metric="cosine", storage_dtype="int8",
            persist_mode="off"))
        s8.add_vectors(x)
        ids, scores, _ = s8.query(x[7], k=5)
        assert ids[0] == 7
        assert scores[0] > 0.99  # descaled into true cosine range
        assert all(-1.0 <= s <= 1.0 for s in scores)

        # top-10 agreement vs the f32 store (int8 rounding can swap only
        # near-ties)
        sf = TPUVectorStore(tmp_path / "f32", VectorStoreConfig(
            dimension=48, metric="cosine", persist_mode="off"))
        sf.add_vectors(x)
        agree = 0
        for i in range(20):
            a, _, _ = s8.query(x[i], k=10)
            b, _, _ = sf.query(x[i], k=10)
            agree += len(set(a) & set(b))
        assert agree / 200 > 0.9

    def test_capacity_accounting(self, tmp_path, rng):
        s8 = TPUVectorStore(tmp_path / "i8c", VectorStoreConfig(
            dimension=128, metric="cosine", storage_dtype="int8",
            persist_mode="off"))
        s8.add_vectors(rng.standard_normal((100, 128)).astype(np.float32))
        sf = TPUVectorStore(tmp_path / "f32c", VectorStoreConfig(
            dimension=128, metric="cosine", persist_mode="off"))
        sf.add_vectors(rng.standard_normal((100, 128)).astype(np.float32))
        m8 = s8.get_stats()["memory_usage_mb"]
        mf = sf.get_stats()["memory_usage_mb"]
        assert m8 < mf  # device side is 4x smaller

    def test_config_guards(self):
        with pytest.raises(ValueError):
            VectorStoreConfig(dimension=8, metric="euclidean",
                              storage_dtype="int8")
        # gather-layout IVF is supported on quantized rows (r3); the beam
        # graph is not
        VectorStoreConfig(dimension=8, metric="cosine",
                          storage_dtype="int8", enable_ann=True)
        with pytest.raises(ValueError):
            VectorStoreConfig(dimension=8, metric="cosine",
                              storage_dtype="int8", enable_ann=True,
                              ann_params={"index_type": "beam_graph"})

    def test_persistence_roundtrip(self, tmp_path, rng):
        x = rng.standard_normal((300, 32)).astype(np.float32)
        cfg = VectorStoreConfig(dimension=32, metric="cosine",
                                storage_dtype="int8")
        s = TPUVectorStore(tmp_path / "p", cfg)
        s.add_vectors(x)
        s.flush()
        s2 = TPUVectorStore(tmp_path / "p")  # config from manifest
        assert s2.get_stats()["storage_dtype"] == "int8"
        ids, scores, _ = s2.query(x[11], k=1)
        assert ids[0] == 11 and scores[0] > 0.99


class TestInt4Storage:
    """storage_dtype='int4': 2x int8's capacity for the exact cosine
    engine (two nibbles per byte, per-row scale streamed into the kernel;
    ops/quant4.py). Scores are the true cosine of the dequantized
    on-sphere rows — ~0.005 noise vs f32, so gates are looser than int8's."""

    def test_query_quality(self, tmp_path, rng):
        x = rng.standard_normal((500, 256)).astype(np.float32)
        s4 = TPUVectorStore(tmp_path / "i4", VectorStoreConfig(
            dimension=256, metric="cosine", storage_dtype="int4",
            persist_mode="off"))
        s4.add_vectors(x)
        ids, scores, _ = s4.query(x[7], k=5)
        assert ids[0] == 7
        assert scores[0] > 0.97
        assert all(-1.01 <= s <= 1.01 for s in scores)

        # score-recall vs the f32 store (id-ranks swap within the int4
        # noise band; CLAUDE.md bf16 tie-ambiguity lesson applies 10x here)
        sf = TPUVectorStore(tmp_path / "f32", VectorStoreConfig(
            dimension=256, metric="cosine", persist_mode="off"))
        sf.add_vectors(x)
        for i in range(10):
            _, s4_scores, _ = s4.query(x[i], k=10)
            _, sf_scores, _ = sf.query(x[i], k=10)
            assert abs(s4_scores[0] - sf_scores[0]) < 0.03

    def test_odd_dimension_pads_to_256(self, tmp_path, rng):
        """d=384 pads to 512 for the packed lane-tile constraint; queries
        still work end-to-end."""
        x = rng.standard_normal((100, 384)).astype(np.float32)
        s4 = TPUVectorStore(tmp_path / "i4odd", VectorStoreConfig(
            dimension=384, metric="cosine", storage_dtype="int4",
            persist_mode="off"))
        s4.add_vectors(x)
        ids, scores, _ = s4.query(x[42], k=3)
        assert ids[0] == 42 and scores[0] > 0.97

    def test_capacity_accounting(self, tmp_path, rng):
        s4 = TPUVectorStore(tmp_path / "i4c", VectorStoreConfig(
            dimension=256, metric="cosine", storage_dtype="int4",
            persist_mode="off"))
        s4.add_vectors(rng.standard_normal((100, 256)).astype(np.float32))
        s8 = TPUVectorStore(tmp_path / "i8c", VectorStoreConfig(
            dimension=256, metric="cosine", storage_dtype="int8",
            persist_mode="off"))
        s8.add_vectors(rng.standard_normal((100, 256)).astype(np.float32))
        assert s4.get_stats()["memory_usage_mb"] < \
            s8.get_stats()["memory_usage_mb"]

    def test_config_guards(self):
        with pytest.raises(ValueError):
            VectorStoreConfig(dimension=8, metric="euclidean",
                              storage_dtype="int4")
        # gather-layout IVF is supported on quantized rows (r3); the beam
        # graph is not
        VectorStoreConfig(dimension=8, metric="cosine",
                          storage_dtype="int4", enable_ann=True,
                          ann_params={"index_type": "ivf"})
        with pytest.raises(ValueError):
            VectorStoreConfig(dimension=8, metric="cosine",
                              storage_dtype="int4", enable_ann=True,
                              ann_params={"index_type": "beam_graph"})

    def test_persistence_roundtrip(self, tmp_path, rng):
        x = rng.standard_normal((300, 256)).astype(np.float32)
        cfg = VectorStoreConfig(dimension=256, metric="cosine",
                                storage_dtype="int4")
        s = TPUVectorStore(tmp_path / "p4", cfg)
        s.add_vectors(x)
        s.flush()
        s2 = TPUVectorStore(tmp_path / "p4")  # config from manifest
        assert s2.get_stats()["storage_dtype"] == "int4"
        ids, scores, _ = s2.query(x[11], k=1)
        assert ids[0] == 11 and scores[0] > 0.97

    def test_filtered_query(self, tmp_path, rng):
        x = rng.standard_normal((200, 256)).astype(np.float32)
        s4 = TPUVectorStore(tmp_path / "i4f", VectorStoreConfig(
            dimension=256, metric="cosine", storage_dtype="int4",
            persist_mode="off"))
        s4.add_vectors(x, [{"par": i % 2} for i in range(200)])
        ids, _, metas = s4.query(x[10], k=5, filter_metadata={"par": 0})
        assert ids[0] == 10
        assert all(m["par"] == 0 for m in metas)


class TestDeletion:
    """Per-vector tombstone deletion (capability beyond the reference —
    it had no deletes at all): stable ids, masked exact scan, ANN
    post-filter, persistence, compact() with id remap."""

    def _mk(self, tmp_path, rng, n=300, d=32, **cfg):
        x = rng.standard_normal((n, d)).astype(np.float32)
        x /= np.linalg.norm(x, axis=1, keepdims=True)
        store = TPUVectorStore(
            tmp_path / "del",
            VectorStoreConfig(dimension=d, metric="cosine", **cfg))
        store.add_vectors(x, [{"i": i} for i in range(n)])
        return store, x

    def test_deleted_rows_never_return(self, tmp_path, rng):
        store, x = self._mk(tmp_path, rng)
        ids0, _, _ = store.query(x[7], k=3)
        assert ids0[0] == 7
        out = store.delete_vectors([7, 8, 9])
        assert out == {"deleted": 3, "live": 297}
        assert len(store) == 297
        ids, scores, metas = store.query(x[7], k=5)
        assert 7 not in ids and 8 not in ids and 9 not in ids
        assert len(ids) == 5
        # re-delete is idempotent; out-of-range raises
        assert store.delete_vectors([7])["deleted"] == 0
        with pytest.raises(ValueError):
            store.delete_vectors([999])

    def test_delete_with_filter_and_k_clamp(self, tmp_path, rng):
        store, x = self._mk(tmp_path, rng, n=40)
        store.delete_vectors(list(range(35)))
        ids, scores, metas = store.query(x[0], k=10)
        assert sorted(ids) == [35, 36, 37, 38, 39]     # k clamps to live
        ids, _, metas = store.query(x[36], k=3,
                                    filter_metadata={"i": 36})
        assert ids == [36]
        store.delete_vectors([36])
        assert store.query(x[36], k=3, filter_metadata={"i": 36})[0] == []

    def test_persistence_keeps_tombstones_and_ids(self, tmp_path, rng):
        store, x = self._mk(tmp_path, rng)
        store.delete_vectors([1, 2])
        store.flush()
        s2 = TPUVectorStore(tmp_path / "del")
        assert len(s2) == 298
        ids, _, metas = s2.query(x[5], k=3)
        assert ids[0] == 5 and metas[0]["i"] == 5      # ids stable
        assert 1 not in ids and 2 not in ids

    def test_compact_remaps_and_reclaims(self, tmp_path, rng):
        store, x = self._mk(tmp_path, rng, n=100)
        store.delete_vectors([0, 50])
        out = store.compact()
        assert out["compacted"] == 2 and out["live"] == 98
        assert out["remap"][1] == 0 and out["remap"][99] == 97
        assert len(store) == 98
        ids, scores, metas = store.query(x[60], k=1)
        assert metas[0]["i"] == 60 and ids[0] == out["remap"][60]
        assert store.compact()["compacted"] == 0      # idempotent

    def test_delete_with_ann_post_filter(self, tmp_path, rng):
        store, x = self._mk(
            tmp_path, rng, n=2000, d=32, enable_ann=True,
            ann_params={"auto_flat_rows": 1000, "min_rows": 0,
                        "n_clusters": 8, "nprobe": 8, "bucket_rows": 512,
                        "self_check": False})
        assert store._ann_kind == "ivf"
        store.delete_vectors([11])
        ids, _, _ = store.query(x[11], k=5)
        assert 11 not in ids and len(ids) == 5


class TestDeletionReviewRegressions:
    def test_live_mask_is_cached(self, tmp_store_path, rng, monkeypatch):
        """The live mask must not rebuild O(cap) per query (review
        finding: ~120ms/query H2D at 10M rows until compact)."""
        store, vecs = make_store(tmp_store_path, n=100, rng=rng)
        store.delete_vectors([3])
        builds = []
        orig = np.ones

        def counting_ones(*a, **k):
            builds.append(1)
            return orig(*a, **k)

        store.query(vecs[0], k=2)          # build + device upload once
        monkeypatch.setattr(np, "ones", counting_ones)
        for _ in range(5):
            store.query(vecs[0], k=2)
        mask_builds = len(builds)
        assert mask_builds == 0, f"live mask rebuilt {mask_builds} times"
        # a new delete invalidates the cache
        monkeypatch.undo()
        store.delete_vectors([4])
        ids, _, _ = store.query(vecs[4], k=3)
        assert 4 not in ids

    def test_optimize_compacts_tombstones(self, tmp_store_path, rng):
        store, vecs = make_store(tmp_store_path, n=50, rng=rng)
        store.delete_vectors([0, 1])
        out = store.optimize()
        assert out["compacted"] == 2 and out["count"] == 48
        assert store.get_stats()["deleted_count"] == 0

    def test_get_vectors_validates(self, tmp_store_path, rng):
        store, vecs = make_store(tmp_store_path, n=10, rng=rng)
        store.delete_vectors([2])
        with pytest.raises(KeyError):
            store.get_vectors([2])
        with pytest.raises(KeyError):
            store.get_metadata([99])
        assert store.get_vectors(None).shape == (9, 32)   # live only
        np.testing.assert_allclose(store.get_vectors([3])[0], vecs[3],
                                   atol=1e-6)


class TestHeavyDeletion:
    """Deletion fractions 50/90/99% (VERDICT r3 item 5): queries must
    return exactly k live results in exact agreement with a masked
    ground-truth scan, and mostly-tombstoned stores must route to the
    masked exact scan instead of post-filtering ANN results."""

    ANN = {"auto_flat_rows": 1000, "min_rows": 0, "n_clusters": 8,
           "nprobe": 8, "bucket_rows": 512, "self_check": False}

    def _mk(self, tmp_path, rng, n=2000, d=32, **cfg):
        x = rng.standard_normal((n, d)).astype(np.float32)
        x /= np.linalg.norm(x, axis=1, keepdims=True)
        store = TPUVectorStore(
            tmp_path / "hd",
            VectorStoreConfig(dimension=d, metric="cosine",
                              persist_mode="off", **cfg))
        store.add_vectors(x, [{"i": i} for i in range(n)])
        return store, x

    @pytest.mark.parametrize("frac", [0.5, 0.9, 0.99])
    def test_exactly_k_live_and_parity(self, tmp_path, rng, frac):
        n, k = 2000, 10
        store, x = self._mk(tmp_path, rng, n=n, enable_ann=True,
                            ann_params=dict(self.ANN))
        dead = int(n * frac)
        store.delete_vectors(list(range(dead)))
        live = np.arange(dead, n)
        q = x[live[0]] + 0.05 * rng.standard_normal(x.shape[1]).astype(
            np.float32)
        ids, scores, metas = store.query(q, k=k)
        assert len(ids) == k, f"{len(ids)} live results at frac={frac}"
        assert all(i >= dead for i in ids)
        # exact parity vs masked f32 ground truth (float32 storage, CPU
        # scan is f32 — scores must match to float tolerance)
        qn = q / np.linalg.norm(q)
        gt = x[live] @ qn
        order = np.argsort(-gt)[:k]
        np.testing.assert_allclose(scores, gt[order], atol=1e-5)
        assert set(ids) == set((live[order]).tolist())

    def test_mostly_deleted_routes_exact(self, tmp_path, rng, monkeypatch):
        store, x = self._mk(tmp_path, rng, enable_ann=True,
                            ann_params=dict(self.ANN))
        assert store._ann_kind == "ivf"
        store.delete_vectors(list(range(1800)))          # live_frac 0.1

        def boom(*a, **kw):  # noqa: ANN002
            raise AssertionError("ANN must not serve a 90%-tombstoned store")

        monkeypatch.setattr(store, "_ann_batch_query", boom)
        ids, _, _ = store.query(x[1900], k=2)
        assert ids[0] == 1900

    def test_light_deletion_keeps_ann_with_scaled_oversample(
            self, tmp_path, rng, monkeypatch):
        store, x = self._mk(tmp_path, rng, enable_ann=True,
                            ann_params=dict(self.ANN))
        store.delete_vectors(list(range(200)))           # live_frac 0.9
        calls = []
        orig = store._ann_batch_query
        monkeypatch.setattr(
            store, "_ann_batch_query",
            lambda arr, k, f: calls.append(k) or orig(arr, k, f))
        # k=2: scaled fetch = ceil(2*10/0.9) = 23 <= the IVF large-k
        # cutoff, so the ANN path serves with the deeper oversample
        ids, _, _ = store.query(x[500], k=2)
        assert calls, "ANN path should serve at live_frac 0.9"
        assert ids[0] == 500 and all(i >= 200 for i in ids)

    def test_post_filter_fetch_k_scaling(self, tmp_path, rng):
        store, _ = self._mk(tmp_path, rng, n=1000)
        assert store._post_filter_fetch_k(5, filtered=False) == 5
        assert store._post_filter_fetch_k(5, filtered=True) == 50
        store.delete_vectors(list(range(500)))           # live_frac 0.5
        assert store._post_filter_fetch_k(5, filtered=False) == 100
        store.delete_vectors(list(range(990)))           # live_frac 0.01
        # 1/live_frac capped at 10x the base oversample, then count
        assert store._post_filter_fetch_k(5, filtered=True) == 500

    def test_compact_remap_covers_moved_ids_only(self, tmp_path, rng):
        store, x = self._mk(tmp_path, rng, n=100)
        store.delete_vectors([40, 60])
        out = store.compact()
        # identity prefix omitted (advisor finding: full dicts cost GBs
        # at 32M rows); moved ids all present and correct
        assert 0 not in out["remap"] and 39 not in out["remap"]
        assert out["remap"][41] == 40 and out["remap"][99] == 97
        assert out["remap"][61] == 59


class TestRerankBf16:
    """rerank=True on bf16 stores (VERDICT r3 item 7): bf16
    tie-ambiguity makes near-tied ids arbitrary; rerank must recover the
    exact f32 ordering, mirroring the quantized-rerank test."""

    def test_bf16_rerank_recovers_f32_ordering(self, tmp_path, rng):
        d, n = 64, 4000
        x = rng.standard_normal((n, d)).astype(np.float32)
        x /= np.linalg.norm(x, axis=1, keepdims=True)
        store = TPUVectorStore(
            tmp_path / "rrb",
            VectorStoreConfig(dimension=d, metric="cosine",
                              storage_dtype="bfloat16", persist_mode="off",
                              ann_params={"rerank_oversample": 32}))
        store.add_vectors(x, [{"i": i} for i in range(n)])
        q = rng.standard_normal((4, d)).astype(np.float32)
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        gt = q @ x.T
        out = store.batch_query(q, k=5, rerank=True)
        for qi, (ids, scores, metas) in enumerate(out):
            want = np.argsort(-gt[qi])[:5]
            assert list(ids) == want.tolist(), (qi, ids, want)
            np.testing.assert_allclose(scores, gt[qi][want], atol=1e-5)
            assert [m["i"] for m in metas] == want.tolist()

    def test_bf16_rerank_euclidean(self, tmp_path, rng):
        d, n = 32, 1000
        x = rng.standard_normal((n, d)).astype(np.float32)
        store = TPUVectorStore(
            tmp_path / "rre",
            VectorStoreConfig(dimension=d, metric="euclidean",
                              storage_dtype="bfloat16", persist_mode="off",
                              ann_params={"rerank_oversample": 16}))
        store.add_vectors(x)
        q = rng.standard_normal(d).astype(np.float32)
        gt = np.linalg.norm(x - q, axis=1)
        want = np.argsort(gt)[:5]
        ids, scores, _ = store.query(q, k=5, rerank=True)
        assert list(ids) == want.tolist()
        np.testing.assert_allclose(scores, gt[want], rtol=1e-5)
        assert all(scores[i] <= scores[i + 1] for i in range(4))

    def test_rerank_still_noop_on_float32(self, tmp_path, rng):
        d = 32
        x = rng.standard_normal((100, d)).astype(np.float32)
        store = TPUVectorStore(
            tmp_path / "rrn32",
            VectorStoreConfig(dimension=d, persist_mode="off"))
        store.add_vectors(x)
        a = store.batch_query(x[:2], k=4)
        b = store.batch_query(x[:2], k=4, rerank=True)
        for (ia, sa, _), (ib, sb, _) in zip(a, b):
            assert list(ia) == list(ib)
            np.testing.assert_allclose(sa, sb)


class TestIngestWhileServing:
    """r4 verdict item 3: queries must never block behind an ANN refresh.

    add_vectors appends under the store lock (ms) but runs the index
    build/extend under a SEPARATE build lock; while the index is stale,
    queries route to the exact scan — which already covers the new rows,
    so a just-added vector is searchable immediately at bounded latency.
    (The reference rebuilt its whole HNSW inside the serving path on
    every add, optimized_vector_store.py:110-113.)
    """

    def test_queries_bounded_during_ann_refresh(self, tmp_store_path, rng):
        import threading
        import time

        cfg = VectorStoreConfig(
            dimension=16, enable_ann=True, persist_mode="off",
            ann_params={"index_type": "beam_graph", "M": 4,
                        "ef_construction": 32, "ef_search": 32,
                        "self_check": False})
        store = TPUVectorStore(tmp_store_path, cfg)
        base = rng.standard_normal((600, 16)).astype(np.float32)
        store.add_vectors(base)
        assert not store._ann_stale

        # hold the index's incremental add hostage to pin the stale window
        started, release = threading.Event(), threading.Event()
        orig_add = store._ann.add

        def gated_add(*a, **kw):
            started.set()
            assert release.wait(timeout=30)
            return orig_add(*a, **kw)

        store._ann.add = gated_add
        new = rng.standard_normal((8, 16)).astype(np.float32)
        t = threading.Thread(target=store.add_vectors, args=(new,))
        t.start()
        try:
            assert started.wait(10)
            # refresh is mid-flight: the query must complete fast AND see
            # the fresh row (exact-scan route covers the unindexed tail)
            t0 = time.perf_counter()
            ids, scores, _ = store.query(new[3], k=1)
            dt = time.perf_counter() - t0
            assert dt < 2.0, f"query blocked {dt:.1f}s behind ANN refresh"
            assert ids[0] == 603
            assert scores[0] > 0.999
        finally:
            release.set()
            t.join(30)
        # refresh done: index serves again, same answer
        assert not store._ann_stale
        store._ann.add = orig_add
        ids, _, _ = store.query(new[3], k=1)
        assert ids[0] == 603

    def test_back_to_back_adds_coalesce(self, tmp_store_path, rng):
        """The stale fast path: whichever add reaches the build lock first
        indexes every appended row; later holders return without work."""
        cfg = VectorStoreConfig(
            dimension=16, enable_ann=True, persist_mode="off",
            ann_params={"index_type": "beam_graph", "M": 4,
                        "ef_construction": 32, "ef_search": 32,
                        "self_check": False})
        store = TPUVectorStore(tmp_store_path, cfg)
        store.add_vectors(rng.standard_normal((600, 16)).astype(np.float32))
        more = rng.standard_normal((40, 16)).astype(np.float32)
        for s in range(0, 40, 8):
            store.add_vectors(more[s:s + 8])
        assert not store._ann_stale
        assert store._ann.size == 640
        ids, _, _ = store.query(more[17], k=1)
        assert ids[0] == 617
