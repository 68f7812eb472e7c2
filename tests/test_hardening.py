"""Round-2 hardening regressions.

Covers the round-1 advisor/judge findings: manifest config read-back (the
reopen-with-defaults data-loss path), breaker exception whitelist, tenant
path encoding collisions, limiter key eviction + validated tier lookup,
no-charge-on-reject Redis semantics, the ANN sampled-recall guard, and the
sharded store's bounded compiled-fn caches.
"""

import threading

import numpy as np
import pytest

from tpu_vector_db.store.config import VectorStoreConfig
from tpu_vector_db.store.persistence import StoreDimensionMismatch
from tpu_vector_db.store.vector_store import TPUVectorStore
from tpu_vector_db.service.manager import VectorStoreManager
from tpu_vector_db.service.resilience import (
    CircuitBreaker, CircuitBreakerConfig, CircuitBreakerOpenError,
    CircuitState)


class TestManifestConfigReadback:
    def test_reopen_without_config_restores_settings(self, tmp_store_path, rng):
        cfg = VectorStoreConfig(dimension=128, metric="euclidean",
                                storage_dtype="bfloat16")
        store = TPUVectorStore(tmp_store_path, cfg)
        vecs = rng.standard_normal((20, 128)).astype(np.float32)
        store.add_vectors(vecs, [{"i": i} for i in range(20)])
        store.close()

        reopened = TPUVectorStore(tmp_store_path)  # no config
        assert reopened.config.dimension == 128
        assert reopened.config.metric == "euclidean"
        assert reopened.config.storage_dtype == "bfloat16"
        assert len(reopened) == 20
        idx, scores, meta = reopened.query(vecs[3], k=1)
        assert idx[0] == 3
        assert meta[0] == {"i": 3}

    def test_reopen_with_wrong_dimension_refuses(self, tmp_store_path, rng):
        store = TPUVectorStore(tmp_store_path,
                               VectorStoreConfig(dimension=64))
        store.add_vectors(rng.standard_normal((5, 64)).astype(np.float32))
        store.close()
        with pytest.raises(StoreDimensionMismatch):
            TPUVectorStore(tmp_store_path, VectorStoreConfig(dimension=384))
        # the data must still be there afterwards
        again = TPUVectorStore(tmp_store_path)
        assert len(again) == 5

    def test_manager_reopen_after_restart(self, tmp_path, rng):
        mgr = VectorStoreManager(base_path=tmp_path)
        cfg = VectorStoreConfig(dimension=768, metric="dot_product")
        mgr.create_store("u", "m", cfg)
        store = mgr.get_store("u", "m")
        store.add_vectors(rng.standard_normal((10, 768)).astype(np.float32))
        mgr.shutdown()

        mgr2 = VectorStoreManager(base_path=tmp_path)  # "restart"
        store2 = mgr2.get_store("u", "m", create=False)
        assert store2.config.dimension == 768
        assert store2.config.metric == "dot_product"
        assert len(store2) == 10
        mgr2.shutdown()


class TestBreakerWhitelist:
    def test_validation_errors_do_not_open(self):
        br = CircuitBreaker("t", CircuitBreakerConfig(failure_threshold=3))

        def bad_request():
            raise ValueError("dim mismatch")

        for _ in range(20):
            with pytest.raises(ValueError):
                br.call(bad_request)
        assert br.state == CircuitState.CLOSED
        assert br.call(lambda: 42) == 42

    def test_real_failures_still_open(self):
        br = CircuitBreaker("t", CircuitBreakerConfig(failure_threshold=3))

        def boom():
            raise OSError("disk gone")

        for _ in range(3):
            with pytest.raises(OSError):
                br.call(boom)
        assert br.state == CircuitState.OPEN
        with pytest.raises(CircuitBreakerOpenError):
            br.call(lambda: 42)

    def test_validation_error_does_not_close_half_open(self):
        br = CircuitBreaker("t", CircuitBreakerConfig(
            failure_threshold=1, recovery_timeout_s=0.0,
            success_threshold=1))
        with pytest.raises(OSError):
            br.call(lambda: (_ for _ in ()).throw(OSError()))
        assert br.state in (CircuitState.OPEN, CircuitState.HALF_OPEN)
        with pytest.raises(ValueError):
            br.call(lambda: (_ for _ in ()).throw(ValueError()))
        # a client error while HALF_OPEN is not a probe success
        assert br.state == CircuitState.HALF_OPEN


class TestTenantPathEncoding:
    def test_distinct_ids_distinct_dirs(self, tmp_path):
        mgr = VectorStoreManager(base_path=tmp_path)
        assert mgr._store_path("a.b", "m") != mgr._store_path("a_b", "m")
        assert mgr._store_path("a%2Eb", "m") != mgr._store_path("a.b", "m")
        mgr.shutdown()

    def test_roundtrip_through_list_stores(self, tmp_path, rng):
        mgr = VectorStoreManager(base_path=tmp_path)
        cfg = VectorStoreConfig(dimension=8)
        mgr.create_store("user.name", "model/v1", cfg)
        listed = mgr.list_stores()
        assert [(e["user_id"], e["model_id"]) for e in listed] == \
            [("user.name", "model/v1")]
        mgr.shutdown()

    def test_empty_id_rejected(self, tmp_path):
        mgr = VectorStoreManager(base_path=tmp_path)
        with pytest.raises(ValueError):
            mgr._store_path("", "m")
        mgr.shutdown()


class TestLimiterEviction:
    def test_idle_keys_evicted(self):
        from tpu_vector_db.api.middleware.rate_limiting import (
            InMemoryRateLimiter, RateLimitConfig)
        lim = InMemoryRateLimiter(sweep_interval_s=0.0)
        cfg = RateLimitConfig(10, 100, 0, 4)
        for i in range(50):
            d = lim.check(f"key{i}", cfg)
            assert d.allowed
            lim.release(f"key{i}")
        # age every timestamp past the hour window, then trigger a sweep
        for dq in list(lim._hour.values()) + list(lim._minute.values()):
            for j in range(len(dq)):
                dq[j] -= 7200
        lim.check("fresh", cfg)
        assert len(lim._hour) <= 2  # only "fresh" (+ tolerance)

    def test_key_cap_sheds_new_keys(self):
        from tpu_vector_db.api.middleware.rate_limiting import (
            InMemoryRateLimiter, RateLimitConfig)
        lim = InMemoryRateLimiter(max_keys=10, sweep_interval_s=3600.0)
        cfg = RateLimitConfig(10, 100, 0, 4)
        for i in range(10):
            assert lim.check(f"key{i}", cfg).allowed
        d = lim.check("key-new", cfg)
        assert not d.allowed and "capacity" in d.reason
        # existing keys still work
        assert lim.check("key0", cfg).allowed


class TestTierLookup:
    def test_substring_self_selection_is_gone(self):
        from tpu_vector_db.api.middleware.rate_limiting import (
            UserTier, classify_tier)
        assert classify_tier("Bearer i-am-enterprise-premium-admin") == \
            UserTier.FREE
        assert classify_tier(None) == UserTier.FREE

    def test_validated_keys_map_to_tiers(self):
        from tpu_vector_db.api.middleware.rate_limiting import (
            UserTier, classify_tier)
        from tpu_vector_db.security.auth import auth_config
        assert classify_tier(f"Bearer {auth_config.api_key}") == \
            UserTier.PREMIUM
        assert classify_tier(f"Bearer {auth_config.admin_key}") == \
            UserTier.ENTERPRISE

    def test_tier_map_env(self, monkeypatch):
        import tpu_vector_db.api.middleware.rate_limiting as rl
        monkeypatch.setenv("VECTOR_DB_TIER_KEYS",
                           "tvdb_cust_abc:enterprise, tvdb_cust_def:free")
        monkeypatch.setattr(rl, "_tier_map", None)
        assert rl.classify_tier("Bearer tvdb_cust_abc") == \
            rl.UserTier.ENTERPRISE
        assert rl.classify_tier("Bearer tvdb_cust_def") == rl.UserTier.FREE
        monkeypatch.setattr(rl, "_tier_map", None)


class _FakePipeline:
    def __init__(self, store):
        self._store = store
        self._ops = []

    def incr(self, key):
        self._ops.append(("incr", key))
        return self

    def decr(self, key):
        self._ops.append(("decr", key))
        return self

    def expire(self, key, ttl):
        self._ops.append(("expire", key))
        return self

    def execute(self):
        out = []
        for op, key in self._ops:
            if op == "incr":
                self._store[key] = self._store.get(key, 0) + 1
                out.append(self._store[key])
            elif op == "decr":
                self._store[key] = self._store.get(key, 0) - 1
                out.append(self._store[key])
            else:
                out.append(True)
        self._ops = []
        return out


class _FakeRedis:
    """Minimal command-level redis stand-in (no Lua scripting)."""

    def __init__(self):
        self.kv: dict[str, int] = {}

    def eval(self, *a, **k):
        raise RuntimeError("ERR unknown command 'EVAL'")

    def pipeline(self):
        return _FakePipeline(self.kv)

    def decr(self, key):
        self.kv[key] = self.kv.get(key, 0) - 1
        return self.kv[key]


class TestRedisLimiterSemantics:
    def test_rejected_requests_consume_no_quota(self):
        from tpu_vector_db.api.middleware.rate_limiting import (
            RateLimitConfig, RedisRateLimiter)
        lim = RedisRateLimiter("redis://fake", client=_FakeRedis())
        cfg = RateLimitConfig(requests_per_minute=3, requests_per_hour=100,
                              burst_allowance=0, concurrent_requests=100)
        for _ in range(3):
            d = lim.check("k", cfg)
            assert d.allowed
            lim.release("k")
        # now at the minute limit: rejects must not extend the lockout
        for _ in range(25):
            d = lim.check("k", cfg)
            assert not d.allowed and d.reason == "per-minute limit"
        minute_key = lim._keys("k")[0]
        assert lim._client.kv[minute_key] == 3  # unchanged by 25 rejects

    def test_concurrency_rollback_releases_window_charge(self):
        from tpu_vector_db.api.middleware.rate_limiting import (
            RateLimitConfig, RedisRateLimiter)
        lim = RedisRateLimiter("redis://fake", client=_FakeRedis())
        cfg = RateLimitConfig(requests_per_minute=100, requests_per_hour=100,
                              burst_allowance=0, concurrent_requests=1)
        assert lim.check("k", cfg).allowed  # holds the one slot
        d = lim.check("k", cfg)
        assert not d.allowed and d.reason == "concurrency limit"
        minute_key = lim._keys("k")[0]
        assert lim._client.kv[minute_key] == 1  # reject rolled back


class TestAnnRecallGuard:
    def _build(self, tmp_store_path, rng, n=400, d=32):
        cfg = VectorStoreConfig(
            dimension=d, enable_ann=True, persist_mode="off",
            ann_params={"index_type": "beam_graph", "M": 8, "ef_construction": 64, "ef_search": 64,
                        "build_backend": "tpu"})
        store = TPUVectorStore(tmp_store_path, cfg)
        # clustered data: the graph index performs well here
        centers = rng.standard_normal((8, d)).astype(np.float32) * 5
        pts = centers[rng.integers(0, 8, n)] + \
            rng.standard_normal((n, d)).astype(np.float32) * 0.3
        store.add_vectors(pts.astype(np.float32))
        return store, pts

    def test_estimate_recorded_and_healthy(self, tmp_store_path, rng):
        store, _ = self._build(tmp_store_path, rng)
        est = store.get_stats()["ann_recall_estimate"]
        assert est is not None and est > 0.8
        assert not store._ann_low_recall

    def test_low_recall_routes_to_exact(self, tmp_store_path, rng):
        store, pts = self._build(tmp_store_path, rng)

        class _BrokenIndex:
            size = 400

            def search(self, q, db, count, k, ef_search, sqnorms=None):
                n = np.asarray(q).shape[0]
                # labels that are valid rows but wrong neighbors
                return (np.zeros((n, k), np.int32),
                        np.zeros((n, k), np.float32))

        store._ann = _BrokenIndex()
        store._ann_self_check()
        assert store._ann_low_recall
        assert store._ann_recall_estimate < 0.5
        # queries now match the exact scan despite ann being "enabled"
        idx, _, _ = store.query(pts[7], k=1)
        assert idx[0] == 7


class TestShardedFnCacheBound:
    def test_capacity_doublings_do_not_accumulate(self, tmp_path, rng):
        from tpu_vector_db.parallel.sharded_store import ShardedVectorStore
        cfg = VectorStoreConfig(dimension=16, block_rows=8,
                                initial_capacity=8, persist_mode="off")
        store = ShardedVectorStore(tmp_path / "s", cfg)
        for round_i in range(5):  # 5 capacity changes
            store.add_vectors(
                rng.standard_normal(
                    (store._cap + 1 if store._cap else 70, 16)
                ).astype(np.float32))
            for k in (1, 3, 5):
                store.batch_query(
                    rng.standard_normal((2, 16)).astype(np.float32), k=k)
        assert len(store._query_fns) <= 16
        # every cached entry is for the live capacity
        assert all(key[-1] == store._cap
                   for key in store._query_fns._d)


# ---------------------------------------------------- round-2 review fixes

def test_ivf_add_after_query(tmp_path, rng):
    """add() with a warm device mirror placed rows into existing buckets —
    crashed with NameError before the fix (index/ivf.py)."""
    from tpu_vector_db.store import TPUVectorStore, VectorStoreConfig
    x = rng.standard_normal((400, 16)).astype(np.float32)
    s = TPUVectorStore(tmp_path / "iaq", VectorStoreConfig(
        dimension=16, metric="cosine", enable_ann=True, persist_mode="off",
        ann_params={"index_type": "ivf", "min_rows": 0, "nprobe": 8,
                    "n_clusters": 2, "bucket_rows": 512,
                    "self_check": False}))
    s.add_vectors(x[:300])
    s.query(x[0], k=3)              # warms the device mirror
    s.add_vectors(x[300:])          # fits free slots: scatter path
    ids, _, _ = s.query(x[350], k=3)
    assert 350 in list(ids)


def test_reopen_metric_mismatch_refused(tmp_path, rng):
    """Explicit reopen config with a different metric/dtype must refuse
    (it would silently flip the persisted config and serve wrong scores)."""
    from tpu_vector_db.store import TPUVectorStore, VectorStoreConfig
    from tpu_vector_db.store.persistence import StoreDimensionMismatch
    s = TPUVectorStore(tmp_path / "m", VectorStoreConfig(
        dimension=16, metric="euclidean"))
    s.add_vectors(rng.standard_normal((10, 16)).astype(np.float32))
    s.flush()
    with pytest.raises(StoreDimensionMismatch):
        TPUVectorStore(tmp_path / "m", VectorStoreConfig(
            dimension=16, metric="cosine"))
    with pytest.raises(StoreDimensionMismatch):
        TPUVectorStore(tmp_path / "m", VectorStoreConfig(
            dimension=16, metric="euclidean", storage_dtype="bfloat16"))


def test_legacy_tenant_dir_fallback(tmp_path, rng):
    """Stores created under the round-1 lossy dir encoding stay reachable
    by their original tenant id after the reversible-encoding upgrade."""
    from tpu_vector_db.service.manager import VectorStoreManager
    from tpu_vector_db.store import TPUVectorStore, VectorStoreConfig
    mgr = VectorStoreManager(base_path=tmp_path / "stores")
    legacy = tmp_path / "stores" / "a_b" / "m_1"  # 'a.b' under old scheme
    legacy.mkdir(parents=True)
    st = TPUVectorStore(legacy, VectorStoreConfig(dimension=8))
    st.add_vectors(rng.standard_normal((5, 8)).astype(np.float32))
    st.flush()
    st.close()
    got = mgr.get_store("a.b", "m.1", create=False)
    assert got.vector_count == 5
    # access MIGRATES the legacy dir to the reversible-encoded path, so
    # the claim happens exactly once
    assert not (legacy / "manifest.json").exists()
    enc = tmp_path / "stores" / "a%2Eb" / "m%2E1"
    assert (enc / "manifest.json").exists()


def test_legacy_collision_does_not_leak_across_tenants(tmp_path, rng):
    """Distinct tenant ids whose LEGACY encodings collide ('a.b', 'a b',
    'a_b' all -> 'a_b') must not all resolve to the same pre-upgrade
    directory: the first claimant migrates it, later ids get fresh
    stores (review finding: cross-tenant data exposure)."""
    from tpu_vector_db.service.manager import VectorStoreManager
    from tpu_vector_db.store import TPUVectorStore, VectorStoreConfig
    mgr = VectorStoreManager(base_path=tmp_path / "stores")
    legacy = tmp_path / "stores" / "a_b" / "m"
    legacy.mkdir(parents=True)
    st = TPUVectorStore(legacy, VectorStoreConfig(dimension=8))
    st.add_vectors(rng.standard_normal((5, 8)).astype(np.float32))
    st.flush()
    st.close()
    first = mgr.get_store("a.b", "m", create=False)  # claims the legacy dir
    assert first.vector_count == 5
    # a DIFFERENT tenant with the same legacy encoding now gets a fresh
    # store, not tenant a.b's data
    assert not mgr.store_exists("a b", "m")
    other = mgr.create_store("a b", "m", VectorStoreConfig(dimension=8))
    assert other.vector_count == 0
    assert first.vector_count == 5


class TestAutoRemediation:
    """r4 verdict item 1: the sampled-recall guard must self-heal, not just
    warn — IVF escalates nprobe x2, the beam graph reruns a full-budget
    refine (vector_store.py _remediate_low_recall)."""

    def test_ivf_nprobe_escalation_heals(self, tmp_path, rng):
        # uniform data + nprobe=1 over 64 clusters: probe coverage is far
        # too low (the 100Kx64 analog where nprobe=32 served 0.440)
        d = 16
        x = rng.standard_normal((3000, d)).astype(np.float32)
        store = TPUVectorStore(tmp_path / "heal", VectorStoreConfig(
            dimension=d, enable_ann=True, persist_mode="off",
            ann_params={"index_type": "ivf", "min_rows": 0, "nprobe": 1,
                        "n_clusters": 64, "bucket_rows": 256}))
        store.add_vectors(x)
        est = store._ann_recall_estimate
        assert est is not None and est >= 0.90, est
        # the escalated operating point is written back so it persists
        assert store.config.ann_params["nprobe"] > 1
        assert store._ann.nprobe == store.config.ann_params["nprobe"]
        assert not store._ann_low_recall

    def test_no_escalation_when_healthy(self, tmp_path, rng):
        d = 16
        centers = rng.standard_normal((4, d)).astype(np.float32) * 5
        x = centers[rng.integers(0, 4, 2000)] + \
            rng.standard_normal((2000, d)).astype(np.float32) * 0.1
        store = TPUVectorStore(tmp_path / "ok", VectorStoreConfig(
            dimension=d, enable_ann=True, persist_mode="off",
            ann_params={"index_type": "ivf", "min_rows": 0, "nprobe": 16,
                        "n_clusters": 16, "bucket_rows": 512}))
        store.add_vectors(x.astype(np.float32))
        assert store._ann_recall_estimate >= 0.90
        # healthy regime: the knob is untouched
        assert store.config.ann_params["nprobe"] == 16
        assert store._ann.nprobe == 16

    def test_auto_remediate_off_warns_only(self, tmp_path, rng):
        d = 16
        x = rng.standard_normal((3000, d)).astype(np.float32)
        store = TPUVectorStore(tmp_path / "off", VectorStoreConfig(
            dimension=d, enable_ann=True, persist_mode="off",
            ann_params={"index_type": "ivf", "min_rows": 0, "nprobe": 1,
                        "n_clusters": 64, "bucket_rows": 256,
                        "auto_remediate": False}))
        store.add_vectors(x)
        assert store.config.ann_params["nprobe"] == 1
        assert store._ann.nprobe == 1

    def test_beam_remediation_runs_full_budget_refine(self, tmp_path, rng):
        # wiring test: remediation must run refine at refine_budget_div=1
        # and restore the configured divisor afterwards
        d = 24
        centers = rng.standard_normal((8, d)).astype(np.float32) * 5
        x = centers[rng.integers(0, 8, 400)] + \
            rng.standard_normal((400, d)).astype(np.float32) * 0.3
        store = TPUVectorStore(tmp_path / "beam", VectorStoreConfig(
            dimension=d, enable_ann=True, persist_mode="off",
            ann_params={"index_type": "beam_graph", "M": 8,
                        "ef_construction": 64, "ef_search": 64}))
        store.add_vectors(x.astype(np.float32))
        divisor_at_call = []
        store._ann.refine = lambda db, sqnorms=None, passes=1: \
            divisor_at_call.append(store._ann.refine_budget_div)
        configured = store._ann.refine_budget_div
        ests = iter([0.85, 0.95])
        final = store._remediate_low_recall(0.5, 0.9, lambda: next(ests))
        assert divisor_at_call == [1, 1]
        assert final == 0.95
        assert store._ann.refine_budget_div == configured


class TestHbmCapacityGuard:
    """r4 verdict item 8: reject over-HBM configs with a clean error naming
    the int8/int4 capacity modes instead of an opaque XLA OOM."""

    def test_estimator_terms(self):
        cfg = VectorStoreConfig(dimension=768, enable_ann=True,
                                ann_params={"index_type": "ivf"})
        # f32: 4*768 + 6 (ivf id table) per row
        assert cfg.device_bytes_for(1_000_000) == 1_000_000 * (4 * 768 + 6)
        beam = VectorStoreConfig(dimension=768, enable_ann=True,
                                 ann_params={"index_type": "beam_graph",
                                             "M": 16})
        assert beam.device_bytes_for(10) == 10 * (4 * 768 + 16 * 2 * 8)

    def test_creation_over_budget_raises(self, monkeypatch):
        from tpu_vector_db.store.config import StoreCapacityError
        monkeypatch.setenv("VDB_HBM_BYTES", str(8 * 1024 ** 2))  # 8 MiB
        with pytest.raises(StoreCapacityError) as ei:
            VectorStoreConfig(dimension=768, initial_capacity=1 << 20)
        msg = str(ei.value)
        assert "int4" in msg and "max ~" in msg

    def test_add_over_budget_clean_error_no_mutation(self, tmp_path, rng,
                                                     monkeypatch):
        from tpu_vector_db.store.config import StoreCapacityError
        store = TPUVectorStore(tmp_path / "hbm", VectorStoreConfig(
            dimension=128, persist_mode="off", initial_capacity=256,
            block_rows=256))
        store.add_vectors(rng.standard_normal((200, 128)).astype(np.float32))
        # budget allows the current capacity but not the next doubling
        monkeypatch.setenv(
            "VDB_HBM_BYTES",
            str(int(store.config.device_bytes_for(256) / 0.85) + 1))
        with pytest.raises(StoreCapacityError):
            store.add_vectors(
                rng.standard_normal((200, 128)).astype(np.float32))
        # failed add left the store untouched
        assert len(store) == 200
        assert len(store._metadata) == 200
        ids, _, _ = store.query(np.asarray(store._host_buf[5]), k=1)
        assert ids[0] == 5
