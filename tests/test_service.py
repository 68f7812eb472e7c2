"""Service-layer unit tests: circuit breaker, retry, degradation, error
handler, manager lifecycle, metrics registry."""

import time

import numpy as np
import pytest

from tpu_vector_db.monitoring.metrics import (
    Counter, Gauge, Histogram, MetricsRegistry)
from tpu_vector_db.service.errors import (
    ErrorCategory, ErrorContext, StorageCorruptionError, classify_exception)
from tpu_vector_db.service.error_handler import ErrorHandler
from tpu_vector_db.service.manager import VectorStoreManager
from tpu_vector_db.service.resilience import (
    CircuitBreaker, CircuitBreakerConfig, CircuitBreakerOpenError,
    CircuitState, DegradationLevel, GracefulDegradationManager, RetryConfig,
    RetryHandler)
from tpu_vector_db.store.config import VectorStoreConfig


class TestCircuitBreaker:
    def make(self, **kw):
        return CircuitBreaker("t", CircuitBreakerConfig(
            failure_threshold=3, recovery_timeout_s=0.05,
            success_threshold=2, **kw))

    def test_opens_after_threshold(self):
        cb = self.make()
        for _ in range(3):
            with pytest.raises(OSError):
                cb.call(lambda: (_ for _ in ()).throw(OSError("x")))
        assert cb.state == CircuitState.OPEN
        with pytest.raises(CircuitBreakerOpenError):
            cb.call(lambda: 1)

    def test_half_open_then_close(self):
        cb = self.make()
        for _ in range(3):
            with pytest.raises(OSError):
                cb.call(lambda: (_ for _ in ()).throw(OSError("x")))
        time.sleep(0.06)
        assert cb.state == CircuitState.HALF_OPEN
        assert cb.call(lambda: 42) == 42
        assert cb.call(lambda: 43) == 43
        assert cb.state == CircuitState.CLOSED

    def test_half_open_failure_reopens(self):
        cb = self.make()
        for _ in range(3):
            with pytest.raises(OSError):
                cb.call(lambda: (_ for _ in ()).throw(OSError("x")))
        time.sleep(0.06)
        with pytest.raises(OSError):
            cb.call(lambda: (_ for _ in ()).throw(OSError("y")))
        assert cb.state == CircuitState.OPEN

    def test_success_resets_failure_count(self):
        cb = self.make()
        for _ in range(2):
            with pytest.raises(OSError):
                cb.call(lambda: (_ for _ in ()).throw(OSError("x")))
        cb.call(lambda: 1)  # resets
        for _ in range(2):
            with pytest.raises(OSError):
                cb.call(lambda: (_ for _ in ()).throw(OSError("x")))
        assert cb.state == CircuitState.CLOSED


class TestRetry:
    def test_retries_then_succeeds(self):
        calls = []

        def flaky():
            calls.append(1)
            if len(calls) < 3:
                raise OSError("transient")
            return "ok"

        rh = RetryHandler({"storage": RetryConfig(
            max_attempts=5, base_delay_s=0.001)})
        assert rh.run("storage", flaky) == "ok"
        assert len(calls) == 3

    def test_exhausts_and_raises(self):
        rh = RetryHandler({"storage": RetryConfig(
            max_attempts=2, base_delay_s=0.001)})
        with pytest.raises(OSError):
            rh.run("storage", lambda: (_ for _ in ()).throw(OSError("x")))

    def test_non_retryable_raises_immediately(self):
        calls = []

        def bad():
            calls.append(1)
            raise ValueError("permanent")

        rh = RetryHandler()
        with pytest.raises(ValueError):
            rh.run("storage", bad)
        assert len(calls) == 1


class TestDegradation:
    def test_error_rate_raises_level(self):
        mgr = GracefulDegradationManager(
            memory_thresholds=(2.0, 2.0, 2.0),   # unreachable
            error_rate_thresholds=(0.1, 0.5, 0.9))
        for _ in range(20):
            mgr.record_request(failed=False)
        assert mgr.evaluate() == DegradationLevel.NORMAL
        for _ in range(10):
            mgr.record_request(failed=True)
        level = mgr.evaluate()
        assert level.value >= DegradationLevel.REDUCED.value
        assert mgr.feature_enabled("batching")

    def test_feature_gating(self):
        mgr = GracefulDegradationManager()
        assert mgr.feature_enabled("ann")
        assert mgr.feature_enabled("caching")

    def test_error_rate_uses_recent_window_not_lifetime(self):
        """A long healthy history must not mask a current error storm:
        the rate divides the 60s error count by the 60s request estimate,
        not the lifetime total (review finding)."""
        mgr = GracefulDegradationManager(
            memory_thresholds=(2.0, 2.0, 2.0),
            error_rate_thresholds=(0.1, 0.5, 0.9))
        for _ in range(10_000):           # long healthy lifetime
            mgr._requests += 1            # simulate old traffic directly
        for _ in range(10):
            mgr.record_request(failed=True)
        for _ in range(10):
            mgr.record_request(failed=False)
        # 10 errors / ~20 recent requests = 50% >> lifetime 10/10020
        assert mgr.evaluate().value >= DegradationLevel.REDUCED.value

    def test_level_recovers_when_errors_age_out(self, monkeypatch):
        import time as _time
        mgr = GracefulDegradationManager(
            memory_thresholds=(2.0, 2.0, 2.0),
            error_rate_thresholds=(0.1, 0.5, 0.9))
        for _ in range(10):
            mgr.record_request(failed=True)
        assert mgr.evaluate().value >= DegradationLevel.REDUCED.value
        real = _time.time
        monkeypatch.setattr(_time, "time", lambda: real() + 70.0)
        for _ in range(20):
            mgr.record_request(failed=False)
        assert mgr.evaluate() == DegradationLevel.NORMAL

    def test_per_tenant_breaker_isolation(self, tmp_path):
        """One tenant's failing store must not open every tenant's
        breaker (review finding)."""
        h = ErrorHandler(error_log_dir=tmp_path)
        bad = h.breaker("vector_query:a/m")
        good = h.breaker("vector_query:b/m")

        def boom():
            raise OSError("corrupt store")

        for _ in range(10):
            try:
                bad.call(boom)
            except Exception:  # noqa: BLE001
                pass
        assert bad.state.value == "open"
        assert good.state.value == "closed"
        assert good.call(lambda: 42) == 42


class TestErrorHandler:
    def test_context_classifies_and_records(self, tmp_path):
        h = ErrorHandler(error_log_dir=tmp_path)
        with pytest.raises(Exception):
            with h.error_context("test_op"):
                raise ValueError("bad input")
        stats = h.get_error_stats()
        assert stats["total_errors"] == 1
        assert stats["by_category"]["validation"] == 1

    def test_health_score(self, tmp_path):
        h = ErrorHandler(error_log_dir=tmp_path)
        health = h.health_check()
        assert health["score"] >= 80
        assert health["status"] == "healthy"

    def test_dump_history(self, tmp_path):
        h = ErrorHandler(error_log_dir=tmp_path)
        with pytest.raises(Exception):
            with h.error_context("op"):
                raise OSError("disk")
        h.dump_history()
        assert (tmp_path / "error_history.json").exists()

    def test_classification(self):
        assert classify_exception(MemoryError())[0] == ErrorCategory.MEMORY
        assert classify_exception(OSError())[0] == ErrorCategory.STORAGE
        assert classify_exception(TypeError())[0] == ErrorCategory.VALIDATION
        # TimeoutError IS an OSError subclass: must classify as TIMEOUT,
        # not STORAGE (review finding)
        assert classify_exception(TimeoutError())[0] == ErrorCategory.TIMEOUT
        exc = RuntimeError("RESOURCE_EXHAUSTED: out of memory on device")
        assert classify_exception(exc)[0] == ErrorCategory.MEMORY
        ctx = ErrorContext.from_exception(ValueError("x"), "op", "u", "m")
        assert ctx.user_id == "u" and ctx.category == ErrorCategory.VALIDATION
        assert isinstance(StorageCorruptionError("x"), Exception)


class TestManager:
    def test_lifecycle(self, tmp_path, rng):
        mgr = VectorStoreManager(base_path=tmp_path)
        store = mgr.create_store("u", "m", VectorStoreConfig(
            dimension=16, persist_mode="lazy"))
        with pytest.raises(FileExistsError):
            mgr.create_store("u", "m", VectorStoreConfig(dimension=16))
        store.add_vectors(rng.standard_normal((5, 16)).astype(np.float32))
        assert mgr.store_exists("u", "m")
        assert mgr.get_stats()["total_vectors"] == 5
        with pytest.raises(ValueError):
            mgr.delete_store("u", "m")          # non-empty
        mgr.delete_store("u", "m", force=True)
        assert not mgr.store_exists("u", "m")
        mgr.shutdown()

    def test_list_and_warmup(self, tmp_path, rng):
        mgr = VectorStoreManager(base_path=tmp_path)
        s = mgr.get_store("a", "m1", VectorStoreConfig(
            dimension=8, persist_mode="lazy"))
        s.add_vectors(rng.standard_normal((3, 8)).astype(np.float32))
        s.flush()
        listed = mgr.list_stores()
        assert any(e["user_id"] == "a" and e["model_id"] == "m1"
                   for e in listed)
        warmed = mgr.warmup_all_stores()
        assert warmed["a/m1"]["warmed"]
        mgr.shutdown()

    def test_path_sanitization(self, tmp_path):
        mgr = VectorStoreManager(base_path=tmp_path)
        p = mgr._store_path("../evil", "m/../../x")
        assert str(tmp_path) in str(p)
        assert ".." not in str(p.relative_to(tmp_path))
        mgr.shutdown()


class TestMetrics:
    def test_counter_gauge(self):
        c = Counter("c1")
        c.inc()
        c.inc(2)
        assert c.value == 3
        g = Gauge("g1")
        g.set(5)
        g.dec()
        assert g.value == 4

    def test_histogram_buckets_and_percentiles(self):
        h = Histogram("h1", buckets=(0.01, 0.1, 1.0))
        for v in (0.005, 0.05, 0.5, 5.0):
            h.observe(v)
        snap = h.snapshot()
        assert snap["count"] == 4
        assert snap["buckets"]["0.01"] == 1
        assert snap["buckets"]["+Inf"] == 4
        assert h.percentile(0.5) in (0.05, 0.5)

    def test_registry_exposition(self):
        reg = MetricsRegistry()
        reg.counter("http_requests_total").inc()
        text = reg.get_prometheus_format()
        assert "# TYPE http_requests_total counter" in text
        assert "http_requests_total 1.0" in text
        assert "# TYPE http_request_duration_seconds histogram" in text
        summary = reg.summary()
        assert summary["http_requests"] == 1


class TestCoalescerShutdown:
    def test_aclose_waits_for_inflight_flush(self):
        """aclose must not return until the flushed batch_query finishes —
        otherwise manager.shutdown() races the device sweep and every
        waiter gets a spurious shutdown error (review finding)."""
        import asyncio
        import types

        from tpu_vector_db.service.batcher import QueryCoalescer

        class FakeManager:
            def __init__(self):
                self.calls = 0

            def get_store(self, u, m, create=True):
                return types.SimpleNamespace(
                    config=types.SimpleNamespace(dimension=4))

            async def batch_query_async(self, u, m, arr, k=10,
                                        use_ann=True, **kw):
                await asyncio.sleep(0.05)  # simulate the device sweep
                self.calls += 1
                return [([i], [1.0], [None]) for i in range(len(arr))]

        async def go():
            mgr = FakeManager()
            # window longer than the test: only aclose can flush
            coal = QueryCoalescer(mgr, window_ms=10_000, max_batch=64)
            task = asyncio.ensure_future(
                coal.query("u", "m", np.zeros(4, np.float32), 1))
            await asyncio.sleep(0.01)  # let the query join its lane
            await coal.aclose()
            # the in-flight sweep COMPLETED before aclose returned
            assert mgr.calls == 1
            ids, scores, meta = await asyncio.wait_for(task, 0.5)
            assert ids == [0]

        asyncio.run(go())
