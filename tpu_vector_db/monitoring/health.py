"""Pluggable health checks with overall-status rollup.

Capability parity with reference monitoring/metrics.py:298-404 (HealthChecker
with device / disk / memory / cache checks) — minus its bug (the reference
imported a nonexistent performance.vector_cache module, :364). The device
check probes the JAX backend with a tiny computation instead of MLX.
"""

from __future__ import annotations

import threading
import time
from typing import Callable


class HealthChecker:
    def __init__(self, cache_ttl_s: float = 5.0) -> None:
        self._checks: dict[str, Callable[[], dict]] = {}
        self._lock = threading.Lock()
        # /health is unauthenticated and the device check blocks on the
        # accelerator (~30ms dispatch RTT behind a tunnel): a TTL cache
        # bounds the probe rate so a curl loop cannot turn health checks
        # into a device-saturating DoS (review finding)
        self._cache_ttl = cache_ttl_s
        self._cached: dict | None = None
        self._cached_at = 0.0
        self.register("device", self._check_device)
        self.register("disk", self._check_disk)
        self.register("memory", self._check_memory)

    def register(self, name: str, fn: Callable[[], dict]) -> None:
        with self._lock:
            self._checks[name] = fn

    # ------------------------------------------------------- builtin checks

    @staticmethod
    def _check_device() -> dict:
        try:
            import jax
            import jax.numpy as jnp
            t0 = time.perf_counter()
            x = jnp.ones((8, 8))
            # float() forces a real device->host round trip:
            # block_until_ready under-reports on the axon backend
            # (CLAUDE.md), so a wedged tunnel could still look healthy
            assert float((x @ x).sum()) == 512.0
            return {"healthy": True,
                    "backend": jax.default_backend(),
                    "device_count": jax.device_count(),
                    "probe_ms": round((time.perf_counter() - t0) * 1e3, 2)}
        except Exception as exc:  # noqa: BLE001
            return {"healthy": False, "error": str(exc)}

    @staticmethod
    def _check_disk(min_free_fraction: float = 0.05) -> dict:
        try:
            import psutil
            usage = psutil.disk_usage("/")
            free_frac = usage.free / usage.total
            return {"healthy": free_frac >= min_free_fraction,
                    "free_percent": round(free_frac * 100, 1)}
        except Exception as exc:  # noqa: BLE001
            return {"healthy": False, "error": str(exc)}

    @staticmethod
    def _check_memory(max_used_fraction: float = 0.95) -> dict:
        try:
            import psutil
            vm = psutil.virtual_memory()
            return {"healthy": vm.percent / 100.0 <= max_used_fraction,
                    "used_percent": vm.percent}
        except Exception as exc:  # noqa: BLE001
            return {"healthy": False, "error": str(exc)}

    # --------------------------------------------------------------- rollup

    def run_all(self) -> dict:
        now = time.time()
        with self._lock:
            if (self._cached is not None
                    and now - self._cached_at < self._cache_ttl):
                return self._cached
            checks = dict(self._checks)
        results = {}
        for name, fn in checks.items():
            try:
                results[name] = fn()
            except Exception as exc:  # noqa: BLE001
                results[name] = {"healthy": False, "error": str(exc)}
        healthy = sum(1 for r in results.values() if r.get("healthy"))
        total = len(results)
        status = ("healthy" if healthy == total else
                  "degraded" if healthy >= total - 1 else "unhealthy")
        out = {"status": status, "checks": results,
               "timestamp": time.time()}
        with self._lock:
            self._cached = out
            self._cached_at = now
        return out
