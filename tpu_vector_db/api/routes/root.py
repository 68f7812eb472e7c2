"""Root/info endpoints: banner, /health, /system/info, /config, /debug/*.

Parity with reference main.py:211-363.
"""

from __future__ import annotations

import os
import platform
import time

from aiohttp import web

from tpu_vector_db.service.error_handler import get_error_handler


def register(app: web.Application) -> None:
    app.router.add_get("/", banner)
    app.router.add_get("/health", health)
    app.router.add_get("/system/info", system_info)
    app.router.add_get("/config", config)
    if os.environ.get("ENVIRONMENT", "development") == "development":
        app.router.add_get("/debug/routes", debug_routes)
        app.router.add_get("/debug/device", debug_device)
        app.router.add_post("/debug/profile", debug_profile)


async def banner(request: web.Request) -> web.Response:
    return web.json_response({
        "service": "tpu-vector-db",
        "version": request.app["version"],
        "description": "TPU-native vector index-and-query engine",
        "features": [
            "flat exact search (cosine / euclidean / dot)",
            "beam-graph ANN index (HNSW-class, TPU batched beam search)",
            "multi-tenant stores with metadata filtering",
            "bf16 storage / MXU-fused scans",
            "mesh sharding with cross-chip top-k merge",
            "batch API with progress + SSE",
            "tiered rate limiting, metrics, structured logging",
        ],
        "docs": {"health": "/health", "metrics": "/monitoring/prometheus"},
    })


async def health(request: web.Request) -> web.Response:
    import asyncio
    if getattr(request.app["manager"], "peer_lost", False):
        # don't touch the worker pool: hung collectives may have wedged
        # its threads — report the degradation immediately
        return web.json_response(
            {"status": "unhealthy", "peer_lost": True,
             "timestamp": time.time(),
             "error": "peer process lost; restart the serving group"},
            status=503)
    # the device check blocks on the accelerator — keep it off the event
    # loop (the TTL cache inside run_all bounds how often it runs at all)
    loop = asyncio.get_running_loop()
    checks = await loop.run_in_executor(
        request.app["manager"].executor,
        request.app["health_checker"].run_all)
    stats = request.app["manager"].get_stats()
    handler_health = get_error_handler().health_check()
    body = {
        "status": checks["status"],
        "timestamp": time.time(),
        "uptime_s": round(time.time() - request.app["started_at"], 1),
        "checks": checks["checks"],
        "stores": {"loaded": stats["loaded_stores"],
                   "total_vectors": stats["total_vectors"]},
        "requests": {
            "total": request.app["request_stats"].total,
            "avg_ms": round(request.app["request_stats"].avg_ms, 2),
        },
        "resilience": {"score": handler_health["score"],
                       "status": handler_health["status"]},
    }
    status_code = 200 if checks["status"] != "unhealthy" else 503
    return web.json_response(body, status=status_code)


async def system_info(request: web.Request) -> web.Response:
    import psutil
    vm = psutil.virtual_memory()
    info = {
        "platform": platform.platform(),
        "python": platform.python_version(),
        "cpu_count": os.cpu_count(),
        "memory": {"total_gb": round(vm.total / 2**30, 2),
                   "available_gb": round(vm.available / 2**30, 2),
                   "percent": vm.percent},
    }
    try:
        import jax
        info["accelerator"] = {
            "backend": jax.default_backend(),
            "device_count": jax.device_count(),
            "devices": [str(d) for d in jax.devices()],
        }
        # device memory introspection (the reference exposed Metal pool
        # stats, mlx_lm_pipeline.py:399-448)
        mem = jax.devices()[0].memory_stats() or {}
        if mem:
            info["accelerator"]["memory"] = {
                "bytes_in_use": mem.get("bytes_in_use"),
                "bytes_limit": mem.get("bytes_limit"),
                "peak_bytes_in_use": mem.get("peak_bytes_in_use"),
            }
    except Exception as exc:  # noqa: BLE001
        info["accelerator"] = {"error": str(exc)}
    return web.json_response(info)


async def config(request: web.Request) -> web.Response:
    import jax
    return web.json_response({
        "environment": os.environ.get("ENVIRONMENT", "development"),
        "backend": jax.default_backend(),
        "device_count": jax.device_count(),
        "features": {
            "ann_index": True,
            "batch_api": True,
            "sse_progress": True,
            "rate_limiting": True,
            "metrics": True,
            "sharding": True,
        },
        "limits": {"max_k": 1000, "max_dimension": 8192,
                   "max_upload_mb": 512},
    })


async def debug_routes(request: web.Request) -> web.Response:
    routes = [{"method": r.method, "path": r.resource.canonical}
              for r in request.app.router.routes()
              if r.resource is not None]
    return web.json_response({"routes": routes, "count": len(routes)})


async def debug_profile(request: web.Request) -> web.Response:
    """Capture a jax.profiler trace of a probe workload (dev only).

    The reference had no tracer at all (SURVEY.md §5 — wall-clock timers
    only); this exposes real XLA/TPU traces viewable in TensorBoard or
    Perfetto. Body: {"duration_ms": 500, "trace_dir": "/tmp/vdb_trace"}.
    """
    import jax
    import jax.numpy as jnp
    try:
        payload = await request.json()
    except Exception:  # noqa: BLE001
        payload = {}
    trace_dir = payload.get("trace_dir", "/tmp/vdb_trace")
    duration_s = min(float(payload.get("duration_ms", 500)), 10_000) / 1e3

    def _trace():  # device-blocking: run on a worker, not the event loop
        x = jnp.ones((1024, 1024))
        with jax.profiler.trace(trace_dir):
            deadline = time.time() + duration_s
            while time.time() < deadline:
                x = x @ x * 1e-3
            jax.block_until_ready(x)

    import asyncio
    await asyncio.get_running_loop().run_in_executor(
        request.app["manager"].executor, _trace)
    return web.json_response({"trace_dir": trace_dir,
                              "duration_s": duration_s,
                              "view": "tensorboard --logdir <trace_dir>"})


async def debug_device(request: web.Request) -> web.Response:
    import asyncio
    import jax
    import jax.numpy as jnp
    t0 = time.perf_counter()

    def _probe():
        x = jnp.ones((256, 256))
        jax.block_until_ready(x @ x)

    await asyncio.get_running_loop().run_in_executor(
        request.app["manager"].executor, _probe)
    return web.json_response({
        "backend": jax.default_backend(),
        "devices": [str(d) for d in jax.devices()],
        "matmul_probe_ms": round((time.perf_counter() - t0) * 1e3, 2),
    })
