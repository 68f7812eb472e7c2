"""Interactive comparison app (benchmarks/compare_app.py).

Covers the role of the reference's Gradio comparison hub
(benchmarks/benchmark_app.py:55-193): engine catalog with availability,
a run over in-framework + external engines producing ingestion/QPS/p50
rows, per-engine error isolation, and the single-run guard.
"""

import asyncio
import sys
import time
from pathlib import Path

import pytest
from aiohttp.test_utils import TestClient, TestServer

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from benchmarks.compare_app import create_compare_app  # noqa: E402


def run(coro):
    return asyncio.run(coro)


async def _wait_done(client, timeout_s=180.0):
    t0 = time.time()
    while time.time() - t0 < timeout_s:
        st = await (await client.get("/api/status")).json()
        if st["status"] in ("done", "error"):
            return st
        await asyncio.sleep(0.5)
    raise TimeoutError("benchmark did not finish")


def test_engine_catalog_and_page():
    async def go():
        async with TestClient(TestServer(create_compare_app())) as client:
            r = await client.get("/api/engines")
            assert r.status == 200
            body = await r.json()
            names = {e["name"]: e["available"] for e in body["engines"]}
            # in-framework engines always available
            for n in ("flat-xla", "flat-pallas", "ann-ivf", "rest-api"):
                assert names[n] is True
            # torch ships in this image; faiss/chromadb/qdrant are gated
            assert names["torch-cpu-flat"] is True
            assert "faiss-flat" in names and "qdrant" in names
            page = await client.get("/")
            assert page.status == 200
            html = await page.text()
            assert "Engine Comparison" in html and "chart-qps" in html

    run(go())


def test_run_small_benchmark_and_single_run_guard():
    async def go():
        async with TestClient(TestServer(create_compare_app())) as client:
            params = {"engines": ["flat-xla", "torch-cpu-flat"],
                      "n": 2000, "dim": 64, "queries": 8, "k": 5}
            r = await client.post("/api/run", json=params)
            assert r.status == 200, await r.text()
            # second start while running must 409 (may race a fast finish)
            r2 = await client.post("/api/run", json=params)
            assert r2.status in (409, 200)
            st = await _wait_done(client)
            assert st["status"] == "done"
            rows = {row["engine"]: row for row in st["rows"]}
            assert rows["flat-xla"]["status"] == "ok"
            assert rows["flat-xla"]["qps_batched"] > 0
            assert rows["flat-xla"]["p50_ms"] > 0
            assert rows["torch-cpu-flat"]["status"] == "ok"
            assert rows["torch-cpu-flat"]["ingest_vps"] > 0

    run(go())


def test_rest_api_engine_round_trip():
    async def go():
        async with TestClient(TestServer(create_compare_app())) as client:
            params = {"engines": ["rest-api"],
                      "n": 500, "dim": 64, "queries": 4, "k": 3}
            r = await client.post("/api/run", json=params)
            assert r.status == 200, await r.text()
            st = await _wait_done(client)
            assert st["status"] == "done"
            (row,) = st["rows"]
            assert row["engine"] == "rest-api"
            assert row["status"] == "ok", row
            assert row["qps_batched"] > 0 and row["p50_ms"] > 0

    run(go())


def test_param_validation():
    async def go():
        async with TestClient(TestServer(create_compare_app())) as client:
            r = await client.post("/api/run", json={"engines": ["nope"]})
            assert r.status == 400
            r = await client.post(
                "/api/run", json={"engines": ["flat-xla"], "dim": 77})
            assert r.status == 400
            r = await client.post("/api/run", data=b"not json")
            assert r.status == 400

    run(go())


def test_unavailable_engine_reports_unavailable():
    async def go():
        async with TestClient(TestServer(create_compare_app())) as client:
            r = await client.post("/api/run", json={
                "engines": ["faiss-flat"], "n": 300, "dim": 64,
                "queries": 2, "k": 2})
            assert r.status == 200
            st = await _wait_done(client)
            (row,) = st["rows"]
            assert row["status"] in ("ok", "unavailable")
            if row["status"] == "unavailable":
                assert row["qps_batched"] is None

    run(go())


if __name__ == "__main__":
    sys.exit(pytest.main([__file__, "-x", "-q"]))


def test_non_numeric_params_400_and_dataset_cap():
    """ADVICE r4: non-numeric n must be a 400 (not a 500), and n*dim is
    bounded by MAX_DATASET_BYTES."""
    async def go():
        async with TestClient(TestServer(create_compare_app())) as client:
            r = await client.post("/api/run", json={
                "engines": ["flat-xla"], "n": "abc"})
            assert r.status == 400
            r = await client.post("/api/run", json={
                "engines": ["flat-xla"], "queries": [1, 2]})
            assert r.status == 400

    run(go())


def test_dataset_byte_cap_clamps_n():
    from benchmarks.compare_app import MAX_DATASET_BYTES, _clamp_params
    p = _clamp_params({"engines": ["flat-xla"], "n": 2_000_000, "dim": 1536})
    assert p["n"] * 1536 * 4 <= MAX_DATASET_BYTES


def test_chromadb_qdrant_dispatched_or_unavailable():
    """Selected chromadb/qdrant must go through their bench fns (reported
    unavailable only because the libs aren't installed here — not because
    dispatch fell through; ADVICE r4 medium)."""
    async def go():
        async with TestClient(TestServer(create_compare_app())) as client:
            r = await client.post("/api/run", json={
                "engines": ["chromadb", "qdrant"], "n": 200, "dim": 64,
                "queries": 2, "k": 2})
            assert r.status == 200
            st = await _wait_done(client)
            import importlib.util
            have = {"chromadb": "chromadb", "qdrant": "qdrant_client"}
            for row in st["rows"]:
                if importlib.util.find_spec(have[row["engine"]]) is not None:
                    # lib installed: dispatch must produce a real row
                    assert row["status"] == "ok", row
                else:
                    assert row["status"] == "unavailable", row

    run(go())
