"""Multi-host (DCN) bootstrap test: 2 real processes x 2 virtual CPU
devices form a 4-device global mesh through jax.distributed, run a
cross-process collective, and prove the sharded scan equals the flat scan
when rows live on BOTH processes (SURVEY.md §2.2 multi-host layer;
VERDICT round-1 item #5 — bootstrap_distributed was dead code)."""

import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

WORKER = Path(__file__).with_name("_multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_mesh():
    port = _free_port()
    coordinator = f"127.0.0.1:{port}"
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env["JAX_PLATFORMS"] = "cpu"
    repo = str(WORKER.parent.parent)
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, str(WORKER), coordinator, str(i)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, env=env, cwd=repo)
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=240)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail(f"multihost workers timed out; partial output: {outs}")
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out[-3000:]}"
        assert f"MULTIHOST_OK process={i}" in out, out[-3000:]


SERVER_WORKER = Path(__file__).with_name("_multihost_server_worker.py")


def test_two_process_server_rest(tmp_path):
    """VERDICT r2 item 9: two real server processes bootstrap over DCN at
    startup (api/app.py _on_startup), form a 4-device global mesh, and
    serve a SHARDED store through REST. The client plays the production
    fan-out tier: every mutation/query goes to both hosts in lockstep."""
    import concurrent.futures
    import json
    import time
    import urllib.error
    import urllib.request

    coord_port = _free_port()
    http_ports = [_free_port(), _free_port()]
    env_base = {k: v for k, v in os.environ.items()
                if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    repo = str(SERVER_WORKER.parent.parent)
    env_base["PYTHONPATH"] = repo + os.pathsep + env_base.get("PYTHONPATH", "")
    env_base["VECTOR_DB_API_KEY"] = "mh-test-key"
    env_base["VECTOR_DB_ADMIN_KEY"] = "mh-admin-key"

    procs = []
    for i in range(2):
        env = dict(env_base)
        env["VECTOR_DB_DATA_DIR"] = str(tmp_path / f"proc{i}")
        procs.append(subprocess.Popen(
            [sys.executable, str(SERVER_WORKER), f"127.0.0.1:{coord_port}",
             str(i), str(http_ports[i])],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, env=env, cwd=repo))

    def call(port, path, payload=None, admin=False, timeout=60):
        url = f"http://127.0.0.1:{port}{path}"
        data = json.dumps(payload).encode() if payload is not None else None
        req = urllib.request.Request(
            url, data=data, method="POST" if data else "GET",
            headers={"Content-Type": "application/json",
                     "Authorization": "Bearer " + (
                         "mh-admin-key" if admin else "mh-test-key")})
        with urllib.request.urlopen(req, timeout=timeout) as r:
            return json.loads(r.read().decode())

    def both(path, payload=None, admin=False):
        # lockstep fan-out: both hosts must run the same device program
        with concurrent.futures.ThreadPoolExecutor(2) as ex:
            futs = [ex.submit(call, p, path, payload, admin)
                    for p in http_ports]
            return [f.result(timeout=180) for f in futs]

    try:
        deadline = time.time() + 180
        up = [False, False]
        while time.time() < deadline and not all(up):
            for i, port in enumerate(http_ports):
                if up[i]:
                    continue
                if procs[i].poll() is not None:
                    out, _ = procs[i].communicate(timeout=10)
                    pytest.fail(f"server {i} died early:\n{out[-3000:]}")
                try:
                    call(port, "/health", timeout=5)
                    up[i] = True
                except (urllib.error.URLError, OSError):
                    time.sleep(1.0)
        assert all(up), "servers did not come up"

        rng = np.random.default_rng(3)
        d, n = 16, 300
        vecs = rng.standard_normal((n, d)).astype(np.float32)
        both("/admin/create_store",
             {"user_id": "mh", "model_id": "m", "dimension": d,
              "index_type": "flat"}, admin=True)
        res = both("/vectors/add",
                   {"user_id": "mh", "model_id": "m",
                    "vectors": vecs.tolist(),
                    "metadata": [{"i": i} for i in range(n)]})
        assert all(r.get("total", r.get("added")) in (n,) for r in res), res

        q = both("/vectors/query",
                 {"user_id": "mh", "model_id": "m",
                  "query": vecs[42].tolist(), "k": 3})
        id_lists = []
        for r in q:
            assert r["store_count"] == n, r
            ids = [item["index"] for item in r["results"]]
            id_lists.append(ids)
        # both hosts agree and top-1 is the vector itself
        assert id_lists[0] == id_lists[1], id_lists
        assert id_lists[0][0] == 42, id_lists[0]
    finally:
        for p in procs:
            p.terminate()
        for p in procs:
            try:
                p.wait(timeout=15)
            except subprocess.TimeoutExpired:
                p.kill()


def test_worker_death_degrades_cleanly(tmp_path):
    """Distributed failure injection (VERDICT r3 item 6): kill one of the
    two server processes mid-serving. The survivor must answer sharded
    queries with a clean, bounded 503 (not a hung request), /health must
    flip to 503/peer_lost, and a restart of the serving group must
    restore service (jax.distributed meshes cannot re-admit a process, so
    group restart IS the recovery path — documented on PeerLostError)."""
    import concurrent.futures
    import json
    import signal
    import time
    import urllib.error
    import urllib.request

    env_base = {k: v for k, v in os.environ.items()
                if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    repo = str(SERVER_WORKER.parent.parent)
    env_base["PYTHONPATH"] = repo + os.pathsep + env_base.get("PYTHONPATH", "")
    env_base["VECTOR_DB_API_KEY"] = "mh-test-key"
    env_base["VECTOR_DB_ADMIN_KEY"] = "mh-admin-key"
    # a short watchdog so the first post-kill query 503s fast; the CPU-mesh
    # programs complete in well under a second when healthy ALONE, but a
    # full-suite run on the 1-core host can stall a healthy collective
    # past 20s and latch peer_lost during SETUP (latching is by design —
    # no retry recovers), so the watchdog must clear worst-case healthy
    # contention while staying under the <45s post-kill bound below
    env_base["VECTOR_DB_COLLECTIVE_TIMEOUT_S"] = "30"

    def call(port, path, payload=None, admin=False, timeout=120):
        url = f"http://127.0.0.1:{port}{path}"
        data = json.dumps(payload).encode() if payload is not None else None
        req = urllib.request.Request(
            url, data=data, method="POST" if data else "GET",
            headers={"Content-Type": "application/json",
                     "Authorization": "Bearer " + (
                         "mh-admin-key" if admin else "mh-test-key")})
        with urllib.request.urlopen(req, timeout=timeout) as r:
            return json.loads(r.read().decode())

    def spawn_pair(coord_port, http_ports, run_tag):
        procs = []
        for i in range(2):
            env = dict(env_base)
            env["VECTOR_DB_DATA_DIR"] = str(tmp_path / f"{run_tag}-proc{i}")
            procs.append(subprocess.Popen(
                [sys.executable, str(SERVER_WORKER),
                 f"127.0.0.1:{coord_port}", str(i), str(http_ports[i])],
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                text=True, env=env, cwd=repo))
        deadline = time.time() + 180
        up = [False, False]
        while time.time() < deadline and not all(up):
            for i, port in enumerate(http_ports):
                if up[i]:
                    continue
                if procs[i].poll() is not None:
                    out, _ = procs[i].communicate(timeout=10)
                    pytest.fail(f"server {i} died early:\n{out[-3000:]}")
                try:
                    call(port, "/health", timeout=5)
                    up[i] = True
                except (urllib.error.URLError, OSError):
                    time.sleep(1.0)
        assert all(up), "servers did not come up"
        return procs

    def both(http_ports, path, payload=None, admin=False):
        with concurrent.futures.ThreadPoolExecutor(2) as ex:
            futs = [ex.submit(call, p, path, payload, admin)
                    for p in http_ports]
            return [f.result(timeout=180) for f in futs]

    rng = np.random.default_rng(7)
    d, n = 16, 200
    vecs = rng.standard_normal((n, d)).astype(np.float32)

    ports1 = [_free_port(), _free_port()]
    procs = spawn_pair(_free_port(), ports1, "run1")
    try:
        both(ports1, "/admin/create_store",
             {"user_id": "mh", "model_id": "m", "dimension": d,
              "index_type": "flat"}, admin=True)
        both(ports1, "/vectors/add",
             {"user_id": "mh", "model_id": "m", "vectors": vecs.tolist(),
              "metadata": [{"i": i} for i in range(n)]})
        q = both(ports1, "/vectors/query",
                 {"user_id": "mh", "model_id": "m",
                  "query": vecs[5].tolist(), "k": 3})
        assert q[0]["results"][0]["index"] == 5

        # kill worker 1 mid-serving (SIGKILL: no cleanup, a real crash)
        procs[1].send_signal(signal.SIGKILL)
        procs[1].wait(timeout=30)

        # the survivor's next sharded query hangs in the collective until
        # the watchdog trips -> clean 503 within ~timeout, NOT a hang
        t0 = time.time()
        with pytest.raises(urllib.error.HTTPError) as exc_info:
            call(ports1[0], "/vectors/query",
                 {"user_id": "mh", "model_id": "m",
                  "query": vecs[5].tolist(), "k": 3}, timeout=60)
        assert exc_info.value.code == 503, exc_info.value
        assert time.time() - t0 < 45, "503 took too long (hang?)"
        body = json.loads(exc_info.value.read().decode())
        assert "peer" in body["error"].lower(), body

        # latched: later queries fast-fail without touching the device
        t0 = time.time()
        with pytest.raises(urllib.error.HTTPError) as exc_info:
            call(ports1[0], "/vectors/query",
                 {"user_id": "mh", "model_id": "m",
                  "query": vecs[5].tolist(), "k": 3}, timeout=30)
        assert exc_info.value.code == 503
        # fast-fail means "no device touch / no watchdog wait" — the bound
        # is generous only for 1-core-host scheduling noise under full-suite
        # contention, not because any real work happens
        assert time.time() - t0 < 10, "degraded query should fast-fail"

        # /health drains the node
        with pytest.raises(urllib.error.HTTPError) as exc_info:
            call(ports1[0], "/health", timeout=10)
        assert exc_info.value.code == 503
        assert json.loads(exc_info.value.read().decode())["peer_lost"]
    finally:
        for p in procs:
            p.kill()
        for p in procs:
            try:
                p.wait(timeout=15)
            except subprocess.TimeoutExpired:
                pass

    # recovery: restart the serving group (fresh coordinator + both
    # workers) and serve again — same data dirs reload persisted stores
    ports2 = [_free_port(), _free_port()]
    procs2 = spawn_pair(_free_port(), ports2, "run1")  # same dirs -> reload
    try:
        q = both(ports2, "/vectors/query",
                 {"user_id": "mh", "model_id": "m",
                  "query": vecs[5].tolist(), "k": 3})
        assert q[0]["results"][0]["index"] == 5, "recovery serve failed"
        assert q[0]["store_count"] == n
    finally:
        for p in procs2:
            p.terminate()
        for p in procs2:
            try:
                p.wait(timeout=15)
            except subprocess.TimeoutExpired:
                p.kill()
