#!/usr/bin/env python
"""Interactive engine-comparison app.

The role of the reference's Gradio "Vector DB Performance & Comparison
Hub" (benchmarks/benchmark_app.py:55-193: engine checkboxes, N/dim/
queries/k controls, ingestion vec/s + query QPS + avg latency table and
bar charts, per-engine error isolation and teardown) — built with ZERO
extra dependencies: the app is aiohttp (already the API stack) serving
one self-contained HTML page with inline-SVG charts instead of
gradio/pandas/matplotlib, and the engine list is this framework's real
engine matrix (XLA scan, fused Pallas, bf16/int8 storage, beam-graph,
IVF, auto-routed) plus whichever external baselines import in this
image (torch-CPU always; faiss/chromadb/qdrant gated).

The "rest-api" engine measures the full HTTP round trip like the
reference's "MLX DB (API)" row — but against an EMBEDDED server
(aiohttp AppRunner on an ephemeral port + this repo's SDK client), so
the app is self-contained instead of assuming localhost:8000 is up.

Run:  python benchmarks/compare_app.py [--port 8050]
Then open http://localhost:8050/ .  VDB_FORCE_CPU=1 honored.
"""

from __future__ import annotations

import os

if os.environ.get("VDB_FORCE_CPU"):  # env JAX_PLATFORMS is hijacked by the
    import jax                        # pinned TPU plugin; config API sticks
    jax.config.update("jax_platforms", "cpu")

import argparse
import asyncio
import importlib.util
import json
import secrets
import shutil
import tempfile
import threading
import time
from pathlib import Path

import numpy as np
from aiohttp import web

import sys

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from benchmarks.engine_comparison import (  # noqa: E402
    STORE_ENGINES, bench_chromadb, bench_faiss, bench_qdrant, bench_store,
    bench_torch)

# hard caps so a browser form can't OOM the host (reference caps N at 50K
# via its slider, benchmark_app.py:181): N and N*dim are both bounded —
# the f32 dataset allocation is capped at MAX_DATASET_BYTES (~1 GiB, i.e.
# 2M rows only up to 128D; 768D tops out at ~349K rows), well inside the
# 1-core host even with a per-engine store copy alive at once
MAX_N, MAX_QUERIES, MAX_K = 2_000_000, 2_048, 128
MAX_DATASET_BYTES = 1 << 30
DIMS = (64, 128, 384, 768, 1024, 1536)


def _importable(mod: str) -> bool:
    try:
        return importlib.util.find_spec(mod) is not None
    except (ImportError, ValueError):
        return False


def engine_catalog() -> list[dict]:
    """Every engine the UI offers, with live availability."""
    cat = [{"name": n, "kind": "store", "available": True}
           for n in STORE_ENGINES]
    cat.append({"name": "rest-api", "kind": "api", "available": True})
    cat.append({"name": "torch-cpu-flat", "kind": "external",
                "available": _importable("torch")})
    for name, mod in (("faiss-flat", "faiss"), ("chromadb", "chromadb"),
                      ("qdrant", "qdrant_client")):
        cat.append({"name": name, "kind": "external",
                    "available": _importable(mod)})
    return cat


async def _bench_rest_api(vectors, queries, k) -> dict:
    """Full HTTP round trip: embedded app + SDK client (the reference's
    'MLX DB (API)' row, benchmark_app.py:71-74)."""
    os.environ.setdefault("VECTOR_DB_API_KEY",
                          "tvdb_cmp_" + secrets.token_hex(12))
    os.environ.setdefault("VECTOR_DB_ADMIN_KEY",
                          "tvdb_cmpadm_" + secrets.token_hex(12))
    from tpu_vector_db.api.app import create_app
    from tpu_vector_db.sdk.client import ClientConfig, VectorDBClient
    from tpu_vector_db.security.auth import reload_auth
    from tpu_vector_db.service.manager import VectorStoreManager

    reload_auth()
    with tempfile.TemporaryDirectory() as td:
        manager = VectorStoreManager(base_path=Path(td))
        app = create_app(manager=manager)
        runner = web.AppRunner(app)
        await runner.setup()
        site = web.TCPSite(runner, "127.0.0.1", 0)
        await site.start()
        port = runner.addresses[0][1]
        client = VectorDBClient(ClientConfig(
            base_url=f"http://127.0.0.1:{port}",
            api_key=os.environ["VECTOR_DB_API_KEY"],
            admin_key=os.environ["VECTOR_DB_ADMIN_KEY"]))
        try:
            await client.create_store("cmp", "bench",
                                      dimension=vectors.shape[1])
            t0 = time.perf_counter()
            await client.batch_add_vectors("cmp", "bench", vectors)
            ingest = len(vectors) / (time.perf_counter() - t0)
            await client.query_vectors("cmp", "bench", queries[0], k=k)
            lat = []
            # sequential single-query round trips, bounded to stay inside
            # the premium per-minute budget (rate_limiting.py POLICIES)
            for i in range(min(len(queries), 64)):
                t0 = time.perf_counter()
                await client.query_vectors("cmp", "bench", queries[i], k=k)
                lat.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            await client.batch_query_vectors("cmp", "bench", queries, k=k)
            batch_dt = time.perf_counter() - t0
        finally:
            await client.close()
            await runner.cleanup()
    return {"engine": "rest-api", "ingest_vps": round(ingest, 1),
            "qps_batched": round(len(queries) / batch_dt, 1),
            "p50_ms": round(sorted(lat)[len(lat) // 2] * 1e3, 3)}


class BenchJob:
    """One benchmark run at a time; progress polled by the page.

    The reference streams progress through gr.Progress
    (benchmark_app.py:56); here the page polls /api/status and each
    engine reports OK / Error in its own row (same per-engine error
    isolation as the reference's try/except/finally per engine)."""

    def __init__(self) -> None:
        self._lock = threading.Lock()
        self._thread: threading.Thread | None = None
        self._state: dict = {"status": "idle", "rows": [], "params": None,
                             "current": None, "done": 0, "total": 0}

    def snapshot(self) -> dict:
        with self._lock:
            return json.loads(json.dumps(self._state))

    def start(self, params: dict) -> bool:
        with self._lock:
            if self._state["status"] == "running":
                return False
            self._state = {"status": "running", "rows": [], "params": params,
                           "current": None, "done": 0,
                           "total": len(params["engines"])}
        self._thread = threading.Thread(target=self._run, args=(params,),
                                        daemon=True)
        self._thread.start()
        return True

    def _set(self, **kv) -> None:
        with self._lock:
            self._state.update(kv)

    def _append_row(self, row: dict) -> None:
        with self._lock:
            self._state["rows"].append(row)
            self._state["done"] += 1

    def _run(self, params: dict) -> None:
        base = None
        try:
            rng = np.random.default_rng(0)
            n, dim = params["n"], params["dim"]
            vectors = rng.standard_normal((n, dim)).astype(np.float32)
            queries = rng.standard_normal(
                (params["queries"], dim)).astype(np.float32)
            base = Path(tempfile.mkdtemp(prefix="tpu_vdb_cmp_"))
            k = params["k"]
            for name in params["engines"]:
                self._set(current=name)
                t0 = time.perf_counter()
                try:
                    if name in STORE_ENGINES:
                        row = bench_store(name, STORE_ENGINES[name](dim),
                                          vectors, queries, k, base)
                    elif name == "rest-api":
                        row = asyncio.run(
                            _bench_rest_api(vectors, queries, k))
                    elif name == "torch-cpu-flat":
                        row = bench_torch(vectors, queries, k)
                    elif name == "faiss-flat":
                        row = bench_faiss(vectors, queries, k)
                    elif name == "chromadb":
                        row = bench_chromadb(vectors, queries, k)
                    elif name == "qdrant":
                        row = bench_qdrant(vectors, queries, k)
                    else:
                        row = None
                    if row is None:
                        row = {"engine": name, "ingest_vps": None,
                               "qps_batched": None, "p50_ms": None,
                               "status": "unavailable"}
                    else:
                        row["status"] = "ok"
                except Exception as e:  # noqa: BLE001 — per-engine isolation
                    row = {"engine": name, "ingest_vps": None,
                           "qps_batched": None, "p50_ms": None,
                           "status": "error",
                           "detail": f"{type(e).__name__}: {e}"}
                row["wall_s"] = round(time.perf_counter() - t0, 1)
                self._append_row(row)
            self._set(status="done", current=None)
        except Exception as e:  # noqa: BLE001
            self._set(status="error", current=None,
                      detail=f"{type(e).__name__}: {e}")
        finally:
            # scratch stores are per-run; don't leak a dir per benchmark
            if base is not None:
                shutil.rmtree(base, ignore_errors=True)


def _clamp_params(body: dict) -> dict:
    known = {c["name"] for c in engine_catalog()}
    engines = [e for e in body.get("engines", []) if e in known]
    if not engines:
        raise web.HTTPBadRequest(text=json.dumps(
            {"error": "no valid engines selected"}),
            content_type="application/json")
    def _int(key: str, default: int) -> int:
        try:
            return int(body.get(key, default))
        except (TypeError, ValueError):
            raise web.HTTPBadRequest(text=json.dumps(
                {"error": f"{key} must be an integer"}),
                content_type="application/json")

    dim = _int("dim", 384)
    if dim not in DIMS:
        raise web.HTTPBadRequest(text=json.dumps(
            {"error": f"dim must be one of {DIMS}"}),
            content_type="application/json")
    n = max(100, min(_int("n", 10_000), MAX_N))
    # bound the f32 dataset allocation, not just the row count (ADVICE r4:
    # 2M x 1536D would have been ~12 GB on the 1-core host)
    n = min(n, MAX_DATASET_BYTES // (dim * 4))
    return {"engines": engines,
            "n": n,
            "dim": dim,
            "queries": max(1, min(_int("queries", 64), MAX_QUERIES)),
            "k": max(1, min(_int("k", 10), MAX_K))}


def create_compare_app() -> web.Application:
    app = web.Application()
    app["job"] = BenchJob()

    async def index(_req: web.Request) -> web.Response:
        return web.Response(text=PAGE, content_type="text/html")

    async def engines(_req: web.Request) -> web.Response:
        return web.json_response({"engines": engine_catalog(),
                                  "dims": list(DIMS), "max_n": MAX_N})

    async def run(req: web.Request) -> web.Response:
        try:
            body = await req.json()
        except json.JSONDecodeError:
            raise web.HTTPBadRequest(text=json.dumps(
                {"error": "invalid JSON"}), content_type="application/json")
        params = _clamp_params(body)
        if not req.app["job"].start(params):
            return web.json_response(
                {"error": "a benchmark is already running"}, status=409)
        return web.json_response({"started": True, "params": params})

    async def status(req: web.Request) -> web.Response:
        return web.json_response(req.app["job"].snapshot())

    app.router.add_get("/", index)
    app.router.add_get("/api/engines", engines)
    app.router.add_post("/api/run", run)
    app.router.add_get("/api/status", status)
    return app


# --- the page: plain HTML + inline SVG bar charts, light/dark aware ----
PAGE = r"""<!doctype html>
<html lang="en"><head><meta charset="utf-8">
<meta name="viewport" content="width=device-width, initial-scale=1">
<title>TPU Vector DB — Engine Comparison</title>
<style>
.viz-root {
  color-scheme: light;
  --surface-1:#fcfcfb; --page:#f9f9f7;
  --ink-1:#0b0b0b; --ink-2:#52514e; --ink-muted:#898781;
  --grid:#e1e0d9; --axis:#c3c2b7; --border:rgba(11,11,11,.10);
  --series-1:#2a78d6; --good:#0ca30c; --critical:#d03b3b;
}
@media (prefers-color-scheme: dark) {
  :root:where(:not([data-theme="light"])) .viz-root {
    color-scheme: dark;
    --surface-1:#1a1a19; --page:#0d0d0d;
    --ink-1:#ffffff; --ink-2:#c3c2b7; --ink-muted:#898781;
    --grid:#2c2c2a; --axis:#383835; --border:rgba(255,255,255,.10);
    --series-1:#3987e5;
  }
}
body{margin:0;font-family:system-ui,-apple-system,"Segoe UI",sans-serif}
.viz-root{background:var(--page);color:var(--ink-1);min-height:100vh;
  padding:24px}
h1{font-size:20px;margin:0 0 4px} .sub{color:var(--ink-2);font-size:13px;
  margin-bottom:20px}
.panel{background:var(--surface-1);border:1px solid var(--border);
  border-radius:8px;padding:16px;margin-bottom:16px}
.controls{display:flex;flex-wrap:wrap;gap:16px;align-items:flex-end}
.field{display:flex;flex-direction:column;gap:4px;font-size:13px;
  color:var(--ink-2)}
.field input,.field select{padding:6px 8px;border:1px solid var(--axis);
  border-radius:6px;background:var(--surface-1);color:var(--ink-1);
  font:inherit;width:110px}
.engines{display:flex;flex-wrap:wrap;gap:8px 16px;margin:10px 0 14px}
.engines label{font-size:13px;color:var(--ink-1);display:flex;gap:6px;
  align-items:center}
.engines label.off{color:var(--ink-muted)}
button{padding:8px 18px;border-radius:6px;border:1px solid var(--axis);
  background:var(--series-1);color:#fff;font:inherit;cursor:pointer}
button:disabled{opacity:.5;cursor:default}
table{border-collapse:collapse;width:100%;font-size:13px}
th{color:var(--ink-2);text-align:left;font-weight:600}
td,th{padding:6px 10px;border-bottom:1px solid var(--grid)}
td.num{font-variant-numeric:tabular-nums;text-align:right}
th.num{text-align:right}
.ok{color:var(--good)} .err{color:var(--critical)}
.charts{display:grid;grid-template-columns:1fr 1fr;gap:16px}
@media(max-width:900px){.charts{grid-template-columns:1fr}}
.chart h3{font-size:13px;color:var(--ink-2);font-weight:600;margin:0 0 8px}
.tip{position:fixed;pointer-events:none;background:var(--surface-1);
  border:1px solid var(--border);border-radius:6px;padding:6px 10px;
  font-size:12px;color:var(--ink-1);box-shadow:0 2px 8px rgba(0,0,0,.15);
  display:none;z-index:10}
.progress{font-size:13px;color:var(--ink-2);margin-top:8px}
</style></head>
<body><div class="viz-root">
<h1>Engine Comparison</h1>
<div class="sub">TPU-native vector DB engines vs external baselines —
ingestion, batched QPS, single-query p50. Table is the canonical view;
charts mirror it.</div>

<div class="panel">
  <div class="engines" id="engines"></div>
  <div class="controls">
    <div class="field"><span>Vectors (N)</span>
      <input id="n" type="number" value="10000" min="100" step="1000"></div>
    <div class="field"><span>Dimension</span><select id="dim"></select></div>
    <div class="field"><span>Queries</span>
      <input id="queries" type="number" value="64" min="1" max="2048"></div>
    <div class="field"><span>k (top-N)</span>
      <input id="k" type="number" value="10" min="1" max="128"></div>
    <button id="run">Run benchmark</button>
  </div>
  <div class="progress" id="progress"></div>
</div>

<div class="panel"><table id="results"><thead><tr>
  <th>Engine</th><th class="num">Ingestion (vec/s)</th>
  <th class="num">Query (QPS, batched)</th><th class="num">p50 latency (ms)</th>
  <th>Status</th></tr></thead><tbody></tbody></table></div>

<div class="charts">
  <div class="panel chart"><h3>Ingestion — vectors / second</h3>
    <svg id="chart-ingest" width="100%"></svg></div>
  <div class="panel chart"><h3>Query throughput — QPS (batched)</h3>
    <svg id="chart-qps" width="100%"></svg></div>
</div>
<div class="tip" id="tip"></div>

<script>
const $=id=>document.getElementById(id);
const fmt=v=>v==null?"—":Number(v).toLocaleString();
let poller=null;

async function init(){
  const info=await (await fetch("api/engines")).json();
  const eng=$("engines");
  for(const e of info.engines){
    const l=document.createElement("label");
    if(!e.available)l.className="off";
    const defOn=e.available&&["flat-pallas","flat-xla","ann-ivf",
      "torch-cpu-flat"].includes(e.name);
    l.innerHTML=`<input type="checkbox" value="${e.name}" `+
      `${defOn?"checked":""} ${e.available?"":"disabled"}>`+
      `${e.name}${e.available?"":" (not installed)"}`;
    eng.appendChild(l);
  }
  const dim=$("dim");
  for(const d of info.dims){
    const o=document.createElement("option");
    o.value=d;o.textContent=d;if(d===384)o.selected=true;
    dim.appendChild(o);
  }
  const st=await (await fetch("api/status")).json();
  if(st.status==="running"){$("run").disabled=true;poll();}
  else if(st.rows&&st.rows.length)render(st);
}

$("run")?.addEventListener("click",async()=>{
  const engines=[...document.querySelectorAll("#engines input:checked")]
    .map(c=>c.value);
  const body={engines,n:+$("n").value,dim:+$("dim").value,
    queries:+$("queries").value,k:+$("k").value};
  const r=await fetch("api/run",{method:"POST",
    headers:{"Content-Type":"application/json"},body:JSON.stringify(body)});
  if(!r.ok){$("progress").textContent=(await r.json()).error;return}
  $("run").disabled=true;poll();
});

function poll(){
  clearInterval(poller);
  poller=setInterval(async()=>{
    const st=await (await fetch("api/status")).json();
    render(st);
    if(st.status!=="running"){clearInterval(poller);$("run").disabled=false}
  },1000);
}

function render(st){
  $("progress").textContent=st.status==="running"
    ?`running ${st.current??""} — ${st.done}/${st.total} engines done`
    :(st.status==="done"?`done — ${st.rows.length} engines`:st.detail??"");
  const tb=document.querySelector("#results tbody");
  tb.innerHTML="";
  for(const r of st.rows){
    const tr=document.createElement("tr");
    tr.innerHTML=`<td>${r.engine}</td><td class="num">${fmt(r.ingest_vps)}`+
      `</td><td class="num">${fmt(r.qps_batched)}</td>`+
      `<td class="num">${r.p50_ms==null?"—":r.p50_ms.toFixed(3)}</td>`+
      `<td class="${r.status==="ok"?"ok":"err"}">`+
      `${r.status==="ok"?"✓ ok":"✗ "+(r.detail||r.status)}</td>`;
    tb.appendChild(tr);
  }
  bars($("chart-ingest"),st.rows,"ingest_vps");
  bars($("chart-qps"),st.rows,"qps_batched");
}

function bars(svg,rows,key){
  const data=rows.filter(r=>r[key]!=null);
  svg.innerHTML="";
  const W=svg.clientWidth||420,BAR=18,GAP=10,LAB=118,PAD=8;
  const H=data.length*(BAR+GAP)+PAD*2+16;
  svg.setAttribute("height",H);svg.setAttribute("viewBox",`0 0 ${W} ${H}`);
  if(!data.length)return;
  const css=getComputedStyle(svg.closest(".viz-root"));
  const col=css.getPropertyValue("--series-1").trim(),
    muted=css.getPropertyValue("--ink-muted").trim(),
    grid=css.getPropertyValue("--grid").trim(),
    ink=css.getPropertyValue("--ink-1").trim();
  const max=Math.max(...data.map(r=>r[key])),span=W-LAB-PAD-60;
  const NS="http://www.w3.org/2000/svg";
  const el=(t,a)=>{const e=document.createElementNS(NS,t);
    for(const k in a)e.setAttribute(k,a[k]);return e};
  for(const f of [0.25,0.5,0.75,1]){ // hairline gridlines
    const x=LAB+f*span;
    svg.appendChild(el("line",{x1:x,y1:PAD,x2:x,y2:H-PAD-14,
      stroke:grid,"stroke-width":1}));
  }
  const best=Math.max(...data.map(r=>r[key]));
  data.forEach((r,i)=>{
    const y=PAD+i*(BAR+GAP),w=Math.max(4,r[key]/max*span);
    const t=document.createElementNS(NS,"text");
    t.setAttribute("x",LAB-8);t.setAttribute("y",y+BAR-5);
    t.setAttribute("text-anchor","end");t.setAttribute("font-size","11");
    t.setAttribute("fill",muted);t.textContent=r.engine;
    svg.appendChild(t);
    // rounded data end, square baseline (rx on the far corners only)
    const p=el("path",{d:`M${LAB},${y} h${w-4} a4,4 0 0 1 4,4 v${BAR-8} `+
      `a4,4 0 0 1 -4,4 h${-(w-4)} z`,fill:col});
    p.addEventListener("mousemove",ev=>{
      const tip=$("tip");tip.style.display="block";
      tip.style.left=(ev.clientX+12)+"px";tip.style.top=(ev.clientY+12)+"px";
      tip.textContent=`${r.engine}: ${fmt(r[key])}`;
    });
    p.addEventListener("mouseleave",()=>$("tip").style.display="none");
    svg.appendChild(p);
    if(r[key]===best){ // direct label on the leading bar only
      const v=document.createElementNS(NS,"text");
      v.setAttribute("x",LAB+w+6);v.setAttribute("y",y+BAR-5);
      v.setAttribute("font-size","11");v.setAttribute("fill",ink);
      v.textContent=fmt(r[key]);svg.appendChild(v);
    }
  });
  svg.appendChild(el("line",{x1:LAB,y1:PAD,x2:LAB,y2:H-PAD-14,
    stroke:css.getPropertyValue("--axis").trim(),"stroke-width":1}));
}
init();
</script>
</div></body></html>
"""


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--port", type=int, default=8050)
    ap.add_argument("--host", default="127.0.0.1")
    args = ap.parse_args()
    web.run_app(create_compare_app(), host=args.host, port=args.port,
                access_log=None)


if __name__ == "__main__":
    main()
