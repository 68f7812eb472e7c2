#!/usr/bin/env python
"""Server + SDK example: start the REST server in-process, drive it with the
async SDK (store context, batch ingest with progress, semantic search).

  python examples/rest_and_sdk.py
"""

import asyncio
import os
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

os.environ.setdefault("VECTOR_DB_API_KEY", "tvdb_example_api_key_0123456789")
os.environ.setdefault("VECTOR_DB_ADMIN_KEY", "tvdb_example_admin_0123456789")


async def main() -> None:
    from aiohttp.test_utils import TestServer
    from tpu_vector_db.api.app import create_app
    from tpu_vector_db.sdk import ClientConfig, VectorDBClient
    from tpu_vector_db.service.manager import VectorStoreManager

    manager = VectorStoreManager(base_path="/tmp/vdb_sdk_example")
    server = TestServer(create_app(manager=manager))
    await server.start_server()
    print(f"server at {server.make_url('/')}")

    cfg = ClientConfig(base_url=str(server.make_url("/")).rstrip("/"),
                       api_key=os.environ["VECTOR_DB_API_KEY"],
                       admin_key=os.environ["VECTOR_DB_ADMIN_KEY"])
    rng = np.random.default_rng(0)
    vectors = rng.standard_normal((500, 64)).astype(np.float32)

    async with VectorDBClient(cfg) as client:
        print("health:", (await client.health_check())["status"])

        # scoped store helper with auto-create
        async with client.store_context("demo", "docs",
                                        dimension=64) as store:
            await store.add(vectors[:100],
                            [{"i": i} for i in range(100)])
            print("count:", await store.count())
            results = await store.query(vectors[7], k=3)
            print("top hit:", results[0].index, results[0].similarity)

        # chunked batch ingest with progress tracking (v1 batch API)
        out = await client.batch_add_vectors("demo", "docs", vectors[100:],
                                             chunk_size=100)
        print("batch add:", out["status"], out["result"])

        # one-liners
        hits = await client.semantic_search("demo", "docs", vectors[300],
                                            k=5, min_similarity=0.5)
        print("semantic search hits:", [h.index for h in hits])
        print("client stats:", client.get_stats())

    await server.close()


if __name__ == "__main__":
    asyncio.run(main())
