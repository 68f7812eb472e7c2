"""Server worker for the 2-process REST serving test
(tests/test_multihost.py::test_two_process_server_rest).

Starts the real aiohttp app with multi-host env set, so app startup runs
the DCN bootstrap path (api/app.py _on_startup -> bootstrap_distributed)
and the manager serves ShardedVectorStore over the 4-device global mesh
(VECTOR_DB_SHARDED=1). The parent test drives both servers in lockstep
through REST: in SPMD serving every host must execute the same device
program sequence, which a fan-out front-end provides in production and the
test client provides here.
"""

import os
import sys

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=2")
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def main() -> None:
    coordinator, process_id, http_port = sys.argv[1:4]
    os.environ["VECTOR_DB_COORDINATOR"] = coordinator
    os.environ["VECTOR_DB_NUM_PROCESSES"] = "2"
    os.environ["VECTOR_DB_PROCESS_ID"] = process_id
    os.environ["VECTOR_DB_SHARDED"] = "1"
    os.environ["VDB_COALESCE_MS"] = "off"  # per-process windows would form
    # different batch shapes -> different device programs -> collective
    # mismatch; a production fan-out tier coalesces BEFORE the hosts
    os.environ["HOST"] = "127.0.0.1"
    os.environ["PORT"] = http_port

    from tpu_vector_db.api.main import main as serve
    serve(["development"])


if __name__ == "__main__":
    main()
