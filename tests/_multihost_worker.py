"""Worker process for the 2-process jax.distributed test
(tests/test_multihost.py). Each process contributes 2 virtual CPU devices
to a 4-device global mesh over DCN (the coordination service), then proves
(a) the process group formed, (b) cross-process collectives work, and
(c) the sharded query scan (local top-k + all-gather merge) matches the
flat top-k when the store's rows live across PROCESSES, not just devices.

Exercises parallel/mesh.bootstrap_distributed — SURVEY.md §2.2's multi-host
layer (the role NCCL/MPI plays elsewhere).
"""

import os
import sys

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=2")
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tpu_vector_db.ops import distance as D  # noqa: E402
from tpu_vector_db.ops.scan import flat_scan_topk  # noqa: E402
from tpu_vector_db.parallel.mesh import (SHARD_AXIS,  # noqa: E402
                                         bootstrap_distributed)
from tpu_vector_db.parallel.sharded_scan import (  # noqa: E402
    make_sharded_query_fn)


def main() -> None:
    coordinator = sys.argv[1]
    process_id = int(sys.argv[2])
    bootstrap_distributed(coordinator_address=coordinator,
                          num_processes=2, process_id=process_id)
    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 4, jax.device_count()

    # (b) cross-process collective: global sum over one value per device
    mesh = jax.make_mesh((4,), (SHARD_AXIS,), devices=jax.devices())
    local = np.full((2,), float(jax.process_index() + 1), np.float32)
    garr = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P(SHARD_AXIS)), local, global_shape=(4,))
    total = float(jax.jit(jnp.sum)(garr))
    assert total == 1.0 + 1.0 + 2.0 + 2.0, total

    # (c) sharded scan over rows living on both processes == flat scan
    n, d, k, block = 256, 16, 5, 32
    rng = np.random.default_rng(0)
    full = rng.standard_normal((n, d)).astype(np.float32)  # same seed both
    queries = rng.standard_normal((3, d)).astype(np.float32)
    prepared = np.asarray(D.pad_dim(D.l2_normalize(jnp.asarray(full))))
    rows_per_proc = n // 2
    lo = jax.process_index() * rows_per_proc
    db = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P(SHARD_AXIS, None)),
        prepared[lo: lo + rows_per_proc],
        global_shape=prepared.shape)
    qdev = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P()),
        np.asarray(D.pad_dim(D.l2_normalize(jnp.asarray(queries)))),
        global_shape=(3, prepared.shape[1]))
    fn, _ = make_sharded_query_fn(mesh, k, metric="cosine",
                                  db_normalized=True, block_rows=block)
    count = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P()), np.int32(n), global_shape=())
    keys, idx = fn(qdev, db, count)
    keys = np.asarray(jax.device_get(keys))
    idx = np.asarray(jax.device_get(idx))

    ref_keys, ref_idx = flat_scan_topk(
        D.pad_dim(D.l2_normalize(jnp.asarray(queries))),
        jnp.asarray(prepared), jnp.int32(n), k,
        metric="cosine", db_normalized=True, block_rows=n)
    np.testing.assert_array_equal(idx, np.asarray(ref_idx))
    np.testing.assert_allclose(keys, np.asarray(ref_keys), atol=1e-5)
    print(f"MULTIHOST_OK process={jax.process_index()}", flush=True)


if __name__ == "__main__":
    main()
