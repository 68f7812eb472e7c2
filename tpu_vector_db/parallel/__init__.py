"""Multi-chip scale-out: device mesh, sharded stores, cross-chip top-k merge.

The reference was explicitly single-process/single-device (SURVEY.md §2.2:
uvicorn pinned to workers=1, "no sharding, clustering, or federation"). This
package is the capability the TPU build adds: a store's (N, d) matrix shards
row-wise across a `jax.sharding.Mesh`; each chip scans its rows and computes
a local top-k; the k·P candidates merge over ICI with one all-gather; queries
and results are replicated. Multi-host extends the same code over DCN via
`jax.distributed.initialize` (see bootstrap_distributed).
"""

from tpu_vector_db.parallel.mesh import make_device_mesh, bootstrap_distributed  # noqa: F401
from tpu_vector_db.parallel.sharded_scan import make_sharded_query_fn  # noqa: F401
from tpu_vector_db.parallel.sharded_store import ShardedVectorStore  # noqa: F401
