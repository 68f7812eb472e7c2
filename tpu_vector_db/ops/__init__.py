"""Compute kernels: distance scoring + partial top-k.

TPU-native counterpart of the reference's ``performance/mlx_optimized.py``
(mx.compile kernels, reference lines 26-156) and the store-local copies at
``service/optimized_vector_store.py:31-48``. Here there is exactly ONE kernel
module that every layer dispatches to, and top-k is a real partial top-k
(`lax.top_k` / blockwise merge), not the reference's full ``argsort``.
"""

from tpu_vector_db.ops.distance import (  # noqa: F401
    cosine_scores,
    dot_scores,
    l2_normalize,
    squared_l2_distances,
    euclidean_distances,
    pad_dim,
    pad_rows,
)
from tpu_vector_db.ops.topk import top_k, merge_topk  # noqa: F401
from tpu_vector_db.ops.scan import flat_scan_topk  # noqa: F401
from tpu_vector_db.ops.monitor import PerformanceMonitor, performance_monitor  # noqa: F401
