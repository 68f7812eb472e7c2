"""Vector store layer: device-resident matrix + host metadata + persistence.

TPU-native counterpart of the reference's
``service/optimized_vector_store.py`` (MLXVectorStore / MLXVectorStoreConfig /
create_optimized_vector_store, lines 51-246).
"""

from tpu_vector_db.store.config import VectorStoreConfig  # noqa: F401
from tpu_vector_db.store.vector_store import TPUVectorStore, create_vector_store  # noqa: F401
