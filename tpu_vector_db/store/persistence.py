"""Store persistence: vectors.npz + metadata.jsonl + manifest.json.

Same on-disk contract as the reference (``_save_store``/``_load_store``,
service/optimized_vector_store.py:218-239: mx.savez vectors + one-JSON-per-line
metadata; corrupt files fall back to an empty store) with two fixes the survey
called out: every file is written atomically (tmp + os.replace) and a manifest
records config + count + format version so loads can detect mismatches instead
of silently mis-shaping.
"""

from __future__ import annotations

import json
import logging
from pathlib import Path

import numpy as np

from tpu_vector_db.store.config import VectorStoreConfig
from tpu_vector_db.utils.fs import atomic_save_npz, atomic_write_bytes, ensure_directory

logger = logging.getLogger(__name__)

FORMAT_VERSION = 1
VECTORS_FILE = "vectors.npz"
METADATA_FILE = "metadata.jsonl"
MANIFEST_FILE = "manifest.json"


def save_store(path: str | Path, vectors: np.ndarray, metadata: list[dict],
               config: VectorStoreConfig) -> None:
    """Atomically persist the full store state. ``vectors`` is (count, d) f32."""
    p = ensure_directory(path)
    atomic_save_npz(p / VECTORS_FILE, vectors=vectors.astype(np.float32))
    lines = "\n".join(json.dumps(m, ensure_ascii=False) for m in metadata)
    atomic_write_bytes(p / METADATA_FILE, (lines + "\n" if lines else "").encode())
    manifest = {
        "format_version": FORMAT_VERSION,
        "count": int(vectors.shape[0]),
        "dimension": int(config.dimension),
        "config": config.to_dict(),
    }
    atomic_write_bytes(p / MANIFEST_FILE, json.dumps(manifest, indent=2).encode())


def load_store(path: str | Path, config: VectorStoreConfig):
    """Load (vectors, metadata) or (None, None) if absent/corrupt.

    Corruption tolerance matches the reference (fall back to empty,
    optimized_vector_store.py:237-239) but logs loudly instead of passing.
    """
    p = Path(path)
    vf, mf = p / VECTORS_FILE, p / METADATA_FILE
    if not vf.exists():
        return None, None
    try:
        with np.load(vf) as z:
            vectors = np.asarray(z["vectors"], dtype=np.float32)
        if vectors.ndim != 2 or vectors.shape[1] != config.dimension:
            raise ValueError(
                f"persisted dimension {vectors.shape} != config "
                f"{config.dimension}")
        metadata: list[dict] = []
        if mf.exists():
            with open(mf, "r", encoding="utf-8") as f:
                for line in f:
                    line = line.strip()
                    if line:
                        metadata.append(json.loads(line))
        if len(metadata) < vectors.shape[0]:
            metadata.extend({} for _ in range(vectors.shape[0] - len(metadata)))
        elif len(metadata) > vectors.shape[0]:
            metadata = metadata[: vectors.shape[0]]
        return vectors, metadata
    except Exception:  # noqa: BLE001 — any corruption -> empty store
        logger.exception("corrupt store at %s; starting empty", p)
        return None, None
