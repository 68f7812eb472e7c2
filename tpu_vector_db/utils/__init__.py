"""Shared helpers (counterpart of the reference's ``utils.py:17-41``)."""

from tpu_vector_db.utils.fs import (  # noqa: F401
    ensure_directory,
    atomic_write_bytes,
    atomic_save_npz,
    FileLock,
)
from tpu_vector_db.utils.validation import validate_vector_shape  # noqa: F401
