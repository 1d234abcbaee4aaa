"""Deterministic, process-stable hashes for shuffle keys and fingerprints.

Python's builtin ``hash`` is salted per process and MUST NOT be used for any
partitioning decision.  Term → wave assignment uses pandas' vectorized
siphash (fixed key), which is stable across processes and recorded in the
manifest as the partitioner identity.
"""

from __future__ import annotations

import hashlib
import json
from pathlib import Path

import numpy as np
import pandas as pd

TERM_HASHER_ID = "pandas-siphash13-v1"


def hash_terms(terms: np.ndarray) -> np.ndarray:
    """Vectorized uint64 hash of a string array (deterministic)."""
    return pd.util.hash_array(np.asarray(terms, dtype=object), categorize=False)


def term_wave(terms: np.ndarray, num_waves: int) -> np.ndarray:
    return hash_terms(terms) % np.uint64(num_waves)


def file_fingerprint(paths: list[str | Path]) -> str:
    """Cheap input fingerprint: sha1 over (name, size, mtime_ns) per file."""
    h = hashlib.sha1()
    for p in sorted(str(p) for p in paths):
        st = Path(p).stat()
        h.update(json.dumps([Path(p).name, st.st_size, st.st_mtime_ns]).encode())
    return h.hexdigest()
