"""Pure-Python single-process oracle for rank-identity testing."""

from . import bm25, textnorm  # noqa: F401
from .oracle import OracleIndex, build_oracle_index, search  # noqa: F401
