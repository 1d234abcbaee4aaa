"""vexor_ray — a Ray-Data-native full-text (inverted index + BM25) engine.

Built from scratch on ray.data.Dataset / map_batches / groupby over zero-copy
Arrow batches; scoring semantics are rank-identical to the reference engine
(see SURVEY.md and vexor_ray.spec).
"""

__version__ = "0.1.0"

from ._malloc import tune_malloc as _tune_malloc

# Library-wide: retain large heap buffers (see _malloc.py). Every surface —
# driver pipelines, Ray map/actor workers (they import vexor_ray when
# deserializing closures), query serving — allocates multi-MB numpy arrays
# per batch, and on this sandbox's kernel each fresh mmap costs ~100 µs per
# page in first-touch faults. Opt out with VEXOR_NO_MALLOC_TUNE=1.
_tune_malloc()
