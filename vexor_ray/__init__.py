"""vexor_ray — a Ray-Data-native full-text (inverted index + BM25) engine.

Built from scratch on ray.data.Dataset / map_batches / groupby over zero-copy
Arrow batches; scoring semantics are rank-identical to the reference engine
(see SURVEY.md and vexor_ray.spec).
"""

__version__ = "0.1.0"
