"""Stage-launch helper shared by the stateful function stages.

Two measured pitfalls drive the default (NOTES.md #2 and the round-2
clean_corpus regression): autoscaling ``(1, N)`` actor pools never ramp
inside a short stage, and *fixed* pools reserve CPUs they cannot use when
the input has fewer blocks than actors, starving concurrent branches of
the same pipeline.

So when the caller does not pin ``concurrency``, the stage ships a
pre-constructed INSTANCE of the callable class: Ray Data runs it as plain
tasks — fully elastic, zero reserved CPUs, setup cost paid once on the
driver and shipped in the task closure.  That is correct here because
these stages' state (hash params, regexes, stopword sets) is tiny and
picklable.  An explicit int/tuple keeps the actor-pool path for genuinely
heavy state (models) or callers that know their cluster layout.
"""

from __future__ import annotations

import ray.data


def launch_stage(
    ds: ray.data.Dataset,
    cls: type,
    ctor_kwargs: dict | None = None,
    *,
    concurrency: int | tuple | None = None,
    **map_kwargs,
) -> ray.data.Dataset:
    ctor_kwargs = ctor_kwargs or {}
    if concurrency is None:
        return ds.map_batches(cls(**ctor_kwargs), **map_kwargs)
    return ds.map_batches(
        cls,
        fn_constructor_kwargs=ctor_kwargs,
        concurrency=concurrency,
        **map_kwargs,
    )
