"""Entry-scoped persist lifecycle, shared by catalog entries and the
operators they call.

Catalog entries return lazily, so they cannot unpersist their own caches
after the result is consumed.  Drivers (the correctness gate, bench.py,
the crawl round loop) run units of work sequentially — build,
materialize, move on — so the start of the NEXT unit is the point at
which everything the previous unit pinned can be released.  Operators
that persist intermediates whose useful life extends past their own
return (e.g. ``global_sequence``'s ranked partials, which the caller's
action consumes) register them here instead of calling ``.persist()``
bare; ``release()`` drops everything registered since the last release.

Unpersist is safe even for a still-pending DataFrame: Spark simply
recomputes it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_TRACKED: list[DataFrame] = []


def track(df: DataFrame) -> DataFrame:
    """Persist ``df`` and register it for the next :func:`release`."""
    _TRACKED.append(df.persist())
    return df


def release() -> None:
    """Unpersist everything tracked since the last release."""
    while _TRACKED:
        _TRACKED.pop().unpersist()
