"""Deferred-release persist registry for lazy query plans.

A query builder that ``persist()``s an intermediate cannot unpersist it
before returning — the returned plan is lazy, so the cached blocks must
outlive the call. But holding every call's intermediates for the session
lifetime is a leak when the same builder runs repeatedly (bench reps,
batch query loops — ADVICE r1 flagged exactly this shape for
``incremental_update``'s delta persist).

Protocol: a builder calls ``begin(tag)`` once on entry (releasing the
PREVIOUS call's cached intermediates), then ``hold(tag, df)`` for each
intermediate it persists. At any moment at most one generation of
intermediates per builder is cached — enough for the last returned plan
to stay valid, bounded over any number of calls.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_HELD: dict[str, list[DataFrame]] = {}


def begin(tag: str) -> None:
    """Start a new generation for ``tag``: release the previous one."""
    for df in _HELD.pop(tag, []):
        try:
            df.unpersist()
        except Exception:
            pass  # session already stopped
    _HELD[tag] = []


def hold(tag: str, df: DataFrame) -> DataFrame:
    """Persist ``df`` and keep it alive until the tag's next ``begin``."""
    df = df.persist()
    _HELD.setdefault(tag, []).append(df)
    return df
