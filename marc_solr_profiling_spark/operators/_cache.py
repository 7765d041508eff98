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

CONTRACT: at most ONE outstanding lazy plan per tag stays cached — a
caller that holds plan A, calls the same builder again (new generation),
and then executes A gets a silent full recompute of A's intermediates,
not wrong results. Builders that run concurrent driver threads
(plans/build.py commits stages from a thread) are safe: the registry is
lock-guarded, and generation turnover is per-tag.
"""

from __future__ import annotations

import threading

from pyspark.sql import DataFrame

_LOCK = threading.Lock()
_HELD: dict[str, list[DataFrame]] = {}


def begin(tag: str) -> None:
    """Start a new generation for ``tag``: release the previous one."""
    with _LOCK:
        prev = _HELD.pop(tag, [])
        _HELD[tag] = []
    for df in prev:
        try:
            df.unpersist()
        except Exception:
            pass  # session already stopped


def hold(tag: str, df: DataFrame) -> DataFrame:
    """Persist ``df`` and keep it alive until the tag's next ``begin``."""
    df = df.persist()
    with _LOCK:
        _HELD.setdefault(tag, []).append(df)
    return df
