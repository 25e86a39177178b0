"""Async query execution — reference operator R5.

The reference submits queries non-blocking and joins later:
``session.execute_async(...)`` → ``future.result()``
(``server.py:98-101``, ``149-152``, ``217-220``). Spark actions block
per job, so the engine-level equivalent is job submission on a pool
thread returning a ``Future`` — same call shape, same join point.

Spark schedules jobs from different threads concurrently (FIFO across
job pools by default), so two ``execute_async`` queries genuinely
overlap on the cluster, exactly like two in-flight CQL queries.
"""

from __future__ import annotations

from collections.abc import Callable
from concurrent.futures import Future, ThreadPoolExecutor

from pyspark.sql import DataFrame

_POOL = ThreadPoolExecutor(max_workers=8, thread_name_prefix="cs-async")


def execute_async(
    df: DataFrame, action: Callable[[DataFrame], object] | None = None
) -> Future:
    """Run an action on ``df`` in a pool thread; returns a Future.

    Default action collects row dicts (the reference handlers' row →
    dict materialization, R6, ``server.py:107-113``). Pass a different
    ``action`` (e.g. ``lambda d: d.count()`` or a write) to change it.

    >>> fut = execute_async(users.filter(...))   # doctest: +SKIP
    >>> rows = fut.result()                      # blocks, like server.py:101
    """
    act = action or (lambda d: [r.asDict() for r in d.collect()])
    return _POOL.submit(act, df)
