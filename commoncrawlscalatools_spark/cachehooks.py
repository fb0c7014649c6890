"""Lifetime management for operator-internal ``persist()`` calls.

Library operators persist intermediates that their RETURNED (lazy)
DataFrame depends on — the cache must live until the caller's terminal
action, which the operator never sees. Tying the cache entries to the
Python lifetime of the returned DataFrame gives exactly that window: a
driver that composes many operator calls releases each call's blocks as
soon as it drops the result (VERDICT r5 nit #4 / ADVICE r5 #2).

Mechanics: ``own_caches(owner, cached=…)`` registers a ``weakref.finalize``
on the returned DataFrame that unpersists the intermediates' JVM Datasets.
Only the py4j handles (``_jdf``) are captured — never the Python
DataFrames — so the finalizer cannot keep its own referent alive.
``adopt_from=`` transfers ownership upward through compositions
(``minhash_dedup_cc`` adopts ``with_shingles``'s caches, so they survive
until the composed result dies, not until the intermediate local does).

``localCheckpoint`` blocks need no hook: they are released by Spark's
ContextCleaner once the JVM Dataset is unreachable, which py4j's own
finalization already drives.
"""

from __future__ import annotations

import weakref

from pyspark.sql import DataFrame

_FIN_ATTR = "_ccst_cache_fin"


def _release(jdfs: list) -> None:
    for j in jdfs:
        try:
            j.unpersist(False)
        except Exception:
            # JVM gone (interpreter shutdown / stopped context) — nothing
            # left to release.
            pass


def own_caches(
    owner: DataFrame,
    cached: tuple[DataFrame, ...] = (),
    adopt_from: tuple[DataFrame, ...] = (),
) -> DataFrame:
    """Unpersist every DataFrame in `cached` (and every cache previously
    owned by a DataFrame in `adopt_from`) when `owner` is garbage-collected.

    `owner` itself may appear in `cached` (self-owning persisted results):
    only its JVM handle is captured, so the finalizer still fires.
    Returns `owner` for call-site chaining."""
    jdfs = [d._jdf for d in cached]
    for d in adopt_from:
        fin = getattr(d, _FIN_ATTR, None)
        if fin is not None and fin.alive:
            _, _, args, _ = fin.detach()
            jdfs.extend(args[0])
    if jdfs:
        prev = getattr(owner, _FIN_ATTR, None)
        if prev is not None and prev.alive:
            _, _, args, _ = prev.detach()
            jdfs.extend(args[0])
        setattr(owner, _FIN_ATTR, weakref.finalize(owner, _release, jdfs))
    return owner
