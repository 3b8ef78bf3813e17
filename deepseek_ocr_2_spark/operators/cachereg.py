"""Cache lifecycle registry for persisted intermediates.

Several operators persist intermediates that feed two downstream
consumers (posting lists, LSH band keys, signature tables) — without
persist the expensive kernel stage runs once per consumer, but a
long-lived session accumulates MEMORY_AND_DISK blocks if nothing ever
unpersists them (ADVICE r01).  Queries cannot unpersist before they
return (they are lazy — the cache must survive until the caller's
action runs), so lifecycle belongs to the caller:

    from deepseek_ocr_2_spark.operators.cachereg import release_caches
    df = minhash_lsh_dedup(spark, sf_dir)
    df.collect()          # action consumes the caches
    release_caches()      # then drop every registered block

``release_caches()`` is idempotent and safe mid-stream: Spark's
unpersist is non-blocking and recomputes if a released block is read
again (correctness is never at stake — only the single-computation
guarantee).
"""

from __future__ import annotations

from typing import List

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel

_LIVE: List[DataFrame] = []


def persist_tracked(
    df: DataFrame, level: StorageLevel = StorageLevel.MEMORY_AND_DISK
) -> DataFrame:
    """persist() + register for later release_caches()."""
    df = df.persist(level)
    _LIVE.append(df)
    return df


def release_caches() -> int:
    """Unpersist every tracked intermediate; returns how many."""
    n = 0
    while _LIVE:
        _LIVE.pop().unpersist()
        n += 1
    return n
