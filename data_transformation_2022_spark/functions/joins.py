"""Join helpers shared by the dedup/text operators.

The one pattern here — `anti_join_hot` — exists because "the hot-key
set is small" is a per-corpus empirical fact, not a structural
guarantee: on a real web corpus the segments/shingles/buckets that
exceed a document-frequency cap are precisely the boilerplate, and at
100 TB that set can be billions of distinct keys. An unconditional
``F.broadcast(hot)`` is then a driver OOM. The fix is one cheap count
of the hot side: broadcast only while its estimated size fits under
``spark.sql.autoBroadcastJoinThreshold``, else fall back to a plain
shuffle left-anti join — same rows out either way, and the shuffle key
is an 8-byte hash, never the text.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

log = logging.getLogger(__name__)

# conservative in-memory estimate for one broadcast-relation row holding
# an 8-byte key (object headers + hash-relation overhead dominate)
_BYTES_PER_HOT_ROW = 48


def _auto_broadcast_bytes(spark) -> int:
    raw = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    s = str(raw).strip().lower()
    mult = 1
    for suffix, m in (("kb", 1 << 10), ("mb", 1 << 20), ("gb", 1 << 30),
                      ("k", 1 << 10), ("m", 1 << 20), ("g", 1 << 30),
                      ("b", 1)):
        if s.endswith(suffix):
            s, mult = s[: -len(suffix)], m
            break
    try:
        return int(float(s)) * mult
    except ValueError:
        return 10 << 20


def anti_join_hot(
    df: DataFrame,
    hot: DataFrame,
    on: list[str],
    label: str = "hot-keys",
    bytes_per_row: int = _BYTES_PER_HOT_ROW,
) -> DataFrame:
    """``df LEFT ANTI JOIN hot ON on`` with a size-adaptive strategy.

    Counts ``hot`` once (one job over a keys-only aggregate — cheap
    relative to the join it guards). Under the session's
    autoBroadcastJoinThreshold the hot set is broadcast (zero shuffle of
    ``df``); above it the join degrades gracefully to a shuffle
    left-anti on the same narrow keys instead of blowing up the driver.
    Returns ``df`` untouched when the hot set is empty (no join at all).
    """
    n_hot = hot.count()
    if n_hot == 0:
        return df
    limit = _auto_broadcast_bytes(df.sparkSession)
    if n_hot * bytes_per_row <= limit:
        log.info("%s: %d hot keys -> broadcast anti-join", label, n_hot)
        return df.join(F.broadcast(hot), on, "left_anti")
    log.warning(
        "%s: %d hot keys (~%d bytes) exceed autoBroadcastJoinThreshold=%d "
        "-> shuffle anti-join", label, n_hot, n_hot * bytes_per_row, limit,
    )
    return df.join(hot, on, "left_anti")
