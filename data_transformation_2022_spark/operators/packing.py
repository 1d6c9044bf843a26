"""Sequence packing: assign documents to fixed-token-budget packs — the
pretraining data-prep step that concatenates documents in a canonical
order and cuts the stream every ``budget`` tokens.

A document belongs to the pack where it STARTS (offset = exclusive
prefix sum of token counts in ``order_by`` order), which is the
deterministic, shuffle-friendly formulation: the assignment is a pure
function of the prefix sum, and the prefix sum comes from
``functions.order.global_running_sum`` — bucketed, never a
single-reducer window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.order import global_running_sum


def pack_sequences(
    df: DataFrame,
    id_col: str,
    text_col: str,
    budget: int = 2048,
) -> DataFrame:
    """Per-document pack assignment: (id_col, n_tokens, pack_id).

    Tokens are whitespace tokens (the engine's base tokenization);
    ``pack_id = floor(start_offset / budget)`` where ``start_offset``
    is the exclusive running sum of token counts ordered by ``id_col``.
    """
    toks = df.select(
        F.col(id_col), F.size(F.split(F.col(text_col), " ")).alias("n_tokens")
    )
    # Materialize the (id, n_tokens) proxy once (r14): the prefix sum
    # downstream is THREE actions (quantile boundaries, per-bucket sums,
    # the final window pass), and each one would otherwise re-execute
    # this operator's full input lineage — for the corpus-build pipeline
    # that is three scans of the document text (plus the dedup join) to
    # move ~16 bytes/doc of metadata. Guide §8: decide on the
    # lightweight proxy, touch the heavy payload once. Values are
    # unchanged (the checkpoint executes the same plan; pack oracles
    # stay hash-exact); SPARK_GRAFT_CHECKPOINT_DIR upgrades it to a
    # reliable checkpoint on a fleet, like every iterative operator.
    from ..session import iter_checkpoint

    toks = iter_checkpoint(toks)
    summed = global_running_sum(toks, [id_col], "n_tokens", "__cum")
    return summed.select(
        F.col(id_col),
        F.col("n_tokens"),
        F.floor((F.col("__cum") - F.col("n_tokens")) / budget)
        .cast("bigint")
        .alias("pack_id"),
    )


def pack_stats(packed: DataFrame) -> DataFrame:
    """Aggregate view of a packing: (pack_id, n_docs, pack_tokens)."""
    return packed.groupBy("pack_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("pack_tokens"),
    )
