"""Operator and visualization signature catalogs.

Re-expresses the reference's ``tlist`` (T.py:1-178) and ``vlist``
(V.py:1-112) as typed signatures the planner matches on:
every transformation declares its output (dim, type); every chart
channel declares its required (dim, type); a T can feed a channel iff
the signatures are equal, with ``dim=None`` meaning "any arity"
(matching rule, reference search.py:104-139).
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class TSig:
    name: str
    out_dim: int | None  # None = any arity
    out_type: str  # "num" | "cat"
    kind: str  # "dm" (dimensionality-reduction/clustering) | "null" (identity)


# Core ("DM") transforms: fit over the whole (sampled) table.
# pca/tsne/mds/umap → 2 numeric components; dbscan/kmeans/lda → 1 category.
CORE_T: dict[str, TSig] = {
    "pca": TSig("pca", 2, "num", "dm"),
    "tsne": TSig("tsne", 2, "num", "dm"),
    "mds": TSig("mds", 2, "num", "dm"),
    "umap": TSig("umap", 2, "num", "dm"),
    "dbscan": TSig("dbscan", 1, "cat", "dm"),
    "kmeans": TSig("kmeans", 1, "cat", "dm"),
    "lda": TSig("lda", 1, "cat", "dm"),
}

# Null transforms: typed identity pass-throughs — "use raw column(s)
# directly as a channel" (reference T.py:118-165). null_num1 is only
# valid when the path derived at least one arithmetic column
# (reference Tengine.py:65-67).
NULL_T: dict[str, TSig] = {
    "null_num1": TSig("null_num1", 1, "num", "null"),
    "null_num": TSig("null_num", None, "num", "null"),
    "null_nom1": TSig("null_nom1", 1, "cat", "null"),
    "null_nom": TSig("null_nom", None, "cat", "null"),
}

ALL_T = {**CORE_T, **NULL_T}

# Basic-step enumeration order — fixes a canonical op order so permuted
# duplicate plans are never generated (reference T.py:188,
# searchthread.py:330-341).
BASIC_T_ORDER = ("rank", "aggr", "sum", "sub", "mul", "div")

# Arithmetic ops applicable to a column cluster when deriving new
# columns (searchthread.py:146-178): sub/div/mul need exactly 2 columns.
CLUSTER_OPS_2COL = ("sub", "div", "mul")
CLUSTER_OPS_NCOL = ("sum",)


@dataclass(frozen=True)
class VChannel:
    name: str
    dim: int | None  # None = any arity
    ctype: str | None  # "num" | "cat" | None (typeless, e.g. count_bar y)


@dataclass(frozen=True)
class VSig:
    name: str
    channels: tuple[VChannel, ...]


# Chart-type registry (reference V.py): channel → required (dim, type).
VLIST: dict[str, VSig] = {
    "num_scatter": VSig(
        "num_scatter",
        (VChannel("xy", 2, "num"), VChannel("color", 1, "num")),
    ),
    "cat_scatter": VSig(
        "cat_scatter",
        (VChannel("xy", 2, "num"), VChannel("color", 1, "cat")),
    ),
    "ord_line": VSig("ord_line", (VChannel("y", None, "num"),)),
    "ord_cat_line": VSig("ord_cat_line", (VChannel("y", 1, "cat"),)),
    "rel_line": VSig(
        "rel_line", (VChannel("x", 1, "num"), VChannel("y", None, "num"))
    ),
    "rel_cat_line": VSig(
        "rel_cat_line", (VChannel("x", 1, "num"), VChannel("y", 1, "cat"))
    ),
    "sum_bar": VSig("sum_bar", (VChannel("x", 1, "cat"), VChannel("y", None, "num"))),
    "count_bar": VSig("count_bar", (VChannel("x", 1, "cat"), VChannel("y", None, None))),
}


def t_matches_channel(sig: TSig, ch: VChannel) -> bool:
    """Signature matching rule (reference search.py:104-139,213): the T
    output must equal the channel requirement; None dims/types match any."""
    if ch.ctype is not None and sig.out_type != ch.ctype:
        return False
    if ch.dim is not None and sig.out_dim is not None and sig.out_dim != ch.dim:
        return False
    return True


def channel_candidates(vname: str) -> dict[str, list[str]]:
    """For each channel of a chart type, the T names that can feed it."""
    out: dict[str, list[str]] = {}
    for ch in VLIST[vname].channels:
        out[ch.name] = [t for t, sig in ALL_T.items() if t_matches_channel(sig, ch)]
    return out
