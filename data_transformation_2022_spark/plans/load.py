"""Plan cost model and dominance (Pareto) order.

Re-expresses the reference's ``cal_load`` static cost table (L.py:1-12)
and the three-axis ``Load`` partial order (L.py:15-32) used to prune the
transformation-path search: a candidate is cut when another candidate is
no worse on every axis and strictly better on at least one.

Axes (searchthread.py:363-369):
  * compute  — Σ static op cost × #input columns
  * dim_dist — mean pairwise distribution (Wasserstein) distance of the
               columns the path touches (prefer comparable columns)
  * sem_dist — mean pairwise header-name distance (prefer semantically
               related columns). The reference uses word2vec cosine; we
               use a token/LCS name distance (no external model needed).
"""

from __future__ import annotations

from dataclasses import dataclass

# Static per-op cost units (reference L.py:1-12).
OP_COST: dict[str, float] = {
    "sum": 10.0,
    "sub": 10.0,
    "mul": 50.0,
    "div": 40.0,
    "rank": 5.0,
    "del": 1.0,
    "select": 1.0,
    "astype": 2.0,
    "aggr": 100.0,
    "order": 10.0,
    "nominalize": 5.0,
}


def cal_load(op: str, n_cols: int = 1) -> float:
    """Static compute cost of one step, scaled by the number of input
    columns (reference scales by cluster size, searchthread.py:369)."""
    return OP_COST.get(op, 1.0) * max(1, n_cols)


@dataclass(frozen=True)
class Load:
    compute: float
    dim_dist: float
    sem_dist: float

    def dominates(self, other: "Load") -> bool:
        """True iff self is ≤ other on all axes and < on at least one
        (the reference's partial order, L.py:15-32)."""
        le = (
            self.compute <= other.compute
            and self.dim_dist <= other.dim_dist
            and self.sem_dist <= other.sem_dist
        )
        lt = (
            self.compute < other.compute
            or self.dim_dist < other.dim_dist
            or self.sem_dist < other.sem_dist
        )
        return le and lt

    def __add__(self, other: "Load") -> "Load":
        return Load(
            self.compute + other.compute,
            self.dim_dist + other.dim_dist,
            self.sem_dist + other.sem_dist,
        )


def prune_dominated(items: list[tuple[Load, object]]) -> list[tuple[Load, object]]:
    """Keep only non-dominated (load, payload) pairs — the in-layer prune
    (reference pruneControlledNodes, searchthread.py:546-558)."""
    keep: list[tuple[Load, object]] = []
    for load, payload in items:
        if any(other.dominates(load) for other, _ in items if other is not load):
            continue
        keep.append((load, payload))
    return keep
