from .catalog import CORE_T, NULL_T, VLIST, TSig, VChannel
from .load import OP_COST, Load, cal_load
from .search import Candidate, enumerate_tpaths

__all__ = [
    "CORE_T",
    "NULL_T",
    "VLIST",
    "TSig",
    "VChannel",
    "OP_COST",
    "Load",
    "cal_load",
    "Candidate",
    "enumerate_tpaths",
]
