from .coret import CORE_T_RUNNERS, run_core_t

__all__ = ["CORE_T_RUNNERS", "run_core_t"]
