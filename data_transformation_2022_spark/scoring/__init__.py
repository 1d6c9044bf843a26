from .insight import (
    SLIST_DEFAULT,
    cdm_score,
    hist2d_counts,
    moments,
    scagnostics,
    sig_correlation,
    sig_linearness,
    sig_outstanding1,
)

__all__ = [
    "SLIST_DEFAULT",
    "cdm_score",
    "hist2d_counts",
    "moments",
    "scagnostics",
    "sig_correlation",
    "sig_linearness",
    "sig_outstanding1",
]
