from .uniqueness import duplicate_keys, unique_violations
from .referential import referential_violations, broadcast_semi_join
from .neardup import phash_near_duplicates
from .drift import ks_statistic, psi, drift_report, exact_ks, \
    chi2_contingency, psi_exact

__all__ = [
    "duplicate_keys", "unique_violations",
    "referential_violations", "broadcast_semi_join",
    "phash_near_duplicates",
    "ks_statistic", "psi", "drift_report", "exact_ks", "chi2_contingency",
    "psi_exact",
]
