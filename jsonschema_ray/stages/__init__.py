from .validate import ValidatorStage, validate_dataset, annotate_dataset
from .stats import column_stats, ColumnStatsStage, merge_stat_partials

__all__ = ["ValidatorStage", "validate_dataset", "annotate_dataset",
           "column_stats", "ColumnStatsStage", "merge_stat_partials"]
