from .multimodal import (extract_audio_features, extract_image_features,
                         resize_images, sample_video_frames,
                         score_image_quality)
from .stats import ColumnStatsStage, column_stats, merge_stat_partials
from .validate import ValidatorStage, annotate_dataset, validate_dataset

__all__ = ["ValidatorStage", "validate_dataset", "annotate_dataset",
           "column_stats", "ColumnStatsStage", "merge_stat_partials",
           "resize_images", "extract_image_features",
           "sample_video_frames", "extract_audio_features",
           "score_image_quality"]
