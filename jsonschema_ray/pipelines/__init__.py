from .validate_images import (IMAGE_RULESET, ImageValidateStage,
                              flagship_report, validate_images,
                              validate_images_pipeline)

__all__ = ["IMAGE_RULESET", "ImageValidateStage", "flagship_report",
           "validate_images", "validate_images_pipeline"]
