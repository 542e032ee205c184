from .validate_images import (IMAGE_RULESET, ImageValidateStage,
                              validate_images, validate_images_pipeline)

__all__ = ["IMAGE_RULESET", "ImageValidateStage", "validate_images",
           "validate_images_pipeline"]
