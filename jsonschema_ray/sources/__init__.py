from .images import (IMAGES_ARROW_SCHEMA, GenImagesBatch, generate_images,
                     write_images_corpus, reference_ids_for)

__all__ = ["IMAGES_ARROW_SCHEMA", "GenImagesBatch", "generate_images",
           "write_images_corpus", "reference_ids_for"]
