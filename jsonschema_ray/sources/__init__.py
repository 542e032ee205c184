from .images import (IMAGES_ARROW_SCHEMA, GenImagesBatch, generate_images,
                     reference_ids_for, write_images_corpus)
from .tables import read_table, write_table

__all__ = ["IMAGES_ARROW_SCHEMA", "GenImagesBatch", "generate_images",
           "write_images_corpus", "reference_ids_for",
           "read_table", "write_table"]
