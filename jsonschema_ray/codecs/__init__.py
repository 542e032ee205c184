from .images import (decode_image, encode_image, sniff_format, average_hash,
                     ImageDecodeError)

__all__ = ["decode_image", "encode_image", "sniff_format", "average_hash",
           "ImageDecodeError"]
