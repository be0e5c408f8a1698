"""Host-side utilities: image IO, EXIF, thumbnails, burst/duplicate grouping."""

from facet_tpu.utils.image_loading import load_image, load_image_rgb, SUPPORTED_EXTENSIONS
from facet_tpu.utils.embedding import bytes_to_embedding, embedding_to_bytes
from facet_tpu.utils.tags import tags_to_string, string_to_tags

__all__ = [
    "load_image",
    "load_image_rgb",
    "SUPPORTED_EXTENSIONS",
    "bytes_to_embedding",
    "embedding_to_bytes",
    "tags_to_string",
    "string_to_tags",
]
