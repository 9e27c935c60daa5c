from vit_colmap_tpu.features.base_extractor import BaseExtractor, list_images
from vit_colmap_tpu.features.dummy_extractor import DummyExtractor

__all__ = ["BaseExtractor", "DummyExtractor", "list_images"]
