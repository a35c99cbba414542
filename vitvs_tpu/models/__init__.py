from vitvs_tpu.models.vit import ViTConfig, ViTParams, init_vit, vit_features, vit_forward
from vitvs_tpu.models.extractor import DescriptorExtractor, extract_descriptors, log_bin

__all__ = [
    "ViTConfig",
    "ViTParams",
    "init_vit",
    "vit_features",
    "vit_forward",
    "DescriptorExtractor",
    "extract_descriptors",
    "log_bin",
]
