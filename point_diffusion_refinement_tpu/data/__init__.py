from .augment import augment_cloud
from .mirror import mirror_and_concat, generate_mirrored_partials
from .mvp import MVPDataset, MVPDatasetConfig, iterate_batches, VIEWS_PER_SHAPE
from .synthetic import make_synthetic_clouds, write_mvp_style_h5

__all__ = [
    "augment_cloud",
    "mirror_and_concat",
    "generate_mirrored_partials",
    "MVPDataset",
    "MVPDatasetConfig",
    "iterate_batches",
    "VIEWS_PER_SHAPE",
    "make_synthetic_clouds",
    "write_mvp_style_h5",
]
