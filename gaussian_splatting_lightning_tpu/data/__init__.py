from gaussian_splatting_lightning_tpu.data import colmap  # noqa: F401
from gaussian_splatting_lightning_tpu.data.colmap import (  # noqa: F401
    Reconstruction,
    get_nerf_norm,
    read_reconstruction,
)
from gaussian_splatting_lightning_tpu.data.dataset import (  # noqa: F401
    ColmapDataset,
    ViewItem,
    ViewSampler,
)
