from gaussian_splatting_lightning_tpu.ops.common import (  # noqa: F401
    BLOCK_X,
    BLOCK_Y,
    Preprocessed,
    RenderOutput,
    preprocess,
)
from gaussian_splatting_lightning_tpu.ops.rasterize_reference import (  # noqa: F401
    mark_visible,
    rasterize_reference,
)
from gaussian_splatting_lightning_tpu.ops.rasterize_tiled import (  # noqa: F401
    TilingConfig,
    rasterize_tiled,
)
from gaussian_splatting_lightning_tpu.ops.rasterize_pallas import (  # noqa: F401
    rasterize_pallas,
)
from gaussian_splatting_lightning_tpu.ops.ssim import psnr, ssim  # noqa: F401
