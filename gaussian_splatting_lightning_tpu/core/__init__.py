from gaussian_splatting_lightning_tpu.core import camera, sh, transforms  # noqa: F401
from gaussian_splatting_lightning_tpu.core.camera import Camera  # noqa: F401
