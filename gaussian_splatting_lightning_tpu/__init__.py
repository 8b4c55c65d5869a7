"""TPU-native 3D Gaussian Splatting framework (JAX / XLA / Pallas).

A ground-up re-design of the capabilities of
``pomelyu/gaussian_splatting_lightning`` (reference mounted at
``/root/reference``) for TPU hardware:

- ``core``      pure-jnp splatting math (SH, EWA projection, cameras)
- ``ops``       rasterizers (jnp oracle, tiled XLA, Pallas kernels), SSIM, KNN
- ``models``    the GaussianScene padded-capacity pytree + PLY interchange
- ``data``      COLMAP parsing and view datasets (no pycolmap dependency)
- ``training``  optax loop, schedules, densification, checkpointing
- ``parallel``  device-mesh sharding (tile/view parallel) over ICI/DCN
"""

__version__ = "0.1.0"

from gaussian_splatting_lightning_tpu import core  # noqa: F401
