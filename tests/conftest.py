"""Test env: force CPU with 8 virtual devices BEFORE jax initializes.

Multi-chip sharding tests run on this virtual mesh (the driver separately
dry-runs the multi-chip path); numerical parity tests run in float64-capable
CPU float32. Real-TPU benchmarking lives in bench.py, not pytest.
"""

import os
import sys

# Force CPU: the session env pins JAX_PLATFORMS to the (single, tunneled) TPU
# chip, which unit tests must not consume. setdefault is NOT enough.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("PALLAS_AXON_POOL_IPS", None)

# The container's sitecustomize registers the remote-TPU ("axon") PJRT plugin
# in every interpreter; its backend init dials the tunnel and costs 10-80s per
# process even under JAX_PLATFORMS=cpu. Deregister the factory before any
# backend is initialized so tests stay local and fast.
try:
    import jax
    import jax._src.xla_bridge as _xb

    _xb._backend_factories.pop("axon", None)
    # sitecustomize imported jax before this env was in place, so the config
    # already latched platform "axon"; update it in-process.
    jax.config.update("jax_platforms", "cpu")
except Exception:
    pass
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
