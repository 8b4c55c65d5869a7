from gaussian_splatting_lightning_tpu.utils.runtime import (  # noqa: F401
    StepTimer,
    setup_compilation_cache,
    trace,
)
