from gaussian_splatting_lightning_tpu.parallel.mesh import (  # noqa: F401
    init_distributed,
    make_mesh,
)
from gaussian_splatting_lightning_tpu.parallel.shard import (  # noqa: F401
    batch_cameras,
    make_sharded_train_step,
    sharded_render,
)
