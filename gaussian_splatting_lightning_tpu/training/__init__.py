from gaussian_splatting_lightning_tpu.training.densify import (  # noqa: F401
    DensifyConfig,
    accumulate_stats,
    densify_and_prune,
)
from gaussian_splatting_lightning_tpu.training.loss import (  # noqa: F401
    l1_loss,
    photometric_loss,
)
from gaussian_splatting_lightning_tpu.training.optimizer import (  # noqa: F401
    AdamState,
    OptimizerConfig,
    adam_update,
    init_adam,
    make_lr_schedules,
)
from gaussian_splatting_lightning_tpu.training.schedule import (  # noqa: F401
    constant_schedule,
    warmup_exp_decay_schedule,
)
from gaussian_splatting_lightning_tpu.training.trainer import (  # noqa: F401
    TrainConfig,
    Trainer,
    make_eval_step,
    make_train_step,
    render_scene,
)
