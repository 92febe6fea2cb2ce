from transformer4sed_tpu.train.optim import (
    ParamGroupConfig,
    build_optimizer,
    label_params,
    child_tuning,
)
from transformer4sed_tpu.train.mean_teacher import (
    MeanTeacherConfig,
    MeanTeacherState,
    create_mean_teacher_state,
    make_mean_teacher_step,
)
from transformer4sed_tpu.train.mlm import make_mlm_step, mlm_loss

__all__ = [
    "ParamGroupConfig",
    "build_optimizer",
    "label_params",
    "child_tuning",
    "MeanTeacherConfig",
    "MeanTeacherState",
    "create_mean_teacher_state",
    "make_mean_teacher_step",
    "make_mlm_step",
    "mlm_loss",
]
