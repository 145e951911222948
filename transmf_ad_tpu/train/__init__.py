"""Training layer: engine, jitted steps, optimizers, metrics, checkpoints,
trainer, k-fold/hold-out drivers."""

from . import checkpoint  # noqa: F401
from .engine import Engine, Events  # noqa: F401
from .kfold import partition_dataset, run_holdout, run_kfold, task_seed  # noqa: F401
from .metrics import (  # noqa: F401
    MetricState,
    confusion_metrics,
    roc_auc,
    streaming_auc_init,
    streaming_auc_result,
    streaming_auc_update,
)
from .optim import build_optimizer, multistep_schedule  # noqa: F401
from .steps import TrainState, create_state, make_eval_step, make_train_step  # noqa: F401
from .trainer import Trainer, TrainerConfig  # noqa: F401
