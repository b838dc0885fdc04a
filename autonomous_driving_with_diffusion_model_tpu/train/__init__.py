from .checkpoint import (
    export_torch_checkpoint,
    import_torch_checkpoint,
    load_eval_variables,
    restore_orbax,
    save_orbax,
    wait_for_checkpoints,
)
from .ema import EmaConfig, EmaState, ema_decay_for_step, ema_init, ema_update
from .state import TrainState, create_train_state, make_lr_schedule, make_train_step

__all__ = [
    "TrainState",
    "create_train_state",
    "make_train_step",
    "make_lr_schedule",
    "EmaConfig",
    "EmaState",
    "ema_init",
    "ema_update",
    "ema_decay_for_step",
    "save_orbax",
    "wait_for_checkpoints",
    "restore_orbax",
    "export_torch_checkpoint",
    "import_torch_checkpoint",
    "load_eval_variables",
]
