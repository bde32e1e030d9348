from .schedule import learning_rate
from .state import (
    TrainState,
    create_train_state,
    make_optimizer,
    make_train_step,
    make_eval_step,
    mask_backbone_grads,
)

__all__ = [
    "learning_rate",
    "TrainState",
    "create_train_state",
    "make_optimizer",
    "make_train_step",
    "make_eval_step",
    "mask_backbone_grads",
]
from .checkpoint import (
    save_checkpoint,
    load_checkpoint,
    resume_state,
    import_torch_checkpoint,
    export_torch_state_dict,
)

__all__ += [
    "save_checkpoint",
    "load_checkpoint",
    "resume_state",
    "import_torch_checkpoint",
    "export_torch_state_dict",
]
