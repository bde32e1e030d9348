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
    migrate_reference_history,
    is_torch_checkpoint,
    load_torch_file,
    load_weights,
    export_torch_checkpoint,
)

__all__ += [
    "save_checkpoint",
    "load_checkpoint",
    "resume_state",
    "import_torch_checkpoint",
    "export_torch_state_dict",
    "migrate_reference_history",
    "is_torch_checkpoint",
    "load_torch_file",
    "load_weights",
    "export_torch_checkpoint",
]
