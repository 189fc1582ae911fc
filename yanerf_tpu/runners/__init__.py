from .apis import (
    eval_one_epoch,
    inference,
    make_eval_step,
    make_train_step,
    make_train_step_fused,
    prepare_batch,
    train_one_epoch,
)
from .checkpoints import (
    PreemptionGuard,
    ckpt_name,
    find_best_checkpoint,
    find_latest_checkpoint,
    export_torch_checkpoint,
    import_torch_checkpoint,
    load_checkpoint,
    save_checkpoint,
    wait_for_async_saves,
)
from .hooks import HOOKS, EvalDataHook, EvalOutputsHook, TrainDataHook, TrainOutputsHook
from .optim import TrainState, create_optimizer, create_train_state, path_to_dotted
from .schedules import cosine_schedule, create_lr_schedule, exponential_schedule, with_warmup
from .stats import create_stats
from .vis import RunType, to_img, vis_batch_img

__all__ = [
    "eval_one_epoch",
    "inference",
    "make_eval_step",
    "make_train_step",
    "make_train_step_fused",
    "prepare_batch",
    "train_one_epoch",
    "ckpt_name",
    "find_best_checkpoint",
    "find_latest_checkpoint",
    "PreemptionGuard",
    "wait_for_async_saves",
    "export_torch_checkpoint",
    "import_torch_checkpoint",
    "load_checkpoint",
    "save_checkpoint",
    "HOOKS",
    "EvalDataHook",
    "EvalOutputsHook",
    "TrainDataHook",
    "TrainOutputsHook",
    "TrainState",
    "create_optimizer",
    "create_train_state",
    "path_to_dotted",
    "cosine_schedule",
    "create_lr_schedule",
    "exponential_schedule",
    "with_warmup",
    "create_stats",
    "RunType",
    "to_img",
    "vis_batch_img",
]
