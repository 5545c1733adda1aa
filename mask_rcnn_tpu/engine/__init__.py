from mask_rcnn_tpu.engine.trainer import (  # noqa: F401
    TrainState,
    create_train_state,
    make_optimizer,
    make_train_step,
    step_lr_schedule,
    trainable_mask,
)
