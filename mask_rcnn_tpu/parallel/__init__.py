from mask_rcnn_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    local_batch_slice,
    make_mesh,
    make_parallel_predict_step,
    make_parallel_train_step,
    process_zero,
    replicated,
    shard_batch,
)
