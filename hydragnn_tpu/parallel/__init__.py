from hydragnn_tpu.parallel.mesh import (
    setup_mesh,
    setup_distributed,
    shard_batch,
    replicate_state,
    make_parallel_train_step,
)
