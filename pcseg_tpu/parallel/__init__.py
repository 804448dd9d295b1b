from pcseg_tpu.parallel.mesh import (
    MeshSpec,
    make_mesh,
    batch_sharding,
    replicated_sharding,
    shard_batch,
    psum_mean,
    initialize_distributed,
)
from pcseg_tpu.parallel.sp import make_sp_forward
from pcseg_tpu.parallel.tp import (
    create_tp_train_state,
    make_tp_forward,
    make_tp_train_step,
)
