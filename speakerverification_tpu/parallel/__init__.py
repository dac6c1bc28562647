from speakerverification_tpu.parallel.mesh import make_mesh  # noqa: F401
from speakerverification_tpu.parallel.dp import (  # noqa: F401
    make_dp_train_step,
    replicate_state,
    shard_batch,
)
from speakerverification_tpu.parallel.tp import (  # noqa: F401
    make_dp_tp_train_step,
    shard_state_tp,
    shard_state_tp_global,
    tp_state_specs,
)
from speakerverification_tpu.parallel.multihost import (  # noqa: F401
    global_batch,
    is_multiprocess,
    maybe_initialize_distributed,
    process_allgather,
    replicate_global,
)
