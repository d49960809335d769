from mdvit_tpu.parallel.context import (  # noqa: F401
    halo_exchange_rows,
    stage_apply_context_parallel,
)
from mdvit_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    constrain_batch,
    make_mesh,
    replicated,
)
