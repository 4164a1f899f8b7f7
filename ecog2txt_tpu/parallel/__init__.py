"""Device-mesh parallelism: sharding rules + distributed train steps."""

from .mesh import (  # noqa: F401
    make_mesh,
    replicate,
    batch_sharding,
    shard_params_tp,
    make_dp_train_step,
)
from .expert import (  # noqa: F401
    ep_spec,
    shard_params_ep,
)
from .multihost import (  # noqa: F401
    initialize_distributed,
    make_global,
)
from .sequence import (  # noqa: F401
    halo_steps,
    receptive_field_steps,
    sequence_parallel_encode,
)
from .pipeline import (  # noqa: F401
    pipeline_conformer_encode,
    stack_block_params,
)
from .sp_pp import (  # noqa: F401
    sp_pp_conformer_encode,
)
