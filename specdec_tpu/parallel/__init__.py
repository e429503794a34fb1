from specdec_tpu.parallel.mesh import (
    build_mesh,
    param_pspecs,
    cache_pspec,
    shard_params,
    shard_cache,
    batch_state_pspecs,
)
