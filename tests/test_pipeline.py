"""Pipeline parallelism: the GPipe stage-sharded forward must be
logit-identical to the single-device forward on the virtual mesh."""
import numpy as np
import jax
import jax.numpy as jnp

from specdec_tpu.core.config import tiny_config
from specdec_tpu.core.model import forward_full, init_params
from specdec_tpu.parallel.pipeline import (
    STAGE_AXIS, build_pipeline_mesh, pipeline_forward_full,
    shard_params_pipeline,
)

CFG = tiny_config(vocab_size=64, num_layers=4, hidden_size=64,
                  intermediate_size=128, num_heads=8, num_kv_heads=4,
                  head_dim=8)
PARAMS = init_params(CFG, jax.random.key(0), scale=0.3)
RNG = np.random.default_rng(0)


def test_pipeline_forward_matches_single_device():
    tokens = jnp.asarray(RNG.integers(0, 64, size=(8, 12)).astype(np.int32))
    base = np.asarray(forward_full(CFG, PARAMS, tokens))

    mesh = build_pipeline_mesh(jax.devices(), stages=4)
    sharded = shard_params_pipeline(PARAMS, CFG, mesh)
    # layers really are stage-sharded: each device holds L/4 layers
    shapes = {s.data.shape for s in sharded["layers"]["wq"].addressable_shards}
    assert shapes == {(1, CFG.hidden_size, CFG.num_heads * CFG.head_dim)}

    for m in (1, 2, 4):   # microbatch counts incl. the degenerate M=1
        out = np.asarray(pipeline_forward_full(CFG, sharded, tokens, mesh,
                                               num_microbatches=m))
        np.testing.assert_allclose(out, base, rtol=2e-4, atol=2e-4)


def test_pipeline_two_stages_gqa():
    cfg = CFG.replace(num_layers=2)
    params = init_params(cfg, jax.random.key(1), scale=0.3)
    tokens = jnp.asarray(RNG.integers(0, 64, size=(4, 9)).astype(np.int32))
    base = np.asarray(forward_full(cfg, params, tokens))
    mesh = build_pipeline_mesh(jax.devices()[:2], stages=2)
    sharded = shard_params_pipeline(params, cfg, mesh)
    out = np.asarray(pipeline_forward_full(cfg, sharded, tokens, mesh,
                                           num_microbatches=2))
    np.testing.assert_allclose(out, base, rtol=2e-4, atol=2e-4)
