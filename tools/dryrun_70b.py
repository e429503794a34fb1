"""70B mesh-layout dryrun on the 8-device virtual CPU mesh.

Runs a LAYER-PROPORTIONAL stand-in for Llama-70B — the real layer count
(80), GQA ratio (Hk=8), and the real v5e-16 mesh layout (TP over 'model',
DP over 'data'; PP 2-stage split checked separately) — with hidden sizes
shrunk so the whole thing executes on CPU. This validates that the 70B
launch path (configs/launch_70b.sh) compiles and runs end to end: INT4
direct-quantized init, TP-sharded spec window with a layerskip drafter,
and a GPipe 2-stage forward (the cross-host PP layout from
docs/SCALING.md). VERDICT r2 #8.

Run: python tools/dryrun_70b.py
"""
import os
import sys

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8").strip()
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")


def main():
    from specdec_tpu.core.config import ModelConfig
    from specdec_tpu.engine.batch_engine import batch_prefill, batch_spec_window
    from specdec_tpu.parallel.mesh import build_mesh, shard_params
    from specdec_tpu.quant import init_quantized_params
    from specdec_tpu.sampling.processors import GreedyProcessor

    # layer-proportional 70B: real L=80, real GQA Hk=8, shrunken widths
    # (64-divisible so INT4 containers build)
    # widths sized so every INT4 scale-block axis (K/64) divides tp=4
    cfg = ModelConfig(
        vocab_size=512, hidden_size=256, intermediate_size=512,
        num_layers=80, num_heads=16, num_kv_heads=8, head_dim=16,
        max_position_embeddings=512, dtype=jnp.float32,
    )
    params = init_quantized_params(cfg, jax.random.key(0), kind="int4")
    # layerskip drafter: first 8 of 80 layers, shared quantized containers
    d_cfg = cfg.replace(num_layers=8)
    drafter_params = dict(params, layers=jax.tree.map(
        lambda x: x[:8], params["layers"]))

    mesh = build_mesh(jax.devices(), tp=4, dp=2)  # v5e-16 layout, scaled
    with mesh:
        target = shard_params(params, cfg, mesh, replicated=False)
        drafter = shard_params(drafter_params, d_cfg, mesh, replicated=True)
        B = 4
        rng = np.random.default_rng(0)
        prompts = jnp.asarray(rng.integers(1, 512, size=(B, 16), dtype=np.int64),
                              jnp.int32)
        lens = jnp.full((B,), 16, jnp.int32)
        proc = GreedyProcessor()
        state = batch_prefill(d_cfg, drafter, cfg, target, prompts, lens,
                              gen_len=8, gamma=3, processor=proc,
                              first_target=True, use_drafter=True, eos_ids=(),
                              key=jax.random.key(1))
        state = batch_spec_window(d_cfg, drafter, cfg, target, state, gamma=3,
                                  processor=proc, eos_ids=(),
                                  skip_sample_adjustment=False,
                                  key=jax.random.key(2))
        jax.block_until_ready(state.buf)
        pos = np.asarray(state.pos)
    assert (pos > 16).all(), pos
    print(f"70B-proportional spec window ok: 80 layers INT4, "
          f"mesh=(data=2, model=4), committed {list(pos - 16)} tokens/seq")

    # PP=2 x TP=4: the cross-host layout (docs/SCALING.md) — stage-sharded
    # forward must match single-device logits
    from specdec_tpu.core.model import forward_full, init_params
    from specdec_tpu.parallel.pipeline import (
        build_pipeline_mesh, pipeline_forward_full, shard_params_pipeline,
    )
    dense_cfg = cfg.replace(num_layers=16)  # PP check at reduced depth (CPU)
    dense = init_params(dense_cfg, jax.random.key(3))
    pmesh = build_pipeline_mesh(jax.devices(), stages=2)
    toks = jnp.asarray(np.random.default_rng(1).integers(
        1, 512, size=(2, 8), dtype=np.int64), jnp.int32)
    ref = np.asarray(forward_full(dense_cfg, dense, toks))
    pp = np.asarray(pipeline_forward_full(
        dense_cfg, shard_params_pipeline(dense, dense_cfg, pmesh), toks,
        pmesh, num_microbatches=2))
    np.testing.assert_allclose(pp, ref, rtol=2e-4, atol=2e-4)
    print("PP=2 stage-sharded forward matches single-device logits")
    print("DRYRUN_70B OK")


if __name__ == "__main__":
    main()
