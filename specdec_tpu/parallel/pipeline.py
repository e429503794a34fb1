"""Pipeline parallelism: GPipe-style stage-sharded inference forward.

The reference only exposes PP as a vLLM passthrough
(ref: engine/vllm_engine.py:45,94 → ``pipeline_parallel_size``); nothing
in-repo implements it. This is the native TPU equivalent: the layer stack's
leading ``L`` axis (core/model.py keeps layers stacked precisely so a stage
axis is addable — see its module docstring) is split across a ``stage`` mesh
axis, the batch is split into microbatches, and stages run the classic
GPipe schedule — at global step t, stage s processes microbatch t-s, and
activations hop to the next stage over ICI via ``lax.ppermute``. Everything
lives in one ``shard_map``-ed jitted program; XLA overlaps each stage's
compute with its neighbor transfers.

Scope: the full-sequence (uncached) forward — the speculative VERIFY shape
and prefill. Cached token-by-token decode under PP would serialize on the
inter-stage hop every token and is not worth a pipeline at these scales
(the reference's own PP advice defers to TP for the same reason); TP over
'model' remains the first-class sharding for decode (parallel/mesh.py),
and vllm_compat folds pipeline_parallel_size into TP with a warning.

Pipeline efficiency is the usual M/(M+S-1) bubble factor for M microbatches
on S stages.
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from specdec_tpu.core.cache import init_cache
from specdec_tpu.core.config import ModelConfig
from specdec_tpu.core.model import _block, _mm, _norm
from specdec_tpu.core.rope import rope_cos_sin

STAGE_AXIS = "stage"


def build_pipeline_mesh(devices=None, stages: Optional[int] = None) -> Mesh:
    import numpy as np

    devices = devices if devices is not None else jax.devices()
    stages = stages or len(devices)
    assert len(devices) % stages == 0
    arr = np.asarray(devices)[:stages]
    return Mesh(arr, (STAGE_AXIS,))


def shard_params_pipeline(params, cfg: ModelConfig, mesh: Mesh):
    """Layer stack split across the stage axis (leading L dim); embeddings,
    final norm, and head replicated (stage 0 embeds, the last stage
    projects)."""
    S = mesh.shape[STAGE_AXIS]
    assert cfg.num_layers % S == 0, \
        f"num_layers {cfg.num_layers} not divisible by {S} stages"
    specs = {
        "embed": P(), "final_norm_w": P(),
        "layers": jax.tree.map(lambda _: P(STAGE_AXIS), params["layers"]),
    }
    if "final_norm_b" in params:
        specs["final_norm_b"] = P()
    if "lm_head" in params:
        specs["lm_head"] = P()
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params,
        {k: specs[k] for k in params})


def pipeline_forward_full(cfg: ModelConfig, params, tokens: jax.Array,
                          mesh: Mesh, num_microbatches: int = 4) -> jax.Array:
    """Causal full-sequence forward under PP. tokens: [B, T] with B divisible
    by num_microbatches. Returns logits [B, T, V] (f32), identical to
    ``forward_full`` (oracle-tested on the virtual mesh)."""
    try:
        from jax import shard_map as _sm
        def shard_map(f, **kw):   # new API renamed check_rep -> check_vma
            kw["check_vma"] = kw.pop("check_rep", False)
            return _sm(f, **kw)
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    B, T = tokens.shape
    S = mesh.shape[STAGE_AXIS]
    M = num_microbatches
    assert B % M == 0, f"batch {B} not divisible by {M} microbatches"
    mb = B // M
    steps = M + S - 1

    def stage_fn(params, tokens):
        # params["layers"]: this stage's [L/S, ...] slice; tokens: full [B, T]
        sid = lax.axis_index(STAGE_AXIS)
        tokens_mb = tokens.reshape(M, mb, T)

        q_pos = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32)[None, :],
                                 (mb, T))
        cos, sin = rope_cos_sin(q_pos, cfg.rotary_dim, cfg.rope_theta,
                                scaling=cfg.rope_scaling)
        offsets = jnp.zeros((mb,), jnp.int32)
        # scratch KV covering the block (uncached forward, ref forward_full)
        scratch = init_cache(cfg.replace(num_layers=1), mb, T)

        def run_local_layers(x):
            def body(h, scanned):
                lp, lk, lv = scanned
                h, _, _ = _block(cfg, lp, h, cos, sin, q_pos, lk, lv, offsets)
                return h, None

            Ls = jax.tree.leaves(params["layers"])[0].shape[0]
            lk = jnp.broadcast_to(scratch.k[0], (Ls,) + scratch.k.shape[1:])
            lv = jnp.broadcast_to(scratch.v[0], (Ls,) + scratch.v.shape[1:])
            h, _ = lax.scan(body, x, (params["layers"], lk, lv))
            return h

        def head(x):
            x = _norm(cfg, x, params["final_norm_w"],
                      params.get("final_norm_b"))
            if cfg.tie_embeddings:
                return jnp.einsum("btd,vd->btv", x, params["embed"],
                                  preferred_element_type=jnp.float32)
            return _mm(x, params["lm_head"]).astype(jnp.float32)

        perm = [(i, i + 1) for i in range(S - 1)]

        def step(carry, t):
            recv, logits_buf = carry
            # stage 0 sources microbatch t (clamped; masked when t >= M)
            j0 = jnp.clip(t, 0, M - 1)
            x0 = params["embed"][tokens_mb[j0]].astype(cfg.dtype)
            if cfg.embed_scale != 1.0:
                x0 = x0 * jnp.asarray(cfg.embed_scale, cfg.dtype)
            x_in = jnp.where(sid == 0, x0, recv)
            # stage s is live for microbatch t-s when 0 <= t-s < M; bubble
            # steps still compute (classic GPipe) but their results are
            # discarded by the mask
            live = (t - sid >= 0) & (t - sid < M)
            y = jnp.where(live, run_local_layers(x_in), x_in)
            # last stage projects its finished microbatch into the buffer;
            # head() lives INSIDE the cond so the (large, vocab-sized)
            # projection only runs on the stage+step that needs it
            jl = jnp.clip(t - (S - 1), 0, M - 1)
            write = (sid == S - 1) & (t - (S - 1) >= 0)
            logits_buf = lax.cond(
                write,
                lambda b: lax.dynamic_update_index_in_dim(b, head(y), jl, 0),
                lambda b: b, logits_buf)
            # activations hop to the next stage
            recv = lax.ppermute(y, STAGE_AXIS, perm)
            return (recv, logits_buf), None

        zero_act = jnp.zeros((mb, T, cfg.hidden_size), cfg.dtype)
        logits_buf = jnp.zeros((M, mb, T, cfg.vocab_size), jnp.float32)
        (recv, logits_buf), _ = lax.scan(step, (zero_act, logits_buf),
                                         jnp.arange(steps))
        # only the last stage holds real logits; share them with all stages
        logits_buf = jnp.where(sid == S - 1, logits_buf, 0.0)
        logits_buf = lax.psum(logits_buf, STAGE_AXIS)
        return logits_buf.reshape(B, T, cfg.vocab_size)

    pspecs = {k: (jax.tree.map(lambda _: P(STAGE_AXIS), params["layers"])
                  if k == "layers" else P()) for k in params}
    fn = shard_map(stage_fn, mesh=mesh,
                   in_specs=(pspecs, P()), out_specs=P(),
                   check_rep=False)
    return jax.jit(fn)(params, tokens)
