"""Drafter distillation: fit a small drafter to a target's token distribution.

Real speculative-decoding deployments train their drafters against the target
(distilled small models, EAGLE/Medusa heads); the acceptance rate under
multinomial sampling is exactly ``E[sum_x min(p, q)] = 1 - TV(p, q)``, so KL
distillation directly optimizes acceptance. This utility runs teacher-forced
KL distillation on token batches (user-provided corpus sampler or uniform
synthetic), with the teacher's probabilities computed once per batch.

Used by bench.py to produce an honest synthetic drafter/target pair (random
weights give ~0 agreement between a shallow drafter and a deep target; a few
hundred distillation steps recover the realistic operating regime), and
available as a library feature for real checkpoints.
"""
from __future__ import annotations

from functools import partial
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from specdec_tpu.core.config import ModelConfig
from specdec_tpu.core.model import forward_full


@partial(jax.jit, static_argnames=("t_cfg",))
def teacher_probs(t_cfg: ModelConfig, target_params, tokens: jax.Array):
    return jax.nn.softmax(forward_full(t_cfg, target_params, tokens), -1)


@partial(jax.jit, static_argnames=("d_cfg",))
def _kl_loss_and_grad(d_cfg: ModelConfig, drafter_params, tokens, p_t):
    def loss_fn(dp):
        logq = jax.nn.log_softmax(forward_full(d_cfg, dp, tokens), -1)
        return -jnp.mean(jnp.sum(p_t * logq, axis=-1))

    return jax.value_and_grad(loss_fn)(drafter_params)


@partial(jax.jit, static_argnames=("t_cfg", "d_cfg"))
def acceptance_proxy(t_cfg: ModelConfig, target_params, d_cfg: ModelConfig,
                     drafter_params, tokens) -> Tuple[jax.Array, jax.Array]:
    """(mean sum min(p,q) = expected multinomial acceptance, argmax agreement)."""
    p = teacher_probs(t_cfg, target_params, tokens)
    q = jax.nn.softmax(forward_full(d_cfg, drafter_params, tokens), -1)
    acc = jnp.mean(jnp.sum(jnp.minimum(p, q), axis=-1))
    agree = jnp.mean((jnp.argmax(p, -1) == jnp.argmax(q, -1)
                      ).astype(jnp.float32))
    return acc, agree


@partial(jax.jit, static_argnames=("t_cfg", "batch_size", "seq_len"))
def _sample_on_policy(t_cfg: ModelConfig, target_params, key,
                      batch_size: int, seq_len: int) -> jax.Array:
    """[B, L] token batches sampled FROM the target (temperature-1
    multinomial, 1 random seed token per row)."""
    from specdec_tpu.core.cache import init_cache
    from specdec_tpu.core.model import forward_step

    V = t_cfg.vocab_size
    k0, key = jax.random.split(key)
    cache = init_cache(t_cfg, batch_size, seq_len + 1)
    tok = jax.random.randint(k0, (batch_size, 1), 1, V, dtype=jnp.int32)
    first = tok

    def step(carry, k):
        tok, cache = carry
        logits, cache = forward_step(t_cfg, target_params, tok, cache)
        nxt = jax.random.categorical(k, logits[:, 0]).astype(jnp.int32)[:, None]
        return (nxt, cache), nxt[:, 0]

    (_, _), rest = jax.lax.scan(step, (tok, cache),
                                jax.random.split(key, seq_len - 1))
    return jnp.concatenate([first, rest.T], axis=1)


def on_policy_sampler(t_cfg: ModelConfig, target_params,
                      batch_size: int = 8, seq_len: int = 128):
    """Batch sampler for ``distill_drafter`` drawing sequences from the
    TARGET itself. The acceptance rate that matters is measured on
    target-generated prefixes — speculative decoding only ever conditions
    the drafter on tokens the target committed — so on-policy distillation
    optimizes the deployed quantity (standard practice for real drafter
    training). Measured caveats: on tiny synthetic targets uniform and
    on-policy batches distill equally (conditionals barely vary by
    context: both lifted a 2L/4L non-tied pair 0.10 -> 0.23 acceptance
    proxy), and distilling a WEIGHT-TIED prefix drafter on uniform data
    actively degrades it (round-1 finding, CLAUDE.md) — prefer this
    sampler whenever the drafter is trained at all."""
    def sampler(k):
        return _sample_on_policy(t_cfg, target_params, k, batch_size,
                                 seq_len)
    return sampler


def distill_drafter(
    t_cfg: ModelConfig, target_params,
    d_cfg: ModelConfig, drafter_params,
    steps: int = 300,
    batch_size: int = 8,
    seq_len: int = 128,
    learning_rate: float = 3e-4,
    batch_sampler: Optional[Callable[[jax.Array], jax.Array]] = None,
    key: Optional[jax.Array] = None,
    log_every: int = 0,
    log_fn=print,
):
    """Returns (distilled drafter params, final acceptance proxy)."""
    import optax

    key = key if key is not None else jax.random.key(0)
    opt = optax.adam(learning_rate)
    opt_state = opt.init(drafter_params)

    if batch_sampler is None:
        V = t_cfg.vocab_size

        def batch_sampler(k):
            return jax.random.randint(k, (batch_size, seq_len), 1, V)

    @partial(jax.jit, static_argnames=())
    def opt_step(dp, os_, grads):
        updates, os_ = opt.update(grads, os_, dp)
        return optax.apply_updates(dp, updates), os_

    for i in range(steps):
        key, k = jax.random.split(key)
        tokens = batch_sampler(k)
        p_t = teacher_probs(t_cfg, target_params, tokens)
        loss, grads = _kl_loss_and_grad(d_cfg, drafter_params, tokens, p_t)
        drafter_params, opt_state = opt_step(drafter_params, opt_state, grads)
        if log_every and i % log_every == 0:
            acc, agree = acceptance_proxy(
                t_cfg, target_params, d_cfg, drafter_params,
                batch_sampler(jax.random.key(10_007)))
            log_fn(f"distill step {i}: loss={float(loss):.4f} "
                   f"acceptance_proxy={float(acc):.3f} "
                   f"argmax_agree={float(agree):.3f}")

    acc, _ = acceptance_proxy(t_cfg, target_params, d_cfg, drafter_params,
                              batch_sampler(jax.random.key(10_007)))
    return drafter_params, float(acc)
