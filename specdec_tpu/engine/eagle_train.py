"""EAGLE drafter training: teacher-forced feature regression + distillation.

Trains the fc + block stack of core/eagle.py against a frozen target. Both
loss terms are the EAGLE recipe (PAPERS.md):

- regression: smooth-L1 between the predicted feature f_hat_{j+1} and the
  target's true feature f_{j+1} (the drafter's autoregressive state stays
  anchored to the target's representation, so multi-step drafting does not
  drift),
- classification: cross-entropy of the drafter's head distribution (shared
  target head over f_hat) against the target's softened distribution at the
  same position — directly optimizes E[min(p, q)] acceptance like
  engine/distill.py does for standalone drafters.

Teacher-forcing uses on-policy batches (sequences SAMPLED from the target,
engine/distill.py::_sample_on_policy) by default: speculative decoding only
ever conditions the drafter on committed target tokens/features.

All steps are jitted; the teacher's features/probs are computed once per
batch with no gradient.
"""
from __future__ import annotations

from functools import partial
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from specdec_tpu.core.cache import init_cache
from specdec_tpu.core.config import ModelConfig
from specdec_tpu.core.eagle import eagle_forward
from specdec_tpu.core.model import forward_step_features


@partial(jax.jit, static_argnames=("t_cfg",))
def teacher_feats_probs(t_cfg: ModelConfig, target_params, tokens: jax.Array):
    """(features [B, L, D], probs [B, L, V]) of a full-seq target forward."""
    B, L = tokens.shape
    cache = init_cache(t_cfg, B, L)
    logits, feats, _ = forward_step_features(t_cfg, target_params, tokens,
                                             cache)
    return feats, jax.nn.softmax(logits, axis=-1)


def _smooth_l1(x: jax.Array, beta: float = 1.0) -> jax.Array:
    ax = jnp.abs(x)
    return jnp.where(ax < beta, 0.5 * ax * ax / beta, ax - 0.5 * beta)


@partial(jax.jit, static_argnames=("cfg", "cls_weight", "rollout_steps"))
def _eagle_loss_and_grad(cfg: ModelConfig, eagle_params, target_params,
                         tokens, feats, probs, cls_weight: float = 0.1,
                         rollout_steps: int = 1):
    """Teacher-forced loss over pairs (f_j, t_{j+1}) -> (f_{j+1}, p_{j+1}),
    optionally unrolled onto the drafter's OWN predicted features.

    tokens [B, L]; feats/probs [B, L, ...] from ``teacher_feats_probs``.

    ``rollout_steps > 1`` adds multi-step alignment in the spirit of HASS
    (Zhang et al., 2024, arXiv:2408.15766): pass k>=2 re-feeds the previous pass's predicted
    features (stop-gradient) so the head is trained under the distribution
    it actually sees at draft step k — pure teacher forcing measured 0.52
    proxy acceptance but only 0.11 rollout acceptance on the pretrained
    250M arena target (feature drift); on the tiny CPU arena rollout=3
    lifts e2e acceptance 0.43 -> 0.66 at equal step count.
    """
    B, L = tokens.shape

    def loss_fn(ep):
        total_reg = 0.0
        total_cls = 0.0
        f_in = feats[:, :-1]
        for k in range(1, rollout_steps + 1):
            # every pass starts at cache position 0: rope attention depends
            # only on position DIFFERENCES, so the uniform (k-1)-shift vs
            # absolute positions is exactly equivalent — while an offset
            # cache would leave k-1 unwritten ZERO K/V slots below the
            # block that every query attends to (a train/deploy attention
            # mismatch that collapsed rollout acceptance 0.114 -> 0.022 on
            # chip before this was caught)
            cache = init_cache(cfg, B, L - k)
            logits, f_hat, _ = eagle_forward(cfg, ep, target_params,
                                             tokens[:, k:], f_in, cache)
            # regression in UNITS OF THE TARGET'S FEATURE SCALE: trained
            # checkpoints grow large pre-final-norm residuals (measured:
            # raw smooth-L1 of 117 vs a 13-nat cls term on a pretrained
            # 250M target, burying the classification signal that
            # acceptance actually measures). Per-position RMS
            # normalization makes reg O(1) for any target.
            f_true = feats[:, k:].astype(jnp.float32)
            rms = jax.lax.stop_gradient(
                jnp.sqrt(jnp.mean(f_true * f_true, axis=-1, keepdims=True)
                         + 1e-6))
            total_reg += jnp.mean(_smooth_l1(
                (f_hat.astype(jnp.float32) - f_true) / rms))
            logq = jax.nn.log_softmax(logits, axis=-1)
            total_cls += -jnp.mean(jnp.sum(probs[:, k:] * logq, axis=-1))
            f_in = jax.lax.stop_gradient(f_hat[:, :-1]).astype(feats.dtype)
        reg = total_reg / rollout_steps
        cls = total_cls / rollout_steps
        return reg + cls_weight * cls, (reg, cls)

    (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(eagle_params)
    return loss, aux, grads


@partial(jax.jit, static_argnames=("t_cfg", "eagle_cfg"))
def eagle_acceptance_proxy(t_cfg: ModelConfig, eagle_cfg: ModelConfig,
                           eagle_params, target_params,
                           tokens) -> Tuple[jax.Array, jax.Array]:
    """(mean sum min(p, q), argmax agreement) under TEACHER-FORCED features.

    Upper-bounds rollout acceptance (draft steps > 1 condition on predicted
    features, which drift); the e2e number comes from the generation loop's
    acceptance counters (sampling/eagle_speculative.py).
    """
    B, L = tokens.shape
    feats, probs = teacher_feats_probs(t_cfg, target_params, tokens)
    cache = init_cache(eagle_cfg, B, L - 1)
    logits, _, _ = eagle_forward(eagle_cfg, eagle_params, target_params,
                                 tokens[:, 1:], feats[:, :-1], cache)
    q = jax.nn.softmax(logits, axis=-1)
    p = probs[:, 1:]
    acc = jnp.mean(jnp.sum(jnp.minimum(p, q), axis=-1))
    agree = jnp.mean((jnp.argmax(p, -1) == jnp.argmax(q, -1)
                      ).astype(jnp.float32))
    return acc, agree


def train_eagle(
    t_cfg: ModelConfig, target_params,
    eagle_cfg: ModelConfig, eagle_params,
    steps: int = 300,
    batch_size: int = 8,
    seq_len: int = 128,
    learning_rate: float = 1e-3,
    cls_weight: float = 0.1,
    rollout_steps: int = 1,
    batch_sampler: Optional[Callable[[jax.Array], jax.Array]] = None,
    key: Optional[jax.Array] = None,
    log_every: int = 0,
    log_fn=print,
):
    """Returns (trained eagle params, final teacher-forced acceptance proxy).

    ``eagle_cfg`` is ``t_cfg.replace(num_layers=<drafter depth>)``; the
    target is frozen throughout (its params appear in the graph but no grads
    flow — value_and_grad differentiates w.r.t. eagle params only).
    """
    import optax

    key = key if key is not None else jax.random.key(0)
    # cosine decay to 0.1x: constant-LR adam oscillates near convergence
    # (measured on the 250M arena: proxy 0.52 at step 1400, 0.35 at the
    # final eval 100 steps later)
    opt = optax.adam(optax.cosine_decay_schedule(
        learning_rate, max(steps, 1), alpha=0.1))
    opt_state = opt.init(eagle_params)

    if batch_sampler is None:
        from specdec_tpu.engine.distill import on_policy_sampler
        batch_sampler = on_policy_sampler(t_cfg, target_params,
                                          batch_size=batch_size,
                                          seq_len=seq_len)

    @jax.jit
    def opt_step(ep, os_, grads):
        updates, os_ = opt.update(grads, os_, ep)
        return optax.apply_updates(ep, updates), os_

    for i in range(steps):
        key, k = jax.random.split(key)
        tokens = batch_sampler(k)
        feats, probs = teacher_feats_probs(t_cfg, target_params, tokens)
        loss, (reg, cls), grads = _eagle_loss_and_grad(
            eagle_cfg, eagle_params, target_params, tokens, feats, probs,
            cls_weight=cls_weight, rollout_steps=rollout_steps)
        eagle_params, opt_state = opt_step(eagle_params, opt_state, grads)
        if log_every and i % log_every == 0:
            acc, agree = eagle_acceptance_proxy(
                t_cfg, eagle_cfg, eagle_params, target_params,
                batch_sampler(jax.random.key(10_007)))
            log_fn(f"eagle step {i}: loss={float(loss):.4f} "
                   f"reg={float(reg):.4f} cls={float(cls):.4f} "
                   f"acceptance_proxy={float(acc):.3f} "
                   f"argmax_agree={float(agree):.3f}")

    acc, _ = eagle_acceptance_proxy(t_cfg, eagle_cfg, eagle_params,
                                    target_params,
                                    batch_sampler(jax.random.key(10_007)))
    return eagle_params, float(acc)
