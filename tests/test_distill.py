"""Distillation utility: KL-distilling a drafter toward a target must raise
the multinomial acceptance proxy sum(min(p, q))."""
import jax
import jax.numpy as jnp

from specdec_tpu.core.config import tiny_config
from specdec_tpu.core.model import init_params
from specdec_tpu.engine.distill import acceptance_proxy, distill_drafter

T_CFG = tiny_config(vocab_size=64, num_layers=3, hidden_size=48,
                    intermediate_size=96, num_heads=4, num_kv_heads=2,
                    head_dim=12)
D_CFG = T_CFG.replace(num_layers=1)


def test_distillation_improves_acceptance():
    target = init_params(T_CFG, jax.random.key(0), scale=0.15)
    drafter = dict(target)
    drafter["layers"] = jax.tree.map(lambda x: x[:1], target["layers"])

    toks = jax.random.randint(jax.random.key(1), (4, 32), 1, 64)
    acc0, _ = acceptance_proxy(T_CFG, target, D_CFG, drafter, toks)

    distilled, acc1 = distill_drafter(
        T_CFG, target, D_CFG, drafter, steps=60, batch_size=4, seq_len=32,
        learning_rate=1e-3, key=jax.random.key(2))
    assert acc1 > float(acc0) + 0.02, (float(acc0), acc1)
    assert 0.0 <= acc1 <= 1.0


def test_distilled_drafter_runs_spec_decode():
    from specdec_tpu.sampling.processors import MultinomialProcessor
    from specdec_tpu.sampling.speculative import speculative_generate

    target = init_params(T_CFG, jax.random.key(0), scale=0.15)
    drafter = dict(target)
    drafter["layers"] = jax.tree.map(lambda x: x[:1], target["layers"])
    distilled, _ = distill_drafter(T_CFG, target, D_CFG, drafter, steps=30,
                                   batch_size=4, seq_len=32,
                                   key=jax.random.key(3))
    out, rate = speculative_generate(
        [3, 9, 11, 40], D_CFG, distilled, T_CFG, target, gamma=3,
        max_gen_len=12, eos_tokens_id=(),
        logits_processor=MultinomialProcessor(1.0), key=jax.random.key(4))
    assert len(out) == 12
    assert 0.0 <= rate <= 1.0


def test_on_policy_sampler_and_distill():
    """on_policy_sampler yields target-sampled batches (right shape/range)
    and distillation on them improves the on-policy acceptance proxy."""
    from specdec_tpu.engine.distill import on_policy_sampler

    target = init_params(T_CFG, jax.random.key(0), scale=0.2)
    drafter = init_params(D_CFG, jax.random.key(3), scale=0.2)
    sampler = on_policy_sampler(T_CFG, target, batch_size=4, seq_len=24)
    toks = sampler(jax.random.key(7))
    assert toks.shape == (4, 24)
    assert int(toks.min()) >= 0 and int(toks.max()) < T_CFG.vocab_size

    a0, _ = acceptance_proxy(T_CFG, target, D_CFG, drafter, toks)
    distilled, acc = distill_drafter(T_CFG, target, D_CFG, drafter, steps=60,
                                     batch_size=4, seq_len=24,
                                     batch_sampler=sampler,
                                     key=jax.random.key(8))
    a1, _ = acceptance_proxy(T_CFG, target, D_CFG, distilled, toks)
    assert float(a1) > float(a0)
