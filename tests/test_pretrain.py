"""Structured-stream pretraining: the learnable EAGLE arena (VERDICT r2 #3).

Three claims, tiny scale:
1. The Markov stream's entropy yardstick is exact: an oracle that knows the
   transition tables achieves NLL == spec.entropy_nats.
2. train_lm actually learns: a tiny target's NLL lands near the entropy
   floor (random init sits at ~log V).
3. On the TRAINED target, a trained depth-1 EAGLE head reaches real
   teacher-forced acceptance (>=0.5) — the quantity that was 0.004 on
   random-weight targets (VERDICT r2 weak #1) — and the lift comes from
   training (the untrained head is near zero). The EAGLE-vs-LayerSkip
   operating-point comparison itself is a chip measurement
   (tools/bench_eagle_fair.py), not a unit test: at bigram depth the
   1-layer prefix drafter is ALSO strong (measured 0.90 here — prediction
   is shallow), so which family wins is a property of the stream's depth
   structure, exactly the crossover the bench records.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from specdec_tpu.core.config import ModelConfig
from specdec_tpu.engine.pretrain import (
    MarkovSpec, build_trained_target, lm_nll, markov_sampler,
)

# order-1: the drafter-fair arena (see MarkovSpec docstring) — order-2's
# sufficient statistic includes a token the target's features need not
# retain, which is adversarial to feature drafters by construction
SPEC = MarkovSpec(vocab_size=128, num_states=64, branching=4, zipf_s=1.2,
                  order=1, seed=3)
CFG = ModelConfig(vocab_size=128, hidden_size=128, intermediate_size=256,
                  num_layers=4, num_heads=4, num_kv_heads=2, head_dim=32,
                  max_position_embeddings=256, dtype=jnp.float32)


@pytest.fixture(scope="module")
def trained():
    params, nll = build_trained_target(CFG, SPEC, steps=450, batch_size=32,
                                       seq_len=64, learning_rate=3e-3,
                                       seed=0)
    return params, nll


def test_stream_entropy_yardstick_exact():
    """An oracle holding the true tables scores NLL == entropy_nats."""
    succ, logp = SPEC.tables()
    toks = np.asarray(markov_sampler(SPEC, 8, 64)(jax.random.key(1)))
    t2, t1, nxt = toks[:, :-2], toks[:, 1:-1], toks[:, 2:]
    h = np.asarray(SPEC.state(t2, t1))
    cand = np.asarray(succ)[h]                        # [B, L-2, K]
    # oracle prob of the realized token: sum of weights over matching slots
    # (a state may list the same successor twice)
    match = cand == nxt[..., None]
    p = (np.exp(np.asarray(logp)) * match).sum(-1)
    assert (p > 0).all()                              # stream is consistent
    oracle_nll = float(-np.log(p).mean())
    np.testing.assert_allclose(oracle_nll, SPEC.entropy_nats, rtol=0.08)


def test_train_lm_learns_the_stream(trained):
    params, nll = trained
    floor = SPEC.entropy_nats
    # random init sits at ~log(V) = 4.85; learned must be near the floor
    assert nll < floor + 0.35, (nll, floor)
    # and an eval batch (fresh seed) agrees — not just the last train batch
    toks = markov_sampler(SPEC, 16, 64)(jax.random.key(99))
    eval_nll = float(lm_nll(CFG, params, toks))
    assert eval_nll < floor + 0.4, (eval_nll, floor)


def test_eagle_gets_real_acceptance_on_trained_target(trained):
    from specdec_tpu.core.eagle import init_eagle_params
    from specdec_tpu.engine.eagle_train import (
        eagle_acceptance_proxy, train_eagle,
    )

    target, _ = trained
    e_cfg = CFG.replace(num_layers=1)
    ep = init_eagle_params(e_cfg, jax.random.key(7))
    sampler = markov_sampler(SPEC, 16, 64)
    toks = sampler(jax.random.key(10_007))
    acc0, _ = eagle_acceptance_proxy(CFG, e_cfg, ep, target, toks)

    # cosine decay (train_eagle default) halves the average step size, so
    # the base LR is 2e-3 where the pre-decay schedule used 1e-3 (1e-3 under
    # decay lands at 0.49 — right at the assertion edge; 2e-3 reaches 0.82)
    ep, acc = train_eagle(CFG, target, e_cfg, ep, steps=250,
                          batch_sampler=sampler, learning_rate=2e-3,
                          key=jax.random.key(8))
    assert acc >= 0.5, acc
    assert acc - float(acc0) > 0.3, (float(acc0), acc)


def test_trained_loader_spec():
    """``trained:<preset>@<steps>`` pretrains a preset-shaped target on the
    Markov stream at load and pairs with drafter specs like any other
    target; the stream spec rides in the bundle for in-distribution
    prompting."""
    from specdec_tpu.engine.model_loader import load_models

    b = load_models("trained:tiny@100", drafter_model_path="layerskip:1",
                    dtype=jnp.float32)
    t = b["target"]
    assert np.isfinite(t["pretrain_nll"])
    # below random init (~log V) — it trained (full convergence is the
    # chip bench's job; this is plumbing coverage)
    assert t["pretrain_nll"] < np.log(t["cfg"].vocab_size) - 0.4
    assert t["stream_spec"].entropy_nats < t["pretrain_nll"]
    assert b["drafter"]["cfg"].num_layers == 1
