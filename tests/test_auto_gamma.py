"""Runtime gamma adaptation in the continuous batcher: measured acceptance →
conditional inversion → best-gamma re-jit (engine/gamma_tuner.py), with
outputs unchanged across the switch. The reference leaves gamma static and
hand-tuned (ref: configs/performance_config.sh:28)."""
import jax

from specdec_tpu.core.config import tiny_config
from specdec_tpu.core.model import init_params
from specdec_tpu.sampling.base_decoding import autoregressive_generate
from specdec_tpu.serve import ContinuousBatcher

VOCAB = 32
CFG = tiny_config(vocab_size=VOCAB, num_layers=2, hidden_size=32,
                  intermediate_size=64, num_heads=4, num_kv_heads=2, head_dim=8)
TARGET = init_params(CFG, jax.random.key(0), scale=0.4)
BAD_DRAFTER = init_params(CFG, jax.random.key(5), scale=0.4)

PROMPTS = [[3, 14, 15, 9, 2, 6], [1, 1, 2, 3, 5, 8], [27, 4, 11],
           [9, 9, 9, 1, 2], [17, 30, 12, 4]]


def _run(drafter, oracle=True, **kw):
    cb = ContinuousBatcher(CFG, drafter, CFG, TARGET, num_slots=1,
                           max_prompt_len=32, max_new_tokens=16,
                           eos_tokens_id=(), auto_gamma=True,
                           auto_gamma_min_drafts=30, **kw)
    ids = [cb.submit(p) for p in PROMPTS]
    done = cb.run()
    for rid, p in zip(ids, PROMPTS):
        assert len(done[rid].output_ids) == 16
        if oracle:
            # greedy spec == greedy AR holds for SELF-draft only (p == q →
            # every draft accepted); with an unrelated drafter, rejection
            # commits argmax(max(p-q, 0)) != argmax(p) — reference semantics
            expect = autoregressive_generate(p, CFG, TARGET, max_gen_len=16,
                                             eos_tokens_id=(),
                                             key=jax.random.key(99))
            assert done[rid].output_ids == expect, \
                f"request {rid} diverged across the gamma switch"
    return cb


def test_perfect_drafter_raises_gamma():
    """Self-draft acceptance is 1.0 -> the advisory pushes gamma to the cap
    (tokens grow ~linearly in gamma, cost grows by the drafter ratio)."""
    cb = _run(TARGET, gamma=3, auto_gamma_max=8, gamma_cost_ratio=0.2)
    assert cb.gamma == 8 and cb._gamma_switches >= 1


def test_random_drafter_lowers_gamma():
    """An unrelated random drafter accepts ~1/vocab of drafts -> long
    windows waste drafter forwards; the advisory collapses gamma to 1."""
    cb = _run(BAD_DRAFTER, oracle=False, gamma=6, auto_gamma_max=8,
              gamma_cost_ratio=1.0)
    assert cb.gamma < 6 and cb._gamma_switches >= 1


def test_switches_bounded():
    cb = _run(TARGET, gamma=3, auto_gamma_max=8, gamma_cost_ratio=0.2)
    assert cb._gamma_switches <= 2


def test_auto_gamma_off_by_default():
    cb = ContinuousBatcher(CFG, TARGET, CFG, TARGET, num_slots=1, gamma=3,
                           max_prompt_len=32, max_new_tokens=8,
                           eos_tokens_id=())
    cb.submit(PROMPTS[0])
    cb.run()
    assert cb.gamma == 3 and cb._gamma_switches == 0
