"""EAGLE serving tests: feature-drafted speculative decoding inside the
continuous batching scheduler. EAGLE acceptance is probabilistic even under
greedy (r vs softmax ratio — same property as test_eagle.py), so the oracles
here are determinism per key, completion/metrics structure, queue draining,
and acceptance parity with the one-shot batched engine (a broken feature-row
install at admission would collapse a trained drafter's acceptance)."""
import numpy as np
import pytest
import jax

from specdec_tpu.core.config import tiny_config
from specdec_tpu.core.eagle import init_eagle_params
from specdec_tpu.core.model import init_params
from specdec_tpu.engine.eagle_batch import batch_eagle_generate
from specdec_tpu.engine.eagle_train import train_eagle
from specdec_tpu.sampling.processors import MultinomialProcessor
from specdec_tpu.serve import EagleContinuousBatcher

VOCAB = 32
CFG = tiny_config(vocab_size=VOCAB, num_layers=3, hidden_size=32,
                  intermediate_size=64, num_heads=4, num_kv_heads=2,
                  head_dim=8)
ECFG = CFG.replace(num_layers=1)

PROMPTS = [
    [3, 14, 15, 9, 2, 6],
    [1, 1, 2, 3, 5, 8, 13, 21],
    [27, 4, 11],
    [9, 9, 9, 1, 2],
]


@pytest.fixture(scope="module")
def models(eagle_models):
    # shared session-scoped fixture (conftest.py): the 200-step training run
    # is paid once across the EAGLE test modules
    _, _, target, eagle, trained = eagle_models
    return target, eagle, trained


def _run(target, eagle, key=0, slots=2, wps=1, gen=12):
    cb = EagleContinuousBatcher(ECFG, eagle, CFG, target, num_slots=slots,
                                gamma=3, max_prompt_len=64,
                                max_new_tokens=gen, eos_tokens_id=(),
                                windows_per_sync=wps,
                                key=jax.random.key(key))
    ids = [cb.submit(p) for p in PROMPTS]
    done = cb.run()
    return ids, done


def test_eagle_serving_completes_and_deterministic(models):
    target, eagle, _ = models
    ids1, done1 = _run(target, eagle, key=5)
    ids2, done2 = _run(target, eagle, key=5)
    assert sorted(done1.keys()) == sorted(ids1)
    for r1, r2 in zip(ids1, ids2):
        out = done1[r1].output_ids
        assert out == done2[r2].output_ids
        assert len(out) == 12
        assert all(0 <= t < VOCAB for t in out)
        m = done1[r1].metrics
        assert m.generated_tokens == 12
        assert 0.0 <= m.acceptance_rate <= 1.0
        assert m.total_latency > 0 and m.ttft >= 0


def test_eagle_serving_more_requests_than_slots(models):
    target, _, trained = models
    ids, done = _run(target, trained, slots=1, wps=4, gen=10)
    assert sorted(done.keys()) == sorted(ids)
    assert all(len(done[r].output_ids) == 10 for r in ids)


def test_eagle_serving_acceptance_tracks_batch_engine(models):
    """A trained drafter's serving acceptance must track the one-shot batched
    engine's (same window body; RNG differs, compare means) and beat the
    untrained drafter's — this catches a broken fbuf row install at
    admission, which would feed the drafter zero features."""
    target, eagle0, trained = models
    proc = MultinomialProcessor(temperature=1.0)

    def serve_rates(params):
        cb = EagleContinuousBatcher(ECFG, params, CFG, target, num_slots=2,
                                    gamma=4, max_prompt_len=64,
                                    max_new_tokens=24, eos_tokens_id=(),
                                    logits_processor=proc,
                                    key=jax.random.key(7))
        ids = [cb.submit(p) for p in PROMPTS]
        done = cb.run()
        return [done[r].metrics.acceptance_rate for r in ids]

    _, engine_rates = batch_eagle_generate(
        PROMPTS, ECFG, trained, CFG, target, gamma=4, gen_len=24,
        eos_tokens_id=(), logits_processor=proc, key=jax.random.key(8))

    m_serve = float(np.mean(serve_rates(trained)))
    m_engine = float(np.mean(engine_rates))
    assert m_serve > 0.0
    assert abs(m_serve - m_engine) < 0.15, (m_serve, m_engine)
    assert m_serve > float(np.mean(serve_rates(eagle0)))


def test_eagle_serving_eos_frees_slot(models):
    target, _, trained = models
    # find a token that actually appears in a no-EOS run's output
    cb = EagleContinuousBatcher(ECFG, trained, CFG, target, num_slots=1,
                                gamma=3, max_prompt_len=64, max_new_tokens=10,
                                eos_tokens_id=(), key=jax.random.key(9))
    r0 = cb.submit(PROMPTS[0])
    probe = cb.run()[r0].output_ids
    eos = probe[4]

    cb = EagleContinuousBatcher(ECFG, trained, CFG, target, num_slots=1,
                                gamma=3, max_prompt_len=64, max_new_tokens=10,
                                eos_tokens_id=(eos,), key=jax.random.key(9))
    r1 = cb.submit(PROMPTS[0])
    r2 = cb.submit(PROMPTS[1])
    done = cb.run()
    assert done[r1].output_ids == probe[:probe.index(eos) + 1]
    assert len(done) == 2 and done[r2].output_ids is not None


def test_eagle_serving_streams(models):
    """stream_generate over the EAGLE batcher: concatenated yields equal the
    completed request's output_ids."""
    from specdec_tpu.serve.streaming import stream_generate
    target, _, trained = models
    cb = EagleContinuousBatcher(ECFG, trained, CFG, target, num_slots=1,
                                gamma=3, max_prompt_len=64, max_new_tokens=10,
                                eos_tokens_id=(), key=jax.random.key(4))
    chunks = list(stream_generate(cb, PROMPTS[0]))
    out = sum(chunks, [])
    assert len(out) == 10
    assert out == cb.completed[0].output_ids


def test_eagle_slot_reuse_zeroes_drafter_cache(models):
    """Admission into a reused slot must leave NO previous-occupant drafter
    K/V: rows below the catch-up start are positionally attended but never
    rewritten, so stale rows would condition request B's drafting on
    request A's state (short prompts can't expose it — start clamps to 0 —
    so assert the state directly)."""
    target, _, trained = models
    cb = EagleContinuousBatcher(ECFG, trained, CFG, target, num_slots=1,
                                gamma=3, max_prompt_len=64, max_new_tokens=8,
                                eos_tokens_id=(), key=jax.random.key(3))
    r1 = cb.submit(PROMPTS[1])
    cb.run()
    assert float(np.abs(np.asarray(cb.state.e_cache.k[:, 0])).max()) > 0
    long_prompt = [(7 * i + 3) % VOCAB for i in range(30)]
    cb.submit(long_prompt)
    cb.step()  # admission happens inside step(); then one window runs
    # after one window only the catch-up rows (last gamma+1, plus draft
    # steps) may be nonzero; every row below the window's catch-up start
    # must be zero. pos after admission was 31, so start >= 26.
    pos = int(np.asarray(cb.state.pos[0]))
    start = max(pos - 1 - (cb.gamma + 1), 0)
    assert start >= 20, "test setup must force a nonzero catch-up start"
    k = np.asarray(cb.state.e_cache.k[:, 0, :len(long_prompt) - cb.gamma - 2])
    assert float(np.abs(k).max()) == 0.0, "stale drafter KV leaked"
