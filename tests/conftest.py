"""Test configuration: force an 8-device virtual CPU mesh.

The TPU-world way to test multi-chip sharding without a pod slice (SURVEY.md §4):
run on CPU with ``xla_force_host_platform_device_count=8``. The environment's
TPU plugin pins ``jax_platforms`` via jax.config at interpreter start, so the
env var alone is not enough — override through jax.config before any backend
initializes. Matmul precision is raised to HIGHEST so f32 parity tests against
torch are exact regardless of backend defaults.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("TOKENIZERS_PARALLELISM", "false")
# paged scheduler: verify the host position mirror against the device every
# _top_up (free on CPU; a per-step RPC on the tunneled TPU, so env-gated)
os.environ.setdefault("SPECDEC_CHECK_HOST_POS", "1")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
assert jax.default_backend() == "cpu"


import pytest  # noqa: E402


@pytest.fixture(scope="module", autouse=True)
def _clear_jax_caches_between_modules():
    """The XLA CPU compiler segfaults (inside backend_compile_and_load)
    once a single pytest process has accumulated ~95 tests' worth of live
    compiled programs — reproducibly at the 17th test module, regardless of
    which test runs there; every module passes in isolation. Dropping the
    jit caches between modules keeps the per-process compiler state bounded.
    Costs recompiles of the handful of cross-module tiny-model programs
    (~1 min over the suite), crashes zero times."""
    yield
    jax.clear_caches()


@pytest.fixture(scope="session")
def eagle_models():
    """(CFG, ECFG, target, untrained head, trained head) shared by the EAGLE
    test modules — the pretrain + 200-step head training is the expensive
    part, paid once per session.

    The target is PRETRAINED on an order-1 Markov stream rather than left
    at random init: a random tiny target's greedy continuations are
    unlearnable at depth 1 (argmax agreement ~0.09 ≈ 1/vocab chance), so
    every trained-vs-untrained acceptance assertion was sampling noise
    (measured: trained 0.058 vs untrained 0.076 tree acceptance). On the
    learnable target the same 200-step head reaches 0.95 vs 0.23 — the
    lift tests now have real statistical power."""
    from specdec_tpu.core.config import tiny_config
    from specdec_tpu.core.eagle import init_eagle_params
    from specdec_tpu.engine.eagle_train import train_eagle
    from specdec_tpu.engine.pretrain import MarkovSpec, build_trained_target

    cfg = tiny_config(vocab_size=32, num_layers=3, hidden_size=32,
                      intermediate_size=64, num_heads=4, num_kv_heads=2,
                      head_dim=8)
    ecfg = cfg.replace(num_layers=1)
    spec = MarkovSpec(vocab_size=32, num_states=64, branching=4,
                      zipf_s=1.2, order=1, seed=0)
    target, _ = build_trained_target(cfg, spec, steps=300, batch_size=16,
                                     seq_len=64, learning_rate=3e-3, seed=0)
    eagle = init_eagle_params(ecfg, jax.random.key(1))
    trained, _ = train_eagle(cfg, target, ecfg, eagle, steps=200,
                             batch_size=8, seq_len=48, learning_rate=5e-3,
                             cls_weight=1.0, key=jax.random.key(11))
    return cfg, ecfg, target, eagle, trained
