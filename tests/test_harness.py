"""End-to-end harness tests: env-var config → models → benchmark loop →
JSON artifacts, on synthetic tiny models. Also unit-tests the telemetry
energy integration against hand-computed trapezoids."""
import json
import os

import pytest

from specdec_tpu.engine.monitor import (
    MonitorResults, PowerSnapshot, TelemetryMonitor,
)


def _write_sharegpt(tmp_path):
    d = tmp_path / "sharegpt"
    d.mkdir()
    rows = [
        {"conversations": [
            {"from": "human", "value": "Tell me about speculative decoding."},
            {"from": "gpt", "value": "It drafts then verifies."},
        ]},
        {"conversations": [
            {"from": "human", "value": "What is a TPU systolic array for?"},
        ]},
    ]
    with open(d / "sharegpt_gpt4.jsonl", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    return str(d)


@pytest.fixture
def bench_env(tmp_path, monkeypatch):
    monkeypatch.setenv("TARGET_MODEL", "synthetic:tiny")
    monkeypatch.setenv("DRAFTER_MODEL", "synthetic:tiny")
    monkeypatch.setenv("GAMMA_VALUE", "3")
    monkeypatch.setenv("GENERATION_LENGTH", "8")
    monkeypatch.setenv("NUM_PROMPTS", "2")
    monkeypatch.setenv("ENABLE_BATCH", "false")
    monkeypatch.setenv("ENABLE_GPU_MONITOR", "true")
    monkeypatch.setenv("GPU_MONITOR_INTERVAL", "0.05")
    monkeypatch.setenv("SHAREGPT_DIR", _write_sharegpt(tmp_path))
    monkeypatch.setenv("OUTPUT_FILE", str(tmp_path / "results.json"))
    monkeypatch.setenv("MODEL_DTYPE", "float32")
    return tmp_path


def test_benchmark_runner_speculative(bench_env, monkeypatch):
    monkeypatch.setenv("INFERENCE_METHOD", "speculative")
    from specdec_tpu.engine.benchmark_runner import BenchmarkRunner

    runner = BenchmarkRunner()
    res = runner.spec_results
    assert res.total_requests == 2
    assert res.total_tokens > 0
    assert res.overall_throughput > 0

    # the reference README's documented 4-artifact set (ref README.md:141-145):
    # combined <base>.json + per-method + _gpu
    combined_file = bench_env / "results.json"
    assert combined_file.exists()
    data = json.loads(combined_file.read_text())
    assert "speculative" in data
    d = data["speculative"]
    for key in ("total_requests", "overall_throughput", "avg_ttft",
                "avg_latency", "avg_acceptance_rate", "batches"):
        assert key in d
    req = d["batches"][0]["requests"][0]
    for key in ("prompt_tokens", "generated_tokens", "ttft", "total_latency",
                "acceptance_rate"):
        assert key in req
    assert "gpu_monitoring" in data
    method_file = bench_env / "results_speculative.json"
    assert method_file.exists()
    # per-method file holds the method results ALONE (documented contract)
    assert json.loads(method_file.read_text())["method"] == "speculative"
    gpu_file = bench_env / "results_gpu.json"
    assert gpu_file.exists()


def test_benchmark_runner_target_ar_batch(bench_env, monkeypatch):
    monkeypatch.setenv("INFERENCE_METHOD", "target_ar")
    monkeypatch.setenv("ENABLE_BATCH", "true")
    monkeypatch.setenv("BATCH_SIZE", "2")
    from specdec_tpu.engine.benchmark_runner import BenchmarkRunner

    runner = BenchmarkRunner()
    res = runner.target_results
    assert res.total_requests == 2
    assert res.total_batches == 1  # one batch of 2 (count mode caps exactly)
    out = bench_env / "results_target.json"  # README name (not _target_ar)
    assert out.exists()
    assert json.loads(out.read_text())["method"] == "target_ar"
    assert (bench_env / "results.json").exists()


def test_benchmark_runner_ngram(bench_env, monkeypatch):
    monkeypatch.setenv("INFERENCE_METHOD", "ngram")
    from specdec_tpu.engine.benchmark_runner import BenchmarkRunner

    runner = BenchmarkRunner()
    res = runner.spec_results
    assert res.method == "ngram"
    assert res.total_requests == 2
    assert (bench_env / "results_ngram.json").exists()


def test_benchmark_runner_ngram_device(bench_env, monkeypatch):
    """NGRAM_DEVICE=true routes the ngram method through the fully-jitted
    device-table NASD (table carried across requests)."""
    monkeypatch.setenv("INFERENCE_METHOD", "ngram")
    monkeypatch.setenv("NGRAM_DEVICE", "true")
    monkeypatch.setenv("ENABLE_BATCH", "true")
    monkeypatch.setenv("BATCH_SIZE", "2")
    from specdec_tpu.engine.benchmark_runner import BenchmarkRunner
    from specdec_tpu.ngram import DeviceNGramTable

    runner = BenchmarkRunner()
    res = runner.spec_results
    assert res.method == "ngram"
    assert res.total_requests == 2
    assert res.total_tokens > 0
    assert isinstance(runner.ngram, DeviceNGramTable)


def test_trapezoidal_energy_hand_case():
    r = MonitorResults()
    r.snapshots = [PowerSnapshot(0.0, 100.0), PowerSnapshot(1.0, 200.0),
                   PowerSnapshot(3.0, 100.0)]
    # (100+200)/2*1 + (200+100)/2*2 = 150 + 300 = 450 J
    assert abs(r.energy_joules - 450.0) < 1e-9
    r.total_tokens = 900
    assert abs(r.tokens_per_joule - 2.0) < 1e-9
    assert abs(r.energy_wh - 450.0 / 3600) < 1e-12


def test_monitor_thread_collects_and_stop_returns_results():
    calls = []

    class FakeSampler:
        source = "fake"
        num_chips = 1

        def sample(self):
            calls.append(1)
            return PowerSnapshot(len(calls) * 0.1, 50.0)

    mon = TelemetryMonitor(sampler=FakeSampler(), interval_s=0.02,
                           perf_callback=lambda: {"total_tokens": 123,
                                                  "accepted_tokens": 45})
    mon.start()
    import time
    time.sleep(0.15)
    results = mon.stop()  # must RETURN results (ref bug fixed)
    assert results is not None
    assert len(results.snapshots) >= 2
    assert results.total_tokens == 123
    assert results.accepted_tokens == 45
    assert results.power_source == "fake"


def test_jax_device_sampler_degrades_gracefully():
    """JaxDeviceSampler must never raise on hosts without telemetry and must
    always label its sources; the TDP power estimate is the guaranteed floor
    (ref: engine/gpu_monitor.py:360-402 reads nvidia-smi; no TPU analog)."""
    from specdec_tpu.engine.monitor import JaxDeviceSampler, default_sampler

    s = JaxDeviceSampler()
    assert "tdp_estimate" in s.source  # power is always estimate-labeled
    snap = s.sample()
    assert snap is not None and snap.power_w >= 0.0
    assert 0.0 <= snap.memory_pct <= 100.0
    assert snap.utilization_pct >= 0.0
    # memory/utilization only claimed as sources when the probe found them
    if "jax_memory_stats" not in s.source:
        assert snap.memory_pct == 0.0
    d = default_sampler()
    assert hasattr(d, "sample") and hasattr(d, "source")


def test_monitor_results_memory_fields_serialized():
    r = MonitorResults()
    r.snapshots = [PowerSnapshot(0.0, 100.0, memory_pct=40.0),
                   PowerSnapshot(1.0, 100.0, memory_pct=60.0)]
    assert abs(r.avg_memory_pct - 50.0) < 1e-9
    assert abs(r.peak_memory_pct - 60.0) < 1e-9
    d = r.to_dict()
    assert d["avg_memory_pct"] == r.avg_memory_pct
    assert d["peak_memory_pct"] == r.peak_memory_pct


def test_vllm_compat_config_from_env(monkeypatch):
    from specdec_tpu.engine.vllm_compat import (
        VLLMConfig, create_vllm_config_from_env, is_vllm_available,
    )
    monkeypatch.setenv("TARGET_MODEL", "synthetic:tiny")
    monkeypatch.setenv("DRAFTER_MODEL", "synthetic:tiny")
    monkeypatch.setenv("VLLM_TENSOR_PARALLEL_SIZE", "4")
    monkeypatch.setenv("VLLM_MAX_MODEL_LEN", "2048")
    monkeypatch.setenv("VLLM_DTYPE", "half")
    monkeypatch.setenv("VLLM_ENABLE_SPECULATIVE", "true")
    monkeypatch.setenv("VLLM_NUM_SPECULATIVE_TOKENS", "7")
    cfg = create_vllm_config_from_env()
    assert isinstance(cfg, VLLMConfig)
    assert cfg.tensor_parallel_size == 4
    assert cfg.max_model_len == 2048
    assert cfg.dtype == "bfloat16"  # half maps to TPU-native bf16
    assert cfg.speculative_config["num_speculative_tokens"] == 7
    assert is_vllm_available()


def test_vllm_compat_manager_generates(monkeypatch):
    from specdec_tpu.engine.vllm_compat import (
        VLLMConfig, VLLMEngineManager,
    )
    cfg = VLLMConfig(model="synthetic:tiny", dtype="float32",
                     speculative_config={"model": "synthetic:tiny",
                                         "num_speculative_tokens": 3})
    mgr = VLLMEngineManager(cfg)
    assert mgr.initialize(num_slots=2)
    out = mgr.generate("hello", max_tokens=6)
    assert isinstance(out, str)
    outs = mgr.generate_batch(["a", "bb"], max_tokens=5)
    assert len(outs) == 2


def test_gamma_tuner_model():
    from specdec_tpu.engine.gamma_tuner import (
        best_gamma, expected_speedup, expected_tokens_per_window,
    )
    # hand-computed: a=0.5, gamma=2 → (1-0.125)/0.5 = 1.75 tokens
    assert abs(expected_tokens_per_window(0.5, 2) - 1.75) < 1e-9
    # zero acceptance → always exactly the one resampled token
    assert expected_tokens_per_window(0.0, 5) == 1.0
    # high acceptance + cheap drafter → larger gamma wins
    g_hi, s_hi = best_gamma(0.9, cost_ratio=0.05)
    g_lo, s_lo = best_gamma(0.3, cost_ratio=0.05)
    assert g_hi > g_lo
    assert s_hi > s_lo > 0
    # expensive drafter can make speculation not worth it
    assert expected_speedup(0.5, 4, cost_ratio=1.0) < 1.0


def test_vllm_compat_pp_folds_into_tp_with_warning():
    """pipeline_parallel_size is not silently dropped (ref forwards it to
    vLLM, engine/vllm_engine.py:45,94): the native engine folds the stages
    into tensor parallelism and warns."""
    import warnings

    from specdec_tpu.engine.vllm_compat import VLLMConfig, VLLMEngineManager
    cfg = VLLMConfig(model="synthetic:tiny", dtype="float32",
                     pipeline_parallel_size=2)
    mgr = VLLMEngineManager(cfg)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        assert mgr.initialize(num_slots=2)
    assert any("pipeline_parallel_size" in str(x.message) for x in w)


def test_vllm_compat_initialize_honors_max_tokens(monkeypatch):
    from specdec_tpu.engine.vllm_compat import VLLMConfig, VLLMEngineManager
    cfg = VLLMConfig(model="synthetic:tiny", dtype="float32")
    mgr = VLLMEngineManager(cfg)
    assert mgr.initialize(num_slots=2, max_new_tokens=37)
    assert mgr.batcher.default_max_new == 37
    # env MAX_TOKENS (the reference harness's generation-length var) is the
    # default when the caller does not pass one
    monkeypatch.setenv("MAX_TOKENS", "19")
    mgr2 = VLLMEngineManager(cfg)
    assert mgr2.initialize(num_slots=2)
    assert mgr2.batcher.default_max_new == 19


def test_gamma_tuner_calibrated_against_measured_sweep():
    """The tuner must reproduce the on-chip gen-512 int8 sweep: reference
    acceptance 0.811 at gamma 8 inverts to a ~0.95 conditional, and with
    the measured window overhead (0.57 AR-steps) the predicted speedup at
    gamma 10 lands within 5% of the measured 2.56x, with the optimum in
    the measured 10-13 band (round-1's uncalibrated call predicted 4)."""
    from specdec_tpu.engine.gamma_tuner import (
        best_gamma, conditional_from_reference_rate, expected_speedup,
    )
    a = conditional_from_reference_rate(0.811, 8)
    assert 0.93 < a < 0.97, a
    s10 = expected_speedup(a, 10, 4 / 22, window_overhead=0.57)
    assert abs(s10 - 2.56) / 2.56 < 0.05, s10
    # the model's optimum sits on a flat top (2.64-2.66x across 12-16);
    # measured decays past 12 only because acceptance itself falls with
    # gamma, which the constant-a model doesn't capture
    g, s = best_gamma(a, 4 / 22, window_overhead=0.57)
    assert 10 <= g <= 16, (g, s)
    assert s > expected_speedup(a, 4, 4 / 22, window_overhead=0.57) * 1.25


def test_benchmark_runner_eagle_drafter(bench_env, monkeypatch):
    """DRAFTER_MODEL=eagle:<depth>@<steps> builds + trains an EAGLE drafter
    at load and dispatches the speculative method through the batched EAGLE
    engine."""
    monkeypatch.setenv("INFERENCE_METHOD", "speculative")
    monkeypatch.setenv("DRAFTER_MODEL", "eagle:1@5")
    monkeypatch.setenv("EAGLE_TRAIN_BATCH", "2")
    monkeypatch.setenv("EAGLE_TRAIN_SEQ", "32")
    from specdec_tpu.engine.benchmark_runner import BenchmarkRunner

    runner = BenchmarkRunner()
    assert runner.eagle_drafter
    assert "fc_w" in runner.drafter_params
    res = runner.spec_results
    assert res.total_requests == 2
    assert res.total_tokens > 0


def test_vllm_compat_eagle_drafter(monkeypatch):
    """speculative_config.model = eagle:<spec> routes the manager onto the
    EAGLE batcher (an eagle head is not a standalone drafter model)."""
    from specdec_tpu.engine.vllm_compat import VLLMConfig, VLLMEngineManager
    from specdec_tpu.serve.eagle_scheduler import EagleContinuousBatcher

    monkeypatch.setenv("EAGLE_TRAIN_BATCH", "2")
    monkeypatch.setenv("EAGLE_TRAIN_SEQ", "16")
    cfg = VLLMConfig(model="synthetic:tiny", dtype="float32",
                     speculative_config={"model": "eagle:1@2",
                                         "num_speculative_tokens": 3})
    mgr = VLLMEngineManager(cfg)
    mgr.initialize(num_slots=1, max_new_tokens=8)
    assert isinstance(mgr.batcher, EagleContinuousBatcher)
    out = mgr.generate("hello", max_tokens=8)
    assert isinstance(out, str) and len(out) > 0
