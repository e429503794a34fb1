"""Measured process-boundary (DCN-stand-in) overhead on the spec window.

VERDICT r3 #6: the 70B scaling dossier (docs/SCALING.md, tools/scaling_model.py)
rests on an ANALYTIC boundary-overhead model plus a 2-process correctness
smoke (tests/test_distributed.py). This tool turns the smoke into a
measurement: it times the SAME jitted speculative-window program (the real
``batch_spec_window``, prefill included for warmup) under three placements of
a 4-device CPU mesh and reports per-window wall time:

  1proc      one process, 4 local devices, mesh (data=2, model=2)
             — the no-boundary baseline (shared-memory "ICI" stand-in)
  dp_cross   2 processes x 2 devices, 'data' across the process boundary,
             'model' intra-process — the layout build_multihost_mesh
             produces and the 70B plan prescribes (TP on ICI, DP on DCN)
  tp_cross   2 processes x 2 devices, 'model' axis SPANNING both processes
             — the anti-pattern: every projection's all-reduce crosses the
             boundary; its slowdown is the measured penalty the dossier's
             "never let TP cross DCN" rule is worth

Localhost GRPC is cheaper than real DCN, so the absolute overheads are lower
bounds; the RATIO tp_cross/dp_cross isolates collective-count sensitivity
from transport cost (each tp_cross window crosses the boundary ~4x per layer
per step; dp_cross crosses only at dispatch).

Run (CPU only, ~2 min):  python tools/measure_dcn.py
Writes per-config JSON lines and a summary; numbers land in docs/SCALING.md.
"""
from __future__ import annotations

import json
import os
import socket
import subprocess
import sys
import textwrap

_WORKER = textwrap.dedent("""
    import json, os, sys, time
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=%(local)d"
    import jax
    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, os.environ["SPECDEC_REPO"])
    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import Mesh
    from specdec_tpu.core.config import ModelConfig
    from specdec_tpu.core.model import init_params
    from specdec_tpu.engine.batch_engine import batch_prefill, batch_spec_window
    from specdec_tpu.parallel.mesh import (
        DATA_AXIS, MODEL_AXIS, build_mesh, shard_params,
    )
    from specdec_tpu.parallel.distributed import init_distributed
    from specdec_tpu.sampling.processors import GreedyProcessor

    layout = os.environ["DCN_LAYOUT"]
    multi = init_distributed()
    devices = jax.devices()
    assert len(devices) == 4, devices

    if layout == "1proc":
        mesh = build_mesh(devices, tp=2, dp=2)
    else:
        by_proc = {}
        for d in devices:
            by_proc.setdefault(d.process_index, []).append(d)
        rows = [by_proc[p] for p in sorted(by_proc)]
        if layout == "dp_cross":     # model intra-process, data across
            arr = np.array(rows, dtype=object)          # [2 proc, 2 local]
            mesh = Mesh(arr, (DATA_AXIS, MODEL_AXIS))
        elif layout == "tp_cross":   # model SPANS the process boundary
            arr = np.array([[rows[0][0], rows[1][0]],
                            [rows[0][1], rows[1][1]]], dtype=object)
            mesh = Mesh(arr, (DATA_AXIS, MODEL_AXIS))
        else:
            raise ValueError(layout)

    # deliberately tiny: on a 4-core host the measurement target is the
    # ADDITIVE per-window boundary overhead (dispatch + collective latency),
    # so compute must be small enough not to contend with the transport's
    # own threads — report deltas, not ratios
    t_cfg = ModelConfig(
        vocab_size=512, hidden_size=128, intermediate_size=256,
        num_layers=2, num_heads=4, num_kv_heads=4, head_dim=32,
        max_position_embeddings=512, dtype=jnp.float32,
    )
    d_cfg = t_cfg.replace(num_layers=1)

    with mesh:
        target = shard_params(init_params(t_cfg, jax.random.key(0)), t_cfg,
                              mesh, replicated=False)
        drafter = shard_params(init_params(d_cfg, jax.random.key(1)), d_cfg,
                               mesh, replicated=True)
        B = 4
        rng = np.random.default_rng(0)
        prompts = jnp.asarray(rng.integers(1, 512, size=(B, 32)).astype(np.int32))
        lens = jnp.full((B,), 32, jnp.int32)
        proc = GreedyProcessor()
        state = batch_prefill(d_cfg, drafter, t_cfg, target, prompts, lens,
                              gen_len=400, gamma=4, processor=proc,
                              first_target=True, use_drafter=True,
                              eos_ids=(), key=jax.random.key(2))

        def window(st, key):
            return batch_spec_window(d_cfg, drafter, t_cfg, target, st,
                                     gamma=4, processor=proc, eos_ids=(),
                                     skip_sample_adjustment=False, key=key)

        # warmup/compile
        for i in range(3):
            state = window(state, jax.random.key(10 + i))
        np.asarray(state.pos)  # barrier

        # window() donates its state: chain one stream of windows (finished
        # slots still execute the same static-shape program, so steady-state
        # timing stays valid after sequences hit their length limits)
        REPS = 50
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            for i in range(REPS):
                state = window(state, jax.random.key(100 + i))
            np.asarray(state.pos)
            best = min(best, (time.time() - t0) / REPS)

        # pure-collective latency at a spec-window payload: one psum over the
        # 'model' axis of a [B, hidden] activation (the per-projection
        # all-reduce the TP layout issues ~4x/layer/forward)
        from functools import partial
        from jax.experimental.shard_map import shard_map
        from jax.sharding import PartitionSpec as P
        from jax import lax

        v = jnp.ones((B, 128), jnp.float32)

        @jax.jit
        @partial(shard_map, mesh=mesh, in_specs=P(None, MODEL_AXIS),
                 out_specs=P(None, MODEL_AXIS))
        def ring(v):
            def body(i, v):
                # psum yields an axis-invariant value; pvary re-marks it
                # varying so the fori carry type stays fixed
                return lax.pvary(lax.psum(v, MODEL_AXIS) * 0.5, MODEL_AXIS)
            return lax.fori_loop(0, 100, body, v)

        float(jnp.sum(ring(v)))  # compile (sum -> replicated, fetchable)
        t0 = time.time()
        float(jnp.sum(ring(v)))
        psum_us = (time.time() - t0) / 100 * 1e6

        if not multi or jax.process_index() == 0:
            print(json.dumps({"layout": layout, "window_ms": best * 1000,
                              "psum_us": psum_us}), flush=True)
""")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def run_layout(layout: str, repo: str) -> float:
    nproc = 1 if layout == "1proc" else 2
    local = 4 // nproc
    code = _WORKER % {"local": local}
    procs = []
    port = _free_port()
    for pid in range(nproc):
        env = dict(os.environ, SPECDEC_REPO=repo, DCN_LAYOUT=layout)
        env.pop("JAX_PLATFORMS", None)
        if nproc > 1:
            env.update(COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
                       NUM_PROCESSES=str(nproc), PROCESS_ID=str(pid))
        procs.append(subprocess.Popen([sys.executable, "-c", code], env=env,
                                      stdout=subprocess.PIPE,
                                      stderr=subprocess.PIPE, text=True))
    out0 = None
    for p in procs:
        out, err = p.communicate(timeout=600)
        if p.returncode != 0:
            raise RuntimeError(f"{layout} worker rc={p.returncode}:\n{err[-2000:]}")
        for line in out.strip().splitlines():
            if line.startswith('{"layout"'):
                out0 = json.loads(line)
    if out0 is None:
        raise RuntimeError(f"{layout}: no result line in worker output")
    print(json.dumps(out0), flush=True)
    return out0


def main():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    res = {lay: run_layout(lay, repo)
           for lay in ("1proc", "dp_cross", "tp_cross")}
    ms = {lay: r["window_ms"] for lay, r in res.items()}
    summary = {
        "window_ms": ms,
        "psum_us": {lay: round(r["psum_us"], 1) for lay, r in res.items()},
        "dp_boundary_delta_ms": round(ms["dp_cross"] - ms["1proc"], 3),
        "tp_cross_delta_ms": round(ms["tp_cross"] - ms["1proc"], 3),
        "cross_process_psum_delta_us": round(
            res["tp_cross"]["psum_us"] - res["1proc"]["psum_us"], 1),
    }
    print(json.dumps(summary, indent=1))


if __name__ == "__main__":
    main()
