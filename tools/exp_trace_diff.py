"""Trace one W=4 window dispatch of the slotted AND hybrid batchers and
print both device-plane op summaries (tools/xplane_summary.py parser) —
the per-op diff names the hybrid residual's components exactly.

Motivated by the v3 finding that the RMW write did not move the +3.7 ms
paged-target delta: the hybrid trace shows two full pool-STACK copies
(bf16[22,202,4,64,64], ~145 MB each) per window plus 22 paged-attention
kernel calls; whether the slotted window pays equivalent cache-stack
copies decides whether the copies are paged-specific.

Run on chip:
  PYTHONPATH=/root/repo setsid nohup python tools/exp_trace_diff.py \
      > /tmp/r5logs/trace_diff.log 2>&1 &
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from exp_paged_residual import GAMMA, W1, build_batcher, build_models, log
from xplane_summary import summarize


def trace_one(b, t_cfg, d_cfg, target, drafter, tag):
    from specdec_tpu.engine.batch_engine import batch_spec_windows

    st = jax.tree.map(jnp.array, b.state)
    out = batch_spec_windows(d_cfg, drafter, t_cfg, target, st, GAMMA,
                             b.processor, (), False, jax.random.key(5), W1)
    _ = np.asarray(out.pos)          # warm (program compiled by b.step too)

    trace_dir = f"/tmp/specdec_trace_diff_{tag}"
    os.system(f"rm -rf {trace_dir}")
    st = jax.tree.map(jnp.array, b.state)
    jax.profiler.start_trace(trace_dir)
    out = batch_spec_windows(d_cfg, drafter, t_cfg, target, st, GAMMA,
                             b.processor, (), False, jax.random.key(6), W1)
    _ = np.asarray(out.pos)
    jax.profiler.stop_trace()
    log(f"\n===== {tag} window trace (W={W1}) =====")
    summarize(trace_dir, top_n=24)


def main():
    if os.getenv("RESIDUAL_CPU"):
        jax.config.update("jax_platforms", "cpu")
    log(f"backend={jax.default_backend()}")
    V, t_cfg, d_cfg, target, drafter = build_models()
    for kind in ("slotted", "hybrid"):
        b = build_batcher(V, t_cfg, d_cfg, target, drafter, kind)
        trace_one(b, t_cfg, d_cfg, target, drafter, kind)
        del b


if __name__ == "__main__":
    main()
