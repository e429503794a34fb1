"""Device-trace an INT4 AR step to find the e2e-vs-kernel-ceiling gap.

8B INT4 AR measures ~14.9 ms/token while kernel micro + int8-measured
overhead predict ~10. This captures a jax.profiler device trace of a
32-step AR run on the 1.1B INT4 model (same structure, faster build) and
reports what trace artifacts exist; if the tunneled backend produces no
device timeline, that fact gets recorded and the gap investigation falls
back to ablation.

Run: setsid nohup python tools/exp_profile_ar.py > /tmp/r4logs/exp_prof.log 2>&1 &
"""
import glob
import os
import sys
import time

import jax
import numpy as np

sys.path.insert(0, "/root/repo")


def log(*a):
    print(*a, flush=True)


def main():
    from bench import build_pair
    from specdec_tpu.sampling.base_decoding import autoregressive_generate
    from specdec_tpu.sampling.processors import GreedyProcessor

    log(f"backend={jax.default_backend()}")
    t_cfg, d_cfg, target, drafter = build_pair(quant="int4")
    prompt = [int(t) for t in np.random.default_rng(0).integers(
        1, 1000, size=60)]

    # warm (compile outside the trace)
    out = autoregressive_generate(prompt, t_cfg, target, max_gen_len=32,
                                  logits_processor=GreedyProcessor(),
                                  eos_tokens_id=())
    log(f"warm AR ok ({len(out)} tokens)")

    trace_dir = "/tmp/specdec_trace_r4"
    os.system(f"rm -rf {trace_dir}")
    t0 = time.time()
    try:
        jax.profiler.start_trace(trace_dir)
        out = autoregressive_generate(prompt, t_cfg, target, max_gen_len=32,
                                      logits_processor=GreedyProcessor(),
                                      eos_tokens_id=())
        jax.profiler.stop_trace()
        log(f"traced AR: {time.time() - t0:.2f}s for 32 tokens")
    except Exception as e:
        log(f"profiler failed: {type(e).__name__}: {e}")
        return
    files = glob.glob(f"{trace_dir}/**/*", recursive=True)
    for f in sorted(files):
        if os.path.isfile(f):
            log(f"  {os.path.getsize(f):>10d}  {f}")

    # try to summarize the xplane if the helper lib exists
    xs = [f for f in files if f.endswith(".xplane.pb")]
    if xs:
        try:
            from tensorflow.python.profiler import profiler_client  # noqa
            log("tensorflow profiler client available")
        except Exception:
            log("no tensorflow profiler tooling in env")
        try:
            from xprof_pb2 import XSpace  # unlikely
        except Exception:
            # minimal protobuf-less scan: count event names in raw bytes
            import collections
            blob = open(xs[0], "rb").read()
            log(f"xplane size {len(blob)} bytes")
            # pallas kernel names appear as plain strings in the pb
            for needle in (b"fusion", b"custom-call", b"_pair_kernel",
                           b"_int8_kernel", b"dynamic", b"copy",
                           b"transpose", b"scan", b"while"):
                log(f"  {needle.decode()}: {blob.count(needle)} hits")


if __name__ == "__main__":
    main()
