"""specdec_tpu — a TPU-native speculative-decoding inference & benchmarking framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
``dadiaokua/speculative-decoding`` (PyTorch/CUDA reference), redesigned TPU-first:

- draft-gamma-then-verify speculative decoding as a single jit-compiled device
  program (``lax.while_loop``), no per-token host sync
- static-shape slotted KV caches with per-sequence length counters; "cache
  pruning" is length arithmetic, never slicing
- sampling stack (greedy / multinomial / top-k / nucleus / combined) as pure
  functions over (logits, key)
- n-gram-assisted drafting (model-free proposals) with host-side backoff store
- weight-only INT8 / NF4 quantization with fused Pallas dequant-matmul kernels
- GSPMD parallelism: tensor-sharded target over a device mesh, replicated or
  sub-mesh drafter
- benchmark harness with the reference's metrics schema (TTFT, latency,
  throughput, acceptance rate, power/energy integration)
"""

__version__ = "0.1.0"
