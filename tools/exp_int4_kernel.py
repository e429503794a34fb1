"""INT4 fused dequant-matmul kernel rework experiments (round 4).

VERDICT r3 #1: the production 4-bit kernel (ops/quant_matmul.py) runs at ~29%
of the HBM streaming roofline at 8B (59.4 tok/s AR vs ~205 bound) because the
in-kernel decode costs ~6 VPU ops/weight (shift, mask, sub, i32->f32, absmax
mul, bf16 cast) against a VPU budget of ~2 ops/weight at roofline bandwidth.

Variants raced here (all numerically checked against an f32 oracle):

  cur          production kernel (interleaved k=8r+j packing)      ~6 op/wt
  floor        cur with 7/8 of the decode skipped (wrong numbers,
               same HBM+MXU traffic): the VPU-free speed ceiling
  planar_mul   planar packing (k = j*K8 + r): per-plane decode
               (nib-8)->bf16, per-weight absmax mul, 8 big dots    ~5 op/wt
  planar_block planar packing, decode nib->bf16 minus 8, absmax
               factored out of the per-weight path via per-64-row
               block dots scaled once per [M, TN] partial          ~4 op/wt
  pair         pair-plane packing: ONE shift+mask grabs TWO
               nibbles ((p >> 4j) & 0x000F000F), OR 0x4300_4300
               assembles TWO bf16(128+nib) values, pltpu.bitcast
               splits them into rows; sub 136, per-block dots      ~2.5 op/wt

The `pair` packing depends on pltpu.bitcast's row-split order, probed by
tools/exp_bitcast_probe.py:
  - block order (lo rows then hi rows)  -> planar8 pairs (j, j+4)
  - interleaved (lo at even rows)       -> pair-plane packing where word r
    nibbles (p, p+4) hold k = p*K/4 + 2r, p*K/4 + 2r + 1

Run detached on chip:
  setsid nohup python tools/exp_int4_kernel.py > /tmp/r4logs/exp_int4.log 2>&1 &
Optional argv: variant names (comma list), M=<rows>, shapes=1b|8b
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from specdec_tpu.quant.core import quantize_int4  # current container
from specdec_tpu.ops.quant_matmul import _nf4_matmul_2d, _int8_matmul_2d
from specdec_tpu.quant.core import quantize_int8

BLOCK = 64


def log(*a):
    print(*a, flush=True)


# ---------------------------------------------------------------------------
# packings (numpy, experiment-local)
# ---------------------------------------------------------------------------

def quant_blocks(w):
    """blockwise symmetric int4: codes 1..15, absmax pre-divided by 7."""
    w = np.asarray(w, np.float32)
    K, N = w.shape
    blocks = w.reshape(K // BLOCK, BLOCK, N)
    absmax = np.abs(blocks).max(axis=1)
    q = np.round(blocks / np.maximum(absmax[:, None, :], 1e-12) * 7.0)
    code = (np.clip(q, -7, 7) + 8).reshape(K, N).astype(np.uint32)
    return code, (absmax / 7.0).astype(np.float32)


def pack_planar8(code):
    """word r bits [4j,4j+4) = code[j*K8 + r]."""
    K, N = code.shape
    c = code.reshape(8, K // 8, N)
    out = np.zeros((K // 8, N), np.uint32)
    for j in range(8):
        out |= c[j] << (4 * j)
    return out.view(np.int32)


def pack_pair4(code):
    """word r bits [4p,..)=code[p*K/4 + 2r], bits [4p+16,..)=code[..+2r+1]."""
    K, N = code.shape
    c = code.reshape(4, K // 8, 2, N)  # [p, r, h, n]
    out = np.zeros((K // 8, N), np.uint32)
    for p in range(4):
        out |= c[p, :, 0] << (4 * p)
        out |= c[p, :, 1] << (4 * p + 16)
    return out.view(np.int32)


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------

def _k_planar_mul(xs_ref, p_ref, am_ref, out_ref, acc_ref):
    """xs [8, Mp, tk8] bf16; p [tk8, TN] i32; am [nb, 8, TN] f32
    (block-major, plane-minor: the middle dim is the FULL plane dim so the
    sublane tiling constraint is satisfiable at small nb)."""
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    packed = p_ref[:]
    tk8, TN = packed.shape
    nb = tk8 // BLOCK
    for j in range(8):
        nib = (packed >> (4 * j)) & 0xF
        amj = am_ref[:, j, :]                               # [nb, TN]
        am = jnp.broadcast_to(amj[:, None, :], (nb, BLOCK, TN))
        am = am.reshape(tk8, TN)
        w = ((nib - 8).astype(jnp.float32) * am).astype(jnp.bfloat16)
        acc_ref[:] += jnp.dot(xs_ref[j], w,
                              preferred_element_type=jnp.float32)

    @pl.when(k == pl.num_programs(1) - 1)
    def _():
        out_ref[:] = acc_ref[:].astype(out_ref.dtype)


def _k_planar_block(xs_ref, p_ref, am_ref, out_ref, acc_ref):
    """per-block dots: absmax applied to [M, TN] partials, not per weight."""
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    packed = p_ref[:]
    tk8, TN = packed.shape
    nb = tk8 // BLOCK
    for j in range(8):
        nib = (packed >> (4 * j)) & 0xF
        w = (nib - 8).astype(jnp.bfloat16)
        xj = xs_ref[j]
        for b in range(nb):
            pb = jnp.dot(xj[:, BLOCK * b:BLOCK * (b + 1)],
                         w[BLOCK * b:BLOCK * (b + 1), :],
                         preferred_element_type=jnp.float32)
            acc_ref[:] += pb * am_ref[b, j, :][None, :]

    @pl.when(k == pl.num_programs(1) - 1)
    def _():
        out_ref[:] = acc_ref[:].astype(out_ref.dtype)


def _k_pair(xq_ref, p_ref, am_ref, out_ref, acc_ref, *, order):
    """pairwise bf16 assembly + bitcast.

    order="block": planar8 packing; bitcast rows = [plane j | plane j+4].
      xq [8, Mp, tk8], am [nb, 8, TN] (block-major).
    order="interleave": pair4 packing; bitcast rows alternate lo/hi = k
      contiguous. xq [4, Mp, 2*tk8], am [2*nb, 4, TN].
    """
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    packed = p_ref[:]
    tk8, TN = packed.shape
    nb = tk8 // BLOCK
    for p in range(4):
        # one shift+mask grabs TWO nibbles (bits [4p,4p+4) and [4p+16,..));
        # OR of 0x4300_4300 assembles two bf16 "128+nib" values per word
        t = ((packed >> (4 * p)) & 0x000F000F) | 0x43004300
        w2 = pltpu.bitcast(t, jnp.bfloat16)                 # [2*tk8, TN]
        w = w2 - jnp.bfloat16(136.0)                        # nib - 8
        if order == "block":
            for h, j in ((0, p), (1, p + 4)):
                xj = xq_ref[j]
                for b in range(nb):
                    rows = slice(h * tk8 + BLOCK * b, h * tk8 + BLOCK * (b + 1))
                    pb = jnp.dot(xj[:, BLOCK * b:BLOCK * (b + 1)], w[rows, :],
                                 preferred_element_type=jnp.float32)
                    acc_ref[:] += pb * am_ref[b, j, :][None, :]
        else:
            xp = xq_ref[p]                                  # [Mp, 2*tk8]
            for b in range(2 * nb):
                pb = jnp.dot(xp[:, BLOCK * b:BLOCK * (b + 1)],
                             w[BLOCK * b:BLOCK * (b + 1), :],
                             preferred_element_type=jnp.float32)
                acc_ref[:] += pb * am_ref[b, p, :][None, :]

    @pl.when(k == pl.num_programs(1) - 1)
    def _():
        out_ref[:] = acc_ref[:].astype(out_ref.dtype)


def _k_pair_kouter(xq_ref, p_ref, am_ref, out_ref, *, order="interleave"):
    """pair decode, K-OUTER grid (n innermost): the same (k, n) tile sweeps
    packed[] in pure row-major order — fully sequential HBM reads — while
    the skinny [Mp, tile_n] f32 output blocks absorb the re-streaming cost
    (M=8: out traffic = K_t * N * Mp * 4 B, trivial next to the weights)."""
    k = pl.program_id(0)
    packed = p_ref[:]
    tk8, TN = packed.shape
    nb = tk8 // BLOCK
    acc = jnp.zeros(out_ref.shape, jnp.float32)
    for p in range(4):
        t = ((packed >> (4 * p)) & 0x000F000F) | 0x43004300
        w = pltpu.bitcast(t, jnp.bfloat16) - jnp.bfloat16(136.0)
        xp = xq_ref[p]
        for b in range(2 * nb):
            pb = jnp.dot(xp[:, BLOCK * b:BLOCK * (b + 1)],
                         w[BLOCK * b:BLOCK * (b + 1), :],
                         preferred_element_type=jnp.float32)
            acc += pb * am_ref[b, p, :][None, :]

    @pl.when(k == 0)
    def _():
        out_ref[:] = acc

    @pl.when(k > 0)
    def _():
        out_ref[:] += acc


def _k_block_kouter(xs_ref, p_ref, am_ref, out_ref):
    """planar_block decode with the K-outer grid (see _k_pair_kouter)."""
    k = pl.program_id(0)
    packed = p_ref[:]
    tk8, TN = packed.shape
    nb = tk8 // BLOCK
    acc = jnp.zeros(out_ref.shape, jnp.float32)
    for j in range(8):
        nib = (packed >> (4 * j)) & 0xF
        w = (nib - 8).astype(jnp.bfloat16)
        xj = xs_ref[j]
        for b in range(nb):
            pb = jnp.dot(xj[:, BLOCK * b:BLOCK * (b + 1)],
                         w[BLOCK * b:BLOCK * (b + 1), :],
                         preferred_element_type=jnp.float32)
            acc += pb * am_ref[b, j, :][None, :]

    @pl.when(k == 0)
    def _():
        out_ref[:] = acc

    @pl.when(k > 0)
    def _():
        out_ref[:] += acc


def _k_floor(xs_ref, p_ref, am_ref, out_ref, acc_ref):
    """decode plane 0 only, dot it 8x: HBM+MXU traffic of the real kernel
    with 1/8 the VPU decode. WRONG numbers — speed ceiling only."""
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    packed = p_ref[:]
    tk8, TN = packed.shape
    nb = tk8 // BLOCK
    nib = packed & 0xF
    amj = am_ref[:, 0, :]
    am = jnp.broadcast_to(amj[:, None, :], (nb, BLOCK, TN)).reshape(tk8, TN)
    w = ((nib - 8).astype(jnp.float32) * am).astype(jnp.bfloat16)
    for j in range(8):
        acc_ref[:] += jnp.dot(xs_ref[j], w,
                              preferred_element_type=jnp.float32)

    @pl.when(k == pl.num_programs(1) - 1)
    def _():
        out_ref[:] = acc_ref[:].astype(out_ref.dtype)


# ---------------------------------------------------------------------------
# callers
# ---------------------------------------------------------------------------

def _pad_rows(M):
    return max(8, ((M + 7) // 8) * 8)


@functools.partial(jax.jit, static_argnames=("kern", "layout", "tile_n",
                                             "tile_k", "parallel_n"))
def planar_matmul(x, packed, absmax, kern="planar_block", layout="planar8",
                  tile_n=512, tile_k=1024, parallel_n=False):
    """parallel_n marks the n grid dim "parallel" (each output stripe is
    independent — only k carries the accumulator) so Mosaic may pipeline
    stripes more aggressively (round-5 roofline-push candidate)."""
    M, K = x.shape
    K8, N = packed.shape
    assert K == 8 * K8 and K % (8 * BLOCK) == 0
    tk8 = tile_k // 8
    nb = tk8 // BLOCK
    assert tile_k % (8 * BLOCK) == 0 and K % tile_k == 0 and N % tile_n == 0
    Mp = _pad_rows(M)
    xp = jnp.pad(x, ((0, Mp - M), (0, 0))).astype(jnp.bfloat16)

    # absmax goes in BLOCK-MAJOR, plane-minor layout [blocks, planes, N]: the
    # middle (sublane) dim is then the FULL plane count, satisfying Mosaic's
    # block-shape tiling constraint at any nb
    if layout == "planar8":
        xs = xp.reshape(Mp, 8, K8).transpose(1, 0, 2)       # [8, Mp, K8]
        am = absmax.reshape(8, K8 // BLOCK, N).transpose(1, 0, 2)
        xs_spec = pl.BlockSpec((8, Mp, tk8), lambda n, k: (0, 0, k),
                               memory_space=pltpu.VMEM)
        am_spec = pl.BlockSpec((nb, 8, tile_n), lambda n, k: (k, 0, n),
                               memory_space=pltpu.VMEM)
    else:  # pair4: 4 quarter planes of 2*K8 columns each
        xs = xp.reshape(Mp, 4, 2 * K8).transpose(1, 0, 2)   # [4, Mp, K/4]
        am = absmax.reshape(4, K // (4 * BLOCK), N).transpose(1, 0, 2)
        xs_spec = pl.BlockSpec((4, Mp, 2 * tk8), lambda n, k: (0, 0, k),
                               memory_space=pltpu.VMEM)
        am_spec = pl.BlockSpec((2 * nb, 4, tile_n), lambda n, k: (k, 0, n),
                               memory_space=pltpu.VMEM)

    if kern.endswith("kouter"):
        # K-outer grid (n innermost): the packed tile walk is row-major —
        # sequential HBM reads — while the skinny [Mp, tile_n] f32 output
        # blocks absorb re-streaming (M=8: out traffic K_t*N*Mp*4 B, trivial)
        kfn = {"pair_kouter": _k_pair_kouter,
               "block_kouter": _k_block_kouter}[kern]
        xs_spec = pl.BlockSpec(xs_spec.block_shape, lambda k, n: (0, 0, k),
                               memory_space=pltpu.VMEM)
        am_spec = pl.BlockSpec(am_spec.block_shape, lambda k, n: (k, 0, n),
                               memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            kfn,
            grid=(K8 // tk8, N // tile_n),
            in_specs=[
                xs_spec,
                pl.BlockSpec((tk8, tile_n), lambda k, n: (k, n),
                             memory_space=pltpu.VMEM),
                am_spec,
            ],
            out_specs=pl.BlockSpec((Mp, tile_n), lambda k, n: (0, n),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((Mp, N), jnp.float32),
            cost_estimate=pl.CostEstimate(
                flops=2 * Mp * K * N,
                bytes_accessed=Mp * K * 2 + K8 * N * 4 + Mp * N * 4,
                transcendentals=0),
        )(xs, packed, am)
        return out[:M].astype(jnp.bfloat16)

    kfn = {"planar_mul": _k_planar_mul,
           "planar_block": _k_planar_block,
           "floor": _k_floor,
           "pair_block": functools.partial(_k_pair, order="block"),
           "pair_interleave": functools.partial(_k_pair, order="interleave"),
           }[kern]
    grid = (N // tile_n, K8 // tk8)
    cp = (pltpu.CompilerParams(dimension_semantics=("parallel", "arbitrary"))
          if parallel_n else None)
    out = pl.pallas_call(
        kfn,
        grid=grid,
        in_specs=[
            xs_spec,
            pl.BlockSpec((tk8, tile_n), lambda n, k: (k, n),
                         memory_space=pltpu.VMEM),
            am_spec,
        ],
        out_specs=pl.BlockSpec((Mp, tile_n), lambda n, k: (0, n),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, N), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((Mp, tile_n), jnp.float32)],
        compiler_params=cp,
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * K * N,
            bytes_accessed=Mp * K * 2 + K8 * N * 4 + Mp * N * 2,
            transcendentals=0),
    )(xs, packed, am)
    return out[:M]


# ---------------------------------------------------------------------------
# harness
# ---------------------------------------------------------------------------

SHAPES_8B = [("qkv", 4096, 6144), ("wo", 4096, 4096),
             ("gateup", 4096, 28672), ("down", 14336, 4096)]
SHAPES_1B = [("qkv", 2048, 2560), ("gateup", 2048, 11264),
             ("down", 5632, 2048), ("head", 2048, 32000)]


def time_call(fn, *args):
    @jax.jit
    def run(reps, *a):
        def body(i, s):
            out = fn(a[0] + s * 1e-30, *a[1:])
            return out[0, 0].astype(jnp.float32) * 1e-30
        return lax.fori_loop(0, reps, body, jnp.float32(0.0))

    t0 = time.time()
    float(run(2, *args))
    compile_s = time.time() - t0
    # adaptive reps: the ~35 ms tunnel dispatch jitter must be small next to
    # the differential window, so size the window to >=400 ms of device time
    # (fixed reps made sub-0.03 ms/call shapes pure noise — run-4's wo
    # column read 2.2 TB/s)
    t0 = time.time()
    float(run(200, *args))
    pilot = (time.time() - t0) / 200
    r1 = max(200, int(0.08 / max(pilot, 1e-7)))
    r2 = r1 + max(1000, int(0.4 / max(pilot, 1e-7)))
    best = float("inf")
    for _ in range(3):
        t0 = time.time(); float(run(r1, *args)); t1 = time.time() - t0
        t0 = time.time(); float(run(r2, *args)); t2 = time.time() - t0
        best = min(best, (t2 - t1) / (r2 - r1))
    return best * 1000, compile_s


def main():
    argv = sys.argv[1:]
    only = None
    M = 8
    shapes = SHAPES_8B
    for a in argv:
        if a.startswith("M="):
            M = int(a.split("=")[1])
        elif a.startswith("shapes="):
            shapes = SHAPES_1B if a.split("=")[1] == "1b" else SHAPES_8B
        else:
            only = a.split(",")
    log(f"backend={jax.default_backend()} M={M} "
        f"shapes={[s[0] for s in shapes]}")

    rng = np.random.default_rng(0)
    results = {}
    for sname, K, N in shapes:
        w = (rng.normal(size=(K, N)).astype(np.float32) * 0.02)
        code, absmax = quant_blocks(w)
        # oracle
        deq = ((code.astype(np.float32) - 8).reshape(K // BLOCK, BLOCK, N)
               * absmax[:, None, :]).reshape(K, N)
        x = rng.normal(size=(M, K)).astype(np.float32) * 0.5
        y_ref = x @ deq
        xd = jnp.asarray(x).astype(jnp.bfloat16)
        p8 = jnp.asarray(pack_planar8(code))
        p4 = jnp.asarray(pack_pair4(code))
        amd = jnp.asarray(absmax)
        qcur = quantize_int4(jnp.asarray(w))
        q8 = quantize_int8(jnp.asarray(w))

        int4_bytes = K * N // 2 + (K // BLOCK) * N * 4

        def check(name, y):
            y = np.asarray(y, np.float32)[:M]
            err = np.abs(y - y_ref).max()
            rel = err / (np.abs(y_ref).max() + 1e-9)
            tag = "OK" if rel < 0.02 else f"**BAD rel={rel:.4f}**"
            log(f"  {sname}/{name}: maxrel {rel:.5f} {tag}")
            return rel < 0.02

        # XLA-native S4: [K, N] int4 codes; dequant expressed for XLA fusion.
        # The scale expansion happens INSIDE the jitted fn (broadcast +
        # reshape, fusable) — a stored [K, N] bf16 scale matrix would stream
        # 2 B/weight and defeat the 4-bit bandwidth purpose.
        w_s4 = jnp.asarray(code.astype(np.int8) - 8).astype(jnp.int4)
        am_j = jnp.asarray(absmax)

        # weights passed as ARGUMENTS (closure-captured S4 constants hit a
        # jit const-lifting RecursionError on this backend)
        def xla_native(x_, w4, am):
            am_exp = jnp.broadcast_to(am[:, None, :], (K // BLOCK, BLOCK, N)
                                      ).reshape(K, N)
            wd = w4.astype(jnp.bfloat16) * am_exp.astype(jnp.bfloat16)
            return x_ @ wd

        def xla_block(x_, w4, am):
            xb = x_.reshape(M, K // BLOCK, BLOCK)
            wb = w4.reshape(K // BLOCK, BLOCK, N).astype(jnp.bfloat16)
            part = jnp.einsum("mbk,bkn->bmn", xb, wb,
                              preferred_element_type=jnp.float32)
            return jnp.einsum("bmn,bn->mn", part, am).astype(jnp.bfloat16)

        cases = {
            "cur": (lambda x_: _nf4_matmul_2d(x_, qcur.packed, qcur.absmax,
                                              codec="int4"),),
            "floor": (lambda x_: planar_matmul(x_, p8, amd, kern="floor"),),
            "floor_k2048": (lambda x_: planar_matmul(
                x_, p8, amd, kern="floor", tile_k=2048),),
            "planar_mul": (lambda x_: planar_matmul(x_, p8, amd,
                                                    kern="planar_mul"),),
            "planar_block": (lambda x_: planar_matmul(x_, p8, amd,
                                                      kern="planar_block"),),
            "pair_interleave": (lambda x_: planar_matmul(
                x_, p4, amd, kern="pair_interleave", layout="pair4"),),
            "pair_k2048": (lambda x_: planar_matmul(
                x_, p4, amd, kern="pair_interleave", layout="pair4",
                tile_k=2048),),
            "pair_n1024": (lambda x_: planar_matmul(
                x_, p4, amd, kern="pair_interleave", layout="pair4",
                tile_n=1024),),
            "block_n1024": (lambda x_: planar_matmul(
                x_, p8, amd, kern="planar_block", tile_n=1024),),
            "block_n2048": (lambda x_: planar_matmul(
                x_, p8, amd, kern="planar_block", tile_n=2048),),
            "pair_n1024k2048": (lambda x_: planar_matmul(
                x_, p4, amd, kern="pair_interleave", layout="pair4",
                tile_n=1024, tile_k=2048),),
            "pair_kouter": (lambda x_: planar_matmul(
                x_, p4, amd, kern="pair_kouter", layout="pair4"),),
            "pair_kouter_n1024": (lambda x_: planar_matmul(
                x_, p4, amd, kern="pair_kouter", layout="pair4",
                tile_n=1024),),
            "block_kouter": (lambda x_: planar_matmul(
                x_, p8, amd, kern="block_kouter"),),
            "block_kouter_n1024": (lambda x_: planar_matmul(
                x_, p8, amd, kern="block_kouter", tile_n=1024),),
            "pair_kouter_n1024k2048": (lambda x_: planar_matmul(
                x_, p4, amd, kern="pair_kouter", layout="pair4",
                tile_n=1024, tile_k=2048),),
            "pair_kouter_n2048": (lambda x_: planar_matmul(
                x_, p4, amd, kern="pair_kouter", layout="pair4",
                tile_n=2048),),
            "pair_kouter_n2048k2048": (lambda x_: planar_matmul(
                x_, p4, amd, kern="pair_kouter", layout="pair4",
                tile_n=2048, tile_k=2048),),
            # --- round-5 roofline-push candidates (VERDICT r4 #8) ---
            "pair_par_n1024k2048": (lambda x_: planar_matmul(
                x_, p4, amd, kern="pair_interleave", layout="pair4",
                tile_n=1024, tile_k=2048, parallel_n=True),),
            "pair_n2048k2048": (lambda x_: planar_matmul(
                x_, p4, amd, kern="pair_interleave", layout="pair4",
                tile_n=2048, tile_k=2048),),
            "pair_n1024k4096": (lambda x_: planar_matmul(
                x_, p4, amd, kern="pair_interleave", layout="pair4",
                tile_n=1024, tile_k=(4096 if K % 4096 == 0 else 2048)),),
            "pair_par_n1024k4096": (lambda x_: planar_matmul(
                x_, p4, amd, kern="pair_interleave", layout="pair4",
                tile_n=1024, tile_k=(4096 if K % 4096 == 0 else 2048),
                parallel_n=True),),
            "pair_n2048k4096": (lambda x_: planar_matmul(
                x_, p4, amd, kern="pair_interleave", layout="pair4",
                tile_n=2048, tile_k=(4096 if K % 4096 == 0 else 2048)),),
            "int4_xla_s4": (xla_native, w_s4, am_j),
            "int4_xla_blk": (xla_block, w_s4, am_j),
            "int8": (lambda x_: _int8_matmul_2d(x_, q8.q, q8.scale),),
        }
        for name, (fn, *extra) in cases.items():
            if only and name not in only:
                continue
            try:
                y = fn(xd, *extra)
                if "floor" not in name and name != "int8":
                    if not check(name, y):
                        results.setdefault(name, {})[sname] = float("nan")
                        continue
                ms, cs = time_call(fn, xd, *extra)
                gbps = int4_bytes / (ms * 1e-3) / 1e9
                log(f"  {sname}/{name}: {ms:.4f} ms  ({gbps:.0f} GB/s int4)"
                    f"  [compile {cs:.0f}s]")
                results.setdefault(name, {})[sname] = ms
            except Exception as e:
                log(f"  {sname}/{name} FAILED: {type(e).__name__}: "
                    f"{str(e)[:300]}")
                results.setdefault(name, {})[sname] = float("nan")

    log("\n=== summary ms/call (M=%d) ===" % M)
    names = [s[0] for s in shapes]
    log("variant".ljust(17) + "".join(n.ljust(10) for n in names) + "fwd_ms")
    nlayer = 32 if shapes is SHAPES_8B else 22
    for vname, per in results.items():
        # implied per-layer cost x layers (wo folded for 1b shapes)
        if shapes is SHAPES_8B:
            fwd = nlayer * sum(per.get(n, float("nan")) for n in names)
        else:
            fwd = (nlayer * (per.get("qkv", 0) * (1 + (2048 * 2048) /
                                                  (2048 * 2560))
                             + per.get("gateup", 0) + per.get("down", 0))
                   + per.get("head", 0))
        row = vname.ljust(17) + "".join(
            f"{per.get(n, float('nan')):.4f}".ljust(10) for n in names)
        log(row + f"{fwd:.2f} -> {1000 / fwd:.1f} tok/s ceiling")


if __name__ == "__main__":
    main()
