"""Prove the streaming checkpoint loader works at ladder scale.

Writes an 8B-shaped (or any preset-shaped) SHARDED safetensors checkpoint —
synthetic bf16 weights, llama3 rope_scaling set, one shard per layer, exactly
the layout real Llama-3.1-class checkpoints ship — then loads it through
core/stream_loader.load_hf_streamed direct-to-INT4 in a fresh subprocess and
reports peak host RSS. VERDICT r2 #1 acceptance: 8B INT4 load < 8 GB RSS
(the old torch path needed ~32 GB twice).

Usage:
    python tools/stream_load_check.py --preset llama-8b --quant int4
    python tools/stream_load_check.py --load-only <dir> --quant int4  # inner
"""
from __future__ import annotations

import argparse
import json
import os
import resource
import subprocess
import sys
import time

import numpy as np


def write_checkpoint(preset: str, out_dir: str) -> str:
    """Stream-write a sharded synthetic checkpoint: peak RSS = one layer."""
    import ml_dtypes

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from safetensors.numpy import save_file

    from specdec_tpu.engine.model_loader import SYNTHETIC_PRESETS

    shapes = SYNTHETIC_PRESETS[preset]
    D, I = shapes["hidden_size"], shapes["intermediate_size"]
    L, H = shapes["num_layers"], shapes["num_heads"]
    Hk, Dh, V = shapes["num_kv_heads"], shapes["head_dim"], shapes["vocab_size"]

    os.makedirs(out_dir, exist_ok=True)
    cfg = {
        "architectures": ["LlamaForCausalLM"], "model_type": "llama",
        "vocab_size": V, "hidden_size": D, "intermediate_size": I,
        "num_hidden_layers": L, "num_attention_heads": H,
        "num_key_value_heads": Hk, "head_dim": Dh,
        "max_position_embeddings": 131072,
        "rope_theta": shapes.get("rope_theta", 500000.0),
        "rope_scaling": {  # llama-3.1's shipped values
            "rope_type": "llama3", "factor": 8.0, "low_freq_factor": 1.0,
            "high_freq_factor": 4.0,
            "original_max_position_embeddings": 8192,
        },
        "rms_norm_eps": 1e-5, "tie_word_embeddings": False,
        "torch_dtype": "bfloat16", "hidden_act": "silu",
        "bos_token_id": 1, "eos_token_id": 2,
    }
    with open(os.path.join(out_dir, "config.json"), "w") as f:
        json.dump(cfg, f, indent=1)

    rng = np.random.default_rng(8)
    bf16 = ml_dtypes.bfloat16

    def t(*shape, scale=0.02):
        return (rng.standard_normal(shape, dtype=np.float32) * scale).astype(bf16)

    n_shards = L + 1
    weight_map = {}

    def shard_name(s):
        return f"model-{s + 1:05d}-of-{n_shards:05d}.safetensors"

    total_bytes = 0
    for i in range(L):
        p = f"model.layers.{i}."
        shard = {
            p + "input_layernorm.weight": np.ones((D,), bf16),
            p + "post_attention_layernorm.weight": np.ones((D,), bf16),
            p + "self_attn.q_proj.weight": t(H * Dh, D),
            p + "self_attn.k_proj.weight": t(Hk * Dh, D),
            p + "self_attn.v_proj.weight": t(Hk * Dh, D),
            p + "self_attn.o_proj.weight": t(D, H * Dh),
            p + "mlp.gate_proj.weight": t(I, D),
            p + "mlp.up_proj.weight": t(I, D),
            p + "mlp.down_proj.weight": t(D, I),
        }
        save_file(shard, os.path.join(out_dir, shard_name(i)))
        weight_map.update({k: shard_name(i) for k in shard})
        total_bytes += sum(v.nbytes for v in shard.values())
    shard = {
        "model.embed_tokens.weight": t(V, D),
        "model.norm.weight": np.ones((D,), bf16),
        "lm_head.weight": t(V, D),
    }
    save_file(shard, os.path.join(out_dir, shard_name(L)))
    weight_map.update({k: shard_name(L) for k in shard})
    total_bytes += sum(v.nbytes for v in shard.values())
    with open(os.path.join(out_dir, "model.safetensors.index.json"), "w") as f:
        json.dump({"metadata": {"total_size": total_bytes},
                   "weight_map": weight_map}, f)
    print(f"wrote {total_bytes / 1e9:.1f} GB checkpoint "
          f"({n_shards} shards) to {out_dir}")
    return out_dir


def load_and_report(path: str, quant: str, dtype_name: str):
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import threading

    import jax
    import jax.numpy as jnp

    from specdec_tpu.core.stream_loader import load_hf_streamed

    t0 = time.time()

    def sample_rss():  # phase trace: correlate RSS growth with load time
        while not done.is_set():
            rss = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
            print(f"  rss@{time.time() - t0:6.1f}s: {rss:.2f} GB", flush=True)
            done.wait(5.0)

    done = threading.Event()
    threading.Thread(target=sample_rss, daemon=True).start()
    cfg, params = load_hf_streamed(
        path, dtype=getattr(jnp, dtype_name), quantization=quant)
    jax.block_until_ready(jax.tree.leaves(params))
    dt = time.time() - t0
    done.set()
    rss_gb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
    dev_gb = sum(x.nbytes for x in jax.tree.leaves(params)) / 1e9
    print(json.dumps({
        "preset_layers": cfg.num_layers, "quant": quant,
        "rope_scaling": list(cfg.rope_scaling),
        "load_s": round(dt, 1), "host_rss_gb": round(rss_gb, 2),
        "device_param_gb": round(dev_gb, 2),
        "backend": jax.default_backend(),
    }))
    assert rss_gb < 8.0, f"RSS {rss_gb:.1f} GB exceeds the 8 GB budget"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="llama-8b")
    ap.add_argument("--quant", default="int4")
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--dir", default="/tmp/specdec_ckpt")
    ap.add_argument("--load-only", default=None,
                    help="inner mode: load this checkpoint and report RSS")
    ap.add_argument("--keep", action="store_true",
                    help="keep the written checkpoint")
    args = ap.parse_args()

    if args.load_only:
        load_and_report(args.load_only, args.quant, args.dtype)
        return

    ckpt = os.path.join(args.dir, args.preset)
    if not os.path.exists(os.path.join(ckpt, "model.safetensors.index.json")):
        write_checkpoint(args.preset, ckpt)
    # fresh subprocess so RSS reflects the LOAD, not the write
    r = subprocess.run([sys.executable, os.path.abspath(__file__),
                        "--load-only", ckpt, "--quant", args.quant,
                        "--dtype", args.dtype])
    if not args.keep:
        import shutil
        shutil.rmtree(ckpt, ignore_errors=True)
    sys.exit(r.returncode)


if __name__ == "__main__":
    main()
