"""On-chip encoder-decoder (T5-family) benchmark: codec AR vs codec
speculative decoding (ref parity surface: sampling/codec_*_decoding.py).

Model: a T5-base-shaped synthetic codec (12+12 layers, d_model 768). The
drafter is a LayerSkip-style prefix of the target's DECODER (first
DRAFT_LAYERS decoder layers, deep-layer outputs damped before use), sharing
the full encoder — self-speculation for enc-dec, mirroring bench.py's
decoder-only pair so acceptance is a real measured quantity.

Usage: python tools/bench_codec.py [--gamma 6] [--gen 200]
"""
import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from bench import log

DRAFT_LAYERS = 3
TAIL_DAMP = 0.08


def build_pair():
    from specdec_tpu.core.codec_model import CodecConfig, init_codec_params

    cfg = CodecConfig(vocab_size=32128, d_model=768, d_kv=64, num_heads=12,
                      d_ff=3072, num_encoder_layers=12, num_decoder_layers=12,
                      dtype=jnp.bfloat16)
    t0 = time.time()
    params = init_codec_params(cfg, jax.random.key(0), scale=0.05)
    Ld = cfg.num_decoder_layers
    mask = (jnp.arange(Ld) >= DRAFT_LAYERS).astype(jnp.float32)
    sv = (1.0 - mask) + mask * TAIL_DAMP
    dec = dict(params["dec_layers"])
    for name in ("wo", "cross_wo", "wo_ffn"):
        dec[name] = (dec[name].astype(jnp.float32)
                     * sv[:, None, None]).astype(cfg.dtype)
    target = dict(params, dec_layers=dec)
    d_cfg = cfg.replace(num_decoder_layers=DRAFT_LAYERS)
    drafter = dict(target)
    drafter["dec_layers"] = jax.tree.map(lambda x: x[:DRAFT_LAYERS], dec)
    _ = np.asarray(target["embed"][0, :1])
    log(f"codec pair built in {time.time() - t0:.1f}s (T5-base-shaped, "
        f"drafter {DRAFT_LAYERS}L decoder, tail damp {TAIL_DAMP})")
    return cfg, d_cfg, target, drafter


def main():
    from specdec_tpu.sampling.codec_decoding import (
        autoregressive_generate_encoder_decoder,
        speculative_generate_encoder_decoder,
    )
    from specdec_tpu.sampling.processors import MultinomialProcessor

    ap = argparse.ArgumentParser()
    ap.add_argument("--gamma", type=int, default=6)
    ap.add_argument("--gen", type=int, default=200)
    ap.add_argument("--reps", type=int, default=4)
    args = ap.parse_args()
    log(f"backend={jax.default_backend()}")

    cfg, d_cfg, target, drafter = build_pair()
    proc = MultinomialProcessor(temperature=1.0)
    rng = np.random.default_rng(0)
    prompt = [int(t) for t in rng.integers(1, cfg.vocab_size, size=60)]

    out = autoregressive_generate_encoder_decoder(
        prompt, cfg, target, max_gen_len=args.gen, logits_processor=proc,
        eos_tokens_id=(), key=jax.random.key(1))
    times = []
    for i in range(args.reps):
        t0 = time.time()
        out = autoregressive_generate_encoder_decoder(
            prompt, cfg, target, max_gen_len=args.gen, logits_processor=proc,
            eos_tokens_id=(), key=jax.random.key(2 + i))
        times.append(time.time() - t0)
    ar_tps = len(out) / min(times)
    log(f"codec AR: {len(out)} tokens, {ar_tps:.1f} tok/s")

    spec, rate = speculative_generate_encoder_decoder(
        prompt, d_cfg, drafter, cfg, target, gamma=args.gamma,
        max_gen_len=args.gen, logits_processor=proc, eos_tokens_id=(),
        key=jax.random.key(100))
    times, rates = [], []
    for i in range(args.reps):
        t0 = time.time()
        spec, rate = speculative_generate_encoder_decoder(
            prompt, d_cfg, drafter, cfg, target, gamma=args.gamma,
            max_gen_len=args.gen, logits_processor=proc, eos_tokens_id=(),
            key=jax.random.key(101 + i))
        times.append(time.time() - t0)
        rates.append(rate)
    spec_tps = len(spec) / min(times)
    acc = float(np.mean(rates))
    ratio = spec_tps / ar_tps
    log(f"codec SPEC(gamma={args.gamma}): {len(spec)} tokens, "
        f"{spec_tps:.1f} tok/s, acceptance {acc:.3f} -> {ratio:.2f}x")
    print(json.dumps({"model": "t5-base-synthetic", "ar_tps": round(ar_tps, 1),
                      "spec_tps": round(spec_tps, 1),
                      "acceptance": round(acc, 3),
                      "spec_over_ar": round(ratio, 3)}))


if __name__ == "__main__":
    main()
