"""Model + tokenizer loading for the benchmark harness.

Reference behavior (ref: engine/model_loader.py:13-141): load target + drafter
HF checkpoints, pad-token fallback to EOS, append the Qwen ``<|im_end|>`` token
to the end-token set, and place models on GPUs via env strings. The TPU build
replaces GPU placement with mesh sharding (specdec_tpu.parallel): the target is
TP-sharded over the 'model' axis when a mesh is provided, the drafter
replicated (SURVEY.md §2.7 row 1).

Because this environment has no network access, model paths may also be
``synthetic:<preset>`` — realistic-shaped random-weight models with a
deterministic byte-level tokenizer, so every harness path (and the perf
benchmarks) run without checkpoints. Real local HF checkpoint dirs load
through core/hf_loader.
"""
from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from specdec_tpu.core.config import ModelConfig
from specdec_tpu.core.model import init_params

# realistic-shaped presets (named after the public models whose shapes they
# mirror; weights are random — used when no checkpoint is available)
SYNTHETIC_PRESETS: Dict[str, dict] = {
    "llama-1b": dict(vocab_size=32000, hidden_size=2048, intermediate_size=5632,
                     num_layers=22, num_heads=32, num_kv_heads=4, head_dim=64,
                     max_position_embeddings=2048),
    "llama-8b": dict(vocab_size=128256, hidden_size=4096,
                     intermediate_size=14336, num_layers=32, num_heads=32,
                     num_kv_heads=8, head_dim=128,
                     max_position_embeddings=8192, rope_theta=500000.0),
    "llama-160m": dict(vocab_size=32000, hidden_size=768, intermediate_size=2048,
                       num_layers=12, num_heads=12, num_kv_heads=12, head_dim=64,
                       max_position_embeddings=2048),
    "llama-70m": dict(vocab_size=32000, hidden_size=512, intermediate_size=1376,
                      num_layers=6, num_heads=8, num_kv_heads=8, head_dim=64,
                      max_position_embeddings=2048),
    "pythia-70m": dict(vocab_size=50304, hidden_size=512, intermediate_size=2048,
                       num_layers=6, num_heads=8, num_kv_heads=8, head_dim=64,
                       max_position_embeddings=2048, norm_type="layernorm",
                       act="gelu", gated_mlp=False, parallel_residual=True,
                       rotary_pct=0.25, attn_qkv_bias=True, attn_out_bias=True,
                       mlp_bias=True),
    "pythia-410m": dict(vocab_size=50304, hidden_size=1024,
                        intermediate_size=4096, num_layers=24, num_heads=16,
                        num_kv_heads=16, head_dim=64,
                        max_position_embeddings=2048, norm_type="layernorm",
                        act="gelu", gated_mlp=False, parallel_residual=True,
                        rotary_pct=0.25, attn_qkv_bias=True,
                        attn_out_bias=True, mlp_bias=True),
    "tiny": dict(vocab_size=2048, hidden_size=256, intermediate_size=704,
                 num_layers=4, num_heads=8, num_kv_heads=4, head_dim=32,
                 max_position_embeddings=1024),
}


class SyntheticTokenizer:
    """Deterministic byte-level tokenizer for synthetic models: token id =
    byte value + 3 (0=pad, 1=eos, 2=bos). Enough structure for throughput
    benchmarking and harness tests without a vocab file."""

    PAD, EOS, BOS = 0, 1, 2

    def __init__(self, vocab_size: int):
        self.vocab_size = vocab_size
        self.pad_token_id = self.PAD
        self.eos_token_id = self.EOS
        self.chat_template = None

    def encode(self, text: str):
        return [self.BOS] + [3 + b for b in text.encode("utf-8")][:2000]

    def decode(self, ids, skip_special_tokens: bool = True):
        data = bytes(max(0, min(255, int(t) - 3)) for t in ids if int(t) >= 3)
        return data.decode("utf-8", errors="replace")

    def __call__(self, text, **kw):
        return {"input_ids": self.encode(text)}


def _synthetic(name: str, dtype, quantization: str = "none") -> Dict[str, Any]:
    preset = name.split(":", 1)[1] if ":" in name else name
    # "<preset>-ls<k>": LayerSkip-construction variant — residual outputs of
    # layers >= k damped to 0.08 so the model has the gradual-refinement
    # property real checkpoints have (early-exit drafts agree with the full
    # forward; random full-strength deep layers give ~0 agreement). Pair
    # with DRAFTER_MODEL=layerskip:<k> to reproduce bench.py's measured
    # self-speculative operating point through the CLI/benchmark surface.
    damp_from = None
    base = preset
    if "-ls" in preset:
        base, _, k = preset.rpartition("-ls")
        damp_from = int(k)
    if base not in SYNTHETIC_PRESETS:
        raise ValueError(f"unknown synthetic preset {base!r}; "
                         f"choose from {sorted(SYNTHETIC_PRESETS)}")
    cfg = ModelConfig(dtype=dtype, **SYNTHETIC_PRESETS[base])
    # zlib.crc32, not hash(): str hash is randomized per process
    # (PYTHONHASHSEED), which would give every run a DIFFERENT random model —
    # irreproducible benchmarks and heisenbug oracles
    import zlib
    seed = zlib.crc32(base.encode()) % (2 ** 31)
    if damp_from is not None:
        if not 0 < damp_from < cfg.num_layers:
            raise ValueError(
                f"-ls{damp_from} needs 1..{cfg.num_layers - 1} for "
                f"{base!r} ({cfg.num_layers} layers)")
        import jax.numpy as jnp_
        params = init_params(cfg, jax.random.key(seed), scale=0.02)
        mask = (jnp_.arange(cfg.num_layers) >= damp_from).astype(jnp_.float32)
        sv = (1.0 - mask) + mask * 0.08
        layers = dict(params["layers"])
        for nm in ("wo", "w_down"):
            layers[nm] = (layers[nm].astype(jnp_.float32)
                          * sv[:, None, None]).astype(cfg.dtype)
        params = dict(params, layers=layers)
        if quantization != "none":
            from specdec_tpu.quant import quantize_params
            params = quantize_params(params, kind=quantization, fuse=True)
            return {"cfg": cfg, "params": params, "quantized": quantization}
        return {"cfg": cfg, "params": params}
    if quantization != "none":
        # build directly into quantized form, one layer at a time — an 8B
        # bf16 stack (~16 GB) would fill v5e HBM before quantization
        from specdec_tpu.quant import init_quantized_params
        params = init_quantized_params(cfg, jax.random.key(seed),
                                       kind=quantization, scale=0.02)
        return {"cfg": cfg, "params": params, "quantized": quantization}
    params = init_params(cfg, jax.random.key(seed), scale=0.02)
    return {"cfg": cfg, "params": params}


def _trained(name: str, dtype, quantization: str = "none") -> Dict[str, Any]:
    """``trained:<preset>[@<steps>]`` — a preset-shaped target PRETRAINED at
    load time on the structured Markov stream (engine/pretrain.py), for
    drafter evaluation on a model whose conditionals are actually learnable
    (random-weight synthetics are structurally hostile to feature drafters —
    docs/BENCHMARKS.md round 3). Trains at load like ``eagle:<d>@<steps>``
    trains its head at startup; the stream spec rides in the bundle
    (``stream_spec``) so callers can sample in-distribution prompts."""
    import zlib

    from specdec_tpu.engine.pretrain import MarkovSpec, build_trained_target

    spec_str = name.split(":", 1)[1]
    preset, _, steps = spec_str.partition("@")
    if preset not in SYNTHETIC_PRESETS:
        raise ValueError(f"unknown preset {preset!r} in {name!r}; "
                         f"choose from {sorted(SYNTHETIC_PRESETS)}")
    cfg = ModelConfig(dtype=dtype, **SYNTHETIC_PRESETS[preset])
    stream = MarkovSpec(vocab_size=cfg.vocab_size,
                        num_states=min(cfg.vocab_size, 8192), branching=8,
                        zipf_s=1.2, order=1,
                        seed=zlib.crc32(preset.encode()) % (2 ** 31))
    params, nll = build_trained_target(
        cfg, stream, steps=int(steps or 2000), batch_size=32, seq_len=128,
        learning_rate=1e-3, seed=zlib.crc32(name.encode()) % (2 ** 31))
    out = {"cfg": cfg, "params": params, "stream_spec": stream,
           "pretrain_nll": nll}
    if quantization != "none":
        from specdec_tpu.quant import quantize_params
        out["params"] = quantize_params(params, kind=quantization, fuse=True)
        out["quantized"] = quantization
    return out


def load_models(
    target_model_path: str,
    drafter_model_path: Optional[str] = None,
    dtype=jnp.bfloat16,
    quantization: str = "none",          # none | int8 | nf4 (target only)
    drafter_quantization: str = "none",
    kv_quant: str = "none",              # none | int8 (KV-cache quantization)
    mesh=None,
) -> Dict[str, Any]:
    """Load target (+ optional drafter) and tokenizer; returns the same
    bundle shape as the reference loader (ref: model_loader.py:131-140)."""
    from specdec_tpu.quant import quantize_params

    def load_one(path, quant="none"):
        if path.startswith("synthetic"):
            return _synthetic(path, dtype, quantization=quant), None
        if path.startswith("trained"):
            return _trained(path, dtype, quantization=quant), None
        # encoder-decoder checkpoints route to the codec model family
        from transformers import AutoConfig
        hf_cfg = AutoConfig.from_pretrained(path)
        if getattr(hf_cfg, "model_type", "") in ("t5", "mt5"):
            from transformers import T5ForConditionalGeneration
            from specdec_tpu.core.codec_model import (
                codec_config_from_hf, codec_params_from_hf,
            )
            cfg = codec_config_from_hf(hf_cfg, dtype=dtype)
            model = T5ForConditionalGeneration.from_pretrained(
                path, torch_dtype="float32")
            params = codec_params_from_hf(model, cfg)
            del model
            return {"cfg": cfg, "params": params, "codec": True}, path
        # llama-lineage safetensors checkpoints stream layer-by-layer,
        # directly into quantized containers when quantizing — host peak is
        # one layer, not the 2x-f32 full-model blow-up of the torch path
        # (core/stream_loader.py; ref loads full torch modules,
        # model_loader.py:81-111)
        streamable = (
            getattr(hf_cfg, "model_type", "") in (
                "llama", "mistral", "qwen2", "qwen3", "gemma")
            and (os.path.exists(os.path.join(path, "model.safetensors"))
                 or os.path.exists(os.path.join(
                     path, "model.safetensors.index.json"))))
        if streamable:
            from specdec_tpu.core.stream_loader import load_hf_streamed
            cfg, params = load_hf_streamed(path, dtype=dtype,
                                           quantization=quant, fuse=True)
            out = {"cfg": cfg, "params": params}
            if quant != "none":
                out["quantized"] = quant
            return out, path
        from specdec_tpu.core.hf_loader import load_hf_model
        cfg, params = load_hf_model(path, dtype=dtype)
        return {"cfg": cfg, "params": params}, path

    target, tok_path = load_one(target_model_path, quant=quantization)
    if kv_quant != "none" and not target.get("codec"):
        # flows to every generation loop/scheduler via init_cache(cfg, ...)
        target["cfg"] = target["cfg"].replace(kv_quant=kv_quant)
    drafter = None
    layerskip = (drafter_model_path or "").startswith("layerskip:")
    eagle = (drafter_model_path or "").startswith("eagle:")
    if drafter_model_path and not (layerskip or eagle):
        drafter, d_tok_path = load_one(drafter_model_path,
                                       quant=drafter_quantization)
        if kv_quant != "none" and not drafter.get("codec"):
            drafter["cfg"] = drafter["cfg"].replace(kv_quant=kv_quant)
        tok_path = tok_path or d_tok_path

    if tok_path:
        from transformers import AutoTokenizer
        tokenizer = AutoTokenizer.from_pretrained(tok_path)
        if tokenizer.pad_token is None:  # pad fallback to EOS (ref :119-121)
            tokenizer.pad_token = tokenizer.eos_token
    else:
        tokenizer = SyntheticTokenizer(target["cfg"].vocab_size)

    # end-token set: EOS + Qwen <|im_end|> when present (ref :119-127)
    end_tokens = []
    if tokenizer.eos_token_id is not None:
        end_tokens.append(int(tokenizer.eos_token_id))
    # chat-turn terminators: Qwen <|im_end|> (ref :119-127) and, same
    # pattern, gemma's <end_of_turn>
    for turn_end in ("<|im_end|>", "<end_of_turn>"):
        try:
            tid = tokenizer.convert_tokens_to_ids(turn_end)
            # convert_tokens_to_ids maps UNKNOWN tokens to unk_token_id on
            # many tokenizers — require real vocab membership
            if (tid is not None and tid >= 0 and tid not in end_tokens
                    and turn_end in tokenizer.get_vocab()):
                end_tokens.append(int(tid))
        except Exception:
            pass

    # synthetic models are built directly quantized (load_one); checkpoint
    # models quantize post-load here
    if quantization != "none" and "quantized" not in target:
        target["params"] = quantize_params(target["params"], kind=quantization,
                                           fuse=True)
    if (drafter is not None and drafter_quantization != "none"
            and "quantized" not in drafter):
        drafter["params"] = quantize_params(drafter["params"],
                                            kind=drafter_quantization,
                                            fuse=True)

    if layerskip:
        # self-speculative drafting: the drafter is the TARGET's first k
        # layers with the shared final norm/head (LayerSkip-style early
        # exit). Sliced AFTER target quantization so the drafter shares the
        # quantized containers (layer-stacked pytrees slice uniformly). No
        # second checkpoint, guaranteed shared tokenizer/vocab, and the
        # draft distribution is structurally aligned with the target —
        # bench.py's measured pair construction as a loader spec
        # (DRAFTER_MODEL=layerskip:4).
        k = int(drafter_model_path.split(":", 1)[1])
        t_cfg = target["cfg"]
        assert 0 < k < t_cfg.num_layers, \
            f"layerskip:{k} needs 1..{t_cfg.num_layers - 1} layers"
        drafter = {
            "cfg": t_cfg.replace(num_layers=k),
            "params": dict(target["params"],
                           layers=jax.tree.map(lambda x: x[:k],
                                               target["params"]["layers"])),
        }
        if "quantized" in target:
            drafter["quantized"] = target["quantized"]

    if eagle:
        # EAGLE feature-predictor drafter (core/eagle.py): rides on the
        # target's own residual stream + shared head. Spec
        # ``eagle:<depth>[@<steps>]`` — depth = drafter transformer blocks
        # (1 = classic EAGLE; 2 is the measured throughput sweet spot —
        # deeper heads keep buying acceptance but draft cost wins, see the
        # depth sweep in docs/BENCHMARKS.md), optional @steps runs on-policy training
        # against the loaded target at load time (engine/eagle_train.py;
        # checkpoint-trained EAGLE heads would load here instead when
        # available). With a QUANTIZED target, training needs the
        # differentiable dequant path (SPECDEC_QUANT_KERNEL=xla) — the
        # fused Pallas kernels define no VJP.
        from specdec_tpu.core.eagle import init_eagle_params
        spec = drafter_model_path.split(":", 1)[1]
        t_cfg = target["cfg"]
        if "/" in spec or os.path.isdir(spec):
            # eagle:<checkpoint-dir> — a head saved by engine/checkpoint.py
            # (train once — eagle:<depth>@<steps> with EAGLE_SAVE — serve
            # many); depth comes from the stacked layer axis
            from specdec_tpu.engine.checkpoint import load_params
            e_params = load_params(spec)
            depth = int(e_params["layers"]["wo"].shape[0])
            e_cfg = t_cfg.replace(num_layers=depth)
            drafter = {"cfg": e_cfg, "params": e_params, "eagle": True}
        else:
            depth, _, steps = spec.partition("@")
            depth, steps = int(depth), int(steps or 0)
            if not 0 < depth < t_cfg.num_layers:
                raise ValueError(
                    f"eagle:{depth} needs 1..{t_cfg.num_layers - 1} layers")
            e_cfg = t_cfg.replace(num_layers=depth)
            import zlib
            seed = zlib.crc32(
                f"eagle:{target_model_path}:{depth}".encode()) % (2 ** 31)
            e_params = init_eagle_params(e_cfg, jax.random.key(seed))
            if steps > 0:
                from specdec_tpu.engine.eagle_train import train_eagle
                e_params, acc = train_eagle(
                    t_cfg, target["params"], e_cfg, e_params, steps=steps,
                    batch_size=int(os.getenv("EAGLE_TRAIN_BATCH", "8")),
                    seq_len=int(os.getenv("EAGLE_TRAIN_SEQ", "128")),
                    # HASS-style multi-step alignment (eagle_train.py) —
                    # deployed acceptance is rollout acceptance
                    rollout_steps=int(os.getenv("EAGLE_ROLLOUT", "3")),
                    key=jax.random.key(seed + 1))
                print(f"eagle drafter trained {steps} steps: "
                      f"teacher-forced acceptance proxy {acc:.3f}")
                save_dir = os.getenv("EAGLE_SAVE", "")
                if save_dir:
                    from specdec_tpu.engine.checkpoint import save_params
                    print(f"eagle drafter saved to "
                          f"{save_params(save_dir, e_params, overwrite=True)}")
            drafter = {"cfg": e_cfg, "params": e_params, "eagle": True}

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec
        from specdec_tpu.parallel.mesh import shard_params
        target["params"] = shard_params(target["params"], target["cfg"], mesh,
                                        replicated=False)
        if drafter is not None:
            if drafter.get("eagle"):
                # eagle params are {fc_w, fc_b, layers} — not the standard
                # model pytree param_pspecs covers; replicate every leaf
                rep = NamedSharding(mesh, PartitionSpec())
                drafter["params"] = jax.tree.map(
                    lambda x: jax.device_put(x, rep), drafter["params"])
            else:
                drafter["params"] = shard_params(
                    drafter["params"], drafter["cfg"], mesh, replicated=True)

    if drafter is not None:
        assert drafter["cfg"].vocab_size == target["cfg"].vocab_size, (
            "drafter and target must share a vocabulary "
            "(ref README.md:243-249 assumption, asserted here)")

    return {
        "target": target,
        "drafter": drafter,
        "tokenizer": tokenizer,
        "end_tokens": end_tokens,
        "pad_token_id": int(getattr(tokenizer, "pad_token_id", 0) or 0),
    }
