"""Streaming safetensors → JAX params: shard-by-shard, layer-by-layer,
optionally direct-to-quantized.

The reference loads real checkpoints through torch
``AutoModelForCausalLM.from_pretrained`` (ref: engine/model_loader.py:81-111),
which materializes the full torch module in host RAM. ``core/hf_loader.py``
mirrored that (full f32 state dict → full pytree): fine at 1.1B, but an 8B
model needs ~32 GB twice on a 16 GB host and 70B is impossible.

This loader never materializes more than ONE layer of dense weights:

- tensors are read lazily from the checkpoint's safetensors shards
  (``model.safetensors.index.json`` weight_map, or the single-file layout),
  in their on-disk dtype (usually bf16 — no f32 blow-up on host);
- each decoder layer is converted (transpose to [in, out], leading L=1 axis),
  shipped to device, optionally quantized there (the same
  ``_quantize_layer_dict`` worker used by ``init_quantized_params``), and
  written into a preallocated stacked pytree with BUFFER DONATION — device
  peak = quantized stack + one dense layer, host peak = a few tensors;
- the embedding/head are converted under jit so the f32 intermediates of the
  quantize chain never materialize eagerly (measured ResourceExhausted on an
  8B-vocab head otherwise — see quant/core.py::init_quantized_params).

Supported families: the llama lineage (llama/mistral/qwen2/qwen3/gemma) —
the BASELINE ladder's checkpoints. gpt-neox/pythia and T5 keep the torch
path in core/hf_loader.py / core/codec_model.py (they are <1B models whose
full-host load is harmless).
"""
from __future__ import annotations

import json
import os
from functools import partial
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from specdec_tpu.core.config import ModelConfig
from specdec_tpu.core.hf_loader import config_from_hf

Params = Dict[str, Any]


class ShardReader:
    """Lazy tensor-by-tensor reader over a checkpoint's safetensors shards.

    Resolves each tensor name through ``model.safetensors.index.json`` when
    present (sharded checkpoints) or a single ``model.safetensors`` file.
    Tensors come back as numpy arrays in their ON-DISK dtype (bf16 via
    ml_dtypes) — callers cast only when they must.

    Open handles are LRU-bounded (``max_open``): safetensors memory-maps each
    shard, and touched mmap pages stay RESIDENT until the handle closes —
    keeping every shard of an 8B checkpoint open walked host RSS to ~33 GB
    (measured); with eviction the high-water mark is a couple of shards.
    Real sharded checkpoints group tensors by layer, so eviction almost never
    re-opens a file.

    Eviction is ALSO byte-budgeted (``byte_budget``): real 8B checkpoints ship
    4 shards of ~4 GB (not one per layer), and every page touched inside one
    stays resident for as long as the handle lives — a handle-count bound
    alone still walks RSS up by whole-shard sizes. A handle that has served
    more than ``byte_budget`` is closed and lazily re-opened on next use
    (mmap re-open is ~free; outstanding numpy views keep the old mapping
    alive via refcount until they die, so eviction is always safe).
    """

    def __init__(self, path: str, max_open: int = 2,
                 byte_budget: int = 512 << 20):
        self.path = path
        self.max_open = max_open
        self.byte_budget = byte_budget
        index = os.path.join(path, "model.safetensors.index.json")
        self._handles: Dict[str, Any] = {}
        self._served: Dict[str, int] = {}
        if os.path.exists(index):
            with open(index) as f:
                self._where: Dict[str, str] = json.load(f)["weight_map"]
        else:
            single = os.path.join(path, "model.safetensors")
            if not os.path.exists(single):
                raise FileNotFoundError(
                    f"no model.safetensors[.index.json] under {path}")
            h = self._open("model.safetensors")
            self._where = {k: "model.safetensors" for k in h.keys()}

    def _open(self, fname: str):
        if self._served.get(fname, 0) > self.byte_budget:
            # touched-page residency exceeded the budget: drop the mapping
            self._handles.pop(fname, None)
            self._served[fname] = 0
        h = self._handles.pop(fname, None)
        if h is None:
            from safetensors import safe_open
            while len(self._handles) >= self.max_open:
                # evict least-recently-used (dict preserves insert order)
                old = next(iter(self._handles))
                del self._handles[old]
            h = safe_open(os.path.join(self.path, fname), framework="np")
        self._handles[fname] = h  # (re-)insert as most recent
        return h

    def __contains__(self, name: str) -> bool:
        return name in self._where

    def _count(self, name: str, arr: np.ndarray) -> np.ndarray:
        self._served[self._where[name]] = \
            self._served.get(self._where[name], 0) + arr.nbytes
        return arr

    def __call__(self, name: str) -> np.ndarray:
        return self._count(
            name, self._open(self._where[name]).get_tensor(name))

    def slice_rows(self, name: str, start: int, stop: int) -> np.ndarray:
        """Read rows [start, stop) of a 2D tensor WITHOUT materializing the
        rest — vocab-sized matrices (embed/lm_head, ~1 GB at 8B) stream
        through in row slices so the full tensor never exists on host."""
        return self._count(
            name, self._open(self._where[name]).get_slice(name)[start:stop])

    def rows(self, name: str) -> int:
        return self._open(self._where[name]).get_slice(name).get_shape()[0]

    def close(self):
        self._handles.clear()


def _llama_layer_np(read: ShardReader, i: int, cfg: ModelConfig,
                    mt: str) -> Dict[str, np.ndarray]:
    """One decoder layer as numpy arrays with a leading L=1 axis, in the
    stacked-pytree layout of hf_loader._params_from_llama_sd (torch [out, in]
    → [in, out])."""
    p = f"model.layers.{i}."

    def w(name):  # linear weight → [in, out]
        return np.swapaxes(read(p + name), -1, -2)

    lay: Dict[str, np.ndarray] = {
        "attn_norm_w": read(p + "input_layernorm.weight"),
        "mlp_norm_w": read(p + "post_attention_layernorm.weight"),
        "wq": w("self_attn.q_proj.weight"),
        "wk": w("self_attn.k_proj.weight"),
        "wv": w("self_attn.v_proj.weight"),
        "wo": w("self_attn.o_proj.weight"),
        "w_gate": w("mlp.gate_proj.weight"),
        "w_up": w("mlp.up_proj.weight"),
        "w_down": w("mlp.down_proj.weight"),
    }
    if cfg.attn_qkv_bias:
        lay["bq"] = read(p + "self_attn.q_proj.bias")
        lay["bk"] = read(p + "self_attn.k_proj.bias")
        lay["bv"] = read(p + "self_attn.v_proj.bias")
    if cfg.qk_norm:
        lay["q_norm_w"] = read(p + "self_attn.q_norm.weight")
        lay["k_norm_w"] = read(p + "self_attn.k_norm.weight")
    if mt == "gemma":  # (1+w) RMSNorm folded at load (see hf_loader)
        lay["attn_norm_w"] = lay["attn_norm_w"].astype(np.float32) + 1.0
        lay["mlp_norm_w"] = lay["mlp_norm_w"].astype(np.float32) + 1.0
    return {k: v[None] for k, v in lay.items()}


def load_hf_streamed(path: str, dtype=jnp.bfloat16, quantization: str = "none",
                     fuse: bool = True) -> Tuple[ModelConfig, Params]:
    """Load a local llama-family HF safetensors checkpoint, streaming layers
    straight into (optionally quantized) device buffers.

    Returns (cfg, params) like hf_loader.load_hf_model; with
    ``quantization != "none"`` the params carry fused quantized containers
    (the same layout ``quantize_params(..., fuse=True)`` produces), built
    without ever holding more than one dense layer.
    """
    from transformers import AutoConfig

    from specdec_tpu.quant.host import (
        HOST_QUANTIZERS, quantize_layer_dict_np,
    )

    hf_cfg = AutoConfig.from_pretrained(path)
    mt = getattr(hf_cfg, "model_type", "llama")
    if mt not in ("llama", "mistral", "qwen2", "qwen3", "gemma"):
        raise ValueError(
            f"streaming loader supports the llama lineage only (got {mt!r}); "
            "use core.hf_loader.load_hf_model")
    cfg = config_from_hf(hf_cfg, dtype=dtype)
    read = ShardReader(path)
    L = cfg.num_layers
    np_dtype = np.dtype(cfg.dtype)

    # quantization happens ON HOST (quant/host.py, bit-compatible numpy
    # mirrors): this environment's tunneled TPU client retains a host copy
    # of every transferred buffer forever (measured +0.39 GB RSS per 0.4 GB
    # transfer), so streaming bf16 layers to a device-side quantizer pins
    # the full dense model in host RAM. Quantize-then-transfer pins only the
    # quantized bytes.
    # chunked along output columns (bit-identical, see quantize_np_chunked):
    # whole-matrix quantization of the 8B lm_head spiked host RSS +11 GB in
    # simultaneous f32/uint32 intermediates
    from specdec_tpu.quant.host import quantize_np_chunked
    # chunk_cols=2048 bounds each f32/uint32 quantizer intermediate to
    # ~34 MB at 8B shapes (the int4 chain holds ~6 simultaneously; at 8192
    # columns the layer-phase RSS high-water carried an extra ~0.8 GB)
    qfn: Optional[Callable] = (
        None if quantization == "none"
        else partial(quantize_np_chunked, HOST_QUANTIZERS[quantization],
                     chunk_cols=2048))

    def prep(lay):
        # cast raw leaves to the model dtype first — norms/biases (and the
        # whole dense path) land in cfg.dtype exactly as the full-load +
        # quantize_params path produces; the quantizers upcast to f32
        # internally, so quantizing from cfg.dtype matches post-hoc
        # quantization of loaded params.
        #
        # Copy discipline: a same-dtype leaf is otherwise a view into the
        # shard mmap, and TRANSFERRING a view pins the whole shard's base
        # buffer in the tunneled client (measured: 32 pinned ~0.4 GB shards
        # ≈ +14 GB RSS on the 8B load, from the two tiny norm views per
        # layer). But only leaves that actually cross the transfer boundary
        # need the copy: on the quantized path the big projection weights
        # are consumed by the numpy quantizers (whose packed/absmax outputs
        # are freshly allocated) — copying them first is a pure ~0.4 GB/layer
        # transient (measured in the round-3 8B RSS high-water).
        if qfn is None:
            return {k: v.astype(np_dtype, copy=True) for k, v in lay.items()}
        lay = {k: v.astype(np_dtype, copy=False) for k, v in lay.items()}
        lay = quantize_layer_dict_np(lay, qfn, fuse)
        # leaves still dense after quantization (norms, biases) DO transfer:
        # copy those out of the mmap (tiny)
        return {k: (np.array(v, copy=True) if isinstance(v, np.ndarray)
                    else v) for k, v in lay.items()}

    @partial(jax.jit, donate_argnums=(0,))
    def write_layer(stacked, lay, i):
        return jax.tree.map(
            lambda s, l: lax.dynamic_update_slice_in_dim(s, l, i, axis=0),
            stacked, lay)

    first = prep(_llama_layer_np(read, 0, cfg, mt))
    stacked = jax.tree.map(
        lambda x: jnp.zeros((L,) + x.shape[1:], x.dtype), first)
    stacked = write_layer(stacked, first, jnp.int32(0))
    del first
    for i in range(1, L):
        stacked = write_layer(
            stacked, prep(_llama_layer_np(read, i, cfg, mt)), jnp.int32(i))

    # vocab-sized matrices stream through in DISK-ROW slices (ShardReader.
    # slice_rows): the full ~1 GB tensor never exists on host — measured
    # phases of the 8B load put the embed/head tail at +3 GB RSS when
    # whole tensors were read/contiguized first (pins are unavoidable on
    # the tunneled client; transients are not)
    ROWS = 8192

    def transfer_embed(name):
        V = read.rows(name)
        parts = [jnp.asarray(
            read.slice_rows(name, s, min(s + ROWS, V)).astype(
                np_dtype, copy=False))
            for s in range(0, V, ROWS)]
        return parts[0] if len(parts) == 1 else jnp.concatenate(parts, 0)

    norm = read("model.norm.weight")
    if mt == "gemma":
        norm = norm.astype(np.float32) + 1.0
    params: Params = {
        "embed": transfer_embed("model.embed_tokens.weight"),
        "layers": stacked,
        "final_norm_w": jnp.asarray(norm.astype(np_dtype)),
    }
    if not cfg.tie_embeddings:
        # head wants [D, V]: disk-row slices of the [V, D] tensor ARE its
        # column chunks after a transpose; quantize each slice (the chunked
        # wrapper passes small-N inputs straight through) or transfer dense
        V = read.rows("lm_head.weight")
        parts = []
        for s in range(0, V, ROWS):
            sl = np.swapaxes(
                read.slice_rows("lm_head.weight", s, min(s + ROWS, V)),
                0, 1)
            parts.append(jax.tree.map(jnp.asarray, qfn(sl)) if qfn is not None
                         else jnp.asarray(np.ascontiguousarray(sl).astype(
                             np_dtype, copy=False)))
        params["lm_head"] = (parts[0] if len(parts) == 1 else jax.tree.map(
            lambda *xs: jnp.concatenate(xs, axis=-1), *parts))
    read.close()
    return cfg, params
