"""Device-resident n-gram table: the TPU-native NASD drafter (SURVEY.md §7.1
stretch goal).

The host stores (`ngram/storage.py`, ref: ngram_assisted/ngram_storage.py)
are dict backoff logic — correct, but every NASD window must sync draft
tokens from the host, which on a remote dispatch path costs an RPC
round-trip per window. This module keeps the whole n-gram model ON DEVICE as
fixed-capacity open-hash tables (one per context order, n-1 down to 2), so
NASD generation runs as ONE jitted `lax.while_loop` with zero per-window
host syncs (`ngram/device_assisted.py`).

Design (documented divergence from the host store, docs/PARITY.md):
- capacity is FIXED (power-of-two buckets per order); collisions are
  resolved by overwrite (last-writer-wins), and the stored context is kept
  alongside the prediction so a colliding lookup misses instead of
  returning a wrong-context token
- the prediction per context is RECENCY-based (last update wins), not
  argmax-of-counts: on device a per-(context, token) count table would
  multiply memory by the branching factor; recency is the standard
  fixed-memory approximation and adapts faster to local repetition, which
  is what NASD exploits (prompt-seeded lookups)
- backoff order n-1 … 2 and unknown→(pseudo-random token, known=False)
  follow the reference semantics exactly (ref: ngram_storage.py:171-177)

All functions are pure pytree-in/pytree-out and jit-safe.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

# multiplicative mixing constant (Knuth); int32 wraparound is fine — the
# bucket index is masked to the table size
_MIX = jnp.int32(-1640531527)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class DeviceNGramTable:
    """Open-hash tables for context orders (n-1, n-2, ..., 2).

    ctx[k]: [H, order_k] int32 — the stored context per bucket (-1 = empty)
    tok[k]: [H] int32 — predicted next token for that context
    Orders are a static tuple so the pytree structure is jit-stable.
    """

    ctx: Tuple[jax.Array, ...]
    tok: Tuple[jax.Array, ...]

    @property
    def orders(self) -> Tuple[int, ...]:
        return tuple(c.shape[1] + 1 for c in self.ctx)

    @property
    def capacity(self) -> int:
        return self.ctx[0].shape[0]


def init_device_table(n: int, capacity: int = 1 << 16) -> DeviceNGramTable:
    """Empty table covering orders n..2 (context lengths n-1..1)."""
    assert n > 1 and capacity & (capacity - 1) == 0, \
        "n > 1 and power-of-two capacity required"
    ctx, tok = [], []
    for order in range(n, 1, -1):
        ctx.append(jnp.full((capacity, order - 1), -1, jnp.int32))
        tok.append(jnp.zeros((capacity,), jnp.int32))
    return DeviceNGramTable(ctx=tuple(ctx), tok=tuple(tok))


def _bucket(context: jax.Array, capacity: int) -> jax.Array:
    """Hash a [k] int32 context to a bucket index."""
    h = jnp.int32(0)
    for i in range(context.shape[0]):
        h = h * _MIX + context[i] + jnp.int32(1)
    return (h & jnp.int32(capacity - 1)).astype(jnp.int32)


def table_lookup(table: DeviceNGramTable, context: jax.Array,
                 key: jax.Array, vocab_size: int) -> Tuple[jax.Array, jax.Array]:
    """Backoff lookup. context: [n-1] int32, the last n-1 tokens (most
    recent LAST); entries may be -1 padding when fewer tokens exist.

    Returns (token, known). Unknown contexts yield a uniformly random token
    with known=False (reference semantics, ref: ngram_storage.py:64)."""
    H = table.capacity
    tok = jax.random.randint(key, (), 0, vocab_size, dtype=jnp.int32)
    found = jnp.asarray(False)
    # orders high → low: first hit wins, so LATER (lower-order) hits must
    # not override an earlier hit
    for k, order_ctx in enumerate(table.ctx):
        span = order_ctx.shape[1]
        sub = context[-span:] if span < context.shape[0] else context
        b = _bucket(sub, H)
        stored = order_ctx[b]
        hit = jnp.all(stored == sub) & jnp.all(sub >= 0)
        take = hit & (~found)
        tok = jnp.where(take, table.tok[k][b], tok)
        found = found | hit
    return tok.astype(jnp.int32), found


def table_update(table: DeviceNGramTable, context: jax.Array,
                 next_tok: jax.Array) -> DeviceNGramTable:
    """Record context→next_tok at every order (overwrite on collision)."""
    H = table.capacity
    new_ctx, new_tok = [], []
    for k, order_ctx in enumerate(table.ctx):
        span = order_ctx.shape[1]
        sub = context[-span:] if span < context.shape[0] else context
        b = _bucket(sub, H)
        valid = jnp.all(sub >= 0)
        bb = jnp.where(valid, b, 0)
        new_c = lax.cond(
            valid, lambda: order_ctx.at[bb].set(sub), lambda: order_ctx)
        new_t = lax.cond(
            valid, lambda: table.tok[k].at[bb].set(next_tok),
            lambda: table.tok[k])
        new_ctx.append(new_c)
        new_tok.append(new_t)
    return DeviceNGramTable(ctx=tuple(new_ctx), tok=tuple(new_tok))


def table_seed(table: DeviceNGramTable, tokens: jax.Array,
               length: jax.Array) -> DeviceNGramTable:
    """Seed from a prompt: update with every (context, next) pair, like the
    host store's ``initialize`` (ref: ngram_storage.py:87-95). tokens: [P]
    right-padded; length: valid count."""
    n = table.orders[0]
    P = tokens.shape[0]

    def body(i, tbl):
        # context = tokens[i : i+n-1], next = tokens[i+n-1]
        ctx = lax.dynamic_slice(tokens, (i,), (n - 1,))
        nxt = lax.dynamic_index_in_dim(tokens, i + n - 1, 0, keepdims=False)
        return lax.cond(i + n - 1 < length,
                        lambda: table_update(tbl, ctx, nxt), lambda: tbl)

    upper = jnp.maximum(length - (n - 1), 0)
    return lax.fori_loop(0, jnp.minimum(upper, P - (n - 1)), body, table)
