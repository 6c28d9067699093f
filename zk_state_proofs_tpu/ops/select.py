"""Gather-free dynamic fetches for the MPT walker.

TPU has no vector-gather: XLA lowers batched gathers to ~10ns/element
serial loops, which made window fetches the walker's bottleneck (profiled:
the two 64-byte hp-compare windows + the 32-byte child-hash read were ~65%
of walk time). These helpers fetch dynamic windows with one-hot matmuls
instead — the MXU performs the "gather" as two small batched contractions
(word-coarse select, then byte alignment) — measured ~3.3x faster than the
equivalent gather at [4096, 64].
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def fetch_window(buf, pos, width: int):
    """buf u8 [B, N], pos i32 [B] -> u8 [B, width] where
    out[b, j] = buf[b, pos_b + j] (zero beyond N). Gather-free.

    Stage 1 selects width//4 + 1 aligned 4-byte words with a one-hot
    matmul over the word axis; stage 2 aligns to the byte offset with a
    second one-hot matmul. Exact in bf16: every product has a single
    non-zero term and bytes are < 2^8 < bf16's 2^9 integer range... bf16
    mantissa holds integers up to 256 exactly (0..255 all representable).
    """
    b, n = buf.shape
    if n % 4:
        buf = jnp.pad(buf, ((0, 0), (0, 4 - n % 4)))
        n = buf.shape[1]
    nw = n // 4
    pos = jnp.clip(pos, 0, n - 1)
    words = buf.reshape(b, nw, 4).astype(jnp.bfloat16)
    wpos = pos // 4
    k = width // 4 + 1
    kidx = jnp.arange(k)
    s1 = (
        jnp.arange(nw)[None, None, :] == (wpos[:, None, None] + kidx[None, :, None])
    ).astype(jnp.bfloat16)  # [B, K, NW]
    coarse = jax.lax.dot_general(
        s1, words, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )  # [B, K, 4]
    flat = coarse.reshape(b, k * 4).astype(jnp.bfloat16)
    r = pos - 4 * wpos
    s2 = (
        jnp.arange(k * 4)[None, None, :]
        == (r[:, None, None] + jnp.arange(width)[None, :, None])
    ).astype(jnp.bfloat16)  # [B, width, K*4]
    out = jax.lax.dot_general(
        s2, flat, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )  # [B, width]
    return out.astype(jnp.uint8)


def fetch_window_1d(buf, pos, width: int):
    """Single-example variant for use under vmap: buf u8 [N], pos scalar.
    Under an outer vmap the jnp ops batch transparently, so this lowers to
    the same batched-matmul form."""
    return fetch_window(buf[None], jnp.asarray(pos)[None], width)[0]
