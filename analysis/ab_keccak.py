"""One-process A/B harness for the POOL-HASH stage (VERDICT r4 weak #4).

The r4 diagnostics left a 2.5x unexplained gap at the workload shape:
13.2M hashes/s on the headline batch's real 5.6k-row pool vs 32.7M at
the fixed 4-block 131k-row bucket. Candidate explanations:

  fixed overhead  — small dispatches don't amortize the XLA prep passes
                    (pad_messages / bytes_to_lanes / transposes measured
                    ~55% of small-pool hash time in r4) + launch costs
  static width    — the pool bucket (576 B -> num_blocks=5) makes every
                    prep pass build 5 rate blocks for EVERY row, though
                    the length-sorted pool is mostly 1-block leaves and
                    no row needs 5
  heterogeneity   — per-tile block skip runs each 1024-row tile at its
                    max block count (bounded by sorting; boundary tiles)

Variants (all compiled side by side, reps interleaved — CLAUDE.md A/B
discipline; only deltas are meaningful):

  base    keccak256_tpu(pool, lens) at the pool bucket width (5 blocks)
  tight   buffer trimmed to the real max row length (4 blocks) —
          isolates the phantom-5th-block static cost
  seg     one call per contiguous block-count segment of the sorted
          pool, each at its own trimmed width (1-block rows prep 1
          block) — the pool-hash twin of the walk's depth segments
  pad128k the same pool tiled to 131,072 rows at base width — if
          rate-per-row jumps, small-dispatch overhead dominates

Usage: python analysis/ab_keccak.py [variants...]
"""

import os
import secrets
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(_ROOT, ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from bench import build_witness_batch  # noqa: E402

K_INNER = 16
BATCH = int(os.environ.get("ZKP_AB_BATCH", "4096"))
REPS = int(os.environ.get("ZKP_AB_REPS", "6"))
RATE = 136


def block_segments(pool_lens):
    """Contiguous (row_count, width_bytes) runs of equal sponge block
    count over the length-sorted pool. Zero-length rows (the reserved
    null row 0 + tail padding) are wildcards folded into the adjacent
    run — hashing a 0-len row in any segment is exact (length-masked).
    Widths rounded to 8."""
    lens = np.asarray(pool_lens)
    nblk = np.where(lens > 0, lens // RATE + 1, 0)
    real = np.nonzero(nblk)[0]
    if len(real) == 0:
        return ((len(lens), 8),)
    # wildcards adopt the previous real row's block count (leading zeros
    # adopt the first real one) so runs stay contiguous
    filled = nblk.copy()
    last = nblk[real[0]]
    for i in range(len(filled)):
        if filled[i] == 0:
            filled[i] = last
        else:
            last = filled[i]
    assert (np.diff(filled) <= 0).all(), "pool must be length-sorted desc"
    segs = []
    off = 0
    for nb in range(int(filled.max()), 0, -1):
        cnt = int((filled == nb).sum())
        if cnt == 0:
            continue
        w = int(lens[off:off + cnt].max())
        segs.append((cnt, max(-(-w // 8) * 8, 8)))
        off += cnt
    assert off == len(lens)
    return tuple(segs)


def make_step(pool, lens, variant, segs):
    from zk_state_proofs_tpu.ops.keccak_pallas import keccak256_tpu

    u, n = pool.shape
    if variant == "base":
        data, l = pool, lens
        fn = lambda d: keccak256_tpu(d, l)
    elif variant == "tight":
        w = -(-int(np.asarray(lens).max()) // 8) * 8
        data, l = pool[:, :w], lens
        fn = lambda d: keccak256_tpu(d, l)
    elif variant == "seg":
        data, l = pool, lens

        def fn(d):
            outs, off = [], 0
            for cnt, w in segs:
                outs.append(keccak256_tpu(d[off:off + cnt, :w],
                                          l[off:off + cnt]))
                off += cnt
            return jnp.concatenate(outs)
    elif variant == "pad128k":
        reps = -(-131072 // u)
        data = jnp.tile(pool, (reps, 1))[:131072]
        l = jnp.tile(lens, (reps,))[:131072]
        fn = lambda d: keccak256_tpu(d, l)
    else:
        raise ValueError(variant)

    import functools

    @functools.partial(jax.jit, static_argnames=("k",))
    def step(d, ctr, k):
        def body(_, carry):
            ctr, acc = carry
            ctr = ctr + 1
            out = fn(d.at[:, 0].set(ctr.astype(jnp.uint8)))
            return ctr, acc ^ out[:, 0].astype(jnp.int32)
        return jax.lax.fori_loop(
            0, k, body, (ctr, jnp.zeros((d.shape[0],), jnp.int32)))

    return data, step


def main():
    variants = sys.argv[1:] or ["base", "tight", "seg", "pad128k"]
    print(f"backend: {jax.default_backend()}  variants: {variants}",
          file=sys.stderr, flush=True)
    packed = build_witness_batch(BATCH, BATCH)
    pool_nodes, pool_lens, _ = packed.pool()
    real = int((pool_lens > 0).sum())
    segs = block_segments(pool_lens)
    print(f"pool: {pool_nodes.shape} rows ({real} real), "
          f"block segments {segs}", file=sys.stderr, flush=True)
    pool = jnp.asarray(pool_nodes)
    lens = jnp.asarray(pool_lens.astype(np.int32))

    # parity: seg must produce identical digests to base
    from zk_state_proofs_tpu.ops.keccak_pallas import keccak256_tpu

    base_dig = np.asarray(keccak256_tpu(pool, lens))
    off = 0
    for cnt, w in segs:
        d = np.asarray(keccak256_tpu(pool[off:off + cnt, :w],
                                     lens[off:off + cnt]))
        np.testing.assert_array_equal(d, base_dig[off:off + cnt])
        off += cnt
    print("seg parity ok", file=sys.stderr, flush=True)

    # TWO-POINT timing: per-iteration device time = (T[K_HI] - T[K_LO]) /
    # (K_HI - K_LO) — the ~20 ms forced-read + ~1 ms dispatch overheads of
    # a rep appear identically at both K and cancel exactly, which matters
    # here because the per-iteration signal (~0.2-0.4 ms) is smaller than
    # the overhead at small pool sizes.
    K_LO, K_HI = K_INNER, 9 * K_INNER
    steps = {}
    rows = {}
    ctr = jnp.asarray(np.int32(secrets.randbelow(1 << 20)))
    for v in variants:
        data, step = make_step(pool, lens, v, segs)
        steps[v] = (data, step)
        rows[v] = data.shape[0]
        t0 = time.time()
        ctr, acc = step(data, ctr, K_LO)
        np.asarray(acc)
        ctr, acc = step(data, ctr, K_HI)
        np.asarray(acc)
        print(f"[{v}] compile+1st (both K): {time.time()-t0:.1f}s",
              file=sys.stderr, flush=True)

    best = {v: float("inf") for v in variants}
    for rep in range(REPS):
        for v in variants:
            data, step = steps[v]
            t0 = time.time()
            ctr, acc = step(data, ctr, K_LO)
            np.asarray(acc)
            t_lo = time.time() - t0
            t0 = time.time()
            ctr, acc = step(data, ctr, K_HI)
            np.asarray(acc)
            t_hi = time.time() - t0
            dt = (t_hi - t_lo) / (K_HI - K_LO)
            best[v] = min(best[v], dt)
            print(f"rep{rep} [{v}]: {dt*1e3:.3f} ms/iter device "
                  f"({rows[v]/dt/1e6:.1f} M rows/s)  "
                  f"[lo {t_lo*1e3:.1f} hi {t_hi*1e3:.1f}]",
                  file=sys.stderr, flush=True)
    print({v: round(best[v] * 1e3, 4) for v in variants})


if __name__ == "__main__":
    main()
