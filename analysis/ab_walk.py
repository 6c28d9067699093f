"""One-process A/B harness for walk-kernel hint-mode variants.

CLAUDE.md A/B discipline: between-PROCESS bench variance on the axon
relay is +/-7% even with warm caches, so kernel changes are judged by
in-process INTERLEAVED deltas with every variant compiled side by side.
Each timed block forces one host read (~20 ms through the relay), so at
K_INNER=96 the absolute numbers carry ~+0.2 ms/batch of read overhead —
only the deltas between variants are meaningful.

Usage:  python analysis/ab_walk.py [modeA modeB ...]   (default: hinted hinted1)
Modes: hinted | hinted4 | hinted1 (see ops/mpt_pallas._walk_kernel).
"""

import functools
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
from zk_state_proofs_tpu.ops import mpt  # noqa: E402

K_INNER = 96
BATCH = int(os.environ.get("ZKP_AB_BATCH", "4096"))
REPS = int(os.environ.get("ZKP_AB_REPS", "6"))


def make_step(packed, args, pargs, ph, mode):
    # composable variants joined by "+":
    #   seg      depth-bucketed walk dispatch (packed.depth_segments())
    #   ps       segmented pool hashing (packed.pool_block_segments())
    #   hinted | hinted1 | hinted4 | ordered   kernel hint mode
    # legacy "seg:<m>" spelling still accepted.
    if mode.startswith("seg:"):
        parts = ["seg", mode[4:]]
    else:
        parts = mode.split("+")
    kw = {}
    if "seg" in parts:
        kw["depth_segments"] = packed.depth_segments()
        print(f"[{mode}] segments: {kw['depth_segments']}",
              file=sys.stderr, flush=True)
    if "ps" in parts:
        kw["pool_segments"] = packed.pool_block_segments()
        print(f"[{mode}] pool segments: {kw['pool_segments']}",
              file=sys.stderr, flush=True)
    hm = [p for p in parts if p in ("hinted", "hinted1", "hinted4",
                                    "ordered", "pairskip")]
    kw["hint_mode"] = hm[0] if hm else None
    if "segold" in parts:
        # the pre-r5 segmented pipeline: GLOBAL digest/hint scatter over
        # all B*D slots, then the segmented walk slicing the global
        # tables (A/B baseline for the fused per-segment scatter)
        import jax.numpy as _jnp

        from zk_state_proofs_tpu.ops.mpt_pallas import (
            walk_batch_pallas_segmented)

        segs = packed.depth_segments()
        psegs = (packed.pool_block_segments() if "ps" in parts else None)

        def fn(nodes, node_lens, num_nodes, roots, knib, klen,
               pool_nodes, pool_lens, pool_idx, ph, **_ignored):
            dig, hints = mpt.hash_nodes_pooled(
                pool_nodes, pool_lens, pool_idx, with_hints=True,
                pool_hints=ph, pool_segments=psegs)
            return walk_batch_pallas_segmented(
                segs, nodes, node_lens, num_nodes, dig, roots, knib, klen,
                128, packed.nodes.shape[1], hints=hints,
                hint_mode=kw["hint_mode"])
    else:
        fn = functools.partial(mpt.verify_proofs_pooled, max_value_len=128,
                               max_steps=packed.nodes.shape[1],
                               conditional=False, **kw)

    @jax.jit
    def step(nodes, pool_nodes, ctr):
        def body(_, carry):
            ctr, acc, accv = carry
            ctr = ctr + 1
            perturbed = nodes.at[:, :, -1].set(ctr.astype(jnp.uint8))
            ppool = pool_nodes.at[:, -1].set(ctr.astype(jnp.uint8))
            s, v, l = fn(perturbed, *args[1:], ppool, *pargs[1:], ph)
            accv = accv ^ v[:, 0].astype(jnp.int32) ^ (l << 8)
            return ctr, acc + s, accv
        ctr, acc, accv = jax.lax.fori_loop(
            0, K_INNER, body,
            (ctr, jnp.zeros((nodes.shape[0],), jnp.int32),
             jnp.zeros((nodes.shape[0],), jnp.int32)))
        return acc, accv, ctr

    return step


def main():
    modes = sys.argv[1:] or ["hinted", "hinted1"]
    print(f"backend: {jax.default_backend()}  A/B modes: {modes}",
          file=sys.stderr, flush=True)
    packed = build_witness_batch(BATCH, BATCH)
    pool = packed.pool()
    args = [jnp.asarray(a) for a in packed.astuple()]
    pargs = [jnp.asarray(a) for a in pool]
    ph = jnp.asarray(packed.pool_hints())
    nodes, pool_nodes = args[0], pargs[0]

    steps = {m: make_step(packed, args, pargs, ph, m) for m in modes}
    ctr = jnp.asarray(np.int32(secrets.randbelow(1 << 20)))
    for m in modes:
        t0 = time.time()
        acc, accv, ctr = steps[m](nodes, pool_nodes, ctr)
        np.asarray(acc), np.asarray(accv)
        assert (np.asarray(acc) == K_INNER * mpt.FOUND).all(), m
        print(f"[{m}] compile+1st: {time.time()-t0:.1f}s",
              file=sys.stderr, flush=True)

    best = {m: float("inf") for m in modes}
    for rep in range(REPS):
        for m in modes:  # interleaved: relay drift hits all variants alike
            t0 = time.time()
            acc, accv, ctr = steps[m](nodes, pool_nodes, ctr)
            np.asarray(acc), np.asarray(accv)
            dt = (time.time() - t0) / K_INNER
            best[m] = min(best[m], dt)
            print(f"rep{rep} [{m}]: {dt*1e3:.3f} ms/batch "
                  f"({BATCH/dt:,.0f} proofs/s)", file=sys.stderr, flush=True)
    print({m: round(best[m] * 1e3, 3) for m in modes})


if __name__ == "__main__":
    main()
