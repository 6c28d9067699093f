"""Scaling-efficiency harness: proofs/sec at mesh sizes 1, 2, 4, ... N.

BASELINE.md metric: "scaling efficiency measured 1 chip -> 1 host -> N>=2
hosts". On this CI there is one real TPU chip, so multi-device scaling is
demonstrated on the virtual CPU mesh (JAX_PLATFORMS=cpu +
--xla_force_host_platform_device_count); on a real pod slice the same code
paths shard over ICI/DCN via jax.distributed.initialize.

Prints one JSON object per mesh size (stderr) and a final JSON summary
line (stdout).
"""

import json
import os
import sys
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
)

import numpy as np


def bench_sharded_ingraph(mesh, packed, iters=10, k_inner=16):
    """TPU-measured number for the SHARDED code path: the shard_map'ed
    pooled verifier driven by the same in-graph perturbation-counter loop
    as bench.py (every iteration distinct work; measures device time, not
    relay dispatch). On a dp=1 mesh this is the sharded path's single-chip
    throughput next to the virtual-mesh correctness results."""
    import jax
    import jax.numpy as jnp

    from zk_state_proofs_tpu.parallel.mesh import make_sharded_verifier

    fn = make_sharded_verifier(mesh, max_value_len=128, pooled=True)
    pool = packed.pool()
    active = np.ones(packed.batch, dtype=np.int32)
    args = [jnp.asarray(a) for a in packed.astuple() + (active,)]
    pargs = [jnp.asarray(a) for a in pool]

    @jax.jit
    def step(nodes, pool_nodes, ctr):
        def body(_, carry):
            ctr, acc = carry
            ctr = ctr + 1
            pn = nodes.at[:, :, -1].set(ctr.astype(jnp.uint8))
            pp = pool_nodes.at[:, -1].set(ctr.astype(jnp.uint8))
            out = fn(pn, *args[1:], pp, pargs[1], pargs[2])
            return ctr, acc + out[3]
        return jax.lax.fori_loop(
            0, k_inner, body, (ctr, jnp.zeros(3, jnp.int32)))

    ctr = jnp.zeros((), jnp.int32)
    ctr, acc = step(args[0], pargs[0], ctr)
    jax.block_until_ready(acc)
    assert int(np.asarray(acc)[0]) == k_inner * packed.batch, np.asarray(acc)
    best = float("inf")
    for _ in range(2):
        t0 = time.time()
        for _ in range(max(1, iters)):
            ctr, acc = step(args[0], pargs[0], ctr)
        jax.block_until_ready(acc)
        best = min(best, (time.time() - t0) / (iters * k_inner))
    return packed.batch / best


def main():
    import jax

    from bench import build_witness_batch
    from zk_state_proofs_tpu.models import replicated_batches, sweep
    from zk_state_proofs_tpu.parallel import make_mesh

    ndev_total = len(jax.devices())
    batch = 4096
    packed = build_witness_batch(batch)
    sizes = [n for n in (1, 2, 4, 8, 16, 32) if n <= ndev_total]
    results = {}
    base = None
    for n in sizes:
        mesh = make_mesh(n) if n > 1 else None
        # warmup (compile)
        sweep(replicated_batches(packed, 1), mesh=mesh)
        res = sweep(replicated_batches(packed, 8), mesh=mesh)
        assert res.found == res.total, res
        pps = res.proofs_per_sec
        if base is None:
            base = pps
        eff = pps / (base * n)
        results[n] = {"proofs_per_sec": round(pps, 1), "efficiency": round(eff, 3)}
        print(json.dumps({"devices": n, **results[n]}), file=sys.stderr, flush=True)
    summary = {
        "metric": "scaling_proofs_per_sec",
        "devices": sizes,
        "results": results,
        "backend": jax.default_backend(),
    }
    if jax.default_backend() == "cpu":
        summary["note"] = (
            "virtual CPU devices share one physical CPU: total throughput is "
            "fixed, so efficiency ~1/n is expected; this validates the "
            "sharded code path, not hardware scaling"
        )
    else:
        summary["note"] = (
            "sweep() streams per-batch dispatches, so through this CI's "
            "remote-relay tunnel the figure is dominated by ~ms dispatch "
            "latency + witness transfer; device throughput is bench.py's "
            "in-graph-iterated number"
        )
        # TPU-measured sharded-path number (dp-mesh over the real chip(s)),
        # in-graph iterated so it reflects device time like bench.py
        mesh = make_mesh()
        pps = bench_sharded_ingraph(mesh, packed)
        summary["sharded_ingraph_proofs_per_sec"] = round(pps, 1)
        print(json.dumps({"devices": mesh.devices.size,
                          "sharded_ingraph_proofs_per_sec": round(pps, 1)}),
              file=sys.stderr, flush=True)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
