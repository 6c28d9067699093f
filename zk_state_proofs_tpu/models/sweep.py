"""Large-scale verification sweeps — the 1M-proof workload (BASELINE #5).

Streams fixed-geometry witness batches through the (optionally mesh-
sharded) batch verifier, overlapping host packing with device compute via
async dispatch, and accumulates a throughput Meter. Batches reuse one jit
executable (stable bucket shapes), so the steady state is device time plus
host->device witness transfer (the latter dominates through this CI's
remote-relay tunnel; on directly-attached chips DMA overlaps dispatch).
"""

from __future__ import annotations

import functools
import time
from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import mpt
from ..utils.profiling import Meter
from ..witness.pack import PackedProofs


@dataclass
class SweepResult:
    total: int
    found: int
    excluded: int
    invalid: int
    seconds: float

    @property
    def proofs_per_sec(self) -> float:
        return self.total / max(self.seconds, 1e-9)


def sweep(batches, mesh=None, max_value_len: int = 128, max_steps=None,
          meter: Meter | None = None, dedup: bool = True) -> SweepResult:
    """Verify an iterable of PackedProofs (all with identical bucket
    geometry). With a mesh, each batch is dp-sharded across devices
    (batch sizes must divide the mesh). Returns aggregate counts + wall
    time (device-synced).

    dedup=True (the default, consistent with verify_merkle_batch /
    verify_proofs_sharded) hashes each batch's unique-node pool once —
    building the pool at pack time via packed.pool() if the packer didn't
    already; the sharded path replicates the pool across devices."""
    if mesh is not None:
        from ..parallel.mesh import make_sharded_verifier

        # memoized per (mesh, max_value_len, pooled) — no re-jit across calls
        fn = make_sharded_verifier(mesh, max_value_len=max_value_len,
                                   pooled=dedup)
    else:
        # mpt.verify_proofs[_pooled] is already jitted; calling it directly
        # reuses its global trace cache across sweep() invocations
        fn = functools.partial(
            mpt.verify_proofs_pooled if dedup else mpt.verify_proofs,
            max_value_len=max_value_len, max_steps=max_steps,
        )
    totals = np.zeros(3, dtype=np.int64)
    total = 0
    t0 = time.time()
    pending = []
    for packed in batches:
        pool = packed.pool() if dedup else ()
        if mesh is not None:
            active = np.ones(packed.batch, dtype=np.int32)
            out = fn(*(packed.astuple() + (active,) + pool))
            pending.append((packed.batch, out[3]))  # psum'ed counts
        else:
            status, _, _ = fn(*packed.astuple(), *pool)
            pending.append((packed.batch, status))
        total += packed.batch
    # drain
    for batch, out in pending:
        arr = np.asarray(out)
        if arr.shape == (3,):
            totals += arr.astype(np.int64)
        else:
            totals[0] += int((arr == mpt.FOUND).sum())
            totals[1] += int((arr == mpt.EXCLUDED).sum())
            totals[2] += int((arr == mpt.INVALID).sum())
    dt = time.time() - t0
    if meter is not None:
        meter.record(total, 0, 0, dt)
    return SweepResult(
        total=total, found=int(totals[0]), excluded=int(totals[1]),
        invalid=int(totals[2]), seconds=dt,
    )


def replicated_batches(packed: PackedProofs, n: int):
    """Yield the same packed batch n times (synthetic sweep driver)."""
    for _ in range(n):
        yield packed
