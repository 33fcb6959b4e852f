"""Probe the primitives the gomoku HBM-streaming descend kernel needs.

Questions (must hold on real Mosaic, not interpret):
1. Can a kernel DMA per-lane rows slab[b, cur_b] HBM->VMEM where cur_b is a
   runtime value read from SMEM scratch?
2. Can a computed i32 vector be moved VMEM->SMEM in-kernel (so the next
   level's DMA offsets can come from this level's argmax)?
3. What does one (issue + wait) of B such scattered row DMAs cost per loop
   level? (The XLA staged descend costs ~18 us/level of op issue — the
   kernel pays off only if this is several x cheaper.)

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/stream_probe.py
       [--B 64] [--N 512] [--S 8] [--A 128] [--levels 64]
"""

import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(levels_ref, slab_ref, out_ref, row_vmem, nxt_vmem, cur_smem,
            copy_sems, idx_sem, *, B, N, S, A):
    """Follow a per-lane pointer chain through the HBM slab for L levels.

    slab[b, n, 0, 0] holds the 'next node' pointer (as f32); each level
    DMAs row slab[b, cur_b] into VMEM, reduces it, extracts the pointer,
    and ships the new [B, 1] index vector back to SMEM for the next
    level's DMA offsets.
    """
    L = levels_ref[0]

    for b in range(B):  # seed the pointer chain at node b % 7
        cur_smem[0, b] = b % 7

    def body(t, acc):
        for b in range(B):
            pltpu.make_async_copy(
                slab_ref.at[b, pl.ds(cur_smem[0, b], 1)],
                row_vmem.at[b],
                copy_sems.at[b],
            ).start()
        for b in range(B):
            pltpu.make_async_copy(
                slab_ref.at[b, pl.ds(cur_smem[0, b], 1)],
                row_vmem.at[b],
                copy_sems.at[b],
            ).wait()
        rows = row_vmem[:, 0]  # [B, S, A]
        acc = acc + jnp.sum(jnp.sum(rows, axis=2), axis=1, keepdims=True)
        nxt = rows[:, 0, 0:1].astype(jnp.int32)  # [B, 1] pointers
        nxt_vmem[:] = jnp.transpose(nxt)  # [1, B]
        dma = pltpu.make_async_copy(nxt_vmem, cur_smem, idx_sem)
        dma.start()
        dma.wait()
        return acc

    out_ref[:] = jax.lax.fori_loop(0, L, body, jnp.zeros((B, 1), jnp.float32))


def build(B, N, S, A, interpret=False):
    return pl.pallas_call(
        functools.partial(_kernel, B=B, N=N, S=S, A=A),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 1), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((B, 1, S, A), jnp.float32),
            pltpu.VMEM((1, B), jnp.int32),
            pltpu.SMEM((1, B), jnp.int32),
            pltpu.SemaphoreType.DMA((B,)),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--B", type=int, default=64)
    ap.add_argument("--N", type=int, default=512)
    ap.add_argument("--S", type=int, default=8)
    ap.add_argument("--A", type=int, default=128)
    ap.add_argument("--levels", type=int, default=64)
    ap.add_argument("--interpret", action="store_true")
    args = ap.parse_args()
    B, N, S, A = args.B, args.N, args.S, args.A

    rng = np.random.default_rng(0)
    slab = rng.uniform(0, 1, (B, N, S, A)).astype(np.float32)
    # pointer plane: next node = (n * 7 + b) % N, a deterministic chain
    ptr = (np.arange(N)[None, :] * 7 + np.arange(B)[:, None]) % N
    slab[:, :, 0, 0] = ptr
    slab_j = jnp.asarray(slab)

    fn = jax.jit(build(B, N, S, A, interpret=args.interpret))

    def reference(L):
        acc = np.zeros((B,), np.float64)
        cur = np.arange(B) % 7
        for _ in range(L):
            rows = slab[np.arange(B), cur]
            acc += rows.sum(axis=(1, 2))
            cur = rows[:, 0, 0].astype(np.int64)
        return acc

    for L in (args.levels, args.levels * 2):
        lv = jnp.array([L], jnp.int32)
        out = np.asarray(fn(lv, slab_j))[:, 0]
        ref = reference(L)
        ok = np.allclose(out, ref, rtol=1e-4)
        t0 = time.time()
        reps = 20
        for _ in range(reps):
            out = fn(lv, slab_j)
        out.block_until_ready()
        dt = (time.time() - t0) / reps
        print(
            f"L={L}: correct={ok} time={dt*1e6:.0f} us "
            f"per-level={dt/L*1e6:.2f} us per-lane-dma={dt/L/B*1e9:.0f} ns"
        )


if __name__ == "__main__":
    main()
