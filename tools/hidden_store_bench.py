"""Micro-bench: per-simulation hidden-store update strategies on the chip.

The search needs, per simulation: read row `parent` (dynamic, per-lane) of a
[N, B, F] store, and write row `new_node` (dynamic scalar). Variants:

  value   — store carried as a scan value; gather + .at[node].set(...)
            (XLA inserts a full-store copy per sim: ~1.45 ms at connect4
            size)
  ref     — jax.new_ref closed over by the scan body (XLA 0.9 lowers the
            in-place update to a catastrophic whole-store fusion: ~11 ms)
  pallas  — gather stays a value read; the write is a 1-row Pallas kernel
            with input_output_aliases and a scalar-prefetch block index
            (the KV-cache update pattern: only the target block is written,
            aliasing keeps the rest)

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/hidden_store_bench.py
"""

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from muzero_general_tpu.ops.hidden_store import write_node_hidden

    N, B, F = 201, 256, 2688
    sims = 200
    h0 = jnp.ones((B, F), jnp.float32)

    def timeit(fn, *args, reps=3):
        out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])
        t0 = time.time()
        for _ in range(reps):
            out = fn(*args)
            np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])
        return (time.time() - t0) / reps

    b_idx = jnp.arange(B)

    @jax.jit
    def value_carry(h0):
        store = jnp.zeros((N, B, F)).at[0].set(h0)

        def body(store, i):
            parent = jnp.zeros((B,), jnp.int32)
            h = store[parent, b_idx]
            store = store.at[i + 1].set(h * 1.000001)
            return store, h[:, 0]

        store, out = jax.lax.scan(body, store, jnp.arange(sims))
        return out.sum()

    @jax.jit
    def ref_carry(h0):
        ref = jax.new_ref(jnp.zeros((N, B, F)).at[0].set(h0))

        def body(c, i):
            parent = jnp.zeros((B,), jnp.int32)
            h = ref[parent, b_idx]
            ref[i + 1] = h * 1.000001
            return c, h[:, 0]

        _, out = jax.lax.scan(body, 0.0, jnp.arange(sims))
        return out.sum()

    @jax.jit
    def pallas_write(h0):
        store = jnp.zeros((N, B, F)).at[0].set(h0)

        def body(store, i):
            parent = jnp.zeros((B,), jnp.int32)
            h = store[parent, b_idx]
            store = write_node_hidden(store, i + 1, h * 1.000001)
            return store, h[:, 0]

        store, out = jax.lax.scan(body, store, jnp.arange(sims))
        return out.sum()

    for name, fn in (("value", value_carry), ("ref", ref_carry),
                     ("pallas", pallas_write)):
        try:
            dt = timeit(fn, h0)
            print(f"{name}: {dt*1e3:.1f} ms for {sims} sims "
                  f"({dt/sims*1e6:.0f} us/sim)")
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
