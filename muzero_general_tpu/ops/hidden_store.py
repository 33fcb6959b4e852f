"""In-place single-row update of the node-major hidden store.

The MCTS hidden store is [N, B, F] (node-major, ops/mcts.py) and each
simulation writes exactly one node row. Expressed as a value-carried
`.at[node].set(...)` XLA materializes a full-store copy per simulation to
preserve the gather-before-scatter ordering (profiler-measured 1.45 ms/sim
at connect4 size — 78% of a move); expressed through jax.Ref, XLA 0.9
lowers it to a whole-store predicated fusion that is ~8x worse still.

`write_node_hidden` is the KV-cache-update pattern: a one-block Pallas
kernel whose output block index comes from a scalar-prefetch argument and
whose store operand is input_output_aliased to the output — only the
[1, B, F] target block is DMA'd, the rest of the buffer is the aliased
input, untouched.

NOT the production path: in the real search loop XLA still guarded the
surrounding gather with full-store copies (3 per simulation, measured) —
the software-pipelined dynamic-update-slice in ops/mcts.py is both simpler
and copy-free. This module is kept as the measured alternative exercised
by tools/hidden_store_bench.py (its standalone-loop numbers: value carry
34 ms / jax.Ref 2969 ms / this kernel 27 ms per 200 row updates).
"""

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _row_write_kernel(idx_ref, leaf_ref, store_in_ref, out_ref):
    del idx_ref, store_in_ref  # block selection happens in the index maps
    out_ref[...] = leaf_ref[...]


def write_node_hidden(store, node, leaf, *, interpret=False):
    """store [N, B, *rest], node scalar i32, leaf [B, *rest] -> updated store.

    In-place semantics: the returned array aliases `store` with row `node`
    replaced by `leaf`; no full-store copy.
    """
    orig_shape = store.shape
    N, B = store.shape[:2]
    store = store.reshape(N, B, -1)  # free: contiguous bitcast
    F = store.shape[2]
    leaf = leaf.reshape(1, B, F).astype(store.dtype)
    idx = jnp.asarray(node, jnp.int32).reshape(1)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[
            pl.BlockSpec((1, B, F), lambda i, idx: (0, 0, 0)),
            pl.BlockSpec((1, B, F), lambda i, idx: (idx[0], 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, B, F), lambda i, idx: (idx[0], 0, 0)),
    )
    out = pl.pallas_call(
        _row_write_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(store.shape, store.dtype),
        input_output_aliases={2: 0},  # store operand (after scalars) -> out
        interpret=interpret,
    )(idx, leaf, store)
    return out.reshape(orig_shape)
