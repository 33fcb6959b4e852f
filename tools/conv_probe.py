"""Probe: fused shifted-matmul conv (Pallas) vs XLA's conv at the board
recurrent-inference shapes.

The gomoku stream-search trace (r5) shows the ResNet recurrent inference is
~430 us/sim — 11 conv+epilogue fusions at ~37 us each for
[64, 11, 11, 128] bf16 3x3 SAME convs (~31% of the v5e bf16 peak). VERDICT
r4 item 5 asks whether an in-kernel conv-as-matmul (fused epilogue, patches
never leaving VMEM) buys a real margin over XLA's lowering at these small
spatial sizes. This probe answers with one hot conv, both engines timed as
a K-deep scan in ONE dispatch (so tunnel/dispatch overhead is excluded).

Kernel scheme: 3x3 SAME conv == sum over 9 statically shifted
[B*H*W, C] @ [C, C] matmuls on a zero-padded activation slab; bias + relu
ride the accumulator before the single store.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/conv_probe.py \
        [--B 64] [--H 11] [--W 11] [--C 128] [--iters 50]
"""

import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _conv_kernel(x_ref, w_ref, b_ref, o_ref, *, B, H, W, C):
    """x [B, H+2, W+2, C] (pre-padded), w [9, C, C], b [1, C] ->
    o [B, H, W, C]; accumulate 9 shifted dots in f32, bias+relu epilogue."""
    acc = jnp.zeros((B * H * W, C), jnp.float32)
    for di in range(3):
        for dj in range(3):
            sh = x_ref[:, di:di + H, dj:dj + W, :].reshape(B * H * W, C)
            acc = acc + jnp.dot(
                sh, w_ref[di * 3 + dj],
                preferred_element_type=jnp.float32,
            )
    acc = jnp.maximum(acc + b_ref[0].astype(jnp.float32), 0.0)
    o_ref[:] = acc.reshape(B, H, W, C).astype(o_ref.dtype)


def _conv_kernel_im2col(x_ref, w_ref, b_ref, o_ref, *, Bb, H, W, C):
    """One im2col dot per batch block: patches [Bb*H*W, 9C] @ [9C, C]."""
    parts = [
        x_ref[:, di:di + H, dj:dj + W, :].reshape(Bb * H * W, C)
        for di in range(3)
        for dj in range(3)
    ]
    patches = jnp.concatenate(parts, axis=1)  # [Bb*H*W, 9C]
    acc = jnp.dot(patches, w_ref[:], preferred_element_type=jnp.float32)
    acc = jnp.maximum(acc + b_ref[0].astype(jnp.float32), 0.0)
    o_ref[:] = acc.reshape(Bb, H, W, C).astype(o_ref.dtype)


def build_pallas_im2col(B, H, W, C, dtype, blocks, interpret=False):
    Bb = B // blocks
    kern = functools.partial(_conv_kernel_im2col, Bb=Bb, H=H, W=W, C=C)
    call = pl.pallas_call(
        kern,
        grid=(blocks,),
        in_specs=[
            pl.BlockSpec((Bb, H + 2, W + 2, C), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((9 * C, C), lambda i: (0, 0)),
            pl.BlockSpec((1, C), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((Bb, H, W, C), lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H, W, C), dtype),
        interpret=interpret,
    )

    def apply(x, w_flat, b):
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        return call(xp, w_flat, b)

    return apply


def build_pallas(B, H, W, C, dtype, interpret=False):
    kern = functools.partial(_conv_kernel, B=B, H=H, W=W, C=C)
    call = pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W, C), dtype),
        interpret=interpret,
    )

    def apply(x, w9, b):
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        return call(xp, w9, b)

    return apply


def xla_conv(x, w, b):
    y = jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    return jnp.maximum(y + b.astype(jnp.float32), 0.0).astype(x.dtype)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--B", type=int, default=64)
    ap.add_argument("--H", type=int, default=11)
    ap.add_argument("--W", type=int, default=11)
    ap.add_argument("--C", type=int, default=128)
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--blocks", type=int, default=2)
    ap.add_argument("--interpret", action="store_true")
    args = ap.parse_args()
    B, H, W, C = args.B, args.H, args.W, args.C
    dtype = jnp.dtype(args.dtype)

    if args.interpret:
        jax.config.update("jax_platforms", "cpu")

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, H, W, C)) * 0.1, dtype)
    w = jnp.asarray(rng.normal(size=(3, 3, C, C)) * 0.05, dtype)
    w9 = w.reshape(9, C, C)
    b = jnp.asarray(rng.normal(size=(1, C)) * 0.1, dtype)

    pallas_apply = build_pallas(B, H, W, C, dtype, interpret=args.interpret)
    w_flat = w.reshape(9 * C, C)
    im2col_apply = build_pallas_im2col(
        B, H, W, C, dtype, args.blocks, interpret=args.interpret
    )

    # Correctness (single application, f32 compare with bf16 tolerance).
    y_x = np.asarray(xla_conv(x, w, b[0]), np.float32)
    for nm, y in (
        ("pallas_9dot", np.asarray(pallas_apply(x, w9, b), np.float32)),
        ("pallas_im2col", np.asarray(im2col_apply(x, w_flat, b), np.float32)),
    ):
        err = np.max(np.abs(y_x - y)) / (np.max(np.abs(y_x)) + 1e-9)
        print(f"max rel err {nm} vs XLA conv: {err:.2e}")
        assert err < 2e-2, f"{nm} does not match XLA conv"
    if args.interpret:
        return

    # Timing: K chained applications inside one jitted scan per engine.
    K = args.iters

    @jax.jit
    def run_xla(x):
        def step(h, _):
            return xla_conv(h, w, b[0]), None
        return jax.lax.scan(step, x, None, length=K)[0]

    @jax.jit
    def run_pallas(x):
        def step(h, _):
            return pallas_apply(h, w9, b), None
        return jax.lax.scan(step, x, None, length=K)[0]

    @jax.jit
    def run_im2col(x):
        def step(h, _):
            return im2col_apply(h, w_flat, b), None
        return jax.lax.scan(step, x, None, length=K)[0]

    flops = 2 * B * H * W * 9 * C * C
    for name, fn in (("xla_conv", run_xla), ("pallas_9dot", run_pallas),
                     ("pallas_im2col", run_im2col)):
        fn(x).block_until_ready()  # compile
        reps = 5
        t0 = time.time()
        for _ in range(reps):
            out = fn(x)
        out.block_until_ready()
        per = (time.time() - t0) / reps / K
        print(
            f"{name}: {per * 1e6:7.1f} us/conv   "
            f"{flops / per / 1e12:6.1f} TFLOP/s"
        )


if __name__ == "__main__":
    main()
