"""DMA-throughput probe for the channel-major conv kernel's input fetch.

Measures the HBM->VMEM band fetch in isolation at the dec1.conv1 shape,
varying (a) ring depth and (b) per-step DMA splitting along the channel
dim (more concurrent DMA streams per tile). Output is a dummy (8, 128)
block so out-traffic doesn't pollute the input-stream measurement.

    python benchmarks/conv_cmajor_dma_probe.py
"""

from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_hbm, out_ref, xbuf, sems, *, tile_h, width, n_tiles,
            n_steps, split, mode):
    g = pl.program_id(0)
    thw = tile_h * width
    fetch = thw + 2 * width
    depth = xbuf.shape[0]
    cin = xbuf.shape[1]
    ck = cin // split

    def copies(step, slot):
        dd, tt = step // n_tiles, jax.lax.rem(step, n_tiles)
        return [pltpu.make_async_copy(
            x_hbm.at[dd, pl.ds(s * ck, ck), pl.ds(tt * thw, fetch)],
            xbuf.at[slot, pl.ds(s * ck, ck)],
            sems.at[slot, s]) for s in range(split)]

    @pl.when(g == 0)
    def _():
        for st in range(depth - 1):
            @pl.when(st < n_steps)
            def _():
                for c in copies(st, st % depth):
                    c.start()

    @pl.when(g + depth - 1 < n_steps)
    def _():
        for c in copies(g + depth - 1, jax.lax.rem(g + depth - 1, depth)):
            c.start()

    slot = jax.lax.rem(g, depth)
    for c in copies(g, slot):
        c.wait()
    if mode == "in_only":
        out_ref[:] = xbuf[slot, :8, :128].astype(out_ref.dtype)
    elif mode == "out_zero":
        out_ref[0] = jnp.zeros(out_ref.shape[1:], out_ref.dtype) \
            + xbuf[slot, 0, 0:1].astype(out_ref.dtype)
    else:  # out_copy
        out_ref[0] = xbuf[slot, :out_ref.shape[1], :tile_h * width] \
            .astype(out_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("tile_h", "depth", "split", "mode"))
def run(x, tile_h, depth, split, mode="in_only"):
    d_, cin, hw = x.shape
    w_ = 512
    h = hw // w_ - 2
    n_tiles = h // tile_h
    n_steps = d_ * n_tiles
    cout = 32
    if mode == "in_only":
        out_specs = pl.BlockSpec((8, 128), lambda g: (0, 0))
        out_shape = jax.ShapeDtypeStruct((8, 128), jnp.float32)
    else:
        out_specs = pl.BlockSpec(
            (1, cout, tile_h * w_), lambda g: (g // n_tiles, 0, g % n_tiles))
        out_shape = jax.ShapeDtypeStruct((d_, cout, h * w_), jnp.bfloat16)
    return pl.pallas_call(
        functools.partial(_kernel, tile_h=tile_h, width=w_,
                          n_tiles=n_tiles, n_steps=n_steps, split=split,
                          mode=mode),
        grid=(n_steps,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((depth, cin, (tile_h + 2) * w_), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((depth, split)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",), has_side_effects=True),
    )(x)


def _sync(y):
    float(jnp.sum(y.reshape(-1)[:8]).astype(jnp.float32))


def timeit(fn, *args, iters=20):
    _sync(fn(*args))
    _sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    rng = np.random.default_rng(0)
    d, cin, h, w_ = 96, 64, 400, 512
    x = jnp.asarray(rng.standard_normal((d, cin, (h + 2) * w_)),
                    jnp.bfloat16)
    gb = d * cin * (h + 2) * w_ * 2 / 1e9
    for tile_h in (16, 40):
        for mode in ("in_only", "out_zero", "out_copy"):
            try:
                ms = timeit(run, x, tile_h, 2, 1, mode)
            except Exception as e:  # noqa: BLE001
                print(f"th={tile_h} {mode}: FAIL {type(e).__name__}")
                continue
            eff = gb * (1 + 2 / tile_h)  # halo re-read factor
            print(f"th={tile_h:3d} {mode:8s}: {ms:6.2f} ms  "
                  f"in-stream {eff / ms * 1e3:4.0f} GB/s")


if __name__ == "__main__":
    main()
