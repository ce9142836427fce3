"""Stage-isolation microbenchmark for the channel-major conv kernel.

Times progressively larger slices of the (lane-major, copy-free) kernel at
the dec1.conv1 shape: DMA only -> +center-dx dots -> +all 9 dots -> full
(rolls+masks), at a given tile height.

    python benchmarks/conv_cmajor_stages.py [tile_h ...]
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

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def _kernel(a_ref, x_hbm, out_ref, xbuf, sems, *,
            cin, cout, tile_h, width, n_tiles, n_steps, stage):
    g = pl.program_id(0)
    thw = tile_h * width
    fetch = thw + 2 * width

    def copy(step, slot):
        dd, tt = step // n_tiles, jax.lax.rem(step, n_tiles)
        return pltpu.make_async_copy(
            x_hbm.at[dd, :, pl.ds(tt * thw, fetch)],
            xbuf.at[slot], sems.at[slot])

    depth = xbuf.shape[0]

    @pl.when(g == 0)
    def _():
        for s in range(depth - 1):
            @pl.when(s < n_steps)
            def _():
                copy(s, s % depth).start()

    @pl.when(g + depth - 1 < n_steps)
    def _():
        copy(g + depth - 1, jax.lax.rem(g + depth - 1, depth)).start()

    slot = jax.lax.rem(g, depth)
    copy(g, slot).wait()
    xb = xbuf.at[slot]

    if stage == 1:
        out_ref[0] = xb[:cout, :thw].astype(out_ref.dtype)
        return

    def partial_dx(dx):
        p = None
        for dy in range(3):
            d = jnp.dot(a_ref[dx, dy], xb[:, dy * width: dy * width + thw],
                        preferred_element_type=jnp.float32)
            p = d if p is None else p + d
        return p

    y = partial_dx(1)
    if stage == 2:
        out_ref[0] = y.astype(out_ref.dtype)
        return
    p0, p2 = partial_dx(0), partial_dx(2)
    if stage == 3:
        out_ref[0] = (y + p0 + p2).astype(out_ref.dtype)
        return
    lane = jax.lax.broadcasted_iota(jnp.int32, (cout, thw), 1)
    lane_w = jax.lax.rem(lane, width)
    y = y + jnp.where(lane_w == 0, 0.0, pltpu.roll(p0, 1, 1))
    y = y + jnp.where(lane_w == width - 1, 0.0, pltpu.roll(p2, thw - 1, 1))
    out_ref[0] = y.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("tile_h", "stage"))
def run(x, w, tile_h, stage):
    d_, cin, h_, w_ = x.shape
    cout = w.shape[-1]
    n_tiles = h_ // tile_h
    n_steps = d_ * n_tiles
    xp = jnp.pad(x.astype(jnp.bfloat16), ((0, 0), (0, 0), (1, 1), (0, 0)))
    xp = xp.reshape(d_, cin, (h_ + 2) * w_)
    a = jnp.transpose(w.astype(jnp.bfloat16), (1, 0, 3, 2))
    return pl.pallas_call(
        functools.partial(_kernel, cin=cin, cout=cout, tile_h=tile_h,
                          width=w_, n_tiles=n_tiles, n_steps=n_steps,
                          stage=stage),
        grid=(n_steps,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (1, cout, tile_h * w_), lambda g: (g // n_tiles, 0, g % n_tiles)),
        out_shape=jax.ShapeDtypeStruct((d_, cout, h_ * w_), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((4, cin, (tile_h + 2) * w_), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((4,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",), has_side_effects=True),
    )(a, xp)


def _sync(out):
    # block_until_ready does NOT flush on the tunneled platform — a host
    # scalar fetch is the only reliable barrier (see CLAUDE.md).
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jnp.sum(leaf.reshape(-1)[:8]).astype(jnp.float32))


def timeit(fn, *args, iters=20):
    _sync(fn(*args))   # compile + warm, fully flushed
    _sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    rng = np.random.default_rng(0)
    d, cin, cout, h, w_ = 96, 64, 32, 400, 512
    tiles = [int(a) for a in sys.argv[1:]] or [16]
    x = jnp.asarray(rng.standard_normal((d, cin, h, w_)), jnp.bfloat16)
    w = jnp.asarray(0.1 * rng.standard_normal((3, 3, cin, cout)),
                    jnp.bfloat16)
    names = {1: "DMA only", 2: "+3 dots", 3: "+9 dots", 4: "full"}
    for tile_h in tiles:
        n_steps = d * (h // tile_h)
        prev = 0.0
        for stage in (1, 2, 3, 4):
            ms = timeit(run, x, w, tile_h, stage)
            per = ms / n_steps * 1e3
            print(f"th={tile_h:3d} stage {stage} ({names[stage]:8s}): "
                  f"{ms:6.2f} ms ({per:5.2f} us/tile, "
                  f"delta {(ms - prev) / n_steps * 1e3:5.2f} us)")
            prev = ms


if __name__ == "__main__":
    main()
