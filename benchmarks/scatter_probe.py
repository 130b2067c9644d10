"""Probe: primitive gather/scatter/sort rates on this TPU, incl. Pallas
in-kernel dynamic (vector-index) VMEM gather/scatter support.

Decides the design of the fast hashgrid encode backward (VERDICT r3 #1):
  - if Mosaic supports vectorized dynamic gather/scatter on VMEM refs, a
    Pallas kernel with per-level table slices resident in VMEM wins;
  - else we need an XLA-level trick (unique-index permutation scatter,
    sort+segment_sum) or an algorithmic change (separable matmul interp).

One JSON line per row; tiny dispatches, safe over the axon tunnel.
"""

import argparse
import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def fence(x):
    x = jax.tree_util.tree_leaves(x)[0]
    return float(jnp.sum(x) if x.ndim else x)


def timeit(fn, *args, n=5):
    fence(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    fence(out)
    return (time.perf_counter() - t0) / n


def row(name, dt, rows=None, **kw):
    d = {"row": name, "ms": round(dt * 1e3, 3)}
    if rows:
        d["Mrows_per_s"] = round(rows / dt / 1e6, 1)
    d.update(kw)
    print(json.dumps(d), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=3_145_728)  # 196608*16
    ap.add_argument("--T", type=int, default=1 << 16)
    ap.add_argument("--width", type=int, default=16)
    a = ap.parse_args()

    print(f"# backend={jax.default_backend()} rows={a.rows} T={a.T} "
          f"width={a.width}", flush=True)
    key = jax.random.PRNGKey(0)
    table = jax.random.normal(key, (a.T, a.width), jnp.float32)
    idx = jax.random.randint(key, (a.rows,), 0, a.T, jnp.int32)
    upd = jax.random.normal(key, (a.rows, a.width), jnp.float32)

    # 1. XLA gather
    f = jax.jit(lambda t, i: jnp.take(t, i, axis=0))
    dt = timeit(f, table, idx)
    row("xla_gather", dt, a.rows)

    # 2. XLA scatter-add, duplicate indices
    f = jax.jit(lambda t, i, u: t.at[i].add(u))
    dt = timeit(f, table, idx, upd)
    row("xla_scatter_add_dup", dt, a.rows)

    # 3. XLA scatter-add, unique indices (permutation into a [rows,w] buf)
    perm = np.random.default_rng(0).permutation(a.rows).astype(np.int32)
    perm = jnp.asarray(perm)
    buf = jnp.zeros((a.rows, a.width), jnp.float32)
    f = jax.jit(lambda b, p, u: b.at[p].set(u, unique_indices=True,
                                            indices_are_sorted=False))
    dt = timeit(f, buf, perm, upd)
    row("xla_scatter_set_unique_perm", dt, a.rows)

    # 4. sort int32 keys (argsort) + apply-by-gather
    f = jax.jit(lambda i: jnp.argsort(i))
    dt = timeit(f, idx)
    row("xla_argsort", dt, a.rows)

    # 5. segment_sum on sorted keys
    order = jax.jit(jnp.argsort)(idx)
    sidx = jnp.take(idx, order)
    supd = jnp.take(upd, order, axis=0)
    f = jax.jit(functools.partial(
        jax.ops.segment_sum, num_segments=a.T, indices_are_sorted=True))
    dt = timeit(f, supd, sidx)
    row("xla_segment_sum_sorted", dt, a.rows)

    # 6. cumsum for rank-within-bucket (one radix pass, 256 buckets)
    oh = jax.jit(lambda i: (i[:, None] & 0xFF) ==
                 jnp.arange(256, dtype=jnp.int32)[None])(idx)

    f = jax.jit(lambda o: jnp.cumsum(o.astype(jnp.int32), axis=0))
    dt = timeit(f, oh)
    row("xla_cumsum_rank_256", dt, a.rows)

    # 7/8. Pallas in-kernel dynamic VECTOR gather / scatter on VMEM
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def pgather_kernel(t_ref, i_ref, o_ref):
        o_ref[:] = t_ref[i_ref[:], :]

    CH = 65536

    def pgather(t, i):
        return pl.pallas_call(
            pgather_kernel,
            grid=(a.rows // CH,),
            in_specs=[
                pl.BlockSpec((a.T, a.width), lambda k: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((CH,), lambda k: (k,), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((CH, a.width), lambda k: (k, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((a.rows, a.width), jnp.float32),
        )(t, i)

    try:
        f = jax.jit(pgather)
        ref = jnp.take(table, idx[:CH], axis=0)
        got = f(table, idx)[:CH]
        err = float(jnp.max(jnp.abs(ref - got)))
        dt = timeit(f, table, idx)
        row("pallas_vector_gather_vmem", dt, a.rows, max_err=err)
    except Exception as e:
        print(json.dumps({"row": "pallas_vector_gather_vmem",
                          "error": repr(e)[:300]}), flush=True)

    def pscat_kernel(i_ref, u_ref, o_ref):
        @pl.when(pl.program_id(0) == 0)
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)
        o_ref[i_ref[:], :] += u_ref[:]

    def pscat(i, u):
        return pl.pallas_call(
            pscat_kernel,
            grid=(a.rows // CH,),
            in_specs=[
                pl.BlockSpec((CH,), lambda k: (k,), memory_space=pltpu.VMEM),
                pl.BlockSpec((CH, a.width), lambda k: (k, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((a.T, a.width), lambda k: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((a.T, a.width), jnp.float32),
        )(i, u)

    try:
        f = jax.jit(pscat)
        ref = jnp.zeros((a.T, a.width)).at[idx].add(upd)
        got = f(idx, upd)
        err = float(jnp.max(jnp.abs(ref - got)))
        dt = timeit(f, idx, upd)
        row("pallas_vector_scatter_vmem", dt, a.rows, max_err=err)
    except Exception as e:
        print(json.dumps({"row": "pallas_vector_scatter_vmem",
                          "error": repr(e)[:300]}), flush=True)


if __name__ == "__main__":
    main()
