"""Probe 2: XLA gather/scatter rate vs row width, table size, dtype,
index sortedness. Finds the levers for the hashgrid encode redesign."""

import itertools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def fence(x):
    return float(jnp.sum(x))


def timeit(fn, *args, n=5):
    fence(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    fence(out)
    return (time.perf_counter() - t0) / n


def main():
    R = 1_572_864  # rows
    key = jax.random.PRNGKey(0)
    g = jax.jit(lambda t, i: jnp.take(t, i, axis=0))
    s = jax.jit(lambda t, i, u: t.at[i].add(u))

    for W, log2T, dt_name, srt in itertools.product(
            (2, 8, 16, 64, 128), (14, 16, 19), ("f32",), (False, True)):
        T = 1 << log2T
        dt = jnp.float32 if dt_name == "f32" else jnp.bfloat16
        table = jax.random.normal(key, (T, W), dt)
        idx = jax.random.randint(key, (R,), 0, T, jnp.int32)
        if srt:
            idx = jnp.sort(idx)
        upd = jax.random.normal(key, (R, W), dt)
        tg = timeit(g, table, idx)
        ts = timeit(s, table, idx, upd)
        print(json.dumps({
            "W": W, "log2T": log2T, "dtype": dt_name, "sorted": srt,
            "gather_Mrows_s": round(R / tg / 1e6, 1),
            "scatter_Mrows_s": round(R / ts / 1e6, 1),
            "gather_GBs": round(R * W * 4 / tg / 1e9, 1),
            "scatter_GBs": round(R * W * 4 / ts / 1e9, 1),
        }), flush=True)

    # bf16 spot check at the interesting configs
    for W, log2T in ((16, 16), (32, 16)):
        T = 1 << log2T
        table = jax.random.normal(key, (T, W), jnp.bfloat16)
        idx = jax.random.randint(key, (R,), 0, T, jnp.int32)
        upd = jax.random.normal(key, (R, W), jnp.bfloat16)
        tg = timeit(g, table, idx)
        ts = timeit(s, table, idx, upd)
        print(json.dumps({
            "W": W, "log2T": log2T, "dtype": "bf16", "sorted": False,
            "gather_Mrows_s": round(R / tg / 1e6, 1),
            "scatter_Mrows_s": round(R / ts / 1e6, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
