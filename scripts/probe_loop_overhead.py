#!/usr/bin/env python
"""A/B probe: per-iteration overhead of lax.fori_loop / while_loop vs the
same body as pipelined standalone dispatches on this TPU.

Motivation: EXTRACT_SWEEP_r3's fori_loop measurement ran ~15x slower than
the identical fused body dispatched standalone, and mapper LM/CG nests two
while_loops (bundle.py) — if device loops carry a fixed per-iteration cost
on this platform, fixed-length scans or unrolling may beat early-exit
loops.  Prints one JSON line for record_bench.py.
"""

from __future__ import annotations

import json
import sys
import time
from functools import partial
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    import jax
    import jax.numpy as jnp

    from vit_colmap_tpu.utils.jax_cache import enable_persistent_cache

    enable_persistent_cache()

    out: dict = {"metric": "loop_overhead_ms_per_iter", "unit": "ms"}
    results = {}
    for name, n_dim in (("large_matmul", 4096), ("small_matmul", 256)):
        x = jnp.asarray(
            np.random.default_rng(0).standard_normal((n_dim, n_dim)),
            jnp.bfloat16,
        )

        def body_fn(a):
            return jnp.tanh(a @ a)

        reps = 20
        body = jax.jit(body_fn)
        jax.block_until_ready(body(x))
        # 1. pipelined standalone dispatches
        t0 = time.perf_counter()
        y = x
        for _ in range(reps):
            y = body(y)
        jax.block_until_ready(y)
        t_pipe = time.perf_counter() - t0

        # 2. fori_loop of the same body
        @partial(jax.jit, static_argnames="n")
        def looped(a, n):
            return jax.lax.fori_loop(0, n, lambda i, c: body_fn(c), a)

        jax.block_until_ready(looped(x, reps))
        t0 = time.perf_counter()
        jax.block_until_ready(looped(x, reps))
        t_fori = time.perf_counter() - t0

        # 3. while_loop with a data-dependent (never-true) exit
        @partial(jax.jit, static_argnames="n")
        def whiled(a, n):
            def cond(c):
                it, acc = c
                return (it < n) & jnp.isfinite(jnp.sum(acc[0, :8]))

            def step(c):
                it, acc = c
                return it + 1, body_fn(acc)

            return jax.lax.while_loop(cond, step, (jnp.int32(0), a))[1]

        jax.block_until_ready(whiled(x, reps))
        t0 = time.perf_counter()
        jax.block_until_ready(whiled(x, reps))
        t_while = time.perf_counter() - t0

        results[name] = {
            "pipelined_s": round(t_pipe, 4),
            "fori_s": round(t_fori, 4),
            "while_s": round(t_while, 4),
            "fori_overhead_ms_per_iter": round(
                (t_fori - t_pipe) / reps * 1e3, 2
            ),
            "while_overhead_ms_per_iter": round(
                (t_while - t_pipe) / reps * 1e3, 2
            ),
        }
        print(json.dumps({name: results[name]}), flush=True)

    out["value"] = results["large_matmul"]["while_overhead_ms_per_iter"]
    out["rows"] = results
    out["device"] = str(jax.devices()[0])
    print(json.dumps(out))


if __name__ == "__main__":
    main()
