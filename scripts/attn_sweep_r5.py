#!/usr/bin/env python
"""Round-5 attention-kernel sweep on the real TPU (VERDICT r4 items 1+7).

The backbone is the device-extraction ceiling (attention ~109 of
133 ms/stack at B=2, N=9691 — PROFILE_BACKBONE_r4), and the round-4
fused kernel only recovered ~4 ms because its halved blocks (1024x512,
forced by the duplicated pl.when branch temporaries blowing Mosaic's 16M
scoped-vmem bound) double the grid-step count.  Round 5 made both kernels
branchless (masked validity column instead of a (bq, bkv) probability
mask) and prefolded the softmax scale outside the fused kernel, so larger
blocks fit again.  This sweeps block shapes (+ raised vmem limits) for
both kernels standalone, then times the best candidates IN-MODEL (the
block-size ranking differs in-model; attention_kernel.py:55).

Usage: python scripts/attn_sweep_r5.py [--skip-in-model]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

import vit_colmap_tpu.ops.pallas.attention_kernel as ak

B, H, N, d = 2, 12, 9691, 64
D = H * d
SCALE = 1.0 / d**0.5


def bench_chained(make_body, carry0, reps=3):
    """ms per call via scan-chained x10 vs x2 difference (per-dispatch
    timing through the axon relay lies; docs/PERFORMANCE.md)."""

    def chained(iters):
        def prog(c0):
            out, _ = jax.lax.scan(
                lambda c, _: (make_body(c), None), c0, None, length=iters
            )
            return jnp.sum(out.astype(jnp.float32))

        return jax.jit(prog)

    f10, f2 = chained(10), chained(2)
    float(f10(carry0))  # compile
    float(f2(carry0))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(f10(carry0))
        t10 = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(f2(carry0))
        t2 = time.perf_counter() - t0
        best = min(best, (t10 - t2) / 8.0)
    return best * 1e3


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-in-model", action="store_true")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    from vit_colmap_tpu.utils.jax_cache import enable_persistent_cache

    enable_persistent_cache()

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, H, N, d)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, H, N, d)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, H, N, d)), jnp.bfloat16)
    qkv = jnp.asarray(rng.standard_normal((B, N, 3 * D)), jnp.bfloat16)

    results = {}

    # --- standalone: unfused (B, H, N, 64) kernel ---
    unfused_cfgs = [
        (2048, 1024, None),
        (1024, 1024, None),
        (2048, 512, None),
        (2048, 2048, 40),
        (4096, 1024, 40),
    ]
    for bq, bkv, vm in unfused_cfgs:
        name = f"fixedmax_q{bq}_kv{bkv}" + (f"_vm{vm}" if vm else "")
        try:
            ms = bench_chained(
                lambda c, bq=bq, bkv=bkv, vm=vm: ak.fixed_max_attention(
                    c, k, v, SCALE, block_q=bq, block_kv=bkv,
                    vmem_limit_mb=vm,
                ),
                q,
                reps=args.reps,
            )
            results[name] = round(ms, 3)
            print(json.dumps({"config": name, "ms_per_layer": round(ms, 3)}),
                  flush=True)
        except Exception as e:  # compile failures are data, not aborts
            results[name] = None
            print(json.dumps(
                {"config": name, "error": f"{type(e).__name__}: {str(e)[:200]}"}
            ), flush=True)

    # --- standalone: fused packed-qkv kernel ---
    # Chain carry: out (B, N, D) -> tile x3 back to (B, N, 3D).  The concat
    # cost is constant across configs, so the ranking is unaffected.
    fused_cfgs = [
        (1024, 512, None),
        (2048, 512, None),
        (1024, 1024, None),
        (2048, 1024, None),
        (2048, 1024, 40),
        (2048, 2048, 40),
        (4096, 1024, 64),
    ]
    for bq, bkv, vm in fused_cfgs:
        name = f"fused_q{bq}_kv{bkv}" + (f"_vm{vm}" if vm else "")
        try:
            ms = bench_chained(
                lambda c, bq=bq, bkv=bkv, vm=vm: jnp.concatenate(
                    [
                        ak.fixed_max_attention_qkv(
                            c, H, SCALE, block_q=bq, block_kv=bkv,
                            vmem_limit_mb=vm,
                        )
                    ] * 3,
                    axis=-1,
                ),
                qkv,
                reps=args.reps,
            )
            results[name] = round(ms, 3)
            print(json.dumps({"config": name, "ms_per_layer": round(ms, 3)}),
                  flush=True)
        except Exception as e:
            results[name] = None
            print(json.dumps(
                {"config": name, "error": f"{type(e).__name__}: {str(e)[:200]}"}
            ), flush=True)

    in_model = {}
    if not args.skip_in_model:
        # In-model stack timing for the best configs of each family.
        from scripts.profile_backbone import time_stack
        from vit_colmap_tpu.models.dinov2 import ViTConfig

        def best(prefix):
            cands = {
                n: ms for n, ms in results.items()
                if ms is not None and n.startswith(prefix)
            }
            return min(cands, key=cands.get) if cands else None

        def parse(name):
            parts = name.split("_")
            bq = int([p for p in parts if p.startswith("q")][0][1:])
            bkv = int([p for p in parts if p.startswith("kv")][0][2:])
            vms = [p for p in parts if p.startswith("vm")]
            return bq, bkv, (int(vms[0][2:]) if vms else None)

        stack_cands = []
        b = best("fixedmax")
        if b:
            stack_cands.append(("fixedmax", b))
        stack_cands.append(("fixedmax", "fixedmax_q2048_kv1024"))  # shipped
        bf = best("fused")
        if bf:
            stack_cands.append(("fixedmax_fused", bf))
        stack_cands.append(("fixedmax_fused", "fused_q1024_kv512"))  # shipped
        seen = set()
        for impl, cfg_name in stack_cands:
            if (impl, cfg_name) in seen or results.get(cfg_name) is None:
                continue
            seen.add((impl, cfg_name))
            bq, bkv, vm = parse(cfg_name)
            if impl == "fixedmax":
                ak._BLOCK_Q, ak._BLOCK_KV, ak._VMEM_MB = bq, bkv, vm
            else:
                ak._BLOCK_Q_FUSED, ak._BLOCK_KV_FUSED = bq, bkv
                ak._VMEM_MB_FUSED = vm
            cfg = ViTConfig.named("vitb14", attn_impl=impl)
            try:
                ms = time_stack(cfg, 12, B, N, reps=args.reps)
                in_model[f"{impl}:{cfg_name}"] = round(ms, 2)
                print(json.dumps(
                    {"in_model": f"{impl}:{cfg_name}",
                     "ms_per_stack": round(ms, 2)}
                ), flush=True)
            except Exception as e:
                in_model[f"{impl}:{cfg_name}"] = None
                print(json.dumps(
                    {"in_model": f"{impl}:{cfg_name}",
                     "error": f"{type(e).__name__}: {str(e)[:200]}"}
                ), flush=True)

    ok = {n: ms for n, ms in results.items() if ms is not None}
    summary = {
        "metric": "attn_ms_per_layer_best",
        "value": min(ok.values()) if ok else None,
        "unit": "ms",
        "shape": {"B": B, "H": H, "N": N, "d": d},
        "standalone_ms_per_layer": results,
        "in_model_ms_per_stack": in_model,
        "best_config": min(ok, key=ok.get) if ok else None,
    }
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
