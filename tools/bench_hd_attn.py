#!/usr/bin/env python
"""Microbench the capped online-softmax kernel at the HD shapes against its
dots-only floor (VERDICT r4 weak #2 / next #3).

The 224x400 floor argument (RESULTS.md "d=40 ceiling": flash at 1400 tokens
runs 40-42 TF/s = the 40/128-contraction-lane MXU ceiling) was never
reproduced for the shapes that take the CAPPED K/V-grid-blocked kernel —
256x704's 2816 tokens and 432x768's 5184 tokens.  This tool measures, on
hardware:

  * the capped kernel (`_packed_infer_capped`) across a block_k sweep,
  * the whole-tile transposed kernel where it still fits (2816 does not —
    recorded for completeness),
  * the DOTS-ONLY floor: the same per-head QK^T and AV matmuls with no
    softmax/online-rescale, einsum-lowered — the time the MXU needs for
    the attention arithmetic alone at this (d=40) geometry,
  * the plain einsum attention (XLA softmax between the dots) for scale.

Chained >=300 iterations per point with one value fetch at the end
(CLAUDE.md: a fetch costs ~35 ms through the tunnel and dominates short
chains).  Prints one JSON line per point.

Usage: python tools/bench_hd_attn.py [--tokens 2816,5184] [--batch 24]
       [--blocks 256,512,768,1024] [--iters 300]
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def _flag(argv, name, default):
    return argv[argv.index(name) + 1] if name in argv else default


def chain_time(fn, args, iters, shape_like):
    """Median-of-3 chained-iteration timing: the output feeds back as q
    (shapes match for self-attention) so the loop serializes on device."""
    q, k, v = args

    @jax.jit
    def run(q, k, v):
        def body(_, x):
            o = fn(x, k, v)
            return o.astype(x.dtype)
        return jax.lax.fori_loop(0, iters, body, q)

    out = run(q, k, v)
    _ = float(out[0, 0, 0])  # compile + sync
    times = []
    for _i in range(3):
        t0 = time.time()
        out = run(q, k, v)
        _ = float(out[0, 0, 0])
        times.append((time.time() - t0) / iters)
    return sorted(times)[1]


def main():
    argv = sys.argv[1:]
    tokens = [int(t) for t in str(_flag(argv, "--tokens",
                                        "2816,5184")).split(",")]
    b = int(_flag(argv, "--batch", "24"))  # B=2 x CFG2 x 6 views
    blocks = [int(x) for x in str(_flag(argv, "--blocks",
                                        "256,512,768,1024")).split(",")]
    iters = int(_flag(argv, "--iters", "300"))
    heads, d = 8, 40
    c = heads * d

    from dualdiff_tpu import enable_compilation_cache

    enable_compilation_cache()
    from dualdiff_tpu.ops.attention import (_packed_infer,
                                            _packed_infer_capped, mha_einsum)

    peak = 197e12  # v5e bf16
    for L in tokens:
        key = jax.random.PRNGKey(0)
        q = jax.random.normal(key, (b, L, c), jnp.bfloat16)
        k = jax.random.normal(jax.random.PRNGKey(1), (b, L, c), jnp.bfloat16)
        v = jax.random.normal(jax.random.PRNGKey(2), (b, L, c), jnp.bfloat16)
        scale = d ** -0.5
        flops = 4.0 * b * L * L * c  # QK^T + AV at 2 FLOPs/MAC

        def report(name, s):
            print(json.dumps({
                "point": f"L={L} b={b} heads={heads} d={d}", "variant": name,
                "ms": round(s * 1e3, 4),
                "tf_per_s": round(flops / s / 1e12, 2),
                "mxu_frac": round(flops / s / peak, 4),
                "iters": iters}), flush=True)

        # dots-only / einsum variants materialize the (b, h, L, L) score
        # tensor — guard HBM (24 rows at 5184 tokens would need 20 GB;
        # rerun with a smaller --batch for those variants, TF/s normalizes)
        score_gb = b * heads * L * L * 4 / 1e9
        if score_gb > 8:
            print(json.dumps({"point": f"L={L} b={b}", "variant":
                              "dots_only_floor/einsum_attn",
                              "skipped": f"score tensor {score_gb:.1f} GB "
                              "over HBM — rerun with smaller --batch"}),
                  flush=True)

        # dots-only floor: same per-head contraction shapes, no softmax
        def dots_only(q, k, v):
            qh = q.reshape(b, L, heads, d)
            kh = k.reshape(b, L, heads, d)
            vh = v.reshape(b, L, heads, d)
            s = jnp.einsum("bqhd,bkhd->bhqk", qh, kh,
                           preferred_element_type=jnp.float32)
            o = jnp.einsum("bhqk,bkhd->bqhd", s.astype(v.dtype), vh)
            return o.reshape(b, L, c)

        if score_gb <= 8:
            report("dots_only_floor",
                   chain_time(dots_only, (q, k, v), iters, q))

            # plain einsum attention (softmax between the dots)
            def einsum_attn(q, k, v):
                return mha_einsum(q.reshape(b, L, heads, d),
                                  k.reshape(b, L, heads, d),
                                  v.reshape(b, L, heads, d),
                                  scale=scale).reshape(b, L, c)

            report("einsum_attn",
                   chain_time(einsum_attn, (q, k, v), iters, q))

        # capped kernel across block_k
        for bk in blocks:
            fn = functools.partial(_packed_infer_capped, scale=scale,
                                   heads=heads, lens=(L, L), block_k=bk)
            try:
                report(f"capped_bk{bk}",
                       chain_time(lambda q, k, v: fn(q, k, v),
                                  (q, k, v), iters, q))
            except Exception as e:  # over-VMEM block configs
                print(json.dumps({"point": f"L={L}", "variant":
                                  f"capped_bk{bk}", "error": str(e)[:200]}),
                      flush=True)

        # whole-tile kernel (router may itself choose capped; only run
        # where the score tile fits)
        lq_p = -(-L // 128) * 128
        if lq_p * lq_p <= 2 * 1024 * 1024:
            report("whole_tile", chain_time(
                lambda q, k, v: _packed_infer(q, k, v, scale, heads, (L, L)),
                (q, k, v), iters, q))


if __name__ == "__main__":
    main()
