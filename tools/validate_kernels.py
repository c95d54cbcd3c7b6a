#!/usr/bin/env python
"""On-hardware numerics validation of the Pallas attention kernels.

Role of the reference's CUDA-side sanitizer runs (SURVEY.md §5): after any
kernel change, run this ON THE TPU to confirm every kernel path (packed
transposed inference, transposed training fwd/bwd, fused ring-neighbor
attn4, capped over-VMEM kernel, split-layout flash) matches attention
numerics at the hardware's own precision floor.

The pass criterion is self-calibrating: each kernel is compared against a
``default_matmul_precision("float32")`` einsum reference, and the error
must stay within a small multiple of the DEFAULT-precision einsum's own
deviation from that reference on the same inputs — i.e. within MXU bf16
operand-rounding noise, which is the best any MXU matmul path can do.
On CPU the kernels run in interpret mode and the floor criterion still
holds (both floors are ~f32 ulp there), so the tool doubles as a CI smoke
(``tests/test_ops.py::test_validate_kernels_tool``).

Usage:  python tools/validate_kernels.py [--quick]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def _rel(a, b) -> float:
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    return float(np.max(np.abs(a - b)) / (np.max(np.abs(b)) + 1e-8))


def run_checks(quick: bool = False, log=print):
    """Returns a list of (name, err, floor, ok) rows; ok iff err is within
    4x the default-precision einsum's own MXU-rounding floor (min 1e-5)."""
    from dualdiff_tpu.ops.attention import (
        _einsum_packed, _flash_packed, _flash_packed_nbr, _nbr_stacked,
        flash_attention, mha_einsum)

    rows = []

    def record(name, err, floor):
        ok = err < max(4.0 * floor, 1e-5) + 1e-6
        rows.append((name, err, floor, ok))
        log(f"{name:42s} err {err:.2e}  floor {floor:.2e}  "
            f"{'OK' if ok else 'FAIL'}")

    def qkv(key, b, lq, lk, c):
        ks = jax.random.split(jax.random.PRNGKey(key), 3)
        return (jax.random.normal(ks[0], (b, lq, c), jnp.float32),
                jax.random.normal(ks[1], (b, lk, c), jnp.float32),
                jax.random.normal(ks[2], (b, lk, c), jnp.float32))

    def check_packed(name, b, lq, lk, c, h, grad=True):
        q, k, v = qkv(hash(name) % 1000, b, lq, lk, c)
        scale = 1.0 / math.sqrt(c // h)

        def hi(q, k, v):
            with jax.default_matmul_precision("float32"):
                return _einsum_packed(q, k, v, scale, h)

        # call the kernel entry point directly: the public dispatcher routes
        # short sequences (and CPU) to einsum, which would compare einsum to
        # itself at the quick shapes
        de = jax.jit(lambda q, k, v: _einsum_packed(q, k, v, scale, h))
        te = jax.jit(lambda q, k, v: _flash_packed(q, k, v, scale, h,
                                                   (lq, lk)))
        ref = jax.jit(hi)(q, k, v)
        record(f"{name} fwd", _rel(te(q, k, v), ref), _rel(de(q, k, v), ref))
        if grad:
            loss = lambda f: (lambda *a: jnp.sum(jnp.sin(f(*a))))
            gt = jax.jit(jax.grad(loss(te), argnums=(0, 1, 2)))(q, k, v)
            gh = jax.jit(jax.grad(loss(hi), argnums=(0, 1, 2)))(q, k, v)
            gd = jax.jit(jax.grad(loss(de), argnums=(0, 1, 2)))(q, k, v)
            record(f"{name} grad",
                   max(_rel(a, b) for a, b in zip(gt, gh)),
                   max(_rel(a, b) for a, b in zip(gd, gh)))

    # quick still exercises every kernel: l must clear the >=1024 training-
    # kernel gate, and the capped case overrides shapes to clear the 2M cap
    c, h = (64, 2) if quick else (320, 8)
    l = 1024 if quick else 1408
    b = 1 if quick else 12

    # whole-tile self-attn shape: packed transposed inference kernel +
    # transposed training fwd/bwd
    check_packed("self-attn whole-tile", b, l, l, c, h)
    # short-KV cross-attn (attn2): packed inference + einsum training
    check_packed("cross-attn short-KV", b, l, 77 if quick else 158, c, h)
    # over-VMEM score tile (video ST-Attn / exp-hd): capped kernel fwd,
    # split-kernel backward.  The padded (Lq, Lk) tile must exceed the
    # 2M-element whole-tile cap in quick mode too (768 * 2816 > 2**21).
    if quick:
        check_packed("over-VMEM capped", 1, 768, 2816, c, h)
    else:
        check_packed("over-VMEM capped", max(b // 2, 1), l, 2 * l + 96, c, h)

    # fused ring-neighbor attn4
    n_cam = 6
    bq, kq, vq = qkv(41, n_cam * (1 if quick else 2),
                     512 if quick else l, 512 if quick else l, c)
    if quick:
        l = 512  # neighbor kernel has no >=1024 gate; keep interpret fast
    scale = 1.0 / math.sqrt(c // h)

    def nbr_hi(q, k, v):
        with jax.default_matmul_precision("float32"):
            return _nbr_stacked(q, k, v, scale, h, n_cam, (l, l),
                                use_flash=False)

    ref = jax.jit(nbr_hi)(bq, kq, vq)
    de = jax.jit(lambda q, k, v: _nbr_stacked(
        q, k, v, scale, h, n_cam, (l, l), use_flash=False))(bq, kq, vq)
    te = jax.jit(lambda q, k, v: _flash_packed_nbr(
        q, k, v, scale, h, n_cam, (l, l)))(bq, kq, vq)
    record("attn4 ring-neighbor fwd", _rel(te, ref), _rel(de, ref))

    # split-layout flash path ((B, L, H, D) API)
    d = c // h
    q4 = bq.reshape(bq.shape[0], l, h, d)
    k4 = kq.reshape(kq.shape[0], l, h, d)
    v4 = vq.reshape(vq.shape[0], l, h, d)

    def f_hi(q, k, v):
        with jax.default_matmul_precision("float32"):
            return mha_einsum(q, k, v)

    ref = jax.jit(f_hi)(q4, k4, v4)
    de = jax.jit(mha_einsum)(q4, k4, v4)
    te = jax.jit(flash_attention)(q4, k4, v4)
    record("split-layout flash fwd", _rel(te, ref), _rel(de, ref))

    return rows


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    quick = "--quick" in argv
    if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
        # the axon sitecustomize registers the TPU regardless of the env
        # var; honor an explicit CPU request (kernels run in interpret mode)
        jax.config.update("jax_platforms", "cpu")
    print(f"# backend: {jax.default_backend()}  devices: {jax.devices()}")
    rows = run_checks(quick=quick)
    bad = [r for r in rows if not r[3]]
    print(f"# {len(rows) - len(bad)}/{len(rows)} kernel paths at the "
          f"hardware precision floor")
    if bad:
        print("# FAILURES: " + ", ".join(r[0] for r in bad))
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
