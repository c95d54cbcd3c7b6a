"""Attention ops: XLA einsum path + Pallas TPU flash-attention kernels.

TPU-native replacement for the xformers ``memory_efficient_attention`` the
reference calls in every attention block (reference
``magicdrive/runner/base_runner.py:192-208``, ``txt_con_fusion.py:156-162``,
``box_adapter.py:150-156``).  Two paths:

* ``mha_einsum`` — plain jnp, always correct, good for short sequences
  (cross-attn over <=300 text/box tokens) where XLA's fusion already wins.
* ``flash_attention`` — Pallas kernels with online softmax and a custom VJP
  (backward recomputes scores per block); the (Lq, Lk) score matrix never
  touches HBM in either direction.

``multi_head_attention`` dispatches between them on shape and platform.
All functions take ``q, k, v`` shaped ``(B, L, num_heads, head_dim)``.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["mha_einsum", "flash_attention", "multi_head_attention",
           "attention_packed", "attention_packed_neighbors",
           "recorded_kernel_flops"]

_NEG_INF = -1e30

# Inference routing: queries >= this take the channel-packed transposed
# kernel; shorter ones stay on einsum.  r5 measured e2e: 512 routes the
# exp-hd 704-token level through the kernel (+3.3% at 256x704, numerics
# pin identical) while leaving every other geometry's routing unchanged;
# pulling the 350-token level in (threshold 256) LOSES 1.1% at 224x400 —
# einsum stays right for short queries (consistent with the r4 training
# finding).  Env knob for sweeps.
import os as _os

_PACKED_MIN_LQ = int(_os.environ.get("DUALDIFF_PACKED_MIN_LQ", "512"))

# ---------------------------------------------------------------- flops --
# XLA's cost analysis scores Pallas custom-calls as 0 FLOPs, so step-MFU
# computed from ``cost_analysis()`` alone understates and is NOT comparable
# across kernel/einsum mixes (VERDICT r4 weak #6).  Each Pallas LEAF path
# below reports its hand-counted LOGICAL FLOPs (4*B*Lq*Lk*C fwd — QK^T plus
# AV at 2 FLOPs/MAC with C = heads*head_dim; 10x/4 for the 5-matmul
# backward) into this recorder while a trace is active.  einsum paths do
# NOT record — XLA already counts them.

_FLOP_RECORD: Optional[list] = None


def _record_flops(n) -> None:
    if _FLOP_RECORD is not None:
        _FLOP_RECORD.append(float(n))


def recorded_kernel_flops(fn, *args, **kwargs) -> float:
    """Hand-counted FLOPs of every Pallas attention kernel call in one
    abstract trace of ``fn`` (shapes only — nothing executes).  Add to the
    ``cost_analysis()['flops']`` total for an MFU that stays comparable
    across kernel/einsum routing changes.  Returns 0.0 if tracing fails."""
    global _FLOP_RECORD
    prev = _FLOP_RECORD
    _FLOP_RECORD = rec = []
    # a jit-wrapped fn that already compiled would serve its cached jaxpr
    # and never re-run this python (recording 0): trace the UNWRAPPED
    # python function through a fresh-identity wrapper so the global
    # tracing cache (keyed on fun id + abstract args) cannot hit.  Only
    # unwrap actual jit functions — jax.grad also sets ``__wrapped__``,
    # but to the PRIMAL (unwrapping it would drop the backward's FLOPs).
    is_jit = hasattr(fn, "lower") and hasattr(fn, "__wrapped__")
    inner = fn.__wrapped__ if is_jit else fn

    def fresh(*a, **k):  # unique identity per probe call
        return inner(*a, **k)

    try:
        jax.eval_shape(fresh, *args, **kwargs)
    except Exception:  # pragma: no cover - diagnostic path must not raise
        import logging

        logging.getLogger(__name__).warning(
            "recorded_kernel_flops: trace failed", exc_info=True)
        return 0.0
    finally:
        _FLOP_RECORD = prev
    return float(sum(rec))


def mha_einsum(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """(B, Lq, H, Dh) x (B, Lk, H, Dh) -> (B, Lq, H, Dh). fp32 softmax."""
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(logits * scale, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v)


def _tracing_on_tpu() -> bool:
    """True when ops traced right now will run on TPU (honors the
    ``jax.default_device`` override used for cheap CPU-side param init)."""
    dd = jax.config.jax_default_device
    if dd is not None:
        return getattr(dd, "platform", None) == "tpu"
    return jax.default_backend() == "tpu"


def _interpret() -> bool:
    return not _tracing_on_tpu()


# ------------------------------------------------------------------ fwd --

def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *, scale, block_k,
                kv_len):
    """Online-softmax forward.  ``lse_ref=None`` (inference path) skips the
    LSE output entirely — it exists only for the backward, and its 128-lane
    broadcast write costs ~13% of a forward call's time."""
    q = q_ref[0].astype(jnp.float32) * scale
    block_q, d = q.shape
    num_kb = k_ref.shape[1] // block_k

    m0 = jnp.full((block_q, 1), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((block_q, 1), jnp.float32)
    acc0 = jnp.zeros((block_q, d), jnp.float32)

    def body(kb, carry):
        m, l, acc = carry
        k_blk = k_ref[0, pl.ds(kb * block_k, block_k), :].astype(jnp.float32)
        v_blk = v_ref[0, pl.ds(kb * block_k, block_k), :].astype(jnp.float32)
        s = jnp.dot(q, k_blk.T, preferred_element_type=jnp.float32)
        kpos = kb * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(kpos < kv_len, s, _NEG_INF)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l_new = alpha * l + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = alpha * acc + jnp.dot(p, v_blk, preferred_element_type=jnp.float32)
        return m_new, l_new, acc_new

    m, l, acc = jax.lax.fori_loop(0, num_kb, body, (m0, l0, acc0))
    o_ref[0] = (acc / l).astype(o_ref.dtype)
    if lse_ref is not None:
        lse = m + jnp.log(l)  # (block_q, 1)
        lse_ref[0] = jnp.broadcast_to(lse, (lse.shape[0], 128))


def _bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref,
                   *, scale, block_k, kv_len):
    q = q_ref[0].astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)
    lse = lse_ref[0, :, 0:1].astype(jnp.float32)
    delta = delta_ref[0, :, 0:1].astype(jnp.float32)
    block_q, d = q.shape
    num_kb = k_ref.shape[1] // block_k

    def body(kb, dq):
        k_blk = k_ref[0, pl.ds(kb * block_k, block_k), :].astype(jnp.float32)
        v_blk = v_ref[0, pl.ds(kb * block_k, block_k), :].astype(jnp.float32)
        s = jnp.dot(q, k_blk.T, preferred_element_type=jnp.float32) * scale
        kpos = kb * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(kpos < kv_len, s, _NEG_INF)
        p = jnp.exp(s - lse)
        dp = jnp.dot(do, v_blk.T, preferred_element_type=jnp.float32)
        ds = p * (dp - delta)
        return dq + jnp.dot(ds, k_blk, preferred_element_type=jnp.float32)

    dq = jax.lax.fori_loop(0, num_kb, body, jnp.zeros((block_q, d), jnp.float32))
    dq_ref[0] = (dq * scale).astype(dq_ref.dtype)


def _bwd_dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                    dk_ref, dv_ref, *, scale, block_q, q_len):
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    block_k, d = k.shape
    num_qb = q_ref.shape[1] // block_q

    def body(qb, carry):
        dk, dv = carry
        q_blk = q_ref[0, pl.ds(qb * block_q, block_q), :].astype(jnp.float32)
        do_blk = do_ref[0, pl.ds(qb * block_q, block_q), :].astype(jnp.float32)
        lse = lse_ref[0, pl.ds(qb * block_q, block_q), 0:1].astype(jnp.float32)
        delta = delta_ref[0, pl.ds(qb * block_q, block_q), 0:1].astype(jnp.float32)
        s = jnp.dot(q_blk, k.T, preferred_element_type=jnp.float32) * scale
        qpos = qb * block_q + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
        s = jnp.where(qpos < q_len, s, _NEG_INF)
        p = jnp.exp(s - lse)  # padded q rows: lse=0, s=-inf -> p=0
        dv = dv + jnp.dot(p.T, do_blk, preferred_element_type=jnp.float32)
        dp = jnp.dot(do_blk, v.T, preferred_element_type=jnp.float32)
        ds = p * (dp - delta)
        dk = dk + jnp.dot(ds.T, q_blk, preferred_element_type=jnp.float32)
        return dk, dv

    z = jnp.zeros((block_k, d), jnp.float32)
    dk, dv = jax.lax.fori_loop(0, num_qb, body, (z, z))
    dk_ref[0] = (dk * scale).astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


# ------------------------------------------------------------ wrappers --

def _pad_to(x: jnp.ndarray, axis: int, mult: int) -> jnp.ndarray:
    pad = (-x.shape[axis]) % mult
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _fwd_core(qb, kb, vb, scale, block_q, block_k, lk, need_lse=True):
    bh, lq_p, d_p = qb.shape
    lk_p = kb.shape[1]
    grid = (bh, lq_p // block_q)
    in_specs = [
        pl.BlockSpec((1, block_q, d_p), lambda i, j: (i, j, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, lk_p, d_p), lambda i, j: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, lk_p, d_p), lambda i, j: (i, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    o_spec = pl.BlockSpec((1, block_q, d_p), lambda i, j: (i, j, 0),
                          memory_space=pltpu.VMEM)
    if not need_lse:
        out = pl.pallas_call(
            functools.partial(_fwd_kernel_nolse, scale=scale,
                              block_k=block_k, kv_len=lk),
            grid=grid,
            in_specs=in_specs,
            out_specs=o_spec,
            out_shape=jax.ShapeDtypeStruct((bh, lq_p, d_p), qb.dtype),
            interpret=_interpret(),
        )(qb, kb, vb)
        return out, None
    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, block_k=block_k, kv_len=lk),
        grid=grid,
        in_specs=in_specs,
        out_specs=(
            o_spec,
            pl.BlockSpec((1, block_q, 128), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bh, lq_p, d_p), qb.dtype),
            jax.ShapeDtypeStruct((bh, lq_p, 128), jnp.float32),
        ),
        interpret=_interpret(),
    )(qb, kb, vb)
    return out, lse


def _fwd_kernel_nolse(q_ref, k_ref, v_ref, o_ref, *, scale, block_k, kv_len):
    _fwd_kernel(q_ref, k_ref, v_ref, o_ref, None, scale=scale,
                block_k=block_k, kv_len=kv_len)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _flash_padded(qb, kb, vb, scale, lens, blocks):
    # primal (non-differentiated) path = inference: skip the LSE output,
    # which exists only for the backward
    _record_flops(4 * qb.shape[0] * lens[0] * lens[1] * qb.shape[-1])
    out, _ = _fwd_core(qb, kb, vb, scale, blocks[0], blocks[1], lens[1],
                       need_lse=False)
    return out


def _flash_padded_fwd(qb, kb, vb, scale, lens, blocks):
    _record_flops(4 * qb.shape[0] * lens[0] * lens[1] * qb.shape[-1])
    out, lse = _fwd_core(qb, kb, vb, scale, blocks[0], blocks[1], lens[1])
    return out, (qb, kb, vb, out, lse)


def _flash_padded_bwd(scale, lens, blocks, res, g):
    qb, kb, vb, out, lse = res
    lq, lk = lens
    _record_flops(10 * qb.shape[0] * lq * lk * qb.shape[-1])
    lq_orig, lk_orig = qb.shape[1], kb.shape[1]
    # re-pad to 512-multiples so the backward can use VMEM-safe 512 blocks
    # even when the forward ran minimally-padded whole-sequence blocks.
    # padded q rows get lse=0, so p = exp(-1e30 - 0) = 0 in _bwd_dkv; padded
    # k cols are masked by kv_len in _bwd_dq; padded g rows are zero.
    qb, out, g = (_pad_to(x, 1, 512) for x in (qb, out, g))
    kb, vb = _pad_to(kb, 1, 512), _pad_to(vb, 1, 512)
    lse = _pad_to(lse, 1, 512)
    bh, lq_p, d_p = qb.shape
    lk_p = kb.shape[1]
    block_q, block_k = _bwd_blocks(blocks[0], blocks[1], lq_p, lk_p)
    g = g.astype(jnp.float32)
    delta = jnp.sum(g * out.astype(jnp.float32), axis=-1)  # (bh, lq_p)
    delta = jnp.broadcast_to(delta[..., None], (*delta.shape, 128))

    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, scale=scale, block_k=block_k,
                          kv_len=lk),
        grid=(bh, lq_p // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d_p), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lk_p, d_p), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lk_p, d_p), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, d_p), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, 128), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, 128), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d_p), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, lq_p, d_p), qb.dtype),
        interpret=_interpret(),
    )(qb, kb, vb, g.astype(qb.dtype), lse, delta)

    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, scale=scale, block_q=block_q,
                          q_len=lq),
        grid=(bh, lk_p // block_k),
        in_specs=[
            pl.BlockSpec((1, lq_p, d_p), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d_p), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d_p), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lq_p, d_p), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lq_p, 128), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lq_p, 128), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, block_k, d_p), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d_p), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bh, lk_p, d_p), kb.dtype),
            jax.ShapeDtypeStruct((bh, lk_p, d_p), vb.dtype),
        ),
        interpret=_interpret(),
    )(qb, kb, vb, g.astype(qb.dtype), lse, delta)
    # cotangents must match the forward's (minimally padded) primal avals
    return dq[:, :lq_orig], dk[:, :lk_orig], dv[:, :lk_orig]


_flash_padded.defvjp(_flash_padded_fwd, _flash_padded_bwd)


def _auto_blocks(lq: int, lk: int, score_cap: int = 2 * 1024 * 1024):
    """Whole-sequence blocks when the (bq, bk) fp32 score tile fits VMEM
    (one K/V load per head — measured fastest at SD shapes: 1400-token SD
    self-attn pads 128-mult to 1408 whole blocks, the 0.72 fps config);
    otherwise cap bq under ~8MB of scores, choosing bq to MINIMIZE q
    padding (an arbitrary cap like 1280 on lq=1400 pads to 2560 — 83%
    wasted MACs, the r1 0.72->0.61 regression).  The backward re-pads to
    512-multiples itself (``_flash_padded_bwd``), so fwd padding stays
    minimal."""
    # whole-sequence blocks only need 8-row alignment (mosaic accepts any
    # %8 second-minor block dim; the last dim is the full native head_dim)
    # — so SD's 1400-token attention runs with ZERO sequence padding
    up8 = lambda x: max(128, -(-x // 8) * 8)
    bq, bk = up8(lq), up8(lk)
    if bq * bk > score_cap:
        bk = min(max(128, -(-lk // 128) * 128), 1536)
        cap_bq = max(128, (score_cap // bk) // 128 * 128)
        # largest bq whose padding waste is within one 256-row bucket of
        # the minimum (big blocks amortize grid overhead; waste costs MACs)
        bq = min(range(128, cap_bq + 1, 128),
                 key=lambda b: ((-(-lq // b) * b - lq) // 256, -b))
    return bq, bk


def _bwd_blocks(block_q: int, block_k: int, lq_p: int, lk_p: int):
    """Smaller blocks for the backward kernels (must divide the padded
    lengths, which the backward re-pads to 512-multiples): the bwd
    temporaries need ~2.5x the score tile and VMEM-OOM at whole-sequence
    blocks."""
    bq = 512 if (block_q > 512 and lq_p % 512 == 0) else block_q
    bk = 512 if (block_k > 512 and lk_p % 512 == 0) else block_k
    return bq, bk


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: Optional[float] = None,
    block_q: Optional[int] = None,
    block_k: Optional[int] = None,
) -> jnp.ndarray:
    """Pallas flash attention (fwd + custom-VJP bwd).
    q,k,v: (B, L, H, Dh) -> (B, Lq, H, Dh).

    head_dim stays NATIVE (no HBM-side lane padding — the MXU pads the
    contraction internally); only the sequence axis is padded to the block
    size."""
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    b, lq, h, d = q.shape
    lk = k.shape[1]
    abq, abk = _auto_blocks(lq, lk)
    block_q = block_q or abq
    block_k = block_k or abk
    block_q = min(block_q, max(128, 1 << (lq - 1).bit_length()))
    block_k = min(block_k, max(128, 1 << (lk - 1).bit_length()))

    def to_bh(x, block):
        x = jnp.transpose(x, (0, 2, 1, 3)).reshape(b * h, x.shape[1], d)
        return _pad_to(x, 1, block)

    qb, kb, vb = to_bh(q, block_q), to_bh(k, block_k), to_bh(v, block_k)
    out = _flash_padded(qb, kb, vb, float(scale), (lq, lk),
                        (block_q, block_k))
    out = out[:, :lq].reshape(b, h, lq, d)
    return jnp.transpose(out, (0, 2, 1, 3))


def multi_head_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: Optional[float] = None,
    use_flash: Optional[bool] = None,
) -> jnp.ndarray:
    """Dispatcher.  (B, L, H, Dh) in/out."""
    if use_flash is None:
        # flash pays off once the score matrix stops fitting in VMEM
        use_flash = _tracing_on_tpu() and q.shape[1] >= 1024 and k.shape[1] >= 1024
    if use_flash:
        return flash_attention(q, k, v, scale=scale)
    return mha_einsum(q, k, v, scale=scale)


# ------------------------------------------- channel-packed (B, L, C) API --
#
# The head split/merge relayouts around the (BH, L, 40) kernel layout cost
# ~204 ms per generation call (r3 profile): splitting the 320-lane channel
# dim into (H=8, D=40) is a lane-splitting reshape, and the (B,L,H,D) ->
# (B,H,L,D) transpose relayouts a 40-lane minor dim that the tiled layout
# pads to 128.  The inference path below keeps tensors channel-packed and
# feeds the kernel a TRANSPOSED (B, C, L) layout instead: heads become
# *second-minor block indexing* (a 40-row sublane block is legal, unlike a
# 40-lane slice, which mosaic rejects), L is the 128-aligned lane dim, and
# both MXU dots are expressed via ``dot_general`` contracting dims so no
# transpose is needed in-kernel.  Training (the differentiated path) keeps
# the existing split-layout kernels via the custom-VJP fwd/bwd.


def _fwd_kernel_t(q_ref, k_ref, v_ref, o_ref, *, scale, kv_len):
    """Whole-sequence transposed-layout forward (inference only, no LSE).

    Blocks: q (1, d, Lq_p), k/v (1, d, Lk_p), out (1, d, Lq_p) — one head
    per program.  Scores are (Lk_p, Lq_p): softmax reduces over sublanes.
    """
    o = _attn_body_t(q_ref[0], k_ref[0], v_ref[0], scale, kv_len,
                     k_ref.shape[2])
    o_ref[0] = o.astype(o_ref.dtype)


# max fp32 score-tile elements for the whole-sequence transposed kernel
# (same budget as _auto_blocks: ~8MB for s, reused in-place for p)
_T_SCORE_CAP = 2 * 1024 * 1024


def _fwd_kernel_t_capped(q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref,
                         *, scale, kv_len, block_k):
    """Online-softmax transposed-layout forward for sequences whose whole
    score tile exceeds VMEM (video ST-Attn Lk=2800, exp-hd 5184 tokens):
    K/V are grid-blocked on the innermost dim with (m, l, acc) carried in
    VMEM scratch; the output block is written at the last K block."""
    j = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(j == 0)
    def _():
        m_ref[...] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    qt = q_ref[0].astype(jnp.float32) * scale  # (d, lq_p)
    kt = k_ref[0].astype(jnp.float32)          # (d, block_k)
    vt = v_ref[0].astype(jnp.float32)
    s = jax.lax.dot_general(kt, qt, (((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)  # (bk, lq_p)
    kpos = j * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
    s = jnp.where(kpos < kv_len, s, _NEG_INF)
    m_new = jnp.maximum(m_ref[...], jnp.max(s, axis=0, keepdims=True))
    p = jnp.exp(s - m_new)
    alpha = jnp.exp(m_ref[...] - m_new)
    l_ref[...] = alpha * l_ref[...] + jnp.sum(p, axis=0, keepdims=True)
    acc_ref[...] = alpha * acc_ref[...] + jax.lax.dot_general(
        vt, p, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    m_ref[...] = m_new

    @pl.when(j == nk - 1)
    def _():
        o_ref[0] = (acc_ref[...] / l_ref[...]).astype(o_ref.dtype)


_CAPPED_BLOCK_K = int(_os.environ.get("DUALDIFF_CAPPED_BLOCK_K", "0"))
# per-block (lq_p x block_k) f32 score-tile budget; 512 at lq_p=5248
# (10.7 MB, exp-hd 432x768) is the largest tile hardware-validated (r4)
_CAPPED_SCORE_BYTES = 11 * 2 ** 20


def _capped_block_k(lq_p: int) -> int:
    """K/V block for the capped kernel, measured per query length (r5):

    * lq_p <= 1408 (video ST-Attn 1400x2800): 1408 — two K blocks, pad
      2800->2816; e2e 24.39 s/clip vs 24.89 at 512, 24.60 at 256.
    * HD lq_p (2816 / 5248): 256 — hardware microbench
      (tools/bench_hd_attn.py): 48.9 TF/s vs 41.9 at 512 (L=2816, +17%);
      46.7 vs 43.3 (L=5184, +8%).  Dots-only floor at those shapes is
      69.4 / 62.7 TF/s, so the capped kernel runs at 70-75% of floor —
      the rest is online-softmax VPU work.  768+ blocks fail to compile
      at lq_p=5248 (score tile over VMEM)."""
    if _CAPPED_BLOCK_K:
        return _CAPPED_BLOCK_K
    if lq_p * 1408 * 4 <= _CAPPED_SCORE_BYTES:
        return 1408
    return 256


def _packed_infer_capped(q, k, v, scale, heads, lens,
                         block_k=None):
    """Transposed-layout inference with K/V grid-blocking (whole-q tile).

    block_k: default adapts to the query length (``_capped_block_k``);
    DUALDIFF_CAPPED_BLOCK_K forces a value for sweeps."""
    if block_k is None:
        block_k = _capped_block_k(-(-lens[0] // 128) * 128)
    lq, lk = lens
    b, _, c = q.shape
    d = c // heads
    _record_flops(4 * b * lq * lk * c)
    lq_p = -(-lq // 128) * 128
    lk_p = -(-lk // block_k) * block_k
    qt = _pad_to(jnp.swapaxes(q, 1, 2), 2, 128)
    kt = _pad_to(jnp.swapaxes(k, 1, 2), 2, block_k)
    vt = _pad_to(jnp.swapaxes(v, 1, 2), 2, block_k)
    out_t = pl.pallas_call(
        functools.partial(_fwd_kernel_t_capped, scale=scale, kv_len=lk,
                          block_k=block_k),
        grid=(b, heads, lk_p // block_k),
        in_specs=[
            pl.BlockSpec((1, d, lq_p), lambda i, h, j: (i, h, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, block_k), lambda i, h, j: (i, h, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, block_k), lambda i, h, j: (i, h, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, d, lq_p), lambda i, h, j: (i, h, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, c, lq_p), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((1, lq_p), jnp.float32),
            pltpu.VMEM((1, lq_p), jnp.float32),
            pltpu.VMEM((d, lq_p), jnp.float32),
        ],
        interpret=_interpret(),
    )(qt, kt, vt)
    return jnp.swapaxes(out_t, 1, 2)[:, :lq]


def _packed_infer(q, k, v, scale, heads, lens):
    """(B, L, C) inference path: transposed kernel, no head relayouts."""
    lq, lk = lens
    b, _, c = q.shape
    d = c // heads
    up128 = lambda x: -(-x // 128) * 128
    lq_p, lk_p = up128(lq), up128(lk)
    if d % 8 != 0 or lq_p > 5376:
        # head_dim not sublane-blockable / q tile beyond the VMEM envelope:
        # fall back to the split-layout kernels
        qb, kb, vb, blocks = _split_to_bh(q, k, v, heads, lens)
        out = _flash_padded(qb, kb, vb, scale, lens, blocks)
        return _merge_from_bh(out, b, heads, lq)
    if lq_p * lk_p > _T_SCORE_CAP:
        # whole score tile over VMEM (video ST-Attn lk=2800, exp-hd 5184):
        # K/V grid-blocked online-softmax variant
        return _packed_infer_capped(q, k, v, scale, heads, lens)
    _record_flops(4 * b * lq * lk * c)
    qt = _pad_to(jnp.swapaxes(q, 1, 2), 2, 128)
    kt = _pad_to(jnp.swapaxes(k, 1, 2), 2, 128)
    vt = _pad_to(jnp.swapaxes(v, 1, 2), 2, 128)
    out_t = pl.pallas_call(
        functools.partial(_fwd_kernel_t, scale=scale, kv_len=lk),
        grid=(b, heads),
        in_specs=[
            pl.BlockSpec((1, d, lq_p), lambda i, h: (i, h, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, lk_p), lambda i, h: (i, h, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, lk_p), lambda i, h: (i, h, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, d, lq_p), lambda i, h: (i, h, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, c, lq_p), q.dtype),
        interpret=_interpret(),
    )(qt, kt, vt)
    return jnp.swapaxes(out_t, 1, 2)[:, :lq]


def _split_to_bh(q, k, v, heads, lens):
    """(B, L, C) x3 -> block-padded (BH, L, D) x3 + blocks (training path)."""
    lq, lk = lens
    block_q, block_k = _auto_blocks(lq, lk)
    block_q = min(block_q, max(128, 1 << (lq - 1).bit_length()))
    block_k = min(block_k, max(128, 1 << (lk - 1).bit_length()))

    def go(t, block):
        b, l, c = t.shape
        d = c // heads
        x = t.reshape(b, l, heads, d).transpose(0, 2, 1, 3)
        return _pad_to(x.reshape(b * heads, l, d), 1, block)

    return go(q, block_q), go(k, block_k), go(v, block_k), (block_q, block_k)


def _merge_from_bh(x, b, heads, l):
    """(BH, L_p, D) -> (B, L, C)."""
    d = x.shape[-1]
    x = x[:, :l].reshape(b, heads, l, d).transpose(0, 2, 1, 3)
    return x.reshape(b, l, heads * d)


def _attn_body_t(qt, kt, vt, scale, kv_len, lk_p):
    """Transposed-layout attention body: qt (d, lq_p), kt/vt (d, lk_p) ->
    o (d, lq_p) fp32.  Shared by the plain and fused-neighbor kernels."""
    qt = qt.astype(jnp.float32) * scale
    kt = kt.astype(jnp.float32)
    vt = vt.astype(jnp.float32)
    s = jax.lax.dot_general(kt, qt, (((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)  # (lk_p, lq_p)
    m = jnp.max(s, axis=0, keepdims=True)  # (1, lq_p); >= 0 with pads
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=0, keepdims=True)
    n_pad = lk_p - kv_len
    if n_pad:
        # zero-padded K columns score s=0 and so add exactly exp(-m) each to
        # the denominator, while zero-padded V rows add nothing to the
        # numerator — correcting l here is cheaper than an iota+where mask
        # pass over the full (lk_p, lq_p) score tile
        l = l - n_pad * jnp.exp(-m)
    o = jax.lax.dot_general(vt, p, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)  # (d, lq_p)
    return o / l


def _fwd_kernel_t_nbr(q_ref, k_ref, v_ref, o_ref, *, scale, kv_len):
    """Fused ring-neighbor multiview attention (attn4 'add' semantics):
    grid (B, view, head, neighbor) with neighbor INNERMOST — both neighbor
    programs map to the same output block, which stays resident in VMEM;
    j==0 writes, j==1 accumulates.  The neighbor view is selected by the
    k/v BlockSpec index_map ((n +- 1) mod n_cam), so the gathered/stacked
    kv copies of the layer-level formulation never materialize."""
    j = pl.program_id(3)
    o = _attn_body_t(q_ref[0, 0], k_ref[0, 0], v_ref[0, 0], scale, kv_len,
                     k_ref.shape[3]).astype(o_ref.dtype)

    @pl.when(j == 0)
    def _():
        o_ref[0, 0] = o

    @pl.when(j != 0)
    def _():
        o_ref[0, 0] = o_ref[0, 0] + o


# ---------------------------------------- transposed-layout training path --
#
# For whole-tile shapes (self-attn / attn4 at 1408 tokens) the TRAINING
# forward/backward also runs in the (B, C, L) layout: no head split/merge
# relayouts around any of the three kernels, and the LSE is a natural
# (1, Lq) lane-oriented output instead of the split layout's 128-lane
# broadcast.  Backward tiles are VMEM-bounded by grid-blocking K (for dq)
# or Q (for dk/dv) with accumulators in scratch.


def _fwd_kernel_t_lse(q_ref, k_ref, v_ref, o_ref, lse_ref, *, scale, kv_len):
    qt = q_ref[0].astype(jnp.float32) * scale  # (d, lq_p)
    kt = k_ref[0].astype(jnp.float32)
    vt = v_ref[0].astype(jnp.float32)
    s = jax.lax.dot_general(kt, qt, (((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)  # (lk_p, lq_p)
    if kv_len < k_ref.shape[2]:
        kpos = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
        s = jnp.where(kpos < kv_len, s, _NEG_INF)
    m = jnp.max(s, axis=0, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=0, keepdims=True)
    o = jax.lax.dot_general(vt, p, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    o_ref[0] = (o / l).astype(o_ref.dtype)
    lse_ref[0] = m + jnp.log(l)  # (1, lq_p)


def _bwd_dq_kernel_t(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref,
                     acc_ref, *, scale, kv_len, block_k):
    """dq in transposed layout; grid (B, H, nk), K innermost, dq in scratch."""
    j = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(j == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    qt = q_ref[0].astype(jnp.float32)           # (d, lq_p)
    kt = k_ref[0].astype(jnp.float32)           # (d, block_k)
    vt = v_ref[0].astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)          # (d, lq_p)
    lse = lse_ref[0]                            # (1, lq_p)
    delta = delta_ref[0]                        # (1, lq_p)
    s = jax.lax.dot_general(kt, qt, (((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    kpos = j * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
    s = jnp.where(kpos < kv_len, s, _NEG_INF)
    p = jnp.exp(s - lse)                        # (block_k, lq_p)
    dp = jax.lax.dot_general(vt, do, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ds = p * (dp - delta)
    acc_ref[...] = acc_ref[...] + jax.lax.dot_general(
        kt, ds, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)

    @pl.when(j == nk - 1)
    def _():
        dq_ref[0] = (acc_ref[...] * scale).astype(dq_ref.dtype)


def _bwd_dkv_kernel_t(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                      dk_ref, dv_ref, dk_acc, dv_acc, *, scale):
    """dk/dv in transposed layout; grid (B, H, nq), Q innermost."""
    j = pl.program_id(2)
    nq = pl.num_programs(2)

    @pl.when(j == 0)
    def _():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    qt = q_ref[0].astype(jnp.float32)           # (d, block_q)
    kt = k_ref[0].astype(jnp.float32)           # (d, lk_p)
    vt = v_ref[0].astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)          # (d, block_q)
    lse = lse_ref[0]                            # (1, block_q)
    delta = delta_ref[0]
    s = jax.lax.dot_general(kt, qt, (((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    # no masking needed here: each dk/dv row depends only on its own K
    # position, so padded K rows produce garbage ONLY in the pad region
    # (sliced off by the caller), and padded q columns contribute nothing
    # because do and q are zero there
    p = jnp.exp(s - lse)                        # (lk_p, block_q)
    dv_acc[...] = dv_acc[...] + jax.lax.dot_general(
        do, p, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    dp = jax.lax.dot_general(vt, do, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ds = p * (dp - delta)
    dk_acc[...] = dk_acc[...] + jax.lax.dot_general(
        qt, ds, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)

    @pl.when(j == nq - 1)
    def _():
        dk_ref[0] = (dk_acc[...] * scale).astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[...].astype(dv_ref.dtype)


def _fwd_kernel_t_capped_lse(q_ref, k_ref, v_ref, o_ref, lse_ref,
                             m_ref, l_ref, acc_ref,
                             *, scale, kv_len, block_k):
    """Online-softmax transposed-layout TRAIN forward (K/V grid-blocked,
    whole-q tile) — `_fwd_kernel_t_capped` plus the LSE row the blocked
    backward consumes.  r5: before this, over-cap training shapes (video
    ST-Attn 1400x2800, exp-hd 2816/5184 self-attn) fell back to the
    split-layout kernels whose (B*H, L, 40) operands carry a 3.2x
    lane-padding memory expansion — the 2-frame RGD step stopped fitting
    16 GB.  The transposed layout is lane-dense (C=320 on lanes)."""
    j = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(j == 0)
    def _():
        m_ref[...] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    qt = q_ref[0].astype(jnp.float32) * scale  # (d, lq_p)
    kt = k_ref[0].astype(jnp.float32)          # (d, block_k)
    vt = v_ref[0].astype(jnp.float32)
    s = jax.lax.dot_general(kt, qt, (((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)  # (bk, lq_p)
    kpos = j * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
    s = jnp.where(kpos < kv_len, s, _NEG_INF)
    m_new = jnp.maximum(m_ref[...], jnp.max(s, axis=0, keepdims=True))
    p = jnp.exp(s - m_new)
    alpha = jnp.exp(m_ref[...] - m_new)
    l_ref[...] = alpha * l_ref[...] + jnp.sum(p, axis=0, keepdims=True)
    acc_ref[...] = alpha * acc_ref[...] + jax.lax.dot_general(
        vt, p, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    m_ref[...] = m_new

    @pl.when(j == nk - 1)
    def _():
        o_ref[0] = (acc_ref[...] / l_ref[...]).astype(o_ref.dtype)
        lse_ref[0] = m_ref[...] + jnp.log(l_ref[...])


def _train_t_eligible(heads, lens, c):
    lq, lk = lens
    d = c // heads
    up128 = lambda x: -(-x // 128) * 128
    if d % 8 != 0:
        return False
    if up128(lq) * up128(lk) <= _T_SCORE_CAP:
        return True  # whole-tile fwd
    # over-cap shapes (ST-Attn 1400x2800, exp-hd 2816/5184): K/V-blocked
    # LSE forward (r5) + the already-blocked backward; bounded by the
    # whole-q/whole-k tiles both kernels keep resident (the inference
    # envelope, hardware-validated to 5248 at block 512)
    return up128(lq) <= 5376 and up128(lk) <= 5376


def _packed_train_t_fwd(q, k, v, scale, heads, lens):
    """(B, L, C) training forward in the transposed layout, emitting LSE."""
    lq, lk = lens
    b, _, c = q.shape
    d = c // heads
    _record_flops(4 * b * lq * lk * c)
    up128 = lambda x: -(-x // 128) * 128
    lq_p, lk_p = up128(lq), up128(lk)
    qt = _pad_to(jnp.swapaxes(q, 1, 2), 2, 128)
    if lq_p * lk_p > _T_SCORE_CAP:
        # over-cap score tile: K/V-blocked online-softmax forward with LSE
        block_k = _capped_block_k(lq_p)
        kt = _pad_to(jnp.swapaxes(k, 1, 2), 2, block_k)
        vt = _pad_to(jnp.swapaxes(v, 1, 2), 2, block_k)
        out_t, lse = pl.pallas_call(
            functools.partial(_fwd_kernel_t_capped_lse, scale=scale,
                              kv_len=lk, block_k=block_k),
            grid=(b, heads, kt.shape[2] // block_k),
            in_specs=[
                pl.BlockSpec((1, d, lq_p), lambda i, h, j: (i, h, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, d, block_k), lambda i, h, j: (i, h, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, d, block_k), lambda i, h, j: (i, h, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((1, d, lq_p), lambda i, h, j: (i, h, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, lq_p),
                             lambda i, h, j: (i * heads + h, 0, 0),
                             memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((b, c, lq_p), q.dtype),
                jax.ShapeDtypeStruct((b * heads, 1, lq_p), jnp.float32),
            ),
            scratch_shapes=[
                pltpu.VMEM((1, lq_p), jnp.float32),
                pltpu.VMEM((1, lq_p), jnp.float32),
                pltpu.VMEM((d, lq_p), jnp.float32),
            ],
            interpret=_interpret(),
        )(qt, kt, vt)
        out = jnp.swapaxes(out_t, 1, 2)[:, :lq]
        return out, (qt, kt, vt, out_t, lse)
    kt = _pad_to(jnp.swapaxes(k, 1, 2), 2, 128)
    vt = _pad_to(jnp.swapaxes(v, 1, 2), 2, 128)
    out_t, lse = pl.pallas_call(
        functools.partial(_fwd_kernel_t_lse, scale=scale, kv_len=lk),
        grid=(b, heads),
        in_specs=[
            pl.BlockSpec((1, d, lq_p), lambda i, h: (i, h, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, lk_p), lambda i, h: (i, h, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, lk_p), lambda i, h: (i, h, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, d, lq_p), lambda i, h: (i, h, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, lq_p), lambda i, h: (i * heads + h, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, c, lq_p), q.dtype),
            jax.ShapeDtypeStruct((b * heads, 1, lq_p), jnp.float32),
        ),
        interpret=_interpret(),
    )(qt, kt, vt)
    out = jnp.swapaxes(out_t, 1, 2)[:, :lq]
    return out, (qt, kt, vt, out_t, lse)


def _packed_train_t_bwd(scale, heads, lens, res, g):
    lq, lk = lens
    qt, kt, vt, out_t, lse = res
    b, c, lq_p = qt.shape
    _record_flops(10 * b * lq * lk * c)
    d = c // heads
    lk_p = kt.shape[2]
    gt = _pad_to(jnp.swapaxes(g, 1, 2), 2, 128)  # (b, c, lq_p)
    # per-head delta = sum_d do * o, lane-oriented (B*H, 1, lq_p)
    delta = (gt.astype(jnp.float32) * out_t.astype(jnp.float32)) \
        .reshape(b, heads, d, lq_p).sum(axis=2).reshape(b * heads, 1, lq_p)

    blk = 512
    kt_b, vt_b = _pad_to(kt, 2, blk), _pad_to(vt, 2, blk)
    lk_b = kt_b.shape[2]
    spec_q = pl.BlockSpec((1, d, lq_p), lambda i, h, j: (i, h, 0),
                          memory_space=pltpu.VMEM)
    spec_kblk = pl.BlockSpec((1, d, blk), lambda i, h, j: (i, h, j),
                             memory_space=pltpu.VMEM)
    spec_row = pl.BlockSpec((1, 1, lq_p), lambda i, h, j: (i * heads + h, 0, 0),
                            memory_space=pltpu.VMEM)
    dq_t = pl.pallas_call(
        functools.partial(_bwd_dq_kernel_t, scale=scale, kv_len=lk,
                          block_k=blk),
        grid=(b, heads, lk_b // blk),
        in_specs=[spec_q, spec_kblk, spec_kblk, spec_q, spec_row, spec_row],
        out_specs=spec_q,
        out_shape=jax.ShapeDtypeStruct((b, c, lq_p), qt.dtype),
        scratch_shapes=[pltpu.VMEM((d, lq_p), jnp.float32)],
        interpret=_interpret(),
    )(qt, kt_b, vt_b, gt, lse, delta)

    qt_b, gt_b = _pad_to(qt, 2, blk), _pad_to(gt, 2, blk)
    lse_b, delta_b = _pad_to(lse, 2, blk), _pad_to(delta, 2, blk)
    lq_b = qt_b.shape[2]
    spec_qblk = pl.BlockSpec((1, d, blk), lambda i, h, j: (i, h, j),
                             memory_space=pltpu.VMEM)
    spec_k = pl.BlockSpec((1, d, lk_p), lambda i, h, j: (i, h, 0),
                          memory_space=pltpu.VMEM)
    spec_rowblk = pl.BlockSpec((1, 1, blk),
                               lambda i, h, j: (i * heads + h, 0, j),
                               memory_space=pltpu.VMEM)
    dk_t, dv_t = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel_t, scale=scale),
        grid=(b, heads, lq_b // blk),
        in_specs=[spec_qblk, spec_k, spec_k, spec_qblk, spec_rowblk,
                  spec_rowblk],
        out_specs=(spec_k, spec_k),
        out_shape=(jax.ShapeDtypeStruct((b, c, lk_p), kt.dtype),
                   jax.ShapeDtypeStruct((b, c, lk_p), vt.dtype)),
        scratch_shapes=[pltpu.VMEM((d, lk_p), jnp.float32),
                        pltpu.VMEM((d, lk_p), jnp.float32)],
        interpret=_interpret(),
    )(qt_b, kt, vt, gt_b, lse_b, delta_b)

    return (jnp.swapaxes(dq_t, 1, 2)[:, :lq],
            jnp.swapaxes(dk_t, 1, 2)[:, :lk],
            jnp.swapaxes(dv_t, 1, 2)[:, :lk])


_NBR_PIN_MESH = None


def set_neighbor_pin_mesh(mesh) -> None:
    """Register the active device mesh: on multi-device meshes the attn4
    neighbor attention switches to its collective-free unstacked form
    (see ``_nbr_stacked``).  Called by the trainer and the scaling
    projector; plain jit tracing exposes no ambient mesh in jax 0.9, so
    the concrete mesh must be plumbed."""
    global _NBR_PIN_MESH
    _NBR_PIN_MESH = mesh


def _nbr_stacked(q, k, v, scale, heads, n_cam, lens, use_flash):
    """Left/right ring-neighbor attention (training / fallback) — identical
    compute to gathering the hidden states first (row-wise GEMMs commute
    with the gather).

    Two formulations, numerically identical:

    * single device: stack [left; right] on the batch dim — one call with a
      2x GEMM batch (fewer kernel launches, better MXU batching);
    * sharded mesh (``set_neighbor_pin_mesh``): run the two neighbor
      attentions separately and add.  Concatenating along the SHARDED batch
      dim reshuffles rows across devices — measured 2.8-3.0 GB/step of
      collective-permutes at full train scale (projector provenance
      ``attn4/slice``); the unstacked form lowers with ZERO collectives
      under pure data parallelism (each device holds whole samples)."""
    bn, lq, c = q.shape
    b = bn // n_cam
    left = np.array([(i - 1) % n_cam for i in range(n_cam)])
    right = np.array([(i + 1) % n_cam for i in range(n_cam)])

    def take(t, idx):
        return jnp.take(t.reshape(b, n_cam, lq, c), idx,
                        axis=1).reshape(bn, lq, c)

    call = ((lambda a, b_, c_: _flash_packed(a, b_, c_, scale, heads, lens))
            if use_flash else
            (lambda a, b_, c_: _einsum_packed(a, b_, c_, scale, heads)))

    m = _NBR_PIN_MESH
    if m is not None and m.size > 1:
        return (call(q, take(k, left), take(v, left))
                + call(q, take(k, right), take(v, right)))
    q2 = jnp.concatenate([q, q], axis=0)
    k2 = jnp.concatenate([take(k, left), take(k, right)], axis=0)
    v2 = jnp.concatenate([take(v, left), take(v, right)], axis=0)
    out2 = call(q2, k2, v2)
    return out2[:bn] + out2[bn:]


def _nbr_train(q, k, v, scale, heads, n_cam, lens):
    return _nbr_stacked(q, k, v, scale, heads, n_cam, lens, use_flash=True)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _flash_packed_nbr(q, k, v, scale, heads, n_cam, lens):
    lq = lens[0]
    bn, _, c = q.shape
    b, d = bn // n_cam, c // heads
    lq_p = -(-lq // 128) * 128
    if d % 8 != 0 or lq_p * lq_p > _T_SCORE_CAP:
        return _nbr_train(q, k, v, scale, heads, n_cam, lens)

    _record_flops(8 * bn * lq * lq * c)  # 2 neighbor attentions per view

    def to_t(t):
        t = _pad_to(jnp.swapaxes(t, 1, 2), 2, 128)
        return t.reshape(b, n_cam, c, lq_p)

    qt, kt, vt = to_t(q), to_t(k), to_t(v)
    spec_self = pl.BlockSpec((1, 1, d, lq_p),
                             lambda i, n, h, j: (i, n, h, 0),
                             memory_space=pltpu.VMEM)
    # floored mod keeps the index in range for n=0, j=0 (left neighbor -1)
    spec_nbr = pl.BlockSpec(
        (1, 1, d, lq_p),
        lambda i, n, h, j: (i, (n + n_cam + 2 * j - 1) % n_cam, h, 0),
        memory_space=pltpu.VMEM)
    out_t = pl.pallas_call(
        functools.partial(_fwd_kernel_t_nbr, scale=scale, kv_len=lq),
        grid=(b, n_cam, heads, 2),
        in_specs=[spec_self, spec_nbr, spec_nbr],
        out_specs=spec_self,
        out_shape=jax.ShapeDtypeStruct((b, n_cam, c, lq_p), q.dtype),
        interpret=_interpret(),
    )(qt, kt, vt)
    return jnp.swapaxes(out_t.reshape(bn, c, lq_p), 1, 2)[:, :lq]


def _flash_packed_nbr_fwd(q, k, v, scale, heads, n_cam, lens):
    out, vjp = jax.vjp(
        lambda q_, k_, v_: _nbr_train(q_, k_, v_, scale, heads, n_cam, lens),
        q, k, v)
    return out, (vjp,)


def _flash_packed_nbr_bwd(scale, heads, n_cam, lens, carry, g):
    (vjp,) = carry
    return vjp(g)


_flash_packed_nbr.defvjp(_flash_packed_nbr_fwd, _flash_packed_nbr_bwd)


def attention_packed_neighbors(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    heads: int,
    n_cam: int,
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Ring-neighbor multiview attention (attn4 'add'): q/k/v are the
    PER-VIEW projections (B*n_cam, L, C); returns the sum over the left and
    right camera neighbors of attention(q[view], kv[neighbor]).

    The inference primal fuses neighbor selection into the kernel's
    BlockSpec index_map (no kv gather/stack materialization, and K/V
    projections run once per view instead of once per neighbor); training
    uses the stacked-batch flash path, numerically identical to the
    layer-level gather formulation."""
    lq = q.shape[1]
    d = q.shape[-1] // heads
    if scale is None:
        scale = 1.0 / math.sqrt(d)
    if _tracing_on_tpu() and lq >= _PACKED_MIN_LQ and d % 8 == 0:
        return _flash_packed_nbr(q, k, v, float(scale), heads, n_cam,
                                 (lq, lq))
    # CPU / short sequences: stacked einsum formulation
    return _nbr_stacked(q, k, v, float(scale), heads, n_cam, (lq, lq),
                        use_flash=False)


def _einsum_packed(q, k, v, scale, heads):
    b, lq, c = q.shape
    d = c // heads
    split = lambda t: t.reshape(t.shape[0], t.shape[1], heads, d)
    return mha_einsum(split(q), split(k), split(v),
                      scale=scale).reshape(b, lq, c)


# frame-axis (temporal) attention: sequences this short take the
# head-PACKED path — per-head (f x f) score matmuls would run the MXU at
# 16/128 occupancy across tens of thousands of batch rows
# (env override for A/B: 0 disables the path)
_HEADPACK_MAX_LQ = int(_os.environ.get("DUALDIFF_HEADPACK_MAX_LQ", "32"))


def _einsum_headpacked(q, k, v, scale, heads):
    """Tiny-sequence self-attention (video temporal attn: lq = frames <= 32)
    with all heads PACKED into one MXU tile.

    The per-head formulation lowers to b*heads batched (f, d) x (d, f)
    matmuls — at f=16, d=40 that is 67k 16x40x16 dots (measured 20 GFLOP/s,
    1.35 ms per layer eval in the r5 video trace).  Packing the 8 heads'
    frames along one axis gives a single (heads*f, d) x (d, heads*f) dot
    per row — a full 128-wide MXU tile at f=16 — and a block-diagonal mask
    restricts the softmax to each head's own (f x f) block, so the math is
    exactly per-head attention; the discarded cross-head logits are free
    relative to the layout win."""
    b, f, c = q.shape
    d = c // heads
    hf = heads * f

    def pack(t):  # (b, f, h*d) -> (b, h*f, d)
        return (t.reshape(b, f, heads, d).swapaxes(1, 2)
                .reshape(b, hf, d))

    qp, kp, vp = pack(q), pack(k), pack(v)
    s = jnp.einsum("bpd,bqd->bpq", qp, kp,
                   preferred_element_type=jnp.float32) * scale
    blk = jnp.arange(hf) // f
    s = jnp.where(blk[:, None] == blk[None, :], s, _NEG_INF)
    a = jax.nn.softmax(s, axis=-1).astype(v.dtype)
    o = jnp.einsum("bpq,bqd->bpd", a, vp)
    return o.reshape(b, heads, f, d).swapaxes(1, 2).reshape(b, f, c)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _headpacked(q, k, v, scale, heads):
    # primal (inference): head-packed single-tile path
    return _einsum_headpacked(q, k, v, scale, heads)


def _headpacked_fwd(q, k, v, scale, heads):
    # differentiated path: plain per-head einsum — the packed (heads*f)^2
    # score tensor would be SAVED as a grad residual at 8x lane/sublane
    # padding (f32[8400,16,16] -> 65 MB each, r5 RGD OOM) and carries 8x
    # discarded cross-head logits.  jax.checkpoint: even per-head, the
    # saved (b, heads, f, f) probability residuals tile at up to 64x
    # padding (f32[8400,8,2,2] -> 65 MB each); recomputing the tiny
    # frame-axis einsums in the backward saves only dense q/k/v.
    out, vjp = jax.vjp(
        jax.checkpoint(
            lambda q_, k_, v_: _einsum_packed(q_, k_, v_, scale, heads)),
        q, k, v)
    return out, (vjp,)


def _headpacked_bwd(scale, heads, carry, g):
    (vjp,) = carry
    return vjp(g)


_headpacked.defvjp(_headpacked_fwd, _headpacked_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _flash_packed(q, k, v, scale, heads, lens):
    # primal (non-differentiated) = inference: transposed-layout kernel
    return _packed_infer(q, k, v, scale, heads, lens)


def _flash_packed_fwd(q, k, v, scale, heads, lens):
    if _train_t_eligible(heads, lens, q.shape[-1]):
        # whole-tile shapes (self-attn/attn4 AND short-KV cross-attn):
        # transposed-layout training kernels — no head split/merge
        # relayouts in fwd OR bwd.  Short-KV (Lk=238 cross-attn) measured
        # 0.783 vs einsum 1.015 ms/iter fwd+bwd at the 1400-token training
        # shape (r4); pad K columns are masked in fwd/dq, and dk/dv pad
        # rows are garbage only in the sliced-off pad region.
        return _packed_train_t_fwd(q, k, v, scale, heads, lens)
    if lens[1] < 1024:
        # short-KV shapes the transposed kernels can't take (d % 8 != 0 or
        # over-cap score tile): einsum + XLA fusion
        out, vjp = jax.vjp(
            lambda q_, k_, v_: _einsum_packed(q_, k_, v_, scale, heads),
            q, k, v)
        return out, (vjp,)
    qb, kb, vb, blocks = _split_to_bh(q, k, v, heads, lens)
    out, res = _flash_padded_fwd(qb, kb, vb, scale, lens, blocks)
    return _merge_from_bh(out, q.shape[0], heads, lens[0]), (res, blocks)


def _flash_packed_bwd(scale, heads, lens, carry, g):
    if _train_t_eligible(heads, lens, g.shape[-1]):
        return _packed_train_t_bwd(scale, heads, lens, carry, g)
    if lens[1] < 1024:
        (vjp,) = carry
        return vjp(g)
    res, blocks = carry
    b, lq, c = g.shape
    d = c // heads
    gb = g.reshape(b, lq, heads, d).transpose(0, 2, 1, 3)
    gb = _pad_to(gb.reshape(b * heads, lq, d), 1, blocks[0])
    dq, dk, dv = _flash_padded_bwd(scale, lens, blocks, res, gb)
    return (_merge_from_bh(dq, b, heads, lens[0]),
            _merge_from_bh(dk, b, heads, lens[1]),
            _merge_from_bh(dv, b, heads, lens[1]))


_flash_packed.defvjp(_flash_packed_fwd, _flash_packed_bwd)


def attention_packed(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    heads: int,
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Channel-packed attention: q,k,v (B, L, C) -> (B, Lq, C).

    Long queries on TPU take the packed path, whose inference primal runs
    the transposed (B, C, L) kernel with zero head split/merge relayouts —
    measured 26% faster than the split kernels at the self-attn shape and
    45% faster than einsum at the cross-attn shape (Lk=158).  Training and
    short queries use einsum/split kernels (see ``_flash_packed_fwd``).
    """
    b, lq, c = q.shape
    d = c // heads
    if scale is None:
        scale = 1.0 / math.sqrt(d)
    if lq == k.shape[1] and lq <= _HEADPACK_MAX_LQ:
        # temporal (frame-axis) self-attention: head-packed inference
        # primal, per-head einsum under differentiation (custom VJP)
        return _headpacked(q, k, v, float(scale), heads)
    if _tracing_on_tpu() and lq >= _PACKED_MIN_LQ and d % 8 == 0:
        return _flash_packed(q, k, v, float(scale), heads,
                             (lq, k.shape[1]))
    return _einsum_packed(q, k, v, scale, heads)
