"""Numerics of the lane-preserving GroupNorm vs flax's reference module.

The custom module restructures the stats computation (per-channel moments
combined into group stats) for TPU layout reasons (see
``dualdiff_tpu/models/norms.py``); these tests pin that the restructure is
numerically a no-op at both fp32 and the bf16-normalize operating point.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dualdiff_tpu.models.norms import GroupNorm


def _pair(shape, groups, dtype, eps=1e-6, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(2.0, 3.0, shape), dtype)
    ours = GroupNorm(groups, epsilon=eps, dtype=dtype)
    ref = nn.GroupNorm(groups, epsilon=eps, dtype=dtype)
    key = jax.random.PRNGKey(seed)
    vo = ours.init(key, x)
    # non-trivial affine params, shared by both modules
    params = {"scale": jnp.asarray(rng.normal(1.0, 0.2, shape[-1]), jnp.float32),
              "bias": jnp.asarray(rng.normal(0.0, 0.5, shape[-1]), jnp.float32)}
    assert jax.tree.map(jnp.shape, vo["params"]) == jax.tree.map(jnp.shape, params)
    yo = ours.apply({"params": params}, x)
    yr = ref.apply({"params": params}, x)
    return np.asarray(yo, np.float32), np.asarray(yr, np.float32)


@pytest.mark.parametrize("shape,groups", [((2, 14, 25, 64), 32),
                                          ((3, 40, 64), 8),
                                          ((2, 9, 11, 32), 32)])
def test_matches_flax_fp32(shape, groups):
    yo, yr = _pair(shape, groups, jnp.float32)
    np.testing.assert_allclose(yo, yr, rtol=2e-5, atol=2e-5)


def test_matches_flax_bf16_normalize():
    # bf16 input, bf16 normalize pass, f32 stats — the shipped configuration
    yo, yr = _pair((2, 14, 25, 64), 32, jnp.bfloat16)
    # both are bf16-rounded; allow one-ulp-scale disagreement
    np.testing.assert_allclose(yo, yr, rtol=2e-2, atol=2e-2)


def test_param_tree_matches_flax_names():
    x = jnp.zeros((1, 4, 4, 32))
    v = GroupNorm(32).init(jax.random.PRNGKey(0), x)
    assert set(v["params"]) == {"scale", "bias"}
    assert v["params"]["scale"].shape == (32,)
    assert v["params"]["scale"].dtype == jnp.float32


def test_rejects_indivisible_groups():
    with pytest.raises(ValueError):
        GroupNorm(7).init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 4, 32)))


def test_degenerate_spatial_and_near_constant_input_stay_finite():
    """var = E[x^2] - E[x]^2 can cancel NEGATIVE under rounding (bf16 input,
    1-6 spatial elements); unclamped, rsqrt(var + eps) is NaN — observed on
    TPU at the 32x48 tiny-smoke scale (deep blocks reduce over 2x3 / 1x2
    windows).  The clamp (flax semantics) must keep every such case finite."""
    rng = np.random.default_rng(0)
    gn = GroupNorm(num_groups=4, epsilon=1e-6, dtype=jnp.bfloat16)
    for h, w in [(1, 1), (1, 2), (2, 3), (3, 3)]:
        for scale in (1.0, 300.0, 1e4):
            x = (scale * (1 + 1e-4 * rng.standard_normal((2, h, w, 16))))
            x = jnp.asarray(x, jnp.bfloat16)
            p = gn.init(jax.random.PRNGKey(0), x)
            y = gn.apply(p, x)
            assert bool(jnp.isfinite(y.astype(jnp.float32)).all()), (h, w, scale)
