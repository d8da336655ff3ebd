"""Parity: fused Pallas AttentionPool vs the XLA path, same params.

The fused path (ops/pallas_attention.py) must be value-equivalent to the
XLA AttentionPool (models/attention.py) up to f32 reduction order, and its
param tree must be identical so checkpoints are interchangeable.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from point_diffusion_refinement_tpu.models.attention import AttentionPool


CASES = [
    # name, M, K, Cq, Ck, Cv, c_out, use_counts
    ("ft0", 128, 32, 4, 38, 32, 32, True),
    ("sa0", 64, 32, 35, 44, 32, 64, True),
    ("knnfp", 128, 8, 128, 166, 128, 128, False),
    ("tiny_m", 16, 32, 35, 38, 32, 32, True),
    ("wide_q", 64, 16, 70, 35, 64, 128, True),
]


@pytest.mark.parametrize("name,M,K,Cq,Ck,Cv,c_out,use_counts", CASES)
def test_fused_matches_xla(name, M, K, Cq, Ck, Cv, c_out, use_counts):
    B = 2
    rng = np.random.default_rng(hash(name) % 2 ** 31)
    mod = AttentionPool(c_out, dtype=jnp.bfloat16)
    feat = jnp.asarray(rng.standard_normal((B, M, Cq)).astype(np.float32))
    grouped = jnp.asarray(
        rng.standard_normal((B, M, K, Ck)).astype(np.float32)
    ).astype(jnp.bfloat16)
    gfo = jnp.asarray(
        rng.standard_normal((B, M, K, Cv)).astype(np.float32)
    ).astype(jnp.bfloat16)
    counts = (
        jnp.asarray(rng.integers(0, K + 1, (B, M)).astype(np.int32))
        if use_counts
        else "all"
    )
    params = mod.init(jax.random.key(0), feat, grouped, gfo, counts)
    params_fused = mod.init(
        jax.random.key(0), feat, grouped, gfo, counts, fused=True
    )
    # identical param trees (names, shapes, values) between the two paths
    flat_a = jax.tree_util.tree_flatten_with_path(params)[0]
    flat_b = jax.tree_util.tree_flatten_with_path(params_fused)[0]
    assert [p for p, _ in flat_a] == [p for p, _ in flat_b]
    for (_, a), (_, b) in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    ref = mod.apply(params, feat, grouped, gfo, counts)
    out = mod.apply(params, feat, grouped, gfo, counts, fused=True)
    assert out.shape == ref.shape == (B, M, c_out)
    assert out.dtype == ref.dtype
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-2, atol=2e-2
    )
    # tight agreement on the bulk (bf16 rounding differences only)
    med = np.median(np.abs(np.asarray(out) - np.asarray(ref)))
    assert med < 5e-3, med


def test_nonfusable_flags_fall_back():
    """Configs outside the shipped all-flags-true shape keep the XLA path
    (the fused kwarg must be a no-op there)."""
    B, M, K, Cq, Ck, Cv, c_out = 2, 16, 8, 8, 12, 16, 32
    rng = np.random.default_rng(0)
    mod = AttentionPool(c_out, dtype=jnp.bfloat16, attention_bn=False)
    feat = jnp.asarray(rng.standard_normal((B, M, Cq)).astype(np.float32))
    grouped = jnp.asarray(rng.standard_normal((B, M, K, Ck)).astype(np.float32))
    gfo = jnp.asarray(rng.standard_normal((B, M, K, Cv)).astype(np.float32))
    params = mod.init(jax.random.key(0), feat, grouped, gfo, "all")
    a = mod.apply(params, feat, grouped, gfo, "all")
    b = mod.apply(params, feat, grouped, gfo, "all", fused=True)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
