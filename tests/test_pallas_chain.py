"""Parity tests for the whole-chain ConditionedMLP Pallas kernel
(ops/pallas_chain.py) against the layer-by-layer module path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from point_diffusion_refinement_tpu.models.common import ConditionedMLP


def _mk(fused, **kw):
    base = dict(
        features=(32, 32, 64),
        include_t=True,
        include_condition=True,
        include_second_condition=True,
        bn=True,
        bn_first=False,
        bias=True,  # shipped configs run biased Dense layers
        first_conv_features=32,
        res_connect=True,
        activation="relu",
        dtype=jnp.bfloat16,
        fused=fused,
    )
    base.update(kw)
    return ConditionedMLP(**base)


CASES = [
    {},
    {"bn_first": True},
    {"first_conv_features": None, "res_connect": False},
    {"include_t": False, "include_condition": False,
     "include_second_condition": False, "features": (32, 32)},
    {"trim_last": True},
    {"features": (48, 48), "include_second_condition": False},  # 48%32!=0 GN tail
    {"bn": False, "res_connect": True, "first_conv_features": None},
    {"bias": False},
]


@pytest.mark.parametrize("case", CASES)
def test_fused_matches_module_path(case):
    rng = np.random.default_rng(5)
    B, M, K, C = 2, 64, 8, 35
    x = jnp.asarray(rng.normal(size=(B, M, K, C)).astype(np.float32)).astype(
        jnp.bfloat16
    )
    plain = _mk(False, **case)
    fused = _mk(True, **case)
    kw = {}
    if plain.include_t:
        kw["t_emb"] = jnp.asarray(rng.normal(size=(B, 16)).astype(np.float32))
    if plain.include_condition:
        kw["condition_emb"] = jnp.asarray(
            rng.normal(size=(B, 24)).astype(np.float32)
        )
    if plain.include_second_condition:
        kw["second_condition_emb"] = jnp.asarray(
            rng.normal(size=(B, 12)).astype(np.float32)
        )
    params = plain.init(jax.random.key(0), x, **kw)
    params_f = fused.init(jax.random.key(0), x, **kw)
    # identical tree: same leaves, same shapes (dummy-call construction)
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(
        params_f
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(params_f)
    ):
        assert a.shape == b.shape and a.dtype == b.dtype

    ref = np.asarray(plain.apply(params, x, **kw), np.float32)
    got = np.asarray(fused.apply(params, x, **kw), np.float32)
    assert got.shape == ref.shape
    scale = max(1.0, float(np.abs(ref).max()))
    np.testing.assert_allclose(got, ref, atol=3e-2 * scale, rtol=0)
    # and most entries agree to bf16 rounding
    close = np.mean(np.abs(got - ref) <= 8e-3 * scale)
    assert close > 0.99, close
