"""Grad parity: differentiable windowed grouping (ops/windowed_grad.py) vs
the unfused query_and_group path.

The losses are center-permutation-invariant sums, so the windowed path's
sorted-query output order drops out and values/grads must agree up to bf16
rounding of the fused gathers.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from point_diffusion_refinement_tpu.models.grouping import query_and_group
from point_diffusion_refinement_tpu.ops.windowed_grad import (
    windowed_group_train,
)

B, N, M, K, C = 2, 256, 128, 8, 12
RADIUS = 0.35


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(0)
    xyz = jnp.asarray(rng.uniform(-1, 1, (B, N, 3)).astype(np.float32))
    feats = jnp.asarray(rng.standard_normal((B, N, C)).astype(np.float32))
    new_xyz = xyz[:, :M] + 0.01  # centers near real points, some empty balls
    return xyz, feats, new_xyz


def _reduce(grouped, counts):
    # quadratic loss: gradients route linearly through the gather, so the
    # comparison isolates the VJP's scatter/position routing from chaos
    # amplification of the fused path's bf16-rounded forward values
    g = grouped.astype(jnp.float32)
    w = 1.0 + 0.1 * jnp.arange(g.shape[-1], dtype=jnp.float32)
    return jnp.sum(jnp.square(g) * w)


def loss_ref(xyz, feats, new_xyz):
    g, counts = query_and_group(
        xyz, new_xyz, feats, radius=RADIUS, nsample=K,
        use_xyz=True, include_abs_coordinate=True, subset=True,
        lossy_features=True,
    )
    return _reduce(g, counts)


def loss_win(xyz, feats, new_xyz):
    grouped, counts, idx, order, inv = windowed_group_train(
        xyz, feats, new_xyz, RADIUS, K, False, "row0", True
    )
    return _reduce(grouped, counts)


class TestWindowedGroupTrain:
    def test_forward_matches(self, data):
        xyz, feats, new_xyz = data
        v_ref = float(loss_ref(xyz, feats, new_xyz))
        v_win = float(loss_win(xyz, feats, new_xyz))
        np.testing.assert_allclose(v_win, v_ref, rtol=2e-2)

    def test_grads_match_unfused(self, data):
        xyz, feats, new_xyz = data
        g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(xyz, feats, new_xyz)
        g_win = jax.grad(loss_win, argnums=(0, 1, 2))(xyz, feats, new_xyz)
        for a, b, name in zip(g_ref, g_win, ("xyz", "feats", "new_xyz")):
            a, b = np.asarray(a), np.asarray(b)
            scale = np.abs(a).max() + 1e-6
            np.testing.assert_allclose(
                b / scale, a / scale, atol=3e-2,
                err_msg=f"grad mismatch for {name}",
            )
            # direction agreement (bf16 rounding cannot flip the gradient)
            num = float((a * b).sum())
            den = float(np.linalg.norm(a) * np.linalg.norm(b) + 1e-12)
            assert num / den > 0.99, (name, num / den)

    def test_sa_module_train_path(self, monkeypatch, data):
        """SetAbstraction with PDR_WINDOWED_TRAIN=1 must stay differentiable
        and match the unfused module's loss/grads."""
        import flax.linen as nn

        from point_diffusion_refinement_tpu.models.modules import SetAbstraction

        xyz, feats, new_xyz = data
        xyz_big = jnp.tile(xyz, (1, 4, 1))[:, :1024]  # N >= 1024 eligibility
        feats_big = jnp.tile(feats, (1, 4, 1))[:, :1024]
        mod = SetAbstraction(
            npoint=128, radius=RADIUS, nsample=K, mlp=(16, 16),
            include_abs_coordinate=True, dtype=jnp.bfloat16,
        )
        params = mod.init(jax.random.key(0), xyz_big, feats_big)

        def loss_fn(p, x, f):
            _, out = mod.apply(p, x, f)
            return jnp.sum(jnp.square(out.astype(jnp.float32)))

        v0, g0 = jax.value_and_grad(loss_fn)(params, xyz_big, feats_big)
        monkeypatch.setenv("PDR_WINDOWED_TRAIN", "1")
        v1, g1 = jax.value_and_grad(loss_fn)(params, xyz_big, feats_big)
        np.testing.assert_allclose(float(v1), float(v0), rtol=3e-2)
        flat0 = jax.tree_util.tree_leaves(g0)
        flat1 = jax.tree_util.tree_leaves(g1)
        for a, b in zip(flat0, flat1):
            a, b = np.asarray(a), np.asarray(b)
            scale = np.abs(a).max() + 1e-6
            np.testing.assert_allclose(b / scale, a / scale, atol=5e-2)
