"""Model module tests: shapes, masking semantics, condition-feature hoisting
equivalence, and gradient flow on a miniature config."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from point_diffusion_refinement_tpu import models
from point_diffusion_refinement_tpu.config import tiny_pointnet_config
from point_diffusion_refinement_tpu.models import (
    AttentionPool,
    ConditionedMLP,
    Pnet2Stage,
    PointNet2CloudCondition,
    PointwiseNet,
    SetAbstraction,
    KnnFeaturePropagation,
    point_upsample,
)


def init_and_run(module, *args, **kwargs):
    params = module.init(jax.random.key(0), *args, **kwargs)
    return params, module.apply(params, *args, **kwargs)


class TestConditionedMLP:
    def test_shapes_and_injections(self):
        m = ConditionedMLP(
            (16, 32, 64), include_t=True, include_condition=True,
            include_second_condition=True, res_connect=True, bias=True,
        )
        x = jnp.ones((2, 5, 4, 7))
        t = jnp.ones((2, 12))
        c = jnp.ones((2, 9))
        c2 = jnp.ones((2, 11))
        _, out = init_and_run(m, x, t_emb=t, condition_emb=c, second_condition_emb=c2)
        assert out.shape == (2, 5, 4, 64)

    def test_residual_identity_when_dims_match(self):
        m = ConditionedMLP((8, 8), res_connect=True, bn=False)
        x = jnp.ones((1, 3, 2, 8))
        params = m.init(jax.random.key(0), x)
        # with matching dims there must be no residual projection Dense
        names = jax.tree_util.tree_leaves_with_path(params)
        dense_count = {p[1].key for p in [(None, k) for k, _ in []]}  # noqa
        flat = jax.tree_util.tree_flatten_with_path(params)[0]
        kernels = [jax.tree_util.keystr(k) for k, _ in flat if "kernel" in jax.tree_util.keystr(k)]
        assert len(kernels) == 2  # exactly the two SharedMLP Dense layers


class TestAttentionPool:
    def test_mask_ignores_padded_slots(self, rng_np):
        # Note: with attention_bn=True the reference leaks padded slots into
        # the GroupNorm statistics (attention.py:45-51 normalizes over N,K
        # before masking), so strict invariance only holds without the norms.
        m = AttentionPool(16, attention_bn=False)
        B, M, K = 2, 6, 8
        q = jnp.asarray(rng_np.standard_normal((B, M, 5)).astype(np.float32))
        gf = rng_np.standard_normal((B, M, K, 7)).astype(np.float32)
        gv = rng_np.standard_normal((B, M, K, 16)).astype(np.float32)
        counts = jnp.full((B, M), 3)
        params = m.init(jax.random.key(0), q, jnp.asarray(gf), jnp.asarray(gv), counts)
        out1 = m.apply(params, q, jnp.asarray(gf), jnp.asarray(gv), counts)
        # scramble the padded slots (>= count): output must not change
        gf2, gv2 = gf.copy(), gv.copy()
        gf2[:, :, 3:] = 99.0
        gv2[:, :, 3:] = -55.0
        out2 = m.apply(params, q, jnp.asarray(gf2), jnp.asarray(gv2), counts)
        np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-5)

    def test_all_counts(self, rng_np):
        m = AttentionPool(8, attention_bn=False, transform_grouped_feat_out=False)
        q = jnp.ones((1, 4, 3))
        gf = jnp.ones((1, 4, 5, 6))
        gv = jnp.ones((1, 4, 5, 8))
        _, out = init_and_run(m, q, gf, gv, "all")
        assert out.shape == (1, 4, 8)


class TestPnet2Stage:
    def test_shape_and_permutation_invariance(self, rng_np):
        m = Pnet2Stage((4, 16, 32), (32, 64))
        x = rng_np.standard_normal((2, 50, 4)).astype(np.float32)
        params = m.init(jax.random.key(0), jnp.asarray(x))
        out1 = m.apply(params, jnp.asarray(x))
        assert out1.shape == (2, 64)
        perm = rng_np.permutation(50)
        out2 = m.apply(params, jnp.asarray(x[:, perm]))
        # GroupNorm reduces over points: f32 summation order differs under
        # permutation, so exact invariance holds only to ~1e-4
        np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=2e-4)


class TestSetAbstraction:
    def test_shapes(self, rng_np):
        m = SetAbstraction(
            npoint=16, radius=0.4, nsample=8, mlp=(16, 16, 32),
            include_t=True, include_condition=True, use_xyz=True,
            include_abs_coordinate=True, include_center_coordinate=True,
            use_attention=True, res_connect=True, bias=True,
        )
        xyz = jnp.asarray(rng_np.uniform(-1, 1, (2, 64, 3)).astype(np.float32))
        feats = jnp.asarray(rng_np.standard_normal((2, 64, 6)).astype(np.float32))
        t = jnp.ones((2, 12))
        c = jnp.ones((2, 9))
        _, (new_xyz, new_feats) = init_and_run(m, xyz, feats, t_emb=t, condition_emb=c)
        assert new_xyz.shape == (2, 16, 3)
        assert new_feats.shape == (2, 16, 32)


class TestKnnFP:
    def test_shapes(self, rng_np):
        m = KnnFeaturePropagation(
            mlp1=(16, 16), mlp2=(16, 16), k=4, include_t=True,
            include_condition=True, include_second_condition=True,
            use_attention=True, res_connect=True, bias=True,
        )
        unknown = jnp.asarray(rng_np.uniform(-1, 1, (2, 32, 3)).astype(np.float32))
        known = jnp.asarray(rng_np.uniform(-1, 1, (2, 8, 3)).astype(np.float32))
        uf = jnp.asarray(rng_np.standard_normal((2, 32, 6)).astype(np.float32))
        kf = jnp.asarray(rng_np.standard_normal((2, 8, 12)).astype(np.float32))
        t = jnp.ones((2, 12))
        c = jnp.ones((2, 9))
        c2 = jnp.ones((2, 5))
        _, out = init_and_run(
            m, unknown, known, uf, kf, t_emb=t, condition_emb=c,
            second_condition_emb=c2,
        )
        assert out.shape == (2, 32, 16)


@pytest.fixture(scope="module")
def tiny_model_and_data():
    cfg = tiny_pointnet_config()
    model = PointNet2CloudCondition.from_config(cfg)
    rng = np.random.default_rng(7)
    B, N, M = 2, 64, 96
    x = jnp.asarray(rng.uniform(-1, 1, (B, N, 3)).astype(np.float32))
    cond = jnp.asarray(
        np.concatenate(
            [rng.uniform(-1, 1, (B, M, 3)), rng.integers(0, 2, (B, M, 1)) * 2.0 - 1],
            axis=-1,
        ).astype(np.float32)
    )
    ts = jnp.asarray([3.0, 500.0])
    label = jnp.asarray([1, 5])
    params = model.init(jax.random.key(0), x, cond, ts, label)
    return model, params, x, cond, ts, label


class TestPointNet2CloudCondition:
    def test_forward_shape(self, tiny_model_and_data):
        model, params, x, cond, ts, label = tiny_model_and_data
        out = model.apply(params, x, cond, ts, label)
        assert out.shape == (x.shape[0], x.shape[1], 3)
        assert np.isfinite(np.asarray(out)).all()

    def test_hoisted_condition_equals_fused_forward(self, tiny_model_and_data):
        """encode_condition + denoise must be numerically identical to
        __call__ — this is the invariant the sampling scan relies on (the
        reference's use_retained_condition_feature cache)."""
        model, params, x, cond, ts, label = tiny_model_and_data
        fused = model.apply(params, x, cond, ts, label)
        feats = model.apply(params, cond, method=model.encode_condition)
        split = model.apply(params, x, ts, label, feats, method=model.denoise)
        np.testing.assert_allclose(np.asarray(fused), np.asarray(split), atol=1e-6)

    def test_condition_features_are_x_independent(self, tiny_model_and_data):
        model, params, x, cond, ts, label = tiny_model_and_data
        feats = model.apply(params, cond, method=model.encode_condition)
        # denoising two different x with the same cond features works & differs
        out1 = model.apply(params, x, ts, label, feats, method=model.denoise)
        out2 = model.apply(params, x + 0.1, ts, label, feats, method=model.denoise)
        assert np.abs(np.asarray(out1) - np.asarray(out2)).max() > 1e-6

    def test_grad_flow(self, tiny_model_and_data):
        model, params, x, cond, ts, label = tiny_model_and_data

        def loss_fn(p):
            out = model.apply(p, x, cond, ts, label)
            return jnp.mean(out ** 2)

        g = jax.grad(loss_fn)(params)
        leaves = jax.tree_util.tree_leaves(g)
        assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
        nonzero = sum(float(np.abs(np.asarray(l)).sum() > 0) for l in leaves)
        assert nonzero / len(leaves) > 0.9  # nearly every param gets gradient

    def test_refine_mode_no_t(self):
        cfg = tiny_pointnet_config(include_t=False)
        model = PointNet2CloudCondition.from_config(cfg)
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.uniform(-1, 1, (1, 48, 3)).astype(np.float32))
        cond = jnp.asarray(rng.uniform(-1, 1, (1, 64, 4)).astype(np.float32))
        label = jnp.asarray([2])
        params = model.init(jax.random.key(0), x, cond, None, label)
        out = model.apply(params, x, cond, None, label)
        assert out.shape == (1, 48, 3)

    def test_upsample_head_dim(self):
        cfg = tiny_pointnet_config(include_t=False)
        cfg["point_upsample_factor"] = 4
        model = PointNet2CloudCondition.from_config(cfg)
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.uniform(-1, 1, (1, 32, 3)).astype(np.float32))
        cond = jnp.asarray(rng.uniform(-1, 1, (1, 48, 4)).astype(np.float32))
        params = model.init(jax.random.key(0), x, cond, None, jnp.asarray([0]))
        out = model.apply(params, x, cond, None, jnp.asarray([0]))
        assert out.shape == (1, 32, 3 * 5)  # (factor + 1) * out_dim

    def test_concat_partial_mode(self):
        cfg = tiny_pointnet_config()
        cfg["include_local_feature"] = False
        cfg["include_global_feature"] = False
        cfg["concate_partial_with_noisy_input"] = True
        model = PointNet2CloudCondition.from_config(cfg)
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.uniform(-1, 1, (1, 64, 3)).astype(np.float32))
        cond = jnp.asarray(rng.uniform(-1, 1, (1, 48, 3)).astype(np.float32))
        ts = jnp.asarray([5.0])
        label = jnp.asarray([0])
        params = model.init(jax.random.key(0), x, cond, ts, label)
        out = model.apply(params, x, cond, ts, label)
        assert out.shape == (1, 64, 3)


class TestPointUpsample:
    def test_matches_numpy(self, rng_np):
        B, N, F = 2, 10, 4
        coarse = rng_np.standard_normal((B, N, 3)).astype(np.float32)
        # without the center in the output, displacement = center + F grid
        # offsets = 3*(F+1) channels (point_upsample_module.py:4-28)
        disp = rng_np.standard_normal((B, N, 3 * (F + 1))).astype(np.float32)
        refined, inter = point_upsample(
            jnp.asarray(coarse), jnp.asarray(disp), F, False, 0.001
        )
        assert refined.shape == (B, N * F, 3)
        want_inter = coarse + disp[:, :, :3] * 0.001
        np.testing.assert_allclose(np.asarray(inter), want_inter, rtol=1e-5)
        grid = disp[:, :, 3:].reshape(B, N, F, 3) / np.sqrt(F)
        want = want_inter[:, :, None] + grid * 0.001
        np.testing.assert_allclose(
            np.asarray(refined), want.reshape(B, N * F, 3), rtol=1e-5, atol=1e-7
        )

    def test_center_in_output(self, rng_np):
        B, N, F = 1, 6, 4
        coarse = rng_np.standard_normal((B, N, 3)).astype(np.float32)
        disp = rng_np.standard_normal((B, N, 3 * F)).astype(np.float32)
        refined, inter = point_upsample(
            jnp.asarray(coarse), jnp.asarray(disp), F, True, 0.001
        )
        assert refined.shape == (B, N * F, 3)
        np.testing.assert_allclose(
            np.asarray(refined[:, -N:]), np.asarray(inter), rtol=1e-6
        )


class TestPointwiseNet:
    def test_shapes(self, rng_np):
        m = PointwiseNet(pnet_global_feature_architecture=((4, 8, 16), (16, 32)))
        x = jnp.asarray(rng_np.standard_normal((2, 32, 3)).astype(np.float32))
        cond = jnp.asarray(rng_np.standard_normal((2, 48, 4)).astype(np.float32))
        ts = jnp.asarray([1, 999])
        _, out = init_and_run(m, x, cond, ts)
        assert out.shape == (2, 32, 3)


class TestAvgMaxGlobalAttentionModel:
    """The avg_max-pooling + coarse-level global-attention variant (the
    reference's T1000..._avg_max_pooling_... experiment; exp_configs.py
    ddpm_avg_max_config): full forward + gradient through every branch the
    standard config skips."""

    def test_forward_and_grad(self, rng_np):
        from point_diffusion_refinement_tpu.models import PointNet2CloudCondition

        cfg = tiny_pointnet_config()
        cfg["pooling"] = "avg_max"
        cfg["global_attention_setting"] = {
            "use_global_attention_module": True,
            "attention_bn": True,
            "last_activation": True,
            "global_attention_layer_index": [0, 1],
        }
        model = PointNet2CloudCondition.from_config(cfg)
        B, N, M = 2, 32, 48
        x = jnp.asarray(rng_np.uniform(-1, 1, (B, N, 3)).astype(np.float32))
        cond = jnp.asarray(
            np.concatenate(
                [rng_np.uniform(-1, 1, (B, M, 3)), np.ones((B, M, 1))], axis=-1
            ).astype(np.float32)
        )
        ts = jnp.zeros((B,), jnp.float32)
        label = jnp.zeros((B,), jnp.int32)
        params = model.init(jax.random.key(0), x, cond, ts, label)
        # the global-attention score branch must own parameters
        flat = jax.tree_util.tree_leaves_with_path(params)
        assert any("GlobalSelfAttention" in jax.tree_util.keystr(k) for k, _ in flat)

        def loss(p):
            out = model.apply(p, x, cond, ts, label)
            return jnp.mean(out ** 2)

        val, grads = jax.value_and_grad(loss)(params)
        assert np.isfinite(float(val))
        norms = [float(jnp.linalg.norm(g)) for g in jax.tree_util.tree_leaves(grads)]
        assert all(np.isfinite(n) for n in norms)
