"""Round-4 verdict/advice fixes.

Covers:
  * direct f32-vs-bf16 drift bounds for _SplitConcatGroupNorm and
    AttentionPool (advisor r3 medium),
  * grad parity of the lossy (bf16) one-hot grouped gather (advisor r3 low),
  * the one-shot trace-time warning when the windowed fast path is
    ineligible (VERDICT r3 item 7),
  * generation falling back to train_config.output_directory for the
    checkpoint (VERDICT r3 item 6),
  * descriptive error for SupportCtxT with misaligned query counts
    (advisor r3 low),
  * the fps_ordered cross-level invariant: level-1 SA centers equal FPS of
    the level-0 output through the full model (advisor r3 low).
"""

import copy
import os
import warnings

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from point_diffusion_refinement_tpu.config import tiny_pointnet_config
from point_diffusion_refinement_tpu.config.loader import DEFAULT_POINTNET_CONFIG
from point_diffusion_refinement_tpu.models.attention import (
    AttentionPool,
    _SplitConcatGroupNorm,
)
from point_diffusion_refinement_tpu.models.condition_net import (
    PointNet2CloudCondition,
)
from point_diffusion_refinement_tpu.ops.sampling import (
    _group_points_onehot,
    furthest_point_sample,
    gather_points,
)
from point_diffusion_refinement_tpu.utils.logging import reset_warn_once


class TestBf16PathDrift:
    """The bf16 inference paths round (mul, add) separately and multiply-add
    in bf16, so outputs can differ from round_bf16(f32 path) by a few bf16
    ulps.  These tests pin the measured envelope so numeric drift for
    existing checkpoints stays bounded and visible."""

    def test_split_concat_groupnorm_drift(self, rng_np):
        B, M, K, C1, C2 = 2, 64, 8, 32, 41
        q = rng_np.normal(size=(B, M, C1)).astype(np.float32)
        k = rng_np.normal(size=(B, M, K, C2)).astype(np.float32)

        mod32 = _SplitConcatGroupNorm(32, K, dtype=None)
        v = mod32.init(jax.random.PRNGKey(0), jnp.asarray(q), jnp.asarray(k))
        # non-trivial affine params so scale/bias rounding is exercised
        gp = v["params"]["GroupNorm_0"]
        gp = {
            "scale": gp["scale"] + jnp.asarray(
                rng_np.normal(size=gp["scale"].shape, scale=0.3), jnp.float32
            ),
            "bias": gp["bias"] + jnp.asarray(
                rng_np.normal(size=gp["bias"].shape, scale=0.3), jnp.float32
            ),
        }
        v = {"params": {"GroupNorm_0": gp}}
        qn32, kn32 = mod32.apply(v, jnp.asarray(q), jnp.asarray(k))

        mod16 = _SplitConcatGroupNorm(32, K, dtype=jnp.bfloat16)
        qn16, kn16 = mod16.apply(
            v,
            jnp.asarray(q, jnp.bfloat16),
            jnp.asarray(k, jnp.bfloat16),
        )

        for a32, a16 in ((qn32, qn16), (kn32, kn16)):
            a32 = np.asarray(a32, np.float32)
            a16 = np.asarray(a16, np.float32)
            # measured envelope (median ~2.6e-3, q99 ~4.4e-2): a few bf16
            # ulps (eps = 2^-8) on top of the input-rounding noise
            denom = np.maximum(np.abs(a32), 1e-2)
            rel = np.abs(a16 - a32) / denom
            assert np.median(rel) < 0.006, np.median(rel)
            assert np.quantile(rel, 0.99) < 0.06, np.quantile(rel, 0.99)

    def test_attention_pool_drift(self, rng_np):
        B, M, K, Cq, Ck, Cout = 2, 64, 8, 32, 41, 32
        feat = rng_np.normal(size=(B, M, Cq)).astype(np.float32)
        gfeat = rng_np.normal(size=(B, M, K, Ck)).astype(np.float32)
        gout = rng_np.normal(size=(B, M, K, Cout)).astype(np.float32)
        counts = rng_np.integers(1, K + 1, size=(B, M)).astype(np.int32)

        ap32 = AttentionPool(Cout, dtype=None)
        v = ap32.init(
            jax.random.PRNGKey(1), jnp.asarray(feat), jnp.asarray(gfeat),
            jnp.asarray(gout), jnp.asarray(counts),
        )
        out32 = np.asarray(
            ap32.apply(
                v, jnp.asarray(feat), jnp.asarray(gfeat), jnp.asarray(gout),
                jnp.asarray(counts),
            ),
            np.float32,
        )
        ap16 = AttentionPool(Cout, dtype=jnp.bfloat16)
        out16 = np.asarray(
            ap16.apply(
                v,
                jnp.asarray(feat, jnp.bfloat16),
                jnp.asarray(gfeat, jnp.bfloat16),
                jnp.asarray(gout, jnp.bfloat16),
                jnp.asarray(counts),
            ),
            np.float32,
        )
        # bf16 activations through 3 dense + 2 GN layers plus bf16 softmax
        # weights: the measured drift envelope (median ~1e-3, q99 ~2e-2)
        denom = np.maximum(np.abs(out32), 1e-2)
        rel = np.abs(out16 - out32) / denom
        assert np.median(rel) < 0.01, np.median(rel)
        assert np.quantile(rel, 0.99) < 0.08, np.quantile(rel, 0.99)


class TestLossyGatherGrad:
    """The lossy one-hot gather emits bf16 and its einsum VJP therefore
    rounds the transposed scatter-sum to bf16 once per row.  Bound the
    gradient drift vs the exact f32 accumulation (advisor r3: sampling.py
    bf16 VJP was unconvered by any gradient test)."""

    def test_group_points_lossy_grad_close_to_f32(self, rng_np):
        B, N, M, K, C = 2, 64, 16, 8, 24
        pts = rng_np.normal(size=(B, N, C)).astype(np.float32)
        idx = rng_np.integers(0, N, size=(B, M, K)).astype(np.int32)
        ct = rng_np.normal(size=(B, M, K, C)).astype(np.float32)

        def run(lossy):
            f = lambda p: _group_points_onehot(
                p, jnp.asarray(idx), lossy=lossy
            ).astype(jnp.float32)
            out, vjp = jax.vjp(f, jnp.asarray(pts))
            (g,) = vjp(jnp.asarray(ct))
            return np.asarray(out), np.asarray(g)

        out32, g32 = run(False)
        out16, g16 = run(True)
        # forward: one-hot contraction has one product per element, so bf16
        # output == round_bf16(f32 result) up to 1 ulp of backend-dependent
        # conversion tie-breaking (CPU XLA flips a handful of ties)
        np.testing.assert_allclose(
            out16, np.asarray(jnp.asarray(out32, jnp.bfloat16), np.float32),
            rtol=2 ** -7,  # 1 ulp for a mantissa just above a power of two
        )
        # backward: per-row scatter sums accumulate in f32 in the MXU and
        # round once to bf16; tolerance = bf16 eps on the summed magnitude
        scale = np.abs(g32).max()
        np.testing.assert_allclose(g16, g32, atol=0.01 * scale, rtol=0.02)


def _abstract_trace_windowed(n_points: int):
    """Trace (never execute) encode_condition(windowed_ft=True) + denoise on
    the shipped config at the given x_t cloud size, collecting warnings."""
    pc = copy.deepcopy(dict(DEFAULT_POINTNET_CONFIG))
    pc["compute_dtype"] = "bfloat16"
    model = PointNet2CloudCondition.from_config(pc)

    def build_and_run():
        x = jnp.zeros((1, n_points, 3), jnp.float32)
        cond = jnp.zeros((1, 3072, 4), jnp.float32)
        ts = jnp.zeros((1,), jnp.float32)
        label = jnp.zeros((1,), jnp.int32)
        variables = model.init(jax.random.PRNGKey(0), x, cond, ts, label)
        cf = model.apply(
            variables, cond, windowed_ft=True, method=model.encode_condition
        )
        return model.apply(
            variables, x, ts, label, cf, method=model.denoise
        )

    reset_warn_once()
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        jax.eval_shape(build_and_run)
    return [str(w.message) for w in rec if w.category is UserWarning]


class TestWindowedIneligibilityWarning:
    def test_warns_for_unaligned_cloud(self):
        msgs = _abstract_trace_windowed(2000)
        hits = [m for m in msgs if "slower unfused" in m]
        assert hits, msgs
        # names the failed predicate
        assert any("not a multiple of 128" in m or "2000" in m for m in hits)

    def test_silent_for_shipped_config(self):
        msgs = _abstract_trace_windowed(2048)
        hits = [m for m in msgs if "slower unfused" in m]
        assert not hits, hits


class TestSupportCtxTDispatch:
    def test_descriptive_error_for_misaligned_queries(self, rng_np):
        from point_diffusion_refinement_tpu.ops.pallas_window import (
            build_query_ctx,
            build_support_ctx_t,
            windowed_ball_group,
        )

        xyz = jnp.asarray(rng_np.normal(size=(1, 2048, 3)), jnp.float32)
        feats = jnp.asarray(rng_np.normal(size=(1, 2048, 8)), jnp.bfloat16)
        sup = build_support_ctx_t(xyz, [feats])
        assert sup is not None
        q = jnp.asarray(rng_np.normal(size=(1, 200, 3)), jnp.float32)
        qctx = build_query_ctx(q, sup.axis_onehot)
        with pytest.raises(ValueError, match="128"):
            windowed_ball_group(sup, qctx, 0.2, 8, interpret=True)


class TestFpsOrderedInvariant:
    """Level i>0 SA input must be the previous level's new_xyz in FPS
    selection order; then fps_ordered's identity prefix IS an FPS sample.
    Check through the full model that the captured sa_1 centers equal an
    explicit FPS of the captured sa_0 centers."""

    def test_level1_centers_are_fps_of_level0(self, rng_np):
        pc = tiny_pointnet_config(levels=2)
        model = PointNet2CloudCondition.from_config(pc)
        x = jnp.asarray(rng_np.normal(size=(2, 48, 3)), jnp.float32)
        cond = jnp.asarray(rng_np.normal(size=(2, 32, 4)), jnp.float32)
        ts = jnp.zeros((2,), jnp.float32)
        label = jnp.zeros((2,), jnp.int32)
        variables = model.init(jax.random.PRNGKey(0), x, cond, ts, label)
        _, state = model.apply(
            variables, x, cond, ts, label,
            capture_intermediates=lambda mod, name: name == "__call__",
        )
        inter = state["intermediates"]
        xyz0 = inter["sa_0"]["__call__"][0][0]  # (B, 32, 3)
        xyz1 = inter["sa_1"]["__call__"][0][0]  # (B, 16, 3)
        idx = furthest_point_sample(xyz0, xyz1.shape[1])
        expect = gather_points(xyz0, idx)
        np.testing.assert_allclose(np.asarray(xyz1), np.asarray(expect))


class TestGenerationCkptPathFallback:
    """A config that customizes only train_config.output_directory must
    generate without a gen_config (VERDICT r3: FileNotFoundError observed
    live when the two defaults drifted)."""

    def test_generation_finds_custom_output_directory(self, tmp_path):
        from point_diffusion_refinement_tpu.data import write_mvp_style_h5
        from point_diffusion_refinement_tpu.sample.pipeline import (
            run_generation,
        )
        from point_diffusion_refinement_tpu.train.loop import train

        data_dir = str(tmp_path / "mvp")
        write_mvp_style_h5(
            data_dir, num_shapes=2, npoints=48, partial_points=32
        )
        cfg = {
            "diffusion_config": {"T": 4, "beta_0": 1e-4, "beta_T": 0.02},
            "pointnet_config": tiny_pointnet_config(),
            "train_config": {
                "task": "completion",
                "root_directory": str(tmp_path / "exp"),
                "output_directory": "custom/ckpt_dir",  # NOT logs/checkpoint
                "ckpt_iter": "max",
                "epochs_per_ckpt": 100,
                "n_epochs": 1,
                "learning_rate": 2e-4,
                "conditioned_on_cloud": True,
                "compute_emd": False,
            },
            "mvp_dataset_config": {
                "data_dir": data_dir,
                "npoints": 48,
                "novel_input": False,
                "scale": 1,
                "batch_size": 8,
                "eval_batch_size": 8,
                "num_samples_tested": 0,
                "augmentation": {},
            },
            # no gen_config at all
        }
        train(cfg, max_steps=2)
        res = run_generation(
            cfg, phase="test", num_trials=1, save_generated=False,
            compute_emd=False, batch_size=8, segment_size=None,
        )
        assert res, "generation returned no results"
