"""Full-network torch<->flax forward parity (the apex checkpoint-fidelity
gate, VERDICT r2 item 2).

Builds the reference's complete PointNet2CloudCondition
(pointnet2_with_pcld_condition.py:276-476) on CPU with the shipped MVP
config via the kernel stubs in tests/reference_torch.py, converts its
random-init state dict with torch_state_dict_to_flax, and asserts
end-to-end forward equality against this repo's model — for both the DDPM
denoiser (include_t) and the refine (no-t, upsample head) configurations.
This exercises every inter-module wire (feature ordering into FT modules,
additional_fea_dim bookkeeping, skip concats, output head) at once.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from point_diffusion_refinement_tpu.config import (
    DEFAULT_POINTNET_CONFIG,
    refine_config,
)
from point_diffusion_refinement_tpu.models import PointNet2CloudCondition
from point_diffusion_refinement_tpu.utils.torch_interop import (
    torch_state_dict_to_flax,
)

from reference_torch import load_reference_model


def _inputs(B=2, N=2048, M=3072, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.uniform(-1, 1, (B, N, 3)).astype(np.float32)
    cond = np.concatenate(
        [
            rng.uniform(-1, 1, (B, M, 3)),
            (rng.integers(0, 2, (B, M, 1)) * 2.0 - 1.0),
        ],
        axis=-1,
    ).astype(np.float32)
    label = rng.integers(0, 16, (B,)).astype(np.int64)
    return x, cond, label


def _run_pair(cfg, include_t, seed=0):
    RefModel = load_reference_model()
    torch.manual_seed(seed)
    tmodel = RefModel(dict(cfg)).eval()
    sd = {k: v.detach().cpu().numpy() for k, v in tmodel.state_dict().items()}
    params = torch_state_dict_to_flax(sd)
    fmodel = PointNet2CloudCondition.from_config(cfg)

    x, cond, label = _inputs(seed=seed)
    with torch.no_grad():
        tout = tmodel(
            torch.from_numpy(x),
            torch.from_numpy(cond),
            ts=torch.from_numpy(np.array([37.0, 502.0], np.float32))
            if include_t
            else None,
            label=torch.from_numpy(label),
        )
    ts = jnp.asarray([37.0, 502.0], jnp.float32) if include_t else None
    fout = fmodel.apply(
        params,
        jnp.asarray(x),
        jnp.asarray(cond),
        ts,
        jnp.asarray(label.astype(np.int32)),
    )
    return np.asarray(tout), np.asarray(fout)


def _assert_forward_parity(tout, fout):
    """Thresholds calibrated to pure f32 drift: with identical wiring the
    error distribution over (2,2048,3) outputs (rms ~0.3) measures
    median rel 7e-5 / q99 abs 7e-4, with a handful of outliers from
    near-tie neighbor-selection flips (two f32 pipelines order reductions
    differently; one flipped kNN neighbor moves a few local outputs by
    ~1e-2).  A wiring bug (wrong feature order into an FT module, skip
    concat misrouted, head mismatch) blows the MEDIAN by orders of
    magnitude, which is what this gate protects."""
    d = np.abs(tout - fout)
    rel = d / np.maximum(np.abs(tout), 1e-3)
    assert np.median(rel) < 1e-4, ("median rel", np.median(rel))
    assert np.quantile(d, 0.99) < 3e-3, ("q99 abs", np.quantile(d, 0.99))
    assert np.mean(d > 1e-2) < 5e-3, ("outlier fraction", np.mean(d > 1e-2))
    assert d.max() < 0.2, ("max abs", d.max())


class TestFullNetworkParity:
    def test_ddpm_denoiser_forward(self):
        """Shipped MVP DDPM config, include_t=True, (2,2048,3)+(2,3072,4)."""
        cfg = dict(DEFAULT_POINTNET_CONFIG)
        tout, fout = _run_pair(cfg, include_t=True, seed=0)
        assert tout.shape == fout.shape == (2, 2048, 3)
        _assert_forward_parity(tout, fout)

    def test_refine_no_t_forward(self):
        """Refine config: include_t=False, upsample head out_dim*factor.
        Parity is compared at f32 (the shipped refine config runs bf16
        compute on TPU; torch is f32)."""
        cfg = dict(refine_config()["pointnet_config"])
        cfg["compute_dtype"] = "float32"
        tout, fout = _run_pair(cfg, include_t=False, seed=1)
        assert tout.shape == fout.shape
        _assert_forward_parity(tout, fout)
