"""Torch->flax converter structural tests: synthetic reference-style state
dicts must convert into trees that exactly match flax init structure."""

import numpy as np
import jax
import jax.numpy as jnp

from point_diffusion_refinement_tpu.models import AttentionPool, ConditionedMLP
from point_diffusion_refinement_tpu.utils.torch_interop import (
    _convert_attention,
    _convert_mlp_plus_t,
    _SD,
    torch_state_dict_to_flax,
)


def tree_spec(t):
    return {
        jax.tree_util.keystr(k): np.shape(v)
        for k, v in jax.tree_util.tree_flatten_with_path(t)[0]
    }


def synth_mlp_sd(prefix, c_in, f, t_dim=12, c_dim=9, c2_dim=11, rng=None):
    """Reference-style Mlp_plus_t_emb state dict (bn_first=False, bias=True,
    include t/cond/second_cond, res_connect)."""
    rng = rng or np.random.default_rng(0)
    sd = {}
    dims = [c_in] + list(f)
    names = ["first_mlp", "second_mlp", "rest_mlp"]
    for li, name in enumerate(names):
        sd[f"{prefix}.{name}.0.weight"] = rng.standard_normal(
            (dims[li + 1], dims[li], 1, 1)
        ).astype(np.float32)
        sd[f"{prefix}.{name}.0.bias"] = rng.standard_normal(dims[li + 1]).astype(np.float32)
        sd[f"{prefix}.{name}.1.group_norm.weight"] = np.ones(
            dims[li + 1] - dims[li + 1] % 32 if dims[li + 1] >= 32 else dims[li + 1],
            np.float32,
        )
        sd[f"{prefix}.{name}.1.group_norm.bias"] = np.zeros_like(
            sd[f"{prefix}.{name}.1.group_norm.weight"]
        )
    sd[f"{prefix}.fc.weight"] = rng.standard_normal((f[0], t_dim)).astype(np.float32)
    sd[f"{prefix}.fc.bias"] = np.zeros(f[0], np.float32)
    sd[f"{prefix}.fc_condition.weight"] = rng.standard_normal((f[1], c_dim)).astype(np.float32)
    sd[f"{prefix}.fc_condition.bias"] = np.zeros(f[1], np.float32)
    sd[f"{prefix}.fc_second_condition.weight"] = rng.standard_normal((f[2], c2_dim)).astype(np.float32)
    sd[f"{prefix}.fc_second_condition.bias"] = np.zeros(f[2], np.float32)
    sd[f"{prefix}.res_connect.weight"] = rng.standard_normal((f[2], c_in, 1, 1)).astype(np.float32)
    sd[f"{prefix}.res_connect.bias"] = np.zeros(f[2], np.float32)
    return sd


class TestConditionedMLPConversion:
    def test_structure_matches_flax_init(self):
        c_in, f = 40, (64, 96, 128)
        m = ConditionedMLP(
            f, include_t=True, include_condition=True,
            include_second_condition=True, res_connect=True, bias=True,
        )
        flax_params = m.init(
            jax.random.key(0), jnp.ones((1, 4, 2, c_in)), t_emb=jnp.ones((1, 12)),
            condition_emb=jnp.ones((1, 9)), second_condition_emb=jnp.ones((1, 11)),
        )["params"]
        sd = synth_mlp_sd("blk", c_in, f)
        converted = _convert_mlp_plus_t(_SD(sd), "blk")
        assert tree_spec(converted) == tree_spec(flax_params)

    def test_values_transposed(self):
        sd = synth_mlp_sd("blk", 40, (64, 96, 128))
        converted = _convert_mlp_plus_t(_SD(sd), "blk")
        w = sd["blk.first_mlp.0.weight"][:, :, 0, 0]
        np.testing.assert_allclose(
            converted["SharedMLP_0"]["Dense_0"]["kernel"], w.T
        )


class TestAttentionConversion:
    def test_structure_matches_flax_init(self):
        cq, ck, cout = 40, 41, 64
        m = AttentionPool(cout, attention_bn=True)
        flax_params = m.init(
            jax.random.key(0), jnp.ones((1, 4, cq)), jnp.ones((1, 4, 8, ck)),
            jnp.ones((1, 4, 8, cout)), jnp.full((1, 4), 4),
        )["params"]
        rng = np.random.default_rng(0)
        c1, c2 = max(cq, 32), max(ck, 32)
        inter = min(c1 + c2, cout)
        sd = {}
        sd["att.feat_conv.weight"] = rng.standard_normal((c1, cq, 1, 1)).astype(np.float32)
        sd["att.feat_conv.bias"] = np.zeros(c1, np.float32)
        sd["att.grouped_feat_conv.weight"] = rng.standard_normal((c2, ck, 1, 1)).astype(np.float32)
        sd["att.grouped_feat_conv.bias"] = np.zeros(c2, np.float32)
        g1 = (c1 + c2) - (c1 + c2) % min(32, c1 + c2)
        sd["att.weight_conv.1.group_norm.weight"] = np.ones(g1, np.float32)
        sd["att.weight_conv.1.group_norm.bias"] = np.zeros(g1, np.float32)
        sd["att.weight_conv.2.weight"] = rng.standard_normal((inter, c1 + c2, 1, 1)).astype(np.float32)
        sd["att.weight_conv.2.bias"] = np.zeros(inter, np.float32)
        g2 = inter - inter % min(32, inter)
        sd["att.weight_conv.4.group_norm.weight"] = np.ones(g2, np.float32)
        sd["att.weight_conv.4.group_norm.bias"] = np.zeros(g2, np.float32)
        sd["att.weight_conv.5.weight"] = rng.standard_normal((cout, inter, 1, 1)).astype(np.float32)
        sd["att.weight_conv.5.bias"] = np.zeros(cout, np.float32)
        sd["att.feat_out_conv.0.weight"] = rng.standard_normal((cout, cout, 1, 1)).astype(np.float32)
        sd["att.feat_out_conv.0.bias"] = np.zeros(cout, np.float32)
        g3 = cout - cout % min(32, cout)
        sd["att.feat_out_conv.1.group_norm.weight"] = np.ones(g3, np.float32)
        sd["att.feat_out_conv.1.group_norm.bias"] = np.zeros(g3, np.float32)
        converted = _convert_attention(_SD(sd), "att")
        assert tree_spec(converted) == tree_spec(flax_params)
