"""Attribute per-step device time to model modules (FT/SA/FP/attention/...)
by bucketing trace long-names (jaxpr scope paths).

Usage: python tools/profile_modules.py [B] [STEPS]
"""

from __future__ import annotations

import functools
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from point_diffusion_refinement_tpu import diffusion
from point_diffusion_refinement_tpu.config import DEFAULT_POINTNET_CONFIG
from point_diffusion_refinement_tpu.models import PointNet2CloudCondition
from point_diffusion_refinement_tpu.utils.profiling import summarize_trace, trace


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    STEPS = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    cfg = dict(DEFAULT_POINTNET_CONFIG)
    cfg["compute_dtype"] = "bfloat16"
    model = PointNet2CloudCondition.from_config(cfg)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1, 1, (B, 2048, 3)).astype(np.float32))
    from point_diffusion_refinement_tpu.data.mirror import mirror_and_concat
    from point_diffusion_refinement_tpu.data.synthetic import make_synthetic_clouds

    _, partials, _ = make_synthetic_clouds(max(1, (B + 25) // 26), 2048, 2048, seed=0)
    cond = np.array(mirror_and_concat(jnp.asarray(partials[:B]), 3072))
    cond[:, :, :3] *= 2.0
    cond = jnp.asarray(cond)
    label = jnp.zeros((B,), jnp.int32)
    ts = jnp.zeros((B,), jnp.float32)
    params = jax.jit(model.init)(jax.random.key(0), x, cond, ts, label)
    schedule = diffusion.calc_diffusion_hyperparams(1000, 1e-4, 0.02)

    @jax.jit
    def encode(params, cond):
        return model.apply(
            params, cond, windowed_ft=True, method=model.encode_condition
        )

    cond_feats = encode(params, cond)
    jax.block_until_ready(cond_feats)

    @functools.partial(jax.jit, static_argnums=(5,))
    def run(params, cond_feats, label, x, rng, n):
        def body(carry, t):
            x, rng = carry
            rng, k = jax.random.split(rng)
            tsb = jnp.full((B,), t, dtype=jnp.float32)
            eps = model.apply(params, x, tsb, label, cond_feats, method=model.denoise)
            alpha_t = schedule.alpha[t]
            abar_t = schedule.alpha_bar[t]
            x = (x - (1.0 - alpha_t) / jnp.sqrt(1.0 - abar_t) * eps) / jnp.sqrt(alpha_t)
            z = jax.random.normal(k, x.shape, dtype=x.dtype)
            x = x + jnp.where(t > 0, schedule.sigma[t], 0.0) * z
            return (x, rng), None

        (x, _), _ = jax.lax.scan(body, (x, rng), jnp.arange(n, 0, -1))
        return x

    out = run(params, cond_feats, label, x, jax.random.key(1), STEPS)
    jax.block_until_ready(out)

    # map HLO instruction names -> jax scope path from compiled metadata
    hlo = (
        run.lower(params, cond_feats, label, x, jax.random.key(3), STEPS)
        .compile()
        .as_text()
    )
    op_scope: dict[str, str] = {}
    meta_pat = re.compile(
        r"%?([\w.\-]+)\s*=[^\n]*metadata=\{[^}]*op_name=\"([^\"]*)\""
    )
    for mm in meta_pat.finditer(hlo):
        op_scope[mm.group(1)] = mm.group(2)

    log_dir = "/tmp/pdr_mod_trace"
    os.system(f"rm -rf {log_dir}")
    with trace(log_dir):
        out = run(params, cond_feats, label, x, jax.random.key(3), STEPS)
        jax.block_until_ready(out)

    rows = summarize_trace(log_dir, top=100000, long_names=False)
    # bucket by the deepest recognizable module scope in the op_name path
    pat = re.compile(
        r"(encoder_feature_map_\d+|decoder_feature_map_\d+|final_feature_map|"
        r"SA_modules(?:_condition)?_\d+|FP_modules(?:_condition)?_\d+|"
        r"SetAbstraction_\d+|KnnFeaturePropagation_\d+|FeaturePropagation_\d+|"
        r"FeatureTransfer_\d+|AttentionPool_\d+|Pnet2Stage_\d+|"
        r"ConditionedMLP_\d+|PartialGroupNorm_\d+|fc_layer|output)"
    )
    total = 0.0
    buckets: dict[str, float] = {}
    samples: dict[str, str] = {}
    other_rows: list = []
    detail = os.environ.get("PDR_PROFILE_DETAIL")  # regex over bucket names
    detail_rows: list = []
    skip = re.compile(r"^(while|jit_run|PjitFunction|jit_encode)")
    for name, us, cnt in rows:
        base = name.split(" :: ")[0]
        if skip.match(base):
            continue
        scope = op_scope.get(base, "")
        if "pallas" in base or "_windowed_call" in base or "attention_pool" in base or "_kernel" in base:
            key_name = base.split(".")[0]
        else:
            m = pat.findall(scope)
            key_name = "/".join(m[-2:]) if m else "(other)"
        total += us
        buckets[key_name] = buckets.get(key_name, 0.0) + us
        if key_name == "(other)":
            other_rows.append((us, base, scope[:170]))
        if detail and re.search(detail, key_name):
            detail_rows.append((us, base, scope[:200]))
        if key_name not in samples or "(other)" == key_name:
            samples.setdefault(key_name, f"{base} :: {scope[:160]}")
    print(f"total captured {total/1000:.1f} ms over {STEPS} steps")
    for k, v in sorted(buckets.items(), key=lambda kv: -kv[1])[:48]:
        print(f"  {v/1000:9.2f} ms  {v/STEPS:8.1f} us/step  {k}")
    print("\ntop '(other)' ops:")
    for us, base, scope in sorted(other_rows, reverse=True)[:25]:
        print(f"  {us/1e3:8.2f} ms  {base} :: {scope}")
    if detail:
        print(f"\ntop ops in buckets matching {detail!r}:")
        for us, base, scope in sorted(detail_rows, reverse=True)[:40]:
            print(f"  {us/1e3:8.2f} ms  {base} :: {scope}")


if __name__ == "__main__":
    main()
