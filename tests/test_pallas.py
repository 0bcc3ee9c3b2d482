"""Pallas fused-kernel correctness vs the XLA oracle (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolo_nano_tpu.ops.pallas.fused_conv import (
    fused_dw_pw,
    fused_dw_pw_reference,
)


@pytest.mark.parametrize("act_mid,act_out", [("leaky", "leaky"),
                                             (None, "relu")])
def test_fused_dw_pw_matches_oracle(act_mid, act_out):
    rng = np.random.default_rng(0)
    b, h, w, c, cout = 2, 8, 8, 96, 96
    x = jnp.asarray(rng.normal(0, 1, (b, h, w, c)), jnp.float32)
    dw_w = jnp.asarray(rng.normal(0, 0.2, (3, 3, c)), jnp.float32)
    dw_b = jnp.asarray(rng.normal(0, 0.1, (c,)), jnp.float32)
    pw_w = jnp.asarray(rng.normal(0, 0.1, (c, cout)), jnp.float32)
    pw_b = jnp.asarray(rng.normal(0, 0.1, (cout,)), jnp.float32)

    got = fused_dw_pw(x, dw_w, dw_b, pw_w, pw_b, act_mid=act_mid,
                      act_out=act_out, interpret=True)
    want = fused_dw_pw_reference(x, dw_w, dw_b, pw_w, pw_b, act_mid=act_mid,
                                 act_out=act_out)
    # kernel matmul runs bf16 on the MXU — tolerance sized for bf16 mantissa
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-2, atol=2e-2)


def test_fused_dw_pw_bfloat16_io():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(0, 1, (1, 6, 6, 32)), jnp.bfloat16)
    dw_w = jnp.asarray(rng.normal(0, 0.2, (3, 3, 32)), jnp.float32)
    dw_b = jnp.zeros((32,), jnp.float32)
    pw_w = jnp.asarray(rng.normal(0, 0.1, (32, 64)), jnp.float32)
    pw_b = jnp.zeros((64,), jnp.float32)
    out = fused_dw_pw(x, dw_w, dw_b, pw_w, pw_b, interpret=True)
    assert out.shape == (1, 6, 6, 64)
    assert out.dtype == jnp.bfloat16
    want = fused_dw_pw_reference(x.astype(jnp.float32), dw_w, dw_b, pw_w,
                                 pw_b)
    np.testing.assert_allclose(np.asarray(out, np.float32), np.asarray(want),
                               rtol=6e-2, atol=6e-2)


def test_fused_stage_matches_backbone_oracle():
    """Whole-stage kernel (stride-2 + stride-1 ShuffleV2 blocks, shuffle
    folded into selector matmuls) vs the XLA folded backbone path."""
    from yolo_nano_tpu.models.shufflenetv2 import (_block_apply,
                                                   init_shufflenetv2)
    from yolo_nano_tpu.ops.pallas.fused_stage import (fused_stage,
                                                      prepare_stage)
    from yolo_nano_tpu.utils.fuse_bn import empty_stats_like, fold_bn

    params, stats = init_shufflenetv2(jax.random.key(0), "1.0x")
    folded = fold_bn(params, stats)
    fstats = empty_stats_like(folded)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 16, 16, 24)).astype(np.float32))
    for name in ("stage2", "stage3"):
        want = x
        for bp, bs in zip(folded[name], fstats[name]):
            want, _ = _block_apply(want, bp, bs, False)
        got = fused_stage(x, prepare_stage(folded[name]), interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-5)
        x = want  # chain into the next stage

