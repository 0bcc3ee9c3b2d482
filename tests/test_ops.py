"""Unit tests for core NHWC ops, with torch (CPU) as the semantics oracle
where the reference's behavior is torch-defined (shuffle, pooling, padding,
nearest interpolation)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from yolo_nano_tpu.ops.nn import (
    channel_shuffle,
    conv2d,
    downsample2x_nearest,
    max_pool_3x3_s2,
    upsample2x_nearest,
)


def _nchw(x_nhwc):
    return torch.from_numpy(np.asarray(x_nhwc).transpose(0, 3, 1, 2))


def _nhwc(x_t):
    return x_t.numpy().transpose(0, 2, 3, 1)


def test_channel_shuffle_matches_torch():
    x = np.random.rand(2, 4, 4, 8).astype(np.float32)
    got = np.asarray(channel_shuffle(jnp.asarray(x), 2))
    xt = _nchw(x)
    b, c, h, w = xt.shape
    want = xt.view(b, 2, c // 2, h, w).transpose(1, 2).reshape(b, c, h, w)
    np.testing.assert_allclose(got, _nhwc(want), rtol=1e-6)


def test_channel_shuffle_is_permutation_and_involution_for_groups2():
    x = jnp.arange(16, dtype=jnp.float32).reshape(1, 1, 1, 16)
    y = channel_shuffle(x, 2)
    assert sorted(np.asarray(y).ravel().tolist()) == list(range(16))
    # shuffle(2) twice with 8 groups inverts shuffle with 2 groups on 16ch
    z = channel_shuffle(y, 8)
    np.testing.assert_array_equal(np.asarray(z), np.asarray(x))


def test_maxpool_3x3_s2_matches_torch():
    for hw in (8, 13, 20):
        x = np.random.rand(2, hw, hw, 3).astype(np.float32)
        got = np.asarray(max_pool_3x3_s2(jnp.asarray(x)))
        want = F.max_pool2d(_nchw(x), 3, stride=2, padding=1)
        np.testing.assert_allclose(got, _nhwc(want), rtol=1e-6)


@pytest.mark.parametrize("stride,k,groups", [(1, 3, 1), (2, 3, 1), (1, 1, 1),
                                             (2, 3, 6), (1, 3, 6)])
def test_conv2d_matches_torch_padding_semantics(stride, k, groups):
    cin, cout = 6, 12
    x = np.random.rand(2, 16, 16, cin).astype(np.float32)
    w = np.random.rand(k, k, cin // groups, cout).astype(np.float32) * 0.1
    got = np.asarray(conv2d(jnp.asarray(x), jnp.asarray(w), stride=stride,
                            groups=groups))
    # torch weight OIHW: (cout, cin/groups, k, k)
    wt = torch.from_numpy(w.transpose(3, 2, 0, 1))
    want = F.conv2d(_nchw(x), wt, stride=stride, padding=(k - 1) // 2,
                    groups=groups)
    # XLA's default conv precision uses a fast reduced-precision path (bf16 on
    # the TPU MXU, likewise on CPU) — tolerance reflects that, the *shape* and
    # padding semantics are what this test pins down.
    np.testing.assert_allclose(got, _nhwc(want), rtol=8e-3, atol=8e-3)


def test_nearest_resize_matches_torch():
    x = np.random.rand(1, 6, 6, 4).astype(np.float32)
    up = np.asarray(upsample2x_nearest(jnp.asarray(x)))
    want_up = F.interpolate(_nchw(x), scale_factor=2.0)
    np.testing.assert_allclose(up, _nhwc(want_up), rtol=1e-6)
    dn = np.asarray(downsample2x_nearest(jnp.asarray(x)))
    want_dn = F.interpolate(_nchw(x), scale_factor=0.5)
    np.testing.assert_allclose(dn, _nhwc(want_dn), rtol=1e-6)


def test_batchnorm_train_stable_for_large_mean_channels():
    """Regression: one-pass E[x²]−E[x]² variance cancels catastrophically for
    channels with |mean|/σ ≳ 2^12 and produced NaN activations."""
    from yolo_nano_tpu.ops.nn import _batch_norm

    rng = np.random.default_rng(0)
    x = (3000.0 + 0.05 * rng.normal(size=(8, 4, 4, 2))).astype(np.float32)
    p = {"scale": jnp.ones(2), "bias": jnp.zeros(2)}
    s = {"mean": jnp.zeros(2), "var": jnp.ones(2)}
    y, new_s = _batch_norm(jnp.asarray(x), p, s, train=True)
    assert np.isfinite(np.asarray(y)).all()
    assert (np.asarray(new_s["var"]) >= 0).all()


def test_decode_gradient_finite_for_saturated_logits():
    """Regression: hand-rolled sigmoid gave NaN gradients for logits < -88,
    poisoning training through the IoU loss even at zero loss weight."""
    from yolo_nano_tpu.config import YoloNanoConfig
    from yolo_nano_tpu.ops.decode import decode_boxes, make_grids

    cfg = YoloNanoConfig()
    grids = make_grids(cfg, 64)
    t = jnp.zeros((1, cfg.num_cells(64), 3, 4)).at[0, 0, 0, 0].set(-120.0)

    def f(t):
        return jnp.sum(decode_boxes(t, grids))

    g = jax.grad(f)(t)
    assert np.isfinite(np.asarray(g)).all()


def test_batchnorm_train_matches_torch():
    from yolo_nano_tpu.ops.nn import _batch_norm

    x = np.random.randn(4, 5, 5, 3).astype(np.float32)
    p = {"scale": jnp.asarray([1.0, 2.0, 0.5]),
         "bias": jnp.asarray([0.0, 0.1, -0.1])}
    s = {"mean": jnp.zeros(3), "var": jnp.ones(3)}
    y, new_s = _batch_norm(jnp.asarray(x), p, s, train=True)

    bn = torch.nn.BatchNorm2d(3)
    with torch.no_grad():
        bn.weight.copy_(torch.tensor([1.0, 2.0, 0.5]))
        bn.bias.copy_(torch.tensor([0.0, 0.1, -0.1]))
    bn.train()
    want = bn(_nchw(x))
    np.testing.assert_allclose(np.asarray(y), _nhwc(want.detach()),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(new_s["mean"]),
                               bn.running_mean.numpy(), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(new_s["var"]),
                               bn.running_var.numpy(), rtol=1e-4, atol=1e-6)
