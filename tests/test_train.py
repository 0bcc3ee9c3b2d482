"""Training-step tests: loss decreases on a tiny synthetic batch; the same
step compiles and runs sharded over the virtual 8-device CPU mesh; NaN guard;
schedule shape; EMA math."""

import jax
import jax.numpy as jnp
import numpy as np

from yolo_nano_tpu.config import YoloNanoConfig
from yolo_nano_tpu.models.yolo_nano import init_yolo_nano
from yolo_nano_tpu.parallel.mesh import make_mesh, shard_batch
from yolo_nano_tpu.train.schedule import warmup_step_schedule
from yolo_nano_tpu.train.state import create_train_state, make_optimizer
from yolo_nano_tpu.train.train_step import make_train_step

SIZE = 64


def _tiny_batch(b=2):
    rng = np.random.default_rng(0)
    images = rng.uniform(-1, 1, (b, SIZE, SIZE, 3)).astype(np.float32)
    boxes = np.tile(np.asarray([[0.2, 0.3, 0.6, 0.7], [0.5, 0.1, 0.9, 0.4]],
                               np.float32), (b, 1, 1))
    labels = np.tile(np.asarray([2, 7], np.int32), (b, 1))
    return jnp.asarray(images), jnp.asarray(boxes), jnp.asarray(labels)


def test_overfit_tiny_batch_reduces_loss():
    cfg = YoloNanoConfig(num_classes=20)
    params, stats = init_yolo_nano(jax.random.key(0), cfg)
    tx = make_optimizer(lambda step: 1e-3)
    state = create_train_state(params, stats, tx, use_ema=True)
    step_fn = make_train_step(cfg, tx, SIZE, donate=False)
    images, boxes, labels = _tiny_batch()
    first = None
    for i in range(15):
        state, metrics = step_fn(state, images, boxes, labels)
        if first is None:
            first = float(metrics["loss/total"])
    last = float(metrics["loss/total"])
    assert np.isfinite(last)
    assert last < first * 0.8, (first, last)
    assert int(state.step) == 15


def test_train_step_on_8_device_mesh():
    assert jax.device_count() >= 8, "conftest must force 8 CPU devices"
    cfg = YoloNanoConfig(num_classes=20)
    params, stats = init_yolo_nano(jax.random.key(0), cfg)
    tx = make_optimizer(warmup_step_schedule(1e-3, epoch_size=10))
    state = create_train_state(params, stats, tx, use_ema=False)
    mesh = make_mesh(8)
    step_fn = make_train_step(cfg, tx, SIZE, mesh=mesh, donate=False)
    images, boxes, labels = _tiny_batch(b=8)
    images, boxes, labels = shard_batch(mesh, images, boxes, labels)
    state, metrics = step_fn(state, images, boxes, labels)
    assert np.isfinite(float(metrics["loss/total"]))
    # replicated output state: one shard spec, value identical across devices
    leaf = jax.tree_util.tree_leaves(state.params)[0]
    assert leaf.sharding.is_fully_replicated


def test_nan_guard_skips_update():
    cfg = YoloNanoConfig(num_classes=20)
    params, stats = init_yolo_nano(jax.random.key(0), cfg)
    tx = make_optimizer(lambda step: 1e-3)
    state = create_train_state(params, stats, tx)
    step_fn = make_train_step(cfg, tx, SIZE, donate=False)
    images, boxes, labels = _tiny_batch()
    bad = images.at[0, 0, 0, 0].set(jnp.nan)
    new_state, metrics = step_fn(state, bad, boxes, labels)
    assert int(metrics["skipped_nonfinite"]) == 1
    assert int(new_state.step) == 0
    p0 = jax.tree_util.tree_leaves(state.params)[0]
    p1 = jax.tree_util.tree_leaves(new_state.params)[0]
    np.testing.assert_array_equal(np.asarray(p0), np.asarray(p1))


def test_schedule_matches_reference_semantics():
    # epoch_size 100, wp 2 epochs → nw=200; decays at epochs 90, 120
    sched = warmup_step_schedule(1e-3, epoch_size=100, wp_epochs=2,
                                 lr_epochs=(90, 120))
    assert float(sched(0)) == 0.0
    np.testing.assert_allclose(float(sched(100)), 1e-3 * 0.5 ** 4, rtol=1e-6)
    np.testing.assert_allclose(float(sched(200)), 1e-3, rtol=1e-6)
    np.testing.assert_allclose(float(sched(8999)), 1e-3, rtol=1e-6)
    np.testing.assert_allclose(float(sched(9000)), 1e-4, rtol=1e-6)
    np.testing.assert_allclose(float(sched(12000)), 1e-5, rtol=1e-6)


def test_optimizer_matches_torch_sgd():
    """Coupled L2 + momentum must follow torch's SGD update rule."""
    import torch

    w0 = np.asarray([1.0, -2.0], np.float32)
    g = np.asarray([0.5, 0.25], np.float32)

    tw = torch.tensor(w0, requires_grad=True)
    opt = torch.optim.SGD([tw], lr=0.1, momentum=0.9, weight_decay=5e-4)
    for _ in range(3):
        opt.zero_grad()
        tw.grad = torch.tensor(g)
        opt.step()

    from yolo_nano_tpu.train.state import make_optimizer as mk
    import optax

    tx = mk(lambda step: 0.1)
    params = {"w": jnp.asarray(w0)}
    opt_state = tx.init(params)
    for _ in range(3):
        updates, opt_state = tx.update({"w": jnp.asarray(g)}, opt_state,
                                       params)
        params = optax.apply_updates(params, updates)
    np.testing.assert_allclose(np.asarray(params["w"]), tw.detach().numpy(),
                               rtol=1e-6)
