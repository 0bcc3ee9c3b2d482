"""The jitted training step — target assignment, fwd+bwd, SGD, EMA, NaN guard,
all in one XLA program.

Contrast with the reference hot loop (train.py:187-235) which per iteration
does: a host numpy target-assignment loop, host→device transfer of targets,
separate forward, backward, optimizer mutation, EMA module walk, and a device
sync for the NaN check. Here everything after the input batch lands in HBM is
one compiled graph; the NaN-skip (reference train.py:225-226) is a lax.select
on the update, not a host sync.

Data parallelism: pass shardings from parallel.mesh — inputs sharded on batch,
state replicated. GSPMD then inserts the gradient psum and makes the BatchNorm
batch statistics global (sync-BN) automatically; losses are already sum/global
batch exactly like the reference's single-device sum/batch.
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
import optax

from yolo_nano_tpu.config import YoloNanoConfig
from yolo_nano_tpu.losses.targets import build_targets
from yolo_nano_tpu.models.yolo_nano import loss_forward
from yolo_nano_tpu.train.state import TrainState, ema_decay, ema_update


def make_train_step(cfg: YoloNanoConfig, tx: optax.GradientTransformation,
                    input_size: int, mesh=None, donate: bool = True,
                    augment=None):
    """Builds train_step(state, images, gt_boxes, gt_labels) → (state, metrics).

    images: [B, S, S, 3] float32/bf16 NHWC, already normalized.
    gt_boxes: [B, M, 4] normalized corners; gt_labels: [B, M] int32 (-1 pad).
    One compiled graph per (input_size, batch) bucket — multi-scale training
    re-calls this factory per bucket (reference re-caches grids via set_grid,
    train.py:202-205).

    augment: optional in-graph augmentation fn from
    data.device_aug.make_augment_fn(input_size) — the signature then becomes
    train_step(state, images_u8, gt_boxes, gt_labels, regions, aug_key) with
    uint8 base canvases in; the whole SSD chain fuses into this XLA program
    (photometric/crop/mirror/normalize AND the multi-scale resize, since the
    augment emits input_size directly).
    """

    def body(state: TrainState, images, gt_boxes, gt_labels):
        if images.shape[1] != input_size:
            # multi-scale training: batch arrives at the loader's base size and
            # is resized on device (the reference interpolates the torch batch
            # per iteration, train.py:208); boxes are normalized → unchanged
            images = jax.image.resize(
                images, (images.shape[0], input_size, input_size,
                         images.shape[3]), "bilinear")
        targets = build_targets(gt_boxes, gt_labels, cfg, input_size)

        def loss_fn(params):
            (conf_l, cls_l, bbox_l, iou_l), new_stats = loss_forward(
                params, state.stats, images, targets, cfg, input_size,
                train=True)
            total = conf_l + cls_l + bbox_l + iou_l
            return total, ((conf_l, cls_l, bbox_l, iou_l), new_stats)

        (total, (losses, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)

        updates, new_opt_state = tx.update(grads, state.opt_state,
                                           state.params)
        new_params = optax.apply_updates(state.params, updates)

        # NaN guard: skip the whole update on non-finite loss
        ok = jnp.isfinite(total)
        sel = functools.partial(jax.tree.map,
                                lambda a, b: jnp.where(ok, a, b))
        new_params = sel(new_params, state.params)
        new_opt_state = sel(new_opt_state, state.opt_state)
        new_stats = sel(new_stats, state.stats)
        new_step = state.step + ok.astype(jnp.int32)

        if state.ema_params is not None:
            d = ema_decay(new_step)
            new_ema_p = ema_update(state.ema_params, new_params, d)
            new_ema_s = ema_update(state.ema_stats, new_stats, d)
            new_ema_p = sel(new_ema_p, state.ema_params)
            new_ema_s = sel(new_ema_s, state.ema_stats)
        else:
            new_ema_p, new_ema_s = None, None

        metrics = {
            "loss/total": total,
            "loss/obj": losses[0],
            "loss/cls": losses[1],
            "loss/bbox": losses[2],
            "loss/iou": losses[3],
            "skipped_nonfinite": 1 - ok.astype(jnp.int32),
        }
        new_state = TrainState(new_params, new_stats, new_opt_state,
                               new_step, new_ema_p, new_ema_s)
        return new_state, metrics

    if augment is None:
        train_step = body
        n_data_args = 3
    else:
        def train_step(state: TrainState, images_u8, gt_boxes, gt_labels,
                       regions, aug_key):
            if aug_key.dtype == jnp.uint32:
                # multi-controller callers pass raw key DATA (uint32[2]):
                # extended-dtype key arrays can't go through
                # make_array_from_callback, so the key crosses the host
                # boundary as data and is wrapped in-graph
                aug_key = jax.random.wrap_key_data(aug_key)
            images, gt_boxes, gt_labels = augment(
                images_u8, gt_boxes, gt_labels, regions, aug_key)
            return body(state, images, gt_boxes, gt_labels)
        n_data_args = 4  # + the replicated aug_key

    kwargs = {}
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        repl = NamedSharding(mesh, P())  # state: fully replicated
        # batch: sharded over ALL mesh axes — ("data",) on one slice,
        # ("dcn","data") across slices
        data = NamedSharding(mesh, P(mesh.axis_names))
        in_sh = (repl,) + (data,) * n_data_args
        if augment is not None:
            in_sh = in_sh + (repl,)  # aug_key
        kwargs = dict(in_shardings=in_sh, out_shardings=(repl, repl))
    return jax.jit(train_step,
                   donate_argnums=(0,) if donate else (), **kwargs)
