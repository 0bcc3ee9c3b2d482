"""Pallas TPU kernel: one whole ShuffleNetV2 stage per grid instance.

The inference conv stack is HBM-bound (measured ~8% MFU at batch 128 @416 —
the MXU roofline for the whole forward is ~1.3 ms vs ~13.5 ms measured), so
the way to beat XLA's per-conv pipeline is to stop round-tripping block
intermediates through HBM. This kernel runs an entire backbone stage — the
stride-2 ShuffleV2 block plus all its stride-1 blocks (reference
backbone/shufflenetv2.py:69-78, repeats (4,8,4) :90) — with every
intermediate resident in VMEM:

  HBM → VMEM: the stage input feature map for ONE image + the stage weights
  VMEM:       per block: pointwise matmuls (MXU, f32 accumulate), depthwise
              3×3 as 9 shifted multiply-accumulates (VPU)
  VMEM → HBM: the stage output feature map only

Grid = (batch,): Pallas double-buffers the per-image input/output DMAs, so
HBM traffic for a whole stage is exactly read-input + write-output. The
per-image feature maps are small (stage2 @416: 104·104·24 in, 52·52·116 out),
so a full image fits VMEM — no spatial halo exchange.

Mosaic-dictated design notes (probed on v5e):
  * lane slices at any offset compile (`x[..., :C/2]`, `x[..., C/2:]`) — the
    stride-1 channel split (reference :70-72) is two slices;
  * lane *interleaves* do NOT compile for bf16 (no stack/reshape/repeat on
    the minor dim), so the channel shuffle (groups=2: out[2j]=x1[j],
    out[2j+1]=y2[j], reference :14-28) rides the MXU instead: 0/1 selector
    matrices E (even lanes) and O (odd lanes) are folded host-side into the
    branch-ending pointwise weights (ReLU commutes with a non-negative
    selector scatter), and the matmul-less identity branch pays one extra
    [C/2, C] scatter matmul — FLOPs the otherwise-idle MXU absorbs;
  * `[H,W,C] → [H·W,C]` collapses do not compile — matmuls are 3-D
    `dot_general` over the last dim;
  * stride-2 subsampling uses minor-preserving sublane-split reshapes
    (`[H,W,C] → [H,W/2,2,C]` + index), not strided slices (unsupported).

The pure-XLA oracle for tests is models.shufflenetv2.shufflenetv2_apply on
the BN-folded parameter tree (tests/test_pallas.py); this module only serves
the inference path — training keeps separate convs so BatchNorm sees the
un-fused activations.

MEASURED (v5e-1, batch 128 @416, bf16, trained weights): stage2 fused
18.0 ms vs 4.4 ms for XLA's separate convs — 4× SLOWER, despite saving
~2 ms of HBM round trips. The kernel is VPU-bound, not DMA-bound: the
depthwise taps run on 128-lane-padded f32 registers at 58–116 useful
channels (≥2× lane waste, 2× f32-vs-bf16 waste), and the stride-2 subsample
reshapes force relayouts; XLA's native conv pipeline vectorizes the sliding
window without any of that. Together with fused_conv.py's head measurement
(6.1k vs 7.7k img/s) and the int8 probe (s8 convs 0.80/0.81 ms vs bf16
0.65/0.70 ms for pw/dw at [128,52,52,128]), the conclusion of ROADMAP #2 is:
**for this small-channel depthwise CNN, XLA's conv pipeline is already at
the HBM roofline and hand fusion loses on VPU lane-padding waste** — the
kernels ship default-OFF as correct, tested infrastructure, and the honest
perf path is XLA (docs/DESIGN.md §7). A fused stem (conv+pool via
space-to-depth matmul taps) was also built and abandoned: its 9-tap pool
over a [208,208,24→128-lane] f32 map costs ~6.6 ms of VPU time against the
2.0 ms XLA stem, and whole-image VMEM residency at 208² spills (192 MB).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# weight preprocessing (host side, once per model load)
# ---------------------------------------------------------------------------

def _pw(unit):
    """Folded pointwise conv unit → (w [Cin,Cout] f32, b [Cout] f32)."""
    return (np.asarray(unit["w"][0, 0], np.float32),
            np.asarray(unit["b"], np.float32))


def _dw(unit):
    """Folded depthwise conv unit → (w [3,3,C] f32, b [C] f32)."""
    return (np.asarray(unit["w"][:, :, 0, :], np.float32),
            np.asarray(unit["b"], np.float32))


def _selectors(c2):
    """E [C2, 2C2]: E[j, 2j]=1;  O [C2, 2C2]: O[j, 2j+1]=1 (shuffle g=2)."""
    e = np.zeros((c2, 2 * c2), np.float32)
    o = np.zeros((c2, 2 * c2), np.float32)
    e[np.arange(c2), 2 * np.arange(c2)] = 1.0
    o[np.arange(c2), 2 * np.arange(c2) + 1] = 1.0
    return e, o


def prepare_stage(stage_params):
    """Preprocess a BN-folded stage parameter list (one stride-2 block then
    n stride-1 blocks, models.shufflenetv2._init_block structure) into the
    flat argument tuple `fused_stage` consumes.

    The channel shuffle of each block is folded into its branch-ending
    pointwise weights via the E/O selector matrices, so the kernel only ever
    adds two [H,W,C] tensors to realize concat+shuffle."""
    s2 = stage_params[0]
    assert "branch1" in s2, "stage must start with the stride-2 block"
    dwb1_w, dwb1_b = _dw(s2["branch1"]["dw"])
    pwb1_w, pwb1_b = _pw(s2["branch1"]["pw"])
    s2_pw1_w, s2_pw1_b = _pw(s2["branch2"]["pw1"])
    s2_dw_w, s2_dw_b = _dw(s2["branch2"]["dw"])
    s2_pw2_w, s2_pw2_b = _pw(s2["branch2"]["pw2"])
    c2 = pwb1_w.shape[1]
    e, o = _selectors(c2)
    # both stride-2 branches end in pw+ReLU → fold the shuffle scatter in
    pwb1_w, pwb1_b = pwb1_w @ e, pwb1_b @ e
    s2_pw2_w, s2_pw2_b = s2_pw2_w @ o, s2_pw2_b @ o

    w1s, b1s, dww, dwb, w2s, b2s = [], [], [], [], [], []
    for blk in stage_params[1:]:
        assert "branch1" not in blk
        w1, b1 = _pw(blk["branch2"]["pw1"])
        w1s.append(w1)
        b1s.append(b1)
        w, b = _dw(blk["branch2"]["dw"])
        dww.append(w)
        dwb.append(b)
        w, b = _pw(blk["branch2"]["pw2"])
        w2s.append(w @ o)           # y2 lands on odd lanes
        b2s.append(b @ o)

    stack = lambda xs: jnp.asarray(np.stack(xs)) if xs \
        else jnp.zeros((0,), jnp.float32)
    j = jnp.asarray
    return (j(dwb1_w), j(dwb1_b), j(pwb1_w), j(pwb1_b),
            j(s2_pw1_w), j(s2_pw1_b), j(s2_dw_w), j(s2_dw_b),
            j(s2_pw2_w), j(s2_pw2_b),
            stack(w1s), stack(b1s), stack(dww), stack(dwb),
            stack(w2s), stack(b2s), j(e))


# ---------------------------------------------------------------------------
# in-kernel building blocks (operate on one image's [H, W, C] arrays)
# ---------------------------------------------------------------------------

def _mm(x, w, b, relu, out_dtype):
    """[H,W,Cin] @ [Cin,Cout] (+ b) — 3-D dot_general, f32 MXU accumulate."""
    y = jax.lax.dot_general(
        x, w.astype(x.dtype),
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    if b is not None:
        y = y + b
    if relu:
        y = jnp.maximum(y, 0)
    return y.astype(out_dtype)


def _dw3x3(x, w, b, stride, out_dtype):
    """Depthwise 3×3, pad 1, stride 1 or 2; f32 accumulate on the VPU."""
    h, wdt, c = x.shape
    xp = jnp.pad(x.astype(jnp.float32), ((1, 1), (1, 1), (0, 0)))
    if stride == 1:
        acc = jnp.broadcast_to(b, (h, wdt, c)).astype(jnp.float32)
        for dy in range(3):
            for dx in range(3):
                acc = acc + xp[dy:dy + h, dx:dx + wdt, :] * w[dy, dx, :]
        return acc.astype(out_dtype)
    h2, w2 = h // 2, wdt // 2
    acc = jnp.broadcast_to(b, (h2, w2, c)).astype(jnp.float32)
    for dy in range(3):
        for dx in range(3):
            sl = xp[dy:dy + h, dx:dx + wdt, :]
            # even-index subsample via minor-preserving reshapes (strided
            # slices and lane gathers don't compile in Mosaic)
            sub = sl.reshape(h2, 2, wdt, c)[:, 0]
            sub = sub.reshape(h2, w2, 2, c)[:, :, 0]
            acc = acc + sub * w[dy, dx, :]
    return acc.astype(out_dtype)


# ---------------------------------------------------------------------------
# the stage kernel
# ---------------------------------------------------------------------------

def _stage_kernel(x_ref,
                  dwb1_w, dwb1_b, pwb1_w, pwb1_b,
                  s2_pw1_w, s2_pw1_b, s2_dw_w, s2_dw_b, s2_pw2_w, s2_pw2_b,
                  w1s, b1s, dww, dwb, w2s, b2s, e_ref,
                  out_ref, *, n_s1):
    x = x_ref[0]                                  # [H, W, Cin]
    dt = x.dtype
    # stride-2 block (reference backbone/shufflenetv2.py:73-74); the shuffle
    # scatter is pre-folded into pwb1/s2_pw2, so concat+shuffle is an add
    b1 = _dw3x3(x, dwb1_w[:], dwb1_b[:], 2, dt)
    b1 = _mm(b1, pwb1_w[:], pwb1_b[:], True, dt)  # → even lanes
    t = _mm(x, s2_pw1_w[:], s2_pw1_b[:], True, dt)
    t = _dw3x3(t, s2_dw_w[:], s2_dw_b[:], 2, dt)
    b2 = _mm(t, s2_pw2_w[:], s2_pw2_b[:], True, dt)  # → odd lanes
    u = b1 + b2
    c2 = e_ref.shape[0]
    # stride-1 blocks (reference :70-72); python loop unrolls at trace time
    for k in range(n_s1):
        x1 = u[..., :c2]
        x2 = u[..., c2:]
        t = _mm(x2, w1s[k], b1s[k], True, dt)
        t = _dw3x3(t, dww[k], dwb[k], 1, dt)
        y2 = _mm(t, w2s[k], b2s[k], True, dt)     # → odd lanes (O folded)
        u = _mm(x1, e_ref[:], None, False, dt) + y2   # identity → even lanes
    out_ref[0] = u


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_stage(x, weights, *, interpret=False):
    """Run a whole ShuffleV2 stage. x: [B,H,W,Cin] → [B,H/2,W/2,Cout].

    `weights` is the tuple from `prepare_stage`. Output channels follow from
    the weight shapes (Cout = 2 · branch width)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, w, cin = x.shape
    assert h % 2 == 0 and w % 2 == 0, "stage input must have even H, W"
    cout = weights[2].shape[-1]                   # pw_b1 ⊗ E out width = C
    n_s1 = int(weights[10].shape[0])
    kern = functools.partial(_stage_kernel, n_s1=n_s1)
    wspecs = [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in weights]
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((b, h // 2, w // 2, cout), x.dtype),
        grid=(b,),
        in_specs=[pl.BlockSpec((1, h, w, cin), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM)] + wspecs,
        out_specs=pl.BlockSpec((1, h // 2, w // 2, cout),
                               lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        # the unrolled block chain keeps several f32 feature maps live; v5e
        # has 128 MB VMEM — the default 16 MB scoped limit is far too shy
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=112 * 1024 * 1024),
        interpret=interpret,
    )(x, *weights)


def prepare_backbone(folded_backbone):
    """prepare_stage for all three stages of a BN-folded backbone tree."""
    return {name: prepare_stage(folded_backbone[name])
            for name in ("stage2", "stage3", "stage4")}
