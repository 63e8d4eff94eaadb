"""Lane-packed stride-1 3D convolution (overlapped-window channel packing).

Why this exists: every conv in the VAE-GAM architecture has 1-16 channels
(reference vae_reg_GP.py:187-218), so the natural matmul embedding puts
N = out_channels = 1..16 against the MXU's 128 lanes (<=12% utilization) and
K = in_channels*k^3 = 27..432 against its 128-deep contraction.  The r1/r2
polyphase experiments (ops/convt.py) packed only the OUTPUT side (8 parity
classes -> 8x channels) and measured slower than XLA's dilated lowering;
this module packs BOTH sides for the stride-1 layers:

  * S_h x S_w consecutive output positions fold into the matmul N dimension
    (N' = S_h*S_w*oc, sized to ~128 lanes), and
  * the overlapped input windows those outputs share fold into the channel /
    contraction dimension (K' = kd * (S_h+kh-1)*(S_w+kw-1)*ic).

Cost model: FLOPs inflate by ((S_h+kh-1)/kh)*((S_w+kw-1)/kw) (the window
overlap made dense), but lane utilization rises by S_h*S_w, so the
utilization x density product IMPROVES by k/(1+ (k-1)/S) per packed axis —
for k=3, S=4 per axis that is 16x more lanes for 4x more flops.  This is the
property the dilated/polyphase embeddings lack (their product is invariant:
they pack lanes exactly as fast as they densify zeros).

Memory: the packed input is only (S+k-1)/S (~1.1-1.5x) of the raw input, vs
k^2=9x for full im2col — the D axis and the tap structure inside each packed
window remain genuine convolution, so XLA still streams them.

MEASURED RESULT (r3, real v5e, full train step via VAEGAMConfig.conv_pack):
the cost model is FALSIFIED in practice — the full fp32 parity step drops to
0.31-0.39x and the bf16 recipe step to 0.40-0.48x of XLA's native lowering
across packs (2,2)..(8,8) (docs/PERFORMANCE.md).  The reshape/concat
plumbing and the packed weight scatter in the bwd pass cost more than the
lane-utilization win returns; XLA's dilated lowering remains the fast path,
extending the r1/r2 polyphase conclusion to both-side packing.  Kept (with
tests and tools/bench_packed_conv.py) as the measured negative result;
conv_pack defaults to None everywhere.

The transform is pure reshape/slice/concat (fwd AND bwd — no gather/scatter),
one small constant-folded weight scatter, one output transpose.

Equivalence with lax.conv_general_dilated is element-exact in fp32 up to
matmul reassociation (same MXU accumulation class); verified in
tests/test_ops.py over odd shapes, paddings and pack factors.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

_DN = ("NDHWC", "DHWIO", "NDHWC")


def _ceil_div(a: int, b: int) -> int:
    return -(-a // b)


def _pack_blocks(x: jnp.ndarray, axis: int, s: int, k: int) -> jnp.ndarray:
    """Split `axis` into (nb, s+k-1) overlapped blocks: out[b, j] = x[b*s+j].

    x must already be zero-padded so that length >= nb*s + k - 1 where
    nb = ceil((L-k+1)/s) for the TRUE (conv-padded) length L; this function
    pads any remaining tail itself.  Pure slice/reshape/concat (cheap vjp).
    """
    length = x.shape[axis]
    nb = _ceil_div(length - k + 1, s)
    need = nb * s + s  # reshape trick below reads up to nb*s + s
    if need > length:
        pad = [(0, 0)] * x.ndim
        pad[axis] = (0, need - length)
        x = jnp.pad(x, pad)
    main = jax.lax.slice_in_dim(x, 0, nb * s, axis=axis)
    new_shape = x.shape[:axis] + (nb, s) + x.shape[axis + 1:]
    main = main.reshape(new_shape)
    if k > 1:
        # the k-1 tap positions that spill into the next block
        nxt = jax.lax.slice_in_dim(x, s, s + nb * s, axis=axis)
        nxt = nxt.reshape(new_shape)
        nxt = jax.lax.slice_in_dim(nxt, 0, k - 1, axis=axis + 1)
        main = jnp.concatenate([main, nxt], axis=axis + 1)
    return main  # (..., nb, s+k-1, ...)


def pack_weights(w: jnp.ndarray, s_h: int, s_w: int) -> jnp.ndarray:
    """(kd,kh,kw,ic,oc) -> (kd,1,1, (s_h+kh-1)*(s_w+kw-1)*ic, s_h*s_w*oc).

    w_packed[d, (jh,jw,ci), (sh,sw,o)] = w[d, jh-sh, jw-sw, ci, o] on the
    band, 0 elsewhere.  Static python loop over (sh, sw) — unrolled pads of
    a small constant-sized tensor, folded at trace time for fixed weights
    and a cheap linear vjp when differentiating w.
    """
    kd, kh, kw, ic, oc = w.shape
    wh, ww = s_h + kh - 1, s_w + kw - 1
    out = jnp.zeros((kd, wh, ww, ic, s_h, s_w, oc), w.dtype)
    for sh in range(s_h):
        for sw in range(s_w):
            out = out.at[:, sh:sh + kh, sw:sw + kw, :, sh, sw, :].set(w)
    return out.reshape(kd, 1, 1, wh * ww * ic, s_h * s_w * oc)


def packed_conv3d(
    x: jnp.ndarray,            # (B, D, H, W, ic)
    w: jnp.ndarray,            # (kd, kh, kw, ic, oc)
    padding: Sequence[Tuple[int, int]] = ((0, 0), (0, 0), (0, 0)),
    pack: Tuple[int, int] = (4, 4),
    w_packed: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Stride-1 3D conv == lax.conv_general_dilated(..., strides 1), with the
    H/W axes lane-packed by factors pack=(s_h, s_w).

    `padding` is the conv padding (lo, hi) per spatial dim.  Pass a
    precomputed `w_packed` (from pack_weights) to reuse across calls.
    """
    s_h, s_w = pack
    kd, kh, kw, ic, oc = w.shape
    assert kh - 1 <= s_h and kw - 1 <= s_w, (
        "pack factor must be >= kernel-1 per axis (block spill construction)"
    )
    lo_d, lo_h, lo_w = padding
    # conv padding on D stays conv padding; H/W padding must be materialized
    # before block packing
    x = jnp.pad(x, ((0, 0), (0, 0), lo_h, lo_w, (0, 0)))
    d_out = x.shape[1] + lo_d[0] + lo_d[1] - kd + 1
    h_out = x.shape[2] - kh + 1
    w_out = x.shape[3] - kw + 1
    nb_h = _ceil_div(h_out, s_h)
    nb_w = _ceil_div(w_out, s_w)

    xb = _pack_blocks(x, 2, s_h, kh)          # (B, D, nbh, wh, W', ic)
    xb = _pack_blocks(xb, 4, s_w, kw)         # (B, D, nbh, wh, nbw, ww, ic)
    xb = jnp.transpose(xb, (0, 1, 2, 4, 3, 5, 6))
    xb = xb.reshape(xb.shape[:4] + (-1,))     # (B, D, nbh, nbw, wh*ww*ic)

    if w_packed is None:
        w_packed = pack_weights(w, s_h, s_w)
    y = jax.lax.conv_general_dilated(
        xb, w_packed, window_strides=(1, 1, 1),
        padding=(lo_d, (0, 0), (0, 0)), dimension_numbers=_DN,
    )                                          # (B, Do, nbh, nbw, sh*sw*oc)
    b = y.shape[0]
    y = y.reshape(b, d_out, nb_h, nb_w, s_h, s_w, oc)
    y = jnp.transpose(y, (0, 1, 2, 4, 3, 5, 6))
    y = y.reshape(b, d_out, nb_h * s_h, nb_w * s_w, oc)
    return y[:, :, :h_out, :w_out, :]


def flop_inflation(kh: int, kw: int, pack: Tuple[int, int]) -> float:
    """Dense-FLOP multiplier of the packed embedding vs the sparse conv."""
    s_h, s_w = pack
    return ((s_h + kh - 1) / kh) * ((s_w + kw - 1) / kw)
