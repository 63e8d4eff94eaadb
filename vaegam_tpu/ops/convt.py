"""Subpixel (polyphase) stride-2 transposed 3D convolution.

The naive transposed conv lowers to a conv over a 2x-dilated input — on TPU
that multiplies 7/8 zeros (2^3 dilation), wasting MXU cycles.  The polyphase
decomposition computes each output parity class (cd, ch, cw) in {0,1}^3 as a
DENSE stride-1 VALID conv of the raw input with the decimated kernel
K[r_d::2, r_h::2, r_w::2], then interleaves the 8 class outputs.  Same math
(verified elementwise against the dilated formulation in tests/test_ops.py),
~8x fewer MACs.

Derivation (per axis, stride 2, dilated-conv padding lo/hi where
lo = k-1-p, hi = k-1-p+op):
  output O[t] = sum_u K[u] * Xdil_padded[t+u]   (correlation)
  Xdil_padded[t+u] nonzero iff (t+u-lo) = 2n  =>  u parity fixed per t parity
  with r_c = (lo - c) mod 2, n0_c = (c + r_c - lo)/2:
    O[c + 2m] = sum_j K[r_c + 2j] * X[n0_c + m + j]
  i.e. class c is a stride-1 correlation with K[r_c::2], shifted by n0_c —
  expressed below via (possibly negative) conv padding.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

_DN = ("NDHWC", "DHWIO", "NDHWC")


def _axis_class(i: int, k: int, lo: int, hi: int, c: int
                ) -> Tuple[int, int, int, int]:
    """Per-axis polyphase parameters for output parity class c.

    Returns (r, pad_lo, pad_hi, out_len) for the stride-1 sub-conv.
    """
    l_out = 2 * i + lo + hi - k
    r = (lo - c) % 2
    n0 = (c + r - lo) // 2
    k_c = (k - r + 1) // 2
    out_c = (l_out - 1 - c) // 2 + 1 if l_out > c else 0
    # sub-conv input index range: n0 .. n0 + out_c - 1 + k_c - 1
    pad_lo = -n0
    pad_hi = (n0 + out_c + k_c - 2) - (i - 1)
    return r, pad_lo, pad_hi, out_c


def conv_transpose_2x_fused(
    x: jnp.ndarray,           # (B, D, H, W, I)
    w: jnp.ndarray,           # (kD, kH, kW, I, O)
    pad: Sequence[int],
    outpad: Sequence[int],
) -> jnp.ndarray:
    """Stride-2 transposed conv: ONE dense conv with 8x output channels.

    The 8 polyphase classes are packed into the output-channel dimension of a
    single stride-1 VALID conv (decimated kernels zero-aligned to a common
    tap window), then interleaved by a depth-to-space reshape.  Rationale:
    the model's native output channels (8/16) use only 6-12% of the 128-wide
    MXU; 8x-packing restores 50-100% lane utilization, and the interleave is
    one transpose instead of 8 strided scatters.
    """
    ksize = w.shape[:3]
    ci, co = w.shape[3], w.shape[4]
    lo = [k - 1 - p for k, p in zip(ksize, pad)]
    hi = [k - 1 - p + op for k, p, op in zip(ksize, pad, outpad)]
    dims = x.shape[1:4]
    l_out = [2 * i + l + h - k for i, k, l, h in zip(dims, ksize, lo, hi)]

    # per-axis class geometry
    ax = []  # (r_c, n0_c, k_c) per class, plus jj_min / k' / M per axis
    for a in range(3):
        classes = []
        for c in range(2):
            r = (lo[a] - c) % 2
            n0 = (c + r - lo[a]) // 2
            k_c = (ksize[a] - r + 1) // 2
            classes.append((r, n0, k_c))
        jj_min = min(n0 for _, n0, _ in classes)
        jj_max = max(n0 + k_c - 1 for _, n0, k_c in classes)
        m_len = (l_out[a] + 1) // 2
        ax.append((classes, jj_min, jj_max - jj_min + 1, m_len))

    # build the packed kernel (static index arithmetic; jnp ops so it
    # stays traceable/differentiable w.r.t. w)
    kp = [a[2] for a in ax]  # packed tap counts per axis
    w_packed = jnp.zeros((*kp, ci, 8 * co), w.dtype)
    for cd in range(2):
        rd, n0d, kcd = ax[0][0][cd]
        for ch in range(2):
            rh, n0h, kch = ax[1][0][ch]
            for cw in range(2):
                rw, n0w, kcw = ax[2][0][cw]
                sub = w[rd::2, rh::2, rw::2]  # (kcd, kch, kcw, I, O)
                c_lin = ((cd * 2 + ch) * 2 + cw) * co
                od = n0d - ax[0][1]
                oh = n0h - ax[1][1]
                ow = n0w - ax[2][1]
                w_packed = w_packed.at[
                    od : od + kcd, oh : oh + kch, ow : ow + kcw,
                    :, c_lin : c_lin + co,
                ].set(sub)

    padding = tuple(
        (-a[1], (a[1] + a[2] + a[3] - 2) - (i - 1))
        for a, i in zip(ax, dims)
    )
    y = jax.lax.conv_general_dilated(
        x, w_packed, window_strides=(1, 1, 1), padding=padding,
        dimension_numbers=_DN,
    )  # (B, Md, Mh, Mw, 8*O)

    b = x.shape[0]
    md, mh, mw = ax[0][3], ax[1][3], ax[2][3]
    y = y.reshape(b, md, mh, mw, 2, 2, 2, co)
    y = y.transpose(0, 1, 4, 2, 5, 3, 6, 7)  # (B, Md,cd, Mh,ch, Mw,cw, O)
    y = y.reshape(b, 2 * md, 2 * mh, 2 * mw, co)
    return y[:, : l_out[0], : l_out[1], : l_out[2], :]


def conv_transpose_2x(
    x: jnp.ndarray,           # (B, D, H, W, I)
    w: jnp.ndarray,           # (kD, kH, kW, I, O)
    pad: Sequence[int],       # torch-style padding per spatial dim
    outpad: Sequence[int],    # torch-style output_padding per spatial dim
) -> jnp.ndarray:
    """Stride-2 transposed conv, polyphase-decomposed. No bias.

    Reference implementation (8 separate class convs + strided scatters);
    conv_transpose_2x_fused is the fast path used by the decoder.
    """
    ksize = w.shape[:3]
    lo = [k - 1 - p for k, p in zip(ksize, pad)]
    hi = [k - 1 - p + op for k, p, op in zip(ksize, pad, outpad)]
    dims = x.shape[1:4]

    l_out = [2 * i + l + h - k for i, k, l, h in zip(dims, ksize, lo, hi)]
    out = jnp.zeros((x.shape[0], *l_out, w.shape[-1]), x.dtype)

    for cd in range(2):
        rd, plo_d, phi_d, od = _axis_class(dims[0], ksize[0], lo[0], hi[0], cd)
        if od <= 0:
            continue
        for ch in range(2):
            rh, plo_h, phi_h, oh = _axis_class(dims[1], ksize[1], lo[1], hi[1], ch)
            if oh <= 0:
                continue
            for cw in range(2):
                rw, plo_w, phi_w, ow = _axis_class(
                    dims[2], ksize[2], lo[2], hi[2], cw
                )
                if ow <= 0:
                    continue
                sub_w = w[rd::2, rh::2, rw::2]
                y = jax.lax.conv_general_dilated(
                    x, sub_w, window_strides=(1, 1, 1),
                    padding=((plo_d, phi_d), (plo_h, phi_h), (plo_w, phi_w)),
                    dimension_numbers=_DN,
                )
                out = out.at[:, cd::2, ch::2, cw::2, :].set(y)
    return out
