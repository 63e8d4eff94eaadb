"""Custom op correctness: polyphase transposed conv vs the dilated reference."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vaegam_tpu.ops.convt import conv_transpose_2x

_DN = ("NDHWC", "DHWIO", "NDHWC")


def _dilated_reference(x, w, pad, outpad, ksize):
    padding = tuple(
        (k - 1 - p, k - 1 - p + op) for k, p, op in zip(ksize, pad, outpad)
    )
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1, 1), padding=padding,
        lhs_dilation=(2, 2, 2), dimension_numbers=_DN,
    )


CASES = [
    # (in_dims, ksize, pad, outpad) — includes the decoder's convt2/convt4
    ((8, 10, 7), (3, 3, 3), (1, 0, 1), (1, 0, 1)),
    ((18, 23, 16), (5, 3, 3), (0, 0, 0), (0, 0, 0)),
    ((4, 5, 6), (3, 3, 3), (0, 0, 0), (0, 0, 0)),
    ((5, 4, 3), (4, 3, 2), (1, 1, 0), (0, 1, 1)),
    ((6, 6, 6), (5, 5, 5), (2, 2, 2), (1, 0, 1)),
]


@pytest.mark.parametrize("dims,ksize,pad,outpad", CASES)
def test_polyphase_matches_dilated(dims, ksize, pad, outpad):
    rng = np.random.default_rng(hash((dims, ksize)) % 2**31)
    ci, co = 3, 4
    x = jnp.asarray(rng.normal(size=(2, *dims, ci)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(*ksize, ci, co)), jnp.float32)
    ref = _dilated_reference(x, w, pad, outpad, ksize)
    got = conv_transpose_2x(x, w, pad, outpad)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_polyphase_gradient_matches():
    rng = np.random.default_rng(0)
    dims, ksize, pad, outpad = (6, 7, 5), (3, 3, 3), (1, 0, 1), (1, 0, 1)
    x = jnp.asarray(rng.normal(size=(2, *dims, 3)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(*ksize, 3, 4)), jnp.float32)

    def loss_ref(w):
        return jnp.sum(jnp.sin(_dilated_reference(x, w, pad, outpad, ksize)))

    def loss_new(w):
        return jnp.sum(jnp.sin(conv_transpose_2x(x, w, pad, outpad)))

    g_ref = jax.grad(loss_ref)(w)
    g_new = jax.grad(loss_new)(w)
    np.testing.assert_allclose(np.asarray(g_new), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("dims,ksize,pad,outpad", CASES)
def test_fused_polyphase_matches_dilated(dims, ksize, pad, outpad):
    from vaegam_tpu.ops.convt import conv_transpose_2x_fused

    rng = np.random.default_rng(hash((dims, ksize, 7)) % 2**31)
    ci, co = 3, 4
    x = jnp.asarray(rng.normal(size=(2, *dims, ci)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(*ksize, ci, co)), jnp.float32)
    ref = _dilated_reference(x, w, pad, outpad, ksize)
    got = conv_transpose_2x_fused(x, w, pad, outpad)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_fused_polyphase_gradient_matches():
    from vaegam_tpu.ops.convt import conv_transpose_2x_fused

    rng = np.random.default_rng(1)
    dims, ksize, pad, outpad = (6, 7, 5), (3, 3, 3), (1, 0, 1), (1, 0, 1)
    x = jnp.asarray(rng.normal(size=(2, *dims, 3)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(*ksize, 3, 4)), jnp.float32)

    def loss_ref(w):
        return jnp.sum(jnp.sin(_dilated_reference(x, w, pad, outpad, ksize)))

    def loss_new(w):
        return jnp.sum(jnp.sin(conv_transpose_2x_fused(x, w, pad, outpad)))

    np.testing.assert_allclose(
        np.asarray(jax.grad(loss_new)(w)), np.asarray(jax.grad(loss_ref)(w)),
        rtol=1e-4, atol=1e-5,
    )
