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


# ---------------------------------------------------------------------------
# lane-packed stride-1 conv (ops/packed_conv.py)
# ---------------------------------------------------------------------------

PACKED_CASES = [
    # (dims, ic, oc, ksize, pad, pack)
    ((8, 10, 7), 6, 5, (3, 3, 3), ((2, 2), (2, 2), (2, 2)), (4, 4)),
    ((9, 11, 13), 4, 5, (3, 3, 3), ((0, 0), (0, 0), (0, 0)), (2, 3)),
    ((7, 9, 8), 3, 2, (5, 3, 3), ((1, 0), (0, 1), (2, 2)), (3, 5)),
    ((5, 6, 7), 2, 3, (1, 1, 1), ((0, 0), (0, 0), (0, 0)), (4, 2)),
    ((6, 12, 12), 2, 1, (3, 3, 3), ((2, 2), (2, 2), (2, 2)), (4, 8)),
]


@pytest.mark.parametrize("dims,ic,oc,ksize,pad,pack", PACKED_CASES)
def test_packed_conv_matches_lax(dims, ic, oc, ksize, pad, pack):
    from vaegam_tpu.ops.packed_conv import packed_conv3d

    rng = np.random.default_rng(hash((dims, ksize, pack)) % 2**31)
    x = jnp.asarray(rng.normal(size=(2, *dims, ic)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(*ksize, ic, oc)), jnp.float32)
    ref = jax.lax.conv_general_dilated(
        x, w, (1, 1, 1), pad, dimension_numbers=("NDHWC", "DHWIO", "NDHWC")
    )
    got = packed_conv3d(x, w, pad, pack)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_packed_conv_gradient_matches():
    from vaegam_tpu.ops.packed_conv import packed_conv3d

    rng = np.random.default_rng(3)
    dims, ksize, pad, pack = (7, 9, 8), (3, 3, 3), ((2, 2), (2, 2), (2, 2)), (3, 4)
    x = jnp.asarray(rng.normal(size=(2, *dims, 3)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(*ksize, 3, 4)), jnp.float32)
    dn = ("NDHWC", "DHWIO", "NDHWC")

    def loss_ref(x, w):
        y = jax.lax.conv_general_dilated(x, w, (1, 1, 1), pad,
                                         dimension_numbers=dn)
        return jnp.sum(jnp.sin(y))

    def loss_new(x, w):
        return jnp.sum(jnp.sin(packed_conv3d(x, w, pad, pack)))

    gx_r, gw_r = jax.grad(loss_ref, argnums=(0, 1))(x, w)
    gx_n, gw_n = jax.grad(loss_new, argnums=(0, 1))(x, w)
    # tolerances allow matmul-reassociation noise (different contraction
    # grouping than lax.conv's lowering)
    np.testing.assert_allclose(np.asarray(gx_n), np.asarray(gx_r),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw_n), np.asarray(gw_r),
                               rtol=1e-3, atol=1e-4)


def test_model_stacks_invariant_under_conv_pack():
    """encode()/decode() (the deterministic conv stacks) produce the same
    outputs and grads with conv_pack on vs off — the pack is a pure
    re-embedding of the stride-1 convs.  The full forward() loss also
    matches; its GRADS are not compared element-wise because the stochastic
    path (escalating-jitter Cholesky, global d-floor branch) chaotically
    amplifies fp-reassociation-level deltas on a few elements."""
    from jax.flatten_util import ravel_pytree

    from vaegam_tpu.models import VAEGAMConfig, forward, init_model
    from vaegam_tpu.models.networks import decode, encode

    rng = np.random.default_rng(0)
    shape = (21, 25, 21)
    glm = rng.normal(size=(int(np.prod(shape)), 9)).astype(np.float32)
    covs = jnp.asarray(rng.normal(size=(4, 8)), jnp.float32)
    x = jnp.asarray(rng.uniform(0, 1, size=(4,) + shape), jnp.float32)
    cfg0 = VAEGAMConfig(img_shape=shape)
    params, consts = init_model(
        jax.random.PRNGKey(0), cfg0, [[-2.0, 2.0]] * 6, glm
    )
    z = jnp.asarray(rng.normal(size=(9 * 4, cfg0.z_dim)), jnp.float32)

    def dec_loss(p, pack):
        out = decode(p, z, cfg0.nf, img_shape=shape, stat_groups=9,
                     conv_pack=pack)
        return jnp.sum(jnp.sin(out * 3.0)), out

    def enc_loss(p, pack):
        mu, u, d = encode(p, x, cfg0.nf, conv_pack=pack)
        return jnp.sum(jnp.sin(mu) + jnp.cos(u) + d), mu

    for fn, prm in ((dec_loss, params["dec"]), (enc_loss, params["enc"])):
        (l0, o0), g0 = jax.value_and_grad(fn, has_aux=True)(prm, None)
        (l1, o1), g1 = jax.value_and_grad(fn, has_aux=True)(prm, (2, 2))
        np.testing.assert_allclose(np.asarray(o1), np.asarray(o0),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(ravel_pytree(g1)[0]), np.asarray(ravel_pytree(g0)[0]),
            rtol=1e-3, atol=2e-3,
        )

    losses = {}
    for pack in (None, (2, 2)):
        cfg = VAEGAMConfig(conv_pack=pack, img_shape=shape)
        loss, _ = forward(params, consts, jax.random.PRNGKey(3), covs, x, cfg)
        losses[pack] = float(loss)
    assert abs(losses[(2, 2)] - losses[None]) < 1e-3 * max(
        1.0, abs(losses[None])
    )


# ---------------------------------------------------------------------------
# lane-folded Pallas conv5 (ops/pallas_conv) — interpret mode on CPU
# ---------------------------------------------------------------------------


def test_pallas_conv5_matches_lax_and_grads():
    """Element-exact forward + gradients vs lax, in Pallas interpret mode
    (the TPU-compiled path is measured in docs/PERFORMANCE.md)."""
    import vaegam_tpu.ops.pallas_conv as pc

    orig = pc.pl.pallas_call

    def interp_call(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    pc.pl.pallas_call = interp_call
    try:
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(2, 8, 10, 6, 16)), jnp.float32)
        w = jnp.asarray(rng.normal(size=(3, 3, 3, 16, 16)) * 0.1, jnp.float32)
        b = jnp.asarray(rng.normal(size=(16,)), jnp.float32)
        got = pc.conv3d_s1_pallas(x, w, b)
        ref = pc._ref_fwd(x, w, b)
        assert got.shape == (2, 6, 8, 4, 16)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-5)

        def loss_p(x, w, b):
            return jnp.sum(jnp.sin(pc.conv3d_s1_pallas(x, w, b)))

        def loss_r(x, w, b):
            return jnp.sum(jnp.sin(pc._ref_fwd(x, w, b)))

        gp = jax.grad(loss_p, argnums=(0, 1, 2))(x, w, b)
        gr = jax.grad(loss_r, argnums=(0, 1, 2))(x, w, b)
        for a, c in zip(gp, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                       atol=2e-4)
    finally:
        pc.pl.pallas_call = orig


def test_pallas_conv5_in_encode():
    """config.pallas_conv5 routes conv5 through the kernel with identical
    (to fp32 epsilon) encoder outputs."""
    import vaegam_tpu.ops.pallas_conv as pc
    from vaegam_tpu.models.networks import encode, init_encoder

    orig = pc.pl.pallas_call

    def interp_call(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    pc.pl.pallas_call = interp_call
    try:
        rng = np.random.default_rng(1)
        params = init_encoder(jax.random.PRNGKey(0), 8, 32)
        x = jnp.asarray(rng.uniform(0, 1, size=(2, 41, 49, 35)), jnp.float32)
        base = encode(params, x, 8)
        pal = encode(params, x, 8, pallas_conv5=True)
        for a, c in zip(pal, base):
            np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                       rtol=2e-4, atol=2e-5)
    finally:
        pc.pl.pallas_call = orig
