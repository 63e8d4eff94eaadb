"""Encoder/decoder shape & behavior contracts (reference vae_reg_GP.py:187-264)."""

import numpy as np

import jax
import jax.numpy as jnp

from vaegam_tpu.models.networks import decode, encode, init_decoder, init_encoder


def test_encoder_shapes_and_positivity():
    key = jax.random.PRNGKey(0)
    nf, L, B = 8, 32, 3
    params = init_encoder(key, nf, L)
    x = jax.random.uniform(jax.random.PRNGKey(1), (B, 41, 49, 35))
    mu, u, d = encode(params, x, nf)
    assert mu.shape == (B, L) and u.shape == (B, L) and d.shape == (B, L)
    assert np.all(np.asarray(d) > 0)  # d = exp(.) must be positive


def test_decoder_shape_and_range():
    key = jax.random.PRNGKey(2)
    nf, z_dim, B = 8, 41, 5
    params = init_decoder(key, nf, z_dim)
    z = jax.random.normal(jax.random.PRNGKey(3), (B, z_dim))
    out = decode(params, z, nf)
    assert out.shape == (B, 41 * 49 * 35)
    vals = np.asarray(out)
    assert (vals >= 0).all() and (vals <= 1).all()  # sigmoid output


def test_conv_stack_intermediate_shapes():
    """Verify the conv chain reproduces the reference spatial dims.

    encoder: (41,49,35) -> (39,47,33) -> (19,23,16) -> (17,21,14)
             -> (8,10,6) -> (6,8,4)   (vae_reg_GP.py:189-197)
    """
    from vaegam_tpu.models.networks import _batch_stat_norm, _conv, _relu

    key = jax.random.PRNGKey(4)
    nf = 8
    params = init_encoder(key, nf, 32)
    h = jax.random.uniform(jax.random.PRNGKey(5), (2, 41, 49, 35))[..., None]
    h = _relu(_conv(_batch_stat_norm(h, params["bn1"]), params["conv1"], 1))
    assert h.shape == (2, 39, 47, 33, nf)
    h = _relu(_conv(h, params["conv2"], 2))
    assert h.shape == (2, 19, 23, 16, nf)
    h = _relu(_conv(_batch_stat_norm(h, params["bn3"]), params["conv3"], 1))
    assert h.shape == (2, 17, 21, 14, 2 * nf)
    h = _relu(_conv(h, params["conv4"], 2))
    assert h.shape == (2, 8, 10, 6, 2 * nf)
    h = _relu(_conv(_batch_stat_norm(h, params["bn5"]), params["conv5"], 1))
    assert h.shape == (2, 6, 8, 4, 2 * nf)


def test_batch_stat_norm_uses_batch_statistics():
    """Norm output must have ~zero mean / unit variance per channel."""
    from vaegam_tpu.models.networks import _batch_stat_norm

    p = {"scale": jnp.ones(3), "shift": jnp.zeros(3)}
    x = jax.random.normal(jax.random.PRNGKey(6), (4, 5, 6, 7, 3)) * 5 + 2
    y = _batch_stat_norm(x, p)
    m = np.asarray(jnp.mean(y, axis=(0, 1, 2, 3)))
    v = np.asarray(jnp.var(y, axis=(0, 1, 2, 3)))
    np.testing.assert_allclose(m, 0.0, atol=1e-5)
    np.testing.assert_allclose(v, 1.0, atol=1e-3)


def test_torch_default_init_bounds():
    """Weights must follow U(+-1/sqrt(fan_in)) like torch defaults."""
    params = init_encoder(jax.random.PRNGKey(7), 8, 32)
    w = np.asarray(params["conv2"]["w"])  # fan_in = 8*27 = 216
    bound = 1 / np.sqrt(216)
    assert np.abs(w).max() <= bound
    assert np.abs(w).max() > 0.8 * bound  # actually fills the range


def test_per_stack_conv_dtype_overrides():
    """enc_conv_dtype/dec_conv_dtype/dec_fp32_final select precision per
    stack; outputs stay close to fp32 within bf16 tolerance."""
    import jax
    import jax.numpy as jnp

    from vaegam_tpu.models import VAEGAMConfig, forward, init_model

    cfgs = {
        "fp32": VAEGAMConfig(nf=2, num_latents=8, img_shape=(21, 25, 21)),
        "enc_bf16": VAEGAMConfig(nf=2, num_latents=8, img_shape=(21, 25, 21),
                                 enc_conv_dtype=jnp.bfloat16),
        "dec_bf16": VAEGAMConfig(nf=2, num_latents=8, img_shape=(21, 25, 21),
                                 dec_conv_dtype=jnp.bfloat16),
        "fp32_final": VAEGAMConfig(nf=2, num_latents=8,
                                   img_shape=(21, 25, 21),
                                   conv_dtype=jnp.bfloat16,
                                   dec_fp32_final=True),
    }
    rng = np.random.default_rng(0)
    covs = jnp.asarray(rng.normal(size=(4, 8)), jnp.float32)
    x = jnp.asarray(rng.uniform(0, 1, size=(4, 21, 25, 21)), jnp.float32)
    losses = {}
    for name, cfg in cfgs.items():
        params, consts = init_model(jax.random.PRNGKey(0), cfg,
                                    [[-2.0, 2.0]] * 6, None)
        loss, _ = forward(params, consts, jax.random.PRNGKey(1), covs, x,
                          cfg, deterministic=True)
        losses[name] = float(loss)
        assert np.isfinite(losses[name])
    for name in ("enc_bf16", "dec_bf16", "fp32_final"):
        # bf16 conv rounding moves the toy loss by well under 1%
        assert abs(losses[name] - losses["fp32"]) < 0.01 * abs(
            losses["fp32"]
        ), (name, losses)
