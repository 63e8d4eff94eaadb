"""Shape-generalized networks: non-reference volume grids (incl. MNI)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vaegam_tpu.models import VAEGAMConfig, forward, init_model
from vaegam_tpu.models.networks import (
    decode,
    decoder_seed_shape,
    encode,
    encoder_out_shape,
    init_decoder,
    init_encoder,
)


def test_reference_shape_is_exact():
    """The general formulas must reproduce the reference architecture."""
    assert encoder_out_shape((41, 49, 35)) == (6, 8, 4)
    seed, crop = decoder_seed_shape((41, 49, 35))
    assert seed == (6, 8, 5) and crop == (0, 0, 0)


def test_mni_grid_arithmetic():
    assert encoder_out_shape((91, 109, 91)) == (18, 23, 18)
    seed, crop = decoder_seed_shape((91, 109, 91))
    assert seed == (19, 23, 19) and crop == (2, 0, 0)


@pytest.mark.parametrize("shape", [(29, 33, 27), (33, 41, 31)])
def test_alternative_shape_roundtrip(shape):
    nf, L = 2, 8
    key = jax.random.PRNGKey(0)
    enc = init_encoder(key, nf, L, img_shape=shape)
    dec = init_decoder(key, nf, L + 9, img_shape=shape)
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, *shape))
    mu, u, d = encode(enc, x, nf)
    assert mu.shape == (2, L)
    z = jax.random.normal(jax.random.PRNGKey(2), (2, L + 9))
    out = decode(dec, z, nf, img_shape=shape)
    assert out.shape == (2, int(np.prod(shape)))


def test_full_forward_on_alternative_shape():
    shape = (29, 33, 27)
    config = VAEGAMConfig(nf=2, num_latents=8, img_shape=shape)
    params, consts = init_model(
        jax.random.PRNGKey(0), config, [[-2.0, 2.0]] * 6, None
    )
    rng = np.random.default_rng(0)
    B = 3
    covs = jnp.asarray(rng.normal(size=(B, 8)), jnp.float32)
    x = jnp.asarray(rng.uniform(0, 1, (B, *shape)), jnp.float32)
    loss, aux = forward(params, consts, jax.random.PRNGKey(1), covs, x,
                        config, return_maps=True)
    assert np.isfinite(float(loss))
    assert aux["maps"]["full_rec"].shape == (B, int(np.prod(shape)))
