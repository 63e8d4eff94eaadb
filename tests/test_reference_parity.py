"""Numerical parity vs the ACTUAL reference implementation (same weights).

Imports the reference modules from /root/reference (read-only; skipped when
absent), ports the torch VAE's freshly-initialized weights into our pytree
via utils.torch_port, and checks deterministic sub-paths agree:

  encoder forward, decoder forward, GP posterior (incl. the reference's
  arange/striped gram quirks), linear-weight KL, HRF convolution,
  observation log-likelihood, checkpoint-import round-trip — and the two
  end-to-end BASELINE acceptance checks:

  * test_full_forward_parity_deterministic — the COMPLETE composed forward
    (tot_loss + all 10 maps) at fixed z/gains (means), vs the reference
    forward with rsample patched to the distribution mean;
  * test_trained_checkpoint_map_parity — reference trained ~20 Adam steps,
    checkpoint imported, all 10 recon maps within 1e-3.
"""

import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"
pytestmark = [
    pytest.mark.skipif(
        not os.path.isdir(REF), reason="reference checkout not available"
    ),
    pytest.mark.slow,
]


def _write_ref_inputs(d, seed=0):
    """Write the csv + glm-maps files the reference VAE.__init__ needs."""
    import pandas as pd

    cols = ["x", "y", "z", "rot_x", "rot_y", "rot_z"]
    rng = np.random.default_rng(seed)
    # wide motion range => well-separated inducing points => well-conditioned
    # Kuu.  (At the reference's defaults — 6 closely spaced points, ls>=1.87 —
    # Kuu is near-singular and fp32 torch.inverse vs fp32 solve legitimately
    # diverge; that ill-conditioning is the reference's own documented
    # instability, SURVEY.md §2/C5, not a portable numerical contract.)
    df = pd.DataFrame({c: rng.normal(0, 12, 10) for c in cols})
    df.insert(0, "subjid", "sub-A00001")
    csv = str(d / "train.csv")
    df.to_csv(csv)
    glm = str(d / "glm.csv")
    pd.DataFrame(
        rng.normal(size=(70315, 8)),
        columns=["task", "x", "y", "z", "xrot", "yrot", "zrot", "sex"],
    ).to_csv(glm)
    return csv, glm


@pytest.fixture(scope="module")
def ref_modules(tmp_path_factory):
    """Import reference modules with shims for their unavailable deps."""
    # stub the deps the reference imports at module scope
    for name in ("nibabel", "umap"):
        if name not in sys.modules:
            sys.modules[name] = types.ModuleType(name)
    sys.modules["umap"].UMAP = object
    tv = types.ModuleType("torchvision")
    tv.datasets = types.SimpleNamespace()
    tv.transforms = types.SimpleNamespace()
    sys.modules.setdefault("torchvision", tv)
    sys.modules.setdefault("torchvision.datasets", tv.datasets)

    sys.path.insert(0, REF)
    import gp as ref_gp  # noqa: F401
    import utils as ref_utils  # noqa: F401

    # the reference's _striped_matrix hard-calls .cuda() (gp.py:115) and
    # crashes on CPU-only machines — the documented one-line patch from
    # BASELINE.md, applied as a monkeypatch for parity measurement
    def _striped_cpu(n):
        idx = torch.arange(n, dtype=torch.float32)
        return (idx[:, None] - idx[None, :]).abs()

    ref_gp._striped_matrix = _striped_cpu

    d = tmp_path_factory.mktemp("ref_inputs")
    csv, glm = _write_ref_inputs(d)

    import vae_reg_GP as ref_vae

    torch.manual_seed(0)
    model = ref_vae.VAE(
        save_dir=str(d / "out"), glm_maps=glm, csv_files=[csv, csv],
        neural_covariates=True,
    )
    model.eval()
    return ref_gp, ref_utils, ref_vae, model, glm


def _layers_np(model):
    return {
        name: {k: v.detach().cpu().numpy() for k, v in layer.state_dict().items()}
        for name, layer in model._get_layers().items()
    }


@pytest.fixture(scope="module")
def ported(ref_modules):
    _, _, _, model, _ = ref_modules
    from vaegam_tpu.utils.torch_port import port_gp_params, port_layer_state

    params = port_layer_state(_layers_np(model), nf=model.nf)
    gp_np = {
        ck: {k: v.detach().cpu().numpy() if torch.is_tensor(v) else v
             for k, v in cd.items()}
        for ck, cd in model.gp_params.items()
    }
    params["gp"], xu = port_gp_params(gp_np)
    import jax.numpy as jnp

    params["epsilon"] = jnp.asarray(
        model.epsilon.detach().cpu().numpy(), jnp.float32
    )
    return params, xu


def test_encoder_parity(ref_modules, ported):
    _, _, _, model, _ = ref_modules
    params, _ = ported
    from vaegam_tpu.models.networks import encode

    rng = np.random.default_rng(1)
    x = rng.uniform(0, 1, size=(3, 41, 49, 35)).astype(np.float32)
    with torch.no_grad():
        mu_t, u_t, d_t = model.encode(torch.tensor(x))
    import jax.numpy as jnp

    mu_j, u_j, d_j = encode(params["enc"], jnp.asarray(x), model.nf)
    np.testing.assert_allclose(np.asarray(mu_j), mu_t.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(u_j), u_t.numpy()[..., 0], atol=2e-5)
    np.testing.assert_allclose(np.asarray(d_j), d_t.numpy(), atol=2e-5, rtol=1e-4)


def test_decoder_parity(ref_modules, ported):
    _, _, _, model, _ = ref_modules
    params, _ = ported
    from vaegam_tpu.models.networks import decode

    rng = np.random.default_rng(2)
    z = rng.normal(size=(3, model.z_dim)).astype(np.float32)
    with torch.no_grad():
        out_t = model.decode(torch.tensor(z)).numpy()
    import jax.numpy as jnp

    out_j = np.asarray(decode(params["dec"], jnp.asarray(z), model.nf))
    # torch decode reshapes channel-major; ours channel-minor -> compare in 3D
    out_t3 = out_t.reshape(3, 41, 49, 35)
    out_j3 = out_j.reshape(3, 41, 49, 35)
    # 5 transposed convs + 3 batch-stat norms accumulate ~1e-4 fp32 noise
    np.testing.assert_allclose(out_j3, out_t3, atol=2e-4)


def test_gp_posterior_parity_vs_reference_code(ref_modules, ported):
    ref_gp, _, _, model, _ = ref_modules
    params, xu = ported
    from vaegam_tpu.models.gp import evaluate_posterior
    from vaegam_tpu.models.vaegam import gp_transforms
    import jax
    import jax.numpy as jnp

    gp_p = params["gp"]
    kvar, ls = gp_transforms(gp_p, type("C", (), {"max_ls": 3.0}))
    rng = np.random.default_rng(3)
    xq = rng.normal(0, 1, size=(7,)).astype(np.float32)

    for j, key in enumerate(["x", "y", "z", "xrot", "yrot", "zrot"]):
        tp = model.gp_params[key]
        kvar_t = tp["logkvar"].exp() + 0.1
        ls_t = model.max_ls * torch.sigmoid(tp["log_ls"].exp() + 0.5)
        g = ref_gp.GP(tp["xu"], kvar_t, ls_t, tp["qu_m"], tp["qu_S"])
        with torch.no_grad():
            f_t, S_t = g.evaluate_posterior(torch.tensor(xq))
        f_j, S_j = evaluate_posterior(
            xu[j], kvar[j], ls[j], gp_p["qu_m"][j], gp_p["qu_S"][j],
            jnp.asarray(xq),
        )
        # the reference builds Kuq by arange accumulation (gp.py:92-94) which
        # drifts from exact distances at ~1e-6; atol dominated by that
        np.testing.assert_allclose(np.asarray(f_j), f_t.numpy(),
                                   atol=5e-4, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(S_j), S_t.numpy(),
                                   atol=5e-4, rtol=1e-3)


def test_linw_kl_and_hrf_parity(ref_modules, ported):
    _, _, _, model, _ = ref_modules
    from vaegam_tpu.models.distributions import normal_kl
    from vaegam_tpu.models.vaegam import _hrf_convolve, hrf_kernel
    import jax.numpy as jnp

    sa = model.gp_params["task"]["sa"][0]
    std = model.gp_params["task"]["logstd"][0].exp()
    kl_t = model.calc_linW_KL(sa, std).item()
    kl_j = float(normal_kl(float(sa), float(std), 1.0, 0.5))
    assert kl_j == pytest.approx(kl_t, rel=1e-5)

    rng = np.random.default_rng(4)
    gains = rng.normal(size=(9,)).astype(np.float32)
    with torch.no_grad():
        conv_t = model.do_hrf_conv(torch.tensor(gains)).numpy()
    conv_j = np.asarray(_hrf_convolve(jnp.asarray(gains, jnp.float32),
                                      hrf_kernel()))
    np.testing.assert_allclose(conv_j, conv_t, atol=1e-5)


def test_observation_logprob_parity(ref_modules, ported):
    """Recon log-likelihood term at fixed x_rec (vae_reg_GP.py:401-406)."""
    _, _, _, model, _ = ref_modules
    params, _ = ported
    from vaegam_tpu.models.distributions import normal_log_prob
    import jax.numpy as jnp

    rng = np.random.default_rng(5)
    b = 3
    x = rng.uniform(0, 1, size=(b, 70315)).astype(np.float32)
    x_rec = rng.uniform(0, 1, size=(b, 70315)).astype(np.float32)
    from torch.distributions import Normal

    eps_t = model.epsilon.detach()
    with torch.no_grad():
        obs = Normal(
            torch.tensor(x_rec),
            torch.exp(-eps_t.unsqueeze(0).view(1, -1).expand(b, -1)).float(),
        )
        lp_t = obs.log_prob(torch.tensor(x)).sum(dim=1).numpy()
    scale = np.exp(-np.asarray(params["epsilon"]).reshape(-1))
    lp_j = np.asarray(
        jnp.sum(
            normal_log_prob(jnp.asarray(x), jnp.asarray(x_rec),
                            jnp.asarray(scale)[None, :]),
            axis=-1,
        )
    )
    np.testing.assert_allclose(lp_j, lp_t, rtol=1e-5)


class _MeanRSample:
    """Context: patch torch rsample() -> distribution mean.

    Both implementations draw z ~ q(z|x) and gains ~ q(beta); fixing every
    draw at its mean makes the COMPLETE composed forward deterministic so
    tot_loss and all 10 maps are directly comparable (the BASELINE 1e-3
    acceptance criterion).
    """

    def __enter__(self):
        from torch.distributions import (
            LowRankMultivariateNormal, MultivariateNormal,
        )

        self._saved = (
            LowRankMultivariateNormal.rsample, MultivariateNormal.rsample
        )
        LowRankMultivariateNormal.rsample = lambda self, *a, **k: self.mean
        MultivariateNormal.rsample = lambda self, *a, **k: self.mean
        return self

    def __exit__(self, *exc):
        from torch.distributions import (
            LowRankMultivariateNormal, MultivariateNormal,
        )

        LowRankMultivariateNormal.rsample, MultivariateNormal.rsample = (
            self._saved
        )


def _jax_forward_det(params, consts, config, covs, x, return_maps=True):
    import jax
    import jax.numpy as jnp

    from vaegam_tpu.models import forward

    return forward(
        params, consts, jax.random.PRNGKey(0), jnp.asarray(covs),
        jnp.asarray(x), config, return_maps=return_maps, deterministic=True,
    )


def test_full_forward_parity_deterministic(ref_modules, ported):
    """COMPLETE forward at fixed (mean) z/gains: tot_loss terms + 10 maps.

    This is acceptance criterion (a): the composed
    encode -> 9 decodes -> GP gains -> HRF -> compose -> ELBO+GLM pipeline
    (vae_reg_GP.py:307-413) agrees end-to-end, maps within 1e-3.
    """
    _, _, _, model, glm = ref_modules
    params, xu = ported
    import pandas as pd

    import jax.numpy as jnp

    from vaegam_tpu.models import VAEGAMConfig
    from vaegam_tpu.models.vaegam import MAP_KEYS, hrf_kernel

    rng = np.random.default_rng(6)
    b = 4
    x = rng.uniform(0, 1, size=(b, 41, 49, 35)).astype(np.float32)
    covs = rng.normal(0, 1, size=(b, 8)).astype(np.float32)
    ids = torch.arange(b)

    with _MeanRSample(), torch.no_grad():
        loss_t, _, imgs_t = model.forward(
            ids, torch.tensor(covs), torch.tensor(x), "test",
            return_latent_rec=True, train_mode=False,
        )

    config = VAEGAMConfig()
    glm_np = pd.read_csv(glm).to_numpy().astype(np.float32)  # (D, 9) w/ index
    consts = {
        "xu": xu,
        "hrf": hrf_kernel(),
        "glm_maps": jnp.asarray(glm_np),
    }
    loss_j, aux = _jax_forward_det(params, consts, config, covs, x)

    # maps: the 1e-3 acceptance criterion
    for k in MAP_KEYS:
        np.testing.assert_allclose(
            np.asarray(aux["maps"][k]), imgs_t[k], atol=1e-3,
            err_msg=f"map {k} exceeds the 1e-3 parity criterion",
        )
    # composite objective (magnitude ~1e5-1e6 from the 70315-voxel loglik)
    np.testing.assert_allclose(
        float(loss_j), float(loss_t), rtol=1e-4,
    )


def test_trained_checkpoint_map_parity(ref_modules, tmp_path):
    """Acceptance criterion (b): maps from a short-TRAINED reference model.

    Trains the actual reference ~20 Adam steps on synthetic volumes, imports
    the torch checkpoint via cli.import_torch_ckpt, and asserts all 10 recon
    maps (vae_reg_GP.py:585-620 content) match within 1e-3 at fixed samples.
    """
    _, _, ref_vae, _, _ = ref_modules
    csv, glm = _write_ref_inputs(tmp_path, seed=21)

    torch.manual_seed(42)
    model = ref_vae.VAE(
        save_dir=str(tmp_path / "ref_out"), glm_maps=glm,
        csv_files=[csv, csv], neural_covariates=True,
    )
    model.train()
    rng = np.random.default_rng(7)
    b = 4
    for _ in range(20):
        x = torch.tensor(
            rng.uniform(0, 1, size=(b, 41, 49, 35)).astype(np.float32)
        )
        covs = torch.tensor(rng.normal(0, 1, size=(b, 8)).astype(np.float32))
        model.optimizer.zero_grad()
        loss = model.forward(torch.arange(b), covs, x, "train",
                             train_mode=False)
        loss.backward()
        model.optimizer.step()
    model.eval()

    torch_ckpt = str(tmp_path / "checkpoint_000.tar")
    model.save_state(torch_ckpt)
    real = os.path.join(model.save_dir, torch_ckpt.lstrip(os.sep))
    if not os.path.exists(torch_ckpt):
        torch_ckpt = real

    from vaegam_tpu.cli.import_torch_ckpt import convert
    out_ckpt = str(tmp_path / "converted.tar")
    convert(torch_ckpt, out_ckpt, nf=model.nf)

    from vaegam_tpu.models import VAEGAMConfig
    from vaegam_tpu.models.vaegam import MAP_KEYS
    from vaegam_tpu.train import Trainer
    config = VAEGAMConfig()
    trainer = Trainer(config, [[-2.0, 2.0]] * 6, glm_maps=None,
                      save_dir=str(tmp_path / "jx"), enable_tb=False)
    trainer.load_state(out_ckpt)

    x_eval = rng.uniform(0, 1, size=(b, 41, 49, 35)).astype(np.float32)
    covs_eval = rng.normal(0, 1, size=(b, 8)).astype(np.float32)
    with _MeanRSample(), torch.no_grad():
        _, _, imgs_t = model.forward(
            torch.arange(b), torch.tensor(covs_eval), torch.tensor(x_eval),
            "test", return_latent_rec=True, train_mode=False,
        )
    _, aux = _jax_forward_det(
        trainer.params, trainer.consts, trainer.config, covs_eval, x_eval
    )
    # trained gain-scaled maps reach magnitudes ~2 (cons = gain * diff), so
    # the 1e-3 criterion is absolute-or-relative: |d| <= 1e-3 + 1e-3*|ref|
    for k in MAP_KEYS:
        np.testing.assert_allclose(
            np.asarray(aux["maps"][k]), imgs_t[k], atol=1e-3, rtol=1e-3,
            err_msg=f"trained-model map {k} exceeds the 1e-3 criterion",
        )


def test_import_torch_checkpoint_roundtrip(ref_modules, tmp_path):
    """reference save_state -> import CLI -> Trainer.load_state -> parity."""
    _, _, _, model, _ = ref_modules
    torch_ckpt = str(tmp_path / "checkpoint_000.tar")
    model.save_state(torch_ckpt)
    # save_state joins save_dir with the (already absolute) filename — the
    # reference quirk (vae_reg_GP.py:470); recover the real path it wrote
    real = os.path.join(model.save_dir, torch_ckpt.lstrip(os.sep))
    if not os.path.exists(torch_ckpt):
        torch_ckpt = real

    from vaegam_tpu.cli.import_torch_ckpt import convert
    out_ckpt = str(tmp_path / "converted.tar")
    convert(torch_ckpt, out_ckpt, nf=model.nf)

    from vaegam_tpu.models import VAEGAMConfig
    from vaegam_tpu.train import Trainer
    config = VAEGAMConfig()
    trainer = Trainer(config, [[-2.0, 2.0]] * 6, glm_maps=None,
                      save_dir=str(tmp_path), enable_tb=False)
    trainer.load_state(out_ckpt)
    assert trainer.epoch == model.epoch

    from vaegam_tpu.models.networks import encode
    import jax.numpy as jnp
    rng = np.random.default_rng(9)
    x = rng.uniform(0, 1, size=(2, 41, 49, 35)).astype(np.float32)
    with torch.no_grad():
        mu_t, _, _ = model.encode(torch.tensor(x))
    mu_j, _, _ = encode(trainer.params["enc"], jnp.asarray(x), model.nf)
    np.testing.assert_allclose(np.asarray(mu_j), mu_t.numpy(), atol=2e-5)


def test_export_torch_checkpoint_reference_loads(ref_modules, ported,
                                                 tmp_path):
    """framework checkpoint -> export CLI -> the ACTUAL reference load_state.

    The gold test for the export direction (cli.export_torch_ckpt): a
    differently-initialized reference VAE loads the exported .tar via its
    own load_state (vae_reg_GP.py:473-539) — torch.load defaults and the
    optimizer state-dict contract included — and ends up with every layer,
    the epsilon map, and the full gp_params bank equal to the source model.
    """
    import jax
    import optax

    _, _, ref_vae, model, _ = ref_modules
    params, xu = ported

    from vaegam_tpu.cli.export_torch_ckpt import convert
    from vaegam_tpu.models.vaegam import hrf_kernel
    from vaegam_tpu.train.checkpoint import save_checkpoint

    params_np = jax.tree_util.tree_map(lambda a: np.asarray(a), params)
    ours = str(tmp_path / "ours.tar")
    save_checkpoint(
        ours, params_np, optax.adam(1e-3).init(params_np),
        epoch=int(model.epoch), loss={"train": {}, "test": {}},
        z_dim=int(model.z_dim), lr=float(model.lr), save_dir=str(tmp_path),
        glm_reg_scale=float(model.glm_reg_scale),
        gp_kl_scale=float(model.gp_kl_scale),
        inducing_pts=int(model.inducing_pts),
        consts={"xu": np.asarray(xu), "hrf": np.asarray(hrf_kernel()),
                "glm_maps": None},
    )
    exported = str(tmp_path / "exported.tar")
    convert(ours, exported)

    csv, glm2 = _write_ref_inputs(tmp_path, seed=0)
    torch.manual_seed(12345)  # different init: load_state must replace all
    model2 = ref_vae.VAE(
        save_dir=str(tmp_path / "out2"), glm_maps=glm2,
        csv_files=[csv, csv], neural_covariates=True,
    )
    model2.load_state(exported)
    model2.eval()

    l1, l2 = model._get_layers(), model2._get_layers()
    for name in l1:
        sd1, sd2 = l1[name].state_dict(), l2[name].state_dict()
        assert set(sd1) == set(sd2), name
        for k in sd1:
            np.testing.assert_array_equal(
                sd1[k].detach().cpu().numpy(), sd2[k].detach().cpu().numpy(),
                err_msg=f"{name}.{k}",
            )
    # epsilon crossed fp64 -> fp32 -> fp64 once (framework stores fp32)
    np.testing.assert_allclose(
        model2.epsilon.detach().cpu().numpy(),
        model.epsilon.detach().cpu().numpy(), atol=1e-6,
    )
    for cov, d in model.gp_params.items():
        for k, v in d.items():
            np.testing.assert_array_equal(
                model2.gp_params[cov][k].detach().cpu().numpy(),
                v.detach().cpu().numpy(), err_msg=f"gp_params.{cov}.{k}",
            )
    assert model2.epoch == model.epoch
    assert float(model2.gp_kl_scale) == float(model.gp_kl_scale)
