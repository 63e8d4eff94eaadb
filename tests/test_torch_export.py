"""torch_export: exact inverse of torch_port + reference-loadable CLI output.

The gold end-to-end check (export -> the ACTUAL reference VAE.load_state)
lives in test_reference_parity.py::test_export_torch_checkpoint_reference_loads;
these tests cover the pure-numpy inverses and the CLI file contract without
importing the reference.
"""

import numpy as np
import pytest


def _init_params(nf=8, seed=0):
    import jax

    from vaegam_tpu.models import VAEGAMConfig, init_model

    config = VAEGAMConfig(nf=nf)
    params, consts = init_model(
        jax.random.PRNGKey(seed), config, [[-2.0, 2.0]] * 6, None
    )
    return config, params, consts


def test_layer_state_round_trip():
    """export_layer_state is the exact inverse of port_layer_state."""
    from vaegam_tpu.utils.torch_export import export_layer_state
    from vaegam_tpu.utils.torch_port import port_layer_state

    _, params, _ = _init_params()
    exported = export_layer_state(params, nf=8)
    back = port_layer_state(exported, nf=8)
    for part in ("enc", "dec"):
        for layer, tree in params[part].items():
            for k, v in tree.items():
                np.testing.assert_array_equal(
                    np.asarray(v), np.asarray(back[part][layer][k]),
                    err_msg=f"{part}.{layer}.{k}",
                )


def test_gp_round_trip():
    """export_gp_params is the exact inverse of port_gp_params."""
    from vaegam_tpu.utils.torch_export import export_gp_params
    from vaegam_tpu.utils.torch_port import port_gp_params

    _, params, consts = _init_params()
    exported = export_gp_params(params["gp"], consts["xu"])
    gp_back, xu_back = port_gp_params(exported)
    for k, v in params["gp"].items():
        np.testing.assert_array_equal(
            np.asarray(v), np.asarray(gp_back[k]), err_msg=f"gp.{k}"
        )
    np.testing.assert_array_equal(np.asarray(consts["xu"]),
                                  np.asarray(xu_back))


def test_gp_export_materializes_cholesky():
    """A qu_S_raw (Cholesky) bank exports the dense PSD qu_S = L L^T."""
    import jax

    from vaegam_tpu.models import VAEGAMConfig, init_model
    from vaegam_tpu.models.vaegam import resolve_qu_S
    from vaegam_tpu.utils.torch_export import export_gp_params

    config = VAEGAMConfig(qu_s_cholesky=True)
    params, consts = init_model(
        jax.random.PRNGKey(1), config, [[-2.0, 2.0]] * 6, None
    )
    assert "qu_S_raw" in params["gp"] and "qu_S" not in params["gp"]
    dense = np.asarray(resolve_qu_S(params["gp"]))
    exported = export_gp_params(params["gp"], consts["xu"])
    for j, cov in enumerate(("x", "y", "z", "xrot", "yrot", "zrot")):
        np.testing.assert_allclose(exported[cov]["qu_S"], dense[j],
                                   rtol=1e-6, err_msg=cov)
        # PSD by construction
        w = np.linalg.eigvalsh(exported[cov]["qu_S"])
        assert w.min() >= -1e-6


def test_export_cli_writes_reference_loadable_tar(tmp_path):
    """CLI output: torch.load(weights_only=True)-safe, reference key set,
    fresh Adam state with the reference's parameter count."""
    torch = pytest.importorskip("torch")
    import optax

    from vaegam_tpu.cli.export_torch_ckpt import convert
    from vaegam_tpu.models.vaegam import hrf_kernel
    from vaegam_tpu.train.checkpoint import save_checkpoint

    _, params, consts = _init_params()
    ours = str(tmp_path / "checkpoint_007.tar")
    save_checkpoint(
        ours, params, optax.adam(1e-3).init(params),
        epoch=7, loss={"train": {0: np.float32(1.5)}, "test": {}},
        z_dim=32 + 9, lr=1e-3, save_dir=str(tmp_path),
        glm_reg_scale=1.0, gp_kl_scale=10.0, inducing_pts=6,
        consts={"xu": np.asarray(consts["xu"]),
                "hrf": np.asarray(hrf_kernel()), "glm_maps": None},
    )
    out = str(tmp_path / "exported.tar")
    convert(ours, out)

    # the reference's load_state calls torch.load with default args —
    # weights_only=True on modern torch; this load failing = contract broken
    state = torch.load(out)
    layer_names = [
        "fc1", "fc2", "fc31", "fc32", "fc33", "fc41", "fc42", "fc43",
        "fc5", "fc6", "fc7", "fc8", "bn1", "bn3", "bn5", "bnt1", "bnt3",
        "bnt5", "conv1", "conv2", "conv3", "conv4", "conv5",
        "convt1", "convt2", "convt3", "convt4", "convt5",
    ]
    for name in layer_names:
        assert name in state, name
    assert state["epsilon"].dtype == torch.float64
    assert state["epoch"] == 7 and state["z_dim"] == 41
    assert state["loss"]["train"][0] == pytest.approx(1.5)
    # vae_reg_GP.VAE with nf=8, P=6: 56 layer tensors + epsilon + 40 GP
    n = len(state["optimizer_state"]["param_groups"][0]["params"])
    assert n == 97
    assert state["optimizer_state"]["state"] == {}
    # gp_params: nn.Parameters with the reference's exact shapes
    gp = state["gp_params"]
    assert isinstance(gp["task"]["sa"], torch.nn.Parameter)
    assert tuple(gp["task"]["sa"].shape) == (1, 1)
    assert tuple(gp["x"]["qu_m"].shape) == (1, 6)
    assert tuple(gp["x"]["qu_S"].shape) == (6, 6)
    assert gp["x"]["logkvar"].shape == () and gp["x"]["log_ls"].shape == ()
    assert tuple(gp["x"]["xu"].shape) == (6,)
    assert "xu" not in gp["task"] and "xu" not in gp["sex"]


def test_export_import_full_circle(tmp_path):
    """ours -> export CLI -> import CLI -> identical param pytree."""
    pytest.importorskip("torch")
    import jax
    import optax

    from vaegam_tpu.cli.export_torch_ckpt import convert as export
    from vaegam_tpu.cli.import_torch_ckpt import convert as import_
    from vaegam_tpu.models.vaegam import hrf_kernel
    from vaegam_tpu.train.checkpoint import load_checkpoint, save_checkpoint

    _, params, consts = _init_params(seed=3)
    ours = str(tmp_path / "a.tar")
    save_checkpoint(
        ours, params, optax.adam(1e-3).init(params),
        epoch=2, loss={"train": {}, "test": {}}, z_dim=41, lr=1e-3,
        save_dir=str(tmp_path), glm_reg_scale=0.0, gp_kl_scale=10.0,
        inducing_pts=6,
        consts={"xu": np.asarray(consts["xu"]),
                "hrf": np.asarray(hrf_kernel()), "glm_maps": None},
    )
    exported = str(tmp_path / "b.tar")
    export(ours, exported)
    back = str(tmp_path / "c.tar")
    import_(exported, back, nf=8)

    orig, circ = params, load_checkpoint(back)["params"]
    flat_o, _ = jax.tree_util.tree_flatten_with_path(orig)
    flat_c = {jax.tree_util.keystr(k): v
              for k, v in jax.tree_util.tree_flatten_with_path(circ)[0]}
    for path, v in flat_o:
        key = jax.tree_util.keystr(path)
        np.testing.assert_array_equal(
            np.asarray(v), np.asarray(flat_c[key]), err_msg=key
        )
