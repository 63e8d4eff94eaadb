"""Data-parallel correctness: sharded training must match single-device."""

import numpy as np
import pytest

import jax

from e2e_helpers import make_design_csv, make_subject_tree
from vaegam_tpu.data import setup_data_loaders
from vaegam_tpu.models import VAEGAMConfig
from vaegam_tpu.parallel import make_data_mesh
from vaegam_tpu.train import Trainer
from vaegam_tpu.utils.stats import get_xu_ranges


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("subjects"))
    make_subject_tree(root, n_subjs=1, n_vols=8)
    train = make_design_csv(
        root, str(tmp_path_factory.mktemp("csvs") / "train.csv")
    )
    loaders = setup_data_loaders(batch_size=8, train_csv=train, test_csv=train)
    xu_ranges = get_xu_ranges([train, train])
    return loaders, xu_ranges


def test_eight_virtual_devices_present():
    assert len(jax.devices()) == 8  # conftest forces the virtual CPU mesh


def test_dp_loss_matches_single_device(setup, tmp_path):
    loaders, xu_ranges = setup
    config = VAEGAMConfig(nf=2, num_latents=8)
    mesh = make_data_mesh()

    t_single = Trainer(config, xu_ranges, glm_maps=None,
                       save_dir=str(tmp_path / "s"), seed=3, enable_tb=False)
    t_dp = Trainer(config, xu_ranges, glm_maps=None,
                   save_dir=str(tmp_path / "d"), seed=3, mesh=mesh,
                   enable_tb=False)

    batch = next(iter(loaders["UnShuffled_train"]))
    key = jax.random.PRNGKey(11)

    covs_s, x_s = t_single._put_batch(batch)
    covs_d, x_d = t_dp._put_batch(batch)
    assert covs_d.sharding.spec == jax.sharding.PartitionSpec("data")

    loss_s, _ = t_single._eval_step(t_single.params, key, covs_s, x_s)
    loss_d, _ = t_dp._eval_step(t_dp.params, key, covs_d, x_d)
    np.testing.assert_allclose(
        np.asarray(loss_s), np.asarray(loss_d), rtol=2e-5
    )


def test_dp_training_step_matches_single_device(setup, tmp_path):
    loaders, xu_ranges = setup
    config = VAEGAMConfig(nf=2, num_latents=8)
    mesh = make_data_mesh()

    t_single = Trainer(config, xu_ranges, glm_maps=None,
                       save_dir=str(tmp_path / "s2"), seed=5, enable_tb=False)
    t_dp = Trainer(config, xu_ranges, glm_maps=None,
                   save_dir=str(tmp_path / "d2"), seed=5, mesh=mesh,
                   enable_tb=False)

    batch = next(iter(loaders["UnShuffled_train"]))
    key = jax.random.PRNGKey(17)

    # compare GRADIENTS (the quantity data parallelism actually reduces);
    # post-Adam params are too sensitive: the first Adam step normalizes
    # each grad to ~lr, amplifying reduction-order noise on tiny grads.
    from vaegam_tpu.models import forward

    def grads_of(trainer, covs, x):
        def loss_fn(p):
            return forward(p, trainer.consts, key, covs, x, trainer.config)[0]

        return jax.jit(jax.value_and_grad(loss_fn))(trainer.params)

    covs_s, x_s = t_single._put_batch(batch)
    loss_s, g_s = grads_of(t_single, covs_s, x_s)
    covs_d, x_d = t_dp._put_batch(batch)
    loss_d, g_d = grads_of(t_dp, covs_d, x_d)

    np.testing.assert_allclose(np.asarray(loss_s), np.asarray(loss_d), rtol=2e-5)
    for a, b in zip(jax.tree_util.tree_leaves(g_s),
                    jax.tree_util.tree_leaves(g_d)):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(a).max(), np.abs(b).max(), 1e-3)
        np.testing.assert_allclose(a / scale, b / scale, atol=2e-4)
