"""Trainer integration tests: loss decreases, checkpoint round-trips."""

import os

import numpy as np
import pytest

import jax

from e2e_helpers import (SMALL_SHAPE, make_design_csv,
                         make_subject_tree)
from vaegam_tpu.data import setup_data_loaders
from vaegam_tpu.models import VAEGAMConfig
from vaegam_tpu.train import Trainer, checkpoint_filename
from vaegam_tpu.utils.stats import get_xu_ranges


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("subjects"))
    make_subject_tree(root, n_subjs=1, n_vols=8,
                      img_shape=SMALL_SHAPE)
    csv_dir = tmp_path_factory.mktemp("csvs")
    train = make_design_csv(root, str(csv_dir / "train.csv"))
    loaders = setup_data_loaders(batch_size=4, train_csv=train, test_csv=train)
    xu_ranges = get_xu_ranges([train, train])
    return train, loaders, xu_ranges


def test_short_training_decreases_loss(setup, tmp_path):
    _, loaders, xu_ranges = setup
    config = VAEGAMConfig(nf=2, num_latents=8, img_shape=SMALL_SHAPE)
    trainer = Trainer(config, xu_ranges, glm_maps=None,
                      save_dir=str(tmp_path), enable_tb=False)
    # deterministic before/after comparison: same fixed key, same batch
    batch = next(iter(loaders["UnShuffled_train"]))
    covs, x = trainer._put_batch(batch)
    fixed_key = jax.random.PRNGKey(42)
    before = float(trainer._eval_step(trainer.params, fixed_key, covs, x)[0])
    losses = [trainer.train_epoch(loaders["Shuffled_train"]) for _ in range(5)]
    after = float(trainer._eval_step(trainer.params, fixed_key, covs, x)[0])
    assert all(np.isfinite(l) for l in losses)
    assert after < before
    assert trainer.epoch == 5
    assert trainer.check_gp_stability()


def test_train_loop_checkpoints_and_tests(setup, tmp_path):
    _, loaders, xu_ranges = setup
    config = VAEGAMConfig(nf=2, num_latents=8, img_shape=SMALL_SHAPE)
    trainer = Trainer(config, xu_ranges, glm_maps=None,
                      save_dir=str(tmp_path), enable_tb=False)
    trainer.train_loop(loaders, epochs=3, test_freq=2, save_freq=2,
                       save_dir=str(tmp_path))
    assert os.path.exists(tmp_path / checkpoint_filename(2))
    assert 2 in trainer.loss["test"] and 0 in trainer.loss["test"]
    assert set(trainer.loss["train"]) == {0, 1, 2}


def test_checkpoint_resume_bitwise(setup, tmp_path):
    """save -> load must restore params, opt state, epoch, and produce the
    exact same subsequent training trajectory."""
    _, loaders, xu_ranges = setup
    config = VAEGAMConfig(nf=2, num_latents=8, img_shape=SMALL_SHAPE)
    t1 = Trainer(config, xu_ranges, glm_maps=None,
                 save_dir=str(tmp_path), seed=7, enable_tb=False)
    t1.train_epoch(loaders["Shuffled_train"])
    ckpt = str(tmp_path / checkpoint_filename(1))
    t1.save_state(ckpt)

    t2 = Trainer(config, xu_ranges, glm_maps=None,
                 save_dir=str(tmp_path), seed=7, enable_tb=False)
    t2.load_state(ckpt)
    assert t2.epoch == 1
    for a, b in zip(jax.tree_util.tree_leaves(t1.params),
                    jax.tree_util.tree_leaves(t2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(t1.opt_state),
                    jax.tree_util.tree_leaves(t2.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # same data order (unshuffled loader) + same PRNG stream after resume
    # is not guaranteed (t1's key advanced), so compare eval losses instead
    batch = next(iter(loaders["UnShuffled_train"]))
    key = jax.random.PRNGKey(0)
    covs1, x1 = t1._put_batch(batch)
    l1, _ = t1._eval_step(t1.params, key, covs1, x1)
    l2, _ = t2._eval_step(t2.params, key, covs1, x1)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), rtol=1e-6)


def test_z_dim_mismatch_rejected(setup, tmp_path):
    _, loaders, xu_ranges = setup
    t1 = Trainer(VAEGAMConfig(), xu_ranges, glm_maps=None,
                 save_dir=str(tmp_path), enable_tb=False)
    ckpt = str(tmp_path / "c.tar")
    t1.save_state(ckpt)
    t2 = Trainer(VAEGAMConfig(num_latents=16), xu_ranges, glm_maps=None,
                 save_dir=str(tmp_path), enable_tb=False)
    with pytest.raises(AssertionError):
        t2.load_state(ckpt)


def test_load_state_adopts_checkpoint_scalars(setup, tmp_path, capsys):
    """Resume with different CLI scales must adopt the checkpoint's scalars
    (reference restores them, vae_reg_GP.py:477-487) and say so."""
    _, loaders, xu_ranges = setup
    config = VAEGAMConfig(nf=2, num_latents=8, img_shape=SMALL_SHAPE,
                          gp_kl_scale=10.0, glm_reg_scale=1.0)
    t1 = Trainer(config, xu_ranges, glm_maps=None, lr=1e-3,
                 save_dir=str(tmp_path), seed=3, enable_tb=False)
    ckpt = str(tmp_path / "scalars.tar")
    t1.save_state(ckpt)

    # resume with mismatching scales + lr: checkpoint wins
    config2 = VAEGAMConfig(nf=2, num_latents=8, img_shape=SMALL_SHAPE,
                           gp_kl_scale=99.0, glm_reg_scale=7.0)
    t2 = Trainer(config2, xu_ranges, glm_maps=None, lr=5e-4,
                 save_dir=str(tmp_path), seed=3, enable_tb=False)
    t2.load_state(ckpt)
    out = capsys.readouterr().out
    assert "adopting checkpoint" in out
    assert t2.config.gp_kl_scale == 10.0
    assert t2.config.glm_reg_scale == 1.0
    assert t2.lr == 1e-3

    # matching scales: silent, config untouched
    t3 = Trainer(config, xu_ranges, glm_maps=None, lr=1e-3,
                 save_dir=str(tmp_path), seed=3, enable_tb=False)
    capsys.readouterr()
    t3.load_state(ckpt)
    assert "adopting" not in capsys.readouterr().out


def test_fused_epoch_periodic_figure_logging(setup, tmp_path):
    """Sampled per-batch TB figures (reference: EVERY batch,
    vae_reg_GP.py:333-337) work on the gather-fused fast path: figure
    batches are re-gathered with the loader's jitted gather while the
    train steps stay single-dispatch."""
    train, _, xu_ranges = setup
    from vaegam_tpu.data import setup_device_loaders

    loaders = setup_device_loaders(batch_size=4, train_csv=train,
                                   test_csv=train)
    config = VAEGAMConfig(nf=2, num_latents=8, img_shape=SMALL_SHAPE)
    trainer = Trainer(config, xu_ranges, glm_maps=None,
                      save_dir=str(tmp_path), enable_tb=True,
                      log_figs_every=2)
    assert trainer._figs_enabled
    trainer.train_loop(loaders, epochs=1, test_freq=None, save_freq=None,
                       save_dir=str(tmp_path))
    run_dir = os.path.join(str(tmp_path), "run")
    events = [os.path.join(dp, f) for dp, _, fns in os.walk(run_dir)
              for f in fns if "tfevents" in f]
    assert events, "no TB event files written"
    # the map/beta figure tags landed (not just scalars)
    from tensorboard.backend.event_processing.event_accumulator import (
        EventAccumulator,
    )
    acc = EventAccumulator(os.path.dirname(events[0]))
    acc.Reload()
    tags = acc.Tags()
    figure_tags = tags["images"] + [t.rsplit("/", 1)[0]
                                    for t in tags["tensors"]]
    assert any("map" in t or "Beta" in t or "base" in t
               for t in figure_tags), tags


def test_fused_step_restores_fp32_from_bf16_cache(setup, tmp_path):
    """The gather-fused train step indexes the RAW HBM cache array, which
    may be stored bfloat16 (cache_dtype="bfloat16"); it must cast the
    gathered volumes back to float32 exactly like the loader's own jitted
    gather does.  Regression: the fused step previously fed bf16 volumes
    straight into the forward, silently shifting numerics vs the plain
    (loader-fed) step on the same cache."""
    import jax.numpy as jnp

    from vaegam_tpu.data.device_cache import DeviceResidentLoader

    _, loaders, xu_ranges = setup
    config = VAEGAMConfig(nf=2, num_latents=8, img_shape=SMALL_SHAPE)
    batch = next(iter(loaders["UnShuffled_train"]))
    vols = np.asarray(batch["volume"], np.float32)
    covs = np.asarray(batch["covariates"], np.float32)
    loader = DeviceResidentLoader.from_arrays(vols, covs, batch_size=4,
                                              cache_dtype="bfloat16")
    assert loader._vols.dtype == jnp.bfloat16

    key = jax.random.PRNGKey(7)
    _, sub = jax.random.split(key)  # the key the fused step derives
    sel = np.arange(4)
    t1 = Trainer(config, xu_ranges, glm_maps=None, save_dir=str(tmp_path),
                 enable_tb=False, seed=3)
    t2 = Trainer(config, xu_ranges, glm_maps=None, save_dir=str(tmp_path),
                 enable_tb=False, seed=3)
    _, _, _, loss_fused, _ = t1._gather_train_step(
        t1.params, t1.opt_state, key, loader._vols, loader._covs, sel
    )
    xg, cg = loader._gather(loader._vols, loader._covs, sel)
    assert xg.dtype == jnp.float32
    _, _, loss_plain, _ = t2._train_step(t2.params, t2.opt_state, sub, cg, xg)
    np.testing.assert_allclose(float(loss_fused), float(loss_plain),
                               rtol=1e-6)


@pytest.mark.slow
def test_x64_epsilon_mode(setup, tmp_path):
    """Opt-in fp64 epsilon (reference vae_reg_GP.py:54): storage/Adam in
    float64, log-likelihood cast down to fp32 (its .float(), :402).
    Subprocess: jax x64 is a global switch that must not leak into the
    suite.  Marked slow: the x64 variant is a distinct compile-cache key,
    so the subprocess cold-compiles the full fwd/bwd (minutes, 1 core)."""
    import subprocess
    import sys
    import textwrap

    train, _, _ = setup
    code = textwrap.dedent(f"""
        import jax
        # platform pin first: with the TPU tunnel down, device init
        # otherwise hangs on the axon platform despite JAX_PLATFORMS=cpu
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)
        import jax.numpy as jnp
        import numpy as np
        from vaegam_tpu.data import setup_data_loaders
        from vaegam_tpu.models import VAEGAMConfig
        from vaegam_tpu.train import Trainer
        from vaegam_tpu.utils.stats import get_xu_ranges

        loaders = setup_data_loaders(batch_size=4, train_csv={train!r},
                                     test_csv={train!r})
        config = VAEGAMConfig(nf=2, num_latents=8, x64_epsilon=True,
                             img_shape=(21, 25, 21))
        t = Trainer(config, get_xu_ranges([{train!r}] * 2), glm_maps=None,
                    save_dir={str(tmp_path)!r}, enable_tb=False)
        assert t.params["epsilon"].dtype == jnp.float64, t.params["epsilon"].dtype
        assert t.params["enc"]["conv1"]["w"].dtype == jnp.float32
        loss = t.train_epoch(loaders["Shuffled_train"])
        assert np.isfinite(loss), loss
        # Adam kept epsilon (and its moments) in fp64 through the update
        assert t.params["epsilon"].dtype == jnp.float64
        print("X64_OK")
    """)
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, timeout=1800, env=env,
                         cwd=os.path.dirname(os.path.dirname(__file__)))
    assert out.returncode == 0, out.stdout + out.stderr
    assert "X64_OK" in out.stdout


def test_recon_wire_dtype_float16(setup, tmp_path):
    """Opt-in f16 device->host wire for the recon maps: the jitted maps
    step emits float16 maps within f16 RELATIVE quantization (2^-11) of
    the fp32 path, and the written recon files stay float32 on disk."""
    import jax.numpy as jnp

    from vaegam_tpu.outputs import mk_single_volumes
    from vaegam_tpu.utils import nifti

    train, loaders, xu_ranges = setup
    config = VAEGAMConfig(nf=2, num_latents=8, img_shape=SMALL_SHAPE)
    kw = dict(glm_maps=None, save_dir=str(tmp_path), seed=3, enable_tb=False)
    t32 = Trainer(config, xu_ranges, **kw)
    t16 = Trainer(config, xu_ranges, recon_wire_dtype="float16", **kw)

    batch = next(iter(loaders["UnShuffled_train"]))
    covs, x = t32._put_batch(batch)
    _, aux32 = t32._recon_maps_step()(t32.params, t32._next_key(), covs, x)
    _, aux16 = t16._recon_maps_step()(t16.params, t16._next_key(), covs, x)
    assert aux16["maps"]["task"].dtype == jnp.float16
    # the wire is scoped to the RECON stage: the training-time figure path
    # (_maps_step, used by _log_batch_figures) stays full precision
    _, aux_figs = t16._maps_step(t16.params, t16._next_key(), covs, x)
    assert aux_figs["maps"]["task"].dtype == jnp.float32
    t32._next_key()  # keep the two trainers' PRNG streams aligned for the
    # mk_single_volumes file comparison below (maps depend on sampled z)
    for key in aux32["maps"]:
        np.testing.assert_allclose(
            np.asarray(aux32["maps"][key], np.float32),
            np.asarray(aux16["maps"][key], np.float32),
            rtol=1.5e-3, atol=1e-3,  # f16: 2^-11 relative quantization
        )

    out32, out16 = str(tmp_path / "w32"), str(tmp_path / "w16")
    mk_single_volumes(loaders["UnShuffled_train"], t32, train, out32)
    mk_single_volumes(loaders["UnShuffled_train"], t16, train, out16)
    rel = f"reconstructions/{str(t32.epoch).zfill(3)}_model_recons"
    import glob as _glob
    files32 = sorted(_glob.glob(os.path.join(out32, rel, "*", "*", "*.nii")))
    assert files32
    for f32 in files32[:12]:
        f16 = f32.replace(out32, out16)
        a = np.asarray(nifti.load(f32).dataobj)
        b = np.asarray(nifti.load(f16).dataobj)
        assert b.dtype == np.float32  # files stay fp32 on disk
        np.testing.assert_allclose(a, b, rtol=1.5e-3, atol=1e-3)

    with pytest.raises(ValueError):
        Trainer(config, xu_ranges, recon_wire_dtype="int8", **kw)


def test_resume_trajectory_matches_unbroken(setup, tmp_path):
    """Trajectory-exact resume: with the checkpointed PRNG chain and the
    loaders' epoch-addressed shuffle, a run broken by save+load reproduces
    the unbroken run's later epochs bitwise."""
    _, loaders, xu_ranges = setup
    config = VAEGAMConfig(nf=2, num_latents=8, img_shape=SMALL_SHAPE)

    tu = Trainer(config, xu_ranges, glm_maps=None,
                 save_dir=str(tmp_path / "u"), seed=3, enable_tb=False)
    unbroken = [tu.train_epoch(loaders["Shuffled_train"]) for _ in range(4)]

    ta = Trainer(config, xu_ranges, glm_maps=None,
                 save_dir=str(tmp_path / "a"), seed=3, enable_tb=False)
    first = [ta.train_epoch(loaders["Shuffled_train"]) for _ in range(2)]
    ckpt = str(tmp_path / "a" / checkpoint_filename(2))
    ta.save_state(ckpt)

    tb2 = Trainer(config, xu_ranges, glm_maps=None,
                  save_dir=str(tmp_path / "b"), seed=3, enable_tb=False)
    tb2.load_state(ckpt)
    assert tb2.epoch == 2
    resumed = [tb2.train_epoch(loaders["Shuffled_train"]) for _ in range(2)]

    np.testing.assert_array_equal(np.asarray(first + resumed),
                                  np.asarray(unbroken))


def test_epoch_scan_segment_matches_per_step(setup, tmp_path):
    """One scan segment = the same steps dispatched one by one: same
    key-split chain, same optax threading, per-step losses equal to
    compile tolerance (the scan is a separately compiled executable, so
    bitwise equality is NOT guaranteed — the reason the knob is opt-in)."""
    from vaegam_tpu.data.device_cache import DeviceResidentLoader

    _, _, xu_ranges = setup
    config = VAEGAMConfig(nf=2, num_latents=8, img_shape=SMALL_SHAPE)
    rng = np.random.default_rng(5)
    vols = rng.uniform(0, 1, size=(8,) + SMALL_SHAPE).astype(np.float32)
    covs = rng.normal(size=(8, config.num_covariates)).astype(np.float32)
    loader = DeviceResidentLoader.from_arrays(vols, covs, batch_size=4)

    t1 = Trainer(config, xu_ranges, glm_maps=None, enable_tb=False, seed=3)
    t2 = Trainer(config, xu_ranges, glm_maps=None, enable_tb=False, seed=3)
    sels = [np.arange(4), np.arange(4, 8)]

    p, o, k = t1.params, t1.opt_state, jax.random.PRNGKey(11)
    per_step = []
    for sel in sels:
        p, o, k, l, _ = t1._gather_train_step(
            p, o, k, loader._vols, loader._covs, sel
        )
        per_step.append(float(l))

    p2, o2, k2, seg, _ = t2._gather_train_scan(
        t2.params, t2.opt_state, jax.random.PRNGKey(11),
        loader._vols, loader._covs, np.stack(sels),
    )
    np.testing.assert_allclose(np.asarray(seg), per_step, rtol=1e-6)
    # identical key chain
    np.testing.assert_array_equal(np.asarray(k), np.asarray(k2))
    # params agree to Adam-amplified compile tolerance after 2 steps
    fa, _ = jax.tree_util.tree_flatten(
        jax.tree_util.tree_map(np.asarray, p))
    fb, _ = jax.tree_util.tree_flatten(
        jax.tree_util.tree_map(np.asarray, p2))
    for a, b in zip(fa, fb):
        np.testing.assert_allclose(a, b, atol=5e-3)


def test_epoch_scan_dispatch_structure(setup, tmp_path):
    """Segmentation: uniform non-figure runs go through ONE scan dispatch;
    figure batches and the ragged tail dispatch singly, in order, with
    every step executed exactly once and the epoch loss counting all of
    them."""
    from vaegam_tpu.data.device_cache import DeviceResidentLoader

    _, _, xu_ranges = setup
    config = VAEGAMConfig(nf=2, num_latents=8, img_shape=SMALL_SHAPE)
    rng = np.random.default_rng(6)
    vols = rng.uniform(0, 1, size=(10,) + SMALL_SHAPE).astype(np.float32)
    covs = rng.normal(size=(10, config.num_covariates)).astype(np.float32)
    loader = DeviceResidentLoader.from_arrays(vols, covs, batch_size=4)

    t = Trainer(config, xu_ranges, glm_maps=None, enable_tb=False, seed=3,
                epoch_scan=True)
    calls = []
    scan, step = t._gather_train_scan, t._gather_train_step

    def spy_scan(p, o, k, v, c, idx_mat):
        calls.append(("scan", idx_mat.shape))
        return scan(p, o, k, v, c, idx_mat)

    def spy_step(p, o, k, v, c, sel):
        calls.append(("step", len(sel)))
        return step(p, o, k, v, c, sel)

    t._gather_train_scan, t._gather_train_step = spy_scan, spy_step
    loss = t.train_epoch(loader)
    # 10 samples / batch 4 -> [4,4] scanned together + ragged [2] single
    assert calls == [("scan", (2, 4)), ("step", 2)]
    assert np.isfinite(loss)
    assert t.epoch == 1

    # with figure logging at every 2nd batch, batch 0 and 2 dispatch
    # singly (figure batches) and batch 1 is a length-1 "segment" -> single
    calls.clear()
    t.log_figs_every = 2
    t._figs_enabled = True
    t._log_batch_figures = lambda *a, **kw: None
    t.train_epoch(loader)
    assert calls == [("step", 4), ("step", 4), ("step", 2)]
