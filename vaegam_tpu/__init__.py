"""vaegam_tpu — a TPU-native (JAX/XLA/pjit/Pallas) VAE-GAM framework for task-based fMRI.

Re-implements, TPU-first, the full capability surface of the PyTorch VAE-GAM
reference (dannyfa/VAE-GAM): preprocessing CSV construction, synthetic
control-signal injection, GLM beta-map regularizer construction, the 3D-conv
VAE + GAM decoder with sparse inducing-point 1D GP gain functions, HRF
convolution of neural covariates, the composite ELBO, training with
checkpoint/resume, TensorBoard observability, and all post-hoc outputs
(latent plots, GP posterior plots/CSVs, per-volume and averaged NIfTI maps).

Design notes (TPU-first, not a port):
  * pure functions over parameter pytrees; one jit-compiled train step
  * the 9 decoder passes of the reference run as ONE batched decode (9B batch)
  * the 6 motion-covariate GP posteriors are vmapped, grams built vectorized
    and solved with Cholesky (no torch.inverse, no python loops)
  * data-parallel scale-out over a jax.sharding.Mesh('data') — batch sharded,
    params replicated, gradient reduction via XLA collectives
  * host-side I/O (NIfTI/CSV/matplotlib) strictly outside jit
"""

__version__ = "0.1.0"

IMG_SHAPE = (41, 49, 35)
IMG_DIM = 41 * 49 * 35  # 70315
