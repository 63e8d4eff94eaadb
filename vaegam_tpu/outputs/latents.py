"""Latent-space 2D projection plot (reference vae_reg_GP.py:542-583).

Encodes the full UnShuffled_train set (posterior means only), projects to
2D, and scatters per-subject chunks of ``split`` volumes.

Projection backend chain:

  1. umap-learn if installed — UMAP(n_components=2, n_neighbors=20,
     min_dist=0.1, random_state=42), the reference's exact settings;
  2. the native UMAP implementation (outputs/umap_native.py) — the same
     published algorithm (fuzzy simplicial set, a/b curve fit, spectral
     init, cross-entropy SGD layout) with the same settings, the layout
     optimizer jitted as one lax.fori_loop; this is the production path
     in this environment (umap-learn is not installable here);
  3. sklearn SpectralEmbedding on the same n_neighbors=20 kNN graph
     (UMAP's own initialization) if the native optimizer fails;
  4. PCA as the last-resort linear fallback (tiny inputs where a kNN
     graph is degenerate).
"""

from __future__ import annotations

import itertools
import os

import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

import jax  # noqa: E402

from ..models.networks import encode  # noqa: E402


def _project_2d(latent: np.ndarray) -> np.ndarray:
    try:
        from umap import UMAP

        transform = UMAP(
            n_components=2, n_neighbors=20, min_dist=0.1,
            metric="euclidean", random_state=42,
        )
        return transform.fit_transform(latent)
    except ImportError:
        pass
    if len(latent) > 25:
        try:
            from .umap_native import umap_embed

            out = umap_embed(latent, n_neighbors=min(20, len(latent) - 2),
                             min_dist=0.1, seed=42)
            if np.all(np.isfinite(out)):
                return out
        except Exception:
            pass  # fall through to the spectral stand-in
        # UMAP's own initialization: spectral embedding of the kNN graph,
        # with the reference's neighborhood size
        try:
            from sklearn.manifold import SpectralEmbedding

            emb = SpectralEmbedding(
                n_components=2, n_neighbors=min(20, len(latent) - 1),
                random_state=42,
            )
            out = emb.fit_transform(latent)
            if np.all(np.isfinite(out)):
                return out
        except Exception:
            pass  # degenerate graph -> linear fallback below
    from sklearn.decomposition import PCA

    return PCA(n_components=2, random_state=42).fit_transform(latent)


def project_latent(trainer, loaders_dict, save_dir, title=None, split=98):
    filename = str(trainer.epoch).zfill(3) + "_temp.pdf"
    file_path = os.path.join(save_dir, filename)

    nf = trainer.config.nf
    repl = getattr(trainer, "_replicated", None)

    def _enc(p, x):
        mu = encode(p, x, nf)[0]
        if repl is not None:
            # multi-process: the host-side UMAP below needs the full latent
            # set on every controller
            mu = jax.lax.with_sharding_constraint(mu, repl)
        return mu

    enc = jax.jit(_enc)
    chunks = []
    for sample in loaders_dict["UnShuffled_train"]:
        _, x = trainer._put_batch(sample)
        chunks.append(np.asarray(enc(trainer.params["enc"], x)))
    latent = np.concatenate(chunks, axis=0)

    from ..parallel import is_main_process

    if not is_main_process():
        # the jitted encode above is collective (every controller must
        # participate), but the host-side projection + plot are main-only:
        # a non-main process would burn the full kNN + SGD layout for a
        # result nobody reads
        return latent, None
    projection = _project_2d(latent)

    c_list = ["b", "g", "r", "c", "m", "y", "k", "orange", "blueviolet",
              "hotpink", "lime", "skyblue", "teal", "sienna"]
    colors = itertools.cycle(c_list)
    plt.clf()
    for i in range(0, len(latent), split):
        plt.scatter(projection[i:i + split, 0], projection[i:i + split, 1],
                    color=next(colors), s=1.0, alpha=0.6)
        plt.axis("off")
    if title is not None:
        plt.title(title)
    plt.savefig(file_path)
    return latent, projection
