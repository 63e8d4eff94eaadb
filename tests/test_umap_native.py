"""Native UMAP (outputs/umap_native.py) — algorithm-level checks.

The reference's latent plot uses umap-learn with n_neighbors=20,
min_dist=0.1, random_state=42 (vae_reg_GP.py:556-559); umap-learn is
absent in this environment, so these tests validate the from-scratch
implementation that substitutes for it.
"""

import numpy as np
import pytest

from vaegam_tpu.outputs import umap_native as un


def _two_clusters(n_per=60, dim=32, sep=8.0, seed=0):
    rng = np.random.default_rng(seed)
    a = rng.normal(size=(n_per, dim))
    b = rng.normal(size=(n_per, dim))
    b[:, 0] += sep
    x = np.concatenate([a, b], axis=0)
    labels = np.concatenate([np.zeros(n_per), np.ones(n_per)])
    return x, labels


def test_knn_graph_exact():
    x = np.array([[0.0], [1.0], [3.0], [7.0]])
    idx, d = un.knn_graph(x, 2)
    # self first, then true nearest
    assert list(idx[:, 0]) == [0, 1, 2, 3]
    assert list(idx[:, 1]) == [1, 0, 1, 2]
    np.testing.assert_allclose(d[:, 0], 0.0, atol=1e-12)
    np.testing.assert_allclose(d[:, 1], [1.0, 1.0, 2.0, 4.0])


def test_smooth_knn_dist_hits_target():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(200, 8))
    _, d = un.knn_graph(x, 15)
    rho, sigma = un.smooth_knn_dist(d)
    # the binary-search invariant over the NON-SELF neighbors (column 0
    # is the self neighbor, skipped exactly like umap-learn's
    # ``for j in range(1, k)``): sum exp(-(d-rho)+/sigma) = log2(k)
    psum = np.sum(np.exp(-np.maximum(d[:, 1:] - rho[:, None], 0.0)
                         / sigma[:, None]), axis=1)
    np.testing.assert_allclose(psum, np.log2(15), atol=1e-3)
    assert np.all(sigma > 0)
    # rho is the first non-self neighbor distance
    np.testing.assert_allclose(rho, d[:, 1])


def test_fuzzy_set_symmetric_and_bounded():
    rng = np.random.default_rng(2)
    x = rng.normal(size=(80, 5))
    h, t, w = un.fuzzy_simplicial_set(x, 10)
    assert np.all((w > 0) & (w <= 1.0 + 1e-9))
    assert np.all(h != t)
    # fuzzy union is symmetric: every (i,j) edge has a (j,i) twin of
    # equal weight
    lookup = {(int(a), int(b)): float(v) for a, b, v in zip(h, t, w)}
    for (i, j), v in lookup.items():
        assert (j, i) in lookup
        assert abs(lookup[(j, i)] - v) < 1e-12


def test_find_ab_params_reference_values():
    # umap-learn's fit for spread=1.0, min_dist=0.1 is a~1.577, b~0.895
    a, b = un.find_ab_params(1.0, 0.1)
    assert abs(a - 1.577) < 0.03
    assert abs(b - 0.8951) < 0.01


def test_epochs_per_sample_schedule():
    eps = un.make_epochs_per_sample(np.array([1.0, 0.5, 0.25]), 500)
    np.testing.assert_allclose(eps, [1.0, 2.0, 4.0])


def test_embedding_separates_clusters_and_is_deterministic():
    x, labels = _two_clusters()
    e1 = un.umap_embed(x, n_neighbors=15, n_epochs=200, seed=42)
    e2 = un.umap_embed(x, n_neighbors=15, n_epochs=200, seed=42)
    np.testing.assert_allclose(e1, e2)  # fixed seed -> same layout
    assert e1.shape == (len(x), 2)
    assert np.all(np.isfinite(e1))
    ca, cb = e1[labels == 0], e1[labels == 1]
    gap = np.linalg.norm(ca.mean(0) - cb.mean(0))
    spread = max(np.linalg.norm(ca - ca.mean(0), axis=1).mean(),
                 np.linalg.norm(cb - cb.mean(0), axis=1).mean())
    # the two 32-D Gaussians must land as two separated blobs
    assert gap > 2.0 * spread


def test_too_few_samples_raises():
    with pytest.raises(ValueError):
        un.umap_embed(np.zeros((5, 3)), n_neighbors=20)


def test_project_2d_uses_native_umap(monkeypatch):
    # the latents chain must route through umap_native when umap-learn
    # is absent (it is absent in this env) and inputs are large enough
    from vaegam_tpu.outputs import latents

    x, _ = _two_clusters(n_per=30)
    called = {}
    import vaegam_tpu.outputs.umap_native as nat

    orig = nat.umap_embed

    def spy(*a, **k):
        called["yes"] = True
        return orig(*a, **k)

    monkeypatch.setattr(nat, "umap_embed", spy)
    out = latents._project_2d(x)
    assert called.get("yes")
    assert out.shape == (len(x), 2)


def test_trustworthiness_matches_sklearn():
    """Native trustworthiness cross-validated against an independent
    implementation (sklearn.manifold.trustworthiness) — the embedding
    fidelity metric itself has an external oracle."""
    from sklearn.manifold import trustworthiness as sk_trust

    rng = np.random.default_rng(11)
    for n, d, k in [(60, 8, 5), (120, 16, 10), (150, 4, 7)]:
        x = rng.normal(size=(n, d))
        emb = rng.normal(size=(n, 2)) + 0.5 * x[:, :2]
        ours = un.trustworthiness(x, emb, n_neighbors=k)
        theirs = sk_trust(x, emb, n_neighbors=k)
        assert ours == pytest.approx(theirs, abs=1e-12), (n, d, k)


def test_umap_embedding_trustworthiness_floor():
    """Quantitative fidelity gate for the latent-projection artifact:
    umap_embed on the cluster fixture must preserve >= 85% of local
    neighborhood structure (measured 0.883 at k=15 on this fixture)."""
    x, _ = _two_clusters()
    emb = un.umap_embed(x, n_neighbors=15, n_epochs=200, seed=42)
    assert un.trustworthiness(x, emb, n_neighbors=15) > 0.85
    assert un.trustworthiness(x, emb, n_neighbors=5) > 0.85


def test_umap_embedding_matches_golden():
    """Drift detector: the committed golden embedding (generated under this
    test env's CPU backend) must be reproduced bit-near by today's code.
    A deliberate algorithm change should regenerate the golden (see
    tests/golden/) — an accidental one fails here."""
    import os

    golden_path = os.path.join(os.path.dirname(__file__), "golden",
                               "umap_two_clusters_emb.npz")
    golden = np.load(golden_path)
    x, _ = _two_clusters()
    emb = un.umap_embed(x, n_neighbors=15, n_epochs=200, seed=42)
    np.testing.assert_allclose(emb, golden["emb"], atol=1e-5)
    t = un.trustworthiness(x, emb, n_neighbors=15)
    assert t == pytest.approx(float(golden["trustworthiness"]), abs=1e-6)
