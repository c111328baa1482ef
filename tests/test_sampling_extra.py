"""Ray-selection distribution tests: bbox fallback + weighted draw."""
import numpy as np

import jax
import jax.numpy as jnp

from sahs_tpu.ops.sampling import bbox_ray_probs, weighted_ray_indices


def test_bbox_probs_mass():
    H = W = 64
    bbox = jnp.asarray([16, 48, 8, 40])  # rows [16,48) cols [8,40)
    probs = bbox_ray_probs(bbox, H, W)
    p = np.asarray(probs)
    assert p.shape == (H, W)
    np.testing.assert_allclose(p.sum(), 1.0, rtol=1e-5)
    inside = p[16:48, 8:40].sum()
    # 1024 px at 0.9 vs 3072 px at 0.1 -> 75% of the mass inside
    np.testing.assert_allclose(inside, 0.9 * 1024 / (0.9 * 1024 + 0.1 * 3072),
                               rtol=1e-5)
    assert np.allclose(p[:16], p[0, 0])  # uniform outside


def test_bbox_fallback_draws_mostly_inside():
    """VERDICT #6 'done' criterion: with dynamic sampling off the draw lands
    ~90% inside the bbox (for a bbox whose in/out pixel ratio makes the
    inside mass ~0.9)."""
    H = W = 64
    # choose bbox area so that .9*A / (.9*A + .1*(N-A)) ~ 0.9: A = N/2
    bbox = jnp.asarray([16, 48, 0, 64])
    probs = bbox_ray_probs(bbox, H, W).reshape(-1)
    key = jax.random.PRNGKey(0)
    hits = []
    for i in range(20):
        idx = np.asarray(weighted_ray_indices(jax.random.fold_in(key, i),
                                              probs, 512))
        rows = idx // W
        hits.append(np.mean((rows >= 16) & (rows < 48)))
    frac = float(np.mean(hits))
    assert 0.85 < frac < 0.95, frac


def test_weighted_draw_class_frequencies():
    """Per-class draw frequencies of the Gumbel-top-k device draw track the
    target distribution (VERDICT weak #7 CPU-side check; the TPU
    approx_max_k variant is measured by tools/check_approx_topk.py)."""
    rng = np.random.RandomState(0)
    N = 4096
    classes = rng.randint(0, 4, N)
    class_w = np.array([0.1, 0.2, 0.3, 0.4], np.float64)
    probs = class_w[classes]
    probs /= probs.sum()
    pj = jnp.asarray(probs.astype(np.float32))

    counts = np.zeros(4)
    draws = 200
    k = 256
    for i in range(draws):
        idx = np.asarray(weighted_ray_indices(
            jax.random.fold_in(jax.random.PRNGKey(1), i), pj, k))
        assert len(np.unique(idx)) == k  # without replacement
        counts += np.bincount(classes[idx], minlength=4)
    freq = counts / counts.sum()
    # expected class mass under without-replacement is close to with-
    # replacement here (k << N); allow a few percent
    expect = np.array([class_w[c] * np.sum(classes == c) for c in range(4)])
    expect /= expect.sum()
    np.testing.assert_allclose(freq, expect, atol=0.02)
