"""approx_max_k vs exact top_k ray-draw distribution check (VERDICT r1 #10).

The trainer draws 2048 of H*W pixels without replacement via Gumbel-top-k;
on TPU the top-k uses jax.lax.approx_max_k (hardware partial sort). This
measures the per-semantic-class draw frequencies of both selectors over
many steps on a realistic semantic prob map and reports the max relative
frequency bias. If the bias exceeded 1%, the trainer should switch to exact
top_k (it is 2048 of 262k — cheap); the recorded result decides.

Usage: python tools/sampling_check.py [steps]
"""
from __future__ import annotations

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from sahs_tpu.data.synthetic import SyntheticFaceDataset
from sahs_tpu.ops.sampling import semantic_ray_probs
from sahs_tpu.utils.seg import NUM_CLASSES

STEPS = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
NUM_RAYS = 2048


def main():
    ds = SyntheticFaceDataset(kind="audio", num_frames=1, H=512, W=512)
    mask = jnp.asarray(np.asarray(ds[0]["mask"], np.float32))
    # a realistically skewed sample_prob (mouth-weighted, like mid-training)
    sp = jnp.asarray(np.array([0.02, 0.2, 0.05, 0.01, 0.03, 0.03, 0.01,
                               0.25, 0.25, 0.05, 0.05, 0.05], np.float32))
    probs = semantic_ray_probs(sp, mask).reshape(-1)
    labels = jnp.argmax(mask.reshape(-1, NUM_CLASSES), axis=-1)
    logp = jnp.log(probs + 1e-12)

    def draw(key, use_approx):
        g = jax.random.gumbel(key, probs.shape, dtype=probs.dtype)
        scores = logp + g
        if use_approx:
            _, idx = jax.lax.approx_max_k(scores, NUM_RAYS)
        else:
            _, idx = jax.lax.top_k(scores, NUM_RAYS)
        sel = jnp.take(labels, idx)
        return jnp.sum(jax.nn.one_hot(sel, NUM_CLASSES), axis=0)

    import functools

    @functools.partial(jax.jit, static_argnums=(1,))
    def counts(key0, use_approx):
        def body(acc, i):
            k = jax.random.fold_in(key0, i)
            return acc + draw(k, use_approx), ()
        acc, _ = jax.lax.scan(body, jnp.zeros((NUM_CLASSES,)),
                              jnp.arange(STEPS))
        return acc

    c_exact = np.asarray(counts(jax.random.PRNGKey(0), False))
    c_approx = np.asarray(counts(jax.random.PRNGKey(0), True))
    tot = STEPS * NUM_RAYS
    print(f"{'class':>5s} {'exact%':>9s} {'approx%':>9s} {'rel bias':>9s}")
    max_bias = 0.0
    for c in range(NUM_CLASSES):
        fe, fa = c_exact[c] / tot, c_approx[c] / tot
        bias = abs(fa - fe) / max(fe, 1e-9) if fe > 1e-6 else 0.0
        max_bias = max(max_bias, bias)
        print(f"{c:5d} {100 * fe:9.4f} {100 * fa:9.4f} {100 * bias:8.2f}%")
    print(f"max per-class relative bias: {100 * max_bias:.3f}% "
          f"({'OK <1%' if max_bias < 0.01 else 'EXCEEDS 1% — use exact top_k'})")
    sys.exit(0 if max_bias < 0.01 else 1)


if __name__ == "__main__":
    main()
