"""Positional encoding, TPU-first.

Behavioural parity with reference nerf-pytorch/nerf/nerf_helpers.py:305-359
(``positional_encoding`` / ``get_embedding_function``), but the frequency
table is baked at trace time as a static constant and the sin/cos banks are
computed as one fused outer-product + concat so XLA lowers it to a single
VPU-friendly elementwise block (no Python loop over frequencies at runtime).
"""
from __future__ import annotations

import functools
from typing import Callable

import jax.numpy as jnp
import numpy as np


def frequency_bands(num_encoding_functions: int, log_sampling: bool = True) -> np.ndarray:
    """Static (host-side) frequency table; matches reference
    nerf_helpers.py:324-339."""
    if num_encoding_functions <= 0:
        return np.zeros((0,), dtype=np.float32)
    if log_sampling:
        return (2.0 ** np.linspace(0.0, num_encoding_functions - 1,
                                   num_encoding_functions)).astype(np.float32)
    return np.linspace(2.0 ** 0.0, 2.0 ** (num_encoding_functions - 1),
                       num_encoding_functions).astype(np.float32)


def positional_encoding(x: jnp.ndarray, num_encoding_functions: int = 6,
                        include_input: bool = True,
                        log_sampling: bool = True) -> jnp.ndarray:
    """PE layout parity with the reference: per-frequency [sin, cos] pairs,
    i.e. output = [x?, sin(f0 x), cos(f0 x), sin(f1 x), cos(f1 x), ...] with
    each block spanning all input channels (nerf_helpers.py:341-349)."""
    if num_encoding_functions == 0:
        return x if include_input else x[..., :0]
    freqs = jnp.asarray(frequency_bands(num_encoding_functions, log_sampling),
                        dtype=x.dtype)
    # (..., D) x (F,) -> (..., F, D)
    xb = x[..., None, :] * freqs[:, None]
    # Interleave per frequency: (..., F, 2, D) -> (..., F*2*D)
    sc = jnp.stack([jnp.sin(xb), jnp.cos(xb)], axis=-2)
    sc = sc.reshape(x.shape[:-1] + (2 * num_encoding_functions * x.shape[-1],))
    if include_input:
        return jnp.concatenate([x, sc], axis=-1)
    return sc


def encoded_dim(input_dim: int, num_encoding_functions: int,
                include_input: bool = True) -> int:
    return (input_dim if include_input else 0) + 2 * input_dim * num_encoding_functions


def get_embedding_function(num_encoding_functions: int = 6,
                           include_input: bool = True,
                           log_sampling: bool = True) -> Callable[[jnp.ndarray], jnp.ndarray]:
    return functools.partial(
        positional_encoding,
        num_encoding_functions=num_encoding_functions,
        include_input=include_input,
        log_sampling=log_sampling,
    )
