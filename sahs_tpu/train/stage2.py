"""Stage-II SPADE texture-refinement training.

Parity with reference nerf-pytorch/train_get_texture_photo_audio.py:47-253
(and the 3DMM variant train_get_texture_photo.py): Generator(+audio) trained
with plain MSE against GT frames, Adam(betas=(beta1, beta2)) with linear LR
decay after ``epochs`` epochs, per-image batches, val PSNR every 2 epochs.
The whole G step (forward + MSE + backward + Adam + buffer update) is one
jitted program.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..config import Config
from ..models import spade


class Stage2State(NamedTuple):
    step: jnp.ndarray
    params: Dict[str, Any]
    bufs: Dict[str, Any]
    opt_state: Any


@dataclasses.dataclass(frozen=True)
class Stage2Settings:
    lr_G: float
    beta1: float
    beta2: float
    epochs: int
    epochs_decay: int
    steps_per_epoch: int
    audio: bool

    @classmethod
    def from_config(cls, cfg: Config, steps_per_epoch: int) -> "Stage2Settings":
        tr = cfg.texture_refine
        return cls(lr_G=float(tr.lr_G), beta1=float(tr.beta1),
                   beta2=float(tr.beta2), epochs=int(tr.epochs),
                   epochs_decay=int(tr.epochs_decay),
                   steps_per_epoch=steps_per_epoch,
                   audio=cfg.dataset.type.lower() == "audio")


def make_optimizer(s: Stage2Settings) -> optax.GradientTransformation:
    """Adam with linear decay to zero over the last ``epochs_decay`` epochs
    (reference train_get_texture_photo_audio.py:160-167)."""
    total = (s.epochs + s.epochs_decay) * s.steps_per_epoch
    decay_start = s.epochs * s.steps_per_epoch

    def schedule(step):
        frac = jnp.clip((step - decay_start)
                        / max(total - decay_start, 1), 0.0, 1.0)
        return s.lr_G * (1.0 - frac)

    return optax.adam(learning_rate=schedule, b1=s.beta1, b2=s.beta2)


def init_stage2_state(key: jax.Array, s: Stage2Settings) -> Stage2State:
    params, bufs = spade.generator_init(key, audio=s.audio)
    opt = make_optimizer(s)
    return Stage2State(jnp.zeros((), jnp.int32), params, bufs,
                       opt.init(params))


def train_step(state: Stage2State, i_src, i_raw, target, audio,
               s: Stage2Settings,
               optimizer: optax.GradientTransformation
               ) -> Tuple[Stage2State, Dict[str, jnp.ndarray]]:
    """i_src/i_raw/target: (1,H,W,3) NHWC; audio: (16,29) or None."""

    def loss_fn(params):
        fake, new_bufs = spade.generator_apply(params, state.bufs, i_src,
                                               i_raw, audio=audio, train=True)
        fake = jnp.clip(fake, 0.0, 1.0)
        loss = jnp.mean(jnp.square(fake - target))
        return loss, (fake, new_bufs)

    (loss, (fake, new_bufs)), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(state.params)
    updates, new_opt = optimizer.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    metrics = {"loss": loss,
               "psnr": -10.0 * jnp.log10(jnp.maximum(loss, 1e-10))}
    return Stage2State(state.step + 1, new_params, new_bufs, new_opt), metrics


def make_train_step(s: Stage2Settings, donate: bool = True):
    optimizer = make_optimizer(s)

    def step(state, i_src, i_raw, target, audio):
        return train_step(state, i_src, i_raw, target, audio, s, optimizer)

    def step_noaudio(state, i_src, i_raw, target):
        return train_step(state, i_src, i_raw, target, None, s, optimizer)

    if s.audio:
        return jax.jit(step, donate_argnums=(0,) if donate else ())
    return jax.jit(step_noaudio, donate_argnums=(0,) if donate else ())


def make_infer(s: Stage2Settings):
    def infer(params, bufs, i_src, i_raw, audio):
        fake, _ = spade.generator_apply(params, bufs, i_src, i_raw,
                                        audio=audio, train=False)
        return jnp.clip(fake, 0.0, 1.0)

    def infer_noaudio(params, bufs, i_src, i_raw):
        fake, _ = spade.generator_apply(params, bufs, i_src, i_raw,
                                        audio=None, train=False)
        return jnp.clip(fake, 0.0, 1.0)

    return jax.jit(infer if s.audio else infer_noaudio)
