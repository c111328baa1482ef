"""Stage-II SPADE texture-refinement training.

Parity with reference nerf-pytorch/train_get_texture_photo_audio.py:47-253
(and the 3DMM variant train_get_texture_photo.py): Generator(+audio) trained
against GT frames, Adam(betas=(beta1, beta2)) with linear LR decay after
``epochs`` epochs, val PSNR every 2 epochs. The shipped reference loop is
MSE-only; the Discriminator and VGG the reference defines but never wires
(_init_spade.py:375-451) are available behind config gates
(texture_refine.use_gan / use_perceptual) — hinge GAN + optional pix2pixHD
feature matching + SPADE-weighted VGG L1.

TPU shape: instead of the reference's one-python-call-per-image loop, K
frames are stacked and scanned inside ONE device program
(make_scan_step), amortizing dispatch latency exactly like Stage-I's
multi-step trainer.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..config import Config
from ..models import spade, vgg


class Stage2State(NamedTuple):
    step: jnp.ndarray
    params: Dict[str, Any]
    bufs: Dict[str, Any]
    opt_state: Any
    # adversarial branch (empty pytrees when use_gan is off)
    d_params: Dict[str, Any]
    d_bufs: Dict[str, Any]
    d_opt_state: Any


@dataclasses.dataclass(frozen=True)
class Stage2Settings:
    lr_G: float
    beta1: float
    beta2: float
    epochs: int
    epochs_decay: int
    steps_per_epoch: int
    audio: bool
    use_perceptual: bool = False
    perceptual_weight: float = 10.0
    use_gan: bool = False
    gan_weight: float = 1.0
    gan_feat_weight: float = 0.0
    lr_D: float = 1.0e-4
    scan_frames: int = 8

    @classmethod
    def from_config(cls, cfg: Config, steps_per_epoch: int) -> "Stage2Settings":
        tr = cfg.texture_refine
        return cls(lr_G=float(tr.lr_G), beta1=float(tr.beta1),
                   beta2=float(tr.beta2), epochs=int(tr.epochs),
                   epochs_decay=int(tr.epochs_decay),
                   steps_per_epoch=steps_per_epoch,
                   audio=cfg.dataset.type.lower() == "audio",
                   use_perceptual=bool(tr.use_perceptual),
                   perceptual_weight=float(tr.perceptual_weight),
                   use_gan=bool(tr.use_gan),
                   gan_weight=float(tr.gan_weight),
                   gan_feat_weight=float(tr.gan_feat_weight),
                   lr_D=float(tr.lr_D),
                   scan_frames=int(tr.scan_frames))


def _schedule(s: Stage2Settings, lr0: float):
    """Linear decay to zero over the last ``epochs_decay`` epochs
    (reference train_get_texture_photo_audio.py:160-167)."""
    total = (s.epochs + s.epochs_decay) * s.steps_per_epoch
    decay_start = s.epochs * s.steps_per_epoch

    def schedule(step):
        frac = jnp.clip((step - decay_start)
                        / max(total - decay_start, 1), 0.0, 1.0)
        return lr0 * (1.0 - frac)

    return schedule


def make_optimizer(s: Stage2Settings) -> optax.GradientTransformation:
    return optax.adam(learning_rate=_schedule(s, s.lr_G),
                      b1=s.beta1, b2=s.beta2)


def make_d_optimizer(s: Stage2Settings) -> optax.GradientTransformation:
    return optax.adam(learning_rate=_schedule(s, s.lr_D),
                      b1=s.beta1, b2=s.beta2)


def init_stage2_state(key: jax.Array, s: Stage2Settings,
                      vgg_params: Optional[Dict[str, Any]] = None
                      ) -> Stage2State:
    kg, kd = jax.random.split(key)
    params, bufs = spade.generator_init(kg, audio=s.audio)
    opt = make_optimizer(s)
    d_params: Dict[str, Any] = {}
    d_bufs: Dict[str, Any] = {}
    d_opt_state: Any = ()
    if s.use_gan:
        # D(condition=raw render (3ch), image (3ch)) -> style_size=3
        d_params, d_bufs = spade.discriminator_init(kd, style_size=3)
        d_opt_state = make_d_optimizer(s).init(d_params)
    return Stage2State(jnp.zeros((), jnp.int32), params, bufs,
                       opt.init(params), d_params, d_bufs, d_opt_state)


def _g_losses(s: Stage2Settings, params, state: Stage2State, i_src, i_raw,
              target, audio, vgg_params):
    fake, new_bufs = spade.generator_apply(params, state.bufs, i_src,
                                           i_raw, audio=audio, train=True)
    fake = jnp.clip(fake, 0.0, 1.0)
    mse = jnp.mean(jnp.square(fake - target))
    loss = mse
    aux = {"mse": mse}
    if s.use_perceptual and vgg_params is not None:
        p_loss = vgg.perceptual_loss(vgg_params, fake, target)
        loss = loss + s.perceptual_weight * p_loss
        aux["perceptual"] = p_loss
    if s.use_gan:
        feats_f, _ = spade.discriminator_apply(state.d_params, state.d_bufs,
                                               i_raw, fake, train=False)
        # hinge generator loss on the final logits map
        g_adv = -jnp.mean(feats_f[-1])
        loss = loss + s.gan_weight * g_adv
        aux["g_adv"] = g_adv
        if s.gan_feat_weight > 0:
            feats_r, _ = spade.discriminator_apply(
                state.d_params, state.d_bufs, i_raw, target, train=False)
            fm = jnp.zeros(())
            for a, b in zip(feats_f[:-1], feats_r[:-1]):
                fm = fm + jnp.mean(jnp.abs(a - jax.lax.stop_gradient(b)))
            fm = fm / max(len(feats_f) - 1, 1)
            loss = loss + s.gan_feat_weight * fm
            aux["gan_feat"] = fm
    return loss, (fake, new_bufs, aux)


def train_step(state: Stage2State, i_src, i_raw, target, audio,
               s: Stage2Settings,
               optimizer: optax.GradientTransformation,
               d_optimizer: Optional[optax.GradientTransformation] = None,
               vgg_params: Optional[Dict[str, Any]] = None,
               ) -> Tuple[Stage2State, Dict[str, jnp.ndarray]]:
    """i_src/i_raw/target: (1,H,W,3) NHWC; audio: (16,29) or None."""

    def loss_fn(params):
        return _g_losses(s, params, state, i_src, i_raw, target, audio,
                         vgg_params)

    (loss, (fake, new_bufs, aux)), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(state.params)
    updates, new_opt = optimizer.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)

    d_params, d_bufs, d_opt = state.d_params, state.d_bufs, state.d_opt_state
    if s.use_gan and d_optimizer is not None:
        fake_sg = jax.lax.stop_gradient(fake)

        def d_loss_fn(dp):
            feats_r, db1 = spade.discriminator_apply(dp, state.d_bufs, i_raw,
                                                     target, train=True)
            feats_f, db2 = spade.discriminator_apply(dp, db1, i_raw,
                                                     fake_sg, train=True)
            d_loss = (jnp.mean(jax.nn.relu(1.0 - feats_r[-1]))
                      + jnp.mean(jax.nn.relu(1.0 + feats_f[-1])))
            return d_loss, db2

        (d_loss, d_bufs), d_grads = jax.value_and_grad(
            d_loss_fn, has_aux=True)(state.d_params)
        d_updates, d_opt = d_optimizer.update(d_grads, state.d_opt_state,
                                              state.d_params)
        d_params = optax.apply_updates(state.d_params, d_updates)
        aux["d_loss"] = d_loss

    metrics = {"loss": loss,
               "psnr": -10.0 * jnp.log10(jnp.maximum(aux["mse"], 1e-10)),
               **aux}
    return Stage2State(state.step + 1, new_params, new_bufs, new_opt,
                       d_params, d_bufs, d_opt), metrics


def make_train_step(s: Stage2Settings, donate: bool = True,
                    vgg_params: Optional[Dict[str, Any]] = None):
    optimizer = make_optimizer(s)
    d_optimizer = make_d_optimizer(s) if s.use_gan else None

    def step(state, i_src, i_raw, target, audio):
        return train_step(state, i_src, i_raw, target, audio, s, optimizer,
                          d_optimizer, vgg_params)

    def step_noaudio(state, i_src, i_raw, target):
        return train_step(state, i_src, i_raw, target, None, s, optimizer,
                          d_optimizer, vgg_params)

    if s.audio:
        return jax.jit(step, donate_argnums=(0,) if donate else ())
    return jax.jit(step_noaudio, donate_argnums=(0,) if donate else ())


def make_scan_step(s: Stage2Settings, donate: bool = True,
                   vgg_params: Optional[Dict[str, Any]] = None):
    """K frames fused into ONE device program via lax.scan over stacked
    (K,1,H,W,3) raws/targets (+ (K,16,29) audio). The TPU-idiomatic batch
    loop — the reference's per-image python loop
    (train_get_texture_photo_audio.py:170-195) keeps the accelerator idle
    between 1-image steps. Returns stacked per-frame metrics."""
    optimizer = make_optimizer(s)
    d_optimizer = make_d_optimizer(s) if s.use_gan else None

    def scan(state, i_src, raws, targets, auds):
        def body(st, xs):
            if s.audio:
                raw, tgt, aud = xs
            else:
                raw, tgt = xs
                aud = None
            st, m = train_step(st, i_src, raw, tgt, aud, s, optimizer,
                               d_optimizer, vgg_params)
            return st, m
        xs = (raws, targets, auds) if s.audio else (raws, targets)
        return jax.lax.scan(body, state, xs)

    def scan_noaudio(state, i_src, raws, targets):
        return scan(state, i_src, raws, targets, None)

    if s.audio:
        return jax.jit(scan, donate_argnums=(0,) if donate else ())
    return jax.jit(scan_noaudio, donate_argnums=(0,) if donate else ())


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


def load_vgg_params(path: str, key: Optional[jax.Array] = None,
                    allow_random: bool = False):
    """Load VGG weights for the perceptual loss: a torchvision vgg19
    state_dict (.pth, needs torch) or an .npz of the same keys.

    Empty path raises unless ``allow_random=True``: a "perceptual" loss
    through random-init VGG features is noise with a learning rate, so it
    must be an explicit opt-in (tests / architecture checks), never a
    silent fallback (reference always uses pretrained VGG,
    _init_spade.py:415-451)."""
    if not path:
        if not allow_random:
            raise ValueError(
                "use_perceptual=True needs pretrained VGG weights: set "
                "texture_refine.vgg_weights to a vgg19 .pth/.npz (or pass "
                "allow_random=True for architecture-only runs)")
        print("WARNING: perceptual loss with RANDOM-init VGG (allow_random)")
        return vgg.vgg19_features_init(key if key is not None
                                       else jax.random.PRNGKey(0))
    if path.endswith(".npz"):
        import numpy as np
        return vgg.import_torch_vgg_features(dict(np.load(path)))
    import torch
    sd = torch.load(path, map_location="cpu")
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    return vgg.import_torch_vgg_features(sd)
