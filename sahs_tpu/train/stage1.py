"""Stage-I trainer: fully-jitted, device-resident train step.

Re-design of the reference training loop (nerf-pytorch/
train_stage_rays_auto.py:273-544) as ONE compiled XLA program per step:

  reference (per iteration, host-driven)          this framework
  ------------------------------------------      -----------------------------
  np.random.choice over H*W probs (host)      ->  Gumbel-top-k weighted gather
                                                  on device (ops/sampling.py)
  .to(device) of rays/targets per iter        ->  whole frame stays on device;
                                                  gather is part of the jit
  torch autograd + Adam + manual LR assign    ->  jax.value_and_grad + optax
                                                  adam with exp-decay schedule
  host-side sample_prob update                ->  carried state inside the step

Loss stack parity (train_stage_rays_auto.py:455-492):
  L = [coarse_l2 + 0.02*coarse_ce + 0.005*sum(mouth_l2 + mouth_ce)] + fine(...)
      (+ 10 * 0.0005*||latent||)  (+ 10 * 0.0005*||grid||)  (+ bg loss * 0.001)
  sample_prob <- normalized sum of the class-weighted masked loss vectors
  (weights: ones with classes 7:9 (mouth interior + lips) doubled).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..config import Config
from ..models.nerface import ModelSpec, Params, init_model_params
from ..ops import losses as L
from ..ops.rays import get_rays_at
from ..ops.sampling import (bbox_ray_probs, gather_rays, semantic_ray_probs,
                            weighted_ray_indices)
from ..render.pipeline import RenderSettings, render_rays
from ..utils.seg import NUM_CLASSES


class TrainState(NamedTuple):
    step: jnp.ndarray                 # scalar int32
    params: Params                    # {"model": ..., "background"?: ..., "latent_codes"?: ...}
    opt_state: Any
    sample_prob: jnp.ndarray          # (12,) dynamic semantic sampling weights


@dataclasses.dataclass(frozen=True)
class TrainSettings:
    """Static training configuration distilled from Config (hashable)."""
    num_random_rays: int
    near: float
    far: float
    render: RenderSettings
    dynamic_sampling: bool
    fixed_background: bool
    train_background: bool
    supervised_train_background: bool
    train_latent_codes: bool
    disable_latent_codes: bool
    regularize_latent_codes: bool
    regularize_spatial_embedding: bool
    use_spatial_embeddings: bool
    ce_weight: float
    mouth_loss_weight: float
    mouth_class_weight: float
    latent_reg_weight: float
    spatial_reg_weight: float
    background_loss_weight: float
    lr: float
    lr_decay: int
    lr_decay_factor: float
    fused_grads: bool = True

    @classmethod
    def from_config(cls, cfg: Config) -> "TrainSettings":
        rt = cfg.runtime
        return cls(
            num_random_rays=cfg.nerf.train.num_random_rays,
            near=float(cfg.dataset.near),
            far=float(cfg.dataset.far),
            render=RenderSettings.from_config(cfg, "train"),
            dynamic_sampling=rt.dynamic_sampling,
            fixed_background=rt.fixed_background,
            train_background=rt.train_background,
            supervised_train_background=rt.supervised_train_background,
            train_latent_codes=rt.train_latent_codes,
            disable_latent_codes=rt.disable_latent_codes,
            regularize_latent_codes=rt.regularize_latent_codes,
            regularize_spatial_embedding=rt.regularize_spatial_embedding,
            use_spatial_embeddings=cfg.models.coarse.use_spatial_embeddings,
            ce_weight=rt.ce_weight,
            mouth_loss_weight=rt.mouth_loss_weight,
            mouth_class_weight=rt.mouth_class_weight,
            latent_reg_weight=rt.latent_reg_weight,
            spatial_reg_weight=rt.spatial_reg_weight,
            background_loss_weight=rt.background_loss_weight,
            lr=float(cfg.optimizer.lr),
            lr_decay=int(cfg.scheduler.lr_decay),
            lr_decay_factor=float(cfg.scheduler.lr_decay_factor),
            fused_grads=bool(getattr(rt, "fused_grads", True)),
        )


def class_weights(ts: TrainSettings) -> jnp.ndarray:
    w = jnp.ones((NUM_CLASSES,), jnp.float32)
    return w.at[7:9].set(ts.mouth_class_weight)


def make_optimizer(ts: TrainSettings) -> optax.GradientTransformation:
    """Adam with the reference's exponential LR decay
    lr(i) = lr0 * factor^(i / (lr_decay*1000))
    (train_stage_rays_auto.py:504-509)."""
    def schedule(step):
        return ts.lr * ts.lr_decay_factor ** (step / (ts.lr_decay * 1000.0))
    # Plain per-leaf adam. Earlier rounds shipped optax.flatten (one
    # concatenated vector) against per-leaf dispatch overhead, but inside
    # the fully-jitted step XLA fuses the per-leaf update fine while the
    # flatten ravel/concat showed up as a 1.4 ms/step data-formatting op
    # in the r5 device trace (measured: 37.3 -> 36.3 ms/step without it).
    # SAHS_OPT_FLATTEN=1 restores the old behavior (note: checkpoints
    # store opt_state, so the two variants' checkpoints don't interchange).
    import os
    if os.environ.get("SAHS_OPT_FLATTEN", "0") == "1":
        return optax.flatten(optax.adam(learning_rate=schedule))
    return optax.adam(learning_rate=schedule)


def init_train_state(key: jax.Array, spec: ModelSpec, ts: TrainSettings,
                     background: Optional[jnp.ndarray] = None,
                     num_latent_frames: int = 0) -> TrainState:
    params: Params = {"model": init_model_params(key, spec)}
    if ts.train_background and background is not None:
        params["background"] = background
    if ts.train_latent_codes and num_latent_frames > 0:
        params["latent_codes"] = jnp.zeros((num_latent_frames, 32))
    opt = make_optimizer(ts)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=opt.init(params),
        sample_prob=jnp.ones((NUM_CLASSES,), jnp.float32),
    )


def _stage1_losses(ts: TrainSettings, rgb: jnp.ndarray, mask: jnp.ndarray,
                   target: jnp.ndarray, cw: jnp.ndarray):
    l2, masked_l2, masked_l2_w = L.mask_mse_loss(mask, rgb[..., :3],
                                                 target[..., :3], cw)
    ce, masked_ce, masked_ce_w = L.mask_cross_entropy_loss(mask, rgb[..., 3:],
                                                           mask, cw)
    mouth = jnp.sum(masked_l2[7:9] + masked_ce[7:9])
    total = l2 + ts.ce_weight * ce + ts.mouth_loss_weight * mouth
    return total, l2, ce, masked_l2_w, masked_ce_w


def train_step(
    state: TrainState,
    batch: Dict[str, jnp.ndarray],
    key: jax.Array,
    spec: ModelSpec,
    ts: TrainSettings,
    optimizer: optax.GradientTransformation,
    ray_constraint=None,
) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
    """One fully-fused training step. batch keys:
      image (H,W,3), mask (H,W,12) float, pose (3,4), intrinsics (4,),
      driving ((76,) or (16,29) audio window), background (H,W,15) [fixed bg],
      frame_idx () int32 [for latent codes].
    Returns (new_state, metrics).
    """
    k_sel, k_render = jax.random.split(key)
    H, W = batch["image"].shape[:2]
    mask_img = batch["mask"].astype(jnp.float32)

    # --- device-side ray selection ---------------------------------------
    # dynamic semantic-weighted probs when dynamic_sampling is on
    # (train_stage_rays_auto.py:390-394); otherwise the dataset's
    # bbox-weighted probs (nerface_dataloader.py:63-87), uniform if the
    # dataset carries no bbox (reference audio loader, load_bbox=False).
    if ts.dynamic_sampling:
        probs = semantic_ray_probs(state.sample_prob, mask_img)
    elif "bbox" in batch:
        probs = bbox_ray_probs(batch["bbox"], H, W)
    else:
        probs = jnp.full((H, W), 1.0 / (H * W))
    idx = weighted_ray_indices(k_sel, probs.reshape(-1), ts.num_random_rays)

    bg_img = batch.get("background")
    if ts.train_background:
        bg_img = state.params.get("background", bg_img)
    use_bg = (ts.fixed_background or ts.train_background) and bg_img is not None

    # Rays are computed only at the selected pixels (no full H*W bundle).
    ro, rd = get_rays_at(idx, H, W, batch["intrinsics"], batch["pose"])
    if ts.render.use_ndc:
        from ..ops.rays import ndc_rays
        ro, rd = ndc_rays(H, W, batch["intrinsics"], 1.0, ro, rd)
    target_s, mask_s = gather_rays(idx, batch["image"], mask_img)
    bg_rays = gather_rays(idx, bg_img)[0] if use_bg else None
    if ray_constraint is not None:
        # Shard the ray workload across the device mesh (DP over rays);
        # everything upstream (one frame) is replicated, everything from here
        # to the loss is ray-parallel, and XLA inserts the gradient
        # all-reduce over ICI.
        constrain = lambda x: (jax.lax.with_sharding_constraint(x, ray_constraint)
                               if x is not None else None)
        ro, rd, target_s, mask_s = map(constrain, (ro, rd, target_s, mask_s))
        bg_rays = constrain(bg_rays)

    cw = class_weights(ts)
    from .fused import (FusedCfg, ray_loss_weights, stage1_fused,
                        stage1_fused_eligible)
    use_fused = ts.fused_grads and stage1_fused_eligible(spec, ts.render)

    def loss_fn(params: Params):
        bg_r = bg_rays
        if ts.train_background and "background" in params:
            bg_r = gather_rays(idx, params["background"])[0]
        latent = None
        if ts.train_latent_codes and not ts.disable_latent_codes and \
                "latent_codes" in params:
            latent = params["latent_codes"][batch["frame_idx"]]

        if use_fused:
            # Fully-fused gradient path (train/fused.py): both level
            # kernels compute the loss cotangents in-kernel and emit all
            # gradients in the FORWARD; rgb/weights come back for
            # metrics/sampling only and MUST stay stop-gradiented (the
            # custom_vjp ignores their cotangents).
            from ..models.nerface import compute_driving, encode_pose
            driving = compute_driving(params["model"], spec,
                                      batch["driving"])
            pose_enc = encode_pose(batch["pose"])
            tgt15 = jnp.concatenate([target_s[..., :3], mask_s], axis=-1)
            lw = ray_loss_weights(mask_s, ts.ce_weight,
                                  ts.mouth_loss_weight)
            fcfg = FusedCfg(
                num_coarse=ts.render.num_coarse,
                num_fine=ts.render.num_fine,
                near=ts.near, far=ts.far,
                perturb=ts.render.perturb,
                noise_std=ts.render.radiance_field_noise_std,
                lindisp=ts.render.lindisp,
                compute_dtype=ts.render.compute_dtype,
                bg_sup_weight=(ts.background_loss_weight
                               if (ts.supervised_train_background
                                   and bg_r is not None) else 0.0))
            loss_lv, rgb_c, rgb_f, w_f = stage1_fused(
                spec, fcfg, params["model"], driving, pose_enc, latent,
                ro, rd, tgt15, lw, bg_r, k_render)
            rgb_c, rgb_f, w_f = map(jax.lax.stop_gradient,
                                    (rgb_c, rgb_f, w_f))
            rgb_coarse, rgb_fine, weights = rgb_c, rgb_f, w_f
            loss = loss_lv
        else:
            res = render_rays(params["model"], spec, ts.render, ro, rd,
                              ts.near, ts.far, batch["driving"],
                              batch["pose"], key=k_render,
                              background_prior=bg_r, latent_code=latent)
            rgb_coarse, rgb_fine = res.rgb_coarse, res.rgb_fine
            weights = res.weights
            loss = None

        c_total, c_l2, c_ce, c_ml2w, c_mcew = _stage1_losses(
            ts, rgb_coarse, mask_s, target_s, cw)
        if loss is None:
            loss = c_total
        f_l2 = c_l2
        f_ce = c_ce
        prob_num = c_ml2w + c_mcew
        if rgb_fine is not None:
            f_total, f_l2, f_ce, f_ml2w, f_mcew = _stage1_losses(
                ts, rgb_fine, mask_s, target_s, cw)
            if not use_fused:
                loss = loss + f_total
            prob_num = prob_num + f_ml2w + f_mcew

        if ts.regularize_latent_codes and latent is not None:
            loss = loss + 10.0 * ts.latent_reg_weight * jnp.linalg.norm(latent)
        if ts.regularize_spatial_embedding and ts.use_spatial_embeddings:
            loss = loss + 10.0 * ts.spatial_reg_weight * jnp.linalg.norm(
                params["model"]["spatial_embeddings"])
        bg_loss = jnp.zeros(())
        if ts.supervised_train_background and bg_r is not None:
            per_ray = jnp.sum(
                jnp.square(bg_r[..., :3] - target_s[..., :3]), axis=-1)
            # weights[:, -1] — contribution of the background sample per ray
            bg_loss = jnp.mean(per_ray * weights[:, -1]) * \
                ts.background_loss_weight
            if not use_fused:
                # fused path: the bg term (value AND gradient) is already
                # inside loss_lv; here it is reporting-only.
                loss = loss + bg_loss

        new_prob = prob_num / jnp.sum(prob_num)
        aux = {
            "loss": loss, "coarse_l2": c_l2, "fine_l2": f_l2,
            "coarse_ce": c_ce, "fine_ce": f_ce, "bg_loss": bg_loss,
            "new_sample_prob": new_prob,
        }
        return loss, aux

    (_, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
    updates, new_opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
    new_params = optax.apply_updates(state.params, updates)
    new_prob = aux.pop("new_sample_prob") if ts.dynamic_sampling \
        else state.sample_prob
    if not ts.dynamic_sampling:
        aux.pop("new_sample_prob")
    metrics = {**aux, "psnr": -10.0 * jnp.log10(jnp.maximum(aux["fine_l2"], 1e-10))}
    return TrainState(state.step + 1, new_params, new_opt_state, new_prob), metrics


def make_train_step(spec: ModelSpec, ts: TrainSettings, donate: bool = True):
    """jit-compiled train step closure."""
    optimizer = make_optimizer(ts)

    def step(state, batch, key):
        return train_step(state, batch, key, spec, ts, optimizer)

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_multi_train_step(spec: ModelSpec, ts: TrainSettings,
                          donate: bool = True):
    """K training steps fused into ONE device program via lax.scan over a
    stacked batch pytree (leaves shaped (K, ...)). Amortizes per-launch
    dispatch latency and lets XLA overlap steps; the TPU-idiomatic driver
    loop. Returns stacked per-step metrics."""
    optimizer = make_optimizer(ts)

    def multi(state, batches, key):
        def body(carry, batch):
            st, ky = carry
            ky, sub = jax.random.split(ky)
            st, m = train_step(st, batch, sub, spec, ts, optimizer)
            return (st, ky), m
        (state, _), metrics = jax.lax.scan(body, (state, key), batches)
        return state, metrics

    return jax.jit(multi, donate_argnums=(0,) if donate else ())


def stack_batches(items, background=None):
    """List of per-frame numpy batch dicts -> stacked device pytree for
    make_multi_train_step."""
    import numpy as np
    keys = [k for k in items[0] if k != "fname"]
    out = {k: jnp.asarray(np.stack([np.asarray(it[k]) for it in items]))
           for k in keys}
    if background is not None:
        out["background"] = jnp.broadcast_to(
            background, (len(items),) + background.shape)
    return out
