"""Jitted training step: DP-sharded, heads-only gradients.

The reference trains single-device with AMP + grad-clip 1.0 + AdamW +
cosine LR (``scripts/train_vit_features.py:154-177, 667-676``).  Here the
step is a pure function jitted over a device mesh: the batch is sharded over
the ``data`` axis, parameters are replicated, and XLA inserts the gradient
all-reduce automatically from the sharding annotations (SURVEY.md §2.4
consequence: DP via pjit, not a NCCL port).
"""

from __future__ import annotations

from functools import partial
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from vit_colmap_tpu.dataloader.training_batch import process_batch
from vit_colmap_tpu.losses.feature_losses import total_loss


class TrainState(NamedTuple):
    step: jax.Array
    heads_params: Any
    opt_state: Any


def make_optimizer(
    learning_rate: float = 1e-4,
    weight_decay: float = 1e-4,
    total_steps: int = 10000,
    warmup_steps: int = 100,
    grad_clip: float = 1.0,
) -> optax.GradientTransformation:
    """AdamW + cosine decay to lr/100 (reference ``train_vit_features.py:
    667-676``: CosineAnnealingLR eta_min = lr / 100) + global-norm clip 1.0."""
    schedule = optax.warmup_cosine_decay_schedule(
        init_value=learning_rate * 0.1,  # nonzero so step 0 still updates
        peak_value=learning_rate,
        warmup_steps=warmup_steps,
        decay_steps=max(total_steps, warmup_steps + 1),
        end_value=learning_rate / 100.0,
    )
    return optax.chain(
        optax.clip_by_global_norm(grad_clip),
        optax.adamw(schedule, weight_decay=weight_decay),
    )


def make_finetune_optimizer(
    learning_rate: float = 1e-4,
    weight_decay: float = 1e-4,
    total_steps: int = 10000,
    warmup_steps: int = 100,
    grad_clip: float = 1.0,
    backbone_lr_scale: float = 0.1,
) -> optax.GradientTransformation:
    """Optimizer over the combined ``{"heads", "backbone"}`` pytree: heads
    at full LR, backbone at ``backbone_lr_scale`` x (standard fine-tuning
    practice — the randomly-init'd/pretrained backbone moves slower than the
    fresh heads).  Global-norm clip spans both subtrees."""
    heads_opt = optax.adamw(
        optax.warmup_cosine_decay_schedule(
            init_value=learning_rate * 0.1,
            peak_value=learning_rate,
            warmup_steps=warmup_steps,
            decay_steps=max(total_steps, warmup_steps + 1),
            end_value=learning_rate / 100.0,
        ),
        weight_decay=weight_decay,
    )
    bb_lr = learning_rate * backbone_lr_scale
    backbone_opt = optax.adamw(
        optax.warmup_cosine_decay_schedule(
            init_value=bb_lr * 0.1,
            peak_value=bb_lr,
            warmup_steps=warmup_steps,
            decay_steps=max(total_steps, warmup_steps + 1),
            end_value=bb_lr / 100.0,
        ),
        weight_decay=weight_decay,
    )

    def label_fn(tree):
        return {
            "heads": jax.tree_util.tree_map(lambda _: "heads", tree["heads"]),
            "backbone": jax.tree_util.tree_map(
                lambda _: "backbone", tree["backbone"]
            ),
        }

    return optax.chain(
        optax.clip_by_global_norm(grad_clip),
        optax.multi_transform(
            {"heads": heads_opt, "backbone": backbone_opt}, label_fn
        ),
    )


def init_train_state(heads_params, optimizer) -> TrainState:
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        heads_params=heads_params,
        opt_state=optimizer.init(heads_params),
    )


def make_train_step(
    backbone_apply,
    heads_apply,
    optimizer,
    loss_kwargs: Optional[dict] = None,
    batch_kwargs: Optional[dict] = None,
    train_backbone: bool = False,
):
    """Build the jitted train step closure.

    Returns ``step(state, backbone_params, batch, key) -> (state, metrics)``.

    With ``train_backbone=True`` the trainable pytree in
    ``state.heads_params`` is ``{"heads": ..., "backbone": ...}`` and the
    ``backbone_params`` argument is ignored (pass ``None``); gradients flow
    into the backbone and the optimizer (built over the combined pytree,
    typically with a lower backbone LR via ``optax.multi_transform``)
    updates both.  Extension over the reference's always-frozen backbone
    (``scripts/train_vit_features.py:543-548``).
    """
    loss_kwargs = dict(loss_kwargs or {})
    batch_kwargs = dict(batch_kwargs or {})
    # Dense raw-token InfoNCE weight (see dense_token_loss): supervises the
    # tokens the FROZEN extraction path consumes; heads-only training has no
    # backbone gradient, so the term exists only under train_backbone.
    lambda_token = loss_kwargs.pop("lambda_token", 1.0)
    if train_backbone:
        batch_kwargs["train_backbone"] = True

    def loss_fn(trainable, backbone_params, batch, key):
        if train_backbone:
            heads_params = trainable["heads"]
            backbone_params = trainable["backbone"]
        else:
            heads_params = trainable
        outputs, targets = process_batch(
            backbone_apply,
            backbone_params,
            heads_apply,
            heads_params,
            batch,
            key,
            **batch_kwargs,
        )
        token_loss = outputs.pop("token_loss", None)
        token_pos_sim = outputs.pop("token_pos_sim", None)
        out = total_loss(outputs, targets, **loss_kwargs)
        total = out.total
        components = dict(out.components)
        if token_loss is not None:
            total = total + lambda_token * token_loss
            components["token_loss"] = token_loss
            components["token_pos_sim"] = token_pos_sim
        return total, components

    @jax.jit
    def step(state: TrainState, backbone_params, batch, key):
        (loss, components), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.heads_params, backbone_params, batch, key
        )
        updates, opt_state = optimizer.update(
            grads, state.opt_state, state.heads_params
        )
        heads_params = optax.apply_updates(state.heads_params, updates)
        metrics = {"total_loss": loss, **components}
        return (
            TrainState(state.step + 1, heads_params, opt_state),
            metrics,
        )

    @jax.jit
    def eval_step(state: TrainState, backbone_params, batch, key):
        loss, components = loss_fn(state.heads_params, backbone_params, batch, key)
        return {"total_loss": loss, **components}

    return step, eval_step
