"""Training CLI for the keypoint/descriptor heads.

Mirrors the reference trainer's surface (``scripts/train_vit_features.py``:
~45 argparse flags, AdamW + cosine LR with eta_min = lr/100, grad clip 1.0,
random 90/10 train/val split, per-batch error-skip semantics, checkpoints
``checkpoint_epoch_NNNN`` / ``latest`` with full state and resume) — rebuilt
TPU-native.  Deliberate format divergence from the reference: ``best_model``
is **params-only** (inference-oriented, a third of the bytes), whereas the
reference's ``best_model.pt`` stores full model+optimizer+scheduler state;
``latest`` is the only resume-capable checkpoint here.  Other differences:

* one jitted DP train step over the device mesh (no AMP flags: compute is
  bfloat16 by design; no torch.compile: everything is already XLA),
* orbax checkpoints of {step, heads_params, opt_state} + epoch metadata,
* structured JSONL scalar logging (``scalars.jsonl``) instead of the
  reference's regex-parsed text log (SURVEY.md §5 observability note) — the
  plotters read JSONL first and fall back to log parsing,
* ``--synthetic-only`` trains on generated homography pairs when no HPatches
  tree is available (this environment has no datasets).

Usage: ``python -m vit_colmap_tpu.training.train --data-dir <hpatches> ...``
"""

from __future__ import annotations

import argparse
import itertools
import json
import logging
import time
from pathlib import Path
from typing import Optional

import numpy as np

logger = logging.getLogger(__name__)


def build_argparser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(description="Train ViT feature heads (TPU)")
    # Data
    ap.add_argument("--data-dir", type=Path, default=None, help="HPatches root")
    ap.add_argument("--split", default="all",
                    choices=["all", "illumination", "viewpoint", "train", "test"])
    ap.add_argument("--pair-mode", default="all_pairs",
                    choices=["reference_only", "consecutive", "all_pairs"])
    ap.add_argument("--target-height", type=int, default=1200)
    ap.add_argument("--target-width", type=int, default=1600)
    ap.add_argument("--synthetic-ratio", type=float, default=0.5)
    ap.add_argument("--synthetic-preset", default="moderate",
                    choices=["conservative", "moderate", "aggressive"])
    ap.add_argument("--synthetic-only", action="store_true",
                    help="Train on generated image pairs (no dataset needed)")
    ap.add_argument("--photometric-strength", type=float, default=0.5,
                    help="brightness/contrast/gamma/noise jitter on img2 "
                         "(p=0.5 per sample; 0 = reference's geometric-only "
                         "pairs)")
    ap.add_argument("--synthetic-image-size", type=int, default=224,
                    help="Image side for --synthetic-only batches")
    ap.add_argument("--val-fraction", type=float, default=0.1)
    # Model
    ap.add_argument("--backbone", default="vitb14")
    ap.add_argument("--backbone-weights", type=Path, default=None)
    ap.add_argument("--descriptor-dim", type=int, default=128)
    ap.add_argument("--train-backbone", action="store_true",
                    help="Fine-tune the backbone jointly with the heads "
                    "(extension over the reference's frozen backbone; "
                    "checkpoints then embed the backbone)")
    ap.add_argument("--backbone-lr-scale", type=float, default=0.1,
                    help="Backbone LR = lr * this (with --train-backbone)")
    # Optimization
    ap.add_argument("--epochs", type=int, default=10)
    ap.add_argument("--batch-size", type=int, default=4)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--weight-decay", type=float, default=1e-4)
    ap.add_argument("--warmup-steps", type=int, default=100)
    ap.add_argument("--grad-clip", type=float, default=1.0)
    ap.add_argument("--steps-per-epoch", type=int, default=None,
                    help="Cap steps per epoch (synthetic-only default 50)")
    # Loss
    ap.add_argument("--lambda-det", type=float, default=1.0)
    ap.add_argument("--lambda-desc", type=float, default=1.0)
    ap.add_argument("--alpha-orient", type=float, default=0.32)
    ap.add_argument("--margin", type=float, default=0.5)
    ap.add_argument("--temperature", type=float, default=0.1,
                    help="InfoNCE softmax temperature")
    ap.add_argument("--lambda-nce", type=float, default=1.0,
                    help="InfoNCE weight (anti-collapse)")
    ap.add_argument("--lambda-var", type=float, default=1.0,
                    help="descriptor variance-hinge weight (anti-collapse)")
    ap.add_argument("--lambda-token", type=float, default=1.0,
                    help="dense raw-token InfoNCE weight (--train-backbone "
                         "only): supervises the patch tokens the frozen "
                         "ViTExtractor consumes")
    ap.add_argument("--pos-weight", type=float, default=None,
                    help="detector BCE positive weight (default: dynamic)")
    ap.add_argument("--top-k", type=int, default=512)
    ap.add_argument("--structure-alpha", type=float, default=1.0,
                    help="image-cornerness prior blended into invariant-"
                         "point selection (0 = reference's pure feature-"
                         "similarity selection)")
    ap.add_argument("--num-in-image-neg", type=int, default=8)
    ap.add_argument("--num-cross-neg", type=int, default=4)
    ap.add_argument("--num-hard-neg", type=int, default=4)
    # Checkpointing / logging
    ap.add_argument("--output-dir", type=Path, default=Path("checkpoints"))
    ap.add_argument("--save-interval", type=int, default=1, help="epochs")
    ap.add_argument("--latest-every", type=int, default=1,
                    help="epochs between 'latest' full-state saves (the "
                    "final epoch always saves). Fine-tune states are large "
                    "(backbone + AdamW moments ~1 GB) and each full save "
                    "fetches them over the device wire; >1 trades resume "
                    "granularity for wall-clock")
    ap.add_argument("--resume", type=Path, default=None)
    ap.add_argument("--log-interval", type=int, default=10, help="steps")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--verbose", "-v", action="store_true")
    return ap


def _synthetic_batches(batch_size, h, w, steps, preset, seed, photometric=0.0):
    """Generated-pair stream for --synthetic-only runs."""
    import cv2

    from vit_colmap_tpu.dataloader.synthetic_homography import (
        SyntheticHomographyConfig,
        create_synthetic_pair,
        photometric_jitter,
    )

    cfg = SyntheticHomographyConfig.preset(preset)
    rng = np.random.default_rng(seed)
    for _ in range(steps):
        im1 = np.zeros((batch_size, h, w, 3), np.uint8)
        im2 = np.zeros((batch_size, h, w, 3), np.uint8)
        Hs = np.zeros((batch_size, 3, 3), np.float32)
        for b in range(batch_size):
            base = rng.integers(0, 255, (h // 4, w // 4, 3), dtype=np.uint8)
            img = cv2.resize(base, (w, h), interpolation=cv2.INTER_CUBIC)
            warped, H = create_synthetic_pair(img, cfg, rng)
            if photometric > 0 and rng.random() < 0.5:
                warped = photometric_jitter(warped, rng, photometric)
            im1[b], im2[b], Hs[b] = img, warped, H
        yield {"image1": im1, "image2": im2, "H": Hs}


def prefetch(iterator, depth: int = 2):
    """Run an iterator in a background thread with a bounded queue.

    The framework's stand-in for the reference's
    ``DataLoader(num_workers=4, prefetch)`` (``train_vit_features.py:
    612-631``): host-side batch construction (cv2 decode/warp) overlaps the
    30 ms device step.
    """
    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=depth)
    _END = object()

    def worker():
        try:
            for item in iterator:
                q.put(item)
        finally:
            q.put(_END)

    threading.Thread(target=worker, daemon=True).start()
    while True:
        item = q.get()
        if item is _END:
            return
        yield item


class ScalarLogger:
    """Structured JSONL scalar sink (one line per event)."""

    def __init__(self, path: Path):
        path.parent.mkdir(parents=True, exist_ok=True)
        self.f = open(path, "a")

    def log(self, **scalars) -> None:
        self.f.write(json.dumps({k: _py(v) for k, v in scalars.items()}) + "\n")
        self.f.flush()

    def close(self):
        self.f.close()


def _py(v):
    if isinstance(v, (np.floating, np.integer)):
        return v.item()
    if hasattr(v, "item") and getattr(v, "size", 2) == 1:
        return float(v)
    return v


def main(argv: Optional[list[str]] = None) -> None:
    args = build_argparser().parse_args(argv)
    logging.basicConfig(
        level=logging.DEBUG if args.verbose else logging.INFO,
        format="[%(asctime)s][%(filename)s:%(lineno)d][%(levelname)s] %(message)s",
        datefmt="%H:%M:%S",
    )

    import jax

    from vit_colmap_tpu.utils.jax_cache import enable_persistent_cache

    enable_persistent_cache()
    import jax.numpy as jnp
    import orbax.checkpoint as ocp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from vit_colmap_tpu.models.dinov2 import make_backbone
    from vit_colmap_tpu.models.feature_model import (
        FeatureHeads,
        FeatureModelConfig,
        count_parameters,
    )
    from vit_colmap_tpu.parallel.mesh import get_mesh
    from vit_colmap_tpu.training.train_step import (
        TrainState,
        init_train_state,
        make_finetune_optimizer,
        make_optimizer,
        make_train_step,
    )

    import math

    devices = jax.devices()
    # The data axis must divide the batch; use the largest compatible
    # device subset (e.g. batch 2 on an 8-device mesh -> 2 devices).
    n_data = math.gcd(args.batch_size, len(devices))
    mesh = get_mesh(devices[:n_data])
    logger.info(
        "Devices: %d available, using %d (mesh %s)",
        len(devices), n_data, dict(mesh.shape),
    )
    batch_sharding = NamedSharding(mesh, P("data"))
    replicated = NamedSharding(mesh, P())

    # ----------------------------------------------------------------- data
    if args.synthetic_only or args.data_dir is None:
        if args.data_dir is None and not args.synthetic_only:
            logger.warning("--data-dir not given; falling back to --synthetic-only")
        from vit_colmap_tpu.dataloader.hpatches_dataset import patch_aligned

        h = w = patch_aligned(args.synthetic_image_size)
        steps_per_epoch = args.steps_per_epoch or 50
        def train_stream(epoch):
            return _synthetic_batches(
                args.batch_size, h, w, steps_per_epoch,
                args.synthetic_preset, args.seed + epoch,
                photometric=args.photometric_strength,
            )
        def val_stream():
            return _synthetic_batches(
                args.batch_size, h, w, max(steps_per_epoch // 10, 2),
                args.synthetic_preset, 10_000,
            )
    else:
        from vit_colmap_tpu.dataloader.hpatches_dataset import (
            HPatchesDataset,
            train_val_split,
        )
        from vit_colmap_tpu.dataloader.synthetic_homography import (
            SyntheticHomographyConfig,
        )

        dataset = HPatchesDataset(
            args.data_dir,
            split=args.split,
            pair_mode=args.pair_mode,
            target_height=args.target_height,
            target_width=args.target_width,
            synthetic_ratio=args.synthetic_ratio,
            synthetic_config=SyntheticHomographyConfig.preset(
                args.synthetic_preset
            ),
            photometric_strength=args.photometric_strength,
            seed=args.seed,
        )
        train_idx, val_idx = train_val_split(dataset, args.val_fraction, args.seed)
        steps_per_epoch = args.steps_per_epoch or max(
            len(train_idx) // args.batch_size, 1
        )

        def _stream(indices, shuffle_seed):
            order = np.array(indices)
            np.random.default_rng(shuffle_seed).shuffle(order)
            B = args.batch_size
            for s in range(0, len(order) - B + 1, B):
                items = []
                for i in order[s : s + B]:
                    try:
                        items.append(dataset[int(i)])
                    except Exception as e:  # skip unreadable samples
                        logger.warning("Skipping sample %d: %s", i, e)
                if len(items) < B:
                    continue
                yield {
                    "image1": np.stack([it["image1"] for it in items]),
                    "image2": np.stack([it["image2"] for it in items]),
                    "H": np.stack([it["H"] for it in items]),
                }

        def train_stream(epoch):
            # ``--steps-per-epoch`` must actually bound the epoch: the LR
            # schedule sizes total_steps from it, and an uncapped stream
            # (full split = len(train_idx)//B batches) would burn through
            # the cosine schedule len(train_idx)//(B*steps_per_epoch)x
            # faster than configured.  Different shuffle seed per epoch
            # keeps coverage of the full split across epochs.
            return itertools.islice(
                _stream(train_idx, args.seed + epoch), steps_per_epoch
            )

        def val_stream():
            return _stream(val_idx, 10_000)

    # ---------------------------------------------------------------- model
    # Fine-tuning differentiates the backbone: the Pallas flash/fixedmax
    # attention kernels are forward-only (no backward block specs), so the
    # trainable-backbone path pins XLA attention — within ~9% of the Pallas
    # kernel in the isolated-stack ablation (PROFILE_BACKBONE), and XLA's
    # attention backward is well-fused at training shapes.
    backbone, bcfg = make_backbone(
        args.backbone, attn_impl="xla" if args.train_backbone else "auto"
    )
    key = jax.random.key(args.seed)
    bparams = backbone.init(key, jnp.zeros((1, 224, 224, 3)))
    if args.backbone_weights:
        from vit_colmap_tpu.models.convert import load_torch_checkpoint

        bparams = load_torch_checkpoint(str(args.backbone_weights), bcfg)
        logger.info("Loaded backbone weights from %s", args.backbone_weights)
    hcfg = FeatureModelConfig(
        backbone=args.backbone, descriptor_dim=args.descriptor_dim
    )
    heads = FeatureHeads(hcfg)
    hparams = heads.init(key, jnp.zeros((1, 16, 16, bcfg.embed_dim)))
    logger.info(
        "Trainable parameters: %s", f"{count_parameters(hparams):,}"
    )

    total_steps = args.epochs * steps_per_epoch
    if args.train_backbone:
        optimizer = make_finetune_optimizer(
            args.lr, args.weight_decay, total_steps, args.warmup_steps,
            args.grad_clip, backbone_lr_scale=args.backbone_lr_scale,
        )
        trainable = {"heads": hparams, "backbone": bparams}
        bparams = None  # lives inside the train state now
        logger.info("Fine-tuning backbone (lr scale %.3g)",
                    args.backbone_lr_scale)
    else:
        optimizer = make_optimizer(
            args.lr, args.weight_decay, total_steps, args.warmup_steps,
            args.grad_clip,
        )
        trainable = hparams
    state = init_train_state(trainable, optimizer)
    step_fn, eval_fn = make_train_step(
        backbone.apply,
        heads.apply,
        optimizer,
        train_backbone=args.train_backbone,
        loss_kwargs=dict(
            lambda_det=args.lambda_det,
            lambda_desc=args.lambda_desc,
            alpha_orient=args.alpha_orient,
            margin=args.margin,
            temperature=args.temperature,
            lambda_nce=args.lambda_nce,
            lambda_var=args.lambda_var,
            lambda_token=args.lambda_token,
            pos_weight=args.pos_weight,
        ),
        batch_kwargs=dict(
            top_k=args.top_k,
            num_in_image=args.num_in_image_neg,
            num_cross=args.num_cross_neg,
            num_hard=args.num_hard_neg,
            structure_alpha=args.structure_alpha,
        ),
    )

    # ---------------------------------------------------------- checkpoints
    out_dir = args.output_dir.resolve()
    out_dir.mkdir(parents=True, exist_ok=True)
    ckptr = ocp.StandardCheckpointer()
    start_epoch = 0
    if args.resume:
        try:
            restored = ckptr.restore(
                Path(args.resume).resolve(),
                jax.tree_util.tree_map(np.asarray, state),
            )
        except Exception as e:
            # best_model is params-only ({"heads_params": ...}) and cannot
            # restore against a full TrainState template; fail with a clear
            # message instead of orbax's structure mismatch.
            raise SystemExit(
                f"--resume {args.resume} is not a full-state checkpoint "
                "(best_model is params-only; resume from 'latest' or a "
                f"checkpoint_epoch_NNNN instead): {e}"
            ) from e
        state = TrainState(*restored)
        meta_path = Path(args.resume).resolve().parent / "meta.json"
        if meta_path.exists():
            start_epoch = json.load(open(meta_path)).get("epoch", 0)
        logger.info("Resumed from %s at step %d", args.resume, int(state.step))

    # meta.json must describe a COMMITTED 'latest' checkpoint: writing it at
    # save initiation would let a crash during the ~1 GB background write
    # leave meta AHEAD of the last committed state, making resume (and
    # quality_bakeoff's "already complete; reusing" check) silently skip
    # epochs.  So the pending {epoch, step} is stashed here and flushed only
    # after the next wait_until_finished() proves the save committed.
    pending_meta: dict = {}

    def _flush_meta() -> None:
        # Call ONLY after ckptr.wait_until_finished(): the previous 'latest'
        # save is then durable on disk and meta may advance to it.
        if pending_meta:
            json.dump(pending_meta.copy(), open(out_dir / "meta.json", "w"))
            pending_meta.clear()

    def save(name: str, epoch: int, params_only: bool = False):
        """Initiate an async checkpoint save and return.

        The state is fetched to host synchronously here (np.asarray — on the
        axon relay, handing live device arrays to orbax's background thread
        races the next epoch's donated-buffer updates), so only the disk
        write overlaps the next epoch's steps; a new save first drains the
        previous one, and training end blocks on the final save.
        ``params_only`` drops step/opt_state — enough for inference-side
        loading (``TrainableViTExtractor._load_checkpoint``) at a third of
        the bytes; ``latest`` stays full-state for --resume.
        """
        path = out_dir / name
        ckptr.wait_until_finished()
        _flush_meta()  # the previous 'latest' is committed by the wait above
        payload = {"heads_params": state.heads_params} if params_only else state
        ckptr.save(
            path, jax.tree_util.tree_map(np.asarray, payload), force=True
        )
        if name == "latest":
            # best_model/epoch_NNNN saves must not advance the resume point
            # past the last committed ``latest``.
            pending_meta.update(
                {"epoch": epoch, "step": int(state.step),
                 "train_backbone": bool(args.train_backbone)}
            )

    scalars = ScalarLogger(out_dir / "scalars.jsonl")
    bparams = jax.device_put(bparams, replicated)
    state = jax.tree_util.tree_map(lambda x: jax.device_put(x, replicated), state)

    # ------------------------------------------------------------ train loop
    best_val = float("inf")
    rng_key = jax.random.key(args.seed + 1)
    for epoch in range(start_epoch, args.epochs):
        t0 = time.perf_counter()
        losses = []
        attempted = 0
        for i, batch in enumerate(prefetch(train_stream(epoch))):
            attempted += 1
            try:
                batch = {
                    k: jax.device_put(v, batch_sharding) for k, v in batch.items()
                }
                rng_key, sub = jax.random.split(rng_key)
                state, metrics = step_fn(state, bparams, batch, sub)
                loss = float(metrics["total_loss"])
                losses.append(loss)
                if i % args.log_interval == 0:
                    scalars.log(
                        event="train", epoch=epoch, step=int(state.step),
                        **{k: float(v) for k, v in metrics.items()},
                    )
                    logger.info(
                        "epoch %d step %d loss %.4f (det %.4f desc %.4f)",
                        epoch, int(state.step), loss,
                        float(metrics["detector_loss"]),
                        float(metrics["descriptor_loss"]),
                    )
            except Exception:
                logger.exception("Batch failed; continuing")  # reference parity
                continue
        dt = time.perf_counter() - t0
        n_steps = len(losses)
        logger.info(
            "epoch %d done: %d steps, %.2f s/step, mean loss %.4f",
            epoch, n_steps, dt / max(n_steps, 1), float(np.mean(losses or [0])),
        )
        # Per-batch skip is for TRANSIENT failures (reference parity,
        # ``train_vit_features.py:213-218``).  An epoch where EVERY batch
        # failed is a systematic breakage (bad config, non-differentiable
        # kernel, OOM) — burning the remaining epochs on it would "complete"
        # training with an untouched model.
        if n_steps == 0 and attempted > 0:
            raise RuntimeError(
                f"epoch {epoch}: all {attempted} batches failed — aborting "
                "(see logged exceptions above)"
            )

        # validation
        val_losses = []
        for batch in prefetch(val_stream()):
            batch = {k: jax.device_put(v, batch_sharding) for k, v in batch.items()}
            rng_key, sub = jax.random.split(rng_key)
            m = eval_fn(state, bparams, batch, sub)
            val_losses.append(float(m["total_loss"]))
        val_loss = float(np.mean(val_losses)) if val_losses else float("inf")
        scalars.log(event="val", epoch=epoch, step=int(state.step), total_loss=val_loss)
        logger.info("epoch %d val loss %.4f", epoch, val_loss)

        if (epoch + 1) % args.latest_every == 0 or epoch + 1 == args.epochs:
            save("latest", epoch + 1)
        if (epoch + 1) % args.save_interval == 0:
            save(f"checkpoint_epoch_{epoch + 1:04d}", epoch + 1)
        if val_loss < best_val:
            best_val = val_loss
            save("best_model", epoch + 1, params_only=True)
            logger.info("new best model (val %.4f)", val_loss)

    ckptr.wait_until_finished()
    _flush_meta()
    scalars.close()
    logger.info("Training complete. Checkpoints in %s", out_dir)


if __name__ == "__main__":
    main()
