"""Parameter partitioning + optimizer assembly for the trainers.

The reference freezes VAE/CLIP, trains the ControlNet(s) fully and only the
new multiview modules of the UNet, keeping trainables in fp32 islands inside
an fp16 model (reference ``multiview_runner.py:213-226,319-335``).  The TPU
idiom here: params stay fp32, compute runs bf16, and "trainable_state" is a
*partition of the param tree* — gradients are only computed for the
trainable leaves, frozen leaves are closed over.
"""

from __future__ import annotations

from typing import Callable, Dict, Tuple

import flax
import jax
import optax

from ..models.unet import is_new_multiview_param

__all__ = [
    "trainable_predicate",
    "partition_params",
    "merge_params",
    "build_optimizer",
    "init_box_adapter_from_base",
]


def init_box_adapter_from_base(params):
    """Initialize adapter k/v projections from the frozen to_k/to_v weights
    (reference box_adapter.py:433-440)."""
    flat = dict(flax.traverse_util.flatten_dict(params))
    for k in list(flat):
        if k[-2] in ("to_k_box", "to_k_cls"):
            src = k[:-2] + ("to_k", k[-1])
            if src in flat and flat[src].shape == flat[k].shape:
                flat[k] = flat[src]
        elif k[-2] in ("to_v_box", "to_v_cls"):
            src = k[:-2] + ("to_v", k[-1])
            if src in flat and flat[src].shape == flat[k].shape:
                flat[k] = flat[src]
    return flax.traverse_util.unflatten_dict(flat)

Path = Tuple[str, ...]


def set_category_tokens(params: Dict, text_encoder, tokenizer,
                        class_names) -> Dict:
    """Initialize every controlnet's ``bbox_embedder/class_tokens`` with the
    pooled CLIP text embedding of each class name (reference
    ``bbox_embedder.py:132-145`` ``set_category_token``, invoked from the
    runner at ``multiview_runner.py:340-353``).  Uses the (frozen)
    ``params['text_encoder']`` already in the tree; embedders whose class
    count does not match ``len(class_names)`` (e.g. map-vec) are skipped.
    Returns the updated tree.
    """
    import logging

    import jax
    import numpy as np

    ids = np.asarray(tokenizer(list(class_names)), np.int32)
    _, pooled = jax.jit(
        lambda p, i: text_encoder.apply({"params": p}, i)
    )(params["text_encoder"], ids)  # (C, hidden)
    for key, sub in params.items():
        if not key.startswith("controlnet"):
            continue
        be = sub.get("bbox_embedder")
        if not isinstance(be, dict) or "class_tokens" not in be:
            continue
        tok = be["class_tokens"]
        if tuple(tok.shape) == tuple(pooled.shape):
            be["class_tokens"] = pooled.astype(tok.dtype)
            logging.getLogger(__name__).info(
                "%s/bbox_embedder/class_tokens <- pooled CLIP text "
                "embeddings of %d class names", key, len(class_names))
        else:
            logging.getLogger(__name__).info(
                "%s/bbox_embedder/class_tokens shape %s != %s: left as-is",
                key, tuple(tok.shape), tuple(pooled.shape))
    return params


def trainable_predicate(
    unet_trainable_state: str = "only_new",
    trainable_class_token: bool = False,
) -> Callable[[Path], bool]:
    """Predicate over top-level-prefixed param paths:
    ('unet', ...), ('controlnet_0', ...), ('vae', ...), ('text_encoder', ...)."""

    def pred(path: Path) -> bool:
        root = path[0]
        if unet_trainable_state == "lora_only" and not root == "unet":
            return False  # stage 2 freezes the controlnets too
        if root.startswith("controlnet"):
            if "class_tokens" in path and not trainable_class_token:
                return False  # frozen CLIP-initialized class tokens
            return True
        if root == "unet":
            if unet_trainable_state == "all":
                return True
            if unet_trainable_state == "lora_only":
                # RGD stage 2: only LoRA adapters train (arXiv 2505.01857)
                return any("lora" in part for part in path)
            return is_new_multiview_param(path[1:])
        return False  # vae, text_encoder

    return pred


def partition_params(params: Dict, pred: Callable[[Path], bool]):
    """-> (trainable, frozen) flat-path dicts (flax traverse format)."""
    flat = flax.traverse_util.flatten_dict(params)
    train = {k: v for k, v in flat.items() if pred(k)}
    frozen = {k: v for k, v in flat.items() if not pred(k)}
    return (
        flax.traverse_util.unflatten_dict(train),
        flax.traverse_util.unflatten_dict(frozen),
    )


def merge_params(trainable: Dict, frozen: Dict) -> Dict:
    flat = dict(flax.traverse_util.flatten_dict(frozen))
    flat.update(flax.traverse_util.flatten_dict(trainable))
    return flax.traverse_util.unflatten_dict(flat)


def build_optimizer(cfg_runner, max_train_steps: int):
    """AdamW + global-norm clip + warmup-cosine/constant schedule (reference
    ``multiview_runner.py:244-289``)."""
    warmup = int(cfg_runner.lr_warmup_steps)
    peak = float(cfg_runner.learning_rate)
    kind = str(cfg_runner.lr_scheduler)
    if kind == "cosine":
        sched = optax.warmup_cosine_decay_schedule(
            0.0, peak, warmup, max(max_train_steps, warmup + 1), end_value=0.0)
    elif kind == "constant_with_warmup":
        sched = optax.join_schedules(
            [optax.linear_schedule(0.0, peak, warmup),
             optax.constant_schedule(peak)], [warmup])
    else:
        sched = optax.constant_schedule(peak)
    # low-precision first moment: the TPU analog of the reference's optional
    # AdamW8bit (base_runner.py:221-231) — frees ~1.7GB HBM on the
    # dual-branch config (which otherwise overflows a v5e by ~80MB)
    mu_dtype = {"bf16": "bfloat16", "fp32": None}.get(
        str(cfg_runner.get("adam_mu_dtype", "bf16")), None)
    tx = optax.chain(
        optax.clip_by_global_norm(float(cfg_runner.max_grad_norm)),
        optax.adamw(
            sched,
            b1=float(cfg_runner.adam_beta1),
            b2=float(cfg_runner.adam_beta2),
            eps=float(cfg_runner.adam_epsilon),
            weight_decay=float(cfg_runner.adam_weight_decay),
            mu_dtype=mu_dtype,
        ),
    )
    if int(cfg_runner.gradient_accumulation_steps) > 1:
        tx = optax.MultiSteps(
            tx, every_k_schedule=int(cfg_runner.gradient_accumulation_steps))
    return tx, sched
