"""Legacy loss registry (reference optim/loss/loss.py:1-135, ulip_loss.py:12-49).

MSR3D itself computes its CE loss inside the model (model/msr3d/msr3d.py:426-441),
so these losses only drive the legacy grounding/QA/pretrain heads — but they are
part of the reference's public surface (``get_losses`` + ``Loss`` + the
``LOSS_REGISTRY``), so we keep the same names and semantics in JAX.

Conventions mirrored from torch:
- ``F.cross_entropy(logits.permute(0,2,1), labels)`` == per-position CE over the
  class axis with labels of shape (B, N) — here logits stay (B, N, C) and we
  reduce over the last axis.
- ``reduction='sum' / batch`` for the multi-label BCE losses.
- ``ignore_index=-1`` for the masked-LM loss.
All functions take a ``data_dict`` (a plain dict of jnp arrays) and return a
scalar, exactly like the reference's free functions.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp

from msr3d_tpu.registry import LOSS_REGISTRY


# ---------------------------------------------------------------------------
# primitives


def _log_softmax_ce(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Per-example CE over the last axis of ``logits`` (no reduction).

    torch ``F.cross_entropy(x, y, reduction='none')`` equivalent for integer
    ``labels`` broadcast over leading dims.
    """
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]


def _bce_with_logits_sum(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """torch ``F.binary_cross_entropy_with_logits(..., reduction='sum')``."""
    # numerically-stable form: max(x,0) - x*t + log1p(exp(-|x|))
    x = logits
    t = targets.astype(logits.dtype)
    return jnp.sum(jnp.maximum(x, 0.0) - x * t + jnp.log1p(jnp.exp(-jnp.abs(x))))


# ---------------------------------------------------------------------------
# registered losses (reference optim/loss/loss.py:8-105; same names/keys)


def og3d_loss(data_dict):
    """Grounding CE over object logits (loss.py:8-9)."""
    labels = data_dict["tgt_object_id"].reshape(-1)
    return jnp.mean(_log_softmax_ce(data_dict["og3d_logits"], labels))


def og3d_multi_loss(data_dict):
    """Multi-target grounding BCE, summed / batch (loss.py:12-16)."""
    tgt = data_dict["tgt_object_id"]
    return _bce_with_logits_sum(data_dict["og3d_logits"], tgt) / float(tgt.shape[0])


def txt_cls_loss(data_dict):
    """Text→object-class CE (loss.py:19-20)."""
    labels = data_dict["tgt_object_label"].reshape(-1)
    return jnp.mean(_log_softmax_ce(data_dict["txt_cls_logits"], labels))


def txt_cls_multi_loss(data_dict):
    """Multi-label text classification BCE (loss.py:23-27)."""
    tgt = data_dict["tgt_object_label"]
    return _bce_with_logits_sum(data_dict["txt_cls_logits"], tgt) / float(tgt.shape[0])


def _masked_obj_cls(logits, labels, mask):
    """Per-object CE averaged over ``mask`` (loss.py:30-49 pattern)."""
    ce = _log_softmax_ce(logits, labels)  # (B, N)
    m = mask.astype(ce.dtype)
    return jnp.sum(ce * m) / jnp.sum(m)


def obj_cls_raw_loss(data_dict):
    return _masked_obj_cls(
        data_dict["obj_cls_raw_logits"], data_dict["obj_labels"], data_dict["obj_masks"]
    )


def obj_cls_pre_loss(data_dict):
    return _masked_obj_cls(
        data_dict["obj_cls_pre_logits"], data_dict["obj_labels"], data_dict["obj_masks"]
    )


def obj_cls_post_loss(data_dict):
    return _masked_obj_cls(
        data_dict["obj_cls_post_logits"], data_dict["obj_labels"], data_dict["obj_masks"]
    )


def answer_loss(data_dict):
    """QA answer-vocabulary BCE (loss.py:52-55)."""
    scores = data_dict["answer_scores"]
    return _bce_with_logits_sum(scores, data_dict["answer_label"]) / float(scores.shape[0])


def lm_cls_loss(data_dict):
    """Masked-LM CE with ignore_index=-1 (loss.py:58-61)."""
    labels = data_dict["masked_lm_labels"]
    valid = labels != -1
    safe = jnp.where(valid, labels, 0)
    ce = _log_softmax_ce(data_dict["txt_lm_cls_logits"], safe)
    m = valid.astype(ce.dtype)
    return jnp.sum(ce * m) / jnp.sum(m)


def _sem_masked_obj_cls(logits, labels, mask, sem_mask, *, masked: bool):
    """obj-cls CE over the (un)masked-semantics subset (loss.py:64-97)."""
    sem = sem_mask.astype(jnp.bool_)
    sel = jnp.logical_and(mask.astype(jnp.bool_), jnp.logical_not(sem) if masked else sem)
    ce = _log_softmax_ce(logits, labels)
    m = sel.astype(ce.dtype)
    return jnp.sum(ce * m) / jnp.sum(m)


def obj_cls_pre_loss_mask(data_dict):
    return _sem_masked_obj_cls(
        data_dict["obj_cls_pre_logits"], data_dict["obj_labels"],
        data_dict["obj_masks"], data_dict["obj_sem_masks"], masked=True,
    )


def obj_cls_pre_loss_unmask(data_dict):
    return _sem_masked_obj_cls(
        data_dict["obj_cls_pre_logits"], data_dict["obj_labels"],
        data_dict["obj_masks"], data_dict["obj_sem_masks"], masked=False,
    )


def obj_cls_post_loss_mask(data_dict):
    return _sem_masked_obj_cls(
        data_dict["obj_cls_post_logits"], data_dict["obj_labels"],
        data_dict["obj_masks"], data_dict["obj_sem_masks"], masked=True,
    )


def obj_cls_post_loss_unmask(data_dict):
    return _sem_masked_obj_cls(
        data_dict["obj_cls_post_logits"], data_dict["obj_labels"],
        data_dict["obj_masks"], data_dict["obj_sem_masks"], masked=False,
    )


def mse_loss(data_dict):
    """Image-reconstruction MSE (loss.py:100-103)."""
    diff = data_dict["pred_images"] - data_dict["target_images"]
    return jnp.mean(diff * diff)


_BUILTIN = {
    name: fn
    for name, fn in list(globals().items())
    if callable(fn) and name.endswith("_loss") and not name.startswith("_")
}
_BUILTIN.update(
    {
        "obj_cls_pre_loss_mask": obj_cls_pre_loss_mask,
        "obj_cls_pre_loss_unmask": obj_cls_pre_loss_unmask,
        "obj_cls_post_loss_mask": obj_cls_post_loss_mask,
        "obj_cls_post_loss_unmask": obj_cls_post_loss_unmask,
    }
)


def get_losses(
    data_dict: Dict, all_keys: List[str], selected_keys: List[str]
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Reference ``get_losses`` (loss.py:106-116): evaluate every loss in
    ``all_keys`` (module functions first, registry fallback), sum the
    ``selected_keys`` subset unless the model already wrote ``data_dict['loss']``."""
    all_losses: Dict[str, jnp.ndarray] = {}
    for k in all_keys:
        fn = _BUILTIN.get(k)
        if fn is None:
            fn = LOSS_REGISTRY.get(k)
            if isinstance(fn, type):
                fn = fn()
        all_losses[k] = fn(data_dict)
    selected = {k: all_losses[k] for k in selected_keys}
    total = data_dict["loss"] if "loss" in data_dict else sum(selected.values())
    all_losses["total_loss"] = total
    return total, all_losses


class Loss:
    """Reference ``Loss`` head (loss.py:119-135): config-selected loss bundle."""

    def __init__(self, cfg):
        self.all_keys = list(cfg.model.vis_loss_list)
        self.selected_keys = list(cfg.model.loss_list)

    def __call__(self, data_dict):
        return get_losses(data_dict, self.all_keys, self.selected_keys)


@LOSS_REGISTRY.register()
class ULIPWithImageLoss:
    """Tri-modal contrastive loss (reference optim/loss/ulip_loss.py:12-49):
    symmetric InfoNCE between pc↔text and pc↔image embeddings.

    The reference builds labels from the per-rank batch offset; under a JAX
    mesh the caller passes ``labels`` in ``outputs`` (the reference does too —
    ulip_loss.py:26) so no device-dependent state lives here.
    """

    def __call__(self, outputs):
        def norm(x):
            return x / jnp.linalg.norm(x, axis=-1, keepdims=True)

        pc = norm(outputs["pc_embed"])
        text = norm(outputs["text_embed"])
        image = norm(outputs["image_embed"])
        scale = outputs["logit_scale"]
        labels = outputs["labels"]

        def ce(logits):
            return jnp.mean(_log_softmax_ce(logits, labels))

        l_pt = scale * pc @ text.T
        l_pi = scale * pc @ image.T
        return (ce(l_pt) + ce(l_pt.T)) / 2 + (ce(l_pi) + ce(l_pi.T)) / 2


# ---------------------------------------------------------------------------
# no-decay parameter grouping (reference optim/utils.py:1-18)

_NO_DECAY_TOKENS = ("bias", "scale")  # flax: LayerNorm weight is 'scale'


def no_decay_mask(params) -> object:
    """optax weight-decay mask mirroring ``no_decay_param_group``
    (optim/utils.py:1-18): biases and LayerNorm params get wd=0.

    Returns a pytree of bools (True = apply weight decay) for
    ``optax.add_decayed_weights(..., mask=...)`` / ``optax.adamw(mask=...)``.
    """
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def decays(path) -> bool:
        keys = [getattr(p, "key", getattr(p, "name", "")) for p in path]
        return not any(any(tok in str(k) for tok in _NO_DECAY_TOKENS) for k in keys)

    leaves = {jax.tree_util.keystr(path): decays(path) for path, _ in flat}
    return jax.tree_util.tree_map_with_path(
        lambda path, _: leaves[jax.tree_util.keystr(path)], params
    )
