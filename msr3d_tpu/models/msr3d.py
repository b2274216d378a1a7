"""MSR3D — the full 3D-scene multimodal LLM (TPU-native).

Reference: model/msr3d/msr3d.py:42-655. Composition:

  visual_prompter (OSE3DSituation) ─▶ scene tokens ──llm_proj──▶ 4096-d ┐
  image encoder (ConvNeXt, avg-pool) ─▶ 1 tok/img ──llm_proj_img──▶ 4096┼▶ splice
  tokenizer(图/物/景 placeholders) ─▶ input ids ──embed_tokens──────────┘   │
                                                               LLM (LoRA) ─▶ CE / decode

Design split (TPU-first, not a port):
  - ``MSR3DNetwork`` (flax): ALL device compute — scene encoding, image
    encoding, placeholder splicing, LLM forward — one jit-able graph with
    static shapes. Placeholder splicing is a gather (cumsum-rank + where)
    instead of the reference's boolean scatter (msr3d.py:230-287): no
    dynamic shapes, fully vectorized.
  - ``MSR3D`` (host): prompt building (placeholder expansion,
    msr3d.py:291-326), tokenization into padded buckets, decode-loop
    orchestration. Registered under the reference's ``MSR3D`` name.

Loss parity (msr3d.py:370-441): answers tokenized with bos+eos, spliced
after the prompt; CE over answer tokens only (bos position masked),
normalized per sequence.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from msr3d_tpu.models.llm.llama import LlamaConfig, LlamaModel
from msr3d_tpu.models.llm.sampling import (
    beam_search_decode,
    beam_search_decode_shared,
    greedy_decode,
    greedy_decode_shared,
    ngram_speculative_decode,
)
from msr3d_tpu.models.llm.tokenizer import (
    BaseTokenizer,
    IMAGE_PLACEHOLDER,
    SCENE_PLACEHOLDER,
    build_tokenizer,
)
from msr3d_tpu.models.ose3d_situation import OSE3DConfig, OSE3DSituation
from msr3d_tpu.models.vision2d import Backbone2D
from msr3d_tpu.registry import MODEL_REGISTRY


@dataclasses.dataclass(frozen=True)
class MSR3DNetworkConfig:
    prompter: OSE3DConfig
    llm: LlamaConfig
    backbone_name: str = "convnext_base"
    image_pooling: str = "avg"
    freeze_image_encoder: bool = True
    scene_token_id: int = 6
    img_token_id: int = 4
    # training loss over the answer window only (exactly equal — prompt
    # targets are -100 — but the fp32 logits buffer shrinks T→T_out,
    # the activation-memory cap); off by default so tests/parity see
    # full-width logits
    answer_window_loss: bool = False


def splice_embeddings(
    token_embeds: jax.Array,  # (B, T, D)
    input_ids: jax.Array,  # (B, T)
    placeholder_id: int,
    insert_embeds: jax.Array,  # (B, N, D)
    insert_mask: Optional[jax.Array],  # (B, N) 1 = valid
    attention_mask: jax.Array,  # (B, T)
):
    """Replace embeddings at placeholder positions by rank-gather.

    The k-th occurrence of ``placeholder_id`` in a row receives
    ``insert_embeds[row, k]``; the attention mask at that position becomes
    ``insert_mask[row, k]``. Pure gather — static shapes, O(T) — replacing
    the reference's boolean-index scatter (msr3d.py:241-287).
    """
    is_ph = input_ids == placeholder_id  # (B, T)
    rank = jnp.cumsum(is_ph.astype(jnp.int32), axis=1) - 1  # (B, T)
    rank = jnp.clip(rank, 0, insert_embeds.shape[1] - 1)
    gathered = jnp.take_along_axis(
        insert_embeds, rank[..., None], axis=1
    )  # (B, T, D)
    embeds = jnp.where(is_ph[..., None], gathered.astype(token_embeds.dtype), token_embeds)
    if insert_mask is not None:
        gathered_mask = jnp.take_along_axis(insert_mask.astype(jnp.int32), rank, axis=1)
        attention_mask = jnp.where(is_ph, gathered_mask, attention_mask)
    return embeds, attention_mask


def build_targets(
    input_ids: jax.Array, output_ids: jax.Array, output_mask: jax.Array
) -> jax.Array:
    """CE targets: -100 everywhere except answer tokens; the first output
    position (bos) is conditioning, not predicted (msr3d.py:385-392)."""
    prompt_targets = jnp.full(input_ids.shape, -100, jnp.int32)
    answer_targets = jnp.where(output_mask.astype(bool), output_ids, -100)
    answer_targets = answer_targets.at[:, 0].set(-100)
    return jnp.concatenate([prompt_targets, answer_targets], axis=1)


def sequence_ce_loss_windowed(
    window_logits: jax.Array, targets: jax.Array, start: int
) -> jax.Array:
    """Per-sequence CE from logits covering only positions
    ``start-1 .. start-1+W`` (the answer window). Exactly equals
    :func:`sequence_ce_loss` on full-width logits because every target
    outside the window is -100 (prompt positions, msr3d.py:385-392) —
    but the fp32 logits/log-softmax buffers shrink from T to W, the
    memory that caps training micro-batch size."""
    w = window_logits.shape[1]
    shift_targets = targets[:, start : start + w]
    valid = shift_targets >= 0
    safe_targets = jnp.where(valid, shift_targets, 0)
    logp = jax.nn.log_softmax(window_logits, axis=-1)
    token_nll = -jnp.take_along_axis(logp, safe_targets[..., None], axis=-1)[..., 0]
    token_nll = jnp.where(valid, token_nll, 0.0)
    num_tokens = jnp.maximum(jnp.sum(valid, axis=1), 1)
    return jnp.sum(token_nll, axis=1) / num_tokens


def sequence_ce_loss(logits: jax.Array, targets: jax.Array) -> jax.Array:
    """Per-sequence mean CE over target positions ≥ 0 (msr3d.py:426-441).
    ``logits`` fp32 (B, T, V); returns (B,)."""
    shift_logits = logits[:, :-1]
    shift_targets = targets[:, 1:]
    valid = shift_targets >= 0
    safe_targets = jnp.where(valid, shift_targets, 0)
    logp = jax.nn.log_softmax(shift_logits, axis=-1)
    token_nll = -jnp.take_along_axis(logp, safe_targets[..., None], axis=-1)[..., 0]
    token_nll = jnp.where(valid, token_nll, 0.0)
    num_tokens = jnp.maximum(jnp.sum(valid, axis=1), 1)
    return jnp.sum(token_nll, axis=1) / num_tokens


class MSR3DNetwork(nn.Module):
    cfg: MSR3DNetworkConfig

    def setup(self):
        self.visual_prompter = OSE3DSituation(self.cfg.prompter)
        self.llm = LlamaModel(self.cfg.llm)
        self.llm_proj = nn.Dense(self.cfg.llm.hidden_size)
        self.image_encoder = Backbone2D(
            backbone_name=self.cfg.backbone_name,
            pooling=self.cfg.image_pooling,
            freeze=self.cfg.freeze_image_encoder,
        )
        self.llm_proj_img = nn.Dense(self.cfg.llm.hidden_size)

    # -- shared embedding construction ----------------------------------

    def build_embeds(
        self,
        input_ids: jax.Array,  # (B, T)
        attention_mask: jax.Array,  # (B, T)
        obj_fts: jax.Array,
        obj_masks: jax.Array,
        obj_locs: jax.Array,
        anchor_locs: jax.Array,
        anchor_orientation: jax.Array,
        images: Optional[jax.Array] = None,  # (B, M, H, W, 3)
        image_masks: Optional[jax.Array] = None,  # (B, M)
        *,
        deterministic: bool = True,
    ):
        scene = self.visual_prompter(
            obj_fts, obj_masks, obj_locs, anchor_locs, anchor_orientation,
            deterministic=deterministic,
        )
        scene_embeds = self.llm_proj(scene["obj_tokens"])  # (B, N, D_llm)

        embeds = self.llm.embed_tokens(input_ids)
        embeds, attention_mask = splice_embeddings(
            embeds, input_ids, self.cfg.scene_token_id,
            scene_embeds, scene["obj_masks"], attention_mask,
        )

        if images is not None:
            b, m = images.shape[:2]
            flat = images.reshape((b * m,) + images.shape[2:])
            img_feats = self.image_encoder(flat)  # (B·M, C)
            img_embeds = self.llm_proj_img(img_feats).reshape(b, m, -1)
            embeds, attention_mask = splice_embeddings(
                embeds, input_ids, self.cfg.img_token_id,
                img_embeds, image_masks, attention_mask,
            )
        return embeds, attention_mask

    # -- training loss ---------------------------------------------------

    def embeds_for_loss(
        self,
        input_ids: jax.Array,
        attention_mask: jax.Array,
        output_ids: jax.Array,  # (B, T_out) right-padded, bos ... eos
        output_mask: jax.Array,  # (B, T_out)
        obj_fts: jax.Array,
        obj_masks: jax.Array,
        obj_locs: jax.Array,
        anchor_locs: jax.Array,
        anchor_orientation: jax.Array,
        images: Optional[jax.Array] = None,
        image_masks: Optional[jax.Array] = None,
        *,
        deterministic: bool = True,
    ):
        """Everything before the LLM blocks: spliced prompt+answer embeds,
        joint attention mask, CE targets. Split out so the pipeline-
        parallel trainer (parallel/llm_pp.py) reuses the exact same
        prompt/target semantics around its own block execution."""
        embeds, attn = self.build_embeds(
            input_ids, attention_mask, obj_fts, obj_masks, obj_locs,
            anchor_locs, anchor_orientation, images, image_masks,
            deterministic=deterministic,
        )
        out_embeds = self.llm.embed_tokens(output_ids)
        full_embeds = jnp.concatenate([embeds, out_embeds], axis=1)
        full_attn = jnp.concatenate([attn, output_mask], axis=1)
        targets = build_targets(input_ids, output_ids, output_mask)
        return full_embeds, full_attn, targets

    def __call__(
        self,
        input_ids: jax.Array,
        attention_mask: jax.Array,
        output_ids: jax.Array,  # (B, T_out) right-padded, bos ... eos
        output_mask: jax.Array,  # (B, T_out)
        obj_fts: jax.Array,
        obj_masks: jax.Array,
        obj_locs: jax.Array,
        anchor_locs: jax.Array,
        anchor_orientation: jax.Array,
        images: Optional[jax.Array] = None,
        image_masks: Optional[jax.Array] = None,
        *,
        deterministic: bool = True,
    ) -> Dict[str, jax.Array]:
        full_embeds, full_attn, targets = self.embeds_for_loss(
            input_ids, attention_mask, output_ids, output_mask, obj_fts,
            obj_masks, obj_locs, anchor_locs, anchor_orientation, images,
            image_masks, deterministic=deterministic,
        )
        if self.cfg.answer_window_loss:
            start = input_ids.shape[1]
            logits, _, _ = self.llm(
                full_embeds, full_attn, deterministic=deterministic,
                answer_start=start,
            )
            logits = logits.astype(jnp.float32)
            seq_loss = sequence_ce_loss_windowed(logits, targets, start)
            return {"loss": seq_loss, "logits": logits}
        logits, _, _ = self.llm(full_embeds, full_attn, deterministic=deterministic)
        logits = logits.astype(jnp.float32)
        seq_loss = sequence_ce_loss(logits, targets)
        return {"loss": seq_loss, "logits": logits}

    # -- generation ------------------------------------------------------

    def prefill(
        self,
        input_ids: jax.Array,
        attention_mask: jax.Array,
        obj_fts: jax.Array,
        obj_masks: jax.Array,
        obj_locs: jax.Array,
        anchor_locs: jax.Array,
        anchor_orientation: jax.Array,
        images: Optional[jax.Array] = None,
        image_masks: Optional[jax.Array] = None,
        *,
        bos_id: int,
        max_cache_len: int,
        append_bos: bool = True,
    ):
        """Build spliced embeds + trailing bos, prefill the KV cache.

        Returns (first_token_logits (B,V) fp32, kv_caches, cache_mask,
        next_positions). ``append_bos=False`` prefillls a PREFIX segment
        (grouped scene serving): the trailing bos belongs after the
        per-question suffix, not after the shared prefix.
        """
        embeds, attn = self.build_embeds(
            input_ids, attention_mask, obj_fts, obj_masks, obj_locs,
            anchor_locs, anchor_orientation, images, image_masks,
        )
        b = embeds.shape[0]
        if append_bos:
            bos_embed = self.llm.embed_tokens(
                jnp.full((b, 1), bos_id, jnp.int32)
            )
            embeds = jnp.concatenate([embeds, bos_embed], axis=1)
            attn = jnp.concatenate(
                [attn, jnp.ones((b, 1), attn.dtype)], axis=1
            )

        logits, _, caches, cache_mask, next_pos = self.llm.prefill_with_cache(
            embeds, attn, max_cache_len, logits_last_only=True
        )
        first = logits[:, -1, :].astype(jnp.float32)
        return first, caches, cache_mask, next_pos

    def decode_step(
        self, token_ids, positions, kv_caches, cache_index, cache_mask
    ):
        embeds = self.llm.embed_tokens(token_ids)
        logits, _, new_caches = self.llm(
            embeds, jnp.ones_like(token_ids),
            positions=positions, kv_caches=kv_caches, cache_index=cache_index,
            cache_mask=cache_mask,
        )
        return logits, new_caches

    def decode_step_shared(
        self, token_ids, positions, prompt_kv, prompt_mask, gen_kv,
        gen_index, gen_mask, window_valid=None,
    ):
        """Split-cache decode step: shared prompt KV (batch B) + per-beam
        generated KV (batch B·K). See LlamaModel.decode_step_shared."""
        embeds = self.llm.embed_tokens(token_ids)
        return self.llm.decode_step_shared(
            embeds, positions, prompt_kv, prompt_mask, gen_kv, gen_index,
            gen_mask, window_valid,
        )

    def decode_step_beam_anc(
        self, token_ids, positions, prompt_kv, prompt_mask, gen_kv,
        gen_index, gen_mask, anc, num_beams,
    ):
        """Beam decode step with ancestry-indirected generated KV (rows
        never reorder). See LlamaModel.decode_step_beam_anc."""
        embeds = self.llm.embed_tokens(token_ids)
        return self.llm.decode_step_beam_anc(
            embeds, positions, prompt_kv, prompt_mask, gen_kv, gen_index,
            gen_mask, anc, num_beams,
        )


# ---------------------------------------------------------------------------
# Host-side model: prompts, tokenization, decode orchestration
# ---------------------------------------------------------------------------


@MODEL_REGISTRY.register(name="MSR3D")
class MSR3D:
    """Host wrapper with the reference's model contract:
    ``forward(data_dict) → data_dict['loss']``,
    ``generate(data_dict) → data_dict['output_tokens']``.
    """

    def __init__(
        self,
        network_cfg: MSR3DNetworkConfig,
        tokenizer: Optional[BaseTokenizer] = None,
        *,
        scene_token_len: int = 60,
        image_token_len: int = 1,
        max_context_len: int = 256,
        max_out_len: int = 256,
        prompt_pad_to: int = 256,
        num_beams: int = 5,
        repetition_penalty: float = 3.0,
        length_penalty: float = 1.0,
        beam_ancestry: bool = True,  # ancestry-indirected beam KV: no
        # per-step generated-cache gather (and no double-buffered carry
        # copy of it — the 256-token-budget beam memory wall); token-
        # identical to the reorder path (tested); measured +32% at the
        # beam-5 record config and 4.4× the 256-budget ceiling, so ON by
        # default — False restores the physically-reordered cache
        layered_gen_cache: bool = False,  # greedy split-cache decode with
        # the per-layer gen-KV layout (tuple of per-layer dicts): layer
        # writes alias their carry leaf in place instead of the stacked
        # layout's slice/re-stack full-cache copy per step — a 256-token-
        # budget batch-ceiling lever; token-identical (tested)
        compact_transfer: bool = False,
        eos_logit_bias: float = 0.0,  # length-control serving knob
        spec_k: int = 0,  # greedy path: n-gram speculative decoding —
        # draft tokens proposed per verify window (0 = off). Token-
        # identical to plain greedy; requires repetition_penalty == 1.0
        # (greedy serving runs penalty-free; the reference's penalty 3.0
        # applies to its beam-5 eval setting)
        spec_ngram: int = 3,  # suffix n-gram length for proposal lookup
        do_sample: bool = False,  # greedy path: sample from the warped
        # distribution instead of argmax (HF do_sample semantics)
        temperature: float = 1.0,
        top_k: int = 0,
        top_p: float = 1.0,
        sample_seed: int = 0,
        seed: int = 0,
    ):
        self.tokenizer = tokenizer or build_tokenizer()
        network_cfg = dataclasses.replace(
            network_cfg,
            scene_token_id=self.tokenizer.scene_token_id,
            img_token_id=self.tokenizer.img_token_id,
        )
        self.cfg = network_cfg
        self.network = MSR3DNetwork(network_cfg)
        # Generation/serving paths apply a remat-STRIPPED twin: remat
        # only trades memory for recompute under differentiation, so in
        # forward-only prefill/decode it buys nothing — and the
        # nn.remat-wrapped block's static_argnums contract does not
        # admit the prefill/decode call signatures (a remat=True
        # TRAINING config reaching generate() crashed the round-5 7B
        # overfit run). Same parameter pytree: nn.remat is a lifted
        # transform and does not change parameter structure.
        if network_cfg.llm.remat:
            self.gen_network = MSR3DNetwork(dataclasses.replace(
                network_cfg,
                llm=dataclasses.replace(network_cfg.llm, remat=False),
            ))
        else:
            self.gen_network = self.network
        self.scene_token_len = scene_token_len
        self.image_token_len = image_token_len
        self.max_context_len = max_context_len
        self.max_out_len = max_out_len
        self.prompt_pad_to = prompt_pad_to
        self.num_beams = num_beams
        self.repetition_penalty = repetition_penalty
        self.length_penalty = length_penalty
        self.beam_ancestry = bool(beam_ancestry)
        self.layered_gen_cache = bool(layered_gen_cache)
        self.eos_logit_bias = eos_logit_bias
        if spec_k > 0 and repetition_penalty != 1.0:
            raise ValueError(
                "speculative greedy (spec_k > 0) requires "
                "repetition_penalty == 1.0 — the penalty serializes "
                "verification (pick t depends on in-window acceptance)"
            )
        self.spec_k = int(spec_k)
        self.spec_ngram = int(spec_ngram)
        if do_sample and spec_k > 0:
            raise ValueError(
                "do_sample and spec_k are mutually exclusive — n-gram "
                "verification accepts drafts against the argmax pick"
            )
        self.do_sample = bool(do_sample)
        self.temperature = float(temperature)
        self.top_k = int(top_k)
        self.top_p = float(top_p)
        self.sample_seed = int(sample_seed)
        self._sample_calls = 0  # per-call rng fold so batches differ
        # serving knob: ship obj_fts over the host↔device link as
        # int16 xyz + int8 rgb (9 B/point vs 24 B fp32). Points are
        # unit-sphere normalized by preprocess_pcd so a fixed 1.0 scale
        # holds; xyz resolution 3e-5 and rgb 1/127 are both below the
        # source data's own precision (rgb starts life as 8-bit).
        self.compact_transfer = compact_transfer
        self._seed = seed
        self.params: Optional[Dict[str, Any]] = None
        self._loss_fn = None
        self._prefill_fn = None
        self._decode_fn = None

    # -- init / params ----------------------------------------------------

    def init_params(self, sample_batch: Dict[str, np.ndarray]) -> Dict[str, Any]:
        # jit the init: eager op-by-op dispatch is pathologically slow on
        # remote-dispatch TPU runtimes
        init_fn = jax.jit(lambda rng, b: self.network.init(rng, **b))
        variables = init_fn(jax.random.key(self._seed), _to_jax(sample_batch))
        self.params = variables
        return variables

    # -- prompt building (msr3d.py:291-326) -------------------------------

    def build_text_prompt(self, data_dict: Dict[str, Any]) -> List[str]:
        scene_holder = SCENE_PLACEHOLDER * self.scene_token_len
        image_holder = IMAGE_PLACEHOLDER * self.image_token_len

        if "msr3d_prompt" in data_dict:
            return [
                p.replace(SCENE_PLACEHOLDER, scene_holder).replace(
                    IMAGE_PLACEHOLDER, image_holder
                )
                for p in data_dict["msr3d_prompt"]
            ]
        # LEO-format prompts (prompt_before_obj / middles / after_obj)
        prompts = []
        for before, mid1, mid2, after in zip(
            data_dict["prompt_before_obj"],
            data_dict["prompt_middle_1"],
            data_dict["prompt_middle_2"],
            data_dict["prompt_after_obj"],
        ):
            prompts.append(
                f"{before} {mid1}{image_holder}. {mid2} {scene_holder}. {after}"
            )
        return prompts

    def _encode_prompts(self, prompts: List[str]):
        enc = self.tokenizer.encode_batch(
            prompts, padding_side="left", add_bos=True, pad_to=None
        )
        return enc.input_ids, enc.attention_mask

    def _encode_answers(self, answers: List[str]):
        enc = self.tokenizer.encode_batch(
            answers, padding_side="right", add_bos=True, add_eos=True,
            max_length=self.max_out_len, truncation_side="right",
        )
        return enc.input_ids, enc.attention_mask

    def _scene_batch(self, data_dict: Dict[str, Any]) -> Dict[str, np.ndarray]:
        batch = {
            "obj_fts": np.asarray(data_dict["obj_fts"], np.float32),
            "obj_masks": np.asarray(data_dict["obj_masks"], bool),
            "obj_locs": np.asarray(data_dict["obj_locs"], np.float32),
            "anchor_locs": np.asarray(data_dict["anchor_locs"], np.float32),
            "anchor_orientation": np.asarray(
                data_dict["anchor_orientation"], np.float32
            ),
        }
        if "msr3d_imgs" in data_dict and data_dict["msr3d_imgs"] is not None:
            batch["images"] = np.asarray(data_dict["msr3d_imgs"], np.float32)
            batch["image_masks"] = np.asarray(data_dict["msr3d_img_masks"], bool)
        elif "img_fts" in data_dict and data_dict["img_fts"] is not None:
            # LEO-format single ego-view image (msr3d.py:246-268): one 图 per
            # prompt; the splice masks its attention slot when img_masks=0
            imgs = np.asarray(data_dict["img_fts"], np.float32)
            if imgs.ndim == 4:  # (B, H, W, 3) → (B, 1, H, W, 3)
                imgs = imgs[:, None]
            batch["images"] = imgs
            batch["image_masks"] = np.asarray(
                data_dict.get("img_masks", np.ones(imgs.shape[:2], bool)), bool
            ).reshape(imgs.shape[0], imgs.shape[1])
        return batch

    # -- reference contract -----------------------------------------------

    def forward(self, data_dict: Dict[str, Any]) -> Dict[str, Any]:
        assert self.params is not None, "call init_params or load weights first"
        prompts = self.build_text_prompt(data_dict)
        input_ids, attn = self._encode_prompts(prompts)
        output_ids, output_mask = self._encode_answers(data_dict["text_output"])
        # bucket widths to multiples of 32 so direct forward() callers don't
        # recompile per prompt/answer width (loss is mask-weighted, so the
        # pad columns are inert): left-pad prompts, right-pad answers
        input_ids, attn = self._pad_to_bucket(input_ids, attn, side="left")
        output_ids, output_mask = self._pad_to_bucket(
            output_ids, output_mask, side="right"
        )
        batch = self._scene_batch(data_dict)
        batch.update(
            input_ids=input_ids, attention_mask=attn,
            output_ids=output_ids, output_mask=output_mask,
        )
        if self._loss_fn is None:
            self._loss_fn = jax.jit(
                lambda v, b: self.network.apply(v, **b)
            )
        out = self._loss_fn(self.params, _to_jax(batch))
        data_dict["loss"] = out["loss"]
        return data_dict

    def _pad_to_bucket(self, ids, mask, *, side: str):
        """Pad token ids + mask to the next multiple of 32 (one compiled
        program per width bucket instead of per width). Pads with
        ``pad_id``/mask 0, which every consumer masks out."""
        pad_to = max(32, -(-ids.shape[1] // 32) * 32)
        if ids.shape[1] >= pad_to:
            return ids, mask
        b = ids.shape[0]
        pad_ids = np.full((b, pad_to - ids.shape[1]), self.tokenizer.pad_id, ids.dtype)
        pad_mask = np.zeros((b, pad_to - ids.shape[1]), mask.dtype)
        if side == "left":
            return (np.concatenate([pad_ids, ids], axis=1),
                    np.concatenate([pad_mask, mask], axis=1))
        return (np.concatenate([ids, pad_ids], axis=1),
                np.concatenate([mask, pad_mask], axis=1))

    def shard_for_serving(
        self, mesh, dp_axis: str = "dp", *, tensor_parallel: bool = False
    ) -> None:
        """Serve over a device mesh (the v5e-8 deployment path).

        Every ``generate``/``generate_async`` batch is sharded over
        ``dp_axis`` along its leading axis, so the compiled generate runs
        SPMD with XLA-inserted collectives. Batch size must be divisible
        by the dp axis size.

        ``tensor_parallel=True`` additionally spreads the LLM weights
        megatron-style over the mesh's model axis
        (`parallel/sharding.py` layouts — q/k/v/gate/up column-, o/down
        row-sharded) for models too big per chip; otherwise params are
        replicated. Token outputs are identical to single-device (tested
        on the virtual CPU mesh for both modes)."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        assert self.params is not None, "init or load params first"
        self._serving_mesh = mesh
        self._serving_dp_axis = dp_axis
        if tensor_parallel:
            from msr3d_tpu.parallel.sharding import shard_variables

            self.params = shard_variables(mesh, self.params)
        else:
            self.params = jax.device_put(self.params, NamedSharding(mesh, P()))
        # compiled programs trace on input shardings — drop any
        # single-device-compiled generate fns
        self._generate_cache = {}

    def _maybe_pack(self, batch: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
        """compact_transfer: obj_fts (…,6) fp32 → int16 xyz + int8 rgb
        (9 B/point vs 24). Unpacked on device inside the generate jit."""
        if not self.compact_transfer or "obj_fts" not in batch:
            return batch
        fts = batch.pop("obj_fts")
        batch["obj_fts_xyz_q"] = np.clip(
            np.round(fts[..., :3] * 32767.0), -32767, 32767
        ).astype(np.int16)
        batch["obj_fts_rgb_q"] = np.clip(
            np.round(fts[..., 3:6] * 127.0), -127, 127
        ).astype(np.int8)
        return batch

    @staticmethod
    def _unpack_batch(batch):
        """Device-side inverse of _maybe_pack (traced inside the jit)."""
        if "obj_fts_xyz_q" not in batch:
            return batch
        batch = dict(batch)
        xyz = batch.pop("obj_fts_xyz_q").astype(jnp.float32) * (1.0 / 32767.0)
        rgb = batch.pop("obj_fts_rgb_q").astype(jnp.float32) * (1.0 / 127.0)
        batch["obj_fts"] = jnp.concatenate([xyz, rgb], axis=-1)
        return batch

    def _make_generate_fn(
        self, prompt_len: int, max_new: int, beams: int, sample: bool = False
    ):
        """Build ONE jitted function running prefill + the full decode loop
        on device (no host round-trips per token). With ``sample`` the
        function takes a PRNG key and the greedy loop samples from the
        temperature/top-k/top-p-warped distribution instead of argmax."""
        network = self.gen_network
        cache_len = prompt_len + max_new
        bos_id = self.tokenizer.bos_id
        eos_id = self.tokenizer.eos_id
        common = dict(
            max_new_tokens=max_new,
            eos_id=eos_id,
            pad_id=eos_id,  # pad with eos (msr3d.py:515-519)
            prompt_len=prompt_len,
            min_length=1,
            repetition_penalty=self.repetition_penalty,
        )
        length_penalty = self.length_penalty

        llm_cfg = self.cfg.llm
        sample_kw = (
            dict(
                temperature=self.temperature,
                top_k=self.top_k,
                top_p=self.top_p,
            )
            if sample
            else {}
        )

        @jax.jit
        def generate_fn(variables, batch, sample_key=None):
            from msr3d_tpu.models.llm.llama import _make_cache

            batch = MSR3D._unpack_batch(batch)
            if beams > 1:
                # split cache: prefill only the prompt segment (shared across
                # beams); the per-beam generated segment starts empty
                first, prompt_kv, prompt_mask, next_pos = network.apply(
                    variables, **batch, bos_id=bos_id, max_cache_len=prompt_len,
                    method=network.prefill,
                )
                bk = first.shape[0] * beams
                if self.beam_ancestry:
                    # per-layer cache layout: each layer's decode write
                    # aliases its own carry leaf in place — the stacked
                    # (L, …) layout's slice/re-stack round trip copies
                    # the whole generated cache every step
                    stacked = _make_cache(llm_cfg, bk, max_new)
                    gen_kv = tuple(
                        {key: val[i] for key, val in stacked.items()}
                        for i in range(llm_cfg.num_hidden_layers)
                    )
                else:
                    gen_kv = _make_cache(llm_cfg, bk, max_new)

                def decode_shared(token_ids, positions, gkv, gidx, gmask):
                    return network.apply(
                        variables, token_ids, positions, prompt_kv,
                        prompt_mask, gkv, gidx, gmask,
                        method=network.decode_step_shared,
                    )

                def decode_anc(token_ids, positions, gkv, gidx, gmask, anc):
                    return network.apply(
                        variables, token_ids, positions, prompt_kv,
                        prompt_mask, gkv, gidx, gmask, anc, beams,
                        method=network.decode_step_beam_anc,
                    )

                return beam_search_decode_shared(
                    decode_shared, next_pos, first, gen_kv,
                    num_beams=beams, length_penalty=length_penalty,
                    max_new_tokens=max_new, eos_id=eos_id, pad_id=eos_id,
                    min_length=1, repetition_penalty=self.repetition_penalty,
                    eos_logit_bias=self.eos_logit_bias,
                    decode_step_anc=decode_anc if self.beam_ancestry else None,
                )

            # greedy uses the split cache too: the prompt segment is a
            # loop-invariant operand (the monolithic layout incurred a
            # full-cache layout copy at loop entry and a double-buffered
            # carry — the HBM ceiling at batch ≥64)
            first, prompt_kv, prompt_mask, next_pos = network.apply(
                variables, **batch, bos_id=bos_id, max_cache_len=prompt_len,
                method=network.prefill,
            )
            gen_kv = _make_cache(llm_cfg, first.shape[0], max_new)
            if self.layered_gen_cache and self.spec_k == 0:
                # per-layer layout: decode writes alias their own carry
                # leaf (no stacked slice/re-stack full-cache copy)
                gen_kv = tuple(
                    {key: val[i] for key, val in gen_kv.items()}
                    for i in range(llm_cfg.num_hidden_layers)
                )

            def decode_shared(token_ids, positions, gkv, gidx, gmask):
                return network.apply(
                    variables, token_ids, positions, prompt_kv,
                    prompt_mask, gkv, gidx, gmask,
                    method=network.decode_step_shared,
                )

            if self.spec_k > 0:
                # n-gram speculative decoding over the same split cache:
                # slot base 0 in the generated segment, prompt slots live
                # in the loop-invariant prompt_kv. Token-identical to the
                # greedy_decode_shared path (verified by construction +
                # tests/test_speculative.py).
                tokens, stats = ngram_speculative_decode(
                    decode_shared, gen_kv,
                    jnp.zeros((first.shape[0], max_new), bool),
                    next_pos, first, batch["input_ids"],
                    max_new_tokens=max_new, eos_id=eos_id, pad_id=eos_id,
                    prompt_len=0, spec_k=self.spec_k,
                    ngram_n=self.spec_ngram, min_length=1,
                    eos_logit_bias=self.eos_logit_bias,
                    return_stats=True,
                )
                return tokens, stats
            return greedy_decode_shared(
                decode_shared, next_pos, first,
                gen_kv, max_new_tokens=max_new, eos_id=eos_id, pad_id=eos_id,
                min_length=1, repetition_penalty=self.repetition_penalty,
                eos_logit_bias=self.eos_logit_bias,
                sample_key=sample_key if sample else None,
                **sample_kw,
            )

        return generate_fn

    def generate(
        self,
        data_dict: Dict[str, Any],
        *,
        use_beam: Optional[bool] = None,
        max_new_tokens: Optional[int] = None,
    ) -> Dict[str, Any]:
        """Blocking generate — exactly ``generate_async(...)()``."""
        return self.generate_async(
            data_dict, use_beam=use_beam, max_new_tokens=max_new_tokens
        )()

    def generate_async(
        self,
        data_dict: Dict[str, Any],
        *,
        use_beam: Optional[bool] = None,
        max_new_tokens: Optional[int] = None,
    ):
        """Non-blocking ``generate``: dispatches the device program and
        returns a ``finalize()`` callable that fetches tokens and
        detokenizes. Lets a serving loop overlap the next request's host
        work + dispatch with the current request's device compute and
        result transfer (the standard request-pipelining pattern)."""
        assert self.params is not None
        prompts = self.build_text_prompt(data_dict)
        input_ids, attn = self._encode_prompts(prompts)
        # bucket prompt width to limit recompiles across batches
        input_ids, attn = self._pad_to_bucket(input_ids, attn, side="left")
        batch = self._maybe_pack(self._scene_batch(data_dict))
        max_new = max_new_tokens or self.max_out_len
        prompt_len = input_ids.shape[1] + 1
        beams = self.num_beams if use_beam is None else (self.num_beams if use_beam else 1)
        sample = self.do_sample and beams == 1
        if self.do_sample and beams > 1:
            raise ValueError(
                "do_sample requires the greedy path (num_beams == 1 or "
                "use_beam=False) — beam-sampling is not supported"
            )
        if sample and self.spec_k > 0:
            raise ValueError(
                "do_sample and spec_k are mutually exclusive — n-gram "
                "verification accepts drafts against the argmax pick"
            )
        key = (prompt_len, max_new, beams, input_ids.shape[0],
               tuple(sorted(batch)), self.eos_logit_bias, self.spec_k,
               self.spec_ngram, self.beam_ancestry, self.layered_gen_cache,
               (self.temperature, self.top_k, self.top_p) if sample else None)
        if not hasattr(self, "_generate_cache"):
            self._generate_cache = {}
        if key not in self._generate_cache:
            self._generate_cache[key] = self._make_generate_fn(
                prompt_len, max_new, beams, sample=sample
            )
        device_batch = _to_jax({"input_ids": input_ids, "attention_mask": attn, **batch})
        if getattr(self, "_serving_mesh", None) is not None:
            # dp-sharded serving: batch rows spread over the mesh's data
            # axis; params are already replicated (shard_for_serving), so
            # jit runs the whole generate SPMD with GSPMD-inserted
            # collectives — same tokens as single-device (tested)
            from jax.sharding import NamedSharding, PartitionSpec as P

            sharding = NamedSharding(self._serving_mesh, P(self._serving_dp_axis))
            device_batch = {
                k: jax.device_put(v, sharding) for k, v in device_batch.items()
            }
        if sample:
            rng = jax.random.fold_in(
                jax.random.PRNGKey(self.sample_seed), self._sample_calls
            )
            self._sample_calls += 1
            out = self._generate_cache[key](self.params, device_batch, rng)
        else:
            out = self._generate_cache[key](self.params, device_batch)
        tokens, spec_stats = out if isinstance(out, tuple) else (out, None)

        def finalize() -> Dict[str, Any]:
            data_dict["output_tokens"] = np.asarray(tokens)
            data_dict["output_text"] = self.batch_detokenize(data_dict["output_tokens"])
            if spec_stats is not None:
                # emitted tokens / accepted draft tokens / verify
                # forwards — the speculative-decoding efficiency census
                data_dict["spec_stats"] = {
                    k: int(np.asarray(v)) for k, v in spec_stats.items()
                }
            return data_dict

        return finalize

    # -- grouped generation: shared scene prefix across Q questions -------

    def _make_group_fn(
        self, prefix_len: int, win_len: int, max_new: int, beams: int = 1
    ):
        """One jitted program for grouped generation: G scene prefixes
        prefilled at batch G (preamble + scene tokens, shared within each
        group), a T=win_len window pass that prefills all G·Q question
        suffixes against their group's prefix in one forward, then the
        split-cache greedy loop (decode batch G·Q, prompt segment batch G
        — the same ``bk // b`` repeat beam search uses).

        Relative to G·Q independent ``generate`` rows this runs the scene
        encoder and the prefix attention/MLP FLOPs once per SCENE instead
        of once per QUESTION, ships one copy of each scene's arrays, and
        keeps the full G·Q decode batch (no MXU-starving batch shrink)."""
        network = self.gen_network
        llm_cfg = self.cfg.llm
        bos_id = self.tokenizer.bos_id
        eos_id = self.tokenizer.eos_id

        @jax.jit
        def group_fn(variables, batch):
            from msr3d_tpu.models.llm.llama import _make_cache

            batch = MSR3D._unpack_batch(batch)
            batch = dict(batch)
            suffix_ids = batch.pop("suffix_ids")  # (G·Q, W) left-padded
            window_valid = batch.pop("window_valid")  # (G·Q, W) int32

            # 1. shared prefix prefill at batch G — no trailing bos (it
            # belongs after each question suffix, not after the prefix)
            _, prefix_kv, prefix_mask, next_pre = network.apply(
                variables, **batch, bos_id=bos_id,
                max_cache_len=prefix_len, append_bos=False,
                method=network.prefill,
            )
            g = next_pre.shape[0]

            bq, w = suffix_ids.shape
            s_g = w + max_new
            gen_kv = _make_cache(llm_cfg, bq, s_g)
            if beams == 1 and self.layered_gen_cache:
                # per-layer layout end to end: the window pass writes the
                # suffixes into it and the greedy loop aliases it in place
                gen_kv = tuple(
                    {key: val[i] for key, val in gen_kv.items()}
                    for i in range(llm_cfg.num_hidden_layers)
                )
            wv = window_valid.astype(bool)

            # per-row prefix token count (scene-major row order: row
            # g·Q + j belongs to scene g — the decode_step_shared
            # bk//b reshape contract)
            n_pre = jnp.repeat(next_pre, bq // g, axis=0)  # (G·Q,)

            # 2. suffix window pass: all G·Q suffixes in ONE T=W forward
            # over their group's prefix; in-window causality + window_valid
            # reproduce exactly the per-question causal mask
            win_pos = n_pre[:, None] + jnp.cumsum(window_valid, axis=1) - 1
            win_pos = jnp.maximum(win_pos, 0).astype(jnp.int32)
            logits, gen_kv = network.apply(
                variables, suffix_ids, win_pos, prefix_kv, prefix_mask,
                gen_kv, jnp.int32(0), jnp.zeros((bq, s_g), bool), wv,
                method=network.decode_step_shared,
            )
            first = logits[:, -1, :].astype(jnp.float32)
            next_positions = n_pre + jnp.sum(window_valid, axis=1)

            # 3. decode loop: suffix slots [0, W) stay resident in the
            # generated segment; decode writes continue at W
            def decode_shared(token_ids, positions, gkv, gidx, gmask):
                return network.apply(
                    variables, token_ids, positions, prefix_kv,
                    prefix_mask, gkv, gidx, gmask,
                    method=network.decode_step_shared,
                )

            gen_mask_base = jnp.pad(wv, ((0, 0), (0, max_new)))
            if beams > 1:
                # per-beam rows: each question's suffix KV is repeated K×
                # (beam-minor, matching the beam flat() ordering); the
                # prompt segment stays at batch G — queries G·Q·K resolve
                # through the same bk//b repeat
                from msr3d_tpu.models.llm.sampling import _expand_cache

                gen_kv = jax.tree_util.tree_map(
                    lambda c: _expand_cache(c, beams), gen_kv
                )
                if self.beam_ancestry:
                    # convert the window-pass output (stacked) to the
                    # per-layer layout the ancestry loop aliases in place
                    gen_kv = tuple(
                        {key: val[i] for key, val in gen_kv.items()}
                        for i in range(llm_cfg.num_hidden_layers)
                    )

                def decode_anc(token_ids, positions, gkv, gidx, gmask, anc):
                    return network.apply(
                        variables, token_ids, positions, prefix_kv,
                        prefix_mask, gkv, gidx, gmask, anc, beams,
                        method=network.decode_step_beam_anc,
                    )

                return beam_search_decode_shared(
                    decode_shared, next_positions, first, gen_kv,
                    num_beams=beams, length_penalty=self.length_penalty,
                    max_new_tokens=max_new, eos_id=eos_id, pad_id=eos_id,
                    min_length=1,
                    repetition_penalty=self.repetition_penalty,
                    eos_logit_bias=self.eos_logit_bias,
                    gen_base=w,
                    gen_mask_base=jnp.repeat(gen_mask_base, beams, axis=0),
                    decode_step_anc=decode_anc if self.beam_ancestry else None,
                )
            return greedy_decode_shared(
                decode_shared, next_positions, first, gen_kv,
                max_new_tokens=max_new, eos_id=eos_id, pad_id=eos_id,
                min_length=1, repetition_penalty=self.repetition_penalty,
                eos_logit_bias=self.eos_logit_bias,
                gen_base=w, gen_mask_base=gen_mask_base,
            )

        return group_fn

    def generate_scene_group(
        self,
        data_dict: Dict[str, Any],
        *,
        use_beam: Optional[bool] = None,
        max_new_tokens: Optional[int] = None,
    ) -> Dict[str, Any]:
        """Blocking grouped generate — ``generate_scene_group_async(...)()``."""
        return self.generate_scene_group_async(
            data_dict, use_beam=use_beam, max_new_tokens=max_new_tokens
        )()

    def generate_scene_group_async(
        self,
        data_dict: Dict[str, Any],
        *,
        use_beam: Optional[bool] = None,
        max_new_tokens: Optional[int] = None,
    ):
        """Answer grouped questions with shared-prefix prefills.

        ``data_dict`` carries scene arrays with leading dim G (one row
        per scene) and ``msr3d_prompt`` as either a list of G lists (the
        questions of each scene) or, when G == 1, a flat list — the
        natural MSQA serving shape (many questions per scene/situation).
        Within each group the prompts are tokenized in full and split at
        their longest common TOKEN prefix (exact regardless of BPE
        boundary merges); each group's prefix (which must contain all its
        scene/image placeholders) is prefilled once in a batch-G prefill,
        all G·Q question suffixes run as one multi-token window pass over
        their group's prefix, and decode proceeds on the split cache at
        the full G·Q batch. Token-identical to per-question ``generate``
        on the greedy path (tested). Ragged group sizes are padded to the
        largest group (pad rows replicate that group's first question and
        are dropped from the output).

        Non-blocking: dispatches the device program and returns a
        ``finalize()`` callable (same request-pipelining contract as
        ``generate_async``).
        """
        assert self.params is not None
        if self.spec_k > 0 or self.do_sample:
            raise ValueError(
                "generate_scene_group supports greedy and beam decoding — "
                "spec_k and do_sample are not supported in grouped mode"
            )
        beams = (
            self.num_beams if use_beam is None
            else (self.num_beams if use_beam else 1)
        )
        raw = data_dict["msr3d_prompt"]
        nested = (
            [list(grp) for grp in raw]
            if raw and isinstance(raw[0], (list, tuple))
            else [list(raw)]
        )
        n_groups = len(nested)
        group_sizes = [len(grp) for grp in nested]
        if min(group_sizes) < 1:
            raise ValueError("every scene group needs at least one prompt")

        ph = {self.tokenizer.scene_token_id, self.tokenizer.img_token_id}
        group_rows, group_lc = [], []
        for grp in nested:
            texts = self.build_text_prompt({"msr3d_prompt": grp})
            enc = self.tokenizer.encode_batch(
                texts, padding_side="left", add_bos=True, pad_to=None
            )
            rows = [
                enc.input_ids[i][enc.attention_mask[i].astype(bool)]
                for i in range(len(texts))
            ]
            # longest common token prefix within the group
            m = min(len(r) for r in rows)
            stacked = np.stack([r[:m] for r in rows])
            eq = np.all(stacked == stacked[0:1], axis=0)
            lc = m if eq.all() else int(np.argmin(eq))
            for r in rows:
                if any(int(t) in ph for t in r[lc:]):
                    raise ValueError(
                        "grouped prompts diverge before the scene/image "
                        "placeholders — every placeholder must sit in the "
                        "shared prefix (group prompts by scene AND "
                        "situation)"
                    )
            group_rows.append(rows)
            group_lc.append(lc)

        # group prefixes (G, P): left-padded to a common 32 bucket
        pad_id = self.tokenizer.pad_id
        p = max(32, -(-max(group_lc) // 32) * 32)
        prefix_ids = np.full((n_groups, p), pad_id, np.int32)
        prefix_attn = np.zeros((n_groups, p), np.int32)
        for gi, (rows, lc) in enumerate(zip(group_rows, group_lc)):
            prefix_ids[gi, p - lc:] = rows[0][:lc]
            prefix_attn[gi, p - lc:] = 1

        # per-question suffixes + trailing bos, left-padded to a width
        # bucket of 8; Q padded to the largest group (bucket of 4)
        bos = self.tokenizer.bos_id
        group_sufs = [
            [list(map(int, r[lc:])) + [bos] for r in rows]
            for rows, lc in zip(group_rows, group_lc)
        ]
        all_lens = [len(s) for sufs in group_sufs for s in sufs]
        w = max(8, -(-max(all_lens) // 8) * 8)
        q_pad = max(1, -(-max(group_sizes) // 4) * 4)  # Q bucket of 4
        suffix_ids = np.full((n_groups * q_pad, w), pad_id, np.int32)
        window_valid = np.zeros((n_groups * q_pad, w), np.int32)
        for gi, sufs in enumerate(group_sufs):
            for j in range(q_pad):
                s = sufs[j] if j < len(sufs) else sufs[0]
                row = gi * q_pad + j
                suffix_ids[row, w - len(s):] = s
                window_valid[row, w - len(s):] = 1

        batch = self._maybe_pack(self._scene_batch(data_dict))
        lead = next(iter(batch.values())).shape[0]
        if lead != n_groups:
            raise ValueError(
                f"generate_scene_group expects ONE scene row per prompt "
                f"group: got {lead} scene rows for {n_groups} groups"
            )
        batch.update(
            input_ids=prefix_ids, attention_mask=prefix_attn,
            suffix_ids=suffix_ids, window_valid=window_valid,
        )
        max_new = max_new_tokens or self.max_out_len
        key = (prefix_ids.shape[1], w, n_groups, q_pad, max_new, beams,
               tuple(sorted(batch)), self.eos_logit_bias, self.beam_ancestry,
               self.layered_gen_cache)
        if not hasattr(self, "_group_cache"):
            self._group_cache = {}
        if key not in self._group_cache:
            self._group_cache[key] = self._make_group_fn(
                prefix_ids.shape[1], w, max_new, beams
            )
        tokens = self._group_cache[key](self.params, _to_jax(batch))

        def finalize() -> Dict[str, Any]:
            # drop Q-bucket pad rows, flatten scene-major
            out = np.asarray(tokens).reshape(n_groups, q_pad, -1)
            flat = np.concatenate(
                [out[gi, :sz] for gi, sz in enumerate(group_sizes)], axis=0
            )
            data_dict["output_tokens"] = flat
            data_dict["output_text"] = self.batch_detokenize(flat)
            return data_dict

        return finalize

    def predict_answers(
        self,
        data_dict: Dict[str, Any],
        answer_list: List[str],
        num_ans_candidates: int = 128,
        chunk_size: int = 16,
    ) -> Dict[str, Any]:
        """Retrieval-mode scoring (msr3d.py:526-655 semantics, working):

        (1) first-token probabilities over each candidate answer's first
        real token select the top-K candidates per sample, (2) each
        candidate's full per-sequence LM loss is computed, (3) the
        argmin-loss candidate is the answer.

        The reference's implementation calls an undefined helper and would
        raise (msr3d.py:566, SURVEY.md §3.5); this is the repaired
        equivalent.
        """
        assert self.params is not None
        num_ans_candidates = min(num_ans_candidates, len(answer_list))

        prompts = self.build_text_prompt(data_dict)
        input_ids, attn = self._encode_prompts(prompts)
        batch = self._scene_batch(data_dict)
        bsz = input_ids.shape[0]

        ans_ids, ans_mask = self._encode_answers(answer_list)  # (A, T)

        # (1) first-token logits from the prompt prefill (+bos)
        prompt_len = input_ids.shape[1] + 1
        first, _, _, _ = self.gen_network.apply(
            self.params,
            **_to_jax({"input_ids": input_ids, "attention_mask": attn, **batch}),
            bos_id=self.tokenizer.bos_id,
            max_cache_len=prompt_len,
            method=self.gen_network.prefill,
        )
        probs = jax.nn.softmax(first, axis=-1)  # (B, V)
        first_answer_tokens = ans_ids[:, 1]  # token after bos, per candidate
        cand_probs = np.asarray(probs)[:, first_answer_tokens]  # (B, A)
        topk_ids = np.argsort(-cand_probs, axis=1)[:, :num_ans_candidates]

        # (2) per-candidate LM loss, chunked over candidates
        if self._loss_fn is None:
            self._loss_fn = jax.jit(lambda v, b: self.network.apply(v, **b))
        losses = np.zeros((bsz, num_ans_candidates), np.float32)
        for start in range(0, num_ans_candidates, chunk_size):
            chunk = topk_ids[:, start : start + chunk_size]  # (B, C)
            c = chunk.shape[1]
            rep = {
                key: np.repeat(np.asarray(val), c, axis=0)
                for key, val in batch.items()
            }
            rep.update(
                input_ids=np.repeat(input_ids, c, axis=0),
                attention_mask=np.repeat(attn, c, axis=0),
                output_ids=ans_ids[chunk.reshape(-1)],
                output_mask=ans_mask[chunk.reshape(-1)],
            )
            out = self._loss_fn(self.params, _to_jax(rep))
            losses[:, start : start + c] = np.asarray(out["loss"]).reshape(bsz, c)

        best = losses.argmin(axis=1)
        answer_ids = topk_ids[np.arange(bsz), best]
        data_dict["answers_id"] = answer_ids
        data_dict["answers"] = [answer_list[int(i)] for i in answer_ids]
        # full-vocabulary scores for the SQA3D EM@1/EM@10 evaluator
        # (sqa3d_eval.py:75-121): −loss at scored candidates, −inf-ish at
        # candidates pruned by the first-token filter
        scores = np.full((bsz, len(answer_list)), -1e9, np.float32)
        np.put_along_axis(scores, topk_ids, -losses, axis=1)
        data_dict["answer_scores"] = scores
        return data_dict

    def batch_detokenize(self, tokens: np.ndarray) -> List[str]:
        """Decode generated ids, stopping at the first eos
        (trainer/leo_trainer.py:313-338 semantics)."""
        out = []
        for row in tokens:
            ids = []
            for t in row:
                if t == self.tokenizer.eos_id:
                    break
                ids.append(int(t))
            out.append(self.tokenizer.decode(ids).strip())
        return out

    def get_opt_params_mask(self, params: Optional[Dict[str, Any]] = None) -> Any:
        """Pytree mask: True for trainable leaves (LoRA + projections +
        scene encoder), False for frozen (LLM base, image backbone,
        point-net when frozen). Mirrors msr3d.py:165-172 + freeze census.
        Pass ``params`` to mask an alternate layout (e.g. the stacked
        pipeline-parallel tree)."""
        if params is None:
            params = self.params
        assert params is not None

        def trainable(path: str) -> bool:
            if "lora_a" in path or "lora_b" in path:
                return True
            if path.startswith("['params']['llm']"):
                return False
            if "image_encoder" in path:
                return False
            if "obj_encoder" in path and self.cfg.prompter.vision_freeze:
                return False
            if "batch_stats" in path:
                return False
            return True

        return jax.tree_util.tree_map_with_path(
            lambda p, _: trainable(jax.tree_util.keystr(p)), params
        )


def _to_jax(batch: Dict[str, np.ndarray]) -> Dict[str, jnp.ndarray]:
    return {k: jnp.asarray(v) for k, v in batch.items()}
