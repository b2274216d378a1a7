"""Tokenizer layer: Vicuna/Llama tokenization with CJK placeholder tokens.

The reference uses HF LlamaTokenizer with added specials
(model/msr3d/msr3d.py:57-76): pad '[PAD]', and placeholder characters
图 (image), 物 (object), 景 (scene) registered as additional special
tokens. Scene prompts repeat 景×scene_token_len and 图×1 per image
(msr3d.py:291-326); their token ids mark splice positions for scene/image
embeddings.

Two backends behind one interface:
  - ``HFTokenizer``: wraps a HF fast tokenizer loaded from a local path
    (sentencepiece-free; tokenizer.json or merged vocab)
  - ``ByteTokenizer``: deterministic byte-level fallback used by tests and
    debug configs — same interface, no external files
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence

import numpy as np

IMAGE_PLACEHOLDER = "图"
OBJECT_PLACEHOLDER = "物"
SCENE_PLACEHOLDER = "景"

# Vicuna ids the reference hardcodes for the placeholders (msr3d.py:213-214)
VICUNA_IMG_TOKEN = 30861
VICUNA_SCENE_TOKEN = 31495


@dataclasses.dataclass
class Encoding:
    input_ids: np.ndarray  # (B, T) int32
    attention_mask: np.ndarray  # (B, T) int32


class BaseTokenizer:
    pad_id: int
    bos_id: int
    eos_id: int
    unk_id: int
    img_token_id: int
    obj_token_id: int
    scene_token_id: int
    vocab_size: int

    def encode_batch(
        self,
        texts: Sequence[str],
        *,
        padding_side: str = "left",
        add_bos: bool = True,
        add_eos: bool = False,
        max_length: Optional[int] = None,
        truncation_side: str = "right",
        pad_to: Optional[int] = None,
    ) -> Encoding:
        rows = []
        for t in texts:
            ids = self._encode_one(t)
            if add_bos:
                ids = [self.bos_id] + ids
            if add_eos:
                ids = ids + [self.eos_id]
            if max_length is not None and len(ids) > max_length:
                ids = (
                    ids[:max_length]
                    if truncation_side == "right"
                    else ids[-max_length:]
                )
            rows.append(ids)
        longest = max(len(r) for r in rows) if rows else 0
        width = pad_to if pad_to is not None else longest
        width = max(width, longest)
        input_ids = np.full((len(rows), width), self.pad_id, np.int32)
        mask = np.zeros((len(rows), width), np.int32)
        for i, r in enumerate(rows):
            if padding_side == "left":
                input_ids[i, width - len(r):] = r
                mask[i, width - len(r):] = 1
            else:
                input_ids[i, : len(r)] = r
                mask[i, : len(r)] = 1
        return Encoding(input_ids, mask)

    def decode(self, ids: Sequence[int], skip_special_tokens: bool = True) -> str:
        raise NotImplementedError

    def decode_batch(
        self, ids: np.ndarray, skip_special_tokens: bool = True
    ) -> List[str]:
        return [self.decode(row, skip_special_tokens) for row in np.asarray(ids)]

    def _encode_one(self, text: str) -> List[int]:
        raise NotImplementedError


class HFTokenizer(BaseTokenizer):
    """HF fast-tokenizer backend (no sentencepiece dependency)."""

    def __init__(self, path: str, truncation_side: str = "right"):
        from transformers import AutoTokenizer

        self.tk = AutoTokenizer.from_pretrained(
            path, use_fast=True, truncation_side=truncation_side
        )
        # reference special-token setup (msr3d.py:59-69)
        self.tk.add_special_tokens({"pad_token": "[PAD]"})
        specials = [IMAGE_PLACEHOLDER, OBJECT_PLACEHOLDER, SCENE_PLACEHOLDER]
        existing = list(self.tk.additional_special_tokens)
        self.tk.add_special_tokens(
            {"additional_special_tokens": specials + existing[len(specials):]}
        )
        self.pad_id = self.tk.pad_token_id
        self.bos_id = self.tk.bos_token_id
        self.eos_id = self.tk.eos_token_id
        self.unk_id = self.tk.unk_token_id or self.eos_id
        self.img_token_id = self.tk.convert_tokens_to_ids(IMAGE_PLACEHOLDER)
        self.obj_token_id = self.tk.convert_tokens_to_ids(OBJECT_PLACEHOLDER)
        self.scene_token_id = self.tk.convert_tokens_to_ids(SCENE_PLACEHOLDER)
        self.vocab_size = len(self.tk)

    def _encode_one(self, text: str) -> List[int]:
        return self.tk.encode(text, add_special_tokens=False)

    def decode(self, ids, skip_special_tokens: bool = True) -> str:
        ids = [int(i) for i in ids]
        return self.tk.decode(ids, skip_special_tokens=skip_special_tokens)


class SPTokenizer(BaseTokenizer):
    """SentencePiece backend: loads a stock ``tokenizer.model`` (the file
    real Vicuna checkpoints ship) via the pure-Python loader in
    ``sentencepiece.py`` — no sentencepiece wheel, no pre-built fast-
    tokenizer dir needed (reference msr3d.py:64-73 path).

    Special-token handling mirrors HF's slow LlamaTokenizer as the
    reference configures it: '[PAD]' is appended as a new id
    (vocab_size), and the 图/物/景 placeholders — present in the Llama
    vocab as single-character pieces — split the text; each fragment is
    SP-encoded independently (HF legacy=True fragment semantics, which
    is what Vicuna/MSR3D trained with)."""

    def __init__(self, model_path: str):
        from msr3d_tpu.models.llm.sentencepiece import SentencePieceModel

        self.sp = SentencePieceModel.load(model_path)
        self.bos_id = self.sp.bos_id
        self.eos_id = self.sp.eos_id
        self.unk_id = self.sp.unk_id
        # '[PAD]' appended as a fresh id, reference msr3d.py:59-62
        self.pad_id = len(self.sp.pieces)
        self.vocab_size = len(self.sp.pieces) + 1
        self._specials = {}
        for name, ch in (
            ("img_token_id", IMAGE_PLACEHOLDER),
            ("obj_token_id", OBJECT_PLACEHOLDER),
            ("scene_token_id", SCENE_PLACEHOLDER),
        ):
            pid = self.sp.piece_to_id.get(ch)
            if pid is None:
                raise ValueError(
                    f"placeholder {ch!r} not in the sentencepiece vocab — "
                    "not a Llama/Vicuna-family tokenizer.model"
                )
            setattr(self, name, pid)
            self._specials[ch] = pid

    def _encode_one(self, text: str) -> List[int]:
        ids: List[int] = []
        frag = []
        for ch in text:
            if ch in self._specials:
                if frag:
                    ids.extend(self.sp.encode("".join(frag)))
                    frag = []
                ids.append(self._specials[ch])
            else:
                frag.append(ch)
        if frag:
            ids.extend(self.sp.encode("".join(frag)))
        return ids

    def decode(self, ids, skip_special_tokens: bool = True) -> str:
        ids = [int(i) for i in ids]
        out: List[str] = []
        run: List[int] = []
        for i in ids:
            if i == self.pad_id:
                continue
            if i in self._specials.values():
                if run:
                    out.append(self.sp.decode_ids(run, skip_special_tokens))
                    run = []
                if not skip_special_tokens:
                    out.append(self.sp.pieces[i])
                else:
                    out.append(self.sp.pieces[i])  # placeholders are text
            else:
                run.append(i)
        if run:
            out.append(self.sp.decode_ids(run, skip_special_tokens))
        return "".join(out)


class ByteTokenizer(BaseTokenizer):
    """Byte-level tokenizer with the same special-token layout.

    Layout: 0=pad, 1=bos, 2=eos (Llama convention), 3=unk,
    4=图, 5=物, 6=景, then 7..262 = bytes 0..255.
    """

    _BYTE_OFFSET = 7

    def __init__(self):
        self.pad_id = 0
        self.bos_id = 1
        self.eos_id = 2
        self.unk_id = 3
        self.img_token_id = 4
        self.obj_token_id = 5
        self.scene_token_id = 6
        self.vocab_size = self._BYTE_OFFSET + 256
        self._special_chars = {
            IMAGE_PLACEHOLDER: self.img_token_id,
            OBJECT_PLACEHOLDER: self.obj_token_id,
            SCENE_PLACEHOLDER: self.scene_token_id,
        }

    def _encode_one(self, text: str) -> List[int]:
        ids: List[int] = []
        for ch in text:
            if ch in self._special_chars:
                ids.append(self._special_chars[ch])
            else:
                ids.extend(self._BYTE_OFFSET + b for b in ch.encode("utf-8"))
        return ids

    def decode(self, ids, skip_special_tokens: bool = True) -> str:
        inv = {v: k for k, v in self._special_chars.items()}
        out_bytes = bytearray()
        out = []
        for i in ids:
            i = int(i)
            if self._BYTE_OFFSET <= i < self._BYTE_OFFSET + 256:
                out_bytes.append(i - self._BYTE_OFFSET)
            elif i >= self._BYTE_OFFSET + 256:
                continue  # out-of-vocab id (e.g. model vocab > tokenizer vocab)
            else:
                if out_bytes:
                    out.append(out_bytes.decode("utf-8", errors="replace"))
                    out_bytes = bytearray()
                if not skip_special_tokens and i in inv:
                    out.append(inv[i])
        if out_bytes:
            out.append(out_bytes.decode("utf-8", errors="replace"))
        return "".join(out)


def build_tokenizer(cfg_path: str = "", truncation_side: str = "right") -> BaseTokenizer:
    """Tokenizer from a checkpoint path, byte fallback otherwise
    (debug/test configs leave cfg_path empty).

    Path resolution (real-Vicuna readiness, VERDICT round-2 #3a):
      - a dir with ``tokenizer.json`` (or any HF fast layout) → HFTokenizer
      - a dir with only ``tokenizer.model``, or a direct ``.model`` file
        → pure-Python SentencePiece backend (stock Vicuna checkpoints)
    """
    if not cfg_path:
        return ByteTokenizer()
    import os

    p = str(cfg_path)
    if p.endswith(".model"):
        return SPTokenizer(p)
    if os.path.isdir(p) and not os.path.exists(os.path.join(p, "tokenizer.json")):
        sp_file = os.path.join(p, "tokenizer.model")
        if os.path.exists(sp_file):
            return SPTokenizer(sp_file)
    return HFTokenizer(cfg_path, truncation_side=truncation_side)
