"""Pure-Python SentencePiece stack (models/llm/sentencepiece.py):

- protobuf writer↔parser round trip over the ModelProto schema
- BPE segmentation vs hand-computed merges (bpe_model.cc semantics)
- byte fallback + decode round trips
- unigram Viterbi segmentation
- cross-implementation parity: our encoder vs the HF fast tokenizer
  produced by the in-repo converter (two independent stacks must emit
  identical ids token-for-token)
- SPTokenizer: Vicuna-style placeholder splitting + '[PAD]' appending
  (reference model/msr3d/msr3d.py:57-76 semantics)
"""

import numpy as np
import pytest

from msr3d_tpu.models.llm.sentencepiece import (
    BYTE,
    CONTROL,
    NORMAL,
    UNKNOWN,
    SentencePieceModel,
    convert_to_hf_tokenizer_json,
    serialize_model_proto,
)


def _mini_bpe_pieces():
    pieces = [
        ("<unk>", 0.0, UNKNOWN),
        ("<s>", 0.0, CONTROL),
        ("</s>", 0.0, CONTROL),
    ]
    pieces += [(f"<0x{b:02X}>", 0.0, BYTE) for b in range(256)]
    chars = ["▁", "t", "h", "e", "c", "a", "s", "o", "n", ".", ",", "图", "物", "景"]
    pieces += [(ch, -100.0 - i, NORMAL) for i, ch in enumerate(chars)]
    merges = ["▁t", "he", "▁the", "at", "▁c", "▁cat", "on", "▁on", "es"]
    pieces += [(m, -1.0 - i, NORMAL) for i, m in enumerate(merges)]
    return pieces


@pytest.fixture(scope="module")
def mini_model(tmp_path_factory):
    blob = serialize_model_proto(_mini_bpe_pieces())
    path = tmp_path_factory.mktemp("sp") / "tokenizer.model"
    path.write_bytes(blob)
    return SentencePieceModel.load(path), path


def test_proto_round_trip(mini_model):
    model, _ = mini_model
    want = _mini_bpe_pieces()
    assert model.pieces == [p for p, _, _ in want]
    np.testing.assert_allclose(model.scores, [s for _, s, _ in want], rtol=1e-6)
    assert model.types == [t for _, _, t in want]
    assert model.model_type == 2
    assert model.byte_fallback and model.add_dummy_prefix
    assert (model.unk_id, model.bos_id, model.eos_id, model.pad_id) == (0, 1, 2, -1)


def test_bpe_merge_order(mini_model):
    model, _ = mini_model
    # "the cat" → ▁the ▁cat via ▁t→(+he)→▁the, at, ▁c, ▁cat
    assert model.encode_pieces("the cat") == ["▁the", "▁cat"]
    # partial merges fall back to chars
    assert model.encode_pieces("ths") == ["▁t", "h", "s"]
    # "onon": both "on"s merge (leftmost first), then ▁+on → ▁on;
    # no "onon"/"▁onon" piece exists so merging stops there
    assert model.encode_pieces("onon") == ["▁on", "on"]


def test_byte_fallback_and_decode(mini_model):
    model, _ = mini_model
    ids = model.encode("thé")
    pieces = model.encode_pieces("thé")
    assert pieces[:1] == ["▁t"] and pieces[1] == "h"
    assert all(p.startswith("<0x") for p in pieces[2:])  # é → 2 UTF-8 bytes
    assert model.decode_ids(ids) == "thé"
    # multi-codepoint emoji round-trips through byte pieces
    ids2 = model.encode("the 🤖.")
    assert model.decode_ids(ids2) == "the 🤖."


def test_placeholders_encode_as_single_pieces(mini_model):
    model, _ = mini_model
    assert model.encode_pieces("景") == ["▁", "景"]


def test_cross_implementation_parity_with_hf_fast(mini_model, tmp_path):
    """Our pure-Python encoder vs the converted HF fast tokenizer: two
    independent implementations, identical ids on a mixed corpus."""
    model, path = mini_model
    from tokenizers import Tokenizer

    tk_path = convert_to_hf_tokenizer_json(path, tmp_path)
    fast = Tokenizer.from_file(str(tk_path))
    corpus = [
        "the cat",
        "the cat sat on the mat.",
        "  two  spaces ",
        "cats eat",
        "no such chars: zqxj",
        "thé 🤖 mixed",
        ".",
        "on on on",
        "attestation",
    ]
    for text in corpus:
        ours = model.encode(text)
        theirs = fast.encode(text).ids
        assert ours == theirs, (
            text, model.encode_pieces(text), fast.encode(text).tokens,
        )


def test_unigram_viterbi():
    pieces = [
        ("<unk>", 0.0, UNKNOWN),
        ("<s>", 0.0, CONTROL),
        ("</s>", 0.0, CONTROL),
        ("▁", -2.0, NORMAL),
        ("a", -3.0, NORMAL),
        ("b", -3.0, NORMAL),
        ("ab", -4.0, NORMAL),
        ("▁ab", -3.5, NORMAL),
        ("▁a", -2.5, NORMAL),
    ]
    blob = serialize_model_proto(
        pieces, model_type=1, byte_fallback=False
    )
    model = SentencePieceModel.from_bytes(blob)
    # "▁ab": best single piece (-3.5) beats ▁+ab (-6.0) and ▁a+b (-5.5)
    assert model.encode_pieces("ab") == ["▁ab"]
    # unknown char → unk id
    assert model.encode("z") == [model.piece_to_id["▁"], model.unk_id]


class TestSPTokenizer:
    def test_vicuna_style_interface(self, mini_model, tmp_path):
        from msr3d_tpu.models.llm.tokenizer import SPTokenizer, build_tokenizer

        model, path = mini_model
        tok = SPTokenizer(str(path))
        assert tok.bos_id == 1 and tok.eos_id == 2
        assert tok.pad_id == len(model.pieces)  # '[PAD]' appended
        assert tok.vocab_size == len(model.pieces) + 1
        assert tok.scene_token_id == model.piece_to_id["景"]
        assert tok.img_token_id == model.piece_to_id["图"]

        # placeholder runs map to their ids directly; fragments SP-encoded
        ids = tok._encode_one("the 景景景 cat")
        s = tok.scene_token_id
        run = [i for i in ids if i == s]
        assert run == [s, s, s]
        assert tok.decode(ids) == "the 景景景 cat".replace(" 景景景 ", " 景景景 ")

        # encode_batch pads left with the new pad id and adds bos
        enc = tok.encode_batch(["the cat", "景"], padding_side="left")
        assert enc.input_ids.shape[0] == 2
        assert enc.input_ids[0, 0] in (tok.pad_id, tok.bos_id)
        row1 = enc.input_ids[1][enc.attention_mask[1] == 1]
        assert row1[0] == tok.bos_id

    def test_build_tokenizer_resolves_sp_dir(self, mini_model, tmp_path):
        from msr3d_tpu.models.llm.tokenizer import SPTokenizer, build_tokenizer

        _, path = mini_model
        ckpt = tmp_path / "vicuna_ckpt"
        ckpt.mkdir()
        (ckpt / "tokenizer.model").write_bytes(path.read_bytes())
        tok = build_tokenizer(str(ckpt))
        assert isinstance(tok, SPTokenizer)
