"""Legacy loss-registry parity vs torch (reference optim/loss/loss.py
formulas re-evaluated with torch.nn.functional on the same random inputs)."""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from msr3d_tpu.optim import losses as L  # noqa: E402


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(0)
    B, N, C, V = 4, 7, 12, 30
    d = {
        "og3d_logits": rng.normal(size=(B, N)).astype(np.float32),
        "tgt_object_id": rng.integers(0, N, size=(B, 1)),
        "txt_cls_logits": rng.normal(size=(B, C)).astype(np.float32),
        "tgt_object_label": rng.integers(0, C, size=(B, 1)),
        "obj_cls_raw_logits": rng.normal(size=(B, N, C)).astype(np.float32),
        "obj_cls_pre_logits": rng.normal(size=(B, N, C)).astype(np.float32),
        "obj_cls_post_logits": rng.normal(size=(B, N, C)).astype(np.float32),
        "obj_labels": rng.integers(0, C, size=(B, N)),
        "obj_masks": (rng.random(size=(B, N)) > 0.3).astype(np.float32),
        "obj_sem_masks": (rng.random(size=(B, N)) > 0.5).astype(np.float32),
        "answer_scores": rng.normal(size=(B, V)).astype(np.float32),
        "answer_label": (rng.random(size=(B, V)) > 0.8).astype(np.float32),
        "txt_lm_cls_logits": rng.normal(size=(B, N, V)).astype(np.float32),
        "masked_lm_labels": np.where(
            rng.random(size=(B, N)) > 0.5, rng.integers(0, V, size=(B, N)), -1
        ),
        "pred_images": rng.normal(size=(B, 3, 8, 8)).astype(np.float32),
        "target_images": rng.normal(size=(B, 3, 8, 8)).astype(np.float32),
    }
    return d


def _jx(d):
    return {k: jnp.asarray(v) for k, v in d.items()}


def _t(d, k):
    return torch.as_tensor(d[k])


class TestLossParity:
    def test_og3d_loss(self, data):
        ref = F.cross_entropy(_t(data, "og3d_logits"), _t(data, "tgt_object_id").squeeze(1))
        np.testing.assert_allclose(float(L.og3d_loss(_jx(data))), float(ref), rtol=1e-5)

    def test_og3d_multi_loss(self, data):
        tgt = torch.zeros_like(_t(data, "og3d_logits"))
        tgt[:, :2] = 1.0
        d = dict(data, tgt_object_id=tgt.numpy())
        ref = F.binary_cross_entropy_with_logits(
            _t(data, "og3d_logits"), tgt.float(), reduction="sum"
        ) / float(tgt.shape[0])
        np.testing.assert_allclose(float(L.og3d_multi_loss(_jx(d))), float(ref), rtol=1e-5)

    def test_txt_cls_loss(self, data):
        ref = F.cross_entropy(
            _t(data, "txt_cls_logits"), _t(data, "tgt_object_label").squeeze(1)
        )
        np.testing.assert_allclose(float(L.txt_cls_loss(_jx(data))), float(ref), rtol=1e-5)

    @pytest.mark.parametrize("key", ["obj_cls_raw", "obj_cls_pre", "obj_cls_post"])
    def test_obj_cls_losses(self, data, key):
        logits = _t(data, f"{key}_logits")
        ref = (
            F.cross_entropy(
                logits.permute(0, 2, 1), _t(data, "obj_labels"), reduction="none"
            )
            * _t(data, "obj_masks")
        ).sum() / _t(data, "obj_masks").sum()
        got = getattr(L, f"{key}_loss")(_jx(data))
        np.testing.assert_allclose(float(got), float(ref), rtol=1e-5)

    @pytest.mark.parametrize("variant", ["mask", "unmask"])
    @pytest.mark.parametrize("stage", ["pre", "post"])
    def test_sem_masked_obj_cls(self, data, stage, variant):
        logits = _t(data, f"obj_cls_{stage}_logits")
        sem = _t(data, "obj_sem_masks")
        sel = _t(data, "obj_masks") * (sem.logical_not() if variant == "mask" else sem)
        ref = (
            F.cross_entropy(
                logits.permute(0, 2, 1), _t(data, "obj_labels"), reduction="none"
            )
            * sel
        ).sum() / sel.sum()
        got = getattr(L, f"obj_cls_{stage}_loss_{variant}")(_jx(data))
        np.testing.assert_allclose(float(got), float(ref), rtol=1e-5)

    def test_answer_loss(self, data):
        ref = F.binary_cross_entropy_with_logits(
            _t(data, "answer_scores"), _t(data, "answer_label").float(), reduction="sum"
        ) / data["answer_scores"].shape[0]
        np.testing.assert_allclose(float(L.answer_loss(_jx(data))), float(ref), rtol=1e-5)

    def test_lm_cls_loss_ignore_index(self, data):
        ref = F.cross_entropy(
            _t(data, "txt_lm_cls_logits").permute(0, 2, 1),
            _t(data, "masked_lm_labels"),
            ignore_index=-1,
        )
        np.testing.assert_allclose(float(L.lm_cls_loss(_jx(data))), float(ref), rtol=1e-5)

    def test_mse_loss(self, data):
        ref = ((_t(data, "pred_images") - _t(data, "target_images")) ** 2).mean()
        np.testing.assert_allclose(float(L.mse_loss(_jx(data))), float(ref), rtol=1e-6)


class TestGetLosses:
    def test_sum_selected(self, data):
        d = _jx(data)
        total, all_losses = L.get_losses(
            d, ["og3d_loss", "txt_cls_loss", "mse_loss"], ["og3d_loss", "mse_loss"]
        )
        assert set(all_losses) == {"og3d_loss", "txt_cls_loss", "mse_loss", "total_loss"}
        np.testing.assert_allclose(
            float(total), float(all_losses["og3d_loss"] + all_losses["mse_loss"]), rtol=1e-6
        )

    def test_model_loss_overrides(self, data):
        d = _jx(data)
        d["loss"] = jnp.float32(7.25)
        total, _ = L.get_losses(d, ["mse_loss"], ["mse_loss"])
        assert float(total) == 7.25

    def test_registry_fallback_ulip(self, data):
        rng = np.random.default_rng(1)
        B, D = 6, 16
        out = {
            "pc_embed": jnp.asarray(rng.normal(size=(B, D)).astype(np.float32)),
            "text_embed": jnp.asarray(rng.normal(size=(B, D)).astype(np.float32)),
            "image_embed": jnp.asarray(rng.normal(size=(B, D)).astype(np.float32)),
            "logit_scale": jnp.float32(14.0),
            "labels": jnp.arange(B),
        }
        total, _ = L.get_losses(out, ["ULIPWithImageLoss"], ["ULIPWithImageLoss"])

        # torch reference of the ULIP formula (ulip_loss.py:20-49)
        pc = F.normalize(torch.as_tensor(np.asarray(out["pc_embed"])), dim=-1)
        tx = F.normalize(torch.as_tensor(np.asarray(out["text_embed"])), dim=-1)
        im = F.normalize(torch.as_tensor(np.asarray(out["image_embed"])), dim=-1)
        lbl = torch.arange(B)
        s = 14.0
        ref = (
            F.cross_entropy(s * pc @ tx.t(), lbl) + F.cross_entropy(s * tx @ pc.t(), lbl)
        ) / 2 + (
            F.cross_entropy(s * pc @ im.t(), lbl) + F.cross_entropy(s * im @ pc.t(), lbl)
        ) / 2
        np.testing.assert_allclose(float(total), float(ref), rtol=1e-5)


class TestNoDecayMask:
    def test_bias_and_scale_excluded(self):
        params = {
            "params": {
                "dense": {"kernel": np.ones((2, 2)), "bias": np.ones((2,))},
                "norm": {"scale": np.ones((2,)), "bias": np.ones((2,))},
            }
        }
        mask = L.no_decay_mask(params)
        assert mask["params"]["dense"]["kernel"] is True
        assert mask["params"]["dense"]["bias"] is False
        assert mask["params"]["norm"]["scale"] is False
        assert mask["params"]["norm"]["bias"] is False
