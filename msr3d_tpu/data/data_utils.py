"""Data-side utilities (reference data/data_utils.py subset, numpy-native).

Covers: rotation augmentation (0/90/180/270° about z), face-vector →
quaternion conversion, 2D image preprocessing (ImageNet stats), tensor
padding, SQA3D question-type tagging.
"""

from __future__ import annotations

import random
from typing import Optional, Tuple

import numpy as np

PIX_MEAN = (0.485, 0.456, 0.406)
PIX_STD = (0.229, 0.224, 0.225)

ROTATE_ANGLES = [0, np.pi / 2, np.pi, np.pi * 3 / 2]


def build_rotate_mat(
    split: str, rot_aug: bool = True, rand_angle: str = "axis"
) -> Optional[np.ndarray]:
    """Random z-rotation for training augmentation
    (data/data_utils.py:175-189). Returns None when no rotation applies."""
    if rand_angle == "random":
        theta = np.random.rand() * np.pi * 2
    else:
        theta = random.choice(ROTATE_ANGLES)
    if rot_aug and split == "train" and theta is not None and theta != 0:
        return np.array(
            [
                [np.cos(theta), -np.sin(theta), 0],
                [np.sin(theta), np.cos(theta), 0],
                [0, 0, 1],
            ],
            dtype=np.float32,
        )
    return None


def face_vector_in_xy_to_quaternion(face_vec) -> np.ndarray:
    """Forward direction in the xy-plane → xyzw quaternion (yaw-only)
    (data/data_utils.py:544-553)."""
    face_vec = np.asarray(face_vec, dtype=np.float64)
    face_vec = face_vec / np.linalg.norm(face_vec)
    angle = np.arctan2(face_vec[1], face_vec[0])
    # R.from_euler('xyz', [0, 0, angle]).as_quat() == yaw-only quaternion
    return np.array([0.0, 0.0, np.sin(angle / 2), np.cos(angle / 2)])


def quaternion_rotate_z(quat: np.ndarray, rot_matrix: np.ndarray) -> np.ndarray:
    """Co-rotate a situation quaternion by a scene rotation matrix
    (data/datasets/msr3d.py:236-239 semantics: R_new = rot @ R(quat))."""
    rot_q = _matrix_to_quat(rot_matrix @ _quat_to_matrix(quat))
    return rot_q


def _quat_to_matrix(q: np.ndarray) -> np.ndarray:
    """xyzw quaternion → rotation matrix (scipy 'from_quat' convention)."""
    x, y, z, w = q
    n = x * x + y * y + z * z + w * w
    s = 2.0 / n if n > 0 else 0.0
    xx, yy, zz = s * x * x, s * y * y, s * z * z
    xy, xz, yz = s * x * y, s * x * z, s * y * z
    wx, wy, wz = s * w * x, s * w * y, s * w * z
    return np.array(
        [
            [1 - (yy + zz), xy - wz, xz + wy],
            [xy + wz, 1 - (xx + zz), yz - wx],
            [xz - wy, yz + wx, 1 - (xx + yy)],
        ]
    )


def _matrix_to_quat(m: np.ndarray) -> np.ndarray:
    """Rotation matrix → xyzw quaternion."""
    t = np.trace(m)
    if t > 0:
        s = np.sqrt(t + 1.0) * 2
        w = 0.25 * s
        x = (m[2, 1] - m[1, 2]) / s
        y = (m[0, 2] - m[2, 0]) / s
        z = (m[1, 0] - m[0, 1]) / s
    elif m[0, 0] > m[1, 1] and m[0, 0] > m[2, 2]:
        s = np.sqrt(1.0 + m[0, 0] - m[1, 1] - m[2, 2]) * 2
        w = (m[2, 1] - m[1, 2]) / s
        x = 0.25 * s
        y = (m[0, 1] + m[1, 0]) / s
        z = (m[0, 2] + m[2, 0]) / s
    elif m[1, 1] > m[2, 2]:
        s = np.sqrt(1.0 + m[1, 1] - m[0, 0] - m[2, 2]) * 2
        w = (m[0, 2] - m[2, 0]) / s
        x = (m[0, 1] + m[1, 0]) / s
        y = 0.25 * s
        z = (m[1, 2] + m[2, 1]) / s
    else:
        s = np.sqrt(1.0 + m[2, 2] - m[0, 0] - m[1, 1]) * 2
        w = (m[1, 0] - m[0, 1]) / s
        x = (m[0, 2] + m[2, 0]) / s
        y = (m[1, 2] + m[2, 1]) / s
        z = 0.25 * s
    return np.array([x, y, z, w])


def preprocess_2d(img: np.ndarray, size: Tuple[int, int] = (224, 224)) -> np.ndarray:
    """Resize + ImageNet-normalize an image (scan_data_loader.py:196-204).

    Input (H, W, 3) uint8; output (H', W', 3) float32 NHWC (TPU layout;
    the reference emits CHW for torch convs).
    """
    from PIL import Image

    pil = Image.fromarray(img.astype(np.uint8))
    pil = pil.resize(size, Image.BILINEAR)
    out = np.asarray(pil).astype(np.float32)
    for i in range(3):
        out[:, :, i] = (out[:, :, i] / 255.0 - PIX_MEAN[i]) / PIX_STD[i]
    return np.ascontiguousarray(out)


def transform_points(points: np.ndarray, transform: np.ndarray,
                     translate: bool = True) -> np.ndarray:
    """Apply a (3,4)/(4,4) linear map to (..., 3) points
    (reference data/data_utils.py:248-276); ``translate=False`` transforms
    directions (homogeneous coordinate 0)."""
    const = np.ones_like(points[..., :1]) if translate else np.zeros_like(points[..., :1])
    homo = np.concatenate([points, const], axis=-1)
    out = np.einsum("nm,...m->...n", transform, homo)
    return out[..., :3]


def pad_tensors(arr: np.ndarray, lens: int, pad: float = 0.0) -> np.ndarray:
    """Pad along axis 0 to ``lens`` (dataset_wrapper.py:140-149)."""
    assert arr.shape[0] <= lens
    if arr.shape[0] == lens:
        return arr
    shape = list(arr.shape)
    shape[0] = lens - arr.shape[0]
    fill = np.full(shape, pad, dtype=arr.dtype)
    return np.concatenate([arr, fill], axis=0)


SQA_TYPES = ["what", "is", "how", "can", "which", "others"]


def get_sqa_question_type(question: str) -> int:
    """SQA3D question-type tag (data/data_utils.py:367-380)."""
    question = question.lstrip()
    if question[:4].lower() == "what":
        return 0
    if question[:2].lower() == "is":
        return 1
    if question[:3].lower() == "how":
        return 2
    if question[:3].lower() == "can":
        return 3
    if question[:5].lower() == "which":
        return 4
    return 5


# ---------------------------------------------------------------------------
# legacy scan-family helpers (reference data/data_utils.py:145-330)

VIEW_DEPENDENT_WORDS = {
    "front", "behind", "back", "right", "left", "facing", "leftmost",
    "rightmost", "looking", "across",
}


def is_explicitly_view_dependent(tokens) -> bool:
    """True if any token names a viewpoint-relative relation
    (data/data_utils.py:291-300)."""
    return any(t in VIEW_DEPENDENT_WORDS for t in tokens)


class LabelConverter:
    """scannetv2-labels.combined.tsv lookup tables (data/data_utils.py:145-173):
    raw category id ↔ nyu40 ↔ the 18-class ScanNet benchmark set."""

    SCANNET_NAME_TO_SCANNET_ID = {
        "cabinet": 0, "bed": 1, "chair": 2, "sofa": 3, "table": 4, "door": 5,
        "window": 6, "bookshelf": 7, "picture": 8, "counter": 9, "desk": 10,
        "curtain": 11, "refrigerator": 12, "shower curtain": 13, "toilet": 14,
        "sink": 15, "bathtub": 16, "others": 17,
    }

    def __init__(self, file_path):
        import csv

        self.raw_name_to_id = {}
        self.nyu40id_to_id = {}
        self.nyu40_name_to_id = {}
        self.scannet_name_to_scannet_id = dict(self.SCANNET_NAME_TO_SCANNET_ID)
        self.id_to_scannetid = {}

        with open(file_path, encoding="utf-8") as fd:
            rows = list(csv.reader(fd, delimiter="\t", quotechar='"'))
        for i in range(1, len(rows)):
            raw_id = i - 1
            raw_name = rows[i][1]
            nyu40_id = int(rows[i][4])
            nyu40_name = rows[i][7]
            self.raw_name_to_id[raw_name] = raw_id
            self.nyu40id_to_id[nyu40_id] = raw_id
            self.nyu40_name_to_id[nyu40_name] = raw_id
            self.id_to_scannetid[raw_id] = self.scannet_name_to_scannet_id.get(
                nyu40_name, self.scannet_name_to_scannet_id["others"]
            )

        # instance ids in the org frames are 1-based (:172-173)
        self.orgInstID_to_id = {i: i - 1 for i in range(1, 257)}
        self.orgInstID_to_id[0] = -100


class IdentityLabelConverter:
    """Fallback when the labels TSV is absent: every raw id maps to itself."""

    class _Identity(dict):
        def __missing__(self, key):
            return key

    def __init__(self):
        self.id_to_scannetid = self._Identity()
        self.raw_name_to_id = {}
        self.nyu40id_to_id = self._Identity()


class ScanQAAnswer:
    """Answer vocabulary with <unk> (data/data_utils.py:303-330)."""

    def __init__(self, answers=None, unk_token="<unk>", ignore_idx=-100):
        self.unk_token = unk_token
        self.ignore_idx = ignore_idx
        self.vocab = {x: i for i, x in enumerate(list(answers or []))}
        self.rev_vocab = {v: k for k, v in self.vocab.items()}

    def itos(self, i):
        if i == self.ignore_idx:
            return self.unk_token
        return self.rev_vocab[i]

    def stoi(self, v):
        if v not in self.vocab:
            return self.ignore_idx
        return self.vocab[v]

    def __len__(self):
        return len(self.vocab)


def random_word(token_ids, token_mask, mask_token_id, vocab_size, rng, mask_ratio=0.15):
    """BERT-style MLM corruption (data/data_utils.py:97-125): 80/10/10
    mask/random/keep; labels -1 where not selected or padded. numpy version."""
    ids = np.array(token_ids, copy=True)
    labels = np.full(len(ids), -1, dtype=np.int64)
    for i in range(len(ids)):
        if token_mask[i] == 0:
            continue
        prob = rng.random()
        if prob < mask_ratio:
            prob /= mask_ratio
            labels[i] = ids[i]
            if prob < 0.8:
                ids[i] = mask_token_id
            elif prob < 0.9:
                ids[i] = rng.integers(0, vocab_size)
    return ids, labels


def random_point_cloud(n_objects, obj_mask, rng, mask_ratio=0.1):
    """Per-object semantic masking (data/data_utils.py:128-142): 0 = masked."""
    out = np.zeros(n_objects, dtype=bool)
    for i in range(n_objects):
        if obj_mask[i]:
            out[i] = rng.random() >= mask_ratio
    return out
