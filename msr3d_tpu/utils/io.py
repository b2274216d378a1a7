"""IO helpers (reference parity: common/io_utils.py:11-104)."""

from __future__ import annotations

import csv
import json
import pickle
from pathlib import Path
from typing import Any, Iterable, List

import numpy as np
import yaml


def make_dir(path) -> Path:
    p = Path(path)
    p.mkdir(parents=True, exist_ok=True)
    return p


def load_json(path) -> Any:
    with open(path) as f:
        return json.load(f)


def save_json(obj: Any, path, **kwargs) -> None:
    with open(path, "w") as f:
        json.dump(obj, f, **kwargs)


def load_jsonl(path) -> List[Any]:
    with open(path) as f:
        return [json.loads(line) for line in f if line.strip()]


def save_jsonl(rows: Iterable[Any], path) -> None:
    with open(path, "w") as f:
        for row in rows:
            f.write(json.dumps(row) + "\n")


def load_yaml(path) -> Any:
    with open(path) as f:
        return yaml.safe_load(f)


def save_yaml(obj: Any, path) -> None:
    with open(path, "w") as f:
        yaml.safe_dump(obj, f, sort_keys=False)


def load_pickle(path) -> Any:
    with open(path, "rb") as f:
        return pickle.load(f)


def save_pickle(obj: Any, path) -> None:
    with open(path, "wb") as f:
        pickle.dump(obj, f)


def load_csv(path, delimiter: str = ",") -> List[List[str]]:
    with open(path, newline="") as f:
        return list(csv.reader(f, delimiter=delimiter))


def load_numpy(path) -> np.ndarray:
    return np.load(path, allow_pickle=True)


def save_numpy(arr: np.ndarray, path) -> None:
    np.save(path, arr)


def load_torch_pickle(path, weights_only: bool = True) -> Any:
    """Load a ``torch.save`` pickle (scan ``.pth`` files) via torch-CPU.

    The reference's scan data lives in torch pickles
    (data/datasets/scannet_base.py:55-77); we keep torch as a CPU-side
    *loader* only — nothing torch ever touches the compute path.
    """
    import torch  # local import: torch is a data-loading shim, not a dep of compute

    obj = torch.load(path, map_location="cpu", weights_only=weights_only)

    def to_np(x):
        if isinstance(x, torch.Tensor):
            return x.numpy()
        if isinstance(x, dict):
            return {k: to_np(v) for k, v in x.items()}
        if isinstance(x, (list, tuple)):
            return type(x)(to_np(v) for v in x)
        return x

    return to_np(obj)
