"""GPT scene-as-text baseline (reference GPT-4o_baseline/eval.py +
tools/gpt_utils.py).

Renders the GT object inventory (name, center, size, attributes) + agent
pose + situation into a text prompt per MSQA test item, queries an
injectable chat client with a disk cache, and dumps a results JSON the
offline scorer (evaluator/offline_msqa.py) consumes.

The chat client is injected (``client(prompt) -> str``) because this
environment is zero-egress; any OpenAI/Azure-compatible callable works.
"""

from __future__ import annotations

import hashlib
import json
from pathlib import Path
from typing import Any, Callable, Dict, List, Optional

import numpy as np

SCENE_FORMAT = (
    "inst_name: [x, y, z], [h, w, d], color, 3D shape, material, usage, "
    "texture, structure, state;"
)


def construct_scene_str(
    scan_info: Dict[str, Any], attr_info: Dict[str, Any]
) -> str:
    """Merge instance geometry with attribute annotations into the prompt's
    object inventory string."""
    parts = []
    for inst_id, info in scan_info.items():
        attrs = attr_info.get(inst_id)
        if attrs is None:
            attrs = attr_info.get(f"{info.get('inst_name', '')}-{inst_id}", {})
        center = [round(float(x), 3) for x in info.get("center", info.get("loc", [0, 0, 0]))]
        size = [round(float(x), 3) for x in info.get("size", [0, 0, 0])]
        attr_str = ", ".join(
            str(attrs.get(k, ""))
            for k in ("color", "shape", "material", "usage", "texture", "structure", "state")
        )
        parts.append(f"{info.get('inst_name', 'object')}: {center}, {size}, {attr_str}")
    return "; ".join(parts)


def prompt_format(item: Dict[str, Any]) -> str:
    """Reference prompt template (GPT-4o_baseline/eval.py:39-75)."""
    location = [round(float(x), 3) for x in item["location"]]
    if "orientation_angle" in item:
        angle = item["orientation_angle"]
    else:
        ori = item["orientation"]
        angle = float(np.arctan2(ori[1], ori[0]))
    angle = round(angle, 3)
    return f"""
You are an AI visual assistant situated in a 3D scene.
You can perceive the objects (including yourself) in the scene.
The scene representation is given in a dict format such as {SCENE_FORMAT}

All object instances in this room are given, along with their center point position and size.
The center points are represented by a 3D coordinate (x, y, z) in meters, and the bounding boxes are (h, w, d).

The objects in the scene are: {item['scene_info_str']}

You are located at {location} and facing direction in x-y plane with angle {angle}.
Your situation is: {item['situation']}

USER: {item['question']}

You should respond according to the given information. The answer should follow this format:
Answer:

ASSISTANT:""".strip()


class DiskCache:
    """Per-prompt response cache (tools/gpt_utils.py disk-cache behavior)."""

    def __init__(self, cache_dir: str | Path):
        self.dir = Path(cache_dir)
        self.dir.mkdir(parents=True, exist_ok=True)

    def _key(self, prompt: str) -> Path:
        return self.dir / (hashlib.sha256(prompt.encode()).hexdigest() + ".json")

    def get(self, prompt: str) -> Optional[str]:
        path = self._key(prompt)
        if path.exists():
            return json.loads(path.read_text())["response"]
        return None

    def put(self, prompt: str, response: str) -> None:
        self._key(prompt).write_text(
            json.dumps({"prompt": prompt[:500], "response": response})
        )


def run_baseline(
    annotations: List[Dict[str, Any]],
    scene_infos: Dict[str, Dict[str, Any]],
    attr_infos: Dict[str, Dict[str, Any]],
    chat_client: Callable[[str], str],
    cache_dir: str | Path = "./gpt_cache",
    out_path: Optional[str | Path] = None,
) -> List[Dict[str, Any]]:
    """annotations: MSQA test records; scene/attr_infos keyed by scan_id.

    Returns (and optionally writes) records in the offline-scorer format.
    """
    cache = DiskCache(cache_dir)
    results = []
    for item in annotations:
        scan_id = item["scan_id"]
        scene_str = construct_scene_str(
            scene_infos.get(scan_id, {}), attr_infos.get(scan_id, {})
        )
        prompt = prompt_format({**item, "scene_info_str": scene_str})
        response = cache.get(prompt)
        if response is None:
            response = chat_client(prompt)
            cache.put(prompt, response)
        answer = response.split("Answer:")[-1].strip()
        results.append(
            {
                "instruction": item["question"],
                "response_pred": answer,
                "response_gt": item["answers"],
                "type": item.get("type", ""),
                "index": item.get("index", -1),
                "scan_id": scan_id,
            }
        )
    if out_path:
        with open(out_path, "w") as f:
            json.dump(results, f)
    return results
