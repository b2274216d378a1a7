"""serve.py deployment entry: config -> model -> engine -> HTTP, smoke
over a real socket on the tiny synthetic config (random weights)."""

import json
import sys
import urllib.request
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from serve import create_frontend, parse_args  # noqa: E402
from msr3d_tpu.serving_http import encode_scene_b64  # noqa: E402


def test_serve_cli_end_to_end():
    n_obj, n_pts = 4, 16
    args = parse_args([
        "--config", "configs/debug_synthetic.yaml",
        "--random-init", "--port", "0",
        "--slots", "2", "--refill-group", "1", "--chunk-steps", "2",
        "--max-new-tokens", "4",
        "--num-obj", str(n_obj), "--num-points", str(n_pts),
    ])
    fe = create_frontend(args)
    r = np.random.default_rng(3)
    sample = {
        "obj_fts": (r.normal(size=(n_obj, n_pts, 6)) * 0.1).astype(np.float32),
        "obj_masks": np.ones((n_obj,), bool),
        "obj_locs": r.normal(size=(n_obj, 6)).astype(np.float32),
        "anchor_locs": np.zeros((3,), np.float32),
        "anchor_orientation": np.array([0, 0, 0, 1], np.float32),
    }
    with fe:
        body = {
            "prompt": "scene: 景 USER: what is here? ASSISTANT:",
            "scene_b64": encode_scene_b64(sample),
        }
        req = urllib.request.Request(
            f"http://127.0.0.1:{fe.port}/v1/generate",
            data=json.dumps(body).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=300) as resp:
            assert resp.status == 200
            payload = json.loads(resp.read())
        assert isinstance(payload["text"], str)
        assert len(payload["tokens"]) >= 1

        with urllib.request.urlopen(
            f"http://127.0.0.1:{fe.port}/v1/health", timeout=30
        ) as resp:
            health = json.loads(resp.read())
        assert health["status"] == "ok"
        assert health["served"] == 1
    assert not fe._engine_thread.is_alive()


def test_serve_cli_grouped_engine():
    """--engine grouped: the scene-grouped shared-prefix server behind
    the same HTTP front-end (idle grace flush answers a lone request)."""
    n_obj, n_pts = 4, 16
    args = parse_args([
        "--config", "configs/debug_synthetic.yaml",
        "--random-init", "--port", "0",
        "--engine", "grouped",
        "--group-scenes", "1", "--group-questions", "2",
        "--max-new-tokens", "4",
        "--num-obj", str(n_obj), "--num-points", str(n_pts),
    ])
    fe = create_frontend(args)
    r = np.random.default_rng(3)
    sample = {
        "obj_fts": (r.normal(size=(n_obj, n_pts, 6)) * 0.1).astype(np.float32),
        "obj_masks": np.ones((n_obj,), bool),
        "obj_locs": r.normal(size=(n_obj, 6)).astype(np.float32),
        "anchor_locs": np.zeros((3,), np.float32),
        "anchor_orientation": np.array([0, 0, 0, 1], np.float32),
    }
    with fe:
        body = {
            "prompt": "scene: 景 USER: what is here? ASSISTANT:",
            "scene_b64": encode_scene_b64(sample),
        }
        req = urllib.request.Request(
            f"http://127.0.0.1:{fe.port}/v1/generate",
            data=json.dumps(body).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=300) as resp:
            assert resp.status == 200
            payload = json.loads(resp.read())
        assert isinstance(payload["text"], str)
        assert len(payload["tokens"]) >= 1

        with urllib.request.urlopen(
            f"http://127.0.0.1:{fe.port}/v1/health", timeout=30
        ) as resp:
            health = json.loads(resp.read())
        assert health["status"] == "ok"
        assert health["slots"] == 2
    assert not fe._engine_thread.is_alive()


def test_serve_cli_pool_engine():
    """--engine pool [--spec-k]: the prefix-pool server behind the CLI;
    two questions on one scene reuse the block (one prefix prefill)."""
    from msr3d_tpu.models.llm.tokenizer import SCENE_PLACEHOLDER

    n_obj, n_pts = 4, 16
    args = parse_args([
        "--config", "configs/debug_synthetic.yaml",
        "--random-init", "--port", "0",
        "--engine", "pool", "--num-prefixes", "2", "--suffix-len", "48",
        "--slots", "2", "--refill-group", "1", "--chunk-steps", "2",
        "--max-new-tokens", "4",
        "--num-obj", str(n_obj), "--num-points", str(n_pts),
    ])
    fe = create_frontend(args)
    r = np.random.default_rng(3)
    sample = {
        "obj_fts": (r.normal(size=(n_obj, n_pts, 6)) * 0.1).astype(np.float32),
        "obj_masks": np.ones((n_obj,), bool),
        "obj_locs": r.normal(size=(n_obj, 6)).astype(np.float32),
        "anchor_locs": np.zeros((3,), np.float32),
        "anchor_orientation": np.array([0, 0, 0, 1], np.float32),
    }
    with fe:
        for q in range(2):
            body = {
                "prompt": (
                    f"scene: {SCENE_PLACEHOLDER} USER: question {q}? "
                    f"ASSISTANT:"
                ),
                "scene_b64": encode_scene_b64(sample),
            }
            req = urllib.request.Request(
                f"http://127.0.0.1:{fe.port}/v1/generate",
                data=json.dumps(body).encode(),
                headers={"Content-Type": "application/json"},
            )
            with urllib.request.urlopen(req, timeout=300) as resp:
                assert resp.status == 200
                payload = json.loads(resp.read())
            assert isinstance(payload["text"], str)
    assert fe.engine.prefix_prefills == 1  # block reused across requests
    assert not fe._engine_thread.is_alive()
