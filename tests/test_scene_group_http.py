"""Online scene-grouped serving: the grouped engine behind
OnlineRequestStream and the HTTP front-end. A lone request must not
starve waiting for scene-mates (idle grace flush), grouped answers must
be token-identical to plain generate, and per-request budgets trim."""

import json
import threading
import time
import urllib.request

import numpy as np

from msr3d_tpu.serving import OnlineRequestStream, SceneGroupBatchingServer
from msr3d_tpu.serving_http import ServingFrontend, encode_scene_b64
from tests.test_scene_group import _plain_rows, _scene_requests


def _post(port, body, timeout=240):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/v1/generate",
        data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    try:
        with urllib.request.urlopen(req, timeout=timeout) as resp:
            return resp.status, json.loads(resp.read())
    except urllib.error.HTTPError as err:  # noqa: F821 (urllib.request)
        return err.code, json.loads(err.read())


import urllib.error  # noqa: E402  (used by _post's except clause)


def test_group_server_online_stream(tiny_msr3d, rng):
    """Waves with an idle gap: full groups dispatch on fill; the partial
    group left at idle flushes after the grace window instead of
    starving; all results token-identical to plain generate."""
    reqs = _scene_requests(
        rng, ["What do you see?", "Color?", "Chairs?"], ["Exit where?"]
    )
    want_tokens, _ = _plain_rows(tiny_msr3d, reqs, 5)

    stream = OnlineRequestStream()
    got = {}
    done = threading.Event()

    def on_result(res):
        got[res.id] = np.asarray(res.output_tokens)
        if len(got) == len(reqs):
            done.set()

    server = SceneGroupBatchingServer(
        tiny_msr3d, scenes_per_batch=1, questions_per_scene=2,
        pipeline_depth=0, use_beam=False, max_new_tokens=5,
    )
    t = threading.Thread(
        target=server.run, args=(stream,),
        kwargs={"on_result": on_result, "idle_flush_s": 0.05},
    )
    t.start()
    try:
        # wave 1: two scene-A questions -> a full group dispatches
        stream.submit(reqs[0])
        stream.submit(reqs[1])
        deadline = time.time() + 180
        while len(got) < 2 and time.time() < deadline:
            time.sleep(0.05)
        assert len(got) == 2, "full group not served"
        # wave 2: one scene-A and one scene-B question — neither fills a
        # group; the idle grace flush must answer them anyway
        stream.submit(reqs[2])
        stream.submit(reqs[3])
        deadline = time.time() + 180
        while len(got) < 4 and time.time() < deadline:
            time.sleep(0.05)
        assert len(got) == 4, "idle flush did not fire"
    finally:
        stream.close()
        t.join(120)
    assert not t.is_alive()
    for i in range(4):
        np.testing.assert_array_equal(got[i], want_tokens[i])


def test_group_server_http_frontend(tiny_msr3d, rng):
    """Grouped engine behind the HTTP front-end over a real socket:
    token parity, per-request budget trimming, and health."""
    reqs = _scene_requests(rng, ["What do you see?", "Color?"])
    want_tokens, want_text = _plain_rows(tiny_msr3d, reqs, 5)

    server = SceneGroupBatchingServer(
        tiny_msr3d, scenes_per_batch=1, questions_per_scene=2,
        pipeline_depth=0, use_beam=False, max_new_tokens=5,
    )
    with ServingFrontend(server, port=0) as fe:
        results = {}

        def post_one(i, extra):
            body = {
                "prompt": reqs[i]["msr3d_prompt"],
                "scene_b64": encode_scene_b64(reqs[i]),
                **extra,
            }
            results[i] = _post(fe.port, body)

        threads = [
            threading.Thread(target=post_one, args=(i, {})) for i in range(2)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join(240)
        for i in range(2):
            status, payload = results[i]
            assert status == 200
            assert payload["text"] == want_text[i]
            np.testing.assert_array_equal(
                np.asarray(payload["tokens"]), want_tokens[i]
            )

        # per-request budget: tokens truncated to 3
        status, payload = _post(fe.port, {
            "prompt": reqs[0]["msr3d_prompt"],
            "scene_b64": encode_scene_b64(reqs[0]),
            "max_new_tokens": 3,
        })
        assert status == 200
        assert len(payload["tokens"]) == 3
        np.testing.assert_array_equal(
            np.asarray(payload["tokens"]), want_tokens[0][:3]
        )

        # health reports the grouped pool size
        with urllib.request.urlopen(
            f"http://127.0.0.1:{fe.port}/v1/health", timeout=30
        ) as resp:
            health = json.loads(resp.read())
        assert health["status"] == "ok"
        assert health["slots"] == 2
