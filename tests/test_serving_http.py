"""Online serving: OnlineRequestStream keeps the continuous engine alive
across idle gaps, and the HTTP front-end serves token-identical answers
to the fixed-batch generate path over a real socket."""

import json
import threading
import time
import urllib.error
import urllib.request

import numpy as np
import pytest

from msr3d_tpu.serving import ContinuousBatchingServer, OnlineRequestStream
from msr3d_tpu.serving_http import (
    RequestError,
    ServingFrontend,
    encode_scene_b64,
    parse_generate_request,
)
from tests.test_serving import _requests
from tests.test_serving_continuous import _batch_of, _direct_tokens


def _engine(model, reqs, max_new, **kw):
    ii, _ = model._encode_prompts(model.build_text_prompt(_batch_of(reqs)))
    prompt_len = max(32, -(-ii.shape[1] // 32) * 32) + 1
    kw.setdefault("num_slots", 3)
    kw.setdefault("refill_group", 1)
    kw.setdefault("chunk_steps", 3)
    return ContinuousBatchingServer(
        model, max_new_tokens=max_new, prompt_len=prompt_len, **kw
    )


# ---------------------------------------------------------------------------
# OnlineRequestStream against the engine directly (no HTTP)


def test_online_stream_waves_match_generate(tiny_msr3d, rng):
    """Two waves of requests with a full-idle gap between them: the
    engine must sleep at idle, wake on the second wave, and produce
    token-identical results throughout; run() returns after close()."""
    reqs = _requests(rng, 6)
    max_new = 6
    direct = _direct_tokens(tiny_msr3d, reqs, max_new)

    stream = OnlineRequestStream()
    got = {}
    done = threading.Event()

    def on_result(res):
        got[res.id] = np.asarray(res.output_tokens)
        if len(got) == len(reqs):
            done.set()

    engine = _engine(tiny_msr3d, reqs, max_new)
    t = threading.Thread(
        target=engine.run, args=(stream,), kwargs={"on_result": on_result}
    )
    t.start()
    try:
        for r in reqs[:3]:
            stream.submit(r)
        # wait until wave 1 fully served -> engine is provably idle
        deadline = time.time() + 120
        while len(got) < 3 and time.time() < deadline:
            time.sleep(0.05)
        assert len(got) == 3, "first wave not served"
        time.sleep(0.2)  # engine sits in stream.wait()
        for r in reqs[3:]:
            stream.submit(r)
        assert done.wait(120), "second wave not served"
    finally:
        stream.close()
        t.join(60)
    assert not t.is_alive()
    for rid in range(len(reqs)):
        np.testing.assert_array_equal(got[rid], direct[rid])


def test_online_stream_close_drains_pending(tiny_msr3d, rng):
    """Requests still queued at close() are served before run returns,
    and results ARE retained when no on_result callback is given."""
    reqs = _requests(rng, 4)
    max_new = 5
    direct = _direct_tokens(tiny_msr3d, reqs, max_new)
    stream = OnlineRequestStream()
    for r in reqs:
        stream.submit(r)
    stream.close()
    with pytest.raises(RuntimeError):
        stream.submit(reqs[0])
    results = _engine(tiny_msr3d, reqs, max_new).run(stream)
    assert [r.id for r in results] == list(range(len(reqs)))
    for r in results:
        np.testing.assert_array_equal(r.output_tokens, direct[r.id])


# ---------------------------------------------------------------------------
# request parsing (pure host)


def test_parse_generate_request_forms(rng):
    sample = _requests(rng, 1)[0]
    body = {
        "prompt": sample["msr3d_prompt"],
        "scene_b64": encode_scene_b64(sample),
        "max_new_tokens": 7,
    }
    parsed, budget = parse_generate_request(body)
    assert budget == 7
    np.testing.assert_allclose(parsed["obj_fts"], sample["obj_fts"])
    assert parsed["obj_masks"].dtype == np.bool_

    # inline-list form
    small = {
        "prompt": "hi 景",
        "obj_fts": np.zeros((2, 8, 6)).tolist(),
        "obj_masks": [True, False],
        "obj_locs": np.zeros((2, 6)).tolist(),
        "anchor_locs": [0.0, 0.0, 0.0],
        "anchor_orientation": [0.0, 0.0, 0.0, 1.0],
    }
    parsed, budget = parse_generate_request(small)
    assert budget is None
    assert parsed["obj_fts"].dtype == np.float32

    for bad in (
        {},  # no prompt
        {"prompt": ""},
        {"prompt": "x"},  # no scene
        {**small, "max_new_tokens": 0},
        {**small, "scene_b64": "!!!notbase64!!!"},
        [1, 2],  # not an object
    ):
        with pytest.raises(RequestError):
            parse_generate_request(bad)


# ---------------------------------------------------------------------------
# full HTTP stack


def _post(port, body, timeout=120):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/v1/generate",
        data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=timeout) as resp:
        return resp.status, json.loads(resp.read())


def test_http_serving_end_to_end(tiny_msr3d, rng):
    reqs = _requests(rng, 5)
    max_new = 6
    direct = _direct_tokens(tiny_msr3d, reqs, max_new)
    engine = _engine(tiny_msr3d, reqs, max_new, num_slots=3, refill_group=1)

    with ServingFrontend(engine, port=0) as fe:
        # concurrent clients
        out = {}

        def client(i):
            status, payload = _post(fe.port, {
                "prompt": reqs[i]["msr3d_prompt"],
                "scene_b64": encode_scene_b64(reqs[i]),
            })
            out[i] = (status, payload)

        threads = [threading.Thread(target=client, args=(i,))
                   for i in range(len(reqs))]
        for t in threads:
            t.start()
        for t in threads:
            t.join(180)
        assert all(not t.is_alive() for t in threads)

        texts = tiny_msr3d.batch_detokenize(direct)
        for i, (status, payload) in out.items():
            assert status == 200
            # ids are completion-dependent; texts must match the fixed
            # batch generate for THIS request's content
            assert payload["text"] == texts[i]

        # health endpoint reflects served work
        with urllib.request.urlopen(
            f"http://127.0.0.1:{fe.port}/v1/health", timeout=30
        ) as resp:
            health = json.loads(resp.read())
        assert health["status"] == "ok"
        assert health["served"] == len(reqs)
        assert health["in_flight"] == 0
        assert health["decode_steps"] > 0

        # malformed request -> 400, doesn't wedge the engine
        try:
            status, payload = _post(fe.port, {"prompt": ""})
            assert False, "expected HTTPError"
        except urllib.error.HTTPError as exc:
            assert exc.code == 400

        # unknown route -> 404
        try:
            _post_req = urllib.request.Request(
                f"http://127.0.0.1:{fe.port}/nope", data=b"{}"
            )
            urllib.request.urlopen(_post_req, timeout=30)
            assert False, "expected HTTPError"
        except urllib.error.HTTPError as exc:
            assert exc.code == 404

    # after close(): engine thread gone, submits refused
    assert not fe._engine_thread.is_alive()
    with pytest.raises(RuntimeError):
        fe.stream.submit(reqs[0])


def test_engine_on_progress_snapshots(tiny_msr3d, rng):
    """on_progress delivers non-decreasing prefixes of each request's
    final tokens; the beam engine rejects it."""
    reqs = _requests(rng, 4)
    max_new = 8
    direct = _direct_tokens(tiny_msr3d, reqs, max_new)
    snaps = {i: [] for i in range(len(reqs))}

    engine = _engine(tiny_msr3d, reqs, max_new, chunk_steps=2)
    results = engine.run(
        reqs, on_progress=lambda rid, toks: snaps[rid].append(np.array(toks))
    )
    for r in results:
        np.testing.assert_array_equal(r.output_tokens, direct[r.id])
        full = np.asarray(r.output_tokens)
        prev = 0
        for s in snaps[r.id]:
            assert len(s) >= prev, "snapshot lengths must be non-decreasing"
            prev = len(s)
            # every snapshot is a prefix of the final emitted tokens
            np.testing.assert_array_equal(s, full[: len(s)])
        # with chunk_steps=2 and 8-token budget, running requests must
        # have produced at least one partial snapshot
    assert any(len(v) > 0 for v in snaps.values())

    from msr3d_tpu.serving import ContinuousBeamBatchingServer

    ii, _ = tiny_msr3d._encode_prompts(
        tiny_msr3d.build_text_prompt(_batch_of(reqs)))
    prompt_len = max(32, -(-ii.shape[1] // 32) * 32) + 1
    beam = ContinuousBeamBatchingServer(
        tiny_msr3d, num_slots=2, refill_group=1, chunk_steps=2,
        max_new_tokens=4, prompt_len=prompt_len,
    )
    with pytest.raises(ValueError):
        beam.run(reqs[:1], on_progress=lambda rid, toks: None)


def _read_sse(resp):
    """Parse data: events off an open urllib response until done."""
    events = []
    for raw in resp:
        line = raw.decode().strip()
        if line.startswith("data: "):
            ev = json.loads(line[len("data: "):])
            events.append(ev)
            if ev.get("done"):
                break
    return events


def test_http_streaming_sse(tiny_msr3d, rng):
    reqs = _requests(rng, 2)
    max_new = 8
    direct = _direct_tokens(tiny_msr3d, reqs, max_new)
    texts = tiny_msr3d.batch_detokenize(direct)
    engine = _engine(tiny_msr3d, reqs, max_new, chunk_steps=2)

    with ServingFrontend(engine, port=0) as fe:
        req = urllib.request.Request(
            f"http://127.0.0.1:{fe.port}/v1/generate",
            data=json.dumps({
                "prompt": reqs[0]["msr3d_prompt"],
                "scene_b64": encode_scene_b64(reqs[0]),
                "stream": True,
            }).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=180) as resp:
            assert resp.headers["Content-Type"] == "text/event-stream"
            events = _read_sse(resp)
        assert events, "no SSE events received"
        assert events[-1]["done"] is True
        assert events[-1]["text"] == texts[0]
        # at least one partial snapshot before the final event
        partials = [e for e in events if not e.get("done")]
        assert partials, "expected partial snapshots with chunk_steps=2"
        # registration cleaned up (handler's finally runs after the
        # client stops reading — poll briefly)
        deadline = time.time() + 10
        while fe._progress and time.time() < deadline:
            time.sleep(0.05)
        assert fe._progress == {}

        # non-streaming requests still work on the same engine
        status, payload = _post(fe.port, {
            "prompt": reqs[1]["msr3d_prompt"],
            "scene_b64": encode_scene_b64(reqs[1]),
        })
        assert status == 200
        assert payload["text"] == texts[1]


def test_http_per_request_budget(tiny_msr3d, rng):
    """max_new_tokens in the body caps that request's decode length."""
    reqs = _requests(rng, 2)
    engine = _engine(tiny_msr3d, reqs, 8)
    with ServingFrontend(engine, port=0) as fe:
        status, payload = _post(fe.port, {
            "prompt": reqs[0]["msr3d_prompt"],
            "scene_b64": encode_scene_b64(reqs[0]),
            "max_new_tokens": 3,
        })
        assert status == 200
        toks = np.asarray(payload["tokens"])
        # budget 3: at most 3 non-pad tokens before the eos/pad tail
        assert (toks != tiny_msr3d.tokenizer.eos_id).sum() <= 3


def test_engine_progress_gate_suppresses_callbacks(tiny_msr3d, rng):
    """progress_gate=False must suppress every on_progress call (and the
    per-chunk count copies) — the zero-cost-when-unused contract."""
    reqs = _requests(rng, 3)
    calls = []
    engine = _engine(tiny_msr3d, reqs, 6, chunk_steps=2)
    results = engine.run(
        reqs,
        on_progress=lambda rid, toks: calls.append(rid),
        progress_gate=lambda: False,
    )
    assert len(results) == 3
    assert calls == []


def test_http_bad_requests_do_not_kill_engine(tiny_msr3d, rng):
    """An oversize prompt or mismatched scene shapes must be a 400 on
    that connection — the engine thread must keep serving others."""
    reqs = _requests(rng, 3)
    engine = _engine(tiny_msr3d, reqs, 6)
    with ServingFrontend(engine, port=0) as fe:
        # request 1 pins the serving scene shapes
        status, payload = _post(fe.port, {
            "prompt": reqs[0]["msr3d_prompt"],
            "scene_b64": encode_scene_b64(reqs[0]),
        })
        assert status == 200

        # prompt bigger than the compiled bucket -> 400
        try:
            _post(fe.port, {
                "prompt": reqs[1]["msr3d_prompt"] + "x" * 4096,
                "scene_b64": encode_scene_b64(reqs[1]),
            })
            assert False, "expected 400"
        except urllib.error.HTTPError as exc:
            assert exc.code == 400
            assert "bucket" in json.loads(exc.read())["error"]

        # scene geometry different from the pinned shapes -> 400
        small = dict(reqs[1])
        small["obj_fts"] = np.asarray(small["obj_fts"])[:1]
        small["obj_masks"] = np.asarray(small["obj_masks"])[:1]
        small["obj_locs"] = np.asarray(small["obj_locs"])[:1]
        try:
            _post(fe.port, {
                "prompt": small["msr3d_prompt"],
                "scene_b64": encode_scene_b64(small),
            })
            assert False, "expected 400"
        except urllib.error.HTTPError as exc:
            assert exc.code == 400
            assert "shapes" in json.loads(exc.read())["error"]

        # internally inconsistent arrays -> 400 at parse time
        broken = dict(reqs[1])
        broken["obj_masks"] = np.ones((7,), bool)
        try:
            _post(fe.port, {
                "prompt": broken["msr3d_prompt"],
                "scene_b64": encode_scene_b64(broken),
            })
            assert False, "expected 400"
        except urllib.error.HTTPError as exc:
            assert exc.code == 400

        # the engine survived all of it and still serves
        status, payload = _post(fe.port, {
            "prompt": reqs[2]["msr3d_prompt"],
            "scene_b64": encode_scene_b64(reqs[2]),
        })
        assert status == 200
        assert fe._engine_error is None


def test_http_timed_out_result_not_leaked(tiny_msr3d, rng):
    """A request whose waiter gave up must not leave its Result in the
    frontend maps once the engine finishes it."""
    reqs = _requests(rng, 1)
    engine = _engine(tiny_msr3d, reqs, 6)
    fe = ServingFrontend(engine, port=0)
    fe.start()
    try:
        rid = fe.submit(reqs[0])
        assert fe.wait(rid, timeout=0.0) is None  # give up immediately
        deadline = time.time() + 120
        while fe._served < 1 and time.time() < deadline:
            time.sleep(0.05)
        assert fe._served == 1
        time.sleep(0.1)
        with fe._lock:
            assert rid not in fe._results  # orphan dropped
            assert rid not in fe._events
    finally:
        fe.close()


def test_http_keepalive_post_to_unknown_route(tiny_msr3d, rng):
    """A POST with a body to a wrong path must drain the body before the
    404 so the keep-alive connection stays usable for the next request."""
    import http.client

    reqs = _requests(rng, 1)
    engine = _engine(tiny_msr3d, reqs, 6)
    with ServingFrontend(engine, port=0) as fe:
        conn = http.client.HTTPConnection("127.0.0.1", fe.port, timeout=120)
        big_body = json.dumps({
            "prompt": reqs[0]["msr3d_prompt"],
            "scene_b64": encode_scene_b64(reqs[0]),
        })
        conn.request("POST", "/wrong", body=big_body,
                     headers={"Content-Type": "application/json"})
        resp = conn.getresponse()
        assert resp.status == 404
        resp.read()
        # same connection, correct route: must parse cleanly
        conn.request("POST", "/v1/generate", body=big_body,
                     headers={"Content-Type": "application/json"})
        resp = conn.getresponse()
        assert resp.status == 200
        payload = json.loads(resp.read())
        assert isinstance(payload["text"], str)
        conn.close()
