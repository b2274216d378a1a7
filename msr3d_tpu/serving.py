"""Batched, pipelined serving for MSR3D generation.

The reference serves evaluation through its training loop (one
`generate` per dataloader batch, `trainer/leo_trainer.py:385-418`);
production serving needs the pieces that loop lacks: a request queue, a
fixed-size batcher (static shapes — one compiled program), padding of
the final partial batch, and request pipelining to overlap host work +
dispatch with device compute (the depth-k pattern measured in
`bench_qa.py`; +37% at depth 1, BASELINE.md round 1).

``BatchingServer`` wraps a host-side :class:`msr3d_tpu.models.msr3d.MSR3D`:

    server = BatchingServer(model, batch_size=16, pipeline_depth=3)
    results = list(server.run(requests))         # bulk
    # or incremental:
    server.submit(request); ...; server.flush()

Each request is a *single-sample* dict with the same keys a dataset item
produces (msr3d_prompt, obj_fts (O,P,6), obj_masks, obj_locs,
anchor_locs, anchor_orientation, optional msr3d_imgs/+masks). The server
stacks them into the model's fixed batch; a final partial batch is
padded by repeating the last sample and the padded rows' outputs are
dropped. Results carry the request's ``id`` (submission order).
"""

from __future__ import annotations

import dataclasses
import threading
from collections import deque
from typing import Any, Dict, Iterable, Iterator, List, Optional

import numpy as np

_BATCH_KEYS = (
    "obj_fts",
    "obj_masks",
    "obj_locs",
    "anchor_locs",
    "anchor_orientation",
    "msr3d_imgs",
    "msr3d_img_masks",
    "img_fts",  # LEO-format single ego view (msr3d.py:246-268)
)


@dataclasses.dataclass
class Result:
    id: int
    output_text: str
    output_tokens: np.ndarray


class RequestStreamIdle(Exception):
    """Raised by :class:`OnlineRequestStream` when no request is pending
    right now but more may arrive. The engine treats it as "keep decoding
    what's in flight" rather than "the stream is exhausted"."""


class OnlineRequestStream:
    """Thread-safe request feed for ONLINE continuous-batching serving.

    A plain iterable ends :meth:`ContinuousBatchingServer.run` when it is
    exhausted; an online server must instead keep the engine alive across
    idle gaps while producers (e.g. HTTP handler threads) ``submit()``
    requests at arbitrary times. This stream

    - never blocks the engine while slots are in flight: ``__next__``
      raises :class:`RequestStreamIdle` when the queue is momentarily
      empty, so in-flight decode chunks keep running;
    - lets the engine sleep at FULL idle (no slots, no queue) via
      :meth:`wait`, waking on the next ``submit`` or ``close``;
    - ends the run loop only after :meth:`close` (then drains the queue
      and raises ``StopIteration``).

    Request ids: the engine assigns ids in pull order, which is FIFO
    submission order — so :meth:`submit`'s return value IS the ``id`` on
    the eventual :class:`Result` (valid as long as one ``run()`` call
    consumes this stream from its start, the only supported use).
    """

    def __init__(self):
        self._q: deque = deque()
        self._cv = threading.Condition()
        self._closed = False
        self._n = 0

    def submit(self, sample: Dict[str, Any], budget: Optional[int] = None) -> int:
        """Enqueue one request; returns its future result id."""
        with self._cv:
            if self._closed:
                raise RuntimeError("stream is closed")
            self._q.append((sample, budget))
            rid = self._n
            self._n += 1
            self._cv.notify_all()
            return rid

    def close(self) -> None:
        """No further submits; the engine drains and run() returns."""
        with self._cv:
            self._closed = True
            self._cv.notify_all()

    @property
    def closed(self) -> bool:
        with self._cv:
            return self._closed

    @property
    def pending(self) -> int:
        with self._cv:
            return len(self._q)

    def __iter__(self):
        return self

    def __next__(self):
        with self._cv:
            if self._q:
                return self._q.popleft()
            if self._closed:
                raise StopIteration
            raise RequestStreamIdle

    def wait(self, timeout: Optional[float] = None) -> None:
        """Block until a request is pending or the stream is closed."""
        with self._cv:
            self._cv.wait_for(lambda: self._q or self._closed, timeout)


def _collate(samples: List[Dict[str, Any]]) -> Dict[str, Any]:
    batch: Dict[str, Any] = {
        "msr3d_prompt": [s["msr3d_prompt"] for s in samples],
    }
    for key in _BATCH_KEYS:
        if key in samples[0] and samples[0][key] is not None:
            batch[key] = np.stack([np.asarray(s[key]) for s in samples])
    return batch


def uncollate_batch(data_dict: Dict[str, Any]) -> List[Dict[str, Any]]:
    """Split one collated loader batch back into per-request sample
    dicts — the inverse of :func:`_collate`, so eval loader batches can
    feed the continuous engine.

    Prompts are re-emitted in the UNEXPANDED placeholder form the
    engine's prefill expects: ``msr3d_prompt`` passes through; LEO-format
    prompt parts (prompt_before_obj / middles / after_obj — the
    reference's model/msr3d/msr3d.py:291-326 fallback) are composed into
    the equivalent single-placeholder prompt string, which
    ``build_text_prompt`` then expands identically to its LEO branch.
    """
    from msr3d_tpu.models.msr3d import IMAGE_PLACEHOLDER, SCENE_PLACEHOLDER

    if "msr3d_prompt" in data_dict:
        prompts = list(data_dict["msr3d_prompt"])
    else:
        prompts = [
            f"{before} {mid1}{IMAGE_PLACEHOLDER}. {mid2} "
            f"{SCENE_PLACEHOLDER}. {after}"
            for before, mid1, mid2, after in zip(
                data_dict["prompt_before_obj"],
                data_dict["prompt_middle_1"],
                data_dict["prompt_middle_2"],
                data_dict["prompt_after_obj"],
            )
        ]
    samples: List[Dict[str, Any]] = [{"msr3d_prompt": p} for p in prompts]
    for key in _BATCH_KEYS:
        v = data_dict.get(key)
        if v is None:
            continue
        arr = np.asarray(v)
        assert arr.shape[0] == len(samples), (
            f"{key}: leading dim {arr.shape[0]} != batch {len(samples)}"
        )
        for i, s in enumerate(samples):
            s[key] = arr[i]
    return samples


class BatchingServer:
    def __init__(
        self,
        model,
        batch_size: int,
        *,
        pipeline_depth: int = 3,
        use_beam: Optional[bool] = None,
        max_new_tokens: Optional[int] = None,
    ):
        assert batch_size >= 1
        self.model = model
        self.batch_size = batch_size
        self.pipeline_depth = max(0, pipeline_depth)
        self.use_beam = use_beam
        self.max_new_tokens = max_new_tokens
        self._queue: deque = deque()
        self._next_id = 0
        self._inflight: deque = deque()  # (finalize, [ids], n_real)

    # -- incremental API ----------------------------------------------------

    def submit(self, sample: Dict[str, Any]) -> int:
        """Enqueue one request; returns its id. Dispatches a device batch
        whenever a full one is available."""
        rid = self._next_id
        self._next_id += 1
        self._queue.append((rid, sample))
        ready: List[Result] = []
        while len(self._queue) >= self.batch_size:
            ready.extend(self._dispatch(self.batch_size))
        self._ready = getattr(self, "_ready", [])
        self._ready.extend(ready)
        return rid

    def flush(self) -> List[Result]:
        """Finish everything: pad-dispatch the remainder, drain the
        pipeline, return all not-yet-returned results in id order."""
        out: List[Result] = list(getattr(self, "_ready", []))
        self._ready = []
        if self._queue:
            out.extend(self._dispatch(len(self._queue)))
        while self._inflight:
            out.extend(self._drain_one())
        out.sort(key=lambda r: r.id)
        return out

    # -- bulk API -------------------------------------------------------

    def run(self, samples: Iterable[Dict[str, Any]]) -> Iterator[Result]:
        """Serve an iterable of request samples, yielding results as
        batches complete (within a batch, submission order)."""
        for s in samples:
            self.submit(s)
            ready = getattr(self, "_ready", [])
            if ready:
                self._ready = []
                yield from ready
        yield from self.flush()

    # -- internals ------------------------------------------------------

    def _dispatch(self, n: int) -> List[Result]:
        """Send one batch of n queued requests (padding to batch_size),
        keeping at most pipeline_depth outstanding."""
        taken = [self._queue.popleft() for _ in range(n)]
        ids = [rid for rid, _ in taken]
        samples = [s for _, s in taken]
        while len(samples) < self.batch_size:  # pad partial batch
            samples.append(samples[-1])
        finalize = self.model.generate_async(
            _collate(samples),
            use_beam=self.use_beam,
            max_new_tokens=self.max_new_tokens,
        )
        self._inflight.append((finalize, ids, n))
        done: List[Result] = []
        while len(self._inflight) > self.pipeline_depth:
            done.extend(self._drain_one())
        return done

    def _drain_one(self) -> List[Result]:
        finalize, ids, n = self._inflight.popleft()
        data = finalize()
        return [
            Result(
                id=ids[i],
                output_text=data["output_text"][i],
                output_tokens=np.asarray(data["output_tokens"][i]),
            )
            for i in range(n)
        ]


def scene_fingerprint(sample: Dict[str, Any]) -> Any:
    """Grouping key for :class:`SceneGroupBatchingServer`.

    An explicit ``sample["group_key"]`` wins (e.g. a dataset's
    scan_id+situation id — cheap and intentional). Otherwise the actual
    scene arrays are hashed, which is always CORRECT: two requests group
    only if every array the prefix prefill consumes (points, locs,
    anchor, images) is byte-identical. blake2b over ~1.4 MB of obj_fts
    costs well under a millisecond — noise next to a generate dispatch."""
    import hashlib

    if "group_key" in sample:
        return sample["group_key"]
    h = hashlib.blake2b(digest_size=16)
    for key in _BATCH_KEYS:
        v = sample.get(key)
        if v is not None:
            arr = np.ascontiguousarray(np.asarray(v))
            h.update(key.encode())
            h.update(str(arr.shape).encode())
            h.update(arr.tobytes())
    return h.hexdigest()


class SceneGroupBatchingServer:
    """Scene-grouped serving: requests sharing a scene are answered by
    ONE shared-prefix grouped program (``generate_scene_group``) — the
    scene encoder, the preamble+scene prefill, and the host→device scene
    transfer run once per SCENE instead of once per QUESTION.

    Same contract as :class:`BatchingServer` (submit/flush/run, Results
    carry submission ids), plus grouping:

    - requests are keyed by :func:`scene_fingerprint` (byte-identical
      scene arrays, or an explicit ``group_key``);
    - a group dispatches when it holds ``questions_per_scene`` requests
      and ``scenes_per_batch`` full groups are ready (one program, decode
      batch = scenes_per_batch × questions_per_scene);
    - ``flush()`` dispatches the ragged remainder (the grouped program
      pads ragged groups internally);
    - ``max_open_scenes`` bounds buffering for streams that are not
      scene-contiguous: when exceeded, the oldest open groups dispatch
      early rather than waiting to fill.

    If a dispatch fails because prompts inside a group diverge before
    the scene placeholders (same arrays, different situation TEXT — a
    miskeyed group), the server falls back to singleton groups for that
    batch instead of erroring: each question becomes its own group,
    which is still the exact grouped program (prefix = whole prompt).
    """

    def __init__(
        self,
        model,
        scenes_per_batch: int,
        questions_per_scene: int,
        *,
        pipeline_depth: int = 3,
        use_beam: Optional[bool] = None,
        max_new_tokens: Optional[int] = None,
        max_open_scenes: Optional[int] = None,
    ):
        assert scenes_per_batch >= 1 and questions_per_scene >= 1
        self.model = model
        self.scenes_per_batch = scenes_per_batch
        self.questions_per_scene = questions_per_scene
        self.pipeline_depth = max(0, pipeline_depth)
        self.use_beam = use_beam
        self.max_new_tokens = max_new_tokens
        self.max_open_scenes = max_open_scenes or 4 * scenes_per_batch
        self._next_id = 0
        self._open: Dict[Any, List] = {}  # key -> [(rid, sample), ...]
        self._open_order: List[Any] = []
        self._full: List[List] = []  # groups awaiting a batch
        self._inflight: deque = deque()  # (finalize, [ids])
        self._ready: List[Result] = []

    # -- incremental API --------------------------------------------------

    def submit(self, sample: Dict[str, Any]) -> int:
        rid = self._next_id
        self._next_id += 1
        key = scene_fingerprint(sample)
        if key not in self._open:
            self._open[key] = []
            self._open_order.append(key)
        self._open[key].append((rid, sample))
        if len(self._open[key]) >= self.questions_per_scene:
            self._full.append(self._open.pop(key))
            self._open_order.remove(key)
        while len(self._open_order) > self.max_open_scenes:
            oldest = self._open_order.pop(0)
            self._full.append(self._open.pop(oldest))
        while len(self._full) >= self.scenes_per_batch:
            groups = self._full[: self.scenes_per_batch]
            self._full = self._full[self.scenes_per_batch:]
            self._ready.extend(self._dispatch(groups))
        return rid

    def flush(self) -> List[Result]:
        out = self._ready
        self._ready = []
        remainder = self._full + [
            self._open.pop(k) for k in list(self._open_order)
        ]
        self._full, self._open_order = [], []
        for start in range(0, len(remainder), self.scenes_per_batch):
            out.extend(
                self._dispatch(remainder[start : start + self.scenes_per_batch])
            )
        while self._inflight:
            out.extend(self._drain_one())
        out.sort(key=lambda r: r.id)
        return out

    def run(self, samples, on_result=None, idle_flush_s: float = 0.05):
        """Serve requests.

        Bulk mode (plain iterable, ``on_result=None``): a generator of
        Results, same contract as :class:`BatchingServer.run`.

        Online mode (:class:`OnlineRequestStream` + ``on_result``): the
        ServingFrontend engine-thread contract — pulls until the stream
        closes, delivering each Result via the callback. Grouping holds a
        request only while more keep arriving: after ``idle_flush_s`` of
        stream idleness every buffered group dispatches (possibly ragged
        or singleton), so a lone request's latency is bounded by the
        grace window, not by waiting for its scene-mates. Per-request
        ``max_new_tokens`` budgets are honored by truncating the decoded
        tokens (one compiled budget per program — the grouped program
        cannot vary decode length per row).
        """
        if on_result is None:
            return self._run_bulk(samples)
        assert isinstance(samples, OnlineRequestStream), (
            "online mode expects an OnlineRequestStream"
        )
        import time as _time

        budgets: Dict[int, Optional[int]] = {}

        def deliver(results: List[Result]) -> None:
            for r in results:
                cap = budgets.pop(r.id, None)
                if cap is not None and len(r.output_tokens) > cap:
                    toks = np.asarray(r.output_tokens)[:cap]
                    r = Result(
                        id=r.id,
                        output_text=self.model.batch_detokenize(toks[None])[0],
                        output_tokens=toks,
                    )
                on_result(r)

        while True:
            try:
                sample, budget = next(samples)
            except RequestStreamIdle:
                if self._inflight:
                    # results ready to fetch: drain one (blocks on device)
                    deliver(self._drain_one())
                elif self._open or self._full:
                    # quiet stream + buffered groups: grace, then flush
                    samples.wait(timeout=idle_flush_s)
                    if samples.pending == 0 and not samples.closed:
                        remainder = self._full + [
                            self._open.pop(kk) for kk in list(self._open_order)
                        ]
                        self._full, self._open_order = [], []
                        for start in range(0, len(remainder), self.scenes_per_batch):
                            deliver(self._dispatch(
                                remainder[start : start + self.scenes_per_batch]
                            ))
                else:
                    samples.wait(timeout=1.0)
                continue
            except StopIteration:
                break
            rid = self.submit(sample)
            budgets[rid] = budget
            if self._ready:
                ready, self._ready = self._ready, []
                deliver(ready)
        deliver(self.flush())

    def _run_bulk(self, samples: Iterable[Dict[str, Any]]) -> Iterator[Result]:
        for s in samples:
            self.submit(s)
            if self._ready:
                ready, self._ready = self._ready, []
                yield from ready
        yield from self.flush()

    @property
    def num_slots(self) -> int:
        return self.scenes_per_batch * self.questions_per_scene

    # -- internals --------------------------------------------------------

    def _dispatch(self, groups: List[List]) -> List[Result]:
        ids = [rid for grp in groups for rid, _ in grp]
        try:
            finalize = self._dispatch_grouped(groups)
        except ValueError:
            # prompts diverge before the placeholders (miskeyed group):
            # singleton groups are always valid — prefix = whole prompt
            finalize = self._dispatch_grouped(
                [[(rid, s)] for grp in groups for rid, s in grp]
            )
        self._inflight.append((finalize, ids))
        done: List[Result] = []
        while len(self._inflight) > self.pipeline_depth:
            done.extend(self._drain_one())
        return done

    def _dispatch_grouped(self, groups: List[List]):
        scene_rows = [grp[0][1] for grp in groups]
        batch = _collate(scene_rows)
        batch["msr3d_prompt"] = [
            [s["msr3d_prompt"] for _, s in grp] for grp in groups
        ]
        return self.model.generate_scene_group_async(
            batch, use_beam=self.use_beam, max_new_tokens=self.max_new_tokens
        )

    def _drain_one(self) -> List[Result]:
        finalize, ids = self._inflight.popleft()
        data = finalize()
        return [
            Result(
                id=ids[i],
                output_text=data["output_text"][i],
                output_tokens=np.asarray(data["output_tokens"][i]),
            )
            for i in range(len(ids))
        ]


# ---------------------------------------------------------------------------
# Continuous batching: slot-refill serving
# ---------------------------------------------------------------------------


class ContinuousBatchingServer:
    """Slot-based continuous batching for greedy serving (vLLM-style
    scheduling, TPU-static shapes).

    ``BatchingServer`` gang-schedules: every batch decodes until its
    SLOWEST request finishes, so at variable answer lengths the whole
    batch pays ``max(len)`` steps per request. This engine keeps
    ``num_slots`` requests decoding concurrently and refills a slot the
    moment its request finishes — steady-state decode cost per request
    approaches ``mean(len)`` steps, the expected-case serving win the
    fixed batcher leaves on the table.

    TPU-native design — everything is statically shaped, three compiled
    programs total:

    - ``prefill``: the real ``MSR3DNetwork.prefill`` at the fixed refill
      group size R and a fixed prompt bucket ``prompt_len`` (includes the
      trailing bos).
    - ``insert``: scatters the R prefilled rows (prompt KV, mask, first
      token, position) into the persistent slot state at R free slots
      (donated — in-place row updates).
    - ``decode_chunk``: up to ``chunk_steps`` decode steps in one
      ``lax.while_loop`` over the donated slot state. Slots sit at
      different depths, so KV writes take the per-row vector-index path
      (llama._cache_write_rows) and token picks the per-row
      ``pick_next_rows``; the prompt KV segment stays a loop-invariant
      operand exactly like the split-cache greedy loop.

    Per-request token budgets (``max_new_tokens`` per sample, or the
    ``budgets`` argument to :meth:`run`) are first-class: a row finishes
    at EOS or at its own budget. Greedy only — beam eval stays on
    ``BatchingServer`` (beams share a prompt segment; slot-refill across
    beam groups would forfeit that sharing).

    ``drain_between_batches=True`` disables refill until every slot
    finishes — the gang-scheduled control arm for benchmarking, using
    byte-identical kernels (bench_serve.py measures the scheduling gap
    in isolation).

    ``spec_k > 0`` layers n-gram (prompt-lookup) speculative decoding on
    top of the slot-refill schedule: each ``decode_chunk`` iteration runs
    ONE ``spec_k+1``-token verify forward per slot (drafts proposed by
    suffix n-gram lookup against that slot's prompt+generated context —
    stored per slot in device state) and emits 1..``spec_k+1`` tokens.
    Token-identical to ``spec_k=0`` per request (tested); requires the
    model's ``repetition_penalty == 1.0``. Slots at different depths
    verify concurrently — the per-row multi-token KV window write is the
    same vector-index machinery the T=1 path uses.
    """

    supports_progress = True  # on_progress streams greedy prefixes

    def __init__(
        self,
        model,
        num_slots: int,
        *,
        refill_group: int = 4,
        chunk_steps: int = 16,
        max_new_tokens: Optional[int] = None,
        prompt_len: Optional[int] = None,
        drain_between_batches: bool = False,
        lookahead: int = 1,
        spec_k: int = 0,
        spec_ngram: int = 3,
    ):
        import jax  # lazy: the fixed-batch server above is host-only

        assert 1 <= refill_group <= num_slots
        if spec_k > 0 and model.repetition_penalty != 1.0:
            raise ValueError(
                "speculative continuous batching requires "
                "repetition_penalty == 1.0 (penalty serializes the "
                "verify window)"
            )
        # do_sample serving: per-request deterministic sampling — each
        # row's key is fold(fold(PRNGKey(sample_seed), request id), step),
        # so tokens depend only on (seed, rid), not on slot assignment or
        # co-scheduled requests (tested: slot-count invariance)
        self.sample = bool(getattr(model, "do_sample", False))
        if self.sample and spec_k > 0:
            raise ValueError(
                "do_sample and spec_k are mutually exclusive — n-gram "
                "verification accepts drafts against the argmax pick"
            )
        self.spec_k = int(spec_k)
        self.spec_ngram = int(spec_ngram)
        self.model = model
        self.num_slots = num_slots
        self.refill_group = refill_group
        self.chunk_steps = chunk_steps
        self.max_new = int(max_new_tokens or model.max_out_len)
        self.prompt_len = int(prompt_len or model.prompt_pad_to)
        self.drain_between_batches = drain_between_batches
        # dispatch up to `lookahead` further chunks before fetching a
        # chunk's finished-flags (the flags travel as separate device
        # copies, so the donated state can flow into the next chunk while
        # the host still reads them). Scheduling decisions lag by at most
        # `lookahead` chunks — worth it because the flag fetch is a full
        # host<->device round trip per chunk (0 = fully synchronous).
        self.lookahead = max(0, lookahead)
        self._jax = jax
        self._fns = None  # (init_state, prefill, insert, decode_chunk)
        self.steps_run = 0  # decode-step census for utilization reporting

    # -- compiled programs ----------------------------------------------

    def _build_fns(self):
        import jax
        import jax.numpy as jnp
        from jax import lax
        from functools import partial

        from msr3d_tpu.models.llm.llama import _make_cache
        from msr3d_tpu.models.llm.sampling import (
            pick_next_rows,
            pick_next_rows_sampled,
        )
        from msr3d_tpu.models.msr3d import MSR3D

        model = self.model
        network = model.gen_network  # remat-stripped inference twin
        llm_cfg = model.cfg.llm
        B, S_p, S_g = self.num_slots, self.prompt_len, self.max_new
        V = llm_cfg.vocab_size
        eos = model.tokenizer.eos_id
        bos = model.tokenizer.bos_id
        rp = model.repetition_penalty
        eos_bias = model.eos_logit_bias
        n_steps = self.chunk_steps

        spec_k = self.spec_k
        W = S_p - 1  # prompt-id width (prefill appends the trailing bos)

        sampling = self.sample
        if sampling:
            sample_seed = int(getattr(model, "sample_seed", 0))
            sample_kw = dict(
                temperature=model.temperature, top_k=model.top_k,
                top_p=model.top_p,
            )

            def fold_rows(keys, vals):  # (N,2) uint32 keys ⊕ (N,) ints
                return jax.vmap(jax.random.fold_in)(
                    keys, vals.astype(jnp.uint32)
                )

        def pick_rows(logits, seen, steps, keys=None):
            if sampling:
                return pick_next_rows_sampled(
                    logits, seen, steps, fold_rows(keys, steps),
                    eos_id=eos, repetition_penalty=rp,
                    eos_logit_bias=eos_bias, **sample_kw,
                )
            return pick_next_rows(
                logits, seen, steps, eos_id=eos, repetition_penalty=rp,
                eos_logit_bias=eos_bias,
            )

        @jax.jit
        def init_state():
            stacked = _make_cache(llm_cfg, B, S_g)
            st = dict(
                # per-layer tuple layout: each layer's decode write aliases
                # its own donated carry leaf — the stacked (L, …) layout's
                # slice/re-stack round trip held a full extra copy of the
                # generated cache inside the chunk loop (the 48-slot
                # 256-budget OOM wall)
                gen_kv=tuple(
                    {key: val[i] for key, val in stacked.items()}
                    for i in range(llm_cfg.num_hidden_layers)
                ),
                generated=jnp.full((B, S_g), eos, jnp.int32),
                cnt=jnp.zeros((B,), jnp.int32),
                pos=jnp.zeros((B,), jnp.int32),
                finished=jnp.ones((B,), bool),
                active=jnp.zeros((B,), bool),
                seen=jnp.zeros((B, V), bool),
                budget=jnp.zeros((B,), jnp.int32),
            )
            if spec_k:
                # per-slot prompt token ids: the n-gram proposal context
                st["prompt_ids"] = jnp.zeros((B, W), jnp.int32)
            if sampling:
                # per-slot PRNG key, folded from the request id at insert
                st["rng"] = jnp.zeros((B, 2), jnp.uint32)
            return (
                _make_cache(llm_cfg, B, S_p),  # prompt_kv
                jnp.zeros((B, S_p), bool),  # prompt_mask
                st,
            )

        @jax.jit
        def prefill(variables, batch):
            batch = MSR3D._unpack_batch(batch)
            return network.apply(
                variables, **batch, bos_id=bos, max_cache_len=S_p,
                method=network.prefill,
            )

        @partial(jax.jit, donate_argnums=(0, 1, 2))
        def insert(
            prompt_kv, prompt_mask, state,
            new_kv, new_mask, new_first, new_pos, slots, valid, budgets,
            new_ids=None, new_rids=None,
        ):
            r = slots.shape[0]
            prompt_kv = {
                key: arr.at[:, slots].set(new_kv[key].astype(arr.dtype))
                for key, arr in prompt_kv.items()
            }
            prompt_mask = prompt_mask.at[slots].set(new_mask)
            row_keys = None
            if new_rids is not None:
                row_keys = fold_rows(
                    jnp.broadcast_to(jax.random.PRNGKey(sample_seed), (r, 2)),
                    new_rids,
                )
            tok0 = pick_rows(
                new_first.astype(jnp.float32), jnp.zeros((r, V), bool),
                jnp.zeros((r,), jnp.int32), row_keys,
            )
            gen_rows = jnp.full((r, S_g), eos, jnp.int32).at[:, 0].set(tok0)
            seen_rows = jnp.zeros((r, V), bool).at[jnp.arange(r), tok0].set(True)
            fin0 = (tok0 == eos) | (budgets <= 1)
            state = dict(
                state,
                generated=state["generated"].at[slots].set(gen_rows),
                seen=state["seen"].at[slots].set(seen_rows),
                cnt=state["cnt"].at[slots].set(1),
                pos=state["pos"].at[slots].set(new_pos.astype(jnp.int32)),
                finished=state["finished"].at[slots].set(
                    jnp.where(valid, fin0, True)
                ),
                active=state["active"].at[slots].set(valid),
                budget=state["budget"].at[slots].set(budgets),
            )
            if new_ids is not None:
                state["prompt_ids"] = state["prompt_ids"].at[slots].set(
                    new_ids.astype(jnp.int32)
                )
            if row_keys is not None:
                state["rng"] = state["rng"].at[slots].set(row_keys)
            return prompt_kv, prompt_mask, state

        @partial(jax.jit, donate_argnums=(3,))
        def decode_chunk(variables, prompt_kv, prompt_mask, state):
            rows = jnp.arange(B)
            slot_iota = jnp.arange(S_g)[None, :]

            def cond(carry):
                i, st = carry
                return (i < n_steps) & jnp.any(st["active"] & ~st["finished"])

            def body(carry):
                i, st = carry
                run = st["active"] & ~st["finished"]
                cnt = st["cnt"]
                tok = st["generated"][rows, jnp.maximum(cnt - 1, 0)]
                # idle rows carry index -1: the scatter drops their write
                gen_index = jnp.where(run, cnt - 1, -1)
                gen_mask = slot_iota < cnt[:, None]
                logits, gen_kv = network.apply(
                    variables, tok[:, None], st["pos"][:, None],
                    prompt_kv, prompt_mask, st["gen_kv"], gen_index,
                    gen_mask, method=network.decode_step_shared,
                )
                nxt = pick_rows(
                    logits[:, -1, :].astype(jnp.float32), st["seen"], cnt,
                    st["rng"] if sampling else None,
                )
                nxt = jnp.where(run, nxt, jnp.int32(eos))
                col = jnp.minimum(cnt, S_g - 1)
                cur = st["generated"][rows, col]
                generated = st["generated"].at[rows, col].set(
                    jnp.where(run, nxt, cur)
                )
                seen = jnp.where(
                    run[:, None], st["seen"].at[rows, nxt].set(True),
                    st["seen"],
                )
                finished = st["finished"] | (
                    run & ((nxt == eos) | (cnt + 1 >= st["budget"]))
                )
                inc = run.astype(jnp.int32)
                st = dict(
                    st, gen_kv=gen_kv, generated=generated, seen=seen,
                    finished=finished, cnt=cnt + inc, pos=st["pos"] + inc,
                )
                return i + 1, st

            steps, state = lax.while_loop(
                cond, body, (jnp.int32(0), state)
            )
            return steps, state

        @partial(jax.jit, donate_argnums=(3,))
        def decode_chunk_spec(variables, prompt_kv, prompt_mask, state):
            """Speculative chunk: each iteration = ONE (spec_k+1)-token
            verify forward per slot, emitting 1..spec_k+1 tokens. Same
            schedule contract as ``decode_chunk`` (``steps`` = model
            calls, not tokens); token-identical to the T=1 chunk."""
            from msr3d_tpu.models.llm.sampling import ngram_propose

            rows = jnp.arange(B)
            slot_iota = jnp.arange(S_g)[None, :]
            kk = spec_k

            def cond(carry):
                i, st = carry
                return (i < n_steps) & jnp.any(st["active"] & ~st["finished"])

            def body(carry):
                i, st = carry
                run = st["active"] & ~st["finished"]
                cnt = st["cnt"]  # ≥1 on active slots (insert emits tok0)
                last_tok = st["generated"][rows, jnp.maximum(cnt - 1, 0)]
                # proposal context: prompt ids + generated (the trailing
                # bos the prefill appends sits between them and is
                # invisible here — a proposal-quality artifact only,
                # acceptance keeps tokens exact)
                ctx = jnp.concatenate(
                    [st["prompt_ids"], st["generated"]], axis=1
                )
                props = ngram_propose(
                    ctx, W + cnt, ngram_n=self.spec_ngram, k=kk, pad_id=eos
                )
                verify = jnp.concatenate([last_tok[:, None], props], axis=1)
                pos = st["pos"][:, None] + jnp.arange(kk + 1)
                # window writes land at slots cnt-1..cnt-1+kk; idle rows
                # carry start -1 (whole window dropped)
                gen_index = jnp.where(run, cnt - 1, -1)
                # accepted context = slots 0..cnt-2 (slot cnt-1 is being
                # rewritten by this window); the model masks the window
                # causally from gen_index
                gen_mask = slot_iota < (cnt - 1)[:, None]
                logits, gen_kv = network.apply(
                    variables, verify, pos, prompt_kv, prompt_mask,
                    st["gen_kv"], gen_index, gen_mask,
                    method=network.decode_step_shared,
                )
                lg = logits.astype(jnp.float32)
                if eos_bias:
                    lg = lg + (jnp.arange(V) == eos) * jnp.float32(eos_bias)
                y = jnp.argmax(lg, axis=-1).astype(jnp.int32)  # (B, K+1)

                acc = jnp.cumprod((props == y[:, :kk]).astype(jnp.int32), axis=1)
                m = jnp.sum(acc, axis=1)
                is_eos_y = y == eos
                before_eos = (
                    jnp.cumsum(is_eos_y.astype(jnp.int32), axis=1) - is_eos_y
                )
                steps_idx = cnt[:, None] + jnp.arange(kk + 1)[None, :]
                emit = (
                    (jnp.arange(kk + 1)[None, :] <= m[:, None])
                    & (before_eos == 0)
                    & (steps_idx < st["budget"][:, None])
                    & run[:, None]
                )
                out_idx = jnp.where(emit, steps_idx, S_g)
                generated = st["generated"].at[rows[:, None], out_idx].set(
                    jnp.where(emit, y, eos), mode="drop"
                )
                n_new = jnp.sum(emit.astype(jnp.int32), axis=1)
                finished = st["finished"] | (
                    run
                    & (
                        jnp.any(emit & is_eos_y, axis=1)
                        | (cnt + n_new >= st["budget"])
                    )
                )
                st = dict(
                    st, gen_kv=gen_kv, generated=generated,
                    finished=finished, cnt=cnt + n_new,
                    pos=st["pos"] + n_new,
                )
                return i + 1, st

            steps, state = lax.while_loop(
                cond, body, (jnp.int32(0), state)
            )
            return steps, state

        self._fns = (
            init_state, prefill, insert,
            decode_chunk_spec if spec_k else decode_chunk,
        )
        return self._fns

    # -- host side -------------------------------------------------------

    def _prefill_group(self, samples: List[Dict[str, Any]]):
        from msr3d_tpu.models.msr3d import _to_jax

        model = self.model
        data = _collate(samples)
        prompts = model.build_text_prompt(data)
        ids, attn = model._encode_prompts(prompts)
        width = self.prompt_len - 1  # prefill appends the trailing bos
        assert ids.shape[1] <= width, (
            f"prompt ({ids.shape[1]} tokens) exceeds the engine bucket "
            f"({width}); raise prompt_len"
        )
        pad = width - ids.shape[1]
        if pad:
            b = ids.shape[0]
            ids = np.concatenate(
                [np.full((b, pad), model.tokenizer.pad_id, ids.dtype), ids],
                axis=1,
            )
            attn = np.concatenate(
                [np.zeros((b, pad), attn.dtype), attn], axis=1
            )
        batch = model._maybe_pack(model._scene_batch(data))
        batch.update(input_ids=ids, attention_mask=attn)
        _, prefill, _, _ = self._fns
        first, kv, mask, next_pos = prefill(model.params, _to_jax(batch))
        return first, kv, mask, next_pos, ids

    # -- scheduling-loop hooks (overridden by the prefix-pool engines) ----

    def _engine_init(self):
        """Returns (prompt_ctx, state): the engine's device state split
        into the prompt-side context threaded through refill/decode and
        the donated slot state."""
        init_state = self._fns[0]
        prompt_kv, prompt_mask, state = init_state()
        return (prompt_kv, prompt_mask), state

    def _take_group(self, queue: deque) -> list:
        """Pop the next refill group (≤ refill_group requests) from the
        pending queue. An empty return means head-of-line blocked — the
        loop keeps decoding and retries after slots free."""
        n = min(self.refill_group, len(queue))
        return [queue.popleft() for _ in range(n)]

    def _engine_refill(self, prompt_ctx, state, group, slots):
        """Prefill ``group`` (list of (rid, sample, budget), ≤ r entries)
        and insert it at ``slots`` (exactly r slot ids; rows past
        len(group) are padding and must insert as idle)."""
        import jax.numpy as jnp

        r = self.refill_group
        g_samples = [s for _, s, _ in group]
        g_budgets = [b for _, _, b in group]
        while len(g_samples) < r:  # pad the tail group
            g_samples.append(g_samples[-1])
            g_budgets.append(1)
        first, kv, mask, next_pos, g_ids = self._prefill_group(g_samples)
        valid = np.zeros(r, bool)
        valid[: len(group)] = True
        spec_args = (
            {"new_ids": jnp.asarray(np.asarray(g_ids, np.int32))}
            if self.spec_k else {}
        )
        if getattr(self, "sample", False):
            g_rids = [rid for rid, _, _ in group]
            g_rids += [0] * (r - len(g_rids))  # padding rows idle
            spec_args["new_rids"] = jnp.asarray(np.asarray(g_rids, np.int32))
        insert = self._fns[2]
        prompt_kv, prompt_mask, new_state = insert(
            *prompt_ctx, state,
            kv, mask, first, next_pos,
            jnp.asarray(np.asarray(slots, np.int32)),
            jnp.asarray(valid),
            jnp.asarray(np.asarray(g_budgets, np.int32)),
            **spec_args,
        )
        return (prompt_kv, prompt_mask), new_state

    def _engine_decode(self, prompt_ctx, state):
        decode_chunk = self._fns[3]
        return decode_chunk(self.model.params, *prompt_ctx, state)

    def _on_slot_free(self, slot: int) -> None:
        """Called when a finished request releases its slot (prefix-pool
        engines decrement block refcounts here)."""

    def run(
        self,
        samples: Iterable[Dict[str, Any]],
        *,
        budgets: Optional[Iterable[int]] = None,
        on_result=None,
        on_progress=None,
        progress_gate=None,
    ) -> List[Result]:
        """Serve all requests; returns results in request order.

        ``samples`` is consumed LAZILY — at most one refill group is
        pulled from the iterator beyond what free slots can take, so an
        eval-split-sized request stream never materializes on the host
        (each sample carries ~1.4 MB of fp32 points at reference scale).

        Per-request token budgets come from ``budgets`` (an iterable
        parallel to ``samples``) or a sample's ``max_new_tokens`` key,
        defaulting to the engine-wide ``max_new_tokens``.

        ``on_result``, if given, is called with each :class:`Result` the
        moment its request finishes — in COMPLETION order, not request
        order (the return value remains request-ordered).

        Passing an :class:`OnlineRequestStream` as ``samples`` turns this
        into a long-running server loop: the engine keeps decoding while
        the stream is momentarily empty, sleeps at full idle, and returns
        only after ``stream.close()``. With ``on_result`` set in online
        mode, results are delivered through the callback only (the return
        value is empty — a server must not hold every answer forever).

        ``on_progress``, if given, streams partial output: after every
        decode chunk it is called as ``on_progress(rid, tokens)`` with
        the tokens emitted SO FAR for each still-running request (a
        snapshot, not a delta; scheduling may call it with the same
        prefix twice under lookahead). Greedy engine only — the beam
        engine finalizes a slot's hypothesis at the end, so there is no
        meaningful running prefix to stream. ``progress_gate``, a zero-
        arg callable evaluated at each chunk dispatch, suppresses the
        per-chunk count copy + token fetch while False — so a server
        that registered ``on_progress`` up front pays nothing until a
        client actually asks for streaming."""
        import jax.numpy as jnp

        if on_progress is not None and not self.supports_progress:
            raise ValueError(
                "on_progress streaming is greedy-engine only (beam "
                "hypotheses finalize at the end of the search)"
            )
        model = self.model
        assert model.params is not None, "init or load params first"
        if self._fns is None:
            self._build_fns()

        online = isinstance(samples, OnlineRequestStream)
        if online:
            # the stream yields (sample, budget) pairs itself — do NOT
            # wrap it in a generator: RequestStreamIdle propagating
            # through a generator would close it permanently
            assert budgets is None, "online stream carries its own budgets"
            pairs = samples
        elif budgets is not None:
            pairs = iter(zip(samples, budgets))
        else:
            pairs = iter((s, None) for s in samples)
        next_rid = 0
        exhausted = False
        queue: deque = deque()  # (rid, sample, budget)

        def pull(n: int) -> None:
            # top the queue up to n pending requests (or iterator end)
            nonlocal next_rid, exhausted
            while not exhausted and len(queue) < n:
                try:
                    s, b = next(pairs)
                except StopIteration:
                    exhausted = True
                    return
                except RequestStreamIdle:
                    return  # transient: the online stream may refill
                if b is None:
                    b = s.get("max_new_tokens", self.max_new)
                queue.append(
                    (next_rid, s, max(1, min(int(b), self.max_new)))
                )
                next_rid += 1

        # a long-lived online server delivers through on_result; holding
        # every Result until close() would grow without bound
        retain_results = not (online and on_result is not None)
        results: Dict[int, Result] = {}

        prompt_ctx, state = self._engine_init()
        free: deque = deque(range(self.num_slots))
        slot_rid: Dict[int, int] = {}
        self.steps_run = 0
        r = self.refill_group
        # per-slot insert epoch: a chunk's flag/token copies are only
        # valid for a slot if no refill happened after that chunk was
        # dispatched. Without this, lookahead > 0 can emit a freshly
        # refilled request using a STALE finished flag (and the previous
        # occupant's tokens) from a chunk dispatched before its insert —
        # the flag for that slot is still True from the old request.
        slot_epoch = [0] * self.num_slots
        inflight: deque = deque()  # (steps, finished, generated, epochs)

        def process_one():
            steps, fin_dev, gen_dev, epochs, cnt_dev = inflight.popleft()
            self.steps_run += int(steps)
            finished = np.asarray(fin_dev)
            if cnt_dev is not None:
                gen_all = np.asarray(gen_dev)
                cnt = np.asarray(cnt_dev)
                for s, rid in list(slot_rid.items()):
                    # running slots only; finished ones get on_result below
                    if epochs[s] == slot_epoch[s] and not finished[s]:
                        on_progress(rid, gen_all[s, : int(cnt[s])])
            done = [
                s for s in list(slot_rid)
                if finished[s] and epochs[s] == slot_epoch[s]
            ]
            if done:
                gen = np.asarray(gen_dev)
                texts = model.batch_detokenize(
                    np.stack([gen[s] for s in done])
                )
                for j, s in enumerate(done):
                    rid = slot_rid.pop(s)
                    res = Result(
                        id=rid, output_text=texts[j], output_tokens=gen[s]
                    )
                    if retain_results:
                        results[rid] = res
                    if on_result is not None:
                        on_result(res)
                    free.append(s)
                    self._on_slot_free(s)

        while True:
            # refill whenever a full group of free slots is available.
            # Drain mode (the gang-scheduled control arm): refill only in
            # a burst once EVERY slot has come home — but the burst still
            # fills group-by-group at the same R, so both arms run the
            # byte-identical compiled prefill program (bf16 argmax decode
            # is sensitive to batch-shape-dependent compilation).
            burst = not (self.drain_between_batches and slot_rid)
            if burst and len(free) >= r:
                # pull lazily: a sub-r queue here implies the iterator is
                # exhausted, so partial groups only form at the tail —
                # exactly the eager version's behavior
                pull(r)
            can_refill = burst and len(free) >= r and bool(queue)
            while can_refill:
                group = self._take_group(queue)
                if not group:
                    # head-of-line blocked (prefix-pool engines: the next
                    # request needs a pool block and none is evictable) —
                    # decode on; finishing slots release blocks
                    break
                n_real = len(group)
                slots = [free.popleft() for _ in range(r)]
                prompt_ctx, state = self._engine_refill(
                    prompt_ctx, state, group, slots
                )
                for j, (rid, _, _) in enumerate(group):
                    slot_rid[slots[j]] = rid
                for s in slots:
                    slot_epoch[s] += 1
                for s_pad in slots[n_real:]:  # padding rows are idle
                    free.append(s_pad)
                if len(free) >= r:
                    pull(r)
                can_refill = burst and len(free) >= r and bool(queue)

            if slot_rid:
                steps, state = self._engine_decode(prompt_ctx, state)
                # flags travel as explicit device copies: the state
                # buffers themselves get donated into the NEXT chunk, and
                # fetching a donated buffer is an error by design
                want_progress = on_progress is not None and (
                    progress_gate is None or progress_gate()
                )
                inflight.append(
                    (steps, jnp.copy(state["finished"]),
                     jnp.copy(state["generated"]), tuple(slot_epoch),
                     jnp.copy(state["cnt"]) if want_progress else None)
                )

            # fetch past-chunk flags; keep at most `lookahead` chunks
            # outstanding while work remains, drain fully otherwise
            target = self.lookahead if slot_rid else 0
            while len(inflight) > target or (not slot_rid and inflight):
                process_one()

            if not slot_rid and not inflight and not queue:
                pull(r)
                if not queue:
                    if online and not exhausted:
                        # fully idle online server: sleep until the next
                        # submit (or close), then resume the loop
                        samples.wait()
                        continue
                    break  # iterator exhausted, everything served

        return [results[k] for k in sorted(results)]


def _hf_beam_machinery(*, K, V, S_g, eos, pad, lp, rp, eos_bias,
                       min_length=1):
    """The per-slot HF beam-search math shared by BOTH beam slot-refill
    engines (plain and prefix-pool): finalize, the early_stopping=False
    done heuristic, beam step 0 from first-token logits, and the full
    2K-candidate re-rank step. One copy — a semantics fix (length-penalty
    convention, EOS-pool update, ...) lands in every engine (code-review
    finding, round 4). Matches ``beam_search_decode_shared`` token-for-
    token at batch 1 (each engine's parity tests pin it)."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    from msr3d_tpu.models.llm.sampling import (
        _mask_min_length,
        apply_repetition_penalty,
    )

    neg_inf = jnp.float32(-1e9)

    def finalize_best(beam_tokens, beam_scores, hyp_tokens, hyp_scores,
                      budget):
        """Per-slot HF finalize: live beams compete against the pool at
        the budget length."""
        live_norm = beam_scores / jnp.power(
            jnp.maximum(budget, 1).astype(jnp.float32)[:, None], lp
        )  # (B, K)
        all_scores = jnp.concatenate([hyp_scores, live_norm], axis=1)
        all_tokens = jnp.concatenate([hyp_tokens, beam_tokens], axis=1)
        best = jnp.argmax(all_scores, axis=1)
        return all_tokens[jnp.arange(all_tokens.shape[0]), best]

    def running_done(beam_scores, hyp_scores, step):
        # HF early_stopping=False heuristic, per slot at per-slot step
        best_live = jnp.max(beam_scores, axis=1) / jnp.power(
            (step + 1).astype(jnp.float32), lp
        )
        worst_hyp = jnp.min(hyp_scores, axis=1)
        full = jnp.sum(hyp_scores > neg_inf / 2, axis=1) >= K
        return full & (worst_hyp >= best_live)

    def step0(first, budgets):
        """Beam step 0 (beam_search_decode_shared init semantics): top-K
        distinct first tokens, EOS candidates finalize at once. Returns
        (gen_rows (r,K,S_g), score_rows, hyp_tok_rows, hyp_score_rows,
        seen_rows (r,K,V), fin0, out0)."""
        r = first.shape[0]
        logp0 = jax.nn.log_softmax(
            _mask_min_length(
                first.astype(jnp.float32), jnp.int32(0), min_length, eos,
                eos_bias,
            ),
            axis=-1,
        )  # (r, V)
        top_logp, top_tok = lax.top_k(logp0, K)  # (r, K)
        gen_rows = jnp.full((r, K, S_g), pad, jnp.int32).at[:, :, 0].set(
            top_tok
        )
        rk = jnp.arange(r * K)
        seen_rows = jnp.zeros((r * K, V), bool).at[
            rk, top_tok.reshape(-1)
        ].set(True).reshape(r, K, V)
        is_eos0 = top_tok == eos
        hyp_tok_rows = jnp.where(is_eos0[..., None], gen_rows, pad)
        hyp_score_rows = jnp.where(
            is_eos0, top_logp / jnp.float32(1.0) ** lp, neg_inf
        )
        score_rows = jnp.where(is_eos0, neg_inf, top_logp)
        # the done check the fixed loop's first cond performs (step=1)
        done0 = running_done(score_rows, hyp_score_rows, jnp.full((r,), 1))
        fin0 = done0 | (budgets <= 1)
        out0 = finalize_best(
            gen_rows, score_rows, hyp_tok_rows, hyp_score_rows, budgets
        )
        return (gen_rows, score_rows, hyp_tok_rows, hyp_score_rows,
                seen_rows, fin0, out0)

    def rerank(st, gen_kv, logits, anc, run, cnt):
        """One full beam re-rank step from this step's last-token logits:
        HF processors on log-probs, 2K candidates, EOS-candidate pool
        update, live-beam continuation, ancestry gather, per-slot stop +
        finalize. Returns the updated state dict (carries ``gen_kv`` and
        the gathered ``anc``)."""
        B = cnt.shape[0]
        rowsK = jnp.arange(B * K)
        beam_eye = jnp.tile(jnp.arange(K)[None, :], (B, 1))

        def rep(x):  # (B,) → (B·K,) slot-major
            return jnp.repeat(x, K, axis=0)

        runK = rep(run)
        cntK = rep(cnt)
        logp = jax.nn.log_softmax(
            logits[:, -1, :].astype(jnp.float32), axis=-1
        )
        logp = apply_repetition_penalty(logp, st["seen"], rp)
        is_eos_v = (jnp.arange(V) == eos)[None, :]
        if eos_bias:
            logp = logp + is_eos_v * jnp.float32(eos_bias)
        if min_length > 1:
            logp = jnp.where(
                (cntK[:, None] < min_length - 1) & is_eos_v, -jnp.inf, logp
            )

        total = (st["beam_scores"][:, None] + logp).reshape(B, K * V)
        cand_scores, cand_idx = lax.top_k(total, 2 * K)  # (B, 2K)
        cand_beam = cand_idx // V
        cand_tok = (cand_idx % V).astype(jnp.int32)
        cand_is_eos = cand_tok == eos

        # --- finalize EOS candidates into the per-slot pool -------------
        src = (jnp.arange(B)[:, None] * K + cand_beam).reshape(-1)
        cand_seqs = st["beam_tokens"][src].reshape(B, 2 * K, S_g)
        col_mask = (
            jnp.arange(S_g)[None, None, :]
            == jnp.minimum(cnt, S_g - 1)[:, None, None]
        )
        cand_seqs = jnp.where(
            col_mask,
            jnp.where(cand_is_eos[..., None], eos, pad),
            cand_seqs,
        )
        cand_norm = cand_scores / jnp.power(
            (cnt[:, None] + 1).astype(jnp.float32), lp
        )
        cand_norm = jnp.where(cand_is_eos, cand_norm, neg_inf)
        pool_scores = jnp.concatenate([st["hyp_scores"], cand_norm], axis=1)
        pool_tokens = jnp.concatenate([st["hyp_tokens"], cand_seqs], axis=1)
        top_pool, pool_idx = lax.top_k(pool_scores, K)
        hyp_scores = jnp.where(run[:, None], top_pool, st["hyp_scores"])
        hyp_tokens = jnp.where(
            run[:, None, None],
            jnp.take_along_axis(pool_tokens, pool_idx[:, :, None], axis=1),
            st["hyp_tokens"],
        )

        # --- continue with the best K non-EOS candidates ----------------
        live_rank = jnp.where(cand_is_eos, neg_inf, cand_scores)
        _, live_pick = lax.top_k(live_rank, K)
        new_scores = jnp.take_along_axis(cand_scores, live_pick, axis=1)
        new_tok = jnp.take_along_axis(cand_tok, live_pick, axis=1)
        new_beam = jnp.take_along_axis(cand_beam, live_pick, axis=1)
        valid_live = jnp.take_along_axis(~cand_is_eos, live_pick, axis=1)
        new_tok = jnp.where(valid_live, new_tok, pad)
        new_scores = jnp.where(valid_live, new_scores, neg_inf)

        # idle slots gather identity rows (their state is frozen)
        new_beam = jnp.where(run[:, None], new_beam, beam_eye)
        gather = (jnp.arange(B)[:, None] * K + new_beam).reshape(-1)
        beam_tokens = st["beam_tokens"][gather]
        seen = st["seen"][gather]
        # the generated cache never reorders — only the ancestry map
        # follows the beam re-rank
        anc = anc[gather]

        colK = jnp.minimum(cntK, S_g - 1)
        new_tok_flat = new_tok.reshape(-1)
        beam_tokens = beam_tokens.at[rowsK, colK].set(
            jnp.where(runK, new_tok_flat, beam_tokens[rowsK, colK])
        )
        seen = jnp.where(
            runK[:, None], seen.at[rowsK, new_tok_flat].set(True), seen
        )
        beam_scores = jnp.where(
            runK, new_scores.reshape(-1), st["beam_scores"]
        )

        inc = run.astype(jnp.int32)
        cnt_new = cnt + inc
        # per-slot stop = the fixed loop's cond at the NEXT step
        stop = (cnt_new >= st["budget"]) | running_done(
            beam_scores.reshape(B, K), hyp_scores, cnt_new
        )
        newly_done = run & stop
        out = finalize_best(
            beam_tokens.reshape(B, K, S_g), beam_scores.reshape(B, K),
            hyp_tokens, hyp_scores, st["budget"],
        )
        generated = jnp.where(newly_done[:, None], out, st["generated"])

        return dict(
            st, gen_kv=gen_kv, anc=anc, beam_tokens=beam_tokens, seen=seen,
            beam_scores=beam_scores, hyp_tokens=hyp_tokens,
            hyp_scores=hyp_scores, generated=generated,
            finished=st["finished"] | newly_done,
            cnt=cnt_new, pos=st["pos"] + inc,
        )

    return finalize_best, running_done, step0, rerank


class ContinuousBeamBatchingServer(ContinuousBatchingServer):
    """Slot-refill continuous batching for BEAM-SEARCH serving — the
    reference's accuracy-eval decode setting (num_beams=5,
    repetition_penalty=3.0, `/root/reference/model/msr3d/msr3d.py:449-458`)
    under vLLM-style scheduling.

    Each slot owns a full beam group: ``num_beams`` rows of the generated
    KV segment plus that slot's hypothesis pool. Slots run the exact
    per-request beam search of ``beam_search_decode_shared`` (HF
    GenerationMixin semantics — EOS candidates finalize into a K-slot
    pool, HF early_stopping=False done heuristic, finalize against live
    beams at the budget length) but at PER-SLOT depth: every state array
    the fixed loop carries as a scalar-step batch becomes per-slot
    (``cnt``/``pos`` vectors, per-row vector-index KV writes, per-slot
    done latching). A slot finalizes the moment ITS search completes —
    matching the fixed-batch loop at batch 1 token-for-token (tested) —
    and is refilled immediately, so a batch of mixed answer lengths pays
    ``mean`` not ``max`` beam steps per request — the same scheduling win
    the greedy engine measures (1.49× at the 256-token budget).

    Differences from the greedy engine's state contract (host loop is
    inherited unchanged):

    - ``state["generated"]`` holds the FINALIZED best hypothesis per slot
      (written on the step the slot finishes); live beam rows live in
      ``state["beam_tokens"]`` (B·K, S_g).
    - ``prompt_kv`` stays at B slot rows — beams share it via the split
      cache exactly like the fixed beam path (never duplicated ×K, never
      gathered on beam reorder).

    Speculative decoding is greedy-only (``spec_k`` rejected here).
    """

    supports_progress = False  # hypotheses finalize at search end

    def __init__(
        self,
        model,
        num_slots: int,
        *,
        num_beams: Optional[int] = None,
        refill_group: int = 4,
        chunk_steps: int = 16,
        max_new_tokens: Optional[int] = None,
        prompt_len: Optional[int] = None,
        drain_between_batches: bool = False,
        lookahead: int = 1,
    ):
        super().__init__(
            model, num_slots, refill_group=refill_group,
            chunk_steps=chunk_steps, max_new_tokens=max_new_tokens,
            prompt_len=prompt_len,
            drain_between_batches=drain_between_batches,
            lookahead=lookahead, spec_k=0,
        )
        self.num_beams = int(num_beams or model.num_beams)
        assert self.num_beams >= 1
        if self.sample:
            raise ValueError(
                "do_sample requires the greedy engine — beam-sampling "
                "is not supported (matches MSR3D.generate)"
            )

    def _build_fns(self):
        import jax
        import jax.numpy as jnp
        from jax import lax
        from functools import partial

        from msr3d_tpu.models.llm.llama import _make_cache
        from msr3d_tpu.models.msr3d import MSR3D

        model = self.model
        network = model.gen_network  # remat-stripped inference twin
        llm_cfg = model.cfg.llm
        B, S_p, S_g = self.num_slots, self.prompt_len, self.max_new
        K = self.num_beams
        V = llm_cfg.vocab_size
        eos = model.tokenizer.eos_id
        pad = eos  # the generate path pads outputs with eos (msr3d.py:515-519)
        bos = model.tokenizer.bos_id
        rp = model.repetition_penalty
        eos_bias = model.eos_logit_bias
        lp = model.length_penalty
        min_length = 1
        n_steps = self.chunk_steps
        neg_inf = jnp.float32(-1e9)
        BK = B * K

        finalize_best, running_done, beam_step0, beam_rerank = (
            _hf_beam_machinery(
                K=K, V=V, S_g=S_g, eos=eos, pad=pad, lp=lp, rp=rp,
                eos_bias=eos_bias, min_length=min_length,
            )
        )

        @jax.jit
        def init_state():
            stacked = _make_cache(llm_cfg, BK, S_g)
            st = dict(
                # ancestry beam KV (see beam_search_decode_shared): rows
                # never reorder — the per-layer tuple layout lets every
                # layer's write alias its carry leaf, and only the anc
                # map gathers on a beam re-rank
                gen_kv=tuple(
                    {key: val[i] for key, val in stacked.items()}
                    for i in range(llm_cfg.num_hidden_layers)
                ),
                anc=jnp.zeros((BK, S_g), jnp.int32),
                # finalized best hypothesis per slot (host reads this)
                generated=jnp.full((B, S_g), pad, jnp.int32),
                beam_tokens=jnp.full((BK, S_g), pad, jnp.int32),
                beam_scores=jnp.full((BK,), neg_inf, jnp.float32),
                hyp_tokens=jnp.full((B, K, S_g), pad, jnp.int32),
                hyp_scores=jnp.full((B, K), neg_inf, jnp.float32),
                seen=jnp.zeros((BK, V), bool),
                cnt=jnp.zeros((B,), jnp.int32),
                pos=jnp.zeros((B,), jnp.int32),
                finished=jnp.ones((B,), bool),
                active=jnp.zeros((B,), bool),
                budget=jnp.zeros((B,), jnp.int32),
            )
            return (
                _make_cache(llm_cfg, B, S_p),  # prompt_kv (slot rows)
                jnp.zeros((B, S_p), bool),  # prompt_mask
                st,
            )

        @jax.jit
        def prefill(variables, batch):
            batch = MSR3D._unpack_batch(batch)
            return network.apply(
                variables, **batch, bos_id=bos, max_cache_len=S_p,
                method=network.prefill,
            )

        @partial(jax.jit, donate_argnums=(0, 1, 2))
        def insert(
            prompt_kv, prompt_mask, state,
            new_kv, new_mask, new_first, new_pos, slots, valid, budgets,
        ):
            r = slots.shape[0]
            prompt_kv = {
                key: arr.at[:, slots].set(new_kv[key].astype(arr.dtype))
                for key, arr in prompt_kv.items()
            }
            prompt_mask = prompt_mask.at[slots].set(new_mask)

            (gen_rows, score_rows, hyp_tok_rows, hyp_score_rows,
             seen_rows, fin0, out0) = beam_step0(new_first, budgets)

            rows = (slots[:, None] * K + jnp.arange(K)).reshape(-1)  # (r·K,)
            state = dict(
                state,
                generated=state["generated"].at[slots].set(
                    jnp.where(fin0[:, None], out0, pad)
                ),
                beam_tokens=state["beam_tokens"].at[rows].set(
                    gen_rows.reshape(r * K, S_g)
                ),
                beam_scores=state["beam_scores"].at[rows].set(
                    score_rows.reshape(-1)
                ),
                hyp_tokens=state["hyp_tokens"].at[slots].set(hyp_tok_rows),
                hyp_scores=state["hyp_scores"].at[slots].set(hyp_score_rows),
                seen=state["seen"].at[rows].set(seen_rows.reshape(r * K, V)),
                cnt=state["cnt"].at[slots].set(1),
                pos=state["pos"].at[slots].set(new_pos.astype(jnp.int32)),
                finished=state["finished"].at[slots].set(
                    jnp.where(valid, fin0, True)
                ),
                active=state["active"].at[slots].set(valid),
                budget=state["budget"].at[slots].set(budgets),
            )
            return prompt_kv, prompt_mask, state

        @partial(jax.jit, donate_argnums=(3,))
        def decode_chunk(variables, prompt_kv, prompt_mask, state):
            rowsK = jnp.arange(BK)
            slot_iota = jnp.arange(S_g)[None, :]

            def rep(x):  # (B,) → (B·K,) slot-major
                return jnp.repeat(x, K, axis=0)

            def cond(carry):
                i, st = carry
                return (i < n_steps) & jnp.any(st["active"] & ~st["finished"])

            def body(carry):
                i, st = carry
                run = st["active"] & ~st["finished"]  # (B,)
                runK = rep(run)
                cnt = st["cnt"]  # (B,) tokens emitted so far (≥1 active)
                cntK = rep(cnt)
                tok = st["beam_tokens"][rowsK, jnp.maximum(cntK - 1, 0)]
                gen_index = jnp.where(runK, cntK - 1, -1)  # idle rows drop
                gen_mask = slot_iota < cntK[:, None]
                # this step's KV write lands in the row itself (idle rows'
                # out-of-range index drops the anc write like the KV one)
                anc = st["anc"].at[
                    rowsK, jnp.where(runK, cntK - 1, S_g)
                ].set(rowsK % K, mode="drop")
                logits, gen_kv = network.apply(
                    variables, tok[:, None], rep(st["pos"])[:, None],
                    prompt_kv, prompt_mask, st["gen_kv"], gen_index,
                    gen_mask, anc, K,
                    method=network.decode_step_beam_anc,
                )
                st = beam_rerank(st, gen_kv, logits, anc, run, cnt)
                return i + 1, st

            steps, state = lax.while_loop(cond, body, (jnp.int32(0), state))
            return steps, state

        self._fns = (init_state, prefill, insert, decode_chunk)
        return self._fns


class PrefixPoolContinuousBatchingServer(ContinuousBatchingServer):
    """Continuous batching with a SHARED SCENE-PREFIX KV POOL — grouping
    composed with slot refill, the true MSQA serving shape (many
    questions per scene arriving as a stream).

    The plain continuous engine prefills every request's FULL prompt
    (preamble + scene tokens + question) into a per-slot prompt segment:
    the scene encoder, the prefix attention FLOPs, and the scene-array
    H2D transfer repeat per QUESTION, and per-slot prompt KV is the
    slot-count HBM wall (48 slots OOM +1.55G at the 256 budget, round 3).
    ``generate_scene_group`` removed all of that but only for fixed
    gang-scheduled batches. This engine keeps both wins at once,
    vLLM-block-table style on static shapes:

    - ``pool_kv``: a fixed pool of ``num_prefixes`` prefix KV blocks
      (G, S_pre). A block holds one (scene, situation) prefix — the
      prompt up to and including its last scene/image placeholder token
      — prefilled ONCE when the scene first appears and kept resident
      (LRU) after its last request finishes, so a scene returning later
      in the stream is still free.
    - per-request suffix (question tokens + trailing bos) runs as one
      left-padded T=``suffix_len`` window pass over its block's prefix
      (the grouped path's ``window_valid`` machinery) and lives at the
      HEAD of the slot's generated segment — per-slot prompt KV shrinks
      from the full prompt bucket to the question bucket.
    - decode attends the pool as a batch-1 (1, G·S_pre) pair segment
      shared by every slot; a per-slot visibility mask admits exactly
      the assigned block's rows (``decode_step_shared``'s per-query
      ``prompt_mask`` contract — the same trick ``beam_ancestry`` plays
      for beam rows). With G < B this READS LESS than per-slot prompt
      KV: each resident block is fetched once per step for all its
      slots.

    Block assignment is exact, never heuristic: a block's key is
    (scene-array hash, prefix token bytes), so two requests share a
    block only if the prefix prefill they would run is bit-identical.
    Unlike the grouped server, an explicit ``group_key`` is IGNORED for
    pool keying — a miskeyed group_key must never make two different
    scenes share a prefill (the array hash is sub-ms, memoized per
    request). Prompts with no scene/image placeholder share one
    permanently-empty block (the whole prompt rides the suffix window).

    Scheduling inherits the slot-refill host loop unchanged. The one new
    stall mode is head-of-line blocking: if the next request needs a new
    block and every block is referenced by an active slot, refill waits
    (finishing slots release blocks, so progress is guaranteed). Greedy
    only; ``spec_k``/``do_sample`` are plain-engine features.

    ``spec_k > 0`` composes n-gram speculative decoding with the pool
    (the two production serving wins stack: scene prefixes prefill once
    AND accepted drafts emit several tokens per verify forward — the
    echo-regime measurement in BASELINE.md round 4). Proposals look up
    suffix n-grams against the request's prefix+question+generated
    context (per-slot, kept in device state); acceptance compares
    against the model's own argmax, so tokens stay exact. Requires
    ``repetition_penalty == 1.0`` like the plain spec engine.

    Args beyond the base engine: ``num_prefixes`` (pool blocks G),
    ``prefix_len`` (prefix bucket S_pre, default the model's prompt
    bucket), ``suffix_len`` (question bucket W).
    """

    supports_progress = True
    _EMPTY_KEY = ("__no_placeholder_prefix__",)

    def __init__(
        self,
        model,
        num_slots: int,
        *,
        num_prefixes: int = 8,
        prefix_len: Optional[int] = None,
        suffix_len: int = 32,
        refill_group: int = 4,
        chunk_steps: int = 16,
        max_new_tokens: Optional[int] = None,
        drain_between_batches: bool = False,
        lookahead: int = 1,
        spec_k: int = 0,
        spec_ngram: int = 3,
    ):
        super().__init__(
            model, num_slots, refill_group=refill_group,
            chunk_steps=chunk_steps, max_new_tokens=max_new_tokens,
            prompt_len=prefix_len or model.prompt_pad_to,
            drain_between_batches=drain_between_batches,
            lookahead=lookahead, spec_k=spec_k, spec_ngram=spec_ngram,
        )
        if self.sample:
            # conscious boundary, not a TODO: the plain engine guarantees
            # sampled tokens depend ONLY on (sample_seed, request id) —
            # bit-exact across slot counts and co-scheduled requests,
            # because every per-row computation is row-invariant. The
            # pool's flattened batch-1 prefix segment breaks that: a
            # request's logits are reduced over the whole pool width, so
            # WHICH block it lands in shifts the float-reduction tree
            # (greedy argmax shrugs this off; a categorical draw near a
            # boundary would not). Sampling therefore stays on the plain
            # engine, whose contract it can keep.
            raise ValueError(
                "do_sample serving is a plain-continuous-engine feature: "
                "the (seed, request-id) determinism contract cannot be "
                "kept across pool-block assignments"
            )
        self.num_prefixes = int(num_prefixes)
        assert self.num_prefixes >= 1
        self.prefix_len = self.prompt_len  # S_pre bucket (no trailing bos)
        self.suffix_len = int(suffix_len)
        # host pool bookkeeping
        self._block_of: Dict[Any, int] = {}  # resident key -> block id
        self._block_key: List[Any] = [None] * self.num_prefixes
        self._block_ref = [0] * self.num_prefixes
        self._free_tick = [0] * self.num_prefixes  # LRU among ref==0
        self._tick = 0
        self._slot_block: Dict[int, int] = {}
        self._resolved: Dict[int, tuple] = {}  # rid -> (bid, needs, prefix, suffix, sample)
        self._split_cache: Dict[int, tuple] = {}  # rid -> (key, pre, suf)
        # reserve the empty-prefix block lazily: placeholder-less prompts
        # all share block assignments against an all-masked block
        self._empty_bid: Optional[int] = None
        self.prefix_prefills = 0  # prefix-prefill call census (observability)

    # -- compiled programs -------------------------------------------------

    def _make_prefix_fns(self):
        """``prefix_prefill`` + ``prefix_insert``, shared by the greedy
        and beam pool engines (one pool contract — a scatter-semantics
        fix lands in both)."""
        import jax
        import jax.numpy as jnp
        from functools import partial

        from msr3d_tpu.models.llm.llama import _make_cache
        from msr3d_tpu.models.msr3d import MSR3D

        network = self.model.gen_network  # remat-stripped inference twin
        llm_cfg = self.model.cfg.llm
        G, S_pre = self.num_prefixes, self.prefix_len
        bos = self.model.tokenizer.bos_id

        def init_pool():
            pool_kv = _make_cache(llm_cfg, G, S_pre)
            pool_mask = jnp.zeros((G, S_pre), bool)
            pool_npre = jnp.zeros((G,), jnp.int32)
            return pool_kv, pool_mask, pool_npre

        @jax.jit
        def prefix_prefill(variables, batch):
            batch = MSR3D._unpack_batch(batch)
            return network.apply(
                variables, **batch, bos_id=bos, max_cache_len=S_pre,
                append_bos=False, method=network.prefill,
            )

        @partial(jax.jit, donate_argnums=(0, 1, 2))
        def prefix_insert(
            pool_kv, pool_mask, pool_npre, new_kv, new_mask, new_npre,
            blocks, valid,
        ):
            # invalid (padding) rows scatter at index G -> dropped
            tgt = jnp.where(valid, blocks, jnp.int32(G))
            pool_kv = {
                key: arr.at[:, tgt].set(
                    new_kv[key].astype(arr.dtype), mode="drop"
                )
                for key, arr in pool_kv.items()
            }
            pool_mask = pool_mask.at[tgt].set(new_mask, mode="drop")
            pool_npre = pool_npre.at[tgt].set(
                new_npre.astype(jnp.int32), mode="drop"
            )
            return pool_kv, pool_mask, pool_npre

        return init_pool, prefix_prefill, prefix_insert

    def _build_fns(self):
        import jax
        import jax.numpy as jnp
        from jax import lax
        from functools import partial

        from msr3d_tpu.models.llm.llama import _make_cache
        from msr3d_tpu.models.llm.sampling import pick_next_rows
        from msr3d_tpu.models.msr3d import MSR3D

        model = self.model
        network = model.gen_network  # remat-stripped inference twin
        llm_cfg = model.cfg.llm
        B, G = self.num_slots, self.num_prefixes
        S_pre, W, S_g = self.prefix_len, self.suffix_len, self.max_new
        V = llm_cfg.vocab_size
        L = llm_cfg.num_hidden_layers
        eos = model.tokenizer.eos_id
        bos = model.tokenizer.bos_id
        rp = model.repetition_penalty
        eos_bias = model.eos_logit_bias
        n_steps = self.chunk_steps
        R = self.refill_group

        def pick_rows(logits, seen, steps):
            return pick_next_rows(
                logits, seen, steps, eos_id=eos, repetition_penalty=rp,
                eos_logit_bias=eos_bias,
            )

        spec_k = self.spec_k
        CW = S_pre + W  # per-slot proposal-context width (prefix + suffix)
        init_pool, prefix_prefill, prefix_insert = self._make_prefix_fns()

        @jax.jit
        def init_state():
            stacked = _make_cache(llm_cfg, B, W + S_g)
            st = dict(
                gen_kv=tuple(
                    {key: val[i] for key, val in stacked.items()}
                    for i in range(L)
                ),
                sufmask=jnp.zeros((B, W), bool),
                assign=jnp.zeros((B,), jnp.int32),
                generated=jnp.full((B, S_g), eos, jnp.int32),
                cnt=jnp.zeros((B,), jnp.int32),
                pos=jnp.zeros((B,), jnp.int32),
                finished=jnp.ones((B,), bool),
                active=jnp.zeros((B,), bool),
                seen=jnp.zeros((B, V), bool),
                budget=jnp.zeros((B,), jnp.int32),
            )
            if spec_k:
                # per-slot n-gram proposal context: the request's prefix
                # + question token ids (host-known — no pool-id gather)
                st["prompt_ids"] = jnp.zeros((B, CW), jnp.int32)
            return (*init_pool(), st)

        @partial(jax.jit, donate_argnums=(4,))
        def suffix_insert(
            variables, pool_kv, pool_mask, pool_npre, state,
            suffix_ids, wv, blocks, slots, valid, budgets, ctx_ids=None,
        ):
            r = slots.shape[0]
            # gather the group's blocks once (r rows, refill-time only —
            # decode reads the pool in place)
            pk_rows = {key: val[:, blocks] for key, val in pool_kv.items()}
            pm_rows = pool_mask[blocks]
            npre = pool_npre[blocks]
            wvb = wv.astype(bool)
            win_pos = jnp.maximum(
                npre[:, None] + jnp.cumsum(wv, axis=1) - 1, 0
            ).astype(jnp.int32)
            win_cache = _make_cache(llm_cfg, r, W)
            logits, win_kv = network.apply(
                variables, suffix_ids, win_pos, pk_rows, pm_rows,
                win_cache, jnp.int32(0), jnp.zeros((r, W), bool), wvb,
                method=network.decode_step_shared,
            )
            first = logits[:, -1, :].astype(jnp.float32)
            tok0 = pick_rows(
                first, jnp.zeros((r, V), bool), jnp.zeros((r,), jnp.int32)
            )
            gen_rows = jnp.full((r, S_g), eos, jnp.int32).at[:, 0].set(tok0)
            seen_rows = jnp.zeros((r, V), bool).at[
                jnp.arange(r), tok0
            ].set(True)
            fin0 = (tok0 == eos) | (budgets <= 1)
            gen_kv = []
            for i in range(L):
                layer = {
                    key: arr.at[slots, :W].set(
                        win_kv[key][i].astype(arr.dtype)
                    )
                    for key, arr in state["gen_kv"][i].items()
                }
                gen_kv.append(layer)
            state = dict(
                state,
                gen_kv=tuple(gen_kv),
                sufmask=state["sufmask"].at[slots].set(wvb),
                assign=state["assign"].at[slots].set(blocks),
                generated=state["generated"].at[slots].set(gen_rows),
                seen=state["seen"].at[slots].set(seen_rows),
                cnt=state["cnt"].at[slots].set(1),
                pos=state["pos"].at[slots].set(
                    (npre + jnp.sum(wv, axis=1)).astype(jnp.int32)
                ),
                finished=state["finished"].at[slots].set(
                    jnp.where(valid, fin0, True)
                ),
                active=state["active"].at[slots].set(valid),
                budget=state["budget"].at[slots].set(budgets),
            )
            if ctx_ids is not None:
                state["prompt_ids"] = state["prompt_ids"].at[slots].set(
                    ctx_ids.astype(jnp.int32)
                )
            return state

        @partial(jax.jit, donate_argnums=(3,))
        def decode_chunk(variables, pool_kv, pool_mask, state):
            rows = jnp.arange(B)
            slot_iota = jnp.arange(S_g)[None, :]
            # batch-1 flattened pool segment (a reshape - no copy)
            pool_flat = {
                key: val.reshape(
                    (val.shape[0], 1, G * S_pre) + val.shape[3:]
                )
                for key, val in pool_kv.items()
            }
            # per-slot block visibility: loop-invariant inside the chunk
            vis = (
                (state["assign"][:, None] == jnp.arange(G)[None, :])[
                    :, :, None
                ]
                & pool_mask[None]
            ).reshape(B, G * S_pre)

            def cond(carry):
                i, st = carry
                return (i < n_steps) & jnp.any(st["active"] & ~st["finished"])

            def body(carry):
                i, st = carry
                run = st["active"] & ~st["finished"]
                cnt = st["cnt"]
                tok = st["generated"][rows, jnp.maximum(cnt - 1, 0)]
                gen_index = jnp.where(run, W + cnt - 1, -1)
                gen_mask = jnp.concatenate(
                    [st["sufmask"], slot_iota < cnt[:, None]], axis=1
                )
                logits, gen_kv = network.apply(
                    variables, tok[:, None], st["pos"][:, None],
                    pool_flat, vis, st["gen_kv"], gen_index, gen_mask,
                    method=network.decode_step_shared,
                )
                nxt = pick_rows(
                    logits[:, -1, :].astype(jnp.float32), st["seen"], cnt
                )
                nxt = jnp.where(run, nxt, jnp.int32(eos))
                col = jnp.minimum(cnt, S_g - 1)
                cur = st["generated"][rows, col]
                generated = st["generated"].at[rows, col].set(
                    jnp.where(run, nxt, cur)
                )
                seen = jnp.where(
                    run[:, None], st["seen"].at[rows, nxt].set(True),
                    st["seen"],
                )
                finished = st["finished"] | (
                    run & ((nxt == eos) | (cnt + 1 >= st["budget"]))
                )
                inc = run.astype(jnp.int32)
                st = dict(
                    st, gen_kv=gen_kv, generated=generated, seen=seen,
                    finished=finished, cnt=cnt + inc, pos=st["pos"] + inc,
                )
                return i + 1, st

            steps, state = lax.while_loop(cond, body, (jnp.int32(0), state))
            return steps, state

        @partial(jax.jit, donate_argnums=(3,))
        def decode_chunk_spec(variables, pool_kv, pool_mask, state):
            """Speculative chunk over the pool: each iteration = ONE
            (spec_k+1)-token verify window per slot, drafts proposed by
            suffix n-gram lookup against prefix+question+generated. Same
            schedule contract as ``decode_chunk`` (steps = model calls);
            token-identical to the T=1 pool chunk (tested)."""
            from msr3d_tpu.models.llm.sampling import ngram_propose

            rows = jnp.arange(B)
            slot_iota = jnp.arange(S_g)[None, :]
            kk = spec_k
            pool_flat = {
                key: val.reshape(
                    (val.shape[0], 1, G * S_pre) + val.shape[3:]
                )
                for key, val in pool_kv.items()
            }
            vis = (
                (state["assign"][:, None] == jnp.arange(G)[None, :])[
                    :, :, None
                ]
                & pool_mask[None]
            ).reshape(B, G * S_pre)

            def cond(carry):
                i, st = carry
                return (i < n_steps) & jnp.any(st["active"] & ~st["finished"])

            def body(carry):
                i, st = carry
                run = st["active"] & ~st["finished"]
                cnt = st["cnt"]  # ≥1 on active slots (insert emits tok0)
                last_tok = st["generated"][rows, jnp.maximum(cnt - 1, 0)]
                ctx = jnp.concatenate(
                    [st["prompt_ids"], st["generated"]], axis=1
                )
                props = ngram_propose(
                    ctx, CW + cnt, ngram_n=self.spec_ngram, k=kk, pad_id=eos
                )
                verify = jnp.concatenate([last_tok[:, None], props], axis=1)
                pos = st["pos"][:, None] + jnp.arange(kk + 1)
                # window writes land at gen slots W+cnt-1 .. W+cnt-1+kk
                gen_index = jnp.where(run, W + cnt - 1, -1)
                # accepted context = suffix + generated slots 0..cnt-2
                # (slot cnt-1 is rewritten by this window)
                gen_mask = jnp.concatenate(
                    [st["sufmask"], slot_iota < (cnt - 1)[:, None]], axis=1
                )
                logits, gen_kv = network.apply(
                    variables, verify, pos, pool_flat, vis,
                    st["gen_kv"], gen_index, gen_mask,
                    method=network.decode_step_shared,
                )
                lg = logits.astype(jnp.float32)
                if eos_bias:
                    lg = lg + (jnp.arange(V) == eos) * jnp.float32(eos_bias)
                y = jnp.argmax(lg, axis=-1).astype(jnp.int32)  # (B, K+1)

                acc = jnp.cumprod(
                    (props == y[:, :kk]).astype(jnp.int32), axis=1
                )
                m = jnp.sum(acc, axis=1)
                is_eos_y = y == eos
                before_eos = (
                    jnp.cumsum(is_eos_y.astype(jnp.int32), axis=1) - is_eos_y
                )
                steps_idx = cnt[:, None] + jnp.arange(kk + 1)[None, :]
                emit = (
                    (jnp.arange(kk + 1)[None, :] <= m[:, None])
                    & (before_eos == 0)
                    & (steps_idx < st["budget"][:, None])
                    & run[:, None]
                )
                out_idx = jnp.where(emit, steps_idx, S_g)
                generated = st["generated"].at[rows[:, None], out_idx].set(
                    jnp.where(emit, y, eos), mode="drop"
                )
                n_new = jnp.sum(emit.astype(jnp.int32), axis=1)
                finished = st["finished"] | (
                    run
                    & (
                        jnp.any(emit & is_eos_y, axis=1)
                        | (cnt + n_new >= st["budget"])
                    )
                )
                st = dict(
                    st, gen_kv=gen_kv, generated=generated,
                    finished=finished, cnt=cnt + n_new,
                    pos=st["pos"] + n_new,
                )
                return i + 1, st

            steps, state = lax.while_loop(cond, body, (jnp.int32(0), state))
            return steps, state

        self._fns = (
            init_state, prefix_prefill, prefix_insert, suffix_insert,
            decode_chunk_spec if spec_k else decode_chunk,
        )
        return self._fns

    # -- host-side pool management ----------------------------------------

    def _split_sample(self, sample: Dict[str, Any]):
        """(key, prefix token ids, suffix token ids) for one request.

        The split point is AFTER the last scene/image placeholder token
        (special tokens - never merged by BPE), so the prefix token
        sequence is identical for every request whose pre-question text
        and scene arrays match, and the suffix is pure text the window
        pass can embed without splicing. The key pairs the scene
        fingerprint with the prefix bytes - block reuse is bit-exact by
        construction."""
        model = self.model
        tok = model.tokenizer
        texts = model.build_text_prompt(_collate([sample]))
        enc = tok.encode_batch(
            texts, padding_side="left", add_bos=True, pad_to=None
        )
        row = enc.input_ids[0][enc.attention_mask[0].astype(bool)]
        ph = {tok.scene_token_id, tok.img_token_id}
        last = -1
        for i, t in enumerate(row):
            if int(t) in ph:
                last = i
        # pool keys hash the scene ARRAYS unconditionally — an explicit
        # group_key is deliberately ignored here (unlike the grouped
        # server): a miskeyed group_key must never make two different
        # scenes share a prefill. The hash is sub-ms and memoized per
        # request in _split_cache.
        sample_arrays = {k: v for k, v in sample.items() if k != "group_key"}
        if last < 0:
            prefix = np.zeros((0,), np.int32)
            key = self._EMPTY_KEY
        else:
            prefix = np.asarray(row[: last + 1], np.int32)
            key = (scene_fingerprint(sample_arrays), prefix.tobytes())
        suffix = [int(t) for t in row[last + 1 :]] + [tok.bos_id]
        # explicit raises, not asserts: the HTTP front-end turns these
        # into per-request 400s, and python -O must not strip them into
        # an engine-killing shape error at refill time
        if len(prefix) > self.prefix_len:
            raise ValueError(
                f"scene prefix ({len(prefix)} tokens) exceeds the engine's "
                f"prefix bucket ({self.prefix_len}); raise prefix_len"
            )
        if len(suffix) > self.suffix_len:
            raise ValueError(
                f"question suffix ({len(suffix)} tokens incl. trailing "
                f"bos) exceeds the engine's suffix bucket "
                f"({self.suffix_len}); raise suffix_len"
            )
        return key, prefix, suffix

    def _alloc_block(self, key) -> Optional[int]:
        """Claim a block for ``key``: a virgin block if any, else evict
        the least-recently-freed resident block. None = all referenced."""
        virgin = None
        lru_bid, lru_tick = None, None
        for bid in range(self.num_prefixes):
            if self._block_ref[bid] > 0 or bid == self._empty_bid:
                continue
            if self._block_key[bid] is None:
                virgin = bid
                break
            if lru_tick is None or self._free_tick[bid] < lru_tick:
                lru_bid, lru_tick = bid, self._free_tick[bid]
        bid = virgin if virgin is not None else lru_bid
        if bid is None:
            return None
        old = self._block_key[bid]
        if old is not None:
            del self._block_of[old]
        self._block_key[bid] = key
        self._block_of[key] = bid
        return bid

    def _take_group(self, queue: deque) -> list:
        group = []
        group_new = {}  # key -> bid claimed by this group
        while queue and len(group) < self.refill_group:
            rid, sample, budget = queue[0]
            pre_split = sample.get("_pool_split")
            if pre_split is not None:
                # the HTTP front-end already ran _split_sample during
                # validation and attached the result — reuse it instead
                # of prompt-building/tokenizing the same sample twice
                key, prefix, suffix = pre_split
            elif rid in self._split_cache:
                key, prefix, suffix = self._split_cache[rid]
            else:
                key, prefix, suffix = self._split_sample(sample)
                self._split_cache[rid] = (key, prefix, suffix)
            if key == self._EMPTY_KEY:
                if self._empty_bid is None:
                    # claim a permanent all-masked block (never prefilled)
                    bid = self._alloc_block(key)
                    if bid is None:
                        break
                    self._empty_bid = bid
                bid, needs = self._empty_bid, False
            elif key in self._block_of:
                bid, needs = self._block_of[key], False
            elif key in group_new:
                bid, needs = group_new[key], False
            else:
                bid = self._alloc_block(key)
                if bid is None:
                    if not self._slot_block and not group:
                        # nothing active and nothing scheduled this group:
                        # no slot will ever free a block — a too-small pool
                        # (e.g. num_prefixes=1 consumed by the empty-prefix
                        # block) must fail loud, not hang
                        raise RuntimeError(
                            "prefix pool exhausted with no active slots — "
                            f"num_prefixes={self.num_prefixes} cannot "
                            "schedule this request mix; raise num_prefixes"
                        )
                    break  # head-of-line blocked until a slot frees
                group_new[key] = bid
                needs = True
            queue.popleft()
            self._split_cache.pop(rid, None)  # absent when _pool_split was used
            self._block_ref[bid] += 1
            self._resolved[rid] = (bid, needs, prefix, suffix, sample)
            group.append((rid, sample, budget))
        return group

    def _on_slot_free(self, slot: int) -> None:
        bid = self._slot_block.pop(slot, None)
        if bid is not None:
            self._block_ref[bid] -= 1
            if self._block_ref[bid] == 0:
                self._tick += 1
                self._free_tick[bid] = self._tick

    # -- refill/decode hooks ------------------------------------------------

    def _engine_init(self):
        init_state = self._fns[0]
        pool_kv, pool_mask, pool_npre, st = init_state()
        # a fresh run resets host pool bookkeeping (device pool is fresh)
        self._block_of.clear()
        self._block_key = [None] * self.num_prefixes
        self._block_ref = [0] * self.num_prefixes
        self._free_tick = [0] * self.num_prefixes
        self._tick = 0
        self._slot_block.clear()
        self._resolved.clear()
        self._split_cache.clear()
        self._empty_bid = None
        self.prefix_prefills = 0
        return (pool_kv, pool_mask, pool_npre), st

    def _engine_refill(self, prompt_ctx, state, group, slots):
        import jax.numpy as jnp

        from msr3d_tpu.models.msr3d import _to_jax

        model = self.model
        pool_kv, pool_mask, pool_npre = prompt_ctx
        _, prefix_prefill, prefix_insert, suffix_insert, _ = self._fns
        r = self.refill_group
        pad_id = model.tokenizer.pad_id
        res = [self._resolved.pop(rid) for rid, _, _ in group]

        # --- new prefix blocks (each key appears with needs=True once) --
        new = [(bid, pre, smp) for bid, needs, pre, _, smp in res if needs]
        if new:
            width = self.prefix_len
            pids = np.full((r, width), pad_id, np.int32)
            pattn = np.zeros((r, width), np.int32)
            blocks_new = np.zeros(r, np.int32)
            valid_new = np.zeros(r, bool)
            row_samples = []
            for j, (bid, pre, smp) in enumerate(new):
                pids[j, width - len(pre):] = pre
                pattn[j, width - len(pre):] = 1
                blocks_new[j] = bid
                valid_new[j] = True
                row_samples.append(smp)
            while len(row_samples) < r:
                row_samples.append(row_samples[-1])  # padding rows dropped
                pids[len(row_samples) - 1] = pids[0]
                pattn[len(row_samples) - 1] = pattn[0]
            data = _collate(row_samples)
            batch = model._maybe_pack(model._scene_batch(data))
            batch.update(input_ids=pids, attention_mask=pattn)
            _, kv, mask, npos = prefix_prefill(model.params, _to_jax(batch))
            self.prefix_prefills += 1
            pool_kv, pool_mask, pool_npre = prefix_insert(
                pool_kv, pool_mask, pool_npre, kv, mask, npos,
                jnp.asarray(blocks_new), jnp.asarray(valid_new),
            )

        # --- suffix window + slot insert --------------------------------
        W = self.suffix_len
        sids = np.full((r, W), pad_id, np.int32)
        wv = np.zeros((r, W), np.int32)
        blocks = np.zeros(r, np.int32)
        budgets = np.ones(r, np.int32)
        valid = np.zeros(r, bool)
        for j, ((rid, _, budget), (bid, _, _, suffix, _)) in enumerate(
            zip(group, res)
        ):
            sids[j, W - len(suffix):] = suffix
            wv[j, W - len(suffix):] = 1
            blocks[j] = bid
            budgets[j] = budget
            valid[j] = True
            self._slot_block[slots[j]] = bid
        for j in range(len(group), r):  # padding rows mirror row 0, idle
            sids[j] = sids[0]
            wv[j] = wv[0]
            blocks[j] = blocks[0]
        spec_args = {}
        if self.spec_k:
            # per-slot n-gram proposal context: left-padded prefix+suffix
            cw = self.prefix_len + W
            ctx = np.full((r, cw), pad_id, np.int32)
            for j, (_, _, prefix, suffix, _) in enumerate(res):
                seq = list(map(int, prefix)) + list(map(int, suffix))
                ctx[j, cw - len(seq):] = seq
            for j in range(len(group), r):
                ctx[j] = ctx[0]
            spec_args["ctx_ids"] = jnp.asarray(ctx)
        state = suffix_insert(
            model.params, pool_kv, pool_mask, pool_npre, state,
            jnp.asarray(sids), jnp.asarray(wv), jnp.asarray(blocks),
            jnp.asarray(np.asarray(slots, np.int32)), jnp.asarray(valid),
            jnp.asarray(budgets), **spec_args,
        )
        return (pool_kv, pool_mask, pool_npre), state

    def _engine_decode(self, prompt_ctx, state):
        decode_chunk = self._fns[4]
        pool_kv, pool_mask, _ = prompt_ctx
        return decode_chunk(self.model.params, pool_kv, pool_mask, state)


class PrefixPoolContinuousBeamBatchingServer(PrefixPoolContinuousBatchingServer):
    """Prefix-pool continuous batching for BEAM-SEARCH serving — the
    reference's exact accuracy-eval decode (num_beams=5,
    repetition_penalty=3.0, 256-token budget) with the scene prefix
    prefilled once per scene AND slot-refill scheduling.

    Layout differences from the greedy pool engine:

    - the per-slot question suffix KV lives in its own (B, W) pool,
      attended as a second batch-1 flattened segment next to the block
      pool — stored ONCE per slot, never replicated across the K beam
      rows (at the 256-token budget the generated segment is the
      allocation that walls batch size; +W per beam row would cost
      ~K·W/S_g of it).
    - the generated segment stays (B·K, S_g) with ancestry-indirected
      KV exactly like :class:`ContinuousBeamBatchingServer`.

    Host pool management (block keys, LRU, head-of-line blocking) is
    inherited unchanged; ``suffix_insert`` additionally runs HF beam
    step 0 on the window pass's last-token logits.
    """

    supports_progress = False  # hypotheses finalize at search end

    def __init__(
        self,
        model,
        num_slots: int,
        *,
        num_beams: Optional[int] = None,
        num_prefixes: int = 8,
        prefix_len: Optional[int] = None,
        suffix_len: int = 32,
        refill_group: int = 4,
        chunk_steps: int = 16,
        max_new_tokens: Optional[int] = None,
        drain_between_batches: bool = False,
        lookahead: int = 1,
    ):
        super().__init__(
            model, num_slots, num_prefixes=num_prefixes,
            prefix_len=prefix_len, suffix_len=suffix_len,
            refill_group=refill_group, chunk_steps=chunk_steps,
            max_new_tokens=max_new_tokens,
            drain_between_batches=drain_between_batches, lookahead=lookahead,
        )
        self.num_beams = int(num_beams or model.num_beams)
        assert self.num_beams >= 1

    def _build_fns(self):
        import jax
        import jax.numpy as jnp
        from jax import lax
        from functools import partial

        from msr3d_tpu.models.llm.llama import _make_cache
        from msr3d_tpu.models.msr3d import MSR3D

        model = self.model
        network = model.gen_network  # remat-stripped inference twin
        llm_cfg = model.cfg.llm
        B, G, K = self.num_slots, self.num_prefixes, self.num_beams
        S_pre, W, S_g = self.prefix_len, self.suffix_len, self.max_new
        V = llm_cfg.vocab_size
        L = llm_cfg.num_hidden_layers
        eos = model.tokenizer.eos_id
        pad = eos  # generate pads outputs with eos (msr3d.py:515-519)
        bos = model.tokenizer.bos_id
        rp = model.repetition_penalty
        eos_bias = model.eos_logit_bias
        lp = model.length_penalty
        min_length = 1
        n_steps = self.chunk_steps
        neg_inf = jnp.float32(-1e9)
        BK = B * K

        finalize_best, running_done, beam_step0, beam_rerank = (
            _hf_beam_machinery(
                K=K, V=V, S_g=S_g, eos=eos, pad=pad, lp=lp, rp=rp,
                eos_bias=eos_bias, min_length=min_length,
            )
        )

        @jax.jit
        def init_state():
            stacked = _make_cache(llm_cfg, BK, S_g)
            st = dict(
                gen_kv=tuple(
                    {key: val[i] for key, val in stacked.items()}
                    for i in range(L)
                ),
                suf_kv=_make_cache(llm_cfg, B, W),  # per-slot, beam-shared
                sufmask=jnp.zeros((B, W), bool),
                assign=jnp.zeros((B,), jnp.int32),
                anc=jnp.zeros((BK, S_g), jnp.int32),
                generated=jnp.full((B, S_g), pad, jnp.int32),
                beam_tokens=jnp.full((BK, S_g), pad, jnp.int32),
                beam_scores=jnp.full((BK,), neg_inf, jnp.float32),
                hyp_tokens=jnp.full((B, K, S_g), pad, jnp.int32),
                hyp_scores=jnp.full((B, K), neg_inf, jnp.float32),
                seen=jnp.zeros((BK, V), bool),
                cnt=jnp.zeros((B,), jnp.int32),
                pos=jnp.zeros((B,), jnp.int32),
                finished=jnp.ones((B,), bool),
                active=jnp.zeros((B,), bool),
                budget=jnp.zeros((B,), jnp.int32),
            )
            return (*init_pool(), st)

        init_pool, prefix_prefill, prefix_insert = self._make_prefix_fns()

        @partial(jax.jit, donate_argnums=(4,))
        def suffix_insert(
            variables, pool_kv, pool_mask, pool_npre, state,
            suffix_ids, wv, blocks, slots, valid, budgets,
        ):
            r = slots.shape[0]
            pk_rows = {key: val[:, blocks] for key, val in pool_kv.items()}
            pm_rows = pool_mask[blocks]
            npre = pool_npre[blocks]
            wvb = wv.astype(bool)
            win_pos = jnp.maximum(
                npre[:, None] + jnp.cumsum(wv, axis=1) - 1, 0
            ).astype(jnp.int32)
            win_cache = _make_cache(llm_cfg, r, W)
            logits, win_kv = network.apply(
                variables, suffix_ids, win_pos, pk_rows, pm_rows,
                win_cache, jnp.int32(0), jnp.zeros((r, W), bool), wvb,
                method=network.decode_step_shared,
            )
            first = logits[:, -1, :].astype(jnp.float32)

            (gen_rows, score_rows, hyp_tok_rows, hyp_score_rows,
             seen_rows, fin0, out0) = beam_step0(first, budgets)

            rows = (slots[:, None] * K + jnp.arange(K)).reshape(-1)
            state = dict(
                state,
                suf_kv={
                    key: arr.at[:, slots].set(
                        win_kv[key].astype(arr.dtype)
                    )
                    for key, arr in state["suf_kv"].items()
                },
                sufmask=state["sufmask"].at[slots].set(wvb),
                assign=state["assign"].at[slots].set(blocks),
                generated=state["generated"].at[slots].set(
                    jnp.where(fin0[:, None], out0, pad)
                ),
                beam_tokens=state["beam_tokens"].at[rows].set(
                    gen_rows.reshape(r * K, S_g)
                ),
                beam_scores=state["beam_scores"].at[rows].set(
                    score_rows.reshape(-1)
                ),
                hyp_tokens=state["hyp_tokens"].at[slots].set(hyp_tok_rows),
                hyp_scores=state["hyp_scores"].at[slots].set(hyp_score_rows),
                seen=state["seen"].at[rows].set(seen_rows.reshape(r * K, V)),
                cnt=state["cnt"].at[slots].set(1),
                pos=state["pos"].at[slots].set(
                    (npre + jnp.sum(wv, axis=1)).astype(jnp.int32)
                ),
                finished=state["finished"].at[slots].set(
                    jnp.where(valid, fin0, True)
                ),
                active=state["active"].at[slots].set(valid),
                budget=state["budget"].at[slots].set(budgets),
            )
            return state

        @partial(jax.jit, donate_argnums=(3,))
        def decode_chunk(variables, pool_kv, pool_mask, state):
            rowsK = jnp.arange(BK)
            slot_iota = jnp.arange(S_g)[None, :]

            def rep(x):  # (B,) → (B·K,) slot-major
                return jnp.repeat(x, K, axis=0)

            pool_flat = {
                key: val.reshape(
                    (val.shape[0], 1, G * S_pre) + val.shape[3:]
                )
                for key, val in pool_kv.items()
            }
            suf_flat = {
                key: val.reshape((val.shape[0], 1, B * W) + val.shape[3:])
                for key, val in state["suf_kv"].items()
            }
            # visibility (loop-invariant per chunk): assigned block rows +
            # own slot's suffix rows
            vis_pool = (
                (state["assign"][:, None] == jnp.arange(G)[None, :])[
                    :, :, None
                ]
                & pool_mask[None]
            ).reshape(B, G * S_pre)
            vis_suf = (
                jnp.eye(B, dtype=bool)[:, :, None] & state["sufmask"][None]
            ).reshape(B, B * W)
            pm_full = jnp.repeat(
                jnp.concatenate([vis_pool, vis_suf], axis=1), K, axis=0
            )  # (B·K, G·S_pre + B·W)

            def cond(carry):
                i, st = carry
                return (i < n_steps) & jnp.any(st["active"] & ~st["finished"])

            def body(carry):
                i, st = carry
                run = st["active"] & ~st["finished"]
                runK = rep(run)
                cnt = st["cnt"]
                cntK = rep(cnt)
                tok = st["beam_tokens"][rowsK, jnp.maximum(cntK - 1, 0)]
                gen_index = jnp.where(runK, cntK - 1, -1)
                gen_mask = slot_iota < cntK[:, None]
                anc = st["anc"].at[
                    rowsK, jnp.where(runK, cntK - 1, S_g)
                ].set(rowsK % K, mode="drop")
                logits, gen_kv = network.apply(
                    variables, tok[:, None], rep(st["pos"])[:, None],
                    (pool_flat, suf_flat), pm_full, st["gen_kv"], gen_index,
                    gen_mask, anc, K,
                    method=network.decode_step_beam_anc,
                )
                st = beam_rerank(st, gen_kv, logits, anc, run, cnt)
                return i + 1, st

            steps, state = lax.while_loop(cond, body, (jnp.int32(0), state))
            return steps, state

        self._fns = (
            init_state, prefix_prefill, prefix_insert, suffix_insert,
            decode_chunk,
        )
        return self._fns
