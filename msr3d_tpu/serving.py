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
)


@dataclasses.dataclass
class Result:
    id: int
    output_text: str
    output_tokens: np.ndarray


def _collate(samples: List[Dict[str, Any]]) -> Dict[str, Any]:
    batch: Dict[str, Any] = {
        "msr3d_prompt": [s["msr3d_prompt"] for s in samples],
    }
    for key in _BATCH_KEYS:
        if key in samples[0] and samples[0][key] is not None:
            batch[key] = np.stack([np.asarray(s[key]) for s in samples])
    return batch


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
