"""Multi-host training/eval semantics (VERDICT round-2 #2 and #8):

1. DataLoader shard sampler: deterministic global order, strided shards,
   train tail-drop vs eval wrap-padding, exact duplicate accounting.
2. eval_task drops wrap-around duplicates so every real sample is
   scored exactly once across shards (reference remainder truncation,
   common/misc.py:150-184).
3. A REAL 2-process dp train step through LeoTrainer — per-host disjoint
   data fed via jax.make_array_from_process_local_data — whose final
   params match the fused single-process (2-virtual-device) run.
"""

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent


# ---------------------------------------------------------------------------
# 1. shard sampler semantics (fast)
# ---------------------------------------------------------------------------


class _ToyDataset:
    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return {"sample_id": i}


def _loader(n, k, s, **kw):
    from msr3d_tpu.data.build import DataLoader

    return DataLoader(
        _ToyDataset(n), batch_size=2, prefetch=0, num_shards=k, shard_id=s, **kw
    )


def test_eval_shards_wrap_pad_and_cover_exactly_once():
    n, k = 10, 3  # 10 % 3 = 1 → shards 1 and 2 carry one duplicate each
    seen = []
    for s in range(k):
        ld = _loader(n, k, s)
        ids = [d["sample_id"] for batch in ld for d in batch]
        assert len(ids) == 4  # ceil(10/3) — equal across shards
        tail = ld.padded_tail
        assert tail == (0 if s < n % k else 1)
        seen.extend(ids[: len(ids) - tail])
    assert sorted(seen) == list(range(n))  # exactly-once cover after trim


def test_train_shards_drop_tail_equal_counts():
    n, k = 10, 3
    seen = []
    for s in range(k):
        ld = _loader(n, k, s, drop_last=True, shuffle=True)
        ids = [d["sample_id"] for batch in ld for d in batch]
        assert ld.padded_tail == 0
        seen.extend(ids)
    # global tail dropped to equalize shards (10→9), then batch-2
    # drop_last trims each 3-sample shard to one batch: 3 shards × 2
    assert len(seen) == 6
    assert len(set(seen)) == len(seen)  # all distinct — disjoint shards


def test_shards_share_one_global_permutation():
    n, k = 12, 4
    orders = []
    for s in range(k):
        ld = _loader(n, k, s, shuffle=True, seed=7)
        orders.append([d["sample_id"] for b in ld for d in b])
    merged = [orders[j % k][j // k] for j in range(n)]
    ld_full = _loader(n, 1, 0, shuffle=True, seed=7)
    want = [d["sample_id"] for b in ld_full for d in b]
    assert merged == want  # strided interleave reconstructs the global order


def test_worker_processes_match_inline():
    """num_workers>0 loads batches in forked worker processes (the
    reference's torch DataLoader model) — same batches, same order."""
    from msr3d_tpu.data.build import DataLoader

    def collate(items):
        return sorted(d["sample_id"] for d in items)

    inline = DataLoader(_ToyDataset(11), batch_size=3, prefetch=0, collate_fn=collate)
    workers = DataLoader(
        _ToyDataset(11), batch_size=3, prefetch=0, num_workers=2,
        collate_fn=collate,
    )
    assert list(workers) == list(inline)
    # shuffled epochs stay deterministic across loader kinds too
    inline_s = DataLoader(_ToyDataset(11), batch_size=3, prefetch=0,
                          shuffle=True, seed=5, collate_fn=collate)
    workers_s = DataLoader(_ToyDataset(11), batch_size=3, prefetch=0,
                           shuffle=True, seed=5, num_workers=2,
                           collate_fn=collate)
    assert list(workers_s) == list(inline_s)


def test_worker_processes_propagate_errors():
    from msr3d_tpu.data.build import DataLoader

    class Bad(_ToyDataset):
        def __getitem__(self, i):
            if i == 4:
                raise ValueError("boom at 4")
            return super().__getitem__(i)

    loader = DataLoader(Bad(8), batch_size=2, prefetch=0, num_workers=2)
    with pytest.raises(ValueError, match="boom"):
        list(loader)


# ---------------------------------------------------------------------------
# 2. eval_task duplicate trimming (single-process, sharded loaders)
# ---------------------------------------------------------------------------


@pytest.mark.slow
def test_eval_task_drops_wraparound_duplicates(tmp_path):
    from msr3d_tpu.config import config_from_dict
    from msr3d_tpu.data.build import DataLoader
    from msr3d_tpu.trainer.leo_trainer import LeoTrainer
    from tests.test_msr3d import tiny_data_dict, tiny_model

    base = tiny_data_dict(np.random.default_rng(3))

    class SampleDataset:
        """5 single-sample items, collated into tiny_data_dict format."""

        def __len__(self):
            return 5

        def __getitem__(self, i):
            row = i % 2
            out = {}
            for k, v in base.items():
                out[k] = v[row] if not isinstance(v, list) else v[row]
            out["index"] = i
            return out

    def collate(items):
        out = {}
        for k in items[0]:
            vals = [it[k] for it in items]
            if isinstance(vals[0], str):
                out[k] = vals
            elif k == "index":
                out[k] = list(vals)
            else:
                out[k] = np.stack(vals)
        return out

    class Recorder:
        def __init__(self):
            self.indices = []

        def reset(self):
            self.indices = []

        def update(self, record):
            self.indices.extend(record["index"])

        def record(self, split):
            return False, {"n": len(self.indices)}

    cfg = config_from_dict(
        {
            "exp_dir": str(tmp_path / "exp"),
            "mode": "eval",
            "solver": {
                "gradient_accumulation_steps": 1, "grad_norm": 5.0, "epochs": 1,
                "optim": {"name": "AdamW", "args": {"lr": 1e-3, "betas": [0.9, 0.999], "weight_decay": 0.0}},
                "sched": {"name": "warmup_cosine_instructblip", "args": {"warmup_steps": 2}},
            },
        }
    )
    model = tiny_model()
    all_indices = []
    for shard in range(2):
        loader = DataLoader(
            SampleDataset(), batch_size=2, prefetch=0,
            num_shards=2, shard_id=shard, collate_fn=collate,
        )
        rec = Recorder()
        trainer = LeoTrainer(
            cfg,
            loaders={"msqa": {"val": loader}},
            evaluators={"msqa": rec},
            model=model,
        )
        trainer.eval_task("msqa", "val")
        # shards have EQUAL batch counts (no collective deadlock)
        assert len(loader) == 2
        all_indices.extend(rec.indices)
    # every real sample scored exactly once; the wrap duplicate dropped
    assert sorted(all_indices) == [0, 1, 2, 3, 4]


# ---------------------------------------------------------------------------
# 3. real 2-process train step == fused single-process run
# ---------------------------------------------------------------------------

WORKER = r"""
import json
import os
import sys

sys.path.insert(0, os.environ["MSR3D_REPO"])

import jax

jax.config.update("jax_platforms", "cpu")

mode = os.environ["MODE"]
if mode == "dist":
    from msr3d_tpu.parallel.mesh import initialize_distributed_from_env

    assert initialize_distributed_from_env()

import numpy as np

from msr3d_tpu.config import config_from_dict
from msr3d_tpu.trainer.leo_trainer import LeoTrainer
from msr3d_tpu.trainer.train_state import filter_learnable
from tests.test_msr3d import tiny_data_dict, tiny_model


def global_batch(step):
    rng = np.random.default_rng(100 + step)
    d1 = tiny_data_dict(rng)
    d2 = tiny_data_dict(rng)
    out = {}
    for k in d1:
        out[k] = d1[k] + d2[k] if isinstance(d1[k], list) else np.concatenate(
            [d1[k], d2[k]], axis=0
        )
    return out


def slice_batch(d, lo, hi):
    return {k: v[lo:hi] for k, v in d.items()}


class Loader:
    def __init__(self, lo, hi, n=2):
        self.lo, self.hi, self.n = lo, hi, n

    def __len__(self):
        return self.n

    def __iter__(self):
        for s in range(self.n):
            yield slice_batch(global_batch(s), self.lo, self.hi)


if mode == "dist":
    pid = jax.process_index()
    loader = Loader(2 * pid, 2 * pid + 2)
else:
    loader = Loader(0, 4)

cfg = config_from_dict(
    {
        "exp_dir": os.environ["EXP"],
        "mode": "train",
        "rng_seed": 0,
        "fixed_text_buckets": True,  # identical widths in fused + dist runs
        "solver": {
            "gradient_accumulation_steps": 1,
            "grad_norm": 5.0,
            "epochs": 1,
            "optim": {"name": "AdamW", "args": {"lr": 1e-2, "betas": [0.9, 0.999], "weight_decay": 0.0}},
            "sched": {"name": "warmup_cosine_instructblip", "args": {"warmup_steps": 2}},
        },
    }
)
model = tiny_model()
trainer = LeoTrainer(
    cfg, loaders={"msr3d_train": {"train": loader}}, evaluators={}, model=model
)
assert trainer.mesh.shape["dp"] == 2, trainer.mesh
step_losses = []
_orig_step = trainer._train_step


def _recording_step(state, batch, rng):
    state, metrics = _orig_step(state, batch, rng)
    step_losses.append(repr(float(metrics["loss"])))
    return state, metrics


trainer._train_step = _recording_step
stats = trainer.train_one_epoch(0)
learn = filter_learnable(trainer.state.params["params"], trainer.trainable_mask)
flat = {
    jax.tree_util.keystr(p): np.asarray(l)
    for p, l in jax.tree_util.tree_leaves_with_path(learn)
    if l is not None
}
if mode != "dist" or jax.process_index() == 0:
    np.savez(os.environ["OUT"], **flat)
print(json.dumps({
    "loss": stats["loss"],
    "step": int(trainer.state.step),
    "step_losses": step_losses,
}))
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_train_matches_fused(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(WORKER)

    def run_fused():
        env = dict(os.environ)
        env.pop("PYTHONPATH", None)
        env.update(
            MSR3D_REPO=str(REPO),
            MODE="fused",
            EXP=str(tmp_path / "exp_fused"),
            OUT=str(tmp_path / "fused.npz"),
            XLA_FLAGS="--xla_force_host_platform_device_count=2",
        )
        p = subprocess.run(
            [sys.executable, str(worker)], env=env, capture_output=True,
            text=True, timeout=900, cwd=str(REPO),
        )
        assert p.returncode == 0, p.stderr[-4000:]
        return json.loads(p.stdout.strip().splitlines()[-1])

    def run_dist():
        port = _free_port()
        procs = []
        for pid in range(2):
            env = dict(os.environ)
            env.pop("PYTHONPATH", None)
            env.update(
                MSR3D_REPO=str(REPO),
                MODE="dist",
                EXP=str(tmp_path / f"exp_dist{pid}"),
                OUT=str(tmp_path / "dist.npz"),
                JAX_COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
                JAX_NUM_PROCESSES="2",
                JAX_PROCESS_ID=str(pid),
                XLA_FLAGS="--xla_force_host_platform_device_count=1",
            )
            procs.append(
                subprocess.Popen(
                    [sys.executable, str(worker)], env=env,
                    stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
                    cwd=str(REPO),
                )
            )
        outs = []
        for p in procs:
            out, err = p.communicate(timeout=900)
            assert p.returncode == 0, err[-4000:]
            outs.append(json.loads(out.strip().splitlines()[-1]))
        return outs

    fused = run_fused()
    dist = run_dist()

    # both saw 2 optimizer steps with PER-STEP losses identical to full
    # float precision (repr-equal) — the forward+grad+update chain agrees
    assert fused["step"] == 2 and len(fused["step_losses"]) == 2
    for rec in dist:
        assert rec["step"] == 2
        assert rec["step_losses"] == fused["step_losses"], (
            rec["step_losses"], fused["step_losses"],
        )

    a = np.load(tmp_path / "fused.npz")
    b = np.load(tmp_path / "dist.npz")
    assert set(a.files) == set(b.files) and len(a.files) > 4
    for k in a.files:
        # atol 2e-5: parameters whose TRUE gradient is zero (e.g. the
        # softmax-invariant w_ks key bias) receive Adam-amplified float-
        # noise updates of O(lr·sched) ~1e-5 that differ bitwise between
        # the single-process and cross-process collective stacks; real
        # signal updates are 100×+ larger, so structural divergence
        # (wrong data / wrong averaging) still fails loudly
        np.testing.assert_allclose(
            a[k], b[k], rtol=1e-4, atol=2e-5, err_msg=k
        )
