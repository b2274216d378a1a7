"""CLI launcher (reference launch.py:14-67 surface).

Modes:
  python     in-process single-host run (debug; the default here)
  accelerate single-host run — on TPU the single-controller JAX runtime
             owns all local chips, so this is the same in-process run
             (the reference spawned one process per GPU via accelerate)
  submitit   multi-host SLURM launch: submits one task per node that calls
             back into run.py with jax.distributed coordinator env set
             (requires submitit; optional dependency)
"""

from __future__ import annotations

import argparse
import os
import sys


def parse_args(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--mode", default="python",
                        choices=["python", "accelerate", "submitit"])
    parser.add_argument("--config", required=True)
    parser.add_argument("--name", default="msr3d_tpu", help="job name (submitit)")
    parser.add_argument("--partition", default="", help="SLURM partition")
    parser.add_argument("--num_nodes", type=int, default=1)
    parser.add_argument("--port", type=int, default=12345)
    parser.add_argument("--time", type=int, default=4320, help="minutes")
    parser.add_argument("--mixed_precision", default="bf16",
                        choices=["no", "fp16", "bf16"])
    parser.add_argument("opts", nargs=argparse.REMAINDER)
    return parser.parse_args(argv)


def python_launch(args) -> None:
    import run

    run.main(["--config", args.config] + args.opts)


def accelerate_launch(args) -> None:
    # single-controller JAX: all local TPU chips belong to this process
    python_launch(args)


def submitit_launch(args) -> None:
    try:
        import submitit
    except ImportError as e:
        raise SystemExit(
            "submitit not installed; use --mode python for local runs"
        ) from e

    executor = submitit.AutoExecutor(folder="slurm_logs")
    executor.update_parameters(
        name=args.name,
        slurm_partition=args.partition,
        nodes=args.num_nodes,
        tasks_per_node=1,
        timeout_min=args.time,
        slurm_max_num_timeout=30,
        slurm_signal_delay_s=120,
    )

    def job():
        env = submitit.JobEnvironment()
        # multi-host JAX: coordinator = node 0
        os.environ["JAX_COORDINATOR_ADDRESS"] = f"{env.hostnames[0]}:{args.port}"
        os.environ["JAX_NUM_PROCESSES"] = str(env.num_nodes)
        os.environ["JAX_PROCESS_ID"] = str(env.node)
        from msr3d_tpu.parallel.mesh import initialize_distributed_from_env

        initialize_distributed_from_env()
        import run

        run.main(["--config", args.config] + args.opts)

    executor.submit(job)


def main(argv=None) -> None:
    args = parse_args(argv)
    {
        "python": python_launch,
        "accelerate": accelerate_launch,
        "submitit": submitit_launch,
    }[args.mode](args)


if __name__ == "__main__":
    main()
