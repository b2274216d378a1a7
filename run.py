"""Training/eval entry (reference run.py:12-59 semantics, Hydra-free).

Composes the config, names the experiment dir from ``naming_keywords``,
saves the resolved config snapshot, builds the trainer, runs.
"""

from __future__ import annotations

import argparse
import os
import sys
from pathlib import Path

from msr3d_tpu.config import load_config, save_config
from msr3d_tpu.utils.logging import get_logger

logger = get_logger("msr3d_tpu.run")


def compose_exp_dir(cfg) -> str:
    """exp_dir = base_dir / name / *naming_keyword values (run.py:28-56)."""
    if cfg.get("exp_dir"):
        return cfg.exp_dir
    base = cfg.get("base_dir") or "./outputs"
    parts = [cfg.get("name", "msr3d_tpu")]
    for key in cfg.get("naming_keywords", []):
        val = cfg.get(key, "")
        if val:
            parts.append(str(val))
    return str(Path(base, *parts))


def main(argv=None) -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", "--config-name", dest="config", required=True)
    parser.add_argument("opts", nargs=argparse.REMAINDER, help="key=value overrides")
    args = parser.parse_args(argv)

    overrides = [o for o in args.opts if "=" in o]
    cfg = load_config(args.config, overrides=overrides)
    cfg["exp_dir"] = compose_exp_dir(cfg)
    Path(cfg.exp_dir).mkdir(parents=True, exist_ok=True)
    save_config(cfg, Path(cfg.exp_dir) / "config.yaml")
    logger.info(f"exp_dir: {cfg.exp_dir}")

    # platform override (e.g. jax_platform=cpu for the reference's
    # `--mode python` debug flow on a host whose default is a TPU):
    # must land before any JAX backend initialization
    platform = cfg.get("jax_platform") or os.environ.get("MSR3D_PLATFORM")
    if platform:
        import jax

        jax.config.update("jax_platforms", str(platform))
        logger.info(f"jax platform: {platform}")

    if cfg.get("compile_cache", True) not in (False, "false", "off", 0):
        from msr3d_tpu.utils.compile_cache import enable_compile_cache

        cache_dir = enable_compile_cache(cfg.get("compile_cache_dir"))
        if cache_dir:
            logger.info(f"persistent compilation cache: {cache_dir}")

    from msr3d_tpu.trainer.leo_trainer import build_trainer

    trainer = build_trainer(cfg)
    trainer.run()


if __name__ == "__main__":
    main()
