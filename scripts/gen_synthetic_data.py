"""Generate a synthetic miniature data tree (all three scan domains + MSQA/
SQA3D/MSNN annotations) for end-to-end smoke runs without the real scans.

Usage: python scripts/gen_synthetic_data.py [out_dir]
"""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from msr3d_tpu.data.synthetic import build_full_tree


def main():
    out = Path(sys.argv[1] if len(sys.argv) > 1 else "./synthetic_data")
    out.mkdir(parents=True, exist_ok=True)
    build_full_tree(out, np.random.default_rng(7))
    print(f"synthetic data tree written to {out.resolve()}")


if __name__ == "__main__":
    main()
