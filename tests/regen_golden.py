"""Regenerate the golden corpus digests: ``python -m tests.regen_golden``."""

import json
import os

from .test_golden import CONFIGS, GOLDEN_DIR, compute_digests

if __name__ == "__main__":
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    for fname, (n, seed) in CONFIGS.items():
        path = os.path.join(GOLDEN_DIR, fname)
        with open(path, "w") as f:
            json.dump(compute_digests(n, seed), f, indent=1, sort_keys=True)
        print("wrote", path)
