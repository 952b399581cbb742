"""Regenerate the golden corpus digests: ``python -m tests.regen_golden``."""

import json
import os

from .test_golden import GOLDEN, compute_digests

if __name__ == "__main__":
    os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
    with open(GOLDEN, "w") as f:
        json.dump(compute_digests(), f, indent=1, sort_keys=True)
    print("wrote", GOLDEN)
