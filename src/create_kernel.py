#!/usr/bin/env python
"""Regenerate the 256->103 TNF projection kernel data asset.

See vamb_tpu/ops/kernel.py for the method (Kislyuk et al., PMC2765972).
Note: a regenerated basis spans the same space as the vendored one but is
not bit-identical (null_space bases are unique only up to rotation); the
shipped `tnf_kernel.npz` should only be replaced deliberately.
"""

import os

import numpy as np

from vamb_tpu.ops.kernel import create_dual_kernel

if __name__ == "__main__":
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "vamb_tpu",
        "ops",
        "tnf_kernel.npz",
    )
    np.savez_compressed(path, create_dual_kernel())
    print(f"Wrote kernel to {path}")
