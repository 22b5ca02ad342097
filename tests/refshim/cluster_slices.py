"""Clustering engine head-to-head on identical latent slices.

Runs the actual reference's ClusterGenerator (via tests/refshim, CPU
torch) and this repo's engine on n-point slices of the exact noisy-1M
latent matrix bench.py's headline uses, with identical parameters, and
reports clusters + wall + ms/cluster for each. This is the measurement
behind the bench's 1 ms/cluster reference floor (see
bench.bench_noisy_clustering) and the table in HEADTOHEAD.md.

Usage:
  python tests/refshim/cluster_slices.py [--sizes 20000 50000]
      [--skip {ref,tpu}]
"""

import argparse
import os
import sys
import time

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, _REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", type=int, nargs="+", default=[20_000, 50_000])
    ap.add_argument("--skip", choices=["ref", "tpu"], default=None)
    ap.add_argument("--reps", type=int, default=1,
                    help="repeat each size (first rep carries one-time "
                         "compiles; later reps are the warm number)")
    args = ap.parse_args()

    from bench import D, N, _blob_latents

    matrix, lengths, _ = _blob_latents(N, D, 1400, noise_frac=0.30, seed=3)

    def run(name, make_gen):
        for n in args.sizes:
            sub = np.ascontiguousarray(matrix[:n]).astype(np.float32)
            lens = np.ascontiguousarray(lengths[:n]).astype(np.int64)
            for rep in range(args.reps):
                t0 = time.time()
                count = sum(1 for _ in make_gen(sub.copy(), lens.copy()))
                dt = time.time() - t0
                tag = "" if args.reps == 1 else (
                    " [cold]" if rep == 0 else f" [warm {rep}]")
                print(
                    f"{name}: n={n} clusters={count} wall={dt:.1f}s "
                    f"-> {dt / count * 1e3:.3f} ms/cluster{tag}",
                    flush=True,
                )

    if args.skip != "tpu":
        from vamb_tpu.cluster import ClusterGenerator

        run(
            "vamb_tpu clustering (TPU)",
            lambda m, l: ClusterGenerator(m, l, windowsize=200, minsuccesses=15),
        )
    if args.skip != "ref":
        from tests import refshim

        refshim.install()
        import vamb

        run(
            "reference clustering (CPU torch)",
            lambda m, l: vamb.cluster.ClusterGenerator(
                m, l, windowsize=200, minsuccesses=15
            ),
        )


if __name__ == "__main__":
    main()
