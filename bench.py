"""Benchmark: clustering throughput (pairwise distances/s) at 1M contigs.

Runs the medoid-clustering engine on synthetic 1M x 32 latents for a fixed
number of emitted clusters on the attached accelerator, and reports the rate
of medoid-to-point distance evaluations — the quantity BASELINE.md names as
the clustering throughput metric.

Baseline constant: the reference's GPU clustering computes one (N x D) f32
matvec per wander candidate with a 64-entry result cache
(reference vamb/cluster.py:606-637). On an A100-class GPU this is
HBM-bandwidth-bound: reading 1M x 32 floats (128 MB) per candidate at
~1.5 TB/s gives ~1.2e10 pairwise dists/s in the ideal case; we use 1e10 as
the single-GPU reference baseline (BASELINE.md asks for >= 5x it on a
v5e-16 pod; this bench measures a single chip).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time

import numpy as np


def _enable_compile_cache() -> None:
    "Persist compiled programs across processes (compiles cost minutes here)."
    try:
        import jax

        jax.config.update("jax_compilation_cache_dir", "/tmp/vamb_tpu_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


_enable_compile_cache()

BASELINE_DISTS_PER_S = 1.0e10  # see module docstring
N = 1_000_000
D = 32
N_CLUSTERS = 150
WARMUP_CLUSTERS = 10


def main() -> None:
    import vamb_tpu.cluster as vc

    rng = np.random.default_rng(0)
    # blobby data so cluster sizes are realistic (not all loners)
    n_blobs = 2000
    centers = rng.standard_normal((n_blobs, D)).astype(np.float32) * 4
    assignment = rng.integers(0, n_blobs, N)
    matrix = centers[assignment] + 0.05 * rng.standard_normal((N, D)).astype(
        np.float32
    )
    lengths = rng.integers(2000, 50_000, N)

    gen = vc.ClusterGenerator(matrix, lengths, destroy=True)
    it = iter(gen)
    for _ in range(WARMUP_CLUSTERS):
        next(it)
    dists_start = gen.n_dists
    t0 = time.time()
    emitted = 0
    for _ in range(N_CLUSTERS):
        try:
            next(it)
        except StopIteration:
            break
        emitted += 1
    elapsed = time.time() - t0
    n_dists = gen.n_dists - dists_start

    rate = n_dists / elapsed
    dists = {"n": n_dists}
    print(
        f"[bench] {emitted} clusters in {elapsed:.2f}s, "
        f"{dists['n']:.3g} dists, {rate:.3g} dists/s",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "cluster_pairwise_dists_per_s_1M",
                "value": rate,
                "unit": "dists/s",
                "vs_baseline": rate / BASELINE_DISTS_PER_S,
            }
        )
    )


if __name__ == "__main__":
    main()
