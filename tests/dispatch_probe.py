"""Per-dispatch wall breakdown of the clustering engine on the attached chip.

Not a test — run manually: python tests/dispatch_probe.py [n_dispatches]
Prints, per decoded batch: wall since previous decode, time blocked pulling
the three result arrays, host decode time, clusters emitted and attempts.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import vamb_tpu.cluster as vc  # noqa: E402

N = 1 << 20
D = 32
N_DISPATCHES = int(sys.argv[1]) if len(sys.argv) > 1 else 10

rng = np.random.default_rng(0)
n_blobs = 2000
centers = rng.standard_normal((n_blobs, D)).astype(np.float32) * 4
assignment = rng.integers(0, n_blobs, N)
matrix = centers[assignment] + 0.05 * rng.standard_normal((N, D)).astype(np.float32)
lengths = rng.integers(2000, 50_000, N)
matrix = vc.normalize(matrix, inplace=True)

# compile warmup
warm = iter(vc.ClusterGenerator(matrix, lengths, normalized=True))
next(warm)
del warm

gen = vc.ClusterGenerator(matrix, lengths, normalized=True)

t_prev = time.perf_counter()
print(f"{'batch':>5} {'wall_ms':>8} {'pull_ms':>8} {'decode_ms':>9} "
      f"{'emitted':>7} {'attempts':>8} {'pvr':>5}")
for b in range(N_DISPATCHES):
    if gen.n_remaining_points == 0:
        break
    t0 = time.perf_counter()
    if gen._inflight is None:
        gen._launch()
    ints_d, flts_d, delta_d = gen._inflight
    gen._inflight = None
    if gen._assigned_total < gen.n_points:
        gen._launch()
    t_launch = time.perf_counter()
    ints = np.asarray(ints_d)
    flts = np.asarray(flts_d)
    delta = np.asarray(delta_d)
    t_pull = time.perf_counter()
    K = gen._batch_clusters
    n_emitted = int(ints[5 * K])
    assigned = np.flatnonzero(delta)
    gen._assigned_total += len(assigned)
    t_dec = time.perf_counter()
    print(
        f"{b:5d} {(t_dec - t_prev) * 1e3:8.1f} {(t_pull - t_launch) * 1e3:8.1f} "
        f"{(t_dec - t_pull) * 1e3:9.1f} {n_emitted:7d} "
        f"{int(ints[4 * K + n_emitted - 1]):8d} "
        f"{flts[2 * K + n_emitted - 1]:5.2f}"
    )
    t_prev = t_dec

# --- unpipelined: device time per dispatch, then pure pull time ---
gen2 = vc.ClusterGenerator(matrix, lengths, normalized=True)
for b in range(4):
    t0 = time.perf_counter()
    gen2._launch()
    ints_d, flts_d, delta_d = gen2._inflight
    gen2._inflight = None
    ints = np.asarray(ints_d)
    t_ints = time.perf_counter()
    flts = np.asarray(flts_d)
    delta = np.asarray(delta_d)
    t1 = time.perf_counter()
    K = gen2._batch_clusters
    gen2._assigned_total += len(np.flatnonzero(delta))
    print(f"unpipelined batch {b}: launch+compute+ints {1e3*(t_ints-t0):.1f} ms, "
          f"flts+delta pull {1e3*(t1-t_ints):.1f} ms, emitted {int(ints[5*K])}")
# pure re-pull of already-transferred arrays
t0 = time.perf_counter(); np.asarray(delta_d); t1 = time.perf_counter()
print(f"re-pull delta (cached?) {1e3*(t1-t0):.1f} ms")
