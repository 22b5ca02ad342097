"""Run the REAL reference AAE.trainmodel (via refshim) on the h2h dataset,
optionally transplanting this repo's init params; cluster + score latents."""
import sys
sys.path.insert(0, '/root/repo')
from tests import refshim
refshim.install()
import argparse
import numpy as np
import torch

ap = argparse.ArgumentParser()
ap.add_argument('--seed', type=int, default=1)
ap.add_argument('--our-init', action='store_true')
ap.add_argument('--epochs', type=int, default=70)
args = ap.parse_args()

from vamb.aamb_encode import AAE as RefAAE
from vamb.encode import make_dataloader

import os
if not os.path.exists('/tmp/h2h_avamb/tpuout/composition.npz'):
    sys.exit("missing dataset artifacts: generate them first with\n"
             "  python tests/refshim/head_to_head.py --mode avamb "
             "--workdir /tmp/h2h_avamb --keep")
comp = np.load('/tmp/h2h_avamb/tpuout/composition.npz', allow_pickle=True)
ab = np.load('/tmp/h2h_avamb/tpuout/abundance.npz', allow_pickle=True)
dl = make_dataloader(ab['matrix'].copy(), comp['matrix'].copy(),
                     comp['lengths'].copy(), 256, destroy=True, cuda=False)
ref = RefAAE(5, 547, 283, 700, 0.00964, 0.5, 0.15, False, args.seed)

if args.our_init:
    from tests.refshim.aae_torch_transcription import TorchAAE, set_torch_from_jax
    from vamb_tpu.models.aae import AAE
    aae = AAE(nsamples=5, seed=args.seed)
    tm = TorchAAE()
    set_torch_from_jax(tm, aae.params)
    missing, unexpected = ref.load_state_dict(tm.state_dict(), strict=False)
    print('transplant missing:', missing, 'unexpected:', unexpected, flush=True)

steps = [s for s in (25, 50) if s < args.epochs]
ref.trainmodel(dl, nepochs=args.epochs, batchsteps=steps, T=0.1596)

names = [x if isinstance(x, str) else x.decode() for x in comp['identifiers']]
clusters_y, lat = ref.get_latents(names, dl)
print('mu absmean/std:', np.abs(lat).mean(), lat.std(), flush=True)

from vamb_tpu.cluster import ClusterGenerator
from vamb_tpu.utils.binsplit import BinSplitter
from bench import _score_bins_vs_truth, _write_synthetic_metagenome
_, _, which, lengths_truth = _write_synthetic_metagenome(
    '/tmp/h2h_truth', 20000, 5, 150, hard=True, seed=7)
gen = ClusterGenerator(lat.copy(), comp['lengths'].copy(), rng_seed=1)
raw = [(str(i + 1), [names[m] for m in cl.members]) for i, cl in enumerate(gen)]
split = {}
for bname, contigs in BinSplitter("C").binsplit(raw):
    split[bname] = [int(c.split('C', 1)[1]) for c in contigs]
nc, mq = _score_bins_vs_truth(split, which, lengths_truth, 150)
print(f'REFLOOP seed={args.seed} our_init={args.our_init}: '
      f'clusters {len(raw)} split {len(split)} NC {nc} MQ {mq}')
