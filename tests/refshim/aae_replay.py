"""Record the REAL reference AAE run's realized stochasticity (init, batch
order, eps, priors) for its first N epochs, then replay those exact streams
through the lockstep-verified transcription of this repo's step semantics.
Divergence -> a semantic difference exists and is localized; agreement -> the
implementations are equivalent on identical streams."""
import sys
sys.path.insert(0, '/root/repo')
from tests import refshim
refshim.install()
import numpy as np
import torch
import torch.nn.functional as F

import vamb.aamb_encode as am
from vamb.encode import make_dataloader

REC_EPOCHS = 70
SEED = 1

import os
if not os.path.exists('/tmp/h2h_avamb/tpuout/composition.npz'):
    sys.exit("missing dataset artifacts: generate them first with\n"
             "  python tests/refshim/head_to_head.py --mode avamb "
             "--workdir /tmp/h2h_avamb --keep")
comp = np.load('/tmp/h2h_avamb/tpuout/composition.npz', allow_pickle=True)
ab = np.load('/tmp/h2h_avamb/tpuout/abundance.npz', allow_pickle=True)
dl = make_dataloader(ab['matrix'].copy(), comp['matrix'].copy(),
                     comp['lengths'].copy(), 256, destroy=True, cuda=False)

# row-hash -> index map over the normalized dataset the loader yields
dep_all = dl.dataset.tensors[0].numpy()
tnf_all = dl.dataset.tensors[1].numpy()
row_map = {}
for i in range(len(dep_all)):
    row_map[dep_all[i].tobytes() + tnf_all[i][:8].tobytes()] = i

records = dict(batches=[], normals=[], gumbels=[])


class RngProxy:
    "Record every normal() draw of the reference's numpy Generator."
    def __init__(self, inner):
        self._inner = inner
    def normal(self, *a, **k):
        out = self._inner.normal(*a, **k)
        records['normals'].append(np.asarray(out, np.float32).copy())
        return out
    def __getattr__(self, name):
        return getattr(self._inner, name)


real_rohc = am.RelaxedOneHotCategorical

class ROHCRecorder:
    def __init__(self, T, probs):
        self._d = real_rohc(T, probs)
    def sample(self):
        s = self._d.sample()
        records['gumbels'].append(s.numpy().copy())
        return s

am.RelaxedOneHotCategorical = ROHCRecorder


class LoaderRecorder:
    "Wrap a DataLoader: record each yielded batch's row indices."
    def __init__(self, inner):
        self._inner = inner
    def __iter__(self):
        for batch in self._inner:
            d = batch[0].numpy()
            t = batch[1].numpy()
            idx = np.array(
                [row_map[d[j].tobytes() + t[j][:8].tobytes()]
                 for j in range(len(d))], np.int64)
            records['batches'].append(idx)
            yield batch
    def __len__(self):
        return len(self._inner)
    def __getattr__(self, name):
        return getattr(self._inner, name)


real_set_batchsize = am.set_batchsize

def recording_set_batchsize(data_loader, batch_size, n_obs, encode=False):
    inner = data_loader._inner if isinstance(data_loader, LoaderRecorder) else data_loader
    out = real_set_batchsize(inner, batch_size, n_obs, encode=encode)
    return out if encode else LoaderRecorder(out)

am.set_batchsize = recording_set_batchsize

ref = am.AAE(5, 547, 283, 700, 0.00964, 0.5, 0.15, False, SEED)
init_sd = {k: v.clone() for k, v in ref.state_dict().items()}
ref.rng = RngProxy(ref.rng)

# capture per-epoch means from the log lines
epoch_lines = []
import loguru
orig_info = loguru.logger.info
loguru.logger.info = lambda msg, *a, **k: (
    epoch_lines.append(str(msg)) if 'Epoch' in str(msg) else None,
    orig_info(msg, *a, **k))[1]

ref.trainmodel(LoaderRecorder(dl), nepochs=REC_EPOCHS, batchsteps=[25, 50], T=0.1596)

print(f"recorded: {len(records['batches'])} batches, "
      f"{len(records['normals'])} normals, {len(records['gumbels'])} gumbels",
      flush=True)

ref_means = []
for ln in epoch_lines:
    # "Epoch: N Loss Enc/Dec: x Rec. loss: x CE: x SSE: x Dz loss: x Dy loss: x ..."
    parts = ln.replace(':', ' ').split()
    try:
        ed = float(parts[parts.index('Enc/Dec') + 1])
        dz = float(parts[parts.index('Dz') + 2])
        dy = float(parts[parts.index('Dy') + 2])
        ref_means.append((ed, dz, dy))
    except Exception:
        pass

# ---------------- replay through the transcription ----------------
from tests.refshim.aae_torch_transcription import TorchAAE, SL, SLR, T, LD, YLEN

tm = TorchAAE()
missing, unexpected = tm.load_state_dict(init_sd, strict=False)
assert not missing and not unexpected, (missing, unexpected)
tm.train()
opt_e = torch.optim.Adam([p for nm, p in tm.named_parameters() if "encoder" in nm], lr=1e-3)
opt_d = torch.optim.Adam([p for nm, p in tm.named_parameters()
                          if not any(k in nm for k in ("encoder", "discriminator"))], lr=1e-3)
opt_dz = torch.optim.Adam([p for nm, p in tm.named_parameters() if "discriminator_z" in nm], lr=1e-3)
opt_dy = torch.optim.Adam([p for nm, p in tm.named_parameters() if "discriminator_y" in nm], lr=1e-3)
bce = torch.nn.BCELoss()
dep = torch.from_numpy(dep_all)
tnf = torch.from_numpy(tnf_all)
step_i = 0
n_rows = len(dep_all)
for epoch in range(REC_EPOCHS):
    bs_sched = 256 * (2 ** sum(epoch >= s for s in (25, 50)))
    nb = n_rows // bs_sched
    eds, dzs, dys = [], [], []
    for b in range(nb):
        idx = records['batches'][step_i]
        bs = len(idx)
        # the reference draws per step: z_prior (batch top), gen-phase
        # reparam eps, disc-phase reparam eps2 — in that order
        z_prior = torch.from_numpy(records['normals'][3 * step_i + 0].astype(np.float32))
        eps = torch.from_numpy(records['normals'][3 * step_i + 1].astype(np.float32))
        eps2 = torch.from_numpy(records['normals'][3 * step_i + 2].astype(np.float32))
        y_prior = torch.from_numpy(records['gumbels'][step_i])
        d_in = dep[idx]; t_in = tnf[idx]
        ones = torch.ones(bs, 1); zeros = torch.zeros(bs, 1)
        opt_e.zero_grad(); opt_d.zero_grad()
        mu, logvar, y = tm._encode(d_in, t_in)
        z = eps * torch.exp(logvar / 2) + mu
        d_out, t_out = tm._decode(z, y)
        rec, ce, sse = tm.calc_loss(d_in, d_out, t_in, t_out)
        ed = (1 - SL) * rec + SL * SLR * bce(tm.discriminator_z(z), ones) \
            + SL * (1 - SLR) * bce(tm.discriminator_y(y), ones)
        ed.backward(); opt_e.step(); opt_d.step()
        opt_dz.zero_grad()
        mu2, logvar2, ylat = tm._encode(d_in, t_in)
        z_lat = eps2 * torch.exp(logvar2 / 2) + mu2
        dzl = 0.5 * (bce(tm.discriminator_z(z_prior), ones)
                     + bce(tm.discriminator_z(z_lat), zeros))
        dzl.backward(); opt_dz.step()
        opt_dy.zero_grad()
        ylat2 = tm._encode(d_in, t_in)[2]
        dyl = 0.5 * (bce(tm.discriminator_y(y_prior), ones)
                     + bce(tm.discriminator_y(ylat2), zeros))
        dyl.backward(); opt_dy.step()
        eds.append(float(ed.detach())); dzs.append(float(dzl.detach()))
        dys.append(float(dyl.detach()))
        step_i += 1
    mine = (np.mean(eds), np.mean(dzs), np.mean(dys))
    refm = ref_means[epoch] if epoch < len(ref_means) else (np.nan,) * 3
    print(f"epoch {epoch+1}: ref ed/dz/dy {refm[0]:.6f} {refm[1]:.6f} {refm[2]:.6f} | "
          f"replay {mine[0]:.6f} {mine[1]:.6f} {mine[2]:.6f} | "
          f"diff {abs(mine[0]-refm[0]):.2e} {abs(mine[1]-refm[1]):.2e} {abs(mine[2]-refm[2]):.2e}",
          flush=True)

tm.eval()
n = len(dep_all)
lat = np.empty((n, LD), np.float32)
with torch.no_grad():
    for st in range(0, n, 2048):
        sp = min(st + 2048, n)
        h = tm.encoder(torch.cat([dep[st:sp], tnf[st:sp]], 1))
        lat[st:sp] = tm.mu(h).numpy()
print('replay mu absmean/std:', np.abs(lat).mean(), lat.std(), flush=True)
from vamb_tpu.cluster import ClusterGenerator
from vamb_tpu.utils.binsplit import BinSplitter
from bench import _score_bins_vs_truth, _write_synthetic_metagenome
_, _, which, lengths_truth = _write_synthetic_metagenome(
    '/tmp/h2h_truth', 20000, 5, 150, hard=True, seed=7)
names = [x if isinstance(x, str) else x.decode() for x in comp['identifiers']]
gen = ClusterGenerator(lat.copy(), comp['lengths'].copy(), rng_seed=1)
raw = [(str(i + 1), [names[m] for m in cl.members]) for i, cl in enumerate(gen)]
split = {}
for bname, contigs in BinSplitter("C").binsplit(raw):
    split[bname] = [int(c.split("C", 1)[1]) for c in contigs]
nc, mq = _score_bins_vs_truth(split, which, lengths_truth, 150)
print(f'REPLAY 70ep: clusters {len(raw)} NC {nc} MQ {mq}')
