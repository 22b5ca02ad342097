"""Normalization-contract parity: models/dataset.py vs an independent
transcription of the reference dataloader's preprocessing (reference
vamb/encode.py:53-146).

The reference performs every normalization step with in-place numpy ops and
only wraps the finished arrays as torch tensors zero-copy (encode.py:131-137),
so the oracle is a numpy transcription of exactly those in-place steps, and
the comparison is tensor-equal (exact float32 equality, not allclose) — the
normalization is load-bearing for bin parity so even ulp drift must be
surfaced. The torch wrap at the end asserts the zero-copy equivalence.
"""

import numpy as np
import torch

from vamb_tpu.models.dataset import make_dataset


def reference_normalize(abundance: np.ndarray, tnf: np.ndarray, lengths: np.ndarray):
    """Transcription of reference make_dataloader (encode.py:96-137):
    in-place numpy normalization, then zero-copy torch tensors."""
    abundance = abundance.copy()
    tnf = tnf.copy()

    sample_depths_sum = abundance.sum(axis=0)
    assert not np.any(sample_depths_sum == 0)
    abundance *= 1_000_000 / sample_depths_sum
    total_abundance = abundance.sum(axis=1)

    n_samples = abundance.shape[1]
    zero_total = total_abundance == 0
    abundance[zero_total] = 1 / n_samples
    nonzero_total = total_abundance.copy()
    nonzero_total[zero_total] = 1.0
    abundance /= nonzero_total.reshape((-1, 1))

    total_abundance = np.log(total_abundance.clip(min=0.001))
    # zscore in-place, whole-vector / per-column (vambtools.py:250-288)
    std = total_abundance.std()
    total_abundance -= total_abundance.mean()
    total_abundance /= std if std != 0 else 1.0
    col_mean = tnf.mean(axis=0)
    col_std = tnf.std(axis=0)
    col_std[col_std == 0.0] = 1.0
    tnf -= col_mean.reshape(1, -1)
    tnf /= col_std.reshape(1, -1)
    total_abundance.shape = (len(total_abundance), 1)

    lengths = lengths.astype(np.float32)
    weights = np.log(lengths).astype(np.float32) - 5.0
    weights[weights < 2.0] = 2.0
    weights *= len(weights) / weights.sum()
    weights.shape = (len(weights), 1)

    # the reference's final tensors are zero-copy views of these arrays
    tensors = [torch.from_numpy(a) for a in (abundance, tnf, total_abundance, weights)]
    return tuple(t.numpy() for t in tensors)


def random_inputs(n, s, seed, with_zero_rows=False):
    rng = np.random.default_rng(seed)
    abundance = rng.exponential(2.0, size=(n, s)).astype(np.float32)
    if with_zero_rows:
        abundance[rng.integers(0, n, max(1, n // 20))] = 0.0
    tnf = rng.normal(size=(n, 103)).astype(np.float32)
    lengths = rng.integers(2000, 100_000, n)
    return abundance, tnf, lengths


class TestDatasetParity:
    def check(self, abundance, tnf, lengths):
        ref_d, ref_t, ref_a, ref_w = reference_normalize(abundance, tnf, lengths)
        ds = make_dataset(abundance.copy(), tnf.copy(), lengths)
        # exact float32 equality: torch and numpy agree on these elementwise
        # ops; any mismatch means the normalization contract drifted
        np.testing.assert_array_equal(ds.depths, ref_d)
        np.testing.assert_array_equal(ds.tnf, ref_t)
        np.testing.assert_array_equal(ds.abundance, ref_a)
        np.testing.assert_array_equal(ds.weights, ref_w)
        # reference invariants (test_encode.py:70-75 analogues)
        np.testing.assert_allclose(ds.depths.sum(axis=1), 1.0, rtol=1e-5)
        np.testing.assert_allclose(ds.tnf.mean(axis=0), 0.0, atol=1e-5)
        np.testing.assert_allclose(float(ds.weights.mean()), 1.0, rtol=1e-5)

    def test_multi_sample(self):
        self.check(*random_inputs(500, 7, seed=0))

    def test_single_sample(self):
        self.check(*random_inputs(300, 1, seed=1))

    def test_zero_abundance_rows(self):
        "All-zero rows become uniform 1/S and log-clip at 0.001."
        self.check(*random_inputs(400, 5, seed=2, with_zero_rows=True))

    def test_short_contigs_floor_weights(self):
        "Contigs at the 2000 bp minimum hit the w=2 floor."
        abundance, tnf, _ = random_inputs(200, 3, seed=3)
        lengths = np.full(200, 2000)
        self.check(abundance, tnf, lengths)
