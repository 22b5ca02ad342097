"""Marker-prediction orchestration tests with an injected fake backend.

The split/Pool/assembly pipeline of `Markers.from_files` (reference
parsemarkers.py:123-178) runs here end-to-end WITHOUT pyrodigal/pyhmmer or
any external binary: a deterministic fake backend derives marker IDs from
the sequences themselves, so sharding and result re-assembly are fully
checked. The SubprocessBackend's tblout/HMM parsing is unit-tested on
synthetic files; the actual binaries are exercised only where installed.
"""

import io
import random
import shutil

import numpy as np
import pytest

from vamb_tpu.markers import (
    Markers,
    PredictorBackend,
    SubprocessBackend,
    cap_processes,
    get_name_to_id,
    parse_hmmsearch_tblout,
    read_hmm_names,
    select_backend,
)
from vamb_tpu.utils import RefHasher, byte_iterfasta


class FakeBackend(PredictorBackend):
    """Deterministic fake: contig 'C<i>' carries markers {i % 7, (i+1) % 7}
    when i is even, none when odd. Ignores the HMM file contents."""

    N_MARKERS = 7

    def marker_names(self, hmm_path):
        return [[f"FAKE{i}"] for i in range(self.N_MARKERS)]

    def predict_file(self, contig_path, hmm_path):
        out = []
        with open(contig_path, "rb") as file:
            for record in byte_iterfasta(file, None):
                i = int(record.identifier[1:])
                if i % 2 == 0:
                    ids = sorted({i % self.N_MARKERS, (i + 1) % self.N_MARKERS})
                    out.append(
                        (record.identifier, np.array(ids, dtype=np.uint8))
                    )
        return out


@pytest.fixture
def fasta_file(tmp_path):
    rng = random.Random(0)
    path = tmp_path / "contigs.fna"
    names = [f"C{i}" for i in range(40)]
    with open(path, "w") as f:
        for name in names:
            f.write(f">{name}\n{''.join(rng.choices('ACGT', k=300))}\n")
    return path, names


class TestOrchestration:
    @pytest.mark.parametrize("n_processes", [1, 3])
    def test_from_files_with_fake_backend(self, fasta_file, tmp_path, n_processes):
        path, names = fasta_file
        markers = Markers.from_files(
            path,
            tmp_path / "unused.hmm",
            names,
            tmp_path / f"split{n_processes}",
            n_processes,
            target_refhash=None,
            backend=FakeBackend(),
        )
        assert markers.n_seqs == 40
        assert markers.n_markers == FakeBackend.N_MARKERS
        for i, got in enumerate(markers.markers):
            if i % 2 == 0:
                expect = sorted({i % 7, (i + 1) % 7})
                np.testing.assert_array_equal(got, np.array(expect, np.uint8))
            else:
                assert got is None
        # temp split dir is cleaned up
        assert not (tmp_path / f"split{n_processes}").exists()

    def test_refhash_verified(self, fasta_file, tmp_path):
        path, names = fasta_file
        wrong = RefHasher.hash_refnames(["X1", "X2"])
        with pytest.raises(BaseException):
            Markers.from_files(
                path, tmp_path / "u.hmm", names, tmp_path / "s2", 1,
                target_refhash=wrong, backend=FakeBackend(),
            )

    def test_subset_of_contignames(self, fasta_file, tmp_path):
        "Only named contigs are predicted; refhash covers exactly them."
        path, names = fasta_file
        subset = names[:10]
        markers = Markers.from_files(
            path, tmp_path / "u.hmm", subset, tmp_path / "s3", 2,
            target_refhash=RefHasher.hash_refnames(subset),
            backend=FakeBackend(),
        )
        assert markers.n_seqs == 10

    def test_save_load_roundtrip(self, fasta_file, tmp_path):
        path, names = fasta_file
        markers = Markers.from_files(
            path, tmp_path / "u.hmm", names, tmp_path / "s4", 2,
            target_refhash=None, backend=FakeBackend(),
        )
        buf = io.StringIO()
        markers.save(buf)
        buf.seek(0)
        again = Markers.load(buf, markers.refhash)
        for a, b in zip(markers.markers, again.markers):
            if a is None:
                assert b is None
            else:
                np.testing.assert_array_equal(a, b)


class TestSubprocessBackendParsing:
    HMM_TEXT = (
        "HMMER3/f [3.3 | some build]\n"
        "NAME  TIGR00389\nLENG  100\n//\n"
        "NAME  PF00121\nLENG  50\n//\n"
        "NAME  TIGR00388\nLENG  77\n//\n"
    )

    def test_read_hmm_names(self, tmp_path):
        p = tmp_path / "markers.hmm"
        p.write_text(self.HMM_TEXT)
        assert read_hmm_names(p) == ["TIGR00389", "PF00121", "TIGR00388"]

    def test_marker_names_merge_tigr(self, tmp_path):
        p = tmp_path / "markers.hmm"
        p.write_text(self.HMM_TEXT)
        names = SubprocessBackend().marker_names(p)
        # TIGR00388 merges into TIGR00389's ID (parsemarkers.py:193-198)
        assert names == [["TIGR00389", "TIGR00388"], ["PF00121"]]

    def test_parse_tblout(self):
        name_to_id, _ = get_name_to_id(["TIGR00389", "PF00121", "TIGR00388"])
        tbl = io.StringIO(
            "# comment line\n"
            "#\n"
            "S1C19_1  -  TIGR00389 ACC1  1e-20 200.0 0.1  rest ignored\n"
            "S1C19_2  -  PF00121   ACC2  1e-10  90.0 0.2  rest\n"
            "S2C4_1   -  TIGR00388 ACC3  1e-15 150.0 0.0  rest\n"
            "S2C4_7   -  UNKNOWN   ACC4  1e-15 150.0 0.0  rest\n"
            "\n"
        )
        per_contig = parse_hmmsearch_tblout(tbl, name_to_id)
        assert per_contig["S1C19"] == {0, 1}
        # merged TIGR pair maps to the same ID; unknown HMMs are dropped
        assert per_contig["S2C4"] == {0}

    def test_select_backend_native_fallback(self, monkeypatch):
        "With no pyhmmer libs and no binaries, the built-in backend is used."
        import vamb_tpu.markers as m

        monkeypatch.setattr(shutil, "which", lambda _: None)
        if m.shutil.which("prodigal"):
            pytest.skip("real binaries present")
        try:
            import pyhmmer  # noqa: F401

            pytest.skip("pyhmmer installed")
        except ImportError:
            pass
        assert isinstance(select_backend(), m.NativeBackend)


def test_cap_processes():
    assert cap_processes(1) == 1
    assert cap_processes(64) == 64
    assert cap_processes(100) == 64
    with pytest.raises(ValueError):
        cap_processes(0)
