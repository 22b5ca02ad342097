"""Hierarchical taxonomy parsing and validation.

Behavioral parity: reference vamb/taxonomy.py. A taxonomy file is a TSV with
header `contigs\\tpredictions` mapping contig name -> semicolon-separated
lineage (canonical = up to the 7 ranks domain..species, arbitrarily
truncated). Refined (Taxometer output) files add a `scores` column. The tree
must be unambiguous: a name may not appear at two ranks or have two parents
(reference taxonomy.py:264-294).
"""

from pathlib import Path
from typing import IO, Optional, Union

import numpy as np

from .composition import CompositionMetaData

TAXONOMY_HEADER = "contigs\tpredictions"
PREDICTED_TAXONOMY_HEADER = "contigs\tpredictions\tscores"


class ContigTaxonomy:
    """Hierarchical taxonomy of one contig.

    If `is_canonical`, ranks are domain, phylum, class, order, family,
    genus, species in that order; the lineage may be truncated at any depth.
    """

    __slots__ = ["ranks"]

    def __init__(self, ranks: list[str], is_canonical: bool = False):
        if is_canonical and len(ranks) > 7:
            raise ValueError(
                "For a canonical ContigTaxonomy, there must be at most 7 ranks"
            )
        self.ranks = ranks

    @classmethod
    def from_semicolon_sep(cls, s: str, is_canonical: bool = False):
        if len(s) == 0:
            return cls([], is_canonical)
        return cls(s.split(";"), is_canonical)

    @property
    def genus(self) -> Optional[str]:
        "The 6th canonical rank, if present."
        if len(self.ranks) < 6:
            return None
        return self.ranks[5]

    def __eq__(self, other) -> bool:
        return isinstance(other, ContigTaxonomy) and self.ranks == other.ranks


class Taxonomy:
    """One Optional[ContigTaxonomy] per contig of a CompositionMetaData.

    Coupled to the composition by refhash; every kept contig must appear in
    the file (missing = error, extra file rows for filtered contigs are ok).
    """

    __slots__ = ["contig_taxonomies", "refhash", "is_canonical"]

    def __init__(
        self,
        contig_taxonomies: list[Optional[ContigTaxonomy]],
        refhash: bytes,
        is_canonical: bool,
    ):
        self.contig_taxonomies = contig_taxonomies
        self.refhash = refhash
        self.is_canonical = is_canonical
        assert_unambiguous_ranks(self)

    @property
    def nseqs(self) -> int:
        return len(self.contig_taxonomies)

    @classmethod
    def from_file(cls, tax_file: Path, metadata: CompositionMetaData, is_canonical: bool):
        observed = cls.parse_tax_file(tax_file, is_canonical)
        return cls.from_observed(observed, metadata, is_canonical)

    @classmethod
    def from_refined_file(
        cls, tax_file: Path, metadata: CompositionMetaData, is_canonical: bool
    ):
        observed = PredictedTaxonomy.parse_tax_file(tax_file, is_canonical)
        return cls.from_observed(
            [(name, tax.contig_taxonomy) for (name, tax) in observed],
            metadata,
            is_canonical,
        )

    @classmethod
    def from_observed(
        cls,
        observed_taxonomies: list[tuple[str, ContigTaxonomy]],
        metadata: CompositionMetaData,
        is_canonical: bool,
    ):
        index_of = {c: i for (i, c) in enumerate(metadata.identifiers)}
        contig_taxonomies: list[Optional[ContigTaxonomy]] = [None] * metadata.nseqs
        n_found = 0
        for contigname, taxonomy in observed_taxonomies:
            index = index_of.get(contigname)
            if index is None:
                continue
            n_found += 1
            if contig_taxonomies[index] is not None:
                raise ValueError(
                    f'Duplicate contigname when parsing taxonomy: "{contigname}"'
                )
            contig_taxonomies[index] = taxonomy
        if n_found != metadata.nseqs:
            raise ValueError(
                f"In taxonomy file, expected {metadata.nseqs} contigs that are "
                f"also present in the filtered FASTA file, but found {n_found}. "
                "Note that this might occur because some contigs in the taxonomy "
                "file falls under the minimum length threshold."
            )
        return cls(contig_taxonomies, metadata.refhash, is_canonical)

    @staticmethod
    def parse_tax_file(
        path: Path, force_canonical: bool
    ) -> list[tuple[str, ContigTaxonomy]]:
        result: list[tuple[str, ContigTaxonomy]] = []
        with open(path) as file:
            header = next(file, None)
            header = None if header is None else header.rstrip()
            if header is None or header != TAXONOMY_HEADER:
                raise ValueError(
                    f"In taxonomy file '{path}', expected header to be "
                    f"{TAXONOMY_HEADER!r}, but found "
                    f"{'no header' if header is None else repr(header)}"
                )
            for lineno_minus_two, line in enumerate(file):
                line = line.rstrip("\r\n")
                fields = line.split("\t")
                if len(fields) != 2:
                    raise ValueError(
                        f"In taxonomy file '{path}', on line {lineno_minus_two + 2}, "
                        f"expected 2 tab-separated columns, but found {len(fields)}."
                    )
                contigname, taxonomy = fields
                result.append(
                    (contigname, ContigTaxonomy.from_semicolon_sep(taxonomy, force_canonical))
                )
        return result


class PredictedContigTaxonomy:
    __slots__ = ["contig_taxonomy", "probs"]

    def __init__(self, tax: ContigTaxonomy, probs: np.ndarray):
        if len(probs) != len(tax.ranks):
            raise ValueError("The length of probs must equal that of ranks")
        np.clip(probs, a_min=0.0, a_max=1.0, out=probs)
        self.contig_taxonomy = tax
        self.probs = probs


class PredictedTaxonomy:
    "Output of Taxometer: per-contig lineage + per-rank confidence scores."

    __slots__ = ["contig_taxonomies", "refhash", "is_canonical"]

    def __init__(
        self,
        taxonomies: list[PredictedContigTaxonomy],
        metadata: CompositionMetaData,
        is_canonical: bool,
    ):
        if len(taxonomies) != len(metadata.identifiers):
            raise ValueError(
                f"Taxonomies length: {len(taxonomies)}, Identifiers length: "
                f"{len(metadata.identifiers)}. Length of taxonomies must match "
                "that of identifiers"
            )
        self.contig_taxonomies = taxonomies
        self.refhash = metadata.refhash
        self.is_canonical = is_canonical
        assert_unambiguous_ranks(self)

    @property
    def nseqs(self) -> int:
        return len(self.contig_taxonomies)

    def to_taxonomy(self) -> Taxonomy:
        return Taxonomy(
            [p.contig_taxonomy for p in self.contig_taxonomies],
            self.refhash,
            self.is_canonical,
        )

    @staticmethod
    def parse_tax_file(
        path: Path, force_canonical: bool
    ) -> list[tuple[str, PredictedContigTaxonomy]]:
        result: list[tuple[str, PredictedContigTaxonomy]] = []
        with open(path) as file:
            lines = filter(None, map(str.rstrip, file))
            header = next(lines, None)
            if header is None or header != PREDICTED_TAXONOMY_HEADER:
                raise ValueError(
                    f"In predicted taxonomy file '{path}', expected header to be "
                    f"{PREDICTED_TAXONOMY_HEADER!r}, but found "
                    f"{'no header' if header is None else repr(header)}."
                )
            for linenum_minus_two, line in enumerate(lines):
                fields = line.split("\t")
                if len(fields) == 1:
                    # a contig with no taxonomy and no scores
                    result.append(
                        (
                            fields[0],
                            PredictedContigTaxonomy(
                                ContigTaxonomy([], force_canonical), np.array([])
                            ),
                        )
                    )
                    continue
                if len(fields) != 3:
                    raise ValueError(
                        f"Expected 3 fields in line {linenum_minus_two + 2} of file "
                        f"'{path}', got {len(fields)}.\nLine: '{line}'"
                    )
                contigname, taxonomy, scores = fields
                tax = ContigTaxonomy.from_semicolon_sep(taxonomy, force_canonical)
                probs = np.array([float(i) for i in scores.split(";")], dtype=float)
                result.append((contigname, PredictedContigTaxonomy(tax, probs)))
        return result

    def write_as_tsv(self, file: IO[str], comp_metadata: CompositionMetaData):
        if self.refhash != comp_metadata.refhash:
            raise ValueError(
                "Refhash of comp_metadata and predicted taxonomy must match"
            )
        assert self.nseqs == comp_metadata.nseqs
        print(PREDICTED_TAXONOMY_HEADER, file=file)
        for i in range(self.nseqs):
            tax = self.contig_taxonomies[i]
            ranks_str = ";".join(tax.contig_taxonomy.ranks)
            probs_str = ";".join([str(round(p, 5)) for p in tax.probs])
            print(
                comp_metadata.identifiers[i], ranks_str, probs_str,
                file=file, sep="\t",
            )


def assert_unambiguous_ranks(taxonomy: Union[Taxonomy, PredictedTaxonomy]) -> None:
    """No name at two ranks, no name with two parents (else the name-keyed
    taxonomy graph would not be a tree; reference taxonomy.py:264-294)."""
    seen_ranks: dict[str, int] = dict()
    parent_of: dict[str, str] = dict()
    for i in taxonomy.contig_taxonomies:
        if i is None:
            continue
        ranks = i.ranks if isinstance(i, ContigTaxonomy) else i.contig_taxonomy.ranks
        for rank, name in enumerate(ranks):
            if seen_ranks.setdefault(name, rank) != rank:
                raise ValueError(
                    f'Taxonomy is ambiguous: "{name}" appears at multiple ranks'
                )
        for parent, child in zip(ranks, ranks[1:]):
            if parent_of.setdefault(child, parent) != parent:
                raise ValueError(
                    f'Taxonomy is ambiguous: "{child}" has multiple parents'
                )
