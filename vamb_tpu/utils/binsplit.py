"""Binsplitting: split each cluster by sample-of-origin prefix.

Identifiers formatted as "[sample][SEP][contig]" (e.g. "S1C19" with SEP='C')
let a multi-sample cluster be split into one bin per sample.
Behavioral parity: reference vamb/vambtools.py:27-188.
"""

import collections
import logging
import time
from typing import Iterable, Optional

logger = logging.getLogger("vamb_tpu")


class BinSplitter:
    """Splits clusters by an identifier prefix separator.

    * Instantiated with `None`: default mode, separator 'C'; if the
      identifiers turn out not to contain it, warn and disable.
    * Instantiated with an explicit string: strict; error if any identifier
      lacks the separator. The empty string explicitly disables splitting.
    """

    _DEFAULT_SPLITTER = "C"
    __slots__ = ["is_default", "splitter", "is_initialized"]

    def __init__(self, binsplitter: Optional[str]):
        if binsplitter is None:
            self.is_default = True
            self.splitter: Optional[str] = self._DEFAULT_SPLITTER
        else:
            self.is_default = False
            self.splitter = binsplitter if len(binsplitter) > 0 else None
        self.is_initialized = False

    def is_disabled(self) -> bool:
        return self.splitter is None

    @classmethod
    def inert_splitter(cls):
        return cls("")

    def initialize(self, identifiers: Iterable[str]):
        "Validate the separator against the identifier set (see class doc)."
        if self.is_initialized:
            return None
        self.is_initialized = True
        separator = self.splitter
        if separator is None:
            return None
        message = (
            'Binsplit separator (option `-o`) {imexplicit} passed as "{separator}", '
            'but sequence identifier "{identifier}" does not contain this separator, '
            "or contains it at the very start or end.\n"
            "A binsplit separator X implies that every sequence identifier is formatted as\n"
            "[sample identifier][X][sequence identifier], e.g. a binsplit separator of 'C' "
            "means that 'S1C19' and '7C11' are valid identifiers.\n"
        )

        if not self.is_default:
            for identifier in identifiers:
                (front, _, rest) = identifier.partition(separator)
                if not front or not rest:
                    msg = message.format(
                        imexplicit="explicitly",
                        separator=separator,
                        identifier=identifier,
                    )
                    logger.error(msg)
                    raise ValueError(msg)
        else:
            for identifier in identifiers:
                (front, _, rest) = identifier.partition(separator)
                if not front or not rest:
                    message += "\nSkipping binsplitting."
                    logger.warning(
                        message.format(
                            imexplicit="implicitly",
                            separator=separator,
                            identifier=identifier,
                        )
                    )
                    self.splitter = None
                    break

    def split_bin(
        self,
        binname: str,
        identifiers: Iterable[str],
    ) -> Iterable[tuple[str, set[str]]]:
        "Split a single bin by identifier prefix; yields (newname, ids)."
        if self.is_disabled():
            yield (binname, set(identifiers))
            return None
        assert self.splitter is not None

        by_sample: dict[str, set[str]] = collections.defaultdict(set)
        for identifier in identifiers:
            sample, _, rest = identifier.partition(self.splitter)
            if not rest or not sample:
                raise KeyError(
                    f"Separator '{self.splitter}' not in sequence identifier, or is "
                    f"at the very start or end of identifier: '{identifier}'"
                )
            by_sample[sample].add(identifier)

        for sample, splitheaders in by_sample.items():
            newbinname = f"{sample}{self.splitter}{binname}"
            yield newbinname, splitheaders

    def binsplit(
        self,
        clusters: Iterable[tuple[str, Iterable[str]]],
    ) -> Iterable[tuple[str, set[str]]]:
        "Lazily split every cluster (see `split_bin`)."
        for binname, headers in clusters:
            for newbinname, splitheaders in self.split_bin(binname, headers):
                yield newbinname, splitheaders

    def log_string(self) -> str:
        if not self.is_default:
            if self.is_disabled():
                return "Explicitly passed as empty (no binsplitting)"
            return f'"{self.splitter}"'
        if self.is_disabled():
            return "Defaulting to 'C', but disabled due to incompatible identifiers"
        return "Defaulting to 'C'"

    def log_clustering_result(
        self,
        n_total_contigs: int,
        n_split_clusters: int,
        n_unsplit_clusters: int,
        start_time: float,
    ):
        if self.is_disabled():
            msg = f"\tClustered {n_total_contigs} contigs in {n_unsplit_clusters} unsplit bins"
        else:
            msg = (
                f"\tClustered {n_total_contigs} contigs in {n_split_clusters} "
                f"split bins ({n_unsplit_clusters} clusters)"
            )
        logger.info(msg)
        elapsed = round(time.time() - start_time, 2)
        logger.info(f"\tWrote cluster file(s) in {elapsed} seconds.")
