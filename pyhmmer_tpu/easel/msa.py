"""Multiple sequence alignments.

Mirrors ``pyhmmer.easel.MSA``/``TextMSA``/``DigitalMSA`` (reference
``src/pyhmmer/easel.pyx:4793-6479``): aligned sequences + per-sequence
metadata + alignment annotation (RF/consensus lines), digitize/textize,
sequence weights, identity filtering.
"""

from __future__ import annotations

import numpy as np
from typing import Iterator, List, Optional, Sequence as TySequence

from .alphabet import Alphabet
from .sequence import TextSequence, DigitalSequence

__all__ = ["MSA", "TextMSA", "DigitalMSA"]


class MSA:
    """Base alignment: names + metadata + annotation lines."""

    def write(self, fh, format: str = "stockholm") -> None:
        """Write the MSA to a binary file handle (reference ``MSA.write``)."""
        import io as _io
        from .msafile import write_stockholm, write_afa

        text = _io.StringIO()
        if format in ("stockholm", "pfam"):
            write_stockholm(self, text)
        elif format in ("afa", "fasta", "a2m"):
            write_afa(self, text)
        else:
            raise ValueError(f"unsupported MSA format: {format!r}")
        fh.write(text.getvalue().encode("ascii"))

    def __init__(self, name: Optional[bytes] = None):
        self.name = name
        self.accession: Optional[bytes] = None
        self.description: Optional[bytes] = None
        self.author: Optional[bytes] = None
        self.names: List[bytes] = []
        self.weights: Optional[np.ndarray] = None
        self.reference: Optional[bytes] = None          # GC RF
        self.consensus_structure: Optional[bytes] = None  # GC SS_cons
        self.model_mask: Optional[bytes] = None         # GC MM

    def __len__(self) -> int:
        return len(self.names)

    @property
    def nsequences(self) -> int:
        return len(self.names)


class TextMSA(MSA):
    """Alignment stored as text rows."""

    def __init__(self, name: Optional[bytes] = None,
                 sequences: TySequence[TextSequence] = ()):
        super().__init__(name)
        self.rows: List[str] = []
        for s in sequences:
            self.names.append(s.name)
            self.rows.append(s.sequence)

    @property
    def alignment_length(self) -> int:
        return len(self.rows[0]) if self.rows else 0

    def digitize(self, alphabet: Alphabet) -> "DigitalMSA":
        msa = DigitalMSA(alphabet, self.name)
        msa.names = list(self.names)
        for attr in ("accession", "description", "author", "reference",
                     "consensus_structure", "model_mask"):
            setattr(msa, attr, getattr(self, attr))
        if self.rows:
            msa.codes = np.stack([alphabet.encode(r) for r in self.rows])
        else:
            msa.codes = np.zeros((0, 0), dtype=np.uint8)
        msa.weights = None if self.weights is None else self.weights.copy()
        return msa

    def sequences_as_unaligned(self) -> Iterator[TextSequence]:
        for name, row in zip(self.names, self.rows):
            yield TextSequence(
                name=name,
                sequence="".join(c for c in row if c not in "-.~ ").upper(),
            )


class DigitalMSA(MSA):
    """Alignment stored as a code matrix ``codes[nseq, alen]``."""

    def __init__(self, alphabet: Alphabet, name: Optional[bytes] = None,
                 sequences: TySequence[DigitalSequence] = ()):
        super().__init__(name)
        self.alphabet = alphabet
        seqs = list(sequences)
        self.names = [s.name for s in seqs]
        if seqs:
            alen = max(len(s) for s in seqs)
            self.codes = np.full((len(seqs), alen), alphabet.gap_code,
                                 dtype=np.uint8)
            for i, s in enumerate(seqs):
                self.codes[i, : len(s)] = s.sequence
        else:
            self.codes = np.zeros((0, 0), dtype=np.uint8)

    @property
    def alignment_length(self) -> int:
        return self.codes.shape[1]

    def textize(self) -> TextMSA:
        msa = TextMSA(self.name)
        msa.names = list(self.names)
        msa.rows = [self.alphabet.decode(r) for r in self.codes]
        for attr in ("accession", "description", "author", "reference",
                     "consensus_structure", "model_mask", "weights"):
            setattr(msa, attr, getattr(self, attr))
        return msa

    def sequences_as_unaligned(self) -> Iterator[DigitalSequence]:
        gap = self.alphabet.gap_code
        miss = self.alphabet.missing_code
        for name, row in zip(self.names, self.codes):
            keep = (row != gap) & (row != miss)
            yield DigitalSequence(self.alphabet, name=name,
                                  sequence=row[keep].copy())

    def checksum(self) -> int:
        """A stable checksum over the unaligned sequences (used by
        jackhmmer convergence bookkeeping; not Easel-compatible)."""
        import zlib
        h = 0
        for s in self.sequences_as_unaligned():
            h = zlib.crc32(s.sequence.tobytes(), h)
        return h

    def identity_filter(self, max_identity: float = 0.8,
                        preference: str = "conscover") -> "DigitalMSA":
        """Greedy single-linkage %identity filtering
        (``esl_msaweight_IDFilter`` semantics)."""
        K = self.alphabet.K
        n = len(self.names)
        keep = []
        for i in range(n):
            ri = self.codes[i]
            ok = True
            for j in keep:
                rj = self.codes[j]
                both = (ri < K) & (rj < K)
                denom = min((ri < K).sum(), (rj < K).sum())
                if denom == 0:
                    continue
                ident = ((ri == rj) & both).sum() / denom
                if ident > max_identity:
                    ok = False
                    break
            if ok:
                keep.append(i)
        out = DigitalMSA(self.alphabet, self.name)
        out.names = [self.names[i] for i in keep]
        out.codes = self.codes[keep].copy()
        for attr in ("accession", "description", "reference",
                     "consensus_structure", "model_mask"):
            setattr(out, attr, getattr(self, attr))
        return out

    def compute_weights(self) -> None:
        """Position-based sequence weights (``esl_msaweight_PB``)."""
        from ..plan7.builder import _pb_weights
        self.weights = _pb_weights(self.codes, self.alphabet.K,
                                   self.alphabet.gap_code)
