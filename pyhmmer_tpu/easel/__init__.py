"""Bio primitives: alphabets, sequences, MSAs, file parsers (Easel-equivalent)."""

from .alphabet import Alphabet, DNA, RNA, AA
from .sequence import (
    Sequence,
    TextSequence,
    DigitalSequence,
    SequenceBlock,
    TextSequenceBlock,
    DigitalSequenceBlock,
)
from .seqfile import SequenceFile
from .msa import MSA, TextMSA, DigitalMSA
from .msafile import MSAFile
from .ssi import SSIReader, SSIWriter
from .gencode import GeneticCode
from .random import Randomness
from .containers import (
    Bitfield,
    KeyHash,
    Vector,
    VectorD,
    VectorF,
    VectorI,
    VectorU8,
    Matrix,
    MatrixD,
    MatrixF,
    MatrixI,
    MatrixU8,
)

__all__ = [
    "Alphabet", "Sequence", "TextSequence", "DigitalSequence",
    "SequenceBlock", "TextSequenceBlock", "DigitalSequenceBlock",
    "SequenceFile", "MSA", "TextMSA", "DigitalMSA", "MSAFile",
    "SSIReader", "SSIWriter", "GeneticCode", "Randomness",
    "Bitfield", "KeyHash",
    "Vector", "VectorD", "VectorF", "VectorI", "VectorU8",
    "Matrix", "MatrixD", "MatrixF", "MatrixI", "MatrixU8",
]
