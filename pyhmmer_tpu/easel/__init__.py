"""Bio primitives: alphabets, sequences, MSAs, file parsers (Easel-equivalent)."""

from .alphabet import Alphabet
from .sequence import (
    Sequence,
    TextSequence,
    DigitalSequence,
    SequenceBlock,
    TextSequenceBlock,
    DigitalSequenceBlock,
)
from .seqfile import SequenceFile

__all__ = [
    "Alphabet",
    "Sequence",
    "TextSequence",
    "DigitalSequence",
    "SequenceBlock",
    "TextSequenceBlock",
    "DigitalSequenceBlock",
    "SequenceFile",
]
