"""Plan7 profile HMMs: model, profiles, pipeline (HMMER3-equivalent)."""

from .hmm import HMM, Transitions
from .hmmfile import HMMFile

__all__ = ["HMM", "HMMFile", "Transitions"]
