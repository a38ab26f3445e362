"""Plan7 profile HMMs: model, profiles, pipeline (HMMER3-equivalent)."""

from .hmm import HMM, Transitions
from .hmmfile import HMMFile
from .background import Background
from .profile import Profile, ProfileTransitions
from .builder import Builder
from .pipeline import Pipeline
from .longtargets import LongTargetsPipeline
from .results import TopHits, Hit, Domain, Alignment
from .optimized import OptimizedProfile, OptimizedProfileBlock, HMMPressedFile
from .iteration import IterativeSearch, IterationResult
from .tracealign import TraceAligner, Trace, Traces
from .views import Cutoffs, Domains, EvalueParameters, Offsets, ScoreData

__all__ = [
    "HMM", "HMMFile", "Transitions", "ProfileTransitions", "Background",
    "Profile", "Builder",
    "Pipeline", "LongTargetsPipeline", "TopHits", "Hit", "Domain", "Alignment",
    "OptimizedProfile", "OptimizedProfileBlock", "HMMPressedFile",
    "IterativeSearch", "IterationResult", "TraceAligner", "Trace", "Traces",
    "Cutoffs", "Domains", "EvalueParameters", "Offsets", "ScoreData",
]
