from .ctc_prefix import CTCPrefixState, ctc_init_state, ctc_score_candidates, ctc_advance_state
from .beam_search import BeamSearchConfig, beam_search

__all__ = [
    "CTCPrefixState",
    "ctc_init_state",
    "ctc_score_candidates",
    "ctc_advance_state",
    "BeamSearchConfig",
    "beam_search",
]
