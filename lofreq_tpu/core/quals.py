"""Quality merging — the reference's error model (snpcaller.c:302-341):

  P_joint = PM + (1-PM)*PS + (1-PM)(1-PS)*PBAQ + (1-PM)(1-PS)(1-PBAQ)*PB

with -1 meaning "unknown" (prob 0) and MQ==0 mapped to MQ0_ERRPROB.
Float64 with the same operation order, so results are bit-identical.
"""

from __future__ import annotations

import numpy as np

from ..defaults import MQ0_ERRPROB
from .phred import phred_to_prob


def _q_to_p(q: np.ndarray) -> np.ndarray:
    """-1 -> 0.0, else phred->prob."""
    q = np.asarray(q)
    return np.where(q == -1, 0.0, phred_to_prob(np.maximum(q, 0)))


def merge_srcq_mapq_baq_and_bq(sq, mq, baq, bq) -> np.ndarray:
    """Vectorized merge; all inputs int arrays with -1 == NA.

    Note: callers must already have mapped MQ 255 -> -1 (see
    plp_to_errprobs, snpcaller.c:451-453).
    """
    sp = _q_to_p(sq)
    mq = np.asarray(mq)
    mp = np.where(mq == -1, 0.0, np.where(mq == 0, MQ0_ERRPROB,
                                          phred_to_prob(np.maximum(mq, 0))))
    bap = _q_to_p(baq)
    bp = _q_to_p(bq)
    return (
        mp
        + (1.0 - mp) * sp
        + (1.0 - mp) * (1.0 - sp) * bap
        + (1.0 - mp) * (1.0 - sp) * (1.0 - bap) * bp
    )
