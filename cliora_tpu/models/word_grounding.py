"""Word-level grounding baseline: skips the chart entirely and scores
words against regions directly.

(reference: cliora/net/vg.py ``DioraMLP.forward``:477-482 -- a DIORA
clone whose forward only computes the word x region attention; selectable
in the reference's build_net via a commented import, trainer.py:520)
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class WordGroundingOutput(NamedTuple):
    vg_atten_score: jax.Array         # (B, B, L, R)
    atten_score: jax.Array            # (B, L, R) per-example diagonal


def word_grounding_forward(x_word, obj_word) -> WordGroundingOutput:
    """x_word: (B, L, D) word-branch embeddings; obj_word: (B, R, D)."""
    vg = jnp.einsum("ald,crd->aclr", x_word, obj_word)
    B = x_word.shape[0]
    return WordGroundingOutput(vg, vg[jnp.arange(B), jnp.arange(B)])
