"""Amino-acid fallback codec (`intrepppid/data/utils.py:21-100`).

22-symbol IUPAC table with PAD=0; ambiguous ("wobble") codes B/Z/X resolve
to a random constituent amino acid. Used when tokenising without a
SentencePiece model (``sp=False`` paths). A seedable RNG replaces the
reference's module-global ``random`` for reproducibility.
"""
from __future__ import annotations

import random
from typing import List, Optional

AAS = [
    "PAD",
    "A", "R", "N", "D", "C", "Q", "E", "G", "H", "I", "L",
    "K", "M", "F", "P", "S", "T", "W", "Y", "V", "O", "U",
]
_AA_INDEX = {aa: i for i, aa in enumerate(AAS)}

WOBBLE_AAS = {
    "B": ["D", "N"],
    "Z": ["Q", "E"],
    "X": [
        "A", "R", "N", "D", "C", "Q", "E", "G", "H", "I",
        "L", "K", "M", "F", "P", "S", "T", "W", "Y", "V",
    ],
}


def get_aa_code(aa: str, rng: Optional[random.Random] = None) -> Optional[int]:
    """Translate one amino-acid character to its integer code; wobble codes
    pick uniformly among their constituents."""
    if aa in _AA_INDEX:
        return _AA_INDEX[aa]
    if aa in WOBBLE_AAS:
        choices = WOBBLE_AAS[aa]
        pick = (rng or random).randint(0, len(choices) - 1)
        return _AA_INDEX[choices[pick]]
    return None


def encode_seq(seq: str, rng: Optional[random.Random] = None) -> List[int]:
    """String of amino acids -> list of integer codes."""
    return [get_aa_code(aa, rng) for aa in seq]


def repeat_pad_rows(x, size: int):
    """Pad axis 0 up to exactly ``size`` rows by repeating the last row.

    The fixed-compiled-shape idiom shared by the infer CLI, the serving
    engine, and the mesh tail-padding: a variable tail shape would compile
    a fresh executable (minutes on remote-compile platforms), so tails are
    padded to the one compiled shape and the pad rows' outputs are sliced
    off (or weight-masked) by the caller."""
    import numpy as np

    pad = size - x.shape[0]
    if pad <= 0:
        return x
    return np.concatenate([x, np.repeat(x[-1:], pad, axis=0)], axis=0)
