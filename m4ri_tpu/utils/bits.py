"""Word-level bit utilities (reference analogue: misc.h:323-474).

These are host-side helpers (numpy / python ints) used for scattered-pivot
bookkeeping and tests; the reference uses them inside the MMPF engine when
pivot columns are non-contiguous (ple_russian.c:191-295).  Word size follows
the package convention (32) but a 64-bit variant is provided for
reference-stream compatibility checks.
"""

from __future__ import annotations

import numpy as np

from .config import WORD_BITS


def swap_bits(v: int, bits: int = WORD_BITS) -> int:
    """Reverse the bits of a word (reference: m4ri_swap_bits, misc.h:323)."""
    mask = (1 << bits) - 1
    v &= mask
    return int(int(f"{v:0{bits}b}"[::-1], 2))


def spread_bits(from_: int, q, length: int, base: int = 0) -> int:
    """Move bit i of ``from_`` to position q[i] - base (reference:
    m4ri_spread_bits, misc.h:389-411)."""
    to = 0
    for i in range(length):
        to |= (from_ & (1 << i)) << (q[i] - i - base)
    return to


def shrink_bits(from_: int, q, length: int, base: int = 0) -> int:
    """Inverse of spread_bits: collect bit q[i] - base into position i
    (reference: m4ri_shrink_bits, misc.h:346-370)."""
    to = 0
    for i in range(length):
        to |= (from_ & (1 << (q[i] - base))) >> (q[i] - i - base)
    return to


def lesser_lsb(v: int, w: int) -> bool:
    """True iff the least significant set bit of v is less significant than
    that of w (reference: m4ri_lesser_LSB, misc.h:466-474)."""
    if v == 0:
        return False
    if w == 0:
        return True
    return (v & -v) < (w & -w)


def parity64(buf: np.ndarray) -> np.ndarray:
    """Columnwise parity of up to 64 words at once (reference:
    m4ri_parity64, parity.h:80-125): returns a word whose bit i is the
    parity of buf[i]."""
    pc = np.bitwise_count(buf.astype(np.uint64)) & 1
    return int(sum(int(b) << i for i, b in enumerate(pc)))


def word_to_str(w: int, bits: int = WORD_BITS) -> str:
    """ASCII rendering of a word, LSB first, '1'/' ' like m4ri_word_to_str
    (misc.c:43-56)."""
    return "".join("1" if (w >> i) & 1 else " " for i in range(bits))
