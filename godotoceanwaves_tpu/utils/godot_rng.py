"""Best-effort reconstruction of Godot's RandomNumberGenerator (PCG32).

The reference seeds each cascade's spectrum from a host RNG fixed at 1234
("This seed gives big waves!", water.gd:68-69) and draws
`randi_range(-10000, 10000)` pairs (water.gd:31). Godot's RNG is PCG-XSH-RR
(pcg32) with a fixed default stream; this module reimplements that generator
so `default_cascades(godot_seeds=True)` can reproduce the demo scene's exact
seed sequence. The PCG core below follows the public pcg32 algorithm; exact
equality with a given Godot build is best-effort (Godot has changed its
seed-handling across versions) — the seeds are cosmetic either way, since
they only select which Gaussian draw each texel gets.
"""
from __future__ import annotations

_MULT = 6364136223846793005
_DEFAULT_INC = 1442695040888963407
_MASK64 = (1 << 64) - 1
_MASK32 = (1 << 32) - 1


class GodotRNG:
    """pcg32 with Godot's seed semantics (state := seed directly)."""

    def __init__(self, seed: int = 0):
        self.state = seed & _MASK64
        self.inc = _DEFAULT_INC

    def set_seed(self, seed: int) -> None:
        self.state = seed & _MASK64

    def randi(self) -> int:
        old = self.state
        self.state = (old * _MULT + self.inc) & _MASK64
        xorshifted = (((old >> 18) ^ old) >> 27) & _MASK32
        rot = old >> 59
        return ((xorshifted >> rot) | (xorshifted << ((-rot) & 31))) & _MASK32

    def randi_range(self, lo: int, hi: int) -> int:
        if hi < lo:
            lo, hi = hi, lo
        return lo + self.randi() % (hi - lo + 1)
