"""Strict-consumption checking for torch-checkpoint converters.

The converters (`tapir.params_from_torch`, `depth_anything.params_from_torch`)
address most keys by exact name — a renamed upstream key raises KeyError —
but block-structured keys are discovered with `while name_pattern in sd`
loops, so an upstream rename there would silently convert zero blocks.
Strict mode closes that hole: every key the converter did not read is an
error (minus an explicit ignore list of keys that are genuinely unused at
inference, e.g. DINOv2's `mask_token`).
"""

from __future__ import annotations

import re
from typing import Iterable, Mapping


class RecordingStateDict(Mapping):
    """Wraps a torch state_dict, recording which keys are read."""

    def __init__(self, sd: Mapping):
        self._sd = sd
        self.used = set()

    def __getitem__(self, k):
        self.used.add(k)
        return self._sd[k]

    def __iter__(self):
        return iter(self._sd)

    def __len__(self):
        return len(self._sd)

    def __contains__(self, k):
        return k in self._sd


def check_consumed(sd: Mapping, used: set, ignore: Iterable[str] = ()):
    """Raise if any state-dict key was not consumed (modulo ignore regexes)."""
    pats = [re.compile(p) for p in ignore]
    left = [
        k for k in sd
        if k not in used and not any(p.search(k) for p in pats)
    ]
    if left:
        head = ", ".join(left[:8])
        more = f" (+{len(left) - 8} more)" if len(left) > 8 else ""
        raise ValueError(
            f"{len(left)} state-dict keys not consumed by the converter — "
            f"upstream naming change? Unconsumed: {head}{more}"
        )
