"""First-class attention feature taps.

The torch reference extracts Q/K/V (or attention outputs) by registering forward(-pre) hooks
that recompute projections with duplicated "hacked" processors and stash results on
``module.stores`` (/root/reference/diffsim/diffsim.py:43-77, hacked_attn.py:24-101,
metrics/hooks.py:3-37). That design recomputes every projection, leaks hooks (they are
re-registered per call and never removed — an O(n^2) slowdown over a run), and is a data race
if ever parallelized.

Here a tap is part of the function signature: models take an optional :class:`TapSpec` and
return ``(output, taps)`` where ``taps`` is a dict pytree. Tap addresses are static Python
values, so jit specializes the graph — the selected attention layer emits its tensors with zero
recompute, and every other layer contributes nothing.
"""

from __future__ import annotations

import dataclasses

# capture modes
QKV = "qkv"  # taps = {'q','k','v'}: (B, heads, seq, head_dim), the hacked_AttnProcessor layout
OUTPUT = "output"  # taps = {'out'}: post out-proj hidden states (diffeats / *feats variants)
IP_QKV = "ip_qkv"  # taps = {'q','ip_k','ip_v'}: per-adapter K/V lists from to_k_ip/to_v_ip


@dataclasses.dataclass(frozen=True)
class TapSpec:
    """Address of one attention site plus what to capture there.

    ``block``   'down' | 'mid' | 'up' for UNets, 'blocks' for DiT/ViT towers.
    ``address`` backbone-specific static index tuple; see each model's docstring.
    ``attn``    'attn1' (self) or 'attn2' (cross / IP image-cross).
    ``capture`` one of QKV / OUTPUT / IP_QKV.
    """

    block: str
    address: tuple
    attn: str = "attn1"
    capture: str = QKV


@dataclasses.dataclass(frozen=True)
class TapSite:
    """Static identity a layer compares against while the model traces."""

    block: str
    address: tuple

    def matches(self, spec: TapSpec | None) -> bool:
        return spec is not None and spec.block == self.block and tuple(spec.address) == tuple(self.address)
