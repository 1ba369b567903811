"""Shared machinery for the diffusion-backbone scorers (SD-1.5 / SDXL / DiT)."""

from __future__ import annotations

import jax
import numpy as np

from diffsim_tpu.parallel import mesh as meshlib


class ScorerBase:
    mesh = None
    dtype = None

    def _place(self, params):
        if self.mesh is None:
            return jax.device_put(params, jax.devices()[0])
        return jax.device_put(params, meshlib.replicated(self.mesh))

    def _pad_pairs(self, pix_a: np.ndarray, pix_b: np.ndarray, prompts: list[str] | None):
        """Stack to (P, 2, H, W, C) in the transport dtype and pad P to the data-axis size."""
        P = pix_a.shape[0]
        transport = np.uint8 if pix_a.dtype == np.uint8 else self.dtype
        pix = np.stack([pix_a, pix_b], axis=1).astype(transport)
        pad = 0
        if self.mesh is not None:
            target = meshlib.pad_to_multiple(P, meshlib.data_axis_size(self.mesh))
            pad = target - P
            if pad:
                pix = np.concatenate([pix, np.repeat(pix[-1:], pad, 0)], axis=0)
                if prompts is not None:
                    prompts = prompts + [prompts[-1]] * pad
        return pix, prompts, P, pad

    def _jit_pairs(self, fn, n_data: int = 2):
        """jit with the first arg replicated (params), the next ``n_data`` args data-sharded,
        the rest replicated."""
        if self.mesh is None:
            return jax.jit(fn)
        ds = meshlib.data_sharding(self.mesh)
        rs = meshlib.replicated(self.mesh)
        argc = fn.__code__.co_argcount
        in_sh = tuple(rs if i == 0 else (ds if i <= n_data else rs) for i in range(argc))
        return jax.jit(fn, in_shardings=in_sh, out_shardings=ds)
