"""FPN with an extra high-resolution (stride-2) output — "FPNplus".

Mirrors models/necks/fpn_plus.py: standard FPN laterals + nearest top-down
(P2..P5), a max-pool P6, plus ``num_lower_outs`` finer levels built by
bilinearly upsampling the finest post-top-down lateral 2x and applying a
3x3 conv. Output tuple: (P1, P2, P3, P4, P5, P6) with strides
(2, 4, 8, 16, 32, 64); RPN consumes levels 1..5, RoI extractors 0..4.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jnp.ndarray


def _upsample_nearest_2x(x: Array) -> Array:
    b, h, w, c = x.shape
    return jnp.broadcast_to(
        x[:, :, None, :, None, :], (b, h, 2, w, 2, c)
    ).reshape(b, 2 * h, 2 * w, c)


def _upsample_bilinear(x: Array, scale: int) -> Array:
    b, h, w, c = x.shape
    return jax.image.resize(
        x, (b, h * scale, w * scale, c), method="bilinear"
    )


class FPNplus(nn.Module):
    out_channels: int = 256
    num_outs: int = 5            # P2..P6
    num_lower_outs: int = 1      # stride-2 extras
    # lazy_lower: emit the lower conv on the stride-4 lateral grid (no 2x
    # upsample), and have consumers sample the result at stride 4. This is
    # an APPROXIMATION of the reference's conv(up2(lateral)) (fpn_plus.py
    # :79-91), not an exact rewrite: the 3x3 conv's tap pitch doubles
    # (conv-then-sample vs up-then-conv), so outputs deviate by the
    # kernel-first-moment term. Composed FPN+RoIAlign deviation measured
    # on random weights (tests/test_fpn_lazy.py): median ~3% of the
    # level's std on smooth fields, ~18% on white-noise-heavy content
    # (corr 0.998 / 0.96). The RoI *coordinate* bookkeeping
    # is exact (detector._align_strides). Appropriate when training from
    # scratch (weights adapt to the grid they see); converted reference
    # .pth checkpoints were trained on the upsampled grid, so .pth loads
    # default this off (apis/inference.init_inference).
    lazy_lower: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs: Sequence[Array]) -> Tuple[Array, ...]:
        n_in = len(inputs)
        laterals = [
            nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                    name=f"lateral{i}")(inputs[i].astype(self.dtype))
            for i in range(n_in)
        ]
        for i in range(n_in - 1, 0, -1):
            laterals[i - 1] = laterals[i - 1] + _upsample_nearest_2x(
                laterals[i]
            )

        outs_lower = []
        for i in range(self.num_lower_outs):
            if self.lazy_lower:
                src = laterals[0]
            else:
                src = _upsample_bilinear(
                    laterals[0], 2 ** (self.num_lower_outs - i)
                )
            outs_lower.append(
                nn.Conv(self.out_channels, (3, 3), padding=1,
                        dtype=self.dtype, name=f"lower{i}")(src)
            )

        outs = [
            nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name=f"fpn{i}")(laterals[i])
            for i in range(n_in)
        ]
        while len(outs) < self.num_outs:
            outs.append(
                nn.max_pool(outs[-1], (1, 1), strides=(2, 2))
            )
        return tuple(outs_lower + outs)
