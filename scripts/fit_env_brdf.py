"""Generate kernels/env_brdf_coeffs.py — a minimax Chebyshev fit of the
split-sum environment-BRDF LUT (scale, bias).

The LUT (resources/shaders/ibl/cubemap_brdflut.comp BRDF(), reproduced by
kernels/ibl.brdf_lut) is a UNIVERSAL smooth function of (NdotV, roughness)
— it does not depend on the environment — so the fast shading path can
evaluate a fitted polynomial in registers instead of paying a per-pixel
table gather (~7ns/index on the XLA TPU gather emitter).

Fit: degree-12x12 tensor Chebyshev in (sqrt(NdotV), sqrt(roughness))
(the sqrt substitution resolves the grazing-angle boundary layer), with
Lawson iterative reweighting for a near-minimax solution.  Achieved
residuals (vs the 1024-sample integration at 256^2): scale max ~2e-3,
bias max ~6e-3 — both below one 8-bit LSB except a corner handful.

Run: python scripts/fit_env_brdf.py   (regenerates the coeffs module;
tests/test_kernels.py pins the committed fit against brdf_lut.)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
from numpy.polynomial import chebyshev as C

from mo_renderer_tpu.kernels.ibl import brdf_lut

S = 256
DEG = 12
ITERS = 30
OUT = os.path.join(
    os.path.dirname(__file__), "..", "mo_renderer_tpu", "kernels",
    "env_brdf_coeffs.py",
)


def lawson_fit(target, xn, xr):
    Vn = C.chebvander(xn, DEG)
    Vr = C.chebvander(xr, DEG)
    A = np.einsum("ia,jb->ijab", Vr, Vn).reshape(S * S, -1)
    b = target.reshape(S * S)
    w = np.ones(S * S)
    best = None
    for _ in range(ITERS):
        sw = np.sqrt(w / w.mean())
        coef, *_ = np.linalg.lstsq(A * sw[:, None], b * sw, rcond=None)
        err = np.abs(A @ coef - b)
        if best is None or err.max() < best[0]:
            best = (err.max(), err.mean(), coef)
        w = w * (err + 1e-9)
    return best


def main():
    lut = np.asarray(brdf_lut(S, 1024))[..., :2].astype(np.float64)
    nov = (np.arange(S) + 0.5) / S
    rough = 1.0 - (np.arange(S) + 0.5) / S  # row i holds roughness 1-(i+.5)/S
    xn = 2.0 * np.sqrt(nov) - 1.0
    xr = 2.0 * np.sqrt(rough) - 1.0

    coeffs = np.zeros((DEG + 1, DEG + 1, 2), np.float64)
    stats = []
    for ch, name in ((0, "scale"), (1, "bias")):
        mx, mean, coef = lawson_fit(lut[..., ch], xn, xr)
        coeffs[..., ch] = coef.reshape(DEG + 1, DEG + 1)
        stats.append(f"{name}: max {mx:.3e} mean {mean:.3e}")
        print(stats[-1])

    rows = []
    for i in range(DEG + 1):
        for c in range(2):
            vals = ", ".join(f"{v:.10e}" for v in coeffs[i, :, c])
            rows.append(f"    ({vals}),  # r-deg {i}, ch {c}")
    body = "\n".join(rows)
    with open(os.path.abspath(OUT), "w") as f:
        f.write(
            '"""Chebyshev coefficients for the environment-BRDF polynomial '
            "(generated\nby scripts/fit_env_brdf.py — do not edit by hand)."
            f'\n\nFit residuals: {"; ".join(stats)}.\n"""\n\n'
            f"DEG = {DEG}\n\n"
            "# COEFFS[2*i + c][j]: Chebyshev coefficient T_i(x_r) T_j(x_n) "
            "of channel c\n# (0 = scale, 1 = bias), with x_n = "
            "2*sqrt(NdotV)-1, x_r = 2*sqrt(rough)-1.\nCOEFFS = (\n"
            f"{body}\n)\n"
        )
    print(f"wrote {os.path.abspath(OUT)}")


if __name__ == "__main__":
    main()
