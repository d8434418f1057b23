"""Compressed arithmetics + the tensor-format zoo
(reference docs/tutorials/arithmetics.ipynb, main_formats.ipynb,
other_formats.ipynb).

Shows rank growth under +,-,* and recompression with `tn.round`, elementwise
transcendental functions via cross-approximation, and the free per-mode
mixing of TT / CP / Tucker formats in one `Tensor`.
"""

import os

import jax

if os.environ.get("TN_DEVICE", "cpu") == "cpu":
    # f64 analysis mode on CPU; set TN_DEVICE=tpu to run on the accelerator (f32)
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np

import tntorch_tpu as tn


def main():
    # --- arithmetic + rounding ---
    t1 = tn.ones([32] * 4)
    t2 = tn.ones([32] * 4)
    t = tn.round((t1 + t2) * (t2 - 2))  # ranks add/multiply, then recompress
    print("(1+1)*(1-2) rounded:", "max rank", max(t.ranks_tt),
          "value", float(t[0, 0, 0, 0]))

    # Algebraic slice assignment
    t = tn.ones(5, 5)
    t[:3, :] = 2
    t[:, :2] *= 3
    print("after slice assignment:\n", np.asarray(t.full()))

    # A smooth multiplicative function: compress, then transform elementwise
    domain = [jnp.linspace(0, np.pi, 32)] * 4
    x, y, z, w = tn.meshgrid(domain)
    t = tn.round(1 / (1 + x + y + z + w))
    print("1/(1+x+y+z+w):", "TT ranks", t.ranks_tt)

    s = tn.round(tn.sin(t) ** 2 + tn.cos(t) ** 2)  # == 1 everywhere
    print("sin^2+cos^2: mean {:.6f}, var {:.3g}".format(
        float(tn.mean(s)), float(tn.var(s))))

    # --- the format zoo: per-mode TT / CP / Tucker mixing ---
    print()
    for desc, kwargs in [
        ("TT", dict(ranks_tt=5)),
        ("TT-Tucker", dict(ranks_tt=5, ranks_tucker=6)),
        ("TT-Tucker (partial)", dict(ranks_tt=5, ranks_tucker=[None, 6, None, None, 7])),
        ("Tucker (as TT-Tucker)", dict(ranks_tucker=3)),
        ("CP", dict(ranks_cp=4)),
        ("hybrid TT-CP", dict(ranks_tt=[2, 3, None, None], ranks_cp=[None, None, None, 4, 4])),
        ("CP-Tucker", dict(ranks_cp=2, ranks_tucker=4)),
    ]:
        t = tn.rand([32] * 5, key=jax.random.key(0), **kwargs)
        print("{:22s} #coef {:>7d}  compression {:8.1f}x".format(
            desc, t.numcoef(), t.numel() / t.numcoef()))


if __name__ == "__main__":
    main()
