"""Branch-free polynomial root finding for minimal solvers.

TPU-native counterpart of /root/reference/src/base/polynomial.{h,cc}. The
reference finds roots via companion-matrix eigendecomposition (LAPACK),
which does not exist on TPU. Here:

  * cubic/quartic: closed form (Cardano/Ferrari) — exact, branch-free.
  * general degree-n real roots: fixed-grid sign-change isolation +
    bisection + Newton polish — fixed trip counts, fully vmappable. This
    is what the 5-point essential solver uses for its degree-10 polynomial.

All functions return (roots, valid_mask) with static shapes; invalid slots
hold 0 and mask False.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def polyval(coeffs: jax.Array, x: jax.Array) -> jax.Array:
    """Evaluate poly with coeffs[0]*x^n + ... + coeffs[n] (Horner)."""
    out = jnp.zeros_like(x) + coeffs[..., 0]
    for k in range(1, coeffs.shape[-1]):
        out = out * x + coeffs[..., k]
    return out


def polyder(coeffs: jax.Array) -> jax.Array:
    n = coeffs.shape[-1] - 1
    powers = jnp.arange(n, 0, -1, dtype=coeffs.dtype)
    return coeffs[..., :-1] * powers


def solve_quadratic(a, b, c):
    """Real roots of a x² + b x + c. Returns (roots (...,2), mask (...,2)).

    Numerically stable citardauq/standard split; handles a≈0 (linear).
    """
    lin = jnp.abs(a) < 1e-14
    disc = b * b - 4 * a * c
    has = disc >= 0
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    # stable: q = -(b + sign(b)*sqrt(disc))/2
    sgn = jnp.where(b >= 0, 1.0, -1.0)
    q = -0.5 * (b + sgn * sq)
    a_safe = jnp.where(lin, 1.0, a)
    q_safe = jnp.where(jnp.abs(q) < 1e-14, 1e-14, q)
    r1 = jnp.where(lin, -c / jnp.where(jnp.abs(b) < 1e-14, 1e-14, b), q / a_safe)
    r2 = jnp.where(lin, r1, c / q_safe)
    roots = jnp.stack([r1, r2], axis=-1)
    mask = jnp.stack([has | lin, has & ~lin], axis=-1)
    return roots, mask


def solve_cubic_real(a, b, c, d):
    """One real root of a x³ + b x² + c x + d (a must be nonzero).

    Trigonometric/Cardano hybrid, branch-free via where.
    """
    a_safe = jnp.where(jnp.abs(a) < 1e-14, 1e-14, a)
    b_, c_, d_ = b / a_safe, c / a_safe, d / a_safe
    p = c_ - b_ * b_ / 3.0
    q = 2.0 * b_ ** 3 / 27.0 - b_ * c_ / 3.0 + d_
    disc = (q / 2.0) ** 2 + (p / 3.0) ** 3
    # disc > 0: one real root (Cardano); disc <= 0: three real (trig)
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    u = jnp.cbrt(-q / 2.0 + sq)
    v = jnp.cbrt(-q / 2.0 - sq)
    root_pos = u + v
    # trig branch
    p_safe = jnp.where(p >= -1e-14, -1e-14, p)
    m = 2.0 * jnp.sqrt(-p_safe / 3.0)
    arg = jnp.clip(3.0 * q / (p_safe * m), -1.0, 1.0)
    root_neg = m * jnp.cos(jnp.arccos(arg) / 3.0)
    root = jnp.where(disc > 0, root_pos, root_neg)
    return root - b_ / 3.0


def solve_cubic_all(a, b, c, d):
    """All real roots of cubic. Returns (roots (...,3), mask (...,3))."""
    r1 = solve_cubic_real(a, b, c, d)
    # deflate: a x^3+...= (x - r1)(a x^2 + e x + f)
    e = b + a * r1
    f = c + e * r1
    r23, m23 = solve_quadratic(a, e, f)
    roots = jnp.concatenate([r1[..., None], r23], axis=-1)
    mask = jnp.concatenate([jnp.ones_like(r1, bool)[..., None], m23], axis=-1)
    return roots, mask


def solve_quartic_real(a, b, c, d, e):
    """Real roots of quartic via Ferrari. Returns (roots (...,4), mask)."""
    a_safe = jnp.where(jnp.abs(a) < 1e-14, 1e-14, a)
    b_, c_, d_, e_ = b / a_safe, c / a_safe, d / a_safe, e / a_safe
    # depressed: y^4 + p y^2 + q y + r, x = y - b_/4
    p = c_ - 3.0 * b_ * b_ / 8.0
    q = d_ - b_ * c_ / 2.0 + b_ ** 3 / 8.0
    r = e_ - b_ * d_ / 4.0 + b_ * b_ * c_ / 16.0 - 3.0 * b_ ** 4 / 256.0
    # resolvent cubic: m^3 + p m^2 + (p^2/4 - r) m - q^2/8 = 0; need m > 0
    m = solve_cubic_real(jnp.ones_like(p), p, p * p / 4.0 - r,
                         -q * q / 8.0)
    m = jnp.maximum(m, 1e-14)
    s = jnp.sqrt(2.0 * m)
    s_safe = jnp.where(jnp.abs(s) < 1e-14, 1e-14, s)
    # factorization: y^4+py^2+qy+r = (y^2 + s y + c1)(y^2 - s y + c2)
    # with c1 + c2 = p + 2m and s (c2 - c1) = q
    c1 = m + p / 2.0 - q / (2.0 * s_safe)
    c2 = m + p / 2.0 + q / (2.0 * s_safe)
    one = jnp.ones_like(s)
    r12, m12 = solve_quadratic(one, s, c1)
    r34, m34 = solve_quadratic(one, -s, c2)
    roots = jnp.concatenate([r12, r34], axis=-1) - b_[..., None] / 4.0
    mask = jnp.concatenate([m12, m34], axis=-1)
    return roots, mask


def real_roots_sturm(coeffs: jax.Array, lo: float = -10.0, hi: float = 10.0,
                     grid: int = 512, bisect_iters: int = 40,
                     newton_iters: int = 3, max_roots: int = 10):
    """Real roots of a polynomial via dense sign-change isolation.

    TPU-friendly replacement for companion-matrix eig: evaluate on a fixed
    `grid` over a tan-warped (-inf, inf) interval, find sign changes,
    bisect each bracketed root, polish with Newton. Fixed shapes and trip
    counts throughout. Roots outside brackets (even multiplicity / complex)
    are not found — acceptable for RANSAC minimal solvers where missed
    hypotheses just lower the effective iteration count.

    coeffs: (n+1,) highest-degree first. Returns (roots (max_roots,),
    mask (max_roots,)).
    """
    # tan warp: t in (-pi/2, pi/2) -> x = tan(t) covers all reals
    ts = jnp.linspace(-jnp.pi / 2 + 1e-3, jnp.pi / 2 - 1e-3, grid)
    xs = jnp.tan(ts)
    vals = polyval(coeffs, xs)
    sign = jnp.sign(vals)
    change = (sign[:-1] * sign[1:]) < 0                 # (grid-1,)
    # take first max_roots sign changes (sorted by position)
    idx = jnp.where(change, jnp.arange(grid - 1), grid)
    order = jnp.sort(idx)[:max_roots]
    valid = order < grid
    safe = jnp.minimum(order, grid - 2)
    a = xs[safe]
    b = xs[safe + 1]

    def bisect_body(_, ab):
        a, b = ab
        mid = 0.5 * (a + b)
        fm = polyval(coeffs, mid)
        fa = polyval(coeffs, a)
        left = (fa * fm) <= 0
        return jnp.where(left, a, mid), jnp.where(left, mid, b)

    a, b = jax.lax.fori_loop(0, bisect_iters, bisect_body, (a, b))
    x = 0.5 * (a + b)
    dcoeffs = polyder(coeffs)
    for _ in range(newton_iters):
        f = polyval(coeffs, x)
        df = polyval(dcoeffs, x)
        df = jnp.where(jnp.abs(df) < 1e-20, 1e-20, df)
        step = jnp.clip(f / df, -1.0, 1.0)
        x = x - step
    return jnp.where(valid, x, 0.0), valid
