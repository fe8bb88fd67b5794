"""BazinFit: nonlinear rise/fall transient-curve fit from the
light-curve-feature catalog (/root/reference/README.md:18; Bazin et al.
2009, A&A 499, 653):

    f(t) = A * exp(-(t - t0) / tau_fall) / (1 + exp(-(t - t0) / tau_rise)) + B

Fit by Levenberg-Marquardt with analytic gradients, hand-rolled on numpy
(no scipy in the runtime).  Everything is deterministic: fixed data-derived
initialization, fixed damping schedule, fixed iteration/termination rule —
the same inputs always produce the same parameters, which is what the
rows-only correctness contract needs (nonlinear fits have no SQL oracle;
the unit oracle plants known parameters on synthetic curves and requires
recovery — tests/test_bazin.py)."""

from __future__ import annotations

import numpy as np

BAZIN_PARAMS = ("a", "b", "t0", "tau_rise", "tau_fall")


def bazin_model(t: np.ndarray, p: np.ndarray) -> np.ndarray:
    a, b, t0, tr, tf = p
    dt = t - t0
    # overflow -> inf is fine: an inf-RSS candidate is simply rejected by
    # the LM step acceptance; silence the per-element warnings
    with np.errstate(over="ignore", invalid="ignore"):
        return a * np.exp(-dt / tf) / (1.0 + np.exp(-dt / tr)) + b


def _sigmoid(z: np.ndarray) -> np.ndarray:
    with np.errstate(over="ignore"):
        return 1.0 / (1.0 + np.exp(-z))


def _jacobian(t: np.ndarray, p: np.ndarray) -> np.ndarray:
    a, b, t0, tr, tf = p
    dt = t - t0
    with np.errstate(over="ignore", invalid="ignore"):
        ef = np.exp(-dt / tf)
        s = _sigmoid(dt / tr)
        f0 = ef * s                      # model without A, B
        # d/dt0: A*ef*s * (1/tf - (1-s)/tr); d/dtr: -A*f0*(1-s)*dt/tr^2
        J = np.empty((len(t), 5))
        J[:, 0] = f0
        J[:, 1] = 1.0
        J[:, 2] = a * f0 * (1.0 / tf - (1.0 - s) / tr)
        J[:, 3] = -a * f0 * (1.0 - s) * dt / (tr * tr)
        J[:, 4] = a * f0 * dt / (tf * tf)
    return J


def bazin_fit(t_s: np.ndarray, v: np.ndarray,
              max_iter: int = 60) -> dict:
    """LM fit of the Bazin profile to one series (t in SECONDS).

    Deterministic init: t0 at the argmax value, B = min, A = max - min,
    tau_rise = span/20, tau_fall = span/5.  Parameters are bounded by
    reparametrization (tau = exp(theta) keeps both taus positive).
    Returns the 5 parameters plus rss and n; NaN parameters when n < 6
    or the series is constant (fit undefined)."""
    t_s = np.asarray(t_s, dtype=np.float64)
    v = np.asarray(v, dtype=np.float64)
    order = np.argsort(t_s, kind="stable")
    t, y = t_s[order], v[order]
    n = len(t)
    out = {k: float("nan") for k in BAZIN_PARAMS}
    out["n"] = int(n)
    out["rss"] = float("nan")
    if n < 6 or not y.max() > y.min():
        return out
    span = max(t[-1] - t[0], 1.0)
    # theta = (A, B, t0, log tau_rise, log tau_fall); log-tau is clamped to
    # [span*1e-4, span*10] so a collapsing tau can't zero the Jacobian
    # denominators (a rejected LM step would otherwise emit NaN warnings)
    lo, hi = np.log(span * 1e-4), np.log(span * 10.0)
    th = np.array([y.max() - y.min(), y.min(), t[int(np.argmax(y))],
                   np.log(span / 20.0), np.log(span / 5.0)])

    def unpack(th_):
        return np.array([th_[0], th_[1], th_[2],
                         np.exp(np.clip(th_[3], lo, hi)),
                         np.exp(np.clip(th_[4], lo, hi))])

    def rss_of(th_):
        with np.errstate(over="ignore", invalid="ignore"):
            r = y - bazin_model(t, unpack(th_))
            return float(r @ r)

    lam = 1e-3
    best = rss_of(th)
    for _ in range(max_iter):
        th[3] = np.clip(th[3], lo, hi)
        th[4] = np.clip(th[4], lo, hi)
        p = unpack(th)
        r = y - bazin_model(t, p)
        J = _jacobian(t, p)
        with np.errstate(over="ignore", invalid="ignore"):
            # chain rule for the log-tau reparametrization
            J[:, 3] *= p[3]
            J[:, 4] *= p[4]
            g = J.T @ r
            H = J.T @ J
        if not (np.isfinite(g).all() and np.isfinite(H).all()):
            break
        stepped = False
        for _try in range(8):
            try:
                step = np.linalg.solve(
                    H + lam * np.diag(np.maximum(np.diag(H), 1e-12)), g)
            except np.linalg.LinAlgError:
                lam *= 10.0
                continue
            cand = th + step
            c = rss_of(cand)
            if np.isfinite(c) and c < best:
                th, best = cand, c
                lam = max(lam * 0.3, 1e-12)
                stepped = True
                break
            lam *= 10.0
        if not stepped or best <= 1e-24:
            break
    p = unpack(th)
    out.update({k: float(p[i]) for i, k in enumerate(BAZIN_PARAMS)})
    out["rss"] = best
    return out
