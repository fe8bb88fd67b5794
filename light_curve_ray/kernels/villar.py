"""VillarFit: the 7-parameter supernova light-curve profile from the
light-curve-feature catalog (/root/reference/README.md:18; Villar et al.
2019, ApJ 884:83):

    s(t)  = 1 / (1 + exp(-(t - t0) / tau_rise))
    f(t)  = b + A * s(t) * (1 - beta * (t - t0) / gamma)            t <  t0 + gamma
    f(t)  = b + A * s(t) * (1 - beta) * exp(-(t - t0 - gamma) / tau_fall)
                                                                    t >= t0 + gamma

(rise sigmoid, linear plateau decline of relative depth beta over
duration gamma, exponential fall; continuous at the plateau end).

Same engineering as kernels/bazin.py: deterministic hand-rolled
Levenberg-Marquardt (numeric forward-difference Jacobian here — the
piecewise form makes analytic gradients error-prone), bounded by
reparametrization (gamma/taus = exp(theta) > 0, beta = sigmoid(theta)
in (0,1)), fixed init/damping/termination.  Rows-only correctness
contract: no SQL oracle for a nonlinear fit; the unit oracle plants
known parameters and requires recovery (tests/test_villar.py)."""

from __future__ import annotations

import numpy as np

VILLAR_PARAMS = ("a", "b", "t0", "gamma", "beta", "tau_rise", "tau_fall")


def villar_model(t: np.ndarray, p: np.ndarray) -> np.ndarray:
    a, b, t0, gamma, beta, tr, tf = p
    dt = t - t0
    with np.errstate(over="ignore", invalid="ignore"):
        s = 1.0 / (1.0 + np.exp(-dt / tr))
        plateau = 1.0 - beta * dt / gamma
        fall = (1.0 - beta) * np.exp(-(dt - gamma) / tf)
        return b + a * s * np.where(dt < gamma, plateau, fall)


def villar_fit(t_s: np.ndarray, v: np.ndarray,
               max_iter: int = 80) -> dict:
    """LM fit of the Villar profile to one series (t in SECONDS).

    Deterministic init: t0 at the argmax, b = min, A = max - min,
    gamma = span/4, beta = 0.3, tau_rise = span/20, tau_fall = span/5.
    Returns the 7 parameters plus rss and n; NaN when n < 8 (one point
    per parameter plus slack) or the series is constant."""
    t_s = np.asarray(t_s, dtype=np.float64)
    v = np.asarray(v, dtype=np.float64)
    order = np.argsort(t_s, kind="stable")
    t, y = t_s[order], v[order]
    n = len(t)
    out = {k: float("nan") for k in VILLAR_PARAMS}
    out["n"] = int(n)
    out["rss"] = float("nan")
    if n < 8 or not y.max() > y.min():
        return out
    span = max(t[-1] - t[0], 1.0)
    lo, hi = np.log(span * 1e-4), np.log(span * 10.0)

    a0 = y.max() - y.min()
    b0 = y.min()
    t00 = t[int(np.argmax(y))]

    def unpack(th_):
        return np.array([
            th_[0], th_[1], th_[2],
            np.exp(np.clip(th_[3], lo, hi)),
            1.0 / (1.0 + np.exp(-np.clip(th_[4], -12.0, 12.0))),
            np.exp(np.clip(th_[5], lo, hi)),
            np.exp(np.clip(th_[6], lo, hi))])

    def rss_of(th_):
        with np.errstate(over="ignore", invalid="ignore"):
            r = y - villar_model(t, unpack(th_))
            return float(r @ r)

    def num_jac(th_):
        """Forward-difference Jacobian of the residual wrt theta."""
        base = villar_model(t, unpack(th_))
        J = np.empty((n, 7))
        for k in range(7):
            step = 1e-6 * max(1.0, abs(th_[k]))
            tp = th_.copy()
            tp[k] += step
            with np.errstate(over="ignore", invalid="ignore"):
                J[:, k] = (villar_model(t, unpack(tp)) - base) / step
        return J

    def _lm(th):
        lam = 1e-3
        best = rss_of(th)
        for _ in range(max_iter):
            p = unpack(th)
            r = y - villar_model(t, p)
            J = num_jac(th)
            with np.errstate(over="ignore", invalid="ignore"):
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
        return th, best

    # deterministic multi-start over the (t0, gamma, beta) directions —
    # the profile's multimodal axes: t0 sits BEFORE the flux peak (the
    # sigmoid midpoint, not the maximum), and a too-long init plateau
    # absorbs the fall, so single-start LM reliably stalls in a local
    # minimum (measured: rss 1.6 vs 1e-28 on a planted noiseless curve)
    best_th, best_rss = None, np.inf
    tol = 1e-20 * max(1.0, float(y @ y))
    stale = 0  # starts since the last >1% improvement
    for dt0 in (0.0, span / 20.0, span / 8.0):
        for gfrac in (16.0, 8.0, 4.0, 2.0):
            for beta_logit in (-1.5, 0.0, 1.5):
                th0 = np.array([a0, b0, t00 - dt0, np.log(span / gfrac),
                                beta_logit, np.log(span / 20.0),
                                np.log(span / 5.0)])
                th, rss = _lm(th0)
                if rss < best_rss * (1.0 - 1e-2):
                    stale = 0
                else:
                    stale += 1
                if rss < best_rss:
                    best_th, best_rss = th, rss
                # converged, or the grid has stopped helping (a featureless
                # series pulls every start to the same noise floor — don't
                # burn the remaining starts discovering that)
                if best_rss <= tol or stale >= 6:
                    break
            else:
                continue
            break
        else:
            continue
        break
    p = unpack(best_th)
    out.update({k: float(p[i]) for i, k in enumerate(VILLAR_PARAMS)})
    out["rss"] = best_rss
    return out
