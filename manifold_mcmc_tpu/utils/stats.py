"""MCMC convergence diagnostics: rank-normalised split-R-hat and bulk ESS.

Native implementation of the diagnostics the reference obtains from ``arviz``
(``arviz.summary`` at ``scripts/utils.py:368-381``), following Vehtari,
Gelman, Simpson, Carpenter & Buerkner (2021), *Rank-normalization, folding,
and localization: An improved R-hat for assessing convergence of MCMC*.

Host-side NumPy on ``(chains, draws)`` trace arrays produced by the samplers:
autocorrelations via FFT, Geyer initial-monotone-sequence truncation, and the
standard split / rank-normalise preprocessing.  ``summary`` mirrors the
fields of the reference's ``summary.json`` (mean, sd, ess_bulk, ess_tail,
r_hat).
"""

import numpy as np
from scipy.special import ndtri
from scipy.stats import rankdata

__all__ = ["split_rhat", "ess_bulk", "ess_tail", "summary"]


def _split_chains(x):
    """(chains, draws) -> (2*chains, draws//2), dropping an odd last draw."""
    c, n = x.shape
    n2 = n // 2
    return x[:, : 2 * n2].reshape(c * 2, n2)


def _rank_normalize(x):
    """Fractional ranks over all draws mapped through the normal quantile.

    Ties receive their *average* rank (Vehtari et al. 2021, section 3; arviz
    uses ``scipy.stats.rankdata`` the same way).  Assigning tied values
    sequential ranks in draw order instead injects an artificial within-chain
    monotone ramp: for the binary tail-ESS indicator this manufactured
    near-perfect autocorrelation and pinned ``ess_tail`` at a small constant
    (~340 at 256 chains) independent of the number of draws.
    """
    shape = x.shape
    ranks = rankdata(x.reshape(-1), method="average")
    z = ndtri((ranks - 3.0 / 8) / (ranks.size + 1.0 / 4))
    return z.reshape(shape)


def _rhat_raw(x):
    """Potential scale reduction on already-split, already-normalised draws."""
    c, n = x.shape
    chain_means = x.mean(axis=1)
    chain_vars = x.var(axis=1, ddof=1)
    between = n * chain_means.var(ddof=1)
    within = chain_vars.mean()
    var_plus = (n - 1) / n * within + between / n
    if within == 0:
        return np.inf
    return float(np.sqrt(var_plus / within))


def split_rhat(x):
    """Rank-normalised split-R-hat of a (chains, draws) array."""
    x = np.asarray(x, dtype=np.float64)
    if x.ndim == 1:
        x = x[None]
    split = _split_chains(x)
    if split.shape[1] < 2 or np.ptp(split) == 0:
        return np.nan
    return _rhat_raw(_rank_normalize(split))


def _autocovariance(x):
    """Per-chain autocovariance via FFT, shape (chains, draws)."""
    c, n = x.shape
    x = x - x.mean(axis=1, keepdims=True)
    size = 2 ** int(np.ceil(np.log2(2 * n)))
    f = np.fft.rfft(x, size, axis=1)
    acov = np.fft.irfft(f * np.conj(f), size, axis=1)[:, :n].real
    return acov / n


def _ess_raw(x):
    """Effective sample size of split (already preprocessed) draws.

    Combined-chain autocorrelation (BDA3 eq. 11.7) with Geyer's initial
    positive + monotone sequence truncation.
    """
    c, n = x.shape
    if n < 4 or np.ptp(x) == 0:
        return np.nan
    acov = _autocovariance(x)
    chain_means = x.mean(axis=1)
    mean_var = acov[:, 0].mean() * n / (n - 1)
    var_plus = mean_var * (n - 1) / n
    if c > 1:
        var_plus += chain_means.var(ddof=1)
    if var_plus == 0:
        return np.nan

    rho = 1.0 - (mean_var - acov.mean(axis=0)) / var_plus  # rho[0] = 1
    # Geyer pair sums: P_k = rho[2k] + rho[2k+1]; keep while positive, then
    # enforce monotone non-increase.
    max_pairs = (n - 1) // 2
    pair_sums = rho[: 2 * max_pairs].reshape(max_pairs, 2).sum(axis=1)
    positive = pair_sums > 0
    if not positive[0]:
        k_stop = 0
    else:
        nonpos = np.nonzero(~positive)[0]
        k_stop = int(nonpos[0]) if nonpos.size else max_pairs
    if k_stop == 0:
        tau = 1.0
    else:
        kept = np.minimum.accumulate(pair_sums[:k_stop])
        tau = -1.0 + 2.0 * np.sum(kept)
        tau = max(tau, 1.0 / np.log10(n + 1) if n > 1 else 1.0)
    ess = c * n / tau
    return float(min(ess, c * n * np.log10(c * n)))


def ess_bulk(x):
    """Bulk effective sample size (rank-normalised split draws)."""
    x = np.asarray(x, dtype=np.float64)
    if x.ndim == 1:
        x = x[None]
    split = _split_chains(x)
    if split.shape[1] < 4:
        return np.nan
    return _ess_raw(_rank_normalize(split))


def ess_tail(x):
    """Tail effective sample size: min ESS of the 5%/95% indicator draws."""
    x = np.asarray(x, dtype=np.float64)
    if x.ndim == 1:
        x = x[None]
    split = _split_chains(x)
    if split.shape[1] < 4:
        return np.nan
    out = []
    for q in (0.05, 0.95):
        indicator = (split <= np.quantile(split, q)).astype(np.float64)
        out.append(_ess_raw(_rank_normalize(indicator)))
    return float(np.nanmin(out))


def summary(traces, var_names=None):
    """Per-variable summary dict in the reference's ``summary.json`` layout.

    Args:
        traces: dict of name -> array with leading axes (chains, draws) and
            optional trailing component axes (flattened into ``name[i]``).
        var_names: optional subset of names to summarise.

    Returns a dict of column -> {row_label: value} matching the pandas
    ``to_dict`` orientation the reference serialises
    (``scripts/utils.py:369-371``).
    """
    names = var_names if var_names is not None else list(traces.keys())
    cols = {
        "mean": {},
        "sd": {},
        "ess_bulk": {},
        "ess_tail": {},
        "r_hat": {},
    }
    for name in names:
        arr = np.asarray(traces[name], dtype=np.float64)
        if arr.ndim == 2:
            components = {name: arr}
        else:
            flat = arr.reshape(arr.shape[0], arr.shape[1], -1)
            components = {
                f"{name}[{i}]": flat[:, :, i] for i in range(flat.shape[2])
            }
        for label, x in components.items():
            cols["mean"][label] = float(x.mean())
            cols["sd"][label] = float(x.std(ddof=1))
            cols["ess_bulk"][label] = ess_bulk(x)
            cols["ess_tail"][label] = ess_tail(x)
            cols["r_hat"][label] = split_rhat(x)
    return cols
