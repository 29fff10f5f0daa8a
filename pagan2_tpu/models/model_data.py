"""Published substitution-model matrices loaded from bundled data files.

wag.npz — WAG amino-acid exchangeability (Whelan & Goldman 2001) pi + Q,
ecm.npz — Kosiol & Goldman empirical codon model (ECM) pi + Q,
both as used by the reference (model_factory.cpp:374-395, :900-962).
"""
from __future__ import annotations

import functools
import os

import numpy as np

_DATA_DIR = os.path.join(os.path.dirname(__file__), "data")


@functools.lru_cache(maxsize=None)
def wag_matrices() -> tuple[np.ndarray, np.ndarray]:
    d = np.load(os.path.join(_DATA_DIR, "wag.npz"))
    return d["pi"], d["q"]


@functools.lru_cache(maxsize=None)
def ecm_matrices() -> tuple[np.ndarray, np.ndarray]:
    d = np.load(os.path.join(_DATA_DIR, "ecm.npz"))
    return d["pi"], d["q"]


def hky_q(pi: np.ndarray, kappa: float = 2.0, rho: float = 1.0) -> np.ndarray:
    """HKY-type DNA rate matrix from empirical base frequencies
    (reference: model_factory.cpp:1344-1447). Base order ACGT."""
    pi = np.asarray(pi, dtype=np.float64)
    ka = kappa / 2.0
    piR = pi[0] + pi[2]
    piY = pi[1] + pi[3]
    beta = 1.0 / (2.0 * piR * piY * (1.0 + ka))
    alfaY = (piR * piY * ka - pi[0] * pi[2] - pi[1] * pi[3]) / (
        (2.0 + 2.0 * ka) * (piY * pi[0] * pi[2] * rho + piR * pi[1] * pi[3]))
    alfaR = rho * alfaY

    q = np.zeros((4, 4), dtype=np.float64)
    q[0, 1] = beta * pi[1]
    q[0, 2] = alfaR * pi[2] / piR + beta * pi[2]
    q[0, 3] = beta * pi[3]
    q[1, 0] = beta * pi[0]
    q[1, 2] = beta * pi[2]
    q[1, 3] = alfaY * pi[3] / piY + beta * pi[3]
    q[2, 0] = alfaR * pi[0] / piR + beta * pi[0]
    q[2, 1] = beta * pi[1]
    q[2, 3] = beta * pi[3]
    q[3, 0] = beta * pi[0]
    q[3, 1] = alfaY * pi[1] / piY + beta * pi[1]
    q[3, 2] = beta * pi[2]
    np.fill_diagonal(q, 0.0)
    np.fill_diagonal(q, -q.sum(axis=1))
    return q
