"""Independent float64 NumPy oracle for the 18 AMC features.

Written as a straightforward per-frame float64 implementation of the
feature definitions (the same math the reference implements at
``/root/reference/src/amcpy/features.py:66-185``), used as the parity
baseline for the fused TPU extractor. Deliberately naive and sequential —
the point is an unambiguous, maximum-precision specification, not speed.
"""

from __future__ import annotations

import numpy as np
from scipy import stats


def moments(x: np.ndarray) -> dict[str, complex]:
    """Mixed moments m_pq = E[x^(p-q) conj(x)^q] for p in {2,4,6}."""
    xc = np.conj(x)
    return {
        "m20": np.mean(x**2),
        "m21": np.mean(x * xc).real,
        "m22": np.mean(xc**2),
        "m40": np.mean(x**4),
        "m41": np.mean(x**3 * xc),
        "m42": np.mean(x**2 * xc**2).real,
        "m43": np.mean(x * xc**3),
        "m60": np.mean(x**6),
        "m61": np.mean(x**5 * xc),
        "m62": np.mean(x**4 * xc**2).real,
        "m63": np.mean(x**3 * xc**3).real,
    }


def features_frame(x: np.ndarray) -> np.ndarray:
    """All 18 features of one complex frame, float64, feature id j+1 at [j]."""
    x = np.asarray(x, dtype=np.complex128)
    n = len(x)
    a = np.abs(x)
    phase = np.angle(x)
    unwrapped = np.unwrap(phase)
    freq = np.diff(unwrapped) / (2 * np.pi)
    cn = a / np.mean(a) - 1.0

    m = moments(x)
    m20, m21, m22 = m["m20"], m["m21"], m["m22"]
    m40, m41, m42, m43 = m["m40"], m["m41"], m["m42"], m["m43"]
    m60, m61, m62, m63 = m["m60"], m["m61"], m["m62"], m["m63"]

    out = np.empty(18, dtype=np.float64)
    out[0] = np.max(np.abs(np.fft.fft(x)) ** 2 / n)
    out[1] = np.std(np.abs(phase), ddof=1)
    out[2] = np.std(phase, ddof=1)
    out[3] = np.std(np.abs(cn), ddof=1)
    out[4] = np.std(freq, ddof=1)
    out[5] = np.mean(a)
    out[6] = np.sqrt(np.sum(a)) / n
    out[7] = stats.kurtosis(cn, fisher=False)
    out[8] = stats.kurtosis(freq, fisher=False)
    out[9] = np.abs(m20)
    out[10] = np.abs(m21)
    out[11] = np.abs(m40 - 3 * m20**2)
    out[12] = np.abs(m41 - 3 * m20 * m21)
    out[13] = np.abs(m42 - np.abs(m20) ** 2 - 2 * m21**2)
    out[14] = np.abs(m60 - 15 * m20 * m40 + 3 * m20**3)
    out[15] = np.abs(m61 - 5 * m21 * m40 - 10 * m20 * m41 + 30 * m20**2 * m21)
    out[16] = np.abs(
        m62
        - 6 * m20 * m42
        - 8 * m21 * m41
        - m22 * m40
        + 6 * m20**2 * m22
        + 24 * m21**2 * m20
    )
    out[17] = np.abs(
        m63
        - 9 * m21 * m42
        + 12 * m21**3
        - 3 * m20 * m43
        - 3 * m22 * m41
        + 18 * m20 * m21 * m22
    )
    return out


def features_batch(frames: np.ndarray) -> np.ndarray:
    """Oracle over a batch: (B, N) complex -> (B, 18) float64."""
    return np.stack([features_frame(f) for f in np.asarray(frames)])


#: Cumulant-term magnitude scales per feature, used to set sensible mixed
#: tolerances: cumulants are differences of moment products, so relative
#: error must be judged against the size of the *terms*, not the (possibly
#: cancelled-to-zero) result.
def term_scales(x: np.ndarray) -> np.ndarray:
    x = np.asarray(x, dtype=np.complex128)
    m = moments(x)
    a = np.abs(x)
    p2 = float(np.mean(a**2))
    s = np.empty(18)
    s[0] = np.sum(a**2)  # Parseval bound on gmax
    s[1] = s[2] = np.pi
    s[3] = 1.0
    s[4] = 0.5
    s[5] = max(float(np.mean(a)), 1e-30)
    s[6] = max(float(np.sqrt(np.sum(a)) / len(x)), 1e-30)
    s[7] = s[8] = 10.0
    s[9] = s[10] = p2
    s[11] = s[12] = s[13] = max(abs(m["m42"]), 3 * abs(m["m20"]) ** 2, p2**2)
    s[14] = s[15] = s[16] = s[17] = max(
        abs(m["m63"]), 15 * abs(m["m20"] * m["m40"]), p2**3
    )
    return s
