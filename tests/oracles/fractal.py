"""NumPy oracle for the box-counting fractal dimension.

Literal loop implementation of fava/mesh/FLASH/FlashUniform.py:85-227:
per-cell interior edge detection (mark the current cell when it sits
below the contour with any 6-neighbor above it — the reference's
truncated-ratio branch always selects the current cell), dyadic box
counts including partial edge boxes, mean log2-ratio dimension and the
covariance-based regression statistics.
"""

from __future__ import annotations

from math import log2
from typing import Dict

import numpy as np


def edge_detect_oracle(data: np.ndarray, contour: float) -> np.ndarray:
    h, w, d = data.shape
    edata = np.zeros((h, w, d), dtype=np.int8)
    edata[data == contour] = 1

    d_start, d_stop = (1, d - 1) if d != 1 else (0, 1)
    for i in range(1, h - 1):
        for j in range(1, w - 1):
            for kk in range(d_start, d_stop):
                val = data[i, j, kk]
                if val >= contour:
                    continue
                neighbors = [data[i + 1, j, kk], data[i - 1, j, kk], data[i, j + 1, kk], data[i, j - 1, kk]]
                if d != 1:
                    neighbors += [data[i, j, kk + 1], data[i, j, kk - 1]]
                if any(nbr > contour for nbr in neighbors):
                    edata[i, j, kk] = 1
    return edata


def fractal_dimension_oracle(data: np.ndarray, contour: float) -> Dict[str, float]:
    h, w, d = data.shape
    edata = edge_detect_oracle(data, contour)

    largest = min(h, w) if d == 1 else min(h, w, d)
    flength = int(log2(largest)) + 1
    result = np.zeros((flength, 2))

    for level in range(flength):
        bdim = 2**level
        bdim_k = 1 if d == 1 else bdim
        nfilled = 0
        for i in range(0, h, bdim):
            for j in range(0, w, bdim):
                for kk in range(0, d, bdim_k):
                    if np.any(edata[i : i + bdim, j : j + bdim, kk : kk + bdim_k] > 0):
                        nfilled += 1
        result[level, 0] = flength - level - 1
        result[level, 1] = np.log2(nfilled) if nfilled else -np.inf

    filled = 2.0 ** result[:, 1]
    avg = np.sum(np.log2(filled[:-1] / filled[1:])) / (filled.size - 1.0)

    mean = result.mean(axis=0)
    std = result.std(axis=0)
    rval = np.sum((result[:, 0] - mean[0]) * (result[:, 1] - mean[1])) / (np.prod(std) * result.shape[0])
    slope = rval * std[1] / std[0]
    return {
        "average fractal dimension": float(avg),
        "slope": float(slope),
        "R2": float(rval**2),
        "curve": float(mean[1] - slope * mean[0]),
    }
