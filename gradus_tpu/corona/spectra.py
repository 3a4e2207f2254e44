"""Coronal spectra (reference `src/corona/spectra.jl`)."""

from __future__ import annotations

import dataclasses

import jax

__all__ = ["PowerLawSpectrum"]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PowerLawSpectrum:
    """I(g) = g^(-Γ) (Gonzalez et al. 2017 convention; reference
    spectra.jl:10-25)."""

    gamma: float = 2.0

    def __call__(self, g):
        return g ** (-self.gamma)
