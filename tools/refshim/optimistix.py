"""Shim for the reference's optimistix usage: a Newton root-finder object is
constructed (SR_evaluator.py:71) but never used (the Event's root_finder
argument is commented out), so inert stand-ins suffice."""
from __future__ import annotations

import jax.numpy as jnp


def rms_norm(x):
    return jnp.sqrt(jnp.mean(jnp.square(x)))


class Newton:
    def __init__(self, rtol=None, atol=None, norm=None):
        self.rtol, self.atol, self.norm = rtol, atol, norm
