"""Computational building blocks (reference: RandLAPACK/comps/)."""
from .orth import Stab, orth, stabilize
from .rs import RSConfig, rs
from .rf import RFConfig, rf
from .qb import QBConfig, qb, qb_blocked

__all__ = ["Stab", "orth", "stabilize", "RSConfig", "rs", "RFConfig", "rf",
           "QBConfig", "qb", "qb_blocked"]
