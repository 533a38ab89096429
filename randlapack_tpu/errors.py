"""Typed errors and precondition checks.

Mirrors the reference's ``RandLAPACK::Error`` + ``randlapack_require`` macro
(reference: RandLAPACK/rl_exceptions.hh:37,97) — host-side validation of
static quantities (shapes, dtypes, flags) raises ``RandLAPACKError``;
value-dependent conditions inside jitted code are reported through returned
status codes instead (jit-compatible, see SURVEY.md §5.3).
"""
from __future__ import annotations


class RandLAPACKError(ValueError):
    """Raised on precondition violations (shape/flag/config errors)."""


def require(cond: bool, msg: str = "") -> None:
    """Host-side analogue of ``randlapack_require(cond) << msg``.

    Only call on static (trace-time) conditions.
    """
    if not cond:
        raise RandLAPACKError(msg)
