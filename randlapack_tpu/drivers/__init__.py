"""User-facing drivers (reference: RandLAPACK/drivers/)."""
from .rsvd import RSVDConfig, rsvd, rsvd_fixed_rank

__all__ = ["RSVDConfig", "rsvd", "rsvd_fixed_rank"]
