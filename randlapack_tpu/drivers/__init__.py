"""User-facing drivers (reference: RandLAPACK/drivers/)."""
from .rsvd import RSVDConfig, rsvd, rsvd_fixed_rank
from .cqrrt import CQRRTConfig, SketchKind, cqrrt
from .cqrrpt import CQRRPTConfig, QRCPKind, cqrrpt
from .bqrrp import BQRRPConfig, QRTall, bqrrp

__all__ = ["RSVDConfig", "rsvd", "rsvd_fixed_rank",
           "CQRRTConfig", "SketchKind", "cqrrt",
           "CQRRPTConfig", "QRCPKind", "cqrrpt",
           "BQRRPConfig", "QRTall", "bqrrp"]
