"""Dense kernel toolbox: CholQR family, QR kernels, matrix utilities."""
from .cholqr import (cholqr, cholqr2, cholqr_auto,
                     preconditioned_cholqr, shifted_cholqr3)
from .qr import geqp3, lu_pivot_columns, qr_econ
from .trsm import trsm_right_upper_blockinv
from . import util

__all__ = [
    "cholqr", "cholqr2", "cholqr_auto", "preconditioned_cholqr",
    "shifted_cholqr3",
    "geqp3", "lu_pivot_columns", "qr_econ", "util",
]
