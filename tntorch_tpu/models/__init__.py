"""Model families: matrix-free linear operators in TT/CP format, PCE surrogates."""

from tntorch_tpu.models.matrix import TTMatrix, CPMatrix, tt_multiply, cp_multiply
