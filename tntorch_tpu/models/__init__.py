"""Model families: matrix-free linear operators in TT/CP format, PCE surrogates,
and supervised TT-Tucker learners."""

from tntorch_tpu.models.matrix import TTMatrix, CPMatrix, tt_multiply, cp_multiply
from tntorch_tpu.models.learners import TTRegressor, TTClassifier
