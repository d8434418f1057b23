"""tntorch_tpu: a TPU-native (JAX/XLA/Pallas) tensor-network library.

A ground-up rebuild of the capabilities of rballester/tntorch with a flat
`tn.*` namespace (reference /root/reference/tntorch/__init__.py:1-14):
Tensor Train, CP, Tucker and hybrid formats behind one `Tensor` pytree,
with cross-approximation, rounding, autodiff, completion, ANOVA/Sobol,
boolean logic, weighted automata, TT/CP matrices and vector calculus.
"""

from tntorch_tpu import utils
from tntorch_tpu.utils import set_policy, get_policy
from tntorch_tpu.tensor import Tensor
from tntorch_tpu.create import *
from tntorch_tpu.round import *
from tntorch_tpu.tools import *
from tntorch_tpu.metrics import *
from tntorch_tpu.maxvol import maxvol, rect_maxvol, py_maxvol, py_rect_maxvol
from tntorch_tpu.cross import cross, cross_forward, minimum, maximum, argmin, argmax, init_interfaces
from tntorch_tpu.ops import *
from tntorch_tpu.autodiff import optimize, dof
from tntorch_tpu import automata
from tntorch_tpu.automata import weight_mask, weight_one_hot, weight, length, accepted_inputs
from tntorch_tpu.anova import (
    anova_decomposition, undo_anova_decomposition, truncate_anova, sobol,
    mean_dimension, dimension_distribution,
)
from tntorch_tpu.logic import (
    true, false, all, none, any, one, symbols, relevant_symbols,
    irrelevant_symbols, only, presence, absence, is_tautology, is_contradiction,
    is_satisfiable, implies, equiv,
)
from tntorch_tpu.derivatives import (
    partialset, partial, gradient, active_subspace, dgsm, divergence, curl, laplacian,
)
from tntorch_tpu.interpolation import (
    als_completion, sparse_tt_svd, get_bounding_box, features2indices,
    indices2features, empirical_marginals, gram_schmidt, lars_path, PCEInterpolator,
)
from tntorch_tpu.models import TTMatrix, CPMatrix, tt_multiply, cp_multiply
from tntorch_tpu.models import TTRegressor, TTClassifier
from tntorch_tpu.models import matrix
from tntorch_tpu import parallel
from tntorch_tpu.ops.pallas_tt import tt_eval
from tntorch_tpu.ops.rounding import round_tt_fixed, round_tt_gram, tt_full, tt_dot
from tntorch_tpu.serialization import (
    save, load, save_orbax, load_orbax, save_orbax_sharded, load_orbax_sharded,
    save_matrix, load_matrix,
)

__version__ = "0.1.0"
