"""Matrix-free linear operators in TT-matrix (t3f-style) and CP-matrix format.

Behavioral reference: /root/reference/tntorch/matrix.py:12-468, with two
reference defects fixed per the survey:
- `_check_kron_properties` raised when input/output dims *were* equal
  (matrix.py:221-225); the check is inverted here.
- `cholesky` appended to the wrong list (matrix.py:334).

The matmul chains in `tt_multiply`/`cp_multiply` are sequences of batched
einsums: under jit they lower to MXU-shaped dot-generals.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

import tntorch_tpu as tn
from tntorch_tpu.utils import asarray
from tntorch_tpu.utils import policy_precision as _policy_precision


class TTMatrix:
    """Stores an I x O matrix as d TT cores of shape r_{j-1} x i_j x o_j x r_j
    (reference matrix.py:12-111)."""

    def __init__(self, t, ranks, input_dims, output_dims):
        assert len(input_dims) == len(output_dims)
        assert len(input_dims) > 0

        self.input_dims = np.asarray(input_dims)
        self.output_dims = np.asarray(output_dims)
        self.d = len(input_dims)

        if isinstance(t, list):
            core_dims = t[0].ndim
            assert core_dims in [4, 5]
            self.batch = core_dims == 5  # b x r_{i-1} x in_i x out_i x r_i
            self.cores = [asarray(c) for c in t]
            self.ranks = np.array([c.shape[-1] for c in self.cores[:-1]])
            return

        assert isinstance(ranks, list) and len(ranks) == len(input_dims) - 1
        M = asarray(t)
        assert M.ndim in [2, 3]
        self.batch = M.ndim == 3
        assert int(np.prod(self.input_dims)) == M.shape[-2]
        assert int(np.prod(self.output_dims)) == M.shape[-1]

        # Interleaved reshape: (i_0, o_0), ..., (i_{d-1}, o_{d-1})
        if self.batch:
            tensor = M.reshape([-1] + list(input_dims) + list(output_dims))
            dims = list(range(1, 2 * self.d + 1))
            new_dims = [0] + [d for pair in zip(dims[: self.d], dims[self.d:]) for d in pair]
        else:
            tensor = M.reshape(list(input_dims) + list(output_dims))
            dims = list(range(2 * self.d))
            new_dims = [d for pair in zip(dims[: self.d], dims[self.d:]) for d in pair]
        tensor = jnp.transpose(tensor, new_dims)
        lead = [-1] if self.batch else []
        tensor = tensor.reshape(lead + [input_dims[i] * output_dims[i] for i in range(self.d)])
        tt = tn.Tensor(tensor, ranks_tt=ranks, batch=self.batch)
        self.ranks = tt.ranks_tt[1:-1]

        self.cores = [
            (
                core.reshape(-1, core.shape[1], input_dims[i], output_dims[i], core.shape[-1])
                if self.batch
                else core.reshape(core.shape[0], input_dims[i], output_dims[i], core.shape[-1])
            )
            for i, core in enumerate(tt.cores)
        ]

    def full(self) -> jax.Array:
        """Decompress to a dense (batch of) matrix (reference `torch()`, matrix.py:113-151)."""
        tensor = self.flatten().full()
        rows = int(np.prod(self.input_dims))
        cols = int(np.prod(self.output_dims))
        shape = [d for pair in zip(self.input_dims, self.output_dims) for d in pair]
        if self.batch:
            tensor = tensor.reshape([-1] + shape)
            dims = list(range(1, 2 * self.d + 1))
            tensor = jnp.transpose(tensor, [0] + dims[0::2] + dims[1::2])
            return tensor.reshape(-1, rows, cols)
        tensor = tensor.reshape(shape)
        dims = list(range(2 * self.d))
        tensor = jnp.transpose(tensor, dims[0::2] + dims[1::2])
        return tensor.reshape(rows, cols)

    def torch(self):
        import torch

        return torch.from_numpy(np.asarray(self.full()))

    def numpy(self):
        return np.asarray(self.full())

    def to(self, device):
        self.cores = [jax.device_put(c, device) for c in self.cores]
        return self

    def trace(self):
        """Trace via the diagonal contraction chain (reference matrix.py:160-176)."""
        if self.batch:
            b = self.cores[0].shape[0]
            factor = jnp.ones((b, 1), dtype=self.cores[0].dtype)
            eq = "bi,biaaj->bj"
        else:
            factor = jnp.ones(1, dtype=self.cores[0].dtype)
            eq = "i,iaaj->j"
        for c in self.cores:
            factor = jnp.einsum(eq, factor, c)
        return factor[..., 0]

    def flatten(self):
        """Group each core's (input, output) into one spatial dim -> tn.Tensor
        (reference matrix.py:178-201)."""
        return tn.Tensor(
            [
                (
                    c.reshape(-1, c.shape[1], self.input_dims[i] * self.output_dims[i], c.shape[-1])
                    if self.batch
                    else c.reshape(c.shape[0], -1, c.shape[-1])
                )
                for i, c in enumerate(self.cores)
            ],
            batch=self.batch,
        )

    def _is_kron(self):
        # d == 1 has no interior ranks and is trivially a Kronecker product
        return len(self.ranks) == 0 or max(self.ranks) == 1

    def _check_kron_properties(self):
        if not self._is_kron():
            raise ValueError("The argument should be a Kronecker product (tt-ranks should be 1)")
        if not np.array_equal(self.input_dims, self.output_dims):
            raise ValueError(
                "The argument should be a Kronecker product of square matrices (tt-cores must be square)"
            )

    def _kron_blocks(self):
        for core_idx in range(self.d):
            if self.batch:
                yield core_idx, self.cores[core_idx][:, 0, :, :, 0]
            else:
                yield core_idx, self.cores[core_idx][0, :, :, 0]

    def determinant(self):
        """det of a Kronecker-factorized matrix (reference matrix.py:227-254)."""
        self._check_kron_properties()
        rows = int(np.prod(self.input_dims))
        det = 1.0
        for core_idx, block in self._kron_blocks():
            core_det = jnp.linalg.det(block)
            core_pow = rows / int(self.input_dims[core_idx])
            det = det * core_det**core_pow
        return det

    def slog_determinant(self):
        """(sign, logdet) of a Kronecker-factorized matrix (reference matrix.py:256-286)."""
        self._check_kron_properties()
        rows = int(np.prod(self.input_dims))
        logdet = 0.0
        det_sign = 1.0
        for core_idx, block in self._kron_blocks():
            core_det = jnp.linalg.det(block)
            core_pow = rows / int(self.input_dims[core_idx])
            logdet = logdet + jnp.log(jnp.abs(core_det)) * core_pow
            det_sign = det_sign * jnp.sign(core_det) ** core_pow
        return det_sign, logdet

    def inv(self):
        """Inverse of a Kronecker-factorized matrix (reference matrix.py:288-311)."""
        self._check_kron_properties()
        inv_cores = []
        for core_idx, block in self._kron_blocks():
            core_inv = jnp.linalg.inv(block)
            core_inv = core_inv[:, None] if self.batch else core_inv[None]
            inv_cores.append(core_inv[..., None])
        return TTMatrix(inv_cores, None, list(self.input_dims), list(self.output_dims))

    def cholesky(self):
        """Cholesky of a Kronecker-factorized SPD matrix (reference matrix.py:313-337;
        fixed: the reference appends to the wrong list)."""
        self._check_kron_properties()
        blocks = [b for _, b in self._kron_blocks()]
        if not self.batch:
            # TT scale/sign ambiguity can leave individual Kronecker blocks
            # negative-definite even when the full matrix is SPD; flip signs
            # pairwise (the product of flips must stay +1).
            negs = [i for i, b in enumerate(blocks) if float(jnp.trace(b)) < 0]
            if len(negs) % 2 == 0:
                for i in negs:
                    blocks[i] = -blocks[i]
            else:
                # An odd number of negative blocks means the full Kronecker
                # product is not SPD — jnp.linalg.cholesky would silently
                # return NaN factors (torch raises here; match that)
                raise ValueError(
                    "cholesky requires an SPD matrix: an odd number of "
                    "Kronecker blocks have negative trace"
                )
        cho_cores = []
        for block in blocks:
            core_cho = jnp.linalg.cholesky(block)
            core_cho = core_cho[:, None] if self.batch else core_cho[None]
            cho_cores.append(core_cho[..., None])
        return TTMatrix(cho_cores, None, list(self.input_dims), list(self.output_dims))


class CPMatrix:
    """Stores an I x O matrix as d CP cores of shape i_j x o_j x R
    (reference matrix.py:340-417)."""

    def __init__(self, M, rank, input_dims, output_dims, batch_size: int = 1, verbose: bool = False):
        assert len(input_dims) == len(output_dims)
        assert len(input_dims) > 0
        assert isinstance(rank, int)
        M = asarray(M)
        assert M.ndim == 2

        self.rank = rank
        self.input_dims = np.asarray(input_dims)
        self.output_dims = np.asarray(output_dims)
        self.batch_size = batch_size
        assert int(np.prod(self.input_dims)) == M.shape[0]
        assert int(np.prod(self.output_dims)) == M.shape[1]

        self.d = len(input_dims)
        tensor = M.reshape(list(input_dims) + list(output_dims))
        dims = list(range(2 * self.d))
        new_dims = [d for pair in zip(dims[: self.d], dims[self.d:]) for d in pair]
        tensor = jnp.transpose(tensor, new_dims)
        tensor = tensor.reshape([input_dims[i] * output_dims[i] for i in range(self.d)])
        cp = tn.Tensor(tensor, ranks_cp=rank, verbose=verbose)

        self.cores = [
            core.reshape(input_dims[i], output_dims[i], core.shape[-1])
            for i, core in enumerate(cp.cores)
        ]

    def full(self) -> jax.Array:
        cores = [core.reshape(-1, core.shape[-1]) for core in self.cores]
        tensor = tn.Tensor(cores).full()
        input_size = int(np.prod(self.input_dims))
        output_size = int(np.prod(self.output_dims))
        shape = [d for pair in zip(self.input_dims, self.output_dims) for d in pair]
        tensor = tensor.reshape(shape)
        dims = list(range(2 * self.d))
        tensor = jnp.transpose(tensor, dims[0::2] + dims[1::2])
        return tensor.reshape(input_size, output_size)

    def torch(self):
        import torch

        return torch.from_numpy(np.asarray(self.full()))

    def numpy(self):
        return np.asarray(self.full())

    def to(self, device):
        self.cores = [jax.device_put(c, device) for c in self.cores]
        return self


@_policy_precision
def tt_multiply(tt_matrix: TTMatrix, tensor) -> jax.Array:
    """Multiply a TTMatrix with a (batched) tensor: returns b x O
    (reference matrix.py:420-443)."""
    tensor = asarray(tensor)
    assert tensor.ndim > 1
    rows = int(np.prod(tt_matrix.input_dims))
    b = tensor.reshape(-1, rows).shape[0]
    tensor = tensor.reshape(b, -1).T
    result = tensor.reshape(int(tt_matrix.input_dims[0]), -1)
    result = jnp.einsum("id,lior->ldor", result, tt_matrix.cores[0])
    for d in range(1, tt_matrix.d):
        result = result.reshape(int(tt_matrix.input_dims[d]), -1, tt_matrix.cores[d].shape[0])
        result = jnp.einsum("idr,riob->dob", result, tt_matrix.cores[d])
    return result.reshape(b, -1)


@_policy_precision
def cp_multiply(cp_matrix: CPMatrix, tensor) -> jax.Array:
    """Multiply a CPMatrix with a (batched) tensor (reference matrix.py:446-468)."""
    tensor = asarray(tensor)
    assert tensor.ndim > 1
    rows = int(np.prod(cp_matrix.input_dims))
    b = tensor.reshape(-1, rows).shape[0]
    tensor = tensor.reshape(b, -1).T
    result = tensor.reshape(int(cp_matrix.input_dims[0]), -1)
    result = jnp.einsum("ij,ior->jor", result, cp_matrix.cores[0])
    for d in range(1, cp_matrix.d):
        result = result.reshape(int(cp_matrix.input_dims[d]), -1, cp_matrix.cores[d].shape[-1])
        result = jnp.einsum("ior,idr->dor", cp_matrix.cores[d], result)
    result = result.sum(-1)
    return result.reshape(b, -1)
