"""Multi-chip distribution layer (new capability — the reference is strictly
single-device, SURVEY.md section 2).

Tensor networks expose three natural parallel axes on a TPU mesh:

- **dp** (data parallel): the `batch=True` leading dim of every core shards
  across devices with no communication except loss/metric reductions;
- **tp** (tensor parallel): TT-rank axes of large cores shard across devices;
  rank contractions (dot, norm, forward evaluation) then need one psum per
  row-sharded core — laid out so collectives ride ICI;
- **fiber parallel**: cross-approximation's P independent function
  evaluations per sweep shard across devices (embarrassingly parallel).

Everything here follows the standard JAX recipe: build a Mesh, annotate
shardings with NamedSharding/PartitionSpec, jit, and let XLA's SPMD
partitioner insert the collectives.
"""

from tntorch_tpu.parallel.mesh import (
    make_mesh,
    shard_batch,
    shard_ranks,
    replicate,
    sharded_dot,
    sharded_norm,
    tt_batch_forward,
    tt_forward_sharded,
    tt_forward_shard_map,
)
from tntorch_tpu.parallel.algorithms import (
    round_tt_gram_sharded,
    round_tt_batch_sharded,
    shard_array,
    replicate_pytree,
)
