"""On-device compute ops for fixed-topology mesh networks.

The reference runs all graph algebra as TF sparse·dense matmuls on GPU
(lib/models.py:91,149). On TPU we exploit the *fixed* sparsity instead:

  * `sparse.EllOp` — fixed-width gather formulation (ELL) of any sparse
    matrix apply; the SMPL pyramid has max degree <= 11, upsample rows
    <= 3 nnz, downsample rows are pure selections.
  * `sparse.DenseOp` — materialized dense matmul path for levels where the
    MXU beats the gather (decided by benchmark, not faith).
  * `cheb` — Chebyshev spectral convolution with the K-recurrence unrolled.
  * `pool` — CoMA pool/unpool as gathers.
  * `norm` — group norm matching the reference's GraphCMR-style layout.
"""

from cape_tpu.ops.sparse import EllOp, DenseOp, IdentityOp, make_op, GraphContext
from cape_tpu.ops.cheb import cheb_conv
from cape_tpu.ops.norm import group_norm
