"""Straight-line numpy transcription of the reference CAPE forward pass.

TEST-ONLY ORACLE. This module implements the reference network math *as
written* in /root/reference/lib/models.py — flat [Fin*K, Fout] Chebyshev
filterbanks, materialized per-vertex condition concat before every layer,
the reference's chebyshev5/poolwT tensor shufflings, reference wiring and
scope-relative variable names — so the production JAX model can be
asserted equal to the reference graph on shared (converted) weights
without TensorFlow.

Transcribed sections (reference file:line):
  laplacian / rescale_L          lib/mesh_sampling.py:10-38
  chebyshev5                     lib/models.py:69-103
  b1leakyrelu / b1relu / b1tanh  lib/models.py:105-121
  poolwT                         lib/models.py:129-152
  cnp / udn                      lib/models.py:154-191
  condition nets                 lib/models.py:479-511
  encoder                        lib/models.py:514-561
  decoder_cond_vert              lib/models.py:564-617
  discriminator / cnp_d          lib/models.py:648-678, 796-810
  gn (group norm)                lib/models.py:681-712
  res_block                      lib/models.py:715-741
  res_block_decoder (CMR)        lib/models.py:744-774
  res_block_affine               lib/models.py:776-793
  fit_cond_dim + concat          lib/models.py:813-832

Parameters come in as a reference-named variable dict (the exact names a
TF Saver checkpoint would hold), i.e. the output of
cape_tpu.tools.tf_ckpt_converter.synthesize_reference_vars — or, on
artifact-landing day, read_tf_checkpoint on a published checkpoint.

Everything is float64-free, float32 numpy to mirror the TF graph dtypes.
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp

LEAKY_SLOPE = 0.2  # tf.nn.leaky_relu default alpha


# --------------------------------------------------------------- mesh algebra
def laplacian(W: sp.spmatrix) -> sp.csr_matrix:
    """Normalized graph Laplacian (lib/mesh_sampling.py:10-29)."""
    W = sp.csr_matrix(W)
    d = np.asarray(W.sum(axis=0)).squeeze().astype(np.float64)
    d = d + np.spacing(np.array(0, dtype=np.float64))
    dinv = 1.0 / np.sqrt(d)
    D = sp.diags(dinv, 0)
    I = sp.identity(d.size, dtype=W.dtype)
    return sp.csr_matrix(I - D @ W @ D)


def rescale_L(L: sp.spmatrix, lmax: float = 2.0) -> sp.csr_matrix:
    """Eigenvalue rescale to [-1, 1] (lib/mesh_sampling.py:31-38)."""
    L = sp.csr_matrix(L, dtype=np.float64)
    M = L.shape[0]
    return sp.csr_matrix(L / (lmax / 2.0) - sp.identity(M, format="csr", dtype=L.dtype))


def scaled_laplacians(adjacencies) -> list[sp.csr_matrix]:
    """What the reference feeds chebyshev5: rescale_L(laplacian(A))
    (lib/models.py:74-75, main.py:44)."""
    return [rescale_L(laplacian(a)) for a in adjacencies]


# ------------------------------------------------------------------- core ops
def leaky_relu(x):
    return np.where(x >= 0, x, LEAKY_SLOPE * x).astype(x.dtype)


def relu(x):
    return np.maximum(x, 0)


def chebyshev5(x: np.ndarray, L_scaled: sp.spmatrix, W_flat: np.ndarray, K: int) -> np.ndarray:
    """K-order Chebyshev filter, the reference's exact tensor choreography
    (lib/models.py:69-103): basis stack [K, M, Fin*N] -> transpose to
    [N*M, Fin*K] (row index fin*K + k) -> one dense matmul."""
    N, M, Fin = x.shape
    x0 = np.ascontiguousarray(x.transpose(1, 2, 0)).reshape(M, Fin * N)  # :81-82
    xs = [x0]
    if K > 1:
        x1 = L_scaled @ x0                                               # :91
        xs.append(np.asarray(x1))
    for _ in range(2, K):
        x2 = 2.0 * (L_scaled @ xs[-1]) - xs[-2]                          # :94
        xs.append(np.asarray(x2))
    xk = np.stack(xs, axis=0).reshape(K, M, Fin, N)                      # :97
    xk = xk.transpose(3, 1, 2, 0).reshape(N * M, Fin * K)                # :98-99
    y = xk.astype(np.float32) @ np.asarray(W_flat, np.float32)           # :102
    return y.reshape(N, M, -1)                                           # :103


def poolwT(x: np.ndarray, T: sp.spmatrix) -> np.ndarray:
    """Pool/unpool by a precomputed transform matrix (lib/models.py:129-152)."""
    N, M, Fin = x.shape
    Mp = T.shape[0]
    xf = np.ascontiguousarray(x.transpose(1, 2, 0)).reshape(M, Fin * N)
    y = np.asarray(T @ xf).reshape(Mp, Fin, N)
    return np.ascontiguousarray(y.transpose(2, 0, 1)).astype(np.float32)


def fit_cond_dim(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """[B, C] -> [B, V, C] per-vertex broadcast (lib/models.py:813-832)."""
    B, V, _ = x.shape
    return np.broadcast_to(y[:, None, :], (B, V, y.shape[-1])).astype(np.float32)


def concat_cond(x, y, y2):
    """tf.concat([x, y_expanded, y2_expanded], -1) — the wiring order used
    at every condition site (lib/models.py:535, 593, 608, 665)."""
    return np.concatenate([x, fit_cond_dim(x, y), fit_cond_dim(x, y2)], axis=-1)


def dense(v: dict, scope: str, x: np.ndarray, activation=None) -> np.ndarray:
    """tf.layers.dense: x @ kernel + bias."""
    y = x @ np.asarray(v[f"{scope}/dense/kernel"], np.float32) + np.asarray(
        v[f"{scope}/dense/bias"], np.float32
    )
    return activation(y) if activation is not None else y


def gn(x: np.ndarray, gamma: np.ndarray, beta: np.ndarray, G: int = 32, eps: float = 1e-5):
    """Group norm, GraphCMR channels-first form (lib/models.py:693-709)."""
    x = x.transpose(0, 2, 1)                      # [B, C, V]
    B, C, V = x.shape
    G = min(G, C)
    xg = x.reshape(-1, G, C // G, V)
    mean = xg.mean(axis=(2, 3), keepdims=True)
    var = xg.var(axis=(2, 3), keepdims=True)
    xg = (xg - mean) / np.sqrt(var + eps)
    out = xg.reshape(-1, C, V) * np.asarray(gamma, np.float32).reshape(1, C, 1)
    out = out + np.asarray(beta, np.float32).reshape(1, C, 1)
    return out.transpose(0, 2, 1)


# ------------------------------------------------------------------ the model
class ReferenceCAPE:
    """The reference forward pass, wired exactly as lib/models.py builds it.

    Args mirror what CAPE.__init__ + build_graph derive from the config
    (lib/models.py:230-264, main.py:50-84):
      v: reference-named variable dict
      adjacencies / downsamples / upsamples: VAE pyramid (scipy)
      adjacencies_d / downsamples_d: discriminator (ds2) pyramid
      out_channels: F plan; K / Kd: poly orders; the rest as named.
    """

    def __init__(
        self,
        v: dict,
        adjacencies,
        downsamples,
        upsamples,
        adjacencies_d,
        downsamples_d,
        out_channels,
        K: int,
        Kd: int,
        nz: int,
        nz_cond: int,
        nz_cond2: int,
        n_layer_cond: int = 1,
        use_res_block: bool = False,
        use_res_block_dec: bool = True,
        affine: bool = False,
        cond_encoder: bool = True,
        reduce_dim: int = 0,
        nn_input_channel: int = 3,
        activation: str = "b1leakyrelu",
    ):
        self.v = v
        self.L = scaled_laplacians(adjacencies)
        self.D = [sp.csr_matrix(d) for d in downsamples]
        self.U = [sp.csr_matrix(u) for u in upsamples]
        self.L_d = scaled_laplacians(adjacencies_d)
        self.D_d = [sp.csr_matrix(d) for d in downsamples_d]
        self.F = list(out_channels)
        self.K, self.Kd = K, Kd
        self.poly_order = [K] * len(self.F)
        self.poly_order_d = [Kd] * len(self.F)
        self.nz, self.nz_cond, self.nz_cond2 = nz, nz_cond, nz_cond2
        self.n_layer_cond = n_layer_cond
        self.use_res_block = use_res_block
        self.use_res_block_dec = use_res_block_dec
        self.affine = affine
        self.cond_encoder = cond_encoder
        self.reduce_dim = reduce_dim
        self.reduce_rate = self.F[-1] // reduce_dim if reduce_dim > 0 else 1
        self.nn_input_channel = nn_input_channel
        self.p = [L.shape[0] for L in self.L]     # per-level vertex counts
        self.brelu = {"b1leakyrelu": leaky_relu, "b1relu": relu, "b1tanh": np.tanh}[
            activation
        ]

    # ------------------------------------------------------------ primitives
    def filter(self, x, L_scaled, scope: str, K: int):
        return chebyshev5(x, L_scaled, self.v[f"{scope}/weights"], K)

    def bias_act(self, x, scope: str):
        """brelu with the per-filter [1,1,F] bias variable (lib/models.py:105-109)."""
        return self.brelu(x + np.asarray(self.v[f"{scope}/bias"], np.float32))

    # ------------------------------------------------------- condition nets
    def condition(self, y, name: str, nz_cond: int, nlayers: int):
        """lib/models.py:479-511 incl. the 2-layer hidden-width heuristic."""
        scope = f"condition_{name}"
        y = np.asarray(y, np.float32)
        if nlayers == 1:
            return dense(self.v, f"{scope}/fc1", y)
        y = dense(self.v, f"{scope}/fc1", y, activation=leaky_relu)
        return dense(self.v, f"{scope}/fc2", y)

    def embed_conditions(self, pose, clo):
        """build_graph's condition-net applications (lib/models.py:284-290):
        pose always 2-layer, clothing-type n_layer_cond layers."""
        y = self.condition(pose, "pose", self.nz_cond, nlayers=2)
        y2 = self.condition(clo, "clo_label", self.nz_cond2, nlayers=self.n_layer_cond)
        return y, y2

    # ------------------------------------------------------- encoder blocks
    def cnp(self, x, i, scope):
        """conv -> bias+act -> pool (lib/models.py:154-171)."""
        x = self.filter(x, self.L[i], scope, self.poly_order[i])
        x = self.brelu(x + np.asarray(self.v[f"{scope}/bias"], np.float32))
        return poolwT(x, self.D[i])

    def res_block(self, x_in, i, scope):
        """encoder residual block (lib/models.py:715-741)."""
        x = self.filter(x_in, self.L[i], f"{scope}/filter_1", self.poly_order[i])
        x = self.bias_act(x, f"{scope}/bias_relu_1")
        x = self.filter(x, self.L[i], f"{scope}/filter_2", self.poly_order[i])
        if x_in.shape[-1] != x.shape[-1]:
            x_in = self.filter(x_in, self.L[i], f"{scope}/1x1-conv", 1)
        x = x + x_in                                                    # :732
        x = self.bias_act(x, f"{scope}/bias_relu_2")
        return poolwT(x, self.D[i])

    # ------------------------------------------------------- decoder blocks
    def udn(self, x, i, scope):
        """unpool -> conv -> bias+act (lib/models.py:173-191)."""
        x = poolwT(x, self.U[-i - 1])
        x = self.filter(x, self.L[-i - 2], scope, self.poly_order[-i - 1])
        return self.brelu(x + np.asarray(self.v[f"{scope}/bias"], np.float32))

    def res_block_decoder(self, x_in, i, scope):
        """CMR group-norm decoder residual block (lib/models.py:744-774)."""
        v = self.v
        xu = poolwT(x_in, self.U[-i - 1])
        x = gn(xu, v[f"{scope}/group_norm/gamma"], v[f"{scope}/group_norm/beta"])
        x = relu(x)
        x = self.filter(x, self.L[-i - 2], f"{scope}/graph_linear_1", 1)
        x = gn(x, v[f"{scope}/group_norm_1/gamma"], v[f"{scope}/group_norm_1/beta"])
        x = relu(x)
        x = self.filter(x, self.L[-i - 2], f"{scope}/graph_conv", self.poly_order[-i - 1])
        x = gn(x, v[f"{scope}/group_norm_2/gamma"], v[f"{scope}/group_norm_2/beta"])
        x = relu(x)
        x = self.filter(x, self.L[-i - 2], f"{scope}/graph_linear_2", 1)
        if xu.shape[-1] != x.shape[-1]:
            xu = self.filter(xu, self.L[-i - 2], f"{scope}/graph_linear_input", 1)
        return x + xu

    def res_block_affine(self, x, i, scope):
        """affine decoder residual block (lib/models.py:776-793)."""
        x = poolwT(x, self.U[-i - 1])
        x_gc = self.filter(x, self.L[-i - 2], f"{scope}/graph_conv", self.poly_order[-i - 1])
        x_gc = relu(x_gc)
        x_affine = self.filter(x, self.L[-i - 2], f"{scope}/affine", 1)
        return x_affine + x_gc

    # ----------------------------------------------------------- full paths
    def encoder(self, x, y, y2):
        """lib/models.py:514-561."""
        x = np.asarray(x, np.float32)
        if self.cond_encoder:                                           # :532-536
            x = concat_cond(x, y, y2)
        for i in range(len(self.F)):                                    # :541-545
            if self.use_res_block:
                x = self.res_block(x, i, f"generator/encoder/encoder_resblock{i + 1}")
            else:
                x = self.cnp(x, i, f"generator/encoder/encoder_conv{i + 1}")
        if self.reduce_dim > 0:                                         # :549-552
            x = self.filter(x, self.L[-1], "generator/encoder/1x1-conv", 1)
        x = x.reshape(x.shape[0], -1)                                   # :554
        z_mean = dense(self.v, "generator/encoder/fc_mean", x)          # :555-557
        z_var = dense(self.v, "generator/encoder/fc_var", x)            # :558-560
        return z_mean, z_var

    def decoder_cond_vert(self, z_total, y, y2):
        """lib/models.py:564-617."""
        x = dense(
            self.v, "generator/decoder/fc1", np.asarray(z_total, np.float32),
            activation=leaky_relu,
        )                                                               # :579-583
        x = x.reshape(x.shape[0], self.p[-1], -1)                       # :584
        if self.reduce_dim > 0:                                         # :585-589
            x = self.filter(x, self.L[-1], "generator/decoder/1x1-conv", 1)
        x = concat_cond(x, y, y2)                                       # :591-594
        for i in range(len(self.F)):                                    # :596-609
            if self.use_res_block_dec:
                if not self.affine:
                    x = self.res_block_decoder(
                        x, i, f"generator/decoder/decoder_resblock_cmr{i + 1}"
                    )
                else:
                    x = self.res_block_affine(
                        x, i, f"generator/decoder/decoder_resblock_affine{i + 1}"
                    )
            else:
                x = self.udn(x, i, f"generator/decoder/decoder_conv{i + 1}")
            x = concat_cond(x, y, y2)                                   # :605-609
        scope = "generator/decoder/outputs"
        x = self.filter(x, self.L[0], scope, self.poly_order[0])        # :612
        return x + np.asarray(self.v[f"{scope}/bias"], np.float32)      # :615-616

    def discriminator(self, x, y, y2):
        """lib/models.py:648-678 + cnp_d :796-810."""
        x = concat_cond(np.asarray(x, np.float32), y, y2)               # :663-666
        for i in range(len(self.D_d)):                                  # :670-672
            scope = f"discriminator/shared/conv{i + 1}"
            x = self.filter(x, self.L_d[i], scope, self.poly_order_d[i])
            x = self.brelu(x + np.asarray(self.v[f"{scope}/bias"], np.float32))
            x = poolwT(x, self.D_d[i])
        # NOTE the reference quirk: the final pred conv uses poly_order[-1]
        # (the VAE's K), not poly_order_d (lib/models.py:676)
        return self.filter(
            x, self.L_d[-1], "discriminator/prediction_map", self.poly_order[-1]
        )
