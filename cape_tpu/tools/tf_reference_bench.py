"""Measured same-silicon reference baseline (VERDICT r4 #5).

BENCH_r01..r04's `vs_baseline` divides a measured cape_tpu step rate by
an ESTIMATED reference TF-GPU rate (BASELINE.md). TensorFlow 2.x is
installed on this host, so one real measured ratio can sit next to that
estimate: this tool builds the reference's training graph — the same
semantics `lib/models.py` builds in TF 1.13 — in `tf.compat.v1` graph
mode, times one full G+D train step on this host's CPU, then times
cape_tpu's fused train step on the SAME CPU backend at the SAME shapes,
and prints both with the ratio.

Reference fidelity (all cited against /root/reference):
  * chebyshev5 basis choreography + flat [Fin*K, Fout] filter —
    lib/models.py:69-103 (sparse_dense_matmul recurrence, the
    [M, Fin*N] -> [N*M, Fin*K] transposes);
  * poolwT sparse pooling — lib/models.py:129-152;
  * cnp encoder / affine decoder blocks, per-layer condition concat —
    lib/models.py:154-171, 776-793, 564-617;
  * discriminator on the ds2 pyramid with the final-conv-K quirk —
    lib/models.py:648-678;
  * losses: masked L1 + KL + edge + label-smoothed GAN CE + the
    double-scaled fc regularization quirk — lib/models.py:355-416
    (tf.contrib.layers.l2_regularizer shimmed with tf.nn.l2_loss);
  * training: two Adam branches, clip_by_global_norm(5.0) on G, the
    reference's D-clip bug kept verbatim (it clips the VARIABLES and
    discards the result, applying unclipped grads — lib/models.py:466),
    EMA averages under control_dependencies — lib/models.py:419-474;
  * the TWO-session.run step structure (G then D, each re-running the
    full forward from feed_dict) — lib/models.py:905-906.

Variables are created under the reference's exact scope names, so the
graph can be initialized from `synthesize_reference_vars` output and
asserted numerically equal to the tests/reference_oracle.py
transcription (tests/test_tf_reference_bench.py does exactly that) —
the timing subject is provably the reference computation.

Usage:
  python -m cape_tpu.tools.tf_reference_bench [--batch 16] [--steps 10]
Prints one JSON line:
  {"tf_ref_cpu_step_ms":..., "cape_cpu_step_ms":..., "vs_reference_cpu_measured":...}
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np
import scipy.sparse as sp


# --------------------------------------------------------------- mesh algebra
def _scaled_laplacian(W: sp.spmatrix) -> sp.csr_matrix:
    """rescale_L(laplacian(A)) exactly as fed to chebyshev5
    (lib/mesh_sampling.py:10-38, main.py:44)."""
    W = sp.csr_matrix(W)
    d = np.asarray(W.sum(axis=0)).squeeze().astype(np.float64)
    d = d + np.spacing(np.array(0, dtype=np.float64))
    dinv = 1.0 / np.sqrt(d)
    D = sp.diags(dinv, 0)
    eye = sp.identity(d.size, dtype=np.float64)
    L = sp.csr_matrix(eye - D @ W @ D)
    return sp.csr_matrix(L - eye)  # lmax=2: L/(lmax/2) - I


def _tf():
    import tensorflow as tf

    tf1 = tf.compat.v1
    tf1.disable_eager_execution()
    return tf, tf1


def _sparse_tensor(tf1, L: sp.spmatrix):
    coo = sp.coo_matrix(L).astype(np.float32)
    order = np.lexsort((coo.col, coo.row))
    idx = np.stack([coo.row[order], coo.col[order]], axis=1).astype(np.int64)
    return tf1.SparseTensor(idx, coo.data[order], coo.shape)


class ReferenceGraph:
    """The reference training graph, variable names and all."""

    def __init__(self, cfg, pyr, pyr_d, template, edges, refvars=None,
                 batch_size: int = 16, regularization: float = 0.0,
                 lambda_l1: float = 1.0, lambda_edge: float = 1.0,
                 lambda_latent: float = 8e-4, lambda_gan: float = 0.1,
                 lr: float = 8e-3, decay_steps: int = 1940,
                 which_loss: str = "l1", seed: int = 123):
        tf, tf1 = _tf()
        self.tf, self.tf1 = tf, tf1
        self.cfg = cfg
        self.batch_size = batch_size
        self.refvars = refvars
        self.graph = tf1.Graph()
        self.L = [_scaled_laplacian(a) for a in pyr.adjacencies]
        self.D = [sp.csr_matrix(d) for d in pyr.downsamples]
        self.U = [sp.csr_matrix(u) for u in pyr.upsamples]
        self.L_d = [_scaled_laplacian(a) for a in pyr_d.adjacencies]
        self.D_d = [sp.csr_matrix(d) for d in pyr_d.downsamples]
        self.p = [L.shape[0] for L in self.L]
        self.F = list(cfg.channels)
        self.reg_losses_g: list = []
        self.reg_losses_d: list = []
        self.regularization = regularization
        with self.graph.as_default():
            tf1.set_random_seed(seed)
            self.Lt = [_sparse_tensor(tf1, L) for L in self.L]
            self.Dt = [_sparse_tensor(tf1, d) for d in self.D]
            self.Ut = [_sparse_tensor(tf1, u) for u in self.U]
            self.Lt_d = [_sparse_tensor(tf1, L) for L in self.L_d]
            self.Dt_d = [_sparse_tensor(tf1, d) for d in self.D_d]
            self.verts_ref = tf1.constant(np.asarray(template, np.float32))
            self.vpe = np.asarray(edges, np.int64)
            self._build(lambda_l1, lambda_edge, lambda_latent, lambda_gan,
                        lr, decay_steps, which_loss)

    # ------------------------------------------------------------- variables
    def _var(self, name, shape, kind):
        tf1 = self.tf1
        if self.refvars is not None:
            val = np.asarray(self.refvars[name], np.float32).reshape(shape)
            return tf1.get_variable(name, initializer=val)
        if kind == "weights":  # trunc normal(0, 0.1) (lib/models.py:835-842)
            init = tf1.truncated_normal_initializer(0.0, 0.1)
        else:  # bias: const 0.1
            init = tf1.constant_initializer(0.1)
        return tf1.get_variable(name, shape=shape, initializer=init)

    def _dense(self, scope, x, n_out, activation=None, reg=None):
        w = self._var(f"{scope}/dense/kernel", (int(x.shape[-1]), n_out), "weights")
        b = self._var(f"{scope}/dense/bias", (n_out,), "bias")
        if reg is not None and self.regularization:
            # tf.contrib.layers.l2_regularizer(scale) == scale * l2_loss(w);
            # the loss assembly multiplies by `regularization` AGAIN
            # (lib/models.py:378 — quirk kept)
            reg.append(self.regularization * self.tf.nn.l2_loss(w))
        y = self.tf.matmul(x, w) + b
        return activation(y) if activation is not None else y

    # ------------------------------------------------------------------- ops
    def _cheb5(self, x, Lsp, scope, K, Fout):
        """lib/models.py:69-103, tensor-for-tensor."""
        tf = self.tf
        N, M, Fin = (int(s) for s in x.shape)
        W = self._var(f"{scope}/weights", (Fin * K, Fout), "weights")
        x0 = tf.reshape(tf.transpose(x, (1, 2, 0)), (M, Fin * N))
        xs = [x0]
        if K > 1:
            xs.append(tf.sparse.sparse_dense_matmul(Lsp, x0))
        for _ in range(2, K):
            xs.append(2.0 * tf.sparse.sparse_dense_matmul(Lsp, xs[-1]) - xs[-2])
        xk = tf.reshape(tf.stack(xs, axis=0), (K, M, Fin, N))
        xk = tf.reshape(tf.transpose(xk, (3, 1, 2, 0)), (N * M, Fin * K))
        return tf.reshape(tf.matmul(xk, W), (N, M, Fout))

    def _poolwT(self, x, Tsp):
        tf = self.tf
        N, M, Fin = (int(s) for s in x.shape)
        Mp = int(Tsp.shape[0])
        xf = tf.reshape(tf.transpose(x, (1, 2, 0)), (M, Fin * N))
        y = tf.reshape(tf.sparse.sparse_dense_matmul(Tsp, xf), (Mp, Fin, N))
        return tf.transpose(y, (2, 0, 1))

    def _bias_act(self, x, scope):
        b = self._var(f"{scope}/bias", (1, 1, int(x.shape[-1])), "bias")
        return self.tf.nn.leaky_relu(x + b)

    def _concat_cond(self, x, y, y2):
        tf = self.tf
        V = int(x.shape[1])
        fit = lambda c: tf.tile(c[:, None, :], (1, V, 1))
        return tf.concat([x, fit(y), fit(y2)], axis=-1)

    # ------------------------------------------------------------ full paths
    def _condition(self, y, name, nz_cond, nlayers, reg):
        scope = f"condition_{name}"
        if nlayers == 1:
            return self._dense(f"{scope}/fc1", y, nz_cond, reg=reg)
        y_dim = int(y.shape[-1])
        n_out_fc1 = y_dim // 2 if y_dim > nz_cond else (
            y_dim if y_dim > nz_cond // 2 else nz_cond // 2
        )  # hidden-width heuristic, lib/models.py:498-503
        y = self._dense(f"{scope}/fc1", y, n_out_fc1,
                        activation=self.tf.nn.leaky_relu, reg=reg)
        return self._dense(f"{scope}/fc2", y, nz_cond, reg=reg)

    def _encoder(self, x, y, y2):
        cfg = self.cfg
        if cfg.cond_encoder:
            x = self._concat_cond(x, y, y2)
        for i in range(len(self.F)):
            scope = f"generator/encoder/encoder_conv{i + 1}"
            x = self._cheb5(x, self.Lt[i], scope, cfg.K, self.F[i])
            x = self._bias_act(x, scope)
            x = self._poolwT(x, self.Dt[i])
        if cfg.reduce_dim > 0:
            x = self._cheb5(x, self.Lt[-1], "generator/encoder/1x1-conv", 1,
                            cfg.reduce_dim)
        x = self.tf.reshape(x, (self.batch_size, -1))
        zm = self._dense("generator/encoder/fc_mean", x, cfg.nz, reg=self.reg_losses_g)
        zv = self._dense("generator/encoder/fc_var", x, cfg.nz, reg=self.reg_losses_g)
        return zm, zv

    def _decoder(self, z_total, y, y2):
        tf, cfg = self.tf, self.cfg
        bottom = cfg.reduce_dim if cfg.reduce_dim > 0 else self.F[-1]
        x = self._dense("generator/decoder/fc1", z_total, self.p[-1] * bottom,
                        activation=tf.nn.leaky_relu, reg=self.reg_losses_g)
        x = tf.reshape(x, (self.batch_size, self.p[-1], bottom))
        if cfg.reduce_dim > 0:
            x = self._cheb5(x, self.Lt[-1], "generator/decoder/1x1-conv", 1,
                            self.F[-1])
        x = self._concat_cond(x, y, y2)
        for i in range(len(self.F)):
            # flagship family: affine residual decoder (lib/models.py:776-793)
            scope = f"generator/decoder/decoder_resblock_affine{i + 1}"
            x = self._poolwT(x, self.Ut[-i - 1])
            fout = self.F[-i - 1] // 2  # lib/models.py:784
            x_gc = tf.nn.relu(
                self._cheb5(x, self.Lt[-i - 2], f"{scope}/graph_conv", cfg.K, fout)
            )
            x_af = self._cheb5(x, self.Lt[-i - 2], f"{scope}/affine", 1, fout)
            x = self._concat_cond(x_af + x_gc, y, y2)
        scope = "generator/decoder/outputs"
        x = self._cheb5(x, self.Lt[0], scope, cfg.K, 3)
        b = self._var(f"{scope}/bias", (1, self.p[0], 3), "bias")
        return x + b

    def _discriminator(self, x, y, y2):
        # the enclosing AUTO_REUSE scope shares variables between the
        # real and fake applications (reference reuse=True, :303)
        cfg = self.cfg
        x = self._concat_cond(x, y, y2)
        for i in range(len(self.Dt_d)):
            scope = f"discriminator/shared/conv{i + 1}"
            x = self._cheb5(x, self.Lt_d[i], scope, cfg.Kd, self.F[i])
            x = self._bias_act(x, scope)
            x = self._poolwT(x, self.Dt_d[i])
        # final-conv-K quirk: VAE's K, not Kd (lib/models.py:676)
        return self._cheb5(x, self.Lt_d[-1], "discriminator/prediction_map",
                           cfg.K, 1)

    # ------------------------------------------------------------- the graph
    def _build(self, lambda_l1, lambda_edge, lambda_latent, lambda_gan,
               lr, decay_steps, which_loss):
        tf, tf1, cfg, B = self.tf, self.tf1, self.cfg, self.batch_size
        V = self.p[0]
        ph = lambda shape, name: tf1.placeholder(tf.float32, shape, name)
        self.ph_data_g = ph((B, V, 3), "data_g")
        self.ph_gt = ph((B, V, 3), "gt")
        self.ph_data_d = ph((B, V, 3), "data_d")
        self.ph_cond_g = ph((B, cfg.cond_dim), "cond_g")
        self.ph_cond2_g = ph((B, cfg.cond2_dim), "cond2_g")
        self.ph_cond_d = ph((B, cfg.cond_dim), "cond_d")
        self.ph_cond2_d = ph((B, cfg.cond2_dim), "cond2_d")
        # the reference samples eps in-graph (tf.random_normal,
        # lib/models.py:193-195); feeding the same N(0,1) draw through a
        # placeholder is timing-identical (B*nz floats) and makes the
        # graph deterministic for the oracle-parity test
        self.ph_eps = ph((B, cfg.nz), "eps")

        with tf1.variable_scope("", reuse=tf1.AUTO_REUSE):
            y_g = self._condition(self.ph_cond_g, "pose", cfg.nz_cond, 2,
                                  self.reg_losses_g)
            y2_g = self._condition(self.ph_cond2_g, "clo_label", cfg.nz_cond2,
                                   cfg.n_layer_cond, self.reg_losses_g)
            y_d = self._condition(self.ph_cond_d, "pose", cfg.nz_cond, 2, None)
            y2_d = self._condition(self.ph_cond2_d, "clo_label", cfg.nz_cond2,
                                   cfg.n_layer_cond, None)

            self.z_mean, self.z_logvar = self._encoder(self.ph_data_g, y_g, y2_g)
            z = self.z_mean + tf.sqrt(tf.exp(self.z_logvar)) * self.ph_eps
            z_total = tf.concat([z, y_g, y2_g], axis=-1)
            g_outputs = self._decoder(z_total, y_g, y2_g)
            self.op_prediction = g_outputs

            d_logits_real = self._discriminator(self.ph_data_d, y_d, y2_d)
            d_logits_fake = self._discriminator(g_outputs, y_g, y2_g)
            self.op_d_real, self.op_d_fake = d_logits_real, d_logits_fake

        # ------------------------------------------------ loss (lib :355-416)
        if which_loss == "l1":
            recon = tf.reduce_mean(tf.abs(g_outputs - self.ph_gt))
        else:
            recon = tf.reduce_mean(tf.square(g_outputs - self.ph_gt))
        latent = tf.reduce_mean(
            -0.5 * tf.reduce_sum(
                1 + self.z_logvar - tf.square(self.z_mean) - tf.exp(self.z_logvar),
                axis=1,
            )
        )
        gather = lambda x: tf.gather(x, self.vpe[:, 0], axis=1) - tf.gather(
            x, self.vpe[:, 1], axis=1
        )
        edge = tf.reduce_mean(
            tf.norm(
                gather(g_outputs + self.verts_ref) - gather(self.ph_gt + self.verts_ref),
                axis=-1,
            )
        )
        smooth = 0.1
        ce = tf.nn.sigmoid_cross_entropy_with_logits
        gan_g = tf.reduce_mean(
            ce(logits=d_logits_fake, labels=tf.ones_like(d_logits_fake) * (1 - smooth))
        )
        d_real = tf.reduce_mean(
            ce(logits=d_logits_real, labels=tf.ones_like(d_logits_real) * (1 - smooth))
        )
        d_fake = tf.reduce_mean(
            ce(logits=d_logits_fake, labels=tf.zeros_like(d_logits_fake) + smooth)
        )
        reg_g = self.regularization * tf.add_n(self.reg_losses_g) if (
            self.reg_losses_g and self.regularization
        ) else tf.constant(0.0)
        loss_g = gan_g * lambda_gan + recon * lambda_l1 + edge * lambda_edge \
            + latent * lambda_latent + reg_g
        loss_d = (d_real + d_fake) * lambda_gan
        self.op_loss_g, self.op_loss_d = loss_g, loss_d
        self.op_recon = recon

        # -------------------------------------------- training (lib :419-474)
        global_step = tf1.Variable(0, name="global_step", trainable=False)
        lr_g = tf1.train.exponential_decay(lr, global_step, decay_steps, 0.99,
                                           staircase=True)
        lr_d = tf1.train.exponential_decay(lr, global_step, decay_steps, 0.99,
                                           staircase=True)
        opt_g = tf1.train.AdamOptimizer(learning_rate=lr_g)
        opt_d = tf1.train.AdamOptimizer(learning_rate=lr_d)
        tvars = tf1.trainable_variables()
        vars_g = [v for v in tvars
                  if v.name.startswith("generator") or "condition" in v.name]
        grads_g, variables_g = zip(*opt_g.compute_gradients(loss_g, var_list=vars_g))
        grads_g, _ = tf.clip_by_global_norm(grads_g, 5.0)
        op_g = opt_g.apply_gradients(zip(grads_g, variables_g),
                                     global_step=global_step)
        vars_d = [v for v in tvars if v.name.startswith("discriminator")]
        grads_d, variables_d = zip(*opt_d.compute_gradients(loss_d, var_list=vars_d))
        # the reference's D-clip bug, kept verbatim (lib/models.py:466):
        # clips the VARIABLES, discards the result, applies raw grads
        _, _ = tf.clip_by_global_norm(variables_d, 5.0)
        op_d = opt_d.apply_gradients(zip(grads_d, variables_d),
                                     global_step=global_step)

        averages = tf1.train.ExponentialMovingAverage(0.9)
        op_avg = averages.apply([loss_g, loss_d])
        with tf.control_dependencies([op_avg]):
            self.op_loss_average_g = tf.identity(averages.average(loss_g))
            self.op_loss_average_d = tf.identity(averages.average(loss_d))
        self.op_train_g, self.op_train_d = op_g, op_d
        self.op_init = tf1.global_variables_initializer()

    # ------------------------------------------------------------------ run
    def session(self):
        tf1 = self.tf1
        sess = tf1.Session(
            graph=self.graph,
            config=tf1.ConfigProto(
                # let TF use the host like the reference deployment would
                allow_soft_placement=True,
            ),
        )
        sess.run(self.op_init)
        return sess

    def feed(self, rng):
        cfg, B, V = self.cfg, self.batch_size, self.p[0]
        f32 = lambda *s: rng.standard_normal(s).astype(np.float32)
        return {
            self.ph_data_g: f32(B, V, 3), self.ph_gt: f32(B, V, 3),
            self.ph_data_d: f32(B, V, 3),
            self.ph_cond_g: f32(B, cfg.cond_dim),
            self.ph_cond2_g: f32(B, cfg.cond2_dim),
            self.ph_cond_d: f32(B, cfg.cond_dim),
            self.ph_cond2_d: f32(B, cfg.cond2_dim),
            self.ph_eps: f32(B, cfg.nz),
        }

    def time_steps(self, steps: int = 10, warmup: int = 3) -> float:
        """Median ms of one full reference train step: the reference's two
        session.run calls (G then D — lib/models.py:905-906), feed_dict
        included, exactly as its train loop pays them."""
        rng = np.random.default_rng(0)
        with self.session() as sess:
            for _ in range(warmup):
                fd = self.feed(rng)
                sess.run([self.op_train_g, self.op_loss_average_g], fd)
                sess.run([self.op_train_d, self.op_loss_average_d], fd)
            times = []
            for _ in range(steps):
                fd = self.feed(rng)
                t0 = time.perf_counter()
                sess.run([self.op_train_g, self.op_loss_average_g], fd)
                sess.run([self.op_train_d, self.op_loss_average_d], fd)
                times.append(time.perf_counter() - t0)
        times.sort()
        return 1000.0 * times[len(times) // 2]


def _flagship_parts():
    from cape_tpu.core.config import CAPEConfig
    from cape_tpu.meshops import assets

    cfg = CAPEConfig(
        name="tf_ref_bench", nz=64, nz_cond=32, nz_cond2=32, nf=64,
        use_res_block=False, use_res_block_dec=True, affine=True,
        reduce_dim=64, lambda_edge=1.0, batch_size=16,
        compute_dtype="float32",
    )
    verts, _ = assets.template_mesh()
    return (cfg, assets.load_pyramid("for_demo"), assets.load_pyramid("ds2"),
            verts, assets.smpl_edges())


def _time_cape_cpu(cfg, steps: int, warmup: int = 3) -> float:
    """cape_tpu's fused G+D train step on the same host CPU, same shapes.
    Single-step dispatch (no K-step scan) to mirror the reference's
    per-step feed structure — this UNDERSTATES cape_tpu (production scans
    K=32 steps per dispatch). Honors cfg.op_mode: 'banded' is the
    TPU-production formulation (dense MXU-friendly bands — ~25x the
    reference's sparse FLOPs, a deliberate trade that wins on the MXU
    and loses on scalar silicon); 'ell' is the natural gather-based
    operator, the config actually comparable on a CPU."""
    import jax

    from cape_tpu.data.loader import BatchStream
    from cape_tpu.data.synthetic import synthetic_bodydata
    from cape_tpu.models.cape import CAPE
    from cape_tpu.ops.sparse import build_graph_context
    from cape_tpu.meshops import assets
    from cape_tpu.train.optim import build_optimizer, create_train_state
    from cape_tpu.train.step import build_resident_train_step

    verts, _ = assets.template_mesh()
    ctx = build_graph_context(
        assets.load_pyramid("for_demo"), assets.load_pyramid("ds2"),
        assets.smpl_edges(), verts, dtype=np.float32,
        mode=cfg.op_mode,
        padded=cfg.padded_layout and cfg.op_mode == "banded",
    )
    model = CAPE(cfg)
    params = jax.jit(model.init_params)(jax.random.PRNGKey(0), ctx)
    tx, _, _ = build_optimizer(cfg, steps_per_epoch=1940)
    step_fn = jax.jit(build_resident_train_step(model, cfg, tx),
                      donate_argnums=(0,))
    data = synthetic_bodydata(n_train=256 + 64, n_test=8, num_verts=len(verts),
                              seed=0)
    dev = {
        "disp": jax.numpy.asarray(data.disp_train),
        "pose": jax.numpy.asarray(data.pose_train),
        "clo": jax.numpy.asarray(data.clo_train),
    }
    sg = BatchStream(len(data.disp_train), cfg.batch_size, 0)
    sd = BatchStream(len(data.disp_train), cfg.batch_size, 1)
    state = create_train_state(params, tx)
    rng = jax.random.PRNGKey(0)
    idx = lambda s: jax.numpy.asarray(s.next_indices().astype(np.int32))
    for i in range(warmup):
        state, metrics = step_fn(state, ctx, dev, idx(sg), idx(sd),
                                 jax.random.fold_in(rng, i))
    jax.device_get(metrics["loss_g"])
    times = []
    for i in range(steps):
        t0 = time.perf_counter()
        state, metrics = step_fn(state, ctx, dev, idx(sg), idx(sd),
                                 jax.random.fold_in(rng, 100 + i))
        jax.device_get(metrics["loss_g"])
        times.append(time.perf_counter() - t0)
    times.sort()
    return 1000.0 * times[len(times) // 2]


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--skip-cape", action="store_true",
                   help="time only the TF reference graph")
    p.add_argument("--skip-tf", action="store_true",
                   help="time only the cape_tpu step (use with --save to "
                   "merge a second cape arm into an existing JSON)")
    p.add_argument("--cape-mode", choices=["banded", "ell"], default="banded",
                   help="cape_tpu graph-op formulation to time: 'banded' is "
                   "the TPU-production config (dense MXU bands — expected "
                   "to LOSE on scalar silicon), 'ell' the natural gather "
                   "operator (the apples-to-apples CPU arm)")
    p.add_argument("--save", default=None,
                   help="also write the JSON to this path (e.g. "
                   "TF_REF_CPU.json at the repo root, which bench.py "
                   "carries into the headline JSON line); merges into an "
                   "existing file so arms can be run separately")
    args = p.parse_args(argv)

    # keep JAX off the backend until after TF timing; both run on host CPU
    import jax

    jax.config.update("jax_platforms", "cpu")

    out = {"batch": args.batch, "steps": args.steps}
    if args.save and os.path.exists(args.save):
        with open(args.save) as f:
            prior = json.load(f)
        if (prior.get("batch"), prior.get("steps")) == (args.batch, args.steps):
            out = prior

    cfg, pyr, pyr_d, verts, edges = _flagship_parts()
    cfg = cfg.replace(batch_size=args.batch)
    if not args.skip_tf:
        ref = ReferenceGraph(cfg, pyr, pyr_d, verts, edges,
                             batch_size=args.batch)
        out["tf_ref_cpu_step_ms"] = round(ref.time_steps(steps=args.steps), 2)
    if not args.skip_cape:
        key = ("cape_cpu_step_ms" if args.cape_mode == "banded"
               else f"cape_cpu_step_ms_{args.cape_mode}")
        cape_ms = _time_cape_cpu(cfg.replace(op_mode=args.cape_mode),
                                 steps=args.steps)
        out[key] = round(cape_ms, 2)
        tf_ms = out.get("tf_ref_cpu_step_ms")
        if tf_ms is not None:
            rkey = ("vs_reference_cpu_measured" if args.cape_mode == "banded"
                    else f"vs_reference_cpu_measured_{args.cape_mode}")
            out[rkey] = round(tf_ms / cape_ms, 2)
    if args.save:
        with open(args.save, "w") as f:
            json.dump(out, f, indent=1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
