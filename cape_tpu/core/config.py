"""Configuration system: one dataclass, YAML files + CLI overrides.

Replaces the reference's configargparse flag set (config_parser.py:1-68) and
main.py's post-processing of flags into derived model parameters
(main.py:50-84). Flag names are kept identical where sensible so the
reference's YAML preset files work unchanged (configs/*.yaml).
"""

from __future__ import annotations

import argparse
import dataclasses
from typing import Any

import yaml


@dataclasses.dataclass
class CAPEConfig:
    # ---- run ----
    name: str = ""
    mode: str = "train"                    # train | test | demo
    dataset: str = "dataset_male_4clotypes"
    gender: str = "male"
    seed: int = 123
    restart: bool = True

    # ---- architecture (reference: config_parser.py:13-31) ----
    num_conv_layers: int = 8
    ds_factor: int = 2
    K: int = 2                             # Chebyshev order, VAE layers
    Kd: int = 3                            # Chebyshev order, discriminator
    nf: int = 64                           # first-layer filters
    nz: int = 18                           # latent dim
    nz_cond: int = 24                      # pose-embedding dim
    nz_cond2: int = 8                      # clothing-type-embedding dim
    n_layer_cond: int = 1
    activation: str = "b1leakyrelu"        # b1leakyrelu | b1relu | b1tanh
    use_res_block: bool = False            # encoder res blocks
    use_res_block_dec: bool = True         # decoder res blocks
    cond_encoder: bool = False             # condition the encoder too
    reduce_dim: int = 64                   # 1x1-conv channel reduction (0 = off)
    affine: bool = False                   # affine decoder res blocks (2004.02658)
    pose_type: str = "rot"                 # rot | pose
    optim_condnet: bool = True
    nn_input_channel: int = 3
    cond_dim: int = 126                    # 14 clothing joints x 9 (main.py:69)
    cond2_dim: int = 4                     # one-hot clothing type

    # ---- training (reference: config_parser.py:33-46) ----
    batch_size: int = 16
    num_epochs: int = 60
    lr: float = 8e-3
    lr_scaler: float = 0.1                 # lr_d = lr * lr_scaler
    decay_every: int = 1                   # decay lr after this many epochs
    decay_rate: float = 0.99               # staircase decay factor
    momentum: float = 0.9
    lr_warmup: bool = False                # 8-epoch linear warmup
    optimizer: str = "sgd"                 # sgd | adam
    loss: str = "l1"                       # l1 | huber | l2
    loss_mask: str = ""                    # '' | binary

    # ---- loss weights (reference: config_parser.py:48-52) ----
    regularization: float = 2e-3
    lambda_recon: float = 1.0
    lambda_edge: float = 1.0
    lambda_latent: float = 8e-4
    lambda_gan: float = 0.1

    # ---- demo ----
    smpl_model_folder: str = "body_models"
    demo_n_sample: int = 5
    save_obj: bool = True
    vis_demo: bool = False

    # ---- TPU-native extensions (no reference counterpart) ----
    compute_dtype: str = "float32"         # float32 | bfloat16 compute path
    op_mode: str = "banded"                # banded | ell | dense graph ops
    # jax.checkpoint each block. Measured a LOSS at every batch tried on
    # v5e (bf16 batch 64: 80 -> 106 ms; batch 128: 226 -> 293 ms, round 3,
    # docs/PERF.md) — the recompute costs more than the saved activation
    # traffic at these model sizes. Kept as an escape hatch for meshes /
    # channel plans that genuinely exceed HBM.
    remat: bool = False
    fold_conditions: bool = True           # algebraic condition folding (exact)
    data_parallel: int = 0                 # 0 = use all local devices
    # train steps scanned per device dispatch: one dispatch + one sync
    # round-trip covers this many full GAN steps (queue depth stays 1).
    # 32 measured best through the remote relay (11.26 vs 14 ms/step at 8,
    # docs/PERF.md); chunks are clipped to epoch boundaries by the Trainer.
    steps_per_dispatch: int = 32
    log_every_steps: int = 0               # 0 = per-epoch only
    profile_steps: int = 0                 # capture a jax.profiler trace of N steps
    # also mirror scalars (+ per-weight histograms at each checkpoint)
    # into TensorBoard event files in the run dir — first-party writer,
    # no TF dependency (train/tb_events.py; the reference's observability
    # surface, lib/models.py:399-414)
    tensorboard: bool = True
    checkpoint_keep: int = 5
    # Pallas kernel routing: False pins every conv to the XLA banded path
    # (ops.cheb routes the large-batch v3 kernel automatically past its
    # measured thresholds otherwise). The CAPE_TPU_PALLAS env var overrides
    # globally: 0 = kill switch, 1 = also enable the experimental v2 path.
    use_pallas: bool = True
    # Persistent-padded vertex layout (banded mode only): activations stay
    # at 128-row multiples through the whole network; pad once at the model
    # input, slice once at its output (docs/PERF.md round-3 measurement).
    padded_layout: bool = True
    # Fuse each decoder unpool into its conv via the precomposed banded
    # product L~@U (GraphContext.lap_up): weight projections run at the
    # coarse vertex count and the unpooled intermediate never materializes.
    # Exact (tests/test_model.py); applies to the folded udn/affine decoder
    # paths with K=2. MEASURED AND REJECTED as the default: the composed
    # operator is wider-band than U (S up to 7-13 vs 5-12 per level), and
    # in this bandwidth-bound regime the extra band-block traffic costs
    # ~10% per step (10.88 -> 12.01 ms flagship bf16 batch 16, padded,
    # same-session ABBA — docs/PERF.md). Kept as an escape hatch for
    # memory-constrained configs (the fine-level intermediate never
    # materializes).
    fuse_decoder: bool = False
    # Optimizer-state precision: bfloat16 halves the momentum-buffer HBM
    # traffic (sgd accumulator / adam first moment; adam's second moment
    # stays f32 per optax). Params and gradients stay f32 regardless.
    # Opt-in: the default keeps the pinned endurance training math
    # bit-identical (tools/endurance.py --expect-final). Measured A/B on
    # v5e in docs/PERF.md (tools/opt_state_ab.py).
    opt_state_dtype: str = "float32"       # float32 | bfloat16

    # ------------------------------------------------------------------
    # Derived architecture facts (reference: main.py:31-84)
    # ------------------------------------------------------------------
    @property
    def ds_factors(self) -> list[int]:
        n = self.num_conv_layers
        f = self.ds_factor
        if n == 4:
            return [1, f, 1, 1]
        if n == 6:
            return [1, f, 1, f, 1, 1]
        if n == 8:
            return [1, f, 1, f, 1, f, 1, 1]
        raise NotImplementedError(f"num_conv_layers={n}")

    @property
    def channels(self) -> list[int]:
        """Per-layer output channels F (main.py:56-63)."""
        nf, n = self.nf, self.num_conv_layers
        if n == 4:
            return [nf, 2 * nf, 2 * nf, nf]
        if n == 6:
            return [nf, nf, 2 * nf, 2 * nf, 4 * nf, 4 * nf]
        if n == 8:
            return [nf, nf, 2 * nf, 2 * nf, 4 * nf, 4 * nf, 8 * nf, 8 * nf]
        raise NotImplementedError(f"num_conv_layers={n}")

    @property
    def poly_orders(self) -> list[int]:
        return [self.K] * self.num_conv_layers

    @property
    def reduce_rate(self) -> int:
        """Channel-reduction ratio of the 1x1 convs (lib/models.py:254-259)."""
        if self.reduce_dim > 0:
            rate = self.channels[-1] // self.reduce_dim
            if rate < 1:
                # integer-division would silently yield 0 channels here and
                # crash far away (e.g. a ZeroDivisionError in the summary)
                raise ValueError(
                    f"reduce_dim={self.reduce_dim} exceeds the encoder's final "
                    f"channel count {self.channels[-1]} (nf={self.nf}, "
                    f"num_conv_layers={self.num_conv_layers}); lower reduce_dim "
                    "or set it to 0 to disable the 1x1 reduction"
                )
            return rate
        if self.reduce_dim == 0:
            return 1
        raise ValueError("reduce_dim must be >= 0")

    @property
    def z_total_dim(self) -> int:
        return self.nz + self.nz_cond + self.nz_cond2

    def replace(self, **kw) -> "CAPEConfig":
        return dataclasses.replace(self, **kw)


_BOOL_FIELDS = {
    "restart", "use_res_block", "use_res_block_dec", "cond_encoder", "affine",
    "optim_condnet", "lr_warmup", "save_obj", "vis_demo",
    # TPU-native extension bools: without membership here the CLI parses
    # them with type=bool, where bool("0") is True and a flag can never be
    # turned off from the command line
    "remat", "fold_conditions", "use_pallas", "padded_layout", "fuse_decoder",
    "tensorboard",
}


def _coerce(key: str, value: Any) -> Any:
    if key in _BOOL_FIELDS:
        if isinstance(value, str):
            return value.lower() in ("1", "true", "yes")
        return bool(value)
    return value


def load_config(yaml_path: str | None = None, **overrides) -> CAPEConfig:
    """Build a config from an optional YAML file plus keyword overrides."""
    values: dict[str, Any] = {}
    if yaml_path:
        with open(yaml_path) as f:
            loaded = yaml.safe_load(f) or {}
        values.update(loaded)
    values.update({k: v for k, v in overrides.items() if v is not None})
    field_names = {f.name for f in dataclasses.fields(CAPEConfig)}
    known = {k: _coerce(k, v) for k, v in values.items() if k in field_names}
    return CAPEConfig(**known)


def parse_cli(argv: list[str] | None = None) -> CAPEConfig:
    """CLI with the reference's flag names; --config points at a YAML preset."""
    parser = argparse.ArgumentParser(prog="cape_tpu", description="TPU-native CAPE")
    parser.add_argument("--config", default=None, help="YAML config file")
    for f in dataclasses.fields(CAPEConfig):
        arg_type = str if f.name in _BOOL_FIELDS else type(f.default)
        parser.add_argument(f"--{f.name}", type=arg_type, default=None)
    args, _ = parser.parse_known_args(argv)
    overrides = {
        f.name: getattr(args, f.name)
        for f in dataclasses.fields(CAPEConfig)
        if getattr(args, f.name) is not None
    }
    return load_config(args.config, **overrides)
