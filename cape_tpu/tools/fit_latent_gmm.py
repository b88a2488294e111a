"""Fit a Gaussian-mixture prior over a trained model's train-set latents.

Reproduces how the reference's shipped asset was made
(data/pretrained_gmm.pkl: sklearn GaussianMixture, 10 components, full
covariance, fit on train latents) using the first-party EM fitter — no
sklearn dependency. The result feeds DemoSuite.sample_gmm_prior.

  python -m cape_tpu.tools.fit_latent_gmm --config configs/<preset>.yaml \
      --name <run> --out latent_gmm.npz
"""

from __future__ import annotations

import argparse

import numpy as np

from cape_tpu.apps.inference import InferenceEngine
from cape_tpu.apps.main import build_context, load_bodydata, restore_params
from cape_tpu.core.config import load_config
from cape_tpu.models.cape import CAPE
from cape_tpu.models.gmm import fit_gmm


def main(argv=None):
    p = argparse.ArgumentParser(description="fit latent GMM prior")
    p.add_argument("--config", required=True)
    p.add_argument("--name", required=True)
    p.add_argument("--n_components", type=int, default=10)
    p.add_argument("--n_iter", type=int, default=100)
    p.add_argument("--out", default="latent_gmm.npz")
    args = p.parse_args(argv)

    cfg = load_config(args.config, name=args.name)
    model = CAPE(cfg)
    ctx = build_context(cfg)
    params = restore_params(cfg, model, ctx)
    data = load_bodydata(cfg)  # natural order; the engine permutes internally
    engine = InferenceEngine(model, ctx, params, cfg.batch_size)
    z_mean, _, _, _ = engine.encode(data.disp_train, data.pose_train, data.clo_train)
    gmm = fit_gmm(z_mean, n_components=args.n_components, n_iter=args.n_iter, seed=cfg.seed)
    np.savez(
        args.out,
        weights=np.asarray(gmm.weights),
        means=np.asarray(gmm.means),
        covariances=np.asarray(gmm.covariances),
    )
    print(f"wrote {args.out}: {args.n_components} components over {z_mean.shape[1]}-d latents")


if __name__ == "__main__":
    main()
