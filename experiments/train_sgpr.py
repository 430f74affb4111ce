"""SGPR trainer CLI (reference baseline: experiments/train_sgpr.py).

Default 512 inducing points sampled from the training set, as in the
reference (configs/sgpr.yml; sgpr_m200.yml uses 200).
"""

import argparse
import pathlib
import sys

_ROOT = str(pathlib.Path(__file__).resolve().parents[1])
if _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)
_HERE = str(pathlib.Path(__file__).resolve().parent)
if _HERE not in sys.path:
    sys.path.insert(0, _HERE)

from common import add_common_args, init_kwargs, load_dataset, run_training  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    add_common_args(p)
    p.add_argument("--kernel", default="rbf", choices=["rbf", "matern"])
    p.add_argument("--nu", type=float, default=1.5)
    p.add_argument("--num-inducing", type=int, default=512)
    args = p.parse_args()

    import jax.numpy as jnp

    from simplex_gp_tpu.models.sgpr import SGPR

    ds = load_dataset(args)
    model = SGPR(
        num_dims=ds.train_x.shape[-1],
        num_inducing=args.num_inducing,
        kernel=args.kernel,
        nu=args.nu,
        min_noise=args.min_noise,
    )
    raw = model.init_params(jnp.asarray(ds.train_x), seed=args.seed, **init_kwargs(args, ds))
    run_training(model, raw, ds, args, "sgpr")


if __name__ == "__main__":
    main()
