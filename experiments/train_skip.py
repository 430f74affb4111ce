"""SKIP trainer CLI (reference baseline: experiments/train_skip.py).

ProductStructureKernel(GridInterpolationKernel) analog with per-dim grid
size 100 (reference configs/skip.yml; skip_m9.yml uses 9).
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
    p.add_argument("--grid-size", type=int, default=100)
    p.add_argument("--rank", type=int, default=64)
    args = p.parse_args()

    from simplex_gp_tpu.models.ski import SKIP

    ds = load_dataset(args)
    model = SKIP(
        num_dims=ds.train_x.shape[-1],
        grid_size=args.grid_size,
        rank=args.rank,
        kernel=args.kernel,
        nu=args.nu,
        min_noise=args.min_noise,
    )
    run_training(model, model.init_params(**init_kwargs(args, ds)), ds, args, "skip")


if __name__ == "__main__":
    main()
