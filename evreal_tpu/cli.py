"""Console entry points (``evreal-eval`` / ``evreal-train``) for installed
usage; the repo-root ``eval.py`` / ``train_cli.py`` shims keep the
reference-compatible invocations (reference eval.py:447-455)."""

import argparse


def eval_main(argv=None):
    from evreal_tpu.harness import evaluate

    parser = argparse.ArgumentParser(
        description="event2im evaluation script")
    parser.add_argument("-c", "--config", nargs="+", type=str,
                        help="evaluation configs")
    parser.add_argument("-m", "--method", nargs="+", type=str,
                        help="methods")
    parser.add_argument("-d", "--dataset", nargs="+", type=str,
                        help="datasets")
    parser.add_argument("-qm", "--metrics", nargs="+", type=str,
                        help="quantitative evaluation metrics that will be "
                             "used calculate scores")
    args = parser.parse_args(argv)
    # persistent XLA compile cache: the same (model, resolution, chunk)
    # programs recur across CLI invocations, and compiles stretch to
    # minutes when the chip is degraded (CLAUDE.md)
    from evreal_tpu.utils import enable_compile_cache

    enable_compile_cache()
    evaluate(args.method, args.config, args.dataset, args.metrics)


def train_main(argv=None):
    from evreal_tpu.train_cli import main

    main(argv)
