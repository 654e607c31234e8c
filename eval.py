#!/usr/bin/env python
"""EVREAL-compatible CLI (reference eval.py:447-455):

    python eval.py -m E2VID FireNet+ -c std -d ECD -qm mse ssim lpips

Implementation: evreal_tpu/cli.py (installed entry point: ``evreal-eval``).
"""

from evreal_tpu.cli import eval_main

if __name__ == "__main__":
    eval_main()
