#!/usr/bin/env python
"""Repo-root shim for the training CLI (implementation:
evreal_tpu/train_cli.py; installed entry point: ``evreal-train``)."""

from evreal_tpu.train_cli import main

if __name__ == "__main__":
    main()
