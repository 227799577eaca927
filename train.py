#!/usr/bin/env python
"""Repo-root shim — the CLI lives at gcnbmp_tpu.cli.train (console
script ``gcnbmp-train`` after ``pip install -e .``)."""
from gcnbmp_tpu.cli.train import main, parse_args  # noqa: F401

if __name__ == "__main__":
    main()
