#!/usr/bin/env python
"""Repo-root shim — the CLI lives at gcnbmp_tpu.cli.evaluate (console
script ``gcnbmp-eval`` after ``pip install -e .``)."""
from gcnbmp_tpu.cli.evaluate import main  # noqa: F401

if __name__ == "__main__":
    main()
