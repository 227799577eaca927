#!/usr/bin/env python
"""Repo-root shim — the CLI lives at gcnbmp_tpu.cli.data_generator
(console script ``gcnbmp-data`` after ``pip install -e .``)."""
from gcnbmp_tpu.cli.data_generator import main  # noqa: F401

if __name__ == "__main__":
    main()
