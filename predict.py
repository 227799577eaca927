#!/usr/bin/env python
"""Repo-root shim — the CLI lives at gcnbmp_tpu.cli.predict (console
script ``gcnbmp-predict`` after ``pip install -e .``)."""
from gcnbmp_tpu.cli.predict import main  # noqa: F401

if __name__ == "__main__":
    main()
