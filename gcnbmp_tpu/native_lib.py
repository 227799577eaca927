"""Shared loader for the native C++ libraries under ``native/``.

One build/load/caching implementation for both ``libgcnbmp_smiles.so``
(chem/native.py) and ``libgcnbmp_pack.so`` (data/native_pack.py): the
first use triggers ``make -C native`` (which builds every library), a
failed build or load is cached so it is attempted once per process, and
each caller configures its own ctypes signatures via ``configure``.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Callable, Dict, Optional

NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native"
)

_UNTRIED = object()
_cache: Dict[str, object] = {}


def _try_build() -> bool:
    try:
        subprocess.run(
            ["make", "-C", NATIVE_DIR],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception:
        return False


def load(
    so_name: str,
    configure: Optional[Callable[[ctypes.CDLL], None]] = None,
    build: bool = True,
) -> Optional[ctypes.CDLL]:
    """Load (building if needed) ``native/<so_name>``; None if
    unavailable.  The result — including failure — is cached per
    process; ``configure(lib)`` runs once on successful load."""
    cached = _cache.get(so_name, _UNTRIED)
    if cached is not _UNTRIED:
        return cached  # type: ignore[return-value]
    path = os.path.join(NATIVE_DIR, so_name)
    if not os.path.exists(path) and (not build or not _try_build()
                                     or not os.path.exists(path)):
        _cache[so_name] = None
        return None
    try:
        lib = ctypes.CDLL(path)
    except OSError:
        _cache[so_name] = None
        return None
    if configure is not None:
        configure(lib)
    _cache[so_name] = lib
    return lib
