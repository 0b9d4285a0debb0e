"""Progress-bar helper (reference uses tqdm on train/sample loops,
e.g. trainers/vae_trainer.py:198, modules/diffusion.py:51).

Wraps tqdm when it's importable and stdout is interactive-ish; falls back
to the bare iterable so library code never hard-depends on tqdm.  Set
IDTPU_NO_TQDM=1 to silence bars (useful for log-file runs and CI).
"""

from __future__ import annotations

import os
from typing import Iterable, Iterator


def progress(iterable: Iterable, total: int | None = None, desc: str | None = None) -> Iterator:
    if os.environ.get("IDTPU_NO_TQDM") == "1":
        return iter(iterable)
    try:
        from tqdm import tqdm
    except ImportError:  # pragma: no cover
        return iter(iterable)
    return iter(tqdm(iterable, total=total, desc=desc, dynamic_ncols=True, leave=False))
