"""Config merging helper (parity: reference utils/params.py)."""

from typing import Dict, Optional


def merge_dict(defaults: Dict, custom: Optional[Dict] = None) -> Dict:
    merged = dict(defaults)
    if custom is not None:
        merged.update(custom)
    return merged
