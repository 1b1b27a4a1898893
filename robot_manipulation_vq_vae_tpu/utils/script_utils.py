"""Script helpers (reference ``robomimic/utils/script_utils.py``)."""

import collections.abc


def deep_update(d, u):
    """Recursively merge mapping @u into mapping @d in place (reference
    script_utils.py:5-14)."""
    for k, v in u.items():
        if isinstance(v, collections.abc.Mapping):
            d[k] = deep_update(d.get(k, {}), v)
        else:
            d[k] = v
    return d
