"""Python introspection helpers (reference ``robomimic/utils/python_utils.py``):
extract the subset of a kwargs dict that a class's constructor accepts.
Handles both plain ``__init__`` signatures and Flax dataclass modules."""

import inspect
from copy import deepcopy


def get_class_init_kwargs(cls):
    """The expected keyword arguments of @cls's constructor (reference
    python_utils.py:9-20). Flax modules are dataclasses, so fall back to
    dataclass fields when present."""
    if hasattr(cls, "__dataclass_fields__"):
        return [
            name for name in cls.__dataclass_fields__
            if name not in ("parent", "name")
        ]
    return list(inspect.signature(cls.__init__).parameters.keys())[1:]


def extract_subset_dict(dic, keys, copy=False):
    """Subset of @dic restricted to @keys (reference python_utils.py:22-37)."""
    subset = {k: dic[k] for k in keys if k in dic}
    return deepcopy(subset) if copy else subset


def extract_class_init_kwargs_from_dict(cls, dic, copy=False, verbose=False):
    """Subset of @dic that @cls's constructor accepts (reference
    python_utils.py:39-72); @verbose warns about dropped keys."""
    subdic = extract_subset_dict(
        dic=dic, keys=get_class_init_kwargs(cls), copy=copy
    )
    if verbose:
        keys_not_in_cls = [k for k in dic if k not in subdic]
        keys_not_in_dic = [
            k for k in get_class_init_kwargs(cls) if k not in dic
        ]
        if keys_not_in_cls:
            print(
                f"Warning: For class {cls.__name__}, got unknown keys: "
                f"{keys_not_in_cls}"
            )
        if keys_not_in_dic:
            print(
                f"Warning: For class {cls.__name__}, got missing keys: "
                f"{keys_not_in_dic}"
            )
    return subdic
