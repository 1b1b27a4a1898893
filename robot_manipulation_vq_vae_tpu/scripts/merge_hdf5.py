"""Merge two or more dataset hdf5s into one (reference
``robomimic/scripts/internal/merge_hdf5.py``): demos are renumbered
``demo_0..N``, data-group attrs that agree across sources are carried over
(with warnings otherwise), and per-source filter keys record provenance."""

import argparse
import json

import h5py

from robot_manipulation_vq_vae_tpu.utils.file_utils import (
    create_hdf5_filter_key,
)


def _copy_shared_attr(new_grp, sources, attr_name, json_load=False):
    vals = [
        f["data"].attrs[attr_name]
        for f in sources
        if attr_name in f["data"].attrs
    ]
    if not vals:
        print(f"warning: attribute {attr_name} not found in any source")
        return
    check = [json.loads(v) for v in vals] if json_load else list(vals)
    if len(vals) == len(sources) and all(c == check[0] for c in check[1:]):
        new_grp.attrs[attr_name] = vals[0]
    else:
        print(f"warning: attribute {attr_name} differs across sources; "
              "taking the first")
        new_grp.attrs[attr_name] = vals[0]


def merge_hdf5s(paths, output_path):
    sources = [h5py.File(p, "r") for p in paths]
    provenance = {}
    try:
        with h5py.File(output_path, "w") as out:
            grp = out.create_group("data")
            total = 0
            idx = 0
            for p, f in zip(paths, sources):
                names = []
                for ep in sorted(list(f["data"].keys())):
                    new_name = f"demo_{idx}"
                    f.copy(f"data/{ep}", grp, name=new_name)
                    names.append(new_name)
                    total += int(f[f"data/{ep}"].attrs.get("num_samples", 0))
                    idx += 1
                provenance[p] = names
            grp.attrs["total"] = total
            _copy_shared_attr(grp, sources, "env_args", json_load=True)
    finally:
        for f in sources:
            f.close()

    # provenance filter keys: mask/src_<i> lists the demos from each source
    for i, (p, names) in enumerate(provenance.items()):
        create_hdf5_filter_key(
            hdf5_path=output_path, demo_keys=names, key_name=f"src_{i}"
        )
    print(f"merged {len(paths)} files -> {output_path} ({idx} demos, "
          f"{total} samples)")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--datasets", nargs="+", required=True)
    parser.add_argument("--output", type=str, required=True)
    args = parser.parse_args()
    merge_hdf5s(args.datasets, args.output)
