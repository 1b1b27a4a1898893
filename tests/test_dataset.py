"""Data-layer tests: HDF5 windowing/padding semantics, action normalization
math, MetaDataset mixing, loader collation."""

import json
import os

import h5py
import numpy as np
import pytest

from robot_manipulation_vq_vae_tpu.data import (
    DataLoader,
    MetaDataset,
    SequenceDataset,
    action_stats_to_normalization_stats,
)
from robot_manipulation_vq_vae_tpu.utils import obs_utils as ObsUtils

A = 3


@pytest.fixture(scope="module", autouse=True)
def modalities():
    ObsUtils.initialize_obs_utils_with_obs_specs(
        {"obs": {"low_dim": ["eef_pos"], "rgb": ["cam_image"]}}
    )


def write_demo_file(path, demo_lengths, with_images=True, seed=0):
    rng = np.random.RandomState(seed)
    with h5py.File(path, "w") as f:
        data = f.create_group("data")
        total = 0
        for i, T in enumerate(demo_lengths):
            ep = data.create_group(f"demo_{i}")
            ep.attrs["num_samples"] = T
            ep.attrs["ep_meta"] = json.dumps({"lang": f"task {i}"})
            obs = ep.create_group("obs")
            # deterministic content so window fetches are checkable:
            # eef_pos[t] = [demo, t, 0]
            obs.create_dataset(
                "eef_pos",
                data=np.stack(
                    [np.full(T, i), np.arange(T), np.zeros(T)], axis=1
                ).astype(np.float32),
            )
            if with_images:
                obs.create_dataset(
                    "cam_image",
                    data=rng.randint(0, 255, size=(T, 8, 8, 3), dtype=np.uint8),
                )
            ep.create_dataset(
                "actions",
                data=np.arange(T * A).reshape(T, A).astype(np.float32) + 100 * i,
            )
            total += T
        mask = f.create_group("mask")
        mask.create_dataset(
            "first_only", data=np.array([b"demo_0"])
        )
        data.attrs["total"] = total
    return path


@pytest.fixture(scope="module")
def demo_file(tmp_path_factory):
    p = tmp_path_factory.mktemp("data") / "demos.hdf5"
    return write_demo_file(str(p), demo_lengths=[5, 3])


def make_ds(demo_file, **kwargs):
    defaults = dict(
        hdf5_path=demo_file,
        obs_keys=["eef_pos", "cam_image"],
        action_keys=["actions"],
        dataset_keys=["actions"],
        action_config={"actions": {"normalization": None}},
        frame_stack=3,
        seq_length=2,
        pad_frame_stack=True,
        pad_seq_length=True,
        hdf5_cache_mode=None,
        load_next_obs=False,
    )
    defaults.update(kwargs)
    return SequenceDataset(**defaults)


def test_index_maps_and_len(demo_file):
    ds = make_ds(demo_file)
    assert len(ds) == 8  # 5 + 3 with both paddings
    # without padding, a demo shorter than the window must assert
    # (reference dataset.py:256: num_sequences >= 1)
    with pytest.raises(AssertionError):
        make_ds(demo_file, pad_frame_stack=False, pad_seq_length=False)


def test_window_contents_and_padding(demo_file):
    ds = make_ds(demo_file)
    item = ds[0]  # demo_0, t=0: frame stack pads left twice
    eef = item["obs"]["eef_pos"]  # [fs-1+seq, 3] = [4, 3]
    assert eef.shape == (4, 3)
    # padded: [t0, t0, t0, t1]
    np.testing.assert_array_equal(eef[:, 1], [0, 0, 0, 1])
    # actions window starts at t0 (frame-stacked part included)
    assert item["actions"].shape == (4, A)

    item_last = ds[4]  # demo_0, t=4 (last): seq padding right
    eef = item_last["obs"]["eef_pos"]
    np.testing.assert_array_equal(eef[:, 1], [2, 3, 4, 4])

    # demo boundary: index 5 is demo_1 t=0
    item_b = ds[5]
    np.testing.assert_array_equal(item_b["obs"]["eef_pos"][:, 0], [1, 1, 1, 1])
    np.testing.assert_array_equal(item_b["obs"]["eef_pos"][:, 1], [0, 0, 0, 1])

    # uint8 images stay uint8 (device-side processing)
    assert item["obs"]["cam_image"].dtype == np.uint8
    assert item["obs"]["cam_image"].shape == (4, 8, 8, 3)


def test_pad_mask(demo_file):
    ds = make_ds(demo_file, get_pad_mask=True)
    item = ds[0]
    np.testing.assert_array_equal(
        item["obs"]["pad_mask"][:, 0], [False, False, True, True]
    )


def test_filter_key(demo_file):
    ds = make_ds(demo_file, filter_by_attribute="first_only")
    assert ds.n_demos == 1
    assert len(ds) == 5


def test_min_max_normalization_math(demo_file):
    ds = make_ds(
        demo_file, action_config={"actions": {"normalization": "min_max"}}
    )
    stats = ds.get_action_normalization_stats()
    scale = stats["actions"]["scale"][0]
    offset = stats["actions"]["offset"][0]
    # raw actions: demo0 has 0..14, demo1 has 100..108 per dim pattern
    all_acts = np.concatenate(
        [
            np.arange(5 * A).reshape(5, A),
            np.arange(3 * A).reshape(3, A) + 100,
        ]
    ).astype(np.float32)
    lo, hi = all_acts.min(0), all_acts.max(0)
    expect_scale = (hi - lo) / (0.999999 * 2)
    np.testing.assert_allclose(scale, expect_scale, rtol=1e-5)
    # normalized min should be ~-0.999999
    item = ds[0]
    norm0 = (all_acts[0] - offset) / scale
    np.testing.assert_allclose(item["actions"][2], norm0, rtol=1e-4)
    assert np.abs(item["actions"]).max() <= 1.0


def test_constant_dim_ignored(tmp_path):
    p = str(tmp_path / "const.hdf5")
    with h5py.File(p, "w") as f:
        ep = f.create_group("data/demo_0")
        ep.attrs["num_samples"] = 4
        ep.create_group("obs").create_dataset(
            "eef_pos", data=np.zeros((4, 3), np.float32)
        )
        acts = np.zeros((4, 2), np.float32)
        acts[:, 0] = np.arange(4)  # dim 1 constant
        ep.create_dataset("actions", data=acts)
    ds = SequenceDataset(
        hdf5_path=p, obs_keys=["eef_pos"], action_keys=["actions"],
        dataset_keys=["actions"],
        action_config={"actions": {"normalization": "min_max"}},
        frame_stack=1, seq_length=1, load_next_obs=False,
    )
    stats = ds.get_action_normalization_stats()
    # constant dim gets unit-ish scale, no inf/nan
    assert np.all(np.isfinite(stats["actions"]["scale"]))
    assert np.all(np.isfinite(stats["actions"]["offset"]))
    item = ds[1]
    assert np.all(np.isfinite(item["actions"]))


def test_meta_dataset_and_loader(demo_file, tmp_path):
    p2 = write_demo_file(str(tmp_path / "d2.hdf5"), demo_lengths=[4], seed=1)
    ds1 = make_ds(demo_file)
    ds2 = make_ds(p2)
    meta = MetaDataset([ds1, ds2], ds_weights=[1.0, 3.0])
    assert len(meta) == len(ds1) + len(ds2)
    # shared normalization stats propagated to members
    assert ds1.action_normalization_stats is meta.action_normalization_stats

    weights = meta.get_dataset_sampler()
    assert weights is not None and abs(weights.sum() - 1.0) < 1e-9

    loader = DataLoader(
        meta, batch_size=4, sampler_weights=weights, num_workers=2, seed=0
    )
    batches = list(loader)
    assert len(batches) == len(meta) // 4
    b = batches[0]
    assert b["obs"]["eef_pos"].shape == (4, 4, 3)
    assert b["obs"]["cam_image"].dtype == np.uint8
    assert b["actions"].shape == (4, 4, A)
    assert "lang_emb" not in b["obs"]  # no lang encoder passed


def test_cache_modes(demo_file):
    ds_low = make_ds(demo_file, hdf5_cache_mode="low_dim")
    item = ds_low[0]
    assert item["obs"]["cam_image"].shape == (4, 8, 8, 3)
    ds_all = make_ds(demo_file, hdf5_cache_mode="all")
    item2 = ds_all[0]
    np.testing.assert_array_equal(
        item2["obs"]["eef_pos"], item["obs"]["eef_pos"]
    )


def test_r2d2_dataset(tmp_path):
    """R2D2/DROID layout: one demo at file root, action/* groups."""
    from robot_manipulation_vq_vae_tpu.data import R2D2Dataset

    T = 12
    rng = np.random.RandomState(0)
    p = str(tmp_path / "r2d2.hdf5")
    with h5py.File(p, "w") as f:
        f.create_dataset(
            "action/cartesian_velocity", data=rng.randn(T, 6).astype(np.float32)
        )
        grip = np.zeros(T, np.float32)
        grip[4:8] = 1.0  # close at t=4, open at t=8
        f.create_dataset("action/gripper_position", data=grip)
        f.create_dataset(
            "observation/robot_state/cartesian_position",
            data=rng.randn(T, 6).astype(np.float32),
        )
    ObsUtils.initialize_obs_utils_with_obs_specs(
        {"obs": {"low_dim": ["robot_state/cartesian_position"]}}
    )
    ds = R2D2Dataset(
        hdf5_path=p,
        obs_keys=["robot_state/cartesian_position"],
        action_keys=["action/cartesian_velocity", "action/gripper_position"],
        dataset_keys=[],
        action_config={
            "action/cartesian_velocity": {"normalization": None},
            "action/gripper_position": {"normalization": None},
        },
        frame_stack=2,
        seq_length=3,
        load_next_obs=False,
    )
    assert len(ds) == T
    assert ds._demo_id_to_segments["demo"] == [0, 4, 8, T - 1]
    item = ds[0]
    assert item["actions"].shape == (4, 7)  # 6 + 1 dims, fs-1+seq window
    assert item["obs"]["robot_state/cartesian_position"].shape == (4, 6)

    # batched fast path matches per-item on the root-level key layout
    from robot_manipulation_vq_vae_tpu.data.loader import collate

    idx = np.arange(0, T, 2)
    batched = ds.get_batch(idx)
    if batched is not None:
        ref = collate([ds.get_item(int(i)) for i in idx])
        np.testing.assert_array_equal(batched["actions"], ref["actions"])
        np.testing.assert_array_equal(
            batched["obs"]["robot_state/cartesian_position"],
            ref["obs"]["robot_state/cartesian_position"],
        )


def test_get_batch_matches_per_item(tmp_path):
    """The batched native fast path produces exactly
    collate([get_item(i)]) across windowing configs."""
    from robot_manipulation_vq_vae_tpu.data.loader import collate

    # earlier tests in this module may have re-registered modalities
    ObsUtils.initialize_obs_utils_with_obs_specs(
        {"obs": {"low_dim": ["eef_pos"], "rgb": ["cam_image"]}}
    )

    path = str(tmp_path / "batch.hdf5")
    write_demo_file(path, demo_lengths=[9, 6, 12])
    # add next_obs so the goal_mode="last" config is exercisable
    with h5py.File(path, "a") as f:
        for ep in f["data"]:
            for k in ("eef_pos", "cam_image"):
                src = f[f"data/{ep}/obs/{k}"][()]
                f.create_dataset(
                    f"data/{ep}/next_obs/{k}", data=np.roll(src, -1, axis=0)
                )

    configs = [
        dict(seq_length=5, frame_stack=1),
        dict(seq_length=3, frame_stack=4),
        dict(seq_length=4, frame_stack=2, goal_mode="last",
             load_next_obs=True),
    ]
    for cache_mode in (None, "low_dim", "all"):
      for kw in configs:
        ds = make_ds(path, hdf5_cache_mode=cache_mode, **kw)
        rng = np.random.RandomState(0)
        idx = rng.randint(0, len(ds), 17)
        batched = ds.get_batch(idx)
        if batched is None:
            continue  # no native lib on this host - per-item path only
        ref = collate([ds.get_item(int(i)) for i in idx])
        assert sorted(batched.keys()) == sorted(ref.keys())

        def assert_tree(a, b, name):
            if isinstance(a, dict):
                assert sorted(a.keys()) == sorted(b.keys()), name
                for k in a:
                    assert_tree(a[k], b[k], f"{name}/{k}")
            else:
                np.testing.assert_array_equal(
                    np.asarray(a), np.asarray(b), err_msg=name
                )

        assert_tree(batched, ref, str(kw))


def test_meta_dataset_get_batch(tmp_path):
    """MetaDataset batched path merges member get_batch results exactly."""
    from robot_manipulation_vq_vae_tpu.data.loader import collate

    ObsUtils.initialize_obs_utils_with_obs_specs(
        {"obs": {"low_dim": ["eef_pos"], "rgb": ["cam_image"]}}
    )
    p1 = write_demo_file(str(tmp_path / "a.hdf5"), demo_lengths=[7, 5])
    p2 = write_demo_file(str(tmp_path / "b.hdf5"), demo_lengths=[9], seed=3)
    ds1 = make_ds(p1, hdf5_cache_mode="low_dim")
    ds2 = make_ds(p2, hdf5_cache_mode="low_dim")
    meta = MetaDataset([ds1, ds2], ds_weights=[1.0, 1.0])

    rng = np.random.RandomState(1)
    idx = rng.randint(0, len(meta), 13)
    batched = meta.get_batch(idx, buffers={})
    if batched is None:
        pytest.skip("native lib unavailable")
    ref = collate([meta[int(i)] for i in idx])

    def assert_tree(a, b, name):
        if isinstance(a, dict):
            assert sorted(a) == sorted(b), name
            for k in a:
                assert_tree(a[k], b[k], f"{name}/{k}")
        else:
            np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b), err_msg=name
            )

    assert_tree(batched, ref, "meta")


def test_device_prefetch(demo_file):
    """device_prefetch yields device-resident batches in order, keeping
    transfers in flight."""
    import jax

    from robot_manipulation_vq_vae_tpu.data.prefetch import device_prefetch

    ds = make_ds(demo_file)
    loader = DataLoader(ds, batch_size=2, shuffle=False, num_workers=0)
    host_batches = list(loader)
    dev_batches = list(device_prefetch(iter(loader), size=2))
    assert len(dev_batches) == len(host_batches)
    for hb, db in zip(host_batches, dev_batches):
        leaf = db["obs"]["eef_pos"]
        assert isinstance(leaf, jax.Array)
        np.testing.assert_array_equal(
            np.asarray(leaf), hb["obs"]["eef_pos"]
        )
