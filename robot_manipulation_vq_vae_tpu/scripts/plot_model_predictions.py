"""Plot per-dimension actual-vs-predicted action traces for sampled
trajectories of a trained checkpoint, plus MSE / accuracy@threshold stats.

Reference ``robomimic/scripts/plot_model_predictions.py:1-213`` is a
hardcoded research script (model paths in a dict at module scope); this is
the same capability as a proper CLI:

    python -m robot_manipulation_vq_vae_tpu.scripts.plot_model_predictions \
        --ckpt model.pth --output_dir figs/ [--num_traj 2]

Per sampled trajectory it steps the policy over the demo's windows, plots
actual vs predicted traces per action dim (with a sampled image strip when
image obs exist), and writes ``output.txt`` with per-trajectory MSE,
per-dimension averages, and accuracy@{1e-3,1e-4,1e-5}.
"""

import argparse
import json
import os

import numpy as np


def _demo_indices(dataset, demo_id):
    """All window indices belonging to one demo, in time order."""
    return sorted(
        i for i, d in dataset._index_to_demo_id.items() if d == demo_id
    )


def predict_trajectory(model, dataset, demo_id, image_keys=()):
    """Step the policy over one demo; returns (actual [T,A], pred [T,A],
    images {key: [frames]})."""
    from robot_manipulation_vq_vae_tpu.data.loader import collate

    actual, pred = [], []
    images = {k: [] for k in image_keys}
    for idx in _demo_indices(dataset, demo_id):
        item = dataset[idx]
        batch = model.process_batch_for_training(collate([item]))
        for k in image_keys:
            frame = np.asarray(batch["obs"][k][0])
            images[k].append(frame[-1] if frame.ndim == 4 else frame)
        p = np.asarray(model._predict_actions_for_mse(batch))
        a = np.asarray(batch["actions"])
        ac_dim = a.shape[-1]
        actual.append(a.reshape(-1, ac_dim)[0])
        pred.append(p.reshape(-1, ac_dim)[0])
    return np.asarray(actual), np.asarray(pred), images


def run_plot(model, trainset, validset, output_dir, num_traj=2,
             action_names=None, seed=0):
    """Core loop (reference :95-213): sample trajectories per split, plot,
    and write MSE stats. Returns the stats dict."""
    from robot_manipulation_vq_vae_tpu.utils import vis_utils as VisUtils

    rng = np.random.RandomState(seed)
    mapping = {"training": trainset}
    if validset is not None:
        mapping["validation"] = validset

    all_stats = {}
    for split, dataset in mapping.items():
        datasets = getattr(dataset, "datasets", [dataset])
        save_dir = os.path.join(output_dir, split)
        os.makedirs(save_dir, exist_ok=True)

        mse_per_traj, names = [], []
        all_actual, all_pred = [], []
        jobs = []
        for d in datasets:
            demos = list(d._demo_id_to_start_indices.keys())
            take = min(num_traj, len(demos))
            for ep in rng.choice(demos, take, replace=False):
                jobs.append((d, ep))

        for d, ep in jobs:
            image_keys = [
                k for k in d.obs_keys if k.endswith("_image")
            ]
            actual, pred, images = predict_trajectory(
                model, d, ep, image_keys=image_keys
            )
            all_actual.append(actual)
            all_pred.append(pred)
            mse_dims = np.mean((actual - pred) ** 2, axis=0)
            mse_per_traj.append(mse_dims)
            names.append(f"{os.path.basename(d.hdf5_path)}:{ep}")

            dims = actual.shape[-1]
            labels = (
                list(action_names)
                if action_names else [f"a{i}" for i in range(dims)]
            )
            strip = None
            if image_keys:
                frames = images[image_keys[0]]
                step = max(len(frames) // 15, 1)
                strip = [
                    VisUtils.image_tensor_to_numpy(f)
                    for f in frames[::step]
                ]
            VisUtils.make_model_prediction_plot(
                hdf5_path=d.hdf5_path,
                save_path=os.path.join(save_dir, f"comparison_{ep}.png"),
                action_names=labels,
                actual_actions=actual,
                predicted_actions=pred,
                images=strip,
            )

        flat_a = np.concatenate(all_actual, axis=0)
        flat_p = np.concatenate(all_pred, axis=0)
        mse = (flat_a - flat_p) ** 2
        stats = {f"{split}_action_mse_error": float(np.mean(mse))}
        for thr in np.logspace(-3, -5, num=3).tolist():
            stats[f"{split}_action_accuracy@{thr}"] = float(np.mean(mse < thr))
        all_stats.update(stats)

        avg_per_dim = np.mean(np.asarray(mse_per_traj), axis=0)
        with open(os.path.join(save_dir, "output.txt"), "w") as f:
            f.write("MSE per trajectory:\n")
            for name, dims in zip(names, mse_per_traj):
                f.write(f"{name} {' '.join(map(str, dims))}\n")
            f.write(
                f"\nAverage MSE across trajectories per dimension: "
                f"{avg_per_dim}\n"
            )
            f.write(f"\nMSE log: {json.dumps(stats, indent=2)}\n")
    return all_stats


def main(args):
    from robot_manipulation_vq_vae_tpu.utils import file_utils as FileUtils
    from robot_manipulation_vq_vae_tpu.utils import train_utils as TrainUtils

    policy, ckpt_dict = FileUtils.policy_from_checkpoint(
        ckpt_path=args.ckpt, verbose=True
    )
    config, _ = FileUtils.config_from_checkpoint(ckpt_dict=ckpt_dict)
    if args.dataset is not None:
        with config.values_unlocked():
            config.train.data = [{"path": args.dataset}]
    shape_meta = ckpt_dict["shape_metadata"]
    trainset, validset = TrainUtils.load_data_for_training(
        config, obs_keys=shape_meta["all_obs_keys"]
    )
    stats = run_plot(
        policy.policy, trainset, validset, args.output_dir,
        num_traj=args.num_traj, action_names=args.action_names,
    )
    print(json.dumps(stats, indent=2))
    return stats


def build_parser():
    parser = argparse.ArgumentParser()
    parser.add_argument("--ckpt", type=str, required=True,
                        help="path to trained checkpoint")
    parser.add_argument("--output_dir", type=str, required=True,
                        help="directory for figures + output.txt")
    parser.add_argument("--dataset", type=str, default=None,
                        help="override the checkpoint's dataset path")
    parser.add_argument("--num_traj", type=int, default=2,
                        help="trajectories to sample per dataset")
    parser.add_argument("--action_names", type=str, nargs="+", default=None,
                        help="custom per-dimension action labels")
    return parser


if __name__ == "__main__":
    main(build_parser().parse_args())
