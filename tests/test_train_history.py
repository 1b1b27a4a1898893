"""train() returns per-epoch numeric summaries (timing buckets + losses)
— the programmatic surface flagship_smoke's steady-state mode derives
``flagship_e2e_steps_per_sec`` from (epoch 1 pays the XLA compile, the
last epoch is measured steady state)."""

from robot_manipulation_vq_vae_tpu.utils import test_utils


def test_train_returns_epoch_history():
    from robot_manipulation_vq_vae_tpu.scripts.train import train

    config = test_utils.config_from_modifier(
        base_config=test_utils.get_base_config("bc"),
        config_modifier=lambda c: c,
    )
    with config.values_unlocked():
        config.train.num_epochs = 2
        config.experiment.rollout.enabled = False
    config.lock()
    try:
        history = train(config)
    finally:
        test_utils.maybe_remove_dir(test_utils.temp_model_dir_path())

    assert [h["epoch"] for h in history] == [1, 2]
    for h in history:
        assert h["num_steps"] >= 1
        assert h["Time_Epoch"] > 0.0        # minutes (reference bucket)
        assert "Time_Train_Batch" in h
        assert "Time_Data_Loading" in h
        assert "Loss" in h
