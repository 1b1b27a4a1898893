"""Optimizer/scheduler factories (optax).

Maps the reference ``optim_params`` config blocks
(``robomimic/utils/torch_utils.py:90-195``) onto optax transforms. One
deliberate fidelity choice: the reference steps LR schedulers once per
*gradient step* (``icl.py:1209-1212``), so every schedule here is expressed
in steps, including "multistep" whose config milestones are nominally epochs.
"""

import optax


def lr_schedule_from_optim_params(optim_params, num_training_steps=None):
    lr = float(optim_params["learning_rate"]["initial"])
    sched_type = optim_params["learning_rate"].get(
        "scheduler_type", "constant_with_warmup"
    )
    warmup = int(optim_params["learning_rate"].get("num_warmup_steps", 10000))
    decay_factor = float(optim_params["learning_rate"].get("decay_factor", 1.0))

    if sched_type is None or sched_type == "constant":
        return lr
    if sched_type == "constant_with_warmup":
        # HF constant_with_warmup: linear 0 -> lr over warmup, then constant
        return optax.join_schedules(
            [optax.linear_schedule(0.0, lr, warmup), optax.constant_schedule(lr)],
            [warmup],
        )
    if sched_type == "linear":
        # torch LinearLR(start=1, end=decay_factor, total_iters=warmup)
        return optax.join_schedules(
            [
                optax.linear_schedule(lr, lr * decay_factor, warmup),
                optax.constant_schedule(lr * decay_factor),
            ],
            [warmup],
        )
    if sched_type == "multistep":
        milestones = list(optim_params["learning_rate"].get("epoch_schedule", []))
        assert len(milestones) > 0

        def sched(step):
            factor = 1.0
            for m in milestones:
                factor = factor * (decay_factor ** (step >= m))
            return lr * factor

        return sched
    if sched_type == "cosine":
        assert num_training_steps is not None
        return optax.warmup_cosine_decay_schedule(
            0.0, lr, warmup, num_training_steps, end_value=0.0
        )
    raise ValueError(f"Invalid LR scheduler type: {sched_type}")


def optimizer_from_optim_params(optim_params, max_grad_norm=None,
                                num_training_steps=None):
    """adam/adamw (+L2) with optional global-norm clipping folded into the
    chain. Returns an optax.GradientTransformation."""
    opt_type = optim_params.get("optimizer_type", "adam")
    weight_decay = float(optim_params.get("regularization", {}).get("L2", 0.0))
    schedule = lr_schedule_from_optim_params(optim_params, num_training_steps)

    if opt_type == "adam":
        # torch Adam's weight_decay is L2-added-to-grad, not decoupled
        base = (
            optax.chain(
                optax.add_decayed_weights(weight_decay), optax.adam(schedule)
            )
            if weight_decay > 0
            else optax.adam(schedule)
        )
    elif opt_type == "adamw":
        base = optax.adamw(schedule, weight_decay=weight_decay)
    else:
        raise ValueError(f"unknown optimizer type {opt_type}")

    if max_grad_norm is not None:
        return optax.chain(optax.clip_by_global_norm(max_grad_norm), base)
    return base
