"""Device mesh construction.

The reference trains on a single GPU (SURVEY.md section 2.5: no
torch.distributed anywhere); the TPU-native scale-out strategy is:

  * ``dp``   - batch-sharded data parallelism over ICI (primary axis; the
               ~25M-param model replicates trivially),
  * ``mp``   - optional tensor-parallel axis for the GPT FFN/attention
               kernels (exposed for larger configs; 1 by default).

Everything is plain GSPMD: computations are written once, sharded by
placing the batch with a ``NamedSharding`` over ``dp`` and (optionally)
annotating large kernels over ``mp``; XLA inserts the collectives.
"""

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices=None, mp=1, devices=None):
    """Create a ('dp', 'mp') mesh over @n_devices (default: all)."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    assert n % mp == 0, f"{n} devices not divisible by mp={mp}"
    arr = np.asarray(devices).reshape(n // mp, mp)
    return Mesh(arr, axis_names=("dp", "mp"))


def batch_sharding(mesh):
    """Shard the leading (batch) axis over dp, replicate the rest."""
    return NamedSharding(mesh, P("dp"))


def replicated(mesh):
    return NamedSharding(mesh, P())


def shard_batch(mesh, batch):
    """device_put every leaf of @batch with its leading axis over dp."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


# ---------------------------------------------------------------------------
# parameter sharding rules (tensor parallelism for the GPT backbone)
# ---------------------------------------------------------------------------

def _param_spec(path, leaf):
    """Map a param path to a PartitionSpec. GPT FFN kernels split over mp
    (column-parallel fc, row-parallel proj); attention qkv column-parallel;
    everything else replicated."""
    names = [getattr(p, "key", getattr(p, "name", "")) for p in path]
    joined = "/".join(str(n) for n in names)
    if leaf.ndim == 2:
        if "mlp_fc" in joined and names[-1] == "kernel":
            return P(None, "mp")
        if "mlp_proj" in joined and names[-1] == "kernel":
            return P("mp", None)
        if "qkv" in joined and names[-1] == "kernel":
            return P(None, "mp")
        if joined.endswith("attention/output/kernel"):
            return P("mp", None)
    return P()


def shard_params(mesh, params):
    """device_put params with TP rules over mp (replicated when mp == 1)."""

    def place(path, leaf):
        return jax.device_put(leaf, NamedSharding(mesh, _param_spec(path, leaf)))

    return jax.tree_util.tree_map_with_path(place, params)


def shard_state(mesh, state):
    """Place a full AlgoState: params via TP rules, everything else
    replicated (optimizer states follow params via the same rules)."""
    rep = replicated(mesh)
    params = shard_params(mesh, state.params)
    opt_states = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, rep), state.opt_states
    )
    aux = jax.tree_util.tree_map(lambda x: jax.device_put(x, rep), state.aux)
    return state.replace(
        params=params,
        aux=aux,
        opt_states=opt_states,
        step=jax.device_put(state.step, rep),
        rng=jax.device_put(state.rng, rep),
    )
