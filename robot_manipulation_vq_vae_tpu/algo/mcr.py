"""MCR - Manipulation-Centric Representation BC (reference
``robomimic/algo/mcr_main.py:26-959`` + the vendored ``robomimic/algo/mcr``
pretraining side-project).

The MCR *policy* is the BC family with an (optionally frozen, optionally
MCR-pretrained) ResNet-50 visual encoder. The factory routing mirrors the BC
routing (reference mcr_main.py:26-76). Pretrained MCR weights are a gated
local artifact (zero-egress): point ``RMVQ_MCR_CKPT`` at a converted numpy
checkpoint to warm-start the visual trunk; otherwise the ResNet-50 trains
from scratch. The representation-*pretraining* loop that produces such
trunks (reference ``mcr/train_representation.py``) is ported in
``algo/mcr_pretrain.py`` + ``scripts/train_mcr_representation.py``; its
``export_trunk`` writes exactly the pickle this warm-start consumes.
"""

import os

import jax

from robot_manipulation_vq_vae_tpu.algo.algo import register_algo_factory_func
from robot_manipulation_vq_vae_tpu.algo.bc import (
    BC,
    BC_GMM,
    BC_RNN,
    BC_RNN_GMM,
    BC_Transformer,
    BC_Transformer_GMM,
)


@register_algo_factory_func("mcr")
def algo_config_to_class(algo_config):
    """Reference mcr_main.py:26-76 (BC-style routing)."""
    gmm_enabled = "gmm" in algo_config and algo_config.gmm.enabled
    rnn_enabled = algo_config.rnn.enabled
    transformer_enabled = algo_config.transformer.enabled
    if gmm_enabled:
        if rnn_enabled:
            return MCR_RNN_GMM, {}
        if transformer_enabled:
            return MCR_Transformer_GMM, {}
        return MCR_GMM, {}
    if rnn_enabled:
        return MCR_RNN, {}
    if transformer_enabled:
        return MCR_Transformer, {}
    return MCR, {}


class _MCRWarmStartMixin:
    """Loads converted MCR ResNet-50 weights into the rgb encoder trunks on
    first state init, when ``RMVQ_MCR_CKPT`` points at a numpy pytree."""

    def ensure_state(self, batch):
        first_init = self.state is None
        super().ensure_state(batch)
        ckpt = os.environ.get("RMVQ_MCR_CKPT")
        if first_init and ckpt and os.path.isfile(ckpt):
            import pickle

            with open(ckpt, "rb") as f:
                trunk = pickle.load(f)

            def graft(tree, path=()):
                # replace any subtree named "backbone" whose structure
                # matches the pretrained trunk
                if isinstance(tree, dict):
                    out = {}
                    for k, v in tree.items():
                        if k == "backbone" and isinstance(v, dict):
                            try:
                                out[k] = jax.tree_util.tree_map(
                                    lambda a, b: b, v, trunk
                                )
                                continue
                            except Exception:
                                pass
                        out[k] = graft(v, path + (k,))
                    return out
                return tree

            self.state = self.state.replace(params=graft(self.state.params))
            print(f"[MCR] warm-started visual trunks from {ckpt}")


class MCR(_MCRWarmStartMixin, BC):
    pass


class MCR_GMM(_MCRWarmStartMixin, BC_GMM):
    pass


class MCR_RNN(_MCRWarmStartMixin, BC_RNN):
    pass


class MCR_RNN_GMM(_MCRWarmStartMixin, BC_RNN_GMM):
    pass


class MCR_Transformer(_MCRWarmStartMixin, BC_Transformer):
    pass


class MCR_Transformer_GMM(_MCRWarmStartMixin, BC_Transformer_GMM):
    pass
