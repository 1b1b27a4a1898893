"""FAST action-tokenizer modality (``fast_enabled``).

The reference pipeline (``robomimic/models/obs_nets.py:1199-1212,1308-1336``)
tokenizes prompt action chunks with the pretrained HuggingFace
``physical-intelligence/fast`` processor, stringifies the token ids, embeds
them with the frozen CLIP ViT-B/32 *text* encoder, L2-normalizes, resamples
to seq_len, and projects 512 -> obs-feature-dim with a small MLP.

Both external artifacts (FAST processor + CLIP) are frozen/no-grad in the
reference, so on TPU this is a **host-side preprocessing stage**: the
tokenize+CLIP encode happens on CPU (via ``jax.experimental.io_callback``
inside a jitted step, or as an offline precompute), and only the trainable
MLP projection runs on device.

Artifact loading is gated (zero-egress environments cannot download them):
construct with ``FastHostEncoder(fast_processor_dir, clip_model_dir)`` when
the artifacts are local, or inject deterministic components with
``FastHostEncoder.from_components(processor, clip_encode_fn)`` (used by the
test suite and by any caller that precomputes CLIP latents offline).
"""

import functools

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from robot_manipulation_vq_vae_tpu.utils.initializers import (
    torch_linear_kernel_init,
)

CLIP_TEXT_DIM = 512


def resample_latents(latents, seq_len):
    """Resample [D, dim] rows to exactly [seq_len, dim].

    Reference semantics (``obs_nets.py:1322-1332``): if D >= seq_len, take
    rows at ``linspace(0, D-1, seq_len)`` truncated to int (torch
    ``.long()``); otherwise zero-pad below D.
    """
    latents = np.asarray(latents)
    d, dim = latents.shape
    if d >= seq_len:
        # float32 linspace to reproduce torch.linspace(...).long() exactly:
        # fp64 rounding can land just above an integer where fp32 lands
        # just below, selecting a different row
        idx = np.linspace(0, d - 1, seq_len, dtype=np.float32).astype(
            np.int64
        )
        return latents[idx]
    out = np.zeros((seq_len, dim), latents.dtype)
    out[:d] = latents
    return out


class FastProjection(nn.Module):
    """The trainable part: CLIP latent [.., 512] -> obs feature dim
    (reference ``obs_nets.py:1206-1212``)."""

    output_dim: int

    @nn.compact
    def __call__(self, clip_latents):
        h = nn.Dense(64, kernel_init=torch_linear_kernel_init, name="fc1")(
            clip_latents
        )
        h = jax.nn.gelu(h, approximate=False)
        h = nn.Dense(128, kernel_init=torch_linear_kernel_init, name="fc2")(h)
        h = jax.nn.gelu(h, approximate=False)
        return nn.Dense(
            self.output_dim, kernel_init=torch_linear_kernel_init, name="fc3"
        )(h)


class FastHostEncoder:
    """Host-side FAST tokenize + CLIP text encode (frozen, no-grad).

    Mirrors reference behavior: per sample, tokenize the [T, A] action chunk,
    CLIP-encode the stringified token ids, L2-normalize, then resample the
    D token embeddings to exactly seq_len rows (reference
    ``obs_nets.py:1308-1335``).

    Two construction paths:

    - ``FastHostEncoder(fast_processor_dir, clip_model_dir)`` loads the HF
      artifacts (network-free if the dirs are local).
    - ``FastHostEncoder.from_components(processor, clip_encode_fn)`` injects
      the two frozen stages directly: ``processor(actions_1ta) -> [token
      ids]`` (batch-of-1 call, reference ``obs_nets.py:1312``) and
      ``clip_encode_fn(texts) -> [D, 512]`` float array (unnormalized).
    """

    def __init__(self, fast_processor_dir, clip_model_dir=None):
        try:
            from transformers import AutoProcessor
        except ImportError as e:  # pragma: no cover
            raise ImportError(
                "FAST modality requires HuggingFace transformers"
            ) from e
        self._processor = AutoProcessor.from_pretrained(
            fast_processor_dir, trust_remote_code=True
        )
        try:
            from transformers import CLIPTokenizer, CLIPTextModelWithProjection

            src = clip_model_dir or "openai/clip-vit-base-patch32"
            clip_tok = CLIPTokenizer.from_pretrained(src)
            clip_model = CLIPTextModelWithProjection.from_pretrained(src)
            clip_model.eval()
        except Exception as e:  # pragma: no cover
            raise RuntimeError(
                "FAST modality requires a local CLIP text model "
                "(zero-egress environments must pass clip_model_dir)"
            ) from e

        def clip_encode(texts):
            import torch

            inputs = clip_tok(texts, return_tensors="pt", padding=True)
            with torch.no_grad():
                latents = clip_model(**inputs).text_embeds  # [D, 512]
            return latents.numpy().astype(np.float32)

        self._clip_encode = clip_encode

    @classmethod
    def from_components(cls, processor, clip_encode_fn):
        self = cls.__new__(cls)
        self._processor = processor
        self._clip_encode = clip_encode_fn
        return self

    def encode_chunk(self, actions_ta, seq_len):
        """[T, A] float array -> [seq_len, 512] float32."""
        tokens = self._processor(np.asarray(actions_ta)[None])[0]
        texts = [str(t) for t in tokens]
        latents = np.asarray(self._clip_encode(texts), np.float32)
        latents = latents / np.linalg.norm(latents, axis=-1, keepdims=True)
        return resample_latents(latents, seq_len).astype(np.float32)

    def encode_batch(self, actions_bta, seq_len):
        """[B, T, A] -> [B, seq_len, 512]."""
        return np.stack(
            [self.encode_chunk(a, seq_len) for a in np.asarray(actions_bta)]
        )


class FastActionTokenizer:
    """End-to-end FAST modality: host encode (io_callback) + device MLP.

    Use ``clip_latents_io_callback(actions)`` inside a jitted step to get
    [B, S, 512] latents for the device-side :class:`FastProjection`.
    """

    def __init__(self, output_dim, fast_processor_dir=None, clip_model_dir=None,
                 seq_len=10, host_encoder=None):
        if host_encoder is not None:
            self.host = host_encoder
        else:
            self.host = FastHostEncoder(fast_processor_dir, clip_model_dir)
        self.projection = FastProjection(output_dim=output_dim)
        self.seq_len = seq_len

    def clip_latents_io_callback(self, actions_bta):
        """Bridge the frozen host encoder into a jitted computation."""
        b = actions_bta.shape[0]
        result_shape = jax.ShapeDtypeStruct(
            (b, self.seq_len, CLIP_TEXT_DIM), jnp.float32
        )
        return jax.experimental.io_callback(
            functools.partial(self.host.encode_batch, seq_len=self.seq_len),
            result_shape,
            actions_bta,
        )
