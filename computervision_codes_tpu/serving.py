"""Serving: precompiled pixels->logits inference sessions.

The reference has no serving story (eval scripts only); this module packages
the deployed path for production: a fixed-shape, AOT-compiled XLA executable
around the EndToEndRecognizer (or any spatial model), bf16 on the MXU,
donated input buffers, probabilities out.

Usage:
    sess = InferenceSession.create(batch=4, clip_len=256)      # random init
    sess = InferenceSession.from_checkpoint(dir, name, ...)    # trained
    probs = sess.predict(clips_uint8_or_float)                 # dict of (B,T,C)
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .data.transforms import IMAGENET_MEAN, IMAGENET_STD
from .models.pipeline import EndToEndRecognizer


@dataclass
class InferenceSession:
    """A fixed-shape compiled executable: clips -> task probabilities."""

    compiled: object
    variables: dict
    batch: int
    clip_len: int
    height: int
    width: int

    @staticmethod
    def _build(model, variables, batch, clip_len, height, width):
        mean = jnp.asarray(IMAGENET_MEAN, jnp.bfloat16)
        std = jnp.asarray(IMAGENET_STD, jnp.bfloat16)

        def forward(variables, clips):
            # accepts uint8 [0,255] or pre-normalized float
            x = clips.astype(jnp.bfloat16)
            x = jax.lax.cond(
                jnp.max(jnp.abs(x)) > 8.0,  # uint8-range input -> normalize
                lambda x: (x / 255.0 - mean) / std,
                lambda x: x,
                x,
            )
            out = model.apply(variables, x)
            return {k: jax.nn.sigmoid(out[k].astype(jnp.float32))
                    for k in ("ivt", "i", "v", "t")}

        shape = jax.ShapeDtypeStruct((batch, clip_len, height, width, 3),
                                     jnp.bfloat16)
        var_shapes = jax.tree.map(
            lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), variables)
        # AOT compile for the fixed serving shape; donate the clip buffer
        compiled = jax.jit(forward, donate_argnums=(1,)).lower(
            var_shapes, shape).compile()
        return compiled

    @classmethod
    def create(cls, batch: int = 4, clip_len: int = 256, height: int = 256,
               width: int = 448, network: str = "resnet18",
               variables: Optional[dict] = None) -> "InferenceSession":
        model = EndToEndRecognizer(network=network, dtype=jnp.bfloat16)
        if variables is None:
            variables = model.init(
                jax.random.PRNGKey(0),
                jnp.zeros((1, 4, height, width, 3), jnp.bfloat16))
        compiled = cls._build(model, variables, batch, clip_len, height,
                              width)
        return cls(compiled=compiled, variables=variables, batch=batch,
                   clip_len=clip_len, height=height, width=width)

    @classmethod
    def from_checkpoint(cls, directory: str, modelname: str, **kwargs
                        ) -> "InferenceSession":
        """Load a trained EndToEndRecognizer state (msgpack CheckpointManager
        layout) into a compiled session."""
        from .train.checkpoint import CheckpointManager
        from .train import build_sgd, create_train_state

        model = EndToEndRecognizer(dtype=jnp.bfloat16)
        template = create_train_state(
            model, build_sgd(1e-2), jax.random.PRNGKey(0),
            (jnp.zeros((1, 4, kwargs.get("height", 256),
                        kwargs.get("width", 448), 3), jnp.bfloat16),))
        state = CheckpointManager(directory, modelname).restore(template)
        return cls.create(variables={"params": state.params,
                                     **({"batch_stats": state.batch_stats}
                                        if state.batch_stats is not None
                                        else {})}, **kwargs)

    def predict(self, clips) -> Dict[str, np.ndarray]:
        clips = jnp.asarray(clips, jnp.bfloat16)
        if clips.shape != (self.batch, self.clip_len, self.height,
                           self.width, 3):
            raise ValueError(
                f"session compiled for shape {(self.batch, self.clip_len, self.height, self.width, 3)}, "
                f"got {clips.shape}")
        out = self.compiled(self.variables, clips)
        return {k: np.asarray(v) for k, v in out.items()}
