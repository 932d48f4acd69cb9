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

import warnings
from dataclasses import dataclass
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .data.transforms import IMAGENET_MEAN, IMAGENET_STD
from .models.pipeline import EndToEndRecognizer


def tcn_receptive_field(num_layers_pg: int, num_layers_r: int,
                        num_refinements: int) -> int:
    """Causal receptive field (frames) of TemporalTCN: each dilated layer
    reaches 2*d back (taps at -2d, -d, 0), dilations 2^i per stage, so a
    stage of L layers adds 2*(2^L - 1); FPN laterals are 1x1 and add
    nothing. Default config (11 + 3x10): 1 + 4094 + 3*2046 = 10233."""
    return (1 + 2 * (2 ** num_layers_pg - 1)
            + num_refinements * 2 * (2 ** num_layers_r - 1))


def _default_calibration(key, shape, dtype):
    """Representative-by-construction int8 calibration batch: uniform
    [0, 255] pixels through the ImageNet normalization. A standard-normal
    stand-in has absmax ~2x the real normalized-pixel range over many
    samples, silently halving first-layer quantization resolution
    (ADVICE r2), and its deeper-layer statistics need not resemble frames."""
    mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)
    std = jnp.asarray(IMAGENET_STD, jnp.float32)
    pix = jax.random.uniform(key, shape, jnp.float32, 0.0, 255.0)
    return ((pix / 255.0 - mean) / std).astype(dtype)


@dataclass
class InferenceSession:
    """A fixed-shape compiled executable: clips -> task probabilities."""

    compiled: object
    variables: dict
    batch: int
    clip_len: int
    height: int
    width: int
    # (jitted forward, var ShapeDtypeStructs) kept for export(); None for
    # sessions restored via load_exported or built over a mesh
    exportable: Optional[tuple] = None

    @staticmethod
    def _build(model, variables, batch, clip_len, height, width,
               apply_fn=None, mesh=None):
        mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)
        std = jnp.asarray(IMAGENET_STD, jnp.float32)
        apply_fn = apply_fn or model.apply

        def forward(variables, clips, normalize):
            # ``normalize`` is static: uint8 inputs are normalized on device
            # (decided by dtype at predict() time — NOT by a data-dependent
            # heuristic, which would misclassify near-black frames)
            x = clips.astype(jnp.float32)
            if normalize:
                x = (x / 255.0 - mean) / std
            out = apply_fn(variables, x.astype(jnp.bfloat16))
            return {k: jax.nn.sigmoid(out[k].astype(jnp.float32))
                    for k in ("ivt", "i", "v", "t")}

        var_shapes = jax.tree.map(
            lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), variables)
        if mesh is not None:
            # multi-chip batch parallelism: clips sharded over the data
            # axis, variables replicated — per-clip inference is
            # embarrassingly parallel, so throughput scales with chips and
            # no collective appears in the program (GSPMD just partitions)
            from jax.sharding import NamedSharding, PartitionSpec

            n_data = mesh.shape.get("data", 1)
            if batch % n_data:
                raise ValueError(f"batch {batch} must divide the mesh data "
                                 f"axis ({n_data})")
            rep = NamedSharding(mesh, PartitionSpec())
            dat = NamedSharding(mesh, PartitionSpec("data"))
            jitted = jax.jit(
                forward, static_argnums=(2,), donate_argnums=(1,),
                in_shardings=(jax.tree.map(lambda a: rep, variables), dat),
                out_shardings=dat)
        else:
            jitted = jax.jit(forward, static_argnums=(2,),
                             donate_argnums=(1,))
        # AOT compile both input dtypes for the fixed serving shape
        compiled = {}
        for dtype, normalize in ((jnp.uint8, True), (jnp.bfloat16, False)):
            shape = jax.ShapeDtypeStruct(
                (batch, clip_len, height, width, 3), dtype)
            compiled[normalize] = jitted.lower(var_shapes, shape,
                                               normalize).compile()
        return compiled, (None if mesh is not None
                          else (jitted, var_shapes))

    @classmethod
    def create(cls, batch: int = 4, clip_len: int = 256, height: int = 256,
               width: int = 448, network: str = "resnet18",
               variables: Optional[dict] = None, quantize: bool = False,
               calibrate_clips=None, mesh=None,
               s2d_stem: bool = False,
               fused_stem: bool = False) -> "InferenceSession":
        """``quantize=True`` serves the int8-PTQ backbone (models/quantized:
        +25% throughput on-chip with calibrated static scales). Pass
        ``calibrate_clips`` — NORMALIZED representative frames (B,T,H,W,3)
        — to bake the static scales; without them a uniform-pixel batch
        passed through the ImageNet normalization stands in (matches the
        input range; real frames are strictly better, and the mAP-drift
        <= 0.008 guarantee was measured with representative data)."""
        model = EndToEndRecognizer(network=network, dtype=jnp.bfloat16,
                                   s2d_stem=s2d_stem)
        if variables is None:
            variables = model.init(
                jax.random.PRNGKey(0),
                jnp.zeros((1, 4, height, width, 3), jnp.bfloat16))
        apply_fn = None
        if quantize:
            from .models.quantized import make_int8_e2e

            if calibrate_clips is None:
                calibrate_clips = _default_calibration(
                    jax.random.PRNGKey(7), (1, 8, height, width, 3),
                    jnp.bfloat16)
            fn, qvars = make_int8_e2e(model, variables,
                                      calibrate_clips=calibrate_clips,
                                      s2d_stem=s2d_stem,
                                      fused_stem=fused_stem)
            variables, apply_fn = qvars, fn
        compiled, exportable = cls._build(model, variables, batch, clip_len,
                                          height, width, apply_fn=apply_fn,
                                          mesh=mesh)
        return cls(compiled=compiled, variables=variables, batch=batch,
                   clip_len=clip_len, height=height, width=width,
                   exportable=exportable)

    @classmethod
    def from_checkpoint(cls, directory: str, modelname: str, **kwargs
                        ) -> "InferenceSession":
        """Load a trained EndToEndRecognizer state (msgpack CheckpointManager
        layout) into a compiled session."""
        from .train.checkpoint import CheckpointManager
        from .train import build_sgd, create_train_state

        model = EndToEndRecognizer(
            network=kwargs.get("network", "resnet18"), dtype=jnp.bfloat16)
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
        normalize = np.asarray(clips).dtype == np.uint8
        clips = jnp.asarray(clips, jnp.uint8 if normalize else jnp.bfloat16)
        if clips.shape != (self.batch, self.clip_len, self.height,
                           self.width, 3):
            raise ValueError(
                f"session compiled for shape {(self.batch, self.clip_len, self.height, self.width, 3)}, "
                f"got {clips.shape}")
        out = self.compiled[normalize](self.variables, clips)
        return {k: np.asarray(v) for k, v in out.items()}

    def export(self, path: str) -> str:
        """Serialize the serving program + weights as a deployment artifact.

        Writes ``fwd_norm{0,1}.jaxexport`` (jax.export StableHLO modules —
        versioned, loadable by a newer jax without retracing the model
        code), ``variables.msgpack`` and ``meta.json`` to ``path``. The
        reference's deployment artifact is a bare state_dict .pth that
        still needs the model code (readme.md:96-106); this is the
        TPU-native equivalent of a frozen servable. Restore with
        ``InferenceSession.load_exported(path)``."""
        import json
        import os

        from flax import serialization
        from jax import export as jexport

        if self.exportable is None:
            raise ValueError("session is not exportable (mesh-sharded or "
                             "itself restored from an export)")
        jitted, var_shapes = self.exportable
        os.makedirs(path, exist_ok=True)
        for normalize in (True, False):
            dtype = jnp.uint8 if normalize else jnp.bfloat16
            shape = jax.ShapeDtypeStruct(
                (self.batch, self.clip_len, self.height, self.width, 3),
                dtype)
            exp = jexport.export(jitted)(var_shapes, shape, normalize)
            with open(os.path.join(path,
                                   f"fwd_norm{int(normalize)}.jaxexport"),
                      "wb") as fh:
                fh.write(exp.serialize())
        with open(os.path.join(path, "variables.msgpack"), "wb") as fh:
            fh.write(serialization.to_bytes(self.variables))
        with open(os.path.join(path, "meta.json"), "w") as fh:
            json.dump({"batch": self.batch, "clip_len": self.clip_len,
                       "height": self.height, "width": self.width}, fh)
        return path

    @classmethod
    def load_exported(cls, path: str) -> "InferenceSession":
        """Restore an exported servable — no model code retracing."""
        import json
        import os

        from flax import serialization
        from jax import export as jexport

        meta = json.load(open(os.path.join(path, "meta.json")))
        blob = open(os.path.join(path, "variables.msgpack"), "rb").read()
        variables = serialization.msgpack_restore(bytearray(blob))
        compiled = {}
        for normalize in (True, False):
            with open(os.path.join(path,
                                   f"fwd_norm{int(normalize)}.jaxexport"),
                      "rb") as fh:
                exp = jexport.deserialize(bytearray(fh.read()))
            compiled[normalize] = (lambda e: lambda v, c: e.call(v, c))(exp)
        return cls(compiled=compiled, variables=variables, **meta)


@dataclass
class StreamingSession:
    """Online per-frame inference: push one frame (per stream), get the
    current probabilities.

    Live surgical video needs per-frame LATENCY, not batch throughput — a
    mode the reference has no story for (its eval scripts are offline-only).
    The session keeps a device-resident ring buffer of the last ``context``
    backbone features; each ``push`` runs ONE compiled program: backbone on
    the new frame(s), shift-append into the buffer, causal TCN over the
    buffer, last-position probabilities out. Because every temporal layer
    is causal (front-padded; EndToEndRecognizer(causal=True)), the stream
    output at step t is EXACTLY the offline output at position t once t
    reaches the TCN's receptive field — PROVIDED ``context`` >= that
    receptive field (unit-tested equivalence, tests/test_serving.py).
    Otherwise the ring buffer truncates history and the output is a
    sliding-window approximation; ``create`` computes the receptive field
    from the layer config (``tcn_receptive_field``) and warns when
    ``context`` falls short — the default TCN (11 + 3x10 layers) reaches
    10,233 frames, far past the default context=256, which at 25 fps
    covers the last ~10 s of video (empirically where almost all causal
    signal lives; pass a larger ``context`` to trade latency for reach).

    ``streams`` > 1 serves that many INDEPENDENT videos in lockstep (one
    operating room per stream): each push takes (S, H, W, 3) — one new
    frame per stream — and batches the backbone/TCN over S, which uses
    the MXU far better than batch-1; streams never mix (pure batching).
    """

    compiled: object
    variables: dict
    buffer: object  # (streams, context, D) device array, rolls left
    context: int
    height: int
    width: int
    streams: int = 1
    receptive_field: int = 0
    # per-stream push counts (np int array, shape (streams,)) — judged
    # against receptive_field to know when a stream's output is exact
    frames_seen_per_stream: Optional[np.ndarray] = None
    # (jitted step, var ShapeDtypeStructs, buffer ShapeDtypeStruct) kept
    # for export(); None when restored via load_exported
    exportable: Optional[tuple] = None

    def __post_init__(self):
        if self.frames_seen_per_stream is None:
            self.frames_seen_per_stream = np.zeros(self.streams, np.int64)

    @property
    def frames_seen(self) -> int:
        """MINIMUM frames seen across streams (back-compat scalar view —
        conservative: it reaches receptive_field only once EVERY stream's
        output is exact)."""
        return int(self.frames_seen_per_stream.min())

    @classmethod
    def create(cls, context: int = 256, height: int = 256, width: int = 448,
               network: str = "resnet18", variables: Optional[dict] = None,
               num_layers_pg: int = 11, num_layers_r: int = 10,
               num_refinements: int = 3, num_f_maps: int = 512,
               dtype=jnp.bfloat16, quantize: bool = False,
               calibrate_frames=None, streams: int = 1,
               fused_stem: bool = False) -> "StreamingSession":
        """``quantize=True`` runs the backbone int8 per frame (calibrated
        static scales from ``calibrate_frames`` — NORMALIZED (N,H,W,3);
        a standard-normal batch stands in when absent). Accuracy-guarded
        like the batch path (mAP moves <= 0.008 on a trained student,
        scripts/int8_accuracy_check.py)."""
        from .models.quantized import calibrate_resnet, quantize_resnet
        from .models.resnet import VARIANTS as RESNET_VARIANTS, ResNet
        from .models.resnet import feature_dim
        from .models.tcn import TemporalTCN

        rf = tcn_receptive_field(num_layers_pg, num_layers_r,
                                 num_refinements)
        if context < rf:
            warnings.warn(
                f"StreamingSession context={context} < TCN receptive field "
                f"{rf}: outputs are a sliding-window approximation of the "
                f"offline model, not exact (pass context>={rf} for "
                f"exactness)", stacklevel=2)

        model = EndToEndRecognizer(
            network=network, causal=True, num_layers_pg=num_layers_pg,
            num_layers_r=num_layers_r, num_refinements=num_refinements,
            num_f_maps=num_f_maps, dtype=dtype)
        if variables is None:
            variables = model.init(
                jax.random.PRNGKey(0),
                jnp.zeros((1, 4, height, width, 3), dtype))
        sizes, block = RESNET_VARIANTS[network]
        backbone = ResNet(stage_sizes=sizes, block_cls=block, dtype=dtype,
                          fused_stem=fused_stem)
        qp = None
        if quantize:
            if calibrate_frames is None:
                calibrate_frames = _default_calibration(
                    jax.random.PRNGKey(7), (4, height, width, 3), dtype)
            qp = quantize_resnet(variables["params"]["backbone"],
                                 variables["batch_stats"]["backbone"])
            qp = calibrate_resnet(qp, jnp.asarray(calibrate_frames, dtype),
                                  sizes, dtype=dtype)
        tcn = TemporalTCN(num_layers_pg=num_layers_pg,
                          num_layers_r=num_layers_r,
                          num_refinements=num_refinements,
                          num_f_maps=num_f_maps, causal=True,
                          channel_dropout=0.0, dtype=dtype)
        mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)
        std = jnp.asarray(IMAGENET_STD, jnp.float32)

        if qp is not None:
            from .models.quantized import quantized_resnet_apply
            from .models.resnet import BasicBlock

            blk = "basic" if RESNET_VARIANTS[network][1] is BasicBlock \
                else "bottleneck"
            variables = dict(variables, q_backbone=qp)

        def step(variables, buffer, frame, normalize):
            x = frame.astype(jnp.float32)
            if normalize:
                x = (x / 255.0 - mean) / std
            if "q_backbone" in variables:  # static: dict structure
                feat = quantized_resnet_apply(
                    variables["q_backbone"], x.astype(dtype), sizes,
                    block=blk, dtype=dtype,
                    fused_stem=fused_stem)["pooled"]
            else:
                bvars = {"params": variables["params"]["backbone"]}
                if "batch_stats" in variables:
                    bvars["batch_stats"] = \
                        variables["batch_stats"]["backbone"]
                feat = backbone.apply(bvars, x.astype(dtype))["pooled"]
            buffer = jnp.concatenate([buffer[:, 1:], feat[:, None]], axis=1)
            out = tcn.apply({"params": variables["params"]["tcn"]}, buffer)
            probs = {k: jax.nn.sigmoid(out[k][0][:, -1].astype(jnp.float32))
                     for k in ("ivt", "i", "v", "t")}
            return buffer, probs

        var_shapes = jax.tree.map(
            lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), variables)
        dim = feature_dim(network)
        buf_shape = jax.ShapeDtypeStruct((streams, context, dim), dtype)
        jitted = jax.jit(step, static_argnums=(3,), donate_argnums=(1,))
        compiled = {}
        for in_dtype, normalize in ((jnp.uint8, True), (dtype, False)):
            fshape = jax.ShapeDtypeStruct((streams, height, width, 3),
                                          in_dtype)
            compiled[normalize] = jitted.lower(
                var_shapes, buf_shape, fshape, normalize).compile()
        buffer = jnp.zeros((streams, context, dim), dtype)
        return cls(compiled=compiled, variables=variables, buffer=buffer,
                   context=context, height=height, width=width,
                   streams=streams, receptive_field=rf,
                   frames_seen_per_stream=np.zeros(streams, np.int64),
                   exportable=(jitted, var_shapes, buf_shape))

    @classmethod
    def from_checkpoint(cls, directory: str, modelname: str, **kwargs
                        ) -> "StreamingSession":
        """Load a trained EndToEndRecognizer state (msgpack CheckpointManager
        layout) into a compiled streaming session (same restore path as
        InferenceSession.from_checkpoint)."""
        from .train.checkpoint import CheckpointManager
        from .train import build_sgd, create_train_state

        model = EndToEndRecognizer(
            network=kwargs.get("network", "resnet18"),
            num_layers_pg=kwargs.get("num_layers_pg", 11),
            num_layers_r=kwargs.get("num_layers_r", 10),
            num_refinements=kwargs.get("num_refinements", 3),
            num_f_maps=kwargs.get("num_f_maps", 512), dtype=jnp.bfloat16)
        template = create_train_state(
            model, build_sgd(1e-2), jax.random.PRNGKey(0),
            (jnp.zeros((1, 4, kwargs.get("height", 256),
                        kwargs.get("width", 448), 3), jnp.bfloat16),))
        state = CheckpointManager(directory, modelname).restore(template)
        return cls.create(variables={"params": state.params,
                                     **({"batch_stats": state.batch_stats}
                                        if state.batch_stats is not None
                                        else {})}, **kwargs)

    def push(self, frame) -> Dict[str, np.ndarray]:
        """One frame per stream — (H, W, 3) for a single-stream session or
        (S, H, W, 3) — uint8 or normalized float -> per-stream
        probabilities for the CURRENT frame, shape (S, C) (leading dim
        squeezed when S == 1)."""
        arr = np.asarray(frame)
        if arr.ndim == 3:
            arr = arr[None]
        if arr.shape[0] != self.streams:
            raise ValueError(
                f"session serves {self.streams} streams, got {arr.shape[0]}")
        normalize = arr.dtype == np.uint8
        frame = jnp.asarray(
            arr, jnp.uint8 if normalize else self.buffer.dtype)
        self.buffer, probs = self.compiled[normalize](
            self.variables, self.buffer, frame)
        self.frames_seen_per_stream += 1
        squeeze = self.streams == 1
        return {k: np.asarray(v)[0] if squeeze else np.asarray(v)
                for k, v in probs.items()}

    def export(self, path: str) -> str:
        """Serialize the streaming step + weights as a deployment artifact
        (companion to InferenceSession.export — same layout plus the ring
        geometry in meta.json). Restore with
        ``StreamingSession.load_exported(path)``; the restored session
        starts with a fresh zero buffer."""
        import json
        import os

        from flax import serialization
        from jax import export as jexport

        if self.exportable is None:
            raise ValueError("session restored from an export is not "
                             "re-exportable")
        jitted, var_shapes, buf_shape = self.exportable
        os.makedirs(path, exist_ok=True)
        for normalize in (True, False):
            in_dtype = jnp.uint8 if normalize else self.buffer.dtype
            fshape = jax.ShapeDtypeStruct(
                (self.streams, self.height, self.width, 3), in_dtype)
            exp = jexport.export(jitted)(var_shapes, buf_shape, fshape,
                                         normalize)
            with open(os.path.join(path,
                                   f"step_norm{int(normalize)}.jaxexport"),
                      "wb") as fh:
                fh.write(exp.serialize())
        with open(os.path.join(path, "variables.msgpack"), "wb") as fh:
            fh.write(serialization.to_bytes(self.variables))
        with open(os.path.join(path, "meta.json"), "w") as fh:
            json.dump({"context": self.context, "height": self.height,
                       "width": self.width, "streams": self.streams,
                       "receptive_field": self.receptive_field,
                       "feature_dim": int(self.buffer.shape[-1]),
                       "dtype": str(self.buffer.dtype)}, fh)
        return path

    @classmethod
    def load_exported(cls, path: str) -> "StreamingSession":
        """Restore an exported streaming servable (fresh zero buffer)."""
        import json
        import os

        from flax import serialization
        from jax import export as jexport

        meta = json.load(open(os.path.join(path, "meta.json")))
        blob = open(os.path.join(path, "variables.msgpack"), "rb").read()
        variables = serialization.msgpack_restore(bytearray(blob))
        compiled = {}
        for normalize in (True, False):
            with open(os.path.join(path,
                                   f"step_norm{int(normalize)}.jaxexport"),
                      "rb") as fh:
                exp = jexport.deserialize(bytearray(fh.read()))
            compiled[normalize] = (
                lambda e: lambda v, b, f: e.call(v, b, f))(exp)
        dtype = jnp.dtype(meta.pop("dtype"))
        dim = meta.pop("feature_dim")
        buffer = jnp.zeros((meta["streams"], meta["context"], dim), dtype)
        return cls(compiled=compiled, variables=variables, buffer=buffer,
                   **meta)

    def reset(self, stream: Optional[int] = None) -> None:
        """Start a new video: zero the feature ring buffer and the frame
        counter (one stream, or all when ``stream`` is None)."""
        if stream is None:
            self.buffer = jnp.zeros_like(self.buffer)
            self.frames_seen_per_stream[:] = 0
        else:
            self.buffer = self.buffer.at[stream].set(0.0)
            self.frames_seen_per_stream[stream] = 0


@dataclass
class TeacherSession:
    """Fixed-shape compiled Q2L teacher: frames -> task probabilities +
    the per-frame feature vector (the cached-feature-bus artifact that
    MT4MTLKD's temporal stages consume).

    Re-designs the eval/feature-dump entry of
    MT4MTLKD/Spatial_transformer/test.py:143-284 as a serving surface
    (the reference has none). ``quantize=True`` serves the round-3 int8
    config — in-kernel int8 GEMMs inside the fused Swin kernels
    (``Q2L(quant_eval=True)``) stacked with int8 interception of the
    remaining dense layers (decoder FFN-8192, stage-4 attention, patch
    merges): 385 vs 342 fps/chip on SwinL-384 (round-5 re-measure,
    docs/BENCH.md headline table); trained-checkpoint mAP unchanged
    (scripts/int8_teacher_accuracy.py).
    """

    compiled: object
    variables: dict
    batch: int
    height: int
    width: int
    tasks: tuple

    @classmethod
    def create(cls, batch: int = 16, img_size: int = 384,
               backbone: str = "swin_L_384_22k", loss_type: str = "i",
               variables: Optional[dict] = None, quantize: bool = False,
               calibrate_frames=None) -> "TeacherSession":
        from .models.q2l import Q2L

        # s2d patch embed rides along with the int8 config: exact GEMM
        # reparam of the 4x4/s4 patch conv, measured 1.096x over the
        # stacked int8 path on-chip (scripts/int8_teacher_bench.py r4)
        model = Q2L(backbone=backbone, loss_type=loss_type,
                    dtype=jnp.bfloat16, quant_eval=quantize,
                    s2d_embed=quantize)
        if variables is None:
            variables = model.init(
                jax.random.PRNGKey(0),
                jnp.zeros((1, img_size, img_size, 3), jnp.bfloat16))
        apply_fn = model.apply
        if quantize:
            from .models.quant_dense import (collect_dense_scales,
                                             int8_apply,
                                             quantize_dense_params)

            if calibrate_frames is None:
                calibrate_frames = _default_calibration(
                    jax.random.PRNGKey(7), (2, img_size, img_size, 3),
                    jnp.bfloat16)
            scales = collect_dense_scales(model, variables,
                                          calibrate_frames)
            qd = quantize_dense_params(variables)

            def apply_fn(v, x):
                return int8_apply(model, v, qd, scales, x,
                                  min_features=512)

        tasks = ("i", "v", "t", "ivt") if loss_type == "all" \
            else (loss_type,)
        mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)
        std = jnp.asarray(IMAGENET_STD, jnp.float32)

        def forward(v, frames, normalize):
            x = frames.astype(jnp.float32)
            if normalize:
                x = (x / 255.0 - mean) / std
            out = apply_fn(v, x.astype(jnp.bfloat16))
            probs = {k: jax.nn.sigmoid(out["logits"][k].astype(jnp.float32))
                     for k in tasks}
            probs["feature"] = out["feature"].astype(jnp.float32)
            return probs

        var_shapes = jax.tree.map(
            lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), variables)
        jitted = jax.jit(forward, static_argnums=(2,), donate_argnums=(1,))
        compiled = {}
        for dtype, normalize in ((jnp.uint8, True), (jnp.bfloat16, False)):
            shape = jax.ShapeDtypeStruct(
                (batch, img_size, img_size, 3), dtype)
            compiled[normalize] = jitted.lower(var_shapes, shape,
                                               normalize).compile()
        return cls(compiled=compiled, variables=variables, batch=batch,
                   height=img_size, width=img_size, tasks=tasks)

    def predict(self, frames) -> Dict[str, np.ndarray]:
        """frames (B, H, W, 3) uint8 (device-normalized) or float
        (pre-normalized) -> {task: (B, C) probabilities, "feature":
        (B, D) bus features}."""
        arr = np.asarray(frames)
        normalize = arr.dtype == np.uint8
        frames = jnp.asarray(arr, jnp.uint8 if normalize else jnp.bfloat16)
        if frames.shape != (self.batch, self.height, self.width, 3):
            raise ValueError(
                f"session compiled for "
                f"{(self.batch, self.height, self.width, 3)}, "
                f"got {frames.shape}")
        out = self.compiled[normalize](self.variables, frames)
        return {k: np.asarray(v) for k, v in out.items()}
