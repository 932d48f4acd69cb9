"""Checkpointing with the reference's latest/best-by-val-mAP policy.

Policy parity (MT4MTLKD/Spatial_cnn/run.py:260-271 ``weight_mgt``):
  * save ``<modelname>_latest`` every validation;
  * overwrite ``<modelname>`` (best) whenever the selector score improves,
    and report "increased"/"decreased".

Improvements over the reference (flag-gated, on by default):
  * the FULL TrainState (params, BN stats, optimizer state, step, rng) is
    serialized, so resume continues schedules exactly — the reference saves
    model weights only and restarts schedules (SURVEY.md §5 checkpoint);
  * best score survives restarts via a json sidecar.

Format: flax msgpack by default (single file, no external deps);
``backend="orbax"`` switches to orbax-checkpoint directories (async-capable,
multi-host-safe — the right choice for sharded multi-chip state).
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Optional

from flax import serialization


class CheckpointManager:
    def __init__(self, directory: str, modelname: str,
                 save_optimizer: bool = True, backend: str = "msgpack"):
        if backend not in ("msgpack", "orbax"):
            raise ValueError(f"unknown checkpoint backend {backend!r}")
        self.backend = backend
        self.dir = directory
        self.modelname = modelname
        self.save_optimizer = save_optimizer
        os.makedirs(directory, exist_ok=True)
        self._meta_path = os.path.join(directory, f"{modelname}.meta.json")
        self.best_score = float("-inf")
        if os.path.exists(self._meta_path):
            with open(self._meta_path) as f:
                self.best_score = json.load(f).get("best_score", float("-inf"))

    def _path(self, tag: str) -> str:
        suffix = f"_{tag}" if tag else ""
        ext = ".msgpack" if self.backend == "msgpack" else ".orbax"
        return os.path.join(self.dir, f"{self.modelname}{suffix}{ext}")

    def _payload(self, state) -> Any:
        if self.save_optimizer:
            return state
        return {"params": state.params, "batch_stats": state.batch_stats}

    def save(self, state, tag: str = "") -> str:
        path = self._path(tag)
        if self.backend == "orbax":
            import orbax.checkpoint as ocp

            with ocp.PyTreeCheckpointer() as ckptr:
                ckptr.save(os.path.abspath(path), self._payload(state),
                           force=True)
            return path
        # atomic write: a crash mid-save must not corrupt the previous
        # checkpoint (the resume path trusts _latest unconditionally)
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(serialization.to_bytes(self._payload(state)))
        os.replace(tmp, path)
        return path

    def update(self, state, score: float, epoch: int,
               logfile: Optional[str] = None) -> str:
        """Reference weight_mgt: always save latest; save best on improvement."""
        self.save(state, tag="latest")
        if score > self.best_score:
            path = self.save(state, tag="")
            self.best_score = float(score)
            with open(self._meta_path, "w") as f:
                json.dump({"best_score": self.best_score, "epoch": epoch}, f)
            if logfile:
                with open(logfile, "a+") as f:
                    print(f">>> Saving checkpoint for epoch {epoch + 1} at "
                          f"{path}, time {time.ctime()} ", file=f)
            return "increased"
        return "decreased"

    def restore(self, state, tag: str = ""):
        """Restore into a template state (partial restore when params-only)."""
        path = self._path(tag)
        if self.backend == "orbax":
            import orbax.checkpoint as ocp

            with ocp.PyTreeCheckpointer() as ckptr:
                restored = ckptr.restore(os.path.abspath(path),
                                         item=self._payload(state))
            if self.save_optimizer:
                return restored
            return state.replace(params=restored["params"],
                                 batch_stats=restored["batch_stats"])
        with open(path, "rb") as f:
            data = f.read()
        if self.save_optimizer:
            return serialization.from_bytes(state, data)
        restored = serialization.from_bytes(
            {"params": state.params, "batch_stats": state.batch_stats}, data)
        return state.replace(params=restored["params"],
                             batch_stats=restored["batch_stats"])

    def exists(self, tag: str = "") -> bool:
        return os.path.exists(self._path(tag))
