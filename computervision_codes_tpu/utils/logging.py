"""Experiment logging: reference-style banner logfiles + scalar event stream.

Parity targets: the append-only text logfile with centered ``**...**``
banner headers and per-epoch lines (MT4MTLKD/Spatial_cnn/run.py:384-401,
409-422) and tensorboardX scalars (run.py:211,219,398,453). tensorboardX is
not available in this image, so scalars go to a JSONL event file
(one ``{"tag", "step", "values"}`` object per line) that tooling — and the
bundled ``summarize_events`` helper — can read; if tensorboardX is
importable it is used additionally.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional

try:  # optional — not in this image
    from tensorboardX import SummaryWriter  # type: ignore
except Exception:  # pragma: no cover
    SummaryWriter = None


class ExperimentLogger:
    def __init__(self, model_dir: str, modelname: str):
        os.makedirs(model_dir, exist_ok=True)
        self.model_dir = model_dir
        self.logfile = os.path.join(model_dir, f"{modelname}.log")
        self.events_path = os.path.join(model_dir, f"{modelname}.events.jsonl")
        self._events = open(self.events_path, "a+")
        self._tb = SummaryWriter(model_dir) if SummaryWriter else None

    # -- text log ----------------------------------------------------------

    def log(self, msg: str, end: str = "\n") -> None:
        with open(self.logfile, "a+") as f:
            f.write(msg + end)

    def banner(self, lines) -> None:
        """Centered banner block (reference run.py:384-401 format)."""
        maxlen = max(len(l) for l in lines)
        out = []
        for l in lines:
            pad = "*" * ((maxlen - len(l)) // 2 + 1)
            out.append(f"{pad}{l}{pad}")
        maxlen = max(len(l) for l in out)
        self.log("\n\n\n" + "*" * maxlen)
        for l in out:
            self.log(l)
        self.log("*" * maxlen)

    def run_header(self, script: str, modelname: str, version: str,
                   batch_size, lr_info: str) -> None:
        self.banner([
            f"** Run: {script} | Framework: JAX/TPU | Method: {modelname} | "
            f"Version: {version} | Data: CholecT50 | Batch: {batch_size} **",
            f"** Time: {time.ctime()} | Start: 0-epoch  0-steps **",
            f"** LR Config: {lr_info} **",
        ])

    # -- scalars -----------------------------------------------------------

    def scalars(self, tag: str, values: Dict[str, float], step: int) -> None:
        rec = {"tag": tag, "step": int(step),
               "values": {k: float(v) for k, v in values.items()},
               "time": time.time()}
        self._events.write(json.dumps(rec) + "\n")
        self._events.flush()
        if self._tb:
            self._tb.add_scalars(tag, rec["values"], step)

    def close(self) -> None:
        self._events.close()
        if self._tb:
            self._tb.close()


def summarize_events(events_path: str, tag: Optional[str] = None):
    """Read back a JSONL event file (optionally filtered by tag)."""
    out = []
    with open(events_path) as f:
        for line in f:
            rec = json.loads(line)
            if tag is None or rec["tag"] == tag:
                out.append(rec)
    return out
