from .cam import draw_cam, normalize_cam, render_cam_overlay
from .logging import ExperimentLogger, summarize_events
from .misc import ModelEma, clean_state_dict, cutout, load_config, voc_mAP
from .profiling import StepTimer, timed, trace

__all__ = [
    "draw_cam", "normalize_cam", "render_cam_overlay",
    "ExperimentLogger", "summarize_events",
    "ModelEma", "clean_state_dict", "cutout", "load_config", "voc_mAP",
    "StepTimer", "timed", "trace",
]
