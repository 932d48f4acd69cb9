from . import bank
from .feature_store import FeatureStore, artifact_name, video_key
from .labels import VideoLabels, load_video_labels
from .splits import Split, crossval_folds, resolve_split, video_name
from .native import VideoReader, video_supported
from .device_augment import make_device_augment

__all__ = [
    "bank",
    "FeatureStore",
    "artifact_name",
    "video_key",
    "VideoLabels",
    "load_video_labels",
    "Split",
    "crossval_folds",
    "resolve_split",
    "video_name",
    "VideoReader",
    "video_supported",
]
