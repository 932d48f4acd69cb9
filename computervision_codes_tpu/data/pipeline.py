"""Host input pipeline: dataset index + threaded, double-buffered batch feed.

Replaces the reference's torch DataLoader worker processes
(MT4MTLKD/Spatial_cnn/run.py:367-381) with a TPU-VM-friendly design: a flat
frame index over (video, row) pairs, per-item decode+augment on host
threads, and a bounded prefetch queue so the next batch is being decoded
while the device computes (double buffering). ``jax.device_put`` overlap is
left to the caller/trainer.

The frame index also carries the cached-teacher lookups of the KD student
loader (Spatial_cnn/dataloader.py:216-238: 3 pred pickles + 3 feat pickles,
rows aligned with label rows).
"""

from __future__ import annotations

import queue
import threading
from dataclasses import dataclass, field
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np
from PIL import Image

from . import transforms as T
from .feature_store import FeatureStore, video_key
from .labels import VideoLabels, load_video_labels
from .splits import Split, resolve_split


@dataclass
class VideoData:
    """One video's labels plus optional aligned teacher arrays."""

    labels: VideoLabels
    teacher: Dict[str, np.ndarray] = field(default_factory=dict)


class CholecDataset:
    """Split-resolved dataset index (reference CholecT50 class equivalent,
    Spatial_cnn/dataloader.py:45-201)."""

    def __init__(self, dataset_dir: str, variant: str = "cholect45-crossval",
                 test_fold: int = 1,
                 augmentation_list: Sequence[str] = T.DEFAULT_AUGS,
                 image_size: Tuple[int, int] = T.DEFAULT_SIZE,
                 device_augment: bool = False):
        self.dataset_dir = dataset_dir
        self.split: Split = resolve_split(variant, test_fold)
        self.augmentation_list = tuple(augmentation_list)
        self.image_size = image_size
        # device_augment: TRAIN frames leave the host as resized uint8;
        # augmentation + normalization run on-chip inside the jitted step
        # (data/device_augment.py) — the driver applies
        # make_device_augment(...) to each batch's "image"
        self.device_augment = device_augment
        self._videos: Dict[str, VideoData] = {}

    def video(self, name: str) -> VideoData:
        if name not in self._videos:
            self._videos[name] = VideoData(
                labels=load_video_labels(self.dataset_dir, name))
        return self._videos[name]

    def container(self, name: str):
        """Native VideoReader when the video ships as an MJPEG container
        (``<root>/data/VIDxx.avi`` in place of the reference's
        ``<root>/data/VIDxx/`` PNG dir — MT4MTLKD/readme.md:30-89); None
        for the stills layout. Requires the native plane
        (native/build.sh)."""
        if not hasattr(self, "_containers"):
            self._containers = {}
        if name not in self._containers:
            import os

            from . import native as native_mod

            reader = None
            for ext in (".avi", ".mjpg"):
                p = os.path.join(self.dataset_dir, "data", name + ext)
                if os.path.exists(p):
                    if not native_mod.video_supported():
                        raise RuntimeError(
                            f"{p} needs the native data plane — run "
                            "native/build.sh")
                    r = native_mod.VideoReader(p)
                    if r.height > 0 and r.width > 0:
                        reader = r
                    break
            self._containers[name] = reader
        return self._containers[name]

    def attach_teachers(self, store: FeatureStore, pred_store: FeatureStore,
                        fold: int, videos: Sequence[str]) -> None:
        """Load the 6 teacher artifacts for the KD student train split."""
        preds = {k: pred_store.load(fold, "pred", task=k) for k in ("i", "v", "t")}
        feats = {k: store.load(fold, "feats", task=k) for k in ("i", "v", "t")}
        for v in videos:
            vd = self.video(v)
            key = video_key(v)
            for k in ("i", "v", "t"):
                vd.teacher[f"pred_{k}"] = preds[k][key]
                vd.teacher[f"feat_{k}"] = feats[k][key]

    def frame_index(self, videos: Sequence[str]) -> List[Tuple[str, int]]:
        out = []
        for v in videos:
            out.extend((v, i) for i in range(len(self.video(v).labels)))
        return out

    def load_frame(self, video: str, row: int,
                   rng: Optional[np.random.Generator] = None,
                   teacher_dim: int = 1536,
                   two_views: bool = False,
                   decode: bool = True) -> Dict[str, np.ndarray]:
        vd = self.video(video)
        lab = vd.labels
        item: Dict[str, np.ndarray] = {}
        if decode:
            vr = self.container(video)
            if vr is not None:
                img = Image.fromarray(
                    vr.read_u8([row], (vr.height, vr.width), n_threads=1)[0])
            else:
                img = Image.open(lab.frame_path(self.dataset_dir, row))
            if rng is not None:
                if self.device_augment:
                    # both views derive on-device from ONE uint8 upload
                    # (make_device_augment(two_view=True)) — no "image2"
                    arr = T.raw_resize_u8(img, self.image_size)
                else:
                    arr = T.train_transform(rng, img, self.image_size,
                                            self.augmentation_list)
            else:
                arr = T.eval_transform(img, self.image_size)
            item["image"] = arr
        if two_views and decode and self.device_augment and rng is not None:
            pass  # device path: views are generated on-chip from "image"
        elif two_views and decode:
            # TERL two-crop protocol (TERL/6_baseline_learnT/dataloader.py:
            # 101,233-266): two independent augmentations of the same frame
            item["image2"] = (
                T.train_transform(rng, img, self.image_size,
                                  self.augmentation_list)
                if rng is not None else arr)
        item.update({
            "label_i": lab.tool[row],
            "label_v": lab.verb[row],
            "label_t": lab.target[row],
            "label_ivt": lab.triplet[row],
        })
        t = vd.teacher
        for k in ("i", "v", "t"):
            item[f"teacher_pred_{k}"] = t.get(
                f"pred_{k}", np.zeros((len(lab), {"i": 6, "v": 10, "t": 15}[k]),
                                      np.float32))[row]
            item[f"teacher_feat_{k}"] = t.get(
                f"feat_{k}", np.zeros((len(lab), teacher_dim), np.float32))[row]
        return item


def _collate(items: List[Dict[str, np.ndarray]]) -> Dict[str, np.ndarray]:
    return {k: np.stack([it[k] for it in items]) for k in items[0]}


def batch_iterator(dataset: CholecDataset, videos: Sequence[str],
                   batch_size: int, train: bool, seed: int = 0,
                   teacher_dim: int = 1536, drop_last: bool = False,
                   pad_last: bool = False, two_views: bool = False,
                   prefetch: int = 2) -> Iterator[Dict[str, np.ndarray]]:
    """Threaded prefetching batch stream over the given videos.

    ``pad_last``: repeat-pad the final short batch to ``batch_size`` and add
    a ``valid`` mask — keeps shapes static for jit (eval loops slice by the
    mask on host). NOTE for training: the reference trains the final short
    batch at its natural size (dynamic shapes); here the repeated pad frames
    contribute to the final batch's loss — at reference batch sizes this is
    <0.1% of samples per epoch.
    """
    index = dataset.frame_index(videos)
    rng = np.random.default_rng(seed)
    if train:
        rng.shuffle(index)

    use_native = False
    if not train:
        from . import native as native_mod

        use_native = native_mod.enabled()

    def producer(q: queue.Queue):
        # exceptions are forwarded to the consumer (a silently dying worker
        # would truncate the stream and corrupt per-video metrics)
        try:
            for start in range(0, len(index), batch_size):
                chunk = index[start:start + batch_size]
                if drop_last and len(chunk) < batch_size:
                    break
                items = [
                    dataset.load_frame(v, i,
                                       rng=rng if train else None,
                                       teacher_dim=teacher_dim,
                                       two_views=two_views,
                                       decode=not use_native)
                    for v, i in chunk
                ]
                batch = _collate(items)
                if use_native:
                    # GIL-free multithreaded decode of the whole chunk;
                    # container videos decode by frame index, stills by path
                    from . import native as native_mod

                    h, w = dataset.image_size
                    imgs = np.empty((len(chunk), h, w, 3), np.float32)
                    by_vid: Dict[str, list] = {}
                    for pos, (v, i) in enumerate(chunk):
                        by_vid.setdefault(v, []).append((pos, i))
                    for v, lst in by_vid.items():
                        vr = dataset.container(v)
                        if vr is not None:
                            arr = vr.read([i for _, i in lst],
                                          dataset.image_size)
                        else:
                            paths = [dataset.video(v).labels.frame_path(
                                dataset.dataset_dir, i) for _, i in lst]
                            arr = native_mod.decode_batch(
                                paths, dataset.image_size)
                        for (pos, _), a in zip(lst, arr):
                            imgs[pos] = a
                    batch["image"] = imgs
                n = len(chunk)
                if pad_last and n < batch_size:
                    pad = batch_size - n
                    batch = {k: np.concatenate(
                        [a, np.repeat(a[-1:], pad, axis=0)]) for k, a in
                        batch.items()}
                batch["valid"] = np.arange(
                    batch["image"].shape[0]) < n
                q.put(batch)
        except BaseException as e:  # noqa: BLE001 - forwarded to consumer
            q.put(e)
        finally:
            q.put(None)

    q: queue.Queue = queue.Queue(maxsize=max(prefetch, 1))
    thread = threading.Thread(target=producer, args=(q,), daemon=True)
    thread.start()
    while True:
        batch = q.get()
        if batch is None:
            break
        if isinstance(batch, BaseException):
            raise batch
        yield batch


def video_eval_batches(dataset: CholecDataset, video: str, batch_size: int,
                       pad_last: bool = True) -> Iterator[Dict[str, np.ndarray]]:
    """Per-video evaluation stream (the reference evaluates video by video)."""
    yield from batch_iterator(dataset, [video], batch_size, train=False,
                              pad_last=pad_last)
