"""Second, independent transcription of ivtmetrics 0.0.6's recognition AP.

Written as a separate author-pass from the PUBLISHED package semantics
(CAMMA-public/ivtmetrics recognition.py, pinned by the reference at
MT4MTLKD/environment.yaml:73 and driven at MT4MTLKD/Spatial_cnn/run.py:
426-448) WITHOUT consulting computervision_codes_tpu/metrics/recognition.py
— the point is to cross-check two independent readings of the spec against
each other (tests/test_ivtmetrics_crosscheck.py). This copy leans on
sklearn's average_precision_score (like the real package does), while the
production module implements AP from scratch; agreement on randomized
multi-video fixtures therefore checks both the AP math and the
accumulation/ordering conventions.

Spec facts transcribed here:
  * update() accumulates frames into the CURRENT video; video_end() closes
    it; an open (unclosed) video still participates in compute_*.
  * components: ivt (identity, num_class wide) and i/v/t/iv/it via
    component-max disentanglement over the dataset bank (maps.txt columns
    IVT,I,V,T,IV,IT): score of component class c = max over triplet columns
    whose bank row maps to c, applied to targets AND predictions.
  * per-class AP with the no-positive convention: a class with zero
    positive targets scores NaN (excluded by nanmean), matching
    sklearn 1.0.2 + the package's masking.
  * compute_video_AP: classwise AP per video -> nanmean over videos per
    class -> nanmean over classes for mAP (mean-of-video-means, NOT AP on
    pooled frames).
  * compute_global_AP: AP on all frames pooled across videos.
  * ignore_null (challenge eval): drop the null classes before averaging —
    verb 9 (null_verb), target 14 (null_target), and the triplet/iv/it
    classes whose bank row has the null verb/target.
  * topK(k, component): per-frame top-k RECALL over ground-truth
    positives — sum over frames of |gt_pos ∩ topk(pred)| divided by the
    total positive count (the reference's own re-implementation,
    MT4MTLKD/Temporal_mstct/run.py:507-523; denominator clamped to 1).
"""

from __future__ import annotations

import os

import numpy as np

_COMPONENT_COL = {"ivt": 0, "i": 1, "v": 2, "t": 3, "iv": 4, "it": 5}
_NULL_VERB = 9
_NULL_TARGET = 14


def load_bank(path: str | None = None) -> np.ndarray:
    if path is None:
        path = os.path.join(os.path.dirname(__file__), "..",
                            "computervision_codes_tpu", "data", "maps.txt")
    return np.loadtxt(path, dtype=np.int64, delimiter=",", comments="#")


def _binary_ap(y: np.ndarray, s: np.ndarray) -> float:
    """Average precision for one class; NaN when no positive targets."""
    if y.sum() <= 0:
        return float("nan")
    from sklearn.metrics import average_precision_score

    return float(average_precision_score(y, s))


def _classwise_ap(targets: np.ndarray, scores: np.ndarray) -> np.ndarray:
    return np.array([_binary_ap(targets[:, c], scores[:, c])
                     for c in range(targets.shape[1])], np.float64)


class RecognitionSecond:
    def __init__(self, num_class: int = 100,
                 bank: np.ndarray | None = None):
        self.num_class = num_class
        self.bank = load_bank() if bank is None else np.asarray(bank)
        self.reset_global()

    # -- accumulation protocol ------------------------------------------
    def reset_global(self) -> None:
        self._videos: list = []
        self._cur_t: list = []
        self._cur_p: list = []

    def update(self, targets, predictions) -> None:
        self._cur_t.append(np.asarray(targets, np.float64))
        self._cur_p.append(np.asarray(predictions, np.float64))

    def video_end(self) -> None:
        self._videos.append((np.concatenate(self._cur_t, 0),
                             np.concatenate(self._cur_p, 0)))
        self._cur_t, self._cur_p = [], []

    def _all_videos(self):
        vids = list(self._videos)
        if self._cur_t:  # an open video still counts
            vids.append((np.concatenate(self._cur_t, 0),
                         np.concatenate(self._cur_p, 0)))
        return vids

    # -- disentanglement ------------------------------------------------
    def _component_ids(self, component: str) -> np.ndarray:
        col = _COMPONENT_COL[component]
        if component in ("i", "v", "t"):
            # the dataset covers every component id; fixed widths 6/10/15
            width = {"i": 6, "v": 10, "t": 15}[component]
            return np.arange(width)
        return np.asarray(sorted(np.unique(self.bank[:, col])))

    def _extract(self, arr: np.ndarray, component: str) -> np.ndarray:
        if component == "ivt":
            return arr
        col = _COMPONENT_COL[component]
        out = []
        for cid in self._component_ids(component):
            cols = np.flatnonzero(self.bank[:, col] == cid)
            out.append(arr[:, cols].max(axis=1) if cols.size
                       else np.zeros(arr.shape[0]))
        return np.stack(out, axis=1)

    def _null_class_positions(self, component: str) -> np.ndarray:
        """Positions (in the component class axis) dropped by ignore_null."""
        ids = self._component_ids(component)
        if component == "i":
            return np.zeros(0, np.int64)
        if component == "v":
            return np.flatnonzero(ids == _NULL_VERB)
        if component == "t":
            return np.flatnonzero(ids == _NULL_TARGET)
        col = _COMPONENT_COL[component]
        null_rows = (self.bank[:, 2] == _NULL_VERB) \
            if component == "iv" else (self.bank[:, 3] == _NULL_TARGET) \
            if component == "it" else (
                (self.bank[:, 2] == _NULL_VERB)
                | (self.bank[:, 3] == _NULL_TARGET))
        if component == "ivt":
            return np.flatnonzero(null_rows)
        null_ids = np.unique(self.bank[null_rows, col])
        return np.flatnonzero(np.isin(ids, null_ids))

    def _prepare(self, t: np.ndarray, p: np.ndarray, component: str,
                 ignore_null: bool):
        te, pe = self._extract(t, component), self._extract(p, component)
        if ignore_null:
            drop = self._null_class_positions(component)
            keep = np.setdiff1d(np.arange(te.shape[1]), drop)
            te, pe = te[:, keep], pe[:, keep]
        return te, pe

    # -- metrics --------------------------------------------------------
    def compute_video_AP(self, component: str = "ivt",
                         ignore_null: bool = False) -> dict:
        per_video = []
        for t, p in self._all_videos():
            te, pe = self._prepare(t, p, component, ignore_null)
            per_video.append(_classwise_ap(te, pe))
        if not per_video:
            n = len(self._component_ids(component))
            classwise = np.full(n, np.nan)
        else:
            import warnings

            with warnings.catch_warnings():
                warnings.simplefilter("ignore", RuntimeWarning)
                classwise = np.nanmean(np.stack(per_video, 0), axis=0)
        import warnings

        with warnings.catch_warnings():
            warnings.simplefilter("ignore", RuntimeWarning)
            mean = float(np.nanmean(classwise))
        return {"AP": classwise, "mAP": mean}

    def compute_global_AP(self, component: str = "ivt",
                          ignore_null: bool = False) -> dict:
        vids = self._all_videos()
        if not vids:
            n = len(self._component_ids(component))
            return {"AP": np.full(n, np.nan), "mAP": float("nan")}
        t = np.concatenate([v[0] for v in vids], 0)
        p = np.concatenate([v[1] for v in vids], 0)
        te, pe = self._prepare(t, p, component, ignore_null)
        classwise = _classwise_ap(te, pe)
        import warnings

        with warnings.catch_warnings():
            warnings.simplefilter("ignore", RuntimeWarning)
            mean = float(np.nanmean(classwise))
        return {"AP": classwise, "mAP": mean}

    def topK(self, k: int, component: str = "ivt") -> float:
        vids = self._all_videos()
        t = np.concatenate([v[0] for v in vids], 0)
        p = np.concatenate([v[1] for v in vids], 0)
        te, pe = self._extract(t, component), self._extract(p, component)
        correct, total = 0.0, 0
        for gt, pd in zip(te, pe):
            gt_pos = set(np.flatnonzero(gt > 0))
            top = set(np.argsort(-pd, kind="stable")[:k])
            correct += len(gt_pos & top)
            total += len(gt_pos)
        return correct / max(total, 1)
