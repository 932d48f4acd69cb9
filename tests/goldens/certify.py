"""One-command certification against the REAL ivtmetrics package.

Run on a networked machine:

    pip install ivtmetrics==0.0.6 scikit-learn==1.0.2
    python tests/goldens/certify.py

Writes tests/goldens/goldens.npz with the package's per-class video/global
AP for every fixture case and component; then

    python -m pytest tests/test_ivtmetrics_crosscheck.py::test_against_goldens

asserts metrics/recognition.py reproduces the package bit-for-bit (atol
1e-7). Until that run, the offline guarantee is the dual-transcription
cross-check in the same test file.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))
from make_fixtures import fixture_cases  # noqa: E402

COMPONENTS = ("ivt", "i", "v", "t", "iv", "it")


def main() -> None:
    try:
        import ivtmetrics
    except ImportError:
        sys.exit("ivtmetrics not installed — pip install ivtmetrics==0.0.6 "
                 "on a networked machine, then rerun")

    out = {}
    for name, videos in fixture_cases():
        rec = ivtmetrics.Recognition(100)
        rec.reset_global()
        for t, p in videos:
            rec.update(t, p)
            rec.video_end()
        for comp in COMPONENTS:
            out[f"{name}/video/{comp}"] = np.asarray(
                rec.compute_video_AP(comp)["AP"], np.float64)
            out[f"{name}/global/{comp}"] = np.asarray(
                rec.compute_global_AP(comp)["AP"], np.float64)
    path = os.path.join(os.path.dirname(__file__), "goldens.npz")
    np.savez(path, **out)
    print(f"wrote {path} ({len(out)} arrays) — now run: python -m pytest "
          "tests/test_ivtmetrics_crosscheck.py::test_against_goldens")


if __name__ == "__main__":
    main()
