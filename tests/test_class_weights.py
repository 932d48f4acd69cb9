"""Balancing-table parity + the --weight_source balancing driver path.

The reference defines per-variant/per-fold class balancing tables
(TERL/0_5fold_TCN_black/run.py:168-265 ``get_weight_balancing``) that its
loss never consumes (run.py:432-435 uses the constant sampling-average
weights). We keep the tables as data (data/class_weights.py) and expose
them behind ``temporal_tcn --weight_source balancing``.
"""

import numpy as np
import pytest

from computervision_codes_tpu.data.class_weights import weight_balancing


def test_tables_cover_every_variant_and_fold_with_right_shapes():
    for variant in ("cholect50", "cholect50-challenge"):
        t = weight_balancing(variant)
        assert len(t["tool"]) == 6
        assert len(t["verb"]) == 10
        assert len(t["target"]) == 15
    for fold in range(1, 6):
        t = weight_balancing("cholect45-crossval", fold)
        assert len(t["tool"]) == 6
        assert len(t["verb"]) == 10
        assert len(t["target"]) == 15
        assert all(w > 0 for w in t["tool"] + t["verb"] + t["target"])


def test_transcription_spot_values_match_reference():
    # exact values quoted from TERL/0_5fold_TCN_black/run.py:
    # cholect50 tool[3]=2.55976864 (:172), verb[8]=12.13692946 (:174),
    # fold-1 target[9]=45.45205479 (:204), fold-5 tool[0] (:246-ish),
    # challenge verb[8]=18.67857143 (:186)
    assert weight_balancing("cholect50")["tool"][3] == pytest.approx(
        2.55976864)
    assert weight_balancing("cholect50")["verb"][8] == pytest.approx(
        12.13692946)
    assert weight_balancing("cholect50-challenge")["verb"][8] == \
        pytest.approx(18.67857143)
    assert weight_balancing("cholect45-crossval", 1)["target"][9] == \
        pytest.approx(45.45205479)


def test_unknown_variant_raises():
    with pytest.raises(ValueError):
        weight_balancing("cholect45")


def test_driver_builds_balancing_pos_weights():
    # the flag path: parse + the pos_weights construction block
    from computervision_codes_tpu.cli.temporal_tcn import parse_flags

    flags = parse_flags(["--data_dir", "/tmp/x", "--weight_source",
                         "balancing", "--dataset_variant",
                         "cholect45-crossval", "-k", "2"])
    assert flags.weight_source == "balancing"
    wb = weight_balancing(flags.dataset_variant, flags.kfold)
    pw = {"i": np.asarray(wb["tool"], np.float32),
          "v": np.asarray(wb["verb"], np.float32),
          "t": np.asarray(wb["target"], np.float32)}
    assert pw["i"].shape == (6,)
    assert pw["v"].shape == (10,)
    assert pw["t"].shape == (15,)
