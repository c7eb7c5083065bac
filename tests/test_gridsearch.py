"""gridsearch CLI: the derive_tuning reduction and the --emit-config ->
apply_tuning feedback loop (the reference's gridsearch -> dispatch-table
workflow, /root/reference/src/gridsearch.cu).  Device timing itself is
exercised on real hardware; here the reduction and plumbing are covered
with synthetic sweep rows."""

import json

import numpy as np


def test_derive_tuning_ratios():
    from cudasw4_tpu.cli.gridsearch import derive_tuning

    rows = [
        # kernel, L, unroll, tiles, qlen, seconds, gcups
        ("row", 256, 4, 8, 128, 0.1, 100.0),
        ("cell", 256, 4, 8, 128, 0.1, 175.0),
        ("cell", 256, 8, 8, 128, 0.1, 160.0),
        ("row", 1024, 4, 8, 128, 0.1, 60.0),
        ("col", 1024, 4, 8, 128, 0.1, 168.0),
    ]
    cfg = derive_tuning(rows)
    assert cfg["cell_speedup"] == 1.75
    assert cfg["col_speedup"] == 2.8
    # best unroll per (kernel, L, qlen) is recorded
    best = {(b["kernel"], b["length"]): b["unroll"] for b in cfg["best"]}
    assert best[("cell", 256)] == 4


def test_emit_config_apply_tuning_roundtrip(tmp_path, monkeypatch):
    from cudasw4_tpu.cli.gridsearch import derive_tuning
    from cudasw4_tpu.db import packing

    rows = [
        ("row", 256, 4, 8, 128, 0.1, 100.0),
        ("cell", 256, 4, 8, 128, 0.1, 210.0),
    ]
    cfg = derive_tuning(rows)
    p = tmp_path / "tuning.json"
    p.write_text(json.dumps(cfg))

    monkeypatch.setattr(packing, "CELL_SPEEDUP", 1.75)
    packing.apply_tuning(str(p))
    assert packing.CELL_SPEEDUP == 2.1
    # unknown keys are ignored (forward compat)
    p.write_text(json.dumps({"version": 99, "mystery": 1}))
    packing.apply_tuning(str(p))
    assert packing.CELL_SPEEDUP == 2.1


def test_derive_tuning_no_row_baseline():
    """Ratios only emit when both kernels ran at a config."""
    from cudasw4_tpu.cli.gridsearch import derive_tuning

    cfg = derive_tuning([("cell", 256, 4, 8, 128, 0.1, 175.0)])
    assert "cell_speedup" not in cfg
