"""Tests for benchmark harness logic that gates CI-style runs.

The on-chip contract bench (benchmarks/tpu_contracts.py) declares chip-level
f32 precision floors and must FAIL when a measured contract regresses past
its floor (VERDICT r2 item 4).  These tests pin the gate logic itself so a
refactor cannot silently disable it.
"""

import importlib.util
import pathlib
import sys

import pytest

_BENCH_DIR = pathlib.Path(__file__).resolve().parent.parent / "benchmarks"


def _load_tpu_contracts():
    spec = importlib.util.spec_from_file_location(
        "tpu_contracts_mod", _BENCH_DIR / "tpu_contracts.py"
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules.setdefault("tpu_contracts_mod", mod)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def tpu_contracts():
    return _load_tpu_contracts()


def test_chip_floor_gate_fires_on_regression(tpu_contracts):
    floors = {"mul_deg0": 6.0e-07, "lcu": 1.7e-06}
    # 10x precision loss on one contract -> exactly that contract flagged.
    results = {"mul_deg0": 6.0e-06, "lcu": 1.0e-06, "device": "x"}
    regressions = tpu_contracts.check_chip_floor(results, floors, gate=True)
    assert set(regressions) == {"mul_deg0"}
    assert regressions["mul_deg0"]["achieved"] == 6.0e-06
    assert regressions["mul_deg0"]["floor"] == 6.0e-07


def test_chip_floor_gate_passes_at_floor(tpu_contracts):
    floors = {"sum": 1.6e-06}
    # Exactly at the floor is a pass (floor is the declared contract).
    assert tpu_contracts.check_chip_floor({"sum": 1.6e-06}, floors, gate=True) == {}


def test_chip_floor_gate_disabled_off_chip(tpu_contracts):
    floors = {"sum": 1.6e-06}
    assert tpu_contracts.check_chip_floor({"sum": 1.0}, floors, gate=False) == {}


def test_chip_floor_gate_ignores_unmeasured_contracts(tpu_contracts):
    floors = {"sum": 1.6e-06, "not_measured": 1e-9}
    assert tpu_contracts.check_chip_floor({"sum": 1e-07}, floors, gate=True) == {}


def test_declared_floors_cover_every_float_contract(tpu_contracts):
    """The committed record's float contracts must all have declared floors,
    so a new contract cannot land ungated."""
    import json

    rec = json.loads((_BENCH_DIR / "records" / "tpu_contracts.json").read_text())
    floats = {
        k for k, v in rec.items() if isinstance(v, float) and k not in ("chip_floor",)
    }
    assert floats <= set(rec["chip_floor"]), floats - set(rec["chip_floor"])


def test_main_exits_nonzero_on_regression(tpu_contracts, monkeypatch, tmp_path):
    """End-to-end: a deliberate precision regression makes the bench fail."""
    mod = tpu_contracts

    class _Dev:
        platform = "tpu"

        def __str__(self):
            return "FakeTpu"

    monkeypatch.setattr(mod.jax, "devices", lambda: [_Dev()])
    # Force every measured contract to a catastrophic value; stub the
    # quantum paths so no Pallas/TPU dispatch happens under the fake device.
    monkeypatch.setattr(mod, "block_error", lambda a: 1.0)
    monkeypatch.setattr(mod, "quantum_extract_diag_packed", lambda big: big)
    monkeypatch.setattr(
        mod,
        "qkan_layer_forward_quantum",
        lambda x, w, N, K: mod.qkan_layer_forward(x, w, N, K),
    )
    # sharded_contracts builds a real Mesh from the (fake) device list;
    # stub it with catastrophically bad values so the gate must fire on
    # the sharded keys too.
    monkeypatch.setattr(
        mod,
        "sharded_contracts",
        lambda rng: {
            "sharded_pallas_diag32": 1.0,
            "sharded_vs_dense_state_maxabs": 1.0,
        },
    )
    monkeypatch.setattr(
        mod, "__file__", str(tmp_path / "benchmarks" / "tpu_contracts.py")
    )
    with pytest.raises(SystemExit) as exc:
        mod.main()
    assert exc.value.code == 1
    import json

    rec = json.loads((tmp_path / "benchmarks" / "records" / "tpu_contracts.json").read_text())
    assert rec["regressions"]  # the failing contracts are recorded
