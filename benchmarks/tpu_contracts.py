"""On-chip f32 verification of the quantum contracts (VERDICT r1 item 3).

The CPU test suite runs at x64 and pins the reference tolerances (1e-6
step contracts, 1e-15 dilated Chebyshev -- MulStep.py:165-166,
ChebyshevStep.py:133).  This script measures what the SAME contracts
achieve on the real TPU at f32: FABLE round-trips of every pipeline
stage's diagonal (cheb / mul / lcu / sum), a dense non-symmetric
encoding, packed diagonal extraction, and the quantum-vs-classical layer
forward.  Records achieved errors to benchmarks/records/tpu_contracts.json
(one honest number per contract instead of an untested "should hold").

Run on the chip (single-tenant: one TPU process at a time):
    PYTHONPATH=. python benchmarks/tpu_contracts.py
CPU smoke: PYTHONPATH=. QKAN_PLATFORM=cpu python benchmarks/tpu_contracts.py
"""

from qkan_implementation_tpu.utils.platform import apply_platform_env

apply_platform_env()

import json
import pathlib

import numpy as np
import jax
import jax.numpy as jnp

from qkan_implementation_tpu.encoding import fable
from qkan_implementation_tpu.ops import (
    dilated_chebyshev_diag,
    lcu_combine_diag,
    qkan_layer_forward,
)
from qkan_implementation_tpu.ops.qkan_layer import weighted_chebyshev_diag
from qkan_implementation_tpu.ops.quantum import (
    qkan_layer_forward_quantum,
    quantum_extract_diag_packed,
)
from qkan_implementation_tpu.sim import unitary


def block_error(a: np.ndarray) -> float:
    """Relative Frobenius error of the f32-simulated block encoding of a
    (the reference's verify_unitary contract, MulStep.py:115-166)."""
    a32 = np.asarray(a, dtype=np.float32)
    circ, alpha = fable(a32)
    u = np.asarray(unitary(circ, dtype=jnp.float32))
    n = a32.shape[0]
    rec = u[:n, :n] * alpha * n
    denom = np.linalg.norm(a32)
    if denom < 1e-30:
        return float(np.linalg.norm(rec))
    return float(np.linalg.norm(rec - a32) / denom)


def check_chip_floor(results, chip_floor, *, gate):
    """Return {contract: {achieved, floor}} for every measured contract
    exceeding its declared chip-level floor.  `gate=False` (non-TPU
    platforms) always returns {} -- CPU x64 runs are held to the tighter
    test-suite goldens instead.  Unit-tested in tests/test_benchmarks.py."""
    if not gate:
        return {}
    return {
        k: {"achieved": results[k], "floor": floor}
        for k, floor in chip_floor.items()
        if k in results and results[k] > floor
    }


def sharded_contracts(rng) -> dict:
    """Sharded path through real Mosaic (VERDICT r4 item 2).  The
    shard_map + Pallas ucry local path had only ever lowered through
    interpret mode (virtual CPU meshes).  A 1-device mesh on the real
    chip runs the SAME shard_map program with interpret=False, so the
    streaming ucry kernel and the packed diagonal extraction go through
    real Mosaic -- the tripwire for compiler drift on the SHARDED path
    (the dense-engine kernels are covered by contracts 1-5).  The RDMA
    exchange kernel (sim/rdma.py) needs >= 2 physical devices and
    remains interpret-mode-verified only."""
    from jax.sharding import Mesh
    from qkan_implementation_tpu.sim import sharded_simulate, simulate

    n_enc = 5
    size = 2**n_enc  # 2n - k = 10 >= 10: local ucry is Pallas-eligible
    diag_v = rng.uniform(-1, 1, size)
    fcirc, alpha = fable(np.diag(diag_v.astype(np.float32)))
    psi0 = np.zeros(2**fcirc.num_qubits, dtype=np.float32)
    psi0[:size] = 1.0 / np.sqrt(size)
    mesh1 = Mesh(np.asarray(jax.devices()[:1]), ("d",))
    psi_sh = np.asarray(
        sharded_simulate(
            fcirc, mesh1, psi0=jnp.asarray(psi0), backend="pallas",
            dtype=jnp.float32,
        )
    )
    rec_sh = psi_sh[:size] * alpha * size * np.sqrt(size)
    # engine-vs-engine: the sharded Pallas state against the dense
    # pure-XLA lowering of the identical circuit/initial state
    psi_xla = np.asarray(
        simulate(fcirc, psi0=jnp.asarray(psi0), dtype=jnp.float32,
                 backend="xla")
    )
    return {
        "sharded_pallas_diag32": float(
            np.linalg.norm(rec_sh - diag_v) / np.linalg.norm(diag_v)
        ),
        "sharded_vs_dense_state_maxabs": float(
            np.max(np.abs(psi_sh - psi_xla))
        ),
    }


def main():
    dev = jax.devices()[0]
    print(f"device: {dev} (platform {dev.platform})")
    rng = np.random.default_rng(42)
    results = {"device": str(dev), "platform": dev.platform, "dtype": "float32"}

    # 1. the reference's tightest golden: dilated Chebyshev N=4 deg 8
    x4 = rng.uniform(-1, 1, 4)
    diag = np.asarray(dilated_chebyshev_diag(jnp.asarray(x4), K=1, degree=8))
    results["cheb_dilated_N4_deg8"] = block_error(np.diag(diag))

    # 2. per-stage step contracts at N=K=4, deg 3 (MulStep/LCUStep/SUMStep)
    N = K = 4
    d = 3
    x = jnp.asarray(rng.uniform(-1, 1, N), dtype=jnp.float32)
    w = jnp.asarray(rng.uniform(-1, 1, (d + 1, N * K)), dtype=jnp.float32)
    for deg in range(d + 1):
        mul = np.asarray(weighted_chebyshev_diag(x, w[deg], K, deg))
        results[f"mul_deg{deg}"] = block_error(np.diag(mul))
    lcu = np.asarray(lcu_combine_diag(x, w, K))
    results["lcu"] = block_error(np.diag(lcu))
    summed = np.asarray(qkan_layer_forward(x, w, N, K))
    results["sum"] = block_error(np.diag(summed))

    # 3. dense non-symmetric encoding (orientation + structure)
    a = rng.uniform(-1, 1, (8, 8))
    results["dense_8x8"] = block_error(a)

    # 4. packed diagonal extraction at N*K=256 (the quantum-mode hot path)
    big = jnp.asarray(rng.uniform(-1, 1, 256), dtype=jnp.float32)
    rec = np.asarray(quantum_extract_diag_packed(big))
    results["packed_extract_256"] = float(
        np.linalg.norm(rec - np.asarray(big)) / np.linalg.norm(np.asarray(big))
    )

    # 5. quantum-vs-classical layer forward at N=K=16
    N = K = 16
    x16 = jnp.asarray(rng.uniform(-1, 1, N), dtype=jnp.float32)
    w16 = jnp.asarray(rng.uniform(-1, 1, (8, N * K)), dtype=jnp.float32)
    q = np.asarray(qkan_layer_forward_quantum(x16, w16, N, K))
    c = np.asarray(qkan_layer_forward(x16, w16, N, K))
    results["layer_quantum_vs_classical_N16"] = float(
        np.max(np.abs(q - c))
    )

    # 6. Gram-solve coefficient accuracy vs host f64 at a layer-like shape
    # (rows=4096, in=64, D=5 -> F=384).  The structure-search solves pin
    # matmul precision to 'highest' (models/fixed_kan._layer_gram_kernels):
    # without the pin, TPU f32 dots run ONE bf16 pass and the ~1/ridge
    # conditioning amplifies the Gram noise into O(10%) coefficient error.
    from qkan_implementation_tpu.models.fixed_kan import _layer_gram_kernels
    from qkan_implementation_tpu.ops.chebyshev import chebyshev_basis

    rows, in_dim, dp1 = 4096, 64, 6
    xg = jnp.asarray(
        np.tanh(rng.normal(0, 1.2, (rows, in_dim))), dtype=jnp.float32
    )
    yg = jnp.asarray(rng.normal(0, 1, (rows, 10)), dtype=jnp.float32)
    gram_fn, solve_fn = _layer_gram_kernels(dp1, in_dim, 1e-4)
    G, bvec, yy = gram_fn(chebyshev_basis(xg, dp1 - 1, clip=False), yg)
    c_dev, _ = solve_fn(G, bvec, yy, dp1 * in_dim)
    basis64 = np.asarray(
        chebyshev_basis(jnp.asarray(np.asarray(xg, np.float64)), dp1 - 1,
                        clip=False)
    )
    X64 = np.swapaxes(basis64, 1, 2).reshape(rows, dp1 * in_dim)
    c_ref = np.linalg.lstsq(X64, np.asarray(yg, np.float64), rcond=None)[0]
    results["gram_solve_coeff_relerr_F384"] = float(
        np.linalg.norm(np.asarray(c_dev) - c_ref) / np.linalg.norm(c_ref)
    )

    # 7. forward-precision policy at flagship fan-in (r4).  The model
    # forward defaults to a fan-in-aware precision policy
    # (forward_matmul_precision='auto': F >= 512 pins bf16x3) because one
    # bf16 pass at F=4704 measured 5.6 test-accuracy points of pure eval
    # error (eval_precision_probe).  This contract runs the flagship
    # layer-0 shape under the DEFAULT policy vs host f64: if the policy is
    # ever silently disabled, the error jumps ~two orders to the
    # single-pass level and the floor gate exits 1.
    from qkan_implementation_tpu.models.fixed_kan import kan_layer_apply

    in_dim, out, t_dim, D = 784, 32, 10, 5
    lp = {
        "degrees": jnp.asarray(
            rng.integers(0, D + 1, out).astype(np.int32)
        ),
        "coefficients": jnp.asarray(
            rng.normal(0, 0.3, (out, in_dim, D + 1, t_dim)),
            dtype=jnp.float32,
        ),
        "horizontal_weights": jnp.asarray(
            rng.normal(0, 1, out), dtype=jnp.float32
        ),
    }
    xf = jnp.asarray(rng.uniform(-1, 1, (256, in_dim)), dtype=jnp.float32)
    got = np.asarray(jax.jit(
        lambda p, xb: kan_layer_apply(p, xb, D)
    )(lp, xf), dtype=np.float64)
    # Host f64 reference in PURE numpy.  (A jnp-based reference would
    # silently downcast to f32 without x64 AND re-run the same on-device
    # policy as `got`, making the contract vacuous: both sides would drop
    # to a single bf16 pass together and the gate could never fire.)
    x64 = np.asarray(xf, np.float64)
    t64 = np.tanh(x64)
    basis64 = np.empty(t64.shape + (D + 1,), np.float64)
    basis64[..., 0] = 1.0
    basis64[..., 1] = t64
    for k in range(2, D + 1):
        basis64[..., k] = (
            2.0 * t64 * basis64[..., k - 1] - basis64[..., k - 2]
        )
    mask64 = (
        np.arange(D + 1)[None, :] <= np.asarray(lp["degrees"])[:, None]
    )
    W64 = np.einsum(
        "oidt,od->idt",
        np.asarray(lp["coefficients"], np.float64),
        mask64 * np.asarray(lp["horizontal_weights"], np.float64)[:, None],
    ).reshape(-1, t_dim)
    want = basis64.reshape(x64.shape[0], -1) @ W64
    results["layer_forward_policy_F4704"] = float(
        np.linalg.norm(got - want) / np.linalg.norm(want)
    )

    results.update(sharded_contracts(rng))

    reference_bars = {
        "cheb_dilated_N4_deg8": 1e-15,  # ChebyshevStep.py:133 (x64 bar)
        "mul_deg0": 1e-6,
        "lcu": 1e-6,
        "sum": 1e-6,
        "dense_8x8": 1e-6,
    }
    print(f"{'contract':36s} {'achieved(f32)':>14s}  x64-suite bar")
    for k, v in results.items():
        if isinstance(v, float):
            bar = reference_bars.get(k)
            bar_s = f"{bar:.0e}" if bar else "-"
            print(f"{k:36s} {v:14.3e}  {bar_s}")

    # Regression gate (VERDICT r2 item 4): the chip-level f32 contract is
    # DECLARED here -- 2x the values measured and committed in round 2
    # (records/tpu_contracts.json @ TPU v5 lite) -- and the bench FAILS
    # when any contract regresses past it, so a silent 10x precision loss
    # can no longer "pass".  docs/benchmarks.md states the same floors.
    chip_floor = {
        "cheb_dilated_N4_deg8": 2.2e-07,
        "mul_deg0": 6.0e-07,
        "mul_deg1": 8.0e-07,
        "mul_deg2": 1.3e-06,
        "mul_deg3": 1.1e-06,
        "lcu": 1.7e-06,
        "sum": 1.6e-06,
        "dense_8x8": 1.6e-07,
        "packed_extract_256": 3.9e-05,
        "layer_quantum_vs_classical_N16": 2.3e-05,
        # Ridge-bias dominated (lambda=1e-4 vs exact lstsq), not pure f32
        # noise: CPU f32 with the same 'highest' pin measures 1.7e-3.
        "gram_solve_coeff_relerr_F384": 4.0e-03,
        # vs HOST f64: bf16x3 at F=4704 measured 2.2e-5 on-chip (CPU f32
        # 5.4e-7); a silently-disabled policy (single bf16 pass) measured
        # 1.5e-3 -- 30x past this floor, so the gate separates cleanly in
        # both directions.  (The earlier-committed 2.1e-7 was a vacuous
        # jit-vs-eager comparison -- both sides ran the same on-device
        # policy; fixed to a pure-numpy f64 reference this revision.)
        "layer_forward_policy_F4704": 5.0e-05,
        # Sharded shard_map+Pallas ucry through REAL Mosaic (r5): the
        # FABLE round-trip of a 32-entry diagonal (11-qubit circuit, one
        # ladder + one Pallas-streamed multiplexed Ry) at f32.  Floors are
        # 2x the first committed on-chip measurement (9.65e-8 / 1.49e-8,
        # 2026-08-20 -- bit-identical to interpret mode); dense-XLA
        # agreement bounds the Mosaic-specific part.
        "sharded_pallas_diag32": 2.0e-07,
        "sharded_vs_dense_state_maxabs": 3.0e-08,
    }
    regressions = check_chip_floor(
        results, chip_floor, gate=jax.devices()[0].platform == "tpu"
    )
    results["chip_floor"] = chip_floor
    results["regressions"] = regressions

    out = pathlib.Path(__file__).resolve().parent / "records"
    out.mkdir(parents=True, exist_ok=True)
    # CPU smoke runs must not clobber the committed on-chip record.
    name = (
        "tpu_contracts.json"
        if dev.platform == "tpu"
        else f"tpu_contracts_{dev.platform}.json"
    )
    (out / name).write_text(json.dumps(results, indent=1))
    print(f"records -> {out / name}")
    if regressions:
        print(f"PRECISION REGRESSION vs declared chip floor: {regressions}")
        raise SystemExit(1)


if __name__ == "__main__":
    main()
