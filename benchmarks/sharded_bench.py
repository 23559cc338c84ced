"""Sharded-statevector benchmark: exchange counts + wall-clock on a mesh.

Real multi-chip slices are unavailable in this environment, so this runs on
the virtual CPU mesh (XLA_FLAGS=--xla_force_host_platform_device_count=8) to
quantify the *schedule*: how many qubit-remap collectives the lazy layout
issues for real workloads vs the naive exchange-in/out-per-gate bound, and
the wall-clock effect of chunked exchanges.  On a real slice the same
schedule rides ICI.

Run: PYTHONPATH=. QKAN_PLATFORM=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
         python benchmarks/sharded_bench.py --qubits 22
"""

from qkan_implementation_tpu.utils.platform import apply_platform_env

apply_platform_env()

import argparse
import json
import pathlib
import time

import numpy as np
import jax
import jax.numpy as jnp

from qkan_implementation_tpu.parallel import make_mesh
from qkan_implementation_tpu.sim import Circuit
from qkan_implementation_tpu.sim.sharded import count_exchanges, sharded_simulate


def fable_circuit(n: int):
    from qkan_implementation_tpu.encoding import fable

    rng = np.random.default_rng(0)
    circ, _ = fable(np.diag(rng.uniform(-1, 1, 2**n)))
    return circ


def global_heavy_circuit(q: int, layers: int = 4):
    """Worst case: every layer acts on the top (global) qubits."""
    rng = np.random.default_rng(1)
    circ = Circuit(q)
    for _ in range(layers):
        for t in range(q - 4, q):
            circ.h(t)
            circ.cry(float(rng.uniform(0, np.pi)), t, (t + 3) % q)
    return circ


def naive_exchange_bound(circ: Circuit, q_local: int) -> int:
    """Exchange count of the strawman schedule: swap every global qubit in
    and back out around each gate that touches it."""
    count = 0
    for g in circ.gates:
        qubits = g.qubits if g.name != "ucry" else g.qubits[:1]
        if g.name == "diag":
            continue
        count += 2 * sum(1 for t in qubits if t >= q_local)
    return count


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--qubits", type=int, default=22)
    ap.add_argument("--devices", type=int, default=None)
    ap.add_argument(
        "--exchange-impl", default="collective",
        choices=["collective", "rdma"],
        help="'rdma' times the fused exchange+ucry kernel (sim/rdma.py); "
        "meaningful on a real TPU slice -- on the CPU mesh the kernel runs "
        "under interpret mode, so wall-clock there only checks the path",
    )
    args = ap.parse_args()

    n_dev = args.devices or min(8, len(jax.devices()))
    mesh = make_mesh(n_dev, axis_name="d")
    k = int(np.log2(n_dev))
    records = []

    workloads = {
        f"fable_diag_n{(args.qubits - 1) // 2}": fable_circuit(
            (args.qubits - 1) // 2
        ),
        f"global_heavy_q{args.qubits}": global_heavy_circuit(args.qubits),
    }
    for name, circ in workloads.items():
        q_local = circ.num_qubits - k
        lazy = count_exchanges(circ, n_dev)
        naive = naive_exchange_bound(circ, q_local)
        row = {
            "workload": name,
            "qubits": circ.num_qubits,
            "gates": circ.gate_count,
            "devices": n_dev,
            "exchanges_lazy_layout": lazy,
            "exchanges_naive_bound": naive,
        }
        row["exchange_impl"] = args.exchange_impl
        for chunks in (1, 4):
            f = jax.jit(
                lambda c=circ, ch=chunks: sharded_simulate(
                    c, mesh, dtype=jnp.float32, exchange_chunks=ch,
                    exchange_impl=args.exchange_impl,
                )
            )
            psi = f()
            jax.block_until_ready(psi)
            t0 = time.time()
            psi = f()
            jax.block_until_ready(psi)
            row[f"wall_s_chunks{chunks}"] = round(time.time() - t0, 4)
        row["platform"] = jax.devices()[0].platform
        records.append(row)
        print(row)

    out = pathlib.Path(__file__).resolve().parent / "records"
    out.mkdir(parents=True, exist_ok=True)
    (out / "sharded_statevector.json").write_text(json.dumps(records, indent=1))
    print(f"records -> {out / 'sharded_statevector.json'}")


if __name__ == "__main__":
    main()
