"""Training THROUGH the quantum simulator: gradients across block encodings.

The BASELINE north star the reference never reaches (its quantum path is
forward-only): fit QKAN layer weights by gradient descent where every
forward pass physically round-trips the LCU diagonal through its FABLE
circuit on the statevector engine -- d(loss)/d(weights) flows through
arccos -> gate application -> amplitude extraction.

Run:  PYTHONPATH=. QKAN_PLATFORM=cpu python examples/quantum_training_demo.py
"""

from qkan_implementation_tpu.utils.platform import apply_platform_env

apply_platform_env()

import numpy as np
import jax
import jax.numpy as jnp

from qkan_implementation_tpu.ops import qkan_layer_forward
from qkan_implementation_tpu.ops.quantum import qkan_layer_forward_quantum


def main():
    N = K = 2
    d = 2
    rng = np.random.default_rng(0)
    # target: outputs of a hidden "true" weight setting on a few probes
    w_true = jnp.asarray(rng.uniform(-0.8, 0.8, (d + 1, N * K)))
    xs = jnp.asarray(rng.uniform(-0.9, 0.9, (6, N)))
    targets = jnp.stack([qkan_layer_forward(x, w_true, N, K) for x in xs])

    def loss(w):
        preds = jnp.stack(
            [qkan_layer_forward_quantum(x, w, N, K) for x in xs]
        )
        return jnp.mean((preds - targets) ** 2)

    import optax

    w = jnp.asarray(rng.uniform(-0.5, 0.5, (d + 1, N * K)))
    tx = optax.adam(0.05)
    opt_state = tx.init(w)
    value_and_grad = jax.jit(jax.value_and_grad(loss))
    initial = float(loss(w))
    print("training QKAN weights through the block-encoding simulator:")
    for step in range(150):
        l, g = value_and_grad(w)
        updates, opt_state = tx.update(g, opt_state)
        w = jnp.clip(optax.apply_updates(w, updates), -1.0, 1.0)
        if step % 30 == 0 or step == 149:
            print(f"  step {step:3d}  loss {float(l):.3e}")
    final = float(loss(w))
    print(f"loss: {initial:.3e} -> {final:.3e}")
    assert final < initial / 100.0, "quantum-path training failed to converge"
    print("OK: gradients through the simulator train the layer")


if __name__ == "__main__":
    main()
