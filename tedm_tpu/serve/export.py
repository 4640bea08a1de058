"""AOT export of serving functions (jax.export / StableHLO).

A production capability with no reference equivalent: compile-free
serving. The segmentation predictor (or any jitted function) is exported
once to a self-contained StableHLO artifact; a serving process
deserializes and calls it without Python model code, checkpoints, or
tracing — params are baked in as constants.

    # producer
    export_predictor(exp_dir, "/models/tedm197.bin")

    # consumer (any process with jax for the same platform)
    predict = load_exported("/models/tedm197.bin")
    probs = predict(images_nhwc)        # (fold*B, H, W, 1) sigmoids

Exports are platform-specific by default (TPU artifact runs on TPU).
"""

from __future__ import annotations

from typing import Callable, Optional

import numpy as np


def export_predictor(
    exp_dir: str,
    out_path: str,
    batch_size: int = 1,
    seed: int = 0,
) -> int:
    """Export an experiment's sigmoid predictor (params baked in) to
    ``out_path``. Returns the serialized size in bytes."""
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    from tedm_tpu.eval.harness import load_experiment

    config, state, task = load_experiment(exp_dir)
    params, bstats = state["params"], state["batch_stats"]
    rng = jax.random.PRNGKey(seed)

    @jax.jit
    def predict(x):
        logits, _ = task.apply(params, bstats, x, rng, False)
        return jax.nn.sigmoid(logits.astype(jnp.float32))

    x_spec = jax.ShapeDtypeStruct(
        (batch_size, config.img_size, config.img_size, config.channels),
        jnp.float32,
    )
    exp = jexport.export(predict)(x_spec)
    data = exp.serialize()
    with open(out_path, "wb") as f:
        f.write(data)
    return len(data)


def load_exported(path: str) -> Callable[[np.ndarray], np.ndarray]:
    """Deserialize an exported predictor into a callable."""
    from jax import export as jexport

    with open(path, "rb") as f:
        exp = jexport.deserialize(f.read())

    def call(x):
        return np.asarray(exp.call(x))

    return call


def main(argv=None) -> None:
    import argparse

    p = argparse.ArgumentParser(
        description="Export a trained experiment's predictor to StableHLO"
    )
    p.add_argument("--experiment", "-e", required=True, help="experiment dir")
    p.add_argument("--out", required=True)
    p.add_argument("--batch_size", type=int, default=1)
    args = p.parse_args(argv)
    n = export_predictor(args.experiment, args.out, args.batch_size)
    print(f"wrote {args.out} ({n} bytes)")


if __name__ == "__main__":
    main()
