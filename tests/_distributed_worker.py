"""Worker process for the 2-process distributed CPU test.

Launched by tests/test_parallel.py::test_two_process_distributed_training
with JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID and 4
virtual CPU devices per process. Runs distributed_init() (the DCN path of
parallel/sharding.py), trains a few ShardedTrainer steps on a 2x4
("data" across processes, "tile" within) mesh, and prints the loss
trajectory + a parameter checksum for the parent to compare across
processes and against single-process training.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Env (platform, device count, coordination) is fully set by the parent —
# import jax only now.
import jax  # noqa: E402

# The axon sitecustomize pins jax_platforms to "axon,cpu" at interpreter
# start, overriding the env var; force CPU via the config (same dance as
# tests/conftest.py).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

from reduced_3dgs_tpu.parallel import (  # noqa: E402
    ShardedTrainer, distributed_init, make_mesh, shard_train_step)


def main():
    assert distributed_init() is True, "distributed_init must initialize"
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 8, len(jax.devices())
    assert len(jax.local_devices()) == 4, len(jax.local_devices())

    from tests.test_trainer import _perturbed_model, _toy_scene
    gt_model, ds = _toy_scene(n=16, hw=32, n_cams=2)
    model = _perturbed_model(gt_model)
    mesh = make_mesh(n_data=2, n_tile=4)
    trainer = ShardedTrainer(model, ds, mesh=mesh)

    losses = []
    for it in range(4):
        loss, out = shard_train_step(trainer, [ds[0], ds[1]])
        losses.append(float(loss))

    import numpy as np
    params = trainer.model.parameters()
    checksum = float(sum(np.abs(np.asarray(v)).sum()
                         for v in params.values()))
    print("RESULT " + json.dumps({"losses": losses, "checksum": checksum}),
          flush=True)


if __name__ == "__main__":
    main()
    # The registered-but-uninitialized axon PJRT plugin hangs interpreter
    # teardown (see tests/conftest.py); results are printed, exit hard.
    sys.stdout.flush()
    sys.stderr.flush()
    os._exit(0)
