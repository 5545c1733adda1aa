"""Worker process for the 2-process jax.distributed test.

Each worker owns 2 virtual CPU devices (4 global), builds the global mesh,
feeds its local slice of a deterministic synthetic batch, trains N steps,
and (process 0) writes the loss sequence to a JSON file. Mirrors the
reference's mpirun multi-node flow (examples/train_common.py:96-104) on the
jax.distributed stack.

Usage: python multihost_worker.py <process_id> <coordinator> <out_json>
       python multihost_worker.py <process_id> <coordinator> <out_dir> flow
Env: set by the parent test (XLA_FLAGS device count 4, JAX_PLATFORMS=cpu).

``flow`` mode runs the FULL engine.loop.train flow — TrainLoader per-host
shards, the evaluator with collective report aggregation, and process-0
checkpoint/log gating — under jax.distributed, mirroring the reference's
whole mpirun path (examples/train_common.py:96-104,200-205,271-283) rather
than just the raw train step.
"""

import json
import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=2"
).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def run_flow_mode(out_dir):
    """Full train()+evaluator+checkpoint flow (see module docstring)."""
    import json as json_mod

    from tests.multihost_common import run_train_flow

    report = run_train_flow(out_dir)
    with open(os.path.join(out_dir, "flow_result.json"), "w") as f:
        json_mod.dump(
            {k: float(v) for k, v in report.items()}, f
        )


def main():
    process_id = int(sys.argv[1])
    coordinator = sys.argv[2]
    out_json = sys.argv[3]
    mode = sys.argv[4] if len(sys.argv) > 4 else "step"

    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=2,
        process_id=process_id,
    )
    assert jax.process_count() == 2
    assert len(jax.devices()) == 4
    assert len(jax.local_devices()) == 2

    sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))

    if mode == "flow":
        run_flow_mode(out_json)  # out_json is the per-process out_dir
        jax.distributed.shutdown()
        return

    if mode == "pooledeval":
        from tests.multihost_common import run_pooled_eval

        report = run_pooled_eval()
        with open(out_json, "w") as f:
            json.dump({k: float(v) for k, v in report.items()}, f)
        jax.distributed.shutdown()
        return

    if mode == "faileval":
        from tests.multihost_common import run_failing_eval

        msg = run_failing_eval()
        with open(out_json, "w") as f:
            json.dump({"process": process_id, "error": msg}, f)
        jax.distributed.shutdown()
        # success for this mode = the collective failure propagated here
        sys.exit(0 if msg and "process(es) [1]" in msg else 1)

    import numpy as np

    from mask_rcnn_tpu.engine import (
        create_train_state,
        make_optimizer,
        make_train_step,
    )
    from mask_rcnn_tpu.models import init_params
    from mask_rcnn_tpu.models.targets import (
        AnchorTargetConfig,
        ProposalTargetConfig,
    )
    from mask_rcnn_tpu.parallel import (
        make_mesh,
        make_parallel_train_step,
        replicated,
        shard_batch,
    )
    from tests.test_parallel import make_tiny_batch, tiny_cfg

    cfg = tiny_cfg()
    params = init_params(jax.random.PRNGKey(0), cfg)
    optimizer, _ = make_optimizer(params, base_lr=0.01, total_steps=10)
    state = create_train_state(params, optimizer)
    step_fn = make_train_step(
        cfg,
        optimizer,
        proposal_cfg=ProposalTargetConfig(n_sample=8),
        anchor_cfg=AnchorTargetConfig(n_sample=16),
    )
    mesh = make_mesh(jax.devices())  # global 4-device mesh (2 per process)
    p_step = make_parallel_train_step(step_fn, mesh)
    rep = replicated(mesh)
    state = jax.device_put(state, rep)
    rng = jax.device_put(jax.random.PRNGKey(1), rep)

    global_batch = make_tiny_batch(4)
    local = {k: v[process_id * 2:(process_id + 1) * 2]
             for k, v in global_batch.items()}

    losses = []
    for _ in range(3):
        sbatch = shard_batch(local, mesh)
        state, metrics = p_step(state, sbatch, rng)
        losses.append(float(np.asarray(jax.device_get(metrics["loss"]))))

    if process_id == 0:
        with open(out_json, "w") as f:
            json.dump(losses, f)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
