"""End-to-end training orchestration (reference examples/train_common.py
parity, TPU-native).

Responsibilities carried over 1:1 (train_common.py:78-354): derived LR
(0.00125 * global batch), step decay at 120/180 & 160/180, params.yaml +
JSON log + plots in logs/<timestamp>/, periodic evaluation, best-mAP
``snapshot_model.npz``, visualization report, process-0-only side effects.

TPU-native replacements: ChainerMN -> Mesh data parallelism (one process
drives all local devices; multi-host via jax.distributed), SerialIterator ->
prefetching TrainLoader with per-host shards, StandardUpdater -> a jitted
pjit train step.
"""

from __future__ import annotations

import functools
import os
import os.path as osp
import time
from dataclasses import asdict
from typing import Dict, Optional

import jax

from mask_rcnn_tpu.engine.evaluator import (
    InstanceSegmentationEvaluator,
    VisReport,
)
from mask_rcnn_tpu.engine.trainer import (
    create_train_state,
    make_optimizer,
    make_train_step,
)
from mask_rcnn_tpu.models.api import MaskRCNNResNet
from mask_rcnn_tpu.models.mask_rcnn import MaskRCNNConfig, init_params
from mask_rcnn_tpu.parallel import (
    make_mesh,
    make_parallel_train_step,
    process_zero,
    replicated,
    shard_batch,
)
from mask_rcnn_tpu.utils.checkpoint import save_params
from mask_rcnn_tpu.utils.logging import (
    LogReport,
    dump_params,
    plot_metrics,
)


@functools.lru_cache(maxsize=4)
def _train_setup(cfg: MaskRCNNConfig, base_lr: float, total_steps: int,
                 clip_norm, mesh):
    """Optimizer + jitted parallel train step, memoized on everything that
    shapes the compiled graph. Repeated ``train()`` calls in one process
    (checkpoint-then-resume flows, notebook reruns, sweeps over data but
    not config) reuse the traced/compiled step instead of paying the full
    trace+compile again. The optimizer only needs the parameter
    *structure* for its trainable mask (real parameters arrive per call
    through TrainState), so build it abstractly — no throwaway full-size
    init on device."""
    template = jax.eval_shape(
        lambda: init_params(jax.random.PRNGKey(0), cfg)
    )
    optimizer, schedule = make_optimizer(template, base_lr, total_steps,
                                         clip_norm=clip_norm)
    step_fn = make_train_step(cfg, optimizer)
    p_step = make_parallel_train_step(step_fn, mesh)
    return optimizer, schedule, p_step


def train(
    cfg: MaskRCNNConfig,
    train_loader,
    out_dir: str,
    max_epoch: float,
    batch_size_per_device: int = 1,
    evaluator: Optional[InstanceSegmentationEvaluator] = None,
    vis_report: Optional[VisReport] = None,
    eval_interval_epochs: float = 1.0,
    log_interval: int = 20,
    seed: int = 0,
    lr: Optional[float] = None,
    extra_params: Optional[Dict] = None,
    resume_from: Optional[str] = None,
    checkpoint_interval_steps: Optional[int] = None,
    clip_norm: Optional[float] = None,
    initializer: str = "normal",
    pretrained_model: Optional[str] = None,
    stop_at_step: Optional[int] = None,
) -> Dict:
    """Run the full training schedule; returns the final report."""
    # Mesh sized from the loader's *per-host* batch: it must shard evenly
    # over this host's slice of the 'data' axis
    # (local_batch = batch_size_per_device * n_local_mesh_devices).
    if (
        train_loader.batch_size % batch_size_per_device != 0
        or train_loader.batch_size < batch_size_per_device
    ):
        raise ValueError(
            f"loader batch_size ({train_loader.batch_size}) must be a "
            f"multiple of batch_size_per_device ({batch_size_per_device}) "
            "— a silent floor here would run a different per-device batch "
            "than the LR/params.yaml accounting assumes"
        )
    n_local = train_loader.batch_size // batch_size_per_device
    if jax.process_count() > 1:
        # Multi-host: one global mesh over every device of every process;
        # each process feeds its local shard (shard_batch assembles the
        # global array), XLA reduces gradients over ICI/DCN.
        if n_local != len(jax.local_devices()):
            raise ValueError(
                f"multi-host training needs the per-host batch "
                f"({train_loader.batch_size}) to cover all "
                f"{len(jax.local_devices())} local devices at "
                f"{batch_size_per_device}/device"
            )
        devices = jax.devices()
    else:
        devices = jax.local_devices()[:n_local]
        if len(devices) < n_local:
            raise ValueError(
                f"batch {train_loader.batch_size} needs {n_local} devices, "
                f"have {len(jax.local_devices())}"
            )
    mesh = make_mesh(devices)
    n_devices = len(devices)
    global_batch = batch_size_per_device * n_devices
    base_lr = lr if lr is not None else 0.00125 * global_batch

    steps_per_epoch = train_loader.steps_per_epoch()
    total_steps = int(max_epoch * steps_per_epoch)
    if total_steps <= 0:
        raise ValueError(
            f"no training steps: steps_per_epoch={steps_per_epoch} at "
            f"batch {train_loader.batch_size} x max_epoch={max_epoch} "
            "(batch size larger than the per-host dataset shard?)"
        )
    # The LR schedule always spans the full max_epoch run; stop_at_step only
    # interrupts execution (e.g. to checkpoint and resume later).
    stop_step = min(stop_at_step or total_steps, total_steps)

    params = init_params(
        jax.random.PRNGKey(seed), cfg, initializer=initializer
    )
    if pretrained_model:
        from mask_rcnn_tpu.models.api import resolve_pretrained_params

        params = resolve_pretrained_params(pretrained_model, params, cfg)
    optimizer, schedule, p_step = _train_setup(
        cfg, base_lr, total_steps, clip_norm, mesh
    )
    state = create_train_state(params, optimizer)
    if resume_from:
        from mask_rcnn_tpu.utils.checkpoint import restore_train_state

        state = restore_train_state(resume_from, state)
        print(f"resumed from {resume_from} at step {int(state.step)}")

    rep = replicated(mesh)
    state = jax.device_put(state, rep)

    log = LogReport(out_dir)
    if process_zero():
        # Library callers pass arbitrary out_dirs; create it like the
        # reference's trainer does its out (train_common.py log_dir).
        os.makedirs(out_dir, exist_ok=True)
        dump_params(
            out_dir,
            {
                "model_config": asdict(cfg),
                "batch_size": global_batch,
                "lr": base_lr,
                "max_epoch": max_epoch,
                "seed": seed,
                "n_devices": n_devices,
                **(extra_params or {}),
            },
        )

    best_map = -1.0
    it = int(jax.device_get(state.step))
    t_start = time.time()
    running: Dict[str, float] = {}
    running_n = 0  # steps accumulated since the last log flush (a resume
    # can land mid-interval, so dividing by log_interval would under-report
    # the first post-resume entry)
    # Bit-faithful resume: restart at the epoch/position the restored step
    # had reached, so interrupted+resumed sees the exact same data sequence
    # as an uninterrupted run (the loader's epoch shuffle is a pure function
    # of (seed, epoch)). Positions are derived from actual per-epoch batch
    # counts (robust to loader subclasses whose epoch lengths vary).
    epoch, skip = train_loader.position_for_step(it)
    last_step_epoch = epoch
    eval_every = max(int(eval_interval_epochs * steps_per_epoch), 1)

    base_rng = jax.device_put(jax.random.PRNGKey(seed), rep)

    while it < stop_step:
        # index-level fast-forward: skipped batches are never decoded
        batches = train_loader.epoch(epoch, skip=skip)
        skip = 0
        for batch in batches:
            if it >= stop_step:
                break
            sbatch = shard_batch(batch, mesh)
            state, metrics = p_step(state, sbatch, base_rng)
            it += 1
            last_step_epoch = epoch

            # Accumulate lazily on device; only materialize at log time
            # (a per-step device_get would synchronize every step).
            for k, v in metrics.items():
                running[k] = running.get(k, 0.0) + v
            running_n += 1
            if it % log_interval == 0:
                if process_zero():
                    entry = {
                        "epoch": epoch,
                        "iteration": it,
                        "elapsed_time": time.time() - t_start,
                        "lr": float(schedule(it)),
                    }
                    entry.update(
                        {
                            "main/" + k:
                            float(jax.device_get(v)) / running_n
                            for k, v in running.items()
                        }
                    )
                    log.append(entry)
                    print(
                        f"[it {it}/{total_steps}] "
                        + " ".join(
                            f"{k.split('/')[-1]}={v:.4f}"
                            for k, v in entry.items()
                            if k.startswith("main/")
                        )
                    )
                # every process drops its accumulator (device refs would
                # pile up forever on non-zero ranks otherwise)
                running = {}
                running_n = 0

            if (
                checkpoint_interval_steps
                and it % checkpoint_interval_steps == 0
                and process_zero()
            ):
                from mask_rcnn_tpu.utils.checkpoint import save_train_state

                save_train_state(
                    osp.join(out_dir, "train_state"),
                    jax.device_get(state),
                )

            if evaluator is not None and it % eval_every == 0:
                report = _evaluate(
                    cfg, state, evaluator, vis_report, it, mesh
                )
                if process_zero():
                    entry = {"epoch": epoch, "iteration": it}
                    entry.update(report)
                    log.append(entry)
                    cur = report.get("validation/main/map", -1)
                    if cur > best_map:
                        best_map = cur
                        save_params(
                            osp.join(out_dir, "snapshot_model.npz"),
                            jax.device_get(state.params),
                        )
                    plot_metrics(
                        out_dir, log.entries,
                        [f"main/{k}" for k in (
                            "loss", "roi_mask_loss", "rpn_cls_loss")],
                        "loss.png",
                    )
                    plot_metrics(
                        out_dir, log.entries,
                        ["validation/main/map"], "accuracy.png",
                    )
        epoch += 1

    # Flush a final mid-interval accumulator so short runs (fewer than
    # log_interval steps) still record their losses in the log. Stamped
    # with the epoch the accumulated steps actually ran in (``epoch``
    # itself has already been incremented past the last executed epoch).
    if running_n and process_zero():
        entry = {
            "epoch": last_step_epoch,
            "iteration": it,
            "elapsed_time": time.time() - t_start,
            "lr": float(schedule(it)),
        }
        entry.update(
            {
                "main/" + k: float(jax.device_get(v)) / running_n
                for k, v in running.items()
            }
        )
        log.append(entry)

    # Final snapshot if never evaluated — or if evaluation never produced a
    # positive mAP (the best-snapshot trigger fires only on improvement, so
    # without this an all-zero-mAP run would leave the earliest, least
    # trained params on disk).
    if best_map <= 0 and process_zero():
        save_params(
            osp.join(out_dir, "snapshot_model.npz"),
            jax.device_get(state.params),
        )
    return {"best_map": best_map, "iterations": it,
            "elapsed": time.time() - t_start}


def _evaluate(cfg, state, evaluator, vis_report, iteration, mesh=None):
    # Single-process meshes run sharded inference over the training devices;
    # with multiple processes each host predicts its dataset shard locally
    # (globally-sharded predict would need every host to see every image).
    eval_mesh = mesh if (mesh is not None
                         and jax.process_count() == 1) else None
    params = jax.device_get(state.params)
    model = MaskRCNNResNet.from_config(cfg, params, mesh=eval_mesh)
    report = evaluator(model)
    if vis_report is not None and process_zero():
        model.score_thresh = vis_report.score_thresh
        vis_report(model, iteration)
        model.score_thresh = 0.05
    return report
