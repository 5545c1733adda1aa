"""Profiling / tracing helpers.

The reference has no performance tooling beyond a wall-clock speedtest
(SURVEY.md §5). Here: a context manager around ``jax.profiler`` producing
TensorBoard-loadable traces, a robust wall-clock timer that forces a real
device sync (the dev TPU sits behind a network tunnel where
``block_until_ready`` does not reliably block), and a simple per-stage
timing table.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict, List, Tuple

import jax
import numpy as np


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a device trace viewable in TensorBoard / Perfetto."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def sync(tree) -> None:
    """Force completion by fetching one scalar from the first leaf."""
    leaf = jax.tree.leaves(tree)[0]
    np.asarray(jax.numpy.ravel(leaf)[0])


def time_fn(fn: Callable, *args, iters: int = 10, warmup: int = 2) -> float:
    """Milliseconds per call, amortized over ``iters`` with one end sync."""
    out = None
    for _ in range(warmup):
        out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / iters * 1000.0


def time_fn_chained(build: Callable, feed, reps: int = 50,
                    iters: int = 4) -> float:
    """Device milliseconds/op: chain ``reps`` data-dependent calls in one jit.

    Isolated per-call timing through the dev tunnel carries a ~1 ms host
    dispatch floor plus a multi-ms D2H fetch at the final sync, which
    misattributes time to whatever small op is being measured (e.g. a
    65520-element ``lax.top_k`` measures 2.8 ms isolated but 0.11 ms
    in-graph). Folding a zero-scaled scalar from each call's output back
    into the (array) ``feed`` forces ``reps`` sequential executions on
    device, amortizing dispatch and fetch to noise.

    ``build`` maps the feed array to any output pytree; values are
    unchanged between reps (the fold-in multiplies by 0.0), so the timing
    reflects steady-state execution of the same computation.
    """
    import jax.numpy as jnp

    def first_scalar(tree):
        leaf = jax.tree.leaves(tree)[0]
        return leaf[tuple(0 for _ in leaf.shape)].astype(jnp.float32)

    @jax.jit
    def run(x):
        def body(_, x):
            return x + (0.0 * first_scalar(build(x))).astype(x.dtype)

        return jax.lax.fori_loop(0, reps, body, x)

    out = run(feed)
    np.asarray(out[tuple(0 for _ in out.shape)])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = run(feed)
    np.asarray(out[tuple(0 for _ in out.shape)])
    return (time.perf_counter() - t0) / iters / reps * 1000.0


def time_train_steps_chained(step, state, batch, key, reps: int = 12,
                             iters: int = 3) -> float:
    """Steady-state milliseconds per train step: ``reps`` REAL consecutive
    steps (state carried, rng key folded per step) inside one
    ``lax.scan`` under jit — dispatch-free, the stateful analog of
    ``time_fn_chained``. The returned last-step loss fetch is the only
    host sync per timed iteration."""

    @jax.jit
    def run(state, key):
        def body(carry, _):
            s, k = carry
            k = jax.random.fold_in(k, 1)
            s, metrics = step(s, batch, k)
            return (s, k), metrics["loss"]

        (_, _), losses = jax.lax.scan(body, (state, key), None, length=reps)
        return losses[-1]

    out = run(state, key)
    float(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = run(state, key)
    float(out)
    return (time.perf_counter() - t0) / iters / reps * 1000.0


def profile_stages(stages: List[Tuple[str, Callable, tuple]],
                   iters: int = 10) -> Dict[str, float]:
    """Time named (fn, args) stages; returns {name: ms}."""
    report = {}
    for name, fn, args in stages:
        report[name] = time_fn(fn, *args, iters=iters)
    total = sum(report.values())
    width = max(len(k) for k in report)
    for k, v in report.items():
        print(f"{k:<{width}} {v:8.2f} ms  {100 * v / total:5.1f}%")
    print(f"{'total':<{width}} {total:8.2f} ms")
    return report
