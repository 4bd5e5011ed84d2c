"""Device mesh + sharding layouts.

The reference's only distribution mechanisms are HF-accelerate DDP for
training (``concept_training/diffusers_training_xl_new.py:503-508,913-920``,
NCCL underneath) and an env-var-pinned subprocess for segmentation
(``fusion_generation/fusion_sampling.py:458-459``). The TPU-native
equivalents here:

* **Training DP**: a 1-D ``("dp",)`` mesh; params replicated, batch sharded
  on ``dp``; grads reduced by XLA-inserted collectives under ``jit`` with
  sharding annotations (no hand-written psum needed at this layer).
* **Inference concept/CFG-row parallelism** (the repo-specific axis —
  SURVEY §2.5): the fused phase's N+1 batch rows shard across chips, each
  chip computing its concept's eps with its K/V slot; the Tweedie fusion
  reduction rides ICI.
* **Batch-of-seeds parallelism**: multiple seeds/prompts shard on ``dp``
  for the "8 seeds in parallel" serving config.

TP/PP/SP/EP are intentionally absent: SDXL fits in one v5e chip's HBM in
bf16 and the reference has no model-parallel path either (SURVEY §2.5 marks
them N/A). The mesh helpers still accept extra axes so a TP axis can be
added without API changes.
"""

from __future__ import annotations

from typing import Dict

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(axes: Dict[str, int] | None = None, devices=None) -> Mesh:
    """Create a mesh; default is all devices on a single ``dp`` axis."""
    devices = devices if devices is not None else jax.devices()
    if axes is None:
        axes = {"dp": len(devices)}
    names = tuple(axes.keys())
    shape = tuple(axes.values())
    assert int(np.prod(shape)) == len(devices), (shape, len(devices))
    return Mesh(np.asarray(devices).reshape(shape), names)


def replicate(mesh: Mesh, tree):
    """Fully replicate a pytree across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_batch(mesh: Mesh, tree, axis: str = "dp"):
    """Shard every leaf's leading dim across ``axis``."""
    return jax.device_put(tree, NamedSharding(mesh, P(axis)))


def concept_sharded_unet_fn(mesh: Mesh, unet_fn, axis: str = "dp"):
    """Wrap a unet_fn so its batch rows (uncond + N concepts) shard across
    ``axis``: the BASELINE north-star layout where per-concept forwards run
    on separate chips as one sharded call.

    Rows must be padded to a multiple of the axis size by the caller.
    """
    batch_sharding = NamedSharding(mesh, P(axis))
    rep = NamedSharding(mesh, P())

    def wrapped(x, t, ctx, pooled, concept_idx):
        x = jax.lax.with_sharding_constraint(x, batch_sharding)
        ctx = jax.lax.with_sharding_constraint(ctx, batch_sharding)
        pooled = jax.lax.with_sharding_constraint(pooled, batch_sharding)
        concept_idx = jax.lax.with_sharding_constraint(concept_idx, batch_sharding)
        eps = unet_fn(x, t, ctx, pooled, concept_idx)
        return jax.lax.with_sharding_constraint(eps, rep)

    return wrapped


def seed_sharded_unet_fn(mesh: Mesh, unet_fn, axis: str = "dp"):
    """Wrap a sampler unet_fn so every forward's batch rows shard across
    ``axis`` — both the "N seeds in parallel" serving layout AND the
    single-image latency layout (uncond + N concept rows spread over the
    mesh, the BASELINE <4 s v5e-8 config). Rows are embed-major/seed-minor
    ([k*S+s]), so any contiguous split is valid; row counts that don't
    divide the axis (e.g. the 2-row joint phase on 4 chips) are padded by
    repeating the last row and sliced back after — padded rows cost idle
    compute on the extra chips, never correctness.
    """
    rows = NamedSharding(mesh, P(axis))
    n_axis = int(mesh.shape[axis])

    def wrapped(params, x, t, ctx, pooled, concept_idx):
        b = x.shape[0]
        bp = -(-b // n_axis) * n_axis
        x, _ = pad_rows_to(x, bp)
        ctx, _ = pad_rows_to(ctx, bp)
        pooled, _ = pad_rows_to(pooled, bp)
        concept_idx, _ = pad_rows_to(concept_idx, bp)
        x = jax.lax.with_sharding_constraint(x, rows)
        ctx = jax.lax.with_sharding_constraint(ctx, rows)
        pooled = jax.lax.with_sharding_constraint(pooled, rows)
        concept_idx = jax.lax.with_sharding_constraint(concept_idx, rows)
        eps = unet_fn(params, x, t, ctx, pooled, concept_idx)
        eps = jax.lax.with_sharding_constraint(eps, rows)
        return eps[:b]

    return wrapped


def init_distributed(coordinator_address=None, num_processes=None,
                     process_id=None) -> bool:
    """Multi-host bootstrap: ``jax.distributed.initialize()`` (SURVEY §5.8's
    TPU-native replacement for the reference's NCCL-under-accelerate setup,
    ``diffusers_training_xl_new.py:503-508``). On a TPU pod slice the
    coordinator/process args come from the runtime environment and may be
    omitted; pass them explicitly for CPU/GPU clusters or tests. Idempotent.
    Returns True when this process is part of a multi-process job.
    """
    if not jax.distributed.is_initialized():
        kwargs = {}
        if coordinator_address is not None:
            kwargs["coordinator_address"] = coordinator_address
        if num_processes is not None:
            kwargs["num_processes"] = num_processes
        if process_id is not None:
            kwargs["process_id"] = process_id
        jax.distributed.initialize(**kwargs)
    return jax.process_count() > 1


def place_global_batch(mesh: Mesh, tree, axis: str = "dp"):
    """Assemble a globally ``axis``-sharded batch from each process's local
    rows (the multi-host DCN data layout: every host contributes
    ``global_rows / process_count`` leading rows and only ever touches its
    addressable shard). Leaves may be numpy or device arrays; device arrays
    are passed through without a host round-trip (a ``device_get`` here
    would force a per-step sync that stalls dispatch and serializes data
    loading with compute). On a single-process mesh this is equivalent to
    :func:`shard_batch`.
    """
    sharding = NamedSharding(mesh, P(axis))

    def place(x):
        if not isinstance(x, jax.Array):
            x = np.asarray(x)
        return jax.make_array_from_process_local_data(sharding, x)

    return jax.tree.map(place, tree)


def pad_rows_to(x, n: int):
    """Pad leading dim up to n (repeat last row); returns (padded, orig_len)."""
    b = x.shape[0]
    if b == n:
        return x, b
    reps = [x] + [x[-1:]] * (n - b)
    import jax.numpy as jnp

    return jnp.concatenate(reps, axis=0), b


def globalize(mesh: Mesh, tree):
    """Promote process-local (host or single-device) arrays to *globally
    replicated* arrays on a (possibly multi-process) mesh.

    The multi-host serving input layout: params, text embeds, fg masks, and
    the seed latents are deterministic from (checkpoint, prompt, seed), so
    every process computes identical values locally and this stamps them
    with a replicated global sharding — no DCN traffic, just metadata. The
    jitted trajectory then reshards batch rows over the global axis via
    ``seed_sharded_unet_fn``. On a single-process mesh this is
    :func:`replicate`.
    """
    sharding = NamedSharding(mesh, P())

    def place(x):
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            return x  # already global
        return jax.make_array_from_process_local_data(sharding, np.asarray(x))

    return jax.tree.map(place, tree)


def host_gather(x):
    """Fetch a (possibly cross-process-sharded) array to every host as
    numpy — the serving output path: seeds sharded over a multi-host mesh
    come back to process 0 for image decode/writes (an allgather over DCN;
    on one process it is a plain device_get)."""
    if isinstance(x, jax.Array) and not x.is_fully_addressable:
        from jax.experimental import multihost_utils

        return np.asarray(multihost_utils.process_allgather(x, tiled=True))
    return np.asarray(jax.device_get(x))


def is_primary_process() -> bool:
    """True on the process that should perform writes (images, metrics) —
    the multi-host equivalent of the reference's rank-0 checks."""
    return jax.process_index() == 0
