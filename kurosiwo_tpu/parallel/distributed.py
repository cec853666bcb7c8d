"""Multi-host (multi-process) runtime.

The reference is strictly single-process/single-GPU
(/root/reference/utilities/utilities.py:401-406 pins one cuda device; no
torch.distributed anywhere). SURVEY.md §2.10 commits the rebuild to the
standard JAX multi-host recipe instead:

  * one JAX process per host, `jax.distributed.initialize` wires the
    coordination service (gRPC) and makes `jax.devices()` global;
  * every process loads only its slice of each global batch and assembles a
    global jax.Array via `jax.make_array_from_process_local_data`;
  * the jitted train step is compiled against the GLOBAL mesh — GSPMD inserts
    the gradient all-reduce over ICI within a slice / DCN across slices.

Determinism contract: all processes compute the SAME global epoch indices
from the same seed (the loader's RNG draws are process-independent), then
each decodes rows [pi*local_bs, (pi+1)*local_bs) of every batch — so an
N-process run consumes byte-identical global batches to a single-process run
(tested in tests/test_multihost.py against single-process numerics).
"""

from __future__ import annotations

import os

import jax


def initialize(config: dict | None = None) -> tuple[int, int]:
    """Initialize the JAX distributed runtime when multi-process settings are
    present (config keys coordinator_address/num_processes/process_id, or the
    standard JAX env vars); no-op for single-process runs.

    Returns (process_index, process_count)."""
    cfg = config or {}
    coord = cfg.get("coordinator_address") or os.environ.get("JAX_COORDINATOR_ADDRESS")
    nproc = cfg.get("num_processes") or os.environ.get("JAX_NUM_PROCESSES")
    pid = cfg.get("process_id", os.environ.get("JAX_PROCESS_ID"))
    partial = [coord, nproc, pid]
    if any(v is not None and v != "" for v in partial) and not all(
        v is not None and v != "" for v in partial
    ):
        # a half-configured launcher must fail loudly: silently falling back
        # to single-process would start N independent runs that each consume
        # only their row slice of every batch
        raise RuntimeError(
            "incomplete distributed settings: coordinator_address="
            f"{coord!r}, num_processes={nproc!r}, process_id={pid!r} — set "
            "all three (config keys or JAX_COORDINATOR_ADDRESS/"
            "JAX_NUM_PROCESSES/JAX_PROCESS_ID) or none")
    if coord and nproc is not None and pid is not None and int(nproc) > 1:
        jax.distributed.initialize(
            coordinator_address=str(coord),
            num_processes=int(nproc),
            process_id=int(pid),
        )
    return jax.process_index(), jax.process_count()


def process_info() -> tuple[int, int]:
    return jax.process_index(), jax.process_count()


def local_batch_slice(global_batch_size: int, pi: int | None = None, pc: int | None = None):
    """Rows of each global batch this process decodes: a contiguous
    [pi*local, (pi+1)*local) block, matching the row order
    jax.make_array_from_process_local_data expects for a leading-axis
    sharding whose device order follows process index."""
    if pi is None or pc is None:
        pi, pc = process_info()
    if global_batch_size % pc != 0:
        raise ValueError(
            f"global batch size {global_batch_size} is not divisible by "
            f"process count {pc}"
        )
    local = global_batch_size // pc
    return slice(pi * local, (pi + 1) * local)
