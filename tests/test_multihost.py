"""Multi-host (multi-process) runtime tests — SURVEY.md §2.10 DP design.

The real thing: TWO separate JAX processes (4 virtual CPU devices each)
joined by jax.distributed/Gloo, each feeding its local rows of every global
batch via make_array_from_process_local_data, producing the SAME losses as a
single process owning all 8 devices. Reference baseline: none (the reference
is single-GPU, utilities/utilities.py:401-406).
"""

import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_local_batch_slice_math():
    from kurosiwo_tpu.parallel.distributed import local_batch_slice

    assert local_batch_slice(16, 0, 2) == slice(0, 8)
    assert local_batch_slice(16, 1, 2) == slice(8, 16)
    assert local_batch_slice(8, 3, 4) == slice(6, 8)
    with pytest.raises(ValueError):
        local_batch_slice(10, 0, 4)


def test_loader_process_slices_tile_the_global_batch():
    """Two process-sliced loaders reproduce exactly the single-process
    batches, row block by row block (same seed -> same global indices)."""
    from tests._multihost_worker import _config

    from kurosiwo_tpu.data.pipeline import Loader

    cfg = _config()
    full = Loader("train", cfg, seed=5, process_index=0, process_count=1)
    p0 = Loader("train", cfg, seed=5, process_index=0, process_count=2)
    p1 = Loader("train", cfg, seed=5, process_index=1, process_count=2)
    b_full = next(iter(full))
    b0 = next(iter(p0))
    b1 = next(iter(p1))
    for k in b_full:
        np.testing.assert_array_equal(
            b_full[k], np.concatenate([b0[k], b1[k]], axis=0), err_msg=k
        )


def test_eval_loader_pads_local_blocks():
    from tests._multihost_worker import _config

    from kurosiwo_tpu.data.pipeline import Loader

    cfg = dict(_config())
    cfg["synthetic_size"] = 20  # ragged last val batch: 20 = 16 + 4
    p1 = Loader("val", cfg, seed=5, process_index=1, process_count=2)
    batches = list(iter(p1))
    assert all(b["mask"].shape[0] == 8 for b in batches)
    # last global batch has 4 real rows, all on process 0 -> process 1 all-pad
    last = batches[-1]
    assert float(last["sample_weight"].sum()) == 0.0
    assert (last["mask"] == 3).all()


@pytest.mark.slow
def test_two_process_training_matches_single_process():
    """Spawn 2 real processes x 4 CPU devices; losses must match the
    single-process 8-device run to float tolerance."""
    from tests._multihost_worker import run_two_steps

    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env.pop("JAX_PLATFORMS", None)
    env["PYTHONPATH"] = str(REPO) + os.pathsep + env.get("PYTHONPATH", "")

    def _spawn_pair():
        port = _free_port()
        procs = [
            subprocess.Popen(
                [sys.executable, str(REPO / "tests" / "_multihost_worker.py"), str(i), "2", str(port)],
                env=env, cwd=str(REPO),
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            )
            for i in range(2)
        ]
        outs, rcs = [], []
        for p in procs:
            out, _ = p.communicate(timeout=600)
            outs.append(out)
            rcs.append(p.returncode)
        return outs, rcs

    # Gloo's cross-process connect window is ~30s; if one worker's
    # import+trace is slowed by unrelated machine load the rendezvous
    # times out. That is environmental, not a correctness failure —
    # retry once on that exact signature before failing.
    for attempt in range(2):
        outs, rcs = _spawn_pair()
        if all(rc == 0 for rc in rcs):
            break
        rendezvous_flake = any(
            "Gloo context initialization failed" in out or "GetKeyValue() timed out" in out
            for out in outs
        )
        if attempt == 1 or not rendezvous_flake:
            for rc, out in zip(rcs, outs):
                assert rc == 0, out[-3000:]
    multi = {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("LOSSES "):
                _, pid, *vals = line.split()
                multi[int(pid)] = [float(v) for v in vals]
    assert set(multi) == {0, 1}, outs
    # both processes observe identical (replicated) losses
    np.testing.assert_allclose(multi[0], multi[1], rtol=1e-6)

    single = run_two_steps()  # this process: 8 virtual devices (conftest)
    # 5e-4, not 2e-5: 2x4 vs 1x8 topologies reduce BN statistics with
    # different psum trees; the f32 ordering difference is amplified by one
    # optimizer update through bf16 params before the step-2 loss (step-1
    # losses match to 1e-7 — verified by the cross-process assert above)
    np.testing.assert_allclose(multi[0], single, rtol=5e-4)
