"""2-process multi-host data pipeline test (VERDICT r1 weak #7 / next #9).

Spawns two real processes, each owning 4 virtual CPU devices, connected
through jax.distributed with gloo CPU collectives — the same
process-local-feeding + global-array-assembly path a TPU pod uses over
DCN. Also unit-tests the slicing helper single-process.
"""

import os
import socket
import subprocess
import sys
import pathlib

import pytest

ROOT = pathlib.Path(__file__).resolve().parent.parent


def test_host_batch_slice_partitions():
    from tetranerf_tpu.parallel.sharding import host_batch_slice

    slices = [host_batch_slice(12, p, 3) for p in range(3)]
    covered = []
    for s in slices:
        covered.extend(range(s.start, s.stop))
    assert covered == list(range(12))
    with pytest.raises(ValueError):
        host_batch_slice(10, 0, 3)


def test_two_process_global_batch():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env.pop("JAX_PLATFORMS", None)
    worker = str(ROOT / "tests" / "multihost_worker.py")
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(pid), str(port)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
            cwd=str(ROOT),
        )
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=540)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("multihost workers timed out:\n" + "\n".join(outs))
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out}"
        assert f"OK process={pid}" in out, out
    # Both processes computed the same replicated global value, and the
    # flagship bucketed train step converged to the same loss (the
    # make_global_batch process_count>1 branch feeding every jitted
    # step and probe).
    for key in ("value=", "tp=", "train="):
        v0 = outs[0].split(key)[1].split()[0]
        v1 = outs[1].split(key)[1].split()[0]
        assert v0 == v1, (key, v0, v1)
