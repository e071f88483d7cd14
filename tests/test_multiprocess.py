"""Multi-process data parallelism: 2 processes x 4 CPU devices must match
a single-process 8-device run exactly (SURVEY.md §2.13 — the multi-host DP
path: per-host batch shards assembled into a global array, cross-process
collectives inside the jitted steps, replicated decisions everywhere)."""
import json
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


def _spawn(process_id: int, num_processes: int, port: int, local_devices: int):
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env.pop("JAX_PLATFORMS", None)
    # scrub hardware-plugin sitecustomize paths: the worker pins CPU
    env["PYTHONPATH"] = os.pathsep.join(
        [str(REPO)]
        + [
            p
            for p in env.get("PYTHONPATH", "").split(os.pathsep)
            if p and ".axon_site" not in p
        ]
    )
    # the worker disables the persistent compile cache itself (cross-env
    # XLA:CPU AOT feature mismatch corrupts numerics; see mpworker.main)
    return subprocess.Popen(
        [
            sys.executable,
            "-m",
            "rave_tpu.parallel.mpworker",
            str(process_id),
            str(num_processes),
            str(port),
            str(local_devices),
        ],
        env=env,
        stdout=subprocess.PIPE,
        stderr=subprocess.PIPE,
        text=True,
        cwd=str(REPO),
    )


def _collect(proc) -> dict:
    out, err = proc.communicate(timeout=900)
    assert proc.returncode == 0, f"worker failed:\n{err[-3000:]}"
    for line in out.splitlines():
        if line.startswith("MPWORKER "):
            return json.loads(line[len("MPWORKER ") :])
    raise AssertionError(f"no MPWORKER line in output:\n{out}\n{err[-2000:]}")


def test_two_process_dp_matches_single_process():
    port = _free_port()
    workers = [_spawn(i, 2, port, 4) for i in range(2)]
    results = [_collect(p) for p in workers]
    single = _collect(_spawn(0, 1, 0, 8))

    assert results[0]["process_count"] == 2
    assert results[0]["device_count"] == 8
    assert single["device_count"] == 8

    # replicated outputs: every process sees identical numbers
    for k in results[0]:
        assert results[0][k] == results[1][k], (k, results[0][k], results[1][k])

    # topology invariance: 2x4 multi-process == 1x8 single-process
    for k in ("step0_loss_gen", "step1_loss_gen", "step2_loss_dis", "checksum"):
        np.testing.assert_allclose(
            results[0][k], single[k], rtol=1e-6,
            err_msg=f"{k}: multi={results[0][k]} single={single[k]}",
        )
