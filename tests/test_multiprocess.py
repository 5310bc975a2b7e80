"""Real two-process ``jax.distributed`` test over localhost TCP.

SURVEY.md section 5.8 / section 2.5 row "Multi-host / DCN": the reference has
no distributed backend; the TPU-native layer is ``jax.distributed`` over DCN.
Here the DCN is stood in by localhost TCP between two OS processes, each
with 2 virtual CPU devices (gloo CPU collectives) — so the cross-HOST code
paths (coordinator bring-up, global-array construction from process-local
shards, cross-process gradient psum, cross-process lat-halo ppermute,
``process_allgather`` fetch) genuinely execute, unlike the single-process
8-device mesh used elsewhere in the suite.
"""

import os
import socket
import subprocess
import sys

import numpy as np

WORKER = os.path.join(os.path.dirname(__file__), "multiproc_worker.py")
NPROC = 2


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _parse(stdout: str) -> dict:
    out = {}
    for line in stdout.splitlines():
        parts = line.split()
        if parts and parts[0] in {
            "CHECKS_OK",
            "PRIMARY",
            "LOSS",
            "GRAD",
            "SPCONV_OK",
        }:
            out[parts[0]] = parts[1:]
    return out


def test_two_process_distributed():
    coordinator = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    # Prepend (not overwrite): the host environment may carry entries the
    # interpreter needs (e.g. the TPU-plugin site customization path).
    # JAX_PLATFORMS=cpu below keeps that plugin inert if present.
    repo_root = os.path.dirname(os.path.dirname(WORKER))
    prior = env.get("PYTHONPATH")
    env["PYTHONPATH"] = (
        repo_root + os.pathsep + prior if prior else repo_root
    )
    # The worker pins its own JAX_PLATFORMS/XLA_FLAGS before backend
    # creation; scrub the parent's 8-device flag so it cannot leak in.
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"

    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, coordinator, str(NPROC), str(pid)],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
        )
        for pid in range(NPROC)
    ]
    results = []
    try:
        for p in procs:
            stdout, stderr = p.communicate(timeout=420)
            results.append((p.returncode, stdout, stderr))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()

    for rc, stdout, stderr in results:
        assert rc == 0, f"worker failed (rc={rc}):\n{stdout}\n{stderr}"

    parsed = [_parse(stdout) for _, stdout, _ in results]
    for p in parsed:
        assert "CHECKS_OK" in p and "SPCONV_OK" in p, p

    # exactly one primary across the job
    assert sorted(int(p["PRIMARY"][0]) for p in parsed) == [0, 1]

    # both processes observed the identical replicated loss/grad, and they
    # match the full-batch numpy oracle (same seeds as the worker)
    losses = [float(p["LOSS"][0]) for p in parsed]
    grads = [np.array([float(g) for g in p["GRAD"]]) for p in parsed]
    assert losses[0] == losses[1]
    np.testing.assert_array_equal(grads[0], grads[1])

    rng = np.random.RandomState(0)
    x = rng.randn(8, 5).astype(np.float32)
    y = rng.randn(8).astype(np.float32)
    w0 = np.linspace(-1.0, 1.0, 5).astype(np.float32)
    resid = x @ w0 - y
    np.testing.assert_allclose(losses[0], np.mean(resid**2), rtol=1e-5)
    np.testing.assert_allclose(
        grads[0], 2.0 * x.T @ resid / len(y), rtol=1e-4, atol=1e-5
    )
