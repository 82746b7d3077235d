"""REAL multi-process bring-up self-test (VERDICT r4 item 2).

Every other multi-chip proof in this repo runs N virtual devices inside
ONE process; this module exercises the true process-spanning path: it
spawns `num_processes` OS processes with `devices_per_proc` CPU devices
each, joins them into one JAX cluster through
``parallel.multihost.initialize`` (the pod-scale analogue of the
reference's single-process bring-up, fft_wgpu src/lib.rs:29-62), builds
the GLOBAL pencil mesh, and runs ``fft3d`` + ``fft1d_distributed`` across
the process boundary with parity asserted vs numpy in every process.

Used by tests/test_multihost.py and by __graft_entry__._dryrun_body
(step 7).  If this jax build refuses CPU clusters (no cross-process CPU
collectives), callers get MultihostUnavailable carrying the child's
actual error — proof it tried, not a silent skip.
"""

from __future__ import annotations

import os
import socket
import subprocess
import sys

__all__ = ["MultihostUnavailable", "launch_cluster", "child_main"]

_OK_MARK = "MULTIHOST_SELFTEST_OK"

# error signatures that mean "this build/platform cannot do CPU
# clusters", as opposed to a genuine bug in our bring-up path
_ENV_REFUSAL = (
    "unimplemented", "not implemented", "does not support",
    "unavailable:", "no cpu collectives", "collectives are not",
    "cross-host", "failed to connect",
)


class MultihostUnavailable(RuntimeError):
    """The environment (jax build / platform) refused a CPU cluster."""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _child_env(devices_per_proc: int) -> dict:
    env = dict(os.environ)
    for k in list(env):
        # strip the axon remote-TPU plumbing: children must come up as
        # plain CPU processes (CLAUDE.md: a second process touching the
        # TPU client can wedge the tunnel)
        if k.startswith(("PALLAS_AXON", "AXON_", "TPU_")):
            env.pop(k)
    env["JAX_PLATFORMS"] = "cpu"
    flags = [t for t in env.get("XLA_FLAGS", "").split()
             if "xla_force_host_platform_device_count" not in t]
    flags.append(f"--xla_force_host_platform_device_count={devices_per_proc}")
    env["XLA_FLAGS"] = " ".join(flags)
    repo = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    # PYTHONPATH=<repo> drops the axon sitecustomize from the default
    # path (which would force jax_platforms="axon,cpu"); JAX_PLATFORMS
    # above keeps the child importable without it
    env["PYTHONPATH"] = repo
    return env


def launch_cluster(num_processes: int = 2, devices_per_proc: int = 4,
                   timeout: float = 420.0) -> list[str]:
    """Run the cluster self-test; returns each process's stdout.

    Raises MultihostUnavailable when the jax build refuses CPU clusters,
    AssertionError/RuntimeError on genuine failures.
    """
    import threading

    port = _free_port()
    env = _child_env(devices_per_proc)
    procs = [
        subprocess.Popen(
            [sys.executable, "-m",
             "fft_wgpu_tpu.parallel.multihost_selftest",
             str(i), str(num_processes), str(port)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True,
        )
        for i in range(num_processes)
    ]
    # Drain every child CONCURRENTLY: a sequential communicate() loop
    # can deadlock the cluster — a child whose traceback/log output
    # fills its pipe blocks on write while its peers block in a
    # collective waiting for it, and the genuine failure would then be
    # misreported as a timeout (review r5).
    results = [None] * num_processes

    def _drain(idx, p):
        try:
            out, err = p.communicate(timeout=timeout)
            results[idx] = (p.returncode, out, err)
        except subprocess.TimeoutExpired:
            results[idx] = None
        except Exception as e:  # pipe/OS errors must surface as
            results[idx] = (-1, "", f"drain error: {e!r}")  # failures,
            # not masquerade as an environment timeout/skip (review r5b)

    threads = [threading.Thread(target=_drain, args=(i, p), daemon=True)
               for i, p in enumerate(procs)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout + 30)
    if any(r is None for r in results):
        for p in procs:
            p.kill()
        raise MultihostUnavailable(
            f"CPU cluster timed out after {timeout}s (children hung in "
            "distributed init — cross-process CPU collectives likely "
            "missing from this jax build)")
    outs = results
    for rc, out, err in outs:
        if rc != 0:
            low = (out + err).lower()
            if any(sig in low for sig in _ENV_REFUSAL):
                raise MultihostUnavailable(
                    f"jax refused the CPU cluster (rc={rc}): "
                    f"{err.strip()[-500:]}")
            raise RuntimeError(
                f"multihost child failed (rc={rc}):\n{out[-1000:]}\n"
                f"{err[-3000:]}")
        assert _OK_MARK in out, f"child exited 0 without OK marker:\n{out}"
    return [out for _, out, _ in outs]


def child_main(process_id: int, num_processes: int, port: int) -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    from .mesh import make_mesh
    from .multihost import global_pencil_mesh, initialize
    from .pencil import fft1d_distributed, fft3d

    idx, cnt = initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=num_processes, process_id=process_id,
    )
    assert (idx, cnt) == (process_id, num_processes), (idx, cnt)
    local = len(jax.local_devices())
    total = len(jax.devices())
    assert total == local * num_processes, (total, local)

    # --- 3-D pencil FFT across the process boundary ---------------------
    mesh = global_pencil_mesh()
    px, py = mesh.devices.shape
    rng = np.random.default_rng(0)  # identical in every process
    cube = (2 * px * py, 2 * px * py, 8)
    x3 = rng.standard_normal(cube).astype(np.float32)
    ref3 = np.fft.fftn(x3)
    y3 = fft3d(jnp.asarray(x3), mesh)

    @jax.jit
    def rel_l2_c(y, rr, ri):
        num = jnp.sum((jnp.real(y) - rr) ** 2 + (jnp.imag(y) - ri) ** 2)
        return jnp.sqrt(num / jnp.sum(rr**2 + ri**2))

    err3 = float(rel_l2_c(y3, ref3.real.astype(np.float32),
                          ref3.imag.astype(np.float32)))
    assert err3 < 1e-4, f"fft3d parity across processes: {err3:.3e}"

    # --- distributed four-step 1-D FFT on the flat global mesh ----------
    lmesh = make_mesh(axis_names=("seq",))
    n1d = 4096
    v = rng.standard_normal(n1d).astype(np.float32)
    ref1 = np.fft.fft(v)
    w = fft1d_distributed(jnp.asarray(v), lmesh)
    err1 = float(rel_l2_c(w, ref1.real.astype(np.float32),
                          ref1.imag.astype(np.float32)))
    assert err1 < 1e-4, f"fft1d_distributed parity: {err1:.3e}"

    print(f"{_OK_MARK} proc={idx}/{cnt} devices={total} "
          f"err3d={err3:.3e} err1d={err1:.3e}", flush=True)


if __name__ == "__main__":
    child_main(int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]))
